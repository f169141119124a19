"""Physical-plan lint for every workload query (scale guard).

Greps each query's executed plan for the anti-patterns that sink a
100 TB run long before correctness does:

  * CartesianProduct            — unbounded all-pairs blowup
  * BroadcastNestedLoopJoin     — theta join that didn't find an equi
                                  rewrite (per-row scan of the
                                  broadcast side)
  * BatchEvalPython             — row-at-a-time Python UDF (the slow
                                  path; Arrow ops show up as
                                  ArrowEvalPython / MapInPandas /
                                  FlatMapGroupsInPandas instead)
  * single-partition Window     — a global window (no PARTITION BY)
                                  serializes the whole relation
                                  through one task

Known-bounded exceptions are allowlisted HERE, each with the reason
the pattern is safe for that query (driver-grain relation, k-bounded
rows, etc.). A new query tripping a rule fails
tests/test_plan_audit.py until it is either re-planned or explicitly
justified below — plan regressions become test failures, not
production surprises.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# pattern -> queries allowed to contain it, with justification
ALLOWLIST: dict[str, dict[str, str]] = {
    "single_partition_window": {
        # election-grain relations: O(12..50) rows by construction
        "q107_redskins_golden": "12-row election-grain pipeline windows",
        # global order is the SEMANTICS and input is one scraped page
        "q07_forward_fill": "forward-fill over one scraped page (tiny)",
        "q13_election_days": "50-row generated dimension",
        # global running/rank windows over aggregated (group-count-sized)
        # relations, not raw facts
        "q31_window_suite": "windows over per-customer aggregate (~1k rows/SF unit)",
        "q43b_kmv_distinct": "rank over k=256 sketch rows",
        "q57_heavy_hitters": "rank over candidate heavy hitters (k-bounded)",
        "q64_gap_fill": "global month spine (24 rows)",
        "q94_ewma": "EWMA is per-user; spine build is month-grain",
        "q104_bpe_segment": "merge ranking over vocab-sized table",
        "q124_bigram_lm": "false positive: windows partition by bigram/head; the SinglePartition exchange is the 1-row vocabulary-size aggregate",
        "q191_dsir_weights": "false positive: windows partition by hash bucket; the SinglePartition exchange is the 1-row corpus-totals aggregate",
        "q139_budget_mix": "waterfill cumsum over the source-grain relation (one row per source)",
        "q153_rrf_fusion": "rank windows over top-20 lists (k-bounded by the limit beneath)",
        "q240_bm25_rank": "false positive: the top-k window partitions by query id; the SinglePartition exchange is the 1-row (N, avgdl) corpus-statistics aggregate",
    },
    "nested_loop_join": {
        "q59_interval_overlap": "interval overlap: right side is 10 literal rows (broadcast), bounded",
        "q107_redskins_golden": "30-day as-of window over 12 elections x ~30 games (driver-grain)",
        # scalar-broadcast cross joins: the build side is a 1-row
        # aggregate (corpus total / query vector) — bounded by definition
        "q21_cosine_topk": "cross join with the 1-row query vector",
        "q73_conjunctive_search": "cross join with the 1-row query-terms literal",
        "q75_tfidf_top_term": "cross join with the 1-row corpus doc-count",
        "q79_vocab_prune": "cross join with the 1-row corpus totals",
        "q82_bigram_pmi": "cross join with the 1-row corpus bigram total",
        "q93_source_mix": "cross join with the 1-row corpus totals",
        # blocked matmul: build side is the B=16-row block-list frame;
        # join condition blk_a <= blk_b bounds it at B(B+1)/2 pairs
        "q22_embedding_dups": "block-pair join over B=16 collected blocks (B^2-bounded)",
        "q124_bigram_lm": "cross join with the 1-row vocabulary-size aggregate",
        "q191_dsir_weights": "cross join with the 1-row (N_raw, N_tgt) corpus-totals aggregate",
        "q130_price_histogram": "cross join with the 1-row (min,max) bounds aggregate",
        "q138_triangles": "assembly of three 1-row count aggregates",
        "q139_budget_mix": "cross joins with 1-row budget/level aggregates",
        "q144_bm25": "cross join with the 1-row (N, avgdl) corpus-statistics aggregate",
        "q149_bloom_prune": "cross join with the 1-row Bloom bitmap (m_bits/64-bounded map)",
        "q230_hll_distinct": "cross join of two 1-row aggregates (merged HLL state x exact count)",
        "q154_psi": "cross joins with the 1-row reference-bounds and totals aggregates",
        "q155_kmv_setops": "theta pairing of the per-event-type sketch frame (group-count-bounded rows, k-bounded states)",
        "q168_quantile_bins": "cross join with the 1-row total-count aggregate",
        "q175_knn_label_noise": "block-pair join over B=16 collected blocks (B^2-bounded, via q22's operator)",
        "q179_embedding_curation": "block-pair join over B=16 collected blocks (B^2-bounded, via q22's operator inside the k-NN stage)",
        "q171_char_ngram_lm": "cross join with the 1-row corpus trigram total",
        "q172_doc_subsample": "cross join with the 1-row (Z, T) weight-normalizer aggregate (language grain upstream)",
        "q240_bm25_rank": "cross join with the 1-row (N, avgdl) corpus-statistics aggregate (q144's pattern at query-table grain)",
    },
    "cartesian": {},
    "python_udf_rowwise": {},
}

_CHECKS = [
    ("cartesian", re.compile(r"CartesianProduct")),
    ("nested_loop_join", re.compile(r"BroadcastNestedLoopJoin")),
    ("python_udf_rowwise", re.compile(r"BatchEvalPython")),
]


def audit_plan(plan: str) -> list[str]:
    hits = [name for name, rx in _CHECKS if rx.search(plan)]
    # a Window directly over an Exchange SinglePartition (or a Sort on
    # a single partition) = global window
    if "SinglePartition" in plan and "Window" in plan:
        hits.append("single_partition_window")
    return hits


def audit_all(
    sf_dir: str, only: set[str] | None = None, spark=None
) -> dict[str, list[str]]:
    from redskins_rule_spark import workload
    from redskins_rule_spark.session import get_spark

    # only stop a session this function itself created (a caller-owned
    # session — e.g. the pytest fixture — must survive the audit)
    own = spark is None
    if own:
        spark = get_spark("plan-audit")
    failures: dict[str, list[str]] = {}
    for name, fn in workload.queries().items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must see every query
            failures[name] = [f"plan_error: {str(e).splitlines()[0][:120]}"]
            continue
        bad = [
            h
            for h in audit_plan(plan)
            if name not in ALLOWLIST.get(h, {})
        ]
        if bad:
            failures[name] = bad
    if own:
        spark.stop()
    return failures


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    failures = audit_all(sf_dir, only)
    for name, hits in sorted(failures.items()):
        print(f"[PLAN] {name}: {', '.join(hits)}")
    print(f"\n{len(failures)} plan violations")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
