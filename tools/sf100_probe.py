"""sf100 engine-only scale probes (VERDICT r12 item 3).

At ~5M documents / 100M events the DuckDB oracle can no longer follow
(the sf10 differential already needed bounded oracles and a 48g
recipe), so this decade is verified by INVARIANT, not by differential:

  * corpus_shuffle bijection density — count(distinct epoch_pos) ==
    count(*), min == 0, max == n-1 (a broken Feistel domain or a
    non-dense rank would fail one of the three);
  * HLL shard-merge == global — the 32-shard max-merged register
    array equals the single-pass global register array EXACTLY (the
    mergeability contract that makes the sketch a 100 TB rollup);
  * LSH candidate superset — every pair of a deterministic ~1k-doc
    sample whose EXACT 3-gram Jaccard >= 0.8 must be produced by the
    full-corpus MinHash-LSH pair generator (banding recall on true
    near-dups);
  * CC stability — near-dup edges written once, clustered twice
    under different input partitionings: identical cluster count and
    identical size histogram (pointer-jumping must not depend on
    physical layout);
  * sessionization closed form — the scale fixture replicates events
    with disjoint per-replica user_ids and identical timestamps, so
    n_sessions(sf100) == 10 x n_sessions(sf10) exactly;
  * intradoc dedup linearity — row-local q92 face: one output row per
    input doc, kept <= total tokens.

Round-13 additions (the round's registrations at the decade):

  * bm25 — q240 ranked retrieval over 5M docs: 4 queries x dense
    ranks 1..10, scores non-increasing;
  * fingerprint — q241 rolling-fingerprint dedup (~250M windows, one
    fp-partitioned window pass): one row per doc AND the replica-0
    slice equals the sf10 run row-for-row (ciphers preserve
    within-replica equality; cross-replica fp collisions would need
    two 12-token strings to coincide across different substitution
    alphabets);
  * phrase — q243 offset-vote phrase search: replica-0 match slice
    equals the sf10 match set exactly.

Each probe records wall seconds and (where a shuffle materializes) a
partition-skew ratio (max/mean rows per output partition). Results go
to tools/logs/sf100_probe.json and the SURVEY §11 sf100 table.

Usage: python tools/sf100_probe.py [sf100_dir] [sf10_dir] [probe ...]
Defaults: .scale/sf100  .scale/sf10  (all probes)
Build the fixture first:
  python tools/make_scale.py .scale/sf10 .scale/sf100 10 documents,events
Recommended env: SPARK_GRAFT_DRIVER_MEM=48g (the sf10 recipe).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

REPO = "/root/repo"


def _skew(df) -> float:
    """max/mean rows per partition of df's current layout."""
    counts = [
        r.n for r in
        df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    if not counts:
        return 0.0
    return round(max(counts) / (sum(counts) / len(counts)), 3)


def probe_corpus_shuffle(spark, sf_dir: str, _sf10: str) -> dict:
    from redskins_rule_spark.operators.indexing import (
        corpus_shuffle,
        with_global_index,
    )
    from redskins_rule_spark.sources.io import table

    docs = with_global_index(
        table(spark, sf_dir, "documents").select("doc_id"), ["doc_id"],
        index_col="idx",
    )
    shuffled = corpus_shuffle(docs, "idx", seed=7, epoch=1)
    agg = shuffled.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("epoch_pos").alias("d"),
        F.min("epoch_pos").alias("mn"),
        F.max("epoch_pos").alias("mx"),
    ).collect()[0]
    ok = (agg.d == agg.n and agg.mn == 0 and agg.mx == agg.n - 1)
    return {
        "n": agg.n, "distinct_pos": agg.d, "min": agg.mn, "max": agg.mx,
        "skew_ratio": _skew(shuffled.select("epoch_pos")),
        "ok": bool(ok),
    }


def probe_hll_merge(spark, sf_dir: str, _sf10: str) -> dict:
    from redskins_rule_spark.operators.sketch import hll_merge, hll_state
    from redskins_rule_spark.sources.io import table

    docs = table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 32).alias("shard"), "doc_id"
    )
    sharded = hll_state(docs, ["shard"], "doc_id", p=6)
    merged = sharded.agg(
        F.aggregate(
            F.collect_list("hll"),
            F.array_repeat(F.lit(0), 64),
            lambda acc, st: hll_merge(acc, st),
        ).alias("hll")
    ).collect()[0].hll
    globl = hll_state(
        docs.select(F.lit(0).alias("g"), "doc_id"), ["g"], "doc_id", p=6
    ).collect()[0].hll
    ok = list(merged) == list(globl)
    return {
        "n_shards": 32,
        "registers_equal": bool(ok),
        "register_sum": int(sum(merged)),
        "ok": bool(ok),
    }


def probe_lsh_superset(spark, sf_dir: str, _sf10: str) -> dict:
    from redskins_rule_spark.operators.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs_exact,
    )
    from redskins_rule_spark.sources.io import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    # deterministic ~1k sample for the exact check
    p = max(1, n_docs // 1000)
    sample = docs.where(F.col("doc_id") % p == 0)
    exact = ngram_jaccard_pairs_exact(
        sample, "doc_id", "text", n=3, threshold=0.8, max_df=64
    ).select("id_a", "id_b")
    # full-corpus LSH pair generator (shingle_k=3 to match the exact
    # grams; banding 16x4 over 64 perms)
    cand = minhash_dedup_pairs(
        docs, "doc_id", "text", shingle_k=3, num_perm=64, bands=16,
        threshold=0.8,
    ).select("id_a", "id_b")
    missed = exact.join(cand, ["id_a", "id_b"], "left_anti").count()
    n_exact = exact.count()
    n_cand = cand.count()
    return {
        "sample_docs": sample.count(),
        "exact_pairs_in_sample": n_exact,
        "lsh_pairs_full_corpus": n_cand,
        "sample_pairs_missed_by_lsh": missed,
        "ok": bool(missed == 0),
    }


def probe_cc_stability(spark, sf_dir: str, _sf10: str) -> dict:
    from redskins_rule_spark.operators.dedup import ngram_jaccard_pairs_exact
    from redskins_rule_spark.operators.graph import dedup_clusters
    from redskins_rule_spark.sources.io import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs_path = os.path.join(REPO, ".scale", "tmp_sf100_pairs.parquet")
    ngram_jaccard_pairs_exact(
        docs, "doc_id", "text", n=3, threshold=0.8, max_df=64
    ).select("id_a", "id_b").write.mode("overwrite").parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)

    def hist(nparts: int) -> dict[int, int]:
        cl = dedup_clusters(pairs.repartition(nparts))
        sizes = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
        return {
            r.sz: r.n for r in
            sizes.groupBy("sz").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    h16, h64 = hist(16), hist(64)
    ok = h16 == h64
    return {
        "n_edges": pairs.count(),
        "n_clusters_p16": int(sum(h16.values())),
        "n_clusters_p64": int(sum(h64.values())),
        "size_histograms_equal": bool(ok),
        "ok": bool(ok),
    }


def _n_sessions(spark, sf_dir: str) -> int:
    from pyspark.sql import Window

    from redskins_rule_spark.functions.dates import epoch_us
    from redskins_rule_spark.sources.io import table

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us("ts")
    gap = us - F.lag(us).over(w)
    new_s = (
        F.when(gap > 1_800_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
    )
    return int(
        ev.select(new_s.alias("s")).agg(F.sum("s")).collect()[0][0]
    )


def probe_sessions(spark, sf_dir: str, sf10_dir: str) -> dict:
    n100 = _n_sessions(spark, sf_dir)
    n10 = _n_sessions(spark, sf10_dir)
    ok = n100 == 10 * n10
    return {"n_sessions_sf100": n100, "n_sessions_sf10": n10,
            "expected_ratio": 10, "ok": bool(ok)}


def probe_intradoc(spark, sf_dir: str, _sf10: str) -> dict:
    from redskins_rule_spark import workload

    out = workload.QUERIES["q92_intradoc_dedup"](spark, sf_dir)
    n_docs = out.count()
    from redskins_rule_spark.sources.io import table

    expect = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).count()
    ok = n_docs == expect
    return {"rows": n_docs, "docs": expect, "ok": bool(ok)}


def probe_bm25(spark, sf_dir: str, _sf10: str) -> dict:
    """q240 at the decade: ranked retrieval over 5M docs. Invariants:
    every query fills its top-10 (the corpus dwarfs k), ranks are the
    dense 1..10 per query, and scores are non-increasing down each
    ranking — the contract a consumer of the ranking relies on."""
    from redskins_rule_spark import workload

    rows = workload.QUERIES["q240_bm25_rank"](spark, sf_dir).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    ok = len(rows) == 40 and all(
        sorted(r.rank for r in rs) == list(range(1, 11))
        and all(a.score >= b.score for a, b in
                zip(sorted(rs, key=lambda r: r.rank),
                    sorted(rs, key=lambda r: r.rank)[1:]))
        for rs in by_q.values()
    )
    return {"rows": len(rows), "n_queries": len(by_q), "ok": bool(ok)}


def _replica0_equal(sf100_df, sf10_df, keys: list[str]) -> dict:
    """Exact replica-0 embedding check: make_scale keeps replica 0's
    doc_ids verbatim (shift 0), so the sf100 result restricted to
    sf10's id range must equal the sf10 result ROW FOR ROW. Cross-
    replica interference would need two 12-token (or whole-phrase)
    strings to coincide across different substitution ciphers —
    vanishingly unlikely, and this check would catch it by name."""
    max10 = sf10_df.agg(F.max("doc_id")).collect()[0][0]
    r0 = sf100_df.where(F.col("doc_id") <= max10)
    n10, n0 = sf10_df.count(), r0.count()
    missing = sf10_df.join(r0, keys, "left_anti").count()
    extra = r0.join(sf10_df, keys, "left_anti").count()
    return {
        "rows_sf10": n10, "rows_sf100_replica0": n0,
        "missing_vs_sf10": missing, "extra_vs_sf10": extra,
        "ok": bool(n10 == n0 and missing == 0 and extra == 0),
    }


def probe_fingerprint(spark, sf_dir: str, sf10_dir: str) -> dict:
    """q241 at the decade: 5M docs x ~50 windows = ~250M rolling
    fingerprints through one fp-partitioned window. Invariants: one
    output row per non-null doc, and the replica-0 slice equals the
    sf10 run row-for-row (substitution ciphers preserve within-replica
    window equality and make cross-replica fp collisions impossible in
    practice, so dup/boiler classifications must not drift)."""
    from redskins_rule_spark import workload
    from redskins_rule_spark.sources.io import table

    out100 = workload.QUERIES["q241_fingerprint_dedup"](spark, sf_dir)
    n_docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    ).count()
    n_rows = out100.count()
    cmp = _replica0_equal(
        out100, workload.QUERIES["q241_fingerprint_dedup"](spark, sf10_dir),
        keys=["doc_id", "n_tokens", "n_windows", "n_dup_pos", "n_boiler",
              "n_runs", "cover_tokens", "max_run_cover", "kept_tokens"],
    )
    return {
        "rows": n_rows, "docs": n_docs,
        **cmp,
        "ok": bool(n_rows == n_docs and cmp["ok"]),
    }


def probe_phrase(spark, sf_dir: str, sf10_dir: str) -> dict:
    """q243 at the decade: offset-vote phrase search over 5M docs —
    shuffle volume is the phrase terms' postings only. Invariant: the
    replica-0 slice of the match set equals the sf10 match set exactly
    (matches are row-local to a doc; ciphered replicas can only add
    docs with REMAPPED ids)."""
    from redskins_rule_spark.operators.text import phrase_search
    from redskins_rule_spark.sources.io import table

    d100 = table(spark, sf_dir, "documents")
    d10 = table(spark, sf10_dir, "documents")
    m100 = phrase_search(d100, "big data")
    m10 = phrase_search(d10, "big data")
    cmp = _replica0_equal(
        m100, m10, keys=["doc_id", "n_matches", "first_pos"]
    )
    total = m100.count()
    return {"matched_docs_sf100": total, **cmp,
            "ok": bool(cmp["ok"] and total >= cmp["rows_sf10"])}


PROBES = {
    "corpus_shuffle": probe_corpus_shuffle,
    "hll_merge": probe_hll_merge,
    "lsh_superset": probe_lsh_superset,
    "cc_stability": probe_cc_stability,
    "sessions": probe_sessions,
    "intradoc": probe_intradoc,
    "bm25": probe_bm25,
    "fingerprint": probe_fingerprint,
    "phrase": probe_phrase,
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.scale/sf100"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else f"{REPO}/.scale/sf10"
    names = sys.argv[3:] or list(PROBES)
    unknown = [n for n in names if n not in PROBES]
    if unknown:
        print(f"unknown probes {unknown}; have {list(PROBES)}",
              file=sys.stderr)
        return 2
    if not os.path.isdir(sf_dir):
        print(f"fixture {sf_dir} missing — build it first:\n"
              f"  python tools/make_scale.py {sf10} {sf_dir} 10 "
              "documents,events", file=sys.stderr)
        return 2
    from redskins_rule_spark.session import get_spark

    spark = get_spark("sf100_probe")
    results: dict[str, dict] = {}
    load0 = [round(x, 2) for x in os.getloadavg()]
    for name in names:
        t0 = time.perf_counter()
        try:
            r = PROBES[name](spark, sf_dir, sf10)
        except Exception as e:  # noqa: BLE001 — record, keep probing
            r = {"ok": False, "error": str(e).splitlines()[0][:300]}
        r["wall_s"] = round(time.perf_counter() - t0, 1)
        results[name] = r
        print(f"[probe] {name}: ok={r['ok']} wall={r['wall_s']}s "
              + json.dumps({k: v for k, v in r.items()
                            if k not in ("ok", "wall_s")}),
              flush=True)
    out = {
        "sf_dir": sf_dir,
        "loadavg": {"start": load0,
                    "end": [round(x, 2) for x in os.getloadavg()],
                    "cpus": os.cpu_count()},
        "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "probes": results,
        "all_ok": all(r["ok"] for r in results.values()),
    }
    path = os.path.join(REPO, "tools", "logs", "sf100_probe.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"all_ok": out["all_ok"],
                      "walls": {k: v["wall_s"]
                                for k, v in results.items()}}))
    spark.stop()
    return 0 if out["all_ok"] else 1


if __name__ == "__main__":
    main()
