"""End-to-end curation pipeline: operator composition on real
testdata + synthetic cases pinning each stage's survivor rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from redskins_rule_spark.pipelines.curation import CurationConfig, curate_corpus
from redskins_rule_spark.sources.io import table

SF_DIR = "/root/testdata/sf0.001"


def test_curate_corpus_stages_monotone_on_testdata(spark):
    docs = table(spark, SF_DIR, "documents")
    out = curate_corpus(docs)
    rep = {r.stage: r.n_docs for r in out["report"].collect()}
    assert rep["total"] == docs.count()
    order = ["total", "len_ok", "lang_ok", "exact_dedup",
             "near_dedup", "decontaminated", "final"]
    counts = [rep[s] for s in order]
    assert counts == sorted(counts, reverse=True)  # monotone shrink
    assert rep["decontaminated"] == rep["near_dedup"]  # no benchmark given
    kept = out["kept"]
    n = kept.count()
    assert n == rep["final"]
    # dense, unique shard index
    idx = [r.shard_idx for r in kept.select("shard_idx").collect()]
    assert sorted(idx) == list(range(n))


def test_curate_corpus_survivor_rules(spark):
    long_a = "alpha beta gamma delta epsilon zeta eta theta " * 5
    docs = spark.createDataFrame(
        [
            (1, long_a, "en", "s1"),                   # near-dup of 2 (shorter)
            (2, long_a + "iota kappa", "en", "s1"),    # near-dup winner (longer)
            (3, "short", "en", "s1"),                  # fails length floor
            (4, long_a * 2, "zh", "s1"),               # fails lang allowlist
            (5, "unique " + "content words here okay fine " * 6, "en", "s2"),
            (6, "unique " + "content words here okay fine " * 6, "en", "s2"),
            # 6 is an EXACT dup of 5 -> min id 5 survives
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = curate_corpus(docs, CurationConfig(min_chars=40))
    kept_ids = {r.doc_id for r in out["kept"].select("doc_id").collect()}
    assert kept_ids == {2, 5}
    rep = {r.stage: r.n_docs for r in out["report"].collect()}
    assert rep == {"total": 6, "len_ok": 5, "lang_ok": 4,
                   "exact_dedup": 3, "near_dedup": 2,
                   "decontaminated": 2, "final": 2}


def test_curate_corpus_decontamination_drops_leaked(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    docs = spark.createDataFrame(
        [(1, base, "en", "s1"),
         (2, "totally different training words with no benchmark overlap "
             "whatsoever in this record " * 3, "en", "s1")],
        "doc_id long, text string, lang string, source string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = curate_corpus(docs, CurationConfig(min_chars=40), benchmark=bench)
    kept_ids = {r.doc_id for r in out["kept"].select("doc_id").collect()}
    assert kept_ids == {2}


def test_curate_corpus_budget_mixture(spark):
    docs = table(spark, SF_DIR, "documents")
    out = curate_corpus(docs, CurationConfig(budget_frac=0.5))
    mix = out["mixture"].collect()
    assert all(0 < r.rate <= 1.0 for r in mix)
    kept_per_source = {
        r.source: r.cnt
        for r in out["kept"].groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # sampled output is non-empty and no source exceeds its pre-sample count
    pre = {
        r.source: r.cnt
        for r in curate_corpus(docs)["kept"].groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert sum(kept_per_source.values()) > 0
    for s, c in kept_per_source.items():
        assert c <= pre[s]


def test_hashed_logistic_quality_exact_integers(spark):
    """The model-quality score must be reproducible by hand from the
    published formula — md5 feature hash, Knuth weights, integer
    logit — and handle the degenerate shapes (empty text, one token,
    NULL text, duplicate tokens)."""
    import hashlib

    from redskins_rule_spark.operators.text import (
        LOGIT_DECILE_CUTS,
        hashed_logistic_quality,
    )

    def expected(text: str, bias: int = 100, num_buckets: int = 64):
        import re

        toks = re.findall(r"[a-z0-9]+", text.lower())
        grams = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        s = 0
        for g in grams:
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            sign = 1 - 2 * (h % 2)
            s += sign * ((h % num_buckets) * 2654435761 % 1001 - 500)
        score = bias + s
        p_bucket = sum(score >= t for t in LOGIT_DECILE_CUTS)
        return len(grams), score, p_bucket, score >= 0

    rows = [
        (1, "The quick brown fox"),
        (2, ""),            # zero grams -> score = bias
        (3, "solo"),        # one token, no bigram
        (4, None),          # NULL text -> excluded entirely
        (5, "a a a a"),     # duplicate tokens count per occurrence
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    got = {
        r.doc_id: (r.n_grams, r.score, r.p_bucket, r.keep)
        for r in hashed_logistic_quality(df, "text", "doc_id").collect()
    }
    assert set(got) == {1, 2, 3, 5}  # NULL text dropped
    for doc_id, text in [(1, rows[0][1]), (2, ""), (3, "solo"), (5, "a a a a")]:
        assert got[doc_id] == expected(text), (doc_id, got[doc_id], expected(text))
    assert got[2] == (0, 100, 5, True)  # bias-only doc: p just over 0.5
    # duplicate unigram contributes 4x, the bigram a_a 3x
    assert got[5][0] == 7


def test_hashed_logistic_quality_is_jvm_only(spark):
    """No Python in the hot path: the plan must contain no
    BatchEvalPython / ArrowEvalPython nodes and exactly one shuffle
    for the doc-grain aggregation (plus the join back)."""
    from redskins_rule_spark.operators.text import hashed_logistic_quality
    from redskins_rule_spark.sources.io import table

    docs = table(spark, SF_DIR, "documents")
    plan = hashed_logistic_quality(docs, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
