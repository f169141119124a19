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
