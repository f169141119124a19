from __future__ import annotations

from redskins_rule_spark.operators.bpe import bpe_segment, bpe_train, bpe_train_py


def test_bpe_train_matches_python_reference(spark):
    texts = ["low lower lowest", "low low newer newest", "wider wide new"] * 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert bpe_train(df, n_merges=8) == bpe_train_py(texts, n_merges=8)


def test_bpe_train_early_stop(spark):
    # every word unique, every pair count 1 -> below min_pair_count=2
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    assert bpe_train(df, n_merges=5, min_pair_count=2) == []


def test_bpe_merge_greedy_non_overlapping(spark):
    # pair (a, a) over "aaaa": greedy left-to-right gives [aa, aa, </w>]
    df = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    merges = bpe_train(df, n_merges=1)
    assert merges == [("a", "a")]
    seg = bpe_segment(df, merges).collect()[0]
    assert list(seg.tokens) == ["aa", "aa", "</w>", "aa", "aa", "</w>"]


def test_bpe_segment_roundtrip_chars(spark):
    # concatenating a word's tokens (minus </w>) restores the word
    texts = ["spark sql spark", "sql streaming spark"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=6)
    seg = {r.doc_id: list(r.tokens) for r in bpe_segment(df, merges).collect()}
    for i, t in enumerate(texts):
        restored = "".join(tok for tok in seg[i]).replace("</w>", " ").strip()
        assert restored == " ".join(t.split())
