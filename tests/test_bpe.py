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


# --- q104b oracle-equivalence: the greedy merge fold vs the
# delimiter-encoded string-replace replay the DuckDB oracle uses
# (SQL replace() shares Python str.replace's scan-left,
# resume-after-replacement, non-overlapping semantics) ---

SEP = "\x1f"


def _fold_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    seq = list(word) + ["</w>"]
    for l, r in merges:
        out: list[str] = []
        for t in seq:
            if out and out[-1] == l and t == r:
                out[-1] = l + r
            else:
                out.append(t)
        seq = out
    return seq


def _replace_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    e = SEP + (SEP + SEP).join(list(word)) + SEP + SEP + "</w>" + SEP
    for l, r in merges:
        e = e.replace(SEP + l + SEP + SEP + r + SEP, SEP + l + r + SEP)
    return e.replace(SEP + SEP, " ").strip(SEP).split(" ")


def test_q104b_fold_equals_replace_encoding_fixed_table():
    from redskins_rule_spark.workload import _Q104B_MERGES

    for w in ["the", "table", "data", "small", "value", "a", "agg",
              "aaa", "tata", "thth", "ethe", "ggg", "gggg", "taa", "ata"]:
        assert _replace_segment(w, _Q104B_MERGES) == _fold_segment(w, _Q104B_MERGES)


def test_q104b_fold_equals_replace_encoding_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sym = st.sampled_from("thegal")
    merges = st.lists(
        st.tuples(
            st.text(sym, min_size=1, max_size=2),
            st.one_of(st.text(sym, min_size=1, max_size=2), st.just("</w>")),
        ),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.text(sym, min_size=1, max_size=10), merges)
    def check(word, ms):
        assert _replace_segment(word, ms) == _fold_segment(word, ms)

    check()
