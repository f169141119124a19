"""Distributed BPE (byte-pair-encoding) tokenizer training.

Classic corpus BPE (Sennrich et al. 2016, public domain algorithm):
start from characters, repeatedly merge the most frequent adjacent
symbol pair. The Spark shape exploits the standard trick that BPE
statistics only depend on the WORD FREQUENCY table, not the corpus:

  1. one pass over the corpus → distinct words + counts (the only
     corpus-sized job; everything after runs on the vocabulary, which
     is orders of magnitude smaller),
  2. per merge round: pair counts = explode(zip(seq, seq[1:]))
     weighted by word frequency → top-1 pair to the driver (a single
     (pair, count) argmax — bytes, not data),
  3. the merge itself is a higher-order fold over each word's symbol
     array (greedy left-to-right, non-overlapping — the fold's
     just-merged symbol can never equal the pair's left element
     mid-stream unless genuinely mergeable), then localCheckpoint so
     plans stay flat instead of nesting one lambda per round.

Ties on pair count break lexicographically — pinned, so training is
deterministic and engine-independent (the pure-Python reference in
tests reproduces the merge list exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_seqs(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, seq) — seq = character symbols + terminal '</w>'."""
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seq = F.concat(
        F.split(F.col("w"), ""), F.array(F.lit("</w>"))
    )
    return words.select("w", "freq", seq.alias("seq"))


def _merge_expr(pair_l: str, pair_r: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (pair_l, pair_r) in
    `seq` as a single fold."""
    merged = pair_l + pair_r
    return F.aggregate(
        F.col("seq"),
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(pair_l))
            & (t == F.lit(pair_r)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus; returns the merge
    list in order. Stops early when no pair reaches `min_pair_count`.
    """
    seqs = _word_seqs(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = seqs.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice(F.col("seq"), 1, F.size("seq") - 1),
                    F.slice(F.col("seq"), 2, F.size("seq") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        l, r = top[0]["l"], top[0]["r"]
        merges.append((l, r))
        seqs = seqs.select(
            "w", "freq", _merge_expr(l, r).alias("seq")
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_py(
    texts: list[str], n_merges: int = 10, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Pure-Python reference (identical semantics incl. tie-breaks)."""
    from collections import Counter

    freqs = Counter()
    for t in texts:
        for w in t.strip().split():
            if w:
                freqs[w] += 1
    seqs = {w: list(w) + ["</w>"] for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, seq in seqs.items():
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] += freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (l, r), _ = best
        merges.append((l, r))
        for w, seq in seqs.items():
            out: list[str] = []
            for t in seq:
                if out and out[-1] == l and t == r:
                    out[-1] = l + r
                else:
                    out.append(t)
            seqs[w] = out
    return merges


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "tokens",
) -> DataFrame:
    """Apply a learned merge list to segment each document into BPE
    tokens (per-word fold chain, row-local, no shuffle)."""
    words = docs.select(
        id_col,
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "w"),
    ).where(F.length("w") > 0)
    seqd = words.select(
        id_col,
        "pos",
        F.concat(F.split(F.col("w"), ""), F.array(F.lit("</w>"))).alias("seq"),
    )
    for l, r in merges:
        seqd = seqd.select(id_col, "pos", _merge_expr(l, r).alias("seq"))
    return (
        seqd.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "seq"))).alias("ps"))
        .select(
            id_col,
            F.flatten(F.transform("ps", lambda x: x["seq"])).alias(out),
        )
    )
