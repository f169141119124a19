"""Document chunking — LLM-training-pipeline operator.

Splits documents into overlapping token windows (the shape LLM data
pipelines feed to tokenizers/packers). Two implementations:

  * `chunk_tokens` — pure Catalyst expression (sequence → slice →
    concat_ws over a ONCE-evaluated token array): the 100 TB path,
    row-local, no Python.
  * `ChunkDocs` — a PySpark Python UDTF (one input row → N output
    rows) demonstrating the UDTF surface for chunkers that need real
    tokenizers; Arrow-batched but still Python — keep off hot paths.

Both emit identical chunks for whitespace tokenization (tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    text_col: Column | str, window: int = 64, stride: int = 32
) -> Column:
    """array<struct<chunk_idx int, chunk_text string, n_tokens int>>
    of overlapping token windows. Chunks start every `stride` tokens;
    the last chunk may be short but is never empty; documents shorter
    than one window yield exactly one chunk.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # gaps between chunks would also emit empty trailing chunks
        # with negative token counts from the count formula
        raise ValueError("stride must be <= window")
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # drop empty tokens: split('') yields [''] for empty/whitespace
    # text, which would count 1 token where the UDTF counts 0
    toks = F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")

    # LET-BINDING via a one-element transform (round-7 skew probe):
    # a Column function has no projection to bind `toks` into, and a
    # per-chunk lambda that closes over the raw filter(split(...))
    # expression re-evaluates the split PER CHUNK — O(L²/stride) per
    # document, invisible at uniform lengths, a wall blowup on
    # power-law ones (see text.char_ngrams). transform(array(toks),
    # tk -> ...) evaluates the tokenization ONCE per row and hands
    # the inner lambdas a bound O(1) variable.
    def chunks_of(tk: Column) -> Column:
        n = F.size(tk)
        # number of chunks: 1 + ceil(max(n - window, 0) / stride)
        n_chunks = F.lit(1) + F.ceil(
            F.greatest(n - F.lit(window), F.lit(0)) / F.lit(stride)
        ).cast("int")
        idx = F.sequence(F.lit(0), n_chunks - 1)
        return F.transform(
            idx,
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.concat_ws(" ", F.slice(tk, i * stride + 1, window)).alias(
                    "chunk_text"
                ),
                F.least(n - i * stride, F.lit(window)).cast("int").alias(
                    "n_tokens"
                ),
            ),
        )

    return F.element_at(F.transform(F.array(toks), chunks_of), 1)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 32,
) -> DataFrame:
    """One row per chunk: (id, chunk_idx, chunk_text, n_tokens).
    Row-local explode — partition-preserving, no shuffle."""
    chunks = chunk_tokens(text_col, window, stride)
    return (
        # null text would flow through as size(null) = -1 token counts;
        # a document with no text has no chunks
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(id_col, "c.chunk_idx", "c.chunk_text", "c.n_tokens")
    )


# default group column pack_chunks creates when group_col is not given
# (public: callers aggregate by it)
PACK_GROUP_COL = "__pack_grp"


def pack_chunks(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    group_col: str | None = None,
    order_cols: list[str] | None = None,
    num_groups: int = 64,
    out: str = "pack_id",
) -> DataFrame:
    """Greedy sequence packing: assign each chunk a (group, pack_id)
    such that the token sum per pack never exceeds `budget`
    (chunks longer than the budget get a pack of their own).

    Packing is inherently sequential, so it runs greedily WITHIN
    deterministic hash groups (`num_groups` controls parallelism and
    pack locality). Memory bound: grouped-map applyInPandas
    MATERIALIZES each group as one pandas frame in one Python worker —
    size num_groups so total/num_groups fits in worker memory. Order
    within a group is pinned by sorting on `order_cols` plus every
    remaining column as tiebreak; pass order_cols that form a total
    order (e.g. (doc_id, chunk_idx)) for packs that are reproducible
    AND meaningful.

    Output: input columns + group + pack_id (pack ids are unique
    within a group, 0-based).
    """
    import pandas as pd

    order_cols = order_cols or [tokens_col]
    if group_col is None:
        # hash over ALL columns, not order_cols: hashing the token
        # count alone would send every equal-length chunk (the common
        # case) to ONE group — catastrophic skew
        df = df.withColumn(
            PACK_GROUP_COL,
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_groups)),
        )
        group_col = PACK_GROUP_COL
    in_cols = df.columns

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out} int"

    # order_cols first, every remaining column as tiebreak: rows that
    # tie on order_cols would otherwise pack in arrival order
    # (nondeterministic across runs)
    sort_cols = list(order_cols) + [
        c for c in in_cols if c not in order_cols and c != group_col
    ]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        ids, cur, used = [], 0, 0
        for n in pdf[tokens_col]:
            n = int(n)
            if used > 0 and used + n > budget:
                cur += 1
                used = 0
            ids.append(cur)
            used += n
        pdf[out] = ids
        return pdf

    return (
        df.groupBy(group_col)
        .applyInPandas(pack, schema)
        .select(*in_cols, out)
    )


def make_chunk_udtf(window: int = 64, stride: int = 32):
    """Python UDTF variant (PySpark 4 `udtf`): lateral-joinable,
    for chunkers needing real tokenizers. Returns the UDTF class
    ready for spark.udtf.register / direct call."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        raise ValueError("stride must be <= window")
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class ChunkDocs:
        def eval(self, text: str):  # noqa: D401 - UDTF contract
            if text is None:
                return
            toks = text.strip().split()
            n = len(toks)
            starts = range(0, max(n - window, 0) + stride, stride) if n else [0]
            emitted = 0
            for i, s in enumerate(starts):
                piece = toks[s : s + window]
                if not piece and emitted:
                    break
                yield i, " ".join(piece), len(piece)
                emitted += 1

    return ChunkDocs
