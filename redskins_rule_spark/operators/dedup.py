"""Deduplication operators for large-scale document corpora.

North-star extension (not in the reference, which only has full-row
`dropDuplicates`, SURVEY.md §2.4 A4): the dedup family a 100 TB
training-data pipeline needs.

Scale design notes:
  * Exact dedup = hash groupBy on a content key — one shuffle, map-side
    partial agg, no sort.
  * MinHash signatures are computed ROW-LOCALLY as Catalyst expressions
    (transform + array_min over the shingle array) — no UDF, no Python.
  * LSH banding turns candidate generation into an equi self-join on
    (band, band_hash): shuffle-hash join with bounded bucket sizes
    (bands shatter hot buckets; AQE skew-split covers residual skew).
    Never an all-pairs cross join.
  * SimHash is likewise expression-only (bit votes via filter/size over
    the hashed token array) and candidates come from 16-bit chunk
    matching (pigeonhole: hamming ≤ 3 ⇒ one of 4 chunks equal).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from redskins_rule_spark.functions.hashing import (
    _M64,
    hashed,
    hashed_py,
    minhash_signature,
    shingles,
    simhash_token_hash_xengine,
    simhash_token_hash_xengine_py,
    word_shingles,
)

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup (hash aggregate). `subset=None` = full row."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def content_key(col: Column | str) -> Column:
    """Stable content hash for exact text dedup (md5 hex — also
    computable by any SQL oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def dedup_by_content(
    df: DataFrame, text_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Keep one representative id per identical text; emits
    (content_hash, keep_id, dup_count). One hash-agg shuffle.

    Null-text rows are excluded: md5(null) is null, and grouping all
    null-content rows as mutual "duplicates" would silently drop
    unrelated documents."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.where(F.col(text_col).isNotNull())
        .groupBy(content_key(text_col).alias("content_hash"))
        .agg(agg.alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


# ---------------------------------------------------------------------------
# shared candidate-generation primitive
# ---------------------------------------------------------------------------


def pairs_from_posting_lists(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    payload_col: str | None = None,
    max_postings: int | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs that share a bucket key — the candidate
    step of every LSH/inverted-index dedup operator.

    Instead of a self equi-join (which plans the bucket-computation
    pipeline TWICE — broadcast joins have no exchange to reuse — and
    shuffles both sides), group once per key into a sorted posting
    list, then generate the within-list pairs expression-side
    (two-arg `transform` + slice) and explode. One shuffle, the
    upstream pipeline evaluated once.

    Skew: a key with p postings emits p·(p-1)/2 pairs in ONE task.
    `max_postings` is the hot-bucket cap (document-frequency cut):
    buckets with more postings are dropped WHOLE before pair
    generation — at 100 TB a stop-gram/hot-LSH bucket would otherwise
    OOM its task. Recall contract: a pair is lost only if EVERY bucket
    it shares is capped; callers with multiple buckets per item
    (bands, chunks, grams) keep any pair that also shares a sub-cap
    bucket. Capped buckets carry ~no similarity signal (a key shared
    by thousands of items doesn't discriminate), which is why the cut
    is the standard scale lever. Default None = exact (no cut).

    With `payload_col`, each side's payload rides along as
    `payload_a` / `payload_b` (for verify steps that need signatures
    without another join).
    """
    if payload_col is None:
        item = F.col(id_col).alias("id")
        pair = lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b"))  # noqa: E731
        out = ["p.id_a", "p.id_b"]
    else:
        item = F.struct(F.col(id_col).alias("id"), F.col(payload_col).alias("pl"))
        pair = lambda x, y: F.struct(  # noqa: E731
            x["id"].alias("id_a"),
            y["id"].alias("id_b"),
            x["pl"].alias("payload_a"),
            y["pl"].alias("payload_b"),
        )
        out = ["p.id_a", "p.id_b", "p.payload_a", "p.payload_b"]
    if max_postings is not None and max_postings < 2:
        raise ValueError(f"max_postings must be >= 2, got {max_postings}")
    ids = F.array_sort(F.collect_list(item))
    grouped = (
        df.groupBy(*key_cols).agg(ids.alias("__ids")).where(F.size("__ids") > 1)
    )
    if max_postings is not None:
        grouped = grouped.where(F.size("__ids") <= max_postings)
    return _pairs_within_lists(grouped, pair, out)


def _pairs_within_lists(grouped: DataFrame, pair, out: list[str]) -> DataFrame:
    """Explode all (i < j) pairs from each row's sorted `__ids` array,
    expression-side (two-arg transform + shifted slice) — no join."""
    lst = F.col("__ids")
    pairs = F.flatten(
        F.transform(
            lst,
            lambda x, i: F.transform(
                F.slice(lst, i + 2, F.size(lst)), lambda y: pair(x, y)
            ),
        )
    )
    return grouped.select(F.explode(pairs).alias("p")).select(*out)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def with_minhash(
    df: DataFrame,
    text_col: str,
    shingle_k: int = 5,
    num_perm: int = 64,
    out: str = "minhash",
    shingle_out: str | None = None,
) -> DataFrame:
    """Attach a MinHash signature column (array<bigint>, row-local)."""
    sh = F.array_distinct(shingles(text_col, shingle_k))
    if shingle_out:
        df = df.withColumn(shingle_out, sh)
        sh = F.col(shingle_out)
    return df.withColumn(out, minhash_signature(sh, num_perm))


def lsh_candidates(
    df: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    num_perm: int = 64,
    bands: int = 16,
    max_postings: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) via LSH banding.

    Signature is sliced into `bands` bands of num_perm/bands rows;
    a pair collides if ANY band hashes equal. Plan: explode to one row
    per (id, band, band_hash) → self equi-join on (band, band_hash)
    → distinct pairs. Probability of catching a pair with Jaccard s is
    1-(1-s^r)^b (r=rows/band).

    `max_postings` drops hot band-buckets whole (see
    `pairs_from_posting_lists`); with b bands a true near-dup pair
    survives unless all b of its shared buckets are hot.
    """
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    r = num_perm // bands
    sig = F.col(sig_col)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[sig[b * r + i] for i in range(r)]).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    exploded = (
        df.select(F.col(id_col), F.explode(band_structs).alias("bb"))
        .select(id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash"))
    )
    return (
        pairs_from_posting_lists(
            exploded, ["band", "band_hash"], id_col, max_postings=max_postings
        )
        .distinct()
    )


def jaccard(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(set_a, set_b))
    union = F.size(F.array_union(set_a, set_b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    max_postings: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified with exact Jaccard
    over the shingle sets. Output: (id_a, id_b, jaccard_sim)."""
    base = with_minhash(
        df.select(id_col, text_col), text_col, shingle_k, num_perm,
        shingle_out="__sh",
    ).select(id_col, "__sh", "minhash")
    # empty shingle sets (null/short text) carry all-null signatures —
    # one shared band value that would pair every such doc with every
    # other (O(p²) in one posting list). Same guard the n-gram ops use.
    base = base.where(F.size("__sh") > 0)
    cands = lsh_candidates(base, id_col, "minhash", num_perm, bands, max_postings)
    sa = base.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"))
    sb = base.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("__sh_a"), F.col("__sh_b")))
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 4).alias("jaccard_sim"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, with cheap blocking)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    block_perms: int = 2,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity over candidate pairs.

    Blocking: a pair is a candidate if it shares the MINIMUM shingle
    hash under any of `block_perms` permutations (1-row MinHash bands)
    — recall equals 1-(1-s)^p for Jaccard s, and each block key is a
    single equi-join key (no cross join).
    """
    grams = F.array_distinct(word_shingles(text_col, n))
    base = df.select(F.col(id_col), grams.alias("__g")).where(F.size("__g") > 0)
    def block_hash(p: int):
        return lambda s: hashed(s, 1000 + p)

    blocks = base.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(p).alias("perm"),
                    F.array_min(F.transform(F.col("__g"), block_hash(p))).alias("bkey"),
                )
                for p in range(block_perms)
            ])
        ).alias("b"),
    ).select(id_col, "b.perm", "b.bkey")
    cands = pairs_from_posting_lists(blocks, ["perm", "bkey"], id_col).distinct()
    ga = base.select(F.col(id_col).alias("id_a"), F.col("__g").alias("__ga"))
    gb = base.select(F.col(id_col).alias("id_b"), F.col("__g").alias("__gb"))
    return (
        cands.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("__ga"), F.col("__gb")))
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 4).alias("jaccard_sim"))
    )


def ngram_jaccard_pairs_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT word-n-gram Jaccard pairs via an inverted gram index —
    no false negatives (any pair with Jaccard > 0 shares ≥1 gram, so
    the shared-gram equi-join enumerates a superset of qualifying
    pairs; the exact Jaccard filter finishes the job).

    Scale: the per-gram posting lists bound the join fan-out; hot
    grams (stopword n-grams) are the skew hazard. `max_df` is the
    document-frequency cut: grams appearing in more than `max_df`
    docs are removed from the gram UNIVERSE (posting lists, pair
    counts, AND set sizes), so the result is exact Jaccard over the
    df-filtered gram space — the standard stop-gram semantic, not a
    lossy candidate cap. A df-cut gram carries ~no similarity signal
    (shared by construction), while bounding the hottest posting
    list — and with it the worst single-task pair fan-out — to
    max_df·(max_df−1)/2. Default None = full gram space.
    """
    inter, sizes = _gram_intersections(df, id_col, text_col, n, max_df)
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    # no broadcast hint: sizes is one row per doc — tiny at test SF
    # (AQE broadcasts it), shuffle-joined at 100 TB.
    union_size = F.col("__na") + F.col("__nb") - F.col("__ninter")
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard_sim", F.col("__ninter") / union_size)
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 4).alias("jaccard_sim"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric gram-CONTAINMENT pairs: max(|A∩B|/|A|, |A∩B|/|B|)
    over word-n-gram sets — catches snippet INCLUSION (a short doc
    embedded in a long one), which symmetric Jaccard dilutes away.
    Same inverted-index count-verify machinery and `max_df` stop-gram
    cut as `ngram_jaccard_pairs_exact`."""
    inter, sizes = _gram_intersections(df, id_col, text_col, n, max_df)
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    cont = F.greatest(
        F.col("__ninter") / F.col("__na"), F.col("__ninter") / F.col("__nb")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment", cont)
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 4).alias("containment"))
    )


def word_ngram_minhash_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_perm: int = 8,
) -> DataFrame:
    """(id, g, sig) per doc — the distinct word-n-gram array plus its
    x-engine MinHash signature — as ONE Arrow-batched map, replacing
    the expression pipeline
    `array_distinct(word_shingles(text, n))` +
    `minhash_signature_xengine(g, num_perm)` (guide §4.2: the
    zip_with shingle chain, per-CHAR poly_hash fold and per-shingle
    affine-min aggregate are all interpreted HOFs; here they are
    C-level split/join, a memoized integer fold, and one NumPy
    (num_perm × grams) affine-min).

    Emission contract (equivalence-tested vs the expression pipeline,
    tests/test_dedup.py):
      * tokens/grams exactly as `distinct_word_ngram_rows` (trim 0x20,
        Java-regex \\s+ → re.ASCII split, first-occurrence-order
        distinct n-grams);
      * `poly_hash_py` per gram (memoized — gram space is
        vocabulary-bounded), sig[k] = min over grams of
        (a_k·h + b_k) mod M31 (`MINHASH_AFFINE`);
      * docs with NULL text or < n tokens emit NOTHING — the callers'
        `where(size(g) > 0)` guard, folded in.
    """
    import re
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from redskins_rule_spark.functions.hashing import (
        MERSENNE_31,
        MINHASH_AFFINE,
        poly_hash_py,
    )

    if num_perm > len(MINHASH_AFFINE):
        raise ValueError(
            f"num_perm ≤ {len(MINHASH_AFFINE)} for the x-engine family"
        )
    a_vec = np.array([a for a, _ in MINHASH_AFFINE[:num_perm]], dtype=np.int64)
    b_vec = np.array([b for _, b in MINHASH_AFFINE[:num_perm]], dtype=np.int64)
    ws = re.compile(r"\s+", re.ASCII)
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("g", T.ArrayType(T.StringType())),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        memo: dict[str, int] = {}

        def ph(g: str) -> int:
            v = memo.get(g)
            if v is None:
                if len(memo) > 1_000_000:  # vocabulary safety valve
                    memo.clear()
                v = memo[g] = poly_hash_py(g)
            return v

        for pdf in batches:
            ids, gs, sigs = [], [], []
            for i, text in zip(pdf[id_col].values, pdf[text_col]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                toks = ws.split(str(text).strip(" "))
                if len(toks) < n:
                    continue
                grams = list(
                    dict.fromkeys(
                        " ".join(toks[j : j + n])
                        for j in range(len(toks) - n + 1)
                    )
                )
                h = np.fromiter(
                    (ph(g) for g in grams), dtype=np.int64, count=len(grams)
                )
                sig = (
                    (a_vec[:, None] * h[None, :] + b_vec[:, None])
                    % MERSENNE_31
                ).min(axis=1)
                ids.append(i)
                gs.append(grams)
                sigs.append(sig.tolist())
            if not ids:  # empty frame: pandas guesses float64 columns,
                continue  # which Arrow can't cast to list<string>
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "g": pd.Series(gs, dtype=object),
                    "sig": pd.Series(sigs, dtype=object),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def distinct_word_ngram_rows(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram) rows — one row per DISTINCT word-n-gram per doc —
    as an Arrow-batched map, replacing the expression pipeline
    `explode(array_distinct(word_shingles(text)))`.

    Why Python here (guide §4.2): every piece of the expression form
    (`zip_with` chain, `transform`, `array_distinct` over per-row
    arrays) is a Catalyst higher-order function, which is interpreted
    per ELEMENT — never whole-stage-codegen'd. Stage-level measurement
    (q19, sf0.1): the tokenize+shingle+distinct+explode scan stage
    burned 18.2 s of task CPU for 5 000 docs (~3.6 ms/doc). The same
    work as CPython string ops over Arrow batches is C-level
    split/join (~10 µs/doc). Row-local, embarrassingly parallel,
    cardinality-changing — exactly the `mapInPandas` contract.

    Tokenization is BIT-IDENTICAL to `word_shingles` + the oracle's
    `_SQL_TOKENS` (equivalence-tested on the corpus at three SFs):
      * `F.trim` strips 0x20 only         → `text.strip(' ')`
      * Java-regex `\\s+` split, limit −1 → `re.split` with
        `re.ASCII` (`\\s` = [ \\t\\n\\x0B\\f\\r] in BOTH engines;
        leading/trailing empty tokens survive identically)
      * k-grams joined with one space; per-doc de-dup (row SET —
        downstream consumers aggregate, so emission order is free)
      * NULL text / <n tokens → zero rows (callers that need the
        empty-gram guard get it for free: such docs emit nothing)
    """
    import re
    from collections.abc import Iterator as _It

    import pandas as pd
    from pyspark.sql import types as T

    ws = re.compile(r"\s+", re.ASCII)
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("gram", T.StringType())]
    )

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            grams: list[str] = []
            for i, text in zip(pdf[id_col].values, pdf[text_col]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                toks = ws.split(str(text).strip(" "))
                if len(toks) < n:
                    continue
                seen = {
                    " ".join(toks[j : j + n])
                    for j in range(len(toks) - n + 1)
                }
                ids.extend([i] * len(seen))
                grams.extend(seen)
            yield pd.DataFrame({id_col: ids, "gram": grams})

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def _gram_intersections(df, id_col, text_col, n, max_df):
    """Shared core of the exact set-overlap dedup family: ->
    (inter DF[id_a, id_b, __ninter], sizes DF[id, __n]) over the
    (optionally df-cut) distinct word-n-gram universe.

    Count-based verification: grams are distinct per doc, so the
    number of shared-gram co-occurrences per pair IS |A ∩ B| — no
    need to re-join the full gram arrays per candidate or run
    array_intersect. Candidates come from per-gram posting lists
    (one shuffle, gram pipeline evaluated once)."""
    inv = distinct_word_ngram_rows(df, id_col, text_col, n)
    if max_df is not None:
        if max_df < 2:
            raise ValueError(f"max_df must be >= 2, got {max_df}")
        # fold the df-cut INTO the posting-list grouping (list length IS
        # document frequency) — no separate df agg + gram join; doc set
        # sizes over the filtered universe come from re-exploding the
        # kept lists (an identical grouped subtree Catalyst reuses)
        posts = (
            inv.groupBy("gram")
            .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("__ids"))
            .where(F.size("__ids") <= max_df)
        )
        sizes = (
            posts.select(F.explode("__ids").alias(id_col))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        pair = lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b"))  # noqa: E731
        inter = (
            _pairs_within_lists(
                posts.where(F.size("__ids") > 1), pair, ["p.id_a", "p.id_b"]
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("__ninter"))
        )
    else:
        # derive BOTH pair counts and doc set sizes from the SAME
        # posting-list aggregate: the two consumers' plans are identical
        # up to the gram exchange, so Spark's ReusedExchange evaluates
        # the gram pipeline (tokenize + shingle + distinct + explode —
        # the dominant per-row CPU of this family) and its shuffle ONCE.
        # The previous shape re-evaluated `base` for sizes and again per
        # join side: three full-corpus gram passes (r13, guide §2.4).
        # sizes equivalence: each of a doc's distinct grams lands in
        # exactly one posting list, so counting the doc's posting-list
        # memberships IS size(__g).
        posts = inv.groupBy("gram").agg(
            F.array_sort(F.collect_list(F.col(id_col))).alias("__ids")
        )
        sizes = (
            posts.select(F.explode("__ids").alias(id_col))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        pair = lambda x, y: F.struct(x.alias("id_a"), y.alias("id_b"))  # noqa: E731
        inter = (
            _pairs_within_lists(
                posts.where(F.size("__ids") > 1), pair, ["p.id_a", "p.id_b"]
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("__ninter"))
        )
    return inter, sizes


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs with PPJoin-style prefix filtering —
    same output as `ngram_jaccard_pairs_exact`, far fewer candidates.

    Prefix-filter theorem: order every doc's grams by one global total
    order (here: ascending document frequency, then gram). If
    J(A,B) ≥ t then A and B must share a gram within each one's first
    |X| − ⌈t·|X|⌉ + 1 grams. So indexing ONLY those prefix grams loses
    no qualifying pair, and rare-gram-first ordering makes the indexed
    posting lists the SHORT ones — the hot stopword-gram lists that
    dominate the full inverted index's join fan-out are exactly what
    the prefix drops. Costs one extra df-count aggregate, a per-doc
    window sort, and an array-based verify join.

    Measured trade (sf0.1 synthetic corpus, near-uniform grams):
    SLOWER than `ngram_jaccard_pairs_exact` (11.7s vs 4.0s) — that
    corpus's full-index fan-out is already cheap. Choose this variant
    when grams are Zipfian (real text at scale) so the df-cut removes
    majority-mass posting lists; the exact variant otherwise. Output
    is bit-identical either way (equivalence-tested).
    """
    grams = F.array_distinct(word_shingles(text_col, n))
    base = df.select(F.col(id_col), grams.alias("__g")).where(F.size("__g") > 0)
    inv = base.select(id_col, F.explode("__g").alias("gram"))
    dfreq = inv.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    w_doc = Window.partitionBy(id_col)
    ranked = (
        inv.join(dfreq, "gram")
        .withColumn("__pos", F.row_number().over(w_doc.orderBy("__df", "gram")))
        .withColumn("__tot", F.count(F.lit(1)).over(w_doc))
    )
    prefix_len = F.col("__tot") - F.ceil(F.lit(threshold) * F.col("__tot")) + 1
    pref = ranked.where(F.col("__pos") <= prefix_len).select(id_col, "gram")
    cands = pairs_from_posting_lists(pref, ["gram"], id_col).distinct()
    ga = base.select(F.col(id_col).alias("id_a"), F.col("__g").alias("__ga"))
    gb = base.select(F.col(id_col).alias("id_b"), F.col("__g").alias("__gb"))
    return (
        cands.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("__ga"), F.col("__gb")))
        .where(F.col("jaccard_sim") >= threshold)
        .select("id_a", "id_b", F.round("jaccard_sim", 4).alias("jaccard_sim"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text_col: Column | str, bits: int = 64) -> Column:
    """64-bit SimHash of the whitespace-token set — expression-only.

    Each token hashes to 64 bits; bit j of the SimHash is the majority
    vote of bit j across token hashes. Row-local: no explode, no
    shuffle. Bitwise-OR assembly avoids ANSI overflow on bit 63.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.array_distinct(F.split(F.trim(c), r"\s+"))
    hs = F.transform(toks, lambda t: hashed(t, 7))
    n = F.size(hs)

    def bit_set(j: int):
        return lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1

    terms = [
        F.when(
            F.size(F.filter(hs, bit_set(j))) * 2 > n,
            F.shiftleft(F.lit(1).cast("long"), j),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(bits)
    ]
    return reduce(lambda x, y: x.bitwiseOR(y), terms).alias("simhash")


def with_simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out: str = "__sim",
    bits: int = 64,
    hash_expr=None,
) -> DataFrame:
    """SimHash per row via explode + grouped bit votes — the scale
    path. Produces bit-identical signatures to `simhash()` but runs
    the 64 per-bit majority votes as codegen'd SUM aggregates over
    exploded token hashes instead of 64 interpreted higher-order
    filter passes per row (~4× on the sf0.1 corpus). One shuffle on
    id_col; rows whose id is required downstream ride the same
    partitioning.

    Divergence from `simhash()`: null-text rows are DROPPED (explode
    of a null token array emits nothing) rather than signed 0 —
    correct for dedup (a null doc is not a near-duplicate of other
    null docs).

    `hash_expr` maps a token Column to its hash Column (default: the
    xxhash64 family). Pass a cross-engine-deterministic hash (e.g.
    `functions.hashing.char_fingerprint`, 31 bits) with a matching
    `bits` to make signatures reproducible by a SQL oracle.
    """
    token_hash_py = None
    if hash_expr is None:
        token_hash_py = lambda t: hashed_py(t, 7)  # noqa: E731
        hash_expr = lambda t: hashed(t, 7)  # noqa: E731
    elif hash_expr is simhash_token_hash_xengine:
        token_hash_py = simhash_token_hash_xengine_py
    if token_hash_py is not None:
        return _simhash_arrow(df, id_col, text_col, out, bits, token_hash_py)
    # unknown hash family: the expression pipeline (explode + per-bit
    # SUM votes) stays the general path
    c = F.col(text_col)
    toks = F.array_distinct(F.split(F.trim(c), r"\s+"))
    ex = df.select(F.col(id_col), F.explode(toks).alias("__t")).select(
        id_col, hash_expr(F.col("__t")).alias("__h")
    )
    votes = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1))).alias(f"__b{j}")
            for j in range(bits)
        ],
    )
    terms = [
        F.when(
            F.col(f"__b{j}") * 2 > F.col("__n"),
            F.shiftleft(F.lit(1).cast("long"), j),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(bits)
    ]
    sig = reduce(lambda x, y: x.bitwiseOR(y), terms)
    return votes.select(F.col(id_col), sig.alias(out))


def _simhash_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out: str,
    bits: int,
    token_hash_py,
) -> DataFrame:
    """Arrow-batched SimHash signatures: per doc, tokenize + hash +
    the `bits` majority votes in one `mapInPandas` pass (guide §4.2 —
    the expression form pays interpreted HOFs for tokenize/distinct
    plus a token-explode shuffle into a 65-column vote aggregate; this
    computes the identical signature row-locally with NumPy bit math
    and REMOVES that shuffle: one less Exchange in the plan).

    Signature-equivalence contract (tests/test_dedup.py
    pins it on the corpus + adversarial unicode):
      * tokens: `trim(' ')` then Java-regex `\\s+` split limit −1 →
        `re.split(r"\\s+", s.strip(' '))` with `re.ASCII`; the DISTINCT
        token set votes (array_distinct semantics);
      * token hash: `hashed_py` / `simhash_token_hash_xengine_py`, the
        equivalence-tested pure-Python twins of the JVM families —
        memoized per task (vocabulary-bounded; bursty corpora reuse
        tokens heavily);
      * bit j of the signature set iff 2·(votes for bit j) > n_tokens,
        packed exactly like the expression's shiftleft/bitwiseOR fold
        (uint64 wraparound = the JVM's signed-long overflow);
      * NULL text emits nothing (the explode semantics).
    """
    import re
    from collections.abc import Iterator as _It

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    ws = re.compile(r"\s+", re.ASCII)
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField(out, T.LongType())]
    )
    shifts = np.arange(bits, dtype=np.uint64)

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        memo: dict[str, int] = {}

        def h(t: str) -> int:
            v = memo.get(t)
            if v is None:
                if len(memo) > 1_000_000:  # vocabulary safety valve
                    memo.clear()
                # store the UNSIGNED bit pattern: np.uint64 arrays
                # reject negative Python ints, and only bits matter
                v = memo[t] = token_hash_py(t) & _M64
            return v

        for pdf in batches:
            ids, counts, flat = [], [], []
            for i, text in zip(pdf[id_col].values, pdf[text_col]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                toks = set(ws.split(str(text).strip(" ")))
                ids.append(i)
                counts.append(len(toks))
                flat.extend(h(t) for t in toks)
            if not ids:  # yielding nothing is cheaper and dtype-safe
                continue
            harr = np.array(flat, dtype=np.uint64)
            bitmat = ((harr[:, None] >> shifts) & np.uint64(1)).astype(
                np.int64
            )
            offsets = np.concatenate(
                ([0], np.cumsum(counts[:-1], dtype=np.int64))
            )
            votes = np.add.reduceat(bitmat, offsets, axis=0)
            n = np.asarray(counts, dtype=np.int64)[:, None]
            major = (votes * 2 > n).astype(np.uint64)
            sig = (major << shifts).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame({id_col: ids, out: sig.view(np.int64)})

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_postings: int | None = None,
    bits: int = 64,
    hash_expr=None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the `bits`-bit signature into
    `max_hamming + 1` near-equal chunks; distance ≤ max_hamming ⇒ at
    least one chunk identical (a pair differing in ≤ k bits cannot
    touch all k+1 chunks), so candidates come from an equi self-join
    on (chunk_idx, chunk_value) — blocking is LOSSLESS for the
    requested distance, for ANY max_hamming up to bits/4 - 1. More
    chunks mean narrower chunk values and hotter buckets (e.g.
    max_hamming=7 → 8-bit chunks → ≤256 distinct values), which is
    where `max_postings` (see `pairs_from_posting_lists`) comes in;
    the bound keeps chunks ≥ 4 bits.

    `bits`/`hash_expr` select the signature family (see
    `with_simhash`): default 64-bit xxhash64; pass 31 +
    `char_fingerprint` for the cross-engine-deterministic variant.
    Output: (id_a, id_b, hamming).
    """
    if not 0 <= max_hamming <= bits // 4 - 1:
        raise ValueError(
            f"max_hamming must be in [0, {bits // 4 - 1}] for a {bits}-bit "
            f"signature (chunks need >= 4 bits to block usefully), got "
            f"{max_hamming}"
        )
    n_chunks = max_hamming + 1
    # near-equal split of the bits: first (bits % n_chunks) chunks get
    # one extra bit
    widths = [
        bits // n_chunks + (1 if i < bits % n_chunks else 0) for i in range(n_chunks)
    ]
    starts = [sum(widths[:i]) for i in range(n_chunks)]

    def chunk_val(i: int) -> Column:
        if widths[i] == 64:
            return F.col("__sim")
        mask = (1 << widths[i]) - 1
        return F.shiftright(F.col("__sim"), starts[i]).bitwiseAND(F.lit(mask))

    base = with_simhash(df, id_col, text_col, out="__sim", bits=bits, hash_expr=hash_expr)
    chunks = base.select(
        id_col,
        "__sim",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("ci"), chunk_val(i).alias("cv"))
                for i in range(n_chunks)
            ])
        ).alias("c"),
    ).select(id_col, "__sim", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    # posting-list pair generation with the signature riding along as
    # payload: one shuffle, signatures computed once, no verify join
    return (
        pairs_from_posting_lists(
            chunks, ["ci", "cv"], id_col, payload_col="__sim",
            max_postings=max_postings,
        )
        .select(
            "id_a",
            "id_b",
            hamming64(F.col("payload_a"), F.col("payload_b")).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int | None = None,
    max_postings: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Candidates: random-hyperplane LSH — sign bit per plane, bucket =
    the n_planes-bit code; high-cosine pairs land in the same bucket
    with probability (1 - θ/π)^n_planes. Hyperplane weights are ±1
    from Python's (deterministic-for-ints) tuple hash over (plane,
    dim), baked into the plan as LITERALS at build time — rerun-stable
    within CPython, but driver-supplied constants, not an
    engine-recomputable expression. Verification: exact cosine on
    candidates via one posting-list pass per bucket (signature/bucket
    pipeline evaluated once; each doc has exactly one bucket, so pairs
    are already unique).

    `dim` may be passed explicitly; otherwise it is inferred from the
    first row (one small eager job at plan-build time).
    """
    from redskins_rule_spark.operators.similarity import cosine

    if dim is None:
        head = df.select(vec_col).head(1)
        if not head or head[0][0] is None:
            raise ValueError(
                f"cannot infer embedding dim from empty/null {vec_col!r}; "
                "pass dim= explicitly"
            )
        dim = len(head[0][0])
    v = F.col(vec_col).cast("array<double>")

    def sign_bit(p: int) -> Column:
        terms = [
            F.when(
                F.lit((hash((p, d)) >> 1) & 1) == 1, v[d]
            ).otherwise(-v[d])
            for d in range(dim)
        ]
        dot = reduce(lambda x, y: x + y, terms)
        return F.when(dot >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))

    bucket = reduce(lambda x, y: x.bitwiseOR(y), [sign_bit(p) for p in range(n_planes)])
    coded = df.select(F.col(id_col), F.col(vec_col), bucket.alias("__bucket"))
    # NOTE: each doc lives in exactly ONE bucket here, so a capped hot
    # bucket loses ALL its pairs (no alternate bucket rescues them) —
    # prefer raising n_planes to shatter hot buckets; use max_postings
    # only as an OOM guard of last resort.
    pairs = pairs_from_posting_lists(
        coded, ["__bucket"], id_col, payload_col=vec_col,
        max_postings=max_postings,
    )
    sim = cosine(F.col("payload_a"), F.col("payload_b"))
    return (
        pairs.withColumn("__cos", sim)
        # threshold on the UNROUNDED value (rounding first would admit
        # below-threshold pairs, e.g. 0.94996 → 0.95)
        .where(F.col("__cos") >= threshold)
        .select("id_a", "id_b", F.round("__cos", 4).alias("cos_sim"))
    )


def fuzzy_pairs_edit1(df: DataFrame, col: str) -> DataFrame:
    """Record-linkage fuzzy join: all pairs of DISTINCT `col` values at
    Levenshtein distance exactly 1, via the FastSS deletion
    neighborhood — never an all-pairs comparison.

    Candidate key set per string = {itself} ∪ {every 1-deletion}. Two
    strings at distance 1 always share a key (a deletion equals the
    other string, or substitution at i makes their i-deletions equal),
    so the equi join on keys is a LOSSLESS candidate generator; the
    codegen'd `levenshtein` verify then keeps true positives only.

    At scale: candidate volume is Σ(len+1) keys — one shuffle keyed by
    short strings; for corpora with heavy-tailed key collisions (very
    short strings), apply the posting-list frequency cut first
    (`pairs_from_posting_lists` pattern).

    Output: (name_a, name_b), name_a < name_b, deduplicated.
    """
    s = df.select(F.col(col).alias("s")).where(F.col("s").isNotNull()).distinct()
    keys = F.array_distinct(
        F.array_union(
            F.array(F.col("s")),
            F.expr(
                "transform(sequence(1, length(s)), "
                "i -> concat(substring(s, 1, i-1), substring(s, i+1, length(s))))"
            ),
        )
    )
    inv = s.select("s", F.explode(keys).alias("k"))
    a = inv.select(F.col("s").alias("name_a"), "k")
    b = inv.select(F.col("s").alias("name_b"), "k")
    return (
        a.join(b, "k")
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .where(F.levenshtein("name_a", "name_b") == 1)
    )


def keep_best_per_cluster(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality_col,
    id_a: str = "id_a",
    id_b: str = "id_b",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The dedup pass a curation pipeline actually runs: collapse
    near-dup PAIRS into clusters and pick ONE survivor per cluster by
    a quality signal (highest `quality_col`, ties to the smallest id —
    fully deterministic, unlike "keep first seen").

    Returns DataFrame[cluster_id, kept_id, kept_quality, cluster_size]
    for multi-document clusters only (singletons survive trivially and
    are corpus-sized — callers anti-join the losers instead).

    Plan shape: pointer-jumping components over the pairs (edge-sized,
    not corpus-sized), one broadcast-ready join back to the docs for
    the quality column, then ONE hash aggregate (`max_by` on the
    (quality, -id) struct) — no window, no sort, map-side combinable.
    """
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.graph import dedup_clusters

    cl = dedup_clusters(
        pairs, id_a=id_a, id_b=id_b, checkpoint_dir=checkpoint_dir
    )
    q = F.col(quality_col) if isinstance(quality_col, str) else quality_col
    labeled = cl.join(
        docs.select(F.col(id_col).alias("id"), q.alias("_q")), "id"
    )
    key = F.struct(F.col("_q"), (-F.col("id")).alias("_negid"))
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.max_by("id", key).alias("kept_id"),
            F.max("_q").alias("kept_quality"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .where(F.col("cluster_size") >= 2)
    )


def incremental_dedup_lsh(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 8,
    threshold: float = 0.8,
    max_postings: int | None = 64,
) -> DataFrame:
    """Incremental near-dup check: screen an incoming BATCH against an
    existing CORPUS without ever comparing corpus×corpus or new×new —
    the only dedup shape that works at 100 TB, where re-clustering the
    whole corpus per ingest is off the table. The corpus side of the
    pipeline (signatures + band index) is a pure function of the
    corpus, so production persists it once and every batch joins
    against the saved index.

    Plan: x-engine minhash signatures both sides → equi join of new
    band values against corpus band postings (hot corpus buckets
    > `max_postings` dropped whole — the familiar recall/scale lever)
    → exact-Jaccard verify on shingle sets → per-new-doc argmax.
    Returns ONE row per new doc: is_dup, best_match /
    best_sim (null when novel), n_matches. New docs with empty
    shingle sets are novel by definition.
    """
    def bands(df: DataFrame, out_id: str) -> DataFrame:
        # grams + x-engine signature in ONE Arrow pass (r13 opt; the
        # expression pipeline is interpreted per element — see
        # word_ngram_minhash_rows)
        rows = word_ngram_minhash_rows(df, id_col, text_col, 3, num_perm)
        sigs = rows.select(
            F.col(id_col).alias(out_id),
            F.col("g").alias(f"_g_{out_id}"),
            F.col("sig").alias("_sig"),
        )
        base = sigs.select(out_id, f"_g_{out_id}")
        return base, sigs.select(
            out_id,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"), F.col("_sig")[i].alias("sv")
                        )
                        for i in range(num_perm)
                    ]
                )
            ).alias("b"),
        ).select(out_id, F.col("b.i").alias("i"), F.col("b.sv").alias("sv"))

    new_base, new_bands = bands(new_df, "new_id")
    corpus_base, corpus_bands = bands(corpus_df, "corpus_id")
    if max_postings is not None:
        cool = (
            corpus_bands.groupBy("i", "sv")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_postings)
            .select("i", "sv")
        )
        corpus_bands = corpus_bands.join(cool, ["i", "sv"])
    cand = (
        new_bands.join(corpus_bands, ["i", "sv"])
        .select("new_id", "corpus_id")
        .distinct()
    )
    verified = (
        cand.join(new_base, "new_id")
        .join(corpus_base, "corpus_id")
        .withColumn("_sim", jaccard(F.col("_g_new_id"), F.col("_g_corpus_id")))
        .where(F.col("_sim") >= threshold)
    )
    best = verified.groupBy("new_id").agg(
        F.max_by(
            "corpus_id", F.struct(F.col("_sim"), (-F.col("corpus_id")))
        ).alias("best_match"),
        F.round(F.max("_sim"), 4).alias("best_sim"),
        F.count(F.lit(1)).alias("n_matches"),
    )
    return (
        new_df.select(F.col(id_col).alias("new_id"))
        .join(best, "new_id", "left")
        .select(
            "new_id",
            F.col("best_match").isNotNull().alias("is_dup"),
            "best_match",
            "best_sim",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
        )
    )
