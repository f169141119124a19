"""Skew mitigation — salted joins (SURVEY.md §7.1 #9).

A shuffle join on a key where one value holds a large share of rows
puts that whole key in ONE task: the straggler that stalls a
1000-executor stage. AQE's skew-join splitting handles sort-merge
skew automatically (enabled in session.py); `salted_join` is the
explicit fallback for shapes AQE can't split (e.g. aggregation-after-
join pipelines, or builds where one hot build-side key explodes).

Mechanics: the large side scatters each row into one of `salt`
sub-keys; the small side replicates each row to ALL `salt` sub-keys.
The hot key's rows now land in `salt` tasks instead of one, at the
cost of replicating the small side ×salt.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join `large ⋈ small` on `on`, with the large side salted
    across `salt` sub-keys and the small side replicated to match.

    Semantically identical to `large.join(small, on, how)` for
    inner/left joins (each large row meets each matching small row
    exactly once — it carries one salt value, and the small side has
    exactly one replica per salt value).

    The salt is derived from xxhash64 over the large side's full row —
    deterministic (rerun-stable, resume-safe) yet uncorrelated with
    the join key, which is what spreads a hot key.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    lcols = [c for c in large.columns]
    l_salted = large.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in lcols]), F.lit(salt))
    )
    s_replicated = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)])),
    )
    return l_salted.join(
        s_replicated, on=[*on, SALT_COL], how=how
    ).drop(SALT_COL)


# --- Bloom-filter semi-join pruning ----------------------------------------
#
# At 100 TB the expensive part of `big SEMI JOIN small` is shuffling
# the BIG side; a Bloom filter built from the small side's keys and
# broadcast to the scan prunes non-matching big rows BEFORE the
# shuffle — only candidate rows (matches + εfp false positives) reach
# the join. Spark's runtime row-level filter
# (spark.sql.optimizer.runtime.bloomFilter.enabled) does this
# automatically inside one query; this operator is the EXPLICIT,
# persistable face: the bitmap is an ordinary 1-row DataFrame of
# array<long> words that can be written out and reused across jobs —
# prune tomorrow's scan without re-reading the small side. Hashing is
# seeded xxhash64 (JVM-side, no Python in the row path); no false
# negatives, so prune + re-verify ≡ the exact semi join.

BLOOM_COL = "__bloom"


# literal lookup table for 1 << bit (F.shiftleft takes only a Python
# int for the shift amount); bit 63 is the sign bit in a two's-
# complement long. Built lazily — F.lit needs an active session.
def _bit_masks():
    return F.array(
        *[
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("bigint")
            for i in range(64)
        ]
    )


def _bloom_positions(key, m_bits: int, k: int):
    """k (word-index, bit-mask) struct columns for one key value."""
    v = key.cast("string")
    out = []
    for d in range(k):
        h = F.pmod(F.xxhash64(F.lit(d), v), F.lit(m_bits))
        out.append(
            F.struct(
                F.floor(h / 64).cast("int").alias("w"),
                F.element_at(_bit_masks(), (h % 64).cast("int") + 1).alias("m"),
            )
        )
    return out


def bloom_build(
    small: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 3
) -> DataFrame:
    """1-row DataFrame holding the Bloom bitmap of `small[key_col]`
    as map<word int, bits long> (sparse — only words with set bits).
    Persist it with an ordinary .write to reuse across jobs."""
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos = small.select(
        F.explode(F.array(*_bloom_positions(F.col(key_col), m_bits, k))).alias("p")
    ).select("p.w", "p.m")
    words = pos.groupBy("w").agg(F.bit_or("m").alias("bits"))
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("w", "bits")))
        ).alias(BLOOM_COL)
    )


def bloom_might_contain(bloom, key, m_bits: int = 1 << 16, k: int = 3):
    """Membership test of `key` against a bitmap column — true iff
    every one of the k bits is set (no false negatives)."""
    cond = F.lit(True)
    for p in _bloom_positions(key, m_bits, k):
        word = F.coalesce(F.element_at(bloom, p["w"]), F.lit(0).cast("bigint"))
        cond = cond & (word.bitwiseAND(p["m"]) == p["m"])
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    verify: bool = True,
) -> DataFrame:
    """`big` rows whose key appears in `small` — Bloom-pruned.

    The bitmap rides a broadcast 1-row cross join (bounded:
    m_bits/64 map entries, not data-sized). With verify=True (the
    default) survivors are re-checked by the exact semi join, so the
    result is IDENTICAL to `big.join(small, on=key, how='semi')` —
    the filter only shrinks the shuffle. verify=False returns the
    pruned superset (matches + false positives) for pipelines that
    tolerate εfp and want zero shuffle.
    """
    bloom = bloom_build(small, small_key, m_bits, k)
    pruned = big.join(F.broadcast(bloom)).where(
        bloom_might_contain(F.col(BLOOM_COL), F.col(big_key), m_bits, k)
    ).drop(BLOOM_COL)
    if not verify:
        return pruned
    return pruned.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        on=big_key,
        how="semi",
    )


def bloom_merge(a, b):
    """Word-wise OR of two Bloom bitmaps (map<word,bits>) — Bloom
    filters over the same (m_bits, k) geometry form a semilattice, so
    per-shard/day bitmaps merge losslessly into the union filter
    (streaming face: `streaming.run_incremental_sketch_view`)."""
    return F.map_zip_with(
        a, b,
        lambda _, x, y: F.coalesce(x, F.lit(0).cast("bigint"))
        .bitwiseOR(F.coalesce(y, F.lit(0).cast("bigint"))),
    )
