"""Synthesize a scaled-up copy of a driver testdata dir (TESTDATA.md)
for scale-validation benchmarks (VERDICT round-1 ask #8: "bench one
order up and watch for super-linear blow-up").

Replicates every fact table `factor` times with REMAPPED keys
(replica i shifts each surrogate key by i·stride, stride > max key),
so referential joins stay exactly as selective as at the base SF.
Dimension tables region/nation are copied verbatim (TPC-H semantics:
they do not scale).

Content columns are scrambled PER REPLICA so similarity structure
scales linearly:
  * documents.text: per-replica alphabet substitution (seeded random
    permutation; replica 0 is the identity).
    Verbatim copies would give every doc `factor` exact duplicates and
    grow near-dup PAIR counts ~factor² — measuring data blow-up, not
    engine scaling. Rotation keeps intra-replica near-dup structure
    identical and makes cross-replica shingle spaces disjoint.
  * embeddings.embedding: per-replica deterministic dimension
    permutation — norms and intra-replica cosine geometry preserved,
    cross-replica cosines scrambled to ~random.

Usage: python tools/make_scale.py [src_sf_dir] [out_dir] [factor] [tables]
Defaults: /root/testdata/sf0.1  /root/repo/.scale/sf1  10  (all facts;
pass a comma list like "documents,events" to scale a subset)
"""

from __future__ import annotations

import random
import string
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from redskins_rule_spark.session import get_spark  # noqa: E402
from redskins_rule_spark.sources.io import table, write_parquet  # noqa: E402

DIMS = ["region", "nation"]
FACTS = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]

# fact table → columns sharing each key space (remapped with one stride)
KEY_SPACES: dict[str, list[tuple[str, str]]] = {
    "customer": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "supplier": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orders": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "events": [("events", "event_id")],
    "events_user": [("events", "user_id")],
    "documents": [("documents", "doc_id")],
    "embeddings": [("embeddings", "vec_id")],
}

LOWER = string.ascii_lowercase


def _rotated(i: int) -> str:
    """Per-replica alphabet substitution. Replica 0 is the identity;
    others use a seeded random permutation — a rotation (i % 26) would
    repeat at factor > 26, making replicas 0 and 26 byte-identical and
    blowing up near-dup pair counts quadratically."""
    if i == 0:
        return LOWER
    letters = list(LOWER)
    random.Random(i).shuffle(letters)
    return "".join(letters)


def _perm(dim: int, seed: int) -> list[int]:
    p = list(range(dim))
    random.Random(seed).shuffle(p)
    return p


def replicate(
    spark: SparkSession, src: str, out: str, factor: int,
    tables: list[str] | None = None,
) -> None:
    """`tables` restricts which FACT tables are scaled (dims always
    copy verbatim) — the sf100 probe fixture carries only the tables
    its engine-only invariant families read (documents, events), so a
    ×100 decade doesn't pay for 600M lineitem rows no probe scans."""
    facts = FACTS if tables is None else [t for t in FACTS if t in tables]
    unknown = set(tables or []) - set(FACTS)
    if unknown:
        raise ValueError(f"unknown fact tables: {sorted(unknown)}")
    frames = {t: table(spark, src, t) for t in DIMS + facts}

    # one stride per key space, from the data (metadata-only
    # aggregates); key spaces touching unselected tables are skipped
    strides: dict[str, int] = {}
    for space, cols in KEY_SPACES.items():
        live = [(t, c) for t, c in cols if t in frames]
        if not live:
            continue
        mx = max(
            frames[t].agg(F.max(c)).collect()[0][0] or 0 for t, c in live
        )
        strides[space] = int(mx) + 1

    col_stride: dict[tuple[str, str], int] = {
        (t, c): strides[space]
        for space, cols in KEY_SPACES.items()
        if space in strides
        for t, c in cols
        if t in frames
    }

    emb_dim = (len(frames["embeddings"].select("embedding").first()[0])
               if "embeddings" in frames else 0)

    for t in DIMS:
        write_parquet(frames[t], f"{out}/{t}.parquet")
        print(f"[dim] {t}: copied verbatim")

    for t in facts:
        base = frames[t]
        parts: list[DataFrame] = []
        for i in range(factor):
            rep = base
            for (tt, c), stride in col_stride.items():
                if tt == t:
                    rep = rep.withColumn(c, F.col(c) + F.lit(i * stride))
            if t == "documents":
                rep = rep.withColumn(
                    "text", F.translate("text", LOWER, _rotated(i))
                )
            if t == "embeddings":
                p = _perm(emb_dim, seed=i)
                rep = rep.withColumn(
                    "embedding",
                    F.array(*[F.col("embedding")[j] for j in p]).cast(
                        "array<float>"
                    ),
                )
            parts.append(rep)
        full = parts[0]
        for rep in parts[1:]:
            full = full.unionByName(rep)
        write_parquet(full.repartition(32), f"{out}/{t}.parquet")
        print(f"[fact] {t}: ×{factor}")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    spark = get_spark("make_scale")
    replicate(spark, src, out, factor, tables=tables)
    spark.stop()


if __name__ == "__main__":
    main()
