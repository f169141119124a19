"""Synthesize a SKEWED copy of a driver testdata dir (VERDICT r6
item 2): same row counts as the source, Zipf-shaped distributions.

Uniform replication (make_scale.py) can never find skew failures —
every probe so far had uniform keys, doc lengths, and bucket sizes,
while a real 100 TB corpus is Zipfian. This fixture plants one
deliberate hot spot per operator family, deterministically:

  * orders    — customer 1 absorbs ~20% of all orders
                (o_orderkey % 5 == 0): groupBy/argmax/window-by-
                customer and the customer⋈orders join see a hot key.
  * lineitem  — part 1 absorbs ~20% of line items
                (l_orderkey % 5 == 0): part-side joins and part-grain
                aggregates see a hot key (order keys untouched, so
                orders⋈lineitem fanout stays realistic).
  * events    — user 1 absorbs ~1/3 of all events
                (event_id % 3 == 0): user-keyed windows/sessionization
                see one giant partition key.
  * documents — power-law lengths: 2% of docs 30x longer, a further
                8% 5x longer (explode/shingle row skew follows doc
                length); plus 2% of docs (doc_id % 53 == 1) share ONE
                identical text — a hot content-hash group, a hot
                MinHash/SimHash bucket, and maximal-overlap passages.
  * embeddings — 10% of vectors (vec_id % 10 == 0) share one
                DIRECTION (scaled copies of a base vector): they
                collide in EVERY SRP band and the same IVF cell — the
                one-hot-LSH-band scenario (norms differ so exact-dup
                screens don't collapse them).
  * region/nation/customer/supplier/part — copied verbatim.

Probe: tools/scale_report.py --base /root/testdata/sf0.1 \
    --scaled .scale/skew-dir --factor 1 --max-ratio R --only ...
(factor 1: the fixture is the SAME nominal size — the wall ratio vs
the uniform fixture isolates the cost of the distribution, not of
volume. Pair emitters legitimately grow with the true pair count the
hot spots create; ratios there must be read against the planted
bucket sizes, not 1.0.)

Usage: python tools/make_skew.py [src_sf_dir] [out_dir]
Defaults: /root/testdata/sf0.1  /root/repo/.scale/skew0.1
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from redskins_rule_spark.session import get_spark  # noqa: E402
from redskins_rule_spark.sources.io import table, write_parquet  # noqa: E402

VERBATIM = ["region", "nation", "customer", "supplier", "part"]

HOT_TEXT = (
    "the quick brown fox jumps over the lazy dog while the hot bucket "
    "fills with identical shingles again and again under one band "
)


def build(spark: SparkSession, src: str, out: str) -> None:
    for t in VERBATIM:
        write_parquet(table(spark, src, t), f"{out}/{t}.parquet")

    orders = table(spark, src, "orders").withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(1)).otherwise(
            F.col("o_custkey")
        ),
    )
    write_parquet(orders, f"{out}/orders.parquet")

    lineitem = table(spark, src, "lineitem").withColumn(
        "l_partkey",
        F.when(F.col("l_orderkey") % 5 == 0, F.lit(1)).otherwise(
            F.col("l_partkey")
        ),
    )
    write_parquet(lineitem, f"{out}/lineitem.parquet")

    events = table(spark, src, "events").withColumn(
        "user_id",
        F.when(F.col("event_id") % 3 == 0, F.lit(1)).otherwise(
            F.col("user_id")
        ),
    )
    write_parquet(events, f"{out}/events.parquet")

    docs = table(spark, src, "documents")
    stretched = (
        F.when(F.col("doc_id") % 50 == 0, F.repeat(F.col("text"), 30))
        .when(F.col("doc_id") % 10 == 0, F.repeat(F.col("text"), 5))
        .otherwise(F.col("text"))
    )
    text = F.when(F.col("doc_id") % 53 == 1, F.lit(HOT_TEXT * 4)).otherwise(
        stretched
    )
    docs = docs.withColumn("text", text).withColumn(
        "n_chars", F.length(F.col("text"))
    )
    write_parquet(docs, f"{out}/documents.parquet")

    emb = table(spark, src, "embeddings")
    base = emb.where(F.col("vec_id") == 1).select(
        F.col("embedding").alias("__base")
    )
    skewed = emb.crossJoin(F.broadcast(base)).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 10 == 0,
            F.transform(
                F.col("__base"),
                lambda x: x * (1.0 + (F.col("vec_id") % 7) / 100.0),
            ),
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
        "label",
    )
    write_parquet(skewed, f"{out}/embeddings.parquet")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/skew0.1"
    spark = get_spark()
    build(spark, src, out)
    for t in VERBATIM + ["orders", "lineitem", "events", "documents",
                         "embeddings"]:
        n = table(spark, out, t).count()
        print(f"[ok] {t}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
