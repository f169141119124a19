"""Declared query workload + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 (or a
north-star extension op) against the driver testdata tables
(TESTDATA.md). The paired oracle SQL is ANSI-ish DuckDB SQL computing
the same relation — the driver hash-compares both at sf0.01.

Cross-engine determinism rules applied throughout:
  * every computed column aliased identically on both sides;
  * dates/timestamps surfaced as 'yyyy-MM-dd' strings (both engines
    render CAST(date AS string) the same; raw temporal types don't
    hash identically across engines);
  * double aggregates rounded (2dp money, 4dp ratios) — IEEE sums in
    different orders agree far below that;
  * every top-k / argmax pinned with an explicit integer tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from redskins_rule_spark.functions.dates import election_days
from redskins_rule_spark.functions.hashing import char_fingerprint
from redskins_rule_spark.operators.analytic import arg_max, forward_fill, lag_over
from redskins_rule_spark.operators.asof import asof_join
from redskins_rule_spark.sources.io import table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _date_str(c) -> F.Column:
    return (F.col(c) if isinstance(c, str) else c).cast("date").cast("string")


# ---------------------------------------------------------------------------
# §2.4 aggregations / §2.2 filters — TPC-H Q1-shaped pricing summary
# (A2 multi-key hash agg, P3/P4 filter pushdown, F16 arithmetic).
# ---------------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 joins + §2.6 top-k — TPC-H Q3-shaped revenue ranking.
# Dim (customer) broadcasts; global top-10 pinned by (revenue, key).
# ---------------------------------------------------------------------------

@query(
    "q02_top_orders",
    oracle="""
    WITH rev AS (
        SELECT o.o_orderkey,
               CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS order_date,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'MACHINERY'
        GROUP BY o.o_orderkey, CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR)
    )
    SELECT o_orderkey, order_date, revenue
    FROM (SELECT rev.*, ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey) AS rn
          FROM rev)
    WHERE rn <= 10
    """,
)
def q02_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", _date_str("o_orderdate").alias("order_date"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# §2.3 multi-join star query (J1/J2 shape at TPC-H Q5 scale): every dim
# broadcast, single shuffle on the fact's group key.
# ---------------------------------------------------------------------------

@query(
    "q03_region_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q03_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 A1 / §2.5 W1 — deterministic grouped argmax (MAX_BY with pinned
# ties) as ONE hash aggregate, no window sort.
# ---------------------------------------------------------------------------

@query(
    "q04_top_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def q04_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return arg_max(
        orders,
        group_by=["o_custkey"],
        select={"top_orderkey": "o_orderkey", "top_totalprice": "o_totalprice"},
        order_by="o_totalprice",
        tiebreak=["o_orderkey"],
    )


# ---------------------------------------------------------------------------
# §2.5 W3 — LAG over a partitioned order (per-customer order gaps).
# ---------------------------------------------------------------------------

@query(
    "q05_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                                                          ORDER BY o_orderdate, o_orderkey),
                     CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    """,
)
def q05_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    out = lag_over(
        orders,
        F.col("o_orderdate").cast("date"),
        order_by=["o_orderdate", "o_orderkey"],
        partition_by=["o_custkey"],
        out="prev_date",
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.col("prev_date")).alias("gap_days"),
    )


# ---------------------------------------------------------------------------
# §2.3 J3 — as-of join (bucket-rewrite scale path): each purchase event
# matched to the nearest preceding 'view' by the same user within 3
# days. Physical plan: equi hash join on (user_id, bucket) — NOT a
# BroadcastNestedLoopJoin.
# ---------------------------------------------------------------------------

_ASOF_TOL_S = 3 * 24 * 3600

@query(
    "q06_asof_purchase_view",
    oracle=f"""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         v AS (SELECT * FROM events WHERE event_type = 'view'),
         j AS (
            SELECT p.event_id, p.user_id, v.event_id AS view_event_id,
                   date_diff('second', v.ts, p.ts) AS secs_diff,
                   ROW_NUMBER() OVER (PARTITION BY p.event_id
                                      ORDER BY date_diff('second', v.ts, p.ts), v.event_id) AS rn
            FROM p JOIN v ON p.user_id = v.user_id
            WHERE date_diff('second', v.ts, p.ts) BETWEEN 0 AND {_ASOF_TOL_S}
         )
    SELECT p.event_id, p.user_id, j.view_event_id, j.secs_diff
    FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
    """,
)
def q06_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    joined = asof_join(
        purchases,
        views,
        left_on="ts",
        right_on="view_ts",
        by=["user_id"],
        tolerance=_ASOF_TOL_S,
        unit="seconds",
        direction="backward",
        left_keys=["event_id"],
        tiebreak=["view_event_id"],
        diff_col="secs_diff",
    )
    return joined.select("event_id", "user_id", "view_event_id", "secs_diff")


# ---------------------------------------------------------------------------
# §2.1 S3 — forward-fill via window last(ignorenulls).
# ---------------------------------------------------------------------------

@query(
    "q07_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           ROUND(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS last_purchase_value
    FROM events
    """,
)
def q07_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    df = events.withColumn(
        "pv", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    df = forward_fill(
        df, "pv", order_by=["ts", "event_id"], partition_by=["user_id"],
        out="last_purchase_value",
    )
    return df.select(
        "event_id", "user_id", F.round("last_purchase_value", 4).alias("last_purchase_value")
    )


# ---------------------------------------------------------------------------
# §2.5 W1 windowed/grouped argmax on a dim join (broadcast).
# ---------------------------------------------------------------------------

@query(
    "q08_richest_customer_per_nation",
    oracle="""
    SELECT n_name, c_name AS top_customer, c_acctbal AS top_acctbal
    FROM (SELECT n.n_name, c.c_name, c.c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY n.n_name
                                    ORDER BY c.c_acctbal DESC, c.c_custkey DESC) AS rn
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
    WHERE rn = 1
    """,
)
def q08_richest_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return arg_max(
        joined,
        group_by=["n_name"],
        select={"top_customer": "c_name", "top_acctbal": "c_acctbal"},
        order_by="c_acctbal",
        tiebreak=["c_custkey"],
    )


# ---------------------------------------------------------------------------
# §2.7 U1/U2 + §2.4 A4/A5 — union + distinct + count.
# ---------------------------------------------------------------------------

@query(
    "q09_union_dedup",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM (SELECT DISTINCT o_orderkey, o_orderpriority
          FROM (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderstatus = 'O'
                UNION ALL
                SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000))
    GROUP BY o_orderpriority
    """,
)
def q09_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_orderpriority")
    b = orders.filter(F.col("o_totalprice") > 150000).select("o_orderkey", "o_orderpriority")
    return (
        a.unionByName(b)
        .dropDuplicates()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.8 F15/F16 — CASE WHEN bucketing + cast + agg.
# ---------------------------------------------------------------------------

@query(
    "q10_price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1
    """,
)
def q10_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# §2.8 F1/F3/F4/F5/F16 — row-level string surgery: regexp_extract,
# split+element_at, translate+cast.
# ---------------------------------------------------------------------------

@query(
    "q11_part_strings",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
           list_extract(string_split(p_name, ' '), 1) AS name_first,
           CAST(translate(p_brand, 'Brand#', '') AS INTEGER) AS brand_num
    FROM part
    """,
)
def q11_part_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.element_at(F.split("p_name", " "), 1).alias("name_first"),
        F.translate("p_brand", "Brand#", "").cast("int").alias("brand_num"),
    )


# ---------------------------------------------------------------------------
# v1 JSON surface (SURVEY §2.8 "JSON functions" gap) — get_json_object
# over the events.props payload.
# ---------------------------------------------------------------------------

@query(
    "q12_json_props",
    oracle="""
    SELECT event_type,
           SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q12_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# §2.8 F12 — election-day generation, Spark-native (spark.range), no
# driver-side data.
# ---------------------------------------------------------------------------

@query(
    "q13_election_days",
    oracle="""
    SELECT CAST(y AS INTEGER) AS year,
           CAST(make_date(CAST(y AS INTEGER), 11, 1)
                + CAST(((8 - dayofweek(make_date(CAST(y AS INTEGER), 11, 1))) % 7 + 1) AS INTEGER)
                AS VARCHAR) AS elec_date
    FROM generate_series(1976, 2024, 4) t(y)
    """,
)
def q13_election_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    return election_days(spark, 1976, 2024).select(
        "year", F.col("elec_date").cast("string").alias("elec_date")
    )


# ---------------------------------------------------------------------------
# §2.3 J1 — expression equi-join on DATE_TRUNC('year', ...).
# ---------------------------------------------------------------------------

@query(
    "q14_year_join",
    oracle="""
    WITH yrs AS (SELECT DISTINCT date_trunc('year', o_orderdate) AS yr FROM orders)
    SELECT CAST(EXTRACT(year FROM yrs.yr) AS INTEGER) AS year,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total
    FROM orders o JOIN yrs ON date_trunc('year', o.o_orderdate) = yrs.yr
    GROUP BY 1
    """,
)
def q14_year_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    yrs = orders.select(F.date_trunc("year", "o_orderdate").alias("yr")).distinct()
    return (
        orders.join(
            F.broadcast(yrs), F.date_trunc("year", F.col("o_orderdate")) == yrs.yr
        )
        .groupBy(F.year("yr").cast("int").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracles() -> dict[str, str]:
    return dict(ORACLES)
