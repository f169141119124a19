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

from redskins_rule_spark.functions.dates import election_days, epoch_us
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
    # orderBy+limit → TakeOrderedAndProject (per-partition top-k +
    # k-row merge), not a single-partition global-window sort
    return rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)


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
           -- DuckDB SUM(BIGINT) widens to HUGEINT (renders as float in
           -- pandas); pin BIGINT so both engines emit int64.
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
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
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               / 100.0 AS total
    FROM orders o JOIN yrs ON date_trunc('year', o.o_orderdate) = yrs.yr
    GROUP BY 1
    """,
)
def q14_year_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    yrs = orders.select(F.date_trunc("year", "o_orderdate").alias("yr")).distinct()
    # exact integer cents, one shared final divide (the q63 contract):
    # ROUND(SUM(double), 2) diverged at sf10 magnitudes — 15M-term
    # float sums accumulate in engine-specific order, and at ~3e11 the
    # drift crosses the cent boundary (spark ...292.0 vs duckdb
    # ...292.02). Summing exact cents is order-free; dividing the one
    # exact integer by 100.0 is IEEE-deterministic on both engines.
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders.join(
            F.broadcast(yrs), F.date_trunc("year", F.col("o_orderdate")) == yrs.yr
        )
        .groupBy(F.year("yr").cast("int").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents) / 100.0).alias("total"),
        )
    )


# The driver's correctness gate records the FIRST 50 entries of
# queries() only (CORRECTNESS_r01/r02 each hold exactly 50 rows;
# q49/q50 dropped out of r02 when q23b/q25b were registered above
# them). Registration order is file layout, so the dict is re-ordered
# here: queries a driver round has never hash-checked come first, then
# the cross-engine-sensitive sentinels (the round-1 hash-fail family),
# then everything else. Rounds 1+2 cumulatively verified every query
# NOT in this list; keep it updated as rounds verify more.
_DRIVER_PRIORITY: list[str] = [
    # The driver's correctness gate records only the FIRST 50 entries of
    # queries(); this list keeps never-driver-verified queries at the head
    # and rotates hash-green ones to the tail each round.
    # RULE (VERDICT r12 item 1): rows-only faces (q25/q37/q43/q97/q104)
    # NEVER occupy window slots — their hashed b-siblings stand in, so
    # the driver's hard signal contains zero `no_oracle` rows.
    # --- new in round 13 (never driver-verified): registrations go
    #     here ON REGISTRATION DAY; drop tail entries to stay at 50 ---
    "q239_flac_multichannel", "q240_bm25_rank", "q241_fingerprint_dedup",
    "q242_shuffled_shards", "q243_phrase_search",
    # --- round-13 TOUCHED: q234 rides the feistel_key domain-guard
    #     change (ADVICE r12 — behavior identical in-domain,
    #     re-checked anyway) ---
    "q234_corpus_shuffle",
    # --- hash-sensitive sentinel back-fill (the round-1 cross-engine
    #     hash-fail family + the expensive distributed-formulation
    #     queries): re-verified each round to catch engine drift ---
    "q12_json_props", "q38_pivot",
    "q01_pricing_summary", "q06_asof_purchase_view",
    "q19_ngram_jaccard", "q20_minhash_lsh", "q54_dedup_clusters",
    "q85_scd2_build", "q91_incremental_view", "q92_intradoc_dedup",
    "q96_skew_distinct", "q98_gif_meta", "q99_gif_frames",
    # --- back-catalog rotation: the slice longest out of the driver
    #     window — last driver-checked in ROUND 2 per the judge's
    #     cross-round tally (VERDICT r12 item 1): q11, q23b/q25b/q43b,
    #     q34-q36, q39-q42, q81, q82 ---
    "q11_part_strings", "q23b_bmp_decode", "q25b_simhash_xengine",
    "q34_map_props", "q35_percentiles", "q36_semi_anti",
    "q39_unpivot", "q40_stats_agg", "q41_word_explode",
    "q42_band_join", "q43b_kmv_distinct", "q81_lateral_topn",
    "q82_bigram_pmi",
    # --- q104's hashed sibling replaces the rows-only face that
    #     burned an r12 slot on `err: no_oracle` ---
    "q104b_bpe_xengine",
    # --- next-oldest fill to 50: q116-q135 (last cycled r6) ---
    "q116_range_bin_join", "q117_hash_split", "q118_entropy_quality",
    "q120_crosslingual_mix", "q121_record_linkage", "q122_containment",
    "q123_png_decode", "q124_bigram_lm", "q125_gaps_islands",
    "q126_twap", "q127_mad_outliers", "q128_oov_rate",
    "q129_dedup_keep_best", "q130_price_histogram", "q131_seq_pattern",
    "q132_corr_matrix", "q133_curation_funnel",
    # (q134 rotated out for q243 — driver-verified r6, next cycle)
    # exactly 50 explicit entries — new registrations + touched +
    # 13 sentinels + fresh back-catalog. Registrations go at the HEAD
    # on registration day; drop tail entries to stay at 50.
]


def _ordered(reg: dict) -> dict:
    head = {k: reg[k] for k in _DRIVER_PRIORITY if k in reg}
    return head | {k: v for k, v in reg.items() if k not in head}


def queries() -> dict[str, QueryFn]:
    return _ordered(QUERIES)


# Bounded oracles are TAGGED in the registry itself (ADVICE r9): any
# harness that iterates oracles() directly — not just the callers that
# know to consult oracle_bounds() — sees the validity bound as a
# leading SQL comment (legal SQL, ignored by DuckDB, results
# unchanged). oracle_bounds() below remains the executable predicate.
_ORACLE_BOUND_TAGS: dict[str, str] = {
    "q22_embedding_dups": (
        "-- SCALE-BOUNDED ORACLE: exact all-pairs cosine in SQL is\n"
        "-- O(n^2) interpreted list dot products with no sargable\n"
        "-- prefilter; valid in practice for n_embeddings <= 60k.\n"
        "-- Consult workload.oracle_bounds()['q22_embedding_dups']\n"
        "-- before running this differential on bigger fixtures.\n"
    ),
    "q185_ann_label_noise": (
        "-- SCALE-BOUNDED ORACLE: replays a FIXED 64-plane SRP signature;\n"
        "-- valid only while srp_auto_band_bits(n_embeddings, 8) == 8,\n"
        "-- i.e. n_embeddings <= 1024. Consult\n"
        "-- workload.oracle_bounds()['q185_ann_label_noise'](spark, sf_dir)\n"
        "-- before running this differential on any other fixture.\n"
    ),
    "q174_srp_lsh_pairs": (
        "-- SCALE-BOUNDED ORACLE: replays the FIXED 8-bit-band SRP face;\n"
        "-- at n_embeddings > 64k the 8*C(n,2)/256 expected random\n"
        "-- collisions exceed the engine's 64M candidate budget and the\n"
        "-- engine guard refuses by design (the auto-tapered faces\n"
        "-- q184/q185 are the scale path). Consult\n"
        "-- workload.oracle_bounds()['q174_srp_lsh_pairs'] before running\n"
        "-- this differential on bigger fixtures.\n"
    ),
    "q175_knn_label_noise": (
        "-- SCALE-BOUNDED ORACLE: exact all-pairs kNN in SQL is O(n^2)\n"
        "-- interpreted list dot products with no sargable prefilter\n"
        "-- (the same wall as q22); valid in practice for\n"
        "-- n_embeddings <= 60k. The ENGINE side (blocked matmul) is\n"
        "-- fixture-agnostic and verified at the decade. Consult\n"
        "-- workload.oracle_bounds()['q175_knn_label_noise'] before\n"
        "-- running this differential on bigger fixtures.\n"
    ),
    "q179_embedding_curation": (
        "-- SCALE-BOUNDED ORACLE: exact all-pairs cosine kNN in SQL is\n"
        "-- O(n^2) interpreted list dot products with no sargable\n"
        "-- prefilter (the q22/q175 wall; 119 s at 20k embeddings,\n"
        "-- ~3 h at 200k); valid in practice for n_embeddings <= 60k.\n"
        "-- The ENGINE side (blocked matmul kNN) is fixture-agnostic.\n"
        "-- Consult workload.oracle_bounds()['q179_embedding_curation']\n"
        "-- before running this differential on bigger fixtures.\n"
    ),
    "q194_semdedup": (
        "-- SCALE-BOUNDED ORACLE: the SQL replays SemDeDup with only 4\n"
        "-- closed-form cells, so its within-cell candidate join is\n"
        "-- ~n^2/8 interpreted list dot products (15 s at 22.8k\n"
        "-- embeddings, hours at 230k); valid in practice for\n"
        "-- n_embeddings <= 60k. The ENGINE side (k-means cells +\n"
        "-- bucketed pairs) is fixture-agnostic. Consult\n"
        "-- workload.oracle_bounds()['q194_semdedup'] before running\n"
        "-- this differential on bigger fixtures.\n"
    ),
    "q37b_packing_xengine": (
        "-- SCALE-BOUNDED ORACLE: the recursive CTE replays the greedy\n"
        "-- pack fold ROW BY ROW (depth = docs per group), and each\n"
        "-- iteration rescans t — O(depth x n) work that is the fold's\n"
        "-- SEMANTICS, not an implementation accident (next-fit state\n"
        "-- has no closed form in plain SQL). 447 s at 50k docs (sf1,\n"
        "-- hash-green); hours at 500k. Valid for n_documents <= 60k;\n"
        "-- the ENGINE side (linear applyInPandas fold) is\n"
        "-- fixture-agnostic. Consult\n"
        "-- workload.oracle_bounds()['q37b_packing_xengine'] before\n"
        "-- running this differential on bigger fixtures.\n"
    ),
}


def oracles() -> dict[str, str]:
    reg = _ordered(ORACLES)
    return {k: _ORACLE_BOUND_TAGS.get(k, "") + v for k, v in reg.items()}


def _q22_bound_reason(n: int, qname: str = "q22") -> str | None:
    """q22's SQL oracle is the one inherently QUADRATIC oracle in the
    registry: exact all-pairs cosine has no sargable prefilter, so
    DuckDB evaluates n²/2 interpreted 64-term list dot products. The
    engine side is blocked numpy (69 s for n=200k, 9.6M pairs at
    sf10); the oracle at the same n is ~2e10 interpreted dots —
    hours, not minutes (the round-11 "40-minute chunk stall" was this
    oracle grinding, misattributed twice before being measured).
    Bound the differential at n <= 60k (sf1-scale, where it is
    verified hash-green in minutes); past that the harness records
    the weaker rows-only check BY NAME instead of wedging."""
    if n > 60_000:
        return (
            f"{qname} oracle is O(n^2) interpreted list-dots; n={n} > 60k "
            "(engine-side blocked matmul is fine — verified hash-green "
            "through sf1; the oracle is the scale wall)"
        )
    return None


def _q185_bound_reason(n: int) -> str | None:
    """q185's SQL oracle replays a FIXED 64-plane signature (8 bands
    x 8 bits); the engine auto-tapers bits/band with corpus size, so
    the differential is valid only while srp_auto_band_bits(n, 8) ==
    8, i.e. n <= 1024 (ADVICE r8: the bound now lives in code, not
    comments)."""
    from redskins_rule_spark.operators.similarity import srp_auto_band_bits

    r = srp_auto_band_bits(n, bands=8)
    if r != 8:
        return (
            "fixed-64-plane oracle requires srp_auto_band_bits(n, 8) == 8 "
            f"(n <= 1024); fixture has n={n} embeddings -> r={r}"
        )
    return None


def oracle_bounds() -> dict:
    """Validity predicates for scale-bounded oracles: name ->
    callable(spark, sf_dir) returning None (oracle valid on this
    fixture) or a named skip reason. The local gate
    (tools/check_correctness.py) consults this before running a
    bounded differential, so scale/skew fixture runs SKIP by name
    instead of false-failing — the engine-side query itself is
    fixture-agnostic and still runs everywhere."""

    def q185(spark, sf_dir: str):
        n = table(spark, sf_dir, "embeddings").count()
        return _q185_bound_reason(n)

    def q22(spark, sf_dir: str):
        return _q22_bound_reason(table(spark, sf_dir, "embeddings").count())

    def q175(spark, sf_dir: str):
        # same wall as q22: the oracle's exact all-pairs join is
        # O(n^2) interpreted 64-term list dots (the ENGINE's blocked
        # matmul is fine at the decade)
        return _q22_bound_reason(
            table(spark, sf_dir, "embeddings").count(), qname="q175"
        )

    def q37b(spark, sf_dir: str):
        n = table(spark, sf_dir, "documents").count()
        if n > 60_000:
            return (
                f"q37b oracle replays the pack fold as a recursive CTE "
                f"(O(depth x n) — the sequential fold IS the semantics); "
                f"n_documents={n} > 60k (engine-side linear fold is "
                "fixture-agnostic; hash-green through sf1)"
            )
        return None

    def q179(spark, sf_dir: str):
        return _q22_bound_reason(
            table(spark, sf_dir, "embeddings").count(), qname="q179"
        )

    def q194(spark, sf_dir: str):
        n = table(spark, sf_dir, "embeddings").count()
        if n > 60_000:
            return (
                f"q194 oracle buckets into only 4 closed-form cells — "
                f"~n^2/8 interpreted list dots; n={n} > 60k (engine-side "
                "k-means-bucketed pairs are fixture-agnostic)"
            )
        return None

    def q174(spark, sf_dir: str):
        n = table(spark, sf_dir, "embeddings").count()
        # fixed 8-bit bands: 8·C(n,2)/256 expected random collisions
        # must stay under srp_lsh_pairs' 64M candidate_budget — the
        # engine guard (correctly) refuses past n ≈ 64k, and the
        # fixed-plane oracle is only meaningful where the engine runs
        if n > 64_000:
            return (
                f"q174 is the FIXED 8-bit-band SRP face; at n={n} the "
                "8·C(n,2)/256 expected collisions exceed the 64M "
                "candidate budget and the engine guard refuses by "
                "design (auto-tapered faces q184/q185 are the scale "
                "path)"
            )
        return None

    return {
        "q185_ann_label_noise": q185,
        "q22_embedding_dups": q22,
        "q174_srp_lsh_pairs": q174,
        "q175_knn_label_noise": q175,
        "q37b_packing_xengine": q37b,
        "q179_embedding_curation": q179,
        "q194_semdedup": q194,
    }


# ===========================================================================
# North-star extension queries (training-data pipeline operators)
# ===========================================================================

from redskins_rule_spark.functions.hashing import (  # noqa: E402
    MINHASH_AFFINE,
    simhash_token_hash_xengine,
    word_shingles,
)
from redskins_rule_spark.operators.dedup import (  # noqa: E402
    dedup_by_content,
    jaccard,
    ngram_jaccard_pairs_exact,
    pairs_from_posting_lists,
    simhash_pairs,
    word_ngram_minhash_rows,
)
from redskins_rule_spark.operators.multimodal import (  # noqa: E402
    decode_image_meta,
    length_dict_stats,
    with_binary_payload,
    with_bmp_payload,
)
from redskins_rule_spark.operators.similarity import (  # noqa: E402
    cosine_pairs_blocked,
    cosine_topk_for_id,
)
from redskins_rule_spark.operators.text import (  # noqa: E402
    LANG_ORDER,
    LANG_PROFILES,
    lang_id,
    lang_scores,
    quality_features,
    quality_score,
    subword_token_count,
    token_count,
)

# shared DuckDB fragments -----------------------------------------------------

_SQL_TOKENS = "string_split_regex(trim(text), '\\s+')"
_SQL_GRAMS3 = (
    "list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 0)), "
    "i -> concat_ws(' ', t[i], t[i+1], t[i+2])))"
)
_SQL_POLYHASH = (
    "CAST(list_sum(list_transform(generate_series(1, greatest(length(s), 1)), "
    "i -> ascii(substr(s, i, 1)) * (1 + (i - 1) % 64))) % 2147483647 AS BIGINT)"
)


# ---------------------------------------------------------------------------
# Text analysis: token counting + cross-engine fingerprint.
# ---------------------------------------------------------------------------

@query(
    "q15_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_SQL_TOKENS}) AS n_tokens,
           length(text) AS n_chars_calc,
           CAST(list_sum(list_transform(generate_series(1, greatest(length(text), 1)),
                i -> ascii(substr(text, i, 1)) * (1 + (i - 1) % 64))) % 2147483647 AS BIGINT)
               AS fingerprint
    FROM documents
    """,
)
def q15_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        char_fingerprint("text").alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Text analysis: quality features + composite score (C4-style heuristics).
# ---------------------------------------------------------------------------

_SQL_EN_STOPS = "[" + ", ".join(f"'{w}'" for w in LANG_PROFILES["en"]) + "]"

@query(
    "q16_quality",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars_calc,
             len({_SQL_TOKENS}) AS n_tokens,
             ROUND(length(text) / greatest(len({_SQL_TOKENS}), 1), 4) AS mean_word_len,
             ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                   / greatest(length(text), 1), 4) AS punct_ratio,
             ROUND(len(list_filter({_SQL_TOKENS}, t -> list_contains({_SQL_EN_STOPS}, lower(t))))
                   / greatest(len({_SQL_TOKENS}), 1), 4) AS stopword_ratio
      FROM documents)
    SELECT doc_id, n_chars_calc, n_tokens, mean_word_len, punct_ratio, stopword_ratio,
           ROUND(0.4 * (CASE WHEN n_tokens >= 10 THEN 1.0 ELSE n_tokens / 10 END)
               + 0.2 * (CASE WHEN mean_word_len >= 3 AND mean_word_len <= 12 THEN 1.0 ELSE 0.5 END)
               + 0.2 * (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.6 END)
               + 0.2 * (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.5 END), 4) AS quality
    FROM f
    """,
)
def q16_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    feats = quality_features("text")
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars_calc"),
        feats["n_tokens"].alias("n_tokens"),
        feats["mean_word_len"].alias("mean_word_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        quality_score("text").alias("quality"),
    )


# ---------------------------------------------------------------------------
# Text analysis: n-gram-heuristic language ID (stopword-hit argmax with
# pinned precedence).
# ---------------------------------------------------------------------------

def _lang_score_sql(lang: str) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang]) + "]"
    return (
        f"len(list_filter({_SQL_TOKENS}, t -> list_contains({arr}, lower(t))))"
    )

_LANG_CASE = " ".join(
    f"WHEN {lang}_hits = best THEN '{lang}'" for lang in LANG_ORDER
)

@query(
    "q17_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             {", ".join(f"{_lang_score_sql(lang)} AS {lang}_hits" for lang in LANG_ORDER)}
      FROM documents),
    b AS (SELECT s.*, greatest({", ".join(f"{lang}_hits" for lang in LANG_ORDER)}) AS best FROM s)
    SELECT doc_id, {", ".join(f"{lang}_hits" for lang in LANG_ORDER)},
           CASE WHEN best = 0 THEN 'und' {_LANG_CASE} END AS lang_pred
    FROM b
    """,
)
def q17_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scores = lang_scores("text")
    return docs.select(
        "doc_id",
        *[scores[lang].alias(f"{lang}_hits") for lang in LANG_ORDER],
        lang_id("text").alias("lang_pred"),
    )


# ---------------------------------------------------------------------------
# Dedup: exact content dedup (hash groupBy on md5 key). Corpus unioned
# with itself so duplicate groups actually exist at every sf.
# ---------------------------------------------------------------------------

@query(
    "q18_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
    FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
    GROUP BY 1
    """,
)
def q18_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dedup_by_content(docs.unionByName(docs), "text", "doc_id")


# ---------------------------------------------------------------------------
# Dedup: EXACT n-gram Jaccard near-dup pairs (inverted gram index —
# lossless candidate generation, then exact verify).
# ---------------------------------------------------------------------------

@query(
    "q19_ngram_jaccard",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         gsets AS (SELECT doc_id, {_SQL_GRAMS3} AS g FROM toks WHERE len({_SQL_GRAMS3}) > 0),
         inv0 AS (SELECT doc_id, unnest(g) AS gram FROM gsets),
         -- df-cut mirror (max_df=64): drop stop-grams from the universe
         keep AS (SELECT gram FROM inv0 GROUP BY gram HAVING COUNT(*) <= 64),
         inv AS (SELECT inv0.* FROM inv0 JOIN keep USING (gram)),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM inv GROUP BY 1),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
                  FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b, ninter, sa.n AS na, sb.n AS nb
                   FROM cand
                   JOIN sizes sa ON sa.doc_id = cand.id_a
                   JOIN sizes sb ON sb.doc_id = cand.id_b)
    SELECT id_a, id_b, ROUND(ninter / (na + nb - ninter), 4) AS jaccard_sim
    FROM pairs WHERE ninter / (na + nb - ninter) >= 0.8
    """,
)
def q19_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_df=64: inert at test SFs (max gram df is 25 at sf0.1) but the
    # df-cut path is exercised and bounds hot-gram fan-out at scale.
    docs = table(spark, sf_dir, "documents", spread=True)
    return ngram_jaccard_pairs_exact(
        docs, "doc_id", "text", n=3, threshold=0.8, max_df=64
    )


# ---------------------------------------------------------------------------
# Dedup: MinHash + LSH with a cross-engine-deterministic hash family
# (polynomial char hash + affine permutations, r=1 bands) so even the
# LSH candidate set is oracle-checkable. Production path uses the
# xxhash64 family (operators.dedup.minhash_dedup_pairs).
# ---------------------------------------------------------------------------

_SQL_SIG = "[" + ", ".join(
    f"CAST(list_min(list_transform(hs, x -> ({a} * x + {b}) % 2147483647)) AS BIGINT)"
    for a, b in MINHASH_AFFINE
) + "]"

@query(
    "q20_minhash_lsh",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         gsets AS (SELECT doc_id, {_SQL_GRAMS3} AS g FROM toks WHERE len({_SQL_GRAMS3}) > 0),
         hashed AS (SELECT doc_id, g, list_transform(g, s -> {_SQL_POLYHASH}) AS hs FROM gsets),
         sigs AS (SELECT doc_id, g, {_SQL_SIG} AS sig FROM hashed),
         bands AS (SELECT doc_id, i, sig[CAST(i + 1 AS INTEGER)] AS sv
                   FROM sigs, (SELECT unnest(generate_series(0, 7)) AS i)),
         -- hot-bucket cap mirror (max_postings=64): over-full LSH
         -- buckets dropped whole before pair generation
         cool AS (SELECT i, sv FROM bands GROUP BY i, sv HAVING COUNT(*) <= 64),
         fbands AS (SELECT bands.* FROM bands JOIN cool USING (i, sv)),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM fbands a JOIN fbands b ON a.i = b.i AND a.sv = b.sv AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b,
                          len(list_intersect(sa.g, sb.g)) AS ninter,
                          len(sa.g) AS na, len(sb.g) AS nb
                   FROM cand
                   JOIN sigs sa ON sa.doc_id = cand.id_a
                   JOIN sigs sb ON sb.doc_id = cand.id_b)
    SELECT id_a, id_b, ROUND(ninter / (na + nb - ninter), 4) AS jaccard_sim
    FROM pairs WHERE ninter / (na + nb - ninter) >= 0.8
    """,
)
def q20_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    # grams + x-engine signature in ONE Arrow pass (r13 opt; the
    # expression pipeline — zip_with shingles, per-char poly_hash,
    # per-shingle affine-min aggregate — is interpreted per element)
    sigs = word_ngram_minhash_rows(docs, "doc_id", "text", 3, 8)
    base = sigs.select("doc_id", "g")
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("i"), F.col("sig")[i].alias("sv")) for i in range(8)])
        ).alias("b"),
    ).select("doc_id", F.col("b.i").alias("i"), F.col("b.sv").alias("sv"))
    # posting-list pair generation: one shuffle, the x-engine signature
    # pipeline evaluated once (a self-join would plan it per side)
    cand = pairs_from_posting_lists(
        bands, ["i", "sv"], "doc_id", max_postings=64
    ).distinct()
    ga = base.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    gb = base.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jaccard_sim", jaccard(F.col("ga"), F.col("gb")))
        .where(F.col("jaccard_sim") >= 0.8)
        .select("id_a", "id_b", F.round("jaccard_sim", 4).alias("jaccard_sim"))
    )


# ---------------------------------------------------------------------------
# Similarity search: exact brute-force cosine top-k for an in-table
# query vector (baseline; the IVF variant is the scale path).
# ---------------------------------------------------------------------------

_SQL_DOT = (
    "list_reduce(list_transform(generate_series(1, len(qv)), j -> av[j] * bv[j]), "
    "(acc, x) -> acc + x)"
)

@query(
    "q21_cosine_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         s AS (SELECT e.vec_id,
                      ROUND(
                        list_reduce(list_transform(generate_series(1, len(q.qv)),
                                    j -> CAST(e.embedding AS DOUBLE[])[j] * q.qv[j]),
                                    (acc, x) -> acc + x)
                        / (sqrt(list_reduce(list_transform(generate_series(1, len(q.qv)),
                                    j -> CAST(e.embedding AS DOUBLE[])[j] * CAST(e.embedding AS DOUBLE[])[j]),
                                    (acc, x) -> acc + x))
                         * sqrt(list_reduce(list_transform(generate_series(1, len(q.qv)),
                                    j -> q.qv[j] * q.qv[j]),
                                    (acc, x) -> acc + x))), 4) AS cos_sim
               FROM embeddings e, q WHERE e.vec_id <> 0)
    SELECT vec_id, cos_sim
    FROM (SELECT s.*, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rn FROM s)
    WHERE rn <= 10
    """,
)
def q21_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return cosine_topk_for_id(emb, 0, "vec_id", "embedding", k=10)


# ---------------------------------------------------------------------------
# Dedup: embedding-cosine near-dup pairs, exact all-pairs baseline
# (quadratic — LSH-bucketed variant in operators.dedup is the scale
# path; this one is the oracle-checkable ground truth).
# ---------------------------------------------------------------------------

@query(
    "q22_embedding_dups",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                      ROUND(
                        list_reduce(list_transform(generate_series(1, len(a.v)), j -> a.v[j] * b.v[j]), (acc, x) -> acc + x)
                        / (sqrt(list_reduce(list_transform(generate_series(1, len(a.v)), j -> a.v[j] * a.v[j]), (acc, x) -> acc + x))
                         * sqrt(list_reduce(list_transform(generate_series(1, len(b.v)), j -> b.v[j] * b.v[j]), (acc, x) -> acc + x))), 4) AS cos_sim
               FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.4
    """,
)
def q22_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return cosine_pairs_blocked(emb, "vec_id", "embedding", threshold=0.4, num_blocks=16)


# ---------------------------------------------------------------------------
# Multimodal: binary payload + Arrow-batched pandas decode (fake,
# deterministic backend) — the oracle reproduces the fake's math, so
# this differential-tests the mapInPandas plumbing itself.
# ---------------------------------------------------------------------------

@query(
    "q23_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
           CAST(CASE WHEN text IS NULL THEN NULL ELSE 3 END AS INTEGER) AS channels
    FROM documents
    """,
)
def q23_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # dictionary fan-out (guide §8): the fake decode is a pure
    # function of the payload byte length = utf-8 length of text
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_image_meta(
            with_binary_payload(d, "text"),
            "payload",
            "doc_id",
            decode_backend="fake",
        ),
    )


# ---------------------------------------------------------------------------
# Multimodal, REAL decode path: generate a valid 24-bit BMP per doc
# (dims derived from the text's byte length) and parse actual image
# bytes back out with the pure-Python codec (functions/bmp.py) — no
# codec library, no fake. The oracle predicts the header fields and
# exact file size arithmetically.
# ---------------------------------------------------------------------------

@query(
    "q23b_bmp_decode",
    oracle="""
    SELECT doc_id,
           CAST(54 + ((3 * w + 3) // 4 * 4) * h AS BIGINT) AS byte_len,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(CASE WHEN w IS NULL THEN NULL ELSE 3 END AS INTEGER) AS channels
    FROM (SELECT doc_id,
                 octet_length(encode(text)) % 31 + 1 AS w,
                 octet_length(encode(text)) % 17 + 1 AS h
          FROM documents)
    """,
)
def q23b_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_image_meta(
            with_bmp_payload(d, "text", "doc_id"), "payload", "doc_id", decode_backend="bmp"
        ),
    )


# ---------------------------------------------------------------------------
# Text analysis: BPE-ish subword token-count estimate.
# ---------------------------------------------------------------------------

@query(
    "q24_subword_tokens",
    oracle="""
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split_regex(text, '[^A-Za-z]+'),
                w -> CASE WHEN length(w) > 0 THEN CAST(ceil(length(w) / 4) AS BIGINT) ELSE 0 END))
                + length(regexp_replace(text, '[A-Za-z\\s]', '', 'g')) AS BIGINT) AS subword_tokens
    FROM documents
    """,
)
def q24_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", subword_token_count("text").alias("subword_tokens"))


# ---------------------------------------------------------------------------
# Dedup: SimHash near-dup pairs — production xxhash64 family, not
# reproducible in the oracle engine ⇒ rows-only check (the pytest suite
# pins semantics against brute-force hamming instead).
# ---------------------------------------------------------------------------

@query("q25_simhash_pairs")
def q25_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3)


# ---------------------------------------------------------------------------
# Dedup: SimHash with the cross-engine hash family (two Rabin–Karp
# rolling-hash families packed into a 62-bit signature) — same
# operator machinery as q25 but every bit is reproducible in the
# oracle engine, so the FULL near-dup pair set is value-hash-checked.
# The oracle recomputes signatures with identical arithmetic and
# brute-forces pairs (fine at oracle SF); the Spark side uses the
# pigeonhole blocking, so this also differential-tests that the
# blocking is lossless on real data.
# ---------------------------------------------------------------------------

_SQL_SIMHASH_BITS = 62

def _sql_roll_of(expr: str, base: int = 257) -> str:
    """DuckDB rendering of functions.hashing.rolling_hash(expr) — the
    single source of truth (q25b's and q43b's oracles both build on
    it, so they can never desynchronize)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {base} + x) % 2147483647)"
    )


def _sql_roll(base: int) -> str:
    return _sql_roll_of("s", base)

_SQL_SIM_VOTES = ", ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE 0 END) AS b{j}"
    for j in range(_SQL_SIMHASH_BITS)
)
_SQL_SIM_SIG = " + ".join(
    f"(CASE WHEN b{j} * 2 > n THEN CAST(1 AS BIGINT) << {j} ELSE CAST(0 AS BIGINT) END)"
    for j in range(_SQL_SIMHASH_BITS)
)

@query(
    "q25b_simhash_xengine",
    oracle=f"""
    WITH toks AS (SELECT doc_id, list_distinct({_SQL_TOKENS}) AS t FROM documents),
         ex AS (SELECT doc_id, unnest(t) AS s FROM toks),
         h AS (SELECT doc_id,
                 {_sql_roll(257)} + ({_sql_roll(131)} << 31) AS h
               FROM ex),
         v AS (SELECT doc_id, COUNT(*) AS n, {_SQL_SIM_VOTES} FROM h GROUP BY doc_id),
         sigs AS (SELECT doc_id, {_SQL_SIM_SIG} AS sig FROM v)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
)
def q25b_simhash_xengine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    return simhash_pairs(
        docs, "doc_id", "text", max_hamming=3,
        bits=62, hash_expr=simhash_token_hash_xengine,
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


# ---------------------------------------------------------------------------
# Streaming operators, batch-checked: the SAME functions serve
# readStream frames (tests/test_streaming.py pins streaming/batch
# parity); here their batch output enters the DuckDB differential.
# ---------------------------------------------------------------------------

from redskins_rule_spark.streaming.ops import (  # noqa: E402
    sessionized_counts,
    tumbling_counts,
)


@query(
    "q26_event_windows",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q26_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = tumbling_counts(ev, window="1 hour", group_extra=["event_type"])
    return out.select(
        F.col("window_start").cast("string").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "q27_sessionization",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    tagged AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def q27_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = sessionized_counts(ev, gap="30 minutes")
    # explicit 6-digit fractional format: engines disagree on rendering
    # trailing-zero microseconds in a bare timestamp→string cast
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        F.date_format("session_start", fmt).alias("session_start"),
        F.date_format("session_end", fmt).alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Aggregation surface completeness: ROLLUP hierarchy totals (grouping
# sets family — not exercised by the reference, SURVEY §2.4 "not
# present", exposed as first-class engine surface).
# ---------------------------------------------------------------------------

@query(
    "q28_rollup_totals",
    oracle="""
    SELECT COALESCE(r.r_name, 'ALL') AS region_name,
           COALESCE(n.n_name, 'ALL') AS nation_name,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q28_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


# ---------------------------------------------------------------------------
# Set-operation surface: INTERSECT / EXCEPT (distinct semantics) over
# customer segments (SURVEY §2.7 "not present" — engine surface).
# ---------------------------------------------------------------------------

@query(
    "q29_set_ops",
    oracle="""
    WITH mach AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
         bld  AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         both_n AS (SELECT c_nationkey FROM mach INTERSECT SELECT c_nationkey FROM bld),
         only_m AS (SELECT c_nationkey FROM mach EXCEPT SELECT c_nationkey FROM bld)
    SELECT 'both' AS tag, c_nationkey FROM both_n
    UNION ALL
    SELECT 'machinery_only' AS tag, c_nationkey FROM only_m
    """,
)
def q29_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    mach = cust.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    bld = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    both_n = mach.intersect(bld).select(F.lit("both").alias("tag"), "c_nationkey")
    # subtract = EXCEPT DISTINCT (exceptAll would keep keys that merely
    # occur MORE OFTEN on the left — different semantics)
    only_m = mach.subtract(bld).select(
        F.lit("machinery_only").alias("tag"), "c_nationkey"
    )
    return both_n.unionByName(only_m)


# ---------------------------------------------------------------------------
# Similarity search, scale path: IVF-pruned approximate top-k. Cells
# are axis-aligned unit centroids (e_0..e_3) so the assignment and the
# probe set are SQL-expressible and the WHOLE approximate pipeline —
# assignment, nprobe pruning, in-cell exact top-k — is oracle-checked,
# not just the exact baseline (q21).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.similarity import ivf_topk  # noqa: E402

_IVF_DIM = 4  # centroids: e_0..e_3 in the embedding space


def _ivf_centroids(dim: int = 64):
    return [[1.0 if j == i else 0.0 for j in range(dim)] for i in range(_IVF_DIM)]


_SQL_NORM = (
    "sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b))"
)
# cell = argmax_i round(v[i]/|v|, 6), ties to the LARGER index
# (Spark array_max over struct(sim, idx))
_SQL_CELL_SIM = ", ".join(
    f"ROUND(v[{i + 1}] / {_SQL_NORM}, 6) AS s{i}" for i in range(_IVF_DIM)
)
_SQL_CELL_PICK = "".join(
    # iterate high→low index so earlier (higher-idx) wins exact ties
    f" WHEN s{i} = best THEN {i}"
    for i in reversed(range(_IVF_DIM))
)


@query(
    "q30_ivf_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cells AS (
           SELECT vec_id, v, {_SQL_CELL_SIM} FROM e),
         assigned AS (
           SELECT vec_id, v,
                  CASE{_SQL_CELL_PICK} END AS cell
           FROM (SELECT cells.*, greatest(s0, s1, s2, s3) AS best FROM cells)),
         q AS (SELECT v AS qv, s0, s1, s2, s3
               FROM cells WHERE vec_id = 0),
         probe AS (  -- nprobe=2: the two cells whose centroids are
                     -- closest to the query vector, ties to larger idx
           SELECT CASE{_SQL_CELL_PICK.replace("best", "b1")} END AS c
           FROM (SELECT *, greatest(s0, s1, s2, s3) AS b1 FROM q)
           UNION ALL
           SELECT CASE{_SQL_CELL_PICK.replace("best", "b2")} END
           FROM (
             SELECT q.*,
                    max(CASE WHEN sv < greatest(s0, s1, s2, s3) THEN sv END) AS b2
             FROM q, (SELECT unnest([s0, s1, s2, s3]) AS sv FROM q)
             GROUP BY ALL)),
         scored AS (
           SELECT a.vec_id,
                  ROUND(
                    list_reduce(list_transform(generate_series(1, len(q.qv)),
                                j -> a.v[j] * q.qv[j]), (x, y) -> x + y)
                    / ({_SQL_NORM.replace("v,", "a.v,").replace("(v", "(a.v")}
                       * {_SQL_NORM.replace("v,", "q.qv,").replace("(v", "(q.qv")}), 4)
                    AS cos_sim
           FROM assigned a, q
           WHERE a.cell IN (SELECT c FROM probe) AND a.vec_id <> 0)
    SELECT vec_id, cos_sim
    FROM (SELECT scored.*, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 10
    """,
)
def q30_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    centroids = _ivf_centroids(dim)
    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    return ivf_topk(
        emb.where(F.col("vec_id") != 0),
        centroids,
        [float(x) for x in qvec],
        "vec_id",
        "embedding",
        k=10,
        nprobe=2,
    )


# ---------------------------------------------------------------------------
# Window surface completeness: LEAD / DENSE_RANK / NTILE / running SUM
# with explicit frames (SURVEY §2.5 lists these as absent from the
# reference — engine surface, pinned by total ordering).
# ---------------------------------------------------------------------------

@query(
    "q31_window_suite",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           CAST(CAST(LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE)
               AS VARCHAR) AS next_order_date,
           DENSE_RANK() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           NTILE(4) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS quartile
    FROM orders
    """,
)
def q31_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_total"),
        _date_str(F.lead("o_orderdate").over(w_time)).alias("next_order_date"),
        F.dense_rank().over(w_price).alias("price_rank"),
        F.ntile(4).over(w_time).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Training-data op: overlapping token-window chunking (the document →
# training-sample shape). Expression-only fast path; the UDTF variant
# is pytest-pinned equivalent (tests/test_chunking.py).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.chunking import chunk_documents  # noqa: E402


@query(
    "q32_chunking",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         sized AS (SELECT doc_id, t, len(t) AS n,
                          1 + CAST(ceil(greatest(len(t) - 32, 0) / 16.0) AS INT) AS n_chunks
                   FROM toks)
    SELECT doc_id,
           i AS chunk_idx,
           array_to_string(list_slice(t, i * 16 + 1, i * 16 + 32), ' ') AS chunk_text,
           least(n - i * 16, 32) AS n_tokens
    FROM sized, (SELECT unnest(generate_series(0, 1000)) AS i) idx
    WHERE i < n_chunks
    """,
)
def q32_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", window=32, stride=16)


# ---------------------------------------------------------------------------
# Type-surface: DECIMAL money aggregation — exact cross-engine equality
# with NO rounding (SURVEY §1.3 lists DecimalType as unexercised by the
# reference; it is the correct type for money at scale, immune to the
# IEEE-sum-order nondeterminism doubles need ROUND for).
# ---------------------------------------------------------------------------

@query(
    "q33_decimal_money",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE) AS exact_base,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2))
               * CAST(l_discount AS DECIMAL(18, 2))) AS DOUBLE) AS exact_disc_amount,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q33_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The aggregation itself is exact decimal arithmetic (order-independent,
    # no float drift); only the FINAL scalar is cast to double, because the
    # two engines widen sum types to different decimal scales
    # (Spark decimal(28,2)/decimal(38,4) vs DuckDB DECIMAL(38,2)/(38,4)) and
    # render them differently under a value-hash. A correctly-rounded
    # decimal->double cast is deterministic and identical on both sides.
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("double").alias("exact_base"),
        F.sum(price * disc).cast("double").alias("exact_disc_amount"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Type-surface: MapType — JSON props parsed to map<string,bigint>,
# exploded to entries and re-aggregated (SURVEY §1.3: MapType
# unexercised by the reference).
# ---------------------------------------------------------------------------

@query(
    "q34_map_props",
    oracle="""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def q34_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    props_map = F.from_json("props", "map<string,bigint>")
    entries = ev.select(
        "event_type", F.explode(props_map).alias("key", "value")
    ).where(F.col("key") == "k")
    return entries.groupBy(
        "event_type", (F.col("value") % 10).alias("k_mod")
    ).agg(F.count(F.lit(1)).alias("n_events"))


# ---------------------------------------------------------------------------
# Aggregation surface: exact interpolated percentiles (median/p90) —
# both engines compute exact quantile interpolation, so values hash-
# match without approximation.
# ---------------------------------------------------------------------------

@query(
    "q35_percentiles",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q35_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Join surface: LEFT SEMI / LEFT ANTI (EXISTS / NOT EXISTS) — listed in
# SURVEY §2.3 as free engine surface; pinned here.
# ---------------------------------------------------------------------------

@query(
    "q36_semi_anti",
    oracle="""
    SELECT 'with_orders' AS tag, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders', COUNT(*), ROUND(SUM(c_acctbal), 2)
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q36_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    on = cust.c_custkey == orders.o_custkey

    def agg(df, tag):
        return df.agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        ).select(F.lit(tag).alias("tag"), "n_customers", "total_bal")

    return agg(cust.join(orders, on, "left_semi"), "with_orders").unionByName(
        agg(cust.join(orders, on, "left_anti"), "without_orders")
    )


# ---------------------------------------------------------------------------
# Training-data op: greedy sequence packing (rows-only check — the
# greedy fold is inherently sequential per group, not SQL-expressible;
# tests/test_chunking.py pins it against a row-by-row Python oracle).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.chunking import (  # noqa: E402
    PACK_GROUP_COL,
    pack_chunks,
)


@query("q37_packing")
def q37_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "doc_id", "text", window=32, stride=32)
    # project BEFORE packing: applyInPandas is opaque to Catalyst's
    # column pruning, so chunk_text would otherwise ride the shuffle
    # and the Arrow hop just to be dropped by the aggregate
    packed = pack_chunks(
        chunks.select("doc_id", "chunk_idx", "n_tokens"),
        "n_tokens",
        budget=256,
        order_cols=["doc_id", "chunk_idx"],
        num_groups=32,
    )
    return packed.groupBy(PACK_GROUP_COL, "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("pack_tokens"),
    )


# ---------------------------------------------------------------------------
# Reshape surface: PIVOT (wide) — groupBy().pivot() with the value set
# pinned so Spark skips the extra distinct-values job (and the plan
# stays a single hash aggregate; at 100 TB an unpinned pivot adds a
# full scan just to discover the two statuses).
# ---------------------------------------------------------------------------

@query(
    "q38_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q38_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # Spark names multi-agg pivot columns {value}_{alias}
    return wide.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
    )


# ---------------------------------------------------------------------------
# Reshape surface: UNPIVOT / MELT (long) — native `unpivot`, the exact
# inverse reshape; oracle is the canonical UNION ALL expansion.
# ---------------------------------------------------------------------------

@query(
    "q39_unpivot",
    oracle="""
    WITH wide AS (
        -- exact integer cents (the q63 contract, fourth member: the
        -- sf10 decade caught ROUND(SUM(double),2) drifting across the
        -- cent boundary on the 1.06e12 sum_price cells)
        SELECT l_returnflag,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS sum_price,
               CAST(SUM(CAST(ROUND(l_tax * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS sum_tax
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_tax', sum_tax FROM wide
    """,
)
def q39_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")

    def cents(c: str) -> F.Column:
        return F.round(F.col(c) * 100).cast("long")

    wide = li.groupBy("l_returnflag").agg(
        (F.sum(cents("l_quantity")) / 100.0).alias("sum_qty"),
        (F.sum(cents("l_extendedprice")) / 100.0).alias("sum_price"),
        (F.sum(cents("l_tax")) / 100.0).alias("sum_tax"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_tax"], "measure", "value"
    )


# ---------------------------------------------------------------------------
# §2.4 statistical aggregates — corr / covariance / stddev / variance.
# Single hash aggregate (all moments accumulate in one pass; ratios
# rounded 4dp, absolute moments 2dp for cross-engine float agreement).
# ---------------------------------------------------------------------------

@query(
    "q40_stats_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4)       AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
           ROUND(stddev_samp(l_extendedprice), 2)            AS price_stddev,
           ROUND(var_pop(l_discount), 4)                     AS disc_var,
           COUNT(*)                                          AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q40_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_pop("l_discount"), 4).alias("disc_var"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# F19/F20 explode with an oracle — closes the §8.1 "no nested testdata"
# gap by BUILDING the nested column (split) and exploding it, checked
# against DuckDB UNNEST(string_split(...)). Word histogram over p_name;
# top-20 pinned by (count desc, word).
# ---------------------------------------------------------------------------

@query(
    "q41_word_explode",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def q41_word_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# §2.3 band join — equi key (nation) carries the shuffle, the band
# predicate |c_acctbal − s_acctbal| ≤ 100 rides along as a post-join
# filter on the SAME hash join (no BNLJ: .explain shows one
# SortMergeJoin/BHJ with the band as `joinCondition`); nation dim
# broadcasts.
# ---------------------------------------------------------------------------

@query(
    "q42_band_join",
    oracle="""
    SELECT n.n_name,
           COUNT(*)                                   AS n_pairs,
           ROUND(SUM(ABS(c.c_acctbal - s.s_acctbal)), 2) AS total_gap
    FROM customer c
    JOIN supplier s
      ON c.c_nationkey = s.s_nationkey
     AND ABS(c.c_acctbal - s.s_acctbal) <= 100
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def q42_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    gap = F.abs(F.col("c_acctbal") - F.col("s_acctbal"))
    return (
        cust.join(
            supp,
            (F.col("c_nationkey") == F.col("s_nationkey")) & (gap <= 100),
        )
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(gap), 2).alias("total_gap"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 approximate aggregates (rows-only: HLL estimates are
# algorithm-specific, never cross-engine hash-stable). At 100 TB this
# is THE cardinality path — one pass, fixed memory per group, no
# shuffle of distinct values. Exact distinct rides alongside so the
# result itself witnesses the estimate quality (rsd 5% default).
# ---------------------------------------------------------------------------

@query("q43_approx_distinct")
def q43_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.round(
            F.expr("approx_percentile(value, array(0.5, 0.99))")[0], 2
        ).alias("approx_median_value"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# §2.4 grouping sets, full CUBE — all four (returnflag × linestatus)
# grouping combinations in ONE aggregate (Expand + single shuffle, not
# four scans); q28 covers the ROLLUP subset.
# ---------------------------------------------------------------------------

@query(
    "q44_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL')  AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*)                      AS n,
           ROUND(SUM(l_quantity), 2)     AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q44_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# §2.11 O4 MERGE/upsert — the reference's yearly-catchup re-ingest done
# as a relation: full-outer join on keys + column-wise COALESCE (one
# shuffle; bucketing makes it zero). Source = 1% of orders repriced
# +10% plus the same rows re-keyed as inserts; result aggregated per
# priority so the check is compact but covers update+insert+untouched.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.merge import merge_upsert  # noqa: E402


@query(
    "q45_merge_upsert",
    oracle="""
    WITH t AS (
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
    ),
    s AS (
        SELECT o_orderkey, o_orderpriority,
               ROUND(o_totalprice * 1.1, 2) AS o_totalprice
        FROM t WHERE o_orderkey % 100 = 0
        UNION ALL
        SELECT o_orderkey + 2000000000, 'NEW', 1000.0
        FROM t WHERE o_orderkey % 100 = 0
    ),
    m AS (
        SELECT COALESCE(s.o_orderkey, t.o_orderkey)           AS o_orderkey,
               COALESCE(s.o_orderpriority, t.o_orderpriority) AS o_orderpriority,
               COALESCE(s.o_totalprice, t.o_totalprice)       AS o_totalprice
        FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey
    )
    SELECT o_orderpriority, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
    FROM m GROUP BY o_orderpriority
    """,
)
def q45_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    hot = t.where(F.col("o_orderkey") % 100 == 0)
    src = hot.withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2)
    ).unionByName(
        hot.select(
            (F.col("o_orderkey") + 2000000000).alias("o_orderkey"),
            F.lit("NEW").alias("o_orderpriority"),
            F.lit(1000.0).alias("o_totalprice"),
        )
    )
    return (
        merge_upsert(t, src, ["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data op: deterministic hash sampling — Knuth multiplicative
# hash on the key, so the SAME rows are sampled on every engine and
# every run (seeded `sample()` is engine-specific; this is the
# reproducible-split idiom for train/eval carving at 100 TB: a map-side
# filter, no shuffle, prunes with the scan).
# ---------------------------------------------------------------------------

@query(
    "q46_hash_sample",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*)                 AS n_sampled,
           ROUND(AVG(c_acctbal), 4) AS avg_bal
    FROM customer
    WHERE (c_custkey * 2654435761) % 4294967296 < 429496730
    GROUP BY c_mktsegment
    """,
)
def q46_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    # ~10% systematic sample: multiplicative hash into [0, 2^32)
    keep = (F.col("c_custkey") * F.lit(2654435761)) % F.lit(4294967296) < F.lit(
        429496730
    )
    return (
        cust.where(keep)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


# ---------------------------------------------------------------------------
# §2.8 string similarity — edit distance (fuzzy matching, the
# record-linkage primitive). Distance histogram vs a fixed probe key;
# codegen'd JVM levenshtein, no UDF.
# ---------------------------------------------------------------------------

@query(
    "q47_edit_distance",
    oracle="""
    SELECT levenshtein(c_name, 'Customer#000000001') AS dist,
           COUNT(*) AS n
    FROM customer
    GROUP BY dist
    """,
)
def q47_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    return (
        cust.select(
            F.levenshtein(F.col("c_name"), F.lit("Customer#000000001")).alias("dist")
        )
        .groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.4 multi-DISTINCT aggregation — several COUNT(DISTINCT) over
# different columns in ONE query. Spark plans this with one Expand
# (row replicated per distinct group) + two-level aggregate — a single
# pipeline, not one scan per distinct column.
# ---------------------------------------------------------------------------

@query(
    "q48_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS n_suppliers,
           COUNT(DISTINCT l_partkey)  AS n_parts,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           ROUND(SUM(l_quantity), 2)  AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q48_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# §2.8 calendar functions — date_trunc / extract rollup to month grain
# (the reference's only temporal math is year extraction, F9; this
# pins the full calendar path both engines share).
# ---------------------------------------------------------------------------

@query(
    "q49_monthly_revenue",
    oracle="""
    SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
           EXTRACT(quarter FROM o_orderdate)::BIGINT AS quarter,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1995
    GROUP BY 1, 2
    """,
)
def q49_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.where(F.year("o_orderdate") == 1995)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .cast("string")
            .alias("month"),
            F.quarter("o_orderdate").cast("long").alias("quarter"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Scale op: dense global row index WITHOUT the single-partition window
# (operators/indexing.py: range exchange + partition-offset prefix
# sums + one Arrow pass). Oracle is the semantic spec — ROW_NUMBER()
# over the total order — which DuckDB runs single-node; the engine
# side never collapses to one partition (pinned in test_indexing.py).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.indexing import with_global_index  # noqa: E402


@query(
    "q50_global_index",
    oracle="""
    SELECT s_suppkey,
           ROW_NUMBER() OVER (ORDER BY s_nationkey, s_suppkey) - 1 AS idx,
           ROUND(s_acctbal, 2) AS acctbal
    FROM supplier
    """,
)
def q50_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = table(spark, sf_dir, "supplier")
    return with_global_index(
        supp, ["s_nationkey", "s_suppkey"], num_partitions=8
    ).select(
        "s_suppkey", "idx", F.round("s_acctbal", 2).alias("acctbal")
    )


# ---------------------------------------------------------------------------
# §2.4 family completion: arbitrary GROUPING SETS + grouping_id()
# (rollup q28 and cube q44 are the fixed-shape members). Single Expand
# node (plan-pinned in test_plans.py): Spark expands each input row
# once per grouping set, then one hash aggregate — no per-set rescans.
# gid bit i = 1 when grouping column i is rolled up; identical bitmask
# semantics in both engines.
# ---------------------------------------------------------------------------

@query(
    "q51_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())
    """,
)
def q51_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    # exact integer cents, one shared final divide (the q63 contract —
    # the sf10 decade caught ROUND(SUM(double), 2) drifting across the
    # cent boundary here too, at the 3.7e12 grand-total row)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents) / 100.0).alias("total"),
    )


# ---------------------------------------------------------------------------
# §2.8 higher-order array functions — transform / filter / aggregate
# over a per-order quantity array. Everything stays expression-level
# (plan-pinned UDF-free); the fold runs over the SORTED array so both
# engines reduce in the same order (all values are integer-valued
# doubles, so the sums are exact anyway).
# ---------------------------------------------------------------------------

@query(
    "q52_array_hof",
    oracle="""
    WITH arr AS (
        SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(qtys) AS n_items,
           len(list_filter(qtys, q -> q > 25)) AS n_big,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_filter(qtys, q -> q > 25)),
                             (acc, q) -> acc + q), 2) AS big_sum,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(qtys, q -> q * q)),
                             (acc, x) -> acc + x), 2) AS sum_sq
    FROM arr
    """,
)
def q52_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    arr = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qtys")
    )
    big = F.filter(F.col("qtys"), lambda q: q > 25)
    zero = F.lit(0.0)
    return arr.select(
        "l_orderkey",
        F.size("qtys").cast("long").alias("n_items"),
        F.size(big).cast("long").alias("n_big"),
        F.round(F.aggregate(big, zero, lambda acc, q: acc + q), 2).alias("big_sum"),
        F.round(
            F.aggregate(F.col("qtys"), zero, lambda acc, q: acc + q * q), 2
        ).alias("sum_sq"),
    )


# ---------------------------------------------------------------------------
# §2.4 J3 extension — as-of join, 'nearest' direction (full pandas
# merge_asof surface; the reference only needs backward). For every
# purchase, the closest view by the SAME user on either side, within
# the tolerance. Tie rule pinned on both engines: equal distance →
# earlier view (backward preference, pandas' rule), then view id.
# Distances are computed at second granularity (unix-epoch truncate)
# on both engines — date_diff('second', ...) counts boundary
# crossings, which is exactly trunc(b) - trunc(a).
# ---------------------------------------------------------------------------

@query(
    "q53_asof_nearest",
    oracle=f"""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         v AS (SELECT * FROM events WHERE event_type = 'view'),
         j AS (
            SELECT p.event_id, p.user_id, v.event_id AS view_event_id,
                   abs(date_diff('second', v.ts, p.ts)) AS secs_diff,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.event_id
                       ORDER BY abs(date_diff('second', v.ts, p.ts)),
                                date_diff('second', TIMESTAMP '1970-01-01 00:00:00', v.ts),
                                v.event_id) AS rn
            FROM p JOIN v ON p.user_id = v.user_id
            WHERE abs(date_diff('second', v.ts, p.ts)) <= {_ASOF_TOL_S}
         )
    SELECT p.event_id, p.user_id, j.view_event_id, j.secs_diff
    FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (event_id)
    """,
)
def q53_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        direction="nearest",
        left_keys=["event_id"],
        tiebreak=["view_event_id"],
        diff_col="secs_diff",
    )
    return joined.select("event_id", "user_id", "view_event_id", "secs_diff")


# ---------------------------------------------------------------------------
# Approximate distinct, deterministic x-engine variant: a KMV
# (k-minimum-values) sketch over the cross-engine rolling hash.
# q43's HLL is engine-specific (rows-only check); this one computes
# the IDENTICAL estimate in both engines — the whole sketch is
# value-hash-tested. Operator: operators/sketch.py (local per-
# partition top-k combine → tiny merge; no full-distinct sort).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sketch import kmv_distinct  # noqa: E402

_KMV_K = 64


# (_sql_roll_of is defined once, next to _sql_roll, earlier in this module)


@query(
    "q43b_kmv_distinct",
    oracle=f"""
    WITH d AS (
        SELECT DISTINCT event_type,
               (1103515245 * {_sql_roll_of("CAST(user_id AS VARCHAR)")}
                + 12345) % 2147483647 AS h
        FROM events
        WHERE user_id IS NOT NULL
    ),
    r AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM d
    ),
    a AS (
        SELECT event_type, MAX(rn) AS n,
               MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
        FROM r WHERE rn <= {_KMV_K}
        GROUP BY event_type
    )
    SELECT event_type,
           CASE WHEN n < {_KMV_K} THEN CAST(n AS BIGINT)
                ELSE CAST(FLOOR(CAST({_KMV_K - 1} AS DOUBLE) * 2147483647
                                / CAST(hk AS DOUBLE)) AS BIGINT)
           END AS approx_users
    FROM a
    """,
)
def q43b_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return kmv_distinct(
        ev, ["event_type"], "user_id", k=_KMV_K, out_col="approx_users"
    )


# ---------------------------------------------------------------------------
# Dedup clustering: near-dup pairs -> duplicate clusters via distributed
# connected components (operators.graph). The reference's dedup surface
# stops at pair emission; a real dedup pass must take the transitive
# closure of those pairs to elect one canonical survivor per cluster.
# Edges come from the oracle-validated n-gram Jaccard generator (q19);
# the DuckDB oracle re-derives the same pairs and closes them with a
# recursive reachability CTE (fine at oracle scale; the Spark side is
# the O(log n)-round pointer-jumping path that scales).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.graph import dedup_clusters  # noqa: E402

@query(
    "q54_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
         toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         gsets AS MATERIALIZED (SELECT doc_id, {_SQL_GRAMS3} AS g
                                FROM toks WHERE len({_SQL_GRAMS3}) > 0),
         inv0 AS (SELECT doc_id, unnest(g) AS gram FROM gsets),
         -- df-cut mirror (max_df=64, the q19 semantic): stop-grams
         -- leave the gram UNIVERSE, bounding posting-list fan-out —
         -- the sf10 ENOSPC fix (quadratic cand + per-pair
         -- list_intersect spilled past 70 GB before this rewrite)
         keep AS (SELECT gram FROM inv0 GROUP BY gram HAVING COUNT(*) <= 64),
         inv AS MATERIALIZED (SELECT inv0.* FROM inv0 JOIN keep USING (gram)),
         sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n
                                FROM inv GROUP BY 1),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         COUNT(*) AS ninter
                  FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         pairs AS MATERIALIZED (
                  SELECT id_a, id_b
                  FROM cand
                  JOIN sizes sa ON sa.doc_id = cand.id_a
                  JOIN sizes sb ON sb.doc_id = cand.id_b
                  WHERE ninter / (sa.n + sb.n - ninter) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL
                   SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
         ),
         cc AS (SELECT id, MIN(r) AS lbl FROM reach GROUP BY id)
    SELECT d.doc_id,
           CAST(COALESCE(cc.lbl, d.doc_id) AS BIGINT) AS cluster_id,
           COALESCE(cc.lbl, d.doc_id) = d.doc_id      AS is_canonical
    FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
    """,
)
def q54_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    # max_df=64 on BOTH sides (inert below sf1 — max gram df at sf0.1
    # is 25 — and the scale-correct stop-gram semantic above it)
    pairs = ngram_jaccard_pairs_exact(
        docs, "doc_id", "text", n=3, threshold=0.8, max_df=64
    )
    cl = dedup_clusters(pairs.select("id_a", "id_b"))
    # clusters frame is tiny vs the corpus (only docs with >=1 near-dup
    # edge) -> auto-broadcast left join; singletons are their own cluster
    cid = F.coalesce(F.col("cluster_id"), F.col("doc_id")).cast("bigint")
    return (
        docs.select("doc_id")
        .join(cl.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            cid.alias("cluster_id"),
            (cid == F.col("doc_id")).alias("is_canonical"),
        )
    )


# ---------------------------------------------------------------------------
# Heavy hitters: exact frequent-item counts via two-pass Misra–Gries
# (per-partition bounded-state candidates, broadcast-semi recount) —
# never a full-key-space shuffle. Oracle is the naive GROUP BY/HAVING.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sketch import heavy_hitters  # noqa: E402

@query(
    "q57_heavy_hitters",
    oracle="""
    SELECT user_id, COUNT(*) AS item_count
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
    HAVING COUNT(*) >= CEIL((SELECT COUNT(*) FROM events WHERE user_id IS NOT NULL) * 0.008)
    """,
)
def q57_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", 0.008, count_col="item_count")


# ---------------------------------------------------------------------------
# Correlated subqueries (SQL surface): Catalyst decorrelates EXISTS to a
# left-semi join and a correlated scalar aggregate to a grouped join —
# no per-row re-execution. TPC-H Q4/Q17 shapes adapted to the testdata
# schema (no commit/receipt dates; return flag stands in).
# ---------------------------------------------------------------------------

def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for t in names:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "q55_exists_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q55_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
    """)


@query(
    "q56_small_qty_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q56_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql("""
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
    """)


# ---------------------------------------------------------------------------
# Change-data-capture between snapshots: full-outer key join, null-safe
# column compare, insert/update/delete labels — the incremental-crawl
# versioning primitive. Oracle is the textbook FULL OUTER JOIN shape.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.merge import snapshot_diff  # noqa: E402


@query(
    "q58_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 10 < 8
    ), new AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10 ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 10 >= 2
    )
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_custkey ELSE o.o_custkey END AS o_custkey,
           CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_totalprice ELSE o.o_totalprice END AS o_totalprice,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_custkey IS DISTINCT FROM n.o_custkey
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
)
def q58_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    old = base.where(F.col("o_orderkey") % 10 < 8)
    new = base.where(F.col("o_orderkey") % 10 >= 2).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(old, new, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Interval-overlap join: view intervals [ts, ts+value sec] x sampled
# error windows [ts, ts+600 sec], bucketized to an equi join with
# first-shared-bucket claiming (no theta-join BNLJ, no DISTINCT).
# Oracle is the naive range-predicate join.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.interval import interval_join  # noqa: E402


@query(
    "q59_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT event_id AS view_id, ts AS v_start,
             ts + to_seconds(CAST(FLOOR(value) AS BIGINT)) AS v_end
      FROM events WHERE event_type = 'view'
    ), b AS (
      SELECT event_id AS err_id, ts AS w_start, ts + to_seconds(600) AS w_end
      FROM events WHERE event_type = 'error' AND event_id % 10 = 0
    )
    SELECT a.view_id, b.err_id,
           CAST(epoch_us(least(a.v_end, b.w_end)) - epoch_us(greatest(a.v_start, b.w_start)) AS BIGINT) AS overlap_us
    FROM a JOIN b ON a.v_start <= b.w_end AND b.w_start <= a.v_end
    """,
)
def q59_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_start"),
        F.timestamp_micros(
            epoch_us("ts") + F.floor("value").cast("long") * 1_000_000
        ).alias("v_end"),
    )
    errors = ev.where(
        (F.col("event_type") == "error") & (F.col("event_id") % 10 == 0)
    ).select(
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("w_start"),
        F.timestamp_micros(epoch_us("ts") + 600_000_000).alias("w_end"),
    )
    pairs = interval_join(
        views,
        errors,
        ("v_start", "v_end"),
        ("w_start", "w_end"),
        bucket_width_us=600_000_000,
    )
    return pairs.select(
        F.col("view_id_a").alias("view_id"),
        F.col("err_id_b").alias("err_id"),
        (
            epoch_us(F.least("v_end_a", "w_end_b"))
            - epoch_us(F.greatest("v_start_a", "w_start_b"))
        ).alias("overlap_us"),
    )


# ---------------------------------------------------------------------------
# Exact stratified sampling: ceil(frac*n) rows per language stratum by
# smallest (knuth_hash, id) — distributed order-statistic selection
# (bounded per-task candidate state), never a per-stratum window sort.
# Oracle is the ROW_NUMBER specification it implements.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sampling import stratified_sample_exact  # noqa: E402


@query(
    "q60_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents) t
    WHERE rn <= CEIL(0.2 * n)
    """,
)
def q60_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample_exact(docs, "lang", "doc_id", 0.2).select(
        "doc_id", "lang"
    )


# ---------------------------------------------------------------------------
# Linear-model-fit aggregates: per-group OLS slope/intercept/R² as
# single-pass regr_* aggregates (one hash agg, no iteration).
# ---------------------------------------------------------------------------

@query(
    "q61_regression_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q61_regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity").cast("long").alias("n"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Inverted index with a document-frequency window (drops hapax noise
# AND all-document stop tokens — the unbounded-posting-list guard).
# Posting lists emitted as canonical '|'-joined strings so the value
# hash is representation-stable across engines.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.text import build_inverted_index  # noqa: E402


@query(
    "q62_inverted_index",
    oracle="""
    SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           string_agg(DISTINCT doc_id, '|' ORDER BY doc_id) AS postings
    FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
          FROM documents)
    WHERE length(token) > 0
    GROUP BY token
    HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 450
    """,
)
def q62_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    idx = build_inverted_index(docs, "doc_id", "text", min_df=2, max_df=450)
    return idx.select(
        "token",
        "df",
        F.array_join(
            F.transform("postings", lambda x: x.cast("string")), "|"
        ).alias("postings"),
    )


# ---------------------------------------------------------------------------
# Multi-hop star join (TPC-H Q7 "volume shipping" shape): 5-way join
# across supplier/lineitem/orders/customer with nation on BOTH ends,
# nation-pair filter, per-year conditional revenue rollup. Exercises
# Catalyst join reordering + double broadcast of the same dim.
# ---------------------------------------------------------------------------

@query(
    "q63_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           -- exact integer micro-units (price cents x discount pct),
           -- half-up to whole cents in INTEGER arithmetic: float SUM
           -- order diverges across engines at sf1 scale, landing on
           -- opposite sides of the half-cent boundary
           ((CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                  AS BIGINT) + 5000) // 10000) / 100.0 AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_3')
      AND n2.n_name IN ('NATION_1', 'NATION_3')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def q63_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_3"]
    n1 = nation.where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).cast("long").alias("micro")
        )
        # exact integer micro-units, half-up to whole cents with
        # INTEGER division (micro is always positive), then one shared
        # float divide: both engines derive the double from the SAME
        # bigint, so the rendered value is bit-identical at every SF
        .select(
            "supp_nation", "cust_nation", "l_year",
            (F.expr("(micro + 5000) div 10000") / F.lit(100.0)).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Calendar-spine gap fill: per-customer month spine from first to last
# order month (sequence + explode — bounded by the span, never a
# cross join with a global calendar), left join actuals, zero-fill.
# ---------------------------------------------------------------------------

@query(
    "q64_gap_fill",
    oracle="""
    WITH m AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS mon,
                      SUM(o_totalprice) AS rev
               FROM orders GROUP BY 1, 2),
         b AS (SELECT o_custkey, MIN(mon) AS mn, MAX(mon) AS mx FROM m GROUP BY 1),
         spine AS (SELECT o_custkey, unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS mon
                   FROM b)
    SELECT s.o_custkey, strftime(s.mon, '%Y-%m') AS mon,
           COALESCE(ROUND(m.rev, 2), 0.0) AS rev
    FROM spine s LEFT JOIN m ON m.o_custkey = s.o_custkey AND m.mon = s.mon
    """,
)
def q64_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    m = orders.groupBy(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(F.sum("o_totalprice").alias("rev"))
    bounds = m.groupBy("o_custkey").agg(
        F.min("mon").alias("mn"), F.max("mon").alias("mx")
    )
    spine = bounds.select(
        "o_custkey",
        F.explode(F.expr("sequence(mn, mx, interval 1 month)")).alias("mon"),
    )
    return spine.join(m, ["o_custkey", "mon"], "left").select(
        "o_custkey",
        F.date_format("mon", "yyyy-MM").alias("mon"),
        F.coalesce(F.round("rev", 2), F.lit(0.0)).alias("rev"),
    )


# ---------------------------------------------------------------------------
# Quality: within-document repetition (duplicate k-gram fraction, the
# Gopher boilerplate signal) — expression-only scan.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.text import contamination_pairs, repetition_stats  # noqa: E402


@query(
    "q65_repetition",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
         g AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(t)-2, 0)),
                                             i -> concat_ws(' ', t[i], t[i+1], t[i+2])) AS grams
               FROM toks)
    SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
           ROUND(1 - len(list_distinct(grams)) / len(grams), 4) AS dup_frac
    FROM g WHERE len(grams) > 0
    """,
)
def q65_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Decontamination: corpus docs sharing >= 3 distinct 3-word shingles
# with any "benchmark" doc (stand-in: doc_id % 20 == 0) — posting-list
# join with a broadcast benchmark index, never doc-vs-doc pairs.
# ---------------------------------------------------------------------------

@query(
    "q66_decontamination",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
         g AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)),
                    i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS grams FROM toks),
         inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         bench AS (SELECT doc_id AS bench_id, gram FROM inv WHERE doc_id % 20 = 0),
         corp AS (SELECT doc_id, gram FROM inv WHERE doc_id % 20 <> 0)
    SELECT c.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM corp c JOIN bench b USING (gram)
    GROUP BY 1, 2 HAVING COUNT(*) >= 3
    """,
)
def q66_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    return contamination_pairs(corpus, bench).select(
        "doc_id", "bench_id", F.col("n_shared").cast("long").alias("n_shared")
    )


# ---------------------------------------------------------------------------
# Funnel analysis: ordered signup -> view (24h) -> purchase (24h)
# conversion as sequential conditional-min aggregations — each stage is
# one groupBy over a stage-filtered join, no window over full event
# history, no per-user event collection.
# ---------------------------------------------------------------------------

@query(
    "q67_funnel",
    oracle="""
    WITH s AS (SELECT user_id, MIN(ts) AS s_ts FROM events WHERE event_type='signup' GROUP BY 1),
         v AS (SELECT e.user_id, MIN(e.ts) AS v_ts FROM events e JOIN s USING (user_id)
               WHERE e.event_type='view' AND e.ts > s.s_ts AND e.ts <= s.s_ts + to_seconds(86400) GROUP BY 1),
         p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e JOIN v USING (user_id)
               WHERE e.event_type='purchase' AND e.ts > v.v_ts AND e.ts <= v.v_ts + to_seconds(86400) GROUP BY 1)
    SELECT 'signup' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM s
    UNION ALL SELECT 'view_24h', CAST(COUNT(*) AS BIGINT) FROM v
    UNION ALL SELECT 'purchase_24h', CAST(COUNT(*) AS BIGINT) FROM p
    """,
)
def q67_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    day_us = 86_400_000_000

    def next_stage(prev: DataFrame, prev_ts: str, etype: str, out_ts: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == etype)
            .join(prev, "user_id")
            .where(
                (F.col("ts") > F.col(prev_ts))
                & (
                    epoch_us("ts")
                    <= epoch_us(prev_ts) + F.lit(day_us)
                )
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = next_stage(s, "s_ts", "view", "v_ts")
    p = next_stage(v, "v_ts", "purchase", "p_ts")

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("users")
        )

    return (
        stage(s, "signup")
        .unionByName(stage(v, "view_24h"))
        .unionByName(stage(p, "purchase_24h"))
    )


# ---------------------------------------------------------------------------
# Retention cohorts: first-activity-day cohort x days-since activity
# matrix — two aggs and one shuffle join on user_id, never a per-user
# event array.
# ---------------------------------------------------------------------------

@query(
    "q68_retention",
    oracle="""
    WITH f AS (SELECT user_id, date_trunc('day', MIN(ts)) AS cohort FROM events GROUP BY 1),
         act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
           CAST(date_diff('day', cohort, d) AS BIGINT) AS days_since,
           CAST(COUNT(*) AS BIGINT) AS users
    FROM act JOIN f USING (user_id) GROUP BY 1, 2
    """,
)
def q68_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    act = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            F.datediff("d", "cohort").cast("long").alias("days_since"),
        )
        .agg(F.count(F.lit(1)).alias("users"))
    )


# ---------------------------------------------------------------------------
# Fuzzy join: distinct part names at Levenshtein distance exactly 1 via
# the FastSS deletion-neighborhood equi join (lossless candidates +
# codegen'd verify, never all-pairs). Oracle brute-forces the tiny
# distinct-name set.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.dedup import fuzzy_pairs_edit1  # noqa: E402


@query(
    "q69_fuzzy_pairs",
    oracle="""
    WITH n AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b
    FROM n a JOIN n b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) = 1
    """,
)
def q69_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fuzzy_pairs_edit1(table(spark, sf_dir, "part"), "p_name")


# ---------------------------------------------------------------------------
# Feature normalization: per-nation z-score of account balance via a
# grouped-stats broadcast join (tiny stats side), not a window over
# nation partitions (25 giant partitions at scale).
# ---------------------------------------------------------------------------

@query(
    "q70_group_zscore",
    oracle="""
    WITH st AS (SELECT c_nationkey, AVG(c_acctbal) AS mu, STDDEV_SAMP(c_acctbal) AS sd
                FROM customer GROUP BY 1)
    SELECT c_custkey, ROUND((c_acctbal - mu) / sd, 4) + 0.0 AS z
    FROM customer JOIN st USING (c_nationkey)
    """,
)
def q70_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # + 0.0 on BOTH sides collapses IEEE -0.0 to 0.0 — a tiny negative
    # z rounds to the zero the engines RENDER differently (the q191
    # lesson, found again by the skew differential at §11.69)
    cust = table(spark, sf_dir, "customer")
    st = cust.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("mu"), F.stddev_samp("c_acctbal").alias("sd")
    )
    return cust.join(F.broadcast(st), "c_nationkey").select(
        "c_custkey",
        (F.round((F.col("c_acctbal") - F.col("mu")) / F.col("sd"), 4)
         + F.lit(0.0)).alias("z"),
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization: per-vector scale + floor-quantized
# checksum, all higher-order array expressions (no UDF). floor (not
# round) keeps the quantization bit-identical across engines.
# ---------------------------------------------------------------------------

@query(
    "q71_quantize",
    oracle="""
    WITH d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings)
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(e, x -> x * x))), 4) AS l2_norm,
           ROUND(127.0 / list_max(list_transform(e, x -> abs(x))), 4) AS scale,
           CAST(list_sum(list_transform(e, x ->
                CAST(FLOOR(x * 127.0 / list_max(list_transform(e, y -> abs(y)))) AS BIGINT)))
             AS BIGINT) AS q_checksum
    FROM d
    """,
)
def q71_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = emb.select("vec_id", e.alias("e"))
    zero = F.lit(0.0)
    max_abs = F.array_max(F.transform(F.col("e"), lambda x: F.abs(x)))
    scale = F.lit(127.0) / max_abs
    return d.select(
        "vec_id",
        F.round(
            F.sqrt(F.aggregate(F.col("e"), zero, lambda acc, x: acc + x * x)), 4
        ).alias("l2_norm"),
        F.round(scale, 4).alias("scale"),
        # (x * 127.0) / max, NOT x * (127.0/max): float non-associativity
        # flips floor() near integers, so both engines must share the
        # exact evaluation order
        F.aggregate(
            F.col("e"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.floor(x * F.lit(127.0) / max_abs).cast("long"),
        ).alias("q_checksum"),
    )


# ---------------------------------------------------------------------------
# Time-series rolling aggregate with a RANGE (value-based) frame: 30-day
# rolling revenue per customer over a daily pre-aggregate. RANGE frames
# handle irregular time series correctly (gaps don't shrink the
# window), unlike ROWS frames; partitioning is per-customer (millions
# of small partitions at scale, no giant-partition hazard).
# ---------------------------------------------------------------------------

@query(
    "q72_rolling_revenue",
    oracle="""
    WITH daily AS (SELECT o_custkey,
                          CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS d,
                          SUM(o_totalprice) AS rev
                   FROM orders GROUP BY 1, 2)
    SELECT o_custkey, d,
           ROUND(SUM(rev) OVER (PARTITION BY o_custkey ORDER BY d
                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 2) AS rev_30d
    FROM daily
    """,
)
def q72_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_custkey",
        F.datediff("o_orderdate", F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-29, 0)
    return daily.select(
        "o_custkey", "d", F.round(F.sum("rev").over(w), 2).alias("rev_30d")
    )


# ---------------------------------------------------------------------------
# Conjunctive search over the inverted index: docs containing BOTH
# terms via posting-list intersection (array_intersect of two sorted
# posting arrays — a 1x1 join of index rows, never a rescan of the
# corpus).
# ---------------------------------------------------------------------------

@query(
    "q73_conjunctive_search",
    oracle="""
    WITH inv AS (SELECT doc_id, unnest(list_distinct(string_split_regex(lower(text), '[^a-z]+'))) AS token
                 FROM documents)
    SELECT a.doc_id FROM inv a JOIN inv b USING (doc_id)
    WHERE a.token = 'dup' AND b.token = 'the'
    """,
)
def q73_conjunctive_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    idx = build_inverted_index(
        docs, "doc_id", "text", min_df=1, vocabulary=["dup", "the"]
    )
    a = idx.where(F.col("token") == "dup").select(F.col("postings").alias("pa"))
    b = idx.where(F.col("token") == "the").select(F.col("postings").alias("pb"))
    return a.crossJoin(b).select(
        F.explode(F.array_intersect("pa", "pb")).alias("doc_id")
    )


# ---------------------------------------------------------------------------
# Quantized-prefix sequence packing: bin = floor(exclusive-prefix-sum /
# budget) per hash group — the fully SQL-expressible packing policy
# (bins may overflow by < 1 chunk), complementing q37's exact greedy
# packer whose sequential fold is rows-only-checkable. One window over
# hash-group partitions, deterministic order.
# ---------------------------------------------------------------------------

@query(
    "q74_packing_quantized",
    oracle="""
    WITH t AS (SELECT doc_id, doc_id % 8 AS grp,
                      CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
               FROM documents)
    SELECT doc_id, grp,
           CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY grp ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok) / 512.0) AS BIGINT) AS bin_id
    FROM t
    """,
)
def q74_packing_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from redskins_rule_spark.operators.text import token_count

    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("grp"),
        token_count("text").cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "doc_id",
        "grp",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 512.0)
        .cast("long")
        .alias("bin_id"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top term per document: tf and df aggregates + a broadcast
# corpus-size join, argmax pinned on (rounded score, token) so the
# cross-engine ordering is exact.
# ---------------------------------------------------------------------------

@query(
    "q75_tfidf_top_term",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
                 FROM documents),
         tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok WHERE length(token) > 0 GROUP BY 1, 2),
         dfq AS (SELECT token, COUNT(DISTINCT doc_id) AS dfreq FROM tok WHERE length(token) > 0 GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         scored AS (SELECT doc_id, token, ROUND(tf * ln(n_docs / dfreq), 4) AS tfidf
                    FROM tf JOIN dfq USING (token) CROSS JOIN n)
    SELECT doc_id, token AS top_token, tfidf
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token DESC) = 1
    """,
)
def q75_tfidf_top_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("token"),
    ).where(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("dfreq")
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")), 4
            ).alias("tfidf"),
        )
    )
    # argmax via one hash agg (max_by on a struct), not a window sort
    return scored.groupBy("doc_id").agg(
        F.max_by(
            F.struct(F.col("token").alias("top_token"), F.col("tfidf")),
            F.struct("tfidf", "token"),
        ).alias("m")
    ).select("doc_id", "m.top_token", "m.tfidf")


# ---------------------------------------------------------------------------
# PageRank (3 fixed iterations) over the customer->supplier purchase
# graph. The oracle unrolls the same three iterations as chained
# aggregate CTEs — bit-compatible arithmetic: (1.0-0.85) is written
# identically on both sides because the IEEE double of the literal
# 0.15 differs from 1.0-0.85 in the last ulp.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.graph import pagerank  # noqa: E402

# every CTE here is referenced by ALL downstream iterations — without
# MATERIALIZED pins DuckDB's naive inlining re-evaluates the 60M-row
# orders x lineitem DISTINCT per reference and spills past the disk at
# sf10 (the q146 failure class)
_PR_ORACLE = """
    WITH e AS MATERIALIZED (
               SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
               FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
         nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
         outd AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM e GROUP BY 1),
         r0 AS MATERIALIZED (SELECT id, 1.0 / n AS r FROM nodes CROSS JOIN nn),
         {iters}
    SELECT id, ROUND(r, 8) AS rank FROM r{k}
"""

def _pr_iter(t: int) -> str:
    return (
        f"c{t} AS MATERIALIZED (SELECT e.dst AS id, SUM(r{t-1}.r / outd.od) AS s "
        f"FROM e JOIN r{t-1} ON r{t-1}.id = e.src JOIN outd ON outd.src = e.src GROUP BY 1), "
        f"r{t} AS MATERIALIZED (SELECT nodes.id, (1.0 - 0.85) / n + 0.85 * COALESCE(c{t}.s, 0.0) AS r "
        f"FROM nodes CROSS JOIN nn LEFT JOIN c{t} ON c{t}.id = nodes.id)"
    )


@query(
    "q76_pagerank",
    oracle=_PR_ORACLE.format(iters=", ".join(_pr_iter(t) for t in (1, 2, 3)), k=3),
)
def q76_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("src"),
        (F.col("l_suppkey") + 1_000_000).alias("dst"),
    )
    pr = pagerank(edges, iterations=3, damping=0.85)
    return pr.select("id", F.round("rank", 8).alias("rank"))


# ---------------------------------------------------------------------------
# Multiset set operations: INTERSECT ALL / EXCEPT ALL keep duplicate
# cardinality (bag semantics) — one tagged union exercising both.
# ---------------------------------------------------------------------------

@query(
    "q77_multiset_ops",
    oracle="""
    SELECT 'both' AS tag, l_suppkey FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag='R'
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag='A')
    UNION ALL
    SELECT 'only_r', l_suppkey FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag='R'
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag='A')
    """,
)
def q77_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select("l_suppkey")
    a = li.where(F.col("l_returnflag") == "A").select("l_suppkey")
    return (
        r.intersectAll(a)
        .select(F.lit("both").alias("tag"), "l_suppkey")
        .unionByName(
            r.exceptAll(a).select(F.lit("only_r").alias("tag"), "l_suppkey")
        )
    )


# ---------------------------------------------------------------------------
# posexplode: token position (ordinality) survives the explode — the
# order-preserving flatten a chunker/aligner needs. Oracle enumerates
# via a lateral generate_series index.
# ---------------------------------------------------------------------------

@query(
    "q78_posexplode",
    oracle="""
    SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS pos, d.toks[t.i] AS token
    FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS toks
          FROM documents WHERE doc_id % 50 = 0) d,
         UNNEST(generate_series(1, len(d.toks))) AS t(i)
    WHERE length(d.toks[t.i]) > 0
    """,
)
def q78_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("doc_id") % 50 == 0)
        .select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), "[^a-z]+")).alias(
                "pos", "token"
            ),
        )
        .where(F.length("token") > 0)
    )


# ===========================================================================
# Round-3 additions
# ===========================================================================

from redskins_rule_spark.functions.dates import epoch_us as _epoch_us  # noqa: E402, F401
from redskins_rule_spark.operators.multimodal import (  # noqa: E402
    decode_audio_meta,
    with_wav_payload,
)
from redskins_rule_spark.operators.text import vocab_prune  # noqa: E402


# ---------------------------------------------------------------------------
# Corpus-level vocabulary pruning (C4/CCNet-style boilerplate + noise
# removal): drop tokens with document-frequency > 70% (boilerplate) or
# corpus count < 3 (noise), keep per-doc token order, fingerprint the
# survivor sequence so the oracle checks content, not just counts.
# ---------------------------------------------------------------------------

@query(
    "q79_vocab_prune",
    oracle=f"""
    WITH base AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
         toks AS (SELECT doc_id,
                         unnest(generate_series(1, len(ts))) AS pos,
                         unnest(ts) AS tok
                  FROM base),
         stats AS (SELECT tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cnt
                   FROM toks GROUP BY tok),
         keep AS (SELECT tok FROM stats
                  WHERE cnt >= 3
                    AND df <= 0.7 * (SELECT COUNT(DISTINCT doc_id) FROM documents)),
         kept AS (SELECT doc_id, list(tok ORDER BY pos) AS kt
                  FROM toks JOIN keep USING (tok) GROUP BY doc_id),
         strs AS (SELECT doc_id, CAST(len(kt) AS BIGINT) AS n_kept,
                         array_to_string(kt, ' ') AS s
                  FROM kept)
    SELECT doc_id, n_kept, {_SQL_POLYHASH} AS kept_fp FROM strs
    """,
)
def q79_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pruned = vocab_prune(docs, "text", "doc_id", max_df_ratio=0.7, min_count=3)
    return pruned.select(
        "doc_id",
        F.size("kept").cast("long").alias("n_kept"),
        char_fingerprint(F.concat_ws(" ", F.col("kept"))).alias("kept_fp"),
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE): ancestor closure over a
# synthetic bill-of-materials DAG (child -> child div 10, strictly
# decreasing, guaranteed acyclic). Recursion happens INSIDE Catalyst —
# a UnionLoop plan, not a driver-side iteration like q76's PageRank.
# ---------------------------------------------------------------------------

@query(
    "q80_transitive_closure",
    oracle="""
    WITH RECURSIVE chain(node, up, depth) AS (
        SELECT p_partkey, p_partkey // 10, 1 FROM part WHERE p_partkey >= 10
        UNION ALL
        SELECT c.node, e.parent, c.depth + 1
        FROM chain c
        JOIN (SELECT p_partkey AS child, p_partkey // 10 AS parent
              FROM part WHERE p_partkey >= 10) e
          ON c.up = e.child
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(up AS BIGINT) AS ancestor,
           CAST(depth AS BIGINT) AS depth
    FROM chain
    """,
)
def q80_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4.1's recursive-CTE guardrail defaults to 1M total rows;
    # the closure is ~7 levels x |part| (sf10: 2M parts -> ~14M chain
    # rows), so raise the ROW limit — the LEVEL limit (100) still
    # bounds runaway recursion, which is the failure the guardrail
    # actually exists for. The override is SCOPED (ADVICE r11): the
    # recursion is materialized eagerly under the raised limit via
    # localCheckpoint, then the prior value is restored so later
    # queries in the same session keep the guardrail.
    key = "spark.sql.cteRecursionRowLimit"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, str(500_000_000))
    try:
        return _q80_chain(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def _q80_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy WITH RECURSIVE plan itself — split out so the plan
    gate (tests/test_plans.py) can assert the UnionLoop node before
    q80's eager localCheckpoint truncates the lineage."""
    table(spark, sf_dir, "part").createOrReplaceTempView("__q80_part")
    return spark.sql(
        """
        WITH RECURSIVE chain(node, up, depth) AS (
            SELECT p_partkey, p_partkey DIV 10, 1 FROM __q80_part WHERE p_partkey >= 10
            UNION ALL
            SELECT c.node, e.parent, c.depth + 1
            FROM chain c
            JOIN (SELECT p_partkey AS child, p_partkey DIV 10 AS parent
                  FROM __q80_part WHERE p_partkey >= 10) e
              ON c.up = e.child
        )
        SELECT CAST(node AS BIGINT) AS node,
               CAST(up AS BIGINT) AS ancestor,
               CAST(depth AS BIGINT) AS depth
        FROM chain
        """
    )


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery with ORDER BY + LIMIT (top-n per outer
# row expressed the SQL-standard way; same text runs on DuckDB).
# ---------------------------------------------------------------------------

_Q81_SQL = """
    SELECT n.n_name AS nation, t.c_name AS customer,
           ROUND(t.c_acctbal, 2) AS acctbal
    FROM {nation} n, LATERAL (
        SELECT c_name, c_acctbal FROM {customer} c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
"""

@query(
    "q81_lateral_topn",
    oracle=_Q81_SQL.format(nation="nation", customer="customer"),
)
def q81_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").createOrReplaceTempView("__q81_nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("__q81_customer")
    return spark.sql(
        _Q81_SQL.format(nation="__q81_nation", customer="__q81_customer")
    )


# ---------------------------------------------------------------------------
# Collocation mining: corpus bigram PMI (pointwise mutual information)
# with a count floor — the classic phrase-detection pass before
# tokenizer training. Unigram/bigram totals ride as broadcast 1-row
# aggregates; the per-word count join is vocabulary-sized.
# ---------------------------------------------------------------------------

@query(
    "q82_bigram_pmi",
    oracle=f"""
    WITH base AS (SELECT {_SQL_TOKENS} AS t FROM documents
                  WHERE len({_SQL_TOKENS}) > 1),
         uni AS (SELECT unnest(t) AS tok FROM base),
         unic AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
         n1 AS (SELECT COUNT(*) AS n FROM uni),
         bi AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                       i -> concat_ws(' ', t[i], t[i+1]))) AS bg FROM base),
         bic AS (SELECT bg, COUNT(*) AS cab FROM bi GROUP BY bg HAVING COUNT(*) >= 5),
         n2 AS (SELECT COUNT(*) AS n FROM bi),
         scored AS (
           SELECT bg, cab,
                  ROUND(ln((CAST(cab AS DOUBLE) / n2.n) /
                           ((CAST(ca.c AS DOUBLE) / n1.n) * (CAST(cb.c AS DOUBLE) / n1.n))), 4) AS pmi
           FROM bic, n1, n2
           JOIN unic ca ON ca.tok = string_split(bg, ' ')[1]
           JOIN unic cb ON cb.tok = string_split(bg, ' ')[2])
    SELECT bg, cab, pmi
    FROM (SELECT scored.*, ROW_NUMBER() OVER (ORDER BY pmi DESC, bg) AS rn FROM scored)
    WHERE rn <= 20
    """,
)
def q82_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select(t.alias("t")).where(F.size("t") > 1)
    uni = base.select(F.explode("t").alias("tok"))
    unic = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n1 = uni.agg(F.count(F.lit(1)).alias("n1"))
    bi = base.select(
        F.explode(
            F.zip_with(
                F.expr("slice(t, 1, size(t) - 1)"),
                F.expr("slice(t, 2, size(t) - 1)"),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg")
    )
    bic = (
        bi.groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cab"))
        .where(F.col("cab") >= 5)
    )
    n2 = bi.agg(F.count(F.lit(1)).alias("n2"))
    ca = unic.select(F.col("tok").alias("w1"), F.col("c").alias("ca"))
    cb = unic.select(F.col("tok").alias("w2"), F.col("c").alias("cb"))
    scored = (
        bic.withColumn("w1", F.split("bg", " ")[0])
        .withColumn("w2", F.split("bg", " ")[1])
        .join(ca, "w1")
        .join(cb, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "bg",
            "cab",
            F.round(
                F.log(
                    (F.col("cab").cast("double") / F.col("n2"))
                    / (
                        (F.col("ca").cast("double") / F.col("n1"))
                        * (F.col("cb").cast("double") / F.col("n1"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    # global top-20 via orderBy+limit -> TakeOrderedAndProject (partial
    # per-partition top-k, no single-partition window sort)
    return scored.orderBy(F.desc("pmi"), F.asc("bg")).limit(20)


# ---------------------------------------------------------------------------
# MinHash accuracy audit: signature-estimated Jaccard vs exact Jaccard
# per LSH candidate pair — the quality-control query run before
# trusting signatures at 100 TB (where exact Jaccard is unaffordable
# corpus-wide but spot-checkable on the candidate set).
# ---------------------------------------------------------------------------

@query(
    "q83_minhash_estimate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         gsets AS (SELECT doc_id, {_SQL_GRAMS3} AS g FROM toks WHERE len({_SQL_GRAMS3}) > 0),
         hashed AS (SELECT doc_id, g, list_transform(g, s -> {_SQL_POLYHASH}) AS hs FROM gsets),
         sigs AS (SELECT doc_id, g, {_SQL_SIG} AS sig FROM hashed),
         bands AS (SELECT doc_id, i, sig[CAST(i + 1 AS INTEGER)] AS sv
                   FROM sigs, (SELECT unnest(generate_series(0, 7)) AS i)),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM bands a JOIN bands b ON a.i = b.i AND a.sv = b.sv AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b,
                          ROUND(list_sum(list_transform(generate_series(1, 8),
                                i -> CAST(sa.sig[CAST(i AS INTEGER)] = sb.sig[CAST(i AS INTEGER)] AS INT))) / 8.0, 4) AS est_jac,
                          len(list_intersect(sa.g, sb.g)) AS ninter,
                          len(sa.g) AS na, len(sb.g) AS nb
                   FROM cand
                   JOIN sigs sa ON sa.doc_id = cand.id_a
                   JOIN sigs sb ON sb.doc_id = cand.id_b)
    SELECT id_a, id_b, est_jac,
           ROUND(ninter / (na + nb - ninter), 4) AS exact_jac
    FROM pairs WHERE ninter / (na + nb - ninter) >= 0.5
    """,
)
def q83_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    # grams + x-engine signature in ONE Arrow pass (r13 opt, see q20)
    sigs = word_ngram_minhash_rows(docs, "doc_id", "text", 3, 8)
    base = sigs.select("doc_id", "g")
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("i"), F.col("sig")[i].alias("sv")) for i in range(8)])
        ).alias("b"),
    ).select("doc_id", F.col("b.i").alias("i"), F.col("b.sv").alias("sv"))
    # r=1 bands make the posting-list co-occurrence count PER PAIR equal
    # to the number of agreeing signature positions, so the estimate
    # falls out of candidate generation itself — no re-join against the
    # signature lineage (which would re-evaluate the polynomial hash of
    # every gram twice more); the verify joins carry only the gram sets.
    cand = pairs_from_posting_lists(bands, ["i", "sv"], "doc_id").groupBy(
        "id_a", "id_b"
    ).agg(F.count(F.lit(1)).alias("_n_shared"))
    sa = base.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    sb = base.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    est = F.round(F.col("_n_shared") / F.lit(8.0), 4)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("exact", jaccard(F.col("ga"), F.col("gb")))
        .where(F.col("exact") >= 0.5)
        .select(
            "id_a",
            "id_b",
            est.alias("est_jac"),
            F.round("exact", 4).alias("exact_jac"),
        )
    )


# ---------------------------------------------------------------------------
# Multimodal audio: REAL RIFF/PCM16 WAV decode (pure-Python codec,
# functions/wav.py) over Arrow-batched mapInPandas — payload generated
# deterministically from text length so integer arithmetic predicts
# every metadata field exactly.
# ---------------------------------------------------------------------------

@query(
    "q84_wav_meta",
    oracle="""
    SELECT doc_id,
           CAST(44 + 2 * n AS BIGINT)  AS byte_len,
           CAST(8000 AS INTEGER)       AS sample_rate,
           CAST(1 AS INTEGER)          AS n_channels,
           CAST(n AS BIGINT)           AS n_samples,
           CAST(n // 8 AS BIGINT)      AS duration_ms
    FROM (SELECT doc_id, length(text) % 97 + 8 AS n
          FROM documents WHERE text IS NOT NULL)
    """,
)
def q84_wav_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_audio_meta(
            with_wav_payload(d, "text", "doc_id"), "payload", "doc_id", decode_backend="wav"
        ),
    )


# ---------------------------------------------------------------------------
# SCD2 (slowly-changing-dimension type 2) build: compress each user's
# event-type history into validity intervals [valid_from, valid_to)
# with an is_current flag — two windows over one user_id shuffle, no
# per-user arrays. Epoch-µs longs sidestep cross-engine timestamp
# rendering.
# ---------------------------------------------------------------------------

@query(
    "q85_scd2_build",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type AS attr,
           epoch_us(ts) AS valid_from_us,
           epoch_us(LEAD(ts) OVER w) AS valid_to_us,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q85_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    # event_id tiebreak: two change rows with identical ts would otherwise
    # make LEAD order engine-dependent and the cross-engine hash flaky.
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        F.col("event_type").alias("attr"),
        epoch_us("ts").alias("valid_from_us"),
        epoch_us(nxt).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-ES / Efraimidis-Spirakis):
# per-language top-3 docs by ln(u)/w where u is a deterministic
# Knuth-hash uniform and w = n_chars — one window per stratum, fully
# reproducible, the standard trick for weighted corpus subsampling.
# ---------------------------------------------------------------------------

@query(
    "q86_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang,
             ln(((doc_id * 2654435761) % 4294967296 + 1) / 4294967296.0)
               / n_chars AS k
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang
    FROM (SELECT keyed.*, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rn
          FROM keyed)
    WHERE rn <= 3
    """,
)
def q86_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = ((F.col("doc_id") * 2654435761) % 4294967296 + 1) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id", "lang", (F.log(u) / F.col("n_chars")).alias("k")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# Null-safe equi join (`<=>` / IS NOT DISTINCT FROM): NULL keys match
# each other — the join shape MERGE/CDC pipelines need for nullable
# business keys. NULLs are derived (testdata has none) to exercise it.
# ---------------------------------------------------------------------------

@query(
    "q87_nullsafe_join",
    oracle="""
    WITH l AS (SELECT o_orderkey, NULLIF(o_orderkey % 5, 0) AS nk FROM orders),
         r AS (SELECT DISTINCT NULLIF(r_regionkey % 5, 0) AS nk,
                      NULLIF(r_regionkey % 5, 0) * 100 AS tag
               FROM region)
    SELECT l.nk, r.tag, COUNT(*) AS cnt
    FROM l JOIN r ON l.nk IS NOT DISTINCT FROM r.nk
    GROUP BY l.nk, r.tag
    """,
)
def q87_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    region = table(spark, sf_dir, "region")
    l = orders.select(
        "o_orderkey", F.nullif(F.col("o_orderkey") % 5, F.lit(0)).alias("nk")
    )
    r = region.select(
        F.nullif(F.col("r_regionkey") % 5, F.lit(0)).alias("nk"),
        (F.nullif(F.col("r_regionkey") % 5, F.lit(0)) * 100).alias("tag"),
    ).distinct()
    return (
        l.join(F.broadcast(r), l["nk"].eqNullSafe(r["nk"]))
        .groupBy(l["nk"], r["tag"])
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(l["nk"].alias("nk"), "tag", "cnt")
    )


# ---------------------------------------------------------------------------
# Distribution-rank window suite: PERCENT_RANK / CUME_DIST / NTILE —
# value-determined ranks (tie-independent), completing q31's
# offset/rank coverage.
# ---------------------------------------------------------------------------

@query(
    "q88_rank_suite",
    oracle="""
    SELECT c_custkey, n_name,
           CASE WHEN n > 1
                THEN (2000000 * (rn - 1) + (n - 1)) // (2 * (n - 1))
                ELSE 0 END AS pct_rank_micros,
           (2000000 * rn + n) // (2 * n) AS cume_micros,
           tile
    FROM (
      SELECT c.c_custkey, n.n_name,
             ROW_NUMBER()  OVER w AS rn,
             COUNT(*)      OVER (PARTITION BY n.n_name) AS n,
             NTILE(4)      OVER w AS tile
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WINDOW w AS (PARTITION BY n.n_name ORDER BY c.c_acctbal, c.c_custkey)
    ) WHERE c_custkey % 20 = 0
    """,
)
def q88_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # percent_rank/cume_dist emit k/n DOUBLES whose 6dp rounding can
    # land on a half-up boundary where the engines' double-rounding
    # disagrees (found by the skew differential, §11.69: 1/750 cume
    # values). The window order is UNIQUE (custkey tiebreak), so both
    # ratios have row_number() numerators — emit them as EXACT
    # integer micro-units via integer half-up division, which every
    # engine computes identically: floor((2e6*k + n) / (2n)).
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy("c_acctbal", "c_custkey")
    wp = Window.partitionBy("n_name")
    rn = F.row_number().over(w).cast("long")
    n = F.count(F.lit(1)).over(wp).cast("long")
    pct = F.when(
        n > 1,
        F.expr(
            "(2000000 * (rn - 1) + (n - 1)) DIV (2 * (n - 1))"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "n_name",
            rn.alias("rn"),
            n.alias("n"),
            F.ntile(4).over(w).alias("tile"),
        )
        .select(
            "c_custkey",
            "n_name",
            pct.alias("pct_rank_micros"),
            F.expr("(2000000 * rn + n) DIV (2 * n)").alias("cume_micros"),
            "tile",
        )
        .where(F.col("c_custkey") % 20 == 0)
    )


# ---------------------------------------------------------------------------
# Regex extraction suite: regexp_extract (single group) +
# regexp_extract_all (joined) + rlike filter — the scrubbing/parsing
# primitives for raw-text ingestion, all codegen'd JVM-side.
# ---------------------------------------------------------------------------

@query(
    "q89_regex_extract",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k_val,
           array_to_string(regexp_extract_all(props, '[0-9]+'), '-') AS all_nums,
           length(regexp_replace(props, '[0-9]+', '#', 'g')) AS masked_len
    FROM events
    WHERE event_id % 20 = 0 AND regexp_matches(props, '"k"')
    """,
)
def q89_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.where((F.col("event_id") % 20 == 0) & F.col("props").rlike('"k"'))
        .select(
            "event_id",
            F.regexp_extract("props", r"([0-9]+)", 1).cast("long").alias("k_val"),
            F.array_join(
                F.regexp_extract_all("props", F.lit(r"[0-9]+"), 0), "-"
            ).alias("all_nums"),
            F.length(F.regexp_replace("props", r"[0-9]+", "#")).alias("masked_len"),
        )
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (ANSI LISTAGG ... WITHIN GROUP): the
# classic reshape for exporting grouped values as delimited text.
# ---------------------------------------------------------------------------

@query(
    "q90_listagg",
    oracle="""
    SELECT n.n_name AS nation,
           string_agg(c.c_name, ',' ORDER BY c.c_name) AS members,
           COUNT(*) AS n_members
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey % 50 = 0
    GROUP BY n.n_name
    """,
)
def q90_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("__q90_customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("__q90_nation")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               listagg(c.c_name, ',') WITHIN GROUP (ORDER BY c.c_name) AS members,
               COUNT(*) AS n_members
        FROM __q90_customer c JOIN __q90_nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_custkey % 50 = 0
        GROUP BY n.n_name
        """
    )


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance: fold the q58-shaped CDC
# change set into a per-customer SUM/COUNT view without rescanning the
# base snapshot. The oracle is the definitional statement: maintained
# view == full recompute over the new snapshot.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.merge import incremental_agg_update  # noqa: E402


@query(
    "q91_incremental_view",
    oracle="""
    SELECT o_custkey,
           ROUND(SUM(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10
                          ELSE o_totalprice END), 2) AS total,
           COUNT(*) AS n
    FROM orders WHERE o_orderkey % 10 >= 2
    GROUP BY o_custkey
    """,
)
def q91_incremental_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 10 < 8).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    new = orders.where(F.col("o_orderkey") % 10 >= 2).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    base = old.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total"), F.count(F.lit(1)).alias("n")
    )
    # signed contributions from the CDC images (old row -> negative,
    # new row -> positive; unchanged keys contribute nothing)
    o = old.alias("o")
    nw = new.alias("nw")
    j = o.join(nw, F.col("o.o_orderkey") == F.col("nw.o_orderkey"), "full_outer")
    changed = j.where(
        F.col("o.o_orderkey").isNull()
        | F.col("nw.o_orderkey").isNull()
        | ~(F.col("o.o_totalprice").eqNullSafe(F.col("nw.o_totalprice")))
        | ~(F.col("o.o_custkey").eqNullSafe(F.col("nw.o_custkey")))
    )
    contrib = F.array(
        F.when(
            F.col("o.o_orderkey").isNotNull(),
            F.struct(
                F.col("o.o_custkey").alias("o_custkey"),
                (-F.col("o.o_totalprice")).alias("total"),
                F.lit(-1).cast("long").alias("n"),
            ),
        ),
        F.when(
            F.col("nw.o_orderkey").isNotNull(),
            F.struct(
                F.col("nw.o_custkey").alias("o_custkey"),
                F.col("nw.o_totalprice").alias("total"),
                F.lit(1).cast("long").alias("n"),
            ),
        ),
    )
    deltas = (
        changed.select(F.explode(contrib).alias("c"))
        .where(F.col("c").isNotNull())
        .select("c.o_custkey", "c.total", "c.n")
    )
    maintained = incremental_agg_update(
        base, deltas, ["o_custkey"], ["total"], "n"
    )
    return maintained.select(
        "o_custkey", F.round("total", 2).alias("total"), "n"
    )


# ---------------------------------------------------------------------------
# Intra-document duplicate-span removal (Gopher "repeated paragraph"
# cut applied at 3-gram granularity): keep only each document's FIRST
# occurrence of every 3-gram, fingerprint the surviving sequence. One
# explode + one (doc, gram) window + one order-restoring re-agg.
# ---------------------------------------------------------------------------

@query(
    "q92_intradoc_dedup",
    oracle=f"""
    -- fully streaming formulation (the sf10 lesson, round two): the
    -- r10 fix replaced windows/lists with MIN/GROUP BY + ordered
    -- string_agg, but per-doc ordered string_agg is itself
    -- unspillable at 500k docs x 100M grams (OOM at 64 GB). The
    -- fingerprint is now rank-weighted per-GRAM — char fp of each
    -- kept gram times a rank weight — which binds the same things
    -- (content and order of the kept sequence) while every operator
    -- on both sides is a spillable group agg, a sort-based window,
    -- or row-local list math over ~20-char strings
    WITH base AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         grams AS (SELECT doc_id,
                          unnest(generate_series(1, len(t) - 2)) AS pos,
                          unnest(list_transform(generate_series(1, len(t) - 2),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
                   FROM base WHERE len(t) >= 3),
         firsts AS (SELECT doc_id, g, MIN(pos) AS pos
                    FROM grams GROUP BY doc_id, g),
         ranked AS (SELECT doc_id, g,
                           ROW_NUMBER() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS k
                    FROM firsts),
         gfp AS (SELECT doc_id, k,
                        list_sum(list_transform(
                            generate_series(1, length(g)),
                            i -> ascii(substr(g, i, 1)) * (1 + (i - 1) % 64)))
                            % 2147483647 AS fp
                 FROM ranked)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_unique_grams,
           CAST(SUM(((k % 997) + 1) * fp) % 2147483647 AS BIGINT) AS kept_fp
    FROM gfp GROUP BY doc_id
    """,
)
def q92_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    # The whole query is PER-DOC: first-occurrence ranks of distinct
    # grams, then an integer checksum over (rank, gram fingerprint).
    # One Arrow pass computes it row-locally (r13 opt, guide §4.2/§2.4)
    # — the previous shape paid interpreted word_shingles +
    # char_fingerprint HOFs, a gram explode, TWO shuffles (groupBy
    # (doc_id, gram) + the rank window) and a final re-aggregation, all
    # to reassemble per-doc state that never needed to leave the row.
    # Exact-integer arithmetic (poly-hash < 2^31, weights < 998, docs
    # < 2^9 grams -> sums < 2^51): bit-identical to the expression
    # form; the oracle hash pins it.
    import re
    from collections.abc import Iterator as _It

    import pandas as pd
    from pyspark.sql import types as T

    from redskins_rule_spark.functions.hashing import poly_hash_py

    ws = re.compile(r"\s+", re.ASCII)
    out_schema = T.StructType(
        [
            docs.schema["doc_id"],
            T.StructField("n_unique_grams", T.LongType()),
            T.StructField("kept_fp", T.LongType()),
        ]
    )

    def run(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        memo: dict[str, int] = {}

        def fp(g: str) -> int:
            v = memo.get(g)
            if v is None:
                if len(memo) > 1_000_000:
                    memo.clear()
                v = memo[g] = poly_hash_py(g)
            return v

        for pdf in batches:
            ids, ns, fps = [], [], []
            for i, text in zip(pdf["doc_id"].values, pdf["text"]):
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                toks = ws.split(str(text).strip(" "))
                if len(toks) < 3:
                    continue
                grams = dict.fromkeys(
                    " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
                )
                acc = 0
                for k, g in enumerate(grams, start=1):
                    acc += ((k % 997) + 1) * fp(g)
                ids.append(i)
                ns.append(len(grams))
                fps.append(acc % 2147483647)
            if not ids:
                continue
            yield pd.DataFrame(
                {"doc_id": ids, "n_unique_grams": ns, "kept_fp": fps}
            )

    return docs.select("doc_id", "text").mapInPandas(run, out_schema)


# ---------------------------------------------------------------------------
# Data-mixture rebalancing: deterministic per-source subsampling to
# target weights (even-numbered sources get 2x the share of odd ones),
# at the largest feasible corpus that oversamples nothing.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sampling import source_mix  # noqa: E402


@query(
    "q93_source_mix",
    oracle="""
    WITH docs AS (SELECT doc_id, source,
                         CASE WHEN CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 2 = 0
                              THEN 2.0 ELSE 1.0 END AS w
                  FROM documents),
         counts AS (SELECT source, w, COUNT(*) AS cnt FROM docs GROUP BY source, w),
         unit AS (SELECT MIN(cnt / w) AS u FROM counts),
         rates AS (SELECT source, w * u / cnt AS rate FROM counts, unit),
         kept AS (SELECT d.doc_id, d.source FROM docs d JOIN rates r USING (source)
                  WHERE ((d.doc_id * 2654435761) % 4294967296) / 4294967296.0 < r.rate)
    SELECT source, COUNT(*) AS n_kept FROM kept GROUP BY source
    """,
)
def q93_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(
            F.regexp_extract("source", r"([0-9]+)", 1).cast("long") % 2 == 0,
            F.lit(2.0),
        )
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    mixed = source_mix(docs, "source", "w", "doc_id")
    return mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


# ---------------------------------------------------------------------------
# EWMA (exponentially-weighted moving average) per user — a sequential
# fold expressed relationally: collect each user's bounded event
# sequence once, fold with a higher-order aggregate (identical
# left-to-right order in both engines; no UDF, no driver loop).
# Per-key state is the user's own history — bounded, never corpus-wide.
# ---------------------------------------------------------------------------

@query(
    "q94_ewma",
    oracle="""
    SELECT user_id,
           ROUND(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(CAST(value AS DOUBLE) ORDER BY ts, event_id)),
                   (acc, x) -> acc * CAST(0.7 AS DOUBLE) + x * CAST(0.3 AS DOUBLE)),
                 6) AS ewma,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def q94_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("s"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    vals = F.transform("s", lambda x: x["value"].cast("double"))
    ewma = F.aggregate(
        vals,
        F.lit(0.0),
        lambda acc, v: acc * F.lit(0.7) + v * F.lit(0.3),
    )
    return seq.select("user_id", F.round(ewma, 6).alias("ewma"), "n_events")


# ---------------------------------------------------------------------------
# Log-sum-exp per group (the numerically-stable reduction behind
# softmax/partition-function aggregation): max-shift then sum —
# two aggregations over the same key, broadcast max join, no window
# over a skewed partition.
# ---------------------------------------------------------------------------

@query(
    "q95_logsumexp",
    oracle="""
    WITH m AS (SELECT event_type, MAX(value) AS mx FROM events GROUP BY event_type)
    SELECT e.event_type,
           ROUND(m.mx + ln(SUM(exp(e.value - m.mx))), 4) AS lse,
           COUNT(*) AS n
    FROM events e JOIN m ON e.event_type = m.event_type
    GROUP BY e.event_type, m.mx
    """,
)
def q95_logsumexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(F.max("value").alias("mx"))
    return (
        ev.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "mx")
        .agg(
            F.round(
                F.col("mx") + F.log(F.sum(F.exp(F.col("value") - F.col("mx")))),
                4,
            ).alias("lse"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("event_type", "lse", "n")
    )


# ---------------------------------------------------------------------------
# Skew-safe distinct aggregation: COUNT(DISTINCT user) per event_type
# (4 hot keys over the whole fact) via two-stage dedup-then-count —
# stage 1 shuffles on the HIGH-cardinality (type, user) pair so no
# task owns a hot key's full traffic; stage 2 counts tiny groups.
# ---------------------------------------------------------------------------

@query(
    "q96_skew_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS u_users,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q96_skew_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    users = (
        ev.select("event_type", "user_id")
        .dropDuplicates(["event_type", "user_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("u_users"))
    )
    vals = ev.groupBy("event_type").agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    return users.join(vals, "event_type").select(
        "event_type", "u_users", "total_value"
    )


# ---------------------------------------------------------------------------
# Product-quantization ANN: train per-subspace codebooks (deterministic
# L2 k-means), encode 64-dim vectors to 4 bytes, ADC top-10 for an
# in-table query vector. Rows-only driver check (k-means training is
# not SQL-expressible); exactness + recall pinned in
# tests/test_similarity_text.py.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.similarity import (  # noqa: E402
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)


@query("q97_pq_ann")
def q97_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # codebooks train on a deterministic 25% hash-sample (the 100 TB
    # recipe: sample-train, full-corpus encode), then every vector is
    # encoded row-locally
    train = emb.where(F.col("vec_id") % 4 == 0)
    books = train_pq_codebooks(train, "vec_id", "embedding", m=4, k=16, iters=3)
    coded = pq_encode(emb, books, "embedding")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    return pq_topk(coded, books, q, "vec_id", k=10)


# ---------------------------------------------------------------------------
# q97b: PQ with FIXED axis-aligned codebooks — the cross-engine
# verification sibling of q97 (VERDICT r7 item 6, the q43b/q25b
# pattern): k-means training is engine-local, so q97 is rows-only by
# design; axis codebooks (centroid i = basis vector e_i) make encode
# (argmin of the ROUND(l2², 9) ordered fold, ties to the SMALLER
# index — F.array_min over struct(d, i)) and the ADC lookup table
# SQL-expressible, so the full encode -> LUT -> top-10 path gets a
# value hash. The query vector's components are multiples of 1/8 and
# the centroids are 0/1, so every LUT entry and every summed ADC
# distance is an exact dyadic rational with <= 6 decimal digits —
# ROUND(·, 6) is the identity on both engines and the distances
# carry ZERO float risk; only the encode folds touch corpus doubles,
# under the same ROUND(·, 9) contract the q194/q22 family already
# hash-matches.
# ---------------------------------------------------------------------------

_PQ_XQ = [((i * 5) % 17 - 8) / 8.0 for i in range(64)]


def _pq_axis_oracle() -> str:
    qlist = ", ".join(repr(x) for x in _PQ_XQ)
    sq = (
        "(%(v)s[g.s * 16 + t] - CASE WHEN t = g.i + 1 THEN 1.0 ELSE 0.0 END)"
        " * "
        "(%(v)s[g.s * 16 + t] - CASE WHEN t = g.i + 1 THEN 1.0 ELSE 0.0 END)"
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         qv AS (SELECT [{qlist}]::DOUBLE[] AS q),
         grid AS (SELECT s.s AS s, i.i AS i
                  FROM (SELECT unnest(generate_series(0, 3)) AS s) s,
                       (SELECT unnest(generate_series(0, 15)) AS i) i),
         sub AS (SELECT e.vec_id, g.s, g.i,
                        ROUND(list_reduce(
                            list_transform(generate_series(1, 16),
                                           t -> {sq % {'v': 'e.v'}}),
                            (acc, x) -> acc + x), 9) AS d
                 FROM e, grid g),
         codes AS (SELECT vec_id, s, i AS code FROM (
                   SELECT vec_id, s, i,
                          ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                             ORDER BY d, i) AS rn
                   FROM sub) WHERE rn = 1),
         lut AS (SELECT g.s, g.i,
                        list_reduce(
                            list_transform(generate_series(1, 16),
                                           t -> {sq % {'v': 'qv.q'}}),
                            (acc, x) -> acc + x) AS dist
                 FROM grid g, qv),
         scored AS (SELECT c.vec_id, ROUND(SUM(l.dist), 6) AS approx_dist
                    FROM codes c JOIN lut l ON l.s = c.s AND l.i = c.code
                    GROUP BY c.vec_id)
    SELECT vec_id, approx_dist FROM scored
    ORDER BY approx_dist, vec_id LIMIT 10
    """


@query("q97b_pq_xengine", oracle=_pq_axis_oracle())
def q97b_pq_xengine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.similarity import axis_pq_codebooks

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    books = axis_pq_codebooks(m=4, k=16, w=16)
    coded = pq_encode(emb, books, "embedding")
    return pq_topk(coded, books, _PQ_XQ, "vec_id", k=10)


# ---------------------------------------------------------------------------
# Multimodal video: REAL animated-GIF (GIF89a) parse. q98 is the cheap
# header walk (no LZW touched); q99 LZW-decodes every 2nd frame and
# checksums its pixels — both predicted exactly by integer arithmetic
# on the oracle side because the payload generator derives geometry
# and pixels from text length.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.multimodal import (  # noqa: E402
    decode_video_meta,
    sample_gif_frames,
    with_gif_payload,
)


@query(
    "q98_gif_meta",
    oracle="""
    SELECT doc_id,
           CAST(blen % 16 + 2 AS INTEGER)       AS width,
           CAST(blen % 11 + 2 AS INTEGER)       AS height,
           CAST(blen % 5 + 1 AS INTEGER)        AS n_frames,
           CAST((blen % 5 + 1) * 4 AS BIGINT)   AS duration_cs
    FROM (SELECT doc_id, length(text) AS blen FROM documents
          WHERE text IS NOT NULL)
    """,
)
def q98_gif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): decode once per distinct length
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_video_meta(
            with_gif_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    ).select("doc_id", "width", "height", "n_frames", "duration_cs")


@query(
    "q99_gif_frames",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS blen,
                      length(text) % 16 + 2 AS w,
                      length(text) % 11 + 2 AS h,
                      length(text) % 5 + 1  AS nf
               FROM documents WHERE text IS NOT NULL),
         fr AS (SELECT doc_id, blen, w, h,
                       unnest(generate_series(0, nf - 1)) AS f
                FROM g)
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST(list_sum(flatten(
                 list_transform(generate_series(0, h - 1), y ->
                   list_transform(generate_series(0, w - 1), x ->
                     (blen + 7 * f + 3 * y + x) % 256)))) AS BIGINT) AS pixel_sum
    FROM fr WHERE f % 2 = 0
    """,
)
def q99_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: sample_gif_frames(
            with_gif_payload(d, "text", "doc_id"), "payload", "doc_id", stride=2
        ),
        how="inner",
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) windows in batch: F.window(width=1h, slide=30m) —
# every event lands in exactly width/slide = 2 windows; the same
# expression runs unchanged on a stream (q26's tumbling counterpart).
# ---------------------------------------------------------------------------

@query(
    "q100_hopping_windows",
    oracle="""
    SELECT CAST(ws AS VARCHAR) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM (
      SELECT event_type, value,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
      FROM events)
    GROUP BY 1, 2
    """,
)
def q100_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Content checksums + encodings: md5 / sha256 / base64 / hex — the
# integrity-fingerprint surface of a data-lake ingestion pipeline
# (all codegen'd JVM builtins; DuckDB computes the same digests).
# ---------------------------------------------------------------------------

@query(
    "q101_checksums",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           substr(sha256(text), 1, 16) AS sha_prefix,
           to_base64(CAST(substr(text, 1, 12) AS BLOB)) AS head_b64,
           lower(hex(CAST(substr(text, 1, 6) AS BLOB))) AS head_hex
    FROM documents WHERE doc_id % 25 = 0
    """,
)
def q101_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.where(F.col("doc_id") % 25 == 0).select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.substring(F.sha2("text", 256), 1, 16).alias("sha_prefix"),
        F.base64(F.encode(F.substring("text", 1, 12), "UTF-8")).alias("head_b64"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 6), "UTF-8"))).alias("head_hex"),
    )


# ---------------------------------------------------------------------------
# Bitwise / boolean aggregates: per-user capability mask (BIT_OR over
# event-type flag bits) + BOOL_AND/BOOL_OR predicates — the compact
# flag-rollup idiom for billions of rows.
# ---------------------------------------------------------------------------

@query(
    "q102_bitwise_flags",
    oracle="""
    SELECT user_id,
           bit_or(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8 ELSE 16 END) AS mask,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(event_type = 'purchase') AS ever_bought
    FROM events GROUP BY user_id
    """,
)
def q102_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    flag = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .otherwise(16)
    )
    return ev.groupBy("user_id").agg(
        F.bit_or(flag).alias("mask"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("event_type") == "purchase").alias("ever_bought"),
    )


# ---------------------------------------------------------------------------
# Relational division ("FOR ALL"): customers with at least one order in
# EVERY order-priority class — the classic division pattern, expressed
# as distinct-pair counting against a broadcast universe count (never a
# nested NOT EXISTS double negation, which Catalyst can't decorrelate
# as cheaply).
# ---------------------------------------------------------------------------

@query(
    "q103_relational_division",
    oracle="""
    WITH u AS (SELECT COUNT(DISTINCT o_orderpriority) AS total FROM orders),
         per AS (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS np
                 FROM orders GROUP BY o_custkey)
    SELECT p.o_custkey, CAST(p.np AS BIGINT) AS n_priorities
    FROM per p, u WHERE p.np = u.total
    """,
)
def q103_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    u = orders.agg(F.count_distinct("o_orderpriority").alias("total"))
    per = orders.groupBy("o_custkey").agg(
        F.count_distinct("o_orderpriority").alias("np")
    )
    return (
        per.crossJoin(F.broadcast(u))
        .where(F.col("np") == F.col("total"))
        .select("o_custkey", F.col("np").cast("long").alias("n_priorities"))
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training + segmentation (Sennrich-style corpus BPE):
# merge statistics run on the WORD-FREQUENCY table (vocabulary-sized,
# not corpus-sized — the one corpus pass is the word count), each
# round is one top-1 pair argmax to the driver, and merges apply as
# row-local folds. Rows-only driver check (iterative training is not
# SQL-expressible); exact parity with a pure-Python reference is
# pinned in tests/test_bpe.py.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.bpe import bpe_segment, bpe_train  # noqa: E402


@query("q104_bpe_segment")
def q104_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=6)
    seg = bpe_segment(docs, merges, "text", "doc_id")
    return seg.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_bpe_tokens"),
        char_fingerprint(F.concat_ws(" ", F.col("tokens"))).alias("tokens_fp"),
    )


# ---------------------------------------------------------------------------
# BPE segmentation with a FIXED merge table — the cross-engine sibling
# that retires q104's rows-only status (the q25b/q43b/q97b/q37b
# pattern). The engine applies the exact production fold
# (`operators/bpe.py::bpe_segment` — greedy left-to-right
# non-overlapping merge per round); the oracle replays each round as
# a chained string `replace()` over a delimiter-encoded symbol
# string: every symbol is wrapped as SEP||sym||SEP (SEP = chr(31),
# absent from the corpus), so the pattern SEP||l||SEP||SEP||r||SEP
# matches exactly a symbol EQUAL to l followed by a symbol EQUAL to
# r (never a suffix/prefix), and SQL replace()'s
# scan-left-resume-after-replacement semantics are precisely the
# fold's greedy non-overlapping pass (the just-merged symbol l||r
# can never re-merge in the same round: that would need l||r == l).
# Equivalence is property-tested against the pure-Python fold in
# tests/test_bpe.py. The merge table chains deliberately
# (t+h -> th+e</w>) and includes (a,</w>) vs the 2-char symbol 'ta'
# to prove symbol-identity (not substring) matching.
# ---------------------------------------------------------------------------

_Q104B_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("e", "</w>"), ("th", "e</w>"), ("a", "l"),
    ("t", "a"), ("ta", "b"), ("a", "</w>"), ("g", "g"),
]


def _q104b_sql_tokens() -> str:
    """DuckDB expression: word `w` -> delimiter-encoded symbol string
    after replaying _Q104B_MERGES in order."""
    e = (
        "chr(31) || array_to_string(string_split(w, ''), chr(31)||chr(31)) "
        "|| chr(31) || chr(31) || '</w>' || chr(31)"
    )
    for l, r in _Q104B_MERGES:
        pat = f"chr(31)||'{l}'||chr(31)||chr(31)||'{r}'||chr(31)"
        rep = f"chr(31)||'{l}{r}'||chr(31)"
        e = f"replace({e}, {pat}, {rep})"
    return e


@query(
    "q104b_bpe_xengine",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, pos, w
        FROM (SELECT doc_id,
                     unnest(string_split_regex(trim(text), '\\s+')) AS w,
                     generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
              FROM documents)
        WHERE length(w) > 0),
    enc AS (SELECT doc_id, pos, {_q104b_sql_tokens()} AS e FROM words),
    tok AS (SELECT doc_id, pos,
                   trim(replace(e, chr(31)||chr(31), ' '), chr(31)) AS tok_str,
                   len(string_split(e, chr(31)||chr(31))) AS n_toks
            FROM enc),
    -- the fingerprint is the char polyhash of the doc's joined token
    -- string, but computed WITHOUT materializing that string: each
    -- word knows its char offset (a sort-spillable window cumsum)
    -- and contributes its own chars + its preceding space with the
    -- same positional weights — value-identical at every SF, and no
    -- per-doc ordered string_agg exists (the q92/q104b sf10 OOM
    -- class: per-group ordered aggregates are unspillable in the
    -- oracle engine)
    off AS (SELECT doc_id, pos, tok_str, n_toks,
                   COALESCE(SUM(length(tok_str) + 1) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS o
            FROM tok),
    wfp AS (SELECT doc_id, n_toks,
                   (CASE WHEN o > 0 THEN 32 * (1 + (o - 1) % 64) ELSE 0 END)
                   + list_sum(list_transform(
                         generate_series(1, length(tok_str)),
                         j -> ascii(substr(tok_str, j, 1))
                              * (1 + (o + j - 1) % 64))) AS c
            FROM off)
    SELECT doc_id,
           CAST(SUM(n_toks) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(c) % 2147483647 AS BIGINT) AS tokens_fp
    FROM wfp GROUP BY doc_id
    """,
)
def q104b_bpe_xengine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    seg = bpe_segment(docs, _Q104B_MERGES, "text", "doc_id")
    return seg.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_bpe_tokens"),
        char_fingerprint(F.concat_ws(" ", F.col("tokens"))).alias("tokens_fp"),
    )


# ---------------------------------------------------------------------------
# Array set algebra: intersect / except / union sizes + containment
# against a constant vocabulary (stopword-profile overlap — the
# row-local set operations behind lang-ID and stopword filters),
# all codegen'd array builtins.
# ---------------------------------------------------------------------------

_Q105_STOPS = ["the", "and", "a", "key", "table", "value", "row", "fast"]

@query(
    "q105_array_setops",
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      list_distinct({_SQL_TOKENS}) AS toks,
                      {str(_Q105_STOPS).replace("'", chr(39))} AS stops
               FROM documents WHERE doc_id % 20 = 0)
    SELECT doc_id,
           len(list_intersect(toks, stops))                          AS n_common,
           len(list_filter(toks, x -> NOT list_contains(stops, x)))  AS n_only_doc,
           len(list_distinct(list_concat(toks, stops)))              AS n_union,
           list_contains(toks, 'table')                              AS has_table
    FROM t
    """,
)
def q105_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    stops = F.array(*[F.lit(s) for s in _Q105_STOPS])
    toks = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.where(F.col("doc_id") % 20 == 0).select(
        "doc_id",
        F.size(F.array_intersect(toks, stops)).alias("n_common"),
        F.size(F.array_except(toks, stops)).alias("n_only_doc"),
        F.size(F.array_union(toks, stops)).alias("n_union"),
        F.array_contains(toks, "table").alias("has_table"),
    )


# ---------------------------------------------------------------------------
# IGNORE NULLS window navigation: last non-null purchase amount as-of
# each event per user (the ANSI LAST_VALUE ... IGNORE NULLS face of
# q07's forward-fill operator).
# ---------------------------------------------------------------------------

@query(
    "q106_ignore_nulls",
    oracle="""
    SELECT event_id,
           user_id,
           LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
    FROM events
    """,
)
def q106_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(pv, ignorenulls=True).over(w).alias("last_purchase"),
    )


# ---------------------------------------------------------------------------
# q107: the reference's golden pipeline, driver-hash-checked.
# The Spark side runs the REAL end-to-end pipeline (scraped-shape raw
# fixtures -> clean -> home-game argmax -> election metrics -> 30-day
# as-of attach -> toggle prediction, pipelines/redskins_rule.py) and
# the oracle is the reference's committed golden output as a literal
# VALUES table — so reference parity itself goes through the driver's
# cross-engine value hash, not only pytest.
# ---------------------------------------------------------------------------

def _golden_oracle_sql() -> str:
    from redskins_rule_spark.pipelines.golden_fixture import (
        GOLDEN_COLUMNS,
        GOLDEN_ROWS,
    )

    def lit(v) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(int(v))
        s = str(v).replace("'", "''")
        return f"'{s}'"

    rows = ",\n      ".join(
        "(" + ", ".join(lit(v) for v in row) + ")" for row in GOLDEN_ROWS
    )
    cols = ", ".join(f'"{c}"' for c in GOLDEN_COLUMNS)
    return f"SELECT * FROM (VALUES\n      {rows}\n    ) AS golden({cols})"


@query("q107_redskins_golden", oracle=_golden_oracle_sql())
def q107_redskins_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from redskins_rule_spark.pipelines import redskins_rule as rr
    from redskins_rule_spark.pipelines.golden_fixture import (
        ELEC_ROWS,
        NFL_ROWS,
    )

    nfl_schema = T.StructType(
        [
            T.StructField("", T.StringType()),
            T.StructField("year", T.IntegerType()),
            T.StructField("date", T.StringType()),
            T.StructField("team", T.StringType()),
            T.StructField("final", T.StringType()),
        ]
    )
    elec_schema = (
        "row_num long, year string, candidate string, political_party string, "
        "electoral_votes long, popular_votes string, popular_percentage string"
    )
    nfl_raw = spark.createDataFrame(NFL_ROWS, nfl_schema)
    elec_raw = spark.createDataFrame(ELEC_ROWS, elec_schema)
    out = rr.run(spark, nfl_raw, elec_raw)
    # dates as strings and counts as bigint for cross-engine hashing
    date_cols = {"elec_date", "game_date", "p_elec_date"}
    return out.select(
        *[
            _date_str(c).alias(c)
            if c in date_cols
            else F.col(c).cast("long").alias(c)
            if dict(out.dtypes)[c] == "int"
            else F.col(c)
            for c in out.columns
        ]
    )


# ===========================================================================
# Round-4 queries (q108+): training-pipeline operators widening §2 coverage
# ===========================================================================

# ---------------------------------------------------------------------------
# q108: gap-based sessionization — the canonical event-stream op (a 30-min
# inactivity gap starts a new session). Two windows per user partition:
# lag to flag session starts, running sum to number them; then one agg.
# Scale: everything is keyed by user_id — one shuffle, no global window.
# ---------------------------------------------------------------------------

@query(
    "q108_sessionize",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM o
    )
    SELECT user_id, session_no,
           COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us,
           ROUND(SUM(value), 2) AS session_value
    FROM s GROUP BY user_id, session_no
    """,
)
def q108_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = epoch_us("ts")
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap > 1_800_000_000, 1).when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = ev.withColumn("session_no", F.sum(new_s).over(wc))
    return s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("dur_us"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


# ---------------------------------------------------------------------------
# q109: n-gram Jaccard with an ACTIVE document-frequency cut (max_df=4 at
# sf0.01 where the hottest gram has df=7) — the df-cut path itself goes
# through the driver's cross-engine hash, not just pytest. Semantics:
# exact Jaccard over the df-filtered gram universe (stop-gram removal).
# ---------------------------------------------------------------------------

@query(
    "q109_jaccard_capped",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         gsets AS (SELECT doc_id, {_SQL_GRAMS3} AS g FROM toks WHERE len({_SQL_GRAMS3}) > 0),
         inv0 AS (SELECT doc_id, unnest(g) AS gram FROM gsets),
         keep AS (SELECT gram FROM inv0 GROUP BY gram HAVING COUNT(*) <= 4),
         inv AS (SELECT inv0.* FROM inv0 JOIN keep USING (gram)),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM inv GROUP BY 1),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
                  FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b, ninter, sa.n AS na, sb.n AS nb
                   FROM cand
                   JOIN sizes sa ON sa.doc_id = cand.id_a
                   JOIN sizes sb ON sb.doc_id = cand.id_b)
    SELECT id_a, id_b, ROUND(ninter / (na + nb - ninter), 4) AS jaccard_sim
    FROM pairs WHERE ninter / (na + nb - ninter) >= 0.5
    """,
)
def q109_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    return ngram_jaccard_pairs_exact(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=4
    )


# ---------------------------------------------------------------------------
# q110: CDC merge — apply a change log to derive the current snapshot.
# events is read as a CDC stream keyed by user_id ('error' = delete,
# anything else = upsert of `value`); the winner per key is the latest
# change by (ts, event_id). One MAX_BY-shaped agg, no iterative apply —
# the |changes|-scaled MERGE shape (same family as operators/merge.py's
# incremental MV maintenance, which handles the delta-vs-snapshot side).
# ---------------------------------------------------------------------------

@query(
    "q110_cdc_merge",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, value, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_changes
      FROM events
    )
    SELECT user_id,
           ROUND(value, 2) AS current_value,
           epoch_us(ts) AS updated_at_us,
           n_changes
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q110_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wa = Window.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wa))
        .where((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.round("value", 2).alias("current_value"),
            epoch_us("ts").alias("updated_at_us"),
            "n_changes",
        )
    )


# ---------------------------------------------------------------------------
# q112: URL parsing — web-corpus pipelines key everything on registered
# domain / path / query params. The corpus has no URL column, so one is
# synthesized deterministically from (source, doc_id, lang) — same
# generator-vs-arithmetic-oracle pattern as the multimodal payloads —
# and parsed back with Spark's JVM-side parse_url (HOST/PATH/QUERY),
# which the oracle mirrors with regexes. Whole-stage-codegen friendly:
# no Python anywhere.
# ---------------------------------------------------------------------------

@query(
    "q112_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=2' AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]+)', 1) AS lang_param,
           regexp_extract(regexp_extract(url, '^https://([^/]+)/', 1),
                          '([^.]+)\\.example\\.com', 1) AS subdomain
    FROM u
    """,
)
def q112_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&v=2"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.regexp_extract(
            F.parse_url("url", F.lit("HOST")), r"([^.]+)\.example\.com", 1
        ).alias("subdomain"),
    )


# ---------------------------------------------------------------------------
# q113: percentile suite — exact interpolated quantiles per group (both
# engines use linear interpolation: Spark `percentile`, DuckDB
# `quantile_cont`), the workhorse of feature/quality-score calibration.
# Scale note: exact percentile shuffles per group; at 100 TB swap in
# approx_percentile (t-digest) — same call shape, bounded memory.
# ---------------------------------------------------------------------------

@query(
    "q113_percentile_suite",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99,
           ROUND(quantile_cont(value, 0.25), 4) AS p25
    FROM events GROUP BY event_type
    """,
)
def q113_percentile_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
    )


# ---------------------------------------------------------------------------
# q114: token co-occurrence top-k — unordered adjacent-token pairs per
# language, top-3 by count (ties pinned lexicographically). The embedding
# /association-mining primitive (skip-gram window 1). Pair canonical form
# (least, greatest) halves the key space; one shuffle to count, one
# window for top-k.
# ---------------------------------------------------------------------------

@query(
    "q114_cooccurrence_topk",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, {_SQL_TOKENS} AS t FROM documents),
         prs AS (SELECT lang,
                        least(t[i], t[i+1]) AS w1,
                        greatest(t[i], t[i+1]) AS w2
                 FROM toks, unnest(generate_series(1, len(toks.t) - 1)) AS g(i)
                 WHERE t[i] <> t[i+1]),
         cnt AS (SELECT lang, w1, w2, COUNT(*) AS c FROM prs GROUP BY 1, 2, 3),
         rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY c DESC, w1, w2) AS rn FROM cnt)
    SELECT lang, w1, w2, c, rn FROM rk WHERE rn <= 3
    """,
)
def q114_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = F.split(F.trim(F.col("text")), r"\s+")
    # adjacent unordered pairs, expression-side: zip the token array with
    # itself shifted by one, drop self-pairs
    prs = F.filter(
        F.zip_with(
            t,
            F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            lambda a, b: F.struct(
                F.least(a, b).alias("w1"), F.greatest(a, b).alias("w2")
            ),
        ),
        lambda p: p["w1"] != p["w2"],
    )
    pairs = docs.select("lang", F.explode(prs).alias("p")).select(
        "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    cnt = pairs.groupBy("lang", "w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
    return cnt.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)


# ---------------------------------------------------------------------------
# q115: cross-document passage dedup — exact dedup at sub-document
# granularity (non-overlapping 8-token windows), the way training
# pipelines strip boilerplate shared across pages. Passages are carved
# expression-side (transform over stride offsets), then one hash-keyed
# agg finds passages recurring across docs; canonical = min doc_id.
# Scale: passage key is a string; at 100 TB group on xxhash64(passage)
# instead — same plan shape, 8-byte shuffle keys.
# ---------------------------------------------------------------------------

@query(
    "q115_passage_dedup",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         win AS (SELECT doc_id,
                        array_to_string(list_slice(t, (i - 1) * 8 + 1, i * 8), ' ') AS passage
                 FROM toks, unnest(generate_series(1, CAST(ceil(len(toks.t) / 8.0) AS BIGINT))) AS g(i)
                 WHERE len(t) >= (i - 1) * 8 + 1),
         agg AS (SELECT passage,
                        COUNT(*) AS n_occurrences,
                        COUNT(DISTINCT doc_id) AS n_docs,
                        MIN(doc_id) AS canonical_doc
                 FROM win GROUP BY passage)
    SELECT passage, n_occurrences, n_docs, canonical_doc
    FROM agg WHERE n_docs >= 2
    """,
)
def q115_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # BIND the token array in a projection before the per-window
    # lambda references it: closing the lambda over the raw split()
    # expression re-evaluates the split per window — O(L²) per doc,
    # the round-7 skew probe's 5.7x finding (char_ngrams docstring)
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("_tk")
    )
    n_wins = F.ceil(F.size("_tk") / F.lit(8.0)).cast("int")
    passages = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda i: F.concat_ws(" ", F.slice(F.col("_tk"), (i - 1) * 8 + 1, 8)),
    )
    win = toks.select("doc_id", F.explode(passages).alias("passage"))
    return (
        win.groupBy("passage")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# q116: range join via bin expansion — the classic rewrite of
# `value BETWEEN lo AND hi` (which Spark would execute as a broadcast
# nested loop) into an EQUI join: replicate each dim range over the
# fixed-width unit bins it covers, bin the fact side with the same
# width (tail-capped), equi-join on bin, re-apply the residual
# predicate. The oracle states the plain BETWEEN semantics; the engine
# runs the scalable plan. Dim is literal/tiny -> broadcast.
# ---------------------------------------------------------------------------

_Q116_BINS = [  # (label, lo, hi) — hi exclusive; last range open-ended
    ("micro", 0.0, 1.0),
    ("small", 1.0, 5.0),
    ("medium", 5.0, 20.0),
    ("large", 20.0, 100.0),
    ("huge", 100.0, 1e9),
]

@query(
    "q116_range_bin_join",
    oracle="""
    WITH dim AS (SELECT * FROM (VALUES
           ('micro', 0.0, 1.0), ('small', 1.0, 5.0), ('medium', 5.0, 20.0),
           ('large', 20.0, 100.0), ('huge', 100.0, 1e9)) AS d(label, lo, hi))
    SELECT label,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value,
           ROUND(AVG(value), 4) AS avg_value
    FROM events JOIN dim ON value >= lo AND value < hi
    GROUP BY label
    """,
)
def q116_range_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # unit bin = floor(value/10) capped at 10: every dim range maps to a
    # FINITE bin set (the open tail lives entirely in bin 10)
    cap = 10
    # 5-row dim as a parsed VALUES relation (LocalRelation, no job;
    # coalesce(1) on a pickled createDataFrame pays a Python-worker
    # round-trip per merged parent partition — see train_pq_codebooks)
    dim = spark.sql(
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"('{lbl}', {float(lo)}D, {float(hi)}D)"
            for lbl, lo, hi in _Q116_BINS
        )
        + ") AS t(label, lo, hi)"
    )
    bins = F.sequence(
        F.least(F.floor(F.col("lo") / 10).cast("int"), F.lit(cap)),
        F.least(F.ceil(F.col("hi") / 10).cast("int") - 1, F.lit(cap)),
    )
    dim_x = dim.select("label", "lo", "hi", F.explode(bins).alias("bin"))
    fact = ev.withColumn(
        "bin", F.least(F.floor(F.col("value") / 10).cast("int"), F.lit(cap))
    )
    joined = fact.join(F.broadcast(dim_x), "bin").where(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# q117: deterministic train/val/test split — reproducible hash-based
# assignment (Knuth multiplicative on doc_id), the non-negotiable first
# step of every training pipeline: stable across runs, engines, and
# cluster sizes, no RNG state. Split sizes audited per language.
# ---------------------------------------------------------------------------

@query(
    "q117_hash_split",
    oracle="""
    WITH s AS (
      SELECT lang,
             CASE WHEN (doc_id * 2654435761) % 100 < 95 THEN 'train'
                  WHEN (doc_id * 2654435761) % 100 < 99 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs
    FROM s GROUP BY lang, split
    """,
)
def q117_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * 2654435761) % 100
    split = (
        F.when(h < 95, "train").when(h < 99, "val").otherwise("test")
    )
    return docs.select("lang", split.alias("split")).groupBy(
        "lang", "split"
    ).agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# q118: character-entropy quality signal — Shannon entropy of the char
# distribution per document (low entropy = repetitive/degenerate text,
# a standard pretraining quality filter alongside the Gopher rules in
# operators/text.py). Explode chars -> per-(doc,char) counts -> one agg:
# H = log2(n) - sum(c*log2(c))/n, computed in that single-log form so
# both engines sum the SAME per-char terms (4dp-stable).
# ---------------------------------------------------------------------------

@query(
    "q118_entropy_quality",
    oracle="""
    WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                FROM documents WHERE length(text) > 0),
         cc AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
         ent AS (SELECT doc_id,
                        CAST(SUM(k) AS BIGINT) AS n_chars_calc,
                        ROUND(log2(SUM(k)) - SUM(k * log2(k)) / SUM(k), 4)
                          AS char_entropy
                 FROM cc GROUP BY doc_id)
    SELECT doc_id, n_chars_calc, char_entropy,
           (char_entropy < 3.0) AS low_quality
    FROM ent
    """,
)
def q118_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(F.length("text") > 0)
    ch = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("c")
    )
    cc = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    n = F.sum("k")
    ent = cc.groupBy("doc_id").agg(
        n.cast("long").alias("n_chars_calc"),
        F.round(
            F.log2(n) - F.sum(F.col("k") * F.log2("k")) / n, 4
        ).alias("char_entropy"),
    )
    return ent.select(
        "doc_id", "n_chars_calc", "char_entropy",
        (F.col("char_entropy") < 3.0).alias("low_quality"),
    )


# ---------------------------------------------------------------------------
# q120: cross-lingual source-mix audit — for each (lang, source) cell:
# its share of the language and the language's global share, the matrix
# a corpus curator balances before sampling (companion to q93's
# source-mix planner, which PLANS per-source quotas; this AUDITS the
# realized lang x source composition).
# ---------------------------------------------------------------------------

@query(
    "q120_crosslingual_mix",
    oracle="""
    WITH cell AS (SELECT lang, source, COUNT(*) AS n
                  FROM documents GROUP BY 1, 2),
         tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS lang_n FROM cell GROUP BY 1),
         g AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_n FROM documents)
    SELECT cell.lang, cell.source, cell.n,
           ROUND(cell.n / tot.lang_n, 4) AS share_in_lang,
           ROUND(tot.lang_n / g.total_n, 4) AS lang_share
    FROM cell JOIN tot USING (lang) CROSS JOIN g
    """,
)
def q120_crosslingual_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    cell = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    tot = cell.groupBy("lang").agg(F.sum("n").cast("long").alias("lang_n"))
    total = docs.count()  # driver scalar: one metadata-sized action
    return (
        cell.join(tot, "lang")
        .select(
            "lang", "source", "n",
            F.round(F.col("n") / F.col("lang_n"), 4).alias("share_in_lang"),
            F.round(F.col("lang_n") / F.lit(float(total)), 4).alias("lang_share"),
        )
    )


# ---------------------------------------------------------------------------
# q121: record linkage — blocked fuzzy matching over catalog names:
# block on the first token (cheap equi key), score candidates with
# Levenshtein <= 2 within the block. The entity-resolution shape:
# blocking keeps it from being all-pairs, scoring runs only inside
# blocks. Works on DISTINCT names (name-grain, not row-grain), so the
# pair stage is vocabulary-sized; row counts ride along as payloads.
# ---------------------------------------------------------------------------

@query(
    "q121_record_linkage",
    oracle="""
    WITH names AS (SELECT p_name, COUNT(*) AS n_parts
                   FROM part GROUP BY p_name),
         blocked AS (SELECT p_name, n_parts,
                            string_split(p_name, ' ')[1] AS blk
                     FROM names)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist,
           a.n_parts + b.n_parts AS parts_affected
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def q121_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = table(spark, sf_dir, "part")
    names = parts.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    blocked = names.select(
        "p_name", "n_parts", F.split("p_name", " ")[0].alias("blk")
    )
    cand = pairs_from_posting_lists(
        blocked, ["blk"], "p_name", payload_col="n_parts"
    )
    return (
        cand.withColumn("edit_dist", F.levenshtein("id_a", "id_b"))
        .where(F.col("edit_dist") <= 4)
        .select(
            F.col("id_a").alias("name_a"),
            F.col("id_b").alias("name_b"),
            "edit_dist",
            (F.col("payload_a") + F.col("payload_b")).alias("parts_affected"),
        )
    )


# ---------------------------------------------------------------------------
# q122: asymmetric containment dedup — max(|A∩B|/|A|, |A∩B|/|B|) over
# word-3-gram sets. Catches snippet INCLUSION (one doc embedded in a
# longer one), which symmetric Jaccard misses: a 100-gram doc fully
# contained in a 1000-gram doc has Jaccard 0.1 but containment 1.0.
# Same inverted-index + count-verify machinery as q19.
# ---------------------------------------------------------------------------

@query(
    "q122_containment",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         gsets AS (SELECT doc_id, {_SQL_GRAMS3} AS g FROM toks WHERE len({_SQL_GRAMS3}) > 0),
         inv0 AS (SELECT doc_id, unnest(g) AS gram FROM gsets),
         -- df-cut mirror (max_df=64): drop stop-grams from the universe
         keep AS (SELECT gram FROM inv0 GROUP BY gram HAVING COUNT(*) <= 64),
         inv AS (SELECT inv0.* FROM inv0 JOIN keep USING (gram)),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM inv GROUP BY 1),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
                  FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         pairs AS (SELECT id_a, id_b, ninter, sa.n AS na, sb.n AS nb
                   FROM cand
                   JOIN sizes sa ON sa.doc_id = cand.id_a
                   JOIN sizes sb ON sb.doc_id = cand.id_b)
    SELECT id_a, id_b,
           ROUND(greatest(ninter / na, ninter / nb), 4) AS containment
    FROM pairs
    WHERE greatest(ninter / na, ninter / nb) >= 0.8
    """,
)
def q122_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.dedup import ngram_containment_pairs

    docs = table(spark, sf_dir, "documents", spread=True)
    return ngram_containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, max_df=64
    )


# ---------------------------------------------------------------------------
# q123: REAL compressed-image decode — PNG with stdlib-zlib DEFLATE
# (functions/png.py: CRC-verified chunk walk, inflate, filter
# reversal). The payload generator derives geometry/pixels from
# character length so integer arithmetic predicts the DECODED values;
# the compressed byte size itself is not predictable (DEFLATE), which
# is exactly why the oracle checks decoded width/height/pixel_sum.
# Closes part of the compressed-codec boundary (README): PNG is real,
# not a stub.
# ---------------------------------------------------------------------------

@query(
    "q123_png_decode",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 13 + 1 AS w,
                      length(text) % 7 + 1 AS h
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(list_sum(flatten(
                 list_transform(generate_series(0, h - 1), y ->
                   list_transform(generate_series(0, w * 3 - 1), i ->
                     (clen + 5 * y + 3 * (i // 3) + i % 3) % 256)))) AS BIGINT)
             AS pixel_sum
    FROM g
    """,
)
def q123_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_png_stats,
        with_png_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_png_stats(
            with_png_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ===========================================================================
# Round-4 continuation: LM-based quality scoring, gaps-and-islands,
# TWAP, robust outliers, OOV audit, keep-best dedup, histogram,
# sequence patterns, correlation, and the end-to-end curation funnel.
# ===========================================================================

from redskins_rule_spark.operators.analytic import (  # noqa: E402
    equi_width_histogram,
    islands,
    time_weighted_avg,
)
from redskins_rule_spark.operators.dedup import keep_best_per_cluster  # noqa: E402
from redskins_rule_spark.operators.text import bigram_lm_nll  # noqa: E402


# ---------------------------------------------------------------------------
# q124: corpus-trained bigram-LM surprisal — the cheap perplexity
# filter every pretraining pipeline runs (KenLM-style score, no
# external model). Counts tables are vocabulary-grain; the per-term
# single-log form keeps both engines summing identical values.
# ---------------------------------------------------------------------------

@query(
    "q124_bigram_lm",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z]+'),
                         t -> t <> '') AS w
      FROM documents
    ),
    vocab AS (
      SELECT COUNT(DISTINCT t) AS v
      FROM (SELECT unnest(w) AS t FROM toks)
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(2, len(w)),
                                   i -> w[i-1] || ' ' || w[i])) AS bg
      FROM toks WHERE len(w) >= 2
    ),
    db AS (SELECT doc_id, bg, COUNT(*) AS k FROM bg GROUP BY 1, 2),
    c2 AS (SELECT bg, SUM(k) AS n2 FROM db GROUP BY 1),
    c1 AS (SELECT string_split(bg, ' ')[1] AS w1, SUM(n2) AS n1
           FROM c2 GROUP BY 1)
    SELECT db.doc_id,
           CAST(SUM(db.k) AS BIGINT) AS n_bigrams,
           ROUND(-SUM(db.k * (ln(c2.n2 + 1) - ln(c1.n1 + vocab.v)))
                 / SUM(db.k), 4) AS nll
    FROM db
    JOIN c2 USING (bg)
    JOIN c1 ON c1.w1 = string_split(db.bg, ' ')[1]
    CROSS JOIN vocab
    GROUP BY db.doc_id
    """,
)
def q124_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    return bigram_lm_nll(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# q125: gaps-and-islands — maximal runs of consecutive active days per
# user (retention/streak analysis). Anchor trick: date − row_number()
# is constant within a run; one per-key window + one hash agg, no
# self-join. Dates emitted as strings for a representation-stable hash.
# ---------------------------------------------------------------------------

@query(
    "q125_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    anchored AS (
      SELECT user_id, d,
             d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                 * INTERVAL 1 DAY AS anchor
      FROM days
    )
    SELECT user_id,
           CAST(MIN(d) AS VARCHAR) AS island_start,
           CAST(MAX(d) AS VARCHAR) AS island_end,
           COUNT(*) AS island_days
    FROM anchored
    GROUP BY user_id, anchor
    """,
)
def q125_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    isl = islands(ev, ["user_id"], "ts")
    return isl.select(
        "user_id",
        F.col("island_start").cast("string").alias("island_start"),
        F.col("island_end").cast("string").alias("island_end"),
        "island_days",
    )


# ---------------------------------------------------------------------------
# q126: time-weighted average — each event's value holds until the
# next event (TWAP over an irregular series). Integer-microsecond
# weights; (ts, event_id) pins zero-width spans on timestamp ties.
# ---------------------------------------------------------------------------

@query(
    "q126_twap",
    oracle="""
    WITH s AS (
      SELECT user_id, value, epoch_us(ts) AS us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS nxt
      FROM events
    )
    SELECT user_id,
           ROUND(SUM(value * (nxt - us)) / SUM(nxt - us), 4) AS twa,
           COUNT(*) AS n_spans
    FROM s
    WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
)
def q126_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    twa = time_weighted_avg(
        ev, ["user_id"], "ts", "value", tiebreak=("event_id",)
    )
    return twa.select("user_id", F.round("twa", 4).alias("twa"), "n_spans")


# ---------------------------------------------------------------------------
# q127: robust outlier detection — median / MAD / 3σ-equivalent cutoff
# (1.4826·MAD) per event_type. Exact interpolated medians both sides
# (Spark `median`, DuckDB `median`); the grouped median is the only
# sort, everything downstream is broadcast-joined hash aggs.
# ---------------------------------------------------------------------------

@query(
    "q127_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type, median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY 1
    )
    SELECT e.event_type,
           ROUND(MIN(m.med), 4) AS med,
           ROUND(MIN(d.mad), 4) AS mad,
           CAST(SUM(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           COUNT(*) AS n
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    GROUP BY e.event_type
    """,
)
def q127_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    j = ev.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type").agg(
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad")
    )
    stats = med.join(mad, "event_type")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 4).alias("med"),
            F.round(F.min("mad"), 4).alias("mad"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# q128: OOV-rate audit — tokenizer-coverage check against the corpus
# top-1000 vocabulary (rank pinned by (count DESC, token ASC)). The
# top-k select is TakeOrderedAndProject (distributed heap, no global
# window); the vocab joins back broadcast.
# ---------------------------------------------------------------------------

@query(
    "q128_oov_rate",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, source, unnest(
               list_filter(string_split_regex(lower(text), '[^a-z]+'),
                           t -> t <> '')) AS t
      FROM documents
    ),
    vocab AS (
      SELECT t FROM (
        SELECT t, COUNT(*) AS c FROM tok GROUP BY t
        ORDER BY c DESC, t ASC LIMIT 1000
      )
    ),
    per_doc AS (
      SELECT tok.doc_id, tok.lang, tok.source,
             SUM(CASE WHEN vocab.t IS NULL THEN 1 ELSE 0 END)
               / COUNT(*) AS oov_rate
      FROM tok LEFT JOIN vocab ON tok.t = vocab.t
      GROUP BY 1, 2, 3
    )
    SELECT lang, source,
           ROUND(AVG(oov_rate), 4) AS avg_oov,
           COUNT(*) AS n_docs
    FROM per_doc
    GROUP BY lang, source
    """,
)
def q128_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", "source",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z]+"), lambda t: t != "")
        ).alias("t"),
    )
    vocab = (
        tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(1000)
        .select("t", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id", "lang", "source")
        .agg(
            (
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("oov_rate")
        )
    )
    return per_doc.groupBy("lang", "source").agg(
        F.round(F.avg("oov_rate"), 4).alias("avg_oov"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# q129: the dedup pass a curation pipeline actually ships — near-dup
# clusters (same pair semantics as q54) collapsed to ONE survivor per
# cluster by quality (longest doc, ties to smallest id). max_by on a
# (quality, −id) struct: one hash agg, no window.
# ---------------------------------------------------------------------------

@query(
    "q129_dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE
         toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         gsets AS MATERIALIZED (SELECT doc_id, {_SQL_GRAMS3} AS g
                                FROM toks WHERE len({_SQL_GRAMS3}) > 0),
         inv0 AS (SELECT doc_id, unnest(g) AS gram FROM gsets),
         -- df-cut mirror + count-based intersection (the q54 recipe;
         -- this oracle kept the PRE-fix quadratic shape and spilled
         -- past the 77 GB disk at sf10)
         keep AS (SELECT gram FROM inv0 GROUP BY gram HAVING COUNT(*) <= 64),
         inv AS MATERIALIZED (SELECT inv0.* FROM inv0 JOIN keep USING (gram)),
         sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n
                                FROM inv GROUP BY 1),
         cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         COUNT(*) AS ninter
                  FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         pairs AS MATERIALIZED (
                  SELECT id_a, id_b
                  FROM cand
                  JOIN sizes sa ON sa.doc_id = cand.id_a
                  JOIN sizes sb ON sb.doc_id = cand.id_b
                  WHERE ninter / (sa.n + sb.n - ninter) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION ALL
                   SELECT id_b, id_a FROM pairs),
         reach(id, r) AS (
             SELECT src, src FROM edges
             UNION
             SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
         ),
         cc AS (SELECT id, MIN(r) AS lbl FROM reach GROUP BY id),
         sized AS (
             SELECT cc.lbl AS cluster_id, cc.id, d.n_chars,
                    ROW_NUMBER() OVER (PARTITION BY cc.lbl
                                       ORDER BY d.n_chars DESC, cc.id ASC) AS rn,
                    COUNT(*) OVER (PARTITION BY cc.lbl) AS cluster_size
             FROM cc JOIN documents d ON d.doc_id = cc.id
         )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           id AS kept_id,
           n_chars AS kept_quality,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM sized
    WHERE rn = 1 AND cluster_size >= 2
    """,
)
def q129_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    # max_df=64 on BOTH sides (the q19/q54 stop-gram semantic —
    # inert below sf1, the scale contract above it)
    pairs = ngram_jaccard_pairs_exact(
        docs, "doc_id", "text", n=3, threshold=0.8, max_df=64
    )
    return keep_best_per_cluster(
        docs, pairs.select("id_a", "id_b"), "doc_id", "n_chars"
    )


# ---------------------------------------------------------------------------
# q130: equi-width histogram of order totals — the bounds ride the
# plan as a broadcast 1-row aggregate (no collect), bucket id is one
# arithmetic expression, then a hash agg. Identical double arithmetic
# on both sides makes the bin edges hash-stable at 4 decimals.
# ---------------------------------------------------------------------------

@query(
    "q130_price_histogram",
    oracle="""
    WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
               FROM orders),
         w AS (SELECT lo, (hi - lo) / 20.0 AS wd FROM b),
         x AS (SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / wd) AS INTEGER), 19)
                        AS bin_id, lo, wd
               FROM orders, w)
    SELECT bin_id,
           ROUND(MIN(lo + bin_id * wd), 4) AS bin_lo,
           ROUND(MIN(lo + (bin_id + 1) * wd), 4) AS bin_hi,
           COUNT(*) AS n
    FROM x GROUP BY bin_id
    """,
)
def q130_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return equi_width_histogram(orders, "o_totalprice", 20)


# ---------------------------------------------------------------------------
# q131: ordered sequence-pattern match — per-user event path (pinned
# by (ts, event_id)), counting contiguous view→click→purchase runs.
# collect_list of (us, event_id, type) structs + array_sort gives a
# deterministic path without a window sort; the regex count is one
# JVM expression.
# ---------------------------------------------------------------------------

@query(
    "q131_seq_pattern",
    oracle="""
    WITH p AS (
      SELECT user_id,
             string_agg(event_type, ',' ORDER BY ts, event_id) AS path
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(path, 'view,click,purchase')) AS INTEGER)
             AS n_funnels,
           CAST(len(string_split(path, ',')) AS INTEGER) AS path_len
    FROM p
    WHERE len(regexp_extract_all(path, 'view,click,purchase')) > 0
    """,
)
def q131_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = (
        ev.select(
            "user_id",
            F.struct(epoch_us("ts").alias("us"), "event_id", "event_type").alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["event_type"]
                ),
                ",",
            ).alias("path")
        )
    )
    n_funnels = F.size(
        F.expr("regexp_extract_all(path, 'view,click,purchase', 0)")
    )
    return (
        p.select(
            "user_id",
            n_funnels.alias("n_funnels"),
            F.size(F.split("path", ",")).alias("path_len"),
        )
        .where(F.col("n_funnels") > 0)
    )


# ---------------------------------------------------------------------------
# q132: correlation matrix — pairwise Pearson correlations of the
# lineitem numeric columns per return flag, one hash aggregate (six
# corr aggregates in a single pass, no unpivot/self-join).
# ---------------------------------------------------------------------------

@query(
    "q132_corr_matrix",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(corr(l_quantity, l_discount), 4)      AS corr_qty_disc,
           ROUND(corr(l_quantity, l_tax), 4)           AS corr_qty_tax,
           ROUND(corr(l_extendedprice, l_discount), 4) AS corr_price_disc,
           ROUND(corr(l_extendedprice, l_tax), 4)      AS corr_price_tax,
           ROUND(corr(l_discount, l_tax), 4)           AS corr_disc_tax,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q132_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 4).alias("corr_qty_disc"),
        F.round(F.corr("l_quantity", "l_tax"), 4).alias("corr_qty_tax"),
        F.round(F.corr("l_extendedprice", "l_discount"), 4).alias("corr_price_disc"),
        F.round(F.corr("l_extendedprice", "l_tax"), 4).alias("corr_price_tax"),
        F.round(F.corr("l_discount", "l_tax"), 4).alias("corr_disc_tax"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q133: curation funnel — the end-to-end corpus-curation head-count:
# total → length floor → language allowlist → exact-dedup survivors.
# One scan, conditional aggregates (no four-pass union); the exact
# dedup stage is a count_distinct on the filtered text.
# ---------------------------------------------------------------------------

@query(
    "q133_curation_funnel",
    oracle="""
    WITH agg AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN text IS NOT NULL AND length(text) >= 100
                      THEN 1 ELSE 0 END) AS len_ok,
             SUM(CASE WHEN text IS NOT NULL AND length(text) >= 100
                           AND lang IN ('en', 'de', 'fr')
                      THEN 1 ELSE 0 END) AS lang_ok,
             COUNT(DISTINCT CASE WHEN text IS NOT NULL AND length(text) >= 100
                                      AND lang IN ('en', 'de', 'fr')
                                 THEN text END) AS dedup_ok
      FROM documents
    )
    SELECT stage_id, stage, n_docs FROM (
      SELECT 1 AS stage_id, 'total' AS stage, CAST(total AS BIGINT) AS n_docs FROM agg
      UNION ALL
      SELECT 2, 'len_ok', CAST(len_ok AS BIGINT) FROM agg
      UNION ALL
      SELECT 3, 'lang_ok', CAST(lang_ok AS BIGINT) FROM agg
      UNION ALL
      SELECT 4, 'dedup_ok', CAST(dedup_ok AS BIGINT) FROM agg
    )
    """,
)
def q133_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    keep = F.col("text").isNotNull() & (F.length("text") >= 100)
    lang_ok = keep & F.col("lang").isin("en", "de", "fr")
    agg = docs.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(keep.cast("int")).alias("len_ok"),
        F.sum(lang_ok.cast("int")).alias("lang_ok"),
        F.count_distinct(F.when(lang_ok, F.col("text"))).alias("dedup_ok"),
    )
    stages = F.array(
        F.struct(F.lit(1).alias("stage_id"), F.lit("total").alias("stage"),
                 F.col("total").cast("long").alias("n_docs")),
        F.struct(F.lit(2).alias("stage_id"), F.lit("len_ok").alias("stage"),
                 F.col("len_ok").cast("long").alias("n_docs")),
        F.struct(F.lit(3).alias("stage_id"), F.lit("lang_ok").alias("stage"),
                 F.col("lang_ok").cast("long").alias("n_docs")),
        F.struct(F.lit(4).alias("stage_id"), F.lit("dedup_ok").alias("stage"),
                 F.col("dedup_ok").cast("long").alias("n_docs")),
    )
    return agg.select(F.explode(stages).alias("s")).select(
        "s.stage_id", "s.stage", "s.n_docs"
    )


# ---------------------------------------------------------------------------
# q134: PII scrubbing — the compliance pass before any training run.
# Contact info (email/phone/IPv4) is synthesized deterministically
# from doc_id (generator-vs-arithmetic-oracle pattern, the corpus
# itself has none), then scrubbed back out with RE2-compatible
# patterns that run verbatim in both engines. Chained regexp_replace
# stays inside whole-stage codegen.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.text import pii_counts, scrub_pii  # noqa: E402


@query(
    "q134_pii_scrub",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@mail' || (doc_id % 7)
                  || '.org call +1 ' || (100 + doc_id % 900) || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' ip ' || (doc_id % 254 + 1) || '.'
                  || (doc_id * 7 % 254 + 1) || '.'
                  || (doc_id * 13 % 254 + 1) || '.'
                  || (doc_id * 29 % 254 + 1) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(t, '\\+1 \\d{3}-\\d{4}')) AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(t, '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}')) AS INTEGER) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\+1 \\d{3}-\\d{4}', '<PHONE>', 'g'),
                 '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}', '<IP>', 'g')) AS scrubbed_md5
    FROM aug
    """,
)
def q134_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), did.cast("string"),
            F.lit("@mail"), (did % 7).cast("string"), F.lit(".org call +1 "),
            (100 + did % 900).cast("string"), F.lit("-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
            F.lit(" ip "),
            (did % 254 + 1).cast("string"), F.lit("."),
            (did * 7 % 254 + 1).cast("string"), F.lit("."),
            (did * 13 % 254 + 1).cast("string"), F.lit("."),
            (did * 29 % 254 + 1).cast("string"),
        ).alias("t"),
    )
    counts = pii_counts("t")
    return aug.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ip"].alias("n_ips"),
        F.md5(scrub_pii("t")).alias("scrubbed_md5"),
    )


# ---------------------------------------------------------------------------
# q135: SCD2 point-in-time join — every purchase picks up the signup
# state current at its timestamp. The engine side is pit_join's
# union + per-key forward-fill (ONE shuffle, linear per key); the
# oracle is the quadratic-per-key BETWEEN/argmax join it replaces.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.asof import pit_join  # noqa: E402


@query(
    "q135_pit_join",
    oracle="""
    WITH dim AS (
      SELECT user_id, event_id AS dim_id, value AS signup_value,
             epoch_us(ts) AS vf
      FROM events WHERE event_type = 'signup'
    ),
    fact AS (
      SELECT event_id, user_id, value, epoch_us(ts) AS us
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT f.event_id, f.user_id, f.value, d.signup_value, d.vf,
             ROW_NUMBER() OVER (PARTITION BY f.event_id
                                ORDER BY d.vf DESC, d.dim_id DESC) AS rn
      FROM fact f JOIN dim d
        ON d.user_id = f.user_id AND d.vf <= f.us
    )
    SELECT event_id, user_id,
           ROUND(value, 2) AS purchase_value,
           ROUND(signup_value, 2) AS signup_value,
           vf AS signup_us
    FROM m WHERE rn = 1
    """,
)
def q135_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    dim = ev.where(F.col("event_type") == "signup").select(
        "user_id", "event_id", F.col("value").alias("signup_value"), "ts"
    )
    facts = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value", "ts"
    )
    out = pit_join(
        facts, dim, by=["user_id"], fact_ts="ts", dim_ts="ts",
        payload=["signup_value"], dim_tiebreak=["event_id"],
    )
    return out.select(
        "event_id", "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round("signup_value", 2).alias("signup_value"),
        epoch_us("ts_effective").alias("signup_us"),
    )


# ---------------------------------------------------------------------------
# q136: winsorization — robust scaling by clipping to the exact
# interpolated [p05, p95] per group (feature-normalization staple).
# Quantiles are the only sort; the clip pass is a broadcast join +
# hash agg.
# ---------------------------------------------------------------------------

@query(
    "q136_winsorize",
    oracle="""
    -- nearest-rank cuts over an INTEGER-CENTS histogram: the sf1
    -- differential caught interpolated quantile_cont/percentile
    -- landing one ulp apart across engines while 50+ rows sat
    -- EXACTLY at the cut (value has 2-decimal mass points), flipping
    -- n_clipped. Order statistics at ceil(n/20) / ceil(19n/20) are
    -- integer-exact in both engines; all sums are exact integers.
    WITH e AS (SELECT event_type,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events),
    n AS (SELECT event_type, COUNT(*) AS n FROM e GROUP BY 1),
    h AS (SELECT event_type, cents, COUNT(*) AS c FROM e GROUP BY 1, 2),
    cum AS (SELECT event_type, cents,
                   SUM(c) OVER (PARTITION BY event_type
                                ORDER BY cents) AS cum
            FROM h),
    q AS (SELECT cum.event_type,
                 MIN(CASE WHEN cum >= (n.n + 19) // 20
                          THEN cents END) AS lo,
                 MIN(CASE WHEN cum >= (19 * n.n + 19) // 20
                          THEN cents END) AS hi
          FROM cum JOIN n USING (event_type) GROUP BY 1)
    SELECT e.event_type,
           ROUND(SUM(e.cents) / (100.0 * COUNT(*)), 4) AS mean_raw,
           ROUND(SUM(LEAST(GREATEST(e.cents, q.lo), q.hi))
                 / (100.0 * COUNT(*)), 4) AS mean_winsor,
           CAST(SUM(CASE WHEN e.cents < q.lo OR e.cents > q.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           COUNT(*) AS n
    FROM e JOIN q USING (event_type)
    GROUP BY e.event_type
    """,
)
def q136_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    # value-domain histogram (bounded by the cents domain, NOT the row
    # count — scale-safe), then cumulative counts per type to read the
    # nearest-rank order statistics at ceil(n/20) and ceil(19n/20).
    # The window partitions on event_type over the SMALL histogram.
    hist = ev.groupBy("event_type", "cents").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(Window.partitionBy("event_type").orderBy("cents")),
    )
    n_per = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        cum.join(F.broadcast(n_per), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 19) div 20"), F.col("cents"))
            ).alias("lo"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(19 * n + 19) div 20"),
                    F.col("cents"),
                )
            ).alias("hi"),
        )
    )
    clipped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            # exact integer sums; one shared float divide per column so
            # both engines derive the double from the same integers
            F.round(
                F.sum("cents") / (F.lit(100.0) * F.count(F.lit(1))), 4
            ).alias("mean_raw"),
            F.round(
                F.sum(clipped) / (F.lit(100.0) * F.count(F.lit(1))), 4
            ).alias("mean_winsor"),
            F.sum(
                ((F.col("cents") < F.col("lo")) | (F.col("cents") > F.col("hi")))
                .cast("int")
            ).cast("long").alias("n_clipped"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# q137: Z-order clustering key — Morton interleave of (user_id,
# event_id % 4096), the data-layout primitive behind OPTIMIZE ZORDER:
# range-partition + sort by this value and min/max file stats prune
# BOTH dimensions. Pure bit arithmetic, fully codegen'd; the top-k is
# TakeOrderedAndProject (distributed heap).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.indexing import z_value  # noqa: E402


@query(
    "q137_zorder_key",
    oracle="""
    WITH b AS (
      SELECT event_id, user_id AS x, event_id % 4096 AS y FROM events
    ),
    z AS (
      SELECT event_id, x, y,
             list_sum(list_transform(generate_series(0, 15), i ->
               (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))
             )) AS zval
      FROM b
    )
    SELECT event_id, x, y, CAST(zval AS BIGINT) AS zval
    FROM z
    ORDER BY zval, event_id
    LIMIT 100
    """,
)
def q137_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        "event_id",
        F.col("user_id").alias("x"),
        (F.col("event_id") % 4096).alias("y"),
    )
    return (
        b.withColumn("zval", z_value(["x", "y"], bits=16))
        .orderBy("zval", "event_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q138: triangle count over the near-dup graph (same pair semantics as
# q54) — the cohesion check that near-dup "clusters" are actually
# cliques, not chains. Engine side uses degree-ordered orientation
# (wedge fan-out from the LOW-degree endpoint: Σd_out² = O(m^1.5)
# instead of a hub going quadratic); the oracle is the canonical
# a<b<c triple self-join. Counts are method-invariant.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.graph import triangle_count  # noqa: E402


@query(
    "q138_triangles",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
         gsets0 AS (SELECT doc_id, {_SQL_GRAMS3} AS g FROM toks WHERE len({_SQL_GRAMS3}) > 0),
         inv0 AS (SELECT doc_id, unnest(g) AS gram FROM gsets0),
         -- df-cut mirror (max_df=64, the q19 contract) + COUNT-BASED
         -- verify (grams are distinct per doc, so shared-gram
         -- co-occurrence count IS |A∩B|): the sf1 run proved the old
         -- per-candidate list_intersect formulation takes ~45 min in
         -- DuckDB over 12.6M candidates — the oracle, not the engine
         -- (19 s at sf1), was the brute-force bottleneck. Same
         -- semantics, q19's oracle shape.
         keep AS (SELECT gram FROM inv0 GROUP BY gram HAVING COUNT(*) <= 64),
         -- MATERIALIZED pins throughout (the q146/q76 class): canon is
         -- referenced FOUR times below, and naive inlining re-ran the
         -- whole posting-list pipeline per reference — at sf10 the
         -- four concurrent spills overran the 77 GB disk
         inv AS MATERIALIZED (SELECT inv0.* FROM inv0 JOIN keep USING (gram)),
         sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n
                                FROM inv GROUP BY 1),
         cand AS MATERIALIZED (
                  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
                  FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
         canon AS MATERIALIZED (
                   SELECT id_a AS a, id_b AS b
                   FROM cand
                   JOIN sizes sa ON sa.doc_id = cand.id_a
                   JOIN sizes sb ON sb.doc_id = cand.id_b
                   WHERE ninter / (sa.n + sb.n - ninter) >= 0.8)
    SELECT (SELECT COUNT(DISTINCT x)
            FROM (SELECT a AS x FROM canon UNION SELECT b FROM canon)) AS n_nodes,
           (SELECT COUNT(*) FROM canon) AS n_edges,
           (SELECT COUNT(*)
            FROM canon e1
            JOIN canon e2 ON e2.a = e1.b
            JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
    """,
)
def q138_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    # max_df=64 (the q19 contract): inert at gate SFs, but the sf1 run
    # proved the UNCUT gram universe explodes posting-list pair volume
    # at 50k docs — the round-5 failure class, reachable through any
    # caller that skips the cut. Oracle mirrors the df-filtered space.
    pairs = ngram_jaccard_pairs_exact(
        docs, "doc_id", "text", n=3, threshold=0.8, max_df=64
    )
    return triangle_count(pairs.select("id_a", "id_b"), src="id_a", dst="id_b")


# ---------------------------------------------------------------------------
# q139: token-budget mixture planner — waterfilling allocation of a
# 90% token budget across sources (cap the head equally, keep the
# tail whole: the standard pretraining-mixture rule). Closed form via
# sorted cumulative sums; the only window is over the source-grain
# relation. 90% budget exercises BOTH branches (some sources kept
# whole, some capped) on this corpus.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sampling import budget_waterfill  # noqa: E402


@query(
    "q139_budget_mix",
    oracle="""
    WITH tok AS (SELECT source,
                        len(string_split_regex(trim(text), '\\s+')) AS t
                 FROM documents),
    tot AS (SELECT source, CAST(SUM(t) AS BIGINT) AS total FROM tok GROUP BY 1),
    w AS (SELECT source, total,
            SUM(total) OVER (ORDER BY total, source ROWS UNBOUNDED PRECEDING) AS cum,
            ROW_NUMBER() OVER (ORDER BY total, source) AS rn,
            COUNT(*) OVER () AS n,
            0.9 * SUM(total) OVER () AS budget
          FROM tot),
    j AS (SELECT COALESCE(MAX(rn), 0) AS j, COALESCE(MAX(cum), 0) AS cumj
          FROM w WHERE cum + (n - rn) * total <= budget),
    lvl AS (SELECT CASE WHEN MIN(w.n) = MIN(j.j) THEN CAST(MAX(w.total) AS DOUBLE)
                        ELSE (MIN(w.budget) - MIN(j.cumj)) / (MIN(w.n) - MIN(j.j))
                   END AS L
            FROM w, j)
    SELECT w.source, w.total,
           ROUND(LEAST(w.total, lvl.L), 4) AS allocated,
           ROUND(LEAST(w.total, lvl.L) / w.total, 4) AS rate
    FROM w, lvl
    """,
)
def q139_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).alias("t"),
    )
    return budget_waterfill(toks, "source", "t", budget_frac=0.9)


# ---------------------------------------------------------------------------
# q140: incremental dedup — screen an incoming batch (source 'src0')
# against the standing corpus (every other source) WITHOUT any
# corpus×corpus or new×new comparison: new band values equi-join the
# corpus's band-posting index (persistable in production), hot corpus
# buckets dropped whole. The oracle replays the same x-engine
# signature family in SQL, so even the candidate set is checkable.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.dedup import incremental_dedup_lsh  # noqa: E402


@query(
    "q140_incremental_dedup",
    oracle=f"""
    WITH toks AS (SELECT doc_id, source, {_SQL_TOKENS} AS t FROM documents),
         gsets AS (SELECT doc_id, source, {_SQL_GRAMS3} AS g
                   FROM toks WHERE len({_SQL_GRAMS3}) > 0),
         hashed AS (SELECT doc_id, source, g,
                           list_transform(g, s -> {_SQL_POLYHASH}) AS hs
                    FROM gsets),
         sigs AS (SELECT doc_id, source, g, {_SQL_SIG} AS sig FROM hashed),
         bands AS (SELECT doc_id, source, g, i,
                          sig[CAST(i + 1 AS INTEGER)] AS sv
                   FROM sigs, (SELECT unnest(generate_series(0, 7)) AS i)),
         corpus AS (SELECT * FROM bands WHERE source <> 'src0'),
         newb   AS (SELECT * FROM bands WHERE source = 'src0'),
         cool AS (SELECT i, sv FROM corpus GROUP BY i, sv HAVING COUNT(*) <= 64),
         cand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
                  FROM newb n
                  JOIN (SELECT corpus.* FROM corpus JOIN cool USING (i, sv)) c
                    ON n.i = c.i AND n.sv = c.sv),
         verified AS (
            SELECT cand.new_id, cand.corpus_id,
                   len(list_intersect(sn.g, sc.g))
                   / (len(sn.g) + len(sc.g) - len(list_intersect(sn.g, sc.g)))
                     AS sim
            FROM cand
            JOIN sigs sn ON sn.doc_id = cand.new_id
            JOIN sigs sc ON sc.doc_id = cand.corpus_id
            WHERE len(list_intersect(sn.g, sc.g))
                  / (len(sn.g) + len(sc.g) - len(list_intersect(sn.g, sc.g))) >= 0.8
         ),
         best AS (
            SELECT new_id,
                   MAX(sim) AS msim,
                   COUNT(*) AS n_matches
            FROM verified GROUP BY new_id
         ),
         pick AS (
            SELECT v.new_id,
                   MIN(v.corpus_id) FILTER (v.sim = b.msim) AS best_match,
                   ROUND(MIN(b.msim), 4) AS best_sim,
                   MIN(b.n_matches) AS n_matches
            FROM verified v JOIN best b USING (new_id)
            GROUP BY v.new_id
         )
    SELECT d.doc_id AS new_id,
           pick.best_match IS NOT NULL AS is_dup,
           pick.best_match,
           pick.best_sim,
           CAST(COALESCE(pick.n_matches, 0) AS BIGINT) AS n_matches
    FROM documents d LEFT JOIN pick ON pick.new_id = d.doc_id
    WHERE d.source = 'src0'
    """,
)
def q140_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return incremental_dedup_lsh(
        docs.where(F.col("source") == "src0"),
        docs.where(F.col("source") != "src0"),
        "doc_id",
        "text",
        num_perm=8,
        threshold=0.8,
        max_postings=64,
    )


# ---------------------------------------------------------------------------
# q141: embedding mean-pooling per group — the chunk→document pooling
# primitive (doc embedding = mean of its chunk embeddings), done
# WITHOUT collecting vectors: posexplode to (group, dim, value) →
# per-dimension hash agg → re-assemble ordered. Means are quantized
# to 1e-4 ints for a representation-stable cross-engine contract, and
# the L2 norm is computed from the quantized values in dimension
# order so both engines sum identical doubles.
# ---------------------------------------------------------------------------

@query(
    "q141_mean_pool",
    oracle="""
    WITH e AS (
      SELECT label, j, embedding[j] AS v
      FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS j)
    ),
    m AS (
      SELECT label, j, CAST(ROUND(AVG(v) * 10000) AS BIGINT) AS m4
      FROM e GROUP BY 1, 2
    ),
    agg AS (
      SELECT label, list(m4 ORDER BY j) AS ms FROM m GROUP BY label
    ),
    n AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY label)
    SELECT agg.label,
           array_to_string(agg.ms, ',') AS mean_q,
           ROUND(sqrt(list_reduce(
                 list_transform(agg.ms, x -> (x / 10000.0) * (x / 10000.0)),
                 (a, b) -> a + b)), 4) AS norm,
           n.n_vecs
    FROM agg JOIN n USING (label)
    """,
)
def q141_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    e = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    m = e.groupBy("label", "pos").agg(
        F.round(F.avg("v") * 10000).cast("long").alias("m4")
    )
    agg = m.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("pos", "m4"))).alias("pm")
    )
    ms = F.transform(F.col("pm"), lambda x: x["m4"])
    n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    return (
        agg.join(F.broadcast(n), "label")
        .select(
            "label",
            F.array_join(
                F.transform(ms, lambda x: x.cast("string")), ","
            ).alias("mean_q"),
            F.round(
                F.sqrt(
                    F.aggregate(
                        ms,
                        F.lit(0.0),
                        lambda acc, x: acc + (x / 10000.0) * (x / 10000.0),
                    )
                ),
                4,
            ).alias("norm"),
            "n_vecs",
        )
    )


# ---------------------------------------------------------------------------
# q142: audio frame features — REAL PCM16 decode (functions/wav.py)
# then per-frame energy / peak / zero-crossings via numpy in Arrow
# mapInPandas (the VAD/silence-detection stage of an audio pipeline).
# Features are integers so the cross-engine contract is exact; the
# oracle replays the synth formula s_i = (clen + 31·i) % 65536 − 32768
# in arithmetic (generator-vs-oracle pattern, same as q84/q98/q123).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.multimodal import (  # noqa: E402
    audio_frame_features,
    with_wav_payload,
)


@query(
    "q142_audio_frames",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 97 + 8 AS n
               FROM documents WHERE text IS NOT NULL),
    fr AS (SELECT doc_id, clen, n,
                  unnest(generate_series(0, CAST(ceil(n / 64.0) AS INTEGER) - 1)) AS f
           FROM g)
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST(LEAST(n, (f + 1) * 64) - f * 64 AS INTEGER) AS n_in_frame,
           CAST(list_sum(list_transform(
                 generate_series(f * 64, LEAST(n, (f + 1) * 64) - 1),
                 i -> ((clen + 31 * i) % 65536 - 32768)
                      * ((clen + 31 * i) % 65536 - 32768))) AS BIGINT) AS sum_sq,
           CAST(list_max(list_transform(
                 generate_series(f * 64, LEAST(n, (f + 1) * 64) - 1),
                 i -> abs((clen + 31 * i) % 65536 - 32768))) AS INTEGER) AS peak,
           CAST(COALESCE(list_sum(list_transform(
                 generate_series(f * 64 + 1, LEAST(n, (f + 1) * 64) - 1),
                 i -> CASE WHEN ((clen + 31 * i) % 65536 - 32768 >= 0)
                              <> ((clen + 31 * (i - 1)) % 65536 - 32768 >= 0)
                           THEN 1 ELSE 0 END)), 0) AS INTEGER) AS zero_crossings
    FROM fr
    """,
)
def q142_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: audio_frame_features(
            with_wav_payload(d, "text", "doc_id"), "payload", "doc_id", frame_len=64
        ),
        how="inner",
    )


# ---------------------------------------------------------------------------
# q143: image patch extraction — the ViT patchify stage over REAL
# decoded BMP pixels (8×8 tiles, partial edges kept), per-tile
# integer channel sums. The oracle replays the generator's pixel
# formula pixel[y,x,c] = (x+y+c+blen) % 256 arithmetically over each
# tile's index ranges (q23b/q123 pattern).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.multimodal import image_patches  # noqa: E402


@query(
    "q143_image_patches",
    oracle="""
    WITH g AS (SELECT doc_id,
                      octet_length(encode(text)) AS blen,
                      octet_length(encode(text)) % 31 + 1 AS w,
                      octet_length(encode(text)) % 17 + 1 AS h
               FROM documents WHERE text IS NOT NULL),
    pr AS (SELECT doc_id, blen, w, h,
                  unnest(generate_series(0, (h + 7) // 8 - 1)) AS patch_row
           FROM g),
    pc AS (SELECT pr.*, unnest(generate_series(0, (w + 7) // 8 - 1)) AS patch_col
           FROM pr),
    tiles AS (
      SELECT doc_id, patch_row, patch_col,
             LEAST(h, (patch_row + 1) * 8) - patch_row * 8 AS tile_h,
             LEAST(w, (patch_col + 1) * 8) - patch_col * 8 AS tile_w,
             list_sum(flatten(list_transform(
               generate_series(patch_row * 8, LEAST(h, (patch_row + 1) * 8) - 1),
               y -> list_transform(
                 generate_series(patch_col * 8, LEAST(w, (patch_col + 1) * 8) - 1),
                 x -> (x + y + blen) % 256)))) AS sum_r,
             list_sum(flatten(list_transform(
               generate_series(patch_row * 8, LEAST(h, (patch_row + 1) * 8) - 1),
               y -> list_transform(
                 generate_series(patch_col * 8, LEAST(w, (patch_col + 1) * 8) - 1),
                 x -> (x + y + 1 + blen) % 256)))) AS sum_g,
             list_sum(flatten(list_transform(
               generate_series(patch_row * 8, LEAST(h, (patch_row + 1) * 8) - 1),
               y -> list_transform(
                 generate_series(patch_col * 8, LEAST(w, (patch_col + 1) * 8) - 1),
                 x -> (x + y + 2 + blen) % 256)))) AS sum_b
      FROM pc
    )
    SELECT doc_id,
           CAST(patch_row AS INTEGER) AS patch_row,
           CAST(patch_col AS INTEGER) AS patch_col,
           CAST(tile_h AS INTEGER) AS tile_h,
           CAST(tile_w AS INTEGER) AS tile_w,
           CAST(sum_r AS BIGINT) AS sum_r,
           CAST(sum_g AS BIGINT) AS sum_g,
           CAST(sum_b AS BIGINT) AS sum_b,
           CAST(sum_r + sum_g + sum_b AS BIGINT) AS pixel_sum
    FROM tiles
    """,
)
def q143_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: image_patches(
            with_bmp_payload(d, "text", "doc_id"), "payload", "doc_id", patch=8
        ),
        how="inner",
    )


# ---------------------------------------------------------------------------
# q144: BM25 ranked retrieval — the lucene-style lexical scorer over
# the corpus for a fixed query-term set. tf rows are filtered to the
# query terms BEFORE any shuffle; df and (N, avgdl) broadcast. Top-10
# ordered by the ROUNDED score + id so the rank boundary cannot flip
# on sub-rounding float noise between engines.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.text import bm25_topk  # noqa: E402


@query(
    "q144_bm25",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    sc AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
           WHERE tok IN ('spark', 'table', 'window') GROUP BY 1, 2),
    dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1)
    SELECT tf.doc_id,
           ROUND(SUM(ln((sc.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
                     * tf.tf
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / sc.avgdl))),
                 4) AS score,
           COUNT(*) AS n_terms_hit
    FROM tf
    JOIN dfq USING (tok)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN sc
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id
    LIMIT 10
    """,
)
def q144_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, "doc_id", "text", terms=["spark", "table", "window"], k=10
    )


# ---------------------------------------------------------------------------
# q145: the END-TO-END curation pipeline, driver-checked — stage
# head-counts from pipelines/curation.curate_corpus (length floor →
# lang allowlist → exact dedup → near-dup keep-best → decontam/final).
# The oracle recomputes every stage in SQL, including the recursive-
# CTE near-dup clustering over the exact-dedup SURVIVOR set with the
# same max_df=64 stop-gram mirror. One hash row pins the whole flow.
# ---------------------------------------------------------------------------

from redskins_rule_spark.pipelines.curation import (  # noqa: E402
    CurationConfig,
    curate_corpus,
)


@query(
    "q145_curation_report",
    oracle=f"""
    WITH RECURSIVE
    base AS (SELECT * FROM documents),
    s1 AS (SELECT * FROM base WHERE text IS NOT NULL AND length(text) >= 100),
    s2 AS (SELECT * FROM s1 WHERE lang IN ('en', 'de', 'fr')),
    s3ids AS (SELECT MIN(doc_id) AS doc_id FROM s2 GROUP BY md5(text)),
    -- MATERIALIZED pins on every multiply-referenced/heavy stage (the
    -- q146/q138 class): the funnel tail references s3 and nd several
    -- times, and naive inlining re-ran the whole near-dup pipeline per
    -- reference — the sf10 ENOSPC
    s3 AS MATERIALIZED (SELECT s2.* FROM s2 JOIN s3ids USING (doc_id)),
    toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM s3),
    gsets AS MATERIALIZED (SELECT doc_id, {_SQL_GRAMS3} AS g
                           FROM toks WHERE len({_SQL_GRAMS3}) > 0),
    inv0 AS (SELECT doc_id, unnest(g) AS gram FROM gsets),
    keepg AS (SELECT gram FROM inv0 GROUP BY gram HAVING COUNT(*) <= 64),
    inv AS MATERIALIZED (SELECT inv0.* FROM inv0 JOIN keepg USING (gram)),
    sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n
                           FROM inv GROUP BY 1),
    cand AS MATERIALIZED (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
             FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
    pairs AS MATERIALIZED (
              SELECT id_a, id_b
              FROM cand
              JOIN sizes sa ON sa.doc_id = cand.id_a
              JOIN sizes sb ON sb.doc_id = cand.id_b
              WHERE ninter / (sa.n + sb.n - ninter) >= 0.8),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id
    ),
    cc AS MATERIALIZED (SELECT id, MIN(r) AS lbl FROM reach GROUP BY id),
    clus AS (SELECT lbl, COUNT(*) AS sz FROM cc GROUP BY lbl),
    nd AS MATERIALIZED (SELECT (SELECT COUNT(*) FROM s3)
                  - COALESCE(SUM(sz - 1), 0) AS n FROM clus)
    SELECT stage_id, stage, CAST(n_docs AS BIGINT) AS n_docs FROM (
      SELECT 1 AS stage_id, 'total' AS stage,
             (SELECT COUNT(*) FROM base) AS n_docs
      UNION ALL SELECT 2, 'len_ok', (SELECT COUNT(*) FROM s1)
      UNION ALL SELECT 3, 'lang_ok', (SELECT COUNT(*) FROM s2)
      UNION ALL SELECT 4, 'exact_dedup', (SELECT COUNT(*) FROM s3)
      UNION ALL SELECT 5, 'near_dedup', (SELECT n FROM nd)
      UNION ALL SELECT 6, 'decontaminated', (SELECT n FROM nd)
      UNION ALL SELECT 7, 'final', (SELECT n FROM nd)
    )
    """,
)
def q145_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread would be SAFE here (the report path is all integer-exact
    # work) but measured neutral-to-negative (A/B min-of-2: 5.83 s off
    # vs 6.07 s on — the 7 count branches re-pay the exchange), so the
    # scan stays unspread; the q145 win is the lazy 'kept' face
    docs = table(spark, sf_dir, "documents")
    out = curate_corpus(docs, CurationConfig())
    return out["report"]


# ---------------------------------------------------------------------------
# q146: k-core of the part–supplier bipartite graph (k=30, bounded to
# 3 peel rounds — which this graph converges within, so the bounded
# peel IS the true core; the bound is what makes the oracle an exact
# 3-round unroll). Each engine round: one degree agg + two semi
# joins, lineage cut per round.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.graph import kcore  # noqa: E402


@query(
    "q146_kcore",
    oracle="""
    -- every CTE below is MATERIALIZED: each level references the
    -- previous one 3x, so naive inlining re-evaluates the 60M-row
    -- DISTINCT ~3^3 times — at sf1 that spilled >74 GB of DuckDB
    -- temp and ENOSPC'd the differential (round-10 finding; results
    -- are identical, this is purely evaluation strategy)
    WITH e0 AS MATERIALIZED (SELECT DISTINCT l_partkey AS a, 1000000000 + l_suppkey AS b
                FROM lineitem),
    d1 AS (SELECT v, COUNT(*) c FROM (SELECT a AS v FROM e0 UNION ALL
                                      SELECT b FROM e0) GROUP BY v),
    k1 AS MATERIALIZED (SELECT v FROM d1 WHERE c >= 30),
    e1 AS MATERIALIZED (SELECT e0.* FROM e0 JOIN k1 ka ON e0.a = ka.v
                               JOIN k1 kb ON e0.b = kb.v),
    d2 AS (SELECT v, COUNT(*) c FROM (SELECT a AS v FROM e1 UNION ALL
                                      SELECT b FROM e1) GROUP BY v),
    k2 AS MATERIALIZED (SELECT v FROM d2 WHERE c >= 30),
    e2 AS MATERIALIZED (SELECT e1.* FROM e1 JOIN k2 ka ON e1.a = ka.v
                               JOIN k2 kb ON e1.b = kb.v),
    d3 AS (SELECT v, COUNT(*) c FROM (SELECT a AS v FROM e2 UNION ALL
                                      SELECT b FROM e2) GROUP BY v),
    k3 AS MATERIALIZED (SELECT v FROM d3 WHERE c >= 30),
    e3 AS MATERIALIZED (SELECT e2.* FROM e2 JOIN k3 ka ON e2.a = ka.v
                               JOIN k3 kb ON e2.b = kb.v)
    SELECT v AS id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3)
    GROUP BY v
    """,
)
def q146_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem", spread=True)
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(1000000000) + F.col("l_suppkey")).alias("dst"),
    )
    return kcore(edges, k=30, max_rounds=3)


# ---------------------------------------------------------------------------
# q147: cross-document block dedup WITH REMOVAL — distinct 8-token
# blocks keep their global first occurrence (by doc id, block idx),
# later copies are dropped and each doc's surviving text re-assembled.
# The window partitions by BLOCK CONTENT (per-block occurrence lists,
# never a global sort); re-assembly is one array_sort per doc.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.text import block_dedup  # noqa: E402


@query(
    "q147_block_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents
    ),
    nz AS (SELECT doc_id, tk FROM toks WHERE len(tk) > 0),
    blocks AS (
      SELECT doc_id, i AS idx,
             array_to_string(tk[i * 8 + 1 : i * 8 + 8], ' ') AS blk
      FROM nz, unnest(generate_series(0,
             CAST(ceil(len(tk) / 8.0) AS INTEGER) - 1)) AS u(i)
    ),
    marked AS (
      SELECT doc_id, idx, blk,
             ROW_NUMBER() OVER (PARTITION BY blk ORDER BY doc_id, idx) AS rn
      FROM blocks
    )
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN blk END, ' '
                               ORDER BY idx), '') AS kept_text
    FROM marked GROUP BY doc_id
    """,
)
def q147_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    return block_dedup(docs, "doc_id", "text", block_tokens=8)


# ---------------------------------------------------------------------------
# q148: DDSketch quantiles — the mergeable quantile sketch read
# end-to-end cross-engine. Bucketing (ceil(log_gamma(x))), the
# cumulative-rank walk, and the midpoint estimate are all
# deterministic arithmetic both engines share, so the ESTIMATES
# themselves hash-match — unlike approx_percentile, whose internals
# are engine-specific. State is O(#buckets) per group; quantile reads
# are row-local folds (see operators/sketch.py).
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sketch import (  # noqa: E402
    dd_quantile,
    dd_state,
    dd_total,
)


@query(
    "q148_dd_quantiles",
    oracle="""
    WITH h AS (
      SELECT o_orderpriority AS grp,
             CAST(CEIL(LN(CAST(o_totalprice AS DOUBLE))
                       / LN((1.0 + 0.01) / (1.0 - 0.01))) AS INTEGER) AS b,
             COUNT(*) AS n
      FROM orders WHERE o_totalprice > 0
      GROUP BY 1, 2
    ),
    c AS (
      SELECT grp, b, n,
             SUM(n) OVER (PARTITION BY grp ORDER BY b) AS cum,
             SUM(n) OVER (PARTITION BY grp) AS tot
      FROM h
    )
    SELECT grp,
           CAST(MAX(tot) AS BIGINT) AS n,
           ROUND(MIN(CASE WHEN cum >= 1 + FLOOR(0.5 * (tot - 1))
                 THEN 2.0 * POW((1.0 + 0.01) / (1.0 - 0.01), b)
                      / ((1.0 + 0.01) / (1.0 - 0.01) + 1.0) END), 4) AS p50,
           ROUND(MIN(CASE WHEN cum >= 1 + FLOOR(0.9 * (tot - 1))
                 THEN 2.0 * POW((1.0 + 0.01) / (1.0 - 0.01), b)
                      / ((1.0 + 0.01) / (1.0 - 0.01) + 1.0) END), 4) AS p90,
           ROUND(MIN(CASE WHEN cum >= 1 + FLOOR(0.99 * (tot - 1))
                 THEN 2.0 * POW((1.0 + 0.01) / (1.0 - 0.01), b)
                      / ((1.0 + 0.01) / (1.0 - 0.01) + 1.0) END), 4) AS p99
    FROM c GROUP BY grp
    """,
)
def q148_dd_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    st = dd_state(orders, ["o_orderpriority"], "o_totalprice", alpha=0.01)
    return st.select(
        F.col("o_orderpriority").alias("grp"),
        dd_total(F.col("dd")).alias("n"),
        F.round(dd_quantile(F.col("dd"), 0.5, alpha=0.01), 4).alias("p50"),
        F.round(dd_quantile(F.col("dd"), 0.9, alpha=0.01), 4).alias("p90"),
        F.round(dd_quantile(F.col("dd"), 0.99, alpha=0.01), 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# q149: Bloom-pruned semi join — the explicit runtime-filter pattern.
# The part-side bitmap (selective size filter) broadcasts as a
# bounded 1-row map; lineitem rows fail the membership test BEFORE
# the shuffle, and the surviving candidates are re-verified by the
# exact semi join, so the result is identical to a plain EXISTS —
# which is exactly what the oracle runs. At 100 TB the win is the
# shuffle shrinking to matches + εfp; here the win is that the whole
# pattern is hash-checkable.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.skew import bloom_semi_join  # noqa: E402


@query(
    "q149_bloom_prune",
    oracle="""
    SELECT l.l_returnflag AS flag,
           COUNT(*) AS n,
           ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM part p
                  WHERE p.p_partkey = l.l_partkey
                    AND p.p_size = 1)
    GROUP BY 1
    """,
)
def q149_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    sm = table(spark, sf_dir, "part").where(F.col("p_size") == 1)
    return (
        bloom_semi_join(li, sm, "l_partkey", "p_partkey", m_bits=1 << 16, k=3)
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q150: one-sweep column profiler — the ingest gate a corpus build
# runs before committing 100 TB to a layout. The (col, value) pair
# shape gets exact per-column distinct counts WITHOUT the Expand
# operator that N COUNT(DISTINCT)s in one agg would plan (that shape
# replicates every input row N times); min/max/avg ride the same
# two hash aggs.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.analytic import profile_columns  # noqa: E402


@query(
    "q150_profile",
    oracle="""
    WITH pairs AS (
      SELECT 'l_quantity' AS col, CAST(l_quantity AS DOUBLE) AS v FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
    ),
    pv AS (SELECT col, v, COUNT(*) AS n FROM pairs GROUP BY 1, 2)
    SELECT col,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN n END), 0) AS BIGINT)
             AS n_null,
           COUNT(v) AS n_distinct,
           ROUND(MIN(v), 4) AS min_v,
           ROUND(MAX(v), 4) AS max_v,
           ROUND(SUM(v * n) / SUM(CASE WHEN v IS NOT NULL THEN n END), 3)
             AS avg_v
    FROM pv GROUP BY col
    """,
)
def q150_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return profile_columns(li, ["l_quantity", "l_extendedprice", "l_discount"])


# ---------------------------------------------------------------------------
# q151: deterministic seeded shuffle — the global-permutation +
# shard-assignment step of a training-data write, keyed on the
# cross-engine scrambled rolling hash so the ENTIRE permutation is
# verifiable: the oracle recomputes shard and rank with identical
# arithmetic and both sides fold an order-sensitive checksum
# Σ(h·pos) mod p per shard — any row in the wrong shard OR wrong
# position flips the hash.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sampling import (  # noqa: E402
    seeded_shuffle,
    shuffle_hash,
)

_Q151_ROLL = _sql_roll_of("('7:' || CAST(doc_id AS VARCHAR))")


@query(
    "q151_seeded_shuffle",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             (1103515245 * {_Q151_ROLL} + 12345) % 2147483647 AS h
      FROM documents
    ),
    s AS (
      SELECT doc_id, h, CAST(h % 16 AS INTEGER) AS shard,
             ROW_NUMBER() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) AS pos
      FROM h
    )
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM((h * pos) % 2147483647) % 2147483647 AS BIGINT) AS checksum
    FROM s GROUP BY shard
    """,
)
def q151_seeded_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sh = seeded_shuffle(docs, "doc_id", seed=7, n_shards=16)
    h = shuffle_hash("doc_id", 7)
    m = 2147483647
    return sh.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum((h * F.col("pos")) % m) % m).cast("long").alias("checksum"),
    )


# ---------------------------------------------------------------------------
# q152: deterministic negative sampling — k pseudo-random contrastive
# partners per anchor off the seeded shuffle hash and a dense global
# index (prefix-sum, no global window; see operators/sampling.py).
# The oracle re-derives index, probe arithmetic, and self-bump with
# identical integer expressions, so the full (anchor, slot, negative)
# assignment is hash-checked.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sampling import negative_samples  # noqa: E402

_Q152_ROLL = _sql_roll_of("('0:' || CAST(doc_id AS VARCHAR))")


@query(
    "q152_negative_samples",
    oracle=f"""
    WITH ids AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS idx
      FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM documents),
    a AS (
      SELECT doc_id AS anchor_id, idx,
             (1103515245 * {_Q152_ROLL} + 12345) % 2147483647 AS h
      FROM ids
    ),
    e AS (
      SELECT anchor_id, idx, h, j
      FROM a CROSS JOIN (VALUES (1), (2), (3)) t(j)
    ),
    r AS (
      SELECT anchor_id, j, idx,
             (h + j * 2654435761) % (SELECT n FROM tot) AS raw
      FROM e
    ),
    x AS (
      SELECT anchor_id, j,
             CASE WHEN raw = idx
                  THEN (raw + 1) % (SELECT n FROM tot)
                  ELSE raw END AS neg_idx
      FROM r
    )
    SELECT x.anchor_id, x.j, ids.doc_id AS neg_id
    FROM x JOIN ids ON ids.idx = x.neg_idx
    """,
)
def q152_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return negative_samples(docs, "doc_id", k=3, seed=0)


# ---------------------------------------------------------------------------
# q153: reciprocal-rank fusion — merging two top-20 rankings of the
# corpus (token volume vs vocabulary size) into one hybrid list, the
# zero-tuning lexical+vector merge pattern. The per-list rank windows
# run over 20-row frames (k-bounded by the TakeOrderedAndProject cut
# beneath them); the fusion agg touches ≤ 40 rows.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.text import rrf_fuse  # noqa: E402


def _q153_topk(m: DataFrame, score_col: str, k: int = 20) -> DataFrame:
    cut = m.orderBy(F.desc(score_col), "doc_id").limit(k)
    w = Window.orderBy(F.desc(score_col), "doc_id")
    return cut.select("doc_id", F.row_number().over(w).alias("rank"))


@query(
    "q153_rrf_fusion",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS tk
      FROM documents
    ),
    m AS (SELECT doc_id, len(tk) AS nt, len(list_distinct(tk)) AS nd
          FROM toks),
    la AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY nt DESC, doc_id) AS rank
           FROM m QUALIFY rank <= 20),
    lb AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY nd DESC, doc_id) AS rank
           FROM m QUALIFY rank <= 20),
    u AS (SELECT * FROM la UNION ALL SELECT * FROM lb)
    SELECT doc_id, COUNT(*) AS n_lists,
           ROUND(SUM(CAST(1.0 AS DOUBLE) / (60 + rank)), 6) AS rrf_score
    FROM u GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
)
def q153_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    m = docs.select(
        "doc_id",
        F.size(tk).alias("nt"),
        F.size(F.array_distinct(tk)).alias("nd"),
    )
    fused = rrf_fuse(
        [_q153_topk(m, "nt"), _q153_topk(m, "nd")], "doc_id", k=60
    )
    return (
        fused.withColumn("rrf_score", F.round("rrf_score", 6))
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q154: PSI drift report — train-vs-serve distribution-shift
# monitoring between order-total distributions of two periods.
# Equi-width bins over the REFERENCE bounds, additive smoothing so
# empty bins need no eps special-cases, full B-row spine. Everything
# after the two scans is bin-grain; the whole report (counts + terms)
# hash-checks cross-engine.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.analytic import psi_report  # noqa: E402


@query(
    "q154_psi",
    oracle="""
    WITH ref AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
                 WHERE o_orderdate < DATE '1998-01-01'),
    cur AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
            WHERE o_orderdate >= DATE '1998-01-01'),
    b AS (SELECT MIN(v) AS lo, (MAX(v) - MIN(v)) / 10.0 AS w FROM ref),
    rb AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / w) AS INTEGER), 0), 9)
                    AS bin_id, COUNT(*) AS n_ref
           FROM ref, b GROUP BY 1),
    cb AS (SELECT LEAST(GREATEST(CAST(FLOOR((v - lo) / w) AS INTEGER), 0), 9)
                    AS bin_id, COUNT(*) AS n_cur
           FROM cur, b GROUP BY 1),
    spine AS (SELECT unnest(generate_series(0, 9)) AS bin_id),
    j AS (SELECT s.bin_id,
                 COALESCE(rb.n_ref, 0) AS n_ref,
                 COALESCE(cb.n_cur, 0) AS n_cur
          FROM spine s LEFT JOIN rb USING (bin_id) LEFT JOIN cb USING (bin_id)),
    t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM j)
    SELECT bin_id, n_ref, n_cur,
           ROUND(((n_ref + 0.5) / (tr + 5.0) - (n_cur + 0.5) / (tc + 5.0))
                 * LN(((n_ref + 0.5) / (tr + 5.0))
                      / ((n_cur + 0.5) / (tc + 5.0))), 6) AS term
    FROM j, t
    """,
)
def q154_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    ref = orders.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    cur = orders.where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
    rep = psi_report(ref, cur, "o_totalprice", bins=10)
    return rep.select("bin_id", "n_ref", "n_cur", F.round("term", 6).alias("term"))


# ---------------------------------------------------------------------------
# q155: KMV set-operation estimates — the theta-sketch trick driver-
# checked end-to-end: per-event-type user sketches pair up (tiny
# sketch-grain frame), and union / Jaccard / intersection estimates
# read row-locally off two states. The oracle re-derives the sorted
# min-k lists and the identical merged-sketch arithmetic, so the
# ESTIMATES hash-match — incremental distinct analytics (overlap of
# audiences across days/sources) without re-reading history.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sketch import (  # noqa: E402
    kmv_set_estimates,
    kmv_state,
)

_Q155_ROLL = _sql_roll_of("CAST(user_id AS VARCHAR)")


@query(
    "q155_kmv_setops",
    oracle=f"""
    WITH d AS (
        SELECT DISTINCT event_type,
               (1103515245 * {_Q155_ROLL} + 12345) % 2147483647 AS h
        FROM events WHERE user_id IS NOT NULL
    ),
    s AS (
        SELECT event_type, list_sort(list(h))[1:{_KMV_K}] AS kmv
        FROM d GROUP BY event_type
    ),
    p AS (
        SELECT a.event_type AS et_a, b.event_type AS et_b,
               a.kmv AS ka, b.kmv AS kb,
               list_sort(list_distinct(flatten([a.kmv, b.kmv])))[1:{_KMV_K}]
                 AS merged
        FROM s a JOIN s b ON a.event_type < b.event_type
    ),
    e AS (
        SELECT et_a, et_b, ka, kb, merged,
               CASE WHEN len(merged) < {_KMV_K} THEN CAST(len(merged) AS BIGINT)
                    ELSE CAST(FLOOR(CAST({_KMV_K - 1} AS DOUBLE) * 2147483647
                                    / CAST(merged[{_KMV_K}] AS DOUBLE)) AS BIGINT)
               END AS union_est,
               len(list_filter(merged,
                               x -> list_contains(ka, x)
                                AND list_contains(kb, x))) AS in_both
        FROM p
    )
    SELECT et_a, et_b, union_est,
           ROUND(in_both / GREATEST(len(merged), 1), 4) AS jaccard_est,
           CAST(ROUND((in_both / GREATEST(len(merged), 1)) * union_est, 1)
                AS DOUBLE) AS intersection_est
    FROM e
    """,
)
def q155_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    st = kmv_state(ev, ["event_type"], "user_id", k=_KMV_K)
    a = st.select(F.col("event_type").alias("et_a"), F.col("kmv").alias("ka"))
    b = st.select(F.col("event_type").alias("et_b"), F.col("kmv").alias("kb"))
    pairs = a.join(b, F.col("et_a") < F.col("et_b"))
    ests = kmv_set_estimates(F.col("ka"), F.col("kb"), k=_KMV_K)
    return pairs.select(
        "et_a", "et_b",
        ests["union_est"].alias("union_est"),
        ests["jaccard_est"].alias("jaccard_est"),
        ests["intersection_est"].alias("intersection_est"),
    )


# ---------------------------------------------------------------------------
# q156: linear interpolation over a gap-filled series — the repair
# step after a spine join where zero-filling lies (rates, prices):
# interior missing months take the distance-weighted value between
# the nearest observed neighbors, edges stay null. Two bounded
# per-key windows (running last / leading first IGNORE NULLS), no
# self-join; the oracle mirrors the window arithmetic exactly.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.analytic import interpolate_linear  # noqa: E402


@query(
    "q156_interpolate",
    oracle="""
    WITH m AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS mon,
                      CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c
               FROM orders GROUP BY 1, 2),
         b AS (SELECT o_custkey, MIN(mon) AS mn, MAX(mon) AS mx FROM m GROUP BY 1),
         spine AS (SELECT o_custkey,
                          unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS mon
                   FROM b),
         j AS (SELECT s.o_custkey, s.mon, m.rev_c,
                      EXTRACT(year FROM s.mon) * 12 + EXTRACT(month FROM s.mon) AS t
               FROM spine s
               LEFT JOIN m ON m.o_custkey = s.o_custkey AND m.mon = s.mon),
         w AS (SELECT o_custkey, mon, rev_c, t,
                      LAST_VALUE(rev_c IGNORE NULLS) OVER wb AS pv,
                      LAST_VALUE(CASE WHEN rev_c IS NOT NULL THEN t END
                                 IGNORE NULLS) OVER wb AS pt,
                      FIRST_VALUE(rev_c IGNORE NULLS) OVER wf AS nv,
                      FIRST_VALUE(CASE WHEN rev_c IS NOT NULL THEN t END
                                  IGNORE NULLS) OVER wf AS nt
               FROM j
               WINDOW wb AS (PARTITION BY o_custkey ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                      wf AS (PARTITION BY o_custkey ORDER BY t
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT o_custkey, strftime(mon, '%Y-%m') AS mon,
           CAST(FLOOR(CAST(CASE WHEN rev_c IS NOT NULL THEN rev_c
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                      THEN pv + (nv - pv) * (t - pt) / (nt - pt) END
                      AS DOUBLE) + 0.5) AS BIGINT)
             AS rev_i_c
    FROM w
    """,
)
def q156_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    # month revenue snaps to EXACT integer cents before interpolating:
    # cent totals are integers, so ROUND(sum*100) is ulp-immune to the
    # engines' different double-summation orders, and every downstream
    # arithmetic step is exact-integer-seeded double math both engines
    # evaluate identically (positive halfway values round up in both).
    m = orders.groupBy(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("mon")
    ).agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev_c"))
    bounds = m.groupBy("o_custkey").agg(
        F.min("mon").alias("mn"), F.max("mon").alias("mx")
    )
    spine = bounds.select(
        "o_custkey",
        F.explode(F.expr("sequence(mn, mx, interval 1 month)")).alias("mon"),
    )
    j = spine.join(m, ["o_custkey", "mon"], "left").withColumn(
        "t", F.year("mon") * 12 + F.month("mon")
    )
    out = interpolate_linear(j, ["o_custkey"], "t", "rev_c")
    # FLOOR(x+0.5), not ROUND: Spark rounds the decimal-string repr of
    # a double (half-up on the printed digits), C engines round the
    # binary value — they disagree on exact-halfway doubles. floor is
    # bit-deterministic on the identical doubles both engines computed.
    return out.select(
        "o_custkey",
        F.date_format("mon", "yyyy-MM").alias("mon"),
        F.floor(F.col("interp") + F.lit(0.5)).cast("long").alias("rev_i_c"),
    )


# ---------------------------------------------------------------------------
# q157: token-weighted DD quantiles — "the median TOKEN sits in a doc
# of length X" (length-biased corpus statistics, the quantity that
# matters for sequence-packing and truncation budgets; doc-weighted
# medians understate what training actually sees). Integer weights
# keep the sketch exact, so the weighted estimates hash cross-engine
# like q148.
# ---------------------------------------------------------------------------

_Q157_EST = ("2.0 * POW((1.0 + 0.01) / (1.0 - 0.01), b) "
             "/ ((1.0 + 0.01) / (1.0 - 0.01) + 1.0)")


@query(
    "q157_dd_weighted",
    oracle=f"""
    WITH tk AS (
      SELECT lang,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '')) AS nt
      FROM documents
    ),
    h AS (
      SELECT lang,
             CAST(CEIL(LN(CAST(nt AS DOUBLE))
                       / LN((1.0 + 0.01) / (1.0 - 0.01))) AS INTEGER) AS b,
             SUM(nt) AS n
      FROM tk WHERE nt > 0
      GROUP BY 1, 2
    ),
    c AS (
      SELECT lang, b, n,
             SUM(n) OVER (PARTITION BY lang ORDER BY b) AS cum,
             SUM(n) OVER (PARTITION BY lang) AS tot
      FROM h
    )
    SELECT lang,
           CAST(MAX(tot) AS BIGINT) AS n_tokens,
           ROUND(MIN(CASE WHEN cum >= 1 + FLOOR(0.5 * (tot - 1))
                 THEN {_Q157_EST} END), 4) AS wp50,
           ROUND(MIN(CASE WHEN cum >= 1 + FLOOR(0.9 * (tot - 1))
                 THEN {_Q157_EST} END), 4) AS wp90
    FROM c GROUP BY lang
    """,
)
def q157_dd_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    nt = F.size(F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                         lambda t: t != ""))
    base = docs.select("lang", nt.alias("nt"))
    st = dd_state(base, ["lang"], "nt", alpha=0.01, weight_col="nt")
    return st.select(
        "lang",
        dd_total(F.col("dd")).alias("n_tokens"),
        F.round(dd_quantile(F.col("dd"), 0.5, alpha=0.01), 4).alias("wp50"),
        F.round(dd_quantile(F.col("dd"), 0.9, alpha=0.01), 4).alias("wp90"),
    )


# ---------------------------------------------------------------------------
# q158: scene-change detection over real video payloads — per-frame
# transition mean-abs-delta through the actual LZW decode path. The
# synthetic generator advances every pixel by +7 (mod 256) per frame,
# so the oracle predicts each transition's delta ANALYTICALLY (7 for
# un-wrapped pixels, 249 where the prior value wraps past 255) from
# character length alone — the q99 pattern extended from frame stats
# to temporal structure. Keyframe selection downstream is a filter /
# top-k over this output.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.multimodal import frame_deltas  # noqa: E402


@query(
    "q158_scene_changes",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS c FROM documents
               WHERE text IS NOT NULL),
    g AS (SELECT doc_id, c, c % 16 + 2 AS w, c % 11 + 2 AS h,
                 c % 5 + 1 AS nf
          FROM d),
    t AS (SELECT doc_id, c, w, h, f
          FROM g, unnest(generate_series(1, nf - 1)) AS u(f)
          WHERE nf > 1),
    px AS (SELECT doc_id, f, w, h,
                  CASE WHEN (c + 7 * (f - 1) + 3 * y + x) % 256 >= 249
                       THEN 249 ELSE 7 END AS ad
           FROM t,
                unnest(generate_series(0, h - 1)) AS uy(y),
                unnest(generate_series(0, w - 1)) AS ux(x))
    SELECT doc_id, CAST(f AS INTEGER) AS f,
           ROUND(SUM(ad) / (MIN(w) * MIN(h)), 4) AS mad
    FROM px GROUP BY doc_id, f
    """,
)
def q158_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # dictionary fan-out (guide §8): frame deltas once per distinct
    # length; multi-row join-back keeps the per-(doc, f) shape
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: frame_deltas(with_gif_payload(d, "text")),
        how="inner",
    ).select("doc_id", "f", F.round("mad", 4).alias("mad"))


# ---------------------------------------------------------------------------
# q159: audio activity segmentation — the VAD stage: frames whose
# mean energy clears a threshold (compared in pure integers:
# sum_sq >= T·n, no division) group into contiguous speech segments
# via the integer gaps-and-islands anchor. Runs through the REAL
# PCM16 decode; the oracle replays the synth arithmetic (q142's CTE)
# and the same anchor trick.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.analytic import int_islands  # noqa: E402

_Q159_T = 400_000_000


@query(
    "q159_audio_segments",
    oracle=f"""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 97 + 8 AS n
               FROM documents WHERE text IS NOT NULL),
    fr AS (SELECT doc_id, clen, n,
                  unnest(generate_series(0, CAST(ceil(n / 64.0) AS INTEGER) - 1)) AS f
           FROM g),
    e AS (SELECT doc_id, f,
                 CAST(LEAST(n, (f + 1) * 64) - f * 64 AS BIGINT) AS nif,
                 CAST(list_sum(list_transform(
                       generate_series(f * 64, LEAST(n, (f + 1) * 64) - 1),
                       i -> ((clen + 31 * i) % 65536 - 32768)
                            * ((clen + 31 * i) % 65536 - 32768))) AS BIGINT)
                   AS sum_sq
          FROM fr),
    hot AS (SELECT doc_id, f FROM e WHERE sum_sq >= {_Q159_T} * nif),
    anch AS (SELECT doc_id, f,
                    f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS a
             FROM hot)
    SELECT doc_id,
           MIN(f) AS seg_start,
           MAX(f) AS seg_end,
           COUNT(*) AS seg_len
    FROM anch GROUP BY doc_id, a
    """,
)
def q159_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): frame features once per distinct
    # length; the VAD threshold + islands run on the fanned-out rows
    feats = length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: audio_frame_features(
            with_wav_payload(d, "text", "doc_id"),
            "payload",
            "doc_id",
            frame_len=64,
        ),
        how="inner",
    )
    hot = feats.where(
        F.col("sum_sq") >= F.lit(_Q159_T) * F.col("n_in_frame").cast("long")
    )
    segs = int_islands(hot, ["doc_id"], "frame_idx")
    return segs.select(
        "doc_id",
        F.col("island_start").alias("seg_start"),
        F.col("island_end").alias("seg_end"),
        F.col("island_len").alias("seg_len"),
    )


# ---------------------------------------------------------------------------
# q160: perceptual image hashing — dHash through the REAL BMP decode,
# the near-dup primitive for image corpora (recompressed copies land
# within small Hamming distance; byte hashes miss them). The oracle
# recomputes every sampled luminance pair from the generator's pixel
# arithmetic and packs the same 64 gradient bits — integer-exact end
# to end, so the hashes themselves hash-match. Downstream pairing
# reuses the SimHash pigeonhole machinery on the two 32-bit halves.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.multimodal import image_dhash  # noqa: E402


@query(
    "q160_image_dhash",
    oracle="""
    WITH d AS (SELECT doc_id, octet_length(encode(text)) AS bl
               FROM documents WHERE text IS NOT NULL),
    g AS (SELECT doc_id, bl, bl % 31 + 1 AS w, bl % 17 + 1 AS h FROM d),
    cells AS (
      SELECT doc_id, yt, xt,
             ((xt * w) // 9 + (yt * h) // 8 + bl) % 256
             + ((xt * w) // 9 + (yt * h) // 8 + 1 + bl) % 256
             + ((xt * w) // 9 + (yt * h) // 8 + 2 + bl) % 256 AS g0,
             (((xt + 1) * w) // 9 + (yt * h) // 8 + bl) % 256
             + (((xt + 1) * w) // 9 + (yt * h) // 8 + 1 + bl) % 256
             + (((xt + 1) * w) // 9 + (yt * h) // 8 + 2 + bl) % 256 AS g1
      FROM g,
           unnest(generate_series(0, 7)) AS uy(yt),
           unnest(generate_series(0, 7)) AS ux(xt)
    ),
    bits AS (SELECT doc_id, yt * 8 + xt AS k FROM cells WHERE g1 > g0)
    SELECT d.doc_id,
           CAST(COALESCE(SUM(CASE WHEN b.k >= 32
                 THEN (CAST(1 AS BIGINT) << (b.k - 32)) END), 0) AS BIGINT)
             AS dhash_hi,
           CAST(COALESCE(SUM(CASE WHEN b.k < 32
                 THEN (CAST(1 AS BIGINT) << b.k) END), 0) AS BIGINT)
             AS dhash_lo
    FROM d LEFT JOIN bits b ON b.doc_id = d.doc_id
    GROUP BY d.doc_id
    """,
)
def q160_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # null-text docs are excluded on BOTH sides (the oracle's WHERE);
    # without the filter Spark would emit null-hash rows the oracle drops
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: image_dhash(
            with_bmp_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q161: Poisson-bootstrap CI — error bars on group means WITHOUT
# materializing resamples: every row draws B=32 deterministic
# Poisson(1) weights off a seeded remix of its hash (inverse-CDF over
# shortest-round-trip literals), replicate means form the empirical
# interval. One scan, in-flight explode into a map-side-combinable
# agg; integer-cent sums keep every replicate mean exact, so the CI
# BOUNDS hash-match the oracle's re-derivation.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.analytic import bootstrap_ci  # noqa: E402

_Q161_ROLL = _sql_roll_of("('7:' || CAST(o_orderkey AS VARCHAR))")
_Q161_CASE = """CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238463 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  WHEN u < 0.9994058151824183 THEN 5
                  WHEN u < 0.999916758850712 THEN 6
                  WHEN u < 0.9999897508033253 THEN 7
                  ELSE 8 END"""


@query(
    "q161_bootstrap_ci",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS grp,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x,
             (1103515245 * {_Q161_ROLL} + 12345) % 2147483647 AS h
      FROM orders
    ),
    rep AS (SELECT grp, x, h, r
            FROM base, unnest(generate_series(0, 31)) t(r)),
    wts AS (
      SELECT grp, r, x, {_Q161_CASE} AS w
      FROM (SELECT grp, x, r,
                   CAST((1103515245 * (h + r) + 12345) % 2147483647 AS DOUBLE)
                     / 2147483647.0 AS u
            FROM rep)
    ),
    means AS (SELECT grp, r, CAST(SUM(w * x) AS DOUBLE) / SUM(w) AS m
              FROM wts GROUP BY grp, r HAVING SUM(w) > 0),
    agg AS (SELECT grp, list_sort(list(m)) AS ms, COUNT(*) AS nb
            FROM means GROUP BY grp),
    bs AS (SELECT grp, COUNT(*) AS n,
                  CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mean_all
           FROM base GROUP BY grp)
    SELECT b.grp, b.n, ROUND(b.mean_all, 4) AS mean_all,
           ROUND(a.ms[CAST(FLOOR(0.025 * (a.nb - 1)) AS INT) + 1], 4) AS ci_lo,
           ROUND(a.ms[CAST(FLOOR(0.975 * (a.nb - 1)) AS INT) + 1], 4) AS ci_hi
    FROM bs b JOIN agg a ON a.grp = b.grp
    """,
)
def q161_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders", spread=True)
    out = bootstrap_ci(
        orders.select(
            F.col("o_orderpriority").alias("grp"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderkey",
        ),
        ["grp"],
        F.col("cents"),
        shuffle_hash("o_orderkey", 7),
        n_boot=32,
    )
    return out.select(
        "grp", "n",
        F.round("mean_all", 4).alias("mean_all"),
        F.round("ci_lo", 4).alias("ci_lo"),
        F.round("ci_hi", 4).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# q162: two-sample KS distance off DD states — distribution shift with
# a STATISTIC (sup-norm CDF gap) instead of q154's binned divergence,
# read row-locally from the same mergeable sketches the monitoring
# pipeline stores. Exact KS would sort raw values per group; the
# bucket-grid fold is within one alpha-bucket of it (accuracy pinned
# in pytest vs brute force). Cumulative counts are exact integers, so
# the distances hash-match the oracle's windowed-cumsum re-derivation.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sketch import dd_ks  # noqa: E402

_Q162_B = ("CAST(CEIL(LN(CAST(o_totalprice AS DOUBLE)) "
           "/ LN((1.0 + 0.01) / (1.0 - 0.01))) AS INTEGER)")


@query(
    "q162_dd_ks",
    oracle=f"""
    WITH a AS (SELECT o_orderpriority AS g, {_Q162_B} AS b, COUNT(*) AS n
               FROM orders
               WHERE o_orderdate < DATE '1998-01-01' AND o_totalprice > 0
               GROUP BY 1, 2),
    b2 AS (SELECT o_orderpriority AS g, {_Q162_B} AS b, COUNT(*) AS n
           FROM orders
           WHERE o_orderdate >= DATE '1998-01-01' AND o_totalprice > 0
           GROUP BY 1, 2),
    k AS (SELECT g, b FROM a UNION SELECT g, b FROM b2),
    j AS (SELECT k.g, k.b,
                 COALESCE(a.n, 0) AS an, COALESCE(b2.n, 0) AS bn
          FROM k LEFT JOIN a ON a.g = k.g AND a.b = k.b
                 LEFT JOIN b2 ON b2.g = k.g AND b2.b = k.b),
    c AS (SELECT g, b,
                 SUM(an) OVER w AS ca, SUM(bn) OVER w AS cb,
                 SUM(an) OVER (PARTITION BY g) AS na,
                 SUM(bn) OVER (PARTITION BY g) AS nb
          FROM j WINDOW w AS (PARTITION BY g ORDER BY b))
    SELECT g AS grp,
           CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           ROUND(MAX(ABS(CAST(ca AS DOUBLE) / na
                         - CAST(cb AS DOUBLE) / nb)), 6) AS ks
    FROM c GROUP BY g
    """,
)
def q162_dd_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("date")
    sa = dd_state(
        orders.where(F.col("o_orderdate") < cut), ["o_orderpriority"],
        "o_totalprice", alpha=0.01, out_col="da",
    )
    sb = dd_state(
        orders.where(F.col("o_orderdate") >= cut), ["o_orderpriority"],
        "o_totalprice", alpha=0.01, out_col="db",
    )
    j = sa.join(sb, "o_orderpriority")
    return j.select(
        F.col("o_orderpriority").alias("grp"),
        dd_total(F.col("da")).alias("n_a"),
        dd_total(F.col("db")).alias("n_b"),
        F.round(dd_ks(F.col("da"), F.col("db")), 6).alias("ks"),
    )


# ---------------------------------------------------------------------------
# q163: stratified negative sampling — in-domain contrastive partners
# (same-language negatives are the hard ones; cross-domain pairs are
# trivially separable). Per-stratum ranks come from the ONE global
# index minus broadcast stratum offsets — no per-stratum window sort
# that would funnel a giant stratum through a single task. The oracle
# re-derives ranks, probes, and the self-bump with identical
# arithmetic.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.sampling import (  # noqa: E402
    stratified_negative_samples,
)

_Q163_ROLL = _sql_roll_of("('2:' || CAST(doc_id AS VARCHAR))")


@query(
    "q163_stratified_negatives",
    oracle=f"""
    WITH ids AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (ORDER BY lang, doc_id) - 1 AS idx
      FROM documents
    ),
    b AS (SELECT lang, MIN(idx) AS lo, COUNT(*) AS n FROM ids GROUP BY lang),
    a AS (SELECT i.lang, i.doc_id AS anchor_id, i.idx, b.lo, b.n,
                 i.idx - b.lo AS r,
                 (1103515245 * {_Q163_ROLL} + 12345) % 2147483647 AS h
          FROM ids i JOIN b ON b.lang = i.lang
          WHERE b.n >= 2),
    e AS (SELECT lang, anchor_id, lo, n, r, h, j
          FROM a CROSS JOIN (VALUES (1), (2), (3)) t(j)),
    x AS (SELECT lang, anchor_id, j,
                 lo + CASE WHEN (h + j * 2654435761) % n = r
                           THEN ((h + j * 2654435761) % n + 1) % n
                           ELSE (h + j * 2654435761) % n END AS nidx
          FROM e)
    SELECT x.lang, x.anchor_id, x.j, ids.doc_id AS neg_id
    FROM x JOIN ids ON ids.idx = x.nidx
    """,
)
def q163_stratified_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return stratified_negative_samples(docs, "doc_id", "lang", k=3, seed=2)


# ===========================================================================
# Round-5 additions: driver-verified streaming fold, manifest-pruned
# scan, JPEG decode, melt/unpivot, quantile bins, canonical-URL dedup,
# session funnels, char-ngram LM, temperature resampling.
# ===========================================================================


# ---------------------------------------------------------------------------
# q164: the REAL streaming maintained-view runner, driver-hash-checked
# (VERDICT r4 item 4). Orders land in two waves (pre/post 1996-01-01);
# each wave is drained by `run_incremental_view` with Trigger.
# AvailableNow against the same checkpoint, so wave 2 folds ONLY the
# new files into the published parquet view (|view| + |delta| work —
# the q91 invariant, but through the actual foreachBatch shell +
# checkpoint + distributed parquet republish instead of a batch
# simulation). The oracle is the full recompute the two-wave fold
# must equal. Money folds in exact cents so partial-sum order can't
# shift a rounding boundary.
# ---------------------------------------------------------------------------

@query(
    "q164_stream_mv_replay",
    oracle="""
    SELECT o_custkey AS k,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q164_stream_mv_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.streaming.ops import (
        run_incremental_view,
        stream_from_files,
    )

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
    )
    cut = F.lit("1996-01-01").cast("date")
    tag = uuid.uuid4().hex[:8]
    # the published view keeps reading these files after we return, so
    # the scratch dir must outlive the query (OS-reclaimed /tmp)
    root = tempfile.mkdtemp(prefix=f"q164_{tag}_")
    land, ckpt = os.path.join(root, "landing"), os.path.join(root, "ckpt")
    view = f"q164_view_{tag}"
    schema = "k long, cents long"

    def build_delta(batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy("k").agg(
            F.sum("cents").alias("total_cents"),
            F.count(F.lit(1)).alias("n"),
        )

    for wave_filter in (F.col("o_orderdate") < cut, F.col("o_orderdate") >= cut):
        orders.where(wave_filter).select("k", "cents").write.mode(
            "append"
        ).parquet(land)
        run_incremental_view(
            stream_from_files(spark, land, schema),
            build_delta, ["k"], ["total_cents"], ckpt, view,
        )
    return spark.table(view).select("k", "total_cents", "n")


# ---------------------------------------------------------------------------
# q166: file-level zone-map pruning end-to-end — range-layout write,
# footer manifest, DataFrame-native keep-set (sources/io.py:
# prune_manifest_by_range), then a scan restricted to the kept files
# by a BROADCAST SEMI-JOIN on input_file_name (VERDICT r6 item 5):
# the kept set never funnels through a Python list on the driver, so
# the driver-hashed path is the one that survives a million-file
# manifest. I/O elimination comes from the pushed range predicate
# (parquet row-group stats skip non-qualifying files at read time);
# the manifest semi-join is the engine-level keep-set that also
# covers predicates parquet cannot push. The oracle is the
# full-table filtered aggregate: lossless pruning means skipping
# files cannot change the answer. `prune_files_by_range` remains as
# the convenience list face for small tables.
# ---------------------------------------------------------------------------

@query(
    "q166_manifest_prune",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders WHERE o_orderkey BETWEEN 1000 AND 50000
    """,
)
def q166_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.sources.io import (
        parquet_file_stats,
        prune_manifest_by_range,
    )

    lo, hi = 1_000, 50_000
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    root = tempfile.mkdtemp(prefix=f"q166_{uuid.uuid4().hex[:8]}_")
    ranged = os.path.join(root, "ranged")
    orders.repartitionByRange(8, "o_orderkey").write.parquet(ranged)

    manifest = parquet_file_stats(spark, ranged, ["o_orderkey"])
    kept = prune_manifest_by_range(
        manifest, "o_orderkey", float(lo), float(hi)
    ).select(
        F.element_at(F.split(F.col("file"), "/"), -1).alias("__file")
    )
    scan = (
        spark.read.parquet(ranged)
        .withColumn(
            "__file",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        )
        .join(F.broadcast(kept), "__file", "left_semi")
        .drop("__file")
    )
    return scan.where(F.col("o_orderkey").between(lo, hi)).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
    )


# ---------------------------------------------------------------------------
# q165: REAL compressed-image decode #2 — baseline JPEG
# (functions/jpeg.py: marker walk, DQT/DHT parsed from the file,
# canonical Huffman with byte unstuffing, DC prediction, dequantize,
# dezigzag, 2D IDCT). Payload blocks are DC-only so the decoded
# pixels are exactly 2*dc + 128 under the Annex K table — integer
# arithmetic the oracle recomputes — while AC-bearing blocks are
# pinned against a direct IDCT reference in pytest. Closes the JPEG
# part of the compressed-codec boundary (README): a real decoder, not
# a stub.
# ---------------------------------------------------------------------------

@query(
    "q165_jpeg_decode",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 4 + 1 AS wb,
                      length(text) % 3 + 1 AS hb
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(wb * 8 AS INTEGER) AS width,
           CAST(hb * 8 AS INTEGER) AS height,
           CAST(list_sum(list_transform(generate_series(0, wb * hb - 1),
                 b -> 64 * (2 * ((clen + 7 * b) % 64 - 32) + 128)))
             AS BIGINT) AS pixel_sum
    FROM g
    """,
)
def q165_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_jpeg_stats,
        with_jpeg_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_jpeg_stats(
            with_jpeg_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q167: MULTI-MEASURE pivot_longer — tidyr's pivot_longer with
# several value columns per emitted row (q39 already covers the
# single-measure native DataFrame.unpivot; Spark's unpivot cannot
# carry two measures per name). Implemented as the expression-side
# equivalent: explode an array of (name, measure1, measure2) structs
# — still one JVM Expand-shaped pass, no Python, no join. The oracle
# is the UNION ALL expansion the reshape is defined as.
# ---------------------------------------------------------------------------

@query(
    "q167_pivot_longer",
    oracle="""
    WITH w AS (
      SELECT o_custkey,
             SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS urgent_n,
             SUM(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS urgent_cents,
             SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
               AS high_n,
             SUM(CASE WHEN o_orderpriority = '2-HIGH'
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS high_cents,
             SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS other_n,
             SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS other_cents
      FROM orders GROUP BY 1
    )
    SELECT o_custkey, 'urgent' AS priority_class,
           CAST(urgent_n AS BIGINT) AS n_orders,
           CAST(urgent_cents AS BIGINT) AS total_cents FROM w
    UNION ALL
    SELECT o_custkey, 'high', CAST(high_n AS BIGINT),
           CAST(high_cents AS BIGINT) FROM w
    UNION ALL
    SELECT o_custkey, 'other', CAST(other_n AS BIGINT),
           CAST(other_cents AS BIGINT) FROM w
    """,
)
def q167_pivot_longer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    is_urgent = F.col("o_orderpriority") == "1-URGENT"
    is_high = F.col("o_orderpriority") == "2-HIGH"
    is_other = ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    wide = orders.groupBy("o_custkey").agg(
        F.sum(F.when(is_urgent, 1).otherwise(0)).alias("urgent_n"),
        F.sum(F.when(is_urgent, cents).otherwise(0)).alias("urgent_cents"),
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_n"),
        F.sum(F.when(is_high, cents).otherwise(0)).alias("high_cents"),
        F.sum(F.when(is_other, 1).otherwise(0)).alias("other_n"),
        F.sum(F.when(is_other, cents).otherwise(0)).alias("other_cents"),
    )
    melted = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("priority_class"),
                    F.col(f"{name}_n").alias("n_orders"),
                    F.col(f"{name}_cents").alias("total_cents"),
                )
                for name in ("urgent", "high", "other")
            ]
        )
    )
    return wide.select("o_custkey", melted.alias("m")).select(
        "o_custkey", "m.priority_class", "m.n_orders", "m.total_cents"
    )


# ---------------------------------------------------------------------------
# q168: equal-frequency (quantile) binning — feature bucketization for
# training pipelines, WITHOUT the single-task global NTILE window: the
# dense global index (operators/indexing.py, the q50 primitive) gives
# each row its rank distributed, and bin = floor(idx*k/n). The oracle
# re-derives the same ranks with ROW_NUMBER. Exact cents keep bin
# edges integer-stable.
# ---------------------------------------------------------------------------

@query(
    "q168_quantile_bins",
    oracle="""
    WITH b AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (
               ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderkey
             ) - 1 AS idx,
             COUNT(*) OVER () AS n_tot
      FROM orders
    )
    SELECT CAST(FLOOR(idx * 10.0 / n_tot) AS INT) AS bin_id,
           COUNT(*) AS n,
           MIN(cents) AS lo_cents,
           MAX(cents) AS hi_cents
    FROM b GROUP BY 1
    """,
)
def q168_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.indexing import with_global_index

    k = 10
    orders = table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    idx = with_global_index(orders, ["cents", "o_orderkey"], "idx")
    tot = idx.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        idx.join(F.broadcast(tot))
        .withColumn(
            "bin_id",
            F.floor(F.col("idx") * F.lit(float(k)) / F.col("n_tot")).cast("int"),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q169: canonical-URL dedup — the web-corpus cut every crawl pipeline
# runs before content dedup: mixed-case hosts, trailing slashes,
# utm_* tracking params, and fragments all collapse to one canonical
# key; survivor = min doc_id. Pure expression-side regex chain (JVM,
# whole-stage-codegen); the oracle mirrors it with RE2-safe patterns.
# ---------------------------------------------------------------------------

@query(
    "q169_canonical_url_dedup",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.Example.COM/docs/'
               || CAST(doc_id // 4 AS VARCHAR)
               || CASE doc_id % 4
                    WHEN 1 THEN '/'
                    WHEN 2 THEN '?utm_source=feed'
                    WHEN 3 THEN '#frag'
                    ELSE '' END AS url
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             lower(regexp_replace(regexp_replace(regexp_replace(url,
               '#.*$', ''), '\\?utm_[^#]*', ''), '/$', '')) AS canonical_url
      FROM u
    )
    SELECT canonical_url,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_variants
    FROM c GROUP BY 1
    """,
)
def q169_canonical_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    v = F.col("doc_id") % 4
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".Example.COM/docs/"),
        F.floor(F.col("doc_id") / 4).cast("long").cast("string"),
        F.when(v == 1, F.lit("/"))
        .when(v == 2, F.lit("?utm_source=feed"))
        .when(v == 3, F.lit("#frag"))
        .otherwise(F.lit("")),
    )
    canon = F.lower(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(url, r"#.*$", ""), r"\?utm_[^#]*", ""
            ),
            r"/$", "",
        )
    )
    return (
        docs.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


# ---------------------------------------------------------------------------
# q170: funnel DEPTH DISTRIBUTION — how many users reached each stage
# of view -> click -> purchase (strictly ordered, 24 h per-stage
# conversion window). q67 emits per-user conversion times via a
# filter-join cascade (one join per stage on the shrinking survivor
# set); this is the complementary formulation product analytics
# actually charts — chained CONDITIONAL AGGREGATIONS over the full
# events table, ending in a depth histogram. No global window;
# everything shuffles on the user key; timestamps compare in epoch
# micros (the suite's cross-engine convention).
# ---------------------------------------------------------------------------

_Q170_WIN_US = 86_400_000_000  # 24 h conversion window per stage


@query(
    "q170_session_funnel",
    oracle=f"""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    a AS (SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN us END) AS t1
          FROM e GROUP BY 1),
    b AS (SELECT e.user_id, a.t1,
                 MIN(CASE WHEN event_type = 'click' AND us > a.t1
                          AND us <= a.t1 + {_Q170_WIN_US}
                          THEN us END) AS t2
          FROM e JOIN a USING (user_id) GROUP BY 1, 2),
    c AS (SELECT e.user_id, b.t1, b.t2,
                 MIN(CASE WHEN event_type = 'purchase' AND us > b.t2
                          AND us <= b.t2 + {_Q170_WIN_US}
                          THEN us END) AS t3
          FROM e JOIN b USING (user_id) GROUP BY 1, 2, 3)
    SELECT CASE WHEN t3 IS NOT NULL THEN 3
                WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth,
           COUNT(*) AS n_users
    FROM c GROUP BY 1
    """,
)
def q170_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("us")
    )
    a = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("t1")
    )
    b = (
        ev.join(a, "user_id")
        .groupBy("user_id", "t1")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") > F.col("t1"))
                    & (F.col("us") <= F.col("t1") + F.lit(_Q170_WIN_US)),
                    F.col("us"),
                )
            ).alias("t2")
        )
    )
    c = (
        ev.join(b, "user_id")
        .groupBy("user_id", "t1", "t2")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") > F.col("t2"))
                    & (F.col("us") <= F.col("t2") + F.lit(_Q170_WIN_US)),
                    F.col("us"),
                )
            ).alias("t3")
        )
    )
    depth = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return c.groupBy(depth.alias("funnel_depth")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# q171: character-trigram LM score — the language-model face of
# gibberish detection (q124 scores word bigrams; this scores the raw
# character stream, which catches encoding garbage and keyboard mash
# that tokenizes into plausible "words"). Trigram counts live at
# vocabulary grain; the per-term single-log form keeps both engines
# summing identical doubles.
# ---------------------------------------------------------------------------

@query(
    "q171_char_ngram_lm",
    oracle="""
    WITH t AS (SELECT doc_id, lower(text) AS lt
               FROM documents WHERE length(text) >= 3),
    tr AS (SELECT doc_id,
                  unnest(list_transform(generate_series(1, length(lt) - 2),
                                        i -> substr(lt, i, 3))) AS tri
           FROM t),
    dt AS (SELECT doc_id, tri, COUNT(*) AS k FROM tr GROUP BY 1, 2),
    c AS (SELECT tri, SUM(k) AS n_tri FROM dt GROUP BY 1),
    tot AS (SELECT SUM(n_tri) AS n_tot FROM c)
    SELECT dt.doc_id,
           CAST(SUM(dt.k) AS BIGINT) AS n_tris,
           ROUND(-SUM(dt.k * (ln(c.n_tri) - ln(tot.n_tot))) / SUM(dt.k), 4)
             AS nll
    FROM dt JOIN c USING (tri) CROSS JOIN tot
    GROUP BY dt.doc_id
    """,
)
def q171_char_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents", spread=True)
    t = docs.select(
        "doc_id", F.lower(F.col("text")).alias("lt")
    ).where(F.length("text") >= 3)
    # char_ngrams, NOT substr-by-index: substr walks the UTF8 string
    # from byte 0 per call, making per-doc extraction O(L²) — the
    # round-7 skew probe measured 5.7x wall on power-law doc lengths
    # from exactly this line's previous form
    from redskins_rule_spark.operators.text import char_ngrams

    tris = t.select(
        "doc_id",
        F.explode(char_ngrams(F.col("lt"), 3)).alias("tri"),
    )
    dt = tris.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("k"))
    corpus = dt.groupBy("tri").agg(F.sum("k").alias("n_tri"))
    tot = corpus.agg(F.sum("n_tri").alias("n_tot"))
    return (
        dt.join(corpus, "tri")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tris"),
            F.round(
                -F.sum(
                    F.col("k") * (F.log(F.col("n_tri")) - F.log(F.col("n_tot")))
                )
                / F.sum("k"),
                4,
            ).alias("nll"),
        )
    )


# ---------------------------------------------------------------------------
# q172: temperature (power-law) resampling by language — the
# multilingual-pretraining mix op: upsample low-resource strata with
# weights n^alpha (alpha = 0.5), keeping the total budget. Expected
# copies e = T*w_l/n_l per doc; actual copies = floor(e) + one
# deterministic Bernoulli(frac(e)) draw from the shuffle-hash family.
# Language-grain weight table broadcasts; the explode is the output.
# ---------------------------------------------------------------------------

_Q172_ROLL = _sql_roll_of("('5:' || CAST(doc_id AS VARCHAR))")


@query(
    "q172_doc_subsample",
    oracle=f"""
    WITH n AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY 1),
    z AS (SELECT SUM(POW(n_l, 0.5)) AS z, SUM(n_l) AS t FROM n),
    e AS (SELECT lang, t * POW(n_l, 0.5) / z / n_l AS e
          FROM n CROSS JOIN z),
    d AS (SELECT doc_id, d.lang, e.e,
                 CAST((1103515245 * {_Q172_ROLL} + 12345) % 2147483647
                      AS DOUBLE) / 2147483647.0 AS u
          FROM documents d JOIN e USING (lang)),
    k AS (SELECT doc_id, lang,
                 CAST(FLOOR(e) AS BIGINT)
                   + CASE WHEN u < e - FLOOR(e) THEN 1 ELSE 0 END AS copies
          FROM d)
    SELECT doc_id, lang, unnest(generate_series(1, CAST(copies AS INT)))
             AS copy_no
    FROM k WHERE copies >= 1
    """,
)
def q172_doc_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.functions.hashing import MERSENNE_31
    from redskins_rule_spark.operators.sampling import shuffle_hash

    alpha = 0.5
    docs = table(spark, sf_dir, "documents")
    n = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    z = n.agg(
        F.sum(F.pow("n_l", alpha)).alias("z"), F.sum("n_l").alias("t")
    )
    e = n.join(F.broadcast(z)).select(
        "lang",
        (F.col("t") * F.pow("n_l", alpha) / F.col("z") / F.col("n_l")).alias(
            "e"
        ),
    )
    u = shuffle_hash("doc_id", 5).cast("double") / F.lit(float(MERSENNE_31))
    copies = (
        F.floor("e").cast("long")
        + F.when(u < F.col("e") - F.floor("e"), 1).otherwise(0)
    )
    return (
        docs.join(F.broadcast(e), "lang")
        .withColumn("copies", copies)
        .where(F.col("copies") >= 1)
        .select(
            "doc_id", "lang",
            F.explode(
                F.sequence(F.lit(1), F.col("copies").cast("int"))
            ).alias("copy_no"),
        )
    )


# ---------------------------------------------------------------------------
# q173: the streaming SKETCH-state runner, driver-hash-checked — the
# companion proof to q164 for `run_incremental_sketch_view`: per-key
# KMV states maintained across two landing waves through the real
# foreachBatch shell + checkpoint, folded by the semilattice merge.
# Because min-k merge is exactly lossless, the maintained estimate
# MUST equal the one-pass sketch of everything landed — so the oracle
# is q43b's one-pass KMV SQL verbatim (same k, same hash family).
# Waves split by event_id parity: the fold result is split-
# independent by the merge's associativity/commutativity.
# ---------------------------------------------------------------------------

@query(
    "q173_stream_sketch_replay",
    oracle=f"""
    WITH d AS (
        SELECT DISTINCT event_type,
               (1103515245 * {_sql_roll_of("CAST(user_id AS VARCHAR)")}
                + 12345) % 2147483647 AS h
        FROM events
        WHERE user_id IS NOT NULL
    ),
    r AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM d
    ),
    a AS (
        SELECT event_type, MAX(rn) AS n,
               MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
        FROM r WHERE rn <= {_KMV_K}
        GROUP BY event_type
    )
    SELECT event_type,
           CASE WHEN n < {_KMV_K} THEN CAST(n AS BIGINT)
                ELSE CAST(FLOOR(CAST({_KMV_K - 1} AS DOUBLE) * 2147483647
                                / CAST(hk AS DOUBLE)) AS BIGINT)
           END AS approx_users
    FROM a
    """,
)
def q173_stream_sketch_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_state,
    )
    from redskins_rule_spark.streaming.ops import (
        run_incremental_sketch_view,
        stream_from_files,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id"
    )
    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"q173_{tag}_")
    land, ckpt = os.path.join(root, "landing"), os.path.join(root, "ckpt")
    view = f"q173_view_{tag}"
    schema = "event_type string, user_id long"

    def build_states(batch_df: DataFrame) -> DataFrame:
        return kmv_state(
            batch_df, ["event_type"], "user_id", k=_KMV_K, out_col="kmv"
        )

    for wave_filter in (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1):
        ev.where(wave_filter).select("event_type", "user_id").write.mode(
            "append"
        ).parquet(land)
        run_incremental_sketch_view(
            stream_from_files(spark, land, schema),
            build_states, ["event_type"], "kmv",
            lambda a, b: kmv_merge(a, b, _KMV_K),
            ckpt, view,
        )
    return spark.table(view).select(
        "event_type",
        kmv_estimate(F.col("kmv"), _KMV_K).alias("approx_users"),
    )


# ---------------------------------------------------------------------------
# q174: SRP (hyperplane) LSH over embeddings — the LSH-bucketed
# candidate path for embedding near-dup, completing the similarity
# triad (exact blocked q22, IVF cells q30, PQ q97). Plane weights are
# small integers from the suite's LCG family, so BOTH engines compute
# bit-identical signatures (ordered dot folds); candidates collide on
# any 8-bit band (≈0.4% random collision per band) and are verified
# with exact cosine. Output is the LSH-candidate ∩ verified set — the
# banding recall curve is the documented contract, the determinism is
# what the driver hashes.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.similarity import (  # noqa: E402
    srp_lsh_pairs,
    srp_plane_weight,
)

_Q174_DIM = 64
_Q174_PLANES = 64
_Q174_BANDS = 8
_Q174_R = _Q174_PLANES // _Q174_BANDS
_Q174_W = "[" + ", ".join(
    "["
    + ", ".join(
        str(srp_plane_weight(j, i, _Q174_DIM)) for i in range(_Q174_DIM)
    )
    + "]"
    for j in range(_Q174_PLANES)
) + "]"
_Q174_KEYS = ", ".join(
    "("
    + " + ".join(
        f"bits[{b * _Q174_R + t + 1}] * {1 << t}" for t in range(_Q174_R)
    )
    + f") AS k{b}"
    for b in range(_Q174_BANDS)
)
_Q174_X = " UNION ALL ".join(
    f"SELECT vec_id, {b} AS band, k{b} AS band_key FROM k"
    for b in range(_Q174_BANDS)
)
_Q174_FOLD = (
    "list_reduce(list_transform(generate_series(1, {d}), j -> {a}[j] * {b}[j]), "
    "(acc, x) -> acc + x)"
)


@query(
    "q174_srp_lsh_pairs",
    oracle=f"""
    WITH w AS (SELECT {_Q174_W} AS pl),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id,
                 list_transform(pl, p -> CASE WHEN
                   list_reduce(list_transform(generate_series(1, {_Q174_DIM}),
                                              i -> v[i] * p[i]),
                               (acc, x) -> acc + x) >= 0
                   THEN 1 ELSE 0 END) AS bits
          FROM e CROSS JOIN w),
    k AS (SELECT vec_id, {_Q174_KEYS} FROM s),
    x AS ({_Q174_X}),
    p AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM x a JOIN x b ON a.band = b.band
                           AND a.band_key = b.band_key
                           AND a.vec_id < b.vec_id),
    pv AS (SELECT p.id_a, p.id_b, ea.v AS va, eb.v AS vb
           FROM p JOIN e ea ON ea.vec_id = p.id_a
                  JOIN e eb ON eb.vec_id = p.id_b)
    SELECT * FROM (
      SELECT id_a, id_b,
             ROUND({_Q174_FOLD.format(d=_Q174_DIM, a="va", b="vb")}
                   / (sqrt({_Q174_FOLD.format(d=_Q174_DIM, a="va", b="va")})
                    * sqrt({_Q174_FOLD.format(d=_Q174_DIM, a="vb", b="vb")})),
                   4) AS cos_sim
      FROM pv
    ) WHERE cos_sim >= 0.4
    """,
)
def q174_srp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings", spread=True)
    return srp_lsh_pairs(
        emb, "vec_id", "embedding", dim=_Q174_DIM,
        n_planes=_Q174_PLANES, bands=_Q174_BANDS, threshold=0.4,
    )


# ---------------------------------------------------------------------------
# q175: k-NN label-noise screening — the confident-learning-style
# curation pass: rows whose label disagrees with the majority label
# of their 5 nearest neighbors (cosine) are mislabel candidates.
# Candidates come from the exact blocked matmul (q22's operator, cos
# >= 0 halves the pair volume; every point here has >> k non-negative
# neighbors); ranks and votes are keyed windows with (rounded cos
# desc, id) / (count desc, label) tie pins so both engines elect the
# same neighbors and the same winner.
# ---------------------------------------------------------------------------

_Q175_COS = (
    "ROUND("
    "list_reduce(list_transform(generate_series(1, 64), j -> a.v[j] * b.v[j]), (acc, x) -> acc + x)"
    " / (sqrt(list_reduce(list_transform(generate_series(1, 64), j -> a.v[j] * a.v[j]), (acc, x) -> acc + x))"
    " * sqrt(list_reduce(list_transform(generate_series(1, 64), j -> b.v[j] * b.v[j]), (acc, x) -> acc + x))), 4)"
)


@query(
    "q175_knn_label_noise",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
               FROM embeddings),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_Q175_COS} AS cos_sim
          FROM e a JOIN e b ON a.vec_id < b.vec_id),
    p2 AS (SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0),
    sym AS (SELECT id_a AS id, id_b AS nb, cos_sim FROM p2
            UNION ALL
            SELECT id_b AS id, id_a AS nb, cos_sim FROM p2),
    top AS (SELECT id, nb FROM (
              SELECT id, nb,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY cos_sim DESC, nb) AS rn
              FROM sym) WHERE rn <= 5),
    v AS (SELECT t.id, e.label AS nb_label, COUNT(*) AS n
          FROM top t JOIN e ON e.vec_id = t.nb GROUP BY 1, 2),
    win AS (SELECT id, nb_label AS knn_label, n AS n_agree FROM (
              SELECT id, nb_label, n,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY n DESC, nb_label) AS vr
              FROM v) WHERE vr = 1)
    SELECT e.vec_id AS id, e.label, w.knn_label,
           CAST(w.n_agree AS BIGINT) AS n_agree,
           e.label <> w.knn_label AS is_suspect
    FROM e JOIN win w ON w.id = e.vec_id
    """,
)
def q175_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.similarity import knn_label_consistency

    emb = table(spark, sf_dir, "embeddings", spread=True)
    return knn_label_consistency(emb, "vec_id", "embedding", "label", k=5)


# ---------------------------------------------------------------------------
# q176: schema-evolution scan — two parquet generations of the same
# landing zone (generation 2 added a column) read as ONE mergeSchema
# frame; old rows surface the new column as NULL and aggregate under
# a 'legacy' bucket. The oracle recomputes from the source table with
# the same generation split. This drives the data-lake contract
# (old files readable forever, new columns lake-wide) through the
# driver hash, not just pytest.
# ---------------------------------------------------------------------------

@query(
    "q176_schema_evolution",
    oracle="""
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN 'legacy'
                ELSE o_orderpriority END AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY 1
    """,
)
def q176_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.sources.io import read_parquet_evolving

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderpriority",
    )
    lake = os.path.join(
        tempfile.mkdtemp(prefix=f"q176_{uuid.uuid4().hex[:8]}_"), "lake"
    )
    # generation 1 (odd keys): schema WITHOUT the priority column
    orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "cents"
    ).write.parquet(lake)
    # generation 2 (even keys): priority added
    orders.where(F.col("o_orderkey") % 2 == 0).write.mode("append").parquet(
        lake
    )
    merged = read_parquet_evolving(spark, lake)
    return merged.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("legacy")).alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# q177: OHLC resampling — the canonical time-series downsample
# (open/high/low/close per hourly bar and series). Open/close are
# rank-1 rows under the total order (us, event_id) ascending/
# descending — window formulation in BOTH engines rather than
# min_by/arg_min, whose composite-key tie semantics differ across
# engines. Everything is keyed by (series, bar): no global window.
# ---------------------------------------------------------------------------

@query(
    "q177_ohlc_bars",
    oracle="""
    WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id, value
               FROM events),
    b AS (SELECT event_type, us // 3600000000 AS bar_hour, us, event_id,
                 value,
                 ROW_NUMBER() OVER (PARTITION BY event_type, us // 3600000000
                                    ORDER BY us, event_id) AS rn_a,
                 ROW_NUMBER() OVER (PARTITION BY event_type, us // 3600000000
                                    ORDER BY us DESC, event_id DESC) AS rn_d
          FROM e)
    SELECT event_type, CAST(bar_hour AS BIGINT) AS bar_hour,
           ROUND(MAX(CASE WHEN rn_a = 1 THEN value END), 2) AS open,
           ROUND(MAX(value), 2) AS high,
           ROUND(MIN(value), 2) AS low,
           ROUND(MAX(CASE WHEN rn_d = 1 THEN value END), 2) AS close,
           COUNT(*) AS n
    FROM b GROUP BY 1, 2
    """,
)
def q177_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", epoch_us("ts").alias("us"), "event_id", "value"
    )
    bar = (F.col("us") / F.lit(3_600_000_000)).cast("long")
    b = ev.withColumn("bar_hour", bar)
    wa = Window.partitionBy("event_type", "bar_hour").orderBy("us", "event_id")
    wd = Window.partitionBy("event_type", "bar_hour").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    ranked = b.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return ranked.groupBy("event_type", "bar_hour").agg(
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 2).alias(
            "open"
        ),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 2).alias(
            "close"
        ),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q178: rolling median — robust smoothing over the trailing 7 events
# per user. Spark has no windowed percentile; the k-bounded frame
# collect + sort + EXPLICIT middle-element formula is the portable
# form (engines disagree on median interpolation wording, so both
# sides compute lower/upper middles identically). Frame is ROWS
# 6 PRECEDING — bounded state, keyed by user: scale-safe.
# ---------------------------------------------------------------------------

@query(
    "q178_rolling_median",
    oracle="""
    WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, value
               FROM events),
    r AS (SELECT user_id, us, event_id,
                 list_sort(list(value) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS s
          FROM e)
    SELECT user_id, us, event_id,
           CAST(len(s) AS INTEGER) AS n_win,
           ROUND(CASE WHEN len(s) % 2 = 1 THEN s[(len(s) + 1) // 2]
                      ELSE (s[len(s) // 2] + s[len(s) // 2 + 1]) / 2.0
                 END, 4) AS roll_med
    FROM r
    """,
)
def q178_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", epoch_us("ts").alias("us"), "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    s = F.array_sort(F.collect_list("value").over(w))
    n = F.size(s)
    med = F.when(
        n % 2 == 1, F.element_at(s, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(s, (n / 2).cast("int"))
            + F.element_at(s, (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return ev.select(
        "user_id", "us", "event_id",
        n.alias("n_win"),
        F.round(med, 4).alias("roll_med"),
    )


# ---------------------------------------------------------------------------
# q179: embedding-curation report — the embedding-side counterpart of
# q145's text-curation composition: k-NN label-noise screen (q175's
# operator) gates the corpus, survivors take a deterministic
# stratified train/val split (q117's multiplicative-hash convention),
# and the report is the per-label funnel every dataset card needs
# (raw -> suspects dropped -> split sizes). The oracle recomputes
# every stage, panels and votes included.
# ---------------------------------------------------------------------------

@query(
    "q179_embedding_curation",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
               FROM embeddings),
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_Q175_COS} AS cos_sim
          FROM e a JOIN e b ON a.vec_id < b.vec_id),
    p2 AS (SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0),
    sym AS (SELECT id_a AS id, id_b AS nb, cos_sim FROM p2
            UNION ALL
            SELECT id_b AS id, id_a AS nb, cos_sim FROM p2),
    top AS (SELECT id, nb FROM (
              SELECT id, nb,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY cos_sim DESC, nb) AS rn
              FROM sym) WHERE rn <= 5),
    v AS (SELECT t.id, e.label AS nb_label, COUNT(*) AS n
          FROM top t JOIN e ON e.vec_id = t.nb GROUP BY 1, 2),
    win AS (SELECT id, nb_label AS knn_label FROM (
              SELECT id, nb_label,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY n DESC, nb_label) AS vr
              FROM v) WHERE vr = 1),
    flagged AS (SELECT e.vec_id, e.label,
                       e.label <> w.knn_label AS is_suspect
                FROM e JOIN win w ON w.id = e.vec_id),
    split AS (SELECT vec_id, label, is_suspect,
                     CASE WHEN (vec_id * 2654435761) % 100 < 90
                          THEN 'train' ELSE 'val' END AS part
              FROM flagged)
    SELECT label,
           COUNT(*) AS n_raw,
           CAST(SUM(CASE WHEN is_suspect THEN 1 ELSE 0 END) AS BIGINT)
             AS n_suspect,
           CAST(SUM(CASE WHEN NOT is_suspect THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clean,
           CAST(SUM(CASE WHEN NOT is_suspect AND part = 'train'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN NOT is_suspect AND part = 'val'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_val
    FROM split GROUP BY label
    """,
)
def q179_embedding_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.similarity import knn_label_consistency

    emb = table(spark, sf_dir, "embeddings")
    flagged = knn_label_consistency(
        emb, "vec_id", "embedding", "label", k=5
    ).select("id", "label", "is_suspect")
    h = (F.col("id") * 2654435761) % 100
    part = F.when(h < 90, "train").otherwise("val")
    clean = ~F.col("is_suspect")
    return (
        flagged.withColumn("part", part)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.sum(F.when(F.col("is_suspect"), 1).otherwise(0)).alias(
                "n_suspect"
            ),
            F.sum(F.when(clean, 1).otherwise(0)).alias("n_clean"),
            F.sum(
                F.when(clean & (F.col("part") == "train"), 1).otherwise(0)
            ).alias("n_train"),
            F.sum(
                F.when(clean & (F.col("part") == "val"), 1).otherwise(0)
            ).alias("n_val"),
        )
    )


# ---------------------------------------------------------------------------
# q180: REAL compressed-image decode #3 — baseline 4:2:0 COLOR JPEG
# (functions/jpeg.py: 3-component YCbCr SOF0, Annex K luma+chroma
# tables parsed from the file, interleaved MCU scan with per-
# component DC prediction, dequantize + 2D IDCT, 2x2 chroma
# replication upsample, JFIF YCbCr->RGB with floor(x+0.5) rounding).
# Payload blocks are DC-only with chroma DCs restricted to multiples
# of 8, so every decoded component sample is an exact integer
# (Y = 2*dc_y + 128 under q0=16; chroma = 17*(dc/8) + 128 under
# q0=17) and the RGB conversion is deterministic float64 arithmetic
# both engines compute bit-identically — the oracle recomputes the
# per-channel pixel sums from the closed form. Closes the last codec
# seam closable in this container (VERDICT r5 item 3).
# ---------------------------------------------------------------------------

@query(
    "q180_jpeg_color",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 3 + 1 AS wm,
                      length(text) % 2 + 1 AS hm
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(wm * 16 AS INTEGER) AS width,
           CAST(hm * 16 AS INTEGER) AS height,
           CAST(list_sum(list_transform(generate_series(0, wm*hm*4 - 1),
             j -> 64 * LEAST(255, GREATEST(0, FLOOR(
               (2 * ((clen + 7*j) % 64 - 32) + 128)
               + 1.402 * (17 * ((clen + 3*(j//4)) % 5 - 2))
               + 0.5))))) AS BIGINT) AS r_sum,
           CAST(list_sum(list_transform(generate_series(0, wm*hm*4 - 1),
             j -> 64 * LEAST(255, GREATEST(0, FLOOR(
               (2 * ((clen + 7*j) % 64 - 32) + 128)
               - 0.344136 * (17 * ((clen + 7*(j//4)) % 5 - 2))
               - 0.714136 * (17 * ((clen + 3*(j//4)) % 5 - 2))
               + 0.5))))) AS BIGINT) AS g_sum,
           CAST(list_sum(list_transform(generate_series(0, wm*hm*4 - 1),
             j -> 64 * LEAST(255, GREATEST(0, FLOOR(
               (2 * ((clen + 7*j) % 64 - 32) + 128)
               + 1.772 * (17 * ((clen + 7*(j//4)) % 5 - 2))
               + 0.5))))) AS BIGINT) AS b_sum
    FROM g
    """,
)
def q180_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_jpeg_color_stats,
        with_jpeg_color_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_jpeg_color_stats(
            with_jpeg_color_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q181: exact substring-PASSAGE dedup (Lee et al., arXiv 2107.06499
# style) — q147's block dedup generalized to a configurable minimum
# match run: consecutive later-duplicate blocks merge into maximal
# spans (int_islands) and only spans of >= min_run blocks (here 2,
# i.e. >= 16-token repeated passages) are removed WHOLE; short
# incidental repeats survive. Oracle = q147's block/window pattern
# extended with the same gaps-and-islands span merge in SQL.
# ---------------------------------------------------------------------------

from redskins_rule_spark.operators.text import passage_dedup  # noqa: E402


@query(
    "q181_substring_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents
    ),
    nz AS (SELECT doc_id, tk FROM toks WHERE len(tk) > 0),
    blocks AS (
      SELECT doc_id, i AS idx,
             array_to_string(tk[i * 8 + 1 : i * 8 + 8], ' ') AS blk
      FROM nz, unnest(generate_series(0,
             CAST(ceil(len(tk) / 8.0) AS INTEGER) - 1)) AS u(i)
    ),
    marked AS (
      SELECT doc_id, idx, blk,
             ROW_NUMBER() OVER (PARTITION BY blk ORDER BY doc_id, idx) AS rn
      FROM blocks
    ),
    dups AS (SELECT doc_id, idx FROM marked WHERE rn > 1),
    isl AS (
      SELECT doc_id, idx,
             idx - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY idx) AS a
      FROM dups
    ),
    spans AS (
      SELECT doc_id, MIN(idx) AS s, MAX(idx) AS e
      FROM isl GROUP BY doc_id, a HAVING COUNT(*) >= 2
    ),
    rm AS (
      SELECT doc_id, u.i AS idx, TRUE AS is_rm
      FROM spans, unnest(generate_series(s, e)) AS u(i)
    ),
    fin AS (
      SELECT m.doc_id, m.idx, m.blk, r.is_rm
      FROM marked m
      LEFT JOIN rm r ON m.doc_id = r.doc_id AND m.idx = r.idx
    )
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           CAST(SUM(CASE WHEN is_rm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           COALESCE(string_agg(CASE WHEN is_rm IS NULL THEN blk END, ' '
                               ORDER BY idx), '') AS kept_text
    FROM fin GROUP BY doc_id
    """,
)
def q181_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return passage_dedup(docs, "doc_id", "text", block_tokens=8, min_run=2)


# ---------------------------------------------------------------------------
# q182: QUARANTINE decode through the driver hash (VERDICT r5 item 6)
# — a deterministic subset of the q165 JPEG payloads (doc_id % 7 = 0)
# is corrupted by truncation to its first half, then decoded with
# decode_stats_tolerant: good rows must hash to the q165 closed-form
# stats, corrupt rows must land in quarantine (NULL stats, flagged)
# WITHOUT killing the job — the at-scale contract the tolerant face
# exists for, now driver-verified end-to-end (the ADVICE r5 truncation
# hardening is what makes every truncation a catchable ValueError).
# ---------------------------------------------------------------------------

@query(
    "q182_quarantine_decode",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 4 + 1 AS wb,
                      length(text) % 3 + 1 AS hb
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           doc_id % 7 = 0 AS is_quarantined,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(wb * 8 AS INTEGER) END AS width,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(hb * 8 AS INTEGER) END AS height,
           CASE WHEN doc_id % 7 = 0 THEN NULL
                ELSE CAST(list_sum(list_transform(
                       generate_series(0, wb * hb - 1),
                       b -> 64 * (2 * ((clen + 7 * b) % 64 - 32) + 128)))
                     AS BIGINT)
           END AS pixel_sum
    FROM g
    """,
)
def q182_quarantine_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_stats_tolerant,
        with_jpeg_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())

    # dictionary fan-out (guide §8) with id_mod=7: the corruption
    # trigger is doc_id % 7 == 0 and the packed key preserves the
    # residue mod 7, so the dictionary corrupts exactly the keys whose
    # docs would have been corrupted
    def _pipeline(d: DataFrame) -> DataFrame:
        jpg = with_jpeg_payload(d, "text", "doc_id")
        corrupted = jpg.withColumn(
            "payload",
            F.when(
                (F.col("doc_id") % 7) == 0,
                F.expr("substring(payload, 1, CAST(length(payload)/2 AS INT))"),
            ).otherwise(F.col("payload")),
        )
        return decode_stats_tolerant(corrupted, "jpeg", "payload", "doc_id")

    stats = length_dict_stats(docs, "text", "doc_id", _pipeline, id_mod=7)
    return stats.select(
        "doc_id",
        F.col("decode_error").isNotNull().alias("is_quarantined"),
        "width",
        "height",
        "pixel_sum",
    )


# ---------------------------------------------------------------------------
# q183: streaming maintained-view RESTART recovery through the driver
# hash (ADVICE r5) — same counter-fold MV as q164, but the session
# temp view is DROPPED between landing waves to simulate a driver
# restart: the fold must bootstrap from the newest committed
# `_view/b<id>` parquet publish (strictly below the current batch id)
# instead of silently resetting, so the final view still equals the
# full-history aggregate. Three waves, two restarts, one checkpoint.
# ---------------------------------------------------------------------------

@query(
    "q183_stream_restart",
    oracle="""
    SELECT o_custkey AS k,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q183_stream_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.streaming.ops import (
        run_incremental_view,
        stream_from_files,
    )

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
    )
    c1 = F.lit("1994-01-01").cast("date")
    c2 = F.lit("1996-06-01").cast("date")
    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"q183_{tag}_")
    land, ckpt = os.path.join(root, "landing"), os.path.join(root, "ckpt")
    view = f"q183_view_{tag}"
    schema = "k long, cents long"

    def build_delta(batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy("k").agg(
            F.sum("cents").alias("total_cents"),
            F.count(F.lit(1)).alias("n"),
        )

    waves = (
        F.col("o_orderdate") < c1,
        (F.col("o_orderdate") >= c1) & (F.col("o_orderdate") < c2),
        F.col("o_orderdate") >= c2,
    )
    for i, wave_filter in enumerate(waves):
        if i:  # simulate a restart: the temp view dies with the session
            spark.catalog.dropTempView(view)
        orders.where(wave_filter).select("k", "cents").write.mode(
            "append"
        ).parquet(land)
        run_incremental_view(
            stream_from_files(spark, land, schema),
            build_delta, ["k"], ["total_cents"], ckpt, view,
        )
    return spark.table(view).select("k", "total_cents", "n")


# ---------------------------------------------------------------------------
# q184: SRP-LSH with SCALE-PARAMETERIZED banding (16-bit band keys) —
# the configuration the x100 probe showed is required once n
# approaches 2^r (random collisions are bands*n^2/2^(r+1); 8-bit
# bands OOM at 200k vectors, 16-bit bands run 100x data in 6.6x
# wall). Same plane family and verify as q174, twice the planes; the
# driver hash proves the wide-band signatures are bit-reproducible
# cross-engine too, so the scale remedy the banding guard recommends
# is itself oracle-verified.
# ---------------------------------------------------------------------------

def _srp_oracle(planes: int, bands: int, dim: int, threshold: float) -> str:
    r = planes // bands
    w = "[" + ", ".join(
        "[" + ", ".join(
            str(srp_plane_weight(j, i, dim)) for i in range(dim)
        ) + "]"
        for j in range(planes)
    ) + "]"
    keys = ", ".join(
        "(" + " + ".join(
            f"bits[{b * r + t + 1}] * {1 << t}" for t in range(r)
        ) + f") AS k{b}"
        for b in range(bands)
    )
    x = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, k{b} AS band_key FROM k"
        for b in range(bands)
    )
    fold = (
        "list_reduce(list_transform(generate_series(1, {d}), "
        "j -> {a}[j] * {b}[j]), (acc, x) -> acc + x)"
    )
    return f"""
    WITH w AS (SELECT {w} AS pl),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    s AS (SELECT vec_id,
                 list_transform(pl, p -> CASE WHEN
                   list_reduce(list_transform(generate_series(1, {dim}),
                                              i -> v[i] * p[i]),
                               (acc, x) -> acc + x) >= 0
                   THEN 1 ELSE 0 END) AS bits
          FROM e CROSS JOIN w),
    k AS (SELECT vec_id, {keys} FROM s),
    x AS ({x}),
    p AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM x a JOIN x b ON a.band = b.band
                           AND a.band_key = b.band_key
                           AND a.vec_id < b.vec_id),
    pv AS (SELECT p.id_a, p.id_b, ea.v AS va, eb.v AS vb
           FROM p JOIN e ea ON ea.vec_id = p.id_a
                  JOIN e eb ON eb.vec_id = p.id_b)
    SELECT * FROM (
      SELECT id_a, id_b,
             ROUND({fold.format(d=dim, a="va", b="vb")}
                   / (sqrt({fold.format(d=dim, a="va", b="va")})
                    * sqrt({fold.format(d=dim, a="vb", b="vb")})),
                   4) AS cos_sim
      FROM pv
    ) WHERE cos_sim >= {threshold}
    """


@query("q184_srp_wide", oracle=_srp_oracle(128, 8, 64, 0.4))
def q184_srp_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings", spread=True)
    return srp_lsh_pairs(
        emb, "vec_id", "embedding", dim=64,
        n_planes=128, bands=8, threshold=0.4,
    )


# ---------------------------------------------------------------------------
# q185: ANN-SOURCED label-noise screen (VERDICT r6 item 1) — the
# documented 100 TB swap for q175's exact-kNN candidate source,
# driven through the driver hash instead of living as prose: the
# SAME vote stages as q175, fed by `srp_lsh_pairs` with AUTO-BANDING
# (n_planes=None derives bits/band from `srp_auto_band_bits`, the
# 16n-collision cost target — VERDICT r7 item 3's taper — so this
# one registered query runs unchanged from 500 vectors to the x100
# probe's 200k, where r widens 8 -> 16 and the candidate volume
# stays LINEAR in n).
#
# ORACLE COUPLING (ADVICE r7): the SQL below replays the signature
# with a FIXED 64 planes (8 bands x 8 bits), which matches the
# engine exactly while srp_auto_band_bits(n, bands=8) == 8, i.e.
# n <= 1024 — both gate fixtures (sf0.001 and sf0.01) hold 500
# embeddings. At sf0.1 (n=2000) and beyond the engine widens r, so
# this differential is GATE-SCALE-BOUND by design (exclude it from
# differentials on larger/skew fixtures); the coupling is pinned by
# tests/test_similarity_text.py::test_srp_auto_band_bits_taper.
# Neighbors are band-colliding vectors with verified cosine >= 0.1
# (strictly positive threshold: ±0.0 never reaches the rank window,
# whose cross-engine ordering at signed zero is unspecified);
# per-id top-5 under the exact path's total order (cos desc, nb
# asc), then the (count desc, label asc)-pinned majority vote. Ids
# with no surviving candidate are absent — the banding-recall
# contract. The oracle replays the identical planes/bands/votes.
# ---------------------------------------------------------------------------

@query(
    "q185_ann_label_noise",
    oracle=f"""
    WITH p2 AS ({_srp_oracle(64, 8, 64, 0.1)}),
    e AS (SELECT vec_id, label FROM embeddings),
    sym AS (SELECT id_a AS id, id_b AS nb, cos_sim FROM p2
            UNION ALL
            SELECT id_b AS id, id_a AS nb, cos_sim FROM p2),
    top AS (SELECT id, nb FROM (
              SELECT id, nb,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY cos_sim DESC, nb) AS rn
              FROM sym) WHERE rn <= 5),
    v AS (SELECT t.id, e2.label AS nb_label, COUNT(*) AS n
          FROM top t JOIN e e2 ON e2.vec_id = t.nb GROUP BY 1, 2),
    win AS (SELECT id, nb_label AS knn_label, n AS n_agree FROM (
              SELECT id, nb_label, n,
                     ROW_NUMBER() OVER (PARTITION BY id
                                        ORDER BY n DESC, nb_label) AS vr
              FROM v) WHERE vr = 1)
    SELECT e.vec_id AS id, e.label, w.knn_label,
           CAST(w.n_agree AS BIGINT) AS n_agree,
           e.label <> w.knn_label AS is_suspect
    FROM e JOIN win w ON w.id = e.vec_id
    """,
)
def q185_ann_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.similarity import (
        knn_label_consistency,
    )

    emb = table(spark, sf_dir, "embeddings", spread=True)
    pairs = srp_lsh_pairs(
        emb, "vec_id", "embedding", dim=64,
        n_planes=None, bands=8, threshold=0.1,
    )
    return knn_label_consistency(
        emb, "vec_id", "embedding", "label", k=5, candidates=pairs
    )


# ---------------------------------------------------------------------------
# q186: REAL compressed-image decode #4 — PROGRESSIVE (SOF2)
# grayscale JPEG (VERDICT r6 item 3, the last codec seam closable in
# pure Python here). The payload's four-scan script exercises both
# progressive mechanisms — spectral selection (DC scan + full AC
# band) and successive approximation (Al=1 first passes, refinement
# scans down to Al=0) — and the decoder accumulates coefficients
# across scans before one dequantize+IDCT. Blocks are DC-only with a
# DIFFERENT dc step (9) and geometry family than the baseline q165
# payload, so pixels stay on the 2*dc + 128 closed form the oracle
# recomputes while the two differentials share no bytes. pytest pins
# progressive decode == baseline decode on AC-bearing blocks, and
# the corruption sweeps (every truncation, byte-flip fuzz) extend to
# this profile.
# ---------------------------------------------------------------------------

@query(
    "q186_jpeg_progressive",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 5 + 1 AS wb,
                      length(text) % 2 + 1 AS hb
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(wb * 8 AS INTEGER) AS width,
           CAST(hb * 8 AS INTEGER) AS height,
           CAST(list_sum(list_transform(generate_series(0, wb * hb - 1),
                 b -> 64 * (2 * ((clen + 9 * b) % 64 - 32) + 128)))
             AS BIGINT) AS pixel_sum
    FROM g
    """,
)
def q186_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_jpeg_progressive_stats,
        with_jpeg_progressive_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_jpeg_progressive_stats(
            with_jpeg_progressive_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q187/q188: REAL video-container parse — ISO BMFF (MP4). The seam
# the multimodal family documented ("video beyond GIF needs ffmpeg")
# splits in two: the CONTAINER half (box grammar, sample tables,
# sample extraction from mdat) is implementable from the public
# ISO/IEC 14496-12 spec in pure Python (functions/mp4.py) and is now
# real; only codec-level access-unit DECODE (H.264/AAC) remains a
# seam. synth_mp4 derives every field from character length, so the
# oracle predicts container byte length (a closed-form box-size
# ledger), durations, track/sample counts (q187) and per-sample
# lengths + byte sums sliced out of mdat by the resolved
# stsc/stsz/stco table (q188) — proving the extraction reads real
# bytes, not metadata.
# ---------------------------------------------------------------------------

@query(
    "q187_mp4_meta",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 7 + 2 AS nv,
                      CASE WHEN length(text) % 3 = 0
                           THEN length(text) % 11 + 3 ELSE 0 END AS na
               FROM documents WHERE text IS NOT NULL),
         s AS (SELECT doc_id, clen, nv, na,
                      list_sum(list_transform(generate_series(0, nv - 1),
                            i -> (clen + 3 * i) % 50 + 4)) AS sv,
                      CASE WHEN na > 0 THEN list_sum(list_transform(
                            generate_series(0, na - 1),
                            i -> (clen + 5 * i) % 17 + 1)) ELSE 0 END AS sa
               FROM g)
    SELECT doc_id,
           CAST(525 + 4 * nv + sv
                + CASE WHEN na > 0 THEN 373 + 4 * na + sa ELSE 0 END
             AS BIGINT) AS byte_len,
           'isom' AS major_brand,
           CAST(CASE WHEN 23 * na > 40 * nv THEN 23 * na ELSE 40 * nv END
             AS BIGINT) AS duration_ms,
           CAST(CASE WHEN na > 0 THEN 2 ELSE 1 END AS INTEGER) AS n_tracks,
           CAST(nv AS INTEGER) AS n_video_samples,
           CAST(na AS INTEGER) AS n_audio_samples,
           CAST(sv + sa AS BIGINT) AS mdat_bytes
    FROM s
    """,
)
def q187_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_mp4_meta,
        with_mp4_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_mp4_meta(
            with_mp4_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


@query(
    "q188_mp4_frames",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 7 + 2 AS nv
               FROM documents WHERE text IS NOT NULL),
         fr AS (SELECT doc_id, clen,
                       unnest(generate_series(0, nv - 1)) AS f
                FROM g)
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST((clen + 3 * f) % 50 + 4 AS INTEGER) AS frame_len,
           CAST(((clen + 3 * f) % 50 + 4) * ((clen + 7 * f) % 251)
             AS BIGINT) AS frame_sum
    FROM fr WHERE f % 2 = 0
    """,
)
def q188_mp4_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        sample_mp4_frames,
        with_mp4_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: sample_mp4_frames(
            with_mp4_payload(d, "text", "doc_id"), "payload", "doc_id", handler="vide", stride=2
        ),
        how="inner",
    )


# ---------------------------------------------------------------------------
# q189/q190: REAL compressed-audio framing — MPEG-1 Layer III (MP3).
# Same seam-split as q187's MP4: the FRAMING half (ID3v2 skip, sync
# words, bitrate/samplerate tables, the 144·bitrate/rate+pad length
# formula) is public ISO/IEC 11172-3 header layout and now real pure
# Python (functions/mp3.py); Layer III audio DECODE (huffman/IMDCT)
# remains the seam. synth_mp3 derives everything from character
# length — CBR stream when clen % 4 == 0, VBR otherwise — so the
# oracle predicts stream size (ID3 + Σ spec frame lengths), duration
# (1152-sample frames at 32 kHz → exactly 36 ms each), bitrate sums
# and the VBR flag (q189), and per-frame body lengths + byte sums
# sliced out of the stream (q190).
# ---------------------------------------------------------------------------

_MP3_KBPS_SQL = "[32,40,48,56,64,80,96,112,128,160,192,224,256,320]"


@query(
    "q189_mp3_meta",
    oracle=f"""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 13 + 2 AS n,
                      CASE WHEN length(text) % 4 = 0 THEN 0 ELSE 1 END AS step
               FROM documents WHERE text IS NOT NULL),
         k AS (SELECT doc_id, clen, n, step,
                      list_transform(generate_series(0, n - 1), i ->
                        list_extract({_MP3_KBPS_SQL},
                                     (clen + step * i) % 14 + 1)) AS kbps
               FROM g)
    SELECT doc_id,
           CAST(10 + clen % 29
                + list_sum(list_transform(kbps, b -> 9 * b // 2))
                + list_sum(list_transform(generate_series(0, n - 1),
                                          i -> (clen + i) % 2))
             AS BIGINT) AS byte_len,
           CAST(10 + clen % 29 AS INTEGER) AS id3_bytes,
           CAST(n AS INTEGER) AS n_frames,
           CAST(32000 AS INTEGER) AS sample_rate,
           CAST(36 * n AS BIGINT) AS duration_ms,
           CAST(list_sum(kbps) AS BIGINT) AS sum_kbps,
           (step = 1) AS is_vbr
    FROM k
    """,
)
def q189_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_mp3_stats,
        with_mp3_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_mp3_stats(
            with_mp3_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


@query(
    "q190_mp3_frames",
    oracle=f"""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 13 + 2 AS n,
                      CASE WHEN length(text) % 4 = 0 THEN 0 ELSE 1 END AS step
               FROM documents WHERE text IS NOT NULL),
         fr AS (SELECT doc_id, clen, step,
                       unnest(generate_series(0, n - 1)) AS f
                FROM g),
         b AS (SELECT doc_id, f,
                      9 * list_extract({_MP3_KBPS_SQL},
                                       (clen + step * f) % 14 + 1) // 2
                        + (clen + f) % 2 - 4 AS blen,
                      (clen + 13 * f) % 251 AS fill
               FROM fr WHERE f % 3 = 0)
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST(blen AS INTEGER) AS body_len,
           CAST(blen * fill AS BIGINT) AS body_sum
    FROM b
    """,
)
def q190_mp3_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        sample_mp3_frames,
        with_mp3_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: sample_mp3_frames(
            with_mp3_payload(d, "text", "doc_id"), "payload", "doc_id", stride=3
        ),
        how="inner",
    )


# ---------------------------------------------------------------------------
# q191: DSIR-style data selection — hashed n-gram importance
# resampling weights (Xie et al., NeurIPS 2023; public method). The
# target domain is the corpus's English subset (lang = 'en'); every
# document is scored by the log-ratio of Laplace-smoothed hashed-
# bucket models target-vs-raw over its unigram+bigram features. The
# bucket hash is the cross-engine rolling-hash family, so bucket
# assignment matches bit-for-bit; single-log-per-term summation keeps
# the 4-decimal rounding contract (the q124 pattern).
# ---------------------------------------------------------------------------

_Q191_ROLL = _sql_roll_of("('7:' || g)")


@query(
    "q191_dsir_weights",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang,
                         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                     t -> t <> '') AS w
                  FROM documents),
         gr AS (SELECT doc_id, lang,
                       unnest(w || list_transform(generate_series(2, len(w)),
                                    i -> w[i-1] || ' ' || w[i])) AS g
                FROM toks WHERE len(w) >= 1),
         db AS (SELECT doc_id, (lang = 'en') AS tgt,
                       {_Q191_ROLL} % 256 AS b, COUNT(*) AS k
                FROM gr GROUP BY 1, 2, 3),
         hist AS (SELECT b, SUM(k) AS nr,
                         SUM(CASE WHEN tgt THEN k ELSE 0 END) AS nt
                  FROM db GROUP BY b),
         tot AS (SELECT SUM(nr) AS n_raw, SUM(nt) AS n_tgt FROM hist),
         sc AS (SELECT db.doc_id, SUM(db.k) AS n_grams,
                       SUM(db.k * (ln(hist.nt + 1) - ln(hist.nr + 1))) AS s
                FROM db JOIN hist USING (b) GROUP BY 1)
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           ROUND(s + n_grams * (ln(n_raw + 256) - ln(n_tgt + 256)), 4) + 0.0
             AS log_importance,
           (ROUND(s + n_grams * (ln(n_raw + 256) - ln(n_tgt + 256)), 4) > 0)
             AS keep
    FROM sc CROSS JOIN tot
    """,
)
def q191_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.text import dsir_importance

    docs = table(spark, sf_dir, "documents", spread=True)
    return dsir_importance(
        docs, "doc_id", "text", F.col("lang") == "en", n_buckets=256, seed=7
    )


# ---------------------------------------------------------------------------
# q192: Gopher-style rule-based quality filtering (Rae et al. 2021
# §A1.1; the C4/RefinedWeb rule core — public method). Each rule is a
# named boolean; the keep decision is their AND. Every threshold is
# INTEGER arithmetic (10·symbols ≤ k·words etc.), so no float
# boundary can flip a rule cross-engine — the whole stage is
# expression-only map-side work that fuses into the scan.
# ---------------------------------------------------------------------------

@query(
    "q192_gopher_rules",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> '') AS w,
             string_split(text, chr(10)) AS ls
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT doc_id,
             len(w) AS n_words,
             len(ls) AS n_lines,
             coalesce(list_sum(list_transform(w, t -> length(t))), 0) AS wc,
             len(list_filter(ls, l -> regexp_matches(l, '^\\s*[-*•]'))) AS bl,
             len(list_filter(ls, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS el,
             (length(text) - length(replace(text, '#', '')))
               + (length(text) - length(replace(text, '...', ''))) // 3 AS sym,
             len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS aw,
             len(list_filter(['the','and','of','to','a','in','is','it'],
                             s -> list_contains(list_transform(w, t -> lower(t)), s))) AS sk
      FROM d)
    SELECT doc_id,
           CAST(n_words AS INTEGER) AS n_words,
           CAST(n_lines AS INTEGER) AS n_lines,
           (n_words >= 5 AND n_words <= 100000) AS words_ok,
           (wc >= 3 * n_words AND wc <= 10 * n_words) AS mean_len_ok,
           (10 * sym <= n_words) AS symbol_ok,
           (10 * bl <= 9 * n_lines) AS bullet_ok,
           (10 * el <= 3 * n_lines) AS ellipsis_ok,
           (5 * aw >= 4 * n_words) AS alpha_ok,
           (sk >= 2) AS stop_ok,
           ((n_words >= 5 AND n_words <= 100000)
            AND (wc >= 3 * n_words AND wc <= 10 * n_words)
            AND (10 * sym <= n_words)
            AND (10 * bl <= 9 * n_lines)
            AND (10 * el <= 3 * n_lines)
            AND (5 * aw >= 4 * n_words)
            AND (sk >= 2)) AS gopher_pass
    FROM m
    """,
)
def q192_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.text import gopher_filter

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    from redskins_rule_spark.operators.text import LANG_PROFILES

    return gopher_filter(
        docs, "text", min_words=5, required_stopwords=LANG_PROFILES["en"]
    ).select(
        "doc_id", "n_words", "n_lines", "words_ok", "mean_len_ok",
        "symbol_ok", "bullet_ok", "ellipsis_ok", "alpha_ok", "stop_ok",
        "gopher_pass",
    )


# ---------------------------------------------------------------------------
# q193: streaming ingestion dedup replay — the exactly-once-per-key
# front door of a training-data pipeline, driver-verified end-to-end
# (streaming_dedup was pytest-only before this). Two landing waves
# with BOTH duplicate classes a real feed produces: intra-batch
# (wave 1 re-appends its event_id % 5 == 0 rows) and cross-restart
# (wave 2 re-delivers the whole % 3 == 1 residue already seen in
# wave 1). Each wave is a separate AvailableNow drain of
# dropDuplicatesWithinWatermark state against ONE checkpoint + file
# sink, so surviving the differential proves (a) in-batch dedup, (b)
# dedup state recovered across the restart, (c) the file sink's
# transaction log kept replays exactly-once. The oracle is the plain
# batch GROUP BY over each event exactly once — any double-kept or
# dropped event shifts a count or a cent sum.
# ---------------------------------------------------------------------------

@query(
    "q193_stream_dedup_replay",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events GROUP BY 1
    """,
)
def q193_stream_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.streaming.ops import (
        run_available_now_to_files,
        scaled_state_partitions,
        stream_from_files,
        streaming_dedup,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"q193_{tag}_")
    land = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "deduped")
    schema = "event_id long, ts timestamp, event_type string, cents long"

    wave1 = ev.where(F.col("event_id") % 3 < 2)
    wave2 = ev.where(F.col("event_id") % 3 >= 1)  # re-delivers residue 1
    for wave in (
        wave1.unionAll(wave1.where(F.col("event_id") % 5 == 0)),  # in-batch dups
        wave2,
    ):
        wave.write.mode("append").parquet(land)
        with scaled_state_partitions(spark, land):
            run_available_now_to_files(
                streaming_dedup(
                    stream_from_files(spark, land, schema),
                    ["event_id"],
                    ts_col="ts",
                    watermark="99999 days",
                ),
                ckpt,
                out,
            )
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q194: SemDeDup — semantic dedup of an embedding corpus (Abbas et
# al. 2023; public method): cluster, then remove all-but-one of each
# near-identical group WITHIN a cluster, never comparing across
# clusters. Cells are the pinned axis-aligned assignment q30's IVF
# oracle established (argmax v[i]/‖v‖, 6dp, ties to higher index) so
# both engines partition identically; near-dups are planted by
# appending a deterministically perturbed copy of every 7th vector
# (v[j] + 0.01·(j mod 3), id + 1,000,000) — the copy usually lands in
# its source's cell and dies under the smaller-id-survives rule, plus
# 14 natural pairs at sf0.01 cross the 0.45 rounded-cosine threshold.
# The operator's hot-cell guard (max_cell_rows) is the §11.63
# checked-contract pattern: one n_cells-row aggregate, raise with the
# remedy before a hot cell can absorb the cluster quadratically.
# ---------------------------------------------------------------------------

@query(
    "q194_semdedup",
    oracle=f"""
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         dup AS (SELECT vec_id + 1000000 AS vec_id,
                        list_transform(generate_series(1, len(v)),
                                       j -> v[j] + 0.01 * ((j - 1) % 3)) AS v
                 FROM base WHERE vec_id % 7 = 0),
         e AS (SELECT * FROM base UNION ALL SELECT * FROM dup),
         cells AS (SELECT vec_id, v, {_SQL_CELL_SIM} FROM e),
         assigned AS (
           SELECT vec_id, v, CASE{_SQL_CELL_PICK} END AS cell
           FROM (SELECT cells.*, greatest(s0, s1, s2, s3) AS best FROM cells)),
         killed AS (
           SELECT DISTINCT b.vec_id
           FROM assigned a JOIN assigned b
             ON a.cell = b.cell AND a.vec_id < b.vec_id
           WHERE ROUND(
                   list_reduce(list_transform(generate_series(1, len(a.v)),
                               j -> a.v[j] * b.v[j]), (acc, x) -> acc + x)
                   / (sqrt(list_reduce(list_transform(a.v, x -> x * x),
                           (acc, x) -> acc + x))
                    * sqrt(list_reduce(list_transform(b.v, x -> x * x),
                           (acc, x) -> acc + x))), 4) >= 0.45)
    SELECT a.vec_id,
           CAST(a.cell AS INTEGER) AS cell,
           (k.vec_id IS NULL) AS survived
    FROM assigned a LEFT JOIN killed k USING (vec_id)
    """,
)
def q194_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.similarity import semdedup_survivors

    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dup = base.where(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.expr("transform(v, (x, j) -> x + 0.01 * (j % 3))").alias("v"),
    )
    corpus = base.unionByName(dup)
    return semdedup_survivors(
        corpus, "vec_id", "v", n_cells=4, threshold=0.45
    )


# ---------------------------------------------------------------------------
# q195: per-document token entropy + type-token ratio — the
# repetition/gibberish quality signal pair (template spam = low H at
# normal length; noise = TTR ≈ 1). Single-log-per-term (ln n −
# Σ k·ln k / n) under the q124 4-decimal contract; TTR exact-rational.
# Two-level aggregation, nothing leaves the document grain.
# ---------------------------------------------------------------------------

@query(
    "q195_token_entropy",
    oracle="""
    WITH toks AS (SELECT doc_id,
                         unnest(list_filter(
                           string_split_regex(lower(text), '[^a-z]+'),
                           t -> t <> '')) AS t
                  FROM documents WHERE text IS NOT NULL),
         dt AS (SELECT doc_id, t, COUNT(*) AS k FROM toks GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(ln(SUM(k)) - SUM(k * ln(k)) / SUM(k), 4) + 0.0 AS entropy,
           ROUND(COUNT(*) / CAST(SUM(k) AS DOUBLE), 4) AS ttr
    FROM dt GROUP BY doc_id
    """,
)
def q195_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.text import token_entropy

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return token_entropy(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# q196: streaming CDC latest-wins replay — drives the LAST un-driver-
# verified stateful face (stateful_cdc_latest, applyInPandasWithState)
# through the oracle. Two landing waves split by event-id parity; the
# second wave RE-DELIVERS every (even, %11==0) change already applied
# in wave 1 — the at-least-once upstream a CDC pipeline actually
# faces — so the hash proves (ts,event_id)-ordered merge never
# regresses on replays, state recovers across the restart, and the
# update-mode upsert log (foreachBatch append, file sinks reject
# update directly) reconstructs the exact snapshot via latest-
# n_changes per key. n_changes counts DELIVERED rows (including
# replays), mirrored exactly by the oracle's UNION ALL.
# ---------------------------------------------------------------------------

@query(
    "q196_stream_cdc_replay",
    oracle="""
    WITH delivered AS (
      SELECT * FROM events
      UNION ALL
      SELECT * FROM events WHERE event_id % 2 = 0 AND event_id % 11 = 0
    ),
    ranked AS (
      SELECT user_id, event_type, value, epoch_us(ts) AS ts_us, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_changes
      FROM delivered)
    SELECT user_id,
           CASE WHEN event_type = 'error' THEN NULL
                ELSE ROUND(value, 2) END AS current_value,
           ts_us AS updated_at_us,
           CAST(n_changes AS BIGINT) AS n_changes,
           (event_type = 'error') AS deleted
    FROM ranked WHERE rn = 1
    """,
)
def q196_stream_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.streaming.ops import (
        run_available_now_update_appends,
        scaled_state_partitions,
        stateful_cdc_latest,
        stream_from_files,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"q196_{tag}_")
    land = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "upserts")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    waves = (
        ev.where(F.col("event_id") % 2 == 0),
        ev.where(F.col("event_id") % 2 == 1).unionByName(
            # at-least-once upstream: re-deliver already-applied changes
            ev.where((F.col("event_id") % 2 == 0) & (F.col("event_id") % 11 == 0))
        ),
    )
    for wave in waves:
        wave.write.mode("append").parquet(land)
        with scaled_state_partitions(spark, land):
            run_available_now_update_appends(
                stateful_cdc_latest(stream_from_files(spark, land, schema)),
                ckpt,
                out,
            )
    log = spark.read.parquet(out)
    # latest upsert per key IS the snapshot: n_changes is monotone
    return log.groupBy("user_id").agg(
        F.expr("max_by(current_value, n_changes)").alias("current_value"),
        F.expr("max_by(updated_at_us, n_changes)").alias("updated_at_us"),
        F.max("n_changes").alias("n_changes"),
        F.expr("max_by(deleted, n_changes)").alias("deleted"),
    )


# ---------------------------------------------------------------------------
# q197: streaming point-in-time enrichment replay — the stream face
# of q135 (stateful_pit_enrich, applyInPandasWithState append mode)
# through the oracle. 'view' events are the dimension versions, all
# other events the facts; two AvailableNow drains split BY EVENT TIME
# (cut 2024-01-16), which pins at-arrival semantics to exact
# event-time PIT semantics: every dim version a wave's facts can bind
# (dim_ts <= fact_ts < cut) already landed in that wave or earlier,
# so the hash-green differential proves the same-batch dims-first
# ordering, the bisect version binding, and state recovery across the
# restart all reproduce the batch operator. max_versions is set
# effectively unbounded here — the oracle needs untrimmed semantics;
# the bounded-state trim contract is pinned by pytest instead.
# ---------------------------------------------------------------------------

@query(
    "q197_stream_pit_replay",
    oracle="""
    WITH dims AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE event_type = 'view'),
    facts AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE event_type <> 'view'),
    bound AS (
      SELECT f.user_id, f.event_id, f.ts_us, f.value AS fact_value,
             d.value AS dim_value, d.ts_us AS dim_ts_us,
             ROW_NUMBER() OVER (PARTITION BY f.user_id, f.event_id
                                ORDER BY d.ts_us DESC, d.event_id DESC) AS rn
      FROM facts f LEFT JOIN dims d
        ON d.user_id = f.user_id AND d.ts_us <= f.ts_us)
    SELECT user_id, event_id, ts_us,
           ROUND(fact_value, 2) AS fact_value,
           ROUND(dim_value, 2) AS dim_value,
           dim_ts_us
    FROM bound WHERE rn = 1
    """,
)
def q197_stream_pit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.streaming.ops import (
        run_available_now_to_files,
        scaled_state_partitions,
        stateful_pit_enrich,
        stream_from_files,
    )

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        (F.col("event_type") == "view").alias("is_dim"),
        "value",
    )
    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"q197_{tag}_")
    land = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "enriched")
    schema = (
        "user_id long, event_id long, ts timestamp, is_dim boolean, "
        "value double"
    )
    cut = F.lit("2024-01-16").cast("timestamp")
    for wave_filter in (F.col("ts") < cut, F.col("ts") >= cut):
        ev.where(wave_filter).write.mode("append").parquet(land)
        with scaled_state_partitions(spark, land):
            run_available_now_to_files(
                stateful_pit_enrich(
                    stream_from_files(spark, land, schema),
                    max_versions=1_000_000,
                ),
                ckpt,
                out,
            )
    return spark.read.parquet(out).select(
        "user_id",
        "event_id",
        "ts_us",
        F.round("fact_value", 2).alias("fact_value"),
        F.round("dim_value", 2).alias("dim_value"),
        "dim_ts_us",
    )


# ---------------------------------------------------------------------------
# q198: streaming running-totals replay — the accumulator face
# (stateful_running_totals, applyInPandasWithState update mode)
# through the oracle: two waves, one checkpoint, upsert log via the
# q196 runner, latest-n_events per key is the final state. The fact
# value is fed as CENTS cast to double — float64 sums of integral
# values are exact at any accumulation order, so the cross-engine
# contract needs no rounding tolerance at all. (No replay wave here
# on purpose: a counter face double-counts at-least-once upstreams by
# design — q193's keyed dedup is the front door that owns replays.)
# ---------------------------------------------------------------------------

@query(
    "q198_stream_totals_replay",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
             AS total_value
    FROM events GROUP BY 1
    """,
)
def q198_stream_totals_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.streaming.ops import (
        run_available_now_update_appends,
        scaled_state_partitions,
        stateful_running_totals,
        stream_from_files,
    )

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).alias("value"),  # integral doubles
    )
    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"q198_{tag}_")
    land = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "totals")
    schema = "user_id long, event_id long, value double"
    for wave_filter in (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1):
        ev.where(wave_filter).write.mode("append").parquet(land)
        with scaled_state_partitions(spark, land):
            run_available_now_update_appends(
                stateful_running_totals(stream_from_files(spark, land, schema)),
                ckpt,
                out,
            )
    log = spark.read.parquet(out)
    return log.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.expr("max_by(total_value, n_events)").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# q199: stream-stream interval-join replay — the last pytest-only
# streaming face (stream_stream_join) through the oracle: clicks
# joined to purchases by the same user within 1 hour AFTER the click.
# Two event-time waves against one checkpoint; every cross-wave pair
# (click in wave 1, purchase in wave 2) can only appear if the join
# buffered the click in state across the restart, so the hash proves
# the interval condition, both-side buffering, and recovery together.
# Watermark is set far beyond the data span: eviction must not fire —
# the BOUNDED-state behavior (eviction under a tight watermark) is
# the pytest contract, the oracle needs the complete pair set.
# ---------------------------------------------------------------------------

@query(
    "q199_stream_join_replay",
    oracle="""
    SELECT l.user_id,
           l.event_id,
           r.event_id AS r_event_id,
           epoch_us(l.ts) AS ts_us,
           epoch_us(r.ts) AS r_ts_us
    FROM events l JOIN events r
      ON r.user_id = l.user_id
     AND l.event_type = 'click' AND r.event_type = 'purchase'
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    """,
)
def q199_stream_join_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.streaming.ops import (
        run_available_now_to_files,
        scaled_state_partitions,
        stream_from_files,
        stream_stream_join,
    )

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"q199_{tag}_")
    lland = os.path.join(root, "clicks")
    rland = os.path.join(root, "purchases")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "pairs")
    schema = "user_id long, event_id long, ts timestamp"
    clicks = ev.where(F.col("event_type") == "click").drop("event_type")
    buys = ev.where(F.col("event_type") == "purchase").drop("event_type")
    # cut INSIDE some click->purchase window so at least one pair
    # straddles the restart (bounded 1-row metadata collect); the
    # oracle's pair set is wave-agnostic, so the cut only decides how
    # much of the proof the replay exercises
    r = buys.alias("r")
    l = clicks.alias("l")
    straddle = (
        l.join(
            r,
            (F.col("r.user_id") == F.col("l.user_id"))
            & (F.col("r.ts") > F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .agg(F.min(F.col("r.ts")).alias("cut"))
        .collect()[0]["cut"]
    )
    cut = F.lit(str(straddle) if straddle else "9999-01-01").cast("timestamp")
    for wave_filter in (F.col("ts") < cut, F.col("ts") >= cut):
        clicks.where(wave_filter).write.mode("append").parquet(lland)
        buys.where(wave_filter).write.mode("append").parquet(rland)
        with scaled_state_partitions(spark, lland, rland):
            run_available_now_to_files(
                stream_stream_join(
                    stream_from_files(spark, lland, schema),
                    stream_from_files(spark, rland, schema),
                    key_cols=("user_id",),
                    within="1 hour",
                    watermark="3650 days",
                ),
                ckpt,
                out,
            )
    return spark.read.parquet(out).select(
        "user_id",
        "event_id",
        "r_event_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        F.expr("unix_micros(r_ts)").alias("r_ts_us"),
    )


# ---------------------------------------------------------------------------
# q200: mixed-media ingestion front door — ONE binary column carrying
# all seven real codec families (doc_id % 9 picks bmp/png/gif/jpeg/
# wav/mp3/mp4) plus a truncated-MP4 quarantine class and a bad-magic
# unknown class; `sniff_media_stats` magic-byte-routes every payload
# to its codec and emits a unified metadata row. This is the corpus
# shape a real multimodal crawl has — formats interleaved in one
# column, corrupt rows present — and the shared ValueError contract
# is what makes the dispatch safe (a codec REJECTING its own format
# quarantines the row instead of killing the task). Each branch's
# arithmetic is its family's established oracle
# (q23b/q123/q98/q165/q84/q189/q187) assembled into one CASE.
# ---------------------------------------------------------------------------

@query(
    "q200_media_front_door",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen,
                      octet_length(encode(text)) AS blen,
                      doc_id % 9 AS r
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
      CASE r WHEN 0 THEN 'bmp' WHEN 1 THEN 'png' WHEN 2 THEN 'gif'
             WHEN 3 THEN 'jpeg' WHEN 4 THEN 'wav' WHEN 5 THEN 'mp3'
             WHEN 6 THEN 'mp4' WHEN 7 THEN 'quarantined'
             ELSE 'unknown' END AS fmt,
      CAST(CASE r WHEN 0 THEN blen % 31 + 1 WHEN 1 THEN clen % 13 + 1
                  WHEN 2 THEN clen % 16 + 2
                  WHEN 3 THEN (clen % 4 + 1) * 8 END AS INTEGER) AS width,
      CAST(CASE r WHEN 0 THEN blen % 17 + 1 WHEN 1 THEN clen % 7 + 1
                  WHEN 2 THEN clen % 11 + 2
                  WHEN 3 THEN (clen % 3 + 1) * 8 END AS INTEGER) AS height,
      CAST(CASE r WHEN 2 THEN clen % 5 + 1 WHEN 4 THEN clen % 97 + 8
                  WHEN 5 THEN clen % 13 + 2
                  WHEN 6 THEN clen % 7 + 2 END AS BIGINT) AS n_frames,
      CAST(CASE r WHEN 2 THEN (clen % 5 + 1) * 40
                  WHEN 4 THEN (clen % 97 + 8) // 8
                  WHEN 5 THEN 36 * (clen % 13 + 2)
                  WHEN 6 THEN CASE WHEN clen % 3 = 0
                                    AND 23 * (clen % 11 + 3)
                                        > 40 * (clen % 7 + 2)
                                   THEN 23 * (clen % 11 + 3)
                                   ELSE 40 * (clen % 7 + 2) END
             END AS BIGINT) AS duration_ms
    FROM d
    """,
)
def q200_media_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        sniff_media_stats,
        with_mixed_media_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8) with id_mod=9: the class picker is
    # doc_id % 9, so the dictionary keys on (lengths, id residue) and
    # the packed key preserves the residue mod 9
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: sniff_media_stats(
            with_mixed_media_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
        id_mod=9,
    )


# ---------------------------------------------------------------------------
# q201: SALTED shuffle join driven through the driver hash (VERDICT
# r7 item 5 — the one scale lever that was pytest-only). The salt is
# engine-INTERNAL: the large side scatters each row into one of 8
# sub-keys (deterministic xxhash64 over the full row), the small
# side replicates to all 8, and the join key becomes (custkey,
# __salt) — so one hot customer's orders land in 8 shuffle tasks
# instead of one straggler. Semantically the inner equi-join is
# UNCHANGED (each large row meets each match exactly once), which is
# exactly why the oracle is the PLAIN join: the differential proves
# the salt never leaks into the answer. Money folds in exact cents
# (the q164 idiom) so partial-sum order can't shift a rounding
# boundary; the salted-exchange plan shape is pinned in
# tests/test_bucketing_skew.py::test_salted_join_exchange_plan.
# ---------------------------------------------------------------------------

@query(
    "q201_salted_join",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q201_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.skew import salted_join

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        "c_mktsegment",
    )
    joined = salted_join(orders, cust, ["custkey"], salt=8)
    return joined.groupBy(
        F.col("c_mktsegment").alias("mktsegment")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# q202: REAL compressed-image decode #5 — PROGRESSIVE (SOF2) 4:2:0
# COLOR JPEG (VERDICT r7 item 2, the last image-profile seam closable
# in pure Python — with it, every profile in the family gray/color x
# baseline/progressive is a real decode path). The scan script
# exercises the pieces the gray progressive profile cannot:
# INTERLEAVED DC scans (MCU walk with per-component prediction, the
# T.81 rule that only DC scans may interleave) plus per-component AC
# band scans, with successive approximation on both. Geometry axes
# are SWAPPED versus baseline color q180 (wm = clen % 2 + 1,
# hm = clen % 3 + 1) so the two differentials predict different
# answers from different payload bytes while sharing the
# synth_dc_blocks_color closed forms: Y sub-block j decodes to
# 2*((clen + 7j) % 64 - 32) + 128 (q[0]=16), chroma MCU m to
# 17*((clen + {7,3}m) % 5 - 2) + 128 offsets (q[0]=17, DCs multiples
# of 8 keep it integer), through the pinned JFIF matrix. pytest pins
# progressive-color decode == baseline-color decode on AC-bearing
# blocks; truncation/byte-flip sweeps extend to this profile.
# ---------------------------------------------------------------------------

@query(
    "q202_jpeg_progressive_color",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 2 + 1 AS wm,
                      length(text) % 3 + 1 AS hm
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(wm * 16 AS INTEGER) AS width,
           CAST(hm * 16 AS INTEGER) AS height,
           CAST(list_sum(list_transform(generate_series(0, wm*hm*4 - 1),
             j -> 64 * LEAST(255, GREATEST(0, FLOOR(
               (2 * ((clen + 7*j) % 64 - 32) + 128)
               + 1.402 * (17 * ((clen + 3*(j//4)) % 5 - 2))
               + 0.5))))) AS BIGINT) AS r_sum,
           CAST(list_sum(list_transform(generate_series(0, wm*hm*4 - 1),
             j -> 64 * LEAST(255, GREATEST(0, FLOOR(
               (2 * ((clen + 7*j) % 64 - 32) + 128)
               - 0.344136 * (17 * ((clen + 7*(j//4)) % 5 - 2))
               - 0.714136 * (17 * ((clen + 3*(j//4)) % 5 - 2))
               + 0.5))))) AS BIGINT) AS g_sum,
           CAST(list_sum(list_transform(generate_series(0, wm*hm*4 - 1),
             j -> 64 * LEAST(255, GREATEST(0, FLOOR(
               (2 * ((clen + 7*j) % 64 - 32) + 128)
               + 1.772 * (17 * ((clen + 7*(j//4)) % 5 - 2))
               + 0.5))))) AS BIGINT) AS b_sum
    FROM g
    """,
)
def q202_jpeg_progressive_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_jpeg_progressive_color_stats,
        with_jpeg_progressive_color_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_jpeg_progressive_color_stats(
            with_jpeg_progressive_color_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q203: REAL Layer III entropy-STRUCTURE decode — side info +
# scalefactors (the second notch out of the compressed-audio seam
# after q189/q190's framing layer). Everything fixed-width in an
# MPEG-1 mono frame is really encoded and really decoded bit-exactly:
# the 136-bit side info, scalefac_compress -> (slen1, slen2) via
# Table B.6, the scalefactor section of main_data, and scfsi COPY
# semantics (granule 1's copied groups take granule 0's DECODED
# values — the oracle reproduces the copy, including granule 0's
# DIFFERENT slen widths). Spectra are spec-valid digital silence
# (big_values = 0, part2_3_length == scalefactor bits), so
# spectral_bits_sum — the Huffman payload this engine does NOT
# decode, the remaining seam — is exactly 0 and hash-checked as
# such. All outputs are integer folds over decoded bit fields.
# ---------------------------------------------------------------------------

from redskins_rule_spark.functions.mp3 import SLEN as _MP3_SLEN  # noqa: E402

_MP3_SLEN_VALUES = ", ".join(
    f"({i}, {s1}, {s2})" for i, (s1, s2) in enumerate(_MP3_SLEN)
)


@query(
    "q203_mp3_sideinfo",
    oracle=f"""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
         slen(sfc, s1, s2) AS (VALUES {_MP3_SLEN_VALUES}),
         fr AS (SELECT doc_id, clen, u.i AS i
                FROM d, unnest(generate_series(0, clen % 7 + 1)) AS u(i)),
         gr AS (SELECT f.*, gg.g FROM fr f, (VALUES (0), (1)) AS gg(g)),
         grx AS (SELECT doc_id, clen, i, g,
                        (5 * clen + 3 * i + 1) % 16 AS scfsi,
                        (clen + i + g) % 16 AS sfc
                 FROM gr),
         band AS (SELECT gx.*, u.b AS b,
                         CASE WHEN u.b < 6 THEN 0 WHEN u.b < 11 THEN 1
                              WHEN u.b < 16 THEN 2 ELSE 3 END AS gi
                  FROM grx gx, unnest(generate_series(0, 20)) AS u(b)),
         bx AS (SELECT band.*,
                       CASE WHEN b < 11 THEN so.s1 ELSE so.s2 END AS w_own,
                       CASE WHEN b < 11 THEN s0.s1 ELSE s0.s2 END AS w_g0,
                       (scfsi // CASE gi WHEN 0 THEN 8 WHEN 1 THEN 4
                                         WHEN 2 THEN 2 ELSE 1 END) % 2
                         AS scbit
                FROM band
                JOIN slen so ON so.sfc = band.sfc
                JOIN slen s0 ON s0.sfc = (band.clen + band.i) % 16),
         vals AS (SELECT doc_id,
                         CASE WHEN g = 1 AND scbit = 1 THEN 0
                              ELSE w_own END AS bits_written,
                         CASE WHEN g = 1 AND scbit = 1 THEN
                           CASE WHEN w_g0 = 0 THEN 0
                                ELSE (clen + i + b) %
                                     CASE w_g0 WHEN 1 THEN 2 WHEN 2 THEN 4
                                               WHEN 3 THEN 8 ELSE 16 END END
                         ELSE
                           CASE WHEN w_own = 0 THEN 0
                                ELSE (clen + i + g + b) %
                                     CASE w_own WHEN 1 THEN 2 WHEN 2 THEN 4
                                                WHEN 3 THEN 8 ELSE 16 END END
                         END AS sf_val
                  FROM bx),
         bandagg AS (SELECT doc_id,
                            CAST(SUM(bits_written) AS BIGINT) AS part23_sum,
                            CAST(SUM(sf_val) AS BIGINT) AS sf_sum
                     FROM vals GROUP BY 1),
         gainagg AS (SELECT doc_id,
                            CAST(SUM((clen + 7 * i + 3 * g) % 256) AS BIGINT)
                              AS gain_sum
                     FROM grx GROUP BY 1)
    SELECT d.doc_id,
           CAST(d.clen % 7 + 2 AS BIGINT) AS n_frames,
           g.gain_sum, b.part23_sum, b.sf_sum,
           CAST(0 AS BIGINT) AS spectral_bits_sum
    FROM d JOIN gainagg g USING (doc_id) JOIN bandagg b USING (doc_id)
    """,
)
def q203_mp3_sideinfo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_mp3_sideinfo_stats,
        with_mp3_granule_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_mp3_sideinfo_stats(
            with_mp3_granule_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q204: REAL H.264 NAL-structure + SPS-geometry decode from MP4
# samples — the video-seam analog of q203's audio layer. The engine
# slices every video sample out of mdat by the REAL sample table
# (q188's machinery), parses the Annex B stream (start codes,
# emulation-prevention de-escape, NAL header validation), and
# Exp-Golomb-decodes the sequence parameter set — width/height come
# from the STREAM's SPS, not the container's tkhd, which is the
# number a real ingest pipeline trusts (containers lie; parameter
# sets don't). Exp-Golomb is self-describing (spec §9.1), so unlike
# CAVLC/CABAC slice data there is no codebook to embed — geometry
# decode is exact from first principles. PPS head surfaces
# entropy_coding_mode (WHICH slice-entropy seam the stream sits
# behind). Slice bodies stay opaque by design — after this layer the
# video seam is exactly slice entropy + transform/prediction.
# ---------------------------------------------------------------------------

@query(
    "q204_avc_sps",
    oracle="""
    SELECT doc_id,
           CAST((clen % 5 + 1) * 16 AS INTEGER) AS width,
           CAST((clen % 3 + 1) * 16 AS INTEGER) AS height,
           CAST(66 AS INTEGER) AS profile,
           CAST(clen % 45 + 10 AS INTEGER) AS level,
           CAST(clen % 2 AS INTEGER) AS cabac,
           CAST(clen % 6 + 4 AS BIGINT) AS n_nals,
           CAST(1 AS BIGINT) AS n_idr
    FROM (SELECT doc_id, length(text) AS clen FROM documents
          WHERE text IS NOT NULL)
    """,
)
def q204_avc_sps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_avc_stats,
        with_mp4_avc_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_avc_stats(
            with_mp4_avc_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q205: REAL ADTS/AAC frame walk — the standalone .aac analog of
# q189/q190's MP3 framing layer, completing the audio-container
# symmetry: every fixed+variable header field (profile, the Table
# 1.18 sampling-frequency index, channel config, the 13-bit
# header-inclusive frame length, raw-data-block count) really
# decodes, frames slice by the DECLARED length (bounds-checked), and
# 1024 samples/block makes duration integer-exact. Raw AAC access
# units stay opaque by design — the spectral seam, same boundary
# class as MP3's Table B.7. CRC-present (9-byte-header) streams are
# exercised via the clen % 5 == 0 class. The mixed-media sniffer now
# distinguishes the ADTS sync (layer bits 00) from MP3's (01).
# ---------------------------------------------------------------------------

from redskins_rule_spark.functions.aac import (  # noqa: E402
    SAMPLE_RATES_AAC as _AAC_SR,
)

_AAC_SR_VALUES = ", ".join(f"({i}, {sr})" for i, sr in enumerate(_AAC_SR))


@query(
    "q205_adts_meta",
    oracle=f"""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
         srt(idx, sr) AS (VALUES {_AAC_SR_VALUES}),
         base AS (SELECT doc_id, clen, clen % 9 + 2 AS n, srt.sr
                  FROM d JOIN srt ON srt.idx = d.clen % 13),
         pay AS (SELECT doc_id,
                        CAST(SUM((clen + 5 * u.i) % 37 + 1) AS BIGINT)
                          AS payload_bytes
                 FROM base, unnest(generate_series(0, n - 1)) AS u(i)
                 GROUP BY 1)
    SELECT b.doc_id,
           CAST(b.n AS BIGINT) AS n_frames,
           CAST(b.clen % 4 AS INTEGER) AS profile,
           CAST(b.sr AS INTEGER) AS sr,
           CAST(b.clen % 7 + 1 AS INTEGER) AS channels,
           CAST(b.n * 1024 * 1000 // b.sr AS BIGINT) AS duration_ms,
           p.payload_bytes
    FROM base b JOIN pay p USING (doc_id)
    """,
)
def q205_adts_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_adts_stats,
        with_adts_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_adts_stats(
            with_adts_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q206: REAL-WORLD AVC-in-MP4 layout — parameter sets OUT-OF-BAND.
# q204 proved the Annex B shape (in-band SPS/PPS, start codes); real
# MP4s instead carry SPS/PPS in the stsd avc1 entry's avcC record
# (ISO 14496-15) and frame their mdat samples as LENGTH-PREFIXED NAL
# units — a different container walk (stsd sample-entry parse), a
# different record format (AVCDecoderConfigurationRecord with
# 2-byte-length parameter sets), and a different NAL framing (length
# prefixes, 2- or 4-byte both exercised, no start-code scan). The
# SPS/PPS Exp-Golomb machinery is SHARED with q204 — one decode
# path, two real-world transports. Geometry formulas differ from
# q204's so the two differentials decouple. Slice bodies remain the
# documented seam.
# ---------------------------------------------------------------------------

@query(
    "q206_avcc_config",
    oracle="""
    SELECT doc_id,
           CAST((clen % 7 + 1) * 16 AS INTEGER) AS width,
           CAST((clen % 2 + 1) * 16 AS INTEGER) AS height,
           CAST(66 AS INTEGER) AS profile,
           CAST(clen % 40 + 11 AS INTEGER) AS level,
           CAST((clen + 1) % 2 AS INTEGER) AS cabac,
           CAST(CASE WHEN clen % 2 = 1 THEN 2 ELSE 4 END AS INTEGER)
             AS length_size,
           CAST(clen % 5 + 2 AS BIGINT) AS n_nals,
           CAST(1 AS BIGINT) AS n_idr
    FROM (SELECT doc_id, length(text) AS clen FROM documents
          WHERE text IS NOT NULL)
    """,
)
def q206_avcc_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_avcc_stats,
        with_mp4_avcc_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_avcc_stats(
            with_mp4_avcc_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q207: out-of-band AAC config — the audio counterpart of q206.
# Inside MP4, AAC carries no ADTS headers: the decoder config rides
# the stsd mp4a entry's esds box as an MPEG-4 Systems descriptor
# chain (ES_Descriptor → DecoderConfigDescriptor(OTI 0x40) →
# DecoderSpecificInfo) whose payload is the bit-packed
# AudioSpecificConfig. Both the descriptor walk (7-bit continuation
# lengths, tag/OTI validation) and the config bits really decode;
# together with q205's ADTS walk, BOTH real-world AAC transports are
# structure-real, and the raw access units remain the spectral seam.
# The track timescale equals the config's sample rate with 1024-tick
# deltas, so n_samples is sample-exact from the sample table.
# ---------------------------------------------------------------------------

@query(
    "q207_esds_config",
    oracle=f"""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
         srt(idx, sr) AS (VALUES {_AAC_SR_VALUES}),
         base AS (SELECT doc_id, clen, clen % 8 + 2 AS n, srt.sr
                  FROM d JOIN srt ON srt.idx = d.clen % 13)
    SELECT b.doc_id,
           CAST(b.clen % 3 + 1 AS INTEGER) AS aot,
           CAST(b.sr AS INTEGER) AS sr,
           CAST(b.clen % 7 + 1 AS INTEGER) AS channels,
           CAST(b.n AS BIGINT) AS n_samples,
           (SELECT CAST(SUM((b.clen + 9 * u.i) % 31 + 1) AS BIGINT)
            FROM unnest(generate_series(0, b.n - 1)) AS u(i))
             AS sample_bytes
    FROM base b
    """,
)
def q207_esds_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_mp4_aac_stats,
        with_mp4_aac_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_mp4_aac_stats(
            with_mp4_aac_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q208: ID3v2.3 tag-BODY decode — the metadata layer of the audio
# family (the framing layer has skipped tags by syncsafe size since
# q189; now the inside decodes too). Frame headers validated, v2.3's
# PLAIN big-endian frame sizes (only v2.4 made them syncsafe — a
# classic parser bug this differential would catch), text frames
# decoded from ISO-8859-1, padding terminated. v2.4 tags,
# unsynchronisation, extended headers, and compressed/encrypted
# frames raise naming the profile boundary. The oracle recomputes
# the title/album/track strings and both frame counts from clen.
# ---------------------------------------------------------------------------

@query(
    "q208_id3_tags",
    oracle="""
    SELECT doc_id,
           't' || CAST(clen % 97 AS VARCHAR) AS title,
           'a' || CAST(clen % 13 AS VARCHAR) AS album,
           CAST(clen % 30 + 1 AS VARCHAR) AS track,
           CAST(3 AS BIGINT) AS n_tag_frames,
           CAST(clen % 5 + 2 AS BIGINT) AS n_audio_frames
    FROM (SELECT doc_id, length(text) AS clen FROM documents
          WHERE text IS NOT NULL)
    """,
)
def q208_id3_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_id3_stats,
        with_tagged_mp3_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_id3_stats(
            with_tagged_mp3_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q37b: greedy sequence packing, CROSS-ENGINE face (VERDICT r8 item 1
# — retire q37's rows-only status the q25b/q43b/q97b way). q37's
# production face hash-groups chunks via xxhash64 (engine-local) and
# packs inside applyInPandas; this sibling drives the IDENTICAL
# greedy fold (operators/chunking.py::pack_chunks — next-fit: a chunk
# that would overflow the budget opens a new pack; order pinned by
# (doc_id) within an explicit cross-engine group doc_id % 8) with
# every engine-local choice replaced by replayable arithmetic. The
# oracle replays the sequential fold as a DuckDB RECURSIVE CTE over
# the same (grp, rn) order — the pack fold is a linear recurrence,
# exactly what recursive SQL expresses — and the result is checked
# PER ROW (doc_id -> pack_id), not per aggregate, so any mis-ordered
# or mis-reset fold state flips the hash.
# ---------------------------------------------------------------------------

@query(
    "q37b_packing_xengine",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id, CAST(doc_id % 8 AS INTEGER) AS grp,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             ROW_NUMBER() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
      FROM documents WHERE text IS NOT NULL
    ),
    fold AS (
      SELECT grp, rn, doc_id, n_tokens, 0 AS pack_id, n_tokens AS used
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.grp, t.rn, t.doc_id, t.n_tokens,
             CASE WHEN f.used > 0 AND f.used + t.n_tokens > 160
                  THEN f.pack_id + 1 ELSE f.pack_id END,
             CASE WHEN f.used > 0 AND f.used + t.n_tokens > 160
                  THEN t.n_tokens ELSE f.used + t.n_tokens END
      FROM fold f JOIN t ON t.grp = f.grp AND t.rn = f.rn + 1
    )
    SELECT doc_id, grp, CAST(pack_id AS INTEGER) AS pack_id,
           CAST(n_tokens AS INTEGER) AS n_tokens
    FROM fold
    """,
)
def q37b_packing_xengine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.text import token_count

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    items = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).cast("int").alias("grp"),
        token_count("text").cast("int").alias("n_tokens"),
    )
    packed = pack_chunks(
        items, "n_tokens", budget=160, group_col="grp", order_cols=["doc_id"]
    )
    return packed.select("doc_id", "grp", "pack_id", "n_tokens")


# ---------------------------------------------------------------------------
# q209: REAL PIXELS through the H.264 seam — I_PCM macroblocks.
# §7.4.5 mb_type 25 is the one I-slice macroblock that carries raw
# byte-aligned samples instead of CAVLC/CABAC-coded residuals, so an
# all-I_PCM IDR slice decodes to exact pixel planes with zero entropy
# tables: Annex B NAL walk → Exp-Golomb SPS/PPS → slice header →
# per-MB raw samples reassembled into raster planes (the MB↔plane
# spatial mapping is what the fingerprint checks). The oracle replays
# the synth planes closed-form: sample at raster i of a width-w plane
# is (clen + A·(i%w) + B·(i÷w)) % 255 + 1, position-weighted by the
# char_fingerprint arithmetic. qp = pic_init_qp(26) + slice_qp_delta
# (clen%5 − 2). What remains of the video seam after this query is
# exactly CAVLC/CABAC residual decode — still raised by name.
# ---------------------------------------------------------------------------


def _q209_fp_sql(a: int, b: int, w: str, n: str) -> str:
    """Closed-form fingerprint of a synth plane: width expr `w`,
    element-count expr `n`, coefficients (a, b)."""
    return (
        f"CAST(SUM(CASE WHEN u.i < {n} THEN "
        f"((clen + {a} * (u.i % ({w})) + {b} * (u.i // ({w}))) % 255 + 1) "
        f"* (1 + u.i % 64) ELSE 0 END) % 2147483647 AS BIGINT)"
    )


@query(
    "q209_avc_ipcm",
    oracle=f"""
    WITH base AS (SELECT doc_id, length(text) AS clen,
                         16 * (length(text) % 3 + 1) AS w,
                         16 * (length(text) % 2 + 1) AS h
                  FROM documents WHERE text IS NOT NULL),
    pay AS (SELECT doc_id,
                   {_q209_fp_sql(7, 13, "w", "w * h")} AS y_fp,
                   {_q209_fp_sql(5, 11, "w // 2", "(w * h) // 4")} AS cb_fp,
                   {_q209_fp_sql(3, 17, "w // 2", "(w * h) // 4")} AS cr_fp
            FROM base, unnest(generate_series(0, w * h - 1)) AS u(i)
            GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.w AS INTEGER) AS width,
           CAST(b.h AS INTEGER) AS height,
           CAST((b.clen % 3 + 1) * (b.clen % 2 + 1) AS INTEGER) AS n_mbs,
           CAST(24 + b.clen % 5 AS INTEGER) AS qp,
           p.y_fp, p.cb_fp, p.cr_fp
    FROM base b JOIN pay p USING (doc_id)
    """,
)
def q209_avc_ipcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_avc_ipcm_stats,
        with_avc_ipcm_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_avc_ipcm_stats(
            with_avc_ipcm_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q210: REAL SPECTRAL VALUES through the MP3 seam — the count1 region.
# A Layer III granule's spectrum is big_values Huffman pairs, then
# "count1" quadruples (v,w,x,y each in {−1,0,1}) coded with the two
# small Table B.7 count1 codebooks (A: Kraft-exact 16-word prefix
# code; B: the 4-bit one's complement) plus a sign bit per nonzero.
# Granules with big_values = 0 therefore decode their ENTIRE spectrum
# exactly — real quantized spectral values out of a real Huffman
# decode, with the 32 big-values pair tables remaining the documented
# seam. The oracle replays the synth quadruple formulas closed-form;
# every output is an integer. Both codebooks are exercised in every
# payload (count1table_select alternates per granule).
# ---------------------------------------------------------------------------

_Q210_VALS = (
    "(clen + 3 * q + i + g) % 3 - 1",
    "(clen + 5 * q + 2 * i) % 3 - 1",
    "(clen + 7 * q + 3 * i + g) % 3 - 1",
    "(clen + 11 * q + 4 * i) % 3 - 1",
)


@query(
    "q210_mp3_count1",
    oracle=f"""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    cells AS (SELECT doc_id, clen, f.i, gg.g, u.q,
                     {_Q210_VALS[0]} AS v, {_Q210_VALS[1]} AS w,
                     {_Q210_VALS[2]} AS x, {_Q210_VALS[3]} AS y
              FROM d,
                   unnest(generate_series(0, clen % 5 + 1)) AS f(i),
                   unnest([0, 1]) AS gg(g),
                   unnest(generate_series(0, (clen + f.i + gg.g) % 5)) AS u(q))
    SELECT doc_id,
           CAST(clen % 5 + 2 AS BIGINT) AS n_frames,
           CAST(COUNT(*) AS BIGINT) AS n_quads,
           CAST(SUM(v + w + x + y) AS BIGINT) AS sum_vals,
           CAST(SUM((v < 0)::INT + (w < 0)::INT + (x < 0)::INT
                    + (y < 0)::INT) AS BIGINT) AS n_neg,
           CAST(SUM((64 * i + 32 * g + q + 1)
                    * (v + 2 * w + 3 * x + 4 * y)) AS BIGINT) AS fp
    FROM cells
    GROUP BY doc_id, clen
    """,
)
def q210_mp3_count1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_mp3_count1_stats,
        with_mp3_count1_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_mp3_count1_stats(
            with_mp3_count1_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q211: streaming SESSION WINDOWS across restarts (r8 directive 6
# resolved BUILD, not why-not). `F.session_window` + append mode
# through ONE checkpoint and four available-now drains: wave 1 is all
# events with ts < cut, wave 2 the rest (sessions straddling the cut
# prove the state store merges windows ACROSS restarts — the one
# semantics q27's batch face cannot cover), then two far-future
# sentinel events (user_id = −1) whose only job is to push the
# watermark past every real session's end + gap. The sentinel-flush
# makes the append-mode emission set DETERMINISTIC — exactly "every
# real session" — so the oracle is the q27 gap-islands replay over
# the whole events table, decoupled from watermark/batch-boundary
# evolution (each drain is one batch: availableNow without
# maxFilesPerTrigger takes all pending files at once; wave 2 is never
# late because the cut is on EVENT TIME, so drain 1's watermark
# max(wave1.ts) − delay sits below the cut). Two sentinels because a
# window closed by batch N's watermark emits in batch N+1.
# ---------------------------------------------------------------------------

@query(
    "q211_stream_session_replay",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    tagged AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered)
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def q211_stream_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.streaming.ops import (
        run_available_now_to_files,
        scaled_state_partitions,
        sessionized_counts,
        stream_from_files,
    )

    gap, delay = "30 minutes", "2 hours"
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut = lo + (hi - lo) / 2
    # sentinel spacing: gap + watermark delay + 1h of slack, twice
    step = datetime.timedelta(hours=3, minutes=30)
    sentinels = [
        (int(-1 - k), hi + (k + 1) * step, int(-1)) for k in (0, 1)
    ]
    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"q211_{tag}_")
    land = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ckpt")
    out = os.path.join(root, "sessions")
    schema = "event_id long, ts timestamp, user_id long"
    # sentinel rows as one-row SELECTs (LocalRelation, no job):
    # createDataFrame slices even ONE row across the default
    # parallelism (31 empty pickled partitions), and .coalesce(1) was
    # worse still — the merged task pays a Python-worker round-trip
    # per parent partition. TIMESTAMP literals parse in the session tz
    # (UTC), exactly how createDataFrame bound the naive datetimes.
    def _sentinel(row):
        eid, ts, uid = row
        return spark.sql(
            f"SELECT CAST({eid} AS BIGINT) AS event_id, "
            f"TIMESTAMP '{ts}' AS ts, CAST({uid} AS BIGINT) AS user_id"
        )

    waves = (
        ev.where(F.col("ts") < F.lit(cut)),
        ev.where(F.col("ts") >= F.lit(cut)),
        _sentinel(sentinels[0]),
        _sentinel(sentinels[1]),
    )
    for wave in waves:
        wave.write.mode("append").parquet(land)
        with scaled_state_partitions(spark, land):
            run_available_now_to_files(
                sessionized_counts(
                    stream_from_files(spark, land, schema),
                    gap=gap,
                    watermark=delay,
                ),
                ckpt,
                out,
            )
    emitted = spark.read.parquet(out).where(F.col("user_id") >= 0)
    return emitted.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        F.col("n_events").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q212: I_PCM pixels through the MP4/avcC transport — the end-to-end
# video path. q209 proves the pixels through the Annex B elementary
# stream; q206 proves the avcC out-of-band config; this composes
# them: ISO BMFF box walk → stsd avc1 avcC record → SPS/PPS from the
# OUT-OF-BAND sets → length-prefixed NAL walk over the real mdat
# sample → all-I_PCM IDR slice decode to raster planes. Same plane
# closed forms as q209 plus the avcC length_size; only CAVLC/CABAC
# residual decode remains behind the seam.
# ---------------------------------------------------------------------------

@query(
    "q212_mp4_ipcm",
    oracle=f"""
    WITH base AS (SELECT doc_id, length(text) AS clen,
                         16 * (length(text) % 3 + 1) AS w,
                         16 * (length(text) % 2 + 1) AS h
                  FROM documents WHERE text IS NOT NULL),
    pay AS (SELECT doc_id,
                   {_q209_fp_sql(7, 13, "w", "w * h")} AS y_fp,
                   {_q209_fp_sql(5, 11, "w // 2", "(w * h) // 4")} AS cb_fp,
                   {_q209_fp_sql(3, 17, "w // 2", "(w * h) // 4")} AS cr_fp
            FROM base, unnest(generate_series(0, w * h - 1)) AS u(i)
            GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.w AS INTEGER) AS width,
           CAST(b.h AS INTEGER) AS height,
           CAST((b.clen % 3 + 1) * (b.clen % 2 + 1) AS INTEGER) AS n_mbs,
           CAST(24 + b.clen % 5 AS INTEGER) AS qp,
           CAST(CASE WHEN b.clen % 2 = 1 THEN 2 ELSE 4 END AS INTEGER)
               AS length_size,
           p.y_fp, p.cb_fp, p.cr_fp
    FROM base b JOIN pay p USING (doc_id)
    """,
)
def q212_mp4_ipcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_mp4_ipcm_stats,
        with_mp4_ipcm_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_mp4_ipcm_stats(
            with_mp4_ipcm_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q213: BOTH MP3 spectral regions — table-1 big-values pairs + count1
# quadruples. Table B.7's pair table 1 is the one big-values codebook
# small enough to carry as spec text (4 entries, Kraft-exact, no
# linbits/ESC), so granules whose pairs fit in ±1 now decode their
# big-values region too: after q210, the MP3 seam narrows to pair
# tables 2-31 (+ linbits escapes) and the float reconstruction
# pipeline. The oracle replays both regions' synth formulas
# closed-form; all-integer outputs; both count1 codebooks and
# pairs-only granules (nq = 0) occur across every payload.
# ---------------------------------------------------------------------------

@query(
    "q213_mp3_bigvalues",
    oracle=f"""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    pcells AS (SELECT doc_id, clen, f.i, gg.g, u.p,
                      (clen + 2 * u.p + f.i) % 3 - 1 AS x,
                      (clen + 3 * u.p + gg.g) % 3 - 1 AS y
               FROM d,
                    unnest(generate_series(0, clen % 4 + 1)) AS f(i),
                    unnest([0, 1]) AS gg(g),
                    unnest(generate_series(0, (clen + 2 * f.i + gg.g) % 6))
                        AS u(p)),
    qcells AS (SELECT doc_id, clen, f.i, gg.g, u.q,
                      {_Q210_VALS[0]} AS v, {_Q210_VALS[1]} AS w,
                      {_Q210_VALS[2]} AS x, {_Q210_VALS[3]} AS y
               FROM d,
                    unnest(generate_series(0, clen % 4 + 1)) AS f(i),
                    unnest([0, 1]) AS gg(g),
                    unnest(generate_series(0, (clen + f.i + gg.g) % 4 - 1))
                        AS u(q)),
    pa AS (SELECT doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_pairs,
                  CAST(SUM(x + y) AS BIGINT) AS sum_pairs,
                  CAST(SUM((64 * i + 32 * g + p + 1) * (x + 2 * y))
                       AS BIGINT) AS pair_fp
           FROM pcells GROUP BY doc_id),
    qa AS (SELECT doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_quads,
                  CAST(SUM(v + w + x + y) AS BIGINT) AS sum_quads,
                  CAST(SUM((64 * i + 32 * g + q + 1)
                           * (v + 2 * w + 3 * x + 4 * y)) AS BIGINT)
                      AS quad_fp
           FROM qcells GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(d.clen % 4 + 2 AS BIGINT) AS n_frames,
           pa.n_pairs,
           COALESCE(qa.n_quads, 0) AS n_quads,
           pa.sum_pairs,
           COALESCE(qa.sum_quads, 0) AS sum_quads,
           pa.pair_fp,
           COALESCE(qa.quad_fp, 0) AS quad_fp
    FROM d JOIN pa USING (doc_id) LEFT JOIN qa USING (doc_id)
    """,
)
def q213_mp3_bigvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_mp3_bigv_stats,
        with_mp3_bigv_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_mp3_bigv_stats(
            with_mp3_bigv_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q214: the AAC raw_data_block structure layer — silent SCEs. A
# single_channel_element whose every section selects the ZERO
# codebook transmits no scalefactor and no spectral data
# (ISO 14496-3 §4.4.2), so the whole element is fixed-width fields +
# section runs — decodable with zero Huffman tables, the AAC analog
# of q203's MP3 silence granules. The element walk, ics_info, and
# 5-bit escape section runs (max_sfb crosses 31 in every payload) are
# really decoded; nonzero codebooks, short windows, and
# predictor/pulse/TNS side data raise by name. After this layer the
# AAC seam is exactly the scalefactor + spectral codebooks and float
# reconstruction.
# ---------------------------------------------------------------------------

@query(
    "q214_aac_sce",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    cells AS (SELECT doc_id, clen, f.f
              FROM d, unnest(generate_series(0, clen % 6 + 1)) AS f(f))
    SELECT doc_id,
           CAST(clen % 6 + 2 AS BIGINT) AS n_frames,
           CAST(SUM((clen + 3 * f) % 256) AS BIGINT) AS gain_sum,
           CAST(SUM((clen + 5 * f) % 42 + 4) AS BIGINT) AS sfb_sum,
           CAST(SUM((clen + f) % 3 + 1) AS BIGINT) AS n_sections,
           CAST(SUM((clen + f) % 2) AS BIGINT) AS shape_sum,
           CAST(SUM((f + 1) * ((clen + f) % 16)) AS BIGINT) AS tag_fp
    FROM cells
    GROUP BY doc_id, clen
    """,
)
def q214_aac_sce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_aac_sce_stats,
        with_adts_silent_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_aac_sce_stats(
            with_adts_silent_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q215: Adam7-INTERLACED PNG decode — the real-world progressive
# image layout (spec §8.2). Seven passes with fixed offsets/strides,
# each an independently filtered sub-image; the payload generator
# cycles every pass through a different scanline filter, so a single
# differential exercises all five filters AND the pass scatter. The
# oracle is layout-blind: deinterlaced pixels must equal the
# progressive raster (same synth_pixels closed form as q123), and the
# POSITION-WEIGHTED fingerprint makes a wrong scatter unpassable.
# Small dims (w <= 13, h <= 7) mean most payloads have EMPTY passes —
# the spec's no-scanlines-at-all corner is always on the path.
# ---------------------------------------------------------------------------

@query(
    "q215_png_interlaced",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 13 + 1 AS w,
                      length(text) % 7 + 1 AS h
               FROM documents WHERE text IS NOT NULL),
    f AS (SELECT doc_id, w, h,
                 CAST(SUM(((clen + 5 * (u.i // (3 * w))
                            + 3 * ((u.i // 3) % w) + u.i % 3) % 256)
                          * (1 + u.i % 64)) % 2147483647 AS BIGINT)
                     AS pixel_fp
          FROM g, unnest(generate_series(0, w * h * 3 - 1)) AS u(i)
          GROUP BY doc_id, w, h)
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(1 AS INTEGER) AS interlace,
           pixel_fp
    FROM f
    """,
)
def q215_png_interlaced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_png_fp_stats,
        with_png_interlaced_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_png_fp_stats(
            with_png_interlaced_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q216: INTERLACED GIF decode — the Appendix E four-pass row order
# real encoders emit for progressive display. The LZW stream stores
# rows in pass order (0,8,… / 4,12,… / 2,6,… / 1,3,…); the decoder
# now undoes the permutation whenever a frame's descriptor sets the
# interlace flag (previously the flag was IGNORED — an interlaced
# frame decoded with silently scrambled rows, worse than an error).
# The oracle is layout-blind (deinterlaced rows == progressive
# raster, the q99 synth closed form) and the per-frame
# POSITION-WEIGHTED fingerprint makes a wrong row order unpassable.
# ---------------------------------------------------------------------------

@query(
    "q216_gif_interlaced",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 16 + 2 AS w,
                      length(text) % 11 + 2 AS h,
                      length(text) % 5 + 1 AS nf
               FROM documents WHERE text IS NOT NULL),
    f AS (SELECT doc_id, w, h, nf,
                 CAST(SUM(((clen + 7 * (u.i // (w * h))
                            + 3 * ((u.i % (w * h)) // w) + u.i % w) % 256)
                          * (1 + u.i % 64)) % 2147483647 AS BIGINT)
                     AS pixel_fp
          FROM g, unnest(generate_series(0, nf * w * h - 1)) AS u(i)
          GROUP BY doc_id, w, h, nf)
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(nf AS BIGINT) AS n_frames,
           pixel_fp
    FROM f
    """,
)
def q216_gif_interlaced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_gif_fp_stats,
        with_gif_interlaced_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_gif_fp_stats(
            with_gif_interlaced_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q217: IMA-ADPCM decode — REAL lossy-codec sample reconstruction
# through the audio seam (WAV fmt 0x11, the DVI/IMA algorithm of
# RFC 3551 §4.5.1). The engine decodes actual nibble-packed blocks
# through the 89-entry step table; the oracle replays the predictor
# fold sample-by-sample as a RECURSIVE CTE (the q37b pattern) with
# the step table as a VALUES relation — every output an exact
# integer. This is reconstruction, not structure: the numbers are
# decoded AUDIO SAMPLES, the audio analog of q209's I_PCM pixels.
# ---------------------------------------------------------------------------

from redskins_rule_spark.functions.wav import IMA_STEPS as _IMA_STEPS  # noqa: E402

_IMA_STEP_VALUES = ", ".join(f"({i}, {s})" for i, s in enumerate(_IMA_STEPS))


@query(
    "q217_wav_ima",
    oracle=f"""
    WITH RECURSIVE
    steps(sidx, step) AS (VALUES {_IMA_STEP_VALUES}),
    d AS (SELECT doc_id, length(text) AS clen
          FROM documents WHERE text IS NOT NULL),
    fold AS (
      SELECT doc_id, clen, 0 AS i,
             CAST((clen * 37) % 1024 - 512 AS BIGINT) AS pred,
             clen % 89 AS idx,
             CAST((clen * 37) % 1024 - 512 AS BIGINT) AS acc_sum,
             CAST((clen * 37) % 1024 - 512 AS BIGINT) AS acc_fp
      FROM d
      UNION ALL
      SELECT f.doc_id, f.clen, f.i + 1, t.npred, t.nidx,
             f.acc_sum + t.npred,
             f.acc_fp + (f.i + 2) * t.npred
      FROM fold f
      JOIN steps s ON s.sidx = f.idx,
      LATERAL (
        SELECT GREATEST(-32768, LEAST(32767,
                 f.pred + CASE WHEN nib >= 8 THEN -diff ELSE diff END))
                   AS npred,
               GREATEST(0, LEAST(88, f.idx +
                 CASE nib % 8 WHEN 4 THEN 2 WHEN 5 THEN 4
                              WHEN 6 THEN 6 WHEN 7 THEN 8
                              ELSE -1 END)) AS nidx
        FROM (SELECT (f.clen + 3 * f.i + f.i // 7) % 16 AS nib,
                     (s.step // 8)
                     + CASE WHEN ((f.clen + 3 * f.i + f.i // 7) % 16) % 2 = 1
                            THEN s.step // 4 ELSE 0 END
                     + CASE WHEN (((f.clen + 3 * f.i + f.i // 7) % 16) // 2) % 2 = 1
                            THEN s.step // 2 ELSE 0 END
                     + CASE WHEN (((f.clen + 3 * f.i + f.i // 7) % 16) // 4) % 2 = 1
                            THEN s.step ELSE 0 END AS diff)
      ) t
      WHERE f.i < 64
    )
    SELECT doc_id,
           CAST(8000 + 100 * (clen % 5) AS INTEGER) AS sr,
           CAST(65 AS BIGINT) AS n_samples,
           pred AS last_sample,
           acc_sum AS sample_sum,
           acc_fp AS sample_fp
    FROM fold WHERE i = 64
    """,
)
def q217_wav_ima(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_wav_ima_stats,
        with_wav_ima_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_wav_ima_stats(
            with_wav_ima_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q218: EXIF APP1 extraction — the metadata layer every image-crawl
# curation pipeline actually reads (orientation for rotation-aware
# dedup, declared dims for consistency screens, capture timestamp
# for recency mixes). The APP1 body is a real TIFF (JEITA CP-3451 /
# TIFF 6.0): byte-order mark, magic 42, IFD0 entry walk with
# out-of-line ASCII storage — BOTH endiannesses alternate across the
# corpus, and the declared-vs-actual dims check runs against the
# real SOF decode of the same payload. Oracle replays the synth
# formulas closed-form; strftime-free string assembly keeps the
# timestamp exact on both engines.
# ---------------------------------------------------------------------------

@query(
    "q218_exif_meta",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(clen % 8 + 1 AS INTEGER) AS orientation,
           CAST(8 * (clen % 5 + 1) AS INTEGER) AS exif_width,
           CAST(8 * (clen % 3 + 1) AS INTEGER) AS exif_height,
           '2024:01:' || lpad(CAST(clen % 28 + 1 AS VARCHAR), 2, '0')
             || ' ' || lpad(CAST(clen % 24 AS VARCHAR), 2, '0')
             || ':' || lpad(CAST(clen % 60 AS VARCHAR), 2, '0')
             || ':00' AS taken_at,
           clen % 2 = 1 AS big_endian,
           CAST(4 AS INTEGER) AS n_entries,
           TRUE AS dims_match
    FROM d
    """,
)
def q218_exif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_exif_stats,
        with_exif_jpeg_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_exif_stats(
            with_exif_jpeg_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q219: ID3v2.4 tag decode — the OTHER real-world tag version (v2.4
# made frame sizes syncsafe and added the footer + UTF-8 text). The
# version-dispatching walk decodes both; every payload carries one
# frame >= 128 bytes, where syncsafe and plain big-endian sizes
# genuinely diverge (a v2.3-style reader would mis-walk the tag), a
# third of the corpus carries a VERIFIED footer ('3DI' mirror of the
# header, forbidden to coexist with padding — enforced), and the
# audio framing layer must skip header + body + footer to find the
# first sync. Oracle replays the synth formulas closed-form.
# ---------------------------------------------------------------------------

@query(
    "q219_id3v24_tags",
    oracle="""
    SELECT doc_id,
           't' || CAST(clen % 97 AS VARCHAR) AS title,
           CAST(clen % 64 + 128 AS INTEGER) AS album_len,
           CAST(clen % 30 + 1 AS VARCHAR) AS track,
           clen % 3 = 0 AS has_footer,
           CAST(3 AS BIGINT) AS n_tag_frames,
           CAST(clen % 5 + 2 AS BIGINT) AS n_audio_frames
    FROM (SELECT doc_id, length(text) AS clen FROM documents
          WHERE text IS NOT NULL)
    """,
)
def q219_id3v24_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_id3v24_stats,
        with_tagged24_mp3_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_id3v24_stats(
            with_tagged24_mp3_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q220: compressed BMP (BI_RLE8) decode — the run-length profile of
# the one format this repo decodes with zero codec libraries. Every
# payload mixes run-friendly rows (encoded as run pairs) with
# run-hostile rows (encoded as word-aligned ABSOLUTE chunks), so both
# RLE encodings plus the EOL/EOF escapes sit on every decode path;
# the delta escape is pinned by pytest with a hand-built stream. The
# oracle replays the pixel formula closed-form over display-order
# raster positions — the position-weighted fingerprint fails if the
# bottom-up row reassembly or any escape is wrong.
# ---------------------------------------------------------------------------

@query(
    "q220_bmp_rle8",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 19 + 1 AS w,
                      length(text) % 9 + 1 AS h
               FROM documents WHERE text IS NOT NULL),
    f AS (SELECT doc_id, w, h,
                 CAST(SUM((CASE WHEN (u.i // w) % 3 = 0
                           THEN (clen + 7 * (u.i // w) + 3 * (u.i % w)) % 256
                           ELSE (clen + 5 * (u.i // w) + (u.i % w) // 4) % 256
                           END) * (1 + u.i % 64)) % 2147483647 AS BIGINT)
                     AS pixel_fp
          FROM g, unnest(generate_series(0, w * h - 1)) AS u(i)
          GROUP BY doc_id, w, h)
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           pixel_fp
    FROM f
    """,
)
def q220_bmp_rle8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_bmp_rle8_stats,
        with_bmp_rle8_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_bmp_rle8_stats(
            with_bmp_rle8_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q221: model-based quality filter — the fastText/DSIR-style linear
# classifier step real LLM curation pipelines run AFTER the heuristic
# rules (q16 quality_score / gopher_rules are rule-based; this is the
# learned-model slot). Hashed n-gram features (unigrams + bigrams,
# Weinberger et al. 2009 hashing trick) through fixed public logistic
# weights. Every compared value is exact-integer (the q63 contract):
# md5-based 32-bit feature hash, Knuth-multiplicative weights in
# [-500,500], integer score = logit×1000, deciles via integer cuts —
# the sigmoid never executes on either engine. Oracle replays the
# identical hash/weight pipeline in ANSI SQL (md5 hex → integer via
# positional digit expansion; DuckDB lists are 1-indexed).
# ---------------------------------------------------------------------------

_Q221_HEX = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(gram), {i + 1}, 1)) - 1)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)

@query(
    "q221_model_quality",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents WHERE text IS NOT NULL
    ), grams AS (
        SELECT doc_id,
               unnest(list_concat(
                   toks,
                   list_transform(range(1, len(toks)),
                                  i -> toks[i] || '_' || toks[i + 1])
               )) AS gram
        FROM docs
    ), feats AS (
        SELECT doc_id, {_Q221_HEX} AS h
        FROM grams
    ), agg AS (
        SELECT doc_id,
               COUNT(*) AS n_grams,
               SUM((1 - 2 * (h % 2))
                   * ((h % 64) * 2654435761 % 1001 - 500)) AS s
        FROM feats GROUP BY doc_id
    ), scored AS (
        SELECT d.doc_id,
               CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(100 + COALESCE(a.s, 0) AS BIGINT) AS score
        FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
        LEFT JOIN agg a USING (doc_id)
    )
    SELECT doc_id, n_grams, score,
           CAST((score >= -2197)::INT + (score >= -1386)::INT
              + (score >= -847)::INT + (score >= -405)::INT
              + (score >= 0)::INT + (score >= 405)::INT
              + (score >= 847)::INT + (score >= 1386)::INT
              + (score >= 2197)::INT AS INTEGER) AS p_bucket,
           score >= 0 AS keep
    FROM scored
    """,
)
def q221_model_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.text import hashed_logistic_quality

    docs = table(spark, sf_dir, "documents")
    return hashed_logistic_quality(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# q222: REAL CAVLC entropy decode through the H.264 seam — the first
# residual bits actually decoded (q209's I_PCM carried raw samples;
# this carries CODED coefficients). The profile is the spec's
# structural corridor: coeff_token is the 6-bit FLC of Table 9-5's
# nC >= 8 column (reached LEGALLY because each Intra_16x16 macroblock's
# left neighbor is I_PCM, which §9.2.1 counts as nN = 16), levels are
# unary level_prefix + adaptive suffix arithmetic (§9.2.2.1, including
# the 14/15/16+ escape sizes on the decode side), and TotalCoeff ==
# maxNumCoeff skips total_zeros/run_before entirely — so NO arbitrary
# VLC codebook is involved, every bit is spec-true. Remaining seam,
# raised by name: nC < 8 coeff_token tables, total_zeros/run_before
# (partial blocks), AC/chroma residuals, CABAC. Oracle replays the
# synth closed-form: trailing (clen+p)%4 coefficients are ±1, the rest
# 2 + (7clen+13p+3k)%3 signed by parity; PCM luma replays the q209
# pattern per macroblock.
# ---------------------------------------------------------------------------

@query(
    "q222_avc_cavlc",
    oracle="""
    WITH base AS (SELECT doc_id, length(text) AS clen,
                         length(text) % 3 + 1 AS n_pairs
                  FROM documents WHERE text IS NOT NULL),
    dc AS (SELECT doc_id,
                  CAST(SUM(v) AS BIGINT) AS dc_sum,
                  CAST(SUM((v + 8) * (16 * p + k + 1)) AS BIGINT) AS dc_fp
           FROM (SELECT doc_id, u.i // 16 AS p, u.i % 16 AS k,
                        (1 - 2 * ((clen + u.i // 16 + u.i % 16) % 2))
                        * (CASE WHEN u.i % 16 >= 16 - ((clen + u.i // 16) % 4)
                                THEN 1
                                ELSE 2 + (7 * clen + 13 * (u.i // 16)
                                          + 3 * (u.i % 16)) % 3 END) AS v,
                        clen
                 FROM base,
                      unnest(generate_series(0, n_pairs * 16 - 1)) AS u(i))
           GROUP BY doc_id),
    yfp AS (SELECT doc_id,
                   CAST(SUM(((clen + 7 * (u.i % 16) + 13 * ((u.i % 256) // 16)
                              + u.i // 256) % 255 + 1)
                            * (1 + u.i % 64)) % 2147483647 AS BIGINT) AS y_fp
            FROM base,
                 unnest(generate_series(0, n_pairs * 256 - 1)) AS u(i)
            GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(2 * b.n_pairs AS INTEGER) AS n_mbs,
           CAST(b.n_pairs AS INTEGER) AS n_cavlc,
           CAST(24 + b.clen % 5 AS INTEGER) AS qp,
           dc.dc_sum, dc.dc_fp, yfp.y_fp
    FROM base b JOIN dc USING (doc_id) JOIN yfp USING (doc_id)
    """,
)
def q222_avc_cavlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_avc_i16dc_stats,
        with_avc_i16dc_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_avc_i16dc_stats(
            with_avc_i16dc_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q223: the MP3 BIT RESERVOIR — cross-frame main_data reassembly
# (§2.4.1.7 main_data_begin), the transport mechanism virtually every
# real-world MP3 uses and the one structural gate left on the MP3
# framing layer (parse_mp3_granules raises on it by name). Frame n's
# main_data starts main_data_begin bytes BEFORE its own area — inside
# earlier frames' areas — and spills forward across frame boundaries;
# unclaimed bytes are ancillary filler a decoder must SKIP. The
# granule CONTENT replays q210's closed forms exactly (same count1
# quadruples, scalefactors, codebook selects), so the oracle is
# q210's SQL verbatim: the decoded values only hash equal if the
# reassembly is bit-exact — a scrambled reservoir scrambles the
# fingerprint. Remaining MP3 seam after this: big-values pair tables
# 2-31 (the 16x16 ISO codebooks + linbits escapes, deliberately NOT
# reconstructed from memory — no verifiable public copy ships in this
# container, and an unverifiable table would claim spec parity
# falsely) and float requantization.
# ---------------------------------------------------------------------------

@query(
    "q223_mp3_reservoir",
    oracle=f"""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    cells AS (SELECT doc_id, clen, f.i, gg.g, u.q,
                     {_Q210_VALS[0]} AS v, {_Q210_VALS[1]} AS w,
                     {_Q210_VALS[2]} AS x, {_Q210_VALS[3]} AS y
              FROM d,
                   unnest(generate_series(0, clen % 5 + 1)) AS f(i),
                   unnest([0, 1]) AS gg(g),
                   unnest(generate_series(0, (clen + f.i + gg.g) % 5)) AS u(q))
    SELECT doc_id,
           CAST(clen % 5 + 2 AS BIGINT) AS n_frames,
           CAST(COUNT(*) AS BIGINT) AS n_quads,
           CAST(SUM(v + w + x + y) AS BIGINT) AS sum_vals,
           CAST(SUM((v < 0)::INT + (w < 0)::INT + (x < 0)::INT
                    + (y < 0)::INT) AS BIGINT) AS n_neg,
           CAST(SUM((64 * i + 32 * g + q + 1)
                    * (v + 2 * w + 3 * x + 4 * y)) AS BIGINT) AS fp
    FROM cells
    GROUP BY doc_id, clen
    """,
)
def q223_mp3_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_mp3_reservoir_stats,
        with_mp3_reservoir_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_mp3_reservoir_stats(
            with_mp3_reservoir_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q224: AAC EIGHT_SHORT_SEQUENCE — the short-window grouped layout
# (§8.3.4), the gnarliest STRUCTURAL part of an ICS and the half of
# the q214 seam that needs no codebook: 4-bit max_sfb, the 7-bit
# scale_factor_grouping whose ZERO bits open new window groups, and
# section data repeated PER GROUP with 3-bit length escapes (long
# windows use 5-bit). Zero-codebook sections mean the whole element
# is fixed-width fields + run structure — really encoded, really
# decoded, group counts 1..8 and the 3-bit escape all exercised.
# Remaining AAC seam after this, raised by name and deliberately NOT
# reconstructed from memory (the scalefactor codebook is a 121-entry
# arbitrary Huffman table with no verifiable public copy in this
# container): nonzero sect_cb scalefactor/spectral codebooks and
# float reconstruction. Oracle replays the synth closed forms; the
# group count replays the zero-bit rule bit-by-bit in SQL.
# ---------------------------------------------------------------------------

@query(
    "q224_aac_short_windows",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    cells AS (SELECT doc_id, clen, f.f,
                     (clen + 5 * f.f) % 12 + 2 AS max_sfb,
                     (3 * clen + 11 * f.f) % 128 AS grp
              FROM d, unnest(generate_series(0, clen % 6 + 1)) AS f(f)),
    g AS (SELECT doc_id, clen, f, max_sfb,
                 1 + ((grp >> 0) & 1 = 0)::INT + ((grp >> 1) & 1 = 0)::INT
                   + ((grp >> 2) & 1 = 0)::INT + ((grp >> 3) & 1 = 0)::INT
                   + ((grp >> 4) & 1 = 0)::INT + ((grp >> 5) & 1 = 0)::INT
                   + ((grp >> 6) & 1 = 0)::INT AS n_groups
          FROM cells)
    SELECT doc_id,
           CAST(clen % 6 + 2 AS BIGINT) AS n_frames,
           CAST(SUM((clen + 7 * f) % 256) AS BIGINT) AS gain_sum,
           CAST(SUM(max_sfb) AS BIGINT) AS sfb_sum,
           CAST(SUM(n_groups * LEAST((clen + f) % 3 + 1, max_sfb))
                AS BIGINT) AS n_sections,
           CAST(SUM(n_groups) AS BIGINT) AS groups_sum,
           CAST(SUM((f + 1) * ((clen + 2 * f) % 16)) AS BIGINT) AS tag_fp
    FROM g
    GROUP BY doc_id, clen
    """,
)
def q224_aac_short_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_aac_short_stats,
        with_adts_short_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_aac_short_stats(
            with_adts_short_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q225: FLAC decode — the first codec in the engine where a REAL
# mainstream format decodes END TO END with zero carried spec
# tables: rice/unary entropy coding, binomial fixed predictors,
# CRC-8/CRC-16 integrity, and STREAMINFO's MD5-of-PCM letting the
# decoder PROVE losslessness per payload (md5_ok is a computed
# comparison, not an assumption). The corpus cycles FIXED orders
# 0-4 and VERBATIM subframes, rice partition orders 0/1, short last
# frames, and an amplified face whose order-4 residuals force the
# 0b1111 raw-escape partition path. The oracle replays the synth
# closed forms AND the encoder's k>=15 escape rule: residuals via
# LAG windows over the generated sample series, zigzag as exact
# integer CASE, escape iff max zigzag >= 2^15 — so the rice
# parameter choice itself is bound cross-engine. Remaining FLAC
# seam, raised by name: LPC subframes (encoder-chosen coefficient
# vectors; the rice/residual machinery is shared with them).
# ---------------------------------------------------------------------------

@query(
    "q225_flac_decode",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT doc_id, clen,
                 33 + clen % 71 AS total,
                 (33 + clen % 71 + 31) // 32 AS nf
          FROM d),
    s AS (SELECT doc_id, clen, total, nf,
                 unnest(generate_series(0, total - 1)) AS k
          FROM p),
    sv AS (SELECT doc_id, clen, total, nf, k,
                  k // 32 AS f, k % 32 AS i,
                  (CASE WHEN clen % 16 = 0 AND k < 32 THEN 8 ELSE 1 END)
                    * (((clen * 31 + 7 * k * k + 13 * k) % 4096) - 2048)
                    AS samp
           FROM s),
    cd AS (SELECT *,
                  CASE WHEN (f < nf - 1 OR total % 32 = 0)
                            OR (clen + f) % 6 = 5
                       THEN (clen + f) % 6 ELSE 0 END AS code,
                  CASE WHEN f < nf - 1 OR total % 32 = 0
                       THEN (clen + f) % 2 ELSE 0 END AS po
           FROM sv),
    r AS (SELECT doc_id, f, i, code, po,
                 samp - CASE code
                   WHEN 1 THEN lag(samp, 1) OVER w
                   WHEN 2 THEN 2 * lag(samp, 1) OVER w
                               - lag(samp, 2) OVER w
                   WHEN 3 THEN 3 * lag(samp, 1) OVER w
                               - 3 * lag(samp, 2) OVER w
                               + lag(samp, 3) OVER w
                   WHEN 4 THEN 4 * lag(samp, 1) OVER w
                               - 6 * lag(samp, 2) OVER w
                               + 4 * lag(samp, 3) OVER w
                               - lag(samp, 4) OVER w
                   ELSE 0 END AS resid
          FROM cd
          WINDOW w AS (PARTITION BY doc_id, f ORDER BY i)),
    parts AS (SELECT doc_id, f,
                     CASE WHEN po = 1 THEN i // 16 ELSE 0 END AS part,
                     MAX(CASE WHEN resid >= 0 THEN 2 * resid
                              ELSE -2 * resid - 1 END) AS max_u
              FROM r
              WHERE code <= 4 AND i >= code
              GROUP BY doc_id, f,
                       CASE WHEN po = 1 THEN i // 16 ELSE 0 END),
    esc AS (SELECT doc_id,
                   SUM(CASE WHEN max_u >= 32768 THEN 1 ELSE 0 END)
                     AS n_escapes
            FROM parts GROUP BY doc_id),
    ofp AS (SELECT doc_id, SUM((f + 1) * code) AS order_fp
            FROM (SELECT DISTINCT doc_id, f, code FROM cd)
            GROUP BY doc_id),
    agg AS (SELECT doc_id,
                   MAX(clen) AS clen,
                   MAX(total) AS total,
                   MAX(nf) AS nf,
                   MAX(CASE WHEN k = total - 1 THEN samp END)
                     AS last_sample,
                   SUM(samp) AS sample_sum,
                   SUM((k + 1) * samp) AS sample_fp
            FROM sv GROUP BY doc_id)
    SELECT a.doc_id,
           CAST(8000 + 100 * (a.clen % 5) AS INTEGER) AS sr,
           CAST(a.total AS BIGINT) AS n_samples,
           CAST(a.nf AS BIGINT) AS n_frames,
           CAST(a.last_sample AS BIGINT) AS last_sample,
           CAST(a.sample_sum AS BIGINT) AS sample_sum,
           CAST(a.sample_fp AS BIGINT) AS sample_fp,
           CAST(o.order_fp AS BIGINT) AS order_fp,
           CAST(e.n_escapes AS BIGINT) AS n_escapes,
           TRUE AS md5_ok
    FROM agg a
    JOIN ofp o ON o.doc_id = a.doc_id
    JOIN esc e ON e.doc_id = a.doc_id
    """,
)
def q225_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_flac_stats,
        with_flac_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_flac_stats(
            with_flac_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q226: FLAC LPC subframes — the seam q225 named, CLOSED. LPC is the
# subframe type real encoders emit for nearly all audio, and like
# the rest of FLAC it is table-free: quantized predictor
# coefficients ride VERBATIM in the bitstream (4-bit precision,
# 5-bit shift, order x precision-bit taps) and reconstruction is an
# integer dot product with an ARITHMETIC right shift. With this the
# mono/16-bit FLAC profile decodes COMPLETELY — the engine's first
# end-to-end real-world codec with zero carried spec tables and a
# per-payload MD5 losslessness proof. The oracle replays prediction
# in SQL (LAG windows, DuckDB's BIGINT >> is the same arithmetic
# shift as Python's) plus the encoder's k>=15 escape rule, binding
# coefficients, shift semantics, and rice parameter choice
# cross-engine. Remaining format surface (named in flac.py):
# stereo decorrelation, non-16-bit depths, variable blocking, rice2.
# ---------------------------------------------------------------------------

@query(
    "q226_flac_lpc",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT doc_id, clen,
                 33 + clen % 71 AS total,
                 (33 + clen % 71 + 31) // 32 AS nf
          FROM d),
    s AS (SELECT doc_id, clen, total, nf,
                 unnest(generate_series(0, total - 1)) AS k
          FROM p),
    sv AS (SELECT doc_id, clen, total, nf, k,
                  k // 32 AS f, k % 32 AS i,
                  ((clen * 31 + 7 * k * k + 13 * k) % 4096) - 2048 AS samp
           FROM s),
    cfg AS (SELECT *,
                   CASE WHEN (f < nf - 1 OR total % 32 = 0)
                             THEN (clen + f) % 3 + 1
                        WHEN total - 32 * (nf - 1) >= 2 THEN 1
                        ELSE -1 END AS ord,
                   CASE WHEN clen % 16 = 0 AND f = 0 THEN 2
                        ELSE 10 + (clen + f) % 4 END AS shft,
                   CASE WHEN f < nf - 1 OR total % 32 = 0
                        THEN (clen + f) % 2 ELSE 0 END AS po
            FROM sv),
    r AS (SELECT doc_id, f, i, ord, po,
                 samp - ((
                     ((clen * 7 + 11 * 1 + 17 * f) % 2048 - 1024)
                       * lag(samp, 1) OVER w
                   + CASE WHEN ord >= 2 THEN
                       ((clen * 7 + 11 * 2 + 17 * f) % 2048 - 1024)
                         * lag(samp, 2) OVER w ELSE 0 END
                   + CASE WHEN ord >= 3 THEN
                       ((clen * 7 + 11 * 3 + 17 * f) % 2048 - 1024)
                         * lag(samp, 3) OVER w ELSE 0 END
                 ) >> shft) AS resid
          FROM cfg
          WINDOW w AS (PARTITION BY doc_id, f ORDER BY i)),
    parts AS (SELECT doc_id, f,
                     CASE WHEN po = 1 THEN i // 16 ELSE 0 END AS part,
                     MAX(CASE WHEN resid >= 0 THEN 2 * resid
                              ELSE -2 * resid - 1 END) AS max_u
              FROM r
              WHERE ord >= 1 AND i >= ord
              GROUP BY doc_id, f,
                       CASE WHEN po = 1 THEN i // 16 ELSE 0 END),
    esc AS (SELECT doc_id,
                   SUM(CASE WHEN max_u >= 32768 THEN 1 ELSE 0 END)
                     AS n_escapes
            FROM parts GROUP BY doc_id),
    ofp AS (SELECT doc_id,
                   SUM((f + 1) * CASE WHEN ord = -1 THEN 5
                                      ELSE 8 + ord END) AS order_fp
            FROM (SELECT DISTINCT doc_id, f, ord FROM cfg)
            GROUP BY doc_id),
    agg AS (SELECT doc_id,
                   MAX(clen) AS clen,
                   MAX(total) AS total,
                   MAX(nf) AS nf,
                   MAX(CASE WHEN k = total - 1 THEN samp END)
                     AS last_sample,
                   SUM(samp) AS sample_sum,
                   SUM((k + 1) * samp) AS sample_fp
            FROM sv GROUP BY doc_id)
    SELECT a.doc_id,
           CAST(8000 + 100 * (a.clen % 5) AS INTEGER) AS sr,
           CAST(a.total AS BIGINT) AS n_samples,
           CAST(a.nf AS BIGINT) AS n_frames,
           CAST(a.last_sample AS BIGINT) AS last_sample,
           CAST(a.sample_sum AS BIGINT) AS sample_sum,
           CAST(a.sample_fp AS BIGINT) AS sample_fp,
           CAST(o.order_fp AS BIGINT) AS order_fp,
           CAST(e.n_escapes AS BIGINT) AS n_escapes,
           TRUE AS md5_ok
    FROM agg a
    JOIN ofp o ON o.doc_id = a.doc_id
    JOIN esc e ON e.doc_id = a.doc_id
    """,
)
def q226_flac_lpc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_flac_stats,
        with_flac_lpc_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_flac_stats(
            with_flac_lpc_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q227: FLAC stereo decorrelation — the multi-channel half of the
# format, and like everything else in FLAC it is pure integer
# algebra: left/side and right/side store the difference channel at
# bps+1 bits (side FIRST for right/side — an assignment-order trap a
# sloppy reader would miss), and mid/side stores the FLOOR average
# whose dropped parity bit is recovered from the side channel's low
# bit. All four channel assignments cycle per frame across the
# corpus; the MD5 proof covers the interleaved two-channel
# reconstruction, so a wrong inverse in ANY mode fails every stream.
# Oracle replays the closed forms; the mode/code fingerprints come
# from PARSED headers, binding the assignment decode cross-engine.
# ---------------------------------------------------------------------------

@query(
    "q227_flac_stereo",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT doc_id, clen,
                 33 + clen % 71 AS total,
                 (33 + clen % 71 + 31) // 32 AS nf
          FROM d),
    s AS (SELECT doc_id, clen, total, nf,
                 unnest(generate_series(0, total - 1)) AS k
          FROM p),
    sv AS (SELECT doc_id, clen, total, nf, k,
                  ((clen * 31 + 7 * k * k + 13 * k) % 4096) - 2048 AS l,
                  ((clen * 17 + 5 * k * k + 3 * k) % 4096) - 2048 AS r
           FROM s),
    fr AS (SELECT doc_id, clen, total, nf,
                  unnest(generate_series(0, nf - 1)) AS f
           FROM p),
    fx AS (SELECT doc_id,
                  SUM((f + 1) * ((clen + f) % 4)) AS mode_fp,
                  SUM((f + 1) * 2 *
                      CASE WHEN f < nf - 1 OR total % 32 = 0
                           THEN (clen + f) % 5
                           WHEN (clen + f) % 5 >= total - 32 * (nf - 1)
                           THEN 0
                           ELSE (clen + f) % 5 END) AS code_fp
           FROM fr GROUP BY doc_id),
    agg AS (SELECT doc_id,
                   MAX(clen) AS clen, MAX(total) AS total, MAX(nf) AS nf,
                   SUM(l) AS left_sum, SUM(r) AS right_sum,
                   SUM((k + 1) * l) AS left_fp,
                   SUM((k + 1) * r) AS right_fp
            FROM sv GROUP BY doc_id)
    SELECT a.doc_id,
           CAST(8000 + 100 * (a.clen % 5) AS INTEGER) AS sr,
           CAST(a.total AS BIGINT) AS n_samples,
           CAST(a.nf AS BIGINT) AS n_frames,
           CAST(a.left_sum AS BIGINT) AS left_sum,
           CAST(a.right_sum AS BIGINT) AS right_sum,
           CAST(a.left_fp AS BIGINT) AS left_fp,
           CAST(a.right_fp AS BIGINT) AS right_fp,
           CAST(x.mode_fp AS BIGINT) AS mode_fp,
           CAST(x.code_fp AS BIGINT) AS code_fp,
           TRUE AS md5_ok
    FROM agg a JOIN fx x ON x.doc_id = a.doc_id
    """,
)
def q227_flac_stereo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_flac_stereo_stats,
        with_flac_stereo_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_flac_stereo_stats(
            with_flac_stereo_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q228: SQ8 scalar-quantized ANN — the third compression point on the
# ANN spectrum next to IVF (q30: prune WHICH rows are scanned) and PQ
# (q97/q97b: compress to m codebook bytes): every dimension kept, but
# stored as one affine-quantized byte (FAISS SQ8 / Milvus
# SCALAR_QUANTIZER). Unlike PQ there is NO engine-local k-means — the
# "training" is per-dimension MIN/MAX, which are order-independent
# EXACT aggregates — so the TRAINED path itself is hash-checkable, not
# just a fixed-parameter face: the affine map
# ((v - mn) * 255.0) / (mx - mn) is a fixed three-op IEEE expression
# tree both engines evaluate bit-identically, FLOOR/clamp are exact,
# and from the codes on everything is pure INTEGER arithmetic (the
# scored output carries zero float risk, no ROUND contract needed).
# Scale: train = one narrow posexplode agg with map-side partial
# min/max collecting exactly dim rows of metadata; encode = row-local
# JVM codegen over the 4x-compressed column; top-k = pinned
# TakeOrderedAndProject. At 100 TB bounds train on a hash-sample and
# the integer-L2 scan never touches floats.
# ---------------------------------------------------------------------------

@query(
    "q228_sq8_ann",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         g AS (SELECT unnest(generate_series(1, 64)) AS i),
         b AS (SELECT g.i AS i, MIN(e.v[g.i]) AS mn, MAX(e.v[g.i]) AS mx
               FROM e, g GROUP BY g.i),
         qv AS (SELECT v FROM e WHERE vec_id = 0),
         qc AS (SELECT b.i AS i,
                       CASE WHEN b.mx = b.mn THEN 0
                            ELSE LEAST(255, GREATEST(0,
                                 CAST(FLOOR(((qv.v[b.i] - b.mn) * 255.0)
                                            / (b.mx - b.mn)) AS INTEGER)))
                       END AS qcode
                FROM b, qv),
         ec AS (SELECT e.vec_id, b.i AS i,
                       CASE WHEN b.mx = b.mn THEN 0
                            ELSE LEAST(255, GREATEST(0,
                                 CAST(FLOOR(((e.v[b.i] - b.mn) * 255.0)
                                            / (b.mx - b.mn)) AS INTEGER)))
                       END AS code
                FROM e, b),
         d AS (SELECT ec.vec_id,
                      SUM(CAST(ec.code - qc.qcode AS BIGINT)
                          * CAST(ec.code - qc.qcode AS BIGINT)) AS sq_dist
               FROM ec JOIN qc ON qc.i = ec.i
               GROUP BY ec.vec_id)
    SELECT vec_id, CAST(sq_dist AS BIGINT) AS sq_dist
    FROM d ORDER BY sq_dist, vec_id LIMIT 10
    """,
)
def q228_sq8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.similarity import (
        sq_encode,
        sq_quantize_query,
        sq_topk,
        train_sq_bounds,
    )

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    bounds = train_sq_bounds(emb, "embedding", dim=64)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    qcodes = sq_quantize_query(qvec, bounds)
    coded = sq_encode(emb, bounds, "embedding")
    return sq_topk(coded, qcodes, "vec_id", k=10)


# ---------------------------------------------------------------------------
# q229: baseline TIFF decode (strips + PackBits, both byte orders) —
# the raster format that completes the image family the way FLAC
# completed audio: fully algorithmic, zero carried spec tables. The
# IFD tag walk is the same structure the EXIF decoder (q218) walks
# inside JPEG APP1 — here it is the top-level container, with
# ascending-tag-order and strip-array validation, inline-vs-offset
# value resolution, and EVERY multi-byte integer flipping with the
# declared byte order (half the corpus is big-endian). Compression
# cycles none/PackBits and strip height cycles 1..3 (short final
# strips), so verbatim strips, run packets, literal packets, and
# multi-strip reassembly all sit on every corpus decode; the
# row-boundary rule (packets must not cross rows) is enforced, not
# assumed. Oracle replays the pixel closed form over raster
# positions; the position-weighted fingerprint fails if strip order,
# endianness dispatch, or either PackBits packet kind is wrong.
# ---------------------------------------------------------------------------

@query(
    "q229_tiff_packbits",
    oracle="""
    WITH g AS (SELECT doc_id, length(text) AS clen,
                      length(text) % 17 + 2 AS w,
                      length(text) % 7 + 2 AS h
               FROM documents WHERE text IS NOT NULL),
    f AS (SELECT doc_id, w, h, MAX(clen) AS clen,
                 CAST(SUM((CASE WHEN (u.i // w) % 3 = 0
                           THEN (clen + 11 * (u.i // w) + (u.i % w) // 5) % 256
                           ELSE (clen + 13 * (u.i // w) + 7 * (u.i % w)) % 256
                           END) * (1 + u.i % 97)) % 2147483647 AS BIGINT)
                     AS pixel_fp
          FROM g, unnest(generate_series(0, w * h - 1)) AS u(i)
          GROUP BY doc_id, w, h)
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST((h + clen % 3) // (clen % 3 + 1) AS INTEGER) AS n_strips,
           clen % 2 = 1 AS big_endian,
           clen % 3 <> 0 AS compressed,
           pixel_fp
    FROM f
    """,
)
def q229_tiff_packbits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_tiff_stats,
        with_tiff_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_tiff_stats(
            with_tiff_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q230: HyperLogLog — the classic cardinality sketch next to KMV
# (q43b) in the mergeable-sketch family, built integer-exact for
# cross-engine replay: the hash is the first 9 md5 hex digits parsed
# as a 36-bit int, rho comes from length(bin(w)) (a string op, not
# float log2), the harmonic sum is carried scaled by 2^31 so every
# term is an exact BIGINT, and alpha_m·m²/Σ2^-M_j collapses to one
# exactly-divisible division via the nested-floor identity (the
# rational alpha never becomes a float). The query proves the
# semilattice property the 100 TB deployment relies on: four
# per-shard states built independently, merged register-wise — the
# oracle computes registers globally, and the hashes only match
# because shard-max-then-merge == global max. Linear counting (the
# small-range float correction) is deliberately outside the hashed
# face (`hll_linear_count`); n_zero is emitted so any consumer can
# apply it.
# ---------------------------------------------------------------------------

_HLL_Q1 = (7213 * 64**3 * (1 << 31)) // (10000 * 64 + 10790)  # == 6239429023230


@query(
    "q230_hll_distinct",
    oracle=f"""
    WITH vals AS (SELECT DISTINCT l_orderkey AS v FROM lineitem),
         hx AS (SELECT v, substr(md5(CAST(v AS VARCHAR)), 1, 9) AS x
                FROM vals),
         h AS (SELECT v,
                      ((CAST(strpos('0123456789abcdef', x[1]) - 1 AS BIGINT) << 32)
                     + (CAST(strpos('0123456789abcdef', x[2]) - 1 AS BIGINT) << 28)
                     + (CAST(strpos('0123456789abcdef', x[3]) - 1 AS BIGINT) << 24)
                     + (CAST(strpos('0123456789abcdef', x[4]) - 1 AS BIGINT) << 20)
                     + (CAST(strpos('0123456789abcdef', x[5]) - 1 AS BIGINT) << 16)
                     + (CAST(strpos('0123456789abcdef', x[6]) - 1 AS BIGINT) << 12)
                     + (CAST(strpos('0123456789abcdef', x[7]) - 1 AS BIGINT) << 8)
                     + (CAST(strpos('0123456789abcdef', x[8]) - 1 AS BIGINT) << 4)
                     +  CAST(strpos('0123456789abcdef', x[9]) - 1 AS BIGINT)) AS hv
               FROM hx),
         br AS (SELECT hv % 64 AS b,
                       CASE WHEN hv // 64 = 0 THEN 31
                            ELSE 31 - length(bin(hv // 64)) END AS rho
                FROM h),
         regs AS (SELECT g.j AS j, COALESCE(MAX(br.rho), 0) AS r
                  FROM (SELECT unnest(generate_series(0, 63)) AS j) g
                  LEFT JOIN br ON br.b = g.j
                  GROUP BY g.j),
         agg AS (SELECT SUM(r * (j + 1)) AS register_fp,
                        SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS n_zero,
                        SUM(CAST(1 AS BIGINT) << (31 - r)) AS harmonic_scaled
                 FROM regs),
         ex AS (SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct,
                       COUNT(DISTINCT l_suppkey % 4) AS n_shards
                FROM lineitem)
    SELECT CAST(64 AS BIGINT) AS m,
           CAST(ex.n_shards AS BIGINT) AS n_shards,
           CAST(agg.register_fp AS BIGINT) AS register_fp,
           CAST(agg.n_zero AS BIGINT) AS n_zero,
           CAST(agg.harmonic_scaled AS BIGINT) AS harmonic_scaled,
           CAST(({_HLL_Q1} - {_HLL_Q1} % agg.harmonic_scaled)
                / agg.harmonic_scaled AS BIGINT) AS hll_est,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
           ABS(CAST(({_HLL_Q1} - {_HLL_Q1} % agg.harmonic_scaled)
                    / agg.harmonic_scaled AS BIGINT) - ex.exact_distinct) * 10
               <= 3 * ex.exact_distinct AS est_ok
    FROM agg, ex
    """,
)
def q230_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.sketch import (
        hll_estimate,
        hll_harmonic_scaled,
        hll_merge,
        hll_n_zero,
        hll_state,
    )

    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_suppkey") % 4).alias("shard"), "l_orderkey"
    )
    states = hll_state(li, ["shard"], "l_orderkey", p=6)
    merged = states.agg(
        F.aggregate(
            F.collect_list("hll"),
            F.array_repeat(F.lit(0), 64),
            lambda acc, st: hll_merge(acc, st),
        ).alias("hll"),
        F.count(F.lit(1)).cast("long").alias("n_shards"),
    )
    exact = table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_orderkey").alias("exact_distinct")
    )
    reg_fp = F.aggregate(
        F.zip_with(
            F.col("hll"),
            F.sequence(F.lit(1), F.lit(64)),
            lambda r, i: (r * i).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    est = hll_estimate(F.col("hll"), p=6)
    return (
        merged.crossJoin(F.broadcast(exact))
        .select(
            F.lit(64).cast("long").alias("m"),
            F.col("n_shards"),
            reg_fp.alias("register_fp"),
            hll_n_zero(F.col("hll")).cast("long").alias("n_zero"),
            hll_harmonic_scaled(F.col("hll"), p=6).alias("harmonic_scaled"),
            est.alias("hll_est"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            (
                F.abs(est - F.col("exact_distinct")) * 10
                <= F.col("exact_distinct") * 3
            ).alias("est_ok"),
        )
    )


# ---------------------------------------------------------------------------
# q231: G.711 mu-law/A-law decode — the telephony companding codec
# (WAV fmt tags 7/6), the audio family's second REAL lossy
# reconstruction next to IMA-ADPCM (q217). Unlike the Huffman-table
# seams, G.711's mapping is GENERATED by a short segment algorithm
# (8 log segments x 16 steps, sign + exponent + mantissa — the
# public-domain Sun g711.c formulation), so there is no codebook to
# carry; conformance evidence is in code: encode∘decode is the
# identity on all 256 codes of both laws (pinned, with the one true
# exception — mu-law 0x7F is "negative zero", decoding to 0 which
# re-encodes as 0xFF), and quantization error is segment-bounded
# (644 mu / 512 A at clip, the textbook values). The oracle replays
# compress AND expand per sample in SQL — exponent via
# length(bin(x)), variable shifts as (1 << e) products, all integers.
# Two fingerprints: codes pin the container walk, reconstructions
# pin the expansion algebra; per-sample independence means no
# recursive CTE is needed (contrast q217's predictor fold).
# ---------------------------------------------------------------------------

@query(
    "q231_wav_g711",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT doc_id, clen, clen % 49 + 16 AS n FROM d),
    s AS (SELECT doc_id, clen, n, u.k AS k,
                 ((clen * 31 + 7 * u.k * u.k + 13 * u.k) % 65536) - 32768 AS sv
          FROM p, unnest(generate_series(0, n - 1)) AS u(k)),
    -- DuckDB's // truncates toward zero; the A-law 13-bit shift is an
    -- ARITHMETIC right shift (floor), so p13 spells floor division out
    s2 AS (SELECT *,
                  CASE WHEN sv >= 0 THEN sv // 8
                       ELSE -((7 - sv) // 8) END AS p13
           FROM s),
    s3 AS (SELECT *,
                  CASE WHEN p13 >= 0 THEN p13 ELSE -p13 - 1 END AS pm,
                  CASE WHEN p13 >= 0 THEN 213 ELSE 85 END AS amask,
                  LEAST(CASE WHEN sv < 0 THEN -sv ELSE sv END, 32635) + 132
                      AS umag
           FROM s2),
    s4 AS (SELECT *,
                  CASE WHEN pm <= 31 THEN 0 WHEN pm <= 63 THEN 1
                       WHEN pm <= 127 THEN 2 WHEN pm <= 255 THEN 3
                       WHEN pm <= 511 THEN 4 WHEN pm <= 1023 THEN 5
                       WHEN pm <= 2047 THEN 6 WHEN pm <= 4095 THEN 7
                       ELSE 8 END AS seg8,
                  length(bin(umag // 128)) - 1 AS uexp
           FROM s3),
    enc AS (SELECT doc_id, clen, n, k,
                   CASE WHEN clen % 2 = 0 THEN
                     255 - ((CASE WHEN sv < 0 THEN 128 ELSE 0 END)
                            + uexp * 16
                            + (umag // (CAST(1 AS BIGINT) << (uexp + 3))) % 16)
                   ELSE
                     xor(CASE WHEN seg8 >= 8 THEN 127
                              ELSE seg8 * 16 +
                                   (CASE WHEN seg8 < 2 THEN (pm // 2) % 16
                                         ELSE (pm // (CAST(1 AS BIGINT) << seg8)) % 16
                                    END)
                         END, amask)
                   END AS code
            FROM s4),
    dec AS (SELECT doc_id, clen, n, k, code,
                   CASE WHEN clen % 2 = 0 THEN
                     CASE WHEN (255 - code) >= 128 THEN -1 ELSE 1 END *
                     ((((255 - code) % 16) * 8 + 132)
                      * (CAST(1 AS BIGINT) << (((255 - code) // 16) % 8)) - 132)
                   ELSE
                     CASE WHEN xor(code, 85) >= 128 THEN 1 ELSE -1 END *
                     (CASE WHEN (xor(code, 85) // 16) % 8 = 0
                             THEN (xor(code, 85) % 16) * 16 + 8
                           WHEN (xor(code, 85) // 16) % 8 = 1
                             THEN (xor(code, 85) % 16) * 16 + 264
                           ELSE ((xor(code, 85) % 16) * 16 + 264)
                                * (CAST(1 AS BIGINT)
                                   << ((xor(code, 85) // 16) % 8 - 1))
                      END)
                   END AS recon
            FROM enc)
    SELECT doc_id,
           CASE WHEN MAX(clen) % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS law,
           CAST(8000 + 8000 * (MAX(clen) % 2) AS INTEGER) AS sr,
           CAST(MAX(n) AS BIGINT) AS n_samples,
           CAST(SUM((k + 1) * code) AS BIGINT) AS code_fp,
           CAST(SUM(recon) AS BIGINT) AS recon_sum,
           CAST(SUM((k + 1) * recon) AS BIGINT) AS recon_fp
    FROM dec GROUP BY doc_id
    """,
)
def q231_wav_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_wav_g711_stats,
        with_wav_g711_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_wav_g711_stats(
            with_wav_g711_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q232: QOI decode — the 2021 "Quite OK Image" format, the modern
# member of the zero-carried-tables tier (FLAC/TIFF/G.711): eight
# byte-rules, a 64-slot hash index, wrapping two/six-bit deltas, and
# runs. The decoder runs the full six-op state machine; the corpus
# encoder deliberately disables the INDEX op (a conforming encoder
# choice — the spec constrains decoders, not encoder op selection)
# because an index hit depends on 64-slot table liveness, which is
# history-dependent in a way no per-doc SQL formula should replay;
# pytest drives INDEX/RGBA/long-run splitting with hand-built
# streams. Each payload cycles RGB-jump/run/DIFF/LUMA with jump
# deltas forced outside LUMA range, so the op tallies and byte
# length are closed-form; every pixel is a prefix sum of per-cycle
# constants, which the oracle replays with window cumsums. px_fp
# pins decoded values (losslessness), the tallies pin the encoder's
# chunk choices, byte_len pins the layout.
# ---------------------------------------------------------------------------

@query(
    "q232_qoi",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    cy AS (SELECT doc_id, clen, clen % 13 + 3 AS nc, u.c AS c,
                  64 + (clen + 17 * u.c) % 128 AS jr,
                  64 + (clen * 3 + 29 * u.c) % 128 AS jg,
                  64 + (clen * 5 + 41 * u.c) % 128 AS jb,
                  (clen + u.c) % 3 + 1 AS run_len,
                  (clen + 3 * u.c) % 29 + 3 AS dg
           FROM d, unnest(generate_series(0, clen % 13 + 2)) AS u(c)),
    cy2 AS (SELECT *,
                   dg + (c % 15) - 7 AS dr,
                   dg + (clen + c) % 15 - 7 AS db,
                   -- cumulative channel bases BEFORE this cycle's jump
                   COALESCE(SUM(jr + 1 + dg + (c % 15) - 7)
                       OVER (PARTITION BY doc_id ORDER BY c
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS rbase,
                   COALESCE(SUM(jg + 1 + dg)
                       OVER (PARTITION BY doc_id ORDER BY c
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS gbase,
                   COALESCE(SUM(jb + 1 + dg + (clen + c) % 15 - 7)
                       OVER (PARTITION BY doc_id ORDER BY c
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS bbase,
                   -- pixel offset of this cycle's first pixel
                   COALESCE(SUM(3 + (clen + c) % 3 + 1)
                       OVER (PARTITION BY doc_id ORDER BY c
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS poff
            FROM cy),
    px AS (SELECT doc_id, clen, nc, c, run_len,
                  poff + u.j AS k,
                  CASE WHEN u.j <= run_len THEN (rbase + jr) % 256
                       WHEN u.j = run_len + 1 THEN (rbase + jr + 1) % 256
                       ELSE (rbase + jr + 1 + dr) % 256 END AS r,
                  CASE WHEN u.j <= run_len THEN (gbase + jg) % 256
                       WHEN u.j = run_len + 1 THEN (gbase + jg + 1) % 256
                       ELSE (gbase + jg + 1 + dg) % 256 END AS g,
                  CASE WHEN u.j <= run_len THEN (bbase + jb) % 256
                       WHEN u.j = run_len + 1 THEN (bbase + jb + 1) % 256
                       ELSE (bbase + jb + 1 + db) % 256 END AS b
           FROM cy2, unnest(generate_series(0, run_len + 2)) AS u(j))
    SELECT doc_id,
           CAST(MAX(k) + 1 AS INTEGER) AS width,
           CAST(MAX(k) + 1 AS BIGINT) AS n_px,
           CAST(14 + 8 * MAX(nc) + 8 AS BIGINT) AS byte_len,
           CAST(MAX(nc) AS BIGINT) AS n_rgb,
           CAST(MAX(nc) AS BIGINT) AS n_run_chunks,
           CAST(MAX(nc) AS BIGINT) AS n_diff,
           CAST(MAX(nc) AS BIGINT) AS n_luma,
           CAST(0 AS BIGINT) AS n_index,
           CAST(SUM((k + 1) * (r * 65536 + g * 256 + b)) AS BIGINT) AS px_fp
    FROM px GROUP BY doc_id
    """,
)
def q232_qoi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_qoi_stats,
        with_qoi_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_qoi_stats(
            with_qoi_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q233: streaming HLL — the q230 semilattice proof lifted to the
# streaming layer (the q173/KMV pattern): per-event-type HLL register
# states maintained across two landing waves through the real
# foreachBatch shell + checkpoint, folded by register-wise max.
# Because the merge is exactly lossless, the maintained state after
# any number of micro-batches MUST equal the one-pass sketch of
# everything landed — so the oracle is q230's global-register SQL
# grouped by key, and the hash only matches if batch-max-then-merge
# == global max ACROSS batch boundaries (waves split by event_id
# parity; the fold result is split-independent by associativity/
# commutativity/idempotence). Estimate and harmonic sum stay in the
# exact-integer contract; register_fp binds all 64 registers per key.
# ---------------------------------------------------------------------------

@query(
    "q233_stream_hll_replay",
    oracle=f"""
    WITH vals AS (SELECT DISTINCT event_type, user_id FROM events
                  WHERE user_id IS NOT NULL),
         hx AS (SELECT event_type,
                       substr(md5(CAST(user_id AS VARCHAR)), 1, 9) AS x
                FROM vals),
         h AS (SELECT event_type,
                      ((CAST(strpos('0123456789abcdef', x[1]) - 1 AS BIGINT) << 32)
                     + (CAST(strpos('0123456789abcdef', x[2]) - 1 AS BIGINT) << 28)
                     + (CAST(strpos('0123456789abcdef', x[3]) - 1 AS BIGINT) << 24)
                     + (CAST(strpos('0123456789abcdef', x[4]) - 1 AS BIGINT) << 20)
                     + (CAST(strpos('0123456789abcdef', x[5]) - 1 AS BIGINT) << 16)
                     + (CAST(strpos('0123456789abcdef', x[6]) - 1 AS BIGINT) << 12)
                     + (CAST(strpos('0123456789abcdef', x[7]) - 1 AS BIGINT) << 8)
                     + (CAST(strpos('0123456789abcdef', x[8]) - 1 AS BIGINT) << 4)
                     +  CAST(strpos('0123456789abcdef', x[9]) - 1 AS BIGINT)) AS hv
               FROM hx),
         br AS (SELECT event_type, hv % 64 AS b,
                       CASE WHEN hv // 64 = 0 THEN 31
                            ELSE 31 - length(bin(hv // 64)) END AS rho
                FROM h),
         keys AS (SELECT DISTINCT event_type FROM vals),
         regs AS (SELECT k.event_type, g.j AS j, COALESCE(MAX(br.rho), 0) AS r
                  FROM keys k
                  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
                  LEFT JOIN br ON br.event_type = k.event_type AND br.b = g.j
                  GROUP BY k.event_type, g.j)
    SELECT event_type,
           CAST(SUM(r * (j + 1)) AS BIGINT) AS register_fp,
           CAST(SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           CAST(SUM(CAST(1 AS BIGINT) << (31 - r)) AS BIGINT) AS harmonic_scaled,
           CAST(({_HLL_Q1} - {_HLL_Q1} % SUM(CAST(1 AS BIGINT) << (31 - r)))
                / SUM(CAST(1 AS BIGINT) << (31 - r)) AS BIGINT) AS approx_users
    FROM regs GROUP BY event_type
    """,
)
def q233_stream_hll_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.operators.sketch import (
        hll_estimate,
        hll_harmonic_scaled,
        hll_merge,
        hll_n_zero,
        hll_state,
    )
    from redskins_rule_spark.streaming.ops import (
        run_incremental_sketch_view,
        stream_from_files,
    )

    ev = table(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id"
    )
    tag = uuid.uuid4().hex[:8]
    root = tempfile.mkdtemp(prefix=f"q233_{tag}_")
    land, ckpt = os.path.join(root, "landing"), os.path.join(root, "ckpt")
    view = f"q233_view_{tag}"
    schema = "event_type string, user_id long"

    def build_states(batch_df: DataFrame) -> DataFrame:
        return hll_state(batch_df, ["event_type"], "user_id", p=6, out_col="hll")

    for wave_filter in (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1):
        ev.where(wave_filter).select("event_type", "user_id").write.mode(
            "append"
        ).parquet(land)
        run_incremental_sketch_view(
            stream_from_files(spark, land, schema),
            build_states, ["event_type"], "hll",
            hll_merge,
            ckpt, view,
        )
    reg_fp = F.aggregate(
        F.zip_with(
            F.col("hll"),
            F.sequence(F.lit(1), F.lit(64)),
            lambda r, i: (r * i).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return spark.table(view).select(
        "event_type",
        reg_fp.alias("register_fp"),
        hll_n_zero(F.col("hll")).cast("long").alias("n_zero"),
        hll_harmonic_scaled(F.col("hll"), p=6).alias("harmonic_scaled"),
        hll_estimate(F.col("hll"), p=6).alias("approx_users"),
    )


# ---------------------------------------------------------------------------
# q234: deterministic corpus shuffle — the data-ordering operator
# every pretraining pipeline runs once per epoch. A 4-round Feistel
# bijection over the dense global row index gives each (seed, epoch)
# pair a uniform-quality global permutation that is (a) closed-form
# integer math — whole-stage-codegen'd, zero data passes of its own,
# reproducible across runs/engines/cluster sizes — and (b) physically
# realized with ONE range exchange + a metadata prefix sum (the
# with_global_index machinery), never a single-partition window.
# key_next (the NEXT epoch's key, epoch+1) rides along as pure column
# math to pin epoch-dependence cross-engine: the oracle replays the
# identical algebra via feistel_key_sql (operators/indexing.py is the
# single source of the round constants). Reference parity: the
# reference pipeline has no ordering op — extension tier (training-
# data pipeline operators, SURVEY §2 extension rows).
# ---------------------------------------------------------------------------

def _q234_oracle() -> str:
    from redskins_rule_spark.operators.indexing import feistel_key_sql

    k3 = feistel_key_sql("idx", seed=7, epoch=3)
    k4 = feistel_key_sql("idx", seed=7, epoch=4)
    return f"""
    WITH d AS (SELECT doc_id,
                      row_number() OVER (ORDER BY doc_id) - 1 AS idx
               FROM documents),
    k AS (SELECT doc_id,
                 {k3} AS shuffle_key,
                 {k4} AS key_next
          FROM d)
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY shuffle_key) - 1 AS BIGINT)
             AS epoch_pos,
           CAST(shuffle_key AS BIGINT) AS shuffle_key,
           CAST(key_next AS BIGINT) AS key_next
    FROM k
    """


@query("q234_corpus_shuffle", oracle=_q234_oracle())
def q234_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.indexing import (
        corpus_shuffle,
        feistel_key_column,
        with_global_index,
    )

    docs = table(spark, sf_dir, "documents", spread=True).select("doc_id")
    indexed = with_global_index(docs, ["doc_id"], index_col="idx")
    shuffled = corpus_shuffle(indexed, "idx", seed=7, epoch=3)
    return shuffled.select(
        "doc_id",
        F.col("epoch_pos").cast("long").alias("epoch_pos"),
        F.col("shuffle_key").cast("long").alias("shuffle_key"),
        feistel_key_column("idx", seed=7, epoch=4)
        .cast("long")
        .alias("key_next"),
    )


# ---------------------------------------------------------------------------
# q235: FLAC bit depths — the depth seam q226 named, CLOSED for every
# byte-aligned depth (8/24/32; 16 is the q225-q227 corpus). Depth
# changes four real things the oracle binds cross-engine: the
# STREAMINFO/frame-header sample-size codes, the warmup/verbatim
# sample width, the MD5 PCM packing (1/3/4 bytes little-endian), and
# the residual MAGNITUDE regime — at 24/32-bit the raw-escape
# partitions run at widths (24-31 bits) the 16-bit corpus never
# reaches, and at 8-bit they never fire. The oracle replays the
# depth-scaled sample closed form, the k>=15 escape rule, AND the
# rice parameter choice itself (k = bitlength(max_u)-1 via DuckDB
# bin()), fingerprinted as Σ (f+1)(p+1)k. 12/20-bit stay named
# ValueErrors (non-byte-aligned PCM makes the MD5 packing ambiguous).
# ---------------------------------------------------------------------------

_FLAC_EXT_SELECT = """
    SELECT a.doc_id,
           CAST(8000 + 100 * (a.clen % 5) AS INTEGER) AS sr,
           CAST(a.bps AS INTEGER) AS bps,
           CAST(a.total AS BIGINT) AS n_samples,
           CAST(a.nf AS BIGINT) AS n_frames,
           CAST(a.last_sample AS BIGINT) AS last_sample,
           CAST(a.sample_sum AS BIGINT) AS sample_sum,
           CAST(a.sample_fp AS BIGINT) AS sample_fp,
           CAST(o.order_fp AS BIGINT) AS order_fp,
           CAST(o.bs_fp AS BIGINT) AS bs_fp,
           CAST(COALESCE(e.k_fp, 0) AS BIGINT) AS k_fp,
           CAST(COALESCE(e.n_escapes, 0) AS BIGINT) AS n_escapes,
           TRUE AS md5_ok
    FROM agg a
    JOIN ofp o ON o.doc_id = a.doc_id
    LEFT JOIN esc e ON e.doc_id = a.doc_id
"""


@query(
    "q235_flac_depths",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    cfg0 AS (SELECT doc_id, clen,
                    CASE clen % 3 WHEN 0 THEN 8 WHEN 1 THEN 24
                         ELSE 32 END AS bps,
                    33 + clen % 71 AS total,
                    (33 + clen % 71 + 31) // 32 AS nf
             FROM d),
    cfg AS (SELECT *,
                   CASE bps WHEN 8 THEN 8 WHEN 24 THEN 524288
                        ELSE 8388608 END AS amp,
                   CASE bps WHEN 8 THEN 1 WHEN 24 THEN 256
                        ELSE 4096 END AS m
            FROM cfg0),
    s AS (SELECT doc_id, clen, bps, total, nf, amp, m,
                 unnest(generate_series(0, total - 1)) AS k
          FROM cfg),
    sv AS (SELECT doc_id, clen, bps, total, nf, k,
                  k // 32 AS f, k % 32 AS i,
                  ((clen * 31 + 7 * k * k + 13 * k) * m % (2 * amp)) - amp
                    AS samp
           FROM s),
    cd AS (SELECT *,
                  CASE WHEN (f < nf - 1 OR total % 32 = 0)
                            OR (clen + f) % 6 = 5
                       THEN (clen + f) % 6 ELSE 0 END AS code,
                  CASE WHEN f < nf - 1 OR total % 32 = 0
                       THEN (clen + f) % 2 ELSE 0 END AS po,
                  CASE WHEN f < nf - 1 OR total % 32 = 0
                       THEN 32 ELSE total - 32 * (nf - 1) END AS bs
           FROM sv),
    r AS (SELECT doc_id, f, i, code, po, bs,
                 samp - CASE code
                   WHEN 1 THEN lag(samp, 1) OVER w
                   WHEN 2 THEN 2 * lag(samp, 1) OVER w
                               - lag(samp, 2) OVER w
                   WHEN 3 THEN 3 * lag(samp, 1) OVER w
                               - 3 * lag(samp, 2) OVER w
                               + lag(samp, 3) OVER w
                   WHEN 4 THEN 4 * lag(samp, 1) OVER w
                               - 6 * lag(samp, 2) OVER w
                               + 4 * lag(samp, 3) OVER w
                               - lag(samp, 4) OVER w
                   ELSE 0 END AS resid
          FROM cd
          WINDOW w AS (PARTITION BY doc_id, f ORDER BY i)),
    parts AS (SELECT doc_id, f,
                     CASE WHEN po = 1 THEN i // (bs // 2) ELSE 0 END AS part,
                     MAX(CASE WHEN resid >= 0 THEN 2 * resid
                              ELSE -2 * resid - 1 END) AS max_u
              FROM r
              WHERE code <= 4 AND i >= code
              GROUP BY doc_id, f,
                       CASE WHEN po = 1 THEN i // (bs // 2) ELSE 0 END),
    esc AS (SELECT doc_id,
                   SUM(CASE WHEN max_u >= 32768 THEN 1 ELSE 0 END)
                     AS n_escapes,
                   SUM(CASE WHEN max_u >= 32768 THEN 0
                            ELSE (f + 1) * (part + 1)
                                 * (length(bin(max_u)) - 1) END) AS k_fp
            FROM parts GROUP BY doc_id),
    ofp AS (SELECT doc_id, SUM((f + 1) * code) AS order_fp,
                   SUM((f + 1) * bs) AS bs_fp
            FROM (SELECT DISTINCT doc_id, f, code, bs FROM cd)
            GROUP BY doc_id),
    agg AS (SELECT doc_id,
                   MAX(clen) AS clen,
                   MAX(bps) AS bps,
                   MAX(total) AS total,
                   MAX(nf) AS nf,
                   MAX(CASE WHEN k = total - 1 THEN samp END)
                     AS last_sample,
                   SUM(samp) AS sample_sum,
                   SUM((k + 1) * samp) AS sample_fp
            FROM sv GROUP BY doc_id)
    """ + _FLAC_EXT_SELECT,
)
def q235_flac_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_flac_stats_ext,
        with_flac_depths_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_flac_stats_ext(
            with_flac_depths_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q236: FLAC rice2 (coding method 01, 5-bit parameters) — the last
# entropy-coding seam in the format, CLOSED. The corpus mixes rice
# and rice2 frames in one 24-bit stream: rice frames raw-escape past
# zigzag 2^15 while rice2 frames encode k = 15..23 — parameter values
# IMPOSSIBLE under 4-bit rice — and never escape (their threshold is
# 2^31). The oracle replays BOTH per-frame escape rules and the
# k-choice fingerprint, so any coding-method or parameter-width
# confusion is hash-caught. With this, FLAC entropy coding is
# complete: rice, rice2, and the raw-escape path all oracle-bound.
# ---------------------------------------------------------------------------

@query(
    "q236_flac_rice2",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    cfg AS (SELECT doc_id, clen,
                   33 + clen % 71 AS total,
                   (33 + clen % 71 + 31) // 32 AS nf
            FROM d),
    s AS (SELECT doc_id, clen, total, nf,
                 unnest(generate_series(0, total - 1)) AS k
          FROM cfg),
    sv AS (SELECT doc_id, clen, total, nf, k,
                  k // 32 AS f, k % 32 AS i,
                  ((clen * 31 + 7 * k * k + 13 * k) * 256 % 1048576)
                    - 524288 AS samp
           FROM s),
    cd AS (SELECT *,
                  CASE WHEN (f < nf - 1 OR total % 32 = 0)
                            OR (clen + f) % 6 = 5
                       THEN (clen + f) % 6 ELSE 0 END AS code,
                  CASE WHEN f < nf - 1 OR total % 32 = 0
                       THEN (clen + f) % 2 ELSE 0 END AS po,
                  CASE WHEN f < nf - 1 OR total % 32 = 0
                       THEN 32 ELSE total - 32 * (nf - 1) END AS bs,
                  (clen + f) % 3 = 0 AS r2
           FROM sv),
    r AS (SELECT doc_id, f, i, code, po, bs, r2,
                 samp - CASE code
                   WHEN 1 THEN lag(samp, 1) OVER w
                   WHEN 2 THEN 2 * lag(samp, 1) OVER w
                               - lag(samp, 2) OVER w
                   WHEN 3 THEN 3 * lag(samp, 1) OVER w
                               - 3 * lag(samp, 2) OVER w
                               + lag(samp, 3) OVER w
                   WHEN 4 THEN 4 * lag(samp, 1) OVER w
                               - 6 * lag(samp, 2) OVER w
                               + 4 * lag(samp, 3) OVER w
                               - lag(samp, 4) OVER w
                   ELSE 0 END AS resid
          FROM cd
          WINDOW w AS (PARTITION BY doc_id, f ORDER BY i)),
    parts AS (SELECT doc_id, f, r2,
                     CASE WHEN po = 1 THEN i // (bs // 2) ELSE 0 END AS part,
                     MAX(CASE WHEN resid >= 0 THEN 2 * resid
                              ELSE -2 * resid - 1 END) AS max_u
              FROM r
              WHERE code <= 4 AND i >= code
              GROUP BY doc_id, f, r2,
                       CASE WHEN po = 1 THEN i // (bs // 2) ELSE 0 END),
    pk AS (SELECT doc_id, f, part, max_u,
                  CASE WHEN r2 THEN max_u >= 2147483648
                       ELSE max_u >= 32768 END AS esc
           FROM parts),
    esc AS (SELECT doc_id,
                   SUM(CASE WHEN esc THEN 1 ELSE 0 END) AS n_escapes,
                   SUM(CASE WHEN esc THEN 0
                            ELSE (f + 1) * (part + 1)
                                 * (length(bin(max_u)) - 1) END) AS k_fp
            FROM pk GROUP BY doc_id),
    ofp AS (SELECT doc_id, SUM((f + 1) * code) AS order_fp,
                   SUM((f + 1) * bs) AS bs_fp
            FROM (SELECT DISTINCT doc_id, f, code, bs FROM cd)
            GROUP BY doc_id),
    agg AS (SELECT doc_id,
                   MAX(clen) AS clen,
                   24 AS bps,
                   MAX(total) AS total,
                   MAX(nf) AS nf,
                   MAX(CASE WHEN k = total - 1 THEN samp END)
                     AS last_sample,
                   SUM(samp) AS sample_sum,
                   SUM((k + 1) * samp) AS sample_fp
            FROM sv GROUP BY doc_id)
    """ + _FLAC_EXT_SELECT,
)
def q236_flac_rice2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_flac_stats_ext,
        with_flac_rice2_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_flac_stats_ext(
            with_flac_rice2_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q237: FLAC variable blocking — the last structural seam in the
# mono format, CLOSED. Variable streams change three header-level
# facts the oracle binds: the blocking-strategy bit, the coded
# number (the frame's starting SAMPLE index instead of the frame
# index — the decoder checks it is cumulative), and STREAMINFO's
# true min/max blocksizes. The corpus cycles 16/24/32-sample frames
# with a remainder tail; bs_fp = Σ (f+1)·blocksize pins the frame
# layout, and the shared residual/escape machinery (rice, k>=15)
# runs across the varying partition widths. With q225-q227 + q235 +
# q236 + this, every named FLAC seam except >2-channel layouts is
# oracle-verified end to end.
# ---------------------------------------------------------------------------

@query(
    "q237_flac_varblock",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT doc_id, clen, 33 + clen % 71 AS total FROM d),
    fr0 AS (SELECT doc_id, clen, total,
                   unnest(generate_series(0, 10)) AS f
            FROM p),
    fr1 AS (SELECT *, 16 + 8 * ((clen + f) % 3) AS bsz FROM fr0),
    fr2 AS (SELECT *,
                   CAST(COALESCE(SUM(bsz) OVER (PARTITION BY doc_id
                            ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS fstart
            FROM fr1),
    fr AS (SELECT doc_id, clen, total, f, fstart,
                  LEAST(bsz, total - fstart) AS want,
                  (total - fstart) >= bsz AS isfull
           FROM fr2 WHERE fstart < total),
    cd AS (SELECT *,
                  CASE WHEN isfull OR (clen + f) % 6 = 5
                       THEN (clen + f) % 6 ELSE 0 END AS code,
                  CASE WHEN isfull THEN (clen + f) % 2 ELSE 0 END AS po
           FROM fr),
    s AS (SELECT doc_id, clen, total, f, fstart, want, code, po,
                 unnest(generate_series(0, want - 1)) AS i
          FROM cd),
    sv AS (SELECT doc_id, clen, total, f, want, code, po, i,
                  fstart + i AS k,
                  ((clen * 31 + 7 * (fstart + i) * (fstart + i)
                    + 13 * (fstart + i)) % 4096) - 2048 AS samp
           FROM s),
    r AS (SELECT doc_id, f, i, code, po, want,
                 samp - CASE code
                   WHEN 1 THEN lag(samp, 1) OVER w
                   WHEN 2 THEN 2 * lag(samp, 1) OVER w
                               - lag(samp, 2) OVER w
                   WHEN 3 THEN 3 * lag(samp, 1) OVER w
                               - 3 * lag(samp, 2) OVER w
                               + lag(samp, 3) OVER w
                   WHEN 4 THEN 4 * lag(samp, 1) OVER w
                               - 6 * lag(samp, 2) OVER w
                               + 4 * lag(samp, 3) OVER w
                               - lag(samp, 4) OVER w
                   ELSE 0 END AS resid
          FROM sv
          WINDOW w AS (PARTITION BY doc_id, f ORDER BY i)),
    parts AS (SELECT doc_id, f,
                     CASE WHEN po = 1 THEN i // (want // 2)
                          ELSE 0 END AS part,
                     MAX(CASE WHEN resid >= 0 THEN 2 * resid
                              ELSE -2 * resid - 1 END) AS max_u
              FROM r
              WHERE code <= 4 AND i >= code
              GROUP BY doc_id, f,
                       CASE WHEN po = 1 THEN i // (want // 2) ELSE 0 END),
    esc AS (SELECT doc_id,
                   SUM(CASE WHEN max_u >= 32768 THEN 1 ELSE 0 END)
                     AS n_escapes,
                   SUM(CASE WHEN max_u >= 32768 THEN 0
                            ELSE (f + 1) * (part + 1)
                                 * (length(bin(max_u)) - 1) END) AS k_fp
            FROM parts GROUP BY doc_id),
    ofp AS (SELECT doc_id, SUM((f + 1) * code) AS order_fp,
                   SUM((f + 1) * want) AS bs_fp,
                   COUNT(*) AS nf
            FROM cd GROUP BY doc_id),
    agg AS (SELECT doc_id,
                   MAX(clen) AS clen,
                   16 AS bps,
                   MAX(total) AS total,
                   MAX(CASE WHEN k = total - 1 THEN samp END)
                     AS last_sample,
                   SUM(samp) AS sample_sum,
                   SUM((k + 1) * samp) AS sample_fp
            FROM sv GROUP BY doc_id)
    SELECT a.doc_id,
           CAST(8000 + 100 * (a.clen % 5) AS INTEGER) AS sr,
           CAST(a.bps AS INTEGER) AS bps,
           CAST(a.total AS BIGINT) AS n_samples,
           CAST(o.nf AS BIGINT) AS n_frames,
           CAST(a.last_sample AS BIGINT) AS last_sample,
           CAST(a.sample_sum AS BIGINT) AS sample_sum,
           CAST(a.sample_fp AS BIGINT) AS sample_fp,
           CAST(o.order_fp AS BIGINT) AS order_fp,
           CAST(o.bs_fp AS BIGINT) AS bs_fp,
           CAST(COALESCE(e.k_fp, 0) AS BIGINT) AS k_fp,
           CAST(COALESCE(e.n_escapes, 0) AS BIGINT) AS n_escapes,
           TRUE AS md5_ok
    FROM agg a
    JOIN ofp o ON o.doc_id = a.doc_id
    LEFT JOIN esc e ON e.doc_id = a.doc_id
    """,
)
def q237_flac_varblock(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_flac_stats_ext,
        with_flac_varblock_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_flac_stats_ext(
            with_flac_varblock_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q238: stereo FLAC breadth — the q235/q236/q237 surfaces exercised
# through the STEREO walk in one corpus: depth cycle (8/24-bit, with
# side channels riding at bps+1), VARIABLE blocking with cumulative
# sample-number headers, mixed rice/rice2 frames, and all four
# channel assignments cycling per frame. With this the flac.py
# profile guards narrow to exactly two named seams: 12/20-bit depths
# (non-byte-aligned MD5 packing) and >2-channel layouts. The oracle
# replays both channels' closed forms plus the frame-layout, mode,
# and code fingerprints; the MD5 proof covers the interleaved
# reconstruction at the stream depth, so a wrong decorrelation
# inverse, depth unpack, or rice2 read fails every stream.
# ---------------------------------------------------------------------------

@query(
    "q238_flac_stereo_ext",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT doc_id, clen,
                 33 + clen % 71 AS total,
                 CASE clen % 2 WHEN 0 THEN 8 ELSE 24 END AS bps,
                 CASE clen % 2 WHEN 0 THEN 8 ELSE 524288 END AS amp,
                 CASE clen % 2 WHEN 0 THEN 1 ELSE 256 END AS m
          FROM d),
    fr0 AS (SELECT doc_id, clen, total, bps, amp, m,
                   unnest(generate_series(0, 10)) AS f
            FROM p),
    fr1 AS (SELECT *, 16 + 8 * ((clen + f) % 3) AS bsz FROM fr0),
    fr2 AS (SELECT *,
                   CAST(COALESCE(SUM(bsz) OVER (PARTITION BY doc_id
                            ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS fstart
            FROM fr1),
    fr AS (SELECT doc_id, clen, total, bps, amp, m, f, fstart,
                  LEAST(bsz, total - fstart) AS want,
                  (total - fstart) >= bsz AS isfull
           FROM fr2 WHERE fstart < total),
    cd AS (SELECT *,
                  CASE WHEN isfull THEN (clen + f) % 5
                       WHEN (clen + f) % 5 >= want THEN 0
                       ELSE (clen + f) % 5 END AS code,
                  (clen + f) % 4 AS mode
           FROM fr),
    fx AS (SELECT doc_id,
                  COUNT(*) AS nf,
                  SUM((f + 1) * mode) AS mode_fp,
                  SUM((f + 1) * 2 * code) AS code_fp,
                  SUM((f + 1) * want) AS bs_fp
           FROM cd GROUP BY doc_id),
    s AS (SELECT doc_id, clen, total, bps, amp, m,
                 unnest(generate_series(0, total - 1)) AS k
          FROM p),
    sv AS (SELECT doc_id, clen, total, k,
                  ((clen * 31 + 7 * k * k + 13 * k) * m % (2 * amp))
                    - amp AS l,
                  ((clen * 17 + 5 * k * k + 3 * k) * m % (2 * amp))
                    - amp AS r,
                  bps
           FROM s),
    agg AS (SELECT doc_id,
                   MAX(clen) AS clen, MAX(bps) AS bps,
                   MAX(total) AS total,
                   SUM(l) AS left_sum, SUM(r) AS right_sum,
                   SUM((k + 1) * l) AS left_fp,
                   SUM((k + 1) * r) AS right_fp
            FROM sv GROUP BY doc_id)
    SELECT a.doc_id,
           CAST(8000 + 100 * (a.clen % 5) AS INTEGER) AS sr,
           CAST(a.bps AS INTEGER) AS bps,
           CAST(a.total AS BIGINT) AS n_samples,
           CAST(x.nf AS BIGINT) AS n_frames,
           CAST(a.left_sum AS BIGINT) AS left_sum,
           CAST(a.right_sum AS BIGINT) AS right_sum,
           CAST(a.left_fp AS BIGINT) AS left_fp,
           CAST(a.right_fp AS BIGINT) AS right_fp,
           CAST(x.mode_fp AS BIGINT) AS mode_fp,
           CAST(x.code_fp AS BIGINT) AS code_fp,
           CAST(x.bs_fp AS BIGINT) AS bs_fp,
           TRUE AS md5_ok
    FROM agg a JOIN fx x ON x.doc_id = a.doc_id
    """,
)
def q238_flac_stereo_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_flac_stereo_stats_ext,
        with_flac_stereo_ext_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length, broadcast the stats back onto the doc ids — the
    # Python decode cost stops scaling with corpus row count
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_flac_stereo_stats_ext(
            with_flac_stereo_ext_payload(d, "text", "doc_id"), "payload", "doc_id"
        ),
    )


# ---------------------------------------------------------------------------
# q239: MULTICHANNEL FLAC (3-8ch) — the last channel-layout seam
# (VERDICT r12 item 4). Above two channels the format defines ONLY
# independent coding (RFC 9639 §9.1.3 codes 0010-0111), so the walk
# is the mono subframe machine repeated channels-per-frame times with
# the MD5 proof over channel-interleaved PCM. The corpus cycles
# channel counts 3-8, depths 8/16/24 (24-bit pushes raw escapes
# through every channel), variable blocking, and rice/rice2. The
# oracle replays the per-channel closed form and the frame layout;
# ch_fp is channel-order-sensitive and code_fp binds every channel's
# subframe header, so a swapped, skipped, or misdepth channel read
# fails the hash. With this, flac.py's one remaining refusal is the
# 12/20-bit depth seam (non-byte-aligned MD5 packing — kept, by name).
# ---------------------------------------------------------------------------

@query(
    "q239_flac_multichannel",
    oracle="""
    WITH d AS (SELECT doc_id, length(text) AS clen
               FROM documents WHERE text IS NOT NULL),
    p AS (SELECT doc_id, clen,
                 3 + clen % 6 AS nch,
                 CASE clen % 3 WHEN 0 THEN 8 WHEN 1 THEN 16
                      ELSE 24 END AS bps,
                 CASE clen % 3 WHEN 0 THEN 8 WHEN 1 THEN 2048
                      ELSE 524288 END AS amp,
                 CASE clen % 3 WHEN 2 THEN 256 ELSE 1 END AS m,
                 33 + clen % 71 AS total
          FROM d),
    fr0 AS (SELECT doc_id, clen, total, nch,
                   unnest(generate_series(0, 10)) AS f
            FROM p),
    fr1 AS (SELECT *, 16 + 8 * ((clen + f) % 3) AS bsz FROM fr0),
    fr2 AS (SELECT *,
                   CAST(COALESCE(SUM(bsz) OVER (PARTITION BY doc_id
                            ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS BIGINT) AS fstart
            FROM fr1),
    fr AS (SELECT doc_id, clen, total, nch, f, fstart,
                  LEAST(bsz, total - fstart) AS want,
                  (total - fstart) >= bsz AS isfull
           FROM fr2 WHERE fstart < total),
    cd AS (SELECT *,
                  CASE WHEN isfull THEN (clen + f) % 6
                       WHEN (clen + f) % 6 = 5 THEN 5
                       ELSE 0 END AS code
           FROM fr),
    fx AS (SELECT doc_id,
                  COUNT(*) AS nf,
                  SUM((f + 1) * code * nch * (nch + 1) // 2) AS code_fp,
                  SUM((f + 1) * want) AS bs_fp
           FROM cd GROUP BY doc_id),
    ck AS (SELECT doc_id, clen, total, nch, amp, m,
                  unnest(generate_series(0, nch - 1)) AS c
           FROM p),
    s AS (SELECT doc_id, clen, total, nch, amp, m, c,
                 unnest(generate_series(0, total - 1)) AS k
          FROM ck),
    sv AS (SELECT doc_id, total, c, k,
                  ((clen * (13 + 2 * c) + (3 + c) * k * k
                    + (5 + 2 * c) * k) * m % (2 * amp)) - amp AS samp
           FROM s),
    agg AS (SELECT doc_id,
                   SUM(samp) AS ch_sum,
                   SUM((c + 1) * (k + 1) * samp) AS ch_fp,
                   SUM(CASE WHEN k = total - 1
                            THEN (c + 1) * samp ELSE 0 END) AS last_fp
            FROM sv GROUP BY doc_id)
    SELECT p.doc_id,
           CAST(8000 + 100 * (p.clen % 5) AS INTEGER) AS sr,
           CAST(p.nch AS INTEGER) AS nch,
           CAST(p.bps AS INTEGER) AS bps,
           CAST(p.total AS BIGINT) AS n_samples,
           CAST(x.nf AS BIGINT) AS n_frames,
           CAST(a.ch_sum AS BIGINT) AS ch_sum,
           CAST(a.ch_fp AS BIGINT) AS ch_fp,
           CAST(a.last_fp AS BIGINT) AS last_fp,
           CAST(x.code_fp AS BIGINT) AS code_fp,
           CAST(x.bs_fp AS BIGINT) AS bs_fp,
           TRUE AS md5_ok
    FROM p
    JOIN fx x ON x.doc_id = p.doc_id
    JOIN agg a ON a.doc_id = p.doc_id
    """,
)
def q239_flac_multichannel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.multimodal import (
        decode_flac_multichannel_stats,
        length_dict_stats,
        with_flac_multichannel_payload,
    )

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # dictionary fan-out (guide §8): synth+decode once per DISTINCT
    # text length (a few hundred rows at any corpus size), broadcast
    # the stats back — the Python decode cost stops scaling with rows
    return length_dict_stats(
        docs,
        "text",
        "doc_id",
        lambda d: decode_flac_multichannel_stats(
            with_flac_multichannel_payload(d, "text", "doc_id"),
            "payload",
            "doc_id",
        ),
    )


# ---------------------------------------------------------------------------
# q240: multi-query BM25 ranked retrieval (VERDICT r12 item 5) — q144
# generalized from one fixed term set to a QUERY TABLE: the
# inverted-index form every decontamination / eval-overlap loop runs.
# Four queries of 2-4 terms rank the corpus simultaneously; the
# posting lists are bounded by a broadcast term semijoin BEFORE the tf
# shuffle, query fan-out is a broadcast join on term (no cartesian),
# and per-query top-10 is ROW_NUMBER-pinned on the rounded score +
# doc_id. The oracle replays the identical closed-form arithmetic
# from a VALUES query table.
# ---------------------------------------------------------------------------

BM25_QUERIES: list[tuple[str, str]] = [
    ("qa", "spark table window"),
    ("qb", "hash join merge"),
    ("qc", "vector scan"),
    ("qd", "slow query filter batch"),
]


@query(
    "q240_bm25_rank",
    oracle="""
    WITH q(qid, qtext) AS (VALUES
      ('qa', 'spark table window'),
      ('qb', 'hash join merge'),
      ('qc', 'vector scan'),
      ('qd', 'slow query filter batch')),
    qtok AS (SELECT DISTINCT qid, unnest(list_filter(
               string_split_regex(lower(qtext), '[^a-z]+'),
               t -> t <> '')) AS tok
             FROM q),
    toks AS (SELECT doc_id, unnest(list_filter(
               string_split_regex(lower(text), '[^a-z]+'),
               t -> t <> '')) AS tok
             FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    sc AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    terms AS (SELECT DISTINCT tok FROM qtok),
    tf AS (SELECT doc_id, toks.tok, COUNT(*) AS tf
           FROM toks JOIN terms ON toks.tok = terms.tok
           GROUP BY 1, 2),
    dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT qtok.qid, tf.doc_id,
             ROUND(SUM(ln((sc.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
                       * tf.tf
                       / (tf.tf + 1.2 * (1 - 0.75
                                         + 0.75 * dl.dl / sc.avgdl))),
                   4) AS score,
             COUNT(*) AS n_terms_hit
      FROM tf
      JOIN dfq USING (tok)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN sc
      JOIN qtok ON qtok.tok = tf.tok
      GROUP BY qtok.qid, tf.doc_id),
    ranked AS (
      SELECT qid, doc_id, score, n_terms_hit,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id) AS rank
      FROM scored)
    SELECT qid, doc_id, CAST(rank AS INTEGER) AS rank, score,
           CAST(n_terms_hit AS BIGINT) AS n_terms_hit
    FROM ranked WHERE rank <= 10
    """,
)
def q240_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.text import bm25_rank

    docs = table(spark, sf_dir, "documents", spread=True)
    # the 4-row query table as a parsed VALUES relation (LocalRelation):
    # createDataFrame parallelizes it across the default parallelism, so
    # every broadcast subquery over it paid a 32-task stage of empty
    # tasks — and .coalesce(1) is worse (the merged task pays one
    # Python-worker round-trip per pickled parent partition, ~6 s)
    vals = ", ".join(f"('{q}', '{t}')" for q, t in BM25_QUERIES)
    queries_df = spark.sql(f"SELECT * FROM (VALUES {vals}) AS t(qid, qtext)")
    out = bm25_rank(docs, "doc_id", "text", queries_df, "qid", "qtext", k=10)
    return out.withColumn("rank", F.col("rank").cast("int"))


# ---------------------------------------------------------------------------
# q241: rolling-fingerprint cross-doc substring dedup (VERDICT r12
# item 6) — the Lee-et-al. ExactSubstr mode at EVERY alignment: each
# token position contributes the md5 of its k-token window (stride 1,
# k=12 for this 10-99-token corpus; 50 in the paper), a later
# duplicate is any window equal to an earlier (doc, pos) one, and
# duplicated positions merge into maximal removal intervals (windows
# touch iff Δpos <= k). q181's aligned-block face misses shared
# passages offset by ±1 token; this closes that. The max_df=2 budget
# is BINDING at sf0.01 (fingerprints with 3 occurrences exist and are
# classified boilerplate — counted, excluded from removal), so the
# budget semantics are hash-verified, not just documented. The oracle
# replays the identical fingerprints (same tokenization, same md5),
# first-occurrence rule, and interval merge.
# ---------------------------------------------------------------------------

@query(
    "q241_fingerprint_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
                                 t -> t <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    base AS (SELECT doc_id, len(tk) AS n_tokens,
                    CASE WHEN len(tk) >= 12 THEN len(tk) - 11
                         ELSE 0 END AS n_windows,
                    tk
             FROM toks),
    occ AS (SELECT doc_id, i AS pos,
                   md5(array_to_string(tk[i + 1 : i + 12], ' ')) AS fp
            FROM base, unnest(generate_series(0, n_tokens - 12)) AS u(i)
            WHERE n_tokens >= 12),
    marked AS (SELECT doc_id, pos,
                      ROW_NUMBER() OVER (PARTITION BY fp
                                         ORDER BY doc_id, pos) AS rn,
                      COUNT(*) OVER (PARTITION BY fp) AS n_occ
               FROM occ),
    flags AS (SELECT doc_id, pos,
                     (n_occ > 2) AS boiler,
                     (rn > 1 AND n_occ <= 2) AS dup
              FROM marked),
    counts AS (SELECT doc_id,
                      SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS n_dup_pos,
                      SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS n_boiler
               FROM flags GROUP BY 1),
    dp AS (SELECT doc_id, pos FROM flags WHERE dup),
    isl0 AS (SELECT doc_id, pos,
                    CASE WHEN LAG(pos) OVER w IS NULL THEN 1
                         WHEN pos - LAG(pos) OVER w > 12 THEN 1
                         ELSE 0 END AS newg
             FROM dp
             WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    isl AS (SELECT doc_id, pos,
                   SUM(newg) OVER (PARTITION BY doc_id ORDER BY pos) AS g
            FROM isl0),
    runs0 AS (SELECT doc_id, g, MAX(pos) - MIN(pos) + 12 AS cover
              FROM isl GROUP BY 1, 2),
    runs AS (SELECT doc_id, COUNT(*) AS n_runs,
                    SUM(cover) AS cover_tokens,
                    MAX(cover) AS max_run_cover
             FROM runs0 GROUP BY 1)
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(b.n_windows AS BIGINT) AS n_windows,
           CAST(COALESCE(c.n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
           CAST(COALESCE(c.n_boiler, 0) AS BIGINT) AS n_boiler,
           CAST(COALESCE(r.n_runs, 0) AS BIGINT) AS n_runs,
           CAST(COALESCE(r.cover_tokens, 0) AS BIGINT) AS cover_tokens,
           CAST(COALESCE(r.max_run_cover, 0) AS BIGINT) AS max_run_cover,
           CAST(b.n_tokens - COALESCE(r.cover_tokens, 0) AS BIGINT)
             AS kept_tokens
    FROM base b
    LEFT JOIN counts c ON c.doc_id = b.doc_id
    LEFT JOIN runs r ON r.doc_id = b.doc_id
    """,
)
def q241_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.text import rolling_fingerprint_dedup

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return rolling_fingerprint_dedup(docs, "doc_id", "text", k=12, max_df=2)


# ---------------------------------------------------------------------------
# q242: shuffled-shard SINK audit — write_shuffled_shards is the step
# a training run actually consumes (q151 verifies the permutation
# algebra IN FLIGHT; this verifies the FILES): the engine writes the
# seeded shuffle as shard-partitioned parquet, reads the directory
# back, and aggregates per shard from the READ-BACK rows — shard
# routing and the pos<->doc pairing via the same order-sensitive
# Σ(h·pos) checksum the oracle recomputes from pure algebra, plus a
# physically-measured file-order column: pos must ascend in on-disk
# row order within every scan split (capture spark_partition_id +
# monotonically_increasing_id AT SCAN TIME, before any shuffle, then
# count inversions per split). The oracle states the invariant's
# expected value (0 inversions — the sink sorted each shard by pos
# before writing); the engine MEASURES it from the files, so a sink
# that routes a row to the wrong shard=N dir, mispairs pos, or writes
# rows out of order each flips a different hashed column. Scale: the
# audit is one read-back scan + two keyed shuffles (split-window +
# shard agg) — O(corpus) like any post-write validation pass; the
# write itself is seeded_shuffle's single rank shuffle with
# n_shards >> executor count.
# ---------------------------------------------------------------------------

_Q242_ROLL = _sql_roll_of("('11:' || CAST(doc_id AS VARCHAR))")


@query(
    "q242_shuffled_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             (1103515245 * {_Q242_ROLL} + 12345) % 2147483647 AS h
      FROM documents
    ),
    s AS (
      SELECT doc_id, h, CAST(h % 8 AS INTEGER) AS shard,
             ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
      FROM h
    )
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM((h * pos) % 2147483647) % 2147483647 AS BIGINT)
             AS checksum,
           CAST(0 AS BIGINT) AS n_order_inversions
    FROM s GROUP BY shard
    """,
)
def q242_shuffled_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from redskins_rule_spark.operators.sampling import (
        shuffle_hash,
        write_shuffled_shards,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")
    root = tempfile.mkdtemp(prefix=f"q242_{uuid.uuid4().hex[:8]}_")
    out = os.path.join(root, "shards")
    write_shuffled_shards(docs, "doc_id", out, seed=11, n_shards=8)

    # Scan-time capture: both columns are evaluated in the scan stage
    # projection (before the window shuffle), so __fid ascends in
    # on-disk row order within each (__pid) split.
    rb = (
        spark.read.parquet(out)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__fid", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("__pid", "shard").orderBy("__fid")
    inv = F.when(F.lag("pos").over(w) >= F.col("pos"), 1).otherwise(0)
    rb = rb.withColumn("__inv", inv)

    h = shuffle_hash("doc_id", 11)
    m = 2147483647
    return (
        rb.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            ((F.sum((h * F.col("pos")) % m)) % m).cast("long").alias("checksum"),
            F.sum("__inv").cast("long").alias("n_order_inversions"),
        )
        .withColumn("shard", F.col("shard").cast("int"))
    )


# ---------------------------------------------------------------------------
# q243: exact-phrase search over positional postings — the retrieval
# face q73 (doc-level conjunctive) and q240 (BM25 bag-of-words) both
# skip: term ORDER and ADJACENCY. Implemented as offset voting: each
# occurrence of phrase term t at position p votes for candidate start
# p - j (one vote per offset j of t in the phrase); a start with all
# k distinct offsets is a match. One corpus scan, one explode
# filtered to the phrase's terms, ONE shuffle on the fine-grained
# (doc, start) key — no posting-list self-joins, no cartesian, no
# rescan per term. Overlapping matches count (phrase 'a b a' in
# 'a b a b a' -> 2). Two phrases (a 25-doc bigram and a 1-doc
# trigram at sf0.001) exercise both the dense and sparse paths; the
# oracle replays the identical filtered-split positional numbering
# and vote/HAVING algebra from a VALUES offset table.
# ---------------------------------------------------------------------------

PHRASES: list[str] = ["big data", "data the filter"]


@query(
    "q243_phrase_search",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                 x -> x <> '') AS l
      FROM documents),
    post AS (
      SELECT doc_id, unnest(l) AS token,
             CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos
      FROM toks),
    off(phrase, term, j, k) AS (VALUES
      ('big data', 'big', 0, 2),
      ('big data', 'data', 1, 2),
      ('data the filter', 'data', 0, 3),
      ('data the filter', 'the', 1, 3),
      ('data the filter', 'filter', 2, 3)),
    votes AS (
      SELECT o.phrase, p.doc_id, p.pos - o.j AS start, o.j, o.k
      FROM post p JOIN off o ON p.token = o.term
      WHERE p.pos - o.j >= 0),
    hits AS (
      SELECT phrase, doc_id, start
      FROM votes GROUP BY phrase, doc_id, start, k
      HAVING COUNT(DISTINCT j) = k)
    SELECT phrase, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(start) AS BIGINT) AS first_pos
    FROM hits GROUP BY 1, 2
    """,
)
def q243_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from redskins_rule_spark.operators.text import phrase_search

    docs = table(spark, sf_dir, "documents")
    out = None
    for ph in PHRASES:
        hit = phrase_search(docs, ph).select(
            F.lit(ph).alias("phrase"), "doc_id", "n_matches", "first_pos"
        )
        out = hit if out is None else out.unionByName(hit)
    return out
