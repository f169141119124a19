"""As-of join edge cases (SURVEY.md §5.2 #2: tie dates, tolerance miss
→ null, multiple games in window) for both physical strategies."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from redskins_rule_spark.operators.asof import asof_join
from redskins_rule_spark.plans.explain import formatted_plan


def _dfs(spark):
    left = spark.createDataFrame(
        [
            ("e1", dt.date(2020, 11, 3)),   # nearest=g2 (2 days), g1 in window too
            ("e2", dt.date(2020, 12, 25)),  # no game within 30d → null
            ("e3", dt.date(2021, 1, 5)),    # exact tie distance handled by tiebreak
        ],
        "elec_id string, elec_date date",
    )
    right = spark.createDataFrame(
        [
            ("g1", dt.date(2020, 10, 20)),
            ("g2", dt.date(2020, 11, 1)),
            ("g3", dt.date(2021, 1, 3)),
            ("g4", dt.date(2021, 1, 3)),   # same date as g3 → tiebreak on id
            ("g5", dt.date(2021, 2, 1)),   # after e3 → excluded (backward)
        ],
        "game_id string, game_date date",
    )
    return left, right


@pytest.mark.parametrize("strategy", ["bucket", "broadcast"])
def test_asof_backward_semantics(spark, strategy):
    left, right = _dfs(spark)
    out = asof_join(
        left, right, "elec_date", "game_date",
        tolerance=30, direction="backward",
        left_keys=["elec_id"], tiebreak=["game_id"],
        strategy=strategy, diff_col="dd",
    )
    got = {r.elec_id: (r.game_id, r.dd) for r in out.collect()}
    assert got == {"e1": ("g2", 2), "e2": (None, None), "e3": ("g3", 2)}
    assert out.count() == 3  # left-preserving: one row per left key


@pytest.mark.parametrize("strategy", ["bucket", "broadcast"])
def test_asof_forward(spark, strategy):
    left, right = _dfs(spark)
    out = asof_join(
        left, right, "elec_date", "game_date",
        tolerance=30, direction="forward",
        left_keys=["elec_id"], tiebreak=["game_id"], strategy=strategy,
    )
    got = {r.elec_id: r.game_id for r in out.collect()}
    # e1 2020-11-03 → next game ≤30d later: none until 2021-01-03 (61d) → null
    assert got == {"e1": None, "e2": "g3", "e3": "g5"}


def test_asof_by_keys(spark):
    left = spark.createDataFrame(
        [("u1", "p1", dt.date(2020, 1, 10)), ("u2", "p2", dt.date(2020, 1, 10))],
        "user string, pid string, t date",
    )
    right = spark.createDataFrame(
        [("u1", "v1", dt.date(2020, 1, 8)), ("u2", "v2", dt.date(2020, 1, 9))],
        "user string, vid string, vt date",
    )
    out = asof_join(
        left, right, "t", "vt", by=["user"], tolerance=30,
        left_keys=["pid"], tiebreak=["vid"],
    )
    got = {r.pid: r.vid for r in out.collect()}
    assert got == {"p1": "v1", "p2": "v2"}  # no cross-user bleed


def test_asof_bucket_plan_is_not_nested_loop(spark):
    left, right = _dfs(spark)
    out = asof_join(
        left, right, "elec_date", "game_date", tolerance=30,
        left_keys=["elec_id"], tiebreak=["game_id"], strategy="bucket",
    )
    assert "BroadcastNestedLoopJoin" not in formatted_plan(out)


def test_asof_requires_tolerance_and_distinct_names(spark):
    left, right = _dfs(spark)
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, "elec_date", "game_date")
    with pytest.raises(ValueError, match="distinct"):
        asof_join(left.withColumnRenamed("elec_date", "d"),
                  right.withColumnRenamed("game_date", "d"),
                  "d", "d", tolerance=5)


def test_asof_by_keys_broadcast_strategy(spark):
    # regression: the broadcast path previously referenced the renamed
    # by-columns before renaming them (unresolved column)
    left = spark.createDataFrame(
        [(1, "u1", "2020-01-10"), (2, "u2", "2020-01-10")],
        "l_id int, user string, lt string",
    ).withColumn("lt", F.to_date("lt"))
    right = spark.createDataFrame(
        [("u1", "2020-01-08"), ("u2", "2020-01-01"), ("u2", "2020-01-09")],
        "user string, rt string",
    ).withColumn("rt", F.to_date("rt"))
    out = asof_join(
        left, right, "lt", "rt", by=["user"], tolerance=7,
        left_keys=["l_id"], strategy="broadcast", diff_col="diff",
    ).orderBy("l_id").collect()
    assert [(r["l_id"], str(r["rt"]), r["diff"]) for r in out] == [
        (1, "2020-01-08", 2),
        (2, "2020-01-09", 1),
    ]


def test_asof_rejects_bad_unit_and_how(spark):
    left = spark.createDataFrame([(1, "2020-01-10")], "i int, lt string")
    right = spark.createDataFrame([(1, "2020-01-08")], "j int, rt string")
    with pytest.raises(ValueError, match="unit"):
        asof_join(left, right, "lt", "rt", tolerance=7, unit="day")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, "lt", "rt", tolerance=7, how="full")


@pytest.mark.parametrize("strategy", ["bucket", "broadcast"])
def test_asof_nearest(spark, strategy):
    left, right = _dfs(spark)
    out = asof_join(
        left, right, "elec_date", "game_date",
        tolerance=30, direction="nearest",
        left_keys=["elec_id"], tiebreak=["game_id"],
        strategy=strategy, diff_col="dd",
    )
    got = {r.elec_id: (r.game_id, r.dd) for r in out.collect()}
    # e1 2020-11-03: g2 is 2d before, nothing closer after → g2
    # e2 2020-12-25: g3/g4 are 9d AFTER (backward missed them) → g3 (tiebreak)
    # e3 2021-01-05: g3/g4 2d before → g3
    assert got == {"e1": ("g2", 2), "e2": ("g3", 9), "e3": ("g3", 2)}


@pytest.mark.parametrize("strategy", ["bucket", "broadcast"])
def test_asof_nearest_tie_prefers_backward(spark, strategy):
    left = spark.createDataFrame(
        [("e", dt.date(2020, 6, 10))], "eid string, lt date"
    )
    right = spark.createDataFrame(
        [("before", dt.date(2020, 6, 8)), ("after", dt.date(2020, 6, 12))],
        "rid string, rt date",
    )
    out = asof_join(
        left, right, "lt", "rt", tolerance=7, direction="nearest",
        left_keys=["eid"], tiebreak=["rid"], strategy=strategy,
    ).collect()
    assert out[0]["rid"] == "before"  # equal 2d distance → pandas tie rule


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_allow_exact_match_false(spark, direction):
    left = spark.createDataFrame(
        [("e", dt.date(2020, 6, 10))], "eid string, lt date"
    )
    right = spark.createDataFrame(
        [("same_day", dt.date(2020, 6, 10)),
         ("day_before", dt.date(2020, 6, 9)),
         ("day_after", dt.date(2020, 6, 11))],
        "rid string, rt date",
    )
    kw = dict(tolerance=7, direction=direction, left_keys=["eid"],
              tiebreak=["rid"])
    exact = asof_join(left, right, "lt", "rt", **kw).collect()[0]["rid"]
    assert exact == "same_day"
    strict = asof_join(
        left, right, "lt", "rt", allow_exact_match=False, **kw
    ).collect()[0]["rid"]
    assert strict == {
        "backward": "day_before", "forward": "day_after",
        "nearest": "day_before",  # 1d tie before/after → backward
    }[direction]


def test_asof_rejects_bad_direction(spark):
    left = spark.createDataFrame([(1, "2020-01-10")], "i int, lt string")
    right = spark.createDataFrame([(1, "2020-01-08")], "j int, rt string")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "lt", "rt", tolerance=7, direction="sideways")


# --- SCD2 point-in-time join (round-4 continuation) ------------------------

def test_pit_join_basic_and_exact_match(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.asof import pit_join

    dim = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10, 100.0),
         (1, "2024-01-05 00:00:00", 11, 200.0),
         (2, "2024-01-03 00:00:00", 12, 7.0)],
        "user_id int, ts string, event_id int, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    facts = spark.createDataFrame(
        [(100, 1, "2024-01-04 00:00:00"),   # between versions -> v=100
         (101, 1, "2024-01-05 00:00:00"),   # exactly at v2 -> sees NEW (200)
         (102, 1, "2023-12-25 00:00:00"),   # before any dim -> dropped
         (103, 2, "2024-02-01 00:00:00")],  # -> 7
        "fid int, user_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.fid: (r.v, str(r.ts_effective)) for r in pit_join(
        facts, dim, by=["user_id"], fact_ts="ts", dim_ts="ts",
        payload=["v"], dim_tiebreak=["event_id"],
    ).collect()}
    assert out == {
        100: (100.0, "2024-01-01 00:00:00"),
        101: (200.0, "2024-01-05 00:00:00"),
        103: (7.0, "2024-01-03 00:00:00"),
    }


def test_pit_join_same_ts_dim_versions_latest_wins(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.asof import pit_join

    rows = [(1, "2024-01-01 00:00:00", 1, 5.0),
            (1, "2024-01-01 00:00:00", 2, 9.0)]
    for perm in (rows, rows[::-1]):
        dim = spark.createDataFrame(
            perm, "user_id int, ts string, event_id int, v double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        facts = spark.createDataFrame(
            [(50, 1, "2024-01-02 00:00:00")], "fid int, user_id int, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = pit_join(facts, dim, by=["user_id"], fact_ts="ts", dim_ts="ts",
                       payload=["v"], dim_tiebreak=["event_id"]).collect()
        assert out[0].v == 9.0, perm  # higher event_id version wins


def test_pit_join_rejects_colliding_fact_columns(spark):
    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.asof import pit_join

    dim = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, 1.0)],
        "user_id int, ts string, event_id int, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    facts = dim.select("user_id", "ts", F.lit(2.0).alias("v"))
    with pytest.raises(ValueError, match="collide"):
        pit_join(facts, dim, by=["user_id"], fact_ts="ts", dim_ts="ts",
                 payload=["v"])
