"""MERGE upsert/delete semantics (operators/merge.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redskins_rule_spark.operators.merge import merge_upsert


def _t(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, tag string, val double",
    )


def test_update_insert_and_untouched(spark):
    src = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "id bigint, tag string, val double"
    )
    got = {tuple(r) for r in merge_upsert(_t(spark), src, ["id"]).collect()}
    assert got == {
        (1, "a", 10.0),  # untouched
        (2, "B", 200.0),  # updated
        (3, "c", 30.0),  # untouched
        (4, "d", 40.0),  # inserted
    }


def test_delete_flag(spark):
    src = spark.createDataFrame(
        [(1, "a", 10.0, True), (2, "B", 200.0, False), (9, "x", 0.0, True)],
        "id bigint, tag string, val double, is_deleted boolean",
    )
    got = {
        tuple(r)
        for r in merge_upsert(
            _t(spark), src, ["id"], delete_col="is_deleted"
        ).collect()
    }
    # id=1 deleted, id=2 updated, id=3 untouched, id=9 delete-of-absent no-op
    assert got == {(2, "B", 200.0), (3, "c", 30.0)}


def test_null_key_matches_null_key(spark):
    t = spark.createDataFrame([(None, "n", 1.0)], "id bigint, tag string, val double")
    src = spark.createDataFrame(
        [(None, "N", 2.0)], "id bigint, tag string, val double"
    )
    got = [tuple(r) for r in merge_upsert(t, src, ["id"]).collect()]
    assert got == [(None, "N", 2.0)]


def test_matched_source_null_overwrites_target(spark):
    # SQL MERGE UPDATE SET semantics: a matched source row carrying NULL
    # in a non-key column writes that NULL, never keeps the stale value.
    src = spark.createDataFrame(
        [(2, None, None)], "id bigint, tag string, val double"
    )
    got = {tuple(r) for r in merge_upsert(_t(spark), src, ["id"]).collect()}
    assert got == {
        (1, "a", 10.0),
        (2, None, None),  # NULLs written, not coalesced away
        (3, "c", 30.0),
    }


def test_missing_source_column_rejected(spark):
    src = spark.createDataFrame([(1, "a")], "id bigint, tag string")
    with pytest.raises(ValueError, match="source lacks"):
        merge_upsert(_t(spark), src, ["id"])


def test_update_only_columns_preserved_via_join_shape(spark):
    # merged output keeps the target schema exactly (names and order)
    src = _t(spark).withColumn("val", F.col("val") * 2)
    out = merge_upsert(_t(spark), src, ["id"])
    assert out.columns == ["id", "tag", "val"]


# -- snapshot_diff (CDC) -----------------------------------------------------

from redskins_rule_spark.operators.merge import snapshot_diff  # noqa: E402


def test_snapshot_diff_labels(spark):
    old = _t(spark)  # ids 1,2,3
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)],
        "id bigint, tag string, val double",
    )
    got = {tuple(r) for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {
        (1, "a", 10.0, "delete"),  # old values on delete
        (3, "c", 99.0, "update"),  # new values on update
        (4, "d", 40.0, "insert"),
    }  # id 2 unchanged -> dropped


def test_snapshot_diff_null_transitions_are_updates(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "id bigint, tag string")
    new = spark.createDataFrame([(1, "y"), (2, None)], "id bigint, tag string")
    got = {tuple(r) for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {(1, "y", "update"), (2, None, "update")}


def test_snapshot_diff_null_null_unchanged(spark):
    old = spark.createDataFrame([(1, None)], "id bigint, tag string")
    new = spark.createDataFrame([(1, None)], "id bigint, tag string")
    assert snapshot_diff(old, new, ["id"]).count() == 0


def test_snapshot_diff_null_key_matches_nullsafe(spark):
    old = spark.createDataFrame([(None, "x")], "id bigint, tag string")
    new = spark.createDataFrame([(None, "z")], "id bigint, tag string")
    got = [tuple(r) for r in snapshot_diff(old, new, ["id"]).collect()]
    assert got == [(None, "z", "update")]


def test_snapshot_diff_schema_mismatch_raises(spark):
    old = _t(spark)
    new = old.withColumnRenamed("val", "other")
    with pytest.raises(ValueError, match="schemas differ"):
        snapshot_diff(old, new, ["id"])


def test_snapshot_diff_roundtrip_with_merge(spark):
    """Applying the diff to the old snapshot via merge_upsert
    reproduces the new snapshot exactly."""
    old = _t(spark)
    new = spark.createDataFrame(
        [(1, "a", 10.0), (3, "C", 31.0), (5, "e", 50.0)],
        "id bigint, tag string, val double",
    )
    diff = snapshot_diff(old, new, ["id"]).withColumn(
        "is_delete", F.col("change_type") == "delete"
    )
    rolled = merge_upsert(
        old, diff.drop("change_type"), ["id"], delete_col="is_delete"
    )
    assert {tuple(r) for r in rolled.collect()} == {
        tuple(r) for r in new.collect()
    }


# --- incremental_agg_update ----------------------------------------------

def test_incremental_agg_update_matches_recompute(spark):
    from redskins_rule_spark.operators.merge import incremental_agg_update

    base_rows = [(1, 10.0, 2), (2, 5.0, 1), (3, 7.0, 3)]
    base = spark.createDataFrame(base_rows, "k long, total double, n long")
    # insert into k=1 (+4), delete the only row of k=2 (-5), update in
    # k=3 (old 2 -> new 6 as a -2/+6 pair)
    deltas = spark.createDataFrame(
        [(1, 4.0, 1), (2, -5.0, -1), (3, -2.0, -1), (3, 6.0, 1)],
        "k long, total double, n long",
    )
    out = {
        r.k: (r.total, r.n)
        for r in incremental_agg_update(base, deltas, ["k"], ["total"], "n").collect()
    }
    assert out == {1: (14.0, 3), 3: (11.0, 3)}  # k=2 dropped at count 0


def test_incremental_agg_update_validates_schema(spark):
    import pytest as _pytest

    from redskins_rule_spark.operators.merge import incremental_agg_update

    base = spark.createDataFrame([(1, 1.0)], "k long, total double")
    with _pytest.raises(ValueError, match="missing columns"):
        incremental_agg_update(base, base, ["k"], ["total"], "n")


# --- incremental MIN/MAX with targeted recompute ----------------------------

def _minmax_view(spark, rows):
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame(rows, "k int, v long")
        .groupBy("k")
        .agg(F.min("v").alias("min_v"), F.max("v").alias("max_v"))
    )


def test_incremental_minmax_insert_only_folds(spark):
    from redskins_rule_spark.operators.merge import incremental_minmax_update

    base_rows = [(1, 10), (1, 20), (2, 5)]
    base = _minmax_view(spark, base_rows)
    changes = spark.createDataFrame(
        [(1, 3, "insert"), (2, 9, "insert"), (3, 7, "insert")],
        "k int, v long, op string",
    )
    facts = spark.createDataFrame(
        base_rows + [(1, 3), (2, 9), (3, 7)], "k int, v long"
    )
    out = {r.k: (r.min_v, r.max_v) for r in incremental_minmax_update(
        base, changes, facts, ["k"], "v").collect()}
    assert out == {1: (3, 20), 2: (5, 9), 3: (7, 7)}


def test_incremental_minmax_delete_of_extremum_recomputes(spark):
    from redskins_rule_spark.operators.merge import incremental_minmax_update

    base_rows = [(1, 10), (1, 20), (1, 15)]
    base = _minmax_view(spark, base_rows)
    changes = spark.createDataFrame(
        [(1, 20, "delete")], "k int, v long, op string"
    )
    facts = spark.createDataFrame([(1, 10), (1, 15)], "k int, v long")
    out = {r.k: (r.min_v, r.max_v) for r in incremental_minmax_update(
        base, changes, facts, ["k"], "v").collect()}
    assert out == {1: (10, 15)}  # new max found by targeted recompute


def test_incremental_minmax_interior_delete_is_noop(spark):
    from redskins_rule_spark.operators.merge import incremental_minmax_update

    base_rows = [(1, 10), (1, 20), (1, 15)]
    base = _minmax_view(spark, base_rows)
    changes = spark.createDataFrame(
        [(1, 15, "delete")], "k int, v long, op string"
    )
    # facts would disagree if a recompute ran with stale data — the
    # point: an interior delete must not even look at facts
    facts = spark.createDataFrame([(1, 999)], "k int, v long")
    out = {r.k: (r.min_v, r.max_v) for r in incremental_minmax_update(
        base, changes, facts, ["k"], "v").collect()}
    assert out == {1: (10, 20)}


def test_incremental_minmax_group_vanishes_when_all_deleted(spark):
    from redskins_rule_spark.operators.merge import incremental_minmax_update

    base = _minmax_view(spark, [(1, 10)])
    changes = spark.createDataFrame(
        [(1, 10, "delete")], "k int, v long, op string"
    )
    facts = spark.createDataFrame([], "k int, v long")
    assert incremental_minmax_update(
        base, changes, facts, ["k"], "v").count() == 0
