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
