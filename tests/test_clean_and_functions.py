from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from redskins_rule_spark.functions.dates import election_days, election_days_py
from redskins_rule_spark.functions.hashing import (
    char_fingerprint,
    minhash_signature,
    shingles,
    word_shingles,
)
from redskins_rule_spark.operators.clean import (
    assemble_mdy_date,
    digits_to_long,
    extract_day_month,
    filter_regular_season,
    filter_unplayed,
    rename_index_column,
    strip_parenthetical,
)


def test_clean_chain_reproduces_reference_quirks(spark):
    # fixture rows per FIXTURES.md §1 (scraped-data quirks intact)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("", T.StringType()),  # pandas CSV index quirk
            T.StructField("year", T.IntegerType()),
            T.StructField("date", T.StringType()),
            T.StructField("team", T.StringType()),
            T.StructField("final", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            ("6", 1976, "10/31", "Dallas", "20"),
            ("7", 1976, "10/31", "Washington", "7"),
            ("10", 1976, "Sat, December 12", "Washington (OT)", "--"),
        ],
        schema,
    )
    df = rename_index_column(df)
    assert "row_num" in df.columns
    df = filter_unplayed(df)
    df = filter_regular_season(df)
    out = df.select(
        strip_parenthetical("team").alias("team"),
        assemble_mdy_date(extract_day_month("date"), "year").alias("game_date"),
        F.col("final").cast("int").alias("final"),
    ).collect()
    assert {r.team for r in out} == {"Dallas", "Washington"}
    assert all(r.game_date == dt.date(1976, 10, 31) for r in out)


def test_digits_to_long(spark):
    df = spark.createDataFrame([("40,825,839",)], "v string")
    assert df.select(digits_to_long("v").alias("x")).first().x == 40825839


def test_election_days_matches_python_oracle(spark):
    got = [r.elec_date for r in election_days(spark, 1976, 2024).collect()]
    assert got == election_days_py(1976, 2024)
    # known anchors
    assert dt.date(1976, 11, 2) in got and dt.date(2020, 11, 3) in got


def test_shingles_and_minhash(spark):
    df = spark.createDataFrame([("abcdef",), ("ab",)], "t string")
    rows = df.select(shingles("t", 3).alias("s")).collect()
    assert rows[0].s == ["abc", "bcd", "cde", "def"]
    assert rows[1].s == []
    sig = (
        df.filter(F.length("t") > 2)
        .select(minhash_signature(shingles("t", 3), num_perm=8).alias("m"))
        .first()
        .m
    )
    assert len(sig) == 8 and all(isinstance(x, int) for x in sig)
    # identical input ⇒ identical signature (deterministic)
    sig2 = (
        spark.createDataFrame([("abcdef",)], "t string")
        .select(minhash_signature(shingles("t", 3), num_perm=8).alias("m"))
        .first()
        .m
    )
    assert sig == sig2


def test_word_shingles(spark):
    df = spark.createDataFrame([("the quick brown fox",)], "t string")
    assert df.select(word_shingles("t", 2).alias("s")).first().s == [
        "the quick", "quick brown", "brown fox",
    ]


def test_char_fingerprint_deterministic(spark):
    df = spark.createDataFrame([("hello world",), ("hello world",), ("x",)], "t string")
    vals = [r.f for r in df.select(char_fingerprint("t").alias("f")).collect()]
    assert vals[0] == vals[1] != vals[2]
