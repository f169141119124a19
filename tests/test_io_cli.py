"""IO readers (CSV/JSON incl. nested), observe metrics, and the CLI."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from redskins_rule_spark.plans.metrics import observed
from redskins_rule_spark.sources.io import (
    read_csv,
    read_json,
    read_parquet,
    table,
    write_parquet,
)

SF_DIR = "/root/testdata/sf0.001"


def test_csv_roundtrip_with_schema(spark, tmp_path):
    p = str(tmp_path / "games.csv")
    with open(p, "w") as f:
        f.write("year,date,team,final\n2004,10/31,Washington,14\n2004,10/31,Green Bay,28\n")
    schema = "year int, date string, team string, final string"
    df = read_csv(spark, p, schema=schema)
    assert df.schema.simpleString() == "struct<year:int,date:string,team:string,final:string>"
    assert df.count() == 2


def test_json_nested_read(spark, tmp_path):
    p = str(tmp_path / "espn.json")
    payload = {
        "events": [
            {
                "date": "2004-10-31",
                "competitions": [
                    {"competitors": [{"id": "28", "score": {"value": 14.0}}]}
                ],
            }
        ]
    }
    with open(p, "w") as f:
        f.write(json.dumps(payload) + "\n")
    schema = (
        "events array<struct<date:string,"
        "competitions:array<struct<competitors:array<struct<id:string,"
        "score:struct<value:double>>>>>>>"
    )
    df = read_json(spark, p, schema=schema)
    flat = df.select(F.explode("events").alias("e")).select(
        F.col("e.date"), F.explode("e.competitions").alias("c")
    )
    assert flat.count() == 1


def test_write_parquet_partitioned_prunes(spark, tmp_path):
    out = str(tmp_path / "by_year")
    df = spark.createDataFrame([(2019, "a"), (2020, "b")], "year int, v string")
    write_parquet(df, out, partition_by=["year"])
    one = read_parquet(spark, out).where(F.col("year") == 2020)
    # partition pruning: only the year=2020 directory is scanned
    plan = one._sc._jvm.PythonSQLUtils.explainString(
        one._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and one.count() == 1


def test_observed_counts_on_same_pass(spark):
    df = spark.range(100).where(F.col("id") % 2 == 0)
    df2, obs = observed(df)
    assert df2.count() == 50
    assert obs.get["n_rows"] == 50


def test_cli_runs_pipeline(spark, tmp_path, monkeypatch):
    # reuse the golden fixtures via the pipeline test helpers
    import pandas as pd

    from redskins_rule_spark.__main__ import main
    from tests.test_redskins_pipeline import (
        ELEC_SCHEMA,
        GOLDEN,
        NFL_SCHEMA,
        _elec_fixture_rows,
        _nfl_fixture_rows,
    )

    golden = pd.read_parquet(GOLDEN)
    for c in ("elec_date", "game_date", "p_elec_date"):
        golden[c] = golden[c].astype(str)
    nfl_dir = str(tmp_path / "nfl")
    elec_dir = str(tmp_path / "elec")
    out = str(tmp_path / "out")
    spark.createDataFrame(_nfl_fixture_rows(golden), NFL_SCHEMA).write.parquet(nfl_dir)
    spark.createDataFrame(_elec_fixture_rows(golden), ELEC_SCHEMA).write.parquet(elec_dir)

    rc = main(["redskins", "--nfl", nfl_dir, "--elections", elec_dir, "--out", out])
    assert rc == 0
    assert spark.read.parquet(out).count() == 12


def test_glob_scan_is_one_filescan(spark, tmp_path):
    # the S7 fix: N files must be ONE FileScan node, not an N-deep
    # union of per-file scans (the reference's loop-union shape)
    out = str(tmp_path / "many")
    for i in range(8):
        spark.range(i * 10, (i + 1) * 10).write.mode(
            "append" if i else "overwrite"
        ).parquet(out)
    df = read_parquet(spark, out)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert plan.count("FileScan") == 1, plan
    assert "Union" not in plan
    assert df.count() == 80


def test_orc_roundtrip_partitioned_prunes(spark, tmp_path):
    from redskins_rule_spark.sources.io import read_orc, write_table

    src = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    d = str(tmp_path / "orders_orc")
    write_table(src, d, fmt="orc", partition_by=["o_orderpriority"])

    back = read_orc(spark, d)
    assert back.count() == src.count()
    # partition pruning: a priority filter must reach the scan as a
    # PartitionFilter, not a post-scan Filter over all files
    pruned = back.where(back.o_orderpriority == "1-URGENT")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    want = src.where(src.o_orderpriority == "1-URGENT").count()
    assert pruned.count() == want


def test_write_table_csv_json_roundtrip(spark, tmp_path):
    from redskins_rule_spark.sources.io import read_csv, read_json, write_table

    src = table(spark, SF_DIR, "nation")
    schema = "n_nationkey int, n_name string, n_regionkey int"
    src = src.select("n_nationkey", "n_name", "n_regionkey")

    csv_d = str(tmp_path / "nation_csv")
    write_table(src, csv_d, fmt="csv")
    assert {tuple(r) for r in read_csv(spark, csv_d, schema).collect()} == {
        tuple(r) for r in src.collect()
    }

    json_d = str(tmp_path / "nation_json")
    write_table(src, json_d, fmt="json")
    assert {tuple(r) for r in read_json(spark, json_d, schema).collect()} == {
        tuple(r) for r in src.collect()
    }


def test_write_table_rejects_unknown_format(spark, tmp_path):
    from redskins_rule_spark.sources.io import write_table

    src = table(spark, SF_DIR, "nation")
    with pytest.raises(ValueError, match="unsupported sink format"):
        write_table(src, str(tmp_path / "x"), fmt="avro")


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    # S12 warehouse load step: write through the JDBC sink into an
    # embedded Derby DB (driver bundled with Spark), read back through
    # the partitioned JDBC scan, require exact equality.
    from redskins_rule_spark.sources.io import read_jdbc, write_table

    url = f"jdbc:derby:{tmp_path}/wh;create=true"
    df = spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.25), (3, None, None)],
        "id bigint, tag string, val double",
    )
    write_table(df, "results", fmt="jdbc", url=url)

    back = read_jdbc(
        spark, url, "results",
        partition_column="id", lower_bound=1, upper_bound=4, num_partitions=2,
    )
    assert back.rdd.getNumPartitions() == 2  # parallel range scan
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}

    # mode=append doubles the rows; overwrite resets
    write_table(df, "results", fmt="jdbc", mode="append", url=url)
    assert read_jdbc(spark, url, "results").count() == 6
    write_table(df, "results", fmt="jdbc", mode="overwrite", url=url)
    assert read_jdbc(spark, url, "results").count() == 3


def test_jdbc_sink_validation(spark):
    import pytest as _pytest

    from redskins_rule_spark.sources.io import write_table

    df = spark.range(1)
    with _pytest.raises(ValueError, match="url"):
        write_table(df, "t", fmt="jdbc")
    with _pytest.raises(ValueError, match="partition_by"):
        write_table(df, "t", fmt="jdbc", partition_by=["id"], url="jdbc:derby:x")


# -- compaction --------------------------------------------------------------

from redskins_rule_spark.sources.io import compact_parquet  # noqa: E402


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    import pyspark.sql.functions as F

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(
        32
    ).write.parquet(src)
    n_before = len(list((tmp_path / "frag").glob("part-*.parquet")))
    n_target = compact_parquet(spark, src, out, target_file_bytes=1 << 30)
    n_after = len(list((tmp_path / "compact").glob("part-*.parquet")))
    assert n_before == 32 and n_target == 1 and n_after == 1
    got = spark.read.parquet(out)
    assert got.count() == 10_000
    assert got.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(10_000))


def test_compact_parquet_refuses_overwrite(spark, tmp_path):
    import pytest as _pytest

    src = str(tmp_path / "src")
    spark.range(10).write.parquet(src)
    out = str(tmp_path / "out")
    compact_parquet(spark, src, out)
    with _pytest.raises(Exception):
        compact_parquet(spark, src, out)  # mode("error") protects the target


def test_parquet_manifest_prunes_files_losslessly(spark, tmp_path):
    """Range-partitioned write -> footer manifest -> file-level prune:
    reading ONLY the kept files + filter equals the full scan +
    filter, and the prune actually skips files."""
    import os

    from pyspark.sql import functions as F

    from redskins_rule_spark.sources.io import (
        parquet_file_stats,
        prune_files_by_range,
    )

    out = str(tmp_path / "ranged")
    df = spark.range(10_000).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    # range layout = the manifest's best case (disjoint per-file spans)
    df.repartitionByRange(8, "k").write.mode("overwrite").parquet(out)

    manifest = parquet_file_stats(spark, out, ["k"])
    kept = prune_files_by_range(manifest, "k", 2_000.0, 2_500.0)
    n_files = manifest.select("file").distinct().count()
    assert 0 < len(kept) < n_files  # pruning really skips files

    pruned_scan = spark.read.parquet(*[os.path.join(out, f) for f in kept])
    expect = df.where((F.col("k") >= 2000) & (F.col("k") <= 2500))
    got = pruned_scan.where((F.col("k") >= 2000) & (F.col("k") <= 2500))
    assert sorted(r.k for r in got.collect()) == sorted(
        r.k for r in expect.collect()
    )
    # stats sanity: manifest totals cover every row
    tot = manifest.agg(F.sum("n_values").alias("s")).collect()[0].s
    assert tot == 10_000


def test_parquet_manifest_partitioned_layout_and_string_stats(spark, tmp_path):
    """ADVICE r4: a partitioned layout (shard=N/part-*.parquet) must
    yield a NON-empty manifest (recursive glob), and a string column's
    footer stats must not crash float() — they degrade to stats-less
    must-read rows instead."""
    import os

    from pyspark.sql import functions as F

    from redskins_rule_spark.sources.io import (
        parquet_file_stats,
        prune_files_by_range,
    )

    out = str(tmp_path / "parts")
    df = spark.range(1_000).select(
        (F.col("id") % 4).alias("shard"),
        F.col("id").cast("long").alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    df.write.partitionBy("shard").mode("overwrite").parquet(out)

    manifest = parquet_file_stats(spark, out, ["k", "s"])
    rows = manifest.collect()
    assert rows, "partitioned layout produced an empty manifest"
    assert all(os.sep in r.file for r in rows)  # shard=N/ prefix kept
    # string stats: never a crash, and never a partial numeric range
    for r in rows:
        if r.col == "s":
            assert r.min_v is None and r.max_v is None and r.n_null is None
    # stats-less rows are must-reads: pruning on the string col keeps all
    kept = prune_files_by_range(manifest, "s", 0.0, 1.0)
    assert len(kept) == manifest.select("file").distinct().count()
    # and the numeric column still counts every row across shards
    tot = manifest.where(F.col("col") == "k").agg(
        F.sum("n_values").alias("t")).collect()[0].t
    assert tot == 1_000


def test_prune_manifest_df_variant_matches_list_variant(spark, tmp_path):
    """VERDICT r4 item 3: the DataFrame-native prune returns exactly
    the files the list variant returns, on the range-partitioned
    fixture, for in-range / partial / empty windows."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.sources.io import (
        parquet_file_stats,
        prune_files_by_range,
        prune_manifest_by_range,
    )

    out = str(tmp_path / "ranged")
    spark.range(10_000).select(
        F.col("id").cast("long").alias("k")
    ).repartitionByRange(8, "k").write.mode("overwrite").parquet(out)
    manifest = parquet_file_stats(spark, out, ["k"])

    for lo, hi in ((2_000.0, 2_500.0), (-5.0, -1.0), (0.0, 99_999.0)):
        as_list = prune_files_by_range(manifest, "k", lo, hi)
        as_df = sorted(
            r.file
            for r in prune_manifest_by_range(manifest, "k", lo, hi).collect()
        )
        assert as_df == as_list


def test_read_parquet_evolving_merges_generations(spark, tmp_path):
    """Generation 1 lacks a column generation 2 added; the merged
    scan exposes it lake-wide with NULLs for the old rows."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.sources.io import read_parquet_evolving

    lake = str(tmp_path / "lake")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    ).write.parquet(lake)
    spark.createDataFrame(
        [(3, 30.0, "eu"), (4, 40.0, "us")], "k long, v double, region string"
    ).write.mode("append").parquet(lake)

    got = read_parquet_evolving(spark, lake)
    assert set(got.columns) == {"k", "v", "region"}
    rows = {r.k: r.region for r in got.collect()}
    assert rows == {1: None, 2: None, 3: "eu", 4: "us"}
    # plain read without mergeSchema may drop the new column
    # (footer-of-first-file schema) — the evolving face is the fix
    assert got.where(F.col("region").isNotNull()).count() == 2


def test_read_json_tolerant_quarantines_bad_lines(spark, tmp_path):
    from redskins_rule_spark.sources.io import read_json_tolerant

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"k": 1, "v": "a"}\n'
        "this is not json\n"
        '{"k": 2, "v": "b"}\n'
        '{"k": "NOT_A_NUMBER_TYPE_MISMATCH", "v": 3}\n'
    )
    good, bad = read_json_tolerant(spark, str(p), "k long, v string")
    assert {(r.k, r.v) for r in good.collect()} == {(1, "a"), (2, "b")}
    bad_rows = [r["_corrupt_record"] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("not json" in b for b in bad_rows)


def test_read_csv_tolerant_quarantines_bad_lines(spark, tmp_path):
    """VERDICT r7 item 7: the CSV mirror of read_json_tolerant — type
    mismatches and wrong-arity lines quarantine with the raw line
    preserved, good rows parse, and the quarantine file replays into
    the same splitter after a 'producer fix'."""
    from redskins_rule_spark.sources.io import read_csv_tolerant

    p = tmp_path / "in.csv"
    p.write_text(
        "1,a,2.5\n"
        "NOT_A_NUMBER,b,1.0\n"   # type mismatch in k
        "2,c\n"                   # missing column
        "3,d,7.25\n"
    )
    schema = "k long, v string, x double"
    good, bad = read_csv_tolerant(spark, str(p), schema)
    assert {(r.k, r.v, r.x) for r in good.collect()} == {
        (1, "a", 2.5), (3, "d", 7.25)
    }
    bad_rows = sorted(r["_corrupt_record"] for r in bad.collect())
    assert bad_rows == ["2,c", "NOT_A_NUMBER,b,1.0"]
    # replay: quarantined raw lines re-enter the same splitter
    q = tmp_path / "quarantine.csv"
    q.write_text("\n".join(bad_rows).replace("NOT_A_NUMBER", "4") + "\n")
    regood, rebad = read_csv_tolerant(spark, str(q), schema)
    assert {(r.k, r.v, r.x) for r in regood.collect()} == {(4, "b", 1.0)}
    # '2,c' stays short until producer fix (collect, not count: Spark
    # disallows corrupt-column-only queries over a raw CSV scan)
    assert len(rebad.collect()) == 1
    # header + sep faces
    h = tmp_path / "hdr.csv"
    h.write_text("k;v;x\n5;e;0.5\n")
    hg, hb = read_csv_tolerant(spark, str(h), schema, header=True, sep=";")
    assert [(r.k, r.v, r.x) for r in hg.collect()] == [(5, "e", 0.5)]
    assert hb.collect() == []


def test_read_binary_files_feeds_real_decoder(spark, tmp_path):
    """End-to-end media ingest: PNG files on disk -> binaryFile rows
    -> the real PNG decoder over the content column. Glob filtering
    excludes non-matching files at listing time."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.functions.png import encode_png, synth_pixels
    from redskins_rule_spark.operators.multimodal import decode_png_stats
    from redskins_rule_spark.sources.io import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    for clen in (10, 25):
        w, h = clen % 13 + 1, clen % 7 + 1
        (d / f"img_{clen}.png").write_bytes(
            encode_png(synth_pixels(clen, w, h), w, h)
        )
    (d / "notes.txt").write_text("not an image")

    df = read_binary_files(spark, str(d), glob="*.png")
    assert df.count() == 2  # the .txt never entered the scan
    payloads = df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
        F.col("content").alias("payload"),
        "length",
    )
    assert {r.length for r in payloads.collect()} == {
        len((d / f"img_{c}.png").read_bytes()) for c in (10, 25)
    }
    stats = {
        r.name: r
        for r in decode_png_stats(payloads, "payload", "name").collect()
    }
    assert (stats["img_10.png"].width, stats["img_10.png"].height) == (11, 4)
    assert (stats["img_25.png"].width, stats["img_25.png"].height) == (13, 5)


def test_read_text_lines_and_whole_file(spark, tmp_path):
    from redskins_rule_spark.sources.io import read_text_lines

    p = tmp_path / "corpus.txt"
    p.write_text("alpha\nbeta\ngamma\n")
    lines = read_text_lines(spark, str(p))
    assert sorted(r.value for r in lines.collect()) == [
        "alpha", "beta", "gamma"
    ]
    whole = read_text_lines(spark, str(p), whole_file=True)
    assert whole.count() == 1
    assert whole.collect()[0].value == "alpha\nbeta\ngamma\n"
