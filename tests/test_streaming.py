"""Structured Streaming tests.

Core invariant: every streaming operator is the SAME expression as
batch, so draining a file-source stream with Trigger.AvailableNow must
produce exactly the batch result on the same files (streaming/batch
parity). Also pins incremental pickup (second run with the same
checkpoint sees only new files) and the applyInPandasWithState
running-total operator.
"""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from redskins_rule_spark.sources.io import table
from redskins_rule_spark.streaming import (
    run_available_now,
    sessionized_counts,
    stateful_running_totals,
    stream_from_files,
    streaming_dedup,
    tumbling_counts,
)
from redskins_rule_spark.streaming.ops import run_available_now_to_files

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Events table re-written as a plain-timestamp parquet landing
    dir (the raw testdata file carries TIMESTAMP(NANOS), which the
    streaming source can't read without the session-level legacy
    conf — `table()` normalizes it).

    A far-future SENTINEL event (user_id/event_id = -1) is appended so
    the watermark advances past every real window: append-mode
    aggregations only emit windows the watermark has closed, so
    without it the tail windows would sit in state forever and
    streaming/batch parity could not be exact. The sentinel's own
    (unclosed) window is the only row the stream withholds.
    """
    d = str(tmp_path / "landing")
    ev = table(spark, SF_DIR, "events")
    ev.write.parquet(d)
    sentinel_ts = ev.agg(
        (F.max("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts")
    )
    sentinel = sentinel_ts.select(
        F.lit(-1).cast("bigint").alias("event_id"),
        "ts",
        F.lit(-1).cast("bigint").alias("user_id"),
        F.lit("sentinel").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sentinel.coalesce(1).write.mode("append").parquet(d)
    return d


def _drain(spark, stream_df, tmp_path, mode="append"):
    name = f"sink_{uuid.uuid4().hex[:8]}"
    run_available_now(stream_df, str(tmp_path / f"ckpt_{name}"), name, mode)
    return spark.table(name)


def test_tumbling_counts_stream_matches_batch(spark, tmp_path, events_dir):
    batch = table(spark, SF_DIR, "events")
    schema = spark.read.parquet(events_dir).schema
    stream = stream_from_files(spark, events_dir, schema)

    # expected: batch result on the REAL events (sentinel's window is
    # the one row append mode correctly withholds — never closed)
    want = {
        tuple(r)
        for r in tumbling_counts(batch, group_extra=["event_type"]).collect()
    }
    got = {
        tuple(r)
        for r in _drain(
            spark, tumbling_counts(stream, group_extra=["event_type"]), tmp_path
        ).collect()
    }
    assert got == want and len(want) > 0


def test_sessionized_counts_stream_matches_batch(spark, tmp_path, events_dir):
    batch = table(spark, SF_DIR, "events")
    schema = spark.read.parquet(events_dir).schema
    stream = stream_from_files(spark, events_dir, schema)
    want = {tuple(r) for r in sessionized_counts(batch).collect()}
    got = {
        tuple(r)
        for r in _drain(spark, sessionized_counts(stream), tmp_path).collect()
        if r["user_id"] != -1
    }
    assert got == want and len(want) > 0


def test_available_now_is_incremental(spark, tmp_path, events_dir):
    schema = spark.read.parquet(events_dir).schema
    ckpt = str(tmp_path / "ckpt_inc")
    out = str(tmp_path / "out_inc")

    stream = stream_from_files(spark, events_dir, schema)
    run_available_now_to_files(stream.select("event_id"), ckpt, out)
    n1 = spark.read.parquet(out).count()
    total = spark.read.parquet(events_dir).count()
    assert n1 == total

    # drop a NEW file into the landing dir; a second run with the same
    # checkpoint must process only that file
    extra = spark.range(5).select(
        (F.col("id") + 10**9).alias("event_id"),
        F.current_timestamp().alias("ts"),
        F.lit(1).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    extra.coalesce(1).write.mode("append").parquet(events_dir)
    stream2 = stream_from_files(spark, events_dir, schema)
    run_available_now_to_files(stream2.select("event_id"), ckpt, out)
    assert spark.read.parquet(out).count() == n1 + 5


def test_streaming_dedup(spark, tmp_path, events_dir):
    # duplicate every file's contents, then dedup by event_id
    dup_dir = str(tmp_path / "dup_landing")
    src = spark.read.parquet(events_dir)
    src.unionByName(src).write.parquet(dup_dir)
    schema = src.schema
    stream = stream_from_files(spark, dup_dir, schema)
    out = _drain(spark, streaming_dedup(stream, ["event_id"]), tmp_path)
    assert out.count() == src.count()
    assert out.select("event_id").distinct().count() == src.count()


def test_stateful_running_totals(spark, tmp_path):
    land = str(tmp_path / "state_landing")
    spark.createDataFrame(
        [(1, 10.0), (1, 5.0), (2, 1.0)], "user_id bigint, value double"
    ).write.parquet(land)
    schema = spark.read.parquet(land).schema
    stream = stream_from_files(spark, land, schema)
    out = _drain(spark, stateful_running_totals(stream), tmp_path, mode="update")
    rows = {r["user_id"]: (r["n_events"], r["total_value"]) for r in out.collect()}
    assert rows == {1: (2, 15.0), 2: (1, 1.0)}

    shutil.rmtree(str(tmp_path / "state_landing"), ignore_errors=True)


def test_stream_stream_join_matches_batch(spark, tmp_path, events_dir):
    # click→purchase attribution: purchases within 30 min of a click
    # by the same user. Inner stream-stream joins emit matches as they
    # arrive (no window-close wait), so parity with batch is exact.
    from redskins_rule_spark.streaming import stream_stream_join

    batch = spark.read.parquet(events_dir)
    bl = batch.where(F.col("event_type") == "click")
    br = batch.where(F.col("event_type") == "purchase")
    want = {
        tuple(r)
        for r in stream_stream_join(bl, br, within="30 minutes")
        .select("event_id", "r_event_id")
        .collect()
    }

    schema = batch.schema
    sl = stream_from_files(spark, events_dir, schema).where(
        F.col("event_type") == "click"
    )
    sr = stream_from_files(spark, events_dir, schema).where(
        F.col("event_type") == "purchase"
    )
    got = {
        tuple(r)
        for r in _drain(
            spark,
            stream_stream_join(sl, sr, within="30 minutes").select(
                "event_id", "r_event_id"
            ),
            tmp_path,
        ).collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_join_left_outer_batch_path(spark, events_dir):
    # leftOuter on batch frames: every click survives; unmatched ones
    # carry null right columns (the one-code-path backfill contract)
    from redskins_rule_spark.streaming import stream_stream_join

    batch = spark.read.parquet(events_dir)
    bl = batch.where(F.col("event_type") == "click")
    br = batch.where(F.col("event_type") == "purchase")
    out = stream_stream_join(bl, br, within="30 minutes", how="leftOuter")
    assert out.count() >= bl.count()
    n_unmatched = out.where(F.col("r_event_id").isNull()).count()
    inner = stream_stream_join(bl, br, within="30 minutes")
    assert out.count() == inner.count() + n_unmatched


def test_stateful_cdc_latest_matches_batch_q110(spark, tmp_path):
    """Streaming CDC latest-wins state op == the batch q110 semantics
    on the same change log, including out-of-order replays (an older
    change arriving later must not regress the snapshot) and deletes."""
    import datetime as dt

    from redskins_rule_spark.streaming.ops import stateful_cdc_latest

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: upsert, newer upsert, then an OLD replayed change
        (0, ts(0), 1, "view", 10.0, "{}"),
        (1, ts(5), 1, "purchase", 20.0, "{}"),
        (2, ts(2), 1, "click", 15.0, "{}"),     # stale: must lose
        # user 2: upsert then delete (latest wins -> deleted)
        (3, ts(1), 2, "view", 5.0, "{}"),
        (4, ts(9), 2, "error", 0.0, "{}"),
        # user 3: tie timestamp -> higher event_id wins
        (5, ts(4), 3, "view", 1.0, "{}"),
        (6, ts(4), 3, "view", 2.0, "{}"),
    ]
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    land = str(tmp_path / "cdc_landing")
    spark.createDataFrame(rows, schema).write.parquet(land)

    stream = stream_from_files(spark, land, spark.read.parquet(land).schema)
    out = _drain(spark, stateful_cdc_latest(stream), tmp_path, mode="update")
    got = {
        r["user_id"]: (r["current_value"], r["n_changes"], r["deleted"])
        for r in out.collect()
    }
    assert got == {
        1: (20.0, 3, False),   # stale replay did not regress
        2: (None, 2, True),    # delete wins
        3: (2.0, 2, False),    # event_id tiebreak
    }

    shutil.rmtree(land, ignore_errors=True)


def test_stateful_pit_enrich_matches_batch_pit_join(spark, tmp_path):
    """Stream PIT enrichment == batch pit_join on the same interleaved
    dim/fact log when versions arrive no later than the facts they
    serve; same-batch arrival ORDER must not matter (facts bind by
    event time). Also: version cap keeps only the latest versions."""
    import datetime as dt

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.asof import pit_join
    from redskins_rule_spark.streaming.ops import stateful_pit_enrich

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # (event_id, ts, user_id, is_dim, value) — note fact 100 is listed
    # BEFORE dim 11 though dim 11 has the earlier event time: same
    # batch, so event-time binding must still pick dim 11.
    rows = [
        (10, ts(0), 1, True, 100.0),
        (100, ts(7), 1, False, 1.0),
        (11, ts(5), 1, True, 200.0),
        (101, ts(5), 1, False, 2.0),     # exactly at v11 -> sees 200
        (102, ts(-1), 1, False, 3.0),    # before any version -> nulls
        (12, ts(2), 2, True, 7.0),
        (103, ts(3), 2, False, 4.0),
    ]
    schema = "event_id bigint, ts timestamp, user_id bigint, is_dim boolean, value double"
    land = str(tmp_path / "pit_landing")
    spark.createDataFrame(rows, schema).write.parquet(land)

    stream = stream_from_files(spark, land, spark.read.parquet(land).schema)
    out = _drain(spark, stateful_pit_enrich(stream), tmp_path, mode="append")
    got = {
        r["event_id"]: (r["fact_value"], r["dim_value"], r["dim_ts_us"])
        for r in out.collect()
    }
    us = lambda m: int(ts(m).timestamp() * 1_000_000)  # noqa: E731
    assert got == {
        100: (1.0, 200.0, us(5)),
        101: (2.0, 200.0, us(5)),
        102: (3.0, None, None),
        103: (4.0, 7.0, us(2)),
    }

    # batch parity for the facts that have a serving version
    df = spark.createDataFrame(rows, schema)
    dim = df.where("is_dim").select(
        "user_id", "event_id", F.col("value").alias("dim_value"), "ts"
    )
    facts = df.where("NOT is_dim").select("event_id", "user_id", "value", "ts")
    batch = {
        r["event_id"]: r["dim_value"]
        for r in pit_join(
            facts, dim, by=["user_id"], fact_ts="ts", dim_ts="ts",
            payload=["dim_value"], dim_tiebreak=["event_id"],
        ).collect()
    }
    stream_served = {k: v[1] for k, v in got.items() if v[1] is not None}
    assert batch == stream_served

    import shutil

    shutil.rmtree(land, ignore_errors=True)


def test_stateful_pit_enrich_version_cap(spark, tmp_path):
    """With max_versions=2 only the latest two dim versions survive;
    a fact older than the retained horizon binds to nothing."""
    import datetime as dt

    from redskins_rule_spark.streaming.ops import stateful_pit_enrich

    t0 = dt.datetime(2024, 6, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, ts(0), 1, True, 10.0),
        (2, ts(10), 1, True, 20.0),
        (3, ts(20), 1, True, 30.0),      # evicts version ts(0)
        (100, ts(5), 1, False, 1.0),     # ts(0) evicted -> null
        (101, ts(25), 1, False, 2.0),    # -> 30
    ]
    schema = "event_id bigint, ts timestamp, user_id bigint, is_dim boolean, value double"
    land = str(tmp_path / "pitcap_landing")
    spark.createDataFrame(rows, schema).write.parquet(land)
    stream = stream_from_files(spark, land, spark.read.parquet(land).schema)
    out = _drain(
        spark, stateful_pit_enrich(stream, max_versions=2), tmp_path,
        mode="append",
    )
    got = {r["event_id"]: r["dim_value"] for r in out.collect()}
    assert got == {100: None, 101: 30.0}

    import shutil

    shutil.rmtree(land, ignore_errors=True)


def test_run_incremental_view_folds_batches(spark, tmp_path):
    """foreachBatch incremental-view runner: after draining two
    landing waves, the maintained view equals a full recompute over
    everything landed (the q91 invariant, stream-driven)."""
    import uuid

    from pyspark.sql import functions as F

    from redskins_rule_spark.streaming.ops import run_incremental_view

    land = str(tmp_path / "mv_landing")
    ckpt = str(tmp_path / "mv_ckpt")
    view = f"mv_{uuid.uuid4().hex[:8]}"
    schema = "k long, v double"

    def build_delta(batch_df):
        return batch_df.groupBy("k").agg(
            F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
        )

    wave1 = [(1, 10.0), (1, 5.0), (2, 7.0)]
    wave2 = [(1, 1.0), (3, 2.0)]
    spark.createDataFrame(wave1, schema).write.mode("append").parquet(land)
    stream = stream_from_files(spark, land, schema)
    run_incremental_view(stream, build_delta, ["k"], ["total"], ckpt, view)
    got1 = {r.k: (r.total, r.n) for r in spark.table(view).collect()}
    assert got1 == {1: (15.0, 2), 2: (7.0, 1)}

    spark.createDataFrame(wave2, schema).write.mode("append").parquet(land)
    stream = stream_from_files(spark, land, schema)
    run_incremental_view(stream, build_delta, ["k"], ["total"], ckpt, view)
    got2 = {r.k: (r.total, r.n) for r in spark.table(view).collect()}
    assert got2 == {1: (16.0, 3), 2: (7.0, 1), 3: (2.0, 1)}

    import shutil

    shutil.rmtree(land, ignore_errors=True)


def test_streaming_dd_sketch_maintenance(spark, tmp_path):
    """Quantile sketches maintained incrementally: the MV runner folds
    per-batch DD bucket counts; the state assembled from the view
    after two waves is EXACTLY the one-pass sketch of everything
    landed (DD merge is linear), so the quantile read matches too."""
    import uuid

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import (
        dd_bucket,
        dd_quantile,
        dd_state,
    )
    from redskins_rule_spark.streaming.ops import (
        run_incremental_view,
        stream_from_files,
    )

    land = str(tmp_path / "dd_landing")
    ckpt = str(tmp_path / "dd_ckpt")
    view = f"dd_{uuid.uuid4().hex[:8]}"
    schema = "g string, v double"

    def build_delta(batch_df):
        vv = F.col("v").cast("double")
        return (
            batch_df.where(vv.isNotNull() & (vv > 0))
            .groupBy("g", dd_bucket(vv).alias("b"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    wave1 = [("a", float(x)) for x in (1, 2, 2, 30, 400, 500)]
    wave2 = [("a", float(x)) for x in (2, 3, 600, 700)]
    spark.createDataFrame(wave1, schema).write.mode("append").parquet(land)
    run_incremental_view(
        stream_from_files(spark, land, schema), build_delta, ["g", "b"], [], ckpt, view
    )
    spark.createDataFrame(wave2, schema).write.mode("append").parquet(land)
    run_incremental_view(
        stream_from_files(spark, land, schema), build_delta, ["g", "b"], [], ckpt, view
    )

    maintained = (
        spark.table(view)
        .groupBy("g")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("b", "n")))
            ).alias("dd")
        )
    )
    one_pass = dd_state(
        spark.createDataFrame(wave1 + wave2, schema), ["g"], "v"
    )
    m = maintained.collect()[0].dd
    o = one_pass.collect()[0].dd
    assert sorted(m.items()) == sorted(o.items())
    est = maintained.select(dd_quantile(F.col("dd"), 0.5).alias("p50")).collect()[0].p50
    exact = sorted(x for _, x in wave1 + wave2)[4]  # rank 1+floor(0.5*9)
    assert abs(est - exact) <= 0.01 * exact * 1.0001

    import shutil

    shutil.rmtree(land, ignore_errors=True)


def test_streaming_kmv_sketch_view(spark, tmp_path):
    """Mergeable-state runner with KMV: after two waves the
    maintained per-key sketch equals the one-pass sketch of all
    landed data (min-k semilattice), so distinct estimates match."""
    import uuid

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_state,
    )
    from redskins_rule_spark.streaming.ops import (
        run_incremental_sketch_view,
        stream_from_files,
    )

    land = str(tmp_path / "kmv_landing")
    ckpt = str(tmp_path / "kmv_ckpt")
    view = f"kmv_{uuid.uuid4().hex[:8]}"
    schema = "g string, v string"
    k = 16

    def build(batch_df):
        return kmv_state(batch_df, ["g"], "v", k=k)

    wave1 = [("a", f"u{i}") for i in range(40)] + [("b", f"w{i % 3}") for i in range(9)]
    wave2 = [("a", f"u{i}") for i in range(20, 60)] + [("c", "solo")]
    spark.createDataFrame(wave1, schema).write.mode("append").parquet(land)
    run_incremental_sketch_view(
        stream_from_files(spark, land, schema), build, ["g"], "kmv",
        lambda a, b: kmv_merge(a, b, k=k), ckpt, view,
    )
    spark.createDataFrame(wave2, schema).write.mode("append").parquet(land)
    run_incremental_sketch_view(
        stream_from_files(spark, land, schema), build, ["g"], "kmv",
        lambda a, b: kmv_merge(a, b, k=k), ckpt, view,
    )

    one_pass = kmv_state(
        spark.createDataFrame(wave1 + wave2, schema), ["g"], "v", k=k
    )
    m = {r.g: list(r.kmv) for r in spark.table(view).collect()}
    o = {r.g: list(r.kmv) for r in one_pass.collect()}
    assert m == o  # lossless across the stream boundary
    est = {
        r.g: r.est
        for r in spark.table(view)
        .select("g", kmv_estimate(F.col("kmv"), k=k).alias("est"))
        .collect()
    }
    assert est["b"] == 3 and est["c"] == 1  # exact below k
    assert est["a"] >= 40  # 60 distinct, k=16 estimate in range
    assert est["a"] <= 90

    import shutil

    shutil.rmtree(land, ignore_errors=True)


def test_streaming_psi_drift_monitor(spark, tmp_path):
    """Drift monitoring off a maintained histogram: the MV runner
    keeps current-period bin counts fresh per micro-batch; PSI read
    from the maintained counts equals the batch psi_report over all
    landed data (bin contract fixed by the reference bounds)."""
    import uuid

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.analytic import (
        psi_from_counts,
        psi_report,
    )
    from redskins_rule_spark.streaming.ops import (
        run_incremental_view,
        stream_from_files,
    )

    bins = 8
    ref_rows = [(float(i % 40),) for i in range(400)]
    ref = spark.createDataFrame(ref_rows, "v double")
    lo, hi = 0.0, 39.0
    w = (hi - lo) / bins

    land = str(tmp_path / "psi_landing")
    ckpt = str(tmp_path / "psi_ckpt")
    view = f"psi_{uuid.uuid4().hex[:8]}"

    def build_delta(batch_df):
        b = F.least(
            F.greatest(F.floor((F.col("v") - F.lit(lo)) / F.lit(w)).cast("int"),
                       F.lit(0)),
            F.lit(bins - 1),
        )
        return batch_df.where(F.col("v").isNotNull()).groupBy(
            b.alias("bin_id")
        ).agg(F.count(F.lit(1)).alias("n"))

    wave1 = [(float(i % 40) + 15.0,) for i in range(300)]
    wave2 = [(float(i % 25) + 30.0,) for i in range(200)]
    for wave in (wave1, wave2):
        spark.createDataFrame(wave, "v double").write.mode("append").parquet(land)
        run_incremental_view(
            stream_from_files(spark, land, "v double"),
            build_delta, ["bin_id"], [], ckpt, view,
        )

    ref_counts = build_delta(ref).withColumnRenamed("n", "n_ref")
    spine = spark.range(bins).select(F.col("id").cast("int").alias("bin_id"))
    maintained = (
        spine.join(ref_counts, "bin_id", "left")
        .join(spark.table(view).withColumnRenamed("n", "n_cur"), "bin_id", "left")
        .select(
            "bin_id",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    psi_stream = (
        psi_from_counts(maintained, bins)
        .agg(F.sum("term").alias("psi")).collect()[0].psi
    )
    cur_all = spark.createDataFrame(wave1 + wave2, "v double")
    psi_batch = (
        psi_report(ref, cur_all, "v", bins=bins)
        .agg(F.sum("term").alias("psi")).collect()[0].psi
    )
    assert abs(psi_stream - psi_batch) < 1e-12
    assert psi_stream > 0.1  # the injected shift is visible

    import shutil

    shutil.rmtree(land, ignore_errors=True)


def test_streaming_bloom_seen_keys(spark, tmp_path):
    """Streaming maintenance of a seen-keys Bloom filter: two landing
    waves fold via bloom_merge into exactly the batch-built bitmap of
    everything landed, and the membership test keeps its
    no-false-negative contract against the full key set."""
    import uuid

    from pyspark.sql import functions as F

    from redskins_rule_spark.operators.skew import (
        bloom_build,
        bloom_merge,
        bloom_might_contain,
    )
    from redskins_rule_spark.streaming.ops import (
        run_incremental_sketch_view,
        stream_from_files,
    )

    land = str(tmp_path / "bloom_landing")
    ckpt = str(tmp_path / "bloom_ckpt")
    view = f"bloom_{uuid.uuid4().hex[:8]}"
    m, k = 1 << 12, 3

    def build(batch_df):
        return bloom_build(batch_df, "key", m_bits=m, k=k).withColumn(
            "g", F.lit(1)
        )

    wave1 = [(i,) for i in range(0, 60)]
    wave2 = [(i,) for i in range(50, 120)]
    for wave in (wave1, wave2):
        spark.createDataFrame(wave, "key int").write.mode("append").parquet(land)
        run_incremental_sketch_view(
            stream_from_files(spark, land, "key int"), build, ["g"],
            "__bloom", bloom_merge, ckpt, view,
        )

    batch_state = bloom_build(
        spark.createDataFrame(wave1 + wave2, "key int"), "key", m_bits=m, k=k
    ).collect()[0]["__bloom"]
    stream_state = spark.table(view).collect()[0]["__bloom"]
    assert sorted(stream_state.items()) == sorted(batch_state.items())

    probe = spark.createDataFrame([(i,) for i in range(300)], "key int")
    hits = {
        r.key
        for r in probe.join(F.broadcast(spark.table(view))).where(
            bloom_might_contain(F.col("__bloom"), F.col("key"), m, k)
        ).collect()
    }
    assert set(range(120)) <= hits  # every landed key passes
    assert len(hits) < 300  # and the filter still rejects most others


def test_view_republish_never_collects_the_view(spark, tmp_path, monkeypatch):
    """VERDICT r4 item 2: the maintained-view shell must publish the
    folded view as a distributed parquet write, never by collect()ing
    it through the driver — a billion-key view doesn't fit there.
    Poison DataFrame.collect/toPandas/toLocalIterator for the whole
    run; the runner must still drain both waves correctly, and the
    published view must be backed by the checkpoint-adjacent parquet."""
    import os
    import shutil
    import uuid

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from redskins_rule_spark.streaming.ops import run_incremental_view

    land = str(tmp_path / "nvc_landing")
    ckpt = str(tmp_path / "nvc_ckpt")
    view = f"mv_{uuid.uuid4().hex[:8]}"
    schema = "k long, v double"

    batch_sizes = []

    def build_delta(batch_df):
        batch_sizes.append(batch_df.count())  # scalar count, not a collect
        return batch_df.groupBy("k").agg(
            F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
        )

    def poisoned(self, *a, **kw):
        raise AssertionError("view republish drove data through the driver")

    spark.createDataFrame([(1, 10.0), (2, 7.0)], schema).write.mode(
        "append").parquet(land)
    stream = stream_from_files(spark, land, schema)
    monkeypatch.setattr(DataFrame, "collect", poisoned)
    monkeypatch.setattr(DataFrame, "toPandas", poisoned)
    monkeypatch.setattr(DataFrame, "toLocalIterator", poisoned)
    try:
        run_incremental_view(stream, build_delta, ["k"], ["total"], ckpt, view)
        spark.createDataFrame([(1, 1.0), (3, 2.0)], schema).write.mode(
            "append").parquet(land)
        stream = stream_from_files(spark, land, schema)
        run_incremental_view(stream, build_delta, ["k"], ["total"], ckpt, view)
    finally:
        monkeypatch.undo()

    got = {r.k: (r.total, r.n) for r in spark.table(view).collect()}
    assert got == {1: (11.0, 2), 2: (7.0, 1), 3: (2.0, 1)}
    # incremental contract: wave 2's fold input was the 2-row DELTA,
    # not the 4-row landed history — work per trigger is |view|+|batch|
    assert batch_sizes == [2, 2]
    # the view is served from the checkpoint-adjacent parquet publish;
    # GC keeps the current batch + its committed predecessor (the
    # crash-replay bootstrap source, ADVICE r6) and nothing older
    view_root = os.path.join(ckpt, "_view")
    dirs = sorted(d for d in os.listdir(view_root) if d.startswith("b"))
    assert dirs == ["b0", "b1"]
    shutil.rmtree(land, ignore_errors=True)


def test_view_fold_restart_bootstraps_from_published_parquet(spark, tmp_path):
    """ADVICE r5: the maintained view's temp view is session-scoped
    but its parquet publish is not — after a 'restart' (view dropped,
    checkpoint kept) the next fold must bootstrap from the newest
    COMMITTED `_view/b<id>` publish instead of silently resetting,
    while an uncommitted leftover with batch id >= the current batch
    (a crashed attempt) is ignored for bootstrap and GC'd after."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from redskins_rule_spark.streaming.ops import (
        run_incremental_view,
        stream_from_files,
    )

    land = str(tmp_path / "restart_landing")
    ckpt = str(tmp_path / "restart_ckpt")
    view = f"mv_{uuid.uuid4().hex[:8]}"
    schema = "k long, v double"

    def build_delta(batch_df):
        return batch_df.groupBy("k").agg(
            F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
        )

    spark.createDataFrame([(1, 10.0), (2, 7.0)], schema).write.mode(
        "append").parquet(land)
    run_incremental_view(
        stream_from_files(spark, land, schema), build_delta,
        ["k"], ["total"], ckpt, view,
    )
    assert {r.k for r in spark.table(view).collect()} == {1, 2}

    # simulate a session restart: the temp view dies with the session
    spark.catalog.dropTempView(view)
    # plant a crashed-attempt leftover (id far beyond any committed
    # batch): its poison rows must NOT enter the bootstrap fold
    spark.createDataFrame(
        [(99, 1e9, 1)], "k long, total double, n long"
    ).write.parquet(os.path.join(ckpt, "_view", "b999"))

    spark.createDataFrame([(1, 1.0), (3, 2.0)], schema).write.mode(
        "append").parquet(land)
    run_incremental_view(
        stream_from_files(spark, land, schema), build_delta,
        ["k"], ["total"], ckpt, view,
    )
    got = {r.k: (r.total, r.n) for r in spark.table(view).collect()}
    # wave-1 state survived the restart; poison never folded in
    assert got == {1: (11.0, 2), 2: (7.0, 1), 3: (2.0, 1)}
    dirs = sorted(os.listdir(os.path.join(ckpt, "_view")))
    # the b999 leftover was GC'd; b0 survives as b1's committed
    # predecessor (the crash-replay bootstrap source, ADVICE r6)
    assert dirs == ["b0", "b1"]


def test_view_fold_crash_replay_between_gc_and_commit(spark, tmp_path):
    """ADVICE r6: the view GC runs INSIDE on_batch — i.e. before
    Structured Streaming writes the batch to its commit log. A driver
    dying in that window leaves `_view/` GC'd but the batch
    uncommitted, so the engine REPLAYS the same batch id on restart;
    the bootstrap excludes the equal-id publish as uncommitted, and
    if the GC had deleted every older publish (the pre-fix behavior)
    base would resolve to None and the view would silently reset to
    the replayed delta. Simulate exactly that on-disk state: run two
    waves, then delete wave 2's commit-log entry and the temp view;
    the re-driven stream replays batch 1 and must refold its delta
    against the surviving wave-1 publish — full history, no reset,
    no double count."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from redskins_rule_spark.streaming.ops import (
        run_incremental_view,
        stream_from_files,
    )

    land = str(tmp_path / "crash_landing")
    ckpt = str(tmp_path / "crash_ckpt")
    view = f"mv_{uuid.uuid4().hex[:8]}"
    schema = "k long, v double"

    def build_delta(batch_df):
        return batch_df.groupBy("k").agg(
            F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")
        )

    def drain():
        run_incremental_view(
            stream_from_files(spark, land, schema), build_delta,
            ["k"], ["total"], ckpt, view,
        )

    spark.createDataFrame([(1, 10.0), (2, 7.0)], schema).write.mode(
        "append").parquet(land)
    drain()
    spark.createDataFrame([(1, 1.0), (3, 2.0)], schema).write.mode(
        "append").parquet(land)
    drain()
    assert {r.k: (r.total, r.n) for r in spark.table(view).collect()} == {
        1: (11.0, 2), 2: (7.0, 1), 3: (2.0, 1)
    }

    # forge the crash window: batch 1's offsets exist (it ran, its GC
    # ran) but its commit record does not — the engine will replay it.
    # Drop the Hadoop CRC sidecar too, else the local ChecksumFS
    # rejects the replay's commit rename over the stale checksum.
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.dropTempView(view)  # the session died with the driver
    drain()  # no new files: this drain IS the batch-1 replay

    got = {r.k: (r.total, r.n) for r in spark.table(view).collect()}
    assert got == {1: (11.0, 2), 2: (7.0, 1), 3: (2.0, 1)}


def test_watermark_drops_late_rows(spark, tmp_path):
    """The §2.9 late-data contract, pinned explicitly: an event
    arriving in a LATER wave whose event time is older than
    (max event time seen − watermark) must NOT reopen or update its
    already-closed window; an on-time event in the same wave must
    land. Two availableNow drains against one checkpoint; watermark
    1 hour; windows 1 hour."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.streaming.ops import (
        run_available_now_to_files,
        stream_from_files,
        tumbling_counts,
    )

    land = str(tmp_path / "late_landing")
    schema = "event_id long, ts timestamp, user_id long, value double"
    # memory sinks can't recover a checkpoint across runs; the file
    # sink can, which the two-wave replay needs
    out = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    def wave(rows):
        spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "append"
        ).parquet(land)
        run_available_now_to_files(
            tumbling_counts(
                stream_from_files(spark, land, schema),
                window="1 hour", watermark="1 hour",
            ),
            ckpt, out,
        )

    # wave 1: events in the 10:00 window, then a 20:00 event that
    # advances the watermark to 19:00 — the 10:00 window closes/emits
    wave([
        (1, "2024-01-01 10:05:00", 7, 1.0),
        (2, "2024-01-01 10:40:00", 7, 1.0),
        (3, "2024-01-01 20:00:00", 7, 1.0),
    ])
    first = {str(r.window_start): r.n_events
             for r in spark.read.parquet(out).collect()}
    assert first.get("2024-01-01 10:00:00") == 2

    # wave 2: one LATE event back in the closed 10:00 window (dropped
    # by contract) + one on-time 20:30 event (kept in state), + a
    # 23:00 event pushing the watermark past 20:xx so that window
    # also closes and emits
    wave([
        (4, "2024-01-01 10:50:00", 7, 1.0),   # LATE: beyond watermark
        (5, "2024-01-01 20:30:00", 7, 1.0),   # on time
        (6, "2024-01-01 23:00:00", 7, 1.0),   # advances watermark
    ])
    rows = spark.read.parquet(out).collect()
    got = {}
    for r in rows:
        got[str(r.window_start)] = (
            got.get(str(r.window_start), 0) + r.n_events
        )
    # the 10:00 window was emitted ONCE with n=2 and never re-emitted
    # or corrected: the late event vanished
    assert got["2024-01-01 10:00:00"] == 2
    # the 20:00 window closed with BOTH its on-time events
    assert got["2024-01-01 20:00:00"] == 2


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    """Cross-drain dedup (the q193 shape): wave 2 re-delivers keys
    already seen in wave 1; the second AvailableNow drain against the
    SAME checkpoint must drop them via recovered state. A fresh-
    checkpoint control shows they would otherwise be re-emitted."""
    from pyspark.sql import functions as F

    from redskins_rule_spark.streaming.ops import (
        run_available_now_to_files,
        stream_from_files,
        streaming_dedup,
    )

    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "event_id long, ts timestamp, v long"

    def wave(ids):
        return spark.createDataFrame(
            [(i, f"2024-01-01 00:{i:02d}:00", i * 10) for i in ids],
            "event_id long, ts string, v long",
        ).select("event_id", F.col("ts").cast("timestamp"), "v")

    def drain(ck):
        run_available_now_to_files(
            streaming_dedup(
                stream_from_files(spark, land, schema),
                ["event_id"], ts_col="ts", watermark="9999 days",
            ),
            ck, out,
        )

    wave([1, 2, 3, 2]).write.mode("append").parquet(land)  # in-batch dup
    drain(ckpt)
    assert sorted(
        r.event_id for r in spark.read.parquet(out).collect()
    ) == [1, 2, 3]
    wave([3, 4, 5]).write.mode("append").parquet(land)  # 3 re-delivered
    drain(ckpt)
    assert sorted(
        r.event_id for r in spark.read.parquet(out).collect()
    ) == [1, 2, 3, 4, 5]
    # negative control: a fresh checkpoint has no memory of wave 1,
    # so the re-delivered key 3 WOULD double-count
    out2 = str(tmp_path / "out2")
    run_available_now_to_files(
        streaming_dedup(
            stream_from_files(spark, land, schema),
            ["event_id"], ts_col="ts", watermark="9999 days",
        ),
        str(tmp_path / "ckpt2"), out2,
    )
    ids2 = sorted(r.event_id for r in spark.read.parquet(out2).collect())
    assert ids2 == [1, 2, 3, 4, 5]  # one batch -> still deduped in-batch


def test_cdc_latest_replay_across_restart(spark, tmp_path):
    """The q196 shape in miniature: update-mode upsert log via
    foreachBatch, one checkpoint, two drains; wave 2 re-delivers an
    already-applied change AND a stale one — neither may regress the
    snapshot, and n_changes counts delivered rows including replays."""
    import datetime as dt

    from pyspark.sql import functions as F

    from redskins_rule_spark.streaming.ops import (
        run_available_now_update_appends,
        stateful_cdc_latest,
        stream_from_files,
    )

    t0 = dt.datetime(2024, 1, 1)

    def rows(spec):
        return spark.createDataFrame(
            [
                (eid, t0 + dt.timedelta(minutes=m), uid, et, v)
                for eid, m, uid, et, v in spec
            ],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )

    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    # wave 1: u1 two upserts; u2 upsert
    rows([(0, 0, 1, "view", 10.0), (1, 5, 1, "view", 20.0),
          (2, 0, 2, "view", 7.0)]).write.mode("append").parquet(land)
    run_available_now_update_appends(
        stateful_cdc_latest(stream_from_files(spark, land, schema)), ckpt, out
    )
    # wave 2: re-deliver event 1 (already applied), a STALE u1 change,
    # and a delete for u2
    rows([(1, 5, 1, "view", 20.0), (3, 2, 1, "view", 99.0),
          (4, 9, 2, "error", 0.0)]).write.mode("append").parquet(land)
    run_available_now_update_appends(
        stateful_cdc_latest(stream_from_files(spark, land, schema)), ckpt, out
    )
    log = spark.read.parquet(out)
    final = {
        r.user_id: r
        for r in log.groupBy("user_id")
        .agg(
            F.expr("max_by(current_value, n_changes)").alias("current_value"),
            F.max("n_changes").alias("n_changes"),
            F.expr("max_by(deleted, n_changes)").alias("deleted"),
        )
        .collect()
    }
    assert final[1].current_value == 20.0  # replay + stale both ignored
    assert final[1].n_changes == 4  # 2 + 2 delivered (replay counted)
    assert final[1].deleted is False
    assert final[2].current_value is None and final[2].deleted is True
    assert final[2].n_changes == 2


def test_stateful_pit_enrich_max_versions_trims_oldest(spark, tmp_path):
    """Bounded-state contract: with max_versions=2 only the two
    LATEST dim versions survive, so a fact older than the kept window
    emits NULL dim columns while an in-window fact binds normally."""
    import datetime as dt

    from redskins_rule_spark.streaming.ops import (
        run_available_now_to_files,
        stateful_pit_enrich,
        stream_from_files,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # three dim versions, then facts in the same batch
        (0, 0, True, 1.0), (1, 10, True, 2.0), (2, 20, True, 3.0),
        (3, 5, False, 0.5),   # fact at t=5: eligible dim (t=0) TRIMMED -> NULL
        (4, 25, False, 0.7),  # fact at t=25: binds dim t=20
    ]
    df = spark.createDataFrame(
        [
            (1, eid, t0 + dt.timedelta(minutes=m), is_dim, v)
            for eid, m, is_dim, v in rows
        ],
        "user_id long, event_id long, ts timestamp, is_dim boolean, value double",
    )
    land = str(tmp_path / "land")
    df.write.parquet(land)
    schema = (
        "user_id long, event_id long, ts timestamp, is_dim boolean, "
        "value double"
    )
    out = str(tmp_path / "out")
    run_available_now_to_files(
        stateful_pit_enrich(
            stream_from_files(spark, land, schema), max_versions=2
        ),
        str(tmp_path / "ckpt"),
        out,
    )
    got = {r.event_id: r for r in spark.read.parquet(out).collect()}
    assert got[3].dim_value is None and got[3].dim_ts_us is None
    assert got[4].dim_value == 3.0


def test_stream_stream_join_buffers_across_restart(spark, tmp_path):
    """A click landing in drain 1 must still pair with a purchase
    landing in drain 2 (same checkpoint): the join's buffered state
    survives the restart. Out-of-window purchases never pair."""
    import datetime as dt

    from pyspark.sql import functions as F

    from redskins_rule_spark.streaming.ops import (
        run_available_now_to_files,
        stream_from_files,
        stream_stream_join,
    )

    t0 = dt.datetime(2024, 1, 1)

    def frame(spec):
        return spark.createDataFrame(
            [(uid, eid, t0 + dt.timedelta(minutes=m)) for uid, eid, m in spec],
            "user_id long, event_id long, ts timestamp",
        )

    lland, rland = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    schema = "user_id long, event_id long, ts timestamp"

    def drain():
        run_available_now_to_files(
            stream_stream_join(
                stream_from_files(spark, lland, schema),
                stream_from_files(spark, rland, schema),
                within="1 hour",
                watermark="365 days",
            ),
            ckpt,
            out,
        )

    # drain 1: clicks only — nothing can pair yet
    frame([(1, 10, 0), (2, 20, 0)]).write.mode("append").parquet(lland)
    frame([]).write.mode("append").parquet(rland)
    drain()
    assert spark.read.parquet(out).count() == 0
    # drain 2: purchases — u1 in-window pairs with the BUFFERED click;
    # u2's purchase is outside [ts, ts+1h] and must not pair
    frame([(1, 11, 30), (2, 21, 90)]).write.mode("append").parquet(rland)
    frame([]).write.mode("append").parquet(lland)
    drain()
    rows = spark.read.parquet(out).collect()
    assert [(r.user_id, r.event_id, r.r_event_id) for r in rows] == [(1, 10, 11)]


def test_session_windows_merge_across_restarts(spark, tmp_path):
    """q211's core claim: a session whose events are split across two
    available-now drains (one checkpoint) emits as ONE merged window,
    and the far-future sentinel events deterministically flush every
    real session out of append-mode state."""
    import datetime

    from redskins_rule_spark.streaming.ops import (
        run_available_now_to_files,
        sessionized_counts,
        stream_from_files,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows):
        return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")

    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sessions")
    gap = datetime.timedelta(minutes=30)
    schema = "event_id long, ts timestamp, user_id long"
    # user 1: events at t0 and t0+10min land in DIFFERENT drains but
    # the same session; user 2: two sessions an hour apart in drain 1
    waves = [
        mk([(1, t0, 1), (10, t0, 2), (11, t0 + 2 * gap, 2)]),
        mk([(2, t0 + gap / 3, 1)]),
        mk([(90, t0 + datetime.timedelta(hours=6), -1)]),
        mk([(91, t0 + datetime.timedelta(hours=12), -1)]),
    ]
    for wave in waves:
        wave.coalesce(1).write.mode("append").parquet(land)
        run_available_now_to_files(
            sessionized_counts(
                stream_from_files(spark, land, schema),
                gap="30 minutes",
                watermark="2 hours",
            ),
            ckpt,
            out,
        )
    rows = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.read.parquet(out).where(F.col("user_id") >= 0).collect()
    }
    assert rows == {
        (1, t0, 2),               # merged ACROSS the restart
        (2, t0, 1),
        (2, t0 + 2 * gap, 1),
    }


def test_scaled_state_partitions_sizes_and_restores(spark, tmp_path):
    """The drain-scope state-partition sizing: n = clamp(ceil(bytes /
    per-part), floor, session cap), conf restored on exit (even on
    error), and a drain under it produces the same rows as one at the
    session default."""
    import os

    from redskins_rule_spark.streaming.ops import scaled_state_partitions

    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    nodata_default = spark.conf.get(nodata_key, "true")
    # tiny landing -> floor (bounded by cap); no-data batches skipped
    # for the drain scope (r14: the trailing empty batch is pure fixed
    # cost for replay drains) and RESTORED after
    small = tmp_path / "small"
    small.mkdir()
    (small / "a.parquet").write_bytes(b"x" * 1024)
    with scaled_state_partitions(spark, str(small)) as n:
        assert n == min(4, cap)
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(n)
        assert spark.conf.get(nodata_key) == "false"
    assert spark.conf.get("spark.sql.shuffle.partitions") == str(cap)
    assert spark.conf.get(nodata_key) == nodata_default
    # opt-out: a drain that relies on the trailing flush keeps it
    with scaled_state_partitions(spark, str(small), flush_no_data=True):
        assert spark.conf.get(nodata_key) == nodata_default
    assert spark.conf.get(nodata_key) == nodata_default
    # big landing -> capped at the session value (production no-op)
    os.environ["SPARK_GRAFT_STATE_BYTES_PER_PART"] = "1"
    try:
        with scaled_state_partitions(spark, str(small)) as n:
            assert n == cap
    finally:
        del os.environ["SPARK_GRAFT_STATE_BYTES_PER_PART"]
    # conf restored when the body raises
    try:
        with scaled_state_partitions(spark, str(small)):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == str(cap)
    # result parity: dedup drain under scaled partitions == batch dedup
    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ev = table(spark, SF_DIR, "events").select("event_id", "ts").limit(200)
    ev.unionAll(ev).write.mode("append").parquet(land)
    schema = "event_id long, ts timestamp"
    with scaled_state_partitions(spark, land):
        run_available_now_to_files(
            streaming_dedup(
                stream_from_files(spark, land, schema),
                ["event_id"], ts_col="ts", watermark="99999 days",
            ),
            ckpt, out,
        )
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    want = sorted(r.event_id for r in ev.dropDuplicates(["event_id"]).collect())
    assert got == want
