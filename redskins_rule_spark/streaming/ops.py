"""Streaming operators over event streams.

Design rules (100 TB / always-on):
  * every aggregation is watermarked — unbounded state is a leak, not
    a feature; late rows beyond the watermark are dropped by contract;
  * all transformations are the SAME DataFrame expressions as batch —
    each operator here takes a DataFrame that may be batch or
    streaming, so batch backfill and streaming serve one code path
    (tested by the streaming/batch parity tests);
  * stateful custom logic uses applyInPandasWithState (Arrow-batched,
    explicit timeouts) — never driver-side accumulation.
"""

from __future__ import annotations


from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def stream_from_files(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """File-source stream over a landing directory.

    This is the reference's ingest loop (new parquet per season,
    SURVEY.md §2.9) done right: the source tracks processed files in
    the checkpoint, so each `Trigger.AvailableNow` run processes
    exactly the new files. Schema is REQUIRED (streaming sources
    don't infer).
    """
    reader = spark.readStream.format(fmt).schema(schema).options(**options)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_extra: list[str] | None = None,
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window counts (+ optional value sum) per window and
    extra keys. Works on batch and streaming frames identically —
    watermark applies only when streaming.

    Output: window_start, window_end timestamps + keys + n_events
    [+ sum_value]. State per (window, keys) is dropped once the
    watermark passes window_end — bounded state.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window).alias("w"), *(group_extra or [])]
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    return (
        df.groupBy(*keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *(group_extra or []),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user sessions with an inactivity gap (session_window).

    A session's state closes — and the row emits — once the watermark
    passes last_event + gap; state is bounded by active sessions.
    Output: user, session_start, session_end, n_events.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"), F.col(user_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once-per-key stream: drop duplicate events by key
    within the watermark horizon (`dropDuplicatesWithinWatermark`
    keeps state bounded; plain dropDuplicates on a stream would grow
    state forever)."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return events.dropDuplicates(key_cols)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with right
    events for the same keys whose timestamp lands in
    [left.ts, left.ts + `within`].

    The event-time range condition is what makes this run with BOUNDED
    state on two unbounded streams: Spark derives a state watermark
    from it and evicts buffered rows older than `watermark` + `within`
    on each side (without the range, stream-stream state grows
    forever). Batch/stream parity: pass batch frames and the SAME
    expressions run as a plain join — one code path for backfill and
    live (watermarks are streaming-only).

    Right columns come back `right_prefix`-renamed (keys keep one
    copy). `how`: inner | leftOuter (outer needs both watermarks, and
    streaming emits the unmatched-null rows only once the watermark
    passes the join window — a final empty-ish micro-batch, not
    instantly).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported stream-stream join type: {how}")
    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
    if right.isStreaming:
        right = right.withWatermark(ts_col, watermark)
    right = right.select(
        [F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
    )
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"{right_prefix}{k}"))
    rts = f"{right_prefix}{ts_col}"
    cond = (
        cond
        & (F.col(rts) >= F.col(ts_col))
        & (F.col(rts) <= F.col(ts_col) + F.expr(f"INTERVAL {within}"))
    )
    joined = left.join(right, cond, how)
    # one copy of the keys
    return joined.drop(*[f"{right_prefix}{k}" for k in key_cols])


_RUNNING_TOTAL_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_RUNNING_TOTAL_STATE = "n bigint, total double"


def stateful_running_totals(
    events: DataFrame,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator: per-user running event count and
    value total across micro-batches via applyInPandasWithState.

    Demonstrates the arbitrary-stateful path for logic windows can't
    express (cross-batch accumulators, custom eviction). State is one
    (count, total) pair per user; with `timeout_ms` idle users are
    evicted (emitting nothing) — the pattern for bounded state under
    unbounded key cardinality.
    """
    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_TOTAL_SCHEMA,
        stateStructType=_RUNNING_TOTAL_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )


_CDC_LATEST_SCHEMA = (
    "user_id bigint, current_value double, updated_at_us bigint, "
    "n_changes bigint, deleted boolean"
)
_CDC_LATEST_STATE = "value double, ts_us bigint, event_id bigint, n bigint, deleted boolean"


def stateful_cdc_latest(
    events: DataFrame,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming CDC latest-wins merge — the stream face of workload
    q110: each user's rows form a change log ('error' = delete,
    anything else = upsert of `value`); state holds the current winner
    by (ts, event_id) and every micro-batch emits the refreshed
    snapshot row for the keys it touched (outputMode=update, i.e. an
    upsert stream a key-value sink applies directly).

    Late/out-of-order changes are handled by the (ts_us, event_id)
    comparison, not arrival order — a replayed old change never
    regresses the snapshot. With `timeout_ms`, idle keys are evicted
    (the downstream sink owns the full snapshot; state only needs keys
    still receiving changes) — the bounded-state pattern for unbounded
    key cardinality.
    """
    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        value, ts_us, event_id, n, deleted = (
            state.get if state.exists else (None, -1, -1, 0, False)
        )
        for pdf in pdfs:
            n += len(pdf)
            for row in pdf.itertuples(index=False):
                r_us = int(row.ts.value // 1_000)  # pandas ns -> us
                if (r_us, int(row.event_id)) > (ts_us, event_id):
                    ts_us, event_id = r_us, int(row.event_id)
                    deleted = row.event_type == "error"
                    value = None if deleted else float(row.value)
        state.update((value, ts_us, event_id, n, deleted))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "current_value": [None if deleted else round(value, 2)],
                "updated_at_us": [ts_us],
                "n_changes": [n],
                "deleted": [deleted],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_CDC_LATEST_SCHEMA,
        stateStructType=_CDC_LATEST_STATE,
        outputMode="update",
        timeoutConf=timeout,
    )


_STATE_BYTES_PER_PART = 64 << 20  # env-overridable; see scaled_state_partitions


@contextmanager
def scaled_state_partitions(
    spark: SparkSession,
    *landing_paths: str,
    floor: int = 4,
    flush_no_data: bool = False,
):
    """Drain-scoped conf: size `spark.sql.shuffle.partitions` — which
    pins a NEW streaming query's state-store partition count at its
    first micro-batch — from the LANDING INPUT SIZE, and (by default)
    skip the trailing no-data micro-batch, for the duration of a drain.

    No-data batches (`spark.sql.streaming.noDataMicroBatches.enabled`,
    default on): after the data batch, a WATERMARKED stateful query
    runs one extra empty batch so the advanced watermark can flush
    results/state immediately. An AvailableNow replay drain does not
    need it — emission happens either in the data batch itself
    (joins, update-mode stateful ops) or at the NEXT drain's data
    batch once later waves advance the watermark (the sentinel-wave
    design) — so the empty batch is pure fixed cost: one more offset
    WAL entry, state-provider reload and commit per drain (measured,
    interleaved quiet-host A/B: q199 4.46→3.27 s, q211 5.01→3.52 s;
    non-watermarked q197/q198 unaffected — they never ran one).
    Callers whose drain DOES rely on the trailing flush (final-window
    emission with no later wave) pass ``flush_no_data=True``.

    Why: state-store setup cost is per (partition × store × query
    start), and it is SERIALIZED — thread dumps during a q199 drain
    show 30/32 task threads blocked in `StateStore$.getStateStoreProvider`
    (one global `loadedProviders` lock around provider init + checkpoint
    dir fs ops), then all 32 parked in the synchronous state-store
    coordinator RPC. A stream-stream join opens 4 stores per partition,
    so 32 partitions = 128 serialized provider inits PER DRAIN for a
    few MB of state (measured: q199 drains [15.9, 10.5] s at default 32
    → [4.1, 2.5] s at 4, quiet host).

    Scale-adaptive, not a local constant: n = clamp(ceil(bytes /
    SPARK_GRAFT_STATE_BYTES_PER_PART), floor, session shuffle
    partitions). Production waves (≫ partitions × 64 MiB) hit the cap
    and the setting is a no-op; only tiny landings shrink. Restart
    safety: Spark pins the state partition count in the checkpoint's
    offset metadata at the first batch, so later drains of the SAME
    checkpoint keep the pinned count regardless of this conf — results
    are partition-count-independent (keyed aggregations / joins), only
    setup cost changes.
    """
    import math
    import os as _os

    total = 0
    for p in landing_paths:
        try:
            if _os.path.isdir(p):
                total += sum(
                    e.stat().st_size
                    for e in _os.scandir(p)
                    if e.is_file() and not e.name.startswith(("_", "."))
                )
            elif _os.path.exists(p):
                total += _os.path.getsize(p)
        except OSError:
            pass
    per = int(
        _os.environ.get("SPARK_GRAFT_STATE_BYTES_PER_PART", _STATE_BYTES_PER_PART)
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    cap = int(old)
    n = max(min(floor, cap), min(cap, math.ceil(total / per) if total else 1))
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    old_nodata = spark.conf.get(nodata_key, "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    if not flush_no_data:
        spark.conf.set(nodata_key, "false")
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.conf.set(nodata_key, old_nodata)


def run_available_now(
    stream_df: DataFrame,
    checkpoint: str,
    sink_table: str,
    output_mode: str = "append",
) -> None:
    """Drain everything currently available through the streaming
    plan into an in-memory sink table, then stop (Trigger.AvailableNow).

    ONE-SHOT: the memory sink cannot recover from an existing
    checkpoint (append/update modes), so pass a fresh checkpoint per
    call. For true incremental batch — second run picks up only new
    files — use `run_available_now_to_files`."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_to_files(
    stream_df: DataFrame,
    checkpoint: str,
    out_dir: str,
    fmt: str = "parquet",
) -> None:
    """File-sink variant of `run_available_now`. Unlike the memory
    sink this one RECOVERS from its checkpoint, so repeated calls give
    true incremental batch: run N processes only files that landed
    since run N-1 (exactly-once via the sink's transaction log)."""
    q = (
        stream_df.writeStream.format(fmt)
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_PIT_ENRICH_SCHEMA = (
    "user_id bigint, event_id bigint, ts_us bigint, fact_value double, "
    "dim_value double, dim_ts_us bigint"
)
_PIT_ENRICH_STATE = "vts array<bigint>, vid array<bigint>, vval array<double>"


def run_available_now_update_appends(
    stream_df: DataFrame,
    checkpoint: str,
    out_dir: str,
) -> None:
    """Drain an UPDATE-mode stateful stream (applyInPandasWithState
    upserts) into an append-only parquet log via foreachBatch, with
    full checkpoint recovery across calls — the upsert-log shape a
    key-value sink consumes. File sinks reject update mode directly;
    foreachBatch is the supported escape hatch (same shell the
    maintained-view runners use). Downstream, 'latest row per key'
    reconstructs the snapshot (each upsert carries a monotone
    n_changes, so argmax by it is the current state)."""

    def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(on_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stateful_pit_enrich(
    tagged: DataFrame,
    max_versions: int = 16,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming point-in-time enrichment — the stream face of
    `asof.pit_join` (workload q135): one interleaved stream of
    dimension versions (`is_dim` true; `value` is the dim payload) and
    fact events per user; every fact emits enriched with the dim
    version current at the FACT's event time.

    State per user: the latest `max_versions` dim versions as three
    parallel arrays sorted by (ts_us, event_id) — bounded regardless
    of how long the key lives. Facts bind to versions by EVENT time
    (vf <= fact_ts, latest wins, same inclusive rule as the batch
    operator), so a dim version and a fact arriving in the same
    micro-batch in any order still join correctly; a dim version
    arriving in a LATER batch than a fact it should have served does
    not retro-correct that fact (at-arrival semantics — the batch
    operator is the reconciliation path, exactly like CDC snapshot
    vs stream in q110/stateful_cdc_latest).

    Facts with no eligible version emit NULL dim columns (the caller
    decides drop-vs-default); idle keys evict on `timeout_ms`.
    """
    import bisect

    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        vts, vid, vval = (
            ([*state.get[0]], [*state.get[1]], [*state.get[2]])
            if state.exists
            else ([], [], [])
        )
        rows = []
        out: list[tuple] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                rows.append(
                    (
                        int(r.ts.value // 1_000),
                        int(r.event_id),
                        bool(r.is_dim),
                        float(r.value),
                    )
                )
        # dims first so same-batch facts at/after their ts see them,
        # then facts in event-time order — arrival order is irrelevant
        # within the batch.
        for ts_us, eid, is_dim, val in sorted(
            rows, key=lambda t: (not t[2], t[0], t[1])
        ):
            if is_dim:
                pos = bisect.bisect_left(list(zip(vts, vid)), (ts_us, eid))
                if not (pos < len(vts) and vts[pos] == ts_us and vid[pos] == eid):
                    vts.insert(pos, ts_us)
                    vid.insert(pos, eid)
                    vval.insert(pos, val)
                    if len(vts) > max_versions:
                        vts.pop(0), vid.pop(0), vval.pop(0)
            else:
                # latest version with (vts, vid) <= (ts_us, +inf)
                pos = bisect.bisect_right(vts, ts_us) - 1
                out.append(
                    (
                        key[0], eid, ts_us, val,
                        vval[pos] if pos >= 0 else None,
                        vts[pos] if pos >= 0 else None,
                    )
                )
        state.update((vts, vid, vval))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "event_id", "ts_us", "fact_value",
                    "dim_value", "dim_ts_us",
                ],
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_PIT_ENRICH_SCHEMA,
        stateStructType=_PIT_ENRICH_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )


def _run_view_fold(
    stream_df: DataFrame,
    build_delta,
    fold,
    checkpoint_dir: str,
    view_name: str,
) -> None:
    """Shared foreachBatch shell for the maintained-view runners:
    per micro-batch, build the delta, fold it into the current view
    (None on the first batch), materialize, and republish the temp
    view — with the AvailableNow trigger and checkpoint wiring in
    ONE place so fixes to the shell (bootstrap, materialization
    order, trigger semantics) can't drift between runners.

    fold(base | None, delta) -> the updated view frame. The view is
    PUBLISHED AS A PARQUET TABLE under `<checkpoint_dir>/_view/` and
    exposed through a session temp view over that path: the fold's
    output is written executor-side (never round-tripped through the
    driver — a billion-key silver table must not fit in driver
    memory), into a fresh per-batch directory so the write never
    clobbers the files the fold's own `base` scan is reading, then
    the temp view is repointed and stale batch directories are
    dropped.

    RESTART (ADVICE r5): the temp view is session-scoped, but the
    published parquet is not. When the view is missing, `base`
    bootstraps from the newest surviving `_view/b<id>` directory
    whose id is STRICTLY BELOW the current batch id — equal/higher
    ids are uncommitted leftovers of a crashed attempt at this (or a
    later) batch, and folding them in would double-count. So a fresh
    session re-driven against the same checkpoint resumes from the
    previously folded state instead of silently discarding it.
    Listing/GC go through the Hadoop FileSystem API, so the
    checkpoint may live on any supported filesystem (hdfs://,
    s3a://, ...), not just the local FS.
    """
    spark = stream_df.sparkSession
    view_root = checkpoint_dir.rstrip("/") + "/_view"

    def hadoop_path(p: str):
        return spark._jvm.org.apache.hadoop.fs.Path(p)

    def batch_dirs() -> list[tuple[int, str]]:
        """Sorted (batch_id, uri) of the published per-batch dirs."""
        root = hadoop_path(view_root)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(root):
            return []
        out = []
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isDirectory() and name[:1] == "b" and name[1:].isdigit():
                out.append((int(name[1:]), st.getPath().toString()))
        return sorted(out)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = build_delta(batch_df)
        try:
            base = spark.table(view_name)
        except Exception:
            # first batch ever, OR a restarted session: bootstrap from
            # the newest COMMITTED publish (id < batch_id) if one exists
            committed = [p for bid, p in batch_dirs() if bid < batch_id]
            base = spark.read.parquet(committed[-1]) if committed else None
        updated = fold(base, delta)
        # materialize the fold BEFORE repointing the view it reads
        # from — into a NEW directory, distributed write, no collect
        out_dir = f"{view_root}/b{batch_id}"
        updated.write.mode("overwrite").parquet(out_dir)
        spark.read.parquet(out_dir).createOrReplaceTempView(view_name)
        # GC (ADVICE r6): this runs INSIDE on_batch, i.e. before
        # Structured Streaming commits batch_id to its commit log. If
        # the driver dies in that window, the engine replays the SAME
        # batch_id, and the bootstrap above excludes b{batch_id} as
        # uncommitted — so the newest strictly-older publish must
        # survive this GC or the replay would fold against base=None
        # and silently reset the view to the current delta. Keep
        # b{batch_id} and its immediate committed predecessor; the
        # grandparent (and any orphaned later-id leftovers) go now,
        # and the predecessor is collected on the NEXT successful
        # batch, when batch_id itself has provably committed.
        root = hadoop_path(view_root)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        older = [bid for bid, _ in batch_dirs() if bid < batch_id]
        keep = {batch_id} | ({max(older)} if older else set())
        for bid, p in batch_dirs():
            if bid not in keep:
                fs.delete(hadoop_path(p), True)

    (
        stream_df.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_incremental_view(
    stream_df: DataFrame,
    build_delta,
    keys: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
    view_name: str,
    count_col: str = "n",
) -> None:
    """The "silver table" maintenance loop: drive
    `merge.incremental_agg_update` from a stream via foreachBatch —
    each micro-batch becomes a signed change set folded into the keyed
    aggregate view, touching |view| + |batch| rows per trigger instead
    of rescanning history (the streaming face of workload q91).

    build_delta : batch DataFrame -> signed delta frame
                  (keys + sum_cols + count_col); inserts contribute
                  (+value, +1) — the caller encodes deletes/updates.
    The maintained view lives in a session-scoped temp view
    `view_name` (a real deployment writes a table / upserts a sink;
    the fold itself is sink-agnostic). Runs with Trigger.AvailableNow
    and blocks until the backlog drains — call again to fold new
    files, checkpoint-resumable.
    """
    from redskins_rule_spark.operators.merge import incremental_agg_update

    def fold(base: DataFrame | None, delta: DataFrame) -> DataFrame:
        return incremental_agg_update(
            delta.limit(0) if base is None else base,
            delta, keys, sum_cols, count_col=count_col,
        )

    _run_view_fold(stream_df, build_delta, fold, checkpoint_dir, view_name)


def run_incremental_sketch_view(
    stream_df: DataFrame,
    build_states,
    keys: list[str],
    state_col: str,
    merge_fn,
    checkpoint_dir: str,
    view_name: str,
) -> None:
    """Streaming maintenance of MERGEABLE sketch states — the
    companion of `run_incremental_view` for aggregates that fold by a
    semilattice/linear merge instead of a counter sum (KMV min-k, DD
    and count-min counter maps, Bloom word maps). Because those
    merges are exactly lossless, the maintained per-key state after
    any number of micro-batches equals the one-pass sketch of
    everything landed — distinct-count / quantile / frequency
    monitoring over an unbounded stream without ever recounting
    history.

    build_states : batch DataFrame -> (keys + state_col) per-key
                   sketch states of that batch (e.g. sketch.kmv_state)
    merge_fn     : (Column, Column) -> Column merging two states
                   (e.g. lambda a, b: sketch.kmv_merge(a, b, k=64))
    View/trigger/checkpoint semantics match `run_incremental_view`
    (both run on the shared `_run_view_fold` shell).
    """

    def fold(base: DataFrame | None, delta: DataFrame) -> DataFrame:
        d = delta.select(*keys, F.col(state_col).alias("__new"))
        b = (
            d.limit(0).withColumnRenamed("__new", "__old")
            if base is None
            else base.select(*keys, F.col(state_col).alias("__old"))
        )
        return b.join(d, keys, "full_outer").select(
            *keys,
            F.when(
                F.col("__old").isNotNull() & F.col("__new").isNotNull(),
                merge_fn(F.col("__old"), F.col("__new")),
            )
            .otherwise(F.coalesce(F.col("__new"), F.col("__old")))
            .alias(state_col),
        )

    _run_view_fold(stream_df, build_states, fold, checkpoint_dir, view_name)
