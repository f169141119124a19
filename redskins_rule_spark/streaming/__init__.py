"""Structured Streaming operators (north-star extension).

The reference has NO streaming (SURVEY.md §2.9) — its only temporal
recurrence is Airflow yearly catchup, i.e. incremental batch. This
package is the idiomatic Spark upgrade path: file-source streams with
`Trigger.AvailableNow` give exactly the reference's "process whatever
has landed since last run" semantics with checkpointed exactly-once
progress, and the windowed/stateful operators cover the streaming
side of a training-data pipeline (event rollups, sessionization,
streaming dedup).
"""

from redskins_rule_spark.streaming.ops import (
    run_available_now,
    sessionized_counts,
    stream_from_files,
    stream_stream_join,
    streaming_dedup,
    stateful_running_totals,
    tumbling_counts,
)

__all__ = [
    "run_available_now",
    "sessionized_counts",
    "stream_from_files",
    "stream_stream_join",
    "streaming_dedup",
    "stateful_running_totals",
    "tumbling_counts",
]
