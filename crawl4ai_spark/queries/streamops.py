"""Structured Streaming queries (driver-checkable).

``stream_tumbling`` drains the events table through a real streaming
query (file source → watermark → windowed agg → memory sink,
availableNow trigger) and must equal the BATCH oracle — same SQL as
``events_tumbling`` — because a fully-drained availableNow run with no
late data is batch-equivalent.

``stream_sessionize`` exercises applyInPandasWithState; only sessions
closed by the 30-min gap are emitted during a single drain (open
sessions remain in state), so it is registered rows-only and its exact
semantics are pinned by tests/test_streaming.py against the batch
sessionizer.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windows import (
    read_events_stream,
    run_stream_to_table,
    stream_sessionize,
    stream_tumbling_agg,
)
from .registry import query

_TUMBLING_ORACLE = """
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents,
           count(DISTINCT user_id)::BIGINT AS n_users
    FROM events GROUP BY 1, 2
"""


@query("stream_tumbling", _TUMBLING_ORACLE)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    ckp = os.path.join(tempfile.gettempdir(), f"ckp_{name}")
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    run_stream_to_table(spark, stream_tumbling_agg(events), name, ckp)
    return spark.table(name).select(
        "window_start", "event_type", "n_events", "sum_cents", "n_users"
    )


@query("stream_sessionize")
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    ckp = os.path.join(tempfile.gettempdir(), f"ckp_{name}")
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        stream_sessionize(events)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id", "session_idx")
