"""Structured Streaming operators over the events stream.

The reference engine is batch rounds (SURVEY §2 notes streaming as the
optional extension); these operators give the engine a native
``readStream → watermark → window/state → sink`` path so continuous
crawls/event feeds reuse the same aggregation semantics as the batch
queries — ``stream_tumbling_agg`` run with an availableNow trigger over
a static directory produces EXACTLY the batch answer, which is how the
oracle checks it.

Scale notes: tumbling-window aggregation is a streaming partial agg with
state keyed by (window, event_type) — bounded state, watermark evicts
closed windows. Sessionization uses ``applyInPandasWithState`` keyed
per user — the canonical custom-stateful-operator shape.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-stream source over a parquet directory. A single-file path
    (the driver's ``events.parquet`` is one file) is exposed through a
    temp directory of symlinks — the file source requires a directory."""
    import os
    import tempfile

    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="events_stream_")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        path = d
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("path", path)
        .load()
    )


def read_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-stream source over the documents parquet (doc_id + counts
    only — spans pruned at the source for the dedup twin)."""
    import os
    import tempfile

    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="docs_stream_")
        os.symlink(path, os.path.join(d, os.path.basename(path)))
        path = d
    return (
        spark.readStream.schema("doc_id bigint, text string, lang string, source string, n_chars bigint")
        .format("parquet")
        .option("path", path)
        .load()
    )


def stream_dedup_urls(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Streaming URL-seen dedup — the north rule's seen set as a
    Structured Streaming operator: canonical URLs deduped with
    ``dropDuplicates`` (state keyed by url; a continuous deployment
    bounds state with dropDuplicatesWithinWatermark + an event-time
    column — the drain harness has no event time, so exact dedup state
    is the honest shape here), then per-host counts."""
    from ..functions.urls import url_host

    return (
        urls.dropDuplicates([url_col])
        .groupBy(url_host(F.col(url_col)).alias("host"))
        .agg(F.count("*").alias("n_seen"))
    )


def stream_tumbling_agg(events: DataFrame, watermark: str = "1 hour",
                        exact_users: bool = False) -> DataFrame:
    """Hourly tumbling windows per event_type; late data beyond the
    watermark is dropped once the window closes. Column contract matches
    the batch ``events_tumbling`` query.

    ``n_users`` state: the DEFAULT is ``approx_count_distinct`` — its
    per-group state is one fixed-size HyperLogLog sketch, bounded no
    matter how many distinct users a window sees (the continuous-run
    requirement at 100 TB). ``exact_users=True`` switches to a
    ``collect_set`` fold whose state grows with distinct users — kept
    ONLY for the drain-equality oracle harness, where the batch twin's
    exact countDistinct must match row-for-row (exact countDistinct
    itself is unsupported on streams)."""
    n_users = (
        F.size(F.collect_set("user_id")).cast("long") if exact_users
        else F.approx_count_distinct("user_id").cast("long")
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
            n_users.alias("n_users"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type", "n_events", "sum_cents", "n_users",
        )
    )


def stream_sliding_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1h windows sliding every 30min — each event lands in two windows;
    watermark evicts closed window state. Column contract matches the
    batch ``events_sliding`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type", "n_events", "sum_cents",
        )
    )


def run_stream_to_table(spark: SparkSession, stream: DataFrame, name: str, checkpoint: str) -> None:
    """availableNow trigger → memory sink: drains everything currently
    in the source then stops (the batch-equivalence harness)."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# --------------------------------------------------------------------------- #
# custom stateful operator: session windows via applyInPandasWithState
# --------------------------------------------------------------------------- #
SESSION_GAP_S = 1800
FLUSH_EVENT = "__flush__"  # stream punctuation: close the open session
_OUT_SCHEMA = "user_id long, session_idx long, n_events long, duration_s long"
_STATE_SCHEMA = "session_idx long, start_s long, last_s long, n long"


def _session_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    """Per-user incremental sessionizer: emits a row per session CLOSED
    by observed data (a later event > gap after the last); the open
    session survives in state across triggers. NoTimeout: with an
    availableNow drain, ProcessingTimeTimeout would spin empty
    micro-batches until wall-clock timeouts fire — idle-session closure
    belongs to a continuous run, not the drain harness. A FLUSH_EVENT
    row is end-of-stream punctuation (the standard sentinel pattern):
    it closes the user's open session without starting a new one, so a
    fully-drained punctuated stream equals the batch sessionizer
    row-for-row."""
    (user_id,) = key
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    secs = (rows["ts"].astype("int64") // 1_000_000_000).to_numpy()
    kinds = rows["event_type"].to_numpy()
    if state.exists:
        s_idx, start_s, last_s, n = state.get
    else:
        s_idx, start_s, last_s, n = 0, None, None, 0
    out = []
    for t, et in zip(secs, kinds):
        if et == FLUSH_EVENT:
            if start_s is not None:
                out.append([user_id, s_idx, n, last_s - start_s])
                start_s, last_s, n = None, None, 0
            continue
        if start_s is None:
            s_idx, start_s, last_s, n = s_idx + 1, int(t), int(t), 1
        elif t - last_s > SESSION_GAP_S:
            out.append([user_id, s_idx, n, last_s - start_s])
            s_idx, start_s, last_s, n = s_idx + 1, int(t), int(t), 1
        else:
            last_s, n = int(t), n + 1
    state.update((s_idx, start_s, last_s, n))
    yield pd.DataFrame(out, columns=["user_id", "session_idx", "n_events", "duration_s"])


def write_flush_sentinels(spark: SparkSession, events_path: str, stream_dir: str) -> None:
    """Append one FLUSH_EVENT row per user to ``stream_dir``, stamped
    past every real event (global max ts + gap + 1 h) so it sorts last
    for each user and forces the open session closed during the drain.
    Written as a single parquet FILE (the stream source lists files,
    not nested directories)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    e = spark.read.parquet(events_path)
    mx = e.agg(F.max("ts")).collect()[0][0]
    # +2 days margin: .timestamp() on the collected naive datetime uses
    # the local tz — any offset must never land the sentinel before a
    # real event (it only needs to sort strictly last per user)
    flush_s = int(mx.timestamp()) + SESSION_GAP_S + 2 * 86400
    sent = e.select("user_id").distinct().select(
        (F.lit(1 << 50) + F.col("user_id")).cast("long").alias("event_id"),
        F.timestamp_seconds(F.lit(flush_s)).alias("ts"),
        F.col("user_id").cast("long").alias("user_id"),
        F.lit(FLUSH_EVENT).alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("").alias("props"),
    )
    tmp = tempfile.mkdtemp(prefix="sentinels_")
    sent.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), os.path.join(stream_dir, "zz_sentinels.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def stream_sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful sessionization (gap 30 min) — the
    applyInPandasWithState shape the north rule's 'custom stateful
    streaming operator' slot calls for."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
