"""Stream-static URL-frontier ingest: the crawl engine's URL-seen
anti-join as a continuous Structured Streaming stage.

The batch engine discovers links in rounds and anti-joins them against
the append-only seen set (operators/frontier.py). A continuous
deployment receives discovered URLs as a stream; the equivalent shape is
``foreachBatch``: per micro-batch, dedup within the batch, anti-join
against the durable seen store, append the survivors to BOTH the store
and the output feed. The store read inside the batch function sees every
previous batch's append, so a URL is emitted exactly once no matter how
the source splits into micro-batches — the result is batch-boundary
invariant (proved in tests by forcing maxFilesPerTrigger=1) and equals
the one-shot batch anti-join, which is how the oracle checks it.

Scale: the seen store is the same hash-partitioned parquet layout the
batch engine uses; each micro-batch's anti-join shuffles only the batch
(small) against the store scan, and a production deployment fronts it
with the Bloom/cuckoo sidecar exactly like the batch path. State in the
streaming engine itself is ZERO — dedup durability lives in the store,
so the query restarts from its checkpoint with no state file growth.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _write_batch_idempotent(df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Append-style sink that survives micro-batch replays.

    ``mode('append')`` straight into ``out_dir`` duplicates rows when a
    micro-batch is retried after a mid-write failure (foreachBatch is
    at-least-once). Writing each batch with ``mode('overwrite')`` into
    its own hive-style ``batch_id=N`` subdirectory makes the replay
    idempotent: a retry REPLACES the partial output of the failed
    attempt instead of appending next to it. Readers keep using
    ``spark.read.parquet(out_dir)`` — partition discovery surfaces
    ``batch_id`` as an extra column they may drop or ignore."""
    df.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch_id={batch_id}"))


def stream_frontier_ingest(
    spark: SparkSession,
    urls_stream: DataFrame,
    seen_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    url_col: str = "url",
) -> None:
    """Drain ``urls_stream`` (availableNow) through the seen-store
    anti-join; newly-seen URLs land in ``out_dir`` and are appended to
    ``seen_dir``. ``seen_dir`` may be pre-seeded with crawl history."""

    schema = urls_stream.schema

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df.dropDuplicates([url_col])
        try:
            seen = spark.read.schema(schema).parquet(seen_dir).select(url_col)
        except Exception:
            seen = None
        if seen is not None:
            fresh = fresh.join(seen, url_col, "left_anti")
        # ONE action (the feed write), then file-level links into the
        # store: running the anti-join twice would recompute a
        # non-deterministically partitioned batch, and parquet part
        # files are immutable + uniquely named, so linking is exact.
        # The store thus holds history + every emitted file; the feed
        # holds only the emitted files.
        fresh.write.mode("append").parquet(out_dir)
        os.makedirs(seen_dir, exist_ok=True)
        for f in os.listdir(out_dir):
            if f.endswith(".parquet") and not os.path.exists(os.path.join(seen_dir, f)):
                os.link(os.path.join(out_dir, f), os.path.join(seen_dir, f))

    q = (
        urls_stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_hll_registers(
    spark: SparkSession,
    urls_stream: DataFrame,
    regs_dir: str,
    checkpoint_dir: str,
    url_col: str = "url",
) -> None:
    """Continuous HyperLogLog cardinality tracking of a URL stream:
    per micro-batch, fold the batch into its 64-register sketch (one
    tiny hash agg) and APPEND the batch registers to the durable regs
    store; the current estimate is always ``read_hll_registers`` →
    hll_estimate. Register max is commutative/associative+idempotent,
    so the folded state is batch-boundary invariant BY CONSTRUCTION —
    however the source splits, the max-merged store equals the batch
    sketch over all data (proved in tests with maxFilesPerTrigger=1).
    Streaming-engine state is ZERO (like stream_frontier_ingest, the
    durability lives in the store); the append-only store grows ≤64
    rows per batch and a periodic compaction (read → max → overwrite)
    folds history without changing any estimate."""
    from ..functions.hashing import h60
    from ..queries.sketchops import hll_register_cols

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        idx, rho = hll_register_cols(h60(F.col(url_col)))
        regs = (
            batch_df.select(idx.alias("idx"), rho.alias("rho"))
            .groupBy("idx").agg(F.max("rho").alias("m"))
        )
        regs.write.mode("append").parquet(regs_dir)

    q = (
        urls_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_hll_registers(spark: SparkSession, regs_dir: str) -> DataFrame:
    """Max-merge the append-only register store to the current sketch."""
    return (
        spark.read.parquet(regs_dir)
        .groupBy("idx").agg(F.max("m").alias("m"))
    )


def stream_host_bytes(
    spark: SparkSession,
    pages_stream: DataFrame,
    meter_dir: str,
    checkpoint_dir: str,
    host_col: str = "host",
    nbytes_col: str = "nbytes",
) -> None:
    """Continuous per-host bandwidth metering: per micro-batch, fold the
    batch to (host, n_pages, total_bytes) partials (one tiny hash agg)
    and APPEND them to the durable meter store; the current meter is
    always ``read_host_bytes`` (sum-merge). Integer sums are
    commutative + associative, so the merged meter is batch-boundary
    invariant BY CONSTRUCTION — however the source splits, the folded
    store equals the batch aggregation over all data. Streaming-engine
    state is ZERO (durability lives in the store, same posture as
    stream_hll_registers); the store grows ≤ |hosts| rows per batch and
    a periodic compaction (read → sum → overwrite) folds history
    without changing any total.

    This is the continuous evidence feed for the bandwidth budget leg:
    ``read_host_bytes(...)`` rows carry exactly the (host, n_fetched,
    total_bytes) shape ``schedops.host_budgets_from_bytes`` derives
    from a finished generation's pages — a long-running crawl can
    re-derive byte-ceiling budgets mid-generation without re-scanning
    its fetch log."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy(host_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.sum(F.col(nbytes_col).cast("long")).cast("long")
            .alias("total_bytes"),
        )
        _write_batch_idempotent(part, meter_dir, batch_id)

    q = (
        pages_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_host_bytes(spark: SparkSession, meter_dir: str) -> DataFrame:
    """Sum-merge the append-only meter store to the current per-host
    totals: (host, n_pages, total_bytes)."""
    return (
        spark.read.parquet(meter_dir)
        .groupBy("host")
        .agg(
            F.sum("n_pages").cast("long").alias("n_pages"),
            F.sum("total_bytes").cast("long").alias("total_bytes"),
        )
    )


def stream_robots_gate(
    spark: SparkSession,
    urls_stream: DataFrame,
    rules: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Continuous REP gate — the stream-static join pattern: each
    micro-batch of discovered URLs joins the (small, broadcast) robots
    ruleset ``rules(host, dis: array<string>, alw: array<string>)`` and
    only RFC 9309-allowed rows append to ``out_dir``. The gate runs the
    engine's actual generic evaluator (functions.urls.rep_best_match —
    the same exprs frontier broadcasts), so stream and batch crawls
    enforce identical robots semantics. Stateless: no store, no
    watermark, nothing in the streaming engine — batch-boundary
    invariance is by construction (a row's verdict depends only on the
    row and the static side), and replays are idempotent (per-batch
    overwrite subdirs — _write_batch_idempotent). A production
    deployment swaps ``rules``
    for the parsed robots snapshot table and re-starts the query to
    pick up refreshed rules (robots_stale decides when).
    """
    from ..functions.urls import rep_best_match, url_host, url_path

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.withColumn("host", url_host(F.col("url"))).withColumn(
            "path", url_path(F.col("url")))
        j = b.join(F.broadcast(rules), "host", "left")
        allowed = j.where(
            rep_best_match(F.col("path"), F.col("dis"))
            <= rep_best_match(F.col("path"), F.col("alw"))
        ).drop("host", "path", "dis", "alw")
        _write_batch_idempotent(allowed, out_dir, batch_id)

    q = (
        urls_stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
