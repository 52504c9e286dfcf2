"""Bucketed-table layout for co-located joins (the 100 TB seen-set shape).

At cluster scale the engine's hottest join — candidate links anti-joined
against url_seen — should not shuffle EITHER side: both tables are
written bucketed by ``url_hash`` with the same bucket count, so the join
is planned as a zip of co-located buckets (sort-merge with no Exchange
above either scan). The sandbox snapshot tables (tables.SnapshotTable)
use plain parquet because local-mode file listings are the bottleneck
there, but the layout contract is exercised by tests/test_bucketing.py:
writing two tables with ``write_bucketed`` and anti-joining them must
produce a plan with no shuffle on either side.

This is the drop-in story for a real deployment: register the frontier /
url_seen snapshots as bucketed tables (or Iceberg tables with a
``bucket(url_hash, N)`` partition transform) and every per-round
anti-join, politeness window pre-partition, and redirect-map join reuses
the layout instead of re-shuffling 10^10 rows per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 16,
    key: str = "url_hash",
) -> None:
    """Persist df as a bucketed+sorted managed table keyed for the
    seen-set join: bucketBy(key) gives co-located joins, sortBy(key)
    gives in-bucket merge joins without a per-task sort."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_anti_join(
    spark: SparkSession, candidates_table: str, seen_table: str, key: str = "url_hash"
) -> DataFrame:
    """left_anti of two same-bucketed tables — shuffle-free by layout."""
    cand = spark.table(candidates_table)
    seen = spark.table(seen_table)
    return cand.join(seen, key, "left_anti")
