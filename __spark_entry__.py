"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BFS-frontier expansion (canonicalize →
xxhash64 → URL-seen anti-join dedup, SURVEY.md §2.2) on sf0.001;
``queries``/``oracle_sql`` expose the full named query surface from
``crawl4ai_spark.queries`` — each Spark DataFrame builder paired with a
DuckDB oracle over the same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # cwd-independent import

from crawl4ai_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BFS reachability with URL-seen dedup over the arithmetic
    link graph derived from sf0.001 documents (the engine's frontier
    round loop in miniature)."""
    return Q.q_crawl_bfs_reachable(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
