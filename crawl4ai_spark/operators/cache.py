"""S5: fetch-cache modes (reference crawl_agent.py:617-648).

The reference resolves a CacheMode enum case-insensitively, defaulting
unknown values to ENABLED with a warning; the library then consults its
page cache per mode. Spark shape: the ``pages`` table IS the cache —
mode decides which side of (read cached rows | fetch fresh | append new
rows) runs:

    ENABLED     read + write   (anti-join picks only uncached URLs)
    DISABLED    neither        (always fetch, never persist)
    BYPASS      write only     (refetch everything, update cache)
    READ_ONLY   read, no write
    WRITE_ONLY  write, no read (same fetch set as BYPASS)
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

CACHE_MODES = {"enabled", "disabled", "bypass", "read_only", "write_only"}


def resolve_cache_mode(mode: str | None) -> str:
    """Case-insensitive resolution; unknown → 'enabled' with a warning
    (reference quirk, crawl_agent.py:639-648)."""
    m = (mode or "enabled").lower()
    if m not in CACHE_MODES:
        logger.warning("unknown cache mode %r — defaulting to ENABLED", mode)
        return "enabled"
    return m


def cached_fetch(
    selected: DataFrame,
    cache: DataFrame | None,
    fetch_fn: Callable[[DataFrame], DataFrame],
    mode: str = "enabled",
    url_col: str = "url",
) -> tuple[DataFrame, DataFrame | None]:
    """Run the fetch stage under a cache mode.

    Returns ``(pages, cache_writes)`` — ``pages`` carries a
    ``from_cache`` boolean; ``cache_writes`` is what the caller should
    append to the cache table (None when the mode forbids writes).
    ``fetch_fn`` maps a selected-URLs DataFrame to fetched page rows.
    """
    m = resolve_cache_mode(mode)
    reads = m in ("enabled", "read_only")
    writes = m in ("enabled", "bypass", "write_only")

    if reads and cache is not None:
        hits = (
            selected.join(cache, url_col, "inner")
            .withColumn("from_cache", F.lit(True))
        )
        to_fetch = selected.join(cache.select(url_col), url_col, "left_anti")
    else:
        hits = None
        to_fetch = selected

    fetched = fetch_fn(to_fetch).withColumn("from_cache", F.lit(False))
    pages = fetched if hits is None else hits.unionByName(fetched, allowMissingColumns=True)
    cache_writes = fetched.drop("from_cache") if writes else None
    return pages, cache_writes
