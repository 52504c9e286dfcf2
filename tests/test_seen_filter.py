"""Bloom sidecar tests: no false negatives, exact-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.functions.urls import canonicalize, url_hash
from crawl4ai_spark.operators.seen_filter import (
    bloom_anti_join,
    bloom_maybe_seen,
    build_bloom_shards,
)

BITS = 1 << 14  # small shards to provoke collisions
K = 5


def _urls(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"https://{tag}"), F.pmod("id", F.lit(9)).cast("string"),
                 F.lit(".ex.com/p/"), F.col("id").cast("string")).alias("url")
    ).select("url", url_hash(canonicalize("url")).alias("url_hash"))


def test_no_false_negatives(spark):
    seen = _urls(spark, 0, 500)
    blooms = build_bloom_shards(seen, n_shards=4, n_bits=BITS, k=K)
    flagged = bloom_maybe_seen(seen, blooms, n_shards=4, n_bits=BITS, k=K)
    # every truly-seen URL must test positive
    assert flagged.where(~F.col("maybe_seen")).count() == 0


def test_definitely_new_mostly_pass(spark):
    seen = _urls(spark, 0, 300)
    blooms = build_bloom_shards(seen, n_shards=4, n_bits=BITS, k=K)
    new = _urls(spark, 10_000, 10_300)
    flagged = bloom_maybe_seen(new, blooms, n_shards=4, n_bits=BITS, k=K)
    fp = flagged.where(F.col("maybe_seen")).count()
    assert fp < 60  # fpp well under 20% even with tiny test shards


def test_bloom_anti_join_equals_exact(spark):
    seen = _urls(spark, 0, 400)
    blooms = build_bloom_shards(seen, n_shards=4, n_bits=BITS, k=K)
    cand = _urls(spark, 200, 700)  # half seen, half new
    got = sorted(
        r.url for r in bloom_anti_join(cand, seen, blooms, n_shards=4, n_bits=BITS, k=K).collect()
    )
    want = sorted(r.url for r in cand.join(seen.select("url"), "url", "left_anti").collect())
    assert got == want


def test_empty_seen_set(spark):
    seen = _urls(spark, 0, 0)
    blooms = build_bloom_shards(seen, n_shards=4, n_bits=BITS, k=K)
    cand = _urls(spark, 0, 50)
    flagged = bloom_maybe_seen(cand, blooms, n_shards=4, n_bits=BITS, k=K)
    assert flagged.where(F.col("maybe_seen")).count() == 0
