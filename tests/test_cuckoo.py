"""Cuckoo sidecar tests: no false negatives (incl. under pressure →
stash), exact-join equivalence, incremental merge, deletion."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.functions.urls import canonicalize, url_hash
from crawl4ai_spark.operators.cuckoo import (
    build_cuckoo_shards,
    cuckoo_anti_join,
    cuckoo_delete,
    cuckoo_maybe_seen,
    merge_cuckoo_shards,
)

NB = 1 << 8  # 256 buckets × 4 slots = 1024 slots/shard — small on purpose


def _urls(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"https://{tag}"), F.pmod("id", F.lit(9)).cast("string"),
                 F.lit(".ex.com/p/"), F.col("id").cast("string")).alias("url")
    ).select("url", url_hash(canonicalize("url")).alias("url_hash"))


def test_cuckoo_no_false_negatives(spark):
    seen = _urls(spark, 0, 500)
    sh = build_cuckoo_shards(seen, n_shards=4, n_buckets=NB)
    flagged = cuckoo_maybe_seen(seen, sh, n_shards=4, n_buckets=NB)
    assert flagged.where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_no_false_negatives_under_pressure(spark):
    """~85% load on tiny tables forces kick-loop overflows into the
    stash — membership must STILL be guaranteed for every insert."""
    seen = _urls(spark, 0, 3500)  # 3500 into 4 shards × 1024 slots
    sh = build_cuckoo_shards(seen, n_shards=4, n_buckets=NB)
    flagged = cuckoo_maybe_seen(seen, sh, n_shards=4, n_buckets=NB)
    assert flagged.where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_fpp_low(spark):
    seen = _urls(spark, 0, 300)
    sh = build_cuckoo_shards(seen, n_shards=4, n_buckets=NB)
    new = _urls(spark, 10_000, 10_300)
    fp = cuckoo_maybe_seen(new, sh, n_shards=4, n_buckets=NB) \
        .where(F.col("maybe_seen")).count()
    # 16-bit fingerprints: fpp ≈ 2b/2^16 ≈ 0.01% — allow a wide margin
    assert fp < 5


def test_cuckoo_anti_join_equals_exact(spark):
    seen = _urls(spark, 0, 400)
    sh = build_cuckoo_shards(seen, n_shards=4, n_buckets=NB)
    cand = _urls(spark, 200, 700)
    got = sorted(r.url for r in
                 cuckoo_anti_join(cand, seen, sh, n_shards=4, n_buckets=NB).collect())
    want = sorted(r.url for r in
                  cand.join(seen.select("url"), "url", "left_anti").collect())
    assert got == want


def test_cuckoo_merge_incremental_equals_rebuild(spark):
    """Per-round delta insert (cogrouped merge) must behave like a full
    rebuild: no false negatives over the union, anti-join still exact."""
    a, b = _urls(spark, 0, 300), _urls(spark, 300, 600)
    sh = build_cuckoo_shards(a, n_shards=4, n_buckets=NB)
    sh = merge_cuckoo_shards(sh, b, n_shards=4, n_buckets=NB)
    union = a.unionByName(b)
    flagged = cuckoo_maybe_seen(union, sh, n_shards=4, n_buckets=NB)
    assert flagged.where(~F.col("maybe_seen")).count() == 0
    cand = _urls(spark, 400, 900)
    got = sorted(r.url for r in
                 cuckoo_anti_join(cand, union, sh, n_shards=4, n_buckets=NB).collect())
    want = sorted(r.url for r in
                  cand.join(union.select("url"), "url", "left_anti").collect())
    assert got == want
    # merge with no prior sidecar == build
    fresh = merge_cuckoo_shards(None, a, n_shards=4, n_buckets=NB)
    assert cuckoo_maybe_seen(a, fresh, n_shards=4, n_buckets=NB) \
        .where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_delete(spark):
    """The Bloom-can't-do-this path: retire URLs from the sidecar. After
    deleting B, every A entry still tests positive (deletion introduces
    NO false negatives for remaining items) and most B entries test
    negative (only fingerprint-collision twins may linger)."""
    a, b = _urls(spark, 0, 400, "keep"), _urls(spark, 0, 400, "drop")
    sh = build_cuckoo_shards(a.unionByName(b), n_shards=4, n_buckets=NB)
    sh2 = cuckoo_delete(sh, b, n_shards=4, n_buckets=NB)
    still_a = cuckoo_maybe_seen(a, sh2, n_shards=4, n_buckets=NB)
    assert still_a.where(~F.col("maybe_seen")).count() == 0
    gone_b = cuckoo_maybe_seen(b, sh2, n_shards=4, n_buckets=NB) \
        .where(F.col("maybe_seen")).count()
    assert gone_b < 5  # ≈ fpp, not 400
    # deleting never-inserted URLs is a harmless no-op
    sh3 = cuckoo_delete(sh2, _urls(spark, 9000, 9100, "ghost"),
                        n_shards=4, n_buckets=NB)
    assert cuckoo_maybe_seen(a, sh3, n_shards=4, n_buckets=NB) \
        .where(~F.col("maybe_seen")).count() == 0


def test_cuckoo_empty_seen_set(spark):
    seen = _urls(spark, 0, 0)
    sh = build_cuckoo_shards(seen, n_shards=4, n_buckets=NB)
    cand = _urls(spark, 0, 50)
    assert cuckoo_maybe_seen(cand, sh, n_shards=4, n_buckets=NB) \
        .where(F.col("maybe_seen")).count() == 0
