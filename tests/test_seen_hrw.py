"""Rendezvous-addressed (growable) Bloom sidecar tests.

Modulo sharding cannot grow: new shard counts move keys BETWEEN
surviving shards, so a key tested against its new shard's old bitset
reads a false negative — growth would force a full rebuild of the
10^10-row seen set (shard_rebalance query: ~65% movement 8→12). HRW
addressing moves a key only to a NEW shard or not at all, so growth
builds only the new shards' bitsets and old bitsets stay byte-identical
(stale bits are a Bloom superset: fpp nudge, never a false negative).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.functions.urls import canonicalize, url_hash
from crawl4ai_spark.operators.frontier import CrawlEngine
from crawl4ai_spark.operators.seen_filter import (
    bloom_anti_join,
    bloom_maybe_seen,
    build_bloom_shards_hrw,
    grow_bloom_shards,
    hrw_shard_of,
)
from tests.test_crawl import get_seeds

BITS = 1 << 14  # small shards to provoke collisions
K = 5
OLD_IDS = [0, 1, 2, 3]
NEW_IDS = [4, 5, 6, 7]
ALL_IDS = OLD_IDS + NEW_IDS


def _urls(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"https://{tag}"), F.pmod("id", F.lit(9)).cast("string"),
                 F.lit(".ex.com/p/"), F.col("id").cast("string")).alias("url")
    ).select("url", url_hash(canonicalize("url")).alias("url_hash"))


def test_hrw_winner_stability(spark):
    """Growing the id set moves a key's winner to a NEW shard or not at
    all — never between surviving shards (the property growth rests on)."""
    u = _urls(spark, 0, 2000)
    w = u.select(
        hrw_shard_of("url_hash", OLD_IDS).alias("w_old"),
        hrw_shard_of("url_hash", ALL_IDS).alias("w_new"),
    )
    bad = w.where(
        (F.col("w_new") != F.col("w_old")) & ~F.col("w_new").isin(NEW_IDS))
    assert bad.count() == 0
    # growth actually moves a nonzero fraction (≈ |new|/|all| = 50%)
    moved = w.where(F.col("w_new") != F.col("w_old")).count()
    assert 0 < moved < 2000


def test_hrw_anti_join_equals_exact(spark):
    seen = _urls(spark, 0, 400)
    blooms = build_bloom_shards_hrw(seen, OLD_IDS, n_bits=BITS, k=K)
    cand = _urls(spark, 200, 700)  # half seen, half new
    got = sorted(r.url for r in bloom_anti_join(
        cand, seen, blooms, n_bits=BITS, k=K, shard_ids=OLD_IDS).collect())
    want = sorted(r.url for r in
                  cand.join(seen.select("url"), "url", "left_anti").collect())
    assert got == want


def test_hrw_growth_incremental_and_exact(spark):
    """Growth builds ONLY the new shards (old rows byte-identical) and
    keeps the no-false-negative guarantee over the whole seen set."""
    seen = _urls(spark, 0, 600)
    blooms = build_bloom_shards_hrw(seen, OLD_IDS, n_bits=BITS, k=K)
    before = {r.shard: bytes(r.bits) for r in blooms.collect()}

    grown = grow_bloom_shards(seen, blooms, ALL_IDS, NEW_IDS, n_bits=BITS, k=K)
    after = {r.shard: bytes(r.bits) for r in grown.collect()}

    # old shards pass through untouched; new shards appear
    for s, b in before.items():
        assert after[s] == b
    assert set(after) - set(before) <= set(NEW_IDS)
    assert set(after) - set(before), "growth built no new shard bitsets"

    # no false negatives post-growth, addressing over the grown id set
    flagged = bloom_maybe_seen(
        seen, grown, n_bits=BITS, k=K, shard_ids=ALL_IDS)
    assert flagged.where(~F.col("maybe_seen")).count() == 0

    # anti-join equivalence post-growth
    cand = _urls(spark, 300, 900)
    got = sorted(r.url for r in bloom_anti_join(
        cand, seen, grown, n_bits=BITS, k=K, shard_ids=ALL_IDS).collect())
    want = sorted(r.url for r in
                  cand.join(seen.select("url"), "url", "left_anti").collect())
    assert got == want


def test_engine_bloom_hrw_grows_and_matches_exact(spark, corpus_dir, tmp_path):
    """Engine conformance: bloom_hrw with a tiny grow_at (forcing mid-
    crawl doubling) produces identical pages + seen set to the exact
    engine — growth only re-addresses the prefilter, never results."""
    base = CrawlConfig(strategy="bfs", max_depth=3, max_pages=40,
                       round_size=None, seeds=get_seeds(spark, corpus_dir))
    hrw_cfg = replace(base, seen_sidecar="bloom_hrw", bloom_shards=4,
                      bloom_bits=1 << 16, bloom_k=5, sidecar_grow_at=5)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    e1 = CrawlEngine(spark, docs, base, str(tmp_path / "exact"))
    e1.run()
    e2 = CrawlEngine(spark, docs, hrw_cfg, str(tmp_path / "hrw"))
    e2.run()
    assert len(e2._hrw_ids) > 4, "grow_at=5 never fired on this fixture"
    p1 = [(r.rank, r.url) for r in e1.pages().orderBy("rank").collect()]
    p2 = [(r.rank, r.url) for r in e2.pages().orderBy("rank").collect()]
    assert p1 == p2
    s1 = {(r.url, r.state) for r in e1.url_seen().collect()}
    s2 = {(r.url, r.state) for r in e2.url_seen().collect()}
    assert s1 == s2


def test_engine_bloom_hrw_resume_replays_growth(spark, corpus_dir, tmp_path):
    """Kill after round 1 → resume: the checkpointed hrw_ids + rolled-back
    sidecar replay growth exactly; final tables equal an uninterrupted
    run (north rule resume-exactness extends to the growth state)."""
    cfg = CrawlConfig(strategy="bfs", max_depth=3, max_pages=40,
                      seeds=get_seeds(spark, corpus_dir),
                      seen_sidecar="bloom_hrw", bloom_shards=4,
                      bloom_bits=1 << 16, bloom_k=5, sidecar_grow_at=5)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")

    full = CrawlEngine(spark, docs, cfg, str(tmp_path / "full"))
    full.run()

    part = CrawlEngine(spark, docs, replace(cfg, max_rounds=1),
                       str(tmp_path / "part"))
    part.run()
    resumed = CrawlEngine(spark, docs, cfg, str(tmp_path / "part"))
    resumed.run(resume=True)

    assert resumed._hrw_ids == full._hrw_ids
    a = [(r.rank, r.url, r.depth, r.status)
         for r in full.pages().orderBy("rank").collect()]
    b = [(r.rank, r.url, r.depth, r.status)
         for r in resumed.pages().orderBy("rank").collect()]
    assert a == b
