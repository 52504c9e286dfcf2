"""Iceberg-style state maintenance: bin-packing compaction + snapshot
expiry (SnapshotTable.compact / expire_snapshots, CrawlEngine
compact_state / expire_state_snapshots / auto_compact_every).

Invariants under test:
* compaction never changes table content, only the file layout;
* delta reads (the engine's per-round lifeblood) are exact across a
  compact commit — the manifest carries the pre-compact delta forward;
* a crawl interrupted, compacted, then resumed equals an uninterrupted
  crawl (maintenance between runs is safe);
* expiry reclaims superseded small files while every retained snapshot
  (>= the last durable checkpoint) stays readable.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.fixtures import VirtualCorpus
from crawl4ai_spark.operators.frontier import CrawlEngine
from crawl4ai_spark.tables import SnapshotTable


def _rows(df):
    return sorted(map(tuple, df.collect()))


class TestSnapshotCompaction:
    def test_compact_packs_files_and_preserves_content(self, spark, tmp_path):
        tbl = SnapshotTable(str(tmp_path), "t")
        for i in range(10):
            tbl.append(spark.range(i * 100, (i + 1) * 100).toDF("id"))
        before_files = tbl.files()
        before = _rows(tbl.read(spark))
        last_delta = tbl.latest_delta_files()

        v = tbl.compact(spark, target_bytes=1 << 20, min_files=2)
        assert v == tbl.current_version()
        assert len(tbl.files()) < len(before_files)
        assert _rows(tbl.read(spark)) == before
        # the delta survives the rewrite verbatim
        assert tbl.latest_delta_files() == last_delta
        assert _rows(tbl.read_files(spark, tbl.latest_delta_files())) == _rows(
            spark.range(900, 1000).toDF("id"))

    def test_compact_noop_below_min_files(self, spark, tmp_path):
        tbl = SnapshotTable(str(tmp_path), "t")
        tbl.append(spark.range(10).toDF("id"))
        assert tbl.compact(spark, min_files=8) is None

    def test_append_after_compact_has_exact_delta(self, spark, tmp_path):
        tbl = SnapshotTable(str(tmp_path), "t")
        for i in range(6):
            tbl.append(spark.range(i * 10, (i + 1) * 10).toDF("id"))
        tbl.compact(spark, target_bytes=1 << 20, min_files=2)
        tbl.append(spark.range(60, 70).toDF("id"))
        assert _rows(tbl.read_files(spark, tbl.latest_delta_files())) == _rows(
            spark.range(60, 70).toDF("id"))
        assert _rows(tbl.read(spark)) == _rows(spark.range(70).toDF("id"))

    def test_rollback_past_compact_restores_old_layout(self, spark, tmp_path):
        tbl = SnapshotTable(str(tmp_path), "t")
        for i in range(5):
            tbl.append(spark.range(i * 10, (i + 1) * 10).toDF("id"))
        v_pre = tbl.current_version()
        files_pre = tbl.files()
        tbl.compact(spark, target_bytes=1 << 20, min_files=2)
        tbl.rollback(v_pre)
        assert tbl.files() == files_pre
        assert _rows(tbl.read(spark)) == _rows(spark.range(50).toDF("id"))

    def test_expire_reclaims_superseded_files(self, spark, tmp_path):
        tbl = SnapshotTable(str(tmp_path), "t")
        for i in range(8):
            tbl.append(spark.range(i * 10, (i + 1) * 10).toDF("id"))
        compact_v = tbl.compact(spark, target_bytes=1 << 20, min_files=2)
        content = _rows(tbl.read(spark))

        res = tbl.expire_snapshots(keep_from=compact_v)
        assert res["removed_manifests"] == compact_v - 1
        # pre-compact small files not pinned by the compact manifest's
        # delta_files are gone from disk
        assert res["removed_files"] > 0
        assert _rows(tbl.read(spark)) == content
        # the delta (pinned by the compact manifest) is still readable
        assert _rows(tbl.read_files(spark, tbl.latest_delta_files())) == _rows(
            spark.range(70, 80).toDF("id"))
        with pytest.raises(Exception):
            tbl.read(spark, version=1)


class TestEngineMaintenance:
    def _run(self, spark, state, auto_compact_every=None, max_rounds=1000,
             resume=False):
        vc = VirtualCorpus(n_docs=3000, n_hosts=10)
        cfg = CrawlConfig(
            seeds=vc.seed_urls(9, 3), max_depth=4, max_pages=400,
            round_size=60, track_order=True, respect_robots=False,
            auto_compact_every=auto_compact_every, max_rounds=max_rounds,
        )
        eng = CrawlEngine(spark, vc, cfg, state)
        eng.run(resume=resume)
        return eng

    def test_auto_compact_crawl_equals_plain_crawl(self, spark, tmp_path):
        plain = self._run(spark, str(tmp_path / "plain"))
        compacted = self._run(spark, str(tmp_path / "auto"), auto_compact_every=2)
        cols = ["url", "rank", "depth", "status", "fetch_round"]
        assert _rows(plain.pages().select(*cols)) == _rows(
            compacted.pages().select(*cols))
        assert _rows(plain.url_seen().select("url")) == _rows(
            compacted.url_seen().select("url"))
        # the maintenance actually packed something
        assert len(compacted.frontier_tbl.files()) <= len(plain.frontier_tbl.files())

    def test_compact_between_runs_resume_exact(self, spark, tmp_path):
        uninterrupted = self._run(spark, str(tmp_path / "full"))
        partial = self._run(spark, str(tmp_path / "part"), max_rounds=2)
        # offline maintenance between the interrupted run and its resume
        packed = partial.compact_state(target_bytes=1 << 20, min_files=2)
        assert packed  # at least one table had files to pack
        resumed = self._run(spark, str(tmp_path / "part"), resume=True)
        cols = ["url", "rank", "depth", "status", "fetch_round"]
        assert _rows(uninterrupted.pages().select(*cols)) == _rows(
            resumed.pages().select(*cols))
        assert _rows(uninterrupted.url_seen().select("url")) == _rows(
            resumed.url_seen().select("url"))

    def test_expire_state_snapshots_keeps_checkpointed_reads(self, spark, tmp_path):
        eng = self._run(spark, str(tmp_path / "exp"))
        pages_before = _rows(eng.pages().select("url", "rank"))
        eng.compact_state(target_bytes=1 << 20, min_files=2)
        # a fresh run-extension checkpoints the compacted lineage; here we
        # emulate the maintenance window by re-pinning the checkpoint to
        # current versions before expiring
        eng.ckp.commit(9999, eng._versions(), {"fetched": 0})
        stats = eng.expire_state_snapshots()
        assert any(s["removed_manifests"] > 0 for s in stats.values())
        assert _rows(eng.pages().select("url", "rank")) == pages_before
        assert eng.url_seen().count() > 0
        assert eng.metrics().agg(F.sum("fetched")).collect()[0][0] > 0

    def test_expire_refuses_nothing_without_checkpoint(self, spark, tmp_path):
        vc = VirtualCorpus(n_docs=100, n_hosts=5)
        eng = CrawlEngine(spark, vc, CrawlConfig(seeds=vc.seed_urls(4, 1)),
                          str(tmp_path / "none"))
        assert eng.expire_state_snapshots() == {}


def test_compact_state_dirs_cleaned(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path), "t")
    for i in range(6):
        tbl.append(spark.range(i * 10, (i + 1) * 10).toDF("id"))
    v = tbl.compact(spark, target_bytes=1 << 20, min_files=2)
    tbl.expire_snapshots(keep_from=v)
    data_dir = os.path.join(str(tmp_path), "t", "data")
    for d in os.listdir(data_dir):
        assert os.listdir(os.path.join(data_dir, d))  # no empty uuid dirs


def test_time_travel_as_of_round(spark, tmp_path):
    """Engine-level time travel through the checkpoint manifests: the
    pages log as of round r is exactly the prefix fetched by then
    (monotone, rank-consistent with the final log), url_seen as of r is
    a subset of the final seen set, and expired history raises instead
    of silently reading wrong data."""
    import pytest as _pytest

    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import write_fixtures
    from crawl4ai_spark.operators.frontier import CrawlEngine

    fx = str(tmp_path / "fx")
    write_fixtures(spark, fx, n_docs=300, n_hosts=10)
    docs = spark.read.parquet(f"{fx}/documents.parquet")
    seed = (docs.where(docs.doc_id.contains("host9")).orderBy("doc_id")
            .limit(1).collect()[0].doc_id)
    eng = CrawlEngine(spark, docs, CrawlConfig(seeds=[seed], max_pages=None,
                                               max_depth=4, max_rounds=40),
                      str(tmp_path / "state"))
    eng.run()
    rounds = eng.ckp.rounds()
    assert len(rounds) >= 3, "crawl must checkpoint several rounds"

    final = {(r.rank, r.url) for r in eng.pages().collect()}
    prev = 0
    for r in rounds:
        snap = {(x.rank, x.url) for x in eng.pages(as_of_round=r).collect()}
        assert snap <= final                 # a prefix of history
        assert len(snap) >= prev             # monotone growth
        prev = len(snap)
        seen_r = {x.url for x in eng.url_seen(as_of_round=r).collect()}
        assert seen_r <= {x.url for x in eng.url_seen().collect()}
        assert {u for _, u in snap} <= seen_r  # fetched ⊆ seen, per round
    assert prev == len(final)                # last checkpoint == present

    # unknown round: explicit error with the available axis
    with _pytest.raises(ValueError, match="available rounds"):
        eng.pages(as_of_round=999)

    # expire history, then reading a pre-expiry snapshot must raise —
    # the files are gone by design, never silently wrong
    eng.compact_state(min_files=1)
    eng.pages_tbl.expire_snapshots(eng.pages_tbl.current_version())
    early = rounds[0]
    with _pytest.raises(Exception):
        eng.pages(as_of_round=early).collect()
