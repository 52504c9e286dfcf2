"""Retry/backoff: transient fetch failures re-dispatch with exponential
round backoff, reuse their original crawl rank, and resolve exactly once.

The fetch sim rolls a deterministic per-(url, attempt) die
(pmod(xxhash64(url#attempt), retry_failure_every) == 0), so every run —
and every resumed run — replays the identical failure schedule.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.operators.frontier import CrawlEngine


def _docs(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/documents.parquet")


def _seed(spark, corpus_dir):
    from tests.test_crawl import get_seeds

    return get_seeds(spark, corpus_dir)[:1]


def _cfg(seeds, **kw):
    base = dict(seeds=seeds, max_pages=None, max_depth=4, max_rounds=60)
    base.update(kw)
    return CrawlConfig(**base)


def test_retry_resolves_same_url_set(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = _seed(spark, corpus_dir)
    e0 = CrawlEngine(spark, docs, _cfg(seeds), str(tmp_path / "base"))
    e0.run()
    base = {r.url for r in e0.pages().select("url").collect()}

    e1 = CrawlEngine(
        spark, docs, _cfg(seeds, max_retries=2, retry_failure_every=3),
        str(tmp_path / "retry"))
    e1.run()
    pg = e1.pages()
    resolved = pg.where(F.col("status") != "transient")
    # reachability unchanged: every URL resolves despite transient failures
    assert {r.url for r in resolved.select("url").collect()} == base
    # exactly one resolved row per url
    assert resolved.groupBy("url").count().where("count > 1").count() == 0
    # the failure die actually fired (else this test is vacuous)
    n_tr = pg.where("status = 'transient'").count()
    assert n_tr > 0
    # attempts bounded by max_retries + 1
    assert pg.agg(F.max("attempt")).collect()[0][0] <= 3


def test_retry_reuses_original_rank_and_backs_off(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = _seed(spark, corpus_dir)
    eng = CrawlEngine(
        spark, docs, _cfg(seeds, max_retries=2, retry_failure_every=3),
        str(tmp_path / "rr"))
    eng.run()
    pg = eng.pages().collect()
    by_url: dict[str, list] = {}
    for r in pg:
        by_url.setdefault(r.url, []).append(r)
    saw_transient = False
    for url, rows in by_url.items():
        rows.sort(key=lambda r: r.attempt)
        final = rows[-1]
        assert final.status != "transient"
        for r in rows[:-1]:
            saw_transient = True
            assert r.status == "transient"
            # rank is assigned at FIRST dispatch and reused by retries
            assert r.rank == final.rank
            # transient fetches carry no content
            assert r.spans is None
        # exponential backoff: attempt k+1 dispatches >= 2**(k-1) rounds
        # after attempt k failed
        for a, b in zip(rows, rows[1:]):
            assert b.fetch_round >= a.fetch_round + 2 ** (a.attempt - 1)
    assert saw_transient


def test_retry_disabled_has_constant_attempt(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = _seed(spark, corpus_dir)
    eng = CrawlEngine(spark, docs, _cfg(seeds), str(tmp_path / "off"))
    eng.run()
    pg = eng.pages()
    assert pg.where("attempt != 1").count() == 0
    assert pg.where("status = 'transient'").count() == 0


def test_retry_dispatch_honors_politeness_budget(spark, corpus_dir, tmp_path):
    """ADVICE r3 (medium): due retry re-dispatches must be deducted from
    the host's politeness grant — total per-(host, round) dispatch
    (fresh + retries) stays <= budget, not budget + n_retries. With
    max_retries=1 the due set per round is bounded by the previous
    round's dispatch, so the budget bound is exact (no overdraw case)."""
    from collections import Counter

    docs = _docs(spark, corpus_dir)
    seeds = _seed(spark, corpus_dir)
    budget = 2
    budgets = (
        docs.select(F.expr("parse_url(doc_id, 'HOST')").alias("host")).distinct()
        .select("host", F.lit(budget).cast("int").alias("budget"))
    )
    eng = CrawlEngine(
        spark, docs,
        _cfg(seeds, max_retries=1, retry_failure_every=3, politeness=True),
        str(tmp_path / "prb"), host_budgets=budgets)
    eng.run()
    rows = eng.pages().select("host", "fetch_round", "attempt", "status").collect()
    per_round = Counter((r.host, r.fetch_round) for r in rows)
    assert max(per_round.values()) <= budget
    # non-vacuous: some round dispatched a retry AND a fresh fetch for the
    # same host — exactly the case that used to overdraw to budget + n
    mixed = {
        (r.host, r.fetch_round)
        for r in rows if r.attempt > 1
    } & {
        (r.host, r.fetch_round)
        for r in rows if r.attempt == 1
    }
    assert mixed
    # retry machinery fired and everything resolved
    assert any(r.status == "transient" for r in rows)
    by_url_final = [r for r in rows if r.status != "transient"]
    assert len(by_url_final) > 0


def test_retry_kill_resume_exact(spark, corpus_dir, tmp_path):
    """SIGKILL mid-crawl (simulated by max_rounds=2) then resume: the
    final fetch log — including the transient rows and their ranks —
    equals the uninterrupted run's."""
    docs = _docs(spark, corpus_dir)
    seeds = _seed(spark, corpus_dir)
    kw = dict(max_retries=2, retry_failure_every=3)

    full = CrawlEngine(spark, docs, _cfg(seeds, **kw), str(tmp_path / "full"))
    full.run()
    want = {
        (r.url, r.rank, r.status, r.attempt, r.fetch_round)
        for r in full.pages().collect()
    }

    part = CrawlEngine(
        spark, docs, _cfg(seeds, **kw, max_rounds=2), str(tmp_path / "part"))
    part.run()
    resumed = CrawlEngine(
        spark, docs, _cfg(seeds, **kw), str(tmp_path / "part"))
    resumed.run(resume=True)
    got = {
        (r.url, r.rank, r.status, r.attempt, r.fetch_round)
        for r in resumed.pages().collect()
    }
    assert got == want
