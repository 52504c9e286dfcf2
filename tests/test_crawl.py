"""Engine vs sequential oracle: crawl order + URL-seen set (north rule)."""

from __future__ import annotations

import pytest

from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.operators.frontier import CrawlEngine
from crawl4ai_spark.oracle import load_docs_pandas, run_oracle


def _load(spark, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    budgets = spark.read.parquet(f"{corpus_dir}/hosts.parquet")
    pydocs = load_docs_pandas(f"{corpus_dir}/documents.parquet")
    pyrobots = {
        r.host: {"allow": list(r.allow), "disallow": list(r.disallow)}
        for r in robots.collect()
    }
    pybudgets = {r.host: r.budget for r in budgets.collect()}
    return docs, robots, budgets, pydocs, pyrobots, pybudgets


def get_seeds(spark, corpus_dir):
    """Two real doc URLs on the biggest host (deterministic)."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import url_host

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    hot = (
        docs.groupBy(url_host("doc_id").alias("h")).count()
        .orderBy(F.col("count").desc(), "h").limit(1).collect()[0].h
    )
    rows = (
        docs.where(url_host("doc_id") == hot).orderBy("doc_id").limit(2).collect()
    )
    return [r.doc_id for r in rows]


def _run_both(spark, corpus_dir, tmp_path, cfg, name):
    docs, robots, budgets, pydocs, pyrobots, pybudgets = _load(spark, corpus_dir)
    if not cfg.seeds:
        cfg.seeds = get_seeds(spark, corpus_dir)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / name),
                      robots=robots, host_budgets=budgets)
    eng.run()
    got_pages = [
        (r.rank, r.url, r.depth, r.status, r.title)
        for r in eng.pages().orderBy("rank").collect()
    ]
    got_seen = {(r.url, r.state) for r in eng.url_seen().collect()}
    o = run_oracle(pydocs, cfg, robots=pyrobots, budgets=pybudgets)
    want_pages = [(p["rank"], p["url"], p["depth"], p["status"], p["title"]) for p in o.pages]
    want_seen = {(u, s) for u, s in o.seen.items()}
    return got_pages, want_pages, got_seen, want_seen


@pytest.mark.parametrize("strategy", ["bfs", "dfs", "best_first"])
def test_order_and_seen_match_oracle(spark, corpus_dir, tmp_path, strategy):
    cfg = CrawlConfig(seeds=[], strategy=strategy, max_depth=3, max_pages=40,
                      query="spark data", use_ai_agent=True)
    got_p, want_p, got_s, want_s = _run_both(spark, corpus_dir, tmp_path, cfg, strategy)
    assert got_p == want_p
    assert got_s == want_s


def test_best_first_keyword_scorer_order(spark, corpus_dir, tmp_path):
    """F6: Best-First with the KeywordRelevanceScorer must reproduce the
    sequential oracle's order using the same keyword-in-URL ratio."""
    cfg = CrawlConfig(seeds=[], strategy="best_first", max_depth=3, max_pages=40,
                      scorer="keyword", score_keywords=["login", "a/b", "p"],
                      use_ai_agent=True)
    got_p, want_p, got_s, want_s = _run_both(spark, corpus_dir, tmp_path, cfg, "kwbf")
    assert got_p == want_p
    assert got_s == want_s
    # the keyword scorer must actually differentiate (not all-equal scores)
    from crawl4ai_spark.functions.scoring import keyword_score_py
    scores = {keyword_score_py(u, cfg.score_keywords) for _, u, _, _, _ in got_p}
    assert len(scores) > 1


def test_politeness_budgets(spark, corpus_dir, tmp_path):
    cfg = CrawlConfig(seeds=[], strategy="bfs", max_depth=3, max_pages=60,
                      politeness=True)
    got_p, want_p, got_s, want_s = _run_both(spark, corpus_dir, tmp_path, cfg, "polite")
    assert got_p == want_p
    assert got_s == want_s


def test_sequential_conformance_round_size_1(spark, corpus_dir, tmp_path):
    """round_size=1 == fully sequential best-first priority queue."""
    cfg = CrawlConfig(seeds=[], strategy="best_first", max_depth=2,
                      max_pages=12, round_size=1, query="spark", use_ai_agent=True)
    got_p, want_p, got_s, want_s = _run_both(spark, corpus_dir, tmp_path, cfg, "seq")
    assert got_p == want_p


def test_bfs_equals_textbook_fifo(spark, corpus_dir, tmp_path):
    """The round model (politeness off) reduces to a literal FIFO BFS."""
    from crawl4ai_spark.functions.urls import canonicalize_py, url_host_py

    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir)[:1], strategy="bfs",
                      max_depth=2, max_pages=25, respect_robots=False)
    docs, robots, budgets, pydocs, _, _ = _load(spark, corpus_dir)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "fifo"))
    eng.run()
    got = [r.url for r in eng.pages().orderBy("rank").collect()]

    # textbook BFS: FIFO queue, children in span order, seen-on-enqueue
    from collections import deque
    seed = canonicalize_py(cfg.seeds[0])
    q = deque([(seed, 0)])
    seen = {seed}
    order = []
    while q and len(order) < cfg.max_pages:
        u, d = q.popleft()
        order.append(u)
        spans = pydocs.get(u)
        if spans is None or d >= cfg.max_depth:
            continue
        for s in spans:
            if s["kind"] != "link":
                continue
            c = canonicalize_py(s["media_ref"])
            if url_host_py(c) != url_host_py(u):
                continue
            if c not in seen:
                seen.add(c)
                q.append((c, d + 1))
    assert got == order


def test_redirect_alias_resolved_and_fetched_once(spark, corpus_dir, tmp_path):
    """F12: alias links (/r/<t>, /rr/<t>) resolve through the redirects
    map at discovery; dedup and the seen set key on the FINAL canonical
    URL, so an aliased page is fetched exactly once; observed mappings
    land in the redirects table. Order must match the sequential oracle
    running the same capped redirect walk."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    rdf = spark.read.parquet(f"{corpus_dir}/redirects.parquet")
    pydocs = load_docs_pandas(f"{corpus_dir}/documents.parquet")
    pyredir = {r.src_url: r.dst_url for r in rdf.collect()}
    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                      max_depth=3, max_pages=60, respect_robots=False)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "redir"), redirects=rdf)
    eng.run()
    got_pages = [(r.rank, r.url, r.depth, r.status)
                 for r in eng.pages().orderBy("rank").collect()]
    o = run_oracle(pydocs, cfg, redirects=pyredir)
    want_pages = [(p["rank"], p["url"], p["depth"], p["status"]) for p in o.pages]
    assert got_pages == want_pages
    urls = [u for _, u, _, _ in got_pages]
    assert len(urls) == len(set(urls)), "an aliased URL was fetched twice"
    assert not any("/r/" in u or "/rr/" in u for u in urls), "alias leaked into pages"
    got_seen = {(r.url, r.state) for r in eng.url_seen().collect()}
    assert got_seen == set(o.seen.items())
    red = eng.redirects_resolved()
    assert red is not None and red.count() > 0, "no redirect mappings recorded"
    for r in red.collect():
        assert r.src_url in pyredir
        d = pyredir[r.src_url]
        d = pyredir.get(d, d)  # final target within 2 hops
        assert r.dst_url == d


def test_redirects_resume_exact(spark, corpus_dir, tmp_path):
    """F12 + resume: the redirects table participates in the round
    checkpoint — a kill/resume run records the same mappings and pages
    as an uninterrupted one."""
    from dataclasses import replace

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    rdf = spark.read.parquet(f"{corpus_dir}/redirects.parquet")
    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                      max_depth=3, max_pages=50, respect_robots=False)
    full = CrawlEngine(spark, docs, cfg, str(tmp_path / "rr_full"), redirects=rdf)
    full.run()
    part = CrawlEngine(spark, docs, replace(cfg, max_rounds=1),
                       str(tmp_path / "rr_part"), redirects=rdf)
    part.run()
    resumed = CrawlEngine(spark, docs, cfg, str(tmp_path / "rr_part"), redirects=rdf)
    resumed.run(resume=True)
    a = [(r.rank, r.url) for r in full.pages().orderBy("rank").collect()]
    b = [(r.rank, r.url) for r in resumed.pages().orderBy("rank").collect()]
    assert a == b
    ra = {(r.src_url, r.dst_url) for r in full.redirects_resolved().collect()}
    rb = {(r.src_url, r.dst_url) for r in resumed.redirects_resolved().collect()}
    assert ra and ra == rb


def test_robots_blocked_in_seen_not_pages(spark, corpus_dir, tmp_path):
    cfg = CrawlConfig(seeds=[], strategy="bfs", max_depth=6, max_pages=None)
    got_p, want_p, got_s, want_s = _run_both(spark, corpus_dir, tmp_path, cfg, "rb")
    blocked = {u for u, s in got_s if s == "robots_blocked"}
    assert blocked, "fixture should produce robots-blocked URLs (host0 /login)"
    fetched_urls = {u for _, u, _, _, _ in got_p}
    assert not (blocked & fetched_urls)
    assert got_s == want_s
    # REP longest-match: the more specific allow (/login/p/1) overrides
    # the /login disallow — no blocked URL may match the allow prefix
    assert not any("/login/p/1" in u for u in blocked)


def test_robots_allow_override_fires(spark, corpus_dir, tmp_path):
    """REP longest-match with a live carve-out: /login/p/1* on a
    /login-disallowing host must land in the frontier (allow wins, it is
    the longer rule) while sibling /login URLs stay blocked. External
    discovery on so the carved ids on other blocking hosts are reachable."""
    cfg = CrawlConfig(seeds=[], strategy="bfs", max_depth=6, max_pages=None,
                      include_external=True, exclude_social=True)
    got_p, want_p, got_s, want_s = _run_both(spark, corpus_dir, tmp_path, cfg, "rep")
    assert got_s == want_s
    blocking_hosts = {"host0.", "host5.", "host10.", "host11."}
    carved = {
        u for u, s in got_s
        if s == "frontier" and "/login/p/1" in u and any(h in u for h in blocking_hosts)
    }
    assert carved, "allow carve-out never fired — fixture/reachability drift"
    blocked = {u for u, s in got_s if s == "robots_blocked"}
    assert blocked and not any("/login/p/1" in u for u in blocked)


def test_resume_is_exact(spark, corpus_dir, tmp_path):
    """Kill after round k → resume → identical final tables (north rule)."""
    docs, robots, budgets, pydocs, pyrobots, pybudgets = _load(spark, corpus_dir)
    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                      max_depth=3, max_pages=40)

    full = CrawlEngine(spark, docs, cfg, str(tmp_path / "full"), robots=robots)
    full.run()

    # interrupted run: stop after 1 round via max_rounds, then resume
    part_cfg = CrawlConfig(**{**cfg.__dict__, "max_rounds": 1})
    part = CrawlEngine(spark, docs, part_cfg, str(tmp_path / "part"), robots=robots)
    part.run()
    resumed = CrawlEngine(spark, docs, cfg, str(tmp_path / "part"), robots=robots)
    resumed.run(resume=True)

    a = [(r.rank, r.url, r.depth, r.status) for r in full.pages().orderBy("rank").collect()]
    b = [(r.rank, r.url, r.depth, r.status) for r in resumed.pages().orderBy("rank").collect()]
    assert a == b
    sa = {(r.url, r.state) for r in full.url_seen().collect()}
    sb = {(r.url, r.state) for r in resumed.url_seen().collect()}
    assert sa == sb


@pytest.mark.parametrize("sidecar", ["bloom", "cuckoo", "bloom_hrw"])
def test_sidecar_engine_matches_exact(spark, corpus_dir, tmp_path, sidecar):
    """Either maybe-seen sidecar (Bloom via use_bloom back-compat, or
    seen_sidecar='cuckoo') must produce identical pages + seen set (F10
    exact) — the sidecar only skips shuffles, never changes results."""
    from dataclasses import replace

    base = CrawlConfig(strategy="bfs", max_depth=3, max_pages=40, round_size=None)
    base.seeds = get_seeds(spark, corpus_dir)
    if sidecar == "bloom":
        side_cfg = replace(base, use_bloom=True, bloom_shards=4,
                           bloom_bits=1 << 16, bloom_k=5)
    elif sidecar == "bloom_hrw":
        side_cfg = replace(base, seen_sidecar="bloom_hrw", bloom_shards=4,
                           bloom_bits=1 << 16, bloom_k=5, sidecar_grow_at=5)
    else:
        side_cfg = replace(base, seen_sidecar="cuckoo", bloom_shards=4,
                           cuckoo_buckets=1 << 8)

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    e1 = CrawlEngine(spark, docs, base, str(tmp_path / "exact"))
    e1.run()
    e2 = CrawlEngine(spark, docs, side_cfg, str(tmp_path / "side"))
    e2.run()
    p1 = [(r.rank, r.url) for r in e1.pages().orderBy("rank").collect()]
    p2 = [(r.rank, r.url) for r in e2.pages().orderBy("rank").collect()]
    assert p1 == p2
    s1 = {(r.url, r.state) for r in e1.url_seen().collect()}
    s2 = {(r.url, r.state) for r in e2.url_seen().collect()}
    assert s1 == s2


@pytest.mark.parametrize("sidecar", ["bloom", "cuckoo", "bloom_hrw"])
def test_sweep_sidecar_robots_no_duplicate_seen(spark, corpus_dir, tmp_path, sidecar):
    """Sweep + sidecar + robots: blocked URLs live in seen_tbl (not the
    frontier log), so the sidecar's merge delta must include them —
    otherwise a blocked URL rediscovered in a later round tests
    definitely-new, bypasses the exact confirmation, and is re-appended
    to seen_tbl with a different first_round every round it reappears."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    seeds = get_seeds(spark, corpus_dir)
    base = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=6, max_pages=None,
                       track_order=False, respect_robots=True)
    from dataclasses import replace
    if sidecar == "bloom":
        bloom_cfg = replace(base, use_bloom=True, bloom_shards=4,
                            bloom_bits=1 << 16, bloom_k=5)
    elif sidecar == "bloom_hrw":
        bloom_cfg = replace(base, seen_sidecar="bloom_hrw", bloom_shards=4,
                            bloom_bits=1 << 16, bloom_k=5, sidecar_grow_at=5)
    else:
        bloom_cfg = replace(base, seen_sidecar="cuckoo", bloom_shards=4,
                            cuckoo_buckets=1 << 8)
    e1 = CrawlEngine(spark, docs, base, str(tmp_path / "sw_exact"), robots=robots)
    assert e1._sweep_mode()
    e1.run()
    e2 = CrawlEngine(spark, docs, bloom_cfg, str(tmp_path / "sw_bloom"), robots=robots)
    assert e2._sweep_mode()
    e2.run()
    s1 = [(r.url, r.state) for r in e2.url_seen().collect()]
    assert len(s1) == len(set(s1)), "duplicate rows in url_seen (bloom missed blocked)"
    blocked = {u for u, st in s1 if st == "robots_blocked"}
    assert blocked, "fixture should produce robots-blocked URLs in sweep mode"
    assert set(s1) == {(r.url, r.state) for r in e1.url_seen().collect()}
    assert {r.url for r in e1.pages().collect()} == {r.url for r in e2.pages().collect()}


def test_bloom_resume_from_pre_bloom_checkpoint(spark, corpus_dir, tmp_path):
    """Enabling use_bloom when resuming a crawl whose checkpoint predates
    it must not crash (blooms table is empty) and must not duplicate
    seen rows (the sidecar is rebuilt from the full seen set)."""
    from dataclasses import replace

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)
    cfg = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3, max_pages=40)
    full = CrawlEngine(spark, docs, cfg, str(tmp_path / "nb_full"))
    full.run()

    part = CrawlEngine(spark, docs, replace(cfg, max_rounds=1), str(tmp_path / "nb_part"))
    part.run()
    bloom_cfg = replace(cfg, use_bloom=True, bloom_shards=4,
                        bloom_bits=1 << 16, bloom_k=5)
    resumed = CrawlEngine(spark, docs, bloom_cfg, str(tmp_path / "nb_part"))
    resumed.run(resume=True)
    a = [(r.rank, r.url) for r in full.pages().orderBy("rank").collect()]
    b = [(r.rank, r.url) for r in resumed.pages().orderBy("rank").collect()]
    assert a == b
    sb = [(r.url, r.state) for r in resumed.url_seen().collect()]
    assert len(sb) == len(set(sb))
    assert set(sb) == {(r.url, r.state) for r in full.url_seen().collect()}


def test_sweep_mode_same_coverage(spark, corpus_dir, tmp_path):
    """Throughput sweep (append-only frontier) fetches the same page SET
    and seen set as the windowed path with order tracking on."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)
    slow = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3, max_pages=None,
                       track_order=True, respect_robots=False)
    fast = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3, max_pages=None,
                       track_order=False, respect_robots=False)
    e1 = CrawlEngine(spark, docs, slow, str(tmp_path / "slow"))
    e1.run()
    e2 = CrawlEngine(spark, docs, fast, str(tmp_path / "fast"))
    assert e2._sweep_mode()
    e2.run()
    assert {r.url for r in e1.pages().collect()} == {r.url for r in e2.pages().collect()}
    assert {r.url for r in e1.url_seen().collect()} == {r.url for r in e2.url_seen().collect()}


def test_sweep_mode_resume(spark, corpus_dir, tmp_path):
    """Kill after round 1 in sweep mode; resume must complete identically."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)
    cfg_full = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3, max_pages=None,
                           track_order=False, respect_robots=False)
    full = CrawlEngine(spark, docs, cfg_full, str(tmp_path / "full"))
    full.run()

    from dataclasses import replace
    part = CrawlEngine(spark, docs, replace(cfg_full, max_rounds=1), str(tmp_path / "part"))
    part.run()
    resumed = CrawlEngine(spark, docs, cfg_full, str(tmp_path / "part"))
    resumed.run(resume=True)
    assert {r.url for r in full.pages().collect()} == {r.url for r in resumed.pages().collect()}
    assert {r.url for r in full.url_seen().collect()} == {r.url for r in resumed.url_seen().collect()}


def test_virtual_corpus_matches_stored(spark, corpus_dir, tmp_path):
    """Crawling the arithmetic VirtualCorpus == crawling the written
    parquet corpus (same generator function, no storage)."""
    from crawl4ai_spark.fixtures import VirtualCorpus

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)
    cfg = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3, max_pages=25,
                      respect_robots=False)
    e1 = CrawlEngine(spark, docs, cfg, str(tmp_path / "stored"))
    e1.run()
    vc = VirtualCorpus(n_docs=300, n_hosts=12)  # matches conftest fixture
    e2 = CrawlEngine(spark, vc, cfg, str(tmp_path / "virtual"))
    e2.run()
    p1 = [(r.rank, r.url, r.status) for r in e1.pages().orderBy("rank").collect()]
    p2 = [(r.rank, r.url, r.status) for r in e2.pages().orderBy("rank").collect()]
    assert p1 == p2
    # span-sequence equality on a sample page (per-row invariant)
    s1 = e1.pages().where("status='fetched'").orderBy("rank").first()
    s2 = e2.pages().where("status='fetched'").orderBy("rank").first()
    assert [tuple(x) for x in s1.spans] == [tuple(x) for x in s2.spans]
    assert vc.seed_urls(11, 2) == sorted(vc.seed_urls(11, 2))


def test_politeness_budgets_from_crawl_delay(spark, corpus_dir, tmp_path):
    """F8: budgets derived from robots crawl_delay (rate limit → per-round
    budget) drive the same politeness selection engine-vs-oracle."""
    from crawl4ai_spark.fixtures import budgets_from_crawl_delay

    docs, robots, _, pydocs, pyrobots, _ = _load(spark, corpus_dir)
    budgets = budgets_from_crawl_delay(robots, round_period_s=2.0)
    pybudgets = {r.host: r.budget for r in budgets.collect()}
    # 2.0s period / delays 0.5..2.0 → budgets 1..4, all bounded
    assert set(pybudgets.values()) <= set(range(1, 5))
    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                      max_depth=3, max_pages=40, politeness=True)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "cd"),
                      robots=robots, host_budgets=budgets)
    eng.run()
    got = [(r.rank, r.url) for r in eng.pages().orderBy("rank").collect()]
    o = run_oracle(pydocs, cfg, robots=pyrobots, budgets=pybudgets)
    want = [(p["rank"], p["url"]) for p in o.pages]
    assert got == want


def test_politeness_with_host_salting(spark, corpus_dir, tmp_path):
    """politeness_salts > 1 splits the per-host budget across salts
    (scale mode for hot domains) — engine must match the oracle, which
    models the same ceil(budget/salts) per-salt cap."""
    cfg = CrawlConfig(strategy="bfs", max_depth=3, max_pages=30,
                      politeness=True, politeness_salts=4)
    got_pages, want_pages, got_seen, want_seen = _run_both(
        spark, corpus_dir, tmp_path, cfg, "salted"
    )
    assert got_pages == want_pages  # exact order now that the oracle mirrors salt caps
    assert got_seen == want_seen


def test_politeness_adaptive_salting(spark, corpus_dir, tmp_path):
    """salt_min_grants (adaptive skew salting): a host's budget is split
    over ns = clamp(ceil(budget/mg), 1, salts) queues instead of a fixed
    `salts` — long-tail hosts fold to one queue and get their budget
    EXACTLY; hot hosts keep parallel queues. Engine must match the
    oracle, and folded hosts (budget ≤ mg → ns = 1) must never exceed
    their per-round budget (fixed salting over-grants up to salts-1)."""
    mg = 4
    cfg = CrawlConfig(strategy="bfs", max_depth=3, max_pages=30,
                      politeness=True, politeness_salts=4, salt_min_grants=mg)
    got_pages, want_pages, got_seen, want_seen = _run_both(
        spark, corpus_dir, tmp_path, cfg, "adsalt"
    )
    assert got_pages == want_pages
    assert got_seen == want_seen

    # budget exactness for folded hosts: the crawl concentrates on the
    # hot host (budget 7). Under mg=4 it keeps ns=2 queues and the
    # documented ≤ns-1 over-grant is REAL (a round fetches 8 > 7); under
    # mg=7 it folds to ns=1 and the budget binds exactly every round.
    docs, robots, budgets, *_ = _load(spark, corpus_dir)
    bmap = {r.host: r.budget for r in budgets.collect()}

    def per_round_counts(tag, mg_val):
        c = CrawlConfig(seeds=cfg.seeds, strategy="bfs", max_depth=3,
                        max_pages=30, politeness=True, politeness_salts=4,
                        salt_min_grants=mg_val)
        eng = CrawlEngine(spark, docs, c, str(tmp_path / "adsalt" / tag),
                          robots=robots, host_budgets=budgets)
        eng.run()
        return eng.pages().groupBy("host", "fetch_round").count().collect()

    folded = [r for r in per_round_counts("exact", 7)
              if bmap.get(r.host, 10**9) <= 7]
    assert folded, "fixture must exercise at least one folded host"
    for r in folded:
        assert r["count"] <= bmap[r.host], (r.host, r.fetch_round, r["count"])


def test_adaptive_salting_mg_inf_equals_unsalted(spark, corpus_dir, tmp_path):
    """Semantics pin: with salt_min_grants ≥ every budget, ns folds to 1
    for ALL hosts, so the crawl must be IDENTICAL to politeness_salts=1
    (exact per-host budgets) even though host_salt is stored mod 4."""
    cfg_ad = CrawlConfig(strategy="bfs", max_depth=3, max_pages=30,
                         politeness=True, politeness_salts=4,
                         salt_min_grants=1000)
    cfg_un = CrawlConfig(strategy="bfs", max_depth=3, max_pages=30,
                         politeness=True, politeness_salts=1)
    docs, robots, budgets, *_ = _load(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    out = {}
    for tag, cfg in (("ad", cfg_ad), ("un", cfg_un)):
        cfg.seeds = seeds
        eng = CrawlEngine(spark, docs, cfg, str(tmp_path / tag),
                          robots=robots, host_budgets=budgets)
        eng.run()
        out[tag] = [(r.rank, r.url) for r in eng.pages().orderBy("rank").collect()]
    assert out["ad"] == out["un"]


def test_lazy_loading_exposes_extra_outlinks(spark, tmp_path):
    """U5 (SURVEY §2.8): enable_lazy_loading deterministically exposes
    extra trailing spans on lazy pages — the lazy crawl's seen set is a
    strict superset of the plain crawl's, and re-running either config
    reproduces its set exactly."""
    from crawl4ai_spark.fixtures import VirtualCorpus

    vc = VirtualCorpus(n_docs=400, n_hosts=8)
    seeds = vc.seed_urls(7, 2)

    def crawl(lazy: bool, tag: str) -> set[str]:
        cfg = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3, max_pages=80,
                          round_size=20, respect_robots=False,
                          enable_lazy_loading=lazy)
        eng = CrawlEngine(spark, vc, cfg, str(tmp_path / tag))
        eng.run()
        return {r.url for r in eng.url_seen().collect()}

    plain = crawl(False, "plain")
    lazy = crawl(True, "lazy")
    plain2 = crawl(False, "plain2")
    assert plain == plain2  # deterministic
    assert plain <= lazy    # lazy only ADDS spans (prefix extension)
    assert len(lazy) > len(plain)  # and the fixture die guarantees some


def test_multi_step_session_extends_outlinks(spark, tmp_path):
    """U5 multi-step sessions (reference multi_step_js_actions,
    crawl_agent.py:147-150; examples/multi_step_interaction.py): each
    added step deterministically reveals more spans, so the k-step
    crawl's seen set is a strict superset of the (k-1)-step crawl's —
    the reference's 30→60→90-items "More"-click loop shape — and every
    step count reproduces its set exactly on re-run."""
    from crawl4ai_spark.fixtures import VirtualCorpus

    vc = VirtualCorpus(n_docs=400, n_hosts=8)
    seeds = vc.seed_urls(7, 2)

    def crawl(steps: int, tag: str) -> set[str]:
        cfg = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3, max_pages=80,
                          round_size=20, respect_robots=False,
                          multi_step_actions=steps)
        eng = CrawlEngine(spark, vc, cfg, str(tmp_path / tag))
        eng.run()
        return {r.url for r in eng.url_seen().collect()}

    s0 = crawl(0, "s0")
    s1 = crawl(1, "s1")
    s2 = crawl(2, "s2")
    s1b = crawl(1, "s1b")
    assert s1 == s1b                      # deterministic per step count
    assert s0 <= s1 and s1 <= s2          # strict prefix-extension per step
    assert len(s1) > len(s0)              # the 2/3 reveal die guarantees growth
    assert len(s2) > len(s1)


def test_global_rank_topk_exact_many_partitions(spark, tmp_path):
    """ADVICE r2: the shuffle-free two-level top-k depends on
    monotonically_increasing_id evaluating after sortWithinPartitions in
    the same stage — pin that planner invariant: with many skewed input
    partitions the selected set must equal the exact global top-k."""
    from pyspark.sql import functions as F
    from crawl4ai_spark.fixtures import VirtualCorpus

    vc = VirtualCorpus(n_docs=5000, n_hosts=8)
    cfg = CrawlConfig(seeds=vc.seed_urls(7, 1), strategy="bfs", max_depth=2,
                      max_pages=None, round_size=None, respect_robots=False)
    eng = CrawlEngine(spark, vc, cfg, str(tmp_path / "s"))

    # skewed candidate set over MANY partitions: priority = (depth,
    # parent_rank, parent_offset, url)
    n = 3000
    cand = (
        spark.range(n).repartition(37)
        .select(
            F.concat(F.lit("https://host7.example.com/p/"), F.col("id").cast("string")).alias("url"),
            F.xxhash64("id").alias("url_hash"),
            F.lit("host7.example.com").alias("host"),
            F.lit(0).alias("host_salt"),
            F.pmod(F.col("id"), F.lit(3)).cast("int").alias("depth"),
            F.lit(0.0).alias("score"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50)).alias("parent_rank"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).cast("int").alias("parent_offset"),
            F.lit("x").alias("path"),
            F.lit(1).alias("discovered_round"),
        )
    )
    limit = 173
    pri = eng._priority()
    got = eng._global_rank_topk(cand, pri, limit).select("url", "rank_in_round").collect()
    exact = [r.url for r in cand.orderBy(*pri).limit(limit).collect()]
    got_sorted = [r.url for r in sorted(got, key=lambda r: r.rank_in_round)]
    assert got_sorted == exact
    assert sorted(r.rank_in_round for r in got) == list(range(1, limit + 1))

    # the 10^10-scale path: force the range-partitioned two-level rank
    # (sampled boundaries + broadcast offsets, no single-partition
    # window) and pin (url, rank) EQUALITY with the window path — the
    # priority's unique url tiebreak makes ranks boundary-invariant
    eng._pending_est = eng.RANK_RANGE_THRESHOLD + 1
    got_range = eng._global_rank_topk(cand, pri, limit).select(
        "url", "rank_in_round").collect()
    assert {(r.url, r.rank_in_round) for r in got_range} == {
        (r.url, r.rank_in_round) for r in got}
    # direct calls bypass run()'s release point — drop the handles here
    for h in (eng._rank_cache or []):
        h.unpersist()
    eng._rank_cache = None


def test_resume_after_complete_keeps_metrics(spark, corpus_dir, tmp_path):
    """ADVICE r2 (medium): the final metrics flush lands AFTER the last
    round checkpoint; a resume on the finished state dir must not roll
    back (delete) the flushed metrics rows."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    from test_crawl import get_seeds

    seed = get_seeds(spark, corpus_dir)[0]
    cfg = CrawlConfig(seeds=[seed], strategy="bfs", max_depth=3, max_pages=40,
                      round_size=10, respect_robots=False)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "m"))
    eng.run()
    before = eng.metrics().count()
    assert before > 0
    eng2 = CrawlEngine(spark, docs, cfg, str(tmp_path / "m"))
    eng2.run(resume=True)  # crawl already complete — must be a no-op
    assert eng2.metrics().count() == before
    assert [r.rank for r in eng2.pages().orderBy("rank").collect()] == \
           [r.rank for r in eng.pages().orderBy("rank").collect()]


def test_resume_mid_crawl_delta_mode(spark, tmp_path):
    """Pending delta-mode resume: with a round budget large enough that
    every round drains pending (delta mode — no pending materialization),
    stopping after round 1 and resuming must equal the uninterrupted
    crawl exactly, ranks included."""
    from crawl4ai_spark.fixtures import VirtualCorpus

    vc = VirtualCorpus(n_docs=400, n_hosts=8)
    seeds = vc.seed_urls(7, 2)
    full_cfg = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3, max_pages=None,
                           round_size=100_000, max_rounds=3, respect_robots=False,
                           include_external=True)
    full = CrawlEngine(spark, vc, full_cfg, str(tmp_path / "full"))
    full.run()

    part_cfg = CrawlConfig(**{**full_cfg.__dict__, "max_rounds": 1})
    state = str(tmp_path / "part")
    CrawlEngine(spark, vc, part_cfg, state).run()
    resumed = CrawlEngine(spark, vc, full_cfg, state)
    resumed.run(resume=True)

    a = [(r.rank, r.url) for r in full.pages().orderBy("rank").collect()]
    b = [(r.rank, r.url) for r in resumed.pages().orderBy("rank").collect()]
    assert a == b
    assert {r.url for r in full.url_seen().collect()} == \
           {r.url for r in resumed.url_seen().collect()}


def test_trap_templates_block_enqueue(spark, corpus_dir, tmp_path):
    """crawl_traps feedback: links whose (host, path-template) is in the
    trap table never enter the frontier; everything else matches the
    unrestricted crawl minus the trapped subtree."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]
    cfg = lambda: CrawlConfig(seeds=list(seeds), max_pages=None, max_depth=4,
                              max_rounds=40)
    base = CrawlEngine(spark, docs, cfg(), str(tmp_path / "base"))
    base.run()
    base_urls = {r.url for r in base.pages().select("url").collect()}
    # fixture paths are /p/<i>, /a/b/c/<i>, /login/p/<i> — trap the
    # /a/b/c class on the seed's host
    host = seeds[0].split("/")[2]
    traps = spark.createDataFrame([(host, "/a/b/c/{d}")], ["host", "template"])
    eng = CrawlEngine(spark, docs, cfg(), str(tmp_path / "trap"),
                      trap_templates=traps)
    eng.run()
    got = {r.url for r in eng.pages().select("url").collect()}
    trapped = {u for u in base_urls
               if u.split("/")[2] == host and "/a/b/c/" in u and u not in seeds}
    assert trapped, "fixture must contain trapped URLs or the test is vacuous"
    assert got.isdisjoint(trapped)
    # the non-trapped reachable set can only shrink through trapped parents
    assert got <= base_urls
    assert seeds[0] in got


@pytest.mark.parametrize("strategy", ["bfs", "best_first"])
def test_score_threshold_conformance(spark, corpus_dir, tmp_path, strategy):
    """Reference score-threshold semantics (original-README.md:510):
    links scoring below the threshold are dropped pre-enqueue — order
    and seen set must still match the sequential oracle exactly, and
    the threshold must actually prune vs the unfiltered crawl."""
    base = dict(seeds=[], strategy=strategy, max_depth=3, max_pages=40,
                query="spark data", use_ai_agent=True)
    # 0.5 sits between the blacklist-term score (0.3: login/cart/...
    # URLs) and the plain-link score (0.6) — prunes exactly those
    cfg = CrawlConfig(**base, score_threshold=0.5)
    got_p, want_p, got_s, want_s = _run_both(
        spark, corpus_dir, tmp_path, cfg, f"thresh_{strategy}")
    assert got_p == want_p
    assert got_s == want_s
    # and the bar pruned something: unfiltered crawl sees more URLs
    cfg_all = CrawlConfig(**{**base, "seeds": list(cfg.seeds)})
    _, _, got_s_all, _ = _run_both(
        spark, corpus_dir, tmp_path, cfg_all, f"nothresh_{strategy}")
    assert len(got_s_all) > len(got_s)


def test_robots_wildcard_rules_match_oracle(spark, corpus_dir, tmp_path):
    """RFC 9309 wildcard rules live in a real crawl: disallow '/*7$'
    (path ends in 7) with a longer allow '/p/7$' carve-out, on every
    host. Engine seen-set == sequential oracle; the rules demonstrably
    fire (some ...7 URL blocked, the carved path passes)."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import url_host

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    pydocs = load_docs_pandas(f"{corpus_dir}/documents.parquet")
    hosts = sorted(
        r.h for r in docs.select(url_host("doc_id").alias("h")).distinct().collect()
    )
    robots = spark.createDataFrame(
        [(h, ["/p/7$"], ["/*7$"]) for h in hosts],
        "host string, allow array<string>, disallow array<string>",
    )
    pyrobots = {h: {"allow": ["/p/7$"], "disallow": ["/*7$"]} for h in hosts}
    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                      max_depth=6, max_pages=None, include_external=True)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "repwild"), robots=robots)
    eng.run()
    got_seen = {(r.url, r.state) for r in eng.url_seen().collect()}
    o = run_oracle(pydocs, cfg, robots=pyrobots)
    assert got_seen == {(u, s) for u, s in o.seen.items()}
    blocked = {u for u, s in got_seen if s == "robots_blocked"}
    passed = {u for u, s in got_seen if s != "robots_blocked"}
    assert blocked and all(u.endswith("7") for u in blocked)
    assert not any(u.endswith("/p/7") for u in blocked)
    # the longer allow rule ('/p/7$' beats '/*7$') lets that exact path through
    assert any(u.endswith("/p/7") for u in passed), "allow carve-out never fired"
    fetched = {r.url for r in eng.pages().where("status = 'fetched'").collect()}
    assert not any(
        u.endswith("7") and not u.endswith("/p/7")
        for u in fetched if u not in cfg.seeds
    )


def test_politeness_auto_derives_budgets_from_robots_delay(spark, corpus_dir, tmp_path):
    """F8 completion: politeness=True + round_period_s + a robots frame
    carrying crawl_delay and NO explicit budgets table derives the
    budgets inside the engine — the crawl is identical to passing
    budgets_from_crawl_delay explicitly."""
    from crawl4ai_spark.fixtures import budgets_from_crawl_delay

    docs, robots, _, _, _, _ = _load(spark, corpus_dir)
    cfg_auto = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                           max_depth=3, max_pages=40, politeness=True,
                           round_period_s=2.0)
    auto = CrawlEngine(spark, docs, cfg_auto, str(tmp_path / "auto"),
                       robots=robots)
    assert auto.host_budgets is not None, "engine must derive budgets"
    auto.run()

    cfg_exp = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                          max_depth=3, max_pages=40, politeness=True)
    exp = CrawlEngine(spark, docs, cfg_exp, str(tmp_path / "exp"),
                      robots=robots,
                      host_budgets=budgets_from_crawl_delay(robots, 2.0))
    exp.run()
    got = [(r.rank, r.url) for r in auto.pages().orderBy("rank").collect()]
    want = [(r.rank, r.url) for r in exp.pages().orderBy("rank").collect()]
    assert got == want and got

    # explicit budgets still take precedence over derivation
    both = CrawlEngine(spark, docs, cfg_auto, str(tmp_path / "both"),
                       robots=robots,
                       host_budgets=budgets_from_crawl_delay(robots, 4.0))
    b = {r.host: r.budget for r in both.host_budgets.collect()}
    assert b == {r.host: r.budget
                 for r in budgets_from_crawl_delay(robots, 4.0).collect()}


def test_politeness_domain_key(spark, corpus_dir, tmp_path):
    """politeness_key='domain': every fixture host folds to the one
    registrable domain example.com, so a single domain budget caps the
    WHOLE crawl's per-round dispatch — and the engine still reproduces
    the sequential oracle exactly with the same domain-keyed budgets."""
    from crawl4ai_spark.functions.urls import registrable_domain_py, url_host_py

    docs, robots, _, pydocs, pyrobots, _ = _load(spark, corpus_dir)
    b = 5
    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                      max_depth=3, max_pages=40, politeness=True,
                      politeness_key="domain")
    budgets = spark.createDataFrame([("example.com", b)], "host string, budget int")
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "domkey"),
                      robots=robots, host_budgets=budgets)
    eng.run()
    got = [(r.rank, r.url, r.depth, r.status, r.title)
           for r in eng.pages().orderBy("rank").collect()]
    o = run_oracle(pydocs, cfg, robots=pyrobots, budgets={"example.com": b})
    want = [(p["rank"], p["url"], p["depth"], p["status"], p["title"])
            for p in o.pages]
    assert got == want
    assert {(r.url, r.state) for r in eng.url_seen().collect()} == set(o.seen.items())
    # the cap binds globally: no round dispatches more than the domain budget
    rounds: dict[int, int] = {}
    for r in eng.pages().collect():
        assert registrable_domain_py(url_host_py(r.url)) == "example.com"
        rounds[r.fetch_round] = rounds.get(r.fetch_round, 0) + 1
    assert rounds and max(rounds.values()) <= b
    # the fold is restrictive: with every host sharing one budget the
    # crawl needs at least ceil(total/b) rounds (per-host budgeting
    # would pack a multiple of b per round across the ~7 hosts)
    total = sum(rounds.values())
    assert total > b  # multiple rounds actually exercised the cap
    assert len(rounds) >= -(-total // b)


def test_url_guards_drop_trap_links(spark, tmp_path):
    """max_url_length / max_path_segments: over-limit links are dropped
    pre-enqueue (never fetched, never seen), normal links crawl on."""
    schema = ("doc_id string, spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    long_url = "https://h.example.com/q/" + "x" * 200
    deep_url = "https://h.example.com/" + "/".join(f"s{k}" for k in range(9))
    ok_url = "https://h.example.com/ok/1"
    docs = spark.createDataFrame([
        ("https://h.example.com/", [
            ("link", "long", long_url, 0),
            ("link", "deep", deep_url, 1),
            ("link", "ok", ok_url, 2),
        ]),
        (ok_url, [("text", "leaf", None, 0)]),
        (long_url, [("text", "trap", None, 0)]),
        (deep_url, [("text", "trap", None, 0)]),
    ], schema)
    cfg = CrawlConfig(seeds=["https://h.example.com/"], max_depth=3,
                      max_pages=10, max_url_length=100, max_path_segments=4)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "guards"))
    res = eng.run()
    urls = {r.url for r in eng.pages().collect()}
    seen = {r.url for r in eng.url_seen().collect()}
    assert ok_url in urls
    assert long_url not in urls and long_url not in seen
    assert deep_url not in urls and deep_url not in seen
    assert res["fetched"] == 2  # seed + ok leaf

    # guards off: both trap links are crawled (the guard was the cause)
    eng2 = CrawlEngine(spark, docs,
                       CrawlConfig(seeds=["https://h.example.com/"],
                                   max_depth=3, max_pages=10),
                       str(tmp_path / "noguards"))
    eng2.run()
    assert {long_url, deep_url} <= {r.url for r in eng2.pages().collect()}


def test_url_guards_oracle_conformance(spark, corpus_dir, tmp_path):
    """With a length cap that actually prunes fixture links, the engine
    still reproduces the sequential oracle exactly (the oracle mirrors
    both guards)."""
    cfg = CrawlConfig(seeds=[], strategy="bfs", max_depth=3, max_pages=40,
                      max_url_length=46, max_path_segments=3)
    got_p, want_p, got_s, want_s = _run_both(spark, corpus_dir, tmp_path, cfg, "guards")
    assert got_p == want_p
    assert got_s == want_s
    assert got_p, "cap must not kill the whole crawl"
    assert all(len(u.encode()) <= 46 for _, u, d, _, _ in got_p if d > 0)


def test_politeness_domain_key_with_salting(spark, corpus_dir, tmp_path):
    """Domain politeness composes with salt queues: the shared domain
    budget splits across per-URL salt queues exactly as host budgets do
    (oracle mirrors key=(domain, salt), per-queue ceil(budget/salts))."""
    docs, robots, _, pydocs, pyrobots, _ = _load(spark, corpus_dir)
    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                      max_depth=3, max_pages=40, politeness=True,
                      politeness_key="domain", politeness_salts=4)
    budgets = spark.createDataFrame([("example.com", 8)], "host string, budget int")
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "domsalt"),
                      robots=robots, host_budgets=budgets)
    eng.run()
    got = [(r.rank, r.url, r.depth, r.status, r.title)
           for r in eng.pages().orderBy("rank").collect()]
    o = run_oracle(pydocs, cfg, robots=pyrobots, budgets={"example.com": 8})
    want = [(p["rank"], p["url"], p["depth"], p["status"], p["title"])
            for p in o.pages]
    assert got == want
    assert {(r.url, r.state) for r in eng.url_seen().collect()} == set(o.seen.items())


def test_nofollow_pages_gate_outlinks(spark, corpus_dir, tmp_path):
    """REP follow-gate: a page in nofollow_pages is still FETCHED but
    contributes no outlinks. Gating the seed collapses the crawl to the
    seed alone; gating a non-cut page keeps every URL that has another
    discovery path, and the result is always a subset of the base
    crawl's reachable set."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]
    cfg = lambda: CrawlConfig(seeds=list(seeds), max_pages=None, max_depth=3,
                              max_rounds=30)
    base = CrawlEngine(spark, docs, cfg(), str(tmp_path / "base"))
    base.run()
    base_urls = {r.url for r in base.pages().select("url").collect()}
    assert len(base_urls) > 1

    # gate the seed: only the seed itself is ever fetched
    nf_seed = spark.createDataFrame([(seeds[0],)], ["url"])
    eng = CrawlEngine(spark, docs, cfg(), str(tmp_path / "nf_seed"),
                      nofollow_pages=nf_seed)
    eng.run()
    assert {r.url for r in eng.pages().select("url").collect()} == set(seeds)

    # gate one non-seed page: it stays fetched, result is a subset, and
    # anything lost is only reachable through the gated page
    victim = sorted(u for u in base_urls if u not in seeds)[0]
    nf_one = spark.createDataFrame([(victim,)], ["url"])
    eng2 = CrawlEngine(spark, docs, cfg(), str(tmp_path / "nf_one"),
                       nofollow_pages=nf_one)
    eng2.run()
    got = {r.url for r in eng2.pages().select("url").collect()}
    assert victim in got
    assert got <= base_urls


def test_strip_params_folds_aliases(spark, corpus_dir, tmp_path):
    """DUST loop closed in the engine: with strip_params on, the
    fixture's query-param link variants fold onto their bare path in
    the URL-seen set — the crawl reaches exactly the baseline's URL set
    modulo '?a=..&b=..' suffixes, fetches no parameterized URL, and
    never fetches a fold group twice."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]
    mk = lambda **kw: CrawlConfig(seeds=list(seeds), max_pages=None,
                                  max_depth=4, max_rounds=40, **kw)
    base = CrawlEngine(spark, docs, mk(), str(tmp_path / "base"))
    base.run()
    base_urls = {r.url for r in base.pages().select("url").collect()}
    param_urls = {u for u in base_urls if "?" in u}
    assert param_urls, "fixture must produce query-param variants"

    eng = CrawlEngine(spark, docs, mk(strip_params=("a", "b")),
                      str(tmp_path / "strip"))
    eng.run()
    got = {r.url for r in eng.pages().select("url").collect()}
    assert all("?" not in u for u in got)
    assert got == {u.split("?")[0] for u in base_urls}
    # the seen set folded: strictly fewer distinct URLs than baseline
    assert eng.url_seen().count() < base.url_seen().count()


def test_url_scores_graph_feedback_reorders(spark, corpus_dir, tmp_path):
    """Link-graph feedback closes the loop: an external (url, score)
    table — pagerank/OPIC/anchor output — overrides the URL-string
    scorer at discovery, so a boosted page is fetched earlier than in
    the baseline crawl and its override score lands in the pages log."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]

    def run(name, url_scores=None):
        cfg = CrawlConfig(seeds=list(seeds), strategy="best_first",
                          max_depth=3, max_pages=30, respect_robots=False)
        eng = CrawlEngine(spark, docs, cfg, str(tmp_path / name),
                          url_scores=url_scores)
        eng.run()
        return eng, [r.url for r in eng.pages().orderBy("rank").collect()]

    beng, base_order = run("usf_base")
    # Boost the LAST page of the first multi-page fetch round: rounds
    # drain all pending, so the override can only reorder WITHIN a
    # round — a singleton round's page can't move.
    by_round: dict[int, list[str]] = {}
    for r in beng.pages().orderBy("rank").collect():
        by_round.setdefault(r.fetch_round, []).append(r.url)
    target = next(urls[-1] for _, urls in sorted(by_round.items())
                  if len(urls) >= 2 and urls[-1] not in seeds)
    scores = spark.createDataFrame([(target, 1.0)], "url string, score double")
    eng, boosted_order = run("usf_boost", scores)
    assert boosted_order.index(target) < base_order.index(target)
    row = eng.pages().where(F.col("url") == target).collect()[0]
    assert row.score == 1.0
    # URLs absent from the table keep their scorer score: same page SET
    assert set(boosted_order) == set(base_order)


def test_url_scores_with_threshold_gate(spark, corpus_dir, tmp_path):
    """With url_scores present, score_threshold sees the EFFECTIVE
    score: a 0.99 bar blocks every discovered link except the boosted
    one (base link scores top out well below it)."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]
    probe = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), strategy="best_first", max_depth=1,
                    max_pages=20, respect_robots=False),
        str(tmp_path / "usf_probe"))
    probe.run()
    kids = [r.url for r in probe.pages().orderBy("rank").collect()
            if r.url not in seeds]
    assert kids
    target = kids[0]
    scores = spark.createDataFrame([(target, 1.0)], "url string, score double")
    eng = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), strategy="best_first", max_depth=1,
                    max_pages=20, respect_robots=False, score_threshold=0.99),
        str(tmp_path / "usf_gate"), url_scores=scores)
    eng.run()
    got = [r.url for r in eng.pages().orderBy("rank").collect()]
    assert got == [seeds[0], target]


def test_scores_from_rank_adapter(spark):
    """pagerank/opic output → engine url_scores: max-normalized to
    [0, 1], zero/empty tables degrade to 0.0 instead of dividing."""
    from crawl4ai_spark.operators.linkgraph import scores_from_rank

    ranks = spark.createDataFrame(
        [("a", 0.5), ("b", 0.25), ("c", 0.0)], "url string, rank double")
    out = {r.url: r.score for r in scores_from_rank(ranks).collect()}
    assert out == {"a": 1.0, "b": 0.5, "c": 0.0}
    zeros = spark.createDataFrame([("a", 0.0)], "url string, rank double")
    assert [r.score for r in scores_from_rank(zeros).collect()] == [0.0]


def test_opic_feedback_end_to_end(spark, corpus_dir, tmp_path):
    """The whole graph loop, generation to generation: crawl gen-1,
    build the outlink graph from its OWN fetched pages, run OPIC,
    adapt with scores_from_rank, feed gen-2 — whose best-first order
    must then be non-increasing in logged score within every round."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.linkgraph import opic, scores_from_rank

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]
    g1 = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), strategy="bfs", max_depth=3,
                    max_pages=40, respect_robots=False),
        str(tmp_path / "opic_g1"))
    g1.run()
    links = (
        g1.pages().where(F.col("status") == "fetched")
        .select(F.col("url").alias("src_url"), F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "link")
        .select("src_url", F.col("s.media_ref").alias("dst_url"))
    )
    assert links.count() > 0
    scores = scores_from_rank(opic(links), col="importance")
    g2 = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), strategy="best_first", max_depth=3,
                    max_pages=40, respect_robots=False),
        str(tmp_path / "opic_g2"), url_scores=scores)
    g2.run()
    pg = g2.pages().orderBy("rank").collect()
    assert len(pg) > 3
    by_round: dict[int, list[float]] = {}
    for r in pg:
        by_round.setdefault(r.fetch_round, []).append(r.score)
    for rnd, ss in by_round.items():
        assert ss == sorted(ss, reverse=True), (rnd, ss)
    # the OPIC override actually reached the log: some fetched page
    # carries a score that is NOT a possible link_score output
    # (link_score values are multiples of 0.1 by construction)
    assert any(round(r.score * 10, 6) % 1 != 0 for r in pg)


def test_age_boost_prevents_starvation(spark, tmp_path):
    """Anti-starvation aging: a blacklist-scored (0.3) URL discovered in
    round 1 competes against two endless 0.6-score chains that saturate
    round_size=2 — static best-first priority starves it out of the
    whole 12-page budget; with age_boost its priority grows per waiting
    round and it is fetched within a few rounds. Boosted order stays
    deterministic across runs."""

    def doc(url, *links):
        return (url, [{"kind": "link", "text": f"to {l}", "media_ref": l,
                       "offset": i} for i, l in enumerate(links)])

    h = "https://h.example.com"
    low = f"{h}/login/stuck"          # 'login' -> link_score 0.3
    rows = [doc(f"{h}/p/seed", low, f"{h}/p/a1", f"{h}/p/b1"), doc(low)]
    for c in "ab":
        for i in range(1, 9):
            rows.append(doc(f"{h}/p/{c}{i}", f"{h}/p/{c}{i + 1}"))
        rows.append(doc(f"{h}/p/{c}9"))
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")

    def run(name, boost):
        cfg = CrawlConfig(seeds=[f"{h}/p/seed"], strategy="best_first",
                          max_depth=12, max_pages=12, round_size=2,
                          respect_robots=False, use_ai_agent=True,
                          age_boost=boost)
        eng = CrawlEngine(spark, docs, cfg, str(tmp_path / name))
        eng.run()
        return [r.url for r in eng.pages().orderBy("rank").collect()]

    base = run("ab_base", None)
    assert low not in base          # starved: every round has fresh 0.6s
    boosted = run("ab_boost", 1.0)
    assert low in boosted
    # 0.3 + 1.0*age outranks 0.6 from the second waiting round on
    assert boosted.index(low) <= 6
    assert boosted == run("ab_boost2", 1.0)  # deterministic


def test_politeness_map_ip_key(spark, corpus_dir, tmp_path):
    """Heritrix-style IP politeness: an explicit (host, pkey) map groups
    budgets/debits/windows on the shared key — co-hosted vhosts contend
    for ONE grant — and the engine still reproduces the sequential
    oracle exactly with the same mapping (the ip_politeness query is
    the producer of both the map and the per-IP grants)."""
    from crawl4ai_spark.functions.urls import url_host_py

    docs, robots, _, pydocs, pyrobots, _ = _load(spark, corpus_dir)
    hosts = sorted({url_host_py(u) for u in pydocs})
    # fold the fixture's hosts onto two shared addresses by parity
    pymap = {h: f"10.0.0.{i % 2}" for i, h in enumerate(hosts)}
    pybudgets = {"10.0.0.0": 3, "10.0.0.1": 4}
    pmap = spark.createDataFrame(list(pymap.items()), "host string, pkey string")
    budgets = spark.createDataFrame(list(pybudgets.items()),
                                    "host string, budget int")
    for salts, name in ((1, "ipkey"), (4, "ipsalt")):
        cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                          max_depth=3, max_pages=40, politeness=True,
                          politeness_salts=salts)
        eng = CrawlEngine(spark, docs, cfg, str(tmp_path / name),
                          robots=robots, host_budgets=budgets,
                          politeness_map=pmap)
        eng.run()
        got = [(r.rank, r.url, r.depth, r.status, r.title)
               for r in eng.pages().orderBy("rank").collect()]
        o = run_oracle(pydocs, cfg, robots=pyrobots, budgets=pybudgets,
                       politeness_map=pymap)
        want = [(p["rank"], p["url"], p["depth"], p["status"], p["title"])
                for p in o.pages]
        assert got == want and got
        assert ({(r.url, r.state) for r in eng.url_seen().collect()}
                == set(o.seen.items()))
        if salts == 1:
            # the shared cap binds per ADDRESS: no round dispatches more
            # than the IP's budget across all of its vhosts together
            per = {}
            for r in eng.pages().collect():
                k = (r.fetch_round, pymap[url_host_py(r.url)])
                per[k] = per.get(k, 0) + 1
            assert per and max(per.values()) <= max(pybudgets.values())
            for (_, ip), n in per.items():
                assert n <= pybudgets[ip], (ip, n)

    # pooling: with EVERY host folded to one address (budget 3), the
    # single shared grant caps the whole crawl per round — the IP twin
    # of the domain test's example.com fold
    one = {h: "10.9.9.9" for h in hosts}
    cfg1 = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                       max_depth=3, max_pages=40, politeness=True)
    eng1 = CrawlEngine(
        spark, docs, cfg1, str(tmp_path / "ipone"), robots=robots,
        host_budgets=spark.createDataFrame([("10.9.9.9", 3)],
                                           "host string, budget int"),
        politeness_map=spark.createDataFrame(list(one.items()),
                                             "host string, pkey string"))
    eng1.run()
    o1 = run_oracle(pydocs, cfg1, robots=pyrobots,
                    budgets={"10.9.9.9": 3}, politeness_map=one)
    got1 = [(r.rank, r.url) for r in eng1.pages().orderBy("rank").collect()]
    assert got1 == [(p["rank"], p["url"]) for p in o1.pages] and got1
    rounds: dict[int, int] = {}
    for r in eng1.pages().collect():
        rounds[r.fetch_round] = rounds.get(r.fetch_round, 0) + 1
    total = sum(rounds.values())
    assert max(rounds.values()) <= 3 and total > 3
    assert len(rounds) >= -(-total // 3)


def test_politeness_map_budget_rollup_and_validation(spark, corpus_dir, tmp_path):
    """Host-keyed budgets fold to the mapped key with min() (the
    conservative member paces the address, mirroring domain mode);
    combining politeness_map with politeness_key='domain' fails loudly."""
    import pytest as _pt

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    pmap = spark.createDataFrame(
        [("host1.example.com", "10.1.1.1"), ("host2.example.com", "10.1.1.1")],
        "host string, pkey string")
    budgets = spark.createDataFrame(
        [("host1.example.com", 7), ("host2.example.com", 3),
         ("elsewhere.example.org", 9)],
        "host string, budget int")
    cfg = CrawlConfig(seeds=["https://host1.example.com/"], politeness=True,
                      max_pages=1)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "rollup"),
                      host_budgets=budgets, politeness_map=pmap)
    got = {r.host: r.budget for r in eng.host_budgets.collect()}
    assert got == {"10.1.1.1": 3, "elsewhere.example.org": 9}
    with _pt.raises(ValueError, match="politeness_map"):
        CrawlEngine(spark, docs,
                    CrawlConfig(seeds=["https://host1.example.com/"],
                                politeness=True, politeness_key="domain"),
                    str(tmp_path / "badmap"), host_budgets=budgets,
                    politeness_map=pmap)
