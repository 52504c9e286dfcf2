"""Semantic invariants for the crawl-scheduling tier (queries/schedops.py).

The DuckDB oracles prove cross-engine equality; these pin the *meaning*:
the trap detector flags exactly the parameter-rich dominant template,
recrawl priorities match a plain-Python Poisson-surrogate fold, and
budget allocation conserves/clamps as specified.
"""

from __future__ import annotations

import math

from crawl4ai_spark.queries import schedops as S

SF = "/root/testdata/sf0.001"


def test_traps_flag_calendar_only(spark):
    rows = S.q_crawl_traps(spark, SF).collect()
    assert rows
    by_tpl = {}
    for r in rows:
        by_tpl.setdefault(r.template, []).append(r)
    # the calendar class (two numeric params, half the universe) is a trap
    # on every host; every other template never is
    assert "/cal/{d}/{d}" in by_tpl
    for r in by_tpl["/cal/{d}/{d}"]:
        assert r.is_trap and r.n_params == 2 and r.share >= S.TRAP_MIN_SHARE
    for tpl, rs in by_tpl.items():
        if tpl == "/cal/{d}/{d}":
            continue
        assert all(not r.is_trap for r in rs), tpl
    # hex session tokens template to {h}, not 12 copies of {d}
    assert "/session/{h}" in by_tpl
    # share sums to ~1 per host
    hosts = {}
    for r in rows:
        hosts.setdefault(r.host, 0)
        hosts[r.host] += r.n_urls
    for r in rows:
        assert r.host_total == hosts[r.host]


def test_recrawl_matches_python_fold(spark):
    import duckdb

    obs = duckdb.sql(
        f"""select user_id, floor(epoch(ts))::BIGINT ts_s,
            (event_type = 'click')::INT c
            from '{SF}/events.parquet'"""
    ).fetchall()
    per = {}
    now_s = max(t for _, t, _ in obs)
    for u, t, c in obs:
        n, ch, last = per.get(u, (0, 0, 0))
        per[u] = (n + 1, ch + c, max(last, t))
    got = {r.url: r for r in S.q_recrawl_schedule(spark, SF).collect()}
    assert len(got) == len(per)
    for u, (n, ch, last) in per.items():
        r = got[f"https://host{u % 7}.example.com/p/{u}"]
        assert (r.n_obs, r.n_changed, r.staleness_s) == (n, ch, now_s - last)
        prio = (ch / n) * ((now_s - last) / 3600.0)
        assert math.isclose(r.priority, round(prio, 6), abs_tol=1e-9)
        want = "hot" if prio >= S.HOT_MIN else ("warm" if prio >= S.WARM_MIN else "cold")
        assert r.bucket == want


def test_budget_alloc_clamps_and_salts(spark):
    rows = S.q_host_budget_alloc(spark, SF).collect()
    assert len(rows) == 7
    total_yield = sum(r.yield_docs for r in rows)
    for r in rows:
        raw = (S.TOTAL_BUDGET * r.yield_docs) // total_yield
        assert r.budget == max(S.BUDGET_MIN, min(S.BUDGET_MAX, raw))
        assert r.salts == -(-r.budget // S.PER_SALT)  # ceil
        assert r.salts >= 1
    # un-clamped grants can never exceed the global budget
    assert sum(
        (S.TOTAL_BUDGET * r.yield_docs) // total_yield for r in rows
    ) <= S.TOTAL_BUDGET


def test_yield_budget_feedback_loop(spark, corpus_dir, tmp_path):
    """crawl → host_budgets_from_yield → politeness crawl: the second
    crawl's per-(host, round) grants never exceed the allocated budget."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.operators.frontier import CrawlEngine
    from crawl4ai_spark.queries.schedops import host_budgets_from_yield
    from tests.test_crawl import get_seeds

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]
    probe = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), max_pages=None, max_depth=3, max_rounds=30),
        str(tmp_path / "probe"))
    probe.run()
    budgets = host_budgets_from_yield(probe.pages(), total_budget=12,
                                      budget_min=2, budget_max=6)
    rows = {r.host: r for r in budgets.collect()}
    assert rows
    total_yield = sum(r.yield_docs for r in rows.values())
    for r in rows.values():
        assert r.budget == max(2, min(6, (12 * r.yield_docs) // total_yield))

    eng = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), max_pages=None, max_depth=3,
                    max_rounds=30, politeness=True),
        str(tmp_path / "budgeted"), host_budgets=budgets)
    eng.run()
    from pyspark.sql import functions as F

    grants = (eng.pages().groupBy("host", "fetch_round").count()
              .join(budgets.select("host", "budget"), "host", "left").collect())
    assert grants
    for g in grants:
        if g.budget is not None:
            assert g["count"] <= g.budget, (g.host, g.fetch_round)


def test_snapshot_diff_status_rules(spark):
    """The diff statuses follow the generation membership dice exactly:
    added ⇔ only-in-B (doc_id%13==0, %17!=0), removed ⇔ only-in-A,
    changed ⇔ in both with the mutated-content die (%10<3)."""
    from crawl4ai_spark.queries.schedops import q_host_change_rates, q_snapshot_diff

    SF = "/root/testdata/sf0.001"
    rows = q_snapshot_diff(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        i = int(r.url.rsplit("/", 1)[1])
        assert i not in seen
        seen.add(i)
        in_a, in_b = i % 13 != 0, i % 17 != 0
        if not in_a and in_b:
            want = "added"
        elif in_a and not in_b:
            want = "removed"
        elif i % 10 < 3:
            want = "changed"
        else:
            want = "stable"
        assert r.status == want, (i, r.status, want)
        assert r.host == f"host{i % 7}.example.com"
    # every document appears exactly once unless absent from both gens
    statuses = {r.status for r in rows}
    assert statuses == {"added", "removed", "changed", "stable"}

    hr = {r.host: r for r in q_host_change_rates(spark, SF).collect()}
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r.status)
    assert set(hr) == set(by_host)
    for h, sts in by_host.items():
        r = hr[h]
        assert r.n_urls == len(sts)
        assert r.n_added == sts.count("added")
        assert r.n_removed == sts.count("removed")
        assert r.n_changed == sts.count("changed")
        assert r.n_stable == sts.count("stable")
        assert r.n_urls == r.n_added + r.n_removed + r.n_changed + r.n_stable
        assert r.churn == round((r.n_urls - r.n_stable) / r.n_urls, 6)


def test_error_budget_feedback_loop(spark, corpus_dir, tmp_path):
    """crawl-with-retries → host_budgets_from_errors → politeness crawl:
    budgets decay by each host's observed transient rate (exact integer
    formula) and the decayed budgets bind the next run's grants."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.operators.frontier import CrawlEngine
    from crawl4ai_spark.queries.schedops import host_budgets_from_errors
    from tests.test_crawl import get_seeds

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]
    probe = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), max_pages=None, max_depth=3,
                    max_rounds=30, max_retries=2, retry_failure_every=7),
        str(tmp_path / "errprobe"))
    probe.run()
    pages = probe.pages()
    base = pages.select("host").distinct().selectExpr(
        "host", "cast(10 as long) as budget")
    # a base host the probe never attempted must keep its base budget
    base = base.union(probe.spark.createDataFrame(
        [("unattempted.example.net", 10)], "host string, budget long"))
    budgets = host_budgets_from_errors(pages, base, err_cap_pct=80)
    rows = {r.host: r for r in budgets.collect()}
    assert rows
    assert any(r.n_transient > 0 for r in rows.values()), "no transients probed"
    cold = rows["unattempted.example.net"]
    assert (cold.n_attempts, cold.err_pct, cold.budget) == (0, 0, 10)
    for r in rows.values():
        ep = 0 if r.n_attempts == 0 else (100 * r.n_transient) // r.n_attempts
        assert r.err_pct == ep
        assert r.budget == max(1, (10 * (100 - min(ep, 80))) // 100)

    eng = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), max_pages=None, max_depth=3,
                    max_rounds=30, politeness=True),
        str(tmp_path / "errbudgeted"), host_budgets=budgets)
    eng.run()
    grants = (eng.pages().groupBy("host", "fetch_round").count()
              .join(budgets.select("host", "budget"), "host", "left").collect())
    assert grants
    for g in grants:
        if g.budget is not None:
            assert g["count"] <= g.budget, (g.host, g.fetch_round)


def test_poisson_revisit_semantics(spark):
    """Estimator invariants: X=0 → λ=0 → capped interval; λ strictly
    increases with X at fixed (n, poll interval) and stays finite at
    X=n (the +0.5 correction); revisit interval decreases as λ grows
    and never exceeds the cap."""
    import math

    from crawl4ai_spark.queries.schedops import (
        REVISIT_CAP_H, REVISIT_TARGET_C, q_poisson_revisit)

    rows = q_poisson_revisit(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_key = {}
    for r in rows:
        assert 0.0 < r.revisit_h <= REVISIT_CAP_H
        if r.n_changed == 0:
            assert r.lambda_per_h == 0.0 and r.revisit_h == REVISIT_CAP_H
        else:
            # closed-form check against the paper's estimator
            lam = -math.log((r.n_polls - r.n_changed + 0.5)
                            / (r.n_polls + 0.5)) / r.interval_h
            assert abs(r.lambda_per_h - lam) < 1e-6
            assert abs(r.revisit_h
                       - min(REVISIT_CAP_H, REVISIT_TARGET_C / r.lambda_per_h)) < 1e-4
        by_key.setdefault((r.n_polls, r.interval_h), []).append(r)
    monotone_checked = 0
    for grp in by_key.values():
        grp.sort(key=lambda r: r.n_changed)
        for a, b in zip(grp, grp[1:]):
            if a.n_changed < b.n_changed:
                assert a.lambda_per_h < b.lambda_per_h
                assert a.revisit_h >= b.revisit_h
                monotone_checked += 1
    assert monotone_checked > 0


def test_host_skew_stats_semantics(spark):
    """Shares sum to 1, the salting plan is exact ceil-division, and
    exactly the 50%-mass host is flagged hot."""
    from crawl4ai_spark.queries.schedops import (SKEW_HOT_SHARE,
                                                 SKEW_PER_SALT,
                                                 q_host_skew_stats)

    rows = q_host_skew_stats(spark, SF).collect()
    total = sum(r.n_urls for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r.n_salts == -(-r.n_urls // SKEW_PER_SALT)  # ceil
        assert r.is_hot == (r.n_urls / total > SKEW_HOT_SHARE)
    assert [r.host for r in rows if r.is_hot] == ["h0"]


def test_seen_shard_fp_semantics(spark):
    """Bloom accounting: loads cover the corpus exactly once, fp is the
    closed form of the fill, over_budget matches the SLO, and the split
    factor restores <= optimal capacity per shard."""
    import math

    from crawl4ai_spark.queries.schedops import (SEEN_FP_BUDGET, SEEN_K,
                                                 SEEN_M_BITS, SEEN_N_OPT,
                                                 q_seen_shard_fp)

    sf = "/root/testdata/sf0.01"  # 500 docs: enough to stress shards
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    rows = q_seen_shard_fp(spark, sf).collect()
    assert sum(r.n_urls for r in rows) == n_docs  # each URL in exactly one shard
    for r in rows:
        fill = 1.0 - (1.0 - 1.0 / SEEN_M_BITS) ** (SEEN_K * r.n_urls)
        assert abs(r.fill_ratio - fill) < 1e-6
        assert abs(r.fp_rate - fill ** SEEN_K) < 1e-6
        assert r.over_budget == (r.fp_rate > SEEN_FP_BUDGET)
        assert r.shards_needed == -(-r.n_urls // SEEN_N_OPT)
        assert -(-r.n_urls // r.shards_needed) <= SEEN_N_OPT
    # the sf corpus must exercise both sides of the budget
    assert {r.over_budget for r in rows} == {True, False}


def test_revisit_value_semantics(spark):
    rows = S.q_revisit_value(spark, SF).collect()
    assert rows
    by_host = {}
    for r in rows:
        # value = importance × change probability, both factors pinned
        p = round(1.0 - math.exp(-(r.lambda_per_h * S.REVISIT_HORIZON_H)), 9)
        assert abs(r.p_change - p) < 1e-9
        assert abs(r.value - round((1 + r.n_inlinks) * p, 9)) < 1e-9
        assert r.n_inlinks >= 0
        by_host.setdefault(r.host, []).append(r)
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r.slot)
        # slots are a 1..n permutation ordered by (value desc, url asc)
        assert [r.slot for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a.value, b.url) > (b.value, a.url) or (
                a.value == b.value and a.url < b.url) or a.value > b.value
        # exactly min(SLOTS, n) winners, and they are the top slots
        want = min(S.REVISIT_SLOTS, len(rs))
        assert sum(r.selected for r in rs) == want
        assert all(r.selected == (r.slot <= S.REVISIT_SLOTS) for r in rs)


def test_ip_politeness_never_overgrants(spark):
    rows = S.q_ip_politeness(spark, SF).collect()
    assert rows
    per_ip = {}
    for r in rows:
        per_ip.setdefault(r.ip, []).append(r)
    # vhosts pack 21 hosts onto 6 addresses
    assert len(per_ip) == S.IP_N_ADDRS and len(rows) == S.IP_N_HOSTS
    for ip, rs in per_ip.items():
        req_total = sum(r.host_req for r in rs)
        assert all(r.ip_req_total == req_total for r in rs)
        granted = sum(r.granted for r in rs)
        if req_total > S.IP_ROUND_CAP:
            assert all(r.capped for r in rs)
            # the cap binds: never over-grant, floor-div never zeroes a
            # host whose proportional share is ≥ 1
            assert granted <= S.IP_ROUND_CAP
            for r in rs:
                assert r.granted == (S.IP_ROUND_CAP * r.host_req) // req_total
        else:
            assert all(not r.capped and r.granted == r.host_req for r in rs)


def test_harvest_rate_curve(spark):
    rows = sorted(S.q_harvest_rate(spark, SF).collect(),
                  key=lambda r: -r.band)
    assert len(rows) == S.HARVEST_BANDS
    # cumulative columns fold correctly in band-desc (crawl) order
    cf = cr = 0
    for r in rows:
        cf += r.fetched
        cr += r.n_relevant
        assert (r.cum_fetched, r.cum_relevant) == (cf, cr)
        assert abs(r.harvest - round(cr / cf, 9)) < 1e-9
    # the die makes P(rel|band) increase with band, so the harvest
    # curve declines as the crawl digs into lower bands
    assert rows[0].harvest > rows[-1].harvest
    # per-band relevance matches the die exactly
    for r in rows:
        n_rel = sum(1 for d in range(7) if r.band * 2 + d >= 9) / 7
        assert abs(r.n_relevant / r.fetched - n_rel) < 0.2


def test_refresh_policy_uniform_beats_proportional(spark):
    rows = {r.policy: r for r in S.q_refresh_policy_compare(spark, SF).collect()}
    assert set(rows) == {"uniform", "proportional"}
    uni, pro = rows["uniform"], rows["proportional"]
    assert uni.n_pages == pro.n_pages > 0
    # the Cho–GM TODS'03 result: at equal total budget, uniform refresh
    # yields strictly higher corpus freshness than λ-proportional
    assert uni.freshness > pro.freshness
    assert 0.0 < pro.freshness < uni.freshness <= 1.0
    # python surrogate fold pins the uniform number exactly
    import duckdb
    lams = [r[0] for r in duckdb.sql(
        f"""select round(-ln((n - x + 0.5) / (n + 0.5)) / i, 9) from (
            select (4 + doc_id % 13)::BIGINT n,
                   (doc_id % (4 + doc_id % 13 + 1))::BIGINT x,
                   (1 + doc_id % 5)::DOUBLE i
            from '{SF}/documents.parquet')""").fetchall()]
    f = S.REFRESH_RATE_PER_PAGE
    s = sum(int(round(
        (1.0 if lam <= 0 else (f / lam) * (1.0 - math.exp(-(lam / f))))
        * S._FRESH_SCALE)) for lam in lams)
    assert uni.freshness == round(s / (len(lams) * S._FRESH_SCALE), 9)


def test_frontier_novelty_semantics(spark):
    rows = S.q_frontier_novelty(spark, SF).collect()
    assert rows and len(rows) <= 7
    for r in rows:
        assert 0 <= r.n_new <= r.n_out
        assert abs(r.novelty - round(r.n_new / r.n_out, 9)) < 1e-9
        assert r.saturated == (r.n_new / r.n_out < S.NOVELTY_FLOOR)
    # the synthetic universe is target-sparse: most outlinks dangle, so
    # no host reads as saturated mid-crawl
    assert any(not r.saturated for r in rows)


def test_novelty_budget_feedback_loop(spark, corpus_dir, tmp_path):
    """crawl → host_budgets_from_novelty: a converged crawl (every
    outlink already seen) decays budgets to the floor; an early-stage
    crawl (1 round) keeps more of the base. Hosts with no outlink
    evidence keep their base budget."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.operators.frontier import CrawlEngine
    from crawl4ai_spark.queries.schedops import host_budgets_from_novelty
    from tests.test_crawl import get_seeds

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]

    cfg = CrawlConfig(seeds=list(seeds), max_pages=None, max_depth=50,
                      max_rounds=80)
    full = CrawlEngine(spark, docs, cfg, str(tmp_path / "full"))
    full.run()
    base = (full.pages().select("host").distinct()
            .withColumn("budget", F.lit(10)))

    out_full = {r.host: r for r in host_budgets_from_novelty(
        full.pages(), full.frontier_tbl.read(spark), base, cfg=cfg).collect()}
    assert out_full
    for r in out_full.values():
        assert 0 <= r.n_new <= r.n_out
        if r.n_out == 0:
            # no evidence keeps the base budget
            assert r.novelty_pct == 100 and r.budget == 10
        else:
            want = max(1, (10 * max(r.novelty_pct, 20)) // 100)
            assert r.budget == want
    # a drained crawl re-extracted known URLs round after round:
    # discovery-per-extraction collapses well under fresh-crawl levels
    # and the budget follows the exact integer formula
    evid = [r for r in out_full.values() if r.n_out > 0]
    assert evid
    for r in evid:
        assert 0 <= r.n_new <= r.n_out
        assert r.novelty_pct == (100 * r.n_new) // r.n_out
        assert r.budget == max(1, (10 * max(r.novelty_pct, 20)) // 100)
        assert r.novelty_pct < 80

    ecfg = CrawlConfig(seeds=list(seeds), max_pages=None, max_depth=50,
                       max_rounds=1)
    early = CrawlEngine(spark, docs, ecfg, str(tmp_path / "early"))
    early.run()
    out_early = host_budgets_from_novelty(
        early.pages(), early.frontier_tbl.read(spark), base, cfg=ecfg).collect()
    ev = [r for r in out_early if r.n_out > 0]
    # a 1-round crawl's every distinct extraction IS a first discovery:
    # novelty 100, base budget kept — and strictly above the drained run
    assert ev and all(r.novelty_pct == 100 and r.budget == 10 for r in ev)
    drained = {r.host: r.novelty_pct for r in evid}
    assert all(r.novelty_pct > drained.get(r.host, 0) for r in ev)


def test_ip_politeness_inputs_close_the_loop(spark, corpus_dir, tmp_path):
    """ip_politeness → ip_politeness_inputs → CrawlEngine(politeness_map,
    host_budgets): the IP rollup's map + per-address budgets drive a real
    crawl that still matches the sequential oracle exactly, and every
    round's dispatch per address stays under its budget."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.functions.urls import url_host_py
    from crawl4ai_spark.operators.frontier import CrawlEngine
    from crawl4ai_spark.oracle import load_docs_pandas, run_oracle
    from tests.test_crawl import get_seeds

    granted = S.q_ip_politeness(spark, SF)
    pmap, budgets = S.ip_politeness_inputs(granted)
    # adapter invariants: one map row per host; budget = min(cap, total)
    g = granted.collect()
    assert pmap.count() == len({r.host for r in g})
    bmap = {r.host: r.budget for r in budgets.collect()}
    for r in g:
        assert bmap[r.ip] == min(S.IP_ROUND_CAP, r.ip_req_total)

    # drive the engine with the adapter outputs over the fixture corpus
    # (fixture hosts hostK.example.com, K<12, overlap the rollup's
    # host0..20 universe — mapped hosts pool per address, any unmapped
    # host keys on itself)
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    pydocs = load_docs_pandas(f"{corpus_dir}/documents.parquet")
    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                      max_depth=3, max_pages=40, politeness=True)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / "iploop"),
                      host_budgets=budgets, politeness_map=pmap)
    eng.run()
    pymap = {r.host: r.pkey for r in pmap.collect()}
    o = run_oracle(pydocs, cfg, budgets=bmap, politeness_map=pymap)
    got = [(r.rank, r.url) for r in eng.pages().orderBy("rank").collect()]
    assert got == [(p["rank"], p["url"]) for p in o.pages] and got
    per = {}
    for r in eng.pages().collect():
        h = url_host_py(r.url)
        per.setdefault((r.fetch_round, pymap.get(h, h)), 0)
        per[(r.fetch_round, pymap.get(h, h))] += 1
    for (_, key), n in per.items():
        assert n <= bmap.get(key, 10**9), (key, n)


def test_host_lang_profile_shares_and_dominance(spark):
    """Per-host language mix: shares sum to 1 per host, every host has
    at least one dominant row, dominance = max doc count with the
    lexicographically-smallest language breaking ties."""
    from crawl4ai_spark.queries.schedops import q_host_lang_profile

    rows = q_host_lang_profile(spark, "/root/testdata/sf0.001").collect()
    assert rows
    hosts = {}
    for r in rows:
        hosts.setdefault(r.host, []).append(r)
    for host, rs in hosts.items():
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-6
        assert all(r.host_docs == sum(x.n_docs for x in rs) for r in rs)
        top = max(r.n_docs for r in rs)
        dom = min(r.lang for r in rs if r.n_docs == top)
        for r in rs:
            assert r.is_dominant == (r.lang == dom)


def test_trap_templates_from_frontier_mines_the_log(spark):
    """The engine-side miner flags exactly the parameter-rich dominant
    template from a frontier log shaped like the engine's own: 12
    calendar URLs (/cal/{d}/{d} — 2 params, 75% of the host) flag;
    the article class (1 param) and the other host never do."""
    rows = [("https://h0.example.com/cal/%d/%d" % (2000 + i % 3, 1 + i), "h0.example.com")
            for i in range(12)]
    rows += [("https://h0.example.com/article/%d" % i, "h0.example.com")
             for i in range(4)]
    rows += [("https://h1.example.com/about", "h1.example.com")]
    fr = spark.createDataFrame(rows, "url string, host string")
    got = {(r.host, r.template)
           for r in S.trap_templates_from_frontier(fr).collect()}
    assert got == {("h0.example.com", "/cal/{d}/{d}")}
    # min_urls guard: demand more distinct URLs than the class has
    assert S.trap_templates_from_frontier(fr, min_urls=13).count() == 0


def test_plan_next_generation_composes_all_legs(spark, corpus_dir, tmp_path):
    """The one-call planner: gen-1 crawl → plan → gen-2 engine inputs.
    Budgets equal the hand-chained yield→errors→novelty legs, scores
    equal scores_from_rank(opic(observed edges)), and a gen-2 crawl
    driven by all three inputs respects the composed per-(host, round)
    grant."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.operators.frontier import CrawlEngine
    from crawl4ai_spark.operators.linkgraph import opic, scores_from_rank
    from tests.test_crawl import get_seeds

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)
    cfg1 = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3,
                       max_pages=40, respect_robots=False)
    g1 = CrawlEngine(spark, docs, cfg1, str(tmp_path / "gen1"))
    g1.run()
    pages, frontier = g1.pages(), g1.frontier_tbl.read(spark)

    plan = S.plan_next_generation(
        pages, frontier, cfg1,
        total_budget=6, budget_min=1, budget_max=2, trap_min_urls=2)

    # budgets == the chained legs, computed by hand
    by_yield = S.host_budgets_from_yield(pages, total_budget=6,
                                         budget_min=1, budget_max=2)
    by_err = S.host_budgets_from_errors(
        pages, by_yield.select("host", "budget"))
    want = {r.host: r.budget for r in S.host_budgets_from_novelty(
        pages, frontier, by_err.select("host", "budget"),
        cfg=cfg1).collect()}
    got = {r.host: r.budget for r in plan["host_budgets"].collect()}
    assert got == want and got
    assert all(1 <= b <= 2 for b in got.values())

    # scores == the OPIC adapter over the observed edge list
    edges = (
        pages.where(F.col("status") == "fetched")
        .select(F.col("url").alias("src_url"), F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "link")
        .select("src_url", F.col("s.media_ref").alias("dst_url"))
    )
    want_s = {r.url: r.score
              for r in scores_from_rank(opic(edges), col="importance").collect()}
    got_s = {r.url: r.score for r in plan["url_scores"].collect()}
    assert got_s == want_s and got_s

    # the composed inputs drive a real gen-2 crawl; the grant binds
    cfg2 = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3,
                       max_pages=40, politeness=True, respect_robots=False)
    g2 = CrawlEngine(spark, docs, cfg2, str(tmp_path / "gen2"),
                     host_budgets=plan["host_budgets"],
                     url_scores=plan["url_scores"],
                     trap_templates=plan["trap_templates"])
    g2.run()
    per: dict[tuple, int] = {}
    for r in g2.pages().collect():
        per[(r.fetch_round, r.host)] = per.get((r.fetch_round, r.host), 0) + 1
    for (_, host), n in per.items():
        assert n <= got.get(host, 10**9), (host, n)


def test_host_budgets_from_lang_steers_toward_targets(spark):
    """The fifth control leg: with an es-only target, the es-serving
    host takes the grant share, the en-only host decays to the floor
    (never zero), clamps hold, and an empty target map raises."""
    import pytest

    prof = spark.createDataFrame(
        [("a.com", "es", 0.8), ("a.com", "en", 0.2),
         ("b.com", "en", 1.0),
         ("c.com", "es", 0.5), ("c.com", "fr", 0.5)],
        "host string, lang string, share double")
    out = {r.host: r for r in S.host_budgets_from_lang(
        prof, {"es": 100}, total_budget=100, budget_min=2,
        budget_max=70).collect()}
    assert set(out) == {"a.com", "b.com", "c.com"}
    assert out["b.com"].budget == 2                    # floor, not zero
    assert out["a.com"].budget > out["c.com"].budget   # 0.8 vs 0.5 share
    assert all(2 <= r.budget <= 70 for r in out.values())
    # fixed-point relevance is exact: 0.8e9*100 vs 0.5e9*100
    assert out["a.com"].rel == 80_000_000_000
    assert out["c.com"].rel == 50_000_000_000
    with pytest.raises(ValueError):
        S.host_budgets_from_lang(prof, {})
    # all-zero-weight targets: guard yields floors, no div-by-zero
    zero = {r.host: r.budget for r in S.host_budgets_from_lang(
        prof, {"zz": 1}, total_budget=100, budget_min=2,
        budget_max=70).collect()}
    assert set(zero.values()) == {2}


def test_host_budgets_from_bytes_semantics(spark):
    """Bandwidth-ceiling leg: heavy hosts capped at byte_target //
    avg_bytes, light hosts keep base (a ceiling never raises), hosts
    with no fetched evidence or zero observed bytes keep base, floor 1,
    transient rows excluded from the byte evidence."""
    import pytest

    rows = [
        # heavy: avg 2000 bytes/page -> cap = 10000 // 2000 = 5
        ("heavy.com", "fetched", [("text", "x" * 1000, None, 0)]),
        ("heavy.com", "fetched", [("text", "y" * 3000, None, 0)]),
        # light: avg 10 bytes -> cap 1000, base 100 keeps
        ("light.com", "fetched", [("text", "z" * 10, None, 0)]),
        # zero observed bytes -> no evidence -> keeps base
        ("empty.com", "fetched", [("link", None, "https://a/", 0)]),
        # transient rows never count as byte evidence
        ("flaky.com", "transient", [("text", "w" * 50000, None, 0)]),
    ]
    pages = spark.createDataFrame(
        rows,
        "host string, status string, "
        "spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    base = spark.createDataFrame(
        [("heavy.com", 100), ("light.com", 100), ("empty.com", 100),
         ("flaky.com", 100), ("unseen.com", 7)],
        "host string, budget int",
    )
    got = {r.host: r for r in
           S.host_budgets_from_bytes(pages, base, 10_000).collect()}
    assert got["heavy.com"].budget == 5
    assert got["heavy.com"].avg_bytes == 2000
    assert got["light.com"].budget == 100
    assert got["empty.com"].budget == 100 and got["empty.com"].avg_bytes == 0
    # flaky's only row is transient -> no fetched evidence -> keeps base
    assert got["flaky.com"].budget == 100 and got["flaky.com"].n_fetched == 0
    assert got["unseen.com"].budget == 7      # every base host survives
    # floor: a brutal target still grants 1
    floor = {r.host: r.budget
             for r in S.host_budgets_from_bytes(pages, base, 1).collect()}
    assert floor["heavy.com"] == 1
    with pytest.raises(ValueError):
        S.host_budgets_from_bytes(pages, base, 0)


def test_plan_next_generation_byte_target_chains(spark, corpus_dir, tmp_path):
    """byte_target chains the bandwidth ceiling after the 304 leg: the
    capped plan equals host_budgets_from_bytes applied to the uncapped
    plan's budgets, is pointwise <= it, and stays >= 1."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.operators.frontier import CrawlEngine
    from tests.test_crawl import get_seeds

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)
    cfg = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3,
                      max_pages=40, respect_robots=False)
    g1 = CrawlEngine(spark, docs, cfg, str(tmp_path / "gen1"))
    g1.run()
    pages, frontier = g1.pages(), g1.frontier_tbl.read(spark)

    free = S.plan_next_generation(pages, frontier, cfg, total_budget=40,
                                  budget_min=1, budget_max=20, rank=None,
                                  mine_traps=False)
    capped = S.plan_next_generation(pages, frontier, cfg, total_budget=40,
                                    budget_min=1, budget_max=20, rank=None,
                                    mine_traps=False, byte_target=2_000)
    b_free = {r.host: r.budget for r in free["host_budgets"].collect()}
    b_cap = {r.host: r.budget for r in capped["host_budgets"].collect()}
    assert set(b_free) == set(b_cap) and b_free
    want = {r.host: r.budget for r in S.host_budgets_from_bytes(
        pages, free["host_budgets"], 2_000).collect()}
    assert b_cap == want
    assert all(1 <= b_cap[h] <= b_free[h] for h in b_free)
    # the tiny byte target actually bites somewhere (fixture pages are
    # hundreds of bytes of span text each)
    assert any(b_cap[h] < b_free[h] for h in b_free)


def test_host_budgets_from_bytes_tail_quantile(spark):
    """pctl swaps the mean for the per-host tail: a host serving mostly
    tiny pages plus one huge page gets a much tighter cap keyed on p90
    than on the mean; the quantile is the exact rank-selected element
    (host_payload_quantiles arithmetic)."""
    import pytest

    rows = [("skew.com", "fetched", [("text", "x" * n, None, 0)])
            for n in (10, 10, 10, 1000)]
    pages = spark.createDataFrame(
        rows,
        "host string, status string, "
        "spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    base = spark.createDataFrame([("skew.com", 500)], "host string, budget int")
    mean = {r.host: r for r in
            S.host_budgets_from_bytes(pages, base, 10_000).collect()}
    tail = {r.host: r for r in
            S.host_budgets_from_bytes(pages, base, 10_000, pctl=90).collect()}
    # mean: (10+10+10+1000)//4 = 257 -> cap 10000//257 = 38
    assert mean["skew.com"].avg_bytes == 257
    assert mean["skew.com"].budget == 38
    # p90: rank ceil(0.9*4) = 4 -> 1000 -> cap 10
    assert tail["skew.com"].avg_bytes == 1000
    assert tail["skew.com"].budget == 10
    # p50 of [10,10,10,1000] is the 2nd element = 10 -> cap bound by base
    p50 = {r.host: r for r in
           S.host_budgets_from_bytes(pages, base, 10_000, pctl=50).collect()}
    assert p50["skew.com"].avg_bytes == 10
    assert p50["skew.com"].budget == 500   # 1000-cap clamped by base
    with pytest.raises(ValueError):
        S.host_budgets_from_bytes(pages, base, 10_000, pctl=0)


def test_drain_forecast_semantics(spark):
    import math

    from crawl4ai_spark.queries.schedops import q_drain_forecast

    rows = q_drain_forecast(spark, SF).collect()
    assert len(rows) == 7
    makespan = max(r.rounds_to_drain for r in rows)
    for r in rows:
        assert r.rounds_to_drain == math.ceil(r.pending / r.budget)
        assert r.makespan == makespan
        assert r.is_bottleneck == (r.rounds_to_drain == makespan)
        assert r.spare == r.budget * makespan - r.pending
        # a bottleneck host's spare is bounded by one round's budget
        if r.is_bottleneck:
            assert 0 <= r.spare < r.budget
    assert any(r.is_bottleneck for r in rows)
