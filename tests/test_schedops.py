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
