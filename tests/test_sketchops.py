"""Semantic invariants for the mergeable-sketch tier (queries/sketchops.py).

The DuckDB oracles prove cross-engine equality; these pin the *meaning*
against independent pure-Python sketch reimplementations over the same
hash stream (functions.hashing.h60_py), plus the properties that make
each sketch usable operationally: HLL error inside its analytic bound
and estimator branch agreement, KMV union/Jaccard against a plain
bottom-k fold, CMS's strictly one-sided error.
"""

from __future__ import annotations

import math

import duckdb

from crawl4ai_spark.functions.hashing import h60_py
from crawl4ai_spark.functions.urls import canonicalize_py
from crawl4ai_spark.queries import sketchops as K

SF = "/root/testdata/sf0.001"


def _doc_ids() -> list[int]:
    return [
        r[0]
        for r in duckdb.sql(
            f"select doc_id::BIGINT from '{SF}/documents.parquet'"
        ).fetchall()
    ]


def _universe_hashes() -> list[int]:
    """The HLL universe: distinct canonical URLs of the 3 messy variants."""
    urls = set()
    for i in _doc_ids():
        for raw in (
            f"https://host{i % 7}.example.com/p/{i}",
            f"HTTPS://HOST{i % 7}.EXAMPLE.COM/p/{i}#sec",
            f"https://host{i % 7}.example.com:443/p/{i}?z=1&a=2",
        ):
            urls.add(canonicalize_py(raw))
    return [h60_py(u) for u in urls]


def _hll_est(hashes: list[int]) -> tuple[int, int, float]:
    """Python HLL twin: (v_zero, s_fixed, est) from a hash stream."""
    regs: dict[int, int] = {}
    for h in hashes:
        idx = h >> K.HLL_W
        v = h & (K.HLL_POW_W - 1)
        rho = K.HLL_W + 1 if v == 0 else K.HLL_W + 1 - v.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    v_zero = K.HLL_M - len(regs)
    s_fixed = sum(1 << (K.HLL_W - m) for m in regs.values()) + v_zero * K.HLL_POW_W
    raw = K.HLL_C / s_fixed
    est = K.HLL_LC[v_zero] if (raw <= K.HLL_LC_CUT and v_zero > 0) else raw
    return v_zero, s_fixed, round(est, 2)


def test_hll_matches_python_twin_and_error_bound(spark):
    rows = {r.shard: r for r in K.q_seen_cardinality_hll(spark, SF).collect()}
    hashes = _universe_hashes()
    # global row == Python twin over the full stream
    g = rows[-1]
    v_zero, s_fixed, est = _hll_est(hashes)
    assert (g.v_zero, g.s_fixed, g.est) == (v_zero, s_fixed, est)
    assert g.n_exact == len(hashes)
    # every shard row == Python twin over its shard's sub-stream
    for shard in range(K.N_SHARDS):
        sub = [h for h in hashes if h % K.N_SHARDS == shard]
        if shard not in rows:
            assert not sub
            continue
        r = rows[shard]
        assert (r.v_zero, r.s_fixed, r.est) == _hll_est(sub)
        assert r.n_exact == len(sub)
    # HLL error bound: 1.04/sqrt(m) sigma — allow 4 sigma
    tol = 4 * 1.04 / math.sqrt(K.HLL_M) * 100
    for r in rows.values():
        assert abs(r.rel_err_pct) <= tol, (r.shard, r.rel_err_pct)


def test_hll_merge_is_registerwise_max(spark):
    """The global sketch state must be exactly the shard states' merge —
    the property that makes per-round incremental maintenance free."""
    hashes = _universe_hashes()
    merged: dict[int, int] = {}
    for shard in range(K.N_SHARDS):
        sub = [h for h in hashes if h % K.N_SHARDS == shard]
        for h in sub:
            idx = h >> K.HLL_W
            v = h & (K.HLL_POW_W - 1)
            rho = K.HLL_W + 1 if v == 0 else K.HLL_W + 1 - v.bit_length()
            merged[idx] = max(merged.get(idx, 0), rho)
    v_zero = K.HLL_M - len(merged)
    s_fixed = sum(1 << (K.HLL_W - m) for m in merged.values()) + v_zero * K.HLL_POW_W
    g = {r.shard: r for r in K.q_seen_cardinality_hll(spark, SF).collect()}[-1]
    assert (g.v_zero, g.s_fixed) == (v_zero, s_fixed)


def test_kmv_matches_python_bottom_k(spark):
    r = K.q_url_overlap_kmv(spark, SF).collect()[0]
    ids = _doc_ids()
    ha = sorted(
        h60_py(f"https://host{i % 7}.example.com/p/{i}") for i in ids if i % 13
    )
    hb = sorted(
        h60_py(f"https://host{i % 7}.example.com/p/{i}") for i in ids if i % 17
    )
    ka, kb = ha[: K.KMV_K], hb[: K.KMV_K]
    ku = sorted(set(ka) | set(kb))[: K.KMV_K]
    n_u, kth = len(ku), max(ku)
    matches = sum(1 for h in ku if h in set(ka) and h in set(kb))
    est_union = (
        float(n_u) if n_u < K.KMV_K else (K.KMV_K - 1) * K.KMV_RANGE / kth
    )
    assert r.k == K.KMV_K
    assert (r.n_a, r.n_b) == (len(ha), len(hb))
    assert r.kth_min == kth
    assert r.est_union == round(est_union, 2)
    assert r.est_jaccard == round(matches / n_u, 6)
    # exact twins
    inter = len(set(ha) & set(hb))
    union = len(set(ha) | set(hb))
    assert (r.n_inter, r.n_union) == (inter, union)
    assert r.exact_jaccard == round(inter / union, 6)
    # estimates actually informative: jaccard error under 0.2 absolute,
    # union error under 35% (k=128 → sigma ~ 1/sqrt(128) ~ 8.8%)
    assert abs(r.est_jaccard - r.exact_jaccard) <= 0.2
    if r.n_union >= K.KMV_K:
        assert abs(r.err_union_pct) <= 35.0


def test_cms_error_is_one_sided_and_bounded(spark):
    rows = K.q_template_heavy_hitters(spark, SF).collect()
    assert rows
    total = sum(r.n_exact for r in rows)
    for r in rows:
        # the Count-Min guarantee: never an undercount
        assert r.cms_est >= r.n_exact, r.template
        assert r.overcount == r.cms_est - r.n_exact
        # standard bound: overcount <= 2N/w with prob 1-2^-d; allow 4x slack
        assert r.overcount <= max(8, 8 * total // K.CMS_W), r.template
    # sketch is useful: exact top-1 template is also the CMS top-1
    by_exact = max(rows, key=lambda r: (r.n_exact, r.template))
    by_est = max(rows, key=lambda r: (r.cms_est, r.template))
    assert by_exact.n_exact <= by_est.cms_est


def test_cms_counter_matches_python_twin(spark):
    """Counter placement pins to the affine-permutation definition."""
    rows = K.q_template_heavy_hitters(spark, SF).collect()
    # recompute every template's CMS estimate in Python
    counts: dict[str, int] = {}
    for i, src in duckdb.sql(
        f"select doc_id::BIGINT, source from '{SF}/documents.parquet'"
    ).fetchall():
        t = f"host{i % 7}.example.com/{src}/N"
        counts[t] = counts.get(t, 0) + 1
    counters: dict[tuple[int, int], int] = {}
    for t, n in counts.items():
        hm = h60_py(t) % K.MERSENNE31
        for i, (a, b) in enumerate(K.CMS_AB):
            col = ((a * hm + b) % K.MERSENNE31) % K.CMS_W
            counters[(i, col)] = counters.get((i, col), 0) + n
    for r in rows:
        hm = h60_py(r.template) % K.MERSENNE31
        est = min(
            counters[(i, ((a * hm + b) % K.MERSENNE31) % K.CMS_W)]
            for i, (a, b) in enumerate(K.CMS_AB)
        )
        assert r.cms_est == est, r.template
        assert r.n_exact == counts[r.template]


def test_shard_rebalance_hrw_beats_modulo(spark):
    rows = {r.scheme: r for r in K.q_shard_rebalance(spark, SF).collect()}
    hrw, mod = rows["hrw"], rows["mod"]
    assert hrw.n_urls == mod.n_urls > 0
    # HRW moves ~ (N2-N1)/N2 = 1/3 of keys; modulo ~ 2/3. The gap is the
    # whole point — allow generous slack at small n.
    assert hrw.n_moved < mod.n_moved
    assert hrw.moved_pct <= 50.0
    assert mod.moved_pct >= 50.0
    # python twin: HRW assignment is argmax of h60(url#shard), min shard on ties
    ids = _doc_ids()
    moved = 0
    for i in ids:
        u = f"https://host{i % 7}.example.com/p/{i}"
        s1 = max(range(K.HRW_N1), key=lambda s: (h60_py(f"{u}#{s}"), -s))
        s2 = max(range(K.HRW_N2), key=lambda s: (h60_py(f"{u}#{s}"), -s))
        moved += s1 != s2
        # growing the shard set never moves a key BETWEEN old shards:
        # it only moves to a NEW shard (the HRW stability property)
        if s1 != s2:
            assert s2 >= K.HRW_N1, (u, s1, s2)
    assert hrw.n_moved == moved
