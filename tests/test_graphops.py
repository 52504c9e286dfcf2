"""Semantic invariants for the link-graph + interleaved tiers
(queries/graphops.py, spansops' media_freq_dedup / seq_pack_interleaved).

The DuckDB oracles prove cross-engine equality; these pin the meaning:
PageRank matches a numpy reference walking the identical order-pinned
trajectory, anchors aggregate deduped + sorted, boilerplate accounting
balances, interleaved packing respects its budget.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from crawl4ai_spark.operators.linkgraph import anchor_aggregate, hits, pagerank
from crawl4ai_spark.queries import graphops as G
from crawl4ai_spark.queries import spansops as S

SF = "/root/testdata/sf0.001"


def _round(x, n):
    """HALF_UP round matching Spark's `round` (BigDecimal.valueOf →
    HALF_UP) and DuckDB's `round` — Python's builtin is half-even and
    diverges by 1 ulp exactly on ties, which random graphs do hit."""
    return float(Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(s, d, f"anchor {s}->{d}") for s, d in edges],
        "src_url string, dst_url string, anchor string",
    )


def _numpy_pagerank(edges, iters=5, d=0.85):
    """Reference PR with the operator's exact contract: per-node fold of
    contributions sorted by source id, round(·, 9) per iteration."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        incoming = {u: [] for u in nodes}
        for s, t in edges:
            incoming[t].append((s, rank[s] / outdeg[s]))
        new = {}
        for u in nodes:
            acc = 0.0
            for _, c in sorted(incoming[u]):
                acc += c
            new[u] = _round((1.0 - d) / n + d * acc, 9)
        rank = new
    return {u: _round(r, 6) for u, r in rank.items()}


def test_pagerank_matches_numpy_reference(spark):
    edges = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("D", "A")]
    got = {r.url: r.rank for r in pagerank(_edges_df(spark, edges)).collect()}
    assert got == _numpy_pagerank(edges)


def test_pagerank_source_only_node_floor(spark):
    # D has no in-links: after iteration 1 its rank is exactly (1-d)/N.
    edges = [("A", "B"), ("B", "A"), ("D", "A")]
    rows = {r.url: r for r in pagerank(_edges_df(spark, edges)).collect()}
    n = len(rows)
    assert rows["D"].rank == _round(_round((1.0 - 0.85) / n, 9), 6)
    assert rows["D"].indeg == 0 and rows["D"].outdeg == 1
    # ranks positive, conserved mass bounded by 1 (dangling mass drops)
    assert all(r.rank > 0 for r in rows.values())
    assert sum(r.rank for r in rows.values()) <= 1.0 + 1e-6


def test_pagerank_cycle_is_uniform(spark):
    # A pure cycle is symmetric: every node keeps exactly 1/N.
    edges = [("A", "B"), ("B", "C"), ("C", "A")]
    got = {r.url: r.rank for r in pagerank(_edges_df(spark, edges)).collect()}
    assert set(got.values()) == {_round(1.0 / 3, 6)}


def _numpy_hits(edges, iters=5):
    """Reference HITS with the operator's exact contract: authority from
    hubs, then hub from the UPDATED authorities, each max-normalized and
    rounded to 9 per iteration; contribution sums fold in sorted order
    of the contributing endpoint."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    hub = {u: 1.0 for u in nodes}
    auth = {}
    for _ in range(iters):
        raw = {u: 0.0 for u in nodes}
        for u in nodes:
            acc = 0.0
            for s, _ in sorted((s, t) for s, t in edges if t == u):
                acc += hub[s]
            raw[u] = acc
        mx = max(raw.values())
        auth = {u: _round(raw[u] / mx, 9) for u in nodes}
        raw = {u: 0.0 for u in nodes}
        for u in nodes:
            acc = 0.0
            # fold ordered by the contributing endpoint (dst)
            for t in sorted(t for s, t in edges if s == u):
                acc += auth[t]
            raw[u] = acc
        mx = max(raw.values())
        hub = {u: _round(raw[u] / mx, 9) for u in nodes}
    return ({u: _round(v, 6) for u, v in auth.items()},
            {u: _round(v, 6) for u, v in hub.items()})


def test_hits_matches_numpy_reference(spark):
    edges = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"), ("D", "A"),
             ("D", "C")]
    rows = {r.url: r for r in hits(_edges_df(spark, edges)).collect()}
    ref_auth, ref_hub = _numpy_hits(edges)
    assert {u: r.authority for u, r in rows.items()} == ref_auth
    assert {u: r.hub for u, r in rows.items()} == ref_hub
    # D is a pure source: best hub candidate, zero authority
    assert rows["D"].authority == 0.0
    assert rows["D"].indeg == 0 and rows["D"].outdeg == 2


def test_pagerank_empty_graph_and_hits_zero_iters(spark):
    """Boundary contracts: an all-self-loop graph filtered to nothing
    yields an EMPTY pagerank frame (not ZeroDivisionError); hits with
    iters=0 returns the initial uniform scores like pagerank does."""
    empty = spark.createDataFrame([], "src_url string, dst_url string")
    out = pagerank(empty)
    assert out.count() == 0
    assert out.columns == ["url", "rank", "indeg", "outdeg"]

    edges = [("A", "B"), ("B", "C")]
    rows = {r.url: r for r in hits(_edges_df(spark, edges), iters=0).collect()}
    assert {r.authority for r in rows.values()} == {1.0}
    assert {r.hub for r in rows.values()} == {1.0}
    assert rows["C"].indeg == 1 and rows["C"].outdeg == 0


def test_host_pagerank_all_internal_links_empty(spark):
    """q_host_pagerank on a single-host corpus (every link intra-host)
    must return empty, not crash — the self-loop filter empties the
    host edge set."""
    from crawl4ai_spark.queries.schedops import host_budgets_from_rank

    one_host = spark.createDataFrame(
        [("h.example.com", "h.example.com", "u1", "u2"),
         ("h.example.com", "h.example.com", "u2", "u3")],
        "src_host string, dst_host string, src_url string, dst_url string")
    edges = one_host.where(F.col("src_host") != F.col("dst_host")).select(
        F.col("src_host").alias("src_url"), F.col("dst_host").alias("dst_url"))
    from crawl4ai_spark.operators.linkgraph import pagerank as pr
    out = pr(edges)
    assert out.count() == 0
    # and the budget helper passes the empty frame through
    assert host_budgets_from_rank(out).count() == 0


def test_hits_star_topology(spark):
    # hub h points at every leaf: h is THE hub (1.0), leaves tie at
    # authority 1.0 (max-normalized), leaves have zero hub score.
    edges = [("h", f"l{i}") for i in range(4)]
    rows = {r.url: r for r in hits(_edges_df(spark, edges)).collect()}
    assert rows["h"].hub == 1.0 and rows["h"].authority == 0.0
    for i in range(4):
        assert rows[f"l{i}"].authority == 1.0
        assert rows[f"l{i}"].hub == 0.0


def test_anchor_aggregate_dedup_and_order(spark):
    links = spark.createDataFrame(
        [
            ("s1", "t", "zebra"),
            ("s2", "t", "apple"),
            ("s1", "t", "zebra"),  # duplicate anchor text
            ("s3", "u", "mid"),
        ],
        "src_url string, dst_url string, anchor string",
    )
    rows = {r.url: r for r in anchor_aggregate(links).collect()}
    assert rows["t"].n_links == 3
    assert rows["t"].n_src_docs == 2
    assert rows["t"].anchors == "apple | zebra"  # deduped, sorted
    assert rows["t"].top_anchor == "apple"
    assert rows["u"].n_links == 1


def test_anchor_aggregate_cap_binds(spark):
    """Capped production posture (r3 verdict item 7): a mega-indegree
    target keeps only the top-N lexicographic anchors, the uncapped
    distinct count survives as n_anchors_total, counts are uncapped."""
    links = spark.createDataFrame(
        [(f"s{i}", "t", f"a{i:02d}") for i in range(10)]
        + [("s0", "t", "a00")],  # duplicate pair — must not double-count
        "src_url string, dst_url string, anchor string",
    )
    r = {x.url: x for x in anchor_aggregate(links, max_anchors=3).collect()}["t"]
    assert r.anchors == "a00 | a01 | a02"
    assert r.n_anchors_total == 10
    assert r.n_links == 11
    assert r.n_src_docs == 10
    assert r.top_anchor == "a00"


def test_link_pagerank_query_shape(spark):
    df = G.q_link_pagerank(spark, SF)
    rows = df.collect()
    assert rows
    by_url = {r.url: r for r in rows}
    # every document page with outlinks is a node
    assert any(u.endswith("/p/1") or "/p/" in u for u in by_url)
    assert all(r.rank > 0 for r in rows)
    # link targets with no outlinks of their own are dangling: outdeg 0
    assert any(r.outdeg == 0 and r.indeg > 0 for r in rows)


def test_host_graph_conserves_link_mass(spark):
    """Every page-level link lands in exactly one (src_host, dst_host)
    cell: Σ n_links over the rollup == count of link edges."""
    hg = G.q_host_graph(spark, SF).collect()
    assert hg
    n_edges = G._links(spark, SF).count()
    assert sum(r.n_links for r in hg) == n_edges
    for r in hg:
        assert r.internal == (r.src_host == r.dst_host)
        assert 1 <= r.n_src_pages <= r.n_links
        assert 1 <= r.n_dst_urls <= r.n_links


def test_host_pagerank_feeds_budgets(spark):
    """Closed loop: host_pagerank → host_budgets_from_rank produces the
    (host, budget) shape CrawlEngine(host_budgets=...) consumes, with
    clamped fixed-point shares."""
    from crawl4ai_spark.queries.schedops import (BUDGET_MAX, BUDGET_MIN,
                                                 host_budgets_from_rank)

    hr = G.q_host_pagerank(spark, SF)
    rows = host_budgets_from_rank(hr, total_budget=10_000).collect()
    assert rows
    assert {c for c in ("host", "budget")} <= set(rows[0].asDict())
    for r in rows:
        assert BUDGET_MIN <= r.budget <= BUDGET_MAX
        # fixed-point floor of the share, before clamping
        raw = (10_000 * int(r.rank * 1_000_000_000)) // 1_000_000_000
        assert r.budget == max(BUDGET_MIN, min(BUDGET_MAX, raw))
    # the fixture host graph is a complete clique (uniform rank); a
    # skewed rank table must spread budgets AND hit both clamps
    skew = spark.createDataFrame(
        [("big", 0.91), ("mid", 0.08), ("tiny", 0.000001)],
        "url string, rank double")
    b = {r.host: r.budget for r in host_budgets_from_rank(
        skew, total_budget=10_000).collect()}
    assert b["big"] == BUDGET_MAX          # clamped down from 9100
    assert b["mid"] == 800                 # exact fixed-point floor
    assert b["tiny"] == BUDGET_MIN         # clamped up from 0


def test_media_freq_dedup_balances(spark):
    rows = S.q_media_freq_dedup(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_media == r.n_boiler + r.n_kept
        assert 0.0 <= r.boiler_ratio <= 1.0
    # the shared-ref derivation must actually produce cross-doc repeats
    assert any(r.n_boiler > 0 for r in rows)


def test_seq_pack_interleaved_budget(spark):
    from crawl4ai_spark.queries.spansops import IMG_TOKENS, INTER_BUDGET

    rows = S.q_seq_pack_interleaved(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.cost == r.n_text_tokens + IMG_TOKENS * r.n_media
        assert 0 <= r.offset_in_pack < INTER_BUDGET
    # packs are dense within a source: pack_id 0 exists for every source
    sources = {r.source for r in rows}
    zero = {r.source for r in rows if r.pack_id == 0}
    assert zero == sources


def test_pagerank_plan_no_python_udf(spark):
    df = G.q_link_pagerank(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_mirror_detect_matches_bruteforce(spark):
    """mirror_detect equals a driver-side brute force at sf0.001:
    per-host fingerprint sets → pairwise Jaccard over fps shared by
    2..MAX hosts; boilerplate-frequency fps excluded from n_common but
    NOT from host sizes."""
    import hashlib
    from collections import defaultdict

    import duckdb

    from crawl4ai_spark.queries.graphops import (MIRROR_MIN_JACCARD,
                                                 q_mirror_detect)

    from crawl4ai_spark.queries.dataops import NEAR_TAIL

    SF = "/root/testdata/sf0.001"
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchall()
    # the dedup-tier corpus: base + near-tail slice + exact-copy slice
    corpus = [(i, t) for i, t in docs]
    corpus += [(i + 1000000, t + NEAR_TAIL) for i, t in docs if i % 5 == 0]
    corpus += [(i + 2000000, t) for i, t in docs if i % 7 == 0]
    by_host = defaultdict(set)
    for i, text in corpus:
        by_host[f"host{i % 7}.example.com"].add(
            hashlib.md5(text.encode()).hexdigest())
    fp_hosts = defaultdict(set)
    for h, fps in by_host.items():
        for fp in fps:
            fp_hosts[fp].add(h)
    pair_common = defaultdict(int)
    for fp, hosts in fp_hosts.items():
        if not (2 <= len(hosts) <= 32):
            continue
        hs = sorted(hosts)
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                pair_common[(hs[i], hs[j])] += 1
    want = {}
    for (a, b), nc in pair_common.items():
        na, nb = len(by_host[a]), len(by_host[b])
        jac = nc / (na + nb - nc)
        want[(a, b)] = (nc, na, nb, round(jac, 6), jac >= MIRROR_MIN_JACCARD)

    got = {(r.host_a, r.host_b): (r.n_common, r.n_a, r.n_b, r.jaccard, r.is_mirror)
           for r in q_mirror_detect(spark, SF).collect()}
    assert got == want
    assert want  # the fixture corpus must actually contain cross-host dups


def test_pagerank_and_hits_random_graph_sweep(spark):
    """Seeded random-graph sweep (the property-test sweep without a
    Spark session per example): 6 graphs across densities, both
    operators must match the python references walking the identical
    pinned trajectory — including disconnected parts, dangling chains,
    and multi-edges (deduped)."""
    import random

    rng = random.Random(0xC4A317)
    for case in range(6):
        n = rng.randint(2, 9)
        density = rng.choice([0.15, 0.3, 0.6])
        nodes = [f"n{i}" for i in range(n)]
        edges = [(a, b) for a in nodes for b in nodes
                 if a != b and rng.random() < density]
        if not edges:
            edges = [(nodes[0], nodes[-1])]
        # multi-edge noise: operators must distinct() these away
        edges_noisy = edges + [edges[0]] * 2
        df = _edges_df(spark, edges_noisy)

        got_pr = {r.url: r.rank for r in pagerank(df).collect()}
        assert got_pr == _numpy_pagerank(edges), (case, edges)

        rows = {r.url: r for r in hits(df).collect()}
        ref_auth, ref_hub = _numpy_hits(edges)
        assert {u: r.authority for u, r in rows.items()} == ref_auth, (case, edges)
        assert {u: r.hub for u, r in rows.items()} == ref_hub, (case, edges)


def test_trustrank_semantics(spark):
    """Trust originates only at seeds and decays along links: an
    unreachable branch gets exactly 0, a seed's direct child outranks
    the grandchild, and a spam cluster with no seed path starves even
    with high indegree (the signal pagerank cannot give)."""
    from crawl4ai_spark.operators.linkgraph import trustrank

    edges = [
        ("seed", "child"), ("child", "grand"),
        # link farm: dense mutual links, never linked from the seed side
        ("spamA", "spamB"), ("spamB", "spamA"),
        ("spamA", "spamT"), ("spamB", "spamT"),
    ]
    seeds = spark.createDataFrame([("seed",)], "url string")
    out = {r.url: r for r in trustrank(_edges_df(spark, edges), seeds).collect()}
    assert out["seed"].is_seed and not out["child"].is_seed
    # teleport mass: only the seed gets (1-d)*1.0 every iteration
    assert out["seed"].trust > out["child"].trust > out["grand"].trust > 0
    # spamT has indegree 2 (same as nothing else) but zero trust
    for n in ("spamA", "spamB", "spamT"):
        assert out[n].trust == 0.0
    # pagerank, by contrast, gives the farm mass — the demotion signal
    pr = {r.url: r.rank for r in pagerank(_edges_df(spark, edges)).collect()}
    assert pr["spamT"] > 0


def test_trustrank_empty_seeds_and_off_graph_seeds(spark):
    from crawl4ai_spark.operators.linkgraph import trustrank

    e = _edges_df(spark, [("a", "b")])
    none = spark.createDataFrame([], "url string")
    assert trustrank(e, none).count() == 0
    # seeds not in the graph carry no mass; in-graph portion normalizes
    mixed = spark.createDataFrame([("a",), ("elsewhere",)], "url string")
    rows = {r.url: r for r in trustrank(e, mixed).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"].is_seed and rows["a"].trust > 0


def _py_opic(edges, iters=5, scale=10**12):
    """Reference OPIC with the operator's exact integer contract:
    floor-division shares, dangling cash to the virtual node, virtual
    cash redistributed uniformly next iteration."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    outdeg = {u: 0 for u in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    init = scale // (n + 1)
    cash = {u: init for u in nodes}
    hist = {u: 0 for u in nodes}
    v_cash = init
    for _ in range(iters):
        share = {u: cash[u] // (outdeg[u] + 1) for u in nodes}
        v_in = sum(share.values())
        v_share = v_cash // n
        incoming = {u: 0 for u in nodes}
        for s, t in edges:
            incoming[t] += share[s]
        for u in nodes:
            hist[u] += cash[u]
            cash[u] = incoming[u] + v_share
        v_cash = v_in
    return {u: hist[u] + cash[u] for u in nodes}


def test_opic_matches_python_reference(spark):
    from crawl4ai_spark.operators.linkgraph import OPIC_SCALE, opic

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("c", "d"),  # d is dangling: all its cash goes to the virtual node
        ("e", "a"),  # e has no inlinks: fed only by the virtual node
    ]
    ref = _py_opic(edges)
    rows = {r.url: r for r in opic(_edges_df(spark, edges)).collect()}
    assert {u: r.units for u, r in rows.items()} == ref
    # importance is the scalar normalization of units
    for u, r in rows.items():
        assert r.importance == _round(r.units / (OPIC_SCALE * 6.0), 9)


def test_opic_cash_conservation_and_ranking(spark):
    """Total banked+pending cash never exceeds the injected total (the
    only loss is sub-unit truncation), and a page every other page links
    outranks a leaf — the frontier-prioritization semantics."""
    from crawl4ai_spark.operators.linkgraph import OPIC_ITERS, OPIC_SCALE, opic

    edges = [("p1", "hub"), ("p2", "hub"), ("p3", "hub"),
             ("hub", "leaf"), ("p1", "p2")]
    rows = {r.url: r for r in opic(_edges_df(spark, edges)).collect()}
    total_units = sum(r.units for r in rows.values())
    injected = (OPIC_SCALE // (len(rows) + 1)) * (len(rows) + 1)
    # each node's balance counts once per iteration plus the final one
    assert total_units <= injected * (OPIC_ITERS + 1)
    assert rows["hub"].importance > rows["leaf"].importance
    assert rows["hub"].indeg == 3 and rows["hub"].outdeg == 1
    # determinism: a second run returns identical units
    again = {r.url: r.units for r in opic(_edges_df(spark, edges)).collect()}
    assert again == {u: r.units for u, r in rows.items()}


def test_opic_empty_graph(spark):
    from crawl4ai_spark.operators.linkgraph import opic

    empty = spark.createDataFrame([], "src_url string, dst_url string, anchor string")
    assert opic(empty).count() == 0


def test_frontier_anchor_score_excludes_crawled(spark):
    """Focused-crawl scoring only ranks UNCRAWLED targets (never a URL
    that already appeared as a link source), and the score is the
    keyword fraction over the aggregated anchors."""
    from crawl4ai_spark.queries.graphops import (FRONTIER_KEYWORDS,
                                                 q_frontier_anchor_score)

    links = G._links(spark, SF)
    crawled = {r.src_url for r in links.select("src_url").distinct().collect()}
    rows = q_frontier_anchor_score(spark, SF).collect()
    assert rows
    allowed = {round(k / len(FRONTIER_KEYWORDS), 6)
               for k in range(len(FRONTIER_KEYWORDS) + 1)}
    for r in rows:
        assert r.url not in crawled
        assert r.n_links >= 1
        # score is the rounded keyword fraction
        assert r.anchor_score in allowed
    assert any(r.anchor_score > 0 for r in rows)


def test_link_reciprocity_semantics(spark):
    """Unordered host pairs with both directions folded: counts match a
    direct recount from the links, the ratio is 2·min/(sum), and
    is_mutual needs RECIP_MIN_EACH each way."""
    from crawl4ai_spark.queries.graphops import (RECIP_MIN_EACH,
                                                 q_link_reciprocity)

    links = G._links(spark, SF).collect()
    import re
    cnt: dict[tuple, int] = {}
    for r in links:
        s = re.match(r"^https://([^/]+)", r.src_url).group(1)
        d = re.match(r"^https://([^/]+)", r.dst_url).group(1)
        if s != d:
            cnt[(s, d)] = cnt.get((s, d), 0) + 1
    rows = q_link_reciprocity(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.host_a < r.host_b
        assert r.n_ab == cnt.get((r.host_a, r.host_b), 0)
        assert r.n_ba == cnt.get((r.host_b, r.host_a), 0)
        lo, tot = min(r.n_ab, r.n_ba), r.n_ab + r.n_ba
        assert abs(r.recip_ratio - 2.0 * lo / tot) < 1e-6
        assert r.is_mutual == (lo >= RECIP_MIN_EACH)


# --------------------------------------------------------------------------- #
# lpa_communities — deterministic label propagation
# --------------------------------------------------------------------------- #
def _python_lpa(edges, iters=4):
    """Pure-python twin of linkgraph.lpa_communities: undirected
    adjacency + self-vote, synchronous updates, argmax by (count DESC,
    label ASC)."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    und = {u: set() for u in nodes}
    for s, t in set(edges):
        und[s].add(t)
        und[t].add(s)
    for u in nodes:
        und[u].add(u)
    label = {u: u for u in nodes}
    for _ in range(iters):
        new = {}
        for u in nodes:
            counts: dict[str, int] = {}
            for v in und[u]:
                counts[label[v]] = counts.get(label[v], 0) + 1
            new[u] = min(counts, key=lambda l: (-counts[l], l))
        label = new
    return label


def test_lpa_matches_python_twin_two_triangles(spark):
    from crawl4ai_spark.operators.linkgraph import lpa_communities

    edges = [("A", "B"), ("B", "C"), ("C", "A"),
             ("X", "Y"), ("Y", "Z"), ("Z", "X"),
             ("C", "X")]   # bridge
    got = {r.url: r.community
           for r in lpa_communities(_edges_df(spark, edges)).collect()}
    assert got == _python_lpa(edges)
    # the two triangles resolve to different communities despite the bridge
    assert got["A"] == got["B"] == got["C"]
    assert got["X"] == got["Y"] == got["Z"]
    assert got["A"] != got["X"]


def test_lpa_self_vote_damps_two_node_oscillation(spark):
    """K2 is the classic synchronous-LPA oscillator; the self-vote +
    min-label tie-break collapses it to one community in one step."""
    from crawl4ai_spark.operators.linkgraph import lpa_communities

    got = {r.url: r.community
           for r in lpa_communities(_edges_df(spark, [("A", "B")])).collect()}
    assert got == {"A": "A", "B": "A"}


def test_graph_lpa_rollup_accounts_every_node(spark):
    """graph_lpa's community rollup partitions the node set: member
    counts sum to |nodes|, and every community label is itself a node."""
    rows = G.q_graph_lpa(spark, SF).collect()
    links = G._links(spark, SF)
    nodes = {r.u for r in (
        links.select(F.col("src_url").alias("u"))
        .unionByName(links.select(F.col("dst_url").alias("u")))
        .distinct().collect())}
    assert sum(r.n_members for r in rows) == len(nodes)
    assert all(r.n_members >= 1 for r in rows)
    assert all(r.community in nodes for r in rows)
    assert 1 < len(rows) < len(nodes)  # neither all-singletons nor one blob


def test_community_cap_semantics(spark):
    """Per-community cap: no community contributes more than CC_CAP
    docs, kept docs are unique, graph-known pages inherit their LPA
    label, and graph-unknown pages are their own singleton community
    (rk = 1, always kept)."""
    from crawl4ai_spark.operators.linkgraph import lpa_communities
    from crawl4ai_spark.queries.registry import table as _t

    rows = G.q_community_cap(spark, SF).collect()
    per = {}
    for r in rows:
        per[r.community] = per.get(r.community, 0) + 1
    assert per and max(per.values()) <= G.CC_CAP
    assert len({r.doc_id for r in rows}) == len(rows)
    assert all(1 <= r.rk <= G.CC_CAP for r in rows)

    labels = {r.url: r.community
              for r in lpa_communities(G._links(spark, SF)).collect()}
    docs = _t(spark, SF, "documents").select("doc_id").collect()
    urls = {int(r.doc_id):
            f"https://host{int(r.doc_id) % 7}.example.com/p/{int(r.doc_id)}"
            for r in docs}
    kept = {r.doc_id: r for r in rows}
    # kept count equals sum over communities of min(CAP, size), with
    # membership derived independently from the labels + url scheme
    sizes: dict[str, int] = {}
    for did, u in urls.items():
        c = labels.get(u, u)
        sizes[c] = sizes.get(c, 0) + 1
    assert len(rows) == sum(min(G.CC_CAP, n) for n in sizes.values())
    assert any(n > 1 for n in sizes.values())   # communities are real
    for did, r in kept.items():
        u = urls[did]
        if u in labels:
            assert r.community == labels[u]
        else:
            assert r.community == u and r.rk == 1
    # singleton (graph-unknown) docs are never dropped
    singles = {d for d, u in urls.items() if u not in labels}
    assert singles <= set(kept)


def test_host_cocitation_matches_python_twin(spark):
    from collections import defaultdict

    from crawl4ai_spark.queries.graphops import (RA_DEG_CAP, RA_SCALE,
                                                 _links, q_host_cocitation)

    edges = {
        (r.src_url, r.dst_url.split("/")[2])
        for r in _links(spark, SF).collect()
    }
    hosts_by_src = defaultdict(set)
    for s, h in edges:
        hosts_by_src[s].add(h)
    want = defaultdict(lambda: [0, 0])
    for s, hs in hosts_by_src.items():
        nh = len(hs)
        if nh > RA_DEG_CAP:
            continue
        for a in hs:
            for b in hs:
                if a < b:
                    want[(a, b)][0] += 1
                    want[(a, b)][1] += RA_SCALE // nh
    got = {
        (r.a_host, r.b_host): (r.n_sources, r.ra_score)
        for r in q_host_cocitation(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    assert got, "affinity pairs must exist on the fixture corpus"
    # host locality must surface: the strongest pair beats the weakest
    # by a real margin (adjacent-host link structure)
    scores = sorted(v[1] for v in got.values())
    assert scores[-1] > 2 * scores[0]
