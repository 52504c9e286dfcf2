"""Link-graph tier queries: anchor-text aggregation + PageRank over the
span corpus's outlink graph, under the DuckDB oracle gate.

Graph derivation (identical arithmetic in both dialects, reusing
spansops' span lift): every document is a page at
``https://host{doc_id%7}.example.com/p/{doc_id}`` (the pages_concat URL
scheme); each link span contributes one edge from that page to the
span's media_ref target. Targets that are not documents stay in the
graph as dangling nodes — exactly what a real web graph built from an
outlink table looks like mid-crawl.

The Spark side runs the REAL operators (operators/linkgraph.py); DuckDB
mirrors them with unrolled per-iteration CTEs whose contribution sums
are the same order-pinned folds (list_reduce over list(... ORDER BY
src)) at the same 9-decimal per-iteration rounding, so the two engines
walk an identical trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scoring import keyword_score_sql
from ..operators.linkgraph import (HITS_ITERS, OPIC_ITERS, OPIC_SCALE,
                                   PR_DAMPING, PR_ITERS, anchor_aggregate,
                                   hits, opic, pagerank, trustrank)
from .registry import query, table as _t
from .spansops import _SP_SQL, _span_docs

# Shared SQL: one row per link edge (src page URL, dst URL, anchor text).
_LINKS_SQL = f"""
    {_SP_SQL},
    links AS (
        SELECT 'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/'
                   || doc_id::VARCHAR AS src_url,
               ref AS dst_url,
               gtext AS anchor
        FROM spans WHERE kind = 'link'
    )
"""


def _links(spark: SparkSession, sf_dir: str) -> DataFrame:
    sd = _span_docs(spark, sf_dir)
    s = sd.select("doc_id", F.explode_outer("spans").alias("s")).where(
        F.col("s.kind") == "link"
    )
    return s.select(
        F.concat(
            F.lit("https://host"),
            F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("src_url"),
        F.col("s.media_ref").alias("dst_url"),
        F.col("s.text").alias("anchor"),
    )


# --------------------------------------------------------------------------- #
# anchor_texts — the classic "anchor file": per-target aggregated link text
# --------------------------------------------------------------------------- #
@query(
    "anchor_texts",
    f"""
    WITH {_LINKS_SQL}
    SELECT dst_url AS url,
           count(*)::BIGINT AS n_links,
           count(DISTINCT src_url)::BIGINT AS n_src_docs,
           string_agg(DISTINCT anchor, ' | ' ORDER BY anchor) AS anchors,
           min(anchor) AS top_anchor
    FROM links GROUP BY dst_url
    """,
)
def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregated anchor texts per link target: the label source for
    link-text retrieval / query-doc training pairs, and the free
    relevance signal the reference's URL scorers never tap. One hash
    groupBy on the target URL; anchors deduped + sorted (order-pinned).
    UNBOUNDED variant — the oracle twin; production defaults to the
    capped path (anchor_texts_capped below)."""
    return anchor_aggregate(_links(spark, sf_dir), max_anchors=None)


# --------------------------------------------------------------------------- #
# anchor_texts_capped — production posture: top-N anchors per mega-target
# --------------------------------------------------------------------------- #
ANCHOR_CAP = 8


@query(
    "anchor_texts_capped",
    f"""
    WITH {_LINKS_SQL},
    hosted AS (
        SELECT 'https://' || regexp_extract(dst_url, '^https://([^/]+)', 1) || '/' AS url,
               src_url, anchor
        FROM links
    )
    SELECT url,
           count(*)::BIGINT AS n_links,
           count(DISTINCT src_url)::BIGINT AS n_src_docs,
           count(DISTINCT anchor)::BIGINT AS n_anchors_total,
           array_to_string(list_slice(list_sort(list(DISTINCT anchor)), 1, {ANCHOR_CAP}), ' | ') AS anchors,
           min(anchor) AS top_anchor
    FROM hosted GROUP BY url
    """,
)
def q_anchor_texts_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped anchor aggregation at HOST granularity — the mega-indegree
    shape (every page links the homepage) where the unbounded variant
    would build a giant single-row string. The real operator's capped
    path: distinct pairs → per-target row_number pre-cut (spillable
    sort, bounded rows) → collect of <= {ANCHOR_CAP}; the full distinct
    count survives as n_anchors_total."""
    links = _links(spark, sf_dir)
    hosted = links.select(
        F.concat(
            F.lit("https://"),
            F.regexp_extract("dst_url", "^https://([^/]+)", 1),
            F.lit("/"),
        ).alias("dst_url"),
        "src_url", "anchor",
    )
    return anchor_aggregate(hosted, max_anchors=ANCHOR_CAP)


# --------------------------------------------------------------------------- #
# link_pagerank — damped fixed-iteration PageRank over the outlink graph
# --------------------------------------------------------------------------- #
def _pr_oracle(edges_sql: str = "SELECT DISTINCT src_url, dst_url FROM links") -> str:
    d = PR_DAMPING
    # Inline the Python-evaluated doubles so both engines use the exact
    # same binary constants (DuckDB decimal arithmetic on 1.0 - 0.85
    # would yield exact 0.15, not Python's 0.15000000000000002).
    teleport = repr(1.0 - d)
    # Unrolled iterations: pr0 = 1/N; each prK re-derives every node's
    # rank from pr{K-1} via the order-pinned contribution fold.
    iters = []
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""
    pr{k} AS (
        SELECT n.url,
               round({teleport}::DOUBLE / (SELECT nn FROM nn)
                     + {d!r}::DOUBLE * coalesce(c.s, 0.0::DOUBLE), 9) AS rank
        FROM nodes n LEFT JOIN (
            SELECT e.dst_url,
                   list_reduce(
                       list_prepend(0.0::DOUBLE,
                           list(p.rank / e.outdeg ORDER BY e.src_url)),
                       (a, b) -> a + b) AS s
            FROM eo e JOIN pr{k - 1} p ON p.url = e.src_url
            GROUP BY e.dst_url
        ) c ON c.dst_url = n.url
    )""")
    return f"""
    WITH {_LINKS_SQL},
    edges AS ({edges_sql}),
    nodes AS (
        SELECT src_url AS url FROM edges
        UNION
        SELECT dst_url FROM edges
    ),
    nn AS (SELECT count(*)::DOUBLE AS nn FROM nodes),
    od AS (SELECT src_url, count(*)::BIGINT AS outdeg FROM edges GROUP BY src_url),
    eo AS (SELECT e.src_url, e.dst_url, o.outdeg FROM edges e JOIN od o USING (src_url)),
    pr0 AS (SELECT url, 1.0::DOUBLE / (SELECT nn FROM nn) AS rank FROM nodes),
    {','.join(iters)},
    ind AS (SELECT dst_url AS url, count(*)::BIGINT AS indeg FROM edges GROUP BY dst_url)
    SELECT p.url,
           round(p.rank, 6) AS rank,
           coalesce(i.indeg, 0)::BIGINT AS indeg,
           coalesce(o.outdeg, 0)::BIGINT AS outdeg
    FROM pr{PR_ITERS} p
    LEFT JOIN ind i ON i.url = p.url
    LEFT JOIN od o ON o.src_url = p.url
    """


@query("link_pagerank", _pr_oracle())
def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank authority over the corpus outlink graph (5 damped
    iterations) — the crawl-prioritization / quality signal
    (rank feeds Best-First scoring the way the reference's keyword
    scorer does, but from discovered structure instead of the URL
    string). Shape: one shuffle join + one hash agg per iteration,
    lineage cut per iteration; see operators/linkgraph.pagerank."""
    return pagerank(_links(spark, sf_dir))


# --------------------------------------------------------------------------- #
# link_hits — Kleinberg HITS (hubs & authorities) over the outlink graph
# --------------------------------------------------------------------------- #
def _hits_oracle() -> str:
    # Unrolled iterations; every *_raw CTE is referenced twice (values +
    # the max-normalizer subquery), so MATERIALIZED is load-bearing —
    # inlined CTEs would re-expand the whole prefix 2^(2·ITERS) times.
    steps = []
    for k in range(1, HITS_ITERS + 1):
        steps.append(f"""
    a{k}_raw AS MATERIALIZED (
        SELECT n.url, coalesce(c.s, 0.0::DOUBLE) AS raw
        FROM nodes n LEFT JOIN (
            SELECT e.dst_url,
                   list_reduce(
                       list_prepend(0.0::DOUBLE,
                           list(h.val ORDER BY e.src_url)),
                       (x, y) -> x + y) AS s
            FROM edges e JOIN h{k - 1} h ON h.url = e.src_url
            GROUP BY e.dst_url
        ) c ON c.dst_url = n.url
    ),
    a{k} AS MATERIALIZED (
        SELECT url, round(raw / (SELECT max(raw) FROM a{k}_raw), 9) AS val
        FROM a{k}_raw
    ),
    h{k}_raw AS MATERIALIZED (
        SELECT n.url, coalesce(c.s, 0.0::DOUBLE) AS raw
        FROM nodes n LEFT JOIN (
            SELECT e.src_url,
                   list_reduce(
                       list_prepend(0.0::DOUBLE,
                           list(a.val ORDER BY e.dst_url)),
                       (x, y) -> x + y) AS s
            FROM edges e JOIN a{k} a ON a.url = e.dst_url
            GROUP BY e.src_url
        ) c ON c.src_url = n.url
    ),
    h{k} AS MATERIALIZED (
        SELECT url, round(raw / (SELECT max(raw) FROM h{k}_raw), 9) AS val
        FROM h{k}_raw
    )""")
    return f"""
    WITH {_LINKS_SQL},
    edges AS (SELECT DISTINCT src_url, dst_url FROM links),
    nodes AS (
        SELECT src_url AS url FROM edges
        UNION
        SELECT dst_url FROM edges
    ),
    h0 AS (SELECT url, 1.0::DOUBLE AS val FROM nodes),
    {','.join(steps)},
    ind AS (SELECT dst_url AS url, count(*)::BIGINT AS indeg FROM edges GROUP BY dst_url),
    od AS (SELECT src_url AS url, count(*)::BIGINT AS outdeg FROM edges GROUP BY src_url)
    SELECT a.url,
           round(a.val, 6) AS authority,
           round(h.val, 6) AS hub,
           coalesce(i.indeg, 0)::BIGINT AS indeg,
           coalesce(o.outdeg, 0)::BIGINT AS outdeg
    FROM a{HITS_ITERS} a
    JOIN h{HITS_ITERS} h USING (url)
    LEFT JOIN ind i ON i.url = a.url
    LEFT JOIN od o ON o.url = a.url
    """


@query("link_hits", _hits_oracle())
def q_link_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the corpus outlink graph — the
    complementary signal to PageRank for crawl prioritization (a high
    HUB score marks index/listing pages whose outlinks are worth
    enqueueing first; PageRank only says who is pointed AT). 5
    iterations, authority-then-hub per round, max-normalized (see
    operators/linkgraph.hits for why max, not an L1/L2 sum, is the
    cross-engine-exact normalizer at scale)."""
    return hits(_links(spark, sf_dir))


# --------------------------------------------------------------------------- #
# host_graph — host-level rollup of the page link graph
# --------------------------------------------------------------------------- #
_HOST_EDGES_SQL = """
    hedges AS (
        SELECT regexp_extract(src_url, '^https://([^/]+)', 1) AS src_host,
               regexp_extract(dst_url, '^https://([^/]+)', 1) AS dst_host,
               src_url, dst_url
        FROM links
    )
"""


def _host_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = _links(spark, sf_dir)
    return links.select(
        F.regexp_extract("src_url", "^https://([^/]+)", 1).alias("src_host"),
        F.regexp_extract("dst_url", "^https://([^/]+)", 1).alias("dst_host"),
        "src_url", "dst_url",
    )


@query(
    "host_graph",
    f"""
    WITH {_LINKS_SQL},
    {_HOST_EDGES_SQL}
    SELECT src_host, dst_host,
           count(*)::BIGINT AS n_links,
           count(DISTINCT src_url)::BIGINT AS n_src_pages,
           count(DISTINCT dst_url)::BIGINT AS n_dst_urls,
           (src_host = dst_host) AS internal
    FROM hedges GROUP BY src_host, dst_host
    """,
)
def q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level rollup of the outlink graph — the web-graph
    aggregation a crawl scheduler actually consumes (which hosts feed
    which, at what volume; internal vs cross-host link mass). One hash
    groupBy on (src_host, dst_host): at 100 TB the host graph is ~6
    orders of magnitude smaller than the page graph, so this rollup is
    the cheap gateway to host-granularity analytics (host PageRank
    below, budget allocation, spam-cluster detection)."""
    he = _host_edges(spark, sf_dir)
    return he.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("src_url").alias("n_src_pages"),
        F.countDistinct("dst_url").alias("n_dst_urls"),
    ).withColumn("internal", F.col("src_host") == F.col("dst_host"))


# --------------------------------------------------------------------------- #
# host_pagerank — PageRank over the host graph (self-loops dropped)
# --------------------------------------------------------------------------- #
@query(
    "host_pagerank",
    _pr_oracle(
        f"""WITH {_HOST_EDGES_SQL}
        SELECT DISTINCT src_host AS src_url, dst_host AS dst_url
        FROM hedges WHERE src_host <> dst_host"""
    ),
)
def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank at HOST granularity (self-loops dropped — intra-host
    mass says nothing about cross-host authority): the host-priority
    signal for frontier scheduling. Feeds the same engine hook as
    yield-based budgets (schedops.host_budgets_from_yield /
    CrawlEngine(host_budgets=...)): rank ∝ budget share. Runs the real
    pagerank operator on a graph small enough that every iteration is a
    broadcast-side join at any corpus scale."""
    he = _host_edges(spark, sf_dir)
    edges = he.where(F.col("src_host") != F.col("dst_host")).select(
        F.col("src_host").alias("src_url"), F.col("dst_host").alias("dst_url"))
    return pagerank(edges)


# --------------------------------------------------------------------------- #
# mirror_detect — host pairs sharing content fingerprints (Bharat–Broder)
# --------------------------------------------------------------------------- #
# A fingerprint shared by more hosts than this is boilerplate (footer,
# legal page), not mirror signal; dropping it also bounds the pair
# blow-up of the fp self-join (pairs per fp <= MIRROR_FP_MAX_HOSTS^2).
MIRROR_FP_MAX_HOSTS = 32
MIRROR_MIN_JACCARD = 0.02


def _mirror_oracle() -> str:
    # Over the dedup-tier corpus (_CORPUS_SQL): its exact-copy slice
    # (id + 2000000, same text) lands on host (h+2)%7 — the synthetic
    # mirror. Host derivation from id keeps both variants one shape.
    from .dataops import _CORPUS_SQL
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    fps AS (
        SELECT DISTINCT 'host' || (id % 7)::VARCHAR || '.example.com' AS host,
               md5(text) AS fp
        FROM corpus WHERE text IS NOT NULL
    ),
    keep AS (
        SELECT fp FROM fps GROUP BY fp
        HAVING count(*) BETWEEN 2 AND {MIRROR_FP_MAX_HOSTS}
    ),
    sizes AS (SELECT host, count(*)::BIGINT AS n FROM fps GROUP BY host),
    common AS (
        SELECT a.host AS host_a, b.host AS host_b, count(*)::BIGINT AS n_common
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.host < b.host
        WHERE a.fp IN (SELECT fp FROM keep)
        GROUP BY a.host, b.host
    )
    SELECT host_a, host_b, n_common, sa.n AS n_a, sb.n AS n_b,
           round(n_common::DOUBLE / (sa.n + sb.n - n_common), 6) AS jaccard,
           (n_common::DOUBLE / (sa.n + sb.n - n_common)
                >= {MIRROR_MIN_JACCARD!r}) AS is_mirror
    FROM common
    JOIN sizes sa ON sa.host = common.host_a
    JOIN sizes sb ON sb.host = common.host_b
    """


@query("mirror_detect", _mirror_oracle())
def q_mirror_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-site detection (Bharat & Broder's content-overlap shape):
    host pairs ranked by Jaccard overlap of their page content
    fingerprints. Mirrors inflate a training corpus with near-identical
    trees and waste crawl budget — detected pairs feed the blocklist /
    domain_cap tier.

    Scale shape: the only join is keyed on the FINGERPRINT (bucketed,
    never all host pairs); fingerprints shared by more hosts than
    MIRROR_FP_MAX_HOSTS are dropped as boilerplate BEFORE pairing,
    bounding each fp's pair fan-out quadratically, and single-host fps
    never pair at all. Host sizes join back as a broadcast (hosts are a
    tiny dim). Runs over the dedup-tier corpus (dataops._corpus), whose
    exact-copy slice models the mirrored tree."""
    from pyspark.sql import Window

    from .dataops import _corpus, _wide

    d = _corpus(spark, sf_dir).where(F.col("text").isNotNull())
    # Materialize the slim (host, fp, _nh) table ONCE (lazy local
    # checkpoint): four consumers need it (both pair sides, the keep
    # filter, the size agg), and Catalyst's inferred join-key null
    # filters make their subtrees structurally distinct — exchange
    # reuse can never fire, so without the checkpoint the corpus is
    # re-scanned + re-hashed per consumer (measured: 12 parquet scans).
    # In production the fingerprint table is a stored crawl artifact
    # anyway; the checkpoint is its in-query stand-in. The fp's
    # host-count rides the _wide(fp) partitioning as a window — no
    # extra exchange.
    ann = (
        _wide(
            d.select(
                F.concat(F.lit("host"),
                         F.pmod(F.col("id"), F.lit(7)).cast("string"),
                         F.lit(".example.com")).alias("host"),
                F.md5("text").alias("fp"),
            ).distinct(),
            key="fp",
        )
        .withColumn("_nh", F.count("*").over(Window.partitionBy("fp")))
        .localCheckpoint(eager=False)
    )
    kept = ann.where(
        (F.col("_nh") >= 2) & (F.col("_nh") <= MIRROR_FP_MAX_HOSTS))
    a, b = kept.alias("a"), kept.alias("b")
    common = (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.host") < F.col("b.host")))
        .select(F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sizes = ann.groupBy("host").agg(F.count("*").cast("long").alias("n"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common
        .join(F.broadcast(sizes.select(F.col("host").alias("host_a"),
                                       F.col("n").alias("n_a"))), "host_a")
        .join(F.broadcast(sizes.select(F.col("host").alias("host_b"),
                                       F.col("n").alias("n_b"))), "host_b")
        .select("host_a", "host_b", "n_common", "n_a", "n_b",
                F.round(jac, 6).alias("jaccard"),
                (jac >= F.lit(MIRROR_MIN_JACCARD)).alias("is_mirror"))
    )


# --------------------------------------------------------------------------- #
# frontier_anchor_score — focused-crawl scoring of UNCRAWLED link targets
# --------------------------------------------------------------------------- #
FRONTIER_KEYWORDS = ["spark", "join", "stream"]


@query(
    "frontier_anchor_score",
    f"""
    WITH {_LINKS_SQL},
    crawled AS (SELECT DISTINCT src_url AS url FROM links),
    frontier AS (
        SELECT l.dst_url AS url, l.anchor
        FROM links l LEFT JOIN crawled c ON c.url = l.dst_url
        WHERE c.url IS NULL
    ),
    agg AS (
        SELECT url,
               count(*)::BIGINT AS n_links,
               array_to_string(list_sort(list(DISTINCT anchor)), ' | ') AS anchors
        FROM frontier GROUP BY url
    )
    SELECT url, n_links,
           {keyword_score_sql('anchors', FRONTIER_KEYWORDS)} AS anchor_score
    FROM agg
    """,
)
def q_frontier_anchor_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focused-crawl frontier prioritization (Chakrabarti'99 shape): an
    UNCRAWLED URL's relevance is estimated from the anchor texts of the
    links pointing at it — the only content evidence that exists before
    the fetch, and the signal the reference's URL-string scorer
    (crawl_agent.py:239-257) throws away. Crawled = distinct link
    sources; candidates = targets never seen as a source (broadcast-able
    anti-join — the crawled set is slim); anchors aggregate exactly as
    anchor_texts (deduped + order-pinned), then the engine's own
    keyword_score runs over the aggregate. Feeds Best-First the way
    score_keywords does, but from link evidence instead of the URL
    string. One groupBy on the target + one anti-join — scales."""
    links = _links(spark, sf_dir)
    crawled = links.select(F.col("src_url").alias("url")).distinct()
    frontier = links.join(
        crawled, links["dst_url"] == crawled["url"], "left_anti")
    agg = frontier.groupBy(F.col("dst_url").alias("url")).agg(
        F.count("*").alias("n_links"),
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_list("anchor"))), " | "
        ).alias("anchors"),
    )
    from ..functions.scoring import keyword_score
    return agg.select(
        "url", "n_links",
        keyword_score(F.col("anchors"), FRONTIER_KEYWORDS).alias("anchor_score"),
    )


# --------------------------------------------------------------------------- #
# opic_importance — OPIC cash/history importance (fixed-point integer units)
# --------------------------------------------------------------------------- #
def _opic_oracle() -> str:
    # Fixed-point int64 arithmetic end to end: every CTE below is exact
    # integer math (// floor division, plain sums), so the two engines
    # agree bit-for-bit with NO order-pinned folds — including the
    # virtual node's GLOBAL sum v{k}, which float pinning could never
    # certify. sh{k} is referenced twice (contribution subquery + the
    # carry-forward) -> MATERIALIZED, else inlining doubles per level.
    n1 = "((SELECT n FROM nn) + 1)"
    steps = []
    for k in range(1, OPIC_ITERS + 1):
        steps.append(f"""
    sh{k} AS MATERIALIZED (
        SELECT url, outdeg, cash, hist,
               (cash // (outdeg + 1))::BIGINT AS share
        FROM st{k - 1}
    ),
    v{k} AS (SELECT coalesce(sum(share), 0)::BIGINT AS v FROM sh{k}),
    st{k} AS MATERIALIZED (
        SELECT s.url, s.outdeg,
               (coalesce(c.i, 0)
                + (SELECT v FROM v{k - 1}) // (SELECT n FROM nn))::BIGINT AS cash,
               (s.hist + s.cash)::BIGINT AS hist
        FROM sh{k} s LEFT JOIN (
            SELECT e.dst_url AS url, sum(sh.share)::BIGINT AS i
            FROM edges e JOIN sh{k} sh ON sh.url = e.src_url
            GROUP BY e.dst_url
        ) c ON c.url = s.url
    )""")
    total = repr(float(OPIC_SCALE) * (OPIC_ITERS + 1))
    return f"""
    WITH {_LINKS_SQL},
    edges AS (SELECT DISTINCT src_url, dst_url FROM links),
    nodes AS (
        SELECT src_url AS url FROM edges
        UNION
        SELECT dst_url FROM edges
    ),
    nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
    od AS (SELECT src_url, count(*)::BIGINT AS outdeg FROM edges GROUP BY src_url),
    ind AS (SELECT dst_url AS url, count(*)::BIGINT AS indeg FROM edges GROUP BY dst_url),
    st0 AS MATERIALIZED (
        SELECT n.url, coalesce(o.outdeg, 0)::BIGINT AS outdeg,
               ({OPIC_SCALE} // {n1})::BIGINT AS cash,
               0::BIGINT AS hist
        FROM nodes n LEFT JOIN od o ON o.src_url = n.url
    ),
    v0 AS (SELECT ({OPIC_SCALE} // {n1})::BIGINT AS v),
    {','.join(steps)}
    SELECT s.url,
           round((s.hist + s.cash)::DOUBLE / {total}, 9) AS importance,
           (s.hist + s.cash)::BIGINT AS units,
           coalesce(i.indeg, 0)::BIGINT AS indeg,
           s.outdeg AS outdeg
    FROM st{OPIC_ITERS} s LEFT JOIN ind i ON i.url = s.url
    """


@query("opic_importance", _opic_oracle())
def q_opic_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC (Abiteboul WWW'03) page importance over the corpus outlink
    graph — the importance measure built FOR crawling: cash accumulated
    so far is a valid running estimate at any point, so the frontier can
    prioritize uncrawled URLs mid-crawl without an offline converged
    PageRank pass. Cash is fixed-point int64 units, making every sum —
    including the virtual node's global balance — exact and order-free
    on any cluster (the ``units`` column is the bit-exact cross-engine
    certificate). Shape per iteration: one shuffle join + one map-side-
    combinable hash agg + one O(1) scalar collect; see
    operators/linkgraph.opic."""
    return opic(_links(spark, sf_dir))


# --------------------------------------------------------------------------- #
# trustrank — seed-personalized PageRank (spam demotion / trust propagation)
# --------------------------------------------------------------------------- #
TR_SEED_HOST = "https://host0.example.com/p/"


def _tr_oracle() -> str:
    d = PR_DAMPING
    teleport = repr(1.0 - d)  # same binary constant both engines
    iters = []
    for k in range(1, PR_ITERS + 1):
        iters.append(f"""
    tr{k} AS (
        SELECT t.url,
               round({teleport}::DOUBLE * t.t
                     + {d!r}::DOUBLE * coalesce(c.s, 0.0::DOUBLE), 9) AS trust
        FROM tele t LEFT JOIN (
            SELECT e.dst_url,
                   list_reduce(
                       list_prepend(0.0::DOUBLE,
                           list(p.trust / e.outdeg ORDER BY e.src_url)),
                       (a, b) -> a + b) AS s
            FROM eo e JOIN tr{k - 1} p ON p.url = e.src_url
            GROUP BY e.dst_url
        ) c ON c.dst_url = t.url
    )""")
    return f"""
    WITH {_LINKS_SQL},
    edges AS (SELECT DISTINCT src_url, dst_url FROM links),
    nodes AS (
        SELECT src_url AS url FROM edges
        UNION
        SELECT dst_url FROM edges
    ),
    seeds AS (SELECT url FROM nodes WHERE starts_with(url, '{TR_SEED_HOST}')),
    ns AS (SELECT count(*)::DOUBLE AS ns FROM seeds),
    tele AS MATERIALIZED (
        SELECT n.url,
               s.url IS NOT NULL AS is_seed,
               CASE WHEN s.url IS NOT NULL
                    THEN 1.0::DOUBLE / (SELECT ns FROM ns)
                    ELSE 0.0::DOUBLE END AS t
        FROM nodes n LEFT JOIN seeds s ON s.url = n.url
    ),
    od AS (SELECT src_url, count(*)::BIGINT AS outdeg FROM edges GROUP BY src_url),
    eo AS (SELECT e.src_url, e.dst_url, o.outdeg FROM edges e JOIN od o USING (src_url)),
    tr0 AS (SELECT url, t AS trust FROM tele),
    {','.join(iters)},
    ind AS (SELECT dst_url AS url, count(*)::BIGINT AS indeg FROM edges GROUP BY dst_url)
    SELECT p.url,
           round(p.trust, 6) AS trust,
           t.is_seed,
           coalesce(i.indeg, 0)::BIGINT AS indeg,
           coalesce(o.outdeg, 0)::BIGINT AS outdeg
    FROM tr{PR_ITERS} p
    JOIN tele t ON t.url = p.url
    LEFT JOIN ind i ON i.url = p.url
    LEFT JOIN od o ON o.src_url = p.url
    """


@query("trustrank", _tr_oracle())
def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank over the corpus outlink graph: teleport mass restricted
    to a vetted seed whitelist (here host0's pages — the deterministic
    stand-in for a human-reviewed seed list), so trust decays with link
    distance from the seeds and link-farm neighborhoods starve. The
    counterweight signal to link_pagerank in frontier prioritization:
    rank says "popular", trust says "reachable from pages we vetted".
    Same per-iteration shape as pagerank (one shuffle join + one hash
    agg, lineage cut); see operators/linkgraph.trustrank. Reference has
    no graph tier at all (crawl_agent.py:239-257 scores URL strings) —
    this is the §2.9 beyond-reference mandate."""
    links = _links(spark, sf_dir)
    seeds = (
        links.select(F.col("src_url").alias("url"))
        .unionByName(links.select(F.col("dst_url").alias("url")))
        .where(F.col("url").startswith(TR_SEED_HOST))
    )
    return trustrank(links, seeds)


# --------------------------------------------------------------------------- #
# link_reciprocity — reciprocal-link (nepotism) detection over host pairs
# --------------------------------------------------------------------------- #
RECIP_MIN_EACH = 2   # mutual pairs with >= this many links EACH way


@query(
    "link_reciprocity",
    f"""
    WITH {_LINKS_SQL},
    {_HOST_EDGES_SQL},
    hc AS (
        SELECT src_host AS s, dst_host AS d, count(*)::BIGINT AS n
        FROM hedges WHERE src_host <> dst_host
        GROUP BY src_host, dst_host
    )
    SELECT least(s, d) AS host_a, greatest(s, d) AS host_b,
           sum(CASE WHEN s < d THEN n ELSE 0 END)::BIGINT AS n_ab,
           sum(CASE WHEN s > d THEN n ELSE 0 END)::BIGINT AS n_ba,
           round(2.0 * least(sum(CASE WHEN s < d THEN n ELSE 0 END),
                             sum(CASE WHEN s > d THEN n ELSE 0 END))
                 / (sum(CASE WHEN s < d THEN n ELSE 0 END)
                    + sum(CASE WHEN s > d THEN n ELSE 0 END)), 6) AS recip_ratio,
           (least(sum(CASE WHEN s < d THEN n ELSE 0 END),
                  sum(CASE WHEN s > d THEN n ELSE 0 END))
                >= {RECIP_MIN_EACH}) AS is_mutual
    FROM hc GROUP BY least(s, d), greatest(s, d)
    """,
)
def q_link_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-link detection at host granularity (Davison'00's
    nepotistic-link signal): a host PAIR trading links both ways at
    volume is exchanging rank, not citing — the cheap precursor filter
    to trustrank (flagged pairs lose their edges before rank runs) and
    the complement to mirror_detect (which needs shared CONTENT;
    reciprocity fires on link exchange alone). Shape: one hash groupBy
    to the directed host-pair table, then one groupBy on the unordered
    pair key — both bounded by the host graph, ~6 orders smaller than
    the page graph at 100 TB."""
    he = _host_edges(spark, sf_dir)
    hc = (
        he.where(F.col("src_host") != F.col("dst_host"))
        .groupBy(F.col("src_host").alias("s"), F.col("dst_host").alias("d"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    ab = F.sum(F.when(F.col("s") < F.col("d"), F.col("n")).otherwise(F.lit(0)))
    ba = F.sum(F.when(F.col("s") > F.col("d"), F.col("n")).otherwise(F.lit(0)))
    return hc.groupBy(
        F.least("s", "d").alias("host_a"),
        F.greatest("s", "d").alias("host_b"),
    ).agg(
        ab.cast("long").alias("n_ab"),
        ba.cast("long").alias("n_ba"),
        F.round(F.lit(2.0) * F.least(ab, ba) / (ab + ba), 6).alias("recip_ratio"),
        (F.least(ab, ba) >= F.lit(RECIP_MIN_EACH)).alias("is_mutual"),
    )


# --------------------------------------------------------------------------- #
# graph_bowtie — Broder et al. (WWW'00) bowtie decomposition of the link
# graph relative to a deterministic pivot (the max-outdegree node, min
# URL tiebreak): SCC = forward ∩ backward reachable, IN = backward-only,
# OUT = forward-only, 'other' = neither (tendrils/tubes/disconnected
# folded together — separating them needs the SCC of every node, not a
# pivot decomposition). The two BFS closures run to FIXPOINT: Spark
# iterates frontier joins with a driver-side convergence check and a
# lineage cut per iteration (localCheckpoint — the dedup_minhash_cc
# pattern); DuckDB's recursive CTE is fixpoint by construction, so the
# two engines agree exactly, no iteration-count coupling. Scale shape:
# each iteration is ONE shuffle join co-partitioned on url, bounded by
# the graph diameter (~16-20 on the real web); the final class
# assignment is two left joins on node-keyed sets. Output is one row
# per component class — constant-size at any corpus scale.
# --------------------------------------------------------------------------- #
BOWTIE_MAX_ITERS = 40


@query(
    "graph_bowtie",
    f"""
    WITH RECURSIVE {_LINKS_SQL},
    edges AS (SELECT DISTINCT src_url, dst_url FROM links),
    deg AS (SELECT src_url, count(*) AS c FROM edges GROUP BY src_url),
    piv AS (SELECT src_url AS p FROM deg ORDER BY c DESC, src_url LIMIT 1),
    fwd(url) AS (
        SELECT p FROM piv
        UNION
        SELECT e.dst_url FROM fwd f JOIN edges e ON e.src_url = f.url
    ),
    bwd(url) AS (
        SELECT p FROM piv
        UNION
        SELECT e.src_url FROM bwd b JOIN edges e ON e.dst_url = b.url
    ),
    nodes AS (
        -- DuckDB quirk: inside a WITH RECURSIVE block a plain UNION in a
        -- NON-recursive CTE behaves as UNION ALL (repro'd on v1.0.0), so
        -- dedup explicitly
        SELECT DISTINCT url FROM (
            SELECT src_url AS url FROM edges
            UNION ALL
            SELECT dst_url FROM edges
        ) u
    ),
    cls AS (
        SELECT n.url,
               CASE WHEN f.url IS NOT NULL AND b.url IS NOT NULL THEN 'scc'
                    WHEN b.url IS NOT NULL THEN 'in'
                    WHEN f.url IS NOT NULL THEN 'out'
                    ELSE 'other' END AS component
        FROM nodes n
        LEFT JOIN fwd f ON f.url = n.url
        LEFT JOIN bwd b ON b.url = n.url
    )
    SELECT component, count(*)::BIGINT AS n_nodes, min(url) AS min_url
    FROM cls GROUP BY component
    """,
)
def q_graph_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (_links(spark, sf_dir)
             .select("src_url", "dst_url").distinct().cache())
    pivot = (edges.groupBy("src_url").agg(F.count(F.lit(1)).alias("c"))
             .orderBy(F.col("c").desc(), F.col("src_url").asc())
             .first().src_url)

    def _closure(src_col: str, dst_col: str) -> DataFrame:
        reach = spark.createDataFrame([(pivot,)], ["url"]).localCheckpoint()
        n = 1
        for _ in range(BOWTIE_MAX_ITERS):
            nxt = (reach.join(edges, reach["url"] == edges[src_col])
                   .select(F.col(dst_col).alias("url"))
                   .unionByName(reach).distinct().localCheckpoint())
            m = nxt.count()
            if m == n:
                return nxt
            reach, n = nxt, m
        return reach

    fwd = _closure("src_url", "dst_url").withColumnRenamed("url", "_f")
    bwd = _closure("dst_url", "src_url").withColumnRenamed("url", "_b")
    nodes = (edges.select(F.col("src_url").alias("url"))
             .unionByName(edges.select(F.col("dst_url").alias("url")))
             .distinct())
    cls = (nodes
           .join(fwd, nodes["url"] == fwd["_f"], "left")
           .join(bwd, nodes["url"] == bwd["_b"], "left")
           .select(
               "url",
               F.when(F.col("_f").isNotNull() & F.col("_b").isNotNull(),
                      F.lit("scc"))
               .when(F.col("_b").isNotNull(), F.lit("in"))
               .when(F.col("_f").isNotNull(), F.lit("out"))
               .otherwise(F.lit("other")).alias("component")))
    return cls.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("url").alias("min_url"))


# --------------------------------------------------------------------------- #
# graph_lpa — deterministic label-propagation communities over the link
# graph (operators/linkgraph.lpa_communities). The oracle unrolls the
# same synchronous iterations as CTEs: undirected adjacency + self-vote,
# per-node argmax by (count DESC, label ASC). Integer counts + string
# MIN ties only — no floats — so both engines walk the identical
# trajectory and the rollup matches bit-for-bit.
# --------------------------------------------------------------------------- #
def _lpa_cte_body() -> str:
    """The WITH-body producing l{LPA_ITERS}(url, label) — shared by the
    graph_lpa rollup oracle and the community_cap curation oracle."""
    from ..operators.linkgraph import LPA_ITERS
    steps = []
    for k in range(1, LPA_ITERS + 1):
        steps.append(f"""
    c{k} AS (
        SELECT und.u, l.label, count(*)::BIGINT AS n
        FROM und JOIN l{k - 1} l ON l.url = und.v
        GROUP BY und.u, l.label
    ),
    l{k} AS (
        SELECT u AS url, label FROM (
            SELECT u, label,
                   row_number() OVER (PARTITION BY u
                                      ORDER BY n DESC, label ASC) AS r
            FROM c{k}
        ) t WHERE r = 1
    )""")
    return f"""{_LINKS_SQL},
    edges AS (SELECT DISTINCT src_url, dst_url FROM links),
    nodes AS (
        SELECT src_url AS url FROM edges
        UNION
        SELECT dst_url FROM edges
    ),
    und AS (
        SELECT DISTINCT u, v FROM (
            SELECT src_url AS u, dst_url AS v FROM edges
            UNION ALL
            SELECT dst_url, src_url FROM edges
            UNION ALL
            SELECT url, url FROM nodes
        ) t
    ),
    l0 AS (SELECT url, url AS label FROM nodes),
    {','.join(steps)}"""


def _lpa_oracle() -> str:
    from ..operators.linkgraph import LPA_ITERS
    return f"""
    WITH {_lpa_cte_body()}
    SELECT label AS community,
           count(*)::BIGINT AS n_members,
           min(url) AS min_url,
           max(url) AS max_url
    FROM l{LPA_ITERS} GROUP BY label
    """


@query("graph_lpa", _lpa_oracle())
def q_graph_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the corpus outlink graph via
    deterministic synchronous label propagation — the cluster-
    granularity curation signal (link farms, mirror trees, and forum
    neighborhoods fold into one community that domain_cap-style
    policies can cap as a unit; reference has no graph tier at all).
    Runs the real operator (linkgraph.lpa_communities: integer counts,
    min-label ties, self-vote — reproducible on any topology, unlike
    textbook random-order LPA) and rolls members up per community."""
    from ..operators.linkgraph import lpa_communities

    labels = lpa_communities(_links(spark, sf_dir))
    return labels.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("url").alias("min_url"),
        F.max("url").alias("max_url"),
    )


# --------------------------------------------------------------------------- #
# community_cap — per-community contribution cap: domain_cap's curation
# guard lifted from the host key to the LPA community (link farms,
# mirror trees and forum neighborhoods span many hosts — capping per
# host lets a 50-host farm contribute 50 caps; capping per community
# caps the STRUCTURE). Pages map into the graph by their page URL;
# pages the graph never saw are their own singleton community (no link
# evidence ⇒ no collective cap). Selection is the salted-hash priority
# of domain_cap (deterministic, seedless, re-runnable).
#
# Scale shape: the LPA labels are the (url, community) table computed
# once per generation (iteration cost amortized over every consumer);
# the cap itself is one url-keyed shuffle join (labels are one row per
# GRAPH NODE — corpus-scale, slim in columns but never broadcastable;
# docs and labels co-partition on url) + one
# keyed row_number window bounded per community — the domain_cap
# two-level pre-cut applies verbatim if a community ever outgrows a
# task, kept single-level here because the oracle is the single-window
# form.
# --------------------------------------------------------------------------- #
CC_CAP = 12


def _community_cap_oracle() -> str:
    from ..functions import hashing as H
    from ..operators.linkgraph import LPA_ITERS
    h = H.h60_sql("'ccp:' || d.doc_id::VARCHAR")
    return f"""
    WITH {_lpa_cte_body()},
    d AS (
        SELECT doc_id::BIGINT AS doc_id,
               'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/'
                   || doc_id::VARCHAR AS url
        FROM documents
    ),
    j AS (
        SELECT d.doc_id, coalesce(l.label, d.url) AS community, {h} AS h
        FROM d LEFT JOIN l{LPA_ITERS} l ON l.url = d.url
    ),
    r AS (
        SELECT doc_id, community,
               row_number() OVER (PARTITION BY community
                                  ORDER BY h, doc_id) AS rk
        FROM j
    )
    SELECT doc_id, community, rk::BIGINT AS rk
    FROM r WHERE rk <= {CC_CAP}
    """


@query("community_cap", _community_cap_oracle())
def q_community_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions import hashing as H
    from ..operators.linkgraph import lpa_communities

    labels = lpa_communities(_links(spark, sf_dir))
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    docs = d.select(
        i.alias("doc_id"),
        F.concat(F.lit("https://host"),
                 F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com/p/"),
                 i.cast("string")).alias("url"),
        H.h60(F.concat(F.lit("ccp:"), i.cast("string"))).alias("h"),
    )
    j = docs.join(labels, "url", "left").select(
        "doc_id",
        F.coalesce("community", "url").alias("community"),
        "h",
    )
    w = Window.partitionBy("community").orderBy("h", "doc_id")
    return (
        j.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= CC_CAP)
        .select("doc_id", "community", "rk")
    )


# --------------------------------------------------------------------------- #
# host_cocitation — co-citation affinity between SITES: two hosts whose
# pages keep getting cited by the same source pages belong together
# (mirror families, topic neighborhoods, CDN/origin splits) even when
# neither links the other — the pre-clustering signal a frontier
# scheduler uses to co-locate related hosts under one budget/shard and
# a curator uses to find site families without content. Score is the
# Resource-Allocation index (Zhou/Lü/Zhang 2009 — Adamic-Adar's
# 1/log(deg) with 1/deg, which drops the libm call: the HLL lesson, no
# ln() at query time) in FIXED POINT: Σ_s (SCALE div n_hosts(s)) over
# the shared citing pages s is an integer sum — associative,
# order-free, bit-equal cross-engine. URL-level co-citation is
# degenerate on this corpus (every target has indeg 1 — measured, see
# the pair-generator note), so the affinity is computed where the
# evidence lives: the target-host level.
#
# Scale shape: the pair generator is a self-join on the citing page
# (bibliographic-coupling join) whose blowup is Σ n_hosts(s)² — pages
# fanning out to more than RA_DEG_CAP distinct hosts are cut BEFORE
# pairing (the champion-list posture: a links-to-everyone page carries
# ~zero per-pair signal, SCALE/huge ≈ 0); the pair stream folds
# map-side into one (a_host, b_host) hash agg. Nothing else shuffles.
# On the fixture corpus the signal is real: adjacent-host pairs score
# 30-41 shared sources, distant pairs ≤ 5.
# --------------------------------------------------------------------------- #
RA_SCALE = 1_000_000
RA_DEG_CAP = 64


@query(
    "host_cocitation",
    f"""
    WITH {_LINKS_SQL},
    sh AS (
        SELECT DISTINCT src_url,
               regexp_extract(dst_url, '^https://([^/]+)', 1) AS dst_host
        FROM links
    ),
    deg AS (SELECT src_url, count(*)::BIGINT AS nh FROM sh GROUP BY src_url),
    kept AS (
        SELECT sh.src_url, sh.dst_host, d.nh
        FROM sh JOIN deg d USING (src_url)
        WHERE d.nh <= {RA_DEG_CAP}
    )
    SELECT a.dst_host AS a_host, b.dst_host AS b_host,
           count(*)::BIGINT AS n_sources,
           sum({RA_SCALE} // a.nh)::BIGINT AS ra_score
    FROM kept a JOIN kept b
      ON a.src_url = b.src_url AND a.dst_host < b.dst_host
    GROUP BY a.dst_host, b.dst_host
    """,
)
def q_host_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urls import url_host

    sh = (
        _links(spark, sf_dir)
        .select("src_url", url_host(F.col("dst_url")).alias("dst_host"))
        .distinct()
    )
    deg = sh.groupBy("src_url").agg(F.count(F.lit(1)).alias("nh"))
    kept = sh.join(deg, "src_url").where(F.col("nh") <= RA_DEG_CAP)
    a = kept.select(F.col("src_url").alias("s"),
                    F.col("dst_host").alias("a_host"), "nh")
    b = kept.select(F.col("src_url").alias("s"),
                    F.col("dst_host").alias("b_host"))
    return (
        a.join(b, "s")
        .where(F.col("a_host") < F.col("b_host"))
        .groupBy("a_host", "b_host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.sum(F.floor(F.lit(RA_SCALE) / F.col("nh")))
            .cast("long").alias("ra_score"),
        )
    )
