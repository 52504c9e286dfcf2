"""Physical-plan quality gates: the optimizations we claim must be
visible in explain() output, not just intended."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    """P3 gate must land in PushedFilters of the parquet scan."""
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    q = d.where(F.col("n_chars") >= 100).select("doc_id")
    plan = _plan(q)
    assert "PushedFilters" in plan and "n_chars" in plan.split("PushedFilters", 1)[1][:200]


def test_column_pruning(spark):
    """A 1-column projection must not read the wide text column."""
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = _plan(d.select("doc_id"))
    readschema = plan.split("ReadSchema", 1)[1][:200] if "ReadSchema" in plan else ""
    assert "doc_id" in readschema and "text" not in readschema


def test_ann_broadcasts_query_side(spark):
    from crawl4ai_spark.queries.dataops import q_ann_cosine_topk

    plan = _plan(q_ann_cosine_topk(spark, "/root/testdata/sf0.01"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_crawl_engine_plan_has_no_python_udf(spark, corpus_dir):
    """The frontier hot path must stay JVM-side — no BatchEvalPython /
    ArrowEvalPython stages in fetch+extract lineage."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import VirtualCorpus
    from crawl4ai_spark.operators.frontier import CrawlEngine

    vc = VirtualCorpus(n_docs=1000, n_hosts=10)
    cfg = CrawlConfig(seeds=vc.seed_urls(9, 4), respect_robots=False,
                      track_order=False, max_pages=None)
    eng = CrawlEngine(spark, vc, cfg, "/tmp/planchk")
    sel = eng._seed_frontier().withColumn("rank_in_round", F.lit(0))
    pages = eng._fetch(sel, 1, 0)
    links = eng._extract_links(pages, 1)
    plan = _plan(links)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "xxhash64" in plan.lower()


def test_select_batch_no_unbounded_single_partition_window(spark, corpus_dir):
    """Rank assignment must never run a single-partition window over the
    raw frontier: with a limit, the SinglePartition exchange may only see
    the local-top-k survivors (a Filter on _lrk sits below it); with no
    limit (BFS full order), no SinglePartition exchange exists at all
    (depth-block offsets + per-depth windows)."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.operators.frontier import CrawlEngine

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    state = "/tmp/planchk_rank"
    import shutil
    shutil.rmtree(state, ignore_errors=True)

    # a realistic materialized frontier (non-literal columns — a seed-only
    # frontier is all constants and Catalyst folds the window keys away)
    frontier_path = "/tmp/planchk_rank_frontier"
    shutil.rmtree(frontier_path, ignore_errors=True)
    spark.range(5000).selectExpr(
        "concat('https://host', id % 9, '.example.com/p/', id) AS url",
        "xxhash64(concat('u', id)) AS url_hash",
        "concat('host', id % 9, '.example.com') AS host",
        "cast(id % 4 AS int) AS host_salt",
        "cast(id % 3 AS int) AS depth",
        "cast(pmod(xxhash64(id), 100) / 100.0 AS double) AS score",
        "cast(id % 40 AS long) AS parent_rank",
        "cast(id % 7 AS int) AS parent_offset",
        "lpad(cast(id AS string), 6, '0') AS path",
        "0 AS discovered_round",
    ).write.mode("overwrite").parquet(frontier_path)
    frontier = spark.read.parquet(frontier_path)

    # limited with a big backlog: local cut (_lrk) must exist below the
    # global window (pending_est <= limit would legitimately skip it —
    # simulate a backlog far above the budget)
    eng = CrawlEngine(spark, docs, CrawlConfig(seeds=["https://host9.example.com/p/1"],
                                               max_pages=10), state)
    eng._pending_est = 1_000_000
    plan = _plan(eng._select_batch(frontier, 10))
    assert "_lrk" in plan, "local top-k pre-cut missing"
    single = plan.find("SinglePartition")
    # children print below their parent: the _lrk cut must sit BELOW the
    # single-partition exchange (i.e. the exchange only sees survivors)
    assert single == -1 or "_lrk" in plan[single:], plan

    # unlimited BFS full-order: no SinglePartition exchange anywhere
    cfg = CrawlConfig(seeds=["https://host9.example.com/p/1"],
                      max_pages=None, track_order=True, strategy="bfs")
    eng2 = CrawlEngine(spark, docs, cfg, state)
    plan2 = _plan(eng2._select_batch(frontier, None))
    assert "SinglePartition" not in plan2, plan2

    # dfs/best_first with no budget must refuse (inherently serial sort)
    import pytest

    cfg3 = CrawlConfig(seeds=["https://host9.example.com/p/1"], strategy="dfs",
                       max_pages=None, track_order=True)
    eng3 = CrawlEngine(spark, docs, cfg3, state + "3")
    with pytest.raises(ValueError, match="round_size or max_pages"):
        eng3._select_batch(frontier, None)


def test_politeness_select_single_window_pass(spark):
    """Per-host rank-and-limit = one window exec, no extra shuffle after."""
    from crawl4ai_spark.queries.crawlops import q_politeness_select

    plan = _plan(q_politeness_select(spark, "/root/testdata/sf0.01"))
    assert plan.count("Window") >= 1
    assert "rank" in plan.lower()


def test_synthesis_tree_stays_deduplicated(spark):
    """Regression guard for the fixtures._let let-bindings: naive Column
    composition inlines the parsed doc-index expression at every use
    site (416 regexp_extract copies, ~68 KB analyzed plan, ~0.65 s of
    batch-size-independent driver analyze+optimize per crawl round). The
    bound tree analyzes at ~9.4 KB; alarm well before the duplication
    creeps back."""
    from crawl4ai_spark.fixtures import VirtualCorpus

    vc = VirtualCorpus(n_docs=10_000_000_000, n_hosts=40)
    base = spark.range(5).select(
        F.concat(F.lit("https://host39.example.com/p/"),
                 F.col("id").cast("string")).alias("url"))
    spans_c, st_c, title_c = vc.fetch_cols()
    df = base.select("url", spans_c.alias("spans"), st_c.alias("_st"),
                     title_c.alias("_title"))
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert len(analyzed) < 25_000, (
        f"synthesis tree re-bloated to {len(analyzed)} chars — "
        "a _let binding was probably lost (see fixtures._let)")
    # the doc-index parse must appear once per output column, not per use
    assert analyzed.count("regexp_extract") <= 6, analyzed.count("regexp_extract")
