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


def test_politeness_select_single_window_pass(spark):
    """Per-host rank-and-limit = one window exec, no extra shuffle after."""
    from crawl4ai_spark.queries.crawlops import q_politeness_select

    plan = _plan(q_politeness_select(spark, "/root/testdata/sf0.01"))
    assert plan.count("Window") >= 1
    assert "rank" in plan.lower()
