"""Conditional re-fetch (HTTP 304 model): cfg.conditional_fetch=True
makes reopen() revisits revalidate against the last fetched content
digest — unchanged pages log status='not_modified' with null spans (no
body over the wire) and contribute no outlinks; changed pages fetch
normally and their NEW links enter the frontier through the usual
seen-set dedup.

Reference analog: crawl4ai's cache_mode revalidation semantics
(original-README.md cache section) — at frontier scale the validator
is a per-URL digest snapshot (revisit_digests state table), the
engine-side enactment of what queries/crawlops.revisit_304 measures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.operators.frontier import CrawlEngine

from tests.test_crawl import get_seeds


def _docs(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/documents.parquet")


def _cfg(seeds, **kw):
    base = dict(seeds=seeds, max_depth=2, max_pages=None,
                politeness=False, respect_robots=False,
                track_order=False, conditional_fetch=True)
    base.update(kw)
    return CrawlConfig(**base)


def _mutate(docs, target_url: str, new_href: str):
    """Second-generation corpus: target_url's text changes and it gains
    one link span pointing at new_href; every other page is unchanged."""
    bump = F.transform(
        "spans",
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"] == "text", F.concat(s["text"], F.lit(" v2")))
             .otherwise(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset")))
    extra = F.array(F.struct(
        F.lit("link").alias("kind"),
        F.lit("fresh anchor").alias("text"),
        F.lit(new_href).alias("media_ref"),
        F.lit(9999).cast("int").alias("offset")))
    return docs.withColumn(
        "spans",
        F.when(F.col("doc_id") == target_url,
               F.concat(bump, extra)).otherwise(F.col("spans")))


def test_unchanged_revisits_log_304(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    state = str(tmp_path / "cond_sweep")
    eng = CrawlEngine(spark, docs, _cfg(seeds), state)
    eng.run()
    pages0 = eng.pages().count()
    seen0 = eng.url_seen().count()

    due = (eng.pages().where(F.col("status") == "fetched")
           .orderBy("rank").limit(3).select("url"))
    assert eng.reopen(due) == 3
    # the validator snapshot is due-sized, one row per reopened URL
    assert eng.revdig_tbl.read(spark).count() == 3

    eng2 = CrawlEngine(spark, docs, _cfg(seeds), state)
    eng2.run(resume=True)
    pages = eng2.pages()
    assert pages.count() == pages0 + 3
    gen2 = pages.where(F.col("status") == "not_modified")
    assert gen2.count() == 3
    row = gen2.select("spans", "title", "url").first()
    assert row.spans is None           # no body on the wire
    assert row.title == row.url        # E6 ladder bottoms out at the URL
    # no extraction from 304 rows: the seen set did not move
    assert eng2.url_seen().count() == seen0
    # resolved view keeps 304 rows (they are resolved visits)
    assert eng2.pages(resolved=True).count() == pages0 + 3


def test_changed_page_refetches_and_enqueues_new_link(spark, corpus_dir,
                                                      tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    # include_external=True: digest keys on content alone and the added
    # cross-host link is followable, so the target's host doesn't matter
    cfg = _cfg(seeds, include_external=True)
    state = str(tmp_path / "cond_changed")
    eng = CrawlEngine(spark, docs, cfg, state)
    eng.run()
    seen_urls = {r.url for r in eng.url_seen().select("url").collect()}
    fetched = eng.pages().where(F.col("status") == "fetched")
    target = fetched.orderBy("rank").first().url
    unseen = (docs.join(
        eng.url_seen().select(F.col("url").alias("doc_id")),
        "doc_id", "left_anti").orderBy("doc_id").first().doc_id)
    assert unseen not in seen_urls

    due = (eng.pages().where(F.col("status") == "fetched")
           .orderBy("rank").limit(3).select("url"))
    assert target in {r.url for r in due.collect()}
    assert eng.reopen(due) == 3

    docs2 = _mutate(docs, target, unseen)
    eng2 = CrawlEngine(spark, docs2, cfg, state)
    eng2.run(resume=True)
    pages = eng2.pages()
    # the changed page fetched a fresh body; the other two revalidated
    by_status = {r.url: r.status
                 for r in pages.where(F.col("rank") >= F.lit(0))
                 .groupBy("url").agg(F.max_by("status", "rank").alias("status"))
                 .join(due, "url", "left_semi").collect()}
    assert by_status[target] == "fetched"
    assert sorted(v for u, v in by_status.items() if u != target) \
        == ["not_modified", "not_modified"]
    gen2 = pages.where((F.col("url") == target)
                       & (F.col("status") == "fetched")).orderBy("rank")
    assert gen2.count() == 2
    new_spans = gen2.orderBy(F.col("rank").desc()).first().spans
    assert any(s.media_ref == unseen for s in new_spans
               if s.kind == "link")
    # the new outlink entered the frontier and was fetched
    assert unseen in {r.url for r in eng2.url_seen().select("url").collect()}
    assert pages.where(F.col("url") == unseen).count() >= 1


def test_fresh_crawl_byte_identical_to_off(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    rows = {}
    for flag in (False, True):
        cfg = _cfg(seeds, conditional_fetch=flag)
        eng = CrawlEngine(spark, docs, cfg,
                          str(tmp_path / f"cond_conf_{flag}"))
        eng.run()
        rows[flag] = sorted(
            (r.url, r.rank, r.status, r.depth)
            for r in eng.pages().select("url", "rank", "status",
                                        "depth").collect())
    assert rows[False] == rows[True]


def test_second_reopen_still_revalidates(spark, corpus_dir, tmp_path):
    """Gen-2 was a 304 (no body row); gen-3's validator must come from
    the ORIGINAL fetched row (fetched-rows-only max_by), so an unchanged
    page revalidates again instead of re-fetching."""
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    state = str(tmp_path / "cond_twice")
    eng = CrawlEngine(spark, docs, _cfg(seeds), state)
    eng.run()
    due = (eng.pages().where(F.col("status") == "fetched")
           .orderBy("rank").limit(2).select("url").persist())
    assert eng.reopen(due) == 2
    eng2 = CrawlEngine(spark, docs, _cfg(seeds), state)
    eng2.run(resume=True)
    assert eng2.pages().where(
        F.col("status") == "not_modified").count() == 2
    assert eng2.reopen(due) == 2
    eng3 = CrawlEngine(spark, docs, _cfg(seeds), state)
    eng3.run(resume=True)
    assert eng3.pages().where(
        F.col("status") == "not_modified").count() == 4
    due.unpersist()


def test_forget_clears_validator(spark, corpus_dir, tmp_path):
    """A forgotten URL re-discovered later is a first fetch again — its
    stale validator must not 304 it."""
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    state = str(tmp_path / "cond_forget")
    eng = CrawlEngine(spark, docs, _cfg(seeds), state)
    eng.run()
    due = (eng.pages().where(F.col("status") == "fetched")
           .orderBy("rank").limit(2).select("url").persist())
    assert eng.reopen(due) == 2
    assert eng.revdig_tbl.read(spark).count() == 2
    one = due.orderBy("url").limit(1)
    assert eng.forget(one) == 1
    rv = eng.revdig_tbl.read(spark)
    assert rv.count() == 1
    assert rv.join(one, rv["url"] == one["url"], "left_semi").count() == 0
    due.unpersist()


def test_ordered_mode_304(spark, corpus_dir, tmp_path):
    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    cfg = _cfg(seeds, track_order=True)
    state = str(tmp_path / "cond_ordered")
    eng = CrawlEngine(spark, docs, cfg, state)
    eng.run()
    pages0 = eng.pages().count()
    due = (eng.pages().where(F.col("status") == "fetched")
           .orderBy("rank").limit(2).select("url"))
    assert eng.reopen(due) == 2
    eng2 = CrawlEngine(spark, docs, cfg, state)
    eng2.run(resume=True)
    assert eng2.pages().count() == pages0 + 2
    assert eng2.pages().where(
        F.col("status") == "not_modified").count() == 2


def test_304_budget_feedback_leg(spark, corpus_dir, tmp_path):
    """conditional crawl → reopen → host_budgets_from_304: hosts whose
    revisits all revalidated decay to the cap; hosts with no revisits
    keep their base (integer formula checked exactly)."""
    from crawl4ai_spark.queries.schedops import host_budgets_from_304

    docs = _docs(spark, corpus_dir)
    seeds = get_seeds(spark, corpus_dir)
    state = str(tmp_path / "cond_leg")
    eng = CrawlEngine(spark, docs, _cfg(seeds), state)
    eng.run()
    due = (eng.pages().where(F.col("status") == "fetched")
           .orderBy("rank").limit(4).select("url"))
    assert eng.reopen(due) == 4
    eng2 = CrawlEngine(spark, docs, _cfg(seeds), state)
    eng2.run(resume=True)
    pages = eng2.pages()
    assert pages.where(F.col("status") == "not_modified").count() == 4

    base = pages.select("host").distinct().selectExpr(
        "host", "cast(10 as long) as budget")
    base = base.union(spark.createDataFrame(
        [("cold.example.net", 10)], "host string, budget long"))
    out = {r.host: r for r in
           host_budgets_from_304(pages, base, fresh_cap_pct=80).collect()}
    cold = out["cold.example.net"]
    assert (cold.n_revisits, cold.fresh_pct, cold.budget) == (0, 0, 10)
    # recompute the expected integers from the log itself
    agg = (pages.where(F.col("status") != "transient")
           .groupBy("host")
           .agg((F.count(F.lit(1)) - F.countDistinct("url")).alias("nr"),
                F.sum((F.col("status") == "not_modified").cast("long"))
                .alias("n3")).collect())
    saw_decay = False
    for a in agg:
        r = out[a.host]
        assert (r.n_revisits, r.n_304) == (a.nr, a.n3)
        fp = 0 if a.nr == 0 else (100 * a.n3) // a.nr
        assert r.fresh_pct == fp
        assert r.budget == max(1, (10 * (100 - min(fp, 80))) // 100)
        if a.nr > 0:
            # every revisit revalidated (same corpus) → full decay
            assert fp == 100 and r.budget == 2
            saw_decay = True
    assert saw_decay
