"""CrawlEngine.fsck(): state-table integrity audit.

A clean crawl's state dir is all-zeros; targeted tampering with the
snapshot tables (a foreign writer / bit-rot stand-in) trips exactly the
checks that guard the violated invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.operators.frontier import CrawlEngine
from tests.test_crawl import get_seeds


def _run(spark, corpus_dir, tmp_path, name, **cfg_kw):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    cfg = CrawlConfig(seeds=get_seeds(spark, corpus_dir), strategy="bfs",
                      max_depth=3, max_pages=30, respect_robots=False,
                      **cfg_kw)
    eng = CrawlEngine(spark, docs, cfg, str(tmp_path / name))
    eng.run()
    return eng


def test_fsck_clean_run_all_zeros(spark, corpus_dir, tmp_path):
    eng = _run(spark, corpus_dir, tmp_path, "clean")
    got = {r.check: r.n_violations for r in eng.fsck().collect()}
    assert got and all(v == 0 for v in got.values()), got
    # the core checks all ran on this state dir
    for c in ("pages_url_in_seen", "resolved_rank_unique",
              "page_host_matches_url", "transient_unresolved",
              "frontier_hash_unique", "frontier_hash_consistent"):
        assert c in got, c


def test_fsck_flags_tampered_tables(spark, corpus_dir, tmp_path):
    eng = _run(spark, corpus_dir, tmp_path, "tamper")
    spark_ = eng.spark

    # foreign writer appends a pages row with an unseen hash, a
    # colliding rank, and a host that no longer matches the URL
    p = eng.pages_tbl.read(spark_)
    bad_page = (
        p.orderBy("rank").limit(1)
        .withColumn("url_hash", F.lit(-123456789).cast("long"))
        .withColumn("url", F.lit("https://evil.invalid/x"))
    )
    eng.pages_tbl.append(bad_page)

    # and a frontier row whose stored hash no longer matches its URL
    fr = eng.frontier_tbl.read(spark_)
    bad_fr = (
        fr.limit(1)
        .withColumn("url_hash", F.lit(-987654321).cast("long"))
        .withColumn("discovered_round", F.lit(9999).cast(
            dict(fr.dtypes)["discovered_round"]))
    )
    eng.frontier_tbl.append(bad_fr)

    got = {r.check: r.n_violations for r in eng.fsck().collect()}
    assert got["pages_url_in_seen"] >= 1
    assert got["resolved_rank_unique"] >= 1
    assert got["page_host_matches_url"] >= 1
    assert got["frontier_hash_consistent"] >= 1
    # untouched invariants stay clean
    assert got["transient_unresolved"] == 0


def test_fsck_reports_documented_retry_truncation(spark, corpus_dir,
                                                  tmp_path):
    """A crawl truncated while transient retries were pending leaves
    transient-only ranks in the log (the documented max_pages caveat) —
    fsck surfaces them as transient_unresolved instead of hiding them."""
    eng = _run(spark, corpus_dir, tmp_path, "trunc",
               max_retries=2, retry_failure_every=3, max_rounds=2)
    got = {r.check: r.n_violations for r in eng.fsck().collect()}
    # fsck's count equals the log's actual transient-only ranks, and the
    # truncated run left at least one (failures from the final round
    # have no later round to resolve in)
    p = eng.pages()
    expected = (p.groupBy("rank")
                .agg(F.max((F.col("status") != "transient").cast("int"))
                     .alias("r"))
                .where("r = 0").count())
    assert got["transient_unresolved"] == expected >= 1
    # everything structural is still sound
    assert got["pages_url_in_seen"] == 0
    assert got["resolved_rank_unique"] == 0
    assert got["frontier_hash_consistent"] == 0


def test_fsck_survives_compaction_and_reopen(spark, corpus_dir, tmp_path):
    """Compacting every state table and running a reopen() revisit
    generation must keep the audit all-zeros — fsck is the check an
    operator runs exactly after these maintenance events."""
    eng = _run(spark, corpus_dir, tmp_path, "maint")
    for tbl in (eng.frontier_tbl, eng.pages_tbl, eng.seen_tbl,
                eng.metrics_tbl):
        tbl.compact(spark, target_bytes=1 << 20, min_files=2)
    got = {r.check: r.n_violations for r in eng.fsck().collect()}
    assert got and all(v == 0 for v in got.values()), got

    # reopen a slice of fetched URLs; the revisit generation appends
    # re-dispatch + resolution rows and the invariants must hold
    due = eng.pages(resolved=True).select("url").limit(5)
    n = eng.reopen(due)
    assert n > 0
    eng.run(resume=True)
    got2 = {r.check: r.n_violations for r in eng.fsck().collect()}
    assert got2 and all(v == 0 for v in got2.values()), got2
