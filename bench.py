"""Benchmark harness (driver contract): one JSON line to stdout.

Headline metric: URLs fetched+deduped per second through the crawl
engine (frontier select → fetch join → outlink extract → canonicalize →
xxhash64 → exact anti-join dedup → snapshot commit) over a synthetic
span corpus sized to the sf directory, in throughput mode (no global
order windows, politeness salted).

Also times a representative set of query-surface operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), forcing full
materialization via the noop sink (count() alone would let Catalyst
prune work).

Every measurement is best-of-BEST_OF internally (the box carries ~12
cores of background load from other tenants, see BENCH.md — single
runs swing 2x); the spread is reported alongside so the variance is
visible, not silently absorbed.

Scaling runs compare N=1 vs 4N=4 cores (NOT local[8] vs local[32]:
above ~8 threads memory bandwidth + background load cap speedup
regardless of engine quality — calibration rationale in BENCH.md) and
are produced by tools/bench_scaling.py, reported in BASELINE.md /
BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "url_canonicalize",
    "crawl_bfs_reachable",
    "politeness_select",
    "token_counts",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    "ann_cosine_topk",
    "ann_lsh_bucket",
    "ann_ivf_probe",
    "bm25_rank",
    "keywords_topn",
    "keyword_score",
    "redirects_resolve",
    "chunk_fixed",
    "chunk_sliding",
    "chunk_sentence",
    "chunk_semantic",
    "media_meta",
    "media_phash_dedup",
    "interleave_assemble",
    "spans_markdown",
    "spans_fit_filter",
    "events_tumbling",
    "events_sessionize",
    # round-4 session-6/7 tiers: graph feedback + mergeable sketches
    "opic_importance",
    "trustrank",
    "seen_cardinality_hll",
    "url_overlap_kmv",
    "template_heavy_hitters",
    # round-4 session-13 tier: index field/pruning + graph communities
    "index_anchor_rank",
    "index_topk_champion",
    "graph_lpa",
    # round-4 session-14 tier: lossless retrieval pruning, PQ ANN,
    # layout economics
    "index_maxscore",
    "ann_pq_adc",
    "zorder_scan_pruning",
    # round-5 (r4 verdict #7): the rest of the index/retrieval tier, so
    # regressions surface in BENCH_rN diffs like the dedup tier's did
    "inverted_postings",
    "index_search",
    "index_phrase",
    "index_snippets",
    "postings_compress",
    "spell_correct",
    "index_merge",
    "ann_ivfpq_probe",
]


def crawl_throughput(spark, work_dir: str, n_docs: int, n_hosts: int = 40) -> dict:
    """Fetch+dedupe throughput of the real engine in throughput (sweep)
    mode over a VirtualCorpus — the 10^10-entry synthetic frontier of
    the target metric: fetch synthesizes each document from its URL
    (O(batch)/round, the honest cost model for the scheduler; a corpus
    join would measure the join)."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import VirtualCorpus
    from crawl4ai_spark.operators.frontier import CrawlEngine

    vc = VirtualCorpus(n_docs=n_docs, n_hosts=n_hosts)
    seeds = vc.seed_urls(n_hosts - 1, 4096)
    cfg = CrawlConfig(
        seeds=seeds, max_depth=8, max_pages=None, include_external=True,
        politeness=False, respect_robots=False, track_order=False,
        round_size=None, max_rounds=6,
    )
    state = os.path.join(work_dir, "state")
    shutil.rmtree(state, ignore_errors=True)
    eng = CrawlEngine(spark, vc, cfg, state)
    t0 = time.monotonic()
    res = eng.run()
    elapsed = time.monotonic() - t0
    deduped = eng.url_seen().count()
    return {
        "fetched": res["fetched"],
        "rounds": res["rounds"],
        "deduped_urls": deduped,
        "crawl_sec": round(elapsed, 3),
        "urls_per_sec": round(res["fetched"] / elapsed, 1),
    }


def crawl_ordered_throughput(spark, work_dir: str, n_docs: int, n_hosts: int = 40) -> dict:
    """Ordered-mode (windowed-path) throughput: track_order=True with a
    round budget exercises the append-only frontier + pending anti-join
    + distributed top-k rank — the path real priority crawls take. Slower
    than sweep by design (per-round frontier scan + rank); reported so
    the ordered path's cost is measured, not assumed."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import VirtualCorpus
    from crawl4ai_spark.operators.frontier import CrawlEngine

    vc = VirtualCorpus(n_docs=n_docs, n_hosts=n_hosts)
    seeds = vc.seed_urls(n_hosts - 1, 4096)
    cfg = CrawlConfig(
        seeds=seeds, max_depth=8, max_pages=None, include_external=True,
        politeness=False, respect_robots=False, track_order=True,
        round_size=150_000, max_rounds=4,
    )
    state = os.path.join(work_dir, "state_ordered")
    shutil.rmtree(state, ignore_errors=True)
    eng = CrawlEngine(spark, vc, cfg, state)
    t0 = time.monotonic()
    res = eng.run()
    elapsed = time.monotonic() - t0
    return {
        "fetched": res["fetched"],
        "rounds": res["rounds"],
        "crawl_sec": round(elapsed, 3),
        "urls_per_sec": round(res["fetched"] / elapsed, 1),
    }


def crawl_scored_throughput(spark, work_dir: str, n_docs: int, n_hosts: int = 40) -> dict:
    """Graph-feedback ordered crawl (url_scores loop at scale): an
    UNMEASURED generation-(k-1) sweep builds the seen set, whose URLs
    become a url_scores table (hash pseudo-rank standing in for
    pagerank/OPIC — identical join shape, deterministic); the measured
    crawl then runs the ordered path WITH the per-round override join
    against that table. Measured so the feedback loop's cost at
    hundreds of thousands of override rows is a number, not a claim."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import VirtualCorpus
    from crawl4ai_spark.operators.frontier import CrawlEngine

    vc = VirtualCorpus(n_docs=n_docs, n_hosts=n_hosts)
    seeds = vc.seed_urls(n_hosts - 1, 4096)
    pre_cfg = CrawlConfig(
        seeds=seeds, max_depth=8, max_pages=None, include_external=True,
        politeness=False, respect_robots=False, track_order=False,
        max_rounds=3,
    )
    pre_state = os.path.join(work_dir, "state_scored_pre")
    shutil.rmtree(pre_state, ignore_errors=True)
    pre = CrawlEngine(spark, vc, pre_cfg, pre_state)
    pre.run()
    scores_path = os.path.join(work_dir, "url_scores")
    pre.url_seen().select(
        "url",
        (F.pmod(F.xxhash64("url"), F.lit(1000)).cast("double") / 1000)
        .alias("score"),
    ).write.mode("overwrite").parquet(scores_path)
    shutil.rmtree(pre_state, ignore_errors=True)
    scores = spark.read.parquet(scores_path)
    n_scores = scores.count()

    cfg = CrawlConfig(
        seeds=seeds, max_depth=8, max_pages=None, include_external=True,
        politeness=False, respect_robots=False, track_order=True,
        round_size=150_000, max_rounds=4,
    )
    state = os.path.join(work_dir, "state_scored")
    shutil.rmtree(state, ignore_errors=True)
    eng = CrawlEngine(spark, vc, cfg, state, url_scores=scores)
    t0 = time.monotonic()
    res = eng.run()
    elapsed = time.monotonic() - t0
    return {
        "fetched": res["fetched"],
        "rounds": res["rounds"],
        "n_scores": int(n_scores),
        "crawl_sec": round(elapsed, 3),
        "urls_per_sec": round(res["fetched"] / elapsed, 1),
    }


def crawl_polite_throughput(spark, work_dir: str, n_docs: int, n_hosts: int = 40) -> dict:
    """Politeness-budgeted ordered crawl: per-host per-round budgets
    (salted ×4) restrict selection, so rounds leave a remainder and the
    engine runs the materialized-pending path (table mode) + the
    politeness rank-and-limit windows — the full priority-crawl shape,
    measured rather than assumed."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import VirtualCorpus
    from crawl4ai_spark.operators.frontier import CrawlEngine

    vc = VirtualCorpus(n_docs=n_docs, n_hosts=n_hosts)
    seeds = vc.seed_urls(n_hosts - 1, 4096)
    budgets = spark.range(n_hosts).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example.com")).alias("host"),
        (F.lit(1500) + F.pmod(F.col("id"), F.lit(4)) * 500).cast("int").alias("budget"),
    )
    cfg = CrawlConfig(
        seeds=seeds, max_depth=8, max_pages=None, include_external=True,
        politeness=True, politeness_salts=4, respect_robots=False,
        track_order=True, round_size=150_000, max_rounds=4,
    )
    state = os.path.join(work_dir, "state_polite")
    shutil.rmtree(state, ignore_errors=True)
    eng = CrawlEngine(spark, vc, cfg, state, host_budgets=budgets)
    t0 = time.monotonic()
    res = eng.run()
    elapsed = time.monotonic() - t0
    return {
        "fetched": res["fetched"],
        "rounds": res["rounds"],
        "crawl_sec": round(elapsed, 3),
        "urls_per_sec": round(res["fetched"] / elapsed, 1),
    }


def crawl_retry_throughput(spark, work_dir: str, n_docs: int, n_hosts: int = 40) -> dict:
    """Sweep crawl with the retry path ON (5% deterministic transient
    failures, max_retries=2): measures what the backoff/redispatch
    machinery costs on top of the plain sweep — the retry snapshot
    read/overwrite per failing round plus the per-attempt die."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import VirtualCorpus
    from crawl4ai_spark.operators.frontier import CrawlEngine

    vc = VirtualCorpus(n_docs=n_docs, n_hosts=n_hosts)
    seeds = vc.seed_urls(n_hosts - 1, 4096)
    cfg = CrawlConfig(
        seeds=seeds, max_depth=8, max_pages=None, include_external=True,
        politeness=False, respect_robots=False, track_order=False,
        round_size=None, max_rounds=6,  # same as the plain sweep → comparable
        max_retries=2, retry_failure_every=20,
    )
    state = os.path.join(work_dir, "state_retry")
    shutil.rmtree(state, ignore_errors=True)
    eng = CrawlEngine(spark, vc, cfg, state)
    t0 = time.monotonic()
    res = eng.run()
    elapsed = time.monotonic() - t0
    n_tr = eng.pages().where("status = 'transient'").count()
    return {
        "fetched": res["fetched"],
        "rounds": res["rounds"],
        "transient": n_tr,
        "crawl_sec": round(elapsed, 3),
        "urls_per_sec": round(res["fetched"] / elapsed, 1),
    }


def crawl_recrawl_throughput(spark, work_dir: str, n_docs: int, n_hosts: int = 40) -> dict:
    """Freshness-loop cost (reopen → resume re-dispatch): after a
    4-round sweep, reopen one whole depth layer (~65k URLs) and resume.
    The revisit round pays the full re-fetch + outlink extract, and its
    extracted links are ~all already seen — so this measures the
    revisit path AND the seen-set dedup pressure a recrawl generates,
    rather than assuming revisits cost what first visits do."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import VirtualCorpus
    from crawl4ai_spark.operators.frontier import CrawlEngine

    vc = VirtualCorpus(n_docs=n_docs, n_hosts=n_hosts)
    seeds = vc.seed_urls(n_hosts - 1, 4096)
    cfg = CrawlConfig(
        seeds=seeds, max_depth=8, max_pages=None, include_external=True,
        politeness=False, respect_robots=False, track_order=False,
        round_size=None, max_rounds=4,
    )
    state = os.path.join(work_dir, "state_recrawl")
    shutil.rmtree(state, ignore_errors=True)
    eng = CrawlEngine(spark, vc, cfg, state)
    base = eng.run()
    due = eng.pages().where(F.col("depth") == 2).select("url")
    reopened = eng.reopen(due)
    # the round counter persists across resume: grant headroom for the
    # revisit rounds (reopen docstring)
    cfg2 = CrawlConfig(
        seeds=seeds, max_depth=8, max_pages=None, include_external=True,
        politeness=False, respect_robots=False, track_order=False,
        round_size=None, max_rounds=cfg.max_rounds + 2,
    )
    eng2 = CrawlEngine(spark, vc, cfg2, state)
    t0 = time.monotonic()
    res = eng2.run(resume=True)
    elapsed = time.monotonic() - t0
    refetched = res["fetched"] - base["fetched"]
    return {
        "reopened": reopened,
        "refetched": refetched,
        "crawl_sec": round(elapsed, 3),
        "urls_per_sec": round(refetched / max(elapsed, 1e-9), 1),
    }


def crawl_dedup_throughput(spark, work_dir: str, n_docs: int, n_hosts: int = 40) -> dict:
    """Content-seen dedup on a 25%-mirror corpus (VirtualCorpus
    mirror_every=4 — the duplicate-content share Heritrix reports for
    real crawls): the same sweep with content_dedup off vs on. The ON
    run skips outlink extraction for mirror copies (digest gate) at the
    cost of per-round digest-table maintenance; the ratio is the
    feature's NET throughput effect at this duplicate rate. Results are
    invariant by construction (tested), so off/on fetch identical sets."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import VirtualCorpus
    from crawl4ai_spark.operators.frontier import CrawlEngine

    vc = VirtualCorpus(n_docs=n_docs, n_hosts=n_hosts, mirror_every=4)
    seeds = vc.seed_urls(n_hosts - 1, 4096)
    out: dict = {}
    for label, flag in (("off", False), ("on", True)):
        cfg = CrawlConfig(
            seeds=seeds, max_depth=8, max_pages=None, include_external=True,
            politeness=False, respect_robots=False, track_order=False,
            round_size=None, max_rounds=5, content_dedup=flag,
        )
        state = os.path.join(work_dir, f"state_dedup_{label}")
        shutil.rmtree(state, ignore_errors=True)
        eng = CrawlEngine(spark, vc, cfg, state)
        t0 = time.monotonic()
        res = eng.run()
        elapsed = time.monotonic() - t0
        out[label] = {
            "fetched": res["fetched"],
            "crawl_sec": round(elapsed, 3),
            "urls_per_sec": round(res["fetched"] / elapsed, 1),
        }
    assert out["on"]["fetched"] == out["off"]["fetched"]
    out["mirror_rate"] = 0.25
    out["speedup_on_vs_off"] = round(
        out["on"]["urls_per_sec"] / out["off"]["urls_per_sec"], 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    from crawl4ai_spark.queries import queries as all_queries
    from crawl4ai_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    best_of = int(os.environ.get("SPARK_GRAFT_BEST_OF", "2"))
    qtimes: dict[str, float] = {}
    qspread: dict[str, list[float]] = {}
    qs = all_queries()
    for name in HEADLINE_QUERIES:
        fn = qs[name]
        runs = []
        for _ in range(best_of):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        qtimes[name] = min(runs)
        qspread[name] = runs

    n_docs = 10_000_000_000  # virtual frontier size (north-rule scale)
    # engine state on tmpfs: a single local disk serializes round commits
    # that a cluster spreads over its storage layer
    crawl_runs = []
    for i in range(best_of):
        work = f"/dev/shm/bench_crawl_{os.getpid()}_{i}"
        try:
            crawl_runs.append(crawl_throughput(spark, work, n_docs))
        finally:
            shutil.rmtree(work, ignore_errors=True)
    crawl = max(crawl_runs, key=lambda c: c["urls_per_sec"])

    # best-of-2 like every other measurement (run 1 pays one-time JIT/
    # codegen warmup for the ordered plan shapes; the spread is recorded)
    ordered_runs = []
    for i in range(best_of):
        work = f"/dev/shm/bench_ocrawl_{os.getpid()}_{i}"
        try:
            ordered_runs.append(crawl_ordered_throughput(spark, work, n_docs))
        finally:
            shutil.rmtree(work, ignore_errors=True)
    ordered = max(ordered_runs, key=lambda c: c["urls_per_sec"])

    # single run (tertiary metric): budgets bind → remainder path + the
    # politeness windows; measured so the full priority shape has a number
    work = f"/dev/shm/bench_pcrawl_{os.getpid()}"
    try:
        polite = crawl_polite_throughput(spark, work, n_docs)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # single run (tertiary metric): the retry/backoff path's cost
    work = f"/dev/shm/bench_rcrawl_{os.getpid()}"
    try:
        retry = crawl_retry_throughput(spark, work, n_docs)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # single run (tertiary metric): the freshness-loop revisit path
    work = f"/dev/shm/bench_fcrawl_{os.getpid()}"
    try:
        recrawl = crawl_recrawl_throughput(spark, work, n_docs)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # single run (tertiary metric): the graph-feedback override join
    work = f"/dev/shm/bench_scrawl_{os.getpid()}"
    try:
        scored = crawl_scored_throughput(spark, work, n_docs)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # single run (tertiary metric): content-seen dedup net effect on a
    # 25%-mirror corpus (off vs on inside the one call)
    work = f"/dev/shm/bench_dcrawl_{os.getpid()}"
    try:
        cdedup = crawl_dedup_throughput(spark, work, n_docs)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    total = round(sum(sum(r) for r in qspread.values())
                  + sum(c["crawl_sec"] for c in crawl_runs)
                  + sum(c["crawl_sec"] for c in ordered_runs)
                  + polite["crawl_sec"] + retry["crawl_sec"]
                  + recrawl["crawl_sec"] + scored["crawl_sec"]
                  + cdedup["off"]["crawl_sec"] + cdedup["on"]["crawl_sec"], 3)
    # Detail line FIRST (per-run spreads, for humans / BENCH.md); the
    # compact summary goes LAST so the driver's tail-capture parse always
    # sees one complete JSON object (BENCH_r03 lost its headline when the
    # single line outgrew the capture window).
    print(json.dumps({
        "detail": True,
        "best_of": best_of,
        "query_runs": qspread,
        "crawl_runs": [c["urls_per_sec"] for c in crawl_runs],
        "crawl_ordered_runs": [c["urls_per_sec"] for c in ordered_runs],
        "crawl_polite": polite,
        "crawl_retry": retry,
        "crawl_recrawl": recrawl,
        "crawl_scored": scored,
        "crawl_content_dedup": cdedup,
    }))
    print(json.dumps({
        "metric": "urls_fetched_deduped_per_sec",
        "value": crawl["urls_per_sec"],
        "unit": "urls/sec",
        "queries": qtimes,
        "sf": sf,
        "crawl": crawl,
        "crawl_ordered": ordered,
        "total_sec": total,
        "cpus": int(cpus),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
