"""Hard-kill durability: SIGKILL a crawling subprocess mid-round, then
resume on the same state dir — final tables must equal an uninterrupted
run EXACTLY, wherever the kill landed (north rule: a killed run resumes
exactly; tables.Checkpoint makes partial commits invisible)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
sys.path.insert(0, sys.argv[1])
from crawl4ai_spark.session import get_spark
from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.operators.frontier import CrawlEngine

repo, corpus, state, seed = sys.argv[1:5]
spark = get_spark(app_name="killme", master="local[2]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(corpus + "/documents.parquet")
cfg = CrawlConfig(seeds=[seed], strategy="bfs", max_depth=4, max_pages=60,
                  round_size=8, respect_robots=False)
CrawlEngine(spark, docs, cfg, state).run()
print("CHILD_DONE", flush=True)
"""


def test_sigkill_mid_crawl_resume_exact(spark, corpus_dir, tmp_path):
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.operators.frontier import CrawlEngine

    from test_crawl import get_seeds

    seed = get_seeds(spark, corpus_dir)[0]
    cfg = CrawlConfig(seeds=[seed], strategy="bfs", max_depth=4, max_pages=60,
                      round_size=8, respect_robots=False)

    # uninterrupted reference run
    full = CrawlEngine(spark, spark.read.parquet(f"{corpus_dir}/documents.parquet"),
                       cfg, str(tmp_path / "full"))
    full.run()

    # child crawl, SIGKILLed partway (after JVM warmup + a few rounds)
    state = str(tmp_path / "killed")
    p = subprocess.Popen(
        [sys.executable, "-c", CHILD, REPO, corpus_dir, state, seed],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, cwd=REPO,
    )
    deadline = time.time() + 120
    ckp_dir = os.path.join(state, "checkpoints")
    killed = False
    while time.time() < deadline:
        if p.poll() is not None:
            break  # finished before we killed it — resume is then a no-op
        if os.path.isdir(ckp_dir) and len(os.listdir(ckp_dir)) >= 2:
            os.kill(p.pid, signal.SIGKILL)
            killed = True
            break
        time.sleep(0.3)
    p.wait()
    assert killed or p.returncode == 0, "child neither progressed nor finished"

    resumed = CrawlEngine(spark, spark.read.parquet(f"{corpus_dir}/documents.parquet"),
                          cfg, state)
    resumed.run(resume=True)

    a = [(r.rank, r.url, r.depth, r.status) for r in full.pages().orderBy("rank").collect()]
    b = [(r.rank, r.url, r.depth, r.status) for r in resumed.pages().orderBy("rank").collect()]
    assert a == b
    sa = {(r.url, r.state) for r in full.url_seen().collect()}
    sb = {(r.url, r.state) for r in resumed.url_seen().collect()}
    assert sa == sb
