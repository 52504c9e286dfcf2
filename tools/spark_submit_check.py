"""spark-submit --py-files packaging check (north-rule deployment shape).

Zips the ``crawl4ai_spark`` package, then launches a REAL
``spark-submit --py-files crawl4ai_spark.zip`` job (fresh JVM + fresh
Python driver, package importable ONLY from the zip) that runs a small
end-to-end crawl + one oracle query and prints a JSON verdict. This is
the deployment path a multi-executor cluster uses; local[] master stands
in for the cluster manager, the packaging/import mechanics are identical.

Usage: python tools/spark_submit_check.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, shutil, sys, tempfile

# the package must resolve from the --py-files zip, not the repo
assert not any(p.rstrip("/").endswith("repo") for p in sys.path[:1]), sys.path[:1]
import crawl4ai_spark
assert ".zip" in crawl4ai_spark.__file__, crawl4ai_spark.__file__

from pyspark.sql import SparkSession
from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.fixtures import VirtualCorpus
from crawl4ai_spark.operators.frontier import CrawlEngine
from crawl4ai_spark.queries import queries

spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

vc = VirtualCorpus(n_docs=300, n_hosts=8)
work = tempfile.mkdtemp(prefix="submit_check_")
cfg = CrawlConfig(seeds=vc.seed_urls(7, 2), strategy="bfs", max_depth=3,
                  max_pages=40, round_size=10, respect_robots=False)
eng = CrawlEngine(spark, vc, cfg, work + "/state")
res = eng.run()
n_pages = eng.pages().count()
q = queries()["url_canonicalize"](spark, "/root/testdata/sf0.001").count()
shutil.rmtree(work, ignore_errors=True)
print("SUBMIT_CHECK " + json.dumps(
    {"fetched": res["fetched"], "rounds": res["rounds"],
     "pages": n_pages, "url_canonicalize_rows": q,
     "pkg": crawl4ai_spark.__file__}))
spark.stop()
"""


def main() -> int:
    with tempfile.TemporaryDirectory(prefix="pyfiles_") as tmp:
        zpath = os.path.join(tmp, "crawl4ai_spark.zip")
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
            pkg = os.path.join(REPO, "crawl4ai_spark")
            for root, _dirs, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, REPO))
        job = os.path.join(tmp, "job.py")
        with open(job, "w") as f:
            f.write(JOB)
        out = subprocess.run(
            ["spark-submit", "--master", "local[4]",
             "--conf", "spark.sql.shuffle.partitions=8",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zpath, job],
            capture_output=True, text=True, timeout=600,
            cwd=tmp,  # NOT the repo — the zip must be the only import source
        )
        for line in out.stdout.splitlines():
            if line.startswith("SUBMIT_CHECK"):
                print(line)
                doc = json.loads(line.split(" ", 1)[1])
                ok = doc["fetched"] > 0 and doc["pages"] == doc["fetched"] and doc["url_canonicalize_rows"] > 0
                print("PASS" if ok else "FAIL")
                return 0 if ok else 1
        print("FAIL: no SUBMIT_CHECK line\n" + out.stdout[-2000:] + out.stderr[-2000:])
        return 1


if __name__ == "__main__":
    sys.exit(main())
