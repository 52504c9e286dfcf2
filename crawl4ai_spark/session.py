"""SparkSession builder tuned for the crawl engine.

Local testing runs on ``local[N]`` (single JVM); the config choices are the
ones that matter on a real multi-executor cluster too:

* AQE on — runtime coalescing + skew-join splitting for the frontier/seen
  anti-joins (hot hosts produce skewed ``host`` keys).
* Arrow on — every Python-side stage is a pandas/Arrow UDF, never per-row.
* shuffle.partitions sized to cores at test scale; at 100 TB you size it to
  ~2-3x total cluster cores and let AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawl4ai-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # local[N] → N; a real cluster would use 2-3x total cores.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local-scale tuning: default 64m advisory size coalesces our
        # tens-of-MB test shuffles to 1-2 partitions, serializing writes
        # and scans; a real 100TB deployment keeps the defaults
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "512k")
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate adds size(arr)>0 under every explode;
        # PushDownPredicates then drags that predicate below our pinned
        # fold-width exchanges INTO the FileScan — re-evaluating the
        # whole signature fold (simhash/minhash/DSIR/span synthesis) on
        # the scan's single non-empty split (measured: dsir buckets
        # 7.0 s → 0.9 s without the rule). The inferred filter only
        # prunes empty arrays, which our computed arrays never are;
        # queries also use *_outer generators at the hot sites so plans
        # stay sane under sessions without this exclusion.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # ParallelGC: measured 30-40% faster than G1 on the nested-row
        # shuffle workload (allocation-heavy span structs)
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
