"""Bucketed-layout evidence: the seen-set anti-join over two tables
bucketed by url_hash must plan WITHOUT a shuffle on either side (the
co-located join the 100 TB deployment relies on)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from crawl4ai_spark.operators.bucketing import bucketed_anti_join, write_bucketed


def _urls(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("https://h"), F.pmod("id", F.lit(9)).cast("string"),
                 F.lit(".ex.com/p/"), F.col("id").cast("string")).alias("url"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
    )


def test_bucketed_anti_join_is_shuffle_free(spark):
    tag = uuid.uuid4().hex[:8]
    cand_t, seen_t = f"cand_{tag}", f"seen_{tag}"
    write_bucketed(_urls(spark, 0, 5000), cand_t, n_buckets=8)
    write_bucketed(_urls(spark, 2000, 7000), seen_t, n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the co-located layout (not a broadcast)
        # is what makes the join shuffle-free
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_anti_join(spark, cand_t, seen_t)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # neither side shuffles
        # and the answer is the plain anti-join answer
        got = j.count()
        want = _urls(spark, 0, 5000).join(
            _urls(spark, 2000, 7000).select("url_hash"), "url_hash", "left_anti"
        ).count()
        assert got == want == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {cand_t}")
        spark.sql(f"DROP TABLE IF EXISTS {seen_t}")
