"""Physical-plan audit over the whole query surface.

For every ``queries()`` entry, builds the DataFrame at sf0.01 and greps
the executed plan for the anti-patterns the engine promises to avoid:

* ``CartesianProduct``       — non-broadcast cross join (always flagged)
* ``BatchEvalPython``        — row-at-a-time Python (always flagged)
* ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``
                             — vectorized Python; flagged only for
                               queries NOT declared UDF-based
* ``Exchange SinglePartition`` feeding a Window whose input is unbounded
                             — flagged unless the query is a final
                               top-k/rank over an already-reduced set
                               (declared below)

Prints one line per query plus a machine-readable summary; exits 1 on
any flag. Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

# queries whose semantics REQUIRE vectorized Python (Arrow UDFs)
UDF_QUERIES = {
    "chunk_fixed", "chunk_overlapping", "chunk_sentence", "chunk_semantic",
    "media_meta", "media_frames", "media_features_hist", "media_phash_dedup",
    "media_caption_score", "interleave_assemble", "warc_parse",
    "stream_tumbling", "stream_sessionize", "stream_dedup_urls", "stream_sliding",
}
# queries whose FINAL step is a global rank over an already-reduced set
# (bounded candidates: top-k re-rank, per-group heads) — a terminal
# SinglePartition window there is the correct plan, not a smell
FINAL_RANK_QUERIES = {
    "ann_cosine_topk", "ann_lsh_bucket", "ann_ivf_probe",
    "keywords_topn", "politeness_select",
    # top-k first (TakeOrderedAndProject), then rank over <=K rows
    "index_search", "bpe_pair_counts",
}
# streaming queries execute via writeStream; their batch-plan dump is
# not meaningful here
SKIP = {"stream_tumbling", "stream_sessionize", "stream_dedup_urls", "stream_sliding"}


def main() -> int:
    from crawl4ai_spark.queries import queries as all_queries
    from crawl4ai_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    flags: dict[str, list[str]] = {}
    stats: dict[str, dict] = {}
    for name, fn in sorted(all_queries().items()):
        if name in SKIP:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        bad: list[str] = []
        if "CartesianProduct" in plan:
            bad.append("cartesian")
        if "BatchEvalPython" in plan:
            bad.append("row_python")
        if name not in UDF_QUERIES and (
            "ArrowEvalPython" in plan or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
        ):
            bad.append("unexpected_python")
        if name not in FINAL_RANK_QUERIES:
            # a SinglePartition exchange is only a smell when a Window
            # consumes it (global rank over unbounded input); a global
            # scalar aggregate's final 1-row exchange is normal. Parents
            # print above children: look back a short span for Window.
            idx = 0
            while True:
                idx = plan.find("Exchange SinglePartition", idx)
                if idx == -1:
                    break
                if "Window" in plan[max(0, idx - 400):idx]:
                    bad.append("single_partition_window")
                    break
                idx += 1
        stats[name] = {
            "exchanges": plan.count("Exchange "),
            "codegen_spans": plan.count("*("),  # WholeStageCodegen markers
            "pushed_filters": "PushedFilters: [" in plan
                              and "PushedFilters: []" not in plan,
        }
        if bad:
            flags[name] = bad
        mark = "FLAG " + ",".join(bad) if bad else "ok"
        print(f"{name:28s} exch={stats[name]['exchanges']:2d} "
              f"codegen={stats[name]['codegen_spans']:2d} {mark}")

    print(json.dumps({"flagged": flags, "n_queries": len(stats)}))
    spark.stop()
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
