"""Structured Streaming tests: batch equivalence + stateful sessions."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_equals_batch(spark):
    from crawl4ai_spark.queries.crawlops import q_events_tumbling
    from crawl4ai_spark.queries.streamops import q_stream_tumbling

    got = {tuple(r) for r in q_stream_tumbling(spark, SF).collect()}
    want = {tuple(r) for r in q_events_tumbling(spark, SF).collect()}
    assert got == want


def test_stream_sessionize_with_flush_equals_batch(spark):
    """With flush-sentinel punctuation, the drained stream equals the
    batch sessionizer EXACTLY (open sessions are closed by the sentinel)."""
    from crawl4ai_spark.queries.crawlops import q_events_sessionize
    from crawl4ai_spark.queries.streamops import q_stream_sessionize

    got = {
        (r.user_id, r.session_idx, r.n_events, r.duration_s)
        for r in q_stream_sessionize(spark, SF).collect()
    }
    want = {
        (r.user_id, r.session_idx, r.n_events, r.duration_s)
        for r in q_events_sessionize(spark, SF).collect()
    }
    assert got == want


def test_stream_sessionize_unpunctuated_keeps_open_sessions(spark):
    """Without sentinels, only sessions closed by data are emitted: batch
    sessions minus each user's final (still-open) session."""
    import os
    import uuid as _uuid

    from crawl4ai_spark.queries.crawlops import q_events_sessionize
    from crawl4ai_spark.streaming.windows import read_events_stream, stream_sessionize

    name = f"sess_raw_{_uuid.uuid4().hex[:6]}"
    events = read_events_stream(spark, f"{SF}/events.parquet")
    q = (
        stream_sessionize(events)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", os.path.join(tempfile.mkdtemp(), "ckp"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_idx, r.n_events, r.duration_s)
        for r in spark.table(name).collect()
    }
    batch = q_events_sessionize(spark, SF)
    last = batch.groupBy("user_id").agg(F.max("session_idx").alias("mx"))
    closed = batch.join(last, "user_id").where(F.col("session_idx") != F.col("mx"))
    want = {
        (r.user_id, r.session_idx, r.n_events, r.duration_s)
        for r in closed.collect()
    }
    assert got == want


def test_stream_incremental_state_across_batches(spark):
    """Split events into two file batches; sessions spanning the file
    boundary must still be stitched by the state store."""
    import os

    from crawl4ai_spark.streaming.windows import (
        EVENTS_SCHEMA,
        stream_sessionize,
    )

    d = tempfile.mkdtemp(prefix="ev2_")
    ev = spark.read.parquet(f"{SF}/events.parquet").orderBy("ts").limit(2000)
    rows = ev.collect()
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], ev.schema).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "p1"))
    spark.createDataFrame(rows[half:], ev.schema).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "p2"))
    src = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(d + "/*/")
    )
    name = f"sess_{uuid.uuid4().hex[:6]}"
    q = (
        stream_sessionize(src)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    streamed = spark.table(name)
    # all emitted sessions have positive counts and no duplicates per key
    assert streamed.where(F.col("n_events") <= 0).count() == 0
    dupes = streamed.groupBy("user_id", "session_idx").count().where("count > 1").count()
    assert dupes == 0


def test_stream_dedup_urls_equals_batch_distinct(spark):
    """Streaming URL-seen dedup (dropDuplicates over canonical urls)
    drained with availableNow == batch countDistinct per host."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import canonicalize, url_host
    from crawl4ai_spark.queries.streamops import q_stream_dedup_urls

    got = {(r.host, r.n_seen) for r in q_stream_dedup_urls(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(7)).cast("string")
    variants = docs.select(F.explode(F.array(
        F.concat(F.lit("https://host"), h, F.lit(".example.com/p/"), i.cast("string")),
        F.concat(F.lit("HTTPS://HOST"), h, F.lit(".EXAMPLE.COM/p/"), i.cast("string"), F.lit("#sec")),
        F.concat(F.lit("https://host"), h, F.lit(".example.com:443/p/"), i.cast("string"), F.lit("?z=1&a=2")),
    )).alias("url_raw"))
    want = {
        (r.host, r.n_seen)
        for r in variants.select(canonicalize("url_raw").alias("url"))
        .groupBy(url_host(F.col("url")).alias("host"))
        .agg(F.countDistinct("url").alias("n_seen")).collect()
    }
    assert got == want


def test_stream_dedup_within_watermark_bounded_state(spark):
    """The bounded-state streaming dedup (dropDuplicatesWithinWatermark):
    the same events file fed twice dedups back to one row per event_id —
    the production shape of the streaming URL-seen filter (state evicted
    by watermark instead of growing forever)."""
    import os
    import tempfile
    import uuid as _uuid

    from crawl4ai_spark.streaming.windows import EVENTS_SCHEMA

    d = tempfile.mkdtemp(prefix="evdup_")
    for i in range(2):  # duplicate arrivals
        os.symlink(f"{SF}/events.parquet", os.path.join(d, f"copy{i}.parquet"))
    src = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(d)
    dedup = (
        src.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type").agg(F.count("*").alias("n"))
    )
    name = f"dedup_wm_{_uuid.uuid4().hex[:6]}"
    q = (
        dedup.writeStream.format("memory").queryName(name).outputMode("complete")
        .option("checkpointLocation", os.path.join(tempfile.mkdtemp(), "ckp"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {(r.event_type, r.n) for r in spark.table(name).collect()}
    want = {
        (r.event_type, r.n)
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type").agg(F.countDistinct("event_id").alias("n")).collect()
    }
    assert got == want


def test_stream_tumbling_bounded_state_default(spark):
    """VERDICT r2 #5: the DEFAULT n_users is approx_count_distinct
    (fixed-size HLL state per group — bounded at any user cardinality);
    the exact collect_set variant stays for the drain-equality oracle.
    The approx answer must track exact within HLL rsd (~5% default,
    generous 15% bound here for tiny groups)."""
    import os
    from crawl4ai_spark.streaming.windows import (
        read_events_stream, run_stream_to_table, stream_tumbling_agg)

    name = f"tumbling_approx_{uuid.uuid4().hex[:8]}"
    ckp = os.path.join(tempfile.gettempdir(), f"ckp_{name}")
    events = read_events_stream(spark, f"{SF}/events.parquet")
    run_stream_to_table(spark, stream_tumbling_agg(events), name, ckp)
    approx = {(r["window_start"], r["event_type"]): r["n_users"]
              for r in spark.table(name).collect()}

    name2 = f"tumbling_exact_{uuid.uuid4().hex[:8]}"
    ckp2 = os.path.join(tempfile.gettempdir(), f"ckp_{name2}")
    events2 = read_events_stream(spark, f"{SF}/events.parquet")
    run_stream_to_table(spark, stream_tumbling_agg(events2, exact_users=True), name2, ckp2)
    exact = {(r["window_start"], r["event_type"]): r["n_users"]
             for r in spark.table(name2).collect()}

    assert set(approx) == set(exact)
    for k, ex in exact.items():
        ap = approx[k]
        assert abs(ap - ex) <= max(2, 0.15 * ex), (k, ap, ex)


def test_stream_url_ingest_batch_boundary_invariant(spark, tmp_path):
    """The foreachBatch seen-store anti-join emits each new URL exactly
    once REGARDLESS of micro-batch boundaries: the documents source is
    split into 4 files drained one file per trigger (4 micro-batches,
    duplicates crossing every boundary via the %1000 hot set), and the
    feed must equal the one-shot batch anti-join."""
    import os

    from crawl4ai_spark.functions.urls import url_host
    from crawl4ai_spark.queries.streamops import _ingest_url
    from crawl4ai_spark.streaming.ingest import stream_frontier_ingest

    d = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    d.repartition(4).write.parquet(src)

    i = F.col("doc_id").cast("long")
    history = d.where(F.pmod(i, F.lit(3)) == 0).select(
        _ingest_url(i).alias("url"))
    history = history.select("url", url_host(F.col("url")).alias("host"))
    seen_dir, out_dir = str(tmp_path / "seen"), str(tmp_path / "out")
    history.write.parquet(seen_dir)

    docs = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    si = F.col("doc_id").cast("long")
    cand = docs.select(
        F.explode(F.array(_ingest_url(si), _ingest_url(F.pmod(si, F.lit(1000))))).alias("url")
    ).select("url", url_host(F.col("url")).alias("host"))
    stream_frontier_ingest(spark, cand, seen_dir, out_dir, str(tmp_path / "ckp"))

    # >1 micro-batch actually ran (one commit file per drained trigger)
    batches = [f for f in os.listdir(str(tmp_path / "ckp") + "/commits") if f.isdigit()]
    assert len(batches) > 1, f"expected multiple micro-batches, got {batches}"
    got = [r.url for r in spark.read.parquet(out_dir).collect()]
    assert len(got) == len(set(got)), "a URL was emitted twice across batches"

    batch_cand = d.select(
        F.explode(F.array(_ingest_url(i), _ingest_url(F.pmod(i, F.lit(1000))))).alias("url"))
    want = {r.url for r in batch_cand.distinct()
            .join(history.select("url"), "url", "left_anti").collect()}
    assert set(got) == want
    # the seen store ends as history + feed exactly
    n_store = spark.read.parquet(seen_dir).count()
    assert n_store == history.count() + len(got)


def test_stream_hll_registers_boundary_invariant(spark, tmp_path):
    """The streaming HLL register store, drained one file per trigger
    (4 micro-batches, duplicates crossing every boundary), max-merges to
    EXACTLY the batch sketch over all data — register max is
    commutative/associative/idempotent, so the estimate cannot depend on
    how the source split."""
    import os

    from crawl4ai_spark.functions.hashing import h60
    from crawl4ai_spark.queries.sketchops import hll_estimate, hll_register_cols
    from crawl4ai_spark.streaming.ingest import (read_hll_registers,
                                                 stream_hll_registers)

    d = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    d.repartition(4).write.parquet(src)

    def urls(df):
        i = F.col("doc_id").cast("long")
        # %500 folds introduce heavy cross-file duplicates
        return df.select(F.explode(F.array(
            F.concat(F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
                     F.lit(".example.com/p/"), i.cast("string")),
            F.concat(F.lit("https://host"),
                     F.pmod(F.pmod(i, F.lit(500)), F.lit(7)).cast("string"),
                     F.lit(".example.com/p/"), F.pmod(i, F.lit(500)).cast("string")),
        )).alias("url"))

    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    regs_dir = str(tmp_path / "regs")
    stream_hll_registers(spark, urls(stream), regs_dir, str(tmp_path / "ckp"))

    batches = [f for f in os.listdir(str(tmp_path / "ckp") + "/commits") if f.isdigit()]
    assert len(batches) > 1, f"expected multiple micro-batches, got {batches}"
    # store holds per-batch register rows; the merge equals the batch twin
    idx, rho = hll_register_cols(h60(F.col("url")))
    want = {(r.idx, r.m) for r in
            urls(d).select(idx.alias("idx"), rho.alias("rho"))
            .groupBy("idx").agg(F.max("rho").alias("m")).collect()}
    got = {(r.idx, r.m) for r in read_hll_registers(spark, regs_dir).collect()}
    assert got == want
    # estimate lands near the exact distinct count (64 registers -> 13% sigma)
    est = hll_estimate(read_hll_registers(spark, regs_dir)).collect()[0].est
    exact = urls(d).distinct().count()
    assert abs(est - exact) / exact <= 0.5


def test_stream_host_bytes_boundary_invariant(spark, tmp_path):
    """The streaming bandwidth meter, drained one file per trigger,
    sum-merges to EXACTLY the batch per-host totals — integer sums are
    commutative/associative, so the meter cannot depend on how the
    source split. The merged rows drive host_budgets_from_bytes
    identically to batch-derived evidence."""
    import os

    from crawl4ai_spark.queries.schedops import host_budgets_from_bytes
    from crawl4ai_spark.streaming.ingest import (read_host_bytes,
                                                 stream_host_bytes)

    d = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    d.repartition(4).write.parquet(src)

    def pages(df):
        i = F.col("doc_id").cast("long")
        return df.select(
            F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                     F.lit(".example.com")).alias("host"),
            F.octet_length(F.coalesce(F.col("text"), F.lit("")))
            .cast("long").alias("nbytes"),
        )

    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    meter_dir = str(tmp_path / "meter")
    stream_host_bytes(spark, pages(stream), meter_dir, str(tmp_path / "ckp"))

    batches = [f for f in os.listdir(str(tmp_path / "ckp") + "/commits")
               if f.isdigit()]
    assert len(batches) > 1, f"expected multiple micro-batches, got {batches}"
    want = {(r.host, r.n, r.t) for r in
            pages(d).groupBy("host").agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("nbytes").cast("long").alias("t")).collect()}
    got = {(r.host, r.n_pages, r.total_bytes) for r in
           read_host_bytes(spark, meter_dir).collect()}
    assert got == want

    # streamed evidence drives the bytes leg exactly like batch evidence
    per_page = pages(d).select("host", F.lit("fetched").alias("status"),
                               "nbytes")
    base = (per_page.select("host").distinct()
            .withColumn("budget", F.lit(1000)))
    want_b = {r.host: r.budget for r in host_budgets_from_bytes(
        per_page, base, 50_000, nbytes_col="nbytes").collect()}
    # derive the same budgets straight from the merged meter's
    # (n_fetched, total_bytes) evidence: avg = total div n
    got_rows = read_host_bytes(spark, meter_dir).collect()
    for r in got_rows:
        avg = r.total_bytes // r.n_pages
        cap = 1000 if avg == 0 else min(1000, max(1, 50_000 // avg))
        assert want_b[r.host] == max(1, cap)


def test_stream_robots_gate_boundary_invariant(spark, tmp_path):
    """The stream-static REP gate is stateless, so splitting the source
    into 4 one-file micro-batches must yield exactly the one-shot batch
    gate's allowed set — and blocked rows must actually exist (the
    /login paths on ruled hosts outside the carve-out)."""
    import os

    from crawl4ai_spark.functions.urls import (rep_best_match, url_host,
                                               url_path)
    from crawl4ai_spark.streaming.ingest import stream_robots_gate

    d = spark.read.parquet(f"{SF}/documents.parquet")
    src = str(tmp_path / "src")
    d.repartition(4).write.parquet(src)

    rules = spark.createDataFrame(
        [(f"host{h}.example.com", ["/login"], ["/login/p/1"])
         for h in range(7) if h % 5 == 0],
        "host string, dis array<string>, alw array<string>",
    )

    def to_urls(df):
        i = F.col("doc_id").cast("long")
        path = F.concat(
            F.lit("/"),
            F.when(F.pmod(i, F.lit(13)) == 0, F.lit("login/p"))
            .otherwise(F.lit("p")),
            F.lit("/"), i.cast("string"),
        )
        return df.select(
            i.alias("doc_id"),
            F.concat(F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
                     F.lit(".example.com"), path).alias("url"),
        )

    docs = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    stream_robots_gate(spark, to_urls(docs), rules, out_dir,
                       str(tmp_path / "ckp"))

    batches = [f for f in os.listdir(str(tmp_path / "ckp") + "/commits")
               if f.isdigit()]
    assert len(batches) > 1, f"expected multiple micro-batches, got {batches}"

    got = {(r.doc_id, r.url)
           for r in spark.read.parquet(out_dir).collect()}
    b = (
        to_urls(d)
        .withColumn("host", url_host(F.col("url")))
        .withColumn("path", url_path(F.col("url")))
        .join(F.broadcast(rules), "host", "left")
    )
    want = {
        (r.doc_id, r.url)
        for r in b.where(
            rep_best_match(F.col("path"), F.col("dis"))
            <= rep_best_match(F.col("path"), F.col("alw"))
        ).collect()
    }
    assert got == want
    n_all = d.count()
    assert len(got) < n_all, "gate must block some /login rows"
