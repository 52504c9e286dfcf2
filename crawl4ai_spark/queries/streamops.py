"""Structured Streaming queries (driver-checkable).

``stream_tumbling`` drains the events table through a real streaming
query (file source → watermark → windowed agg → memory sink,
availableNow trigger) and must equal the BATCH oracle — same SQL as
``events_tumbling`` — because a fully-drained availableNow run with no
late data is batch-equivalent.

``stream_sessionize`` exercises applyInPandasWithState. The drain
appends one FLUSH_EVENT sentinel per user (end-of-stream punctuation,
stamped after every real event) so open sessions are closed by data —
the drained stream then equals the batch ``events_sessionize`` oracle
row-for-row, which is how it is checked.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windows import (
    read_documents_stream,
    read_events_stream,
    run_stream_to_table,
    stream_dedup_urls,
    stream_sessionize,
    stream_sliding_agg,
    stream_tumbling_agg,
    write_flush_sentinels,
)
from .registry import query

_SESSIONIZE_ORACLE = """
    WITH marked AS (
        -- floor(epoch(..)) matches Spark's unix_timestamp() second-floor
        SELECT user_id, ts, event_id,
               CASE WHEN floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
        FROM marked
    )
    SELECT user_id::BIGINT AS user_id, session_idx,
           count(*)::BIGINT AS n_events,
           (floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT) AS duration_s
    FROM sess GROUP BY 1, 2
"""

_TUMBLING_ORACLE = """
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents,
           count(DISTINCT user_id)::BIGINT AS n_users
    FROM events GROUP BY 1, 2
"""


@query("stream_tumbling", _TUMBLING_ORACLE)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    ckp = os.path.join(tempfile.gettempdir(), f"ckp_{name}")
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    # exact_users: the drain-equality oracle compares against the batch
    # twin's exact countDistinct; a continuous deployment uses the
    # default bounded-state approx_count_distinct variant instead
    run_stream_to_table(spark, stream_tumbling_agg(events, exact_users=True), name, ckp)
    return spark.table(name).select(
        "window_start", "event_type", "n_events", "sum_cents", "n_users"
    )


from ..functions.urls import canonicalize_sql as _canon_sql

_SLIDING_ORACLE = """
    WITH w AS (
        SELECT epoch(time_bucket(INTERVAL '30 minutes', ts))::BIGINT - u.k * 1800 AS window_start,
               event_type, value
        FROM events, unnest([0, 1]) AS u(k)
    )
    SELECT window_start, event_type,
           count(*)::BIGINT AS n_events,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
    FROM w GROUP BY 1, 2
"""


@query("stream_sliding", _SLIDING_ORACLE)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window streaming agg drained availableNow == the batch
    ``events_sliding`` oracle (fully-drained, no late data)."""
    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    ckp = os.path.join(tempfile.gettempdir(), f"ckp_{name}")
    events = read_events_stream(spark, f"{sf_dir}/events.parquet")
    run_stream_to_table(spark, stream_sliding_agg(events), name, ckp)
    return spark.table(name).select("window_start", "event_type", "n_events", "sum_cents")


_DEDUP_ORACLE = f"""
    WITH variants AS (
        SELECT u.url_raw
        FROM documents d,
             unnest([
                'https://host' || (d.doc_id % 7)::VARCHAR || '.example.com/p/' || d.doc_id::VARCHAR,
                'HTTPS://HOST' || (d.doc_id % 7)::VARCHAR || '.EXAMPLE.COM/p/' || d.doc_id::VARCHAR || '#sec',
                'https://host' || (d.doc_id % 7)::VARCHAR || '.example.com:443/p/' || d.doc_id::VARCHAR || '?z=1&a=2'
             ]) AS u(url_raw)
    ),
    canon AS (
        SELECT {_canon_sql('url_raw', 'duckdb')} AS url FROM variants
    )
    SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           count(DISTINCT url)::BIGINT AS n_seen
    FROM canon GROUP BY 1
"""


@query("stream_dedup_urls", _DEDUP_ORACLE)
def q_stream_dedup_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming URL-seen dedup (north rule's seen set as a Structured
    Streaming operator): stream the documents source, derive the three
    messy URL variants per doc (same variants as the batch
    ``url_seen_fold``), canonicalize, dropDuplicates on the canonical
    url, count per host — a fully-drained availableNow run equals the
    batch distinct."""
    from ..functions.urls import canonicalize

    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    ckp = os.path.join(tempfile.gettempdir(), f"ckp_{name}")
    docs = read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(7)).cast("string")
    variants = docs.select(
        F.explode(
            F.array(
                F.concat(F.lit("https://host"), h, F.lit(".example.com/p/"), i.cast("string")),
                F.concat(F.lit("HTTPS://HOST"), h, F.lit(".EXAMPLE.COM/p/"), i.cast("string"), F.lit("#sec")),
                F.concat(F.lit("https://host"), h, F.lit(".example.com:443/p/"), i.cast("string"), F.lit("?z=1&a=2")),
            )
        ).alias("url_raw")
    )
    deduped = stream_dedup_urls(variants.select(canonicalize("url_raw").alias("url")))
    run_stream_to_table(spark, deduped, name, ckp)
    return spark.table(name).select("host", "n_seen")


@query("stream_sessionize", _SESSIONIZE_ORACLE)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    ckp = os.path.join(tempfile.gettempdir(), f"ckp_{name}")
    # stream dir = the real events file + one flush sentinel per user
    # (punctuation closing open sessions at drain end)
    d = tempfile.mkdtemp(prefix="events_flush_")
    os.symlink(f"{sf_dir}/events.parquet", os.path.join(d, "events.parquet"))
    write_flush_sentinels(spark, f"{sf_dir}/events.parquet", d)
    events = read_events_stream(spark, d)
    q = (
        stream_sessionize(events)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("user_id", "session_idx")


# --------------------------------------------------------------------------- #
# stream-static frontier ingest: continuous URL discovery vs the seen store
# --------------------------------------------------------------------------- #
_INGEST_ORACLE = """
    WITH cand AS (
        SELECT DISTINCT 'https://host' || (x.id % 7)::VARCHAR || '.example.com/p/' || x.id::VARCHAR AS url
        FROM (
            SELECT doc_id::BIGINT AS id FROM documents
            UNION ALL
            SELECT (doc_id % 1000)::BIGINT FROM documents
        ) x
    ),
    hist AS (
        SELECT 'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/' || doc_id::VARCHAR AS url
        FROM documents WHERE doc_id % 3 = 0
    )
    SELECT url, regexp_extract(url, 'https://([^/]+)/', 1) AS host
    FROM cand WHERE url NOT IN (SELECT url FROM hist)
"""


def _ingest_url(i):
    return F.concat(
        F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
        F.lit(".example.com/p/"), i.cast("string"),
    )


@query("stream_url_ingest", _INGEST_ORACLE)
def q_stream_url_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl engine's URL-seen anti-join as a CONTINUOUS stage
    (streaming/ingest.py): discovered URLs stream in (each doc yields
    its own URL + a hot-set URL, so batches carry heavy duplicates), a
    foreachBatch anti-join against the durable seen store — pre-seeded
    with crawl history (doc_id % 3 == 0) — emits each genuinely new URL
    exactly once and appends it to the store. The drained feed equals
    the one-shot batch anti-join regardless of micro-batch boundaries
    (boundary invariance is pinned in tests/test_streaming.py)."""
    from ..functions.urls import url_host
    from ..streaming.ingest import stream_frontier_ingest

    run = f"ingest_{uuid.uuid4().hex[:8]}"
    base = os.path.join(tempfile.gettempdir(), run)
    seen_dir, out_dir = os.path.join(base, "seen"), os.path.join(base, "out")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("long")
    history = d.where(F.pmod(i, F.lit(3)) == 0).select(_ingest_url(i).alias("url"))
    history = history.select("url", url_host(F.col("url")).alias("host"))
    history.write.parquet(seen_dir)

    docs = read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    si = F.col("doc_id").cast("long")
    cand = docs.select(
        F.explode(F.array(_ingest_url(si), _ingest_url(F.pmod(si, F.lit(1000))))).alias("url")
    ).select("url", url_host(F.col("url")).alias("host"))
    stream_frontier_ingest(spark, cand, seen_dir, out_dir, os.path.join(base, "ckp"))
    return spark.read.parquet(out_dir)


# --------------------------------------------------------------------------- #
# streaming HLL cardinality: the seen-set distinct estimate as a
# continuous stage (streaming/ingest.stream_hll_registers)
# --------------------------------------------------------------------------- #
def _hll_stream_oracle() -> str:
    from .sketchops import (HLL_C, HLL_LC_CUT, HLL_M, HLL_POW_W, HLL_W,
                            _HLL_LC_SQL, _VARIANTS_SQL)
    from ..functions.hashing import h60_sql

    return f"""
    WITH {_VARIANTS_SQL},
    hs AS (SELECT {h60_sql('url')} AS h FROM urls),
    rho AS (
        SELECT h // {HLL_POW_W} AS idx,
               (CASE WHEN h % {HLL_POW_W} = 0 THEN {HLL_W + 1}
                     ELSE {HLL_W + 1} - length(bin(h % {HLL_POW_W})) END) AS rho
        FROM hs
    ),
    regs AS (SELECT idx, max(rho) AS m FROM rho GROUP BY 1),
    agg AS (
        SELECT count(*)::BIGINT AS n_present,
               sum((1::BIGINT << ({HLL_W} - m)))::BIGINT AS s_present
        FROM regs
    ),
    st AS (
        SELECT ({HLL_M} - n_present)::BIGINT AS v_zero,
               (s_present + ({HLL_M} - n_present) * {HLL_POW_W})::BIGINT AS s_fixed
        FROM agg
    )
    SELECT v_zero, s_fixed,
           round(CASE WHEN ({HLL_C!r} / s_fixed) <= {HLL_LC_CUT!r} AND v_zero > 0
                      THEN {_HLL_LC_SQL}[v_zero + 1]
                      ELSE {HLL_C!r} / s_fixed END, 2) AS est
    FROM st
    """


@query("stream_cardinality_hll", _hll_stream_oracle())
def q_stream_cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous distinct-URL cardinality of the seen stream: the
    messy-variant URL stream (duplicates INCLUDED — register max is
    idempotent, so HLL needs no dropDuplicates state at all, unlike the
    exact dedup twin) folds per micro-batch into 64 registers appended
    to a durable store; the estimate is the max-merge of the store.
    Batch-boundary invariant by construction, so the fully-drained
    availableNow run equals the batch sketch the DuckDB oracle
    computes over the distinct canonical URLs."""
    from ..functions.urls import canonicalize
    from ..streaming.ingest import read_hll_registers, stream_hll_registers
    from .sketchops import hll_estimate

    name = f"stream_hll_{uuid.uuid4().hex[:8]}"
    ckp = os.path.join(tempfile.gettempdir(), f"ckp_{name}")
    regs_dir = os.path.join(tempfile.gettempdir(), f"regs_{name}")
    docs = read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(7)).cast("string")
    variants = docs.select(
        F.explode(
            F.array(
                F.concat(F.lit("https://host"), h, F.lit(".example.com/p/"), i.cast("string")),
                F.concat(F.lit("HTTPS://HOST"), h, F.lit(".EXAMPLE.COM/p/"), i.cast("string"), F.lit("#sec")),
                F.concat(F.lit("https://host"), h, F.lit(".example.com:443/p/"), i.cast("string"), F.lit("?z=1&a=2")),
            )
        ).alias("url_raw")
    )
    stream_hll_registers(
        spark, variants.select(canonicalize("url_raw").alias("url")),
        regs_dir, ckp)
    return hll_estimate(read_hll_registers(spark, regs_dir))


_BYTES_METER_ORACLE = """
    SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
           count(*)::BIGINT AS n_pages,
           sum(strlen(coalesce(text, '')))::BIGINT AS total_bytes,
           (sum(strlen(coalesce(text, ''))) // count(*))::BIGINT AS avg_bytes
    FROM documents GROUP BY 1
"""


@query("stream_bytes_meter", _BYTES_METER_ORACLE)
def q_stream_bytes_meter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous per-host bandwidth metering: the documents stream's
    (host, payload-bytes) pairs fold per micro-batch into partial
    (n_pages, total_bytes) rows appended to a durable meter store; the
    current meter is the sum-merge of the store. Integer sums are
    order-free, so the fully-drained availableNow run equals the batch
    aggregation the DuckDB oracle computes — batch-boundary invariant
    by construction (same zero-streaming-state posture as the HLL
    meter). The merged rows are exactly the byte evidence
    ``schedops.host_budgets_from_bytes`` consumes, making the
    bandwidth-ceiling leg derivable mid-generation without re-scanning
    the fetch log."""
    from ..streaming.ingest import read_host_bytes, stream_host_bytes

    name = f"stream_bytes_{uuid.uuid4().hex[:8]}"
    ckp = os.path.join(tempfile.gettempdir(), f"ckp_{name}")
    meter_dir = os.path.join(tempfile.gettempdir(), f"meter_{name}")
    docs = read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("long")
    pages = docs.select(
        F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.octet_length(F.coalesce(F.col("text"), F.lit("")))
        .cast("long").alias("nbytes"),
    )
    stream_host_bytes(spark, pages, meter_dir, ckp)
    m = read_host_bytes(spark, meter_dir)
    return m.select(
        "host", "n_pages", "total_bytes",
        F.expr("total_bytes div n_pages").cast("long").alias("avg_bytes"),
    )


# --------------------------------------------------------------------------- #
# streaming robots gate: the stream-static join pattern — per
# micro-batch, discovered URLs join the broadcast ruleset and only
# RFC 9309-allowed rows land in the feed (streaming/ingest.
# stream_robots_gate, which runs the engine's generic rep_best_match
# evaluator). Stateless, so batch-boundary invariant by construction;
# the oracle is the one-shot batch gate over the same synthetic
# frontier and ruleset (the robots_eval scenario: disallow '/login',
# allow '/login/p/1' carve-out on h % 5 == 0 hosts).
# --------------------------------------------------------------------------- #
_GATE_ORACLE = """
    WITH urls AS (
        SELECT doc_id::BIGINT AS doc_id,
               (doc_id % 7)::INT AS h,
               '/' || (CASE WHEN doc_id % 13 = 0 THEN 'login/p' ELSE 'p' END)
                   || '/' || doc_id::VARCHAR AS path
        FROM documents
    ),
    scored AS (
        SELECT doc_id, h, path,
               (CASE WHEN h % 5 = 0 AND starts_with(path, '/login')
                     THEN 6 ELSE 0 END) AS best_dis,
               (CASE WHEN h % 5 = 0 AND starts_with(path, '/login/p/1')
                     THEN 10 ELSE 0 END) AS best_allow
        FROM urls
    )
    SELECT doc_id,
           'https://host' || h::VARCHAR || '.example.com' || path AS url
    FROM scored WHERE best_dis <= best_allow
"""


@query("stream_robots_gate", _GATE_ORACLE)
def q_stream_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ingest import stream_robots_gate

    run = f"gate_{uuid.uuid4().hex[:8]}"
    base = os.path.join(tempfile.gettempdir(), run)
    out_dir = os.path.join(base, "out")

    rules = spark.createDataFrame(
        [(f"host{h}.example.com", ["/login"], ["/login/p/1"])
         for h in range(7) if h % 5 == 0],
        "host string, dis array<string>, alw array<string>",
    )
    docs = read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    i = F.col("doc_id").cast("long")
    path = F.concat(
        F.lit("/"),
        F.when(F.pmod(i, F.lit(13)) == 0, F.lit("login/p")).otherwise(F.lit("p")),
        F.lit("/"), i.cast("string"),
    )
    cand = docs.select(
        i.alias("doc_id"),
        F.concat(F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com"), path).alias("url"),
    )
    stream_robots_gate(spark, cand, rules, out_dir, os.path.join(base, "ckp"))
    return spark.read.parquet(out_dir).select("doc_id", "url")
