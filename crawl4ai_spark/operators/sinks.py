"""S6/S7 sinks: markdown export + file-download collection.

* S6 (crawl_agent.py:155; app.py:744-768): ``save_markdown`` writes one
  .md file per page (driver-side export of an already-small result) or
  a parquet/text table for bulk.
* S7 (crawl_agent.py:729-781): the reference's JS collects a[href] /
  img[src] by extension with a size cap; ``collect_downloads`` filters
  media spans by the same extension lists and joins blob sizes, then
  appends to a ``media_blobs`` table.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# extension lists mirror the reference's collection JS (crawl_agent.py:753-761)
PDF_EXTS = ["pdf"]
IMAGE_EXTS = ["jpg", "jpeg", "png", "gif", "webp"]
DOC_EXTS = ["doc", "docx", "xls", "xlsx", "ppt", "pptx", "txt", "csv"]


def save_markdown(df: DataFrame, out_dir: str, url_col: str = "url", md_col: str = "raw_md") -> int:
    """One .md file per page (driver export; bulk goes through
    ``df.write``). Returns number of files written."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for row in df.select(url_col, md_col).toLocalIterator():
        name = re.sub(r"[^A-Za-z0-9._-]+", "_", row[url_col])[:150] or f"page_{n}"
        with open(os.path.join(out_dir, name + ".md"), "w") as f:
            f.write(row[md_col] or "")
        n += 1
    return n


def save_markdown_bulk(df: DataFrame, out_dir: str, url_col: str = "url",
                       md_col: str = "raw_md", max_records_per_file: int = 10_000) -> None:
    """Bulk S6 export: executor-parallel ``df.write.text`` of
    "## Page: {url}" + markdown records — no driver iteration, no
    collect. One text part per task (records_per_file bounded), so a 1M-
    page export spreads across the cluster; per-page FILES (the reference
    app's per-page .md downloads) remain ``save_markdown``'s small-export
    job. Files land under ``out_dir`` as part-*.txt."""
    rec = F.concat(
        F.lit("## Page: "), F.col(url_col), F.lit("\n\n"),
        F.coalesce(F.col(md_col), F.lit("")), F.lit("\n\x03\n"),  # ETX record sep
    )
    (
        df.select(rec.alias("value"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .text(out_dir)
    )


def collect_downloads(
    docs: DataFrame,
    spans_col: str = "spans",
    download_pdfs: bool = True,
    download_images: bool = False,
    download_docs: bool = False,
    max_file_size_mb: float | None = 10.0,
    blob_sizes: DataFrame | None = None,
) -> DataFrame:
    """Downloadable refs per the reference's flag set
    (crawl_agent.py:79-83): filter image/media spans on extension; size
    cap applied when a ``blob_sizes(media_ref, n_bytes)`` table exists."""
    exts: list[str] = []
    if download_pdfs:
        exts += PDF_EXTS
    if download_images:
        exts += IMAGE_EXTS
    if download_docs:
        exts += DOC_EXTS
    if not exts:
        return docs.sparkSession.createDataFrame([], "doc_id string, media_ref string, ext string")
    refs = (
        docs.select("doc_id", F.explode(spans_col).alias("s"))
        .where(F.col("s.kind").isin("image", "media") & F.col("s.media_ref").isNotNull())
        .select(
            "doc_id",
            F.col("s.media_ref").alias("media_ref"),
            F.lower(F.regexp_extract(F.col("s.media_ref"), r"\.([A-Za-z0-9]+)$", 1)).alias("ext"),
        )
        .where(F.col("ext").isin(exts))
    )
    if blob_sizes is not None and max_file_size_mb is not None:
        cap = int(max_file_size_mb * 1024 * 1024)
        refs = (
            refs.join(F.broadcast(blob_sizes), "media_ref", "left")
            .where(F.coalesce(F.col("n_bytes"), F.lit(0)) <= cap)
            .drop("n_bytes")
        )
    return refs


def warc_format(df: DataFrame, url_col: str = "url", payload_col: str = "raw_md",
                date: str = "2026-01-01T00:00:00Z",
                content_type: str = "text/plain",
                record_type: str = "resource") -> DataFrame:
    """S6b: render each page as an ISO 28500 (WARC/1.0) record — the
    archive format every crawl ecosystem (Common Crawl, IA) exchanges.
    Adds ``content_length`` (payload octets) and ``warc`` (the full
    record). Record IDs are deterministic (urn:h60: over the target URI
    — the cross-engine content hash used by the dedup tier); ``date``
    is the caller's crawl-start stamp (a real deployment passes wall
    clock; the default keeps runs reproducible). The default type is
    ``resource``: per ISO 28500 a ``response`` record must carry a full
    protocol response (application/http; msgtype=response) — bare page
    content is a resource record, which standard tooling (warcio, CDX
    indexers) ingests without an HTTP status line. Pure column
    expressions appended in the scan projection — no Python, no
    shuffle."""
    from ..functions.hashing import h60

    url = F.col(url_col)
    payload = F.coalesce(F.col(payload_col), F.lit(""))
    crlf = F.lit("\r\n")
    n = F.octet_length(payload)
    rec = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit(f"WARC-Type: {record_type}"), crlf,
        F.lit("WARC-Record-ID: <urn:h60:"), h60(url).cast("string"), F.lit(">"), crlf,
        F.lit("WARC-Date: "), F.lit(date), crlf,
        F.lit("WARC-Target-URI: "), url, crlf,
        F.lit(f"Content-Type: {content_type}"), crlf,
        F.lit("Content-Length: "), n.cast("string"), crlf,
        crlf, payload, crlf, crlf,
    )
    return df.withColumn("content_length", n.cast("long")).withColumn("warc", rec)


def write_warc(df: DataFrame, out_dir: str, url_col: str = "url",
               payload_col: str = "raw_md", **fmt_kwargs) -> None:
    """Bulk WARC export: executor-parallel ``write.text`` of the
    formatted records. The text writer appends a line separator per
    row, so the stored value drops the record's final CRLF and
    ``lineSep='\\r\\n'`` restores it — parts then concatenate into
    streams framed EXACTLY per ISO 28500 (two CRLFs between records,
    no stray LF). Same scale posture as save_markdown_bulk — no driver
    iteration."""
    body = F.expr("substring(warc, 1, length(warc) - 2)")
    (
        warc_format(df, url_col, payload_col, **fmt_kwargs)
        .select(body.alias("warc"))
        .write.mode("overwrite")
        .option("lineSep", "\r\n")
        .text(out_dir)
    )
