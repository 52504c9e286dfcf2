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

from pyspark.sql import Column, DataFrame
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
                record_type: str = "resource",
                refers_to: Column | None = None,
                record_id_salt: str = "") -> DataFrame:
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
    shuffle.

    ``refers_to`` (a Column holding the referenced record's id, e.g.
    ``<urn:h60:...>``) inserts a ``WARC-Refers-To`` header after
    WARC-Date — the ISO 28500 back-pointer a derived record (WET
    ``conversion``, ``revisit``) carries to its source capture.
    ``record_id_salt`` is appended to the URI before hashing the
    record id so a derived record's id differs from its source's
    (two records about one URI must not collide). Defaults keep the
    output byte-identical to the pre-parameter behavior."""
    from ..functions.hashing import h60

    url = F.col(url_col)
    payload = F.coalesce(F.col(payload_col), F.lit(""))
    crlf = F.lit("\r\n")
    n = F.octet_length(payload)
    id_src = F.concat(url, F.lit(record_id_salt)) if record_id_salt else url
    refers = (
        (F.lit("WARC-Refers-To: "), refers_to, crlf)
        if refers_to is not None else ()
    )
    rec = F.concat(
        F.lit("WARC/1.0"), crlf,
        F.lit(f"WARC-Type: {record_type}"), crlf,
        F.lit("WARC-Record-ID: <urn:h60:"), h60(id_src).cast("string"), F.lit(">"), crlf,
        F.lit("WARC-Date: "), F.lit(date), crlf,
        *refers,
        F.lit("WARC-Target-URI: "), url, crlf,
        F.lit(f"Content-Type: {content_type}"), crlf,
        F.lit("Content-Length: "), n.cast("string"), crlf,
        crlf, payload, crlf, crlf,
    )
    return df.withColumn("content_length", n.cast("long")).withColumn("warc", rec)


def wet_format(df: DataFrame, url_col: str = "url", text_col: str = "text",
               date: str = "2026-01-01T00:00:00Z") -> DataFrame:
    """WET export (Common Crawl's extracted-text sidecar): a WARC/1.0
    ``conversion`` record per page whose payload is the extracted
    plain text and whose ``WARC-Refers-To`` points at the source
    capture's record id (the same urn:h60 id ``warc_format`` mints for
    that URI). The record's own id is salted (``#wet``) so the
    conversion and its source never collide. Same scale posture as
    warc_format: scan-projection column expressions only; parts
    written via ``write_warc``-style lineSep folding concatenate into
    valid WET streams."""
    from ..functions.hashing import h60

    src_id = F.concat(
        F.lit("<urn:h60:"), h60(F.col(url_col)).cast("string"), F.lit(">"))
    return warc_format(
        df, url_col=url_col, payload_col=text_col, date=date,
        content_type="text/plain", record_type="conversion",
        refers_to=src_id, record_id_salt="#wet",
    )


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


# schema of one parsed WARC record (parse_warc output)
WARC_RECORD_SCHEMA = (
    "stream_id string, rec_idx int, warc_type string, record_id string, "
    "warc_date string, url string, content_type string, "
    "content_length long, payload string"
)


def parse_warc(streams: DataFrame, stream_col: str = "stream",
               id_col: str = "stream_id") -> DataFrame:
    """S6b read path — the inverse of ``warc_format``: parse concatenated
    WARC/1.0 streams (one stream per row, e.g. one ``write_warc`` part
    file read whole) back into records.

    LENGTH-RESPECTING, like warcio: each record's payload is read as
    exactly ``Content-Length`` octets from after the header's blank
    line. A regex/split parse ("split on 'WARC/1.0'") mis-frames any
    payload that itself contains a version line or a blank line —
    archived web pages do; the round-trip test plants exactly such
    decoys. Arrow-batched ``mapInPandas``; the inner loop is per record
    within one stream buffer (bounded by records-per-part), never per
    row of the corpus.

    Scale: parallelism = number of stream rows (WARC part files — a
    production store rotates parts at ~1 GiB, so thousands of parts at
    100 TB). Stream bytes stay map-side; only the parsed record columns
    (no blob payloads beyond the page text) leave the stage.
    """
    import pandas as pd

    cols = ("stream_id", "rec_idx", "warc_type", "record_id", "warc_date",
            "url", "content_type", "content_length", "payload")

    def run(batches):
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for sid, text in zip(pdf[id_col], pdf[stream_col]):
                buf = (text or "").encode("utf-8")
                pos, idx = 0, 0
                while pos < len(buf):
                    while buf.startswith(b"\r\n", pos):  # inter-record CRLFs
                        pos += 2
                    if pos >= len(buf):
                        break
                    end = buf.find(b"\r\n\r\n", pos)  # end of header block
                    if end == -1:
                        raise ValueError(
                            f"truncated header block in stream {sid!r} at "
                            f"offset {pos} (no CRLFCRLF terminator)")
                    lines = buf[pos:end].decode("utf-8").split("\r\n")
                    if not lines[0].startswith("WARC/"):
                        raise ValueError(f"bad record start in stream {sid!r}")
                    hdr = {}
                    for ln in lines[1:]:
                        k, _, v = ln.partition(":")
                        hdr[k.strip().lower()] = v.strip()
                    n = int(hdr["content-length"])
                    body_start = end + 4
                    if len(buf) - body_start < n:
                        # a silent short slice would report content_length=n
                        # with a shorter payload — digest/length accounting
                        # downstream would quietly disagree
                        raise ValueError(
                            f"truncated record in stream {sid!r}: payload "
                            f"needs {n} octets, {len(buf) - body_start} left")
                    payload = buf[body_start:body_start + n].decode("utf-8")
                    pos = body_start + n
                    out["stream_id"].append(sid)
                    out["rec_idx"].append(idx)
                    out["warc_type"].append(hdr.get("warc-type"))
                    out["record_id"].append(hdr.get("warc-record-id"))
                    out["warc_date"].append(hdr.get("warc-date"))
                    out["url"].append(hdr.get("warc-target-uri"))
                    out["content_type"].append(hdr.get("content-type"))
                    out["content_length"].append(n)
                    out["payload"].append(payload)
                    idx += 1
            yield pd.DataFrame(out, columns=list(cols))

    return streams.mapInPandas(run, WARC_RECORD_SCHEMA)
