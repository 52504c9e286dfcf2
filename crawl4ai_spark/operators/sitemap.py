"""Sitemap ingestion (S-tier source): sitemaps.org protocol XML →
typed seed rows, entirely in column expressions.

The reference crawls whatever URL it is handed (crawl_agent.py
``crawl_url``); a production deep-crawl discovers its seed lists from
``/sitemap.xml`` (and the robots ``Sitemap:`` directive) before the
frontier ever spins. This module parses both document shapes of the
protocol:

- ``<urlset>`` leaves: ``<url><loc>…</loc><lastmod>…</lastmod>
  <priority>…</priority></url>`` → kind='url' rows (lastmod/priority
  nullable — real sitemaps omit them per entry);
- ``<sitemapindex>`` hubs: ``<sitemap><loc>…</loc></sitemap>`` →
  kind='sitemap' rows (the fetch loop enqueues these as further
  sitemap documents).

Scale shape: one regexp_extract_all + posexplode_outer per document —
no Python, no shuffle until the caller aggregates; ``<loc>`` values are
canonicalized with the same functions.urls rules as every frontier URL,
so sitemap seeds join the URL-seen set without a second normal form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from crawl4ai_spark.functions.urls import canonicalize

# (?s): real sitemaps put newlines inside entry blocks; lazy match keeps
# one entry per block. One alternation pass extracts BOTH shapes (valid
# documents never nest them, so the first closing tag of either kind
# ends the block); no backreference, so the DuckDB (RE2) oracle twin
# can mirror the per-block extraction exactly.
_BLOCK_RX = r"(?s)<(?:url|sitemap)>.*?</(?:url|sitemap)>"
_LOC_RX = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RX = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
_PRIORITY_RX = r"(?s)<priority>\s*(.*?)\s*</priority>"
_CHANGEFREQ_RX = r"(?s)<changefreq>\s*(.*?)\s*</changefreq>"

# The five predefined XML entities plus their numeric character
# references (&#38; / &#x26; are equally legal escapes for '&' in <loc>
# values). Every '&' form decodes LAST so '&amp;lt;' / '&#38;lt;'
# decode to the literal '&lt;' and not '<' (protocol requires <loc>
# values be entity-escaped — query-string '&' arrives as '&amp;').
_XML_DECODE = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    (r"&#0*60;|&#[xX]0*3[cC];", "<"), (r"&#0*62;|&#[xX]0*3[eE];", ">"),
    (r"&#0*34;|&#[xX]0*22;", '"'), (r"&#0*39;|&#[xX]0*27;", "'"),
    # every '&' form in ONE pass: sequential passes would double-decode
    # '&amp;#38;' (one XML decode yields the literal '&#38;', not '&')
    (r"&amp;|&#0*38;|&#[xX]0*26;", "&"),
]


def _xml_unescape(c: F.Column) -> F.Column:
    for pat, ch in _XML_DECODE:
        if "&#" in pat or "|" in pat:
            c = F.regexp_replace(c, pat, ch)
        else:
            c = F.replace(c, F.lit(pat), F.lit(ch))
    return c


def parse_sitemaps(sitemaps: DataFrame, host_col: str = "host",
                   xml_col: str = "xml") -> DataFrame:
    """Parse a (host, xml) table of sitemap documents.

    Returns (src_host, kind: 'url'|'sitemap', pos: int block order
    within the file, url: canonical, lastmod: string|null,
    priority: double|null, changefreq: string|null). Blocks without a ``<loc>`` are dropped
    (protocol requires one). ONE regexp pass + one posexplode_outer per
    document — a 50 MB / 50k-entry sitemap is scanned once, with the
    block's leading tag deciding its kind."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_BLOCK_RX), F.lit(0))
    b = F.col("block")
    loc = F.nullif(_xml_unescape(F.regexp_extract(b, _LOC_RX, 1)), F.lit(""))
    lastmod = F.nullif(F.regexp_extract(b, _LASTMOD_RX, 1), F.lit(""))
    # try_cast: a real-world <priority>high</priority> must null out,
    # not kill the job under ANSI mode (robots.py does the same for
    # crawl_delay)
    priority = F.nullif(
        F.regexp_extract(b, _PRIORITY_RX, 1), F.lit("")
    ).try_cast("double")
    changefreq = F.nullif(
        F.lower(F.trim(F.regexp_extract(b, _CHANGEFREQ_RX, 1))), F.lit(""))
    kind = F.when(b.startswith("<url>"), F.lit("url")).otherwise(F.lit("sitemap"))
    return (
        sitemaps.select(
            F.col(host_col).alias("src_host"),
            F.posexplode_outer(blocks).alias("pos", "block"),
        )
        .select(
            "src_host",
            kind.alias("kind"),
            F.col("pos").cast("int").alias("pos"),
            canonicalize(loc).alias("url"),
            lastmod.alias("lastmod"),
            priority.alias("priority"),
            changefreq.alias("changefreq"),
        )
        .where(F.col("url").isNotNull())
    )


def sitemap_seeds(parsed: DataFrame, seen: DataFrame | None = None) -> DataFrame:
    """Distinct canonical leaf URLs, minus an optional seen set
    (a frame with a canonical ``url`` column) — ready for
    ``CrawlConfig(seeds=...)`` or a frontier union. The anti-join is the
    same shape as the engine's first-discovery dedup: only URLs shuffle."""
    urls = parsed.where(F.col("kind") == "url").select("url").distinct()
    if seen is not None:
        urls = urls.join(seen.select("url").distinct(), "url", "left_anti")
    return urls


def stale_from_sitemap(parsed: DataFrame, fetch_log: DataFrame,
                       url_col: str = "url",
                       fetched_col: str = "fetch_date") -> DataFrame:
    """Freshness loop, sitemap edition: URLs whose sitemap ``lastmod``
    is NEWER than their last fetch — the ``CrawlEngine.reopen`` set.
    The protocol allows date or datetime lastmod values; the date
    prefix is compared. Leaf entries without lastmod and never-fetched
    URLs drop out (unknown staleness is recrawl_schedule's job, not
    this comparator's). Unparseable lastmod/fetch dates null out and
    drop (try-casts — untrusted text must not kill the job under ANSI
    mode). One groupBy per side + one join, all keyed on the canonical
    url — only (url, date) pairs shuffle.

    The fetch log may be a multi-generation pages log (one row per
    visit, the shape ``eng.pages(resolved=True)`` has after a reopen);
    staleness compares against the LAST fetch, so an already-refetched
    page does not re-flag every cycle."""
    sm = (
        parsed.where((F.col("kind") == "url") & F.col("lastmod").isNotNull())
        .select(
            "url",
            F.try_to_date(F.substring("lastmod", 1, 10)).alias("_lm"),
        )
        .where(F.col("_lm").isNotNull())
        .groupBy("url")
        .agg(F.max("_lm").alias("lastmod_date"))
    )
    fl = (
        fetch_log.select(
            F.col(url_col).alias("url"),
            F.col(fetched_col).try_cast("date").alias("_fd"),
        )
        .where(F.col("_fd").isNotNull())
        .groupBy("url")
        .agg(F.max("_fd").alias("_fd"))
    )
    return (
        sm.join(fl, "url")
        .where(F.col("lastmod_date") > F.col("_fd"))
        .select("url", "lastmod_date", F.col("_fd").alias("fetched_date"))
    )


# sitemap changefreq → Poisson change-rate prior (changes per hour).
# The protocol's enum maps to 1/period; 'always' is pinned to one
# change per minute (the spec says "every time the page is accessed" —
# any finite stand-in works as a prior) and 'never' to 0. Values
# outside the enum get no prior (null), per the spec's advisory nature.
CHANGEFREQ_LAMBDA_H = {
    "always": 60.0,
    "hourly": 1.0,
    "daily": 1.0 / 24.0,
    "weekly": 1.0 / 168.0,
    "monthly": 1.0 / 730.0,
    "yearly": 1.0 / 8766.0,
    "never": 0.0,
}


def revisit_priors_from_sitemap(parsed: DataFrame) -> DataFrame:
    """(url, lambda_prior_per_h) from sitemap changefreq declarations —
    the cold-start prior for poisson_revisit's estimator: a URL with no
    poll history yet inherits the site's declared change rate instead
    of the global cap. Leaf entries only; URLs without a recognized
    changefreq drop out (no prior is better than a made-up one). A URL
    declared in several sitemaps takes the FASTEST declared rate (the
    conservative revisit choice), deterministically via max."""
    m = CHANGEFREQ_LAMBDA_H
    lam = F.col("changefreq")
    expr = F.lit(None).cast("double")
    for k, v in m.items():
        expr = F.when(lam == k, F.lit(v)).otherwise(expr)
    return (
        parsed.where((F.col("kind") == "url") & F.col("changefreq").isNotNull())
        .select("url", expr.alias("lambda_prior_per_h"))
        .where(F.col("lambda_prior_per_h").isNotNull())
        .groupBy("url")
        .agg(F.max("lambda_prior_per_h").alias("lambda_prior_per_h"))
    )


# --------------------------------------------------------------------------- #
# The PUBLISH side of the protocol: build urlset files from a URL table
# --------------------------------------------------------------------------- #
SITEMAP_MAX_URLS = 50_000   # sitemaps.org hard cap per urlset file
SM_BUCKETS = 64             # two-level ranking sub-shards per host


def _xml_escape(c: F.Column) -> F.Column:
    """Minimal <loc> escaping — the inverse of _xml_unescape's core
    (amp first on unescape means amp LAST here would double-escape;
    escaping must do amp FIRST)."""
    out = F.replace(c, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def build_sitemaps(urls: DataFrame, host_col: str = "host",
                   url_col: str = "url", lastmod_col: str | None = None,
                   max_per_file: int = SITEMAP_MAX_URLS,
                   buckets: int = SM_BUCKETS) -> DataFrame:
    """sitemaps.org EXPORT — the inverse of ``parse_sitemaps``: render a
    (host, url[, lastmod]) table into urlset XML files respecting the
    protocol's hard 50,000-URLs-per-file cap. Returns (host, file_idx,
    n_urls, xml); ``parse_sitemaps(build_sitemaps(t))`` recovers the
    canonical URL set exactly (round-trip test).

    The cap needs an exact per-host rank, and a mega-host must not
    serialize one window task, so ranking is TWO-LEVEL under the total
    order (bucket, url) — the seq_pack block trick applied to windows:
    in-bucket ``row_number`` windows are bounded by a (host, bucket)
    sub-shard, bucket offsets come from a per-host window over the
    ≤``buckets``-row count table, and global rank = offset + in-bucket
    rank. File assembly is the bounded collect pattern (≤
    ``max_per_file`` entries per group by construction). Input is
    assumed unique per (host, url) — dedupe upstream (the seen set /
    pages log already is)."""
    from ..functions.hashing import h60
    from pyspark.sql import Window

    h, u = F.col(host_col), F.col(url_col)
    lastmod = (
        F.when(F.col(lastmod_col).isNotNull(),
               F.concat(F.lit("<lastmod>"), F.col(lastmod_col),
                        F.lit("</lastmod>")))
        .otherwise(F.lit(""))
        if lastmod_col else F.lit("")
    )
    base = urls.select(
        h.alias("host"), u.alias("url"),
        F.pmod(h60(u), F.lit(buckets)).cast("int").alias("bkt"),
        F.concat(F.lit("<url><loc>"), _xml_escape(u), F.lit("</loc>"),
                 lastmod, F.lit("</url>")).alias("entry"),
    )
    in_rank = F.row_number().over(
        Window.partitionBy("host", "bkt").orderBy("url"))
    ranked = base.withColumn("in_rank", in_rank)
    counts = base.groupBy("host", "bkt").agg(F.count("*").alias("n"))
    off = F.coalesce(
        F.sum("n").over(
            Window.partitionBy("host").orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0))
    offsets = counts.withColumn("off", off).select("host", "bkt", "off")
    files = (
        ranked.join(offsets, ["host", "bkt"])
        .withColumn("rank", F.col("off") + F.col("in_rank"))
        .withColumn("file_idx",
                    F.floor((F.col("rank") - 1) / max_per_file).cast("int"))
    )
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list(F.struct("rank", "entry"))),
                    lambda s: s.entry), "")
    return (
        files.groupBy("host", "file_idx")
        .agg(F.count("*").cast("long").alias("n_urls"), body.alias("xml"))
        .select(
            "host", "file_idx", "n_urls",
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?>'
                      '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.col("xml"), F.lit("</urlset>"),
            ).alias("xml"),
        )
    )


def build_sitemap_index(files: DataFrame,
                        path_tpl: str = "/sitemap-{i}.xml") -> DataFrame:
    """The sitemapindex companion: one index XML per host listing its
    urlset file URLs (``https://<host><path_tpl>`` with ``{i}`` =
    file_idx) — what robots.txt's ``Sitemap:`` line points at when a
    site exceeds one file. Bounded by files-per-host (n_urls/50k)."""
    pre, _, post = path_tpl.partition("{i}")
    loc = F.concat(F.lit("https://"), F.col("host"), F.lit(pre),
                   F.col("file_idx").cast("string"), F.lit(post))
    entry = F.concat(F.lit("<sitemap><loc>"), _xml_escape(loc),
                     F.lit("</loc></sitemap>"))
    body = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("file_idx", "e"))),
            lambda s: s.e), "")
    return (
        files.select("host", "file_idx", entry.alias("e"))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_files"), body.alias("xml"))
        .select(
            "host", "n_files",
            F.concat(
                F.lit('<?xml version="1.0" encoding="UTF-8"?>'
                      '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.col("xml"), F.lit("</sitemapindex>"),
            ).alias("xml"),
        )
    )
