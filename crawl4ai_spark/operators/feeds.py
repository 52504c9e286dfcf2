"""Feed ingestion (S-tier source): RSS 2.0 / Atom XML → typed entry
rows, entirely in column expressions.

Completes the site front door alongside robots (operators/robots.py)
and sitemaps (operators/sitemap.py): a production crawl discovers
*fresh* content from the feeds a site publishes, not by re-sweeping the
whole host. The reference crawls whatever URL it is handed
(crawl_agent.py ``crawl_url``); feed polling is how a deep crawl keeps
a news/blog host current between sweeps.

Both wire formats of the last two decades are parsed by ONE pass:

- RSS 2.0 ``<item>``: ``<link>url</link>``, ``<guid>``, ``<title>``,
  ``<pubDate>`` in RFC 822 (``Tue, 05 Jan 2026 08:30:00 GMT``);
- Atom ``<entry>``: ``<link href="url"/>`` (first link element — real
  feeds put the alternate link first; rel-preference is out of subset),
  ``<id>``, ``<title>``, ``<updated>`` in RFC 3339
  (``2026-01-05T08:30:00Z``).

Timestamps are normalized to a lexicographically-sortable canonical
string ``yyyy-MM-dd HH:mm:ss`` with pure string ops (regex + month-name
CASE) — no locale-dependent timestamp parser on either engine, so the
DuckDB oracle twin matches bit-for-bit. Zone-offset handling is out of
subset (values ending in an offset other than Z/GMT/UT keep their
LOCAL clock reading; a production wire-in would shift them — the
synthetic corpus and most real feeds publish UTC).

Scale shape: one regexp_extract_all + posexplode_outer per feed
document — no Python, no shuffle until the caller aggregates; links
are canonicalized with the same functions.urls rules as every frontier
URL, so feed entries join the URL-seen set without a second normal
form. Same shape as parse_sitemaps; a 10^6-feed poll round is one
narrow scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from crawl4ai_spark.functions.urls import canonicalize
from crawl4ai_spark.operators.sitemap import _xml_unescape

# (?s): real feeds put newlines inside entry blocks; lazy match keeps
# one entry per block. RSS items and Atom entries never nest in a valid
# document, so one alternation extracts both shapes. No backreference,
# no lookaround — the DuckDB (RE2) oracle twin mirrors it exactly.
_BLOCK_RX = r"(?s)<(?:item|entry)(?:>|\s[^>]*>).*?</(?:item|entry)>"
_RSS_LINK_RX = r"(?s)<link>\s*(.*?)\s*</link>"
_ATOM_LINK_RX = r'<link[^>]*href="([^"]*)"'
_TITLE_RX = r"(?s)<title(?:>|\s[^>]*>)\s*(.*?)\s*</title>"
_GUID_RX = r"(?s)<guid(?:>|\s[^>]*>)\s*(.*?)\s*</guid>"
_ID_RX = r"(?s)<id(?:>|\s[^>]*>)\s*(.*?)\s*</id>"
# RFC 822: [Tue, ]05 Jan 2026 08:30:00 GMT — day-of-week optional per
# the grammar; seconds optional (":ss" made non-capturing-optional).
_RFC822_RX = (
    r"(\d{1,2})\s+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
    r"\s+(\d{4})\s+(\d{2}:\d{2}(?::\d{2})?)"
)
_PUBDATE_RX = r"(?s)<pubDate>\s*(.*?)\s*</pubDate>"
_UPDATED_RX = r"(?s)<updated>\s*(.*?)\s*</updated>"
# RFC 3339: 2026-01-05T08:30:00(.frac)?(Z|offset)
_RFC3339_RX = r"(\d{4}-\d{2}-\d{2})[Tt ](\d{2}:\d{2}:\d{2})"

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


def _month_num(name: F.Column) -> F.Column:
    expr = F.lit(None).cast("string")
    for i, m in enumerate(_MONTHS, start=1):
        expr = F.when(name == m, F.lit(f"{i:02d}")).otherwise(expr)
    return expr


def _norm_rfc822(raw: F.Column) -> F.Column:
    """'Tue, 05 Jan 2026 08:30:00 GMT' -> '2026-01-05 08:30:00' (string
    ops only; unparseable values null out — untrusted text must never
    kill the job)."""
    day = F.regexp_extract(raw, _RFC822_RX, 1)
    mon = _month_num(F.regexp_extract(raw, _RFC822_RX, 2))
    year = F.regexp_extract(raw, _RFC822_RX, 3)
    time = F.regexp_extract(raw, _RFC822_RX, 4)
    time = F.when(F.length(time) == 5, F.concat(time, F.lit(":00"))).otherwise(time)
    out = F.concat(year, F.lit("-"), mon, F.lit("-"),
                   F.lpad(day, 2, "0"), F.lit(" "), time)
    return F.when(
        (F.nullif(day, F.lit("")).isNotNull()) & mon.isNotNull(), out
    ).otherwise(F.lit(None).cast("string"))


def _norm_rfc3339(raw: F.Column) -> F.Column:
    """'2026-01-05T08:30:00Z' -> '2026-01-05 08:30:00' (fractional
    seconds and zone designators dropped; out-of-shape values null)."""
    d = F.nullif(F.regexp_extract(raw, _RFC3339_RX, 1), F.lit(""))
    t = F.nullif(F.regexp_extract(raw, _RFC3339_RX, 2), F.lit(""))
    return F.when(d.isNotNull() & t.isNotNull(),
                  F.concat(d, F.lit(" "), t)).otherwise(
        F.lit(None).cast("string"))


def parse_feeds(feeds: DataFrame, host_col: str = "host",
                xml_col: str = "xml") -> DataFrame:
    """Parse a (host, xml) table of RSS/Atom feed documents.

    Returns (src_host, fmt: 'rss'|'atom', pos: int block order within
    the file, url: canonical, published: 'yyyy-MM-dd HH:mm:ss'|null,
    entry_id: string|null, title: string|null). Blocks without a link
    are dropped (an entry you cannot fetch is not a frontier input).
    ONE regexp pass + one posexplode_outer per document; the block's
    leading tag decides its format."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_BLOCK_RX), F.lit(0))
    b = F.col("block")
    fmt = F.when(b.startswith("<item"), F.lit("rss")).otherwise(F.lit("atom"))
    rss_link = F.nullif(F.regexp_extract(b, _RSS_LINK_RX, 1), F.lit(""))
    atom_link = F.nullif(F.regexp_extract(b, _ATOM_LINK_RX, 1), F.lit(""))
    link = _xml_unescape(F.coalesce(rss_link, atom_link))
    published = F.coalesce(
        _norm_rfc822(F.regexp_extract(b, _PUBDATE_RX, 1)),
        _norm_rfc3339(F.regexp_extract(b, _UPDATED_RX, 1)),
    )
    entry_id = F.nullif(_xml_unescape(F.coalesce(
        F.nullif(F.regexp_extract(b, _GUID_RX, 1), F.lit("")),
        F.nullif(F.regexp_extract(b, _ID_RX, 1), F.lit("")),
    )), F.lit(""))
    title = F.nullif(
        _xml_unescape(F.regexp_extract(b, _TITLE_RX, 1)), F.lit(""))
    return (
        feeds.select(
            F.col(host_col).alias("src_host"),
            F.posexplode_outer(blocks).alias("pos", "block"),
        )
        .select(
            "src_host",
            fmt.alias("fmt"),
            F.col("pos").cast("int").alias("pos"),
            canonicalize(link).alias("url"),
            published.alias("published"),
            entry_id.alias("entry_id"),
            title.alias("title"),
        )
        .where(F.col("url").isNotNull())
    )


def feed_seeds(parsed: DataFrame, seen: DataFrame | None = None) -> DataFrame:
    """Distinct canonical entry URLs, minus an optional seen set (a
    frame with a canonical ``url`` column) — ready for
    ``CrawlConfig(seeds=...)`` or a frontier union. Same anti-join
    shape as the engine's first-discovery dedup: only URLs shuffle."""
    urls = parsed.select("url").distinct()
    if seen is not None:
        urls = urls.join(seen.select("url").distinct(), "url", "left_anti")
    return urls


def fresh_from_feeds(parsed: DataFrame, fetch_log: DataFrame,
                     url_col: str = "url",
                     fetched_col: str = "fetch_date") -> DataFrame:
    """Freshness loop, feed edition: URLs whose newest feed ``published``
    stamp is NEWER than their last fetch — the ``CrawlEngine.reopen``
    set (stale_from_sitemap's twin over the feed channel). Entries
    without a parseable published stamp and never-fetched URLs drop out
    (unknown staleness is recrawl_schedule's job). The fetch log may be
    a multi-generation pages log; comparison is against the LAST fetch,
    so an already-refetched page does not re-flag every poll. One
    groupBy per side + one join, keyed on the canonical url — only
    (url, date) pairs shuffle."""
    fe = (
        parsed.where(F.col("published").isNotNull())
        .select(
            "url",
            F.try_to_date(F.substring("published", 1, 10)).alias("_pd"),
        )
        .where(F.col("_pd").isNotNull())
        .groupBy("url")
        .agg(F.max("_pd").alias("published_date"))
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
        fe.join(fl, "url")
        .where(F.col("published_date") > F.col("_fd"))
        .select("url", "published_date", F.col("_fd").alias("fetched_date"))
    )
