"""Feed-ingestion queries: RSS 2.0 / Atom parsing + feed-driven freshness.

The third leg of the site front door (robots → sitemap → feeds): a
deterministic per-host feed document — RSS 2.0 on even hosts, Atom on
odd hosts, with messy links, RFC 822 / RFC 3339 timestamps, optional
fields, and entity escapes — is synthesized from the documents table,
then parsed back by ``operators.feeds.parse_feeds`` (the op under
test); the oracle re-parses the identical XML with DuckDB's RE2 and
re-derives the same canonical rows. ``feed_fresh`` closes the loop the
way ``sitemap_stale`` does: entries published after the last fetch are
the ``CrawlEngine.reopen`` set for the next poll round.

Reference scope note: crawl_agent.py crawls handed URLs only; feed
polling is the standard production channel for keeping a news/blog
host current between full sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_sql
from .crawlops import N_HOSTS
from .registry import query, table as _t

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]


# --------------------------------------------------------------------------- #
# shared synthesis (identical arithmetic in both dialects)
# --------------------------------------------------------------------------- #
def _messy_link(i: F.Column, h: F.Column) -> F.Column:
    return F.concat(
        F.lit("HTTPS://HOST"), h.cast("string"), F.lit(".EXAMPLE.COM:443/e/"),
        i.cast("string"),
        F.when(F.pmod(i, F.lit(3)) == 0, F.lit("?b=2&amp;a=1")).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(5)) == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


_MESSY_LINK_SQL = """
      'HTTPS://HOST' || h::VARCHAR || '.EXAMPLE.COM:443/e/' || i::VARCHAR
      || (CASE WHEN i % 3 = 0 THEN '?b=2&amp;a=1' ELSE '' END)
      || (CASE WHEN i % 5 = 0 THEN '#frag' ELSE '' END)
"""


def _month_name(i: F.Column) -> F.Column:
    expr = F.lit("Dec")
    for k, m in enumerate(_MONTHS[:-1]):
        expr = F.when(F.pmod(i, F.lit(12)) == k, F.lit(m)).otherwise(expr)
    return expr


_MONTH_NAME_SQL = (
    "(CASE i % 12 "
    + " ".join(f"WHEN {k} THEN '{m}'" for k, m in enumerate(_MONTHS[:-1]))
    + " ELSE 'Dec' END)"
)

_MONTH_NUM_SQL = (
    "(CASE {m} "
    + " ".join(f"WHEN '{m}' THEN '{k:02d}'" for k, m in enumerate(_MONTHS, 1))
    + " END)"
)


def _rss_item(i: F.Column, h: F.Column) -> F.Column:
    """<item>: optional title (entity-escaped), text link, optional
    guid, optional RFC 822 pubDate (seconds omitted every 8th entry —
    the grammar allows hh:mm)."""
    title = F.when(
        F.pmod(i, F.lit(3)) != 1,
        F.concat(F.lit("<title>Doc "), i.cast("string"),
                 F.lit(" &amp; co</title>")),
    ).otherwise(F.lit(""))
    guid = F.when(
        F.pmod(i, F.lit(2)) == 0,
        F.concat(F.lit('<guid isPermaLink="false">tag:e'), i.cast("string"),
                 F.lit("</guid>")),
    ).otherwise(F.lit(""))
    secs = F.when(F.pmod(i, F.lit(8)) != 0, F.lit(":00")).otherwise(F.lit(""))
    pubdate = F.when(
        F.pmod(i, F.lit(4)) != 3,
        F.concat(
            F.lit("<pubDate>Tue, "),
            (F.pmod(i, F.lit(28)) + 1).cast("string"),
            F.lit(" "), _month_name(i), F.lit(" 2026 "),
            F.lpad(F.pmod(i, F.lit(24)).cast("string"), 2, "0"),
            F.lit(":30"), secs, F.lit(" GMT</pubDate>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.lit("<item>"), title, F.lit("<link>"),
                    _messy_link(i, h), F.lit("</link>"), guid, pubdate,
                    F.lit("</item>"))


_RSS_ITEM_SQL = f"""
      '<item>'
      || (CASE WHEN i % 3 <> 1 THEN '<title>Doc ' || i::VARCHAR || ' &amp; co</title>' ELSE '' END)
      || '<link>' || {_MESSY_LINK_SQL} || '</link>'
      || (CASE WHEN i % 2 = 0 THEN '<guid isPermaLink="false">tag:e' || i::VARCHAR || '</guid>' ELSE '' END)
      || (CASE WHEN i % 4 <> 3 THEN
            '<pubDate>Tue, ' || ((i % 28) + 1)::VARCHAR || ' ' || {_MONTH_NAME_SQL}
            || ' 2026 ' || lpad((i % 24)::VARCHAR, 2, '0') || ':30'
            || (CASE WHEN i % 8 <> 0 THEN ':00' ELSE '' END) || ' GMT</pubDate>'
          ELSE '' END)
      || '</item>'
"""


def _atom_entry(i: F.Column, h: F.Column) -> F.Column:
    """<entry>: optional attributed title, href link (rel=alternate on
    even entries), optional id, optional RFC 3339 updated (fractional
    seconds every 8th entry — dropped by normalization)."""
    title = F.when(
        F.pmod(i, F.lit(3)) != 1,
        F.concat(F.lit('<title type="text">Doc '), i.cast("string"),
                 F.lit(" &amp; co</title>")),
    ).otherwise(F.lit(""))
    rel = F.when(F.pmod(i, F.lit(2)) == 0,
                 F.lit(' rel="alternate"')).otherwise(F.lit(""))
    eid = F.when(
        F.pmod(i, F.lit(2)) == 0,
        F.concat(F.lit("<id>urn:e"), i.cast("string"), F.lit("</id>")),
    ).otherwise(F.lit(""))
    frac = F.when(F.pmod(i, F.lit(8)) == 0, F.lit(".5")).otherwise(F.lit(""))
    updated = F.when(
        F.pmod(i, F.lit(4)) != 3,
        F.concat(
            F.lit("<updated>2026-"),
            F.lpad((F.pmod(i, F.lit(12)) + 1).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((F.pmod(i, F.lit(28)) + 1).cast("string"), 2, "0"),
            F.lit("T"),
            F.lpad(F.pmod(i, F.lit(24)).cast("string"), 2, "0"),
            F.lit(":30:00"), frac, F.lit("Z</updated>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.lit("<entry>"), title, F.lit("<link"), rel,
                    F.lit(' href="'), _messy_link(i, h), F.lit('"/>'),
                    eid, updated, F.lit("</entry>"))


_ATOM_ENTRY_SQL = f"""
      '<entry>'
      || (CASE WHEN i % 3 <> 1 THEN '<title type="text">Doc ' || i::VARCHAR || ' &amp; co</title>' ELSE '' END)
      || '<link' || (CASE WHEN i % 2 = 0 THEN ' rel="alternate"' ELSE '' END)
      || ' href="' || {_MESSY_LINK_SQL} || '"/>'
      || (CASE WHEN i % 2 = 0 THEN '<id>urn:e' || i::VARCHAR || '</id>' ELSE '' END)
      || (CASE WHEN i % 4 <> 3 THEN
            '<updated>2026-' || lpad(((i % 12) + 1)::VARCHAR, 2, '0') || '-'
            || lpad(((i % 28) + 1)::VARCHAR, 2, '0') || 'T'
            || lpad((i % 24)::VARCHAR, 2, '0') || ':30:00'
            || (CASE WHEN i % 8 = 0 THEN '.5' ELSE '' END) || 'Z</updated>'
          ELSE '' END)
      || '</entry>'
"""


def _feed_xmls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One feed document per host: RSS on even hosts, Atom on odd —
    channel/feed-level <title>/<link> noise outside the entry blocks
    must be ignored by the parser."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(N_HOSTS))
    entry = F.when(F.pmod(h, F.lit(2)) == 0,
                   _rss_item(i, h)).otherwise(_atom_entry(i, h))
    hs = F.col("h").cast("string")
    head = F.when(
        F.pmod(F.col("h"), F.lit(2)) == 0,
        F.concat(F.lit('<rss version="2.0"><channel><title>host'), hs,
                 F.lit("</title><link>https://host"), hs,
                 F.lit(".example.com/</link>")),
    ).otherwise(
        F.concat(F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><title>host'),
                 hs, F.lit('</title><link href="https://host'), hs,
                 F.lit('.example.com/"/><updated>2026-01-01T00:00:00Z</updated>')),
    )
    tail = F.when(F.pmod(F.col("h"), F.lit(2)) == 0,
                  F.lit("</channel></rss>")).otherwise(F.lit("</feed>"))
    return (
        d.select(h.alias("h"), i.alias("i"), entry.alias("e"))
        .groupBy("h")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("i"), F.col("e")))),
                    lambda s: s["e"],
                ),
                "",
            ).alias("body")
        )
        .select(
            F.concat(F.lit("host"), hs, F.lit(".example.com")).alias("host"),
            F.concat(head, F.col("body"), tail).alias("xml"),
        )
    )


_FEED_XMLS_SQL = f"""
    docs AS (
        SELECT doc_id::BIGINT AS i, (doc_id % {N_HOSTS})::BIGINT AS h FROM documents
    ),
    entries AS (
        SELECT h, i,
               (CASE WHEN h % 2 = 0 THEN {_RSS_ITEM_SQL} ELSE {_ATOM_ENTRY_SQL} END) AS e
        FROM docs
    ),
    xmls AS (
        SELECT 'host' || h::VARCHAR || '.example.com' AS host,
               (CASE WHEN h % 2 = 0 THEN
                   '<rss version="2.0"><channel><title>host' || h::VARCHAR
                   || '</title><link>https://host' || h::VARCHAR || '.example.com/</link>'
                ELSE
                   '<feed xmlns="http://www.w3.org/2005/Atom"><title>host' || h::VARCHAR
                   || '</title><link href="https://host' || h::VARCHAR
                   || '.example.com/"/><updated>2026-01-01T00:00:00Z</updated>'
                END)
               || string_agg(e, '' ORDER BY i)
               || (CASE WHEN h % 2 = 0 THEN '</channel></rss>' ELSE '</feed>' END) AS xml
        FROM entries GROUP BY h
    )
"""

# the parse twin in DuckDB RE2 (mirrors operators.feeds regexes and the
# canonical-timestamp normalization; synthesis uses only &amp;, so the
# oracle's unescape chain needs only the named entities)
_FEED_PARSE_SQL = rf"""
    blocks AS (
        SELECT host, unnest(regexp_extract_all(
                   xml, '(?s)<(?:item|entry)(?:>|\s[^>]*>).*?</(?:item|entry)>', 0)) AS block,
               generate_subscripts(regexp_extract_all(
                   xml, '(?s)<(?:item|entry)(?:>|\s[^>]*>).*?</(?:item|entry)>', 0), 1) - 1 AS pos
        FROM xmls
    ),
    fields AS (
        SELECT host AS src_host,
               (CASE WHEN block LIKE '<item%' THEN 'rss' ELSE 'atom' END) AS fmt,
               pos::INT AS pos,
               replace(replace(replace(replace(replace(coalesce(
                   nullif(regexp_extract(block, '(?s)<link>\s*(.*?)\s*</link>', 1), ''),
                   nullif(regexp_extract(block, '<link[^>]*href="([^"]*)"', 1), '')
               ), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''), '&amp;', '&') AS link,
               regexp_extract(block, '(?s)<pubDate>\s*(.*?)\s*</pubDate>', 1) AS pubdate,
               regexp_extract(block, '(?s)<updated>\s*(.*?)\s*</updated>', 1) AS upd,
               nullif(coalesce(
                   nullif(regexp_extract(block, '(?s)<guid(?:>|\s[^>]*>)\s*(.*?)\s*</guid>', 1), ''),
                   nullif(regexp_extract(block, '(?s)<id(?:>|\s[^>]*>)\s*(.*?)\s*</id>', 1), '')
               ), '') AS entry_id,
               nullif(replace(regexp_extract(block, '(?s)<title(?:>|\s[^>]*>)\s*(.*?)\s*</title>', 1),
                              '&amp;', '&'), '') AS title
        FROM blocks
    ),
    rfc822 AS (
        SELECT *,
               regexp_extract(pubdate,
                   '(\d{{1,2}})\s+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+(\d{{4}})\s+(\d{{2}}:\d{{2}}(?::\d{{2}})?)',
                   ['d', 'm', 'y', 't']) AS p8,
               regexp_extract(upd, '(\d{{4}}-\d{{2}}-\d{{2}})[Tt ](\d{{2}}:\d{{2}}:\d{{2}})',
                   ['d', 't']) AS p3
        FROM fields
    ),
    parsed AS (
        SELECT src_host, fmt, pos, link, entry_id, title,
               coalesce(
                   (CASE WHEN p8['d'] <> '' THEN
                       p8['y'] || '-' || {_MONTH_NUM_SQL.format(m="p8['m']")} || '-'
                       || lpad(p8['d'], 2, '0') || ' '
                       || (CASE WHEN length(p8['t']) = 5 THEN p8['t'] || ':00' ELSE p8['t'] END)
                    END),
                   (CASE WHEN p3['d'] <> '' THEN p3['d'] || ' ' || p3['t'] END)
               ) AS published
        FROM rfc822
    )
"""


# --------------------------------------------------------------------------- #
# feed_ingest
# --------------------------------------------------------------------------- #
@query(
    "feed_ingest",
    f"""
    WITH {_FEED_XMLS_SQL},
    {_FEED_PARSE_SQL}
    SELECT src_host, fmt, pos, {canonicalize_sql('link', 'duckdb')} AS url,
           published, entry_id, title
    FROM parsed WHERE link IS NOT NULL
    """,
)
def q_feed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.feeds import parse_feeds

    return parse_feeds(_feed_xmls(spark, sf_dir))


# --------------------------------------------------------------------------- #
# feed_fresh — published-after-last-fetch reopen set. The fetch log is
# synthesized in canonical form (only URLs with a parseable published
# stamp can flag; only fetched URLs join).
# --------------------------------------------------------------------------- #
@query(
    "feed_fresh",
    f"""
    WITH {_FEED_XMLS_SQL},
    {_FEED_PARSE_SQL},
    fe AS (
        SELECT {canonicalize_sql('link', 'duckdb')} AS url,
               max(substr(published, 1, 10)::DATE) AS published_date
        FROM parsed
        WHERE link IS NOT NULL AND published IS NOT NULL
        GROUP BY 1
    ),
    fl AS (
        SELECT 'https://host' || h::VARCHAR || '.example.com/e/' || i::VARCHAR
               || (CASE WHEN i % 3 = 0 THEN '?a=1&b=2' ELSE '' END) AS url,
               ('2026-02-' || lpad((((i * 2) % 28) + 1)::VARCHAR, 2, '0'))::DATE AS fd
        FROM docs WHERE i % 2 = 0
    )
    SELECT fe.url, fe.published_date, fl.fd AS fetched_date
    FROM fe JOIN fl ON fe.url = fl.url
    WHERE fe.published_date > fl.fd
    """,
)
def q_feed_fresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.feeds import fresh_from_feeds, parse_feeds

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(N_HOSTS))
    fetch_log = (
        d.where(F.pmod(i, F.lit(2)) == 0)
        .select(
            F.concat(
                F.lit("https://host"), h.cast("string"), F.lit(".example.com/e/"),
                i.cast("string"),
                F.when(F.pmod(i, F.lit(3)) == 0,
                       F.lit("?a=1&b=2")).otherwise(F.lit("")),
            ).alias("url"),
            F.concat(
                F.lit("2026-02-"),
                F.lpad((F.pmod(i * 2, F.lit(28)) + 1).cast("string"), 2, "0"),
            ).alias("fetch_date"),
        )
    )
    return fresh_from_feeds(parse_feeds(_feed_xmls(spark, sf_dir)), fetch_log)
