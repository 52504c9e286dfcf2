"""robots.txt text parsing (RFC 9309 groups) — raw fetched bytes to the
engine's structured rule table, entirely in column expressions.

The engine evaluates robots rules from a structured (host, allow,
disallow, crawl_delay) frame (frontier._robots_split broadcasts it; the
reference delegates evaluation to the crawl4ai library). This module
closes the remaining gap to a real deployment: the robots.txt documents
a crawler actually FETCHES are text, and this parser produces that
frame — plus the site-wide ``Sitemap:`` directives that feed
operators.sitemap.parse_sitemaps, so raw robots bytes drive both rule
evaluation and seed discovery with no Python in the path.

RFC 9309 semantics implemented:
- lines are comment-stripped (#…) and trimmed; a group is a maximal run
  of ``User-agent:`` lines plus the rules that follow until the next
  run; blank lines do NOT end a group (§2.1);
- group selection (§2.2.1): if any group names our product token
  (case-insensitive exact match) those groups win EXCLUSIVELY;
  otherwise the ``*`` groups apply; multiple matching groups merge;
- ``Allow:`` / ``Disallow:`` values collect into the per-host rule
  arrays (empty ``Disallow:`` is a no-op per §2.2.2); ``Crawl-delay:``
  (de-facto extension) takes the MINIMUM across matching groups;
- ``Sitemap:`` is site-wide and group-independent (sitemaps.org
  protocol) — collected from anywhere in the file.

Scale shape: one split+posexplode per document, per-host windows over
line numbers (robots.txt is capped at 500 KiB by RFC 9309 §2.4 — the
window is bounded by construction), one groupBy(host) fold. Output
joins CrawlEngine(robots=…) and fixtures.budgets_from_crawl_delay
directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_KEY_RX = r"^([A-Za-z-]+)\s*:"


def parse_robots_txt(robots_docs: DataFrame, host_col: str = "host",
                     text_col: str = "text",
                     agent: str = "*") -> DataFrame:
    """Parse (host, text) robots.txt documents for product token
    ``agent`` → (host, allow, disallow, crawl_delay, sitemaps).

    Hosts whose file contains no matching group emit empty rule arrays
    (allow-all, per RFC 9309 §2.2.1) but still surface their
    ``Sitemap:`` directives."""
    agent_lc = agent.lower()
    host = F.col(host_col)

    # \r?\n: RFC 9309 §2.2 allows CRLF line endings (common in the
    # wild); a literal-\n split would leave every value with a trailing
    # \r that F.trim (spaces only) never removes — '*\r' then fails the
    # exact ua match and the host silently parses as allow-all.
    lines = robots_docs.select(
        host.alias("host"),
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias("ln", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    key = F.lower(F.regexp_extract(clean, _KEY_RX, 1))
    val = F.trim(F.regexp_replace(clean, _KEY_RX, ""))
    kv = lines.select("host", "ln", key.alias("key"), val.alias("val")).where(
        F.col("key") != ""
    )

    w = Window.partitionBy("host").orderBy("ln")
    is_ua = F.col("key") == "user-agent"
    new_grp = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    grouped = (
        kv.select("host", "ln", "key", "val", new_grp.cast("int").alias("ng"))
        .select(
            "host", "ln", "key", "val",
            F.sum("ng").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("grp"),
        )
        .where(F.col("grp") > 0)  # rules before any User-agent bind to nothing
    )

    ua_lc = F.lower(F.col("val"))
    gw = Window.partitionBy("host", "grp")
    hw = Window.partitionBy("host")
    flagged = grouped.select(
        "host", "grp", "key", "val",
        F.max(is_ua & (ua_lc == "*")).over(gw).alias("g_star"),
        F.max(is_ua & (ua_lc == F.lit(agent_lc))).over(gw).alias("g_agent"),
    ).withColumn("h_agent", F.max("g_agent").over(hw))
    matched = flagged.where(
        F.when(F.col("h_agent"), F.col("g_agent")).otherwise(F.col("g_star"))
    )

    rules = matched.groupBy("host").agg(
        F.array_sort(
            F.collect_list(
                F.when((F.col("key") == "allow") & (F.col("val") != ""), F.col("val"))
            )
        ).alias("allow"),
        F.array_sort(
            F.collect_list(
                F.when((F.col("key") == "disallow") & (F.col("val") != ""), F.col("val"))
            )
        ).alias("disallow"),
        F.min(
            F.when(F.col("key") == "crawl-delay", F.col("val").try_cast("double"))
        ).alias("crawl_delay"),
    )

    sitemaps = kv.where((F.col("key") == "sitemap") & (F.col("val") != "")).groupBy(
        "host"
    ).agg(F.array_sort(F.collect_set("val")).alias("sitemaps"))

    hosts = robots_docs.select(host.alias("host")).distinct()
    empty = F.array().cast("array<string>")
    return (
        hosts.join(rules, "host", "left")
        .join(sitemaps, "host", "left")
        .select(
            "host",
            F.coalesce("allow", empty).alias("allow"),
            F.coalesce("disallow", empty).alias("disallow"),
            "crawl_delay",
            F.coalesce("sitemaps", empty).alias("sitemaps"),
        )
    )
