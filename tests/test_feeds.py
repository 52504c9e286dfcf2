"""Feed ingestion (operators/feeds.py): RSS 2.0 + Atom parse, seed
anti-join, published-after-fetch freshness."""

from __future__ import annotations

from crawl4ai_spark.operators.feeds import (
    feed_seeds,
    fresh_from_feeds,
    parse_feeds,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>chan</title><link>https://a.example.com/</link>
<item>
  <title>First &amp; finest</title>
  <link>HTTPS://A.EXAMPLE.COM:443/p/1?b=2&amp;a=1#x</link>
  <guid isPermaLink="false">tag:1</guid>
  <pubDate>Mon, 5 Jan 2026 08:30:00 GMT</pubDate>
</item>
<item>
  <link>https://a.example.com/p/2</link>
  <pubDate>Tue, 06 Jan 2026 09:15 GMT</pubDate>
</item>
<item><title>linkless — dropped</title></item>
<item><link>https://a.example.com/p/3</link><pubDate>not a date</pubDate></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>feed</title><link href="https://b.example.com/"/>
<updated>2026-01-01T00:00:00Z</updated>
<entry>
  <title type="text">Entry one</title>
  <link rel="alternate" href="https://b.example.com/e/1"/>
  <id>urn:e1</id>
  <updated>2026-02-03T10:00:00.5Z</updated>
</entry>
<entry>
  <link href="HTTP://B.EXAMPLE.COM:80/e/2"/>
</entry>
</feed>"""


def _parsed(spark):
    feeds = spark.createDataFrame(
        [("a.example.com", RSS), ("b.example.com", ATOM)],
        "host string, xml string",
    )
    return parse_feeds(feeds)


def test_parse_rss(spark):
    rows = {r.pos: r for r in _parsed(spark).where("fmt = 'rss'").collect()}
    # linkless item dropped; channel-level <link> ignored (not a block)
    assert set(rows) == {0, 1, 3}
    r0 = rows[0]
    assert r0.src_host == "a.example.com"
    assert r0.url == "https://a.example.com/p/1?a=1&b=2"  # canonical
    assert r0.published == "2026-01-05 08:30:00"          # 1-digit day lpadded
    assert r0.entry_id == "tag:1"
    assert r0.title == "First & finest"
    r1 = rows[1]
    assert r1.published == "2026-01-06 09:15:00"          # hh:mm grammar
    assert r1.entry_id is None and r1.title is None
    assert rows[3].published is None                      # junk date nulls out


def test_parse_atom(spark):
    rows = {r.pos: r for r in _parsed(spark).where("fmt = 'atom'").collect()}
    assert set(rows) == {0, 1}
    r0 = rows[0]
    assert r0.url == "https://b.example.com/e/1"
    assert r0.published == "2026-02-03 10:00:00"          # fraction dropped
    assert r0.entry_id == "urn:e1"
    assert r0.title == "Entry one"                        # attributed tag
    r1 = rows[1]
    assert r1.url == "http://b.example.com/e/2"          # canonicalized
    assert r1.published is None and r1.entry_id is None


def test_feed_seeds_anti_join(spark):
    parsed = _parsed(spark)
    assert feed_seeds(parsed).count() == 5
    seen = spark.createDataFrame(
        [("https://a.example.com/p/1?a=1&b=2",), ("http://b.example.com/e/2",)],
        "url string",
    )
    got = {r.url for r in feed_seeds(parsed, seen).collect()}
    assert got == {
        "https://a.example.com/p/2",
        "https://a.example.com/p/3",
        "https://b.example.com/e/1",
    }


def test_fresh_from_feeds_last_fetch_wins(spark):
    parsed = _parsed(spark)
    # p/1 published 2026-01-05; first fetch older, refetch newer — the
    # LAST fetch governs, so it must NOT flag. e/1 (2026-02-03) fetched
    # 2026-01-10 → flags. p/2 never fetched → drops.
    log = spark.createDataFrame(
        [
            ("https://a.example.com/p/1?a=1&b=2", "2026-01-02"),
            ("https://a.example.com/p/1?a=1&b=2", "2026-01-09"),
            ("https://b.example.com/e/1", "2026-01-10"),
            ("http://b.example.com/e/2", "2026-01-10"),  # no published → drops
        ],
        "url string, fetch_date string",
    )
    got = {(r.url, str(r.published_date)) for r in
           fresh_from_feeds(parsed, log).collect()}
    assert got == {("https://b.example.com/e/1", "2026-02-03")}
