"""Sitemap ingestion (operators/sitemap.py): protocol parsing edge
cases and the seed handoff into the crawl engine. The DuckDB oracle
(sitemap_ingest) proves cross-engine parse equality; these pin meaning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.operators.sitemap import parse_sitemaps, sitemap_seeds

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>HTTPS://Example.COM:443/a?b=2&amp;a=1#frag</loc>
    <lastmod>2026-01-05</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://example.com/bare</loc></url>
  <url><lastmod>2026-01-06</lastmod></url>
  <url>
    <loc>
      https://example.com/padded
    </loc>
  </url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://example.com/s1.xml</loc></sitemap>
  <sitemap><loc>HTTP://EXAMPLE.com:80/s2.xml</loc></sitemap>
</sitemapindex>"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, xml string")


def test_parse_urlset_semantics(spark):
    out = parse_sitemaps(_df(spark, [("example.com", URLSET)]))
    rows = {r.pos: r for r in out.where(F.col("kind") == "url").collect()}
    # the loc-less block is dropped, positions keep file order
    assert sorted(rows) == [0, 1, 3]
    full = rows[0]
    # canonicalized: lowercase host, default port stripped, the
    # XML-escaped &amp; decoded BEFORE the query-param sort, fragment gone
    assert full.url == "https://example.com/a?a=1&b=2"
    assert full.lastmod == "2026-01-05" and full.priority == 0.8
    bare = rows[1]
    assert bare.url == "https://example.com/bare"
    assert bare.lastmod is None and bare.priority is None
    # whitespace-padded loc values are trimmed before canonicalization
    assert rows[3].url == "https://example.com/padded"


def test_parse_index_and_seed_handoff(spark):
    parsed = parse_sitemaps(_df(spark, [
        ("example.com", URLSET), ("hub.example.com", INDEX),
    ]))
    hubs = {r.url for r in parsed.where(F.col("kind") == "sitemap").collect()}
    assert hubs == {"https://example.com/s1.xml", "http://example.com/s2.xml"}

    # seeds: distinct leaf urls only; seen anti-join removes known ones
    seeds = {r.url for r in sitemap_seeds(parsed).collect()}
    assert seeds == {
        "https://example.com/a?a=1&b=2",
        "https://example.com/bare",
        "https://example.com/padded",
    }
    seen = spark.createDataFrame(
        [("https://example.com/bare",)], "url string")
    left = {r.url for r in sitemap_seeds(parsed, seen=seen).collect()}
    assert left == seeds - {"https://example.com/bare"}


def test_sitemap_seeds_drive_the_engine(spark, tmp_path):
    """A crawl seeded from a parsed sitemap equals a crawl seeded from
    the explicit URL list — the handoff is lossless."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import write_fixtures
    from crawl4ai_spark.operators.frontier import CrawlEngine

    fx = f"{tmp_path}/fx"
    write_fixtures(spark, fx, n_docs=200, n_hosts=4)
    docs = spark.read.parquet(f"{fx}/documents.parquet")
    seed = (
        docs.where(docs.doc_id.contains("host3")).orderBy("doc_id")
        .limit(1).collect()[0].doc_id
    )
    # upper-case the host part only (paths are case-significant)
    host_end = seed.index("/", len("https://"))
    messy = "HTTPS://" + seed[len("https://"):host_end].upper() + seed[host_end:]
    xml = f"<urlset><url><loc>{messy}</loc></url></urlset>"
    sm = _df(spark, [("host3.example.com", xml)])
    seeds = [r.url for r in sitemap_seeds(parse_sitemaps(sm)).collect()]
    assert seeds == [seed]

    a = CrawlEngine(spark, docs, CrawlConfig(seeds=seeds, max_pages=15),
                    f"{tmp_path}/sa")
    b = CrawlEngine(spark, docs, CrawlConfig(seeds=[seed], max_pages=15),
                    f"{tmp_path}/sb")
    a.run(), b.run()
    pa = [(r.rank, r.url) for r in a.pages().orderBy("rank").collect()]
    pb = [(r.rank, r.url) for r in b.pages().orderBy("rank").collect()]
    assert pa == pb and len(pa) >= 5


def test_sitemap_lastmod_drives_reopen(spark, tmp_path):
    """Freshness loop, sitemap edition: lastmod newer than the fetch
    date selects exactly those pages, reopen re-dispatches them, and the
    pages log grows one new resolved generation per stale URL."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import write_fixtures
    from crawl4ai_spark.operators.frontier import CrawlEngine
    from crawl4ai_spark.operators.sitemap import parse_sitemaps, stale_from_sitemap

    fx = f"{tmp_path}/fx"
    write_fixtures(spark, fx, n_docs=300, n_hosts=5)
    docs = spark.read.parquet(f"{fx}/documents.parquet")
    seed = (
        docs.where(docs.doc_id.contains("host4")).orderBy("doc_id")
        .limit(1).collect()[0].doc_id
    )
    eng = CrawlEngine(spark, docs, CrawlConfig(seeds=[seed], max_pages=25),
                      f"{tmp_path}/state")
    eng.run()
    fetched = sorted(r.url for r in eng.pages().collect())
    assert len(fetched) >= 5
    stale_urls, fresh_urls = fetched[:2], fetched[2:]

    # the site re-publishes its sitemap: the two stale pages carry a
    # lastmod AFTER the crawl date, the rest before it
    entries = "".join(
        f"<url><loc>{u}</loc><lastmod>{'2026-02-01' if u in stale_urls else '2026-01-01'}</lastmod></url>"
        for u in fetched
    )
    sm = parse_sitemaps(
        spark.createDataFrame(
            [("host4.example.com", f"<urlset>{entries}</urlset>")],
            "host string, xml string"),
    )
    fetch_log = spark.createDataFrame(
        [(u, "2026-01-15") for u in fetched], "url string, fetch_date string")
    due = stale_from_sitemap(sm, fetch_log)
    assert sorted(r.url for r in due.collect()) == stale_urls

    n_before = eng.pages(resolved=True).count()
    assert eng.reopen(due.select("url")) == len(stale_urls)
    eng2 = CrawlEngine(spark, docs, CrawlConfig(seeds=[seed], max_pages=25),
                       f"{tmp_path}/state")
    eng2.run(resume=True)
    after = eng2.pages(resolved=True)
    assert after.count() == n_before + len(stale_urls)
    # the new generation rows are exactly the stale URLs
    from pyspark.sql import functions as F2
    gen2 = (after.groupBy("url").count().where(F2.col("count") > 1))
    assert sorted(r.url for r in gen2.collect()) == stale_urls


def test_parse_hardening_numeric_refs_and_bad_values(spark):
    """Review hardening: numeric character references decode like their
    named twins; a non-numeric <priority> nulls out instead of raising
    under ANSI mode; '&amp;lt;' stays a literal '&lt;'."""
    xml = (
        "<urlset>"
        "<url><loc>https://e.com/p?a=1&#38;b=2</loc>"
        "<priority>high</priority></url>"
        "<url><loc>https://e.com/q?x=1&#x26;y=2</loc></url>"
        "<url><loc>https://e.com/amp&amp;lt;</loc></url>"
        "</urlset>"
    )
    rows = {r.pos: r for r in parse_sitemaps(
        _df(spark, [("e.com", xml)])).collect()}
    assert rows[0].url == "https://e.com/p?a=1&b=2"
    assert rows[0].priority is None
    assert rows[1].url == "https://e.com/q?x=1&y=2"
    assert rows[2].url == "https://e.com/amp&lt;"


def test_stale_uses_last_fetch_generation(spark):
    """A multi-generation fetch log (the pages-log shape after a reopen)
    compares against the LAST fetch — an already-refetched page must not
    re-flag, and unparseable dates drop instead of raising."""
    from crawl4ai_spark.operators.sitemap import stale_from_sitemap

    sm = parse_sitemaps(_df(spark, [(
        "e.com",
        "<urlset><url><loc>https://e.com/a</loc><lastmod>2026-02-01</lastmod></url>"
        "<url><loc>https://e.com/b</loc><lastmod>2026-02-01</lastmod></url>"
        "<url><loc>https://e.com/c</loc><lastmod>not a date</lastmod></url></urlset>",
    )]))
    fetch_log = spark.createDataFrame(
        [("https://e.com/a", "2026-01-01"),
         ("https://e.com/a", "2026-02-05"),   # refetched after lastmod
         ("https://e.com/b", "2026-01-01"),
         ("https://e.com/c", "2026-01-01"),
         ("https://e.com/b", "garbage")],     # bad date drops, row 3 stands
        "url string, fetch_date string")
    got = {r.url: r for r in stale_from_sitemap(sm, fetch_log).collect()}
    assert set(got) == {"https://e.com/b"}
    assert str(got["https://e.com/b"].fetched_date) == "2026-01-01"


def test_mixed_amp_escape_single_pass(spark):
    """'&amp;#38;' is ONE XML decode away from the literal '&#38;' —
    sequential amp passes would double-decode it to '&'. (Downstream
    URL canonicalization then legitimately treats the literal '#' as a
    fragment start; the decode layer itself must not over-decode.)"""
    from crawl4ai_spark.operators.sitemap import _xml_unescape

    df = spark.createDataFrame(
        [("a&amp;#38;b",), ("x&#38;y",), ("p&amp;q",), ("&amp;lt;",)],
        ["s"])
    got = [r.d for r in df.select(_xml_unescape(F.col("s")).alias("d")).collect()]
    assert got == ["a&#38;b", "x&y", "p&q", "&lt;"]


def test_changefreq_parse_and_priors(spark):
    """changefreq completes the sitemap leaf schema: the enum parses
    case-insensitively, junk values carry no prior, and a URL declared
    in two sitemaps takes the fastest declared rate."""
    from crawl4ai_spark.operators.sitemap import (CHANGEFREQ_LAMBDA_H,
                                                  parse_sitemaps,
                                                  revisit_priors_from_sitemap)

    xml_a = """<urlset>
      <url><loc>https://a.com/fast</loc><changefreq>Hourly</changefreq></url>
      <url><loc>https://a.com/slow</loc><changefreq>monthly</changefreq></url>
      <url><loc>https://a.com/junk</loc><changefreq>fortnightly</changefreq></url>
      <url><loc>https://a.com/none</loc></url>
    </urlset>"""
    xml_b = """<urlset>
      <url><loc>https://a.com/fast</loc><changefreq>daily</changefreq></url>
    </urlset>"""
    sm = spark.createDataFrame(
        [("a.com", xml_a), ("a.com", xml_b)], "host string, xml string")
    parsed = parse_sitemaps(sm)
    cf = {r.url: r.changefreq for r in parsed.collect()}
    assert cf["https://a.com/fast"] in ("hourly", "daily")
    assert cf["https://a.com/slow"] == "monthly"
    assert cf["https://a.com/junk"] == "fortnightly"
    assert cf["https://a.com/none"] is None
    priors = {r.url: r.lambda_prior_per_h
              for r in revisit_priors_from_sitemap(parsed).collect()}
    # fastest declared rate wins for the doubly-declared URL
    assert priors["https://a.com/fast"] == CHANGEFREQ_LAMBDA_H["hourly"]
    assert priors["https://a.com/slow"] == CHANGEFREQ_LAMBDA_H["monthly"]
    assert "https://a.com/junk" not in priors   # outside the enum: no prior
    assert "https://a.com/none" not in priors


def test_build_sitemaps_roundtrip_and_cap(spark):
    """The publish side: build_sitemaps respects the per-file URL cap
    EXACTLY (every file ≤ cap, all but the last per host full),
    parse_sitemaps recovers the canonical URL set and lastmod values
    bit-for-bit (round-trip identity incl. &-escaping), and the
    sitemapindex lists every generated file once."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import canonicalize_py
    from crawl4ai_spark.operators.sitemap import (build_sitemap_index,
                                                  build_sitemaps,
                                                  parse_sitemaps)

    rows = [("h0.example.com", f"https://h0.example.com/p/{i}?b=2&a=1",
             f"2026-02-{(i % 27) + 1:02d}") for i in range(23)]
    rows += [("h1.example.com", f"https://h1.example.com/x/{i}", None)
             for i in range(5)]
    urls = spark.createDataFrame(rows, "host string, url string, lastmod string")
    files = build_sitemaps(urls, lastmod_col="lastmod", max_per_file=10)
    got_files = files.collect()
    # cap holds exactly; per host, every file but the highest-idx is full
    per_host: dict[str, list] = {}
    for f in got_files:
        assert 1 <= f.n_urls <= 10
        per_host.setdefault(f.host, []).append(f)
    assert {h: len(fs) for h, fs in per_host.items()} == {
        "h0.example.com": 3, "h1.example.com": 1}
    for fs in per_host.values():
        last = max(f.file_idx for f in fs)
        assert all(f.n_urls == 10 for f in fs if f.file_idx != last)
    # round-trip: parse recovers every (host, canonical url, lastmod)
    back = parse_sitemaps(
        files.select("host", "xml"), host_col="host", xml_col="xml")
    got = {(r.src_host, r.url, r.lastmod) for r in back.collect()}
    want = {(h, canonicalize_py(u), lm) for h, u, lm in rows}
    assert got == want and all(r.kind == "url" for r in back.collect())
    # the index lists each file exactly once, in file order
    idx = {r.host: r for r in build_sitemap_index(files).collect()}
    assert idx["h0.example.com"].n_files == 3
    for h, fs in per_host.items():
        for f in fs:
            assert f"<sitemap><loc>https://{h}/sitemap-{f.file_idx}.xml</loc></sitemap>" \
                in idx[h].xml
    # an index parses as kind='sitemap' entries pointing at the files
    pidx = parse_sitemaps(
        build_sitemap_index(files).select("host", "xml"),
        host_col="host", xml_col="xml").collect()
    assert all(r.kind == "sitemap" for r in pidx)
    assert sum(1 for r in pidx if r.src_host == "h0.example.com") == 3
