"""robots.txt text parsing (operators/robots.py): RFC 9309 group
semantics and the closed loop raw bytes → engine rule table → crawl.
The DuckDB oracle (robots_txt_parse) proves cross-engine parse
equality; these pin meaning."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawl4ai_spark.operators.robots import parse_robots_txt

TXT = """# example file
User-Agent: FancyBot
Disallow: /fancy
Sitemap: https://a.com/sm1.xml

User-agent: SparkBot
User-agent: OtherBot
Disallow: /private # trailing comment
Crawl-delay: 9

User-agent: *
Disallow: /login
Allow: /login/p/1*
Disallow:
crawl-delay: 2
stray line without a colon
Sitemap: https://a.com/sm2.xml
"""


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_group_selection_and_rules(spark):
    df = _df(spark, [("a.com", TXT), ("empty.com", "no directives here\n")])

    # generic crawler: the '*' group; empty Disallow is a no-op,
    # comments stripped, lowercase keys accepted
    star = {r.host: r for r in parse_robots_txt(df, agent="*").collect()}
    assert star["a.com"].allow == ["/login/p/1*"]
    assert star["a.com"].disallow == ["/login"]
    assert star["a.com"].crawl_delay == 2.0
    # Sitemap is site-wide and group-independent
    assert star["a.com"].sitemaps == [
        "https://a.com/sm1.xml", "https://a.com/sm2.xml"]
    # a file with no matching group = allow-all, no delay
    assert star["empty.com"].allow == [] and star["empty.com"].disallow == []
    assert star["empty.com"].crawl_delay is None

    # named agent: its group wins EXCLUSIVELY over '*' (RFC 9309
    # §2.2.1); the ua match is case-insensitive; a group's ua run may
    # name several agents
    named = {r.host: r for r in parse_robots_txt(df, agent="SPARKBOT").collect()}
    assert named["a.com"].disallow == ["/private"]
    assert named["a.com"].allow == []
    assert named["a.com"].crawl_delay == 9.0

    # unknown agent falls back to '*'
    other = {r.host: r for r in parse_robots_txt(df, agent="nobody").collect()}
    assert other["a.com"].disallow == ["/login"]


def test_raw_bytes_to_engine_loop(spark, tmp_path):
    """The full front door: raw robots.txt text → parse_robots_txt →
    CrawlEngine(robots=...) blocks the disallowed path, and the file's
    Sitemap directive → parse_sitemaps → seeds drive the same engine."""
    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import budgets_from_crawl_delay, write_fixtures
    from crawl4ai_spark.operators.frontier import CrawlEngine
    from crawl4ai_spark.operators.sitemap import parse_sitemaps, sitemap_seeds

    fx = f"{tmp_path}/fx"
    write_fixtures(spark, fx, n_docs=200, n_hosts=4)
    docs = spark.read.parquet(f"{fx}/documents.parquet")
    seed = (
        docs.where(docs.doc_id.contains("host3")).orderBy("doc_id")
        .limit(1).collect()[0].doc_id
    )

    raw = _df(spark, [(
        "host3.example.com",
        "User-agent: *\nDisallow: /r/\nCrawl-delay: 0.5\n"
        "Sitemap: https://host3.example.com/sitemap.xml\n",
    )])
    rules = parse_robots_txt(raw)
    r = rules.collect()[0]
    assert r.disallow == ["/r/"] and r.crawl_delay == 0.5
    assert r.sitemaps == ["https://host3.example.com/sitemap.xml"]

    # crawl_delay feeds the politeness budget calculator unchanged
    b = budgets_from_crawl_delay(rules, round_period_s=2.0).collect()[0]
    assert b.budget == 4

    # the sitemap named by the directive (synthesized here as its
    # fetched body) yields the seed; the parsed rules gate the crawl
    sm = _df(spark, [(
        "host3.example.com",
        f"<urlset><url><loc>{seed}</loc></url></urlset>",
    )])
    seeds = [x.url for x in
             sitemap_seeds(parse_sitemaps(sm, xml_col="text")).collect()]
    assert seeds == [seed]

    eng = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=seeds, max_pages=20, respect_robots=True),
        f"{tmp_path}/state",
        robots=rules.select("host", "allow", "disallow", "crawl_delay"),
    )
    eng.run()
    pages = eng.pages()
    fetched = [x.url for x in pages.collect()]
    assert fetched, "crawl must fetch something"
    # /r/... alias URLs exist in this seed's subtree but are
    # robots-blocked for every DISCOVERED link (seeds are fetched as
    # handed, like the reference)
    assert not any("/r/" in u for u in fetched if u != seed)
    assert len(fetched) > 1, "the crawl must discover beyond the seed"
    blocked = eng.url_seen().where(F.col("state") == "robots_blocked")
    assert blocked.count() > 0


def test_crlf_line_endings(spark):
    """RFC 9309 allows CRLF; values must not carry a trailing \\r (a
    '*\\r' user-agent silently parses as allow-all otherwise)."""
    crlf = TXT.replace("\n", "\r\n")
    df = _df(spark, [("a.com", crlf)])
    r = {x.host: x for x in parse_robots_txt(df, agent="*").collect()}["a.com"]
    assert r.disallow == ["/login"] and r.allow == ["/login/p/1*"]
    assert r.crawl_delay == 2.0
    assert r.sitemaps == ["https://a.com/sm1.xml", "https://a.com/sm2.xml"]


def test_text_roundtrip_drives_identical_crawl(spark, corpus_dir, tmp_path):
    """Capstone equivalence: render the fixture's STRUCTURED robots
    rules back to robots.txt text, re-parse with parse_robots_txt, and
    a politeness crawl using the parsed frame + auto-derived budgets
    (round_period_s) equals the crawl using the structured frame +
    explicit budgets_from_crawl_delay — the text front door is lossless
    end-to-end."""
    from tests.test_crawl import _load, get_seeds

    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.fixtures import budgets_from_crawl_delay
    from crawl4ai_spark.operators.frontier import CrawlEngine

    docs, robots, _, _, _, _ = _load(spark, corpus_dir)

    # render: one robots.txt per host (CRLF endings, comments, for spice)
    def render(r):
        lines = ["# generated", "User-agent: *"]
        lines += [f"Allow: {a}" for a in (r.allow or [])]
        lines += [f"Disallow: {d}" for d in (r.disallow or [])]
        if r.crawl_delay is not None:
            lines.append(f"Crawl-delay: {r.crawl_delay}")
        return (r.host, "\r\n".join(lines) + "\r\n")

    txt = spark.createDataFrame(
        [render(r) for r in robots.collect()], "host string, text string")
    parsed = parse_robots_txt(txt)

    # round-trip exactness (parse sorts rule arrays; fixture arrays are
    # compared as sets)
    want = {r.host: r for r in robots.collect()}
    got = {r.host: r for r in parsed.collect()}
    assert set(got) == set(want)
    for h, r in got.items():
        assert sorted(want[h].allow or []) == r.allow, h
        assert sorted(want[h].disallow or []) == r.disallow, h
        assert want[h].crawl_delay == r.crawl_delay, h

    seeds = get_seeds(spark, corpus_dir)
    base = dict(seeds=seeds, strategy="bfs", max_depth=3, max_pages=60,
                politeness=True, respect_robots=True)
    a = CrawlEngine(spark, docs, CrawlConfig(**base), str(tmp_path / "a"),
                    robots=robots,
                    host_budgets=budgets_from_crawl_delay(robots, 2.0))
    b = CrawlEngine(spark, docs, CrawlConfig(**base, round_period_s=2.0),
                    str(tmp_path / "b"),
                    robots=parsed.select("host", "allow", "disallow", "crawl_delay"))
    a.run(), b.run()
    pa = [(r.rank, r.url) for r in a.pages().orderBy("rank").collect()]
    pb = [(r.rank, r.url) for r in b.pages().orderBy("rank").collect()]
    assert pa == pb and len(pa) >= 20
