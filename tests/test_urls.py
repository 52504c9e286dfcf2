"""Canonicalization: Spark exprs == DuckDB SQL == pure Python (one spec)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from crawl4ai_spark.functions.urls import (
    canonicalize,
    canonicalize_py,
    canonicalize_sql,
    url_host,
    url_host_py,
    url_path,
    url_path_py,
)

CASES = [
    ("HTTPS://Host3.EXAMPLE.com:443/a/b/c/5?b=2&a=1#frag", "https://host3.example.com/a/b/c/5?a=1&b=2"),
    ("http://x.com:80/", "http://x.com/"),
    ("http://x.com:8080/p?z=1&y=2&y=1", "http://x.com:8080/p?y=1&y=2&z=1"),
    ("https://h.com", "https://h.com/"),
    ("https://host1.example.com/p/9#sec3", "https://host1.example.com/p/9"),
    ("HTTP://A.B/", "http://a.b/"),
    ("https://a.com/p?", "https://a.com/p"),
    ("ftp://files.org:21/x", "ftp://files.org:21/x"),
    ("relative/path", "relative/path"),
]


def test_canonicalize_python():
    for raw, want in CASES:
        assert canonicalize_py(raw) == want, raw


def test_canonicalize_spark_matches(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = {r.url: r.c for r in df.select("url", canonicalize("url").alias("c")).collect()}
    for raw, want in CASES:
        assert got[raw] == want, raw


def test_canonicalize_duckdb_matches():
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": [u for u, _ in CASES]}))
    got = dict(con.sql(f"select url, {canonicalize_sql('url', 'duckdb')} from t").fetchall())
    for raw, want in CASES:
        assert got[raw] == want, raw


def test_host_path_helpers(spark):
    urls = [u for u, _ in CASES if "://" in u]
    df = spark.createDataFrame([(u,) for u in urls], ["url"]).select(
        "url", url_host("url").alias("h"), url_path("url").alias("p"))
    for r in df.collect():
        assert r.h == url_host_py(r.url)
        assert r.p == url_path_py(r.url)


def test_canonical_idempotent():
    for raw, want in CASES:
        assert canonicalize_py(want) == want


@pytest.mark.parametrize("n", [500])
def test_fixture_links_canonicalize_to_doc_urls(spark, n):
    """Duplicate link variants (frag/query-order/case/port) collapse to
    real doc URLs — the property URL-seen dedup depends on. Redirect
    aliases (F12) are the one sanctioned exception: every non-doc link
    must be a src in the redirects table (resolvable to a doc URL)."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.fixtures import build_documents, build_redirects

    docs = build_documents(spark, n, 10)
    links = (
        docs.select(F.explode(F.filter("spans", lambda s: s["kind"] == "link")).alias("s"))
        .select(canonicalize(F.col("s.media_ref")).alias("c"))
        # externals + the intentional query-order dup variants miss by design
        .where(~F.col("c").rlike("other\\.net|facebook") & ~F.col("c").contains("?"))
    )
    resolvable = docs.select(F.col("doc_id").alias("c")).unionByName(
        build_redirects(spark, n, 10).select(F.col("src_url").alias("c"))
    )
    missing = links.join(resolvable, "c", "left_anti").count()
    assert missing == 0


def test_query_order_variants_dedup(spark):
    """?b=2&a=1 and ?a=1&b=2 of the same target collapse to one URL."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.fixtures import build_documents

    docs = build_documents(spark, 400, 10)
    q = (
        docs.select(F.explode(F.filter("spans", lambda s: s["kind"] == "link")).alias("s"))
        .select(F.col("s.media_ref").alias("raw"), canonicalize(F.col("s.media_ref")).alias("c"))
        .where(F.col("raw").contains("?"))
    )
    rows = q.groupBy("c").agg(F.countDistinct("raw").alias("nraw")).collect()
    assert rows, "fixture should contain query variants"
    assert all(r.c.endswith("?a=1&b=2") for r in rows)


# --------------------------------------------------------------------------- #
# RFC 9309 §2.2.3 wildcard rule matching (engine robots evaluator)
# --------------------------------------------------------------------------- #
REP_CASES = [
    # (path, pattern, matches)
    ("/p/5/print", "/p/*/print", True),
    ("/p/5/print/x", "/p/*/print", True),      # no anchor → prefix semantics
    ("/p/print", "/p/*/print", False),          # * cannot absorb the slash-less gap
    ("/p/a/b/print", "/p/*/print", True),       # * spans multiple segments
    ("/dl/a.pdf", "/dl/*.pdf$", True),
    ("/dl/a.pdfx", "/dl/*.pdf$", False),        # trailing $ anchors
    ("/dl/a.pdf/x", "/dl/*.pdf$", False),
    ("/dl/xqpdf", "/dl/*.pdf$", False),         # '.' is literal, not regex any
    ("/dl/x.pdf", "/dl/*.pdf$", True),
    ("/exact", "/exact$", True),
    ("/exact/sub", "/exact$", False),
    ("/x$y/z", "/x$y", True),                   # mid-pattern $ is a literal octet
    ("/x$y", "/x$y", True),
    ("/p/foo", "/p/*", True),
    ("/q", "/p/*", False),
    ("/a(b)/c", "/a(b)*", True),                # regex metachars escaped
    ("/aXb/c", "/a(b)*", False),
    ("/login", "/login", True),                 # plain prefix fast path
    ("/login2", "/login", True),
    ("/log", "/login", False),
]


def test_rep_match_python():
    from crawl4ai_spark.functions.urls import rep_match_py

    for path, pat, want in REP_CASES:
        assert rep_match_py(path, pat) == want, (path, pat)


def test_rep_match_spark_matches_python(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import rep_match

    df = spark.createDataFrame(
        [(p, pat, want) for p, pat, want in REP_CASES], ["path", "pat", "want"])
    rows = df.select(
        "path", "pat", "want",
        rep_match(F.col("path"), F.col("pat")).alias("got")).collect()
    for r in rows:
        assert r.got == r.want, (r.path, r.pat)


def test_rep_best_match_longest_wins(spark):
    """Specificity = pattern octet length; allow/disallow fold picks max."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import rep_best_match, rep_best_py

    rules = ["/a", "/a/*7$", "/a/b"]
    cases = [("/a/b/c", 4), ("/a/17", 6), ("/a/x", 2), ("/z", 0)]
    for path, want in cases:
        assert rep_best_py(path, rules) == want, path
    df = spark.createDataFrame([(p,) for p, _ in cases], ["path"])
    arr = F.array(*[F.lit(r) for r in rules])
    got = {r.path: r.b for r in df.select(
        "path", rep_best_match(F.col("path"), arr).alias("b")).collect()}
    for path, want in cases:
        assert got[path] == want, path


def test_surt_key_spark_and_duckdb_agree(spark):
    """SURT keys: host labels reversed, non-default port kept, scheme
    dropped; the Spark and DuckDB forms agree on tricky canonical URLs,
    and lexicographic SURT order clusters a domain's subdomains."""
    import duckdb
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import surt_key, surt_key_sql

    cases = [
        ("https://sub.example.com/p?a=1&b=2", "com,example,sub)/p?a=1&b=2"),
        ("https://example.com/", "com,example)/"),
        ("http://a.b.host1.example.com:8080/x", "com,example,host1,b,a:8080)/x"),
        ("https://example.co.uk/y", "uk,co,example)/y"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = {r.url: r.surt for r in df.select(
        "url", surt_key(F.col("url")).alias("surt")).collect()}
    for url, want in cases:
        assert got[url] == want, url

    con = duckdb.connect()
    for url, want in cases:
        (dk,) = con.execute(
            "SELECT " + surt_key_sql(f"'{url}'", "duckdb")).fetchone()
        assert dk == want, url

    # domain clustering: every example.com URL sorts inside one range
    surts = sorted(got.values())
    com_example = [s for s in surts if s.startswith("com,example")]
    lo, hi = surts.index(com_example[0]), surts.index(com_example[-1])
    assert hi - lo + 1 == len(com_example)


def test_surt_key_nonstandard_schemes_and_relative():
    """Schemes with digits/plus/dot keep real SURT keys; non-absolute
    values pass through as their own key (no ')…' collapse). Both
    engines agree."""
    import duckdb
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import surt_key, surt_key_sql
    cases = [
        ("s3://bucket.name/key", "name,bucket)/key"),
        ("svn+ssh://host.example.com/repo", "com,example,host)/repo"),
        ("mailto:someone", "mailto:someone"),
        ("/relative/path", "/relative/path"),
    ]
    import tests.conftest  # session fixture owns the SparkSession
    from crawl4ai_spark.session import get_spark
    spark = get_spark()
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = {r.url: r.s for r in df.select(
        "url", surt_key(F.col("url")).alias("s")).collect()}
    con = duckdb.connect()
    for url, want in cases:
        assert got[url] == want, url
        (dk,) = con.execute(
            "SELECT " + surt_key_sql(f"'{url}'", "duckdb")).fetchone()
        assert dk == want, url


def test_registrable_domain_psl_rules(spark):
    """PSL eTLD+1: 2-label public suffixes take three labels, private
    registry suffixes stay per-tenant, IPs and single labels are their
    own key — Spark and DuckDB twins agree on every case."""
    import duckdb
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.urls import (
        registrable_domain, registrable_domain_sql)

    cases = [
        ("www.example.com", "example.com"),
        ("img3.cdn.example.com", "example.com"),
        ("a.b.news.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("co.uk", "co.uk"),                      # host IS a public suffix
        ("alice.github.io", "alice.github.io"),  # per-tenant registrant
        ("deep.sub.alice.github.io", "alice.github.io"),
        ("shop.site.com.au", "site.com.au"),
        ("192.168.10.250", "192.168.10.250"),
        ("localhost", "localhost"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["host"])
    got = {r.host: r.d for r in df.select(
        "host", registrable_domain(F.col("host")).alias("d")).collect()}
    got_sql = {r.host: r.d for r in df.select(
        "host", F.expr(registrable_domain_sql("host", "spark")).alias("d")
    ).collect()}
    con = duckdb.connect()
    for host, want in cases:
        assert got[host] == want, host
        assert got_sql[host] == want, f"spark-dialect SQL: {host}"
        (dk,) = con.execute(
            "SELECT " + registrable_domain_sql(f"'{host}'", "duckdb")).fetchone()
        assert dk == want, host
    # the spark dialect must not loosen the IP class ('\.' -> '.')
    assert got_sql.get("192.168.10.250") == "192.168.10.250"
    ip_like = spark.createDataFrame([("1.2-3.4.example.com",)], ["host"])
    (r,) = ip_like.select(
        F.expr(registrable_domain_sql("host", "spark")).alias("d")).collect()
    assert r.d == "example.com"


def test_canonicalize_strip_params(spark):
    """DUST feedback in canonicalization: stripped params are removed
    before the sorted rebuild, full-strip leaves no dangling '?', and
    kept params still sort."""
    from crawl4ai_spark.functions.urls import canonicalize

    cases = [
        ("https://A.com/p?b=2&session=x&a=1", "https://a.com/p?a=1&b=2"),
        ("https://a.com/p?session=x", "https://a.com/p"),
        ("https://a.com/p?session=x&utm=y", "https://a.com/p"),
        ("https://a.com/p", "https://a.com/p"),
        ("https://a.com/p?sessions=keepme", "https://a.com/p?sessions=keepme"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["u"])
    got = [r.c for r in df.select(
        canonicalize("u", ("session", "utm")).alias("c")).collect()]
    assert got == [want for _, want in cases]
    # None leaves behavior byte-identical to the un-parameterized form
    plain = [r.c for r in df.select(canonicalize("u").alias("c")).collect()]
    noop = [r.c for r in df.select(canonicalize("u", None).alias("c")).collect()]
    assert plain == noop
