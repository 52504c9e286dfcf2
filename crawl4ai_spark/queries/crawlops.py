"""Named query surface: (Spark DataFrame builder, DuckDB oracle SQL) pairs.

Every operator claimed in SURVEY.md §2 that is SQL-expressible gets one
entry here; ``__spark_entry__.py`` re-exports them. The Spark side is
idiomatic DataFrame API (JVM built-ins, no per-row Python); the oracle
side is ANSI-ish DuckDB SQL over the same parquet tables. Shared
deterministic definitions (canonicalization template, md5-60-bit hash,
scorer arithmetic, stopword lists) live in ``functions/`` so both sides
agree bit-for-bit.

Cross-engine determinism rules used throughout:
* hashes: md5-derived (functions.hashing.h60) — identical in both engines.
* float outputs rounded (4-6 dp) and computed with the same operation
  order (explicit fold, not engine-chosen aggregation order) where the
  value feeds ordering.
* sums over doubles that only feed output (not ordering) are emitted as
  exact integer cents/chars to dodge fp-accumulation-order differences.
* every computed column is aliased identically in both dialects (the
  driver hash-compares by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T
from ..functions.scoring import (
    keyword_score,
    keyword_score_sql,
    link_score,
    link_score_sql,
)
from ..functions.urls import (
    canonicalize,
    canonicalize_sql,
    registrable_domain_sql,
    surt_key_sql,
)
from .registry import query, table as _t



# --------------------------------------------------------------------------- #
# shared synthetic derivations (identical arithmetic in both dialects)
# --------------------------------------------------------------------------- #
N_HOSTS = 7          # synthetic URL host count: host<doc_id % 7>.example.com
GRAPH_DEGREE = 4     # arithmetic link graph out-degree
BFS_DEPTH = 3


def _messy_url(doc_id: F.Column, source: F.Column) -> F.Column:
    """A deliberately non-canonical URL derived from a documents row:
    uppercase scheme/host, explicit default port, variant-by-id suffix."""
    d = doc_id.cast("string")
    suffix = (
        F.when(F.pmod(doc_id, F.lit(3)) == 0, F.lit("?b=2&a=1"))
        .when(F.pmod(doc_id, F.lit(3)) == 1, F.lit("#frag"))
        .otherwise(F.lit(""))
    )
    return F.concat(
        F.lit("HTTP://Host"), F.pmod(doc_id, F.lit(N_HOSTS)).cast("string"),
        F.lit(".Example.COM:80/"), source, F.lit("/"), d, suffix,
    )


_MESSY_URL_SQL = (
    "('HTTP://Host' || (doc_id % 7)::VARCHAR || '.Example.COM:80/' || source "
    "|| '/' || doc_id::VARCHAR || (CASE WHEN doc_id % 3 = 0 THEN '?b=2&a=1' "
    "WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END))"
)


def _graph_url(d: F.Column) -> F.Column:
    return F.concat(
        F.lit("https://host"), F.pmod(d, F.lit(N_HOSTS)).cast("string"),
        F.lit(".example.com/p/"), d.cast("string"),
    )


def _graph_url_sql(e: str) -> str:
    return (
        f"('https://host' || (({e}) % 7)::VARCHAR || '.example.com/p/' || ({e})::VARCHAR)"
    )


# --------------------------------------------------------------------------- #
# F10: URL canonicalization (north-rule: lowercase host, strip fragment +
# default port, sort query params) — shared template, both dialects.
# --------------------------------------------------------------------------- #
@query(
    "url_canonicalize",
    f"""
    SELECT doc_id::BIGINT AS doc_id,
           {canonicalize_sql(_MESSY_URL_SQL, 'duckdb')} AS url_canon
    FROM documents
    """,
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        canonicalize(_messy_url(F.col("doc_id"), F.col("source"))).alias("url_canon"),
    )


# --------------------------------------------------------------------------- #
# F10 + dedup: URL-seen set — fold 3 raw variants per doc to canonical form,
# count variants per canonical URL per host.
# --------------------------------------------------------------------------- #
_VARIANTS_SQL = f"""
    SELECT u.url_raw
    FROM documents d,
         unnest([
            'https://host' || (d.doc_id % 7)::VARCHAR || '.example.com/p/' || d.doc_id::VARCHAR,
            'HTTPS://HOST' || (d.doc_id % 7)::VARCHAR || '.EXAMPLE.COM/p/' || d.doc_id::VARCHAR || '#sec',
            'https://host' || (d.doc_id % 7)::VARCHAR || '.example.com:443/p/' || d.doc_id::VARCHAR || '?z=1&a=2'
         ]) AS u(url_raw)
"""


@query(
    "url_seen_fold",
    f"""
    WITH variants AS ({_VARIANTS_SQL}),
    canon AS (
        SELECT {canonicalize_sql('url_raw', 'duckdb')} AS url FROM variants
    )
    SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
           count(DISTINCT url)::BIGINT AS n_seen,
           count(*)::BIGINT AS n_raw
    FROM canon GROUP BY 1
    """,
)
def q_url_seen_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long").alias("doc_id"))
    i = F.col("doc_id")
    h = F.pmod(i, F.lit(N_HOSTS)).cast("string")
    variants = d.select(
        F.explode(
            F.array(
                F.concat(F.lit("https://host"), h, F.lit(".example.com/p/"), i.cast("string")),
                F.concat(F.lit("HTTPS://HOST"), h, F.lit(".EXAMPLE.COM/p/"), i.cast("string"), F.lit("#sec")),
                F.concat(F.lit("https://host"), h, F.lit(".example.com:443/p/"), i.cast("string"), F.lit("?z=1&a=2")),
            )
        ).alias("url_raw")
    )
    canon = variants.select(canonicalize("url_raw").alias("url"))
    return canon.groupBy(
        F.regexp_extract("url", "https://([^/]+)/", 1).alias("host")
    ).agg(
        F.countDistinct("url").alias("n_seen"),
        F.count("*").alias("n_raw"),
    )


# --------------------------------------------------------------------------- #
# F5: deterministic link scorer (reference ai_agent.py:210-236 arithmetic)
# --------------------------------------------------------------------------- #
_SCORE_QUERY = "spark data"


@query(
    "link_score",
    f"""
    SELECT doc_id::BIGINT AS doc_id,
           {link_score_sql(
               "('https://host' || (doc_id % 7)::VARCHAR || '.example.com/' || "
               "(CASE WHEN doc_id % 13 = 0 THEN 'login/' ELSE '' END) || doc_id::VARCHAR)",
               "substring(text, 1, 40)",
               _SCORE_QUERY,
           )} AS score
    FROM documents
    """,
)
def q_link_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    url = F.concat(
        F.lit("https://host"), F.pmod(i, F.lit(N_HOSTS)).cast("string"), F.lit(".example.com/"),
        F.when(F.pmod(i, F.lit(13)) == 0, F.lit("login/")).otherwise(F.lit("")),
        i.cast("string"),
    )
    anchor = F.substring(F.col("text"), 1, 40)
    return d.select(i.alias("doc_id"), link_score(url, anchor, _SCORE_QUERY).alias("score"))


# --------------------------------------------------------------------------- #
# F6: KeywordRelevanceScorer — keyword-in-URL hit ratio
# (reference import crawl_agent.py:14; original-README.md:509-510)
# --------------------------------------------------------------------------- #
_F6_KEYWORDS = ["spark", "login", "data"]
_F6_URL_SQL = (
    "('https://host' || (doc_id % 7)::VARCHAR || '.example.com/' || "
    "(CASE WHEN doc_id % 13 = 0 THEN 'login/' ELSE '' END) || "
    "(CASE WHEN doc_id % 4 = 0 THEN 'spark-data/' WHEN doc_id % 4 = 1 THEN 'data/' ELSE '' END) "
    "|| doc_id::VARCHAR)"
)


@query(
    "keyword_score",
    f"""
    SELECT doc_id::BIGINT AS doc_id,
           {_F6_URL_SQL} AS url,
           {keyword_score_sql(_F6_URL_SQL, _F6_KEYWORDS)} AS kw_score
    FROM documents
    """,
)
def q_keyword_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    url = F.concat(
        F.lit("https://host"), F.pmod(i, F.lit(N_HOSTS)).cast("string"), F.lit(".example.com/"),
        F.when(F.pmod(i, F.lit(13)) == 0, F.lit("login/")).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(4)) == 0, F.lit("spark-data/"))
        .when(F.pmod(i, F.lit(4)) == 1, F.lit("data/")).otherwise(F.lit("")),
        i.cast("string"),
    )
    return d.select(
        i.alias("doc_id"), url.alias("url"),
        keyword_score(url, _F6_KEYWORDS).alias("kw_score"),
    )


# --------------------------------------------------------------------------- #
# F1/F7/F10: BFS frontier expansion with URL-seen dedup over the arithmetic
# link graph (doc d links to (d*31 + j*17 + 7) % N for j in 1..4).
# Spark = the engine's round loop (anti-join dedup per round);
# oracle = recursive CTE + min-depth group.
# --------------------------------------------------------------------------- #
@query(
    "crawl_bfs_reachable",
    f"""
    WITH RECURSIVE n AS (SELECT count(*)::BIGINT AS n FROM documents),
    hop(id, depth) AS (
        SELECT 0::BIGINT, 0
        UNION ALL
        SELECT (h.id * 31 + j.j * 17 + 7) % (SELECT n FROM n), h.depth + 1
        FROM hop h CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS j) j
        WHERE h.depth < {BFS_DEPTH}
    )
    SELECT {_graph_url_sql('id')} AS url, min(depth)::INT AS depth
    FROM hop GROUP BY 1
    """,
)
def q_crawl_bfs_reachable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    seen = spark.createDataFrame([(0, 0)], "id long, depth int")
    frontier = seen
    js = F.array(*[F.lit(j) for j in range(1, GRAPH_DEGREE + 1)])
    for d in range(1, BFS_DEPTH + 1):
        children = (
            frontier.select(F.explode(js).alias("j"), F.col("id").alias("pid"))
            .select(
                F.pmod(F.col("pid") * 31 + F.col("j") * 17 + 7, F.lit(n)).alias("id"),
                F.lit(d).alias("depth"),
            )
            .dropDuplicates(["id"])
        )
        fresh = children.join(seen.select("id"), "id", "left_anti")
        seen = seen.unionByName(fresh)
        frontier = fresh
    return seen.select(_graph_url(F.col("id")).alias("url"), F.col("depth").cast("int").alias("depth"))


# --------------------------------------------------------------------------- #
# F8: politeness rank-and-limit — per-host window budget (reference delays
# crawl_agent.py:1035-1040 re-expressed as selection, SURVEY §2.2 F8).
# --------------------------------------------------------------------------- #
@query(
    "politeness_select",
    f"""
    WITH frontier AS (
        SELECT {_graph_url_sql('doc_id')} AS url,
               'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               ((doc_id * 2654435761) % 1000) / 1000.0 AS score
        FROM documents
    )
    SELECT host, url, score,
           row_number() OVER (PARTITION BY host ORDER BY score DESC, url ASC)::INT AS host_rank
    FROM frontier
    QUALIFY host_rank <= 3 + (ascii(substring(host, 5, 1)) - 48) % 4
    """,
)
def q_politeness_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    frontier = d.select(
        _graph_url(i).alias("url"),
        F.concat(F.lit("host"), F.pmod(i, F.lit(N_HOSTS)).cast("string"), F.lit(".example.com")).alias("host"),
        (F.pmod(i * 2654435761, F.lit(1000)) / 1000.0).alias("score"),
    )
    w = Window.partitionBy("host").orderBy(F.col("score").desc(), F.col("url").asc())
    budget = F.lit(3) + F.pmod(F.ascii(F.substring("host", 5, 1)) - 48, F.lit(4))
    return (
        frontier.withColumn("host_rank", F.row_number().over(w).cast("int"))
        .where(F.col("host_rank") <= budget)
    )


# --------------------------------------------------------------------------- #
# F11: robots.txt rule evaluation — disallow prefix match per host.
# --------------------------------------------------------------------------- #
@query(
    "robots_eval",
    """
    WITH urls AS (
        SELECT doc_id::BIGINT AS doc_id,
               (doc_id % 7)::INT AS h,
               '/' || (CASE WHEN doc_id % 13 = 0 THEN 'login/p' ELSE 'p' END)
                   || '/' || doc_id::VARCHAR AS path
        FROM documents
    ),
    -- REP longest-match: disallow '/login' (len 6) on h%5=0 hosts, allow
    -- '/login/p/1' (len 10) carve-out; blocked iff best_dis > best_allow
    scored AS (
        SELECT doc_id, h, path,
               (CASE WHEN h % 5 = 0 AND starts_with(path, '/login') THEN 6 ELSE 0 END) AS best_dis,
               (CASE WHEN h % 5 = 0 AND starts_with(path, '/login/p/1') THEN 10 ELSE 0 END) AS best_allow
        FROM urls
    )
    SELECT doc_id,
           'https://host' || h::VARCHAR || '.example.com' || path AS url,
           (CASE WHEN best_dis > best_allow THEN 'robots_blocked' ELSE 'allowed' END) AS state
    FROM scored
    """,
)
def q_robots_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(N_HOSTS)).cast("int")
    path = F.concat(
        F.lit("/"),
        F.when(F.pmod(i, F.lit(13)) == 0, F.lit("login/p")).otherwise(F.lit("p")),
        F.lit("/"), i.cast("string"),
    )
    # the engine's longest-match rule (frontier._robots_split) over the
    # synthetic ruleset: disallow '/login', allow '/login/p/1'
    on_host = F.pmod(h, F.lit(5)) == 0
    best_dis = F.when(on_host & path.startswith("/login"), F.lit(6)).otherwise(F.lit(0))
    best_allow = F.when(on_host & path.startswith("/login/p/1"), F.lit(10)).otherwise(F.lit(0))
    return d.select(
        i.alias("doc_id"),
        F.concat(F.lit("https://host"), h.cast("string"), F.lit(".example.com"), path).alias("url"),
        F.when(best_dis > best_allow, F.lit("robots_blocked"))
        .otherwise(F.lit("allowed")).alias("state"),
    )


# --------------------------------------------------------------------------- #
# F11b: RFC 9309 §2.2.3 wildcard rules — ``*`` any-run, trailing ``$``
# end anchor, longest-PATTERN specificity (wildcard octets count). The
# Spark side runs the engine's actual generic evaluator
# (functions.urls.rep_best_match — the same exprs frontier._robots_split
# broadcasts); the oracle hand-expands the literal ruleset to anchored
# regexes, so a match-semantics bug in the evaluator cannot hide.
# --------------------------------------------------------------------------- #
@query(
    "robots_eval_wildcard",
    r"""
    WITH urls AS (
        SELECT doc_id::BIGINT AS doc_id, (doc_id % 7)::INT AS h,
               (CASE WHEN doc_id % 4 = 0 THEN '/p/' || doc_id::VARCHAR || '/print'
                     WHEN doc_id % 4 = 1 THEN '/p/' || doc_id::VARCHAR
                     WHEN doc_id % 4 = 2 THEN '/dl/' || doc_id::VARCHAR || '.pdf'
                     ELSE '/a/' || doc_id::VARCHAR END) AS path
        FROM documents
    ),
    -- ruleset on even hosts: disallow ['/p/*/print' (10), '/dl/*.pdf$' (10),
    -- '/a' (2)], allow ['/a/1' (4)]; odd hosts have no rules
    scored AS (
        SELECT doc_id, h, path,
               (CASE WHEN h % 2 = 0 THEN greatest(
                   CASE WHEN regexp_matches(path, '^/p/.*/print') THEN 10 ELSE 0 END,
                   CASE WHEN regexp_matches(path, '^/dl/.*\.pdf$') THEN 10 ELSE 0 END,
                   CASE WHEN starts_with(path, '/a') THEN 2 ELSE 0 END)
                ELSE 0 END) AS best_dis,
               (CASE WHEN h % 2 = 0 AND starts_with(path, '/a/1') THEN 4 ELSE 0 END) AS best_allow
        FROM urls
    )
    SELECT doc_id,
           'https://host' || h::VARCHAR || '.example.com' || path AS url,
           best_dis::INT AS best_dis, best_allow::INT AS best_allow,
           (CASE WHEN best_dis > best_allow THEN 'robots_blocked' ELSE 'allowed' END) AS state
    FROM scored
    """,
)
def q_robots_eval_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard REP over a synthetic URL universe, evaluated by the
    engine's generic rule machinery.

    Scale shape identical to the engine's robots stage: the ruleset is a
    per-host broadcast; wildcard rules compile a per-rule regex while
    plain prefixes stay on the regex-free startswith path — all map-side
    column exprs, no shuffle beyond the scan."""
    from ..functions.urls import rep_best_match

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(N_HOSTS)).cast("int")
    cls = F.pmod(i, F.lit(4))
    path = (
        F.when(cls == 0, F.concat(F.lit("/p/"), i.cast("string"), F.lit("/print")))
        .when(cls == 1, F.concat(F.lit("/p/"), i.cast("string")))
        .when(cls == 2, F.concat(F.lit("/dl/"), i.cast("string"), F.lit(".pdf")))
        .otherwise(F.concat(F.lit("/a/"), i.cast("string")))
    )
    empty = F.array().cast("array<string>")
    on_host = F.pmod(h, F.lit(2)) == 0
    dis = F.when(on_host, F.array(
        F.lit("/p/*/print"), F.lit("/dl/*.pdf$"), F.lit("/a"))).otherwise(empty)
    alw = F.when(on_host, F.array(F.lit("/a/1"))).otherwise(empty)
    best_dis = rep_best_match(path, dis)
    best_allow = rep_best_match(path, alw)
    return d.select(
        i.alias("doc_id"),
        F.concat(F.lit("https://host"), h.cast("string"), F.lit(".example.com"), path).alias("url"),
        best_dis.cast("int").alias("best_dis"),
        best_allow.cast("int").alias("best_allow"),
        F.when(best_dis > best_allow, F.lit("robots_blocked"))
        .otherwise(F.lit("allowed")).alias("state"),
    )


# --------------------------------------------------------------------------- #
# F12: redirect tracking — capped redirect-map walk, seen keyed on the
# final canonical URL (reference records redirects, original-README.md:523).
# Chain: rr/<d> → r/<d> → p/<d>; start depth varies by doc_id % 3.
# --------------------------------------------------------------------------- #
_RMAP_SQL = f"""
    SELECT ('https://host' || (doc_id % 7)::VARCHAR || '.example.com/r/' || doc_id::VARCHAR) AS src,
           {_graph_url_sql('doc_id')} AS dst
    FROM documents
    UNION ALL
    SELECT ('https://host' || (doc_id % 7)::VARCHAR || '.example.com/rr/' || doc_id::VARCHAR),
           ('https://host' || (doc_id % 7)::VARCHAR || '.example.com/r/' || doc_id::VARCHAR)
    FROM documents
"""


@query(
    "redirects_resolve",
    f"""
    WITH rmap AS ({_RMAP_SQL}),
    starts AS (
        SELECT doc_id::BIGINT AS doc_id,
               (CASE WHEN doc_id % 3 = 0
                     THEN 'https://host' || (doc_id % 7)::VARCHAR || '.example.com/rr/' || doc_id::VARCHAR
                     WHEN doc_id % 3 = 1
                     THEN 'https://host' || (doc_id % 7)::VARCHAR || '.example.com/r/' || doc_id::VARCHAR
                     ELSE {_graph_url_sql('doc_id')} END) AS start_url
        FROM documents
    ),
    hop1 AS (
        SELECT s.doc_id, s.start_url,
               coalesce(m.dst, s.start_url) AS u1,
               (CASE WHEN m.dst IS NULL THEN 0 ELSE 1 END) AS h1
        FROM starts s LEFT JOIN rmap m ON s.start_url = m.src
    )
    SELECT h.doc_id, h.start_url,
           coalesce(m.dst, h.u1) AS final_url,
           (h.h1 + CASE WHEN m.dst IS NULL THEN 0 ELSE 1 END)::INT AS hops
    FROM hop1 h LEFT JOIN rmap m ON h.u1 = m.src
    """,
)
def q_redirects_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long").alias("doc_id"))
    i = F.col("doc_id")
    h = F.pmod(i, F.lit(N_HOSTS)).cast("string")
    direct = _graph_url(i)
    r_url = F.concat(F.lit("https://host"), h, F.lit(".example.com/r/"), i.cast("string"))
    rr_url = F.concat(F.lit("https://host"), h, F.lit(".example.com/rr/"), i.cast("string"))
    rmap = d.select(r_url.alias("src"), direct.alias("dst")).unionByName(
        d.select(rr_url.alias("src"), r_url.alias("dst"))
    )
    starts = d.select(
        "doc_id",
        F.when(F.pmod(i, F.lit(3)) == 0, rr_url)
        .when(F.pmod(i, F.lit(3)) == 1, r_url)
        .otherwise(direct).alias("start_url"),
    )
    m1 = rmap.withColumnRenamed("src", "start_url").withColumnRenamed("dst", "_d1")
    hop1 = starts.join(m1, "start_url", "left").select(
        "doc_id", "start_url",
        F.coalesce("_d1", "start_url").alias("u1"),
        F.when(F.col("_d1").isNull(), 0).otherwise(1).alias("h1"),
    )
    m2 = rmap.withColumnRenamed("src", "u1").withColumnRenamed("dst", "_d2")
    return hop1.join(m2, "u1", "left").select(
        "doc_id", "start_url",
        F.coalesce("_d2", "u1").alias("final_url"),
        (F.col("h1") + F.when(F.col("_d2").isNull(), 0).otherwise(1)).cast("int").alias("hops"),
    )


# --------------------------------------------------------------------------- #
# P3/P4: meaningful-content gate + word-count threshold
# (reference crawl_agent.py:185-213, :158)
# --------------------------------------------------------------------------- #
@query(
    "meaningful_content",
    """
    SELECT doc_id::BIGINT AS doc_id, lang,
           length(trim(text))::BIGINT AS content_len
    FROM documents
    WHERE length(trim(text)) >= 50
    """,
)
def q_meaningful_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    clen = F.length(F.trim(F.col("text")))
    return (
        d.where(clen >= 50)
        .select(F.col("doc_id").cast("long").alias("doc_id"), "lang", clen.cast("long").alias("content_len"))
    )


@query(
    "word_count_filter",
    f"""
    SELECT doc_id::BIGINT AS doc_id,
           {T.token_count_ws_sql('text')}::BIGINT AS n_tokens
    FROM documents
    WHERE {T.token_count_ws_sql('text')} >= 40
    """,
)
def q_word_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n = T.token_count_ws("text")
    return d.where(n >= 40).select(
        F.col("doc_id").cast("long").alias("doc_id"), n.cast("long").alias("n_tokens")
    )


# --------------------------------------------------------------------------- #
# Text analysis: token counting / language-ID / quality / fingerprint
# --------------------------------------------------------------------------- #
@query(
    "token_counts",
    f"""
    SELECT lang,
           sum({T.token_count_ws_sql('text')})::BIGINT AS ws_tokens,
           sum({T.token_count_bpe_sql('text')})::BIGINT AS bpe_tokens,
           count(*)::BIGINT AS n_docs
    FROM documents GROUP BY lang
    """,
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(T.token_count_ws("text")).cast("long").alias("ws_tokens"),
        F.sum(T.token_count_bpe("text")).cast("long").alias("bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


@query(
    "lang_id",
    f"""
    SELECT doc_id::BIGINT AS doc_id, {T.lang_id_sql('text')} AS lang_pred
    FROM documents
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(F.col("doc_id").cast("long").alias("doc_id"), T.lang_id("text").alias("lang_pred"))


@query(
    "quality_score",
    f"""
    SELECT doc_id::BIGINT AS doc_id, {T.quality_score_sql('text')} AS quality
    FROM documents
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(F.col("doc_id").cast("long").alias("doc_id"), T.quality_score("text").alias("quality"))


@query(
    "doc_fingerprint",
    f"""
    SELECT doc_id::BIGINT AS doc_id,
           {H.rolling_fingerprint_sql(T.tokens_sql('text'))}::BIGINT AS fp
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        H.rolling_fingerprint(T.tokens("text")).alias("fp"),
    )


# --------------------------------------------------------------------------- #
# A2/A3: multi-URL rollup + status derivation
# (reference crawl_agent.py:1011-1017, 1114-1118)
# --------------------------------------------------------------------------- #
@query(
    "stats_rollup",
    """
    WITH per AS (
        SELECT source,
               count(*)::BIGINT AS total_urls,
               sum(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END)::BIGINT AS successful_urls,
               sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)::BIGINT AS failed_urls,
               sum(n_chars)::BIGINT AS total_content_length
        FROM documents GROUP BY source
    )
    SELECT *,
           (CASE WHEN successful_urls = 0 THEN 'failed'
                 WHEN failed_urls > 0 THEN 'partial'
                 ELSE 'success' END) AS status
    FROM per
    """,
)
def q_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    ok = F.when(F.col("n_chars") >= 100, 1).otherwise(0)
    per = d.groupBy("source").agg(
        F.count("*").alias("total_urls"),
        F.sum(ok).cast("long").alias("successful_urls"),
        F.sum(1 - ok).cast("long").alias("failed_urls"),
        F.sum("n_chars").cast("long").alias("total_content_length"),
    )
    return per.withColumn(
        "status",
        F.when(F.col("successful_urls") == 0, "failed")
        .when(F.col("failed_urls") > 0, "partial")
        .otherwise("success"),
    )


# --------------------------------------------------------------------------- #
# S7: media-extension download filter (reference crawl_agent.py:739-777)
# --------------------------------------------------------------------------- #
_EXTS = ["pdf", "jpg", "png", "docx", "csv", "mp4", "html", "txt"]
_ALLOWED = ["pdf", "jpg", "png", "docx", "csv"]


@query(
    "media_ext_filter",
    f"""
    WITH media AS (
        SELECT doc_id::BIGINT AS doc_id,
               ['{"', '".join(_EXTS)}'][(doc_id % 8)::INT + 1] AS ext
        FROM documents
    )
    SELECT doc_id,
           'https://host' || (doc_id % 7)::VARCHAR || '.example.com/file/'
               || doc_id::VARCHAR || '.' || ext AS media_ref,
           ext
    FROM media WHERE ext IN ('{"', '".join(_ALLOWED)}')
    """,
)
def q_media_ext_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    exts = F.array(*[F.lit(e) for e in _EXTS])
    ext = F.element_at(exts, F.pmod(i, F.lit(8)).cast("int") + 1)
    return (
        d.select(
            i.alias("doc_id"),
            F.concat(
                F.lit("https://host"), F.pmod(i, F.lit(N_HOSTS)).cast("string"),
                F.lit(".example.com/file/"), i.cast("string"), F.lit("."), ext,
            ).alias("media_ref"),
            ext.alias("ext"),
        )
        .where(F.col("ext").isin(_ALLOWED))
    )


# --------------------------------------------------------------------------- #
# Events: tumbling-window aggregation + sessionization (streaming semantics
# on the batch table; the Structured Streaming twin is q `stream_tumbling`).
# --------------------------------------------------------------------------- #
@query(
    "events_tumbling",
    """
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents,
           count(DISTINCT user_id)::BIGINT AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@query(
    "events_sliding",
    """
    -- sliding windows: 1h length, 30min slide — every event belongs to
    -- exactly two windows, starting at its 30-min bucket and 30min before
    WITH w AS (
        SELECT epoch(time_bucket(INTERVAL '30 minutes', ts))::BIGINT - u.k * 1800 AS window_start,
               event_type, value
        FROM events, unnest([0, 1]) AS u(k)
    )
    SELECT window_start, event_type,
           count(*)::BIGINT AS n_events,
           sum(round(value * 100)::BIGINT)::BIGINT AS sum_cents
    FROM w GROUP BY 1, 2
    """,
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type", "n_events", "sum_cents",
        )
    )


@query(
    "events_sessionize",
    """
    WITH marked AS (
        -- floor(epoch(..)) matches Spark's unix_timestamp() second-floor
        SELECT user_id, ts, event_id,
               CASE WHEN floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
        FROM marked
    )
    SELECT user_id::BIGINT AS user_id, session_idx,
           count(*)::BIGINT AS n_events,
           (floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT) AS duration_s
    FROM sess GROUP BY 1, 2
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("ts")).over(w)
    marked = e.select(
        "user_id", "ts", "event_id",
        F.when(
            prev.isNull()
            | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800),
            1,
        ).otherwise(0).alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.select(
        "user_id", "ts", F.sum("new_session").over(w2).cast("long").alias("session_idx")
    )
    return sess.groupBy(
        F.col("user_id").cast("long").alias("user_id"), "session_idx"
    ).agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).cast("long").alias("duration_s"),
    )


# --------------------------------------------------------------------------- #
# S-tier: sitemap ingestion (sitemaps.org protocol). A deterministic
# per-host <urlset> (entries with optional lastmod/priority, messy
# <loc> values exercising canonicalization) plus one <sitemapindex>
# hub are synthesized from the documents table, then parsed back by
# operators.sitemap.parse_sitemaps — the parse is the op under test;
# the oracle re-parses the identical XML with DuckDB's RE2. Reference
# scope note: crawl_agent.py crawls handed URLs only; sitemap seed
# discovery is the standard production front door for a deep crawl.
# --------------------------------------------------------------------------- #
_SITEMAP_ENTRY_SQL = """
      '<url><loc>HTTPS://HOST' || h::VARCHAR || '.EXAMPLE.COM:443/p/' || i::VARCHAR
      || (CASE WHEN i % 3 = 0 THEN '?b=2&amp;a=1' ELSE '' END)
      || (CASE WHEN i % 5 = 0 THEN '#frag' ELSE '' END)
      || '</loc>'
      || (CASE WHEN i % 2 = 0 THEN '<lastmod>2026-01-' || lpad(((i % 28) + 1)::VARCHAR, 2, '0') || '</lastmod>' ELSE '' END)
      || (CASE WHEN i % 4 = 0 THEN '<priority>0.' || (i % 10)::VARCHAR || '</priority>' ELSE '' END)
      || (CASE WHEN i % 6 = 0 THEN '<changefreq>' ||
            (CASE (i // 6) % 4 WHEN 0 THEN 'daily' WHEN 1 THEN 'WEEKLY'
                  WHEN 2 THEN 'monthly' ELSE 'fortnightly' END)
            || '</changefreq>' ELSE '' END)
      || '</url>'
"""

_SITEMAP_INDEX_XML = (
    "<sitemapindex>\n"
    "<sitemap><loc>https://host0.example.com/s1.xml</loc></sitemap>\n"
    "<sitemap><loc>HTTP://host1.EXAMPLE.com:80/s2.xml</loc></sitemap>\n"
    "</sitemapindex>"
)


@query(
    "sitemap_ingest",
    rf"""
    WITH docs AS (
        SELECT doc_id::BIGINT AS i, (doc_id % {N_HOSTS})::BIGINT AS h FROM documents
    ),
    entries AS (
        SELECT h, i, {_SITEMAP_ENTRY_SQL} AS e FROM docs
    ),
    xmls AS (
        SELECT 'host' || h::VARCHAR || '.example.com' AS host,
               '<urlset>' || chr(10) || string_agg(e, chr(10) ORDER BY i)
                 || chr(10) || '</urlset>' AS xml
        FROM entries GROUP BY h
        UNION ALL
        SELECT 'hub.example.com', '{_SITEMAP_INDEX_XML.replace(chr(10), "' || chr(10) || '")}'
    ),
    tagged AS (
        SELECT host, 'url' AS kind,
               regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) AS blocks
        FROM xmls
        UNION ALL
        SELECT host, 'sitemap',
               regexp_extract_all(xml, '(?s)<sitemap>(.*?)</sitemap>', 1)
        FROM xmls
    ),
    exploded AS (
        SELECT host, kind, blocks,
               unnest(generate_series(1, len(blocks)))::INT AS idx
        FROM tagged
    ),
    parsed AS (
        SELECT host AS src_host, kind, (idx - 1)::INT AS pos,
               nullif(replace(replace(replace(replace(replace(regexp_extract(blocks[idx], '(?s)<loc>\s*(.*?)\s*</loc>', 1), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''), '&amp;', '&'), '') AS loc,
               nullif(regexp_extract(blocks[idx], '(?s)<lastmod>\s*(.*?)\s*</lastmod>', 1), '') AS lastmod,
               nullif(regexp_extract(blocks[idx], '(?s)<priority>\s*(.*?)\s*</priority>', 1), '')::DOUBLE AS priority,
               nullif(lower(trim(regexp_extract(blocks[idx], '(?s)<changefreq>\s*(.*?)\s*</changefreq>', 1))), '') AS changefreq
        FROM exploded
    )
    SELECT src_host, kind, pos, {canonicalize_sql('loc', 'duckdb')} AS url,
           lastmod, priority, changefreq
    FROM parsed WHERE loc IS NOT NULL
    """,
)
def q_sitemap_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sitemap import parse_sitemaps

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(N_HOSTS))
    messy = F.concat(
        F.lit("HTTPS://HOST"), h.cast("string"), F.lit(".EXAMPLE.COM:443/p/"),
        i.cast("string"),
        F.when(F.pmod(i, F.lit(3)) == 0, F.lit("?b=2&amp;a=1")).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(5)) == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    entry = F.concat(
        F.lit("<url><loc>"), messy, F.lit("</loc>"),
        F.when(
            F.pmod(i, F.lit(2)) == 0,
            F.concat(
                F.lit("<lastmod>2026-01-"),
                F.lpad((F.pmod(i, F.lit(28)) + 1).cast("string"), 2, "0"),
                F.lit("</lastmod>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod(i, F.lit(4)) == 0,
            F.concat(F.lit("<priority>0."), F.pmod(i, F.lit(10)).cast("string"),
                     F.lit("</priority>")),
        ).otherwise(F.lit("")),
        F.when(
            F.pmod(i, F.lit(6)) == 0,
            F.concat(
                F.lit("<changefreq>"),
                F.when(F.pmod((i / 6).cast("long"), F.lit(4)) == 0, F.lit("daily"))
                .when(F.pmod((i / 6).cast("long"), F.lit(4)) == 1, F.lit("WEEKLY"))
                .when(F.pmod((i / 6).cast("long"), F.lit(4)) == 2, F.lit("monthly"))
                .otherwise(F.lit("fortnightly")),
                F.lit("</changefreq>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    xmls = (
        d.select(h.alias("h"), i.alias("i"), entry.alias("e"))
        .groupBy("h")
        .agg(
            F.concat(
                F.lit("<urlset>\n"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col("i"), F.col("e")))),
                        lambda s: s["e"],
                    ),
                    "\n",
                ),
                F.lit("\n</urlset>"),
            ).alias("xml")
        )
        .select(
            F.concat(F.lit("host"), F.col("h").cast("string"),
                     F.lit(".example.com")).alias("host"),
            "xml",
        )
    )
    index = spark.range(1).select(
        F.lit("hub.example.com").alias("host"),
        F.lit(_SITEMAP_INDEX_XML).alias("xml"),
    )
    return parse_sitemaps(xmls.unionByName(index))


# --------------------------------------------------------------------------- #
# F11c: robots.txt TEXT parsing (RFC 9309 groups) — raw fetched robots
# bytes → the engine's structured rule table + site-wide Sitemap
# directives (operators/robots.py). Synthetic per-host files exercise
# group runs, agent-specific override (SparkBot groups beat '*' when
# parsing as 'sparkbot'), comments, empty Disallow no-ops, lowercase
# keys, stray lines, and group-independent Sitemap placement. The
# oracle re-implements the full parse in DuckDB SQL over the identical
# text, so a grouping/selection bug cannot hide in shared code.
# --------------------------------------------------------------------------- #
_ROBOTS_TXT_SQL = """
      '# robots for host ' || h::VARCHAR || chr(10)
      || (CASE WHEN h % 2 = 0 THEN
            'User-Agent: FancyBot' || chr(10) || 'Disallow: /fancy' || chr(10)
            || 'Sitemap: https://host' || h::VARCHAR || '.example.com/sitemap.xml'
            || chr(10) || chr(10)
          ELSE '' END)
      || (CASE WHEN h % 6 = 0 THEN
            'User-agent: SparkBot' || chr(10) || 'Disallow: /only-sparkbot'
            || chr(10) || 'Crawl-delay: 9' || chr(10) || chr(10)
          ELSE '' END)
      || 'User-agent: *' || chr(10)
      || (CASE WHEN h % 5 = 0 THEN
            'Disallow: /login # keep out' || chr(10) || 'Allow: /login/p/1*' || chr(10)
          ELSE '' END)
      || (CASE WHEN h % 3 = 0 THEN 'disallow: /tmp/' || chr(10) ELSE '' END)
      || (CASE WHEN h % 4 = 0 THEN 'Disallow:' || chr(10) ELSE '' END)
      || 'Crawl-delay: ' || ((h % 4) + 1)::VARCHAR || chr(10)
      || 'stray line without a colon' || chr(10)
"""


@query(
    "robots_txt_parse",
    rf"""
    WITH hosts AS (
        SELECT DISTINCT (doc_id % {N_HOSTS})::BIGINT AS h FROM documents
    ),
    txt AS (
        SELECT 'host' || h::VARCHAR || '.example.com' AS host,
               {_ROBOTS_TXT_SQL} AS text
        FROM hosts
    ),
    ex AS (
        SELECT host, parts, unnest(generate_series(1, len(parts)))::INT AS i
        FROM (SELECT host, string_split_regex(text, '\r?\n') AS parts FROM txt)
    ),
    kv AS (
        SELECT host, ln,
               lower(regexp_extract(clean, '^([A-Za-z-]+)\s*:', 1)) AS key,
               trim(regexp_replace(clean, '^[A-Za-z-]+\s*:', '')) AS val
        FROM (SELECT host, i AS ln,
                     trim(regexp_replace(parts[i], '#.*$', '')) AS clean
              FROM ex)
        WHERE regexp_extract(clean, '^([A-Za-z-]+)\s*:', 1) <> ''
    ),
    ng AS (
        SELECT host, ln, key, val,
               CASE WHEN key = 'user-agent' AND NOT coalesce(
                        lag(key = 'user-agent') OVER (PARTITION BY host ORDER BY ln),
                        false)
                    THEN 1 ELSE 0 END AS ngf
        FROM kv
    ),
    g AS (
        SELECT host, ln, key, val,
               sum(ngf) OVER (PARTITION BY host ORDER BY ln
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM ng
    ),
    fl AS (
        SELECT host, grp, key, val,
               max(CASE WHEN key = 'user-agent' AND lower(val) = '*'
                        THEN 1 ELSE 0 END) OVER (PARTITION BY host, grp) AS g_star,
               max(CASE WHEN key = 'user-agent' AND lower(val) = 'sparkbot'
                        THEN 1 ELSE 0 END) OVER (PARTITION BY host, grp) AS g_agent
        FROM g WHERE grp > 0
    ),
    m AS (
        SELECT * FROM (
            SELECT *, max(g_agent) OVER (PARTITION BY host) AS h_agent FROM fl
        ) WHERE CASE WHEN h_agent = 1 THEN g_agent = 1 ELSE g_star = 1 END
    ),
    rules AS (
        SELECT host,
               list_sort(list_filter(
                   list(CASE WHEN key = 'allow' AND val <> '' THEN val END),
                   x -> x IS NOT NULL)) AS allow,
               list_sort(list_filter(
                   list(CASE WHEN key = 'disallow' AND val <> '' THEN val END),
                   x -> x IS NOT NULL)) AS disallow,
               min(CASE WHEN key = 'crawl-delay'
                        THEN TRY_CAST(val AS DOUBLE) END) AS crawl_delay
        FROM m GROUP BY host
    ),
    sm AS (
        SELECT host, list_sort(list_distinct(list(val))) AS sitemaps
        FROM kv WHERE key = 'sitemap' AND val <> '' GROUP BY host
    )
    -- array_to_string([]) is NULL in DuckDB but Spark's array_join is
    -- '' on an empty array: coalesce the JOINED string, not the list
    SELECT t.host,
           coalesce(array_to_string(r.allow, chr(31)), '') AS allow,
           coalesce(array_to_string(r.disallow, chr(31)), '') AS disallow,
           r.crawl_delay,
           coalesce(array_to_string(s.sitemaps, chr(31)), '') AS sitemaps
    FROM txt t LEFT JOIN rules r ON t.host = r.host
               LEFT JOIN sm s ON t.host = s.host
    """,
)
def q_robots_txt_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.robots import parse_robots_txt

    d = _t(spark, sf_dir, "documents")
    h = F.col("h")
    nl = F.lit("\n")

    def when_block(cond, *pieces):
        return F.when(cond, F.concat(*pieces)).otherwise(F.lit(""))

    text = F.concat(
        F.lit("# robots for host "), h.cast("string"), nl,
        when_block(
            F.pmod(h, F.lit(2)) == 0,
            F.lit("User-Agent: FancyBot"), nl, F.lit("Disallow: /fancy"), nl,
            F.lit("Sitemap: https://host"), h.cast("string"),
            F.lit(".example.com/sitemap.xml"), nl, nl,
        ),
        when_block(
            F.pmod(h, F.lit(6)) == 0,
            F.lit("User-agent: SparkBot"), nl, F.lit("Disallow: /only-sparkbot"),
            nl, F.lit("Crawl-delay: 9"), nl, nl,
        ),
        F.lit("User-agent: *"), nl,
        when_block(
            F.pmod(h, F.lit(5)) == 0,
            F.lit("Disallow: /login # keep out"), nl, F.lit("Allow: /login/p/1*"), nl,
        ),
        when_block(F.pmod(h, F.lit(3)) == 0, F.lit("disallow: /tmp/"), nl),
        when_block(F.pmod(h, F.lit(4)) == 0, F.lit("Disallow:"), nl),
        F.lit("Crawl-delay: "), (F.pmod(h, F.lit(4)) + 1).cast("string"), nl,
        F.lit("stray line without a colon"), nl,
    )
    txt = (
        d.select(F.pmod(F.col("doc_id").cast("long"), F.lit(N_HOSTS)).alias("h"))
        .distinct()
        .select(
            F.concat(F.lit("host"), h.cast("string"), F.lit(".example.com")).alias("host"),
            text.alias("text"),
        )
    )
    # Driver-legibility (r4 verdict #1): the driver's canonicalizer
    # cannot sort ARRAY<STRING> output columns (pandas lexsort crashes on
    # lists), so the query wrapper projects the operator's rule arrays to
    # US-separator-joined strings. operators/robots.py keeps the arrays —
    # the engine consumes those; only the certification surface flattens.
    parsed = parse_robots_txt(txt, agent="sparkbot")
    us = "\x1f"
    return parsed.select(
        "host",
        F.array_join("allow", us).alias("allow"),
        F.array_join("disallow", us).alias("disallow"),
        "crawl_delay",
        F.array_join("sitemaps", us).alias("sitemaps"),
    )


# --------------------------------------------------------------------------- #
# F10b: SURT index keys (Sort-friendly URI Reordering Transform — the
# CDX/Common-Crawl index key). Composes canonicalize → surt_key over
# messy URLs (subdomains + a non-default port on every 5th doc exercise
# label reversal and port retention). Range-partitioning frontier/page
# tables by this key clusters a domain and all its subdomains
# contiguously — per-domain scans and politeness audits become
# partition-pruned range reads at 10^10-URL scale.
# --------------------------------------------------------------------------- #
_SURT_MESSY_SQL = (
    "(CASE WHEN doc_id % 5 = 0 THEN "
    "'HTTP://a.b.Host' || (doc_id % 7)::VARCHAR || '.Example.COM:8080/' "
    "|| source || '/' || doc_id::VARCHAR "
    f"ELSE {_MESSY_URL_SQL} END)"
)


@query(
    "surt_key",
    f"""
    WITH canon AS (
        SELECT doc_id::BIGINT AS doc_id,
               {canonicalize_sql(_SURT_MESSY_SQL, 'duckdb')} AS url
        FROM documents
    )
    SELECT doc_id, url, {surt_key_sql('url', 'duckdb')} AS surt FROM canon
    """,
)
def q_surt_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urls import surt_key

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    messy = F.when(
        F.pmod(i, F.lit(5)) == 0,
        F.concat(
            F.lit("HTTP://a.b.Host"), F.pmod(i, F.lit(N_HOSTS)).cast("string"),
            F.lit(".Example.COM:8080/"), F.col("source"), F.lit("/"), i.cast("string"),
        ),
    ).otherwise(_messy_url(i, F.col("source")))
    canon = d.select(i.alias("doc_id"), canonicalize(messy).alias("url"))
    return canon.select("doc_id", "url", surt_key(F.col("url")).alias("surt"))


# --------------------------------------------------------------------------- #
# S6b: WARC export formatting (ISO 28500) — the archive record format
# crawl ecosystems exchange; sinks.warc_format renders it in the scan
# projection, the oracle rebuilds the byte-identical record in SQL.
# --------------------------------------------------------------------------- #
@query(
    "warc_export",
    f"""
    SELECT doc_id::BIGINT AS doc_id,
           {_graph_url_sql('doc_id')} AS url,
           strlen(coalesce(text, ''))::BIGINT AS content_length,
           'WARC/1.0' || chr(13) || chr(10)
           || 'WARC-Type: resource' || chr(13) || chr(10)
           || 'WARC-Record-ID: <urn:h60:'
           || {H.h60_sql(_graph_url_sql('doc_id'))}::VARCHAR || '>' || chr(13) || chr(10)
           || 'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10)
           || 'WARC-Target-URI: ' || {_graph_url_sql('doc_id')} || chr(13) || chr(10)
           || 'Content-Type: text/plain' || chr(13) || chr(10)
           || 'Content-Length: ' || strlen(coalesce(text, ''))::VARCHAR
           || chr(13) || chr(10) || chr(13) || chr(10)
           || coalesce(text, '') || chr(13) || chr(10) || chr(13) || chr(10) AS warc
    FROM documents
    """,
)
def q_warc_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sinks import warc_format

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _graph_url(F.col("doc_id").cast("long")).alias("url"),
        F.col("text"),
    )
    return warc_format(pages, url_col="url", payload_col="text").select(
        "doc_id", "url", "content_length", "warc",
    )


# --------------------------------------------------------------------------- #
# S6c: WET export (Common Crawl extracted-text sidecar) — a WARC/1.0
# ``conversion`` record per page: payload = extracted plain text,
# WARC-Refers-To = the source capture's urn:h60 record id, own record
# id salted ('#wet') so source and derivative never collide. Completes
# the interchange family (WARC response/resource + revisit + CDXJ +
# WET). sinks.wet_format renders it in the scan projection; the oracle
# rebuilds the byte-identical record in SQL.
# --------------------------------------------------------------------------- #
@query(
    "wet_export",
    f"""
    SELECT doc_id::BIGINT AS doc_id,
           {_graph_url_sql('doc_id')} AS url,
           strlen(coalesce(text, ''))::BIGINT AS content_length,
           'WARC/1.0' || chr(13) || chr(10)
           || 'WARC-Type: conversion' || chr(13) || chr(10)
           || 'WARC-Record-ID: <urn:h60:'
           || {H.h60_sql(_graph_url_sql('doc_id') + " || '#wet'")}::VARCHAR
           || '>' || chr(13) || chr(10)
           || 'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10)
           || 'WARC-Refers-To: <urn:h60:'
           || {H.h60_sql(_graph_url_sql('doc_id'))}::VARCHAR || '>' || chr(13) || chr(10)
           || 'WARC-Target-URI: ' || {_graph_url_sql('doc_id')} || chr(13) || chr(10)
           || 'Content-Type: text/plain' || chr(13) || chr(10)
           || 'Content-Length: ' || strlen(coalesce(text, ''))::VARCHAR
           || chr(13) || chr(10) || chr(13) || chr(10)
           || coalesce(text, '') || chr(13) || chr(10) || chr(13) || chr(10) AS wet
    FROM documents
    """,
)
def q_wet_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sinks import wet_format

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        _graph_url(F.col("doc_id").cast("long")).alias("url"),
        F.col("text"),
    )
    return wet_format(pages, url_col="url", text_col="text").select(
        "doc_id", "url", "content_length", F.col("warc").alias("wet"),
    )


# --------------------------------------------------------------------------- #
# S-tier + freshness: sitemap lastmod vs fetch log — the reopen set
# (operators.sitemap.stale_from_sitemap feeds CrawlEngine.reopen).
# Sitemap XML and the fetch log are both synthesized from documents;
# the oracle re-parses the XML and re-derives staleness in SQL.
# --------------------------------------------------------------------------- #
@query(
    "sitemap_stale",
    rf"""
    WITH docs AS (
        SELECT doc_id::BIGINT AS i FROM documents
    ),
    xmls AS (
        SELECT 'host' || (i % {N_HOSTS})::VARCHAR || '.example.com' AS host,
               '<urlset>' || string_agg(
                   '<url><loc>' || {_graph_url_sql('i')} || '</loc>'
                   || '<lastmod>2026-01-' || lpad(((i % 28) + 1)::VARCHAR, 2, '0')
                   || '</lastmod></url>', '' ORDER BY i)
               || '</urlset>' AS xml
        FROM docs GROUP BY 1
    ),
    entries AS (
        SELECT unnest(regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1)) AS block
        FROM xmls
    ),
    sm AS (
        SELECT regexp_extract(block, '(?s)<loc>\s*(.*?)\s*</loc>', 1) AS url,
               max((regexp_extract(block, '(?s)<lastmod>\s*(.*?)\s*</lastmod>', 1))::DATE)
                   AS lastmod_date
        FROM entries GROUP BY 1
    ),
    fl AS (
        SELECT {_graph_url_sql('i')} AS url,
               ('2026-01-' || lpad((((i * 2) % 28) + 1)::VARCHAR, 2, '0'))::DATE AS fd
        FROM docs
    )
    SELECT sm.url, sm.lastmod_date, fl.fd AS fetched_date
    FROM sm JOIN fl ON sm.url = fl.url
    WHERE sm.lastmod_date > fl.fd
    """,
)
def q_sitemap_stale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sitemap import parse_sitemaps, stale_from_sitemap

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    day = F.lpad((F.pmod(i, F.lit(28)) + 1).cast("string"), 2, "0")
    entry = F.concat(
        F.lit("<url><loc>"), _graph_url(i), F.lit("</loc><lastmod>2026-01-"),
        day, F.lit("</lastmod></url>"),
    )
    xmls = (
        d.select(F.pmod(i, F.lit(N_HOSTS)).alias("h"), i.alias("i"), entry.alias("e"))
        .groupBy("h")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col("i"), F.col("e")))),
                        lambda s: s["e"],
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("xml")
        )
        .select(
            F.concat(F.lit("host"), F.col("h").cast("string"),
                     F.lit(".example.com")).alias("host"),
            "xml",
        )
    )
    fetch_log = d.select(
        _graph_url(i).alias("url"),
        F.concat(
            F.lit("2026-01-"),
            F.lpad((F.pmod(i * 2, F.lit(28)) + 1).cast("string"), 2, "0"),
        ).alias("fetch_date"),
    )
    return stale_from_sitemap(parse_sitemaps(xmls), fetch_log)


# --------------------------------------------------------------------------- #
# S6c: CDXJ capture index (the Common-Crawl/IA lookup index over WARC
# stores): one line per capture — SURT key + timestamp + a JSON blob
# (url, digest, record length). Composes surt_key (domain-clustered
# sort/range order) with warc_format's record accounting: sorting and
# range-partitioning THIS table is what makes point lookups and
# per-domain scans over a 100 TB WARC store partition-pruned. The
# timestamp is the deterministic crawl-start stamp (wall clock in a
# real deployment); digest = the cross-engine h60 content hash.
# --------------------------------------------------------------------------- #
@query(
    "cdx_index",
    f"""
    WITH pages AS (
        SELECT doc_id::BIGINT AS doc_id, {_graph_url_sql('doc_id')} AS url,
               coalesce(text, '') AS payload
        FROM documents
    )
    SELECT doc_id, {surt_key_sql('url', 'duckdb')} AS surt,
           '20260101000000' AS ts, url,
           {H.h60_sql('payload')}::BIGINT AS digest,
           strlen(payload)::BIGINT AS length
    FROM pages
    """,
)
def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urls import surt_key

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    payload = F.coalesce(F.col("text"), F.lit(""))
    url = _graph_url(i)
    return d.select(
        i.alias("doc_id"),
        surt_key(url).alias("surt"),
        F.lit("20260101000000").alias("ts"),
        url.alias("url"),
        H.h60(payload).alias("digest"),
        F.octet_length(payload).cast("long").alias("length"),
    )


# --------------------------------------------------------------------------- #
# S6b read path: WARC parse — the ROUND TRIP of warc_export. Records
# are rendered (warc_format), concatenated into per-host streams in
# doc_id order (exactly the byte stream write_warc parts hold), then
# parse_warc recovers every record length-respectingly (Content-Length
# octets, like warcio — not a regex split). The oracle is the ground
# truth of what the parse MUST recover, derived straight from
# documents: round-trip identity, not a SQL re-implementation of the
# parser. Scale: one stream row per part file (production rotates at
# ~1 GiB → thousands of parts at 100 TB); stream bytes stay map-side.
# --------------------------------------------------------------------------- #
@query(
    "warc_parse",
    f"""
    WITH pages AS (
        SELECT doc_id::BIGINT AS i, {_graph_url_sql('doc_id')} AS url,
               coalesce(text, '') AS payload
        FROM documents
    )
    SELECT 'host' || (i % {N_HOSTS})::VARCHAR AS stream_id,
           (row_number() OVER (PARTITION BY i % {N_HOSTS} ORDER BY i) - 1)::INT
               AS rec_idx,
           'resource' AS warc_type,
           '<urn:h60:' || {H.h60_sql('url')}::VARCHAR || '>' AS record_id,
           '2026-01-01T00:00:00Z' AS warc_date,
           url,
           'text/plain' AS content_type,
           strlen(payload)::BIGINT AS content_length,
           {H.h60_sql('payload')}::BIGINT AS digest
    FROM pages
    """,
)
def q_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sinks import parse_warc, warc_format

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    pages = d.select(i.alias("i"), _graph_url(i).alias("url"), F.col("text"))
    recs = warc_format(pages, url_col="url", payload_col="text")
    streams = (
        recs.select(F.pmod(F.col("i"), F.lit(N_HOSTS)).alias("h"), "i", "warc")
        .groupBy("h")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("i"), F.col("warc")))),
                    lambda s: s["warc"],
                ),
                "",
            ).alias("stream")
        )
        .select(
            F.concat(F.lit("host"), F.col("h").cast("string")).alias("stream_id"),
            "stream",
        )
    )
    return parse_warc(streams).select(
        "stream_id",
        F.col("rec_idx").cast("int").alias("rec_idx"),
        "warc_type",
        "record_id",
        "warc_date",
        "url",
        "content_type",
        "content_length",
        H.h60(F.col("payload")).alias("digest"),
    )


# --------------------------------------------------------------------------- #
# F8/F10 adjunct: registrable-domain (public-suffix eTLD+1) extraction —
# the grouping key politeness budgets, crawl-trap stats, and blocklists
# want: subdomain-sharded sites fold to one registrant, multi-tenant
# suffixes (github.io) do NOT. Host shapes cover www/deep subdomains,
# 2-label public suffixes, private-registry suffixes, IP literals, and
# single-label hosts.
# --------------------------------------------------------------------------- #
@query(
    "registrable_domain",
    f"""
    WITH hosts AS (
        SELECT doc_id::BIGINT AS doc_id,
               CASE doc_id % 6
                 WHEN 0 THEN 'www.host' || (doc_id % 7)::VARCHAR || '.example.com'
                 WHEN 1 THEN 'a.b.host' || (doc_id % 7)::VARCHAR || '.example.co.uk'
                 WHEN 2 THEN 'user' || (doc_id % 7)::VARCHAR || '.github.io'
                 WHEN 3 THEN 'blog.site' || (doc_id % 7)::VARCHAR || '.com.au'
                 WHEN 4 THEN '10.0.' || (doc_id % 7)::VARCHAR || '.' || (doc_id % 250)::VARCHAR
                 ELSE 'localhost'
               END AS host
        FROM documents
    )
    SELECT doc_id, host,
           {registrable_domain_sql('host', 'duckdb')} AS domain
    FROM hosts
    """,
)
def q_registrable_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.urls import registrable_domain

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(N_HOSTS)).cast("string")
    host = (
        F.when(F.pmod(i, F.lit(6)) == 0, F.concat(F.lit("www.host"), h, F.lit(".example.com")))
        .when(F.pmod(i, F.lit(6)) == 1, F.concat(F.lit("a.b.host"), h, F.lit(".example.co.uk")))
        .when(F.pmod(i, F.lit(6)) == 2, F.concat(F.lit("user"), h, F.lit(".github.io")))
        .when(F.pmod(i, F.lit(6)) == 3, F.concat(F.lit("blog.site"), h, F.lit(".com.au")))
        .when(F.pmod(i, F.lit(6)) == 4,
              F.concat(F.lit("10.0."), h, F.lit("."), F.pmod(i, F.lit(250)).cast("string")))
        .otherwise(F.lit("localhost"))
    )
    hosts = d.select(i.alias("doc_id"), host.alias("host"))
    return hosts.select(
        "doc_id", "host", registrable_domain(F.col("host")).alias("domain"))


# --------------------------------------------------------------------------- #
# S6d: WARC revisit records — ISO 28500 storage dedup across crawl
# generations: a later capture whose payload digest equals an earlier
# capture of the same URL is stored as a slim 'revisit' record
# referencing the original capture's timestamp instead of re-storing
# the payload (the Common-Crawl/IA digest-dedup policy; composes
# cdx_index's digest accounting with snapshot_diff's two-generation
# model: the doc_id%10<3 slice changes content between generations, so
# ~70% of generation-B captures dedup away). Scale: one bounded window
# per (url, digest) — group size = number of generations, never corpus-
# sized; payload bytes are represented by the digest only.
# --------------------------------------------------------------------------- #
@query(
    "warc_revisit",
    f"""
    WITH caps AS (
        SELECT {_graph_url_sql('doc_id')} AS url, '20260101000000' AS ts,
               {H.h60_sql("coalesce(text, '')")}::BIGINT AS digest
        FROM documents
        UNION ALL
        SELECT {_graph_url_sql('doc_id')} AS url, '20260201000000' AS ts,
               {H.h60_sql("(CASE WHEN doc_id % 10 < 3 THEN coalesce(text, '') || '#v2' "
                          "ELSE coalesce(text, '') END)")}::BIGINT AS digest
        FROM documents
    ),
    marked AS (
        SELECT url, ts, digest,
               min(ts) OVER (PARTITION BY url, digest) AS first_ts
        FROM caps
    )
    SELECT url, ts, digest,
           (CASE WHEN ts > first_ts THEN 'revisit' ELSE 'resource' END) AS warc_type,
           (CASE WHEN ts > first_ts THEN first_ts END) AS ref_ts
    FROM marked
    """,
)
def q_warc_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    payload = F.coalesce(F.col("text"), F.lit(""))
    a = d.select(
        _graph_url(i).alias("url"), F.lit("20260101000000").alias("ts"),
        H.h60(payload).alias("digest"))
    b = d.select(
        _graph_url(i).alias("url"), F.lit("20260201000000").alias("ts"),
        H.h60(
            F.when(F.pmod(i, F.lit(10)) < 3, F.concat(payload, F.lit("#v2")))
            .otherwise(payload)).alias("digest"))
    caps = a.unionByName(b)
    w = Window.partitionBy("url", "digest")
    marked = caps.withColumn("first_ts", F.min("ts").over(w))
    is_rv = F.col("ts") > F.col("first_ts")
    return marked.select(
        "url", "ts", "digest",
        F.when(is_rv, F.lit("revisit")).otherwise(F.lit("resource")).alias("warc_type"),
        F.when(is_rv, F.col("first_ts")).alias("ref_ts"),
    )


# --------------------------------------------------------------------------- #
# Fetch-stage adjunct: HTTP response-header parsing — the layer between
# the wire and the engine's typed tables (WARC response records store
# exactly these blocks; redirects_resolve consumes Location, the
# content-type gate decides what reaches extraction). Header blocks are
# synthesized per doc (status / content-type / location classes by
# doc_id dies) and parsed back with case-insensitive single-pass
# regexes — pure column expressions in the scan; is_crawlable is the
# production gate (2xx AND a text/* type).
# --------------------------------------------------------------------------- #
_HDR_CASES_SQL = f"""
    SELECT doc_id::BIGINT AS id,
           'HTTP/1.1 ' ||
           (CASE doc_id % 5 WHEN 0 THEN '301 Moved Permanently'
                            WHEN 1 THEN '404 Not Found'
                            ELSE '200 OK' END) || chr(13) || chr(10) ||
           (CASE doc_id % 4
              WHEN 0 THEN 'Content-Type: text/html; charset=UTF-8'
              WHEN 1 THEN 'content-type: text/html;charset=iso-8859-1'
              WHEN 2 THEN 'Content-Type: image/png'
              ELSE 'CONTENT-TYPE: text/plain' END) || chr(13) || chr(10) ||
           (CASE WHEN doc_id % 5 = 0
                 THEN 'Location: ' || {_graph_url_sql('doc_id + 1')} || chr(13) || chr(10)
                 ELSE '' END) ||
           'Content-Length: ' || strlen(coalesce(text, ''))::VARCHAR
           || chr(13) || chr(10) || 'Server: synthetic/1.0' AS hdr
    FROM documents
"""


@query(
    "http_headers_parse",
    f"""
    WITH raw AS ({_HDR_CASES_SQL}),
    parsed AS (
        SELECT id, hdr,
               regexp_extract(hdr, '^HTTP/1\\.[01] ([0-9]{{3}})', 1) AS status_s,
               trim(regexp_extract(hdr, '(?i)content-type:\\s*([^;\\r\\n]+)', 1))
                   AS content_type,
               lower(trim(regexp_extract(hdr, '(?i)charset=([^;\\r\\n ]+)', 1)))
                   AS charset,
               regexp_extract(hdr, '(?i)location:\\s*([^\\r\\n]+)', 1) AS location,
               regexp_extract(hdr, '(?i)content-length:\\s*([0-9]+)', 1) AS clen_s
        FROM raw
    )
    SELECT id, status_s::INT AS status, content_type,
           (CASE WHEN charset = '' THEN NULL ELSE charset END) AS charset,
           (CASE WHEN location = '' THEN NULL ELSE location END) AS location,
           clen_s::BIGINT AS content_length,
           (status_s = '200' AND content_type IN ('text/html', 'text/plain'))
               AS is_crawlable
    FROM parsed
    """,
)
def q_http_headers_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    crlf = F.lit("\r\n")
    status_line = (
        F.when(F.pmod(i, F.lit(5)) == 0, F.lit("301 Moved Permanently"))
        .when(F.pmod(i, F.lit(5)) == 1, F.lit("404 Not Found"))
        .otherwise(F.lit("200 OK"))
    )
    ctype_line = (
        F.when(F.pmod(i, F.lit(4)) == 0, F.lit("Content-Type: text/html; charset=UTF-8"))
        .when(F.pmod(i, F.lit(4)) == 1, F.lit("content-type: text/html;charset=iso-8859-1"))
        .when(F.pmod(i, F.lit(4)) == 2, F.lit("Content-Type: image/png"))
        .otherwise(F.lit("CONTENT-TYPE: text/plain"))
    )
    loc_line = F.when(
        F.pmod(i, F.lit(5)) == 0,
        F.concat(F.lit("Location: "), _graph_url(i + 1), crlf),
    ).otherwise(F.lit(""))
    hdr = F.concat(
        F.lit("HTTP/1.1 "), status_line, crlf,
        ctype_line, crlf,
        loc_line,
        F.lit("Content-Length: "),
        F.octet_length(F.coalesce(F.col("text"), F.lit(""))).cast("string"),
        crlf, F.lit("Server: synthetic/1.0"),
    )
    raw = d.select(i.alias("id"), hdr.alias("hdr"))
    status_s = F.regexp_extract("hdr", r"^HTTP/1\.[01] ([0-9]{3})", 1)
    ctype = F.trim(F.regexp_extract("hdr", r"(?i)content-type:\s*([^;\r\n]+)", 1))
    charset = F.lower(F.trim(F.regexp_extract("hdr", r"(?i)charset=([^;\r\n ]+)", 1)))
    location = F.regexp_extract("hdr", r"(?i)location:\s*([^\r\n]+)", 1)
    clen = F.regexp_extract("hdr", r"(?i)content-length:\s*([0-9]+)", 1)
    return raw.select(
        "id",
        status_s.cast("int").alias("status"),
        ctype.alias("content_type"),
        F.when(charset == "", F.lit(None).cast("string")).otherwise(charset).alias("charset"),
        F.when(location == "", F.lit(None).cast("string")).otherwise(location).alias("location"),
        clen.cast("long").alias("content_length"),
        ((status_s == "200") & ctype.isin("text/html", "text/plain")).alias("is_crawlable"),
    )


# --------------------------------------------------------------------------- #
# REP completeness beyond robots.txt: per-PAGE robots directives — the
# HTML <meta name="robots"> tag and the X-Robots-Tag response header
# (Google's REP extensions; robots.txt gates FETCHING, these gate
# INDEXING and outlink-following). Synthesized pages carry the four
# directive classes; the effective flag is the OR of tag and header
# (the documented most-restrictive-wins rule). Single-pass
# case-insensitive regexes in the scan projection.
# --------------------------------------------------------------------------- #
@query(
    "meta_robots",
    f"""
    WITH pages AS (
        SELECT doc_id::BIGINT AS id,
               '<html><head>' ||
               (CASE doc_id % 4
                  WHEN 0 THEN '<meta name="robots" content="noindex, nofollow">'
                  WHEN 1 THEN '<meta name="ROBOTS" content="NOINDEX">'
                  WHEN 2 THEN '<meta name="robots" content="all">'
                  ELSE '' END) ||
               '<title>t</title></head><body>b</body></html>' AS html,
               (CASE WHEN doc_id % 5 = 0 THEN 'X-Robots-Tag: nofollow'
                     ELSE 'Content-Type: text/html' END) AS hdr
        FROM documents
    ),
    parsed AS (
        SELECT id,
               lower(regexp_extract(html,
                   '(?i)<meta\\s+name="robots"\\s+content="([^"]*)"', 1)) AS meta,
               lower(regexp_extract(hdr, '(?i)x-robots-tag:\\s*([^\\r\\n]+)', 1))
                   AS xrt
        FROM pages
    )
    SELECT id, meta, xrt,
           (regexp_matches(meta, '(^|[, ])noindex($|[, ])')
            OR regexp_matches(xrt, '(^|[, ])noindex($|[, ])')) AS noindex,
           (regexp_matches(meta, '(^|[, ])nofollow($|[, ])')
            OR regexp_matches(xrt, '(^|[, ])nofollow($|[, ])')) AS nofollow
    FROM parsed
    """,
)
def q_meta_robots(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    meta_tag = (
        F.when(F.pmod(i, F.lit(4)) == 0,
               F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(F.pmod(i, F.lit(4)) == 1, F.lit('<meta name="ROBOTS" content="NOINDEX">'))
        .when(F.pmod(i, F.lit(4)) == 2, F.lit('<meta name="robots" content="all">'))
        .otherwise(F.lit(""))
    )
    html = F.concat(F.lit("<html><head>"), meta_tag,
                    F.lit("<title>t</title></head><body>b</body></html>"))
    hdr = F.when(F.pmod(i, F.lit(5)) == 0, F.lit("X-Robots-Tag: nofollow")) \
        .otherwise(F.lit("Content-Type: text/html"))
    p = d.select(i.alias("id"), html.alias("html"), hdr.alias("hdr"))
    meta = F.lower(F.regexp_extract(
        "html", r'(?i)<meta\s+name="robots"\s+content="([^"]*)"', 1))
    xrt = F.lower(F.regexp_extract("hdr", r"(?i)x-robots-tag:\s*([^\r\n]+)", 1))
    word = lambda c, w: c.rlike(f"(^|[, ]){w}($|[, ])")  # noqa: E731
    parsed = p.select("id", meta.alias("meta"), xrt.alias("xrt"))
    return parsed.select(
        "id", "meta", "xrt",
        (word(F.col("meta"), "noindex") | word(F.col("xrt"), "noindex")).alias("noindex"),
        (word(F.col("meta"), "nofollow") | word(F.col("xrt"), "nofollow")).alias("nofollow"),
    )


# --------------------------------------------------------------------------- #
# rel_canonical — <link rel="canonical"> folding (index-side URL dedup).
# The REP-adjacent signal meta_robots doesn't cover: pages DECLARE their
# canonical URL, and the indexer folds duplicates onto it — with the
# standard production guard that a cross-host canonical is ignored
# (the hijack vector: any page could otherwise claim any URL). One
# regexp extract + one host compare in the scan projection, then a
# single window count per canonical group. Synthesized pages: id%3==1
# (id>=7) declares a same-host canonical to p/(id-7) — whose own id%3
# is 0, so folds are single-hop by construction (matching the
# one-hop-only semantics real indexers apply to canonical chains);
# id%3==2 declares a cross-host canonical (ignored); else none.
# --------------------------------------------------------------------------- #
@query(
    "rel_canonical",
    """
    WITH pages AS (
        SELECT doc_id::BIGINT AS id,
               'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/'
                   || doc_id::VARCHAR AS url,
               '<html><head>' ||
               (CASE
                  WHEN doc_id % 3 = 1 AND doc_id >= 7 THEN
                    '<link rel="canonical" href="https://host'
                      || (doc_id % 7)::VARCHAR || '.example.com/p/'
                      || (doc_id - 7)::VARCHAR || '">'
                  WHEN doc_id % 3 = 2 THEN
                    '<link rel="canonical" href="https://host'
                      || ((doc_id + 1) % 7)::VARCHAR || '.example.com/p/'
                      || doc_id::VARCHAR || '">'
                  ELSE '' END) ||
               '</head><body>b</body></html>' AS html
        FROM documents
    ),
    parsed AS (
        SELECT id, url,
               nullif(regexp_extract(html,
                   '(?i)<link\\s+rel="canonical"\\s+href="([^"]*)"', 1), '')
                   AS decl
        FROM pages
    ),
    resolved AS (
        SELECT id, url, decl,
               (decl IS NOT NULL
                AND regexp_extract(decl, '^https://([^/]+)', 1)
                    <> regexp_extract(url, '^https://([^/]+)', 1))
                   AS cross_host_ignored,
               CASE WHEN decl IS NOT NULL
                         AND regexp_extract(decl, '^https://([^/]+)', 1)
                             = regexp_extract(url, '^https://([^/]+)', 1)
                    THEN decl ELSE url END AS effective_url
        FROM parsed
    )
    SELECT id, url, decl, effective_url,
           effective_url = url AS is_self,
           cross_host_ignored,
           count(*) OVER (PARTITION BY effective_url)::BIGINT AS n_folded
    FROM resolved
    """,
)
def q_rel_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    host = F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                    F.lit(".example.com"))
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), i.cast("string"))
    link_same = F.concat(
        F.lit('<link rel="canonical" href="https://'), host, F.lit("/p/"),
        (i - 7).cast("string"), F.lit('">'))
    link_cross = F.concat(
        F.lit('<link rel="canonical" href="https://host'),
        F.pmod(i + 1, F.lit(7)).cast("string"),
        F.lit(".example.com/p/"), i.cast("string"), F.lit('">'))
    html = F.concat(
        F.lit("<html><head>"),
        F.when((F.pmod(i, F.lit(3)) == 1) & (i >= 7), link_same)
        .when(F.pmod(i, F.lit(3)) == 2, link_cross)
        .otherwise(F.lit("")),
        F.lit("</head><body>b</body></html>"))
    pages = d.select(i.alias("id"), url.alias("url"), html.alias("html"))
    decl = F.nullif(
        F.regexp_extract("html", r'(?i)<link\s+rel="canonical"\s+href="([^"]*)"', 1),
        F.lit(""))
    parsed = pages.select("id", "url", decl.alias("decl"))
    h = lambda c: F.regexp_extract(c, "^https://([^/]+)", 1)  # noqa: E731
    same_host = F.col("decl").isNotNull() & (h(F.col("decl")) == h(F.col("url")))
    resolved = parsed.select(
        "id", "url", "decl",
        (F.col("decl").isNotNull() & ~same_host).alias("cross_host_ignored"),
        F.when(same_host, F.col("decl")).otherwise(F.col("url"))
            .alias("effective_url"),
    )
    return resolved.select(
        "id", "url", "decl", "effective_url",
        (F.col("effective_url") == F.col("url")).alias("is_self"),
        "cross_host_ignored",
        F.count("*").over(Window.partitionBy("effective_url"))
            .cast("long").alias("n_folded"),
    )


# --------------------------------------------------------------------------- #
# revisit_304 — conditional-GET revisit economics (If-None-Match / 304).
# The freshness loop's bandwidth side: a recrawl sends the stored
# validator (ETag = content digest from generation 0); unchanged pages
# answer 304 Not Modified and cost headers only. Two deterministic
# generations are synthesized from the documents text (gen 1 mutates
# every 4th page); the rollup prices the revisit per host — the number
# a scheduler uses to decide which hosts are cheap to keep fresh.
# Pure column exprs + one hash groupBy; composes with warc_revisit
# (digest-based WARC dedup) and stale_from_sitemap (who to revisit).
# --------------------------------------------------------------------------- #
@query(
    "revisit_304",
    """
    WITH gens AS (
        SELECT doc_id::BIGINT AS id,
               'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               text AS content_g0,
               CASE WHEN doc_id % 4 = 0 THEN text || ' [updated]'
                    ELSE text END AS content_g1
        FROM documents
    ),
    probed AS (
        SELECT id, host,
               md5(content_g1) <> md5(content_g0) AS modified,
               strlen(content_g1)::BIGINT AS nbytes
        FROM gens
    )
    SELECT host,
           count(*)::BIGINT AS n_urls,
           sum(CASE WHEN modified THEN 1 ELSE 0 END)::BIGINT AS n_modified,
           sum(CASE WHEN modified THEN 0 ELSE 1 END)::BIGINT AS n_not_modified,
           sum(nbytes)::BIGINT AS bytes_full,
           sum(CASE WHEN modified THEN 0 ELSE nbytes END)::BIGINT AS bytes_saved,
           round(sum(CASE WHEN modified THEN 0 ELSE nbytes END)::DOUBLE
                 / sum(nbytes)::DOUBLE, 6) AS saved_frac
    FROM probed GROUP BY host
    """,
)
def q_revisit_304(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    host = F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                    F.lit(".example.com"))
    g1 = F.when(F.pmod(i, F.lit(4)) == 0,
                F.concat(F.col("text"), F.lit(" [updated]"))) \
        .otherwise(F.col("text"))
    probed = d.select(
        host.alias("host"),
        (F.md5(g1) != F.md5(F.col("text"))).alias("modified"),
        F.octet_length(g1).cast("long").alias("nbytes"),
    )
    saved = F.sum(F.when(F.col("modified"), F.lit(0)).otherwise(F.col("nbytes")))
    return probed.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum(F.when(F.col("modified"), 1).otherwise(0)).cast("long")
            .alias("n_modified"),
        F.sum(F.when(F.col("modified"), 0).otherwise(1)).cast("long")
            .alias("n_not_modified"),
        F.sum("nbytes").cast("long").alias("bytes_full"),
        saved.cast("long").alias("bytes_saved"),
        F.round(saved.cast("double") / F.sum("nbytes").cast("double"), 6)
            .alias("saved_frac"),
    )


# --------------------------------------------------------------------------- #
# dust_params — DUST-style URL-parameter irrelevance mining (Bar-Yossef
# et al., "Do Not Crawl in the DUST: Different URLs with Similar Text",
# WWW'07). A crawler that has fetched content digests can LEARN which
# query parameters never change the content (session ids, click
# trackers) and fold them out of canonicalization — shrinking the
# frontier by whole factors. Evidence unit: a group of URLs identical
# except for one parameter's value; the parameter is irrelevant on a
# host iff every such group (above a support floor) collapses to one
# digest. Synthesized corpus: content = f(host, id, page); 'session'
# varies freely (irrelevant), 'page' changes content (violation),
# 'id' never varies within its groups (insufficient support).
# Shape: explode is bounded by params-per-URL (3); only slim
# (host, param, rest_key) rows shuffle — two hash aggs, no self-join.
# --------------------------------------------------------------------------- #
DUST_MIN_SUPPORT = 5

@query(
    "dust_params",
    f"""
    WITH urls AS (
        SELECT doc_id::BIGINT AS id,
               'host' || (doc_id % 2)::VARCHAR || '.example.com' AS host,
               'https://host' || (doc_id % 2)::VARCHAR
                 || '.example.com/item?id=' || (doc_id % 5)::VARCHAR
                 || '&page=' || (doc_id % 3)::VARCHAR
                 || '&session=s' || (doc_id % 25)::VARCHAR AS url,
               md5('c-' || (doc_id % 2)::VARCHAR || '-'
                   || (doc_id % 5)::VARCHAR || '-'
                   || (doc_id % 3)::VARCHAR) AS digest
        FROM documents
    ),
    exploded AS (
        SELECT host, digest,
               string_split(url, '?')[1] AS path,
               string_split(string_split(url, '?')[2], '&') AS pairs
        FROM urls
    ),
    per_param AS (
        SELECT host, digest, path, pairs, unnest(pairs) AS pair
        FROM exploded
    ),
    keyed AS (
        SELECT host,
               string_split(pair, '=')[1] AS param,
               string_split(pair, '=')[2] AS pval,
               path || '?' || array_to_string(
                   list_sort(list_filter(pairs, x -> x <> pair)), '&')
                   AS rest_key,
               digest
        FROM per_param
    ),
    grouped AS (
        SELECT host, param, rest_key,
               count(DISTINCT pval) AS n_vals,
               count(DISTINCT digest) AS n_digests
        FROM keyed GROUP BY host, param, rest_key
    )
    SELECT host, param,
           sum(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END)::BIGINT AS support,
           sum(CASE WHEN n_vals >= 2 AND n_digests > 1 THEN 1 ELSE 0 END)::BIGINT
               AS violations,
           (sum(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END) >= {DUST_MIN_SUPPORT}
            AND sum(CASE WHEN n_vals >= 2 AND n_digests > 1 THEN 1 ELSE 0 END) = 0)
               AS irrelevant
    FROM grouped GROUP BY host, param
    """,
)
def q_dust_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    h2 = F.pmod(i, F.lit(2)).cast("string")
    url = F.concat(
        F.lit("https://host"), h2, F.lit(".example.com/item?id="),
        F.pmod(i, F.lit(5)).cast("string"),
        F.lit("&page="), F.pmod(i, F.lit(3)).cast("string"),
        F.lit("&session=s"), F.pmod(i, F.lit(25)).cast("string"))
    digest = F.md5(F.concat(
        F.lit("c-"), h2, F.lit("-"), F.pmod(i, F.lit(5)).cast("string"),
        F.lit("-"), F.pmod(i, F.lit(3)).cast("string")))
    urls = d.select(
        F.concat(F.lit("host"), h2, F.lit(".example.com")).alias("host"),
        url.alias("url"), digest.alias("digest"))
    qsplit = F.split(F.col("url"), r"\?")
    exploded = urls.select(
        "host", "digest",
        qsplit.getItem(0).alias("path"),
        F.split(qsplit.getItem(1), "&").alias("pairs"))
    per_param = exploded.select(
        "host", "digest", "path", "pairs",
        F.explode("pairs").alias("pair"))
    kv = F.split(F.col("pair"), "=")
    rest = F.concat(
        F.col("path"), F.lit("?"),
        F.array_join(
            F.array_sort(F.filter("pairs", lambda x: x != F.col("pair"))),
            "&"))
    keyed = per_param.select(
        "host",
        kv.getItem(0).alias("param"),
        kv.getItem(1).alias("pval"),
        rest.alias("rest_key"),
        "digest")
    grouped = keyed.groupBy("host", "param", "rest_key").agg(
        F.countDistinct("pval").alias("n_vals"),
        F.countDistinct("digest").alias("n_digests"))
    support = F.sum(F.when(F.col("n_vals") >= 2, 1).otherwise(0))
    violations = F.sum(
        F.when((F.col("n_vals") >= 2) & (F.col("n_digests") > 1), 1).otherwise(0))
    return grouped.groupBy("host", "param").agg(
        support.cast("long").alias("support"),
        violations.cast("long").alias("violations"),
        ((support >= DUST_MIN_SUPPORT) & (violations == 0)).alias("irrelevant"))


# --------------------------------------------------------------------------- #
# hreflang_reciprocal — rel="alternate" hreflang annotation validation.
# Indexers only honor an hreflang pair when it is RECIPROCAL (A lists B
# and B lists A) — one-way annotations are dropped, the documented
# Google Search behavior and the #1 real-world hreflang bug. The
# synthesized corpus builds 3-language clusters (en/de/fr) where every
# 5th cluster's 'en' page omits its link to 'de' (the asymmetry), and
# the tail cluster dangles into a nonexistent page (annotation to a URL
# the crawl never fetched). Shape: the annotation edge list self-joins
# once on the flipped key (src,dst)=(dst,src) — a slim equi-join that
# co-partitions on the join key — then one hash agg per page.
# --------------------------------------------------------------------------- #
@query(
    "hreflang_reciprocal",
    """
    WITH members AS (
        SELECT doc_id::BIGINT AS id,
               (doc_id // 3)::BIGINT AS c,
               (doc_id % 3)::BIGINT AS pos
        FROM documents
    ),
    edges AS (
        SELECT m.id,
               'https://host' || (m.c % 7)::VARCHAR || '.example.com/'
                 || (CASE m.pos WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END)
                 || '/p/' || m.c::VARCHAR AS src,
               (CASE m.pos WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END)
                   AS lang,
               'https://host' || (m.c % 7)::VARCHAR || '.example.com/'
                 || (CASE (m.pos + k.k) % 3
                       WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END)
                 || '/p/' || m.c::VARCHAR AS dst
        FROM members m, (SELECT unnest([1, 2]) AS k) k
        -- targets may be phantom pages (the tail cluster): the
        -- annotation is still emitted, and reciprocity fails naturally
        -- because a page that does not exist emits nothing
    ),
    real_edges AS (
        -- only pages that EXIST emit annotations; targets may dangle
        SELECT e.* FROM edges e
        WHERE NOT ((e.id // 3) % 5 = 0 AND e.id % 3 = 0
                   AND e.dst LIKE '%/de/%')
    ),
    recip AS (
        SELECT a.src, a.lang, a.dst,
               b.src IS NOT NULL AS reciprocal
        FROM real_edges a
        LEFT JOIN real_edges b ON b.src = a.dst AND b.dst = a.src
    )
    SELECT src AS url, lang,
           count(*)::BIGINT AS n_declared,
           sum(CASE WHEN reciprocal THEN 1 ELSE 0 END)::BIGINT AS n_reciprocal,
           (count(*) = sum(CASE WHEN reciprocal THEN 1 ELSE 0 END))
               AS fully_reciprocal
    FROM recip GROUP BY src, lang
    """,
)
def q_hreflang_reciprocal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    members = d.select(i.alias("id"), (i / 3).cast("long").alias("c"),
                       F.pmod(i, F.lit(3)).alias("pos"))
    lang_of = lambda p: (F.when(p == 0, "en").when(p == 1, "de")  # noqa: E731
                         .otherwise("fr"))
    url_of = lambda c, p: F.concat(  # noqa: E731
        F.lit("https://host"), F.pmod(c, F.lit(7)).cast("string"),
        F.lit(".example.com/"), lang_of(p), F.lit("/p/"), c.cast("string"))
    ks = members.select("id", "c", "pos",
                        F.explode(F.array(F.lit(1), F.lit(2))).alias("k"))
    dst_pos = F.pmod(F.col("pos") + F.col("k"), F.lit(3))
    edges = ks.select(
        "id",
        url_of(F.col("c"), F.col("pos")).alias("src"),
        lang_of(F.col("pos")).alias("lang"),
        url_of(F.col("c"), dst_pos).alias("dst"))
    real_edges = edges.where(
        ~((F.pmod((F.col("id") / 3).cast("long"), F.lit(5)) == 0)
          & (F.pmod(F.col("id"), F.lit(3)) == 0)
          & F.col("dst").contains("/de/")))
    a = real_edges.alias("a")
    b = real_edges.select(F.col("src").alias("_bs"),
                          F.col("dst").alias("_bd")).alias("b")
    recip = a.join(
        b, (F.col("_bs") == F.col("a.dst")) & (F.col("_bd") == F.col("a.src")),
        "left").select(
        F.col("a.src").alias("src"), F.col("a.lang").alias("lang"),
        F.col("_bs").isNotNull().alias("reciprocal"))
    nrec = F.sum(F.when(F.col("reciprocal"), 1).otherwise(0))
    return recip.groupBy(F.col("src").alias("url"), "lang").agg(
        F.count("*").cast("long").alias("n_declared"),
        nrec.cast("long").alias("n_reciprocal"),
        (F.count("*") == nrec).alias("fully_reciprocal"))


# --------------------------------------------------------------------------- #
# soft404_detect — probe-signature soft-404 detection (Bar-Yossef et
# al., "Sic Transit Gloria Telae", WWW'04). Hosts that answer missing
# URLs with HTTP 200 + an error page poison the crawl (every dead link
# "succeeds" and gets indexed). The classic detector: fetch a
# known-nonexistent probe URL per host, then flag any 200-page whose
# content is near-identical to the host's probe response. Synthesized
# corpus: every 9th page serves its host's error template (plus noise
# tokens); detection is token-set Jaccard against the probe, joined via
# the 7-row probe table — a broadcast join, zero shuffle of page rows.
# --------------------------------------------------------------------------- #
SOFT404_JACCARD = 0.6


@query(
    "soft404_detect",
    f"""
    WITH pages AS (
        SELECT doc_id::BIGINT AS id,
               'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               CASE WHEN doc_id % 9 = 0
                    THEN 'error 404 page not found on host'
                         || (doc_id % 7)::VARCHAR
                         || ' try the homepage ref' || (doc_id % 3)::VARCHAR
                    ELSE text END AS content
        FROM documents
    ),
    probes AS (
        SELECT DISTINCT 'host' || (doc_id % 7)::VARCHAR || '.example.com'
                   AS host,
               'error 404 page not found on host' || (doc_id % 7)::VARCHAR
                   || ' try the homepage' AS probe
        FROM documents
    ),
    toksed AS (
        SELECT p.id, p.host,
               list_distinct({T.tokens_sql('p.content')}) AS pt,
               list_distinct({T.tokens_sql('r.probe')}) AS rt
        FROM pages p JOIN probes r USING (host)
    ),
    scored AS (
        SELECT id, host,
               round(len(list_intersect(pt, rt))::DOUBLE
                     / len(list_distinct(list_concat(pt, rt)))::DOUBLE,
                     6) AS jaccard
        FROM toksed
    )
    SELECT id, host, jaccard,
           jaccard >= {SOFT404_JACCARD!r} AS is_soft404
    FROM scored
    """,
)
def q_soft404_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    h = F.pmod(i, F.lit(7)).cast("string")
    host = F.concat(F.lit("host"), h, F.lit(".example.com"))
    content = F.when(
        F.pmod(i, F.lit(9)) == 0,
        F.concat(F.lit("error 404 page not found on host"), h,
                 F.lit(" try the homepage ref"),
                 F.pmod(i, F.lit(3)).cast("string"))
    ).otherwise(F.col("text"))
    pages = d.select(i.alias("id"), host.alias("host"),
                     content.alias("content"))
    probes = d.select(
        host.alias("host"),
        F.concat(F.lit("error 404 page not found on host"), h,
                 F.lit(" try the homepage")).alias("probe"),
    ).distinct()
    pt = F.array_distinct(T.tokens(F.col("content")))
    rt = F.array_distinct(T.tokens(F.col("probe")))
    jac = F.round(
        F.size(F.array_intersect(pt, rt)).cast("double")
        / F.size(F.array_union(pt, rt)).cast("double"), 6)
    return pages.join(F.broadcast(probes), "host").select(
        "id", "host", jac.alias("jaccard"),
        (jac >= F.lit(SOFT404_JACCARD)).alias("is_soft404"))


# --------------------------------------------------------------------------- #
# url_alias_groups — alias-class resolution (redirects ∪ rel-canonical → CC)
# --------------------------------------------------------------------------- #
# The indexer-side URL dedup step AFTER the per-signal queries: redirect
# edges (F12) and same-host rel-canonical declarations (rel_canonical)
# union into one alias graph; connected components pick ONE canonical
# per class (min id — deterministic on any cluster). Synthetic edges:
# id%5==3 redirects to its century hub id-(id%100) (a star, the real
# alias fan-in shape — tracking params, mirrors, print views all
# pointing at one page), id%3==1 & id>=7 declares canonical id-7
# (same host: -7 ≡ 0 mod 7). Components are bounded by alias-group
# size by construction (stars + ≤3-hop bridges), matching reality —
# alias classes don't grow with corpus size, so min-label propagation
# converges in a handful of rounds at ANY scale.
ALIAS_CC_ITERS = 10


@query(
    "url_alias_groups",
    """
    WITH RECURSIVE pages AS (SELECT doc_id::BIGINT AS id FROM documents),
    base AS (
        SELECT id AS a, (id - (id % 100))::BIGINT AS b
        FROM pages WHERE id % 5 = 3
        UNION
        SELECT id, (id - 7)::BIGINT FROM pages WHERE id % 3 = 1 AND id >= 7
    ),
    eb AS (SELECT a, b FROM base JOIN pages p ON p.id = base.b WHERE a <> b),
    edges AS (SELECT a, b FROM eb UNION SELECT b, a FROM eb),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(src, node) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
    ),
    comp AS (
        SELECT src AS id, min(node)::BIGINT AS canonical_id,
               count(*)::BIGINT AS n_aliases
        FROM reach GROUP BY src
    )
    SELECT id,
           'https://host' || (id % 7)::VARCHAR || '.example.com/p/'
               || id::VARCHAR AS url,
           canonical_id,
           'https://host' || (canonical_id % 7)::VARCHAR || '.example.com/p/'
               || canonical_id::VARCHAR AS canonical_url,
           n_aliases,
           id = canonical_id AS is_canonical
    FROM comp
    """,
)
def q_url_alias_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias-class resolution: fold redirect edges and same-host
    rel-canonical declarations into connected components and elect one
    canonical URL per class — the indexer's URL dedup that the
    per-signal queries (redirects_resolve, rel_canonical, dust_params)
    feed. Iterative min-label propagation (the dedup_minhash_cc
    pattern: one shuffle join + hash agg per round, lineage cut,
    fixpoint early-exit); only URLs that participate in an alias edge
    appear (singletons are their own trivial class). At 10^10 URLs the
    edge list is a small fraction of the corpus and component diameter
    is bounded by alias-chain length (~3), not corpus size."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    pages = d.select(i.alias("id"))
    rd = pages.where(F.pmod(F.col("id"), F.lit(5)) == 3).select(
        F.col("id").alias("a"),
        (F.col("id") - F.pmod(F.col("id"), F.lit(100))).alias("b"))
    cn = pages.where(
        (F.pmod(F.col("id"), F.lit(3)) == 1) & (F.col("id") >= 7)
    ).select(F.col("id").alias("a"), (F.col("id") - 7).alias("b"))
    base = rd.unionByName(cn).where(F.col("a") != F.col("b")).distinct()
    eb = base.join(pages.select(F.col("id").alias("b")), "b").select("a", "b")
    edges = (
        eb.unionByName(eb.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .cache()
    )
    labels = edges.select(F.col("a").alias("n")).distinct().withColumn(
        "label", F.col("n")).localCheckpoint()
    for _ in range(ALIAS_CC_ITERS):
        nbr = (
            edges.join(labels, edges["b"] == labels["n"])
            .groupBy(edges["a"].alias("n2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new = labels.join(nbr, labels["n"] == nbr["n2"], "left").select(
            "n",
            F.least(F.col("label"),
                    F.coalesce("nbr_label", F.col("label"))).alias("label"),
        ).localCheckpoint()
        changed = (
            new.alias("x").join(labels.alias("y"), "n")
            .where(F.col("x.label") != F.col("y.label")).limit(1).count()
        )
        labels = new
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(
        F.count("*").cast("long").alias("n_aliases"))
    u = lambda c: F.concat(  # noqa: E731
        F.lit("https://host"), F.pmod(c, F.lit(7)).cast("string"),
        F.lit(".example.com/p/"), c.cast("string"))
    return labels.join(sizes, "label").select(
        F.col("n").alias("id"),
        u(F.col("n")).alias("url"),
        F.col("label").alias("canonical_id"),
        u(F.col("label")).alias("canonical_url"),
        "n_aliases",
        (F.col("n") == F.col("label")).alias("is_canonical"),
    )


# --------------------------------------------------------------------------- #
# robots_stale — RFC 9309 robots.txt cache expiry → refetch schedule
# --------------------------------------------------------------------------- #
# RFC 9309 §2.4: crawlers SHOULD NOT use a cached robots.txt for more
# than 24 hours. Synthetic fetch log: host h's robots.txt was fetched
# (7h + 3) hours ago — hosts 0..6 age 3..45h, straddling the TTL.
# Urgency weights the refetch queue by the URL mass the stale file
# gates (a stale robots.txt on a 1M-URL host outranks a 10-URL host).
ROBOTS_TTL_H = 24


@query(
    "robots_stale",
    f"""
    WITH hosts AS (
        SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               count(*)::BIGINT AS n_urls
        FROM documents GROUP BY doc_id % 7
    ),
    aged AS (
        SELECT host, n_urls,
               (7 * regexp_extract(host, '^host([0-9]+)', 1)::BIGINT + 3)
                   AS age_h
        FROM hosts
    )
    SELECT host, n_urls, age_h,
           (age_h > {ROBOTS_TTL_H}) AS is_stale,
           (CASE WHEN age_h > {ROBOTS_TTL_H}
                 THEN round(n_urls::DOUBLE
                            * (age_h - {ROBOTS_TTL_H}) / {ROBOTS_TTL_H}, 6)
                 ELSE 0.0::DOUBLE END) AS refetch_priority
    FROM aged
    """,
)
def q_robots_stale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt cache-expiry scheduling (RFC 9309 §2.4's 24h SHOULD):
    per host, the cached file's age against the TTL and a refetch
    priority weighted by the URL mass the file gates — the last
    freshness channel (sitemap lastmod, Poisson revisit, 304 economics
    cover the pages; this covers the RULES). O(hosts) rows out of one
    hash groupBy at any corpus size; the refetch set feeds the same
    front door as parse_robots_txt → CrawlEngine(robots=...)."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    hosts = d.groupBy(F.pmod(i, F.lit(7)).alias("_h")).agg(
        F.count("*").cast("long").alias("n_urls"))
    aged = hosts.select(
        F.concat(F.lit("host"), F.col("_h").cast("string"),
                 F.lit(".example.com")).alias("host"),
        "n_urls",
        (F.lit(7) * F.col("_h") + F.lit(3)).cast("long").alias("age_h"),
    )
    stale = F.col("age_h") > ROBOTS_TTL_H
    return aged.select(
        "host", "n_urls", "age_h",
        stale.alias("is_stale"),
        F.when(stale,
               F.round(F.col("n_urls").cast("double")
                       * (F.col("age_h") - F.lit(ROBOTS_TTL_H))
                       / F.lit(ROBOTS_TTL_H), 6))
        .otherwise(F.lit(0.0)).alias("refetch_priority"),
    )


# --------------------------------------------------------------------------- #
# cloaking_detect — dual-fetch UA-variant cloaking detection
# --------------------------------------------------------------------------- #
# Cloaking (Wu & Davison, WWW'05 "Cloaking and Redirection"): a page
# serves the crawler different content than it serves users, so the
# index ranks text no visitor ever sees. The standard detector fetches
# each page twice — crawler UA and browser UA — and flags pages whose
# token sets diverge past a threshold, while TOLERATING benign dynamism
# (rotating session ids, timestamps). Synthesized dual corpus: every
# 17th page cloaks (the bot view is keyword-stuffed spam, user view is
# the real text); every 11th non-cloaked page has a benign per-fetch
# token appended (must NOT flag). Token-set Jaccard is computed per
# page — pure column/array math in the scan, zero shuffle; at 10^10
# pages this runs map-side everywhere.
CLOAK_JACCARD = 0.5
_CLOAK_SPAM = ("free casino poker slots bonus casino free slots jackpot "
               "poker bonus free")


@query(
    "cloaking_detect",
    f"""
    WITH fetches AS (
        SELECT doc_id::BIGINT AS id,
               'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/'
                   || doc_id::VARCHAR AS url,
               CASE WHEN doc_id % 17 = 0 THEN '{_CLOAK_SPAM}'
                    ELSE text END AS bot_view,
               CASE WHEN doc_id % 17 <> 0 AND doc_id % 11 = 0
                    THEN text || ' session_' || (doc_id % 97)::VARCHAR
                    ELSE text END AS user_view
        FROM documents
    ),
    toksed AS (
        SELECT id, url,
               list_distinct({T.tokens_sql('bot_view')}) AS bt,
               list_distinct({T.tokens_sql('user_view')}) AS ut
        FROM fetches
    ),
    scored AS (
        SELECT id, url, len(bt)::BIGINT AS n_tok_bot, len(ut)::BIGINT AS n_tok_user,
               round(len(list_intersect(bt, ut))::DOUBLE
                     / greatest(1, len(list_distinct(list_concat(bt, ut))))::DOUBLE,
                     6) AS jaccard
        FROM toksed
    )
    SELECT id, url, n_tok_bot, n_tok_user, jaccard,
           (jaccard < {CLOAK_JACCARD!r}) AS is_cloaked
    FROM scored
    """,
)
def q_cloaking_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual-fetch cloaking detection: per page, the crawler-UA and
    browser-UA token sets and their Jaccard; below CLOAK_JACCARD the
    page is serving the bot different content (WWW'05). Benign
    dynamism (one rotating token) keeps Jaccard near 1 and never
    flags; the flagged set is a url_blocklist/trustrank-seed producer.
    Map-side only — no shuffle at any scale."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    cloaked = F.pmod(i, F.lit(17)) == 0
    bot = F.when(cloaked, F.lit(_CLOAK_SPAM)).otherwise(F.col("text"))
    usr = F.when(
        (~cloaked) & (F.pmod(i, F.lit(11)) == 0),
        F.concat(F.col("text"), F.lit(" session_"),
                 F.pmod(i, F.lit(97)).cast("string")),
    ).otherwise(F.col("text"))
    toksed = d.select(
        i.alias("id"),
        F.concat(F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com/p/"), i.cast("string")).alias("url"),
        F.array_distinct(T.tokens(bot)).alias("bt"),
        F.array_distinct(T.tokens(usr)).alias("ut"),
    )
    jac = F.round(
        F.size(F.array_intersect("bt", "ut")).cast("double")
        / F.greatest(F.lit(1),
                     F.size(F.array_distinct(F.concat("bt", "ut")))).cast("double"),
        6)
    return toksed.select(
        "id", "url",
        F.size("bt").cast("long").alias("n_tok_bot"),
        F.size("ut").cast("long").alias("n_tok_user"),
        jac.alias("jaccard"),
        (jac < F.lit(CLOAK_JACCARD)).alias("is_cloaked"),
    )


# --------------------------------------------------------------------------- #
# S-tier publish side: sitemap GENERATION (operators/sitemap.py
# build_sitemaps) — urlset files under the protocol's per-file URL cap.
# The Spark side runs the real two-level (bucket offsets + in-bucket
# rank) machinery that keeps mega-host windows bounded; the oracle
# ranks the straightforward way (one global row_number per host under
# the same (bucket, url) total order), so hash equality PROVES the
# two-level rank is the global rank. Cap shrunk to 40 here so the
# fixture's ~70-URL hosts actually shard.
# --------------------------------------------------------------------------- #
SMG_CAP = 40


@query(
    "sitemap_generate",
    f"""
    WITH urls AS (
        SELECT 'host' || (doc_id % {N_HOSTS})::VARCHAR || '.example.com' AS host,
               {_graph_url_sql('doc_id')} AS url,
               '2026-01-' || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0') AS lastmod
        FROM documents
    ),
    ranked AS (
        SELECT host, url, lastmod,
               {H.h60_sql('url')} % 64 AS bkt,
               row_number() OVER (PARTITION BY host
                                  ORDER BY {H.h60_sql('url')} % 64, url) AS rnk
        FROM urls
    ),
    files AS (
        SELECT host, ((rnk - 1) // {SMG_CAP})::INT AS file_idx,
               count(*)::BIGINT AS n_urls,
               string_agg(
                   '<url><loc>'
                   || replace(replace(replace(url, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
                   || '</loc><lastmod>' || lastmod || '</lastmod></url>',
                   '' ORDER BY rnk) AS body
        FROM ranked GROUP BY 1, 2
    )
    SELECT host, file_idx, n_urls,
           '<?xml version="1.0" encoding="UTF-8"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           || body || '</urlset>' AS xml
    FROM files
    """,
)
def q_sitemap_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sitemap import build_sitemaps

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    urls = d.select(
        F.concat(F.lit("host"), F.pmod(i, F.lit(N_HOSTS)).cast("string"),
                 F.lit(".example.com")).alias("host"),
        _graph_url(i).alias("url"),
        F.concat(F.lit("2026-01-"),
                 F.lpad((F.pmod(i, F.lit(28)) + 1).cast("string"), 2, "0"))
         .alias("lastmod"),
    )
    return build_sitemaps(urls, lastmod_col="lastmod", max_per_file=SMG_CAP)


# --------------------------------------------------------------------------- #
# crawl_gap_report — frontier-gap attribution: of everything the crawl
# DISCOVERED, what was actually fetched, and what did each gate cost?
# The engine's pre-enqueue gates (robots, traps, depth) drop URLs
# silently by design (dropped links are never state — that's what keeps
# per-round writes O(delta)); this query recomputes the attribution
# offline over the same arithmetic link graph the reachability oracle
# uses, with deterministic gate dies (id%11==3 robots-blocked,
# id%13==5 trap-dropped), by running the GATED BFS: blocked/trapped
# nodes are discovered but never expanded, depth-D pages are fetched
# but their children land at D+1 as depth_capped. The classes partition
# the discovered set — the "dark matter" report a crawl operator reads
# before raising max_depth or whitelisting a path.
#
# Scale shape: same per-round anti-join expansion as the engine (one
# co-partitioned join per depth, seen-set dedup), classification and
# rollup are one projection + one 4-row hash agg. Oracle = recursive
# CTE with the identical expansion guard (fixpoint dedup, min-depth
# group) — both engines walk the same gated frontier.
# --------------------------------------------------------------------------- #
GAP_ROBOTS = (11, 3)   # id % 11 == 3 → robots-blocked
GAP_TRAP = (13, 5)     # id % 13 == 5 → trap-template drop


@query(
    "crawl_gap_report",
    f"""
    WITH RECURSIVE n AS (SELECT count(*)::BIGINT AS n FROM documents),
    hop(id, depth) AS (
        SELECT 0::BIGINT, 0
        UNION
        SELECT (h.id * 31 + j.j * 17 + 7) % (SELECT n FROM n), h.depth + 1
        FROM hop h CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS j) j
        WHERE h.depth <= {BFS_DEPTH}
          AND h.id % {GAP_ROBOTS[0]} <> {GAP_ROBOTS[1]}
          AND h.id % {GAP_TRAP[0]} <> {GAP_TRAP[1]}
    ),
    disc AS (SELECT id, min(depth)::INT AS depth FROM hop GROUP BY id),
    cls AS (
        SELECT id, depth,
               CASE WHEN id % {GAP_ROBOTS[0]} = {GAP_ROBOTS[1]}
                         THEN 'robots_blocked'
                    WHEN id % {GAP_TRAP[0]} = {GAP_TRAP[1]}
                         THEN 'trap_dropped'
                    WHEN depth > {BFS_DEPTH} THEN 'depth_capped'
                    ELSE 'fetched' END AS class
        FROM disc
    )
    SELECT class,
           count(*)::BIGINT AS n_urls,
           min(depth)::INT AS min_depth,
           max(depth)::INT AS max_depth
    FROM cls GROUP BY class
    """,
)
def q_crawl_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    rm, rv = GAP_ROBOTS
    tm, tv = GAP_TRAP
    allowed = (
        (F.pmod(F.col("id"), F.lit(rm)) != rv)
        & (F.pmod(F.col("id"), F.lit(tm)) != tv)
        & (F.col("depth") <= BFS_DEPTH)
    )
    seen = spark.createDataFrame([(0, 0)], "id long, depth int")
    frontier = seen
    js = F.array(*[F.lit(j) for j in range(1, GRAPH_DEGREE + 1)])
    for d in range(1, BFS_DEPTH + 2):
        parents = frontier.where(allowed)
        children = (
            parents.select(F.explode(js).alias("j"), F.col("id").alias("pid"))
            .select(
                F.pmod(F.col("pid") * 31 + F.col("j") * 17 + 7,
                       F.lit(n)).alias("id"),
                F.lit(d).alias("depth"),
            )
            .dropDuplicates(["id"])
        )
        fresh = children.join(seen.select("id"), "id", "left_anti")
        seen = seen.unionByName(fresh)
        frontier = fresh
    cls = seen.select(
        "depth",
        F.when(F.pmod(F.col("id"), F.lit(rm)) == rv, F.lit("robots_blocked"))
        .when(F.pmod(F.col("id"), F.lit(tm)) == tv, F.lit("trap_dropped"))
        .when(F.col("depth") > BFS_DEPTH, F.lit("depth_capped"))
        .otherwise(F.lit("fetched")).alias("class"),
    )
    return cls.groupBy("class").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.min("depth").cast("int").alias("min_depth"),
        F.max("depth").cast("int").alias("max_depth"),
    )
