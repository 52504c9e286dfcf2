"""Deterministic link-relevance scorer (operator F5).

Exact arithmetic of the reference's ``analyze_link_relevance``
(/root/reference/ai_agent.py:210-236):

* base 0.5
* +0.3 if ANY whitespace-split query term appears (case-insensitive,
  substring) in the anchor text
* −0.3 if the URL (lowercased) contains any of
  login/signin/register/cart/privacy/terms
* +0.1 if ``url.count('/') > 2`` — note this counts the two slashes of
  ``scheme://`` too, so any absolute URL with a non-root path qualifies
* clamp to [0, 1]
* ordering: score DESC with **stable ties in input order** (Python
  ``sorted`` is stable — /root/reference/ai_agent.py:236); callers must
  add the input-position tiebreaker to reproduce the ordering.

Pure column expressions (JVM codegen) + a SQL emitter for the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BLACKLIST_TERMS = ["login", "signin", "register", "cart", "privacy", "terms"]


def link_score(url: Column | str, anchor_text: Column | str, query: str = "") -> Column:
    u = F.col(url) if isinstance(url, str) else url
    t = F.col(anchor_text) if isinstance(anchor_text, str) else anchor_text
    score = F.lit(0.5)
    terms = [q for q in query.split() if q]
    if terms:
        hit = None
        lt = F.lower(t)
        for q in terms:
            c = lt.contains(q.lower())
            hit = c if hit is None else (hit | c)
        score = score + F.when(hit, F.lit(0.3)).otherwise(F.lit(0.0))
    lu = F.lower(u)
    bad = None
    for b in BLACKLIST_TERMS:
        c = lu.contains(b)
        bad = c if bad is None else (bad | c)
    score = score - F.when(bad, F.lit(0.3)).otherwise(F.lit(0.0))
    # url.count('/') > 2  ≡  len(url) - len(replace(url,'/','')) > 2
    depth = F.length(u) - F.length(F.regexp_replace(u, "/", ""))
    score = score + F.when(depth > 2, F.lit(0.1)).otherwise(F.lit(0.0))
    return F.round(F.greatest(F.lit(0.0), F.least(F.lit(1.0), score)), 6)


def link_score_sql(url_expr: str, text_expr: str, query: str = "") -> str:
    """Same arithmetic as ANSI SQL (DuckDB-compatible) for the oracle."""
    parts = ["0.5"]
    terms = [q for q in query.split() if q]
    if terms:
        cond = " OR ".join(
            f"contains(lower({text_expr}), '{q.lower()}')" for q in terms
        )
        parts.append(f"(CASE WHEN {cond} THEN 0.3 ELSE 0.0 END)")
    bad = " OR ".join(f"contains(lower({url_expr}), '{b}')" for b in BLACKLIST_TERMS)
    parts.append(f"-(CASE WHEN {bad} THEN 0.3 ELSE 0.0 END)")
    depth = f"(length({url_expr}) - length(replace({url_expr}, '/', '')))"
    parts.append(f"(CASE WHEN {depth} > 2 THEN 0.1 ELSE 0.0 END)")
    # CAST: duckdb would otherwise do exact DECIMAL arithmetic; the engine
    # computes in doubles — keep both sides double so value-hashes agree.
    return (
        "CAST(round(greatest(0.0, least(1.0, "
        f"CAST({' + '.join(parts)} AS DOUBLE))), 6) AS DOUBLE)"
    )


def keyword_score(url: Column | str, keywords: list[str], weight: float = 1.0) -> Column:
    """F6 — KeywordRelevanceScorer (imported by the reference at
    /root/reference/crawl_agent.py:14; documented Best-First scorer,
    original-README.md:509-510): the fraction of keywords appearing
    (case-insensitive substring) in the URL, scaled by ``weight``.
    Pure column expression — JVM codegen, no Python."""
    if not keywords:
        return F.lit(0.0)
    u = F.col(url) if isinstance(url, str) else url
    lu = F.lower(u)
    hits = None
    for k in keywords:
        c = F.when(lu.contains(k.lower()), F.lit(1.0)).otherwise(F.lit(0.0))
        hits = c if hits is None else hits + c
    return F.round(hits * F.lit(weight / len(keywords)), 6)


def keyword_score_sql(url_expr: str, keywords: list[str], weight: float = 1.0) -> str:
    if not keywords:
        return "0.0"
    hits = " + ".join(
        f"(CASE WHEN contains(lower({url_expr}), '{k.lower()}') THEN 1.0 ELSE 0.0 END)"
        for k in keywords
    )
    return f"CAST(round(({hits}) * {weight / len(keywords)!r}, 6) AS DOUBLE)"


def keyword_score_py(url: str, keywords: list[str], weight: float = 1.0) -> float:
    if not keywords:
        return 0.0
    lu = url.lower()
    hits = sum(1.0 for k in keywords if k.lower() in lu)
    return round(hits * weight / len(keywords), 6)


def link_score_py(url: str, text: str, query: str = "") -> float:
    """Python mirror for the sequential oracle (same as reference)."""
    score = 0.5
    if query and any(term.lower() in text.lower() for term in query.split()):
        score += 0.3
    if any(term in url.lower() for term in BLACKLIST_TERMS):
        score -= 0.3
    if url.count("/") > 2:
        score += 0.1
    return round(max(0.0, min(1.0, score)), 6)
