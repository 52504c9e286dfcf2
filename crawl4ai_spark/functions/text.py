"""Text-analysis column functions for the training-data pipeline surface.

Tokenization, BPE-ish token counting, language-ID heuristic, quality
scoring, stopword ratios — each as (a) a Spark Column expression that
stays inside whole-stage codegen (no Python) and (b) a DuckDB SQL
emitter for the correctness oracle. Reference anchors: word-count gates
(/root/reference/crawl_agent.py:158,185-213), keyword extraction stop
word handling (/root/reference/clustering_strategies.py:246 uses
sklearn's english list — we pin an explicit subset so both engines
agree).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pinned stopword list (subset of sklearn's english list — explicit so the
# Spark plan and the DuckDB oracle share one definition).
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "or", "that", "the",
    "this", "to", "was", "were", "will", "with",
]

# Marker words for the language-ID vote (deterministic n-gram-free heuristic).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "es": ["el", "los", "las", "que", "y", "por", "una"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour"],
}
LANG_PRIORITY = ["en", "de", "es", "fr"]  # argmax tiebreak order

# BPE-ish token regex: letter runs, digit runs, single punctuation marks.
TOKEN_RX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


# --------------------------------------------------------------------------- #
# tokenization
# --------------------------------------------------------------------------- #
def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped (split on \\s+)."""
    return F.filter(F.split(_c(text), "\\s+"), lambda w: w != "")


def tokens_sql(expr: str) -> str:
    return f"list_filter(regexp_split_to_array({expr}, '\\s+'), w -> w <> '')"


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_ws_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish subword-token count: regex token classes (letters/digits/punct)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(TOKEN_RX), 0))


def token_count_bpe_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TOKEN_RX}'))"


# --------------------------------------------------------------------------- #
# ratios / quality
# --------------------------------------------------------------------------- #
def _in_list(w: Column, words: list[str]) -> Column:
    return w.isin(words)


def stopword_ratio(text: Column | str) -> Column:
    t = tokens(text)
    n = F.size(t)
    hits = F.size(F.filter(t, lambda w: F.lower(w).isin(STOPWORDS)))
    return F.when(n > 0, F.round(hits / n, 6)).otherwise(F.lit(0.0))


def stopword_ratio_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    lst = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"round(len(list_filter({toks}, w -> lower(w) IN ({lst})))::DOUBLE "
        f"/ len({toks}), 6) ELSE 0.0 END)"
    )


def punct_ratio(text: Column | str) -> Column:
    c = _c(text)
    n = F.length(c)
    p = n - F.length(F.regexp_replace(c, "[^A-Za-z0-9\\s]", ""))
    return F.when(n > 0, F.round(p / n, 6)).otherwise(F.lit(0.0))


def punct_ratio_sql(expr: str) -> str:
    return (
        f"(CASE WHEN length({expr}) > 0 THEN round((length({expr}) - "
        f"length(regexp_replace({expr}, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE "
        f"/ length({expr}), 6) ELSE 0.0 END)"
    )


def quality_score(text: Column | str) -> Column:
    """Composite doc-quality heuristic in [0,1]:

    0.25·len_score(250-token sweet spot, linear ramp)
    + 0.25·(1 − punct_ratio·4 clamped)
    + 0.30·stopword band score (ideal 0.05–0.5)
    + 0.20·mean-word-length band (3–9 chars).
    Deterministic arithmetic — doubled in the SQL emitter.
    """
    t = tokens(text)
    n = F.size(t).cast("double")
    len_score = F.least(F.lit(1.0), n / F.lit(250.0))
    pr = punct_ratio(text)
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - pr * 4)
    sw = stopword_ratio(text)
    sw_score = F.when((sw >= 0.05) & (sw <= 0.5), F.lit(1.0)).otherwise(F.lit(0.3))
    total_chars = F.aggregate(t, F.lit(0).cast("long"), lambda a, w: a + F.length(w)).cast("double")
    mwl = F.when(n > 0, total_chars / n).otherwise(F.lit(0.0))
    mwl_score = F.when((mwl >= 3.0) & (mwl <= 9.0), F.lit(1.0)).otherwise(F.lit(0.4))
    return F.round(
        F.lit(0.25) * len_score + F.lit(0.25) * punct_score
        + F.lit(0.30) * sw_score + F.lit(0.20) * mwl_score,
        6,
    )


def quality_score_sql(expr: str) -> str:
    toks = tokens_sql(expr)
    n = f"len({toks})::DOUBLE"
    len_score = f"least(1.0, {n} / 250.0)"
    punct_score = f"greatest(0.0, 1.0 - {punct_ratio_sql(expr)} * 4)"
    sw = stopword_ratio_sql(expr)
    sw_score = f"(CASE WHEN {sw} >= 0.05 AND {sw} <= 0.5 THEN 1.0 ELSE 0.3 END)"
    total_chars = (
        f"coalesce(list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({toks}, w -> length(w)::BIGINT)), (a, b) -> a + b), 0)::DOUBLE"
    )
    mwl = f"(CASE WHEN {n} > 0 THEN {total_chars} / {n} ELSE 0.0 END)"
    mwl_score = f"(CASE WHEN {mwl} >= 3.0 AND {mwl} <= 9.0 THEN 1.0 ELSE 0.4 END)"
    return (
        f"round(0.25 * {len_score} + 0.25 * {punct_score} + "
        f"0.30 * {sw_score} + 0.20 * {mwl_score}, 6)"
    )


# --------------------------------------------------------------------------- #
# language ID
# --------------------------------------------------------------------------- #
def lang_id(text: Column | str) -> Column:
    """Deterministic language-ID: CJK codepoint check, else marker-word vote
    with argmax tiebreak in LANG_PRIORITY order."""
    c = _c(text)
    t = tokens(c)

    def _vote(markers: list[str]) -> Column:
        # NB: must be a 1-arg lambda — pyspark treats 2-arg lambdas as
        # (element, index), so a default-arg closure would bind the index.
        return F.size(F.filter(t, lambda w: F.lower(w).isin(markers)))

    votes = {lang: _vote(m) for lang, m in LANG_MARKERS.items()}
    best = F.lit("en")
    best_n = F.lit(-1)
    for lang in reversed(LANG_PRIORITY):  # reversed so earlier priority wins ties via >=
        v = votes[lang]
        best = F.when(v >= best_n, F.lit(lang)).otherwise(best)
        best_n = F.greatest(v, best_n)
    return F.when(c.rlike("[\\u4e00-\\u9fff]"), F.lit("zh")).otherwise(best)


def lang_id_sql(expr: str) -> str:
    toks = tokens_sql(expr)

    def vote(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        return f"len(list_filter({toks}, w -> lower(w) IN ({lst})))"

    best, best_n = "'en'", "-1"
    for lang in reversed(LANG_PRIORITY):
        v = vote(lang)
        best = f"(CASE WHEN {v} >= {best_n} THEN '{lang}' ELSE {best} END)"
        best_n = f"greatest({v}, {best_n})"
    return (
        # RE2 (DuckDB) spells unicode escapes \x{...}; Java (Spark) uses \uXXXX
        f"(CASE WHEN regexp_matches({expr}, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh' "
        f"ELSE {best} END)"
    )
