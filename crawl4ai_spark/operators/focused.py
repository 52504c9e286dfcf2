"""Focused crawling: Naive-Bayes page relevance → frontier link scores.

Chakrabarti, van den Berg & Dom, "Focused Crawling: A New Approach to
Topic-Specific Web Resource Discovery" (WWW 1999): a classifier trained
on the pages a crawl has ALREADY fetched decides which frontier links
are worth fetching next. This module is that loop for the engine —
generation N's labeled pages train a multinomial NB model, the model
scores generation N+1's candidate links by their anchor text, and the
scores feed ``CrawlEngine(url_scores=...)`` (the same override input
the OPIC/PageRank feedback uses, frontier.py:871-885).

Reference tie-in: ai_agent.py:210-236 scores links with a FIXED keyword
list; focused crawling is the trained generalization — the keyword list
is learned from labeled fetches instead of hand-written.

Model shape at scale: the weights table is vocabulary-sized (Heaps'
law — sublinear in corpus bytes) and broadcast at scoring time; the
two training aggregations are map-side-combined groupBys over (term,
label) and (label). Scoring is tokenize → explode → broadcast join →
groupBy(url): only (url, term) pairs shuffle, never document bodies.
Log-odds weights are doubles (training math is ln-based); correctness
is pinned by pytest against a pure-Python twin — the ORACLE-paired
counting kernel (integer-exact class counts and smoothed cross-
products) lives in queries/focusedops.py, following the same split as
the BPE trainer (operators/bpe.py vs queries/indexops.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens


@dataclass(frozen=True)
class NBModel:
    """A trained binary multinomial NB in log-odds form.

    score(doc) = prior + Σ_t tf_t · w_t, with w_t from ``weights``
    for trained terms and ``default_w`` for unseen ones (the smoothed
    zero-count odds — classic NB does not drop unseen vocabulary)."""

    weights: DataFrame          # (term, w: double)
    prior: float                # ln(N_rel + s) − ln(N_irr + s)
    default_w: float            # ln((T_irr + sV) / (T_rel + sV))
    smoothing: float


def nb_train(pages: DataFrame, text_col: str = "text",
             label_col: str = "relevant", smoothing: float = 1.0) -> NBModel:
    """Train on labeled fetched pages: (text, relevant: boolean).

    Two aggregations: per-(term) class token counts and the per-class
    totals (token mass, doc counts, vocab size). The totals frame is
    ONE row — collected driver-side (O(1)) and folded into the weight
    expression as literals, so the weights job is a single groupBy."""
    rel = F.col(label_col).cast("boolean")
    toks = pages.select(
        rel.alias("_rel"), F.explode(tokens(F.col(text_col))).alias("term"))
    per_term = toks.groupBy("term").agg(
        F.sum(F.when(F.col("_rel"), 1).otherwise(0)).alias("c_rel"),
        F.sum(F.when(F.col("_rel"), 0).otherwise(1)).alias("c_irr"),
    )
    tot = toks.agg(
        F.sum(F.when(F.col("_rel"), 1).otherwise(0)).alias("t_rel"),
        F.sum(F.when(F.col("_rel"), 0).otherwise(1)).alias("t_irr"),
        F.count_distinct("term").alias("v"),
    ).collect()[0]
    nd = pages.agg(
        F.sum(F.when(rel, 1).otherwise(0)).alias("n_rel"),
        F.sum(F.when(rel, 0).otherwise(1)).alias("n_irr"),
    ).collect()[0]
    s = float(smoothing)
    denom_rel = float(tot["t_rel"] or 0) + s * float(tot["v"] or 0)
    denom_irr = float(tot["t_irr"] or 0) + s * float(tot["v"] or 0)
    if denom_rel <= 0 or denom_irr <= 0:
        raise ValueError("nb_train needs a non-empty corpus")
    w = (
        F.log((F.col("c_rel") + F.lit(s)) / F.lit(denom_rel))
        - F.log((F.col("c_irr") + F.lit(s)) / F.lit(denom_irr))
    )
    prior = math.log(float(nd["n_rel"] or 0) + s) - math.log(
        float(nd["n_irr"] or 0) + s)
    default_w = math.log(s / denom_rel) - math.log(s / denom_irr)
    return NBModel(
        weights=per_term.select("term", w.alias("w")),
        prior=prior, default_w=default_w, smoothing=s,
    )


def nb_score(texts: DataFrame, model: NBModel, key_col: str = "url",
             text_col: str = "text") -> DataFrame:
    """(key, score): log-odds relevance of each text under the model.

    Tokenize → explode → broadcast-join the vocabulary-sized weights →
    one combining groupBy per key. Rows whose text has NO tokens score
    exactly ``prior`` (left join + explode_outer keeps them). Unseen
    terms take ``default_w`` — the smoothed zero-count odds."""
    toks = texts.select(
        F.col(key_col).alias("_key"),
        F.explode_outer(tokens(F.col(text_col))).alias("term"),
    )
    joined = toks.join(F.broadcast(model.weights), "term", "left")
    contrib = F.when(
        F.col("term").isNull(), F.lit(0.0)
    ).otherwise(F.coalesce(F.col("w"), F.lit(model.default_w)))
    return (
        joined.groupBy("_key")
        .agg((F.lit(model.prior) + F.sum(contrib)).alias("score"))
        .select(F.col("_key").alias(key_col), "score")
    )


def label_by_keywords(pages: DataFrame, keywords: list[str],
                      text_col: str = "text") -> DataFrame:
    """The bootstrap labeler: relevant iff ANY keyword appears as a
    token (exact token match, not substring — 'java' must not label
    'javascript'). How a focused crawl seeds its first generation
    before human/model labels exist."""
    kw = F.array(*[F.lit(k) for k in keywords])
    return pages.withColumn(
        "relevant",
        F.arrays_overlap(tokens(F.col(text_col)), kw),
    )


def anchor_texts_for_targets(pages: DataFrame) -> DataFrame:
    """(url, text): each link target in the fetched pages' span arrays
    with ALL its anchor texts concatenated (deterministic order: sorted
    distinct). The scoring input for the next generation — anchor text
    is the only evidence a crawler has about an UNFETCHED url
    (Chakrabarti's 'hub' signal). Link spans carry the target in
    media_ref and the anchor in text; only (target, anchor) pairs
    shuffle."""
    return (
        pages.select(F.explode("spans").alias("s"))
        .where((F.col("s.kind") == "link") & F.col("s.media_ref").isNotNull())
        .select(
            F.col("s.media_ref").alias("url"),
            F.coalesce(F.col("s.text"), F.lit("")).alias("anchor"),
        )
        .groupBy("url")
        .agg(F.array_join(F.array_sort(F.collect_set("anchor")), " ").alias("text"))
    )


def focused_scores(pages: DataFrame, keywords: list[str],
                   smoothing: float = 1.0) -> DataFrame:
    """The full gen-N → gen-N+1 loop in one call: bootstrap-label the
    fetched pages, train NB on their bodies, score every link target by
    its anchors. Returns (url, score) ready for
    ``CrawlEngine(url_scores=...)`` — scores are max-shifted into
    [0, 1] so they compose with score_threshold the way the other
    feedback adapters do (linkgraph.scores_from_rank contract)."""
    fetched = pages.where(F.col("status") == "fetched")
    texts = fetched.select(
        "url",
        F.array_join(
            F.filter(
                F.transform("spans", lambda s: F.coalesce(s["text"], F.lit(""))),
                lambda t: t != "",
            ),
            " ",
        ).alias("text"),
    )
    model = nb_train(label_by_keywords(texts, keywords), smoothing=smoothing)
    raw = nb_score(anchor_texts_for_targets(fetched), model)
    lo, hi = raw.agg(F.min("score"), F.max("score")).collect()[0]
    if lo is None or hi is None or hi == lo:
        return raw.select("url", F.lit(0.0).alias("score"))
    span = float(hi) - float(lo)
    return raw.select(
        "url", ((F.col("score") - F.lit(float(lo))) / F.lit(span)).alias("score"))
