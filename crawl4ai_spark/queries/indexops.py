"""Index-build tier: inverted postings, conjunctive search, BPE stats.

A web crawl's output feeds two consumers: a *search index* and a
*tokenizer*. This module adds the index-build jobs — the canonical
"what do you do with 100 TB of fetched pages" workloads — as
oracle-paired queries over the ``documents`` table:

* ``inverted_postings`` — the index segment build: term -> (df, cf)
  dictionary stats plus the head of each postings list (top-3 docs by
  tf). The MapReduce-era flagship job, re-expressed as two map-side-
  combined groupBys + a per-term window for the capped postings head.
* ``index_search`` — conjunctive (AND) boolean retrieval with an
  integer-exact tf-idf surrogate ranking: score = Σ tf·(N − df).
  Monotone in tf and in idf (N−df falls as df rises) but pure BIGINT
  arithmetic, so the DuckDB oracle certifies it bit-for-bit — no
  cross-engine ``ln`` in the last ulp.
* ``bpe_pair_counts`` — step 0 of BPE tokenizer training (Sennrich
  ACL'16): adjacent character-pair counts over the distinct-word
  frequency table, weighted by word frequency. The iterative trainer
  lives in ``operators/bpe.py`` (pytest-verified against a pure-Python
  reference); this query certifies its per-step counting kernel
  against DuckDB.

Scale shapes (100 TB posture):

* postings: explode -> groupBy(term, doc) -> groupBy(term) are all
  map-side combined; the only sort is the per-term window for the
  top-3 head, which Spark executes as an external (spilling) sort
  within shuffle partitions — output is capped at 3 rows/term. A
  production build would also bucket the tf table by term so segment
  writes are co-located; noted, not needed at bench scale.
* search: the term dictionary (df) is tiny and broadcast; the
  conjunctive check is a groupBy(doc) HAVING count = |Q|; the final
  top-20 is TakeOrderedAndProject (distributed top-k, no global sort)
  with a declared 20-row FINAL_RANK window for the rank column.
* pair counts: operates on the Heaps-law word table, not the corpus;
  per-word pair arrays never leave the map side before the combining
  groupBy.

Reference tie-in: /root/reference/ai_agent.py:240-261 ranks pages by
keyword hit counts (its "search"); text_chunking.py splits on
whitespace (its tokenization). These are the distributed index/
tokenizer counterparts those semantics imply at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql
from .registry import query, table as _t

# conjunctive search terms — mid-frequency corpus vocabulary
# (FIXTURES.md documents the synthetic generator's word list)
SEARCH_TERMS = ("spark", "hash", "window")
TOP_K = 20            # search result budget
POSTINGS_HEAD = 3     # postings-list head kept per term
TOP_PAIRS = 40        # bpe pair-count report size

_TOKS_SQL = f"""
    toks AS (
        SELECT d.doc_id, t.term
        FROM documents d,
             unnest({tokens_sql("d.text")}) AS t(term)
    )
"""


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens("text")).alias("term"),
    )


# --------------------------------------------------------------------------- #
# inverted_postings
# --------------------------------------------------------------------------- #
@query(
    "inverted_postings",
    f"""
    WITH {_TOKS_SQL},
    tf AS (
        SELECT term, doc_id, count(*)::BIGINT AS tf
        FROM toks GROUP BY term, doc_id
    ),
    stats AS (
        SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
        FROM tf GROUP BY term
    ),
    ranked AS (
        SELECT term, doc_id, tf,
               row_number() OVER (PARTITION BY term
                                  ORDER BY tf DESC, doc_id ASC) AS rank
        FROM tf
    )
    SELECT r.term, s.df, s.cf, r.rank, r.doc_id, r.tf
    FROM ranked r JOIN stats s USING (term)
    WHERE r.rank <= {POSTINGS_HEAD}
    """,
)
def q_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = (
        _toks(spark, sf_dir)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    ranked = tf.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= POSTINGS_HEAD
    )
    return ranked.join(stats, "term").select(
        "term", "df", "cf", "rank", "doc_id", "tf"
    )


# --------------------------------------------------------------------------- #
# index_search
# --------------------------------------------------------------------------- #
_TERMS_SQL = ", ".join(f"'{t}'" for t in SEARCH_TERMS)


@query(
    "index_search",
    f"""
    WITH {_TOKS_SQL},
    tf AS (
        SELECT term, doc_id, count(*)::BIGINT AS tf
        FROM toks WHERE term IN ({_TERMS_SQL})
        GROUP BY term, doc_id
    ),
    dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id,
               count(*)::BIGINT AS n_matched,
               sum(tf.tf * (n.n_docs - dfs.df))::BIGINT AS score
        FROM tf JOIN dfs USING (term) CROSS JOIN n
        GROUP BY tf.doc_id
    )
    SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
           doc_id, score
    FROM scored
    WHERE n_matched = {len(SEARCH_TERMS)}
    ORDER BY score DESC, doc_id ASC
    LIMIT {TOP_K}
    """,
)
def q_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(spark, sf_dir)
    tf = (
        toks.filter(F.col("term").isin(*SEARCH_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = _t(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfs), "term")
        .join(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.sum(F.col("tf") * (F.col("n_docs") - F.col("df"))).alias("score"),
        )
        .filter(F.col("n_matched") == len(SEARCH_TERMS))
    )
    # distributed top-k first (TakeOrderedAndProject), then the rank
    # column over the bounded 20-row result — declared FINAL_RANK
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(TOP_K)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


# --------------------------------------------------------------------------- #
# bpe_pair_counts
# --------------------------------------------------------------------------- #
@query(
    "bpe_pair_counts",
    f"""
    WITH {_TOKS_SQL},
    words AS (
        SELECT term AS word, count(*)::BIGINT AS freq
        FROM toks GROUP BY term
    ),
    pairs AS (
        SELECT p.pair, w.freq
        FROM words w,
             unnest(list_transform(range(1, length(w.word)),
                                   i -> substr(w.word, i::INT, 2))) AS p(pair)
        WHERE length(w.word) >= 2
    ),
    counts AS (SELECT pair, sum(freq)::BIGINT AS n FROM pairs GROUP BY pair)
    SELECT row_number() OVER (ORDER BY n DESC, pair ASC) AS rank, pair, n
    FROM counts
    ORDER BY n DESC, pair ASC
    LIMIT {TOP_PAIRS}
    """,
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        _toks(spark, sf_dir)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumnRenamed("term", "word")
        .filter(F.length("word") >= 2)
    )
    pairs = words.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("pair")).limit(TOP_PAIRS)
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "pair", "n"
    )


# --------------------------------------------------------------------------- #
# Tokenizer vocabulary coverage / OOV-rate analytics — the sizing input
# for the BPE trainer (operators/bpe.py): given a candidate vocab (the
# top-K corpus words by frequency, lexicographic tie-break — the same
# "most frequent first" greedy that word-level tokenizers and BPE's
# base-vocab selection use), what fraction of each document's tokens
# falls outside it? Corpus-scale posture: the vocab is a K-row
# TakeOrderedAndProject (per-partition heads, never a global sort)
# broadcast into a left join; per-doc counts fold map-side. The
# "train the tokenizer on a sample, measure OOV on the corpus" loop is
# exactly this query pointed at two tables.
# --------------------------------------------------------------------------- #
VOCAB_K = 16


@query(
    "vocab_coverage",
    f"""
    WITH toks AS (
        SELECT doc_id::BIGINT AS doc_id, u.w AS w
        FROM documents, unnest({tokens_sql('text')}) AS u(w)
    ),
    vocab AS (
        SELECT w FROM (
            SELECT w, count(*)::BIGINT AS n FROM toks GROUP BY 1
            ORDER BY n DESC, w LIMIT {VOCAB_K}
        )
    )
    SELECT t.doc_id,
           count(*)::BIGINT AS n_tokens,
           sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
           round(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*)::DOUBLE, 9) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY 1
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(tokens("text")).alias("w"),
    )
    vocab = (
        toks.groupBy("w").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w").limit(VOCAB_K)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
             .alias("n_oov"),
        )
    )
    return per_doc.select(
        "doc_id", "n_tokens", "n_oov",
        F.round(F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"), 9)
         .alias("oov_rate"),
    )
