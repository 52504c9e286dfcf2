"""Focused-crawl queries: the NB training kernel, integer-exact.

The focused-crawl loop (operators/focused.py — Chakrabarti WWW'99)
trains a multinomial Naive-Bayes relevance model on fetched pages. Its
float log-odds are pytest-pinned against a pure-Python twin; THIS
module certifies the distributed counting kernel underneath against
DuckDB, the same operator/oracle split as the BPE trainer
(operators/bpe.py ↔ queries/indexops.py):

* ``nb_term_stats`` — per-term class token counts (c_rel/c_irr), class
  document frequencies (df_rel/df_irr), and the Laplace-smoothed odds
  as an exact BIGINT cross-product pair::

      lift_num = (c_rel + 1) · (T_irr + V)
      lift_den = (c_irr + 1) · (T_rel + V)

  lift_num/lift_den is exp(w_t) of the trained model (smoothing 1):
  comparing the fraction IS comparing the log-odds, with no ln() in
  either engine — the same trick index_search uses for tf·idf.
  Labels are content-derived (relevant iff 'spark' appears as a
  token), so the kernel is tested on a real class split, not a
  synthetic row split.

Scale shape: one tokenize+explode feeding two map-side-combined
groupBys; the class totals (T_rel, T_irr, V) are a 1-row aggregate
broadcast into the projection. Output is vocabulary-sized (Heaps'
law). The BIGINT cross-products hold to ~10^9-token classes; past
that a production variant shifts to the float log-odds the operator
already computes (documented, not a correctness cliff — the oracle
kernel is a verification surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql
from .registry import query, table as _t

TOPIC_TOKEN = "spark"


@query(
    "nb_term_stats",
    f"""
    WITH docs AS (
        SELECT doc_id::BIGINT AS doc_id,
               {tokens_sql('text')} AS toks,
               list_contains({tokens_sql('text')}, '{TOPIC_TOKEN}') AS rel
        FROM documents
    ),
    toks AS (
        SELECT doc_id, rel, unnest(toks) AS term FROM docs
    ),
    per_term AS (
        SELECT term,
               sum(CASE WHEN rel THEN 1 ELSE 0 END)::BIGINT AS c_rel,
               sum(CASE WHEN rel THEN 0 ELSE 1 END)::BIGINT AS c_irr,
               count(DISTINCT CASE WHEN rel THEN doc_id END)::BIGINT AS df_rel,
               count(DISTINCT CASE WHEN NOT rel THEN doc_id END)::BIGINT AS df_irr
        FROM toks GROUP BY term
    ),
    tot AS (
        SELECT sum(CASE WHEN rel THEN 1 ELSE 0 END)::BIGINT AS t_rel,
               sum(CASE WHEN rel THEN 0 ELSE 1 END)::BIGINT AS t_irr,
               count(DISTINCT term)::BIGINT AS v
        FROM toks
    )
    SELECT p.term, p.c_rel, p.c_irr, p.df_rel, p.df_irr,
           ((p.c_rel + 1) * (t.t_irr + t.v))::BIGINT AS lift_num,
           ((p.c_irr + 1) * (t.t_rel + t.v))::BIGINT AS lift_den
    FROM per_term p CROSS JOIN tot t
    """,
)
def q_nb_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens("text").alias("toks"),
    ).withColumn("rel", F.array_contains("toks", TOPIC_TOKEN))
    toks = d.select("doc_id", "rel", F.explode("toks").alias("term"))
    per_term = toks.groupBy("term").agg(
        F.sum(F.when(F.col("rel"), 1).otherwise(0)).alias("c_rel"),
        F.sum(F.when(F.col("rel"), 0).otherwise(1)).alias("c_irr"),
        F.count_distinct(F.when(F.col("rel"), F.col("doc_id"))).alias("df_rel"),
        F.count_distinct(
            F.when(~F.col("rel"), F.col("doc_id"))).alias("df_irr"),
    )
    tot = toks.agg(
        F.sum(F.when(F.col("rel"), 1).otherwise(0)).alias("t_rel"),
        F.sum(F.when(F.col("rel"), 0).otherwise(1)).alias("t_irr"),
        F.count_distinct("term").alias("v"),
    )
    return per_term.join(F.broadcast(tot)).select(
        "term", "c_rel", "c_irr", "df_rel", "df_irr",
        ((F.col("c_rel") + 1) * (F.col("t_irr") + F.col("v"))).alias("lift_num"),
        ((F.col("c_irr") + 1) * (F.col("t_rel") + F.col("v"))).alias("lift_den"),
    )
