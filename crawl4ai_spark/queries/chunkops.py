"""Chunker queries: the stateful-loop chunkers run as Arrow-batched
pandas UDFs on the Spark side, checked against closed-form / recursive
DuckDB oracles.

* ``chunk_fixed`` (C1): UDF loop vs a recursive CTE reproducing the
  space-backtrack + overlap recurrence exactly.
* ``chunk_overlapping`` (C6): UDF loop vs a closed-form grid with the
  tail-merge rule expressed as CASE logic.
* ``chunk_sentence`` / ``chunk_semantic`` (C2/C3): genuinely stateful
  greedy packing — registered without oracle SQL (driver rows-only
  check); their exact semantics are pinned by unit tests against
  hand-computed goldens instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents
from .registry import query, table as _t

FIXED_SIZE, FIXED_OVERLAP = 64, 16
OW_WIN, OW_OVERLAP = 24, 6
OW_STEP = OW_WIN - OW_OVERLAP
OW_HALF = OW_WIN // 2  # window*0.5 with integer window


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )


# --------------------------------------------------------------------------- #
# C1: fixed-size chunker — recursive-CTE oracle
# --------------------------------------------------------------------------- #
# end(start): end0 = start + SIZE; if end0 < n, backtrack to the last
# space among 0-based positions start+1..start+SIZE (none → end0); else n.
# Corpus texts contain only ' ' whitespace, so the space test is exact.
_END_EXPR = f"""
    (CASE WHEN s.start + {FIXED_SIZE} >= d.n THEN d.n
          ELSE (CASE WHEN strpos(reverse(substring(d.text, s.start + 2, {FIXED_SIZE})), ' ') = 0
                     THEN s.start + {FIXED_SIZE}
                     ELSE s.start + {FIXED_SIZE} + 1
                          - strpos(reverse(substring(d.text, s.start + 2, {FIXED_SIZE})), ' ')
                END)
     END)
"""


@query(
    "chunk_fixed",
    f"""
    WITH RECURSIVE doc AS (
        SELECT doc_id::BIGINT AS doc_id, text, length(text) AS n FROM documents
    ),
    state(doc_id, idx, start, fin) AS (
        SELECT d.doc_id, 0, 0, {_END_EXPR.replace('s.start', '0')}
        FROM doc d, (SELECT 0 AS start) s WHERE d.n > 0
        UNION ALL
        SELECT s.doc_id, s.idx + 1, s.fin - {FIXED_OVERLAP}, {_END_EXPR.replace('s.start', f'(s.fin - {FIXED_OVERLAP})')}
        FROM state s JOIN doc d USING (doc_id)
        WHERE s.fin < d.n AND s.fin - {FIXED_OVERLAP} > 0
    )
    SELECT s.doc_id, s.idx::INT AS chunk_id,
           substring(d.text, s.start + 1, s.fin - s.start) AS chunk
    FROM state s JOIN doc d USING (doc_id)
    """,
)
def q_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        _docs(spark, sf_dir), "fixed",
        chunk_size=FIXED_SIZE, chunk_overlap=FIXED_OVERLAP,
    ).withColumn("chunk_id", F.col("chunk_id").cast("int"))


# --------------------------------------------------------------------------- #
# C6: overlapping-window chunker — closed-form grid oracle
# --------------------------------------------------------------------------- #
# Grid i = 0, STEP, 2*STEP, ... (i < n words). The first grid point with
# n - i < WIN/2 triggers the tail merge: the PREVIOUS row's chunk extends
# to the text end and iteration stops. istop = smallest positive grid
# point with n - istop < HALF; merge happens iff istop < n.
@query(
    "chunk_overlapping",
    f"""
    WITH toks AS (
        SELECT doc_id::BIGINT AS doc_id, text,
               list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS t
        FROM documents
    ),
    meta AS (
        SELECT doc_id, text, t, len(t) AS n,
               {OW_STEP} * (floor((len(t) - {OW_HALF}) / {OW_STEP})::BIGINT + 1) AS istop
        FROM toks
    ),
    sel AS (
        SELECT doc_id,
               CASE WHEN n <= {OW_WIN} THEN [text]
                    ELSE list_transform(
                        generate_series(0, (CASE WHEN istop < n THEN istop - {OW_STEP}
                                                 ELSE {OW_STEP} * floor((n - 1) / {OW_STEP})::BIGINT END) // {OW_STEP}),
                        k -> (CASE WHEN istop < n AND k * {OW_STEP} = istop - {OW_STEP}
                                   THEN array_to_string(list_slice(t, k * {OW_STEP} + 1, n), ' ')
                                   ELSE array_to_string(list_slice(t, k * {OW_STEP} + 1, k * {OW_STEP} + {OW_WIN}), ' ')
                              END))
               END AS chunks
        FROM meta
    )
    SELECT doc_id, (u.i - 1)::INT AS chunk_id, chunks[u.i] AS chunk
    FROM sel, unnest(generate_series(1, len(chunks))) AS u(i)
    """,
)
def q_chunk_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        _docs(spark, sf_dir), "overlapping",
        window_size=OW_WIN, overlap=OW_OVERLAP,
    ).withColumn("chunk_id", F.col("chunk_id").cast("int"))


# --------------------------------------------------------------------------- #
# C2/C3: greedy sentence packing + semantic boundaries — rows-only checks
# (stateful fold; exact semantics pinned by tests/test_chunking.py)
# --------------------------------------------------------------------------- #
def _sentenceish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject deterministic sentence/paragraph boundaries into the word
    soup: '.' after every 5th token, blank line after every 11th."""
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split("text", "\\s+"), lambda w: w != "")
    with_seps = F.array_join(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.size(toks)),
            lambda w, i: F.concat(
                w,
                F.when(F.pmod(i, F.lit(11)) == 0, F.lit(".\n\n"))
                .when(F.pmod(i, F.lit(5)) == 0, F.lit("."))
                .otherwise(F.lit("")),
            ),
        ),
        " ",
    )
    return d.select("doc_id", with_seps.alias("text"))


@query("chunk_sentence")
def q_chunk_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        _sentenceish(spark, sf_dir), "sentence",
        max_chunk_size=120, min_chunk_size=40,
    ).withColumn("chunk_id", F.col("chunk_id").cast("int"))


@query("chunk_semantic")
def q_chunk_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        _sentenceish(spark, sf_dir), "semantic",
        max_chunk_size=160, min_chunk_size=40,
    ).withColumn("chunk_id", F.col("chunk_id").cast("int"))
