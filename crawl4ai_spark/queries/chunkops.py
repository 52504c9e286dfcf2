"""Chunker queries: the stateful-loop chunkers run as Arrow-batched
pandas UDFs on the Spark side, checked against closed-form / recursive
DuckDB oracles.

* ``chunk_fixed`` (C1): UDF loop vs a recursive CTE reproducing the
  space-backtrack + overlap recurrence exactly.
* ``chunk_overlapping`` (C6): UDF loop vs a closed-form grid with the
  tail-merge rule expressed as CASE logic.
* ``chunk_sentence`` (C2): the greedy packing recurrence as a recursive
  CTE carrying (i, cur) state — a flush emits the previous ``cur``; the
  final non-empty ``cur`` is the last chunk.
* ``chunk_semantic`` (C3): blank-line boundary starts computed from the
  split-parts/match-lengths cumulative sums, sections between bounds,
  oversize sections re-packed by the C2 CTE keyed (doc_id, sec_idx).
  The md/HTML-header and Title-colon boundary regexes of the engine
  (operators/chunking.py:111-114) cannot match this corpus — its
  charset is lowercase letters, space, newline and '.' only (no '#',
  '<', ':', uppercase), so blank lines are provably the complete
  boundary set here; the full 4-regex semantics are pinned by
  tests/test_chunking.py goldens.
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
        -- the last conjunct is the engine's no-progress guard (fixed_chunks
        -- deviation 2): stop when the next start fails to advance past the
        -- current one (space-backtracked end landed within overlap of start)
        WHERE s.fin < d.n AND s.fin - {FIXED_OVERLAP} > 0
          AND s.fin - {FIXED_OVERLAP} > s.start
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
# C2/C3: greedy sentence packing + semantic boundaries — recursive-CTE oracles
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


SENT_MAX, SENT_MIN = 120, 40
SEM_MAX, SEM_MIN = 64, 20  # max < longest section so the C3 oversize path fires

# the sentenceish corpus in DuckDB (twin of _sentenceish above)
_SENTENCEISH_SQL = r"""
toks AS (
    SELECT doc_id::BIGINT AS doc_id,
           list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS t
    FROM documents
),
sent AS (
    SELECT doc_id, array_to_string(list_transform(generate_series(1, len(t)),
        i -> t[i] || (CASE WHEN i % 11 = 0 THEN '.' || chr(10) || chr(10)
                           WHEN i % 5 = 0 THEN '.' ELSE '' END)), ' ') AS text
    FROM toks
)"""


def _split_sents_sql(text_expr: str) -> str:
    r"""Sentence split: ``re.split(r'\.(?=\s)', text)`` — RE2 has no
    lookahead, so replace '.<ws>' with chr(1)+'<ws>' then split."""
    return (
        f"string_split(regexp_replace({text_expr}, "
        f"'\\.(\\s)', chr(1) || '\\1', 'g'), chr(1))"
    )


def _pack_cte_sql(keys: str, maxc: int, minc: int) -> str:
    """Greedy sentence-packing recurrence (SentenceChunker, reference
    text_chunking.py:175-221) as a recursive CTE over ``prep(<keys>,
    sents)``: state = (i, cur); a flush (len(cur)+len(next) > max AND
    len(cur) >= min) emits cur and restarts from the next sentence; the
    final non-empty cur is the last chunk. Yields ``emits(<keys>, pos,
    chunk)`` with pos preserving emission order. Initial state cur =
    sents[1] is the engine loop's first iteration (cur='' never flushes
    for min > 0)."""
    return f"""
st({keys}, i, cur, flushed) AS (
    SELECT {keys}, 1, sents[1], NULL::VARCHAR FROM prep WHERE len(sents) >= 1
    UNION ALL
    SELECT {', '.join('s.' + k for k in keys.split(', '))}, s.i + 1,
        CASE WHEN length(s.cur) + length(p.sents[s.i + 1]) > {maxc} AND length(s.cur) >= {minc}
             THEN p.sents[s.i + 1]
             WHEN s.cur = '' THEN p.sents[s.i + 1]
             ELSE s.cur || ' ' || p.sents[s.i + 1] END,
        CASE WHEN length(s.cur) + length(p.sents[s.i + 1]) > {maxc} AND length(s.cur) >= {minc}
             THEN s.cur ELSE NULL END
    FROM st s JOIN prep p USING ({keys})
    WHERE s.i < len(p.sents)
),
packed AS (
    SELECT {keys}, i AS pos, flushed AS chunk FROM st WHERE flushed IS NOT NULL
    UNION ALL
    SELECT {', '.join('s.' + k for k in keys.split(', '))}, s.i + 1, s.cur
    FROM st s JOIN prep p USING ({keys})
    WHERE s.i = len(p.sents) AND s.cur <> ''
)"""


@query(
    "chunk_sentence",
    f"""
    WITH RECURSIVE {_SENTENCEISH_SQL},
    prep AS (
        SELECT doc_id, {_split_sents_sql('text')} AS sents FROM sent
    ),
    {_pack_cte_sql('doc_id', SENT_MAX, SENT_MIN)}
    SELECT doc_id,
           (row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1)::INT AS chunk_id,
           chunk
    FROM packed
    """,
)
def q_chunk_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        _sentenceish(spark, sf_dir), "sentence",
        max_chunk_size=SENT_MAX, min_chunk_size=SENT_MIN,
    ).withColumn("chunk_id", F.col("chunk_id").cast("int"))


@query(
    "chunk_semantic",
    f"""
    WITH RECURSIVE {_SENTENCEISH_SQL},
    -- blank-line boundary starts: split parts + matched separators give
    -- each match's offset as a cumulative length sum (finditer twin)
    bdoc AS (
        SELECT doc_id, text,
               string_split_regex(text, '\\n\\s*\\n') AS parts,
               regexp_extract_all(text, '\\n\\s*\\n') AS ms
        FROM sent
    ),
    bnd AS (
        SELECT doc_id, text,
               list_sort(list_distinct(list_concat(list_concat(
                 [0::BIGINT],
                 list_transform(generate_series(1, len(ms)),
                   i -> (list_sum(list_transform(generate_series(1, i), j -> length(parts[j])))
                      + coalesce(list_sum(list_transform(generate_series(1, i - 1), j -> length(ms[j]))), 0))::BIGINT)),
                 [length(text)::BIGINT]))) AS bounds
        FROM bdoc WHERE len(ms) > 0
    ),
    units AS (
        -- sections between consecutive bounds; oversize ones re-packed
        SELECT doc_id, k.k::INT AS sec_idx,
               substring(text, (bounds[k.k + 1] + 1)::INT, (bounds[k.k + 2] - bounds[k.k + 1])::INT) AS utext,
               (bounds[k.k + 2] - bounds[k.k + 1]) > {SEM_MAX} AS needs_pack
        FROM bnd, unnest(generate_series(0, len(bounds) - 2)) AS k(k)
        WHERE bounds[k.k + 2] > bounds[k.k + 1]
        UNION ALL
        -- no boundaries at all: the whole text is sentence-packed
        SELECT doc_id, 0, text, TRUE FROM bdoc WHERE len(ms) = 0
    ),
    prep AS (
        SELECT doc_id, sec_idx, {_split_sents_sql('utext')} AS sents
        FROM units WHERE needs_pack
    ),
    {_pack_cte_sql('doc_id, sec_idx', SEM_MAX, SEM_MIN)},
    emits AS (
        SELECT doc_id, sec_idx, pos, chunk FROM packed
        UNION ALL
        SELECT doc_id, sec_idx, 0, utext FROM units WHERE NOT needs_pack
    )
    SELECT doc_id,
           (row_number() OVER (PARTITION BY doc_id ORDER BY sec_idx, pos) - 1)::INT AS chunk_id,
           chunk
    FROM emits
    """,
)
def q_chunk_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        _sentenceish(spark, sf_dir), "semantic",
        max_chunk_size=SEM_MAX, min_chunk_size=SEM_MIN,
    ).withColumn("chunk_id", F.col("chunk_id").cast("int"))
