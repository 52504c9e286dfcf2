"""Chunking operators C1-C8 (reference text_chunking.py semantics).

Each chunker has a pure-Python single-doc function implementing the
reference's exact loop semantics (cited per function), wrapped into an
Arrow-batched ``pandas_udf`` returning ``array<string>`` that is then
``posexplode``d — vectorized across rows (one Python call per Arrow
batch, never per row). C4 (regex) and C5 (sliding) are additionally
available as pure column expressions (see queries/dataops.py) since
their semantics are loop-free.

Sandbox note: NLTK is unavailable, so the sentence splitter is the
reference's documented fallback ``re.split(r'\\.(?=\\s)', text)``
(text_chunking.py:173) — implemented as replace-then-split so the
DuckDB oracle (RE2: no lookahead) produces identical output.

At 100 TB scale these UDFs are the right shape: chunking is
embarrassingly parallel per document, Arrow transfer is columnar, and
the explode keeps lineage narrow (no shuffle until a downstream agg).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SENT_SEP = "\x01"


# --------------------------------------------------------------------------- #
# pure-Python single-doc implementations (reference-exact)
# --------------------------------------------------------------------------- #
def fixed_chunks(text: str, chunk_size: int = 4000, chunk_overlap: int = 200) -> list[str]:
    """C1 — FixedSizeChunker.chunk_text (text_chunking.py:79-132):
    char windows with space-backtrack on the END index, next start =
    end - overlap, stop when start <= 0 or start >= len.

    DELIBERATE DEVIATIONS (documented reference quirks — the reference
    loop does not terminate on many inputs):
    1. tail: once a chunk reaches the text end with overlap > 0, the
       reference's ``start = end - overlap`` never passes its break
       (text_chunking.py:126-130) and re-appends the tail forever.
       We stop after emitting the chunk that reaches the end.
    2. no-progress: a space-backtracked ``end`` can land within
       ``overlap`` of ``start`` (e.g. text 'bb baa bab', size 6,
       overlap 3), making ``start`` stall or move backwards — the
       reference cycles forever. We stop when the next start fails to
       advance. On any input where the reference terminates AND makes
       forward progress every step, output is identical.
    """
    if not text:
        return []
    if chunk_overlap >= chunk_size:
        chunk_overlap = chunk_size // 2
    chunks: list[str] = []
    start, n = 0, len(text)
    while start < n:
        end = start + chunk_size
        if end < n:
            while end > start and not text[end].isspace():
                end -= 1
            if end <= start:
                end = start + chunk_size
        else:
            end = n
        chunks.append(text[start:end])
        if end >= n:  # deviation 1: terminate at text end
            break
        new_start = end - chunk_overlap
        if new_start <= start:  # deviation 2: no-progress guard
            break
        start = new_start
        if start >= n:
            break
    return chunks


def split_sentences(text: str) -> list[str]:
    """Reference fallback sentence split (text_chunking.py:173):
    ``re.split(r'\\.(?=\\s)', text)`` — the '.' is consumed, the
    following whitespace is kept on the next sentence."""
    return re.split(r"\.(?=\s)", text)


def sentence_chunks(text: str, max_chunk_size: int = 4000, min_chunk_size: int = 100) -> list[str]:
    """C2 — SentenceChunker.chunk_text (text_chunking.py:175-221):
    greedy packing; flush when len(cur)+len(s) > max AND len(cur) >= min;
    join with a single space."""
    if not text:
        return []
    sentences = split_sentences(text)
    if not sentences:
        return [text]
    chunks: list[str] = []
    cur = ""
    for s in sentences:
        if len(cur) + len(s) > max_chunk_size and len(cur) >= min_chunk_size:
            chunks.append(cur)
            cur = s
        else:
            cur = cur + " " + s if cur else s
    if cur:
        chunks.append(cur)
    return chunks


_MD_HEADER_RX = re.compile(r"^#{1,6}\s+.+$", re.MULTILINE)
_HTML_HEADER_RX = re.compile(r"<h[1-6][^>]*>.*?</h[1-6]>", re.DOTALL | re.IGNORECASE)
_TITLE_COLON_RX = re.compile(r"^[A-Z][^.!?]+:$", re.MULTILINE)
_BLANK_RX = re.compile(r"\n\s*\n")


def semantic_chunks(text: str, max_chunk_size: int = 4000, min_chunk_size: int = 100) -> list[str]:
    """C3 — SemanticChunker.chunk_text (text_chunking.py:266-321):
    boundaries = md/HTML headers, Title: lines, blank lines; sections
    between sorted unique boundary starts; oversize sections re-chunked
    by C2; no boundaries → C2 of the whole text."""
    if not text:
        return []
    boundaries = sorted(
        {m.start() for rx in (_MD_HEADER_RX, _HTML_HEADER_RX, _TITLE_COLON_RX, _BLANK_RX) for m in rx.finditer(text)}
    )
    if not boundaries:
        return sentence_chunks(text, max_chunk_size, min_chunk_size)
    if 0 not in boundaries:
        boundaries.insert(0, 0)
    if len(text) not in boundaries:
        boundaries.append(len(text))
    out: list[str] = []
    for a, b in zip(boundaries, boundaries[1:]):
        if b <= a:
            continue
        section = text[a:b]
        if len(section) <= max_chunk_size:
            out.append(section)
        else:
            out.extend(sentence_chunks(section, max_chunk_size, min_chunk_size))
    return out


def regex_chunks(text: str, patterns: list[str] | None = None) -> list[str]:
    """C4 — RegexChunking.chunk_text (text_chunking.py:411-441):
    sequential split by each pattern, strip, drop empties."""
    if not text:
        return []
    chunks = [text]
    for pattern in patterns or [r"\n\n"]:
        chunks = [p.strip() for c in chunks for p in re.split(pattern, c) if p.strip()]
    return chunks


def sliding_chunks(text: str, window_size: int = 100, step: int = 50) -> list[str]:
    """C5 — SlidingWindowChunking.chunk_text (text_chunking.py:458-497):
    word windows at i = 0, step, ... while i <= len - window; the tail
    past the last full window is dropped; <= window words → [text]."""
    if not text:
        return []
    words = text.split()
    if len(words) <= window_size:
        return [text]
    return [
        " ".join(words[i : i + window_size])
        for i in range(0, len(words) - window_size + 1, step)
    ]


def overlapping_chunks(text: str, window_size: int = 500, overlap: int = 50) -> list[str]:
    """C6 — OverlappingWindowChunking.chunk_text (text_chunking.py:514-563):
    step = window - min(overlap, window-1); a final chunk shorter than
    half the window merges into (replaces) the previous chunk, extended
    to the text end."""
    if not text:
        return []
    overlap = min(overlap, window_size - 1)
    step = window_size - overlap
    words = text.split()
    if len(words) <= window_size:
        return [text]
    chunks: list[str] = []
    for i in range(0, len(words), step):
        chunk_words = words[i : i + window_size]
        if len(chunk_words) < window_size * 0.5 and chunks:
            chunks[-1] = " ".join(words[i - step : i + len(chunk_words)])
            break
        chunks.append(" ".join(chunk_words))
    return chunks


CHUNKERS = {
    "fixed": fixed_chunks,
    "sentence": sentence_chunks,
    "semantic": semantic_chunks,
    "regex": regex_chunks,
    "sliding_window": sliding_chunks,
    "sliding": sliding_chunks,
    "overlapping_window": overlapping_chunks,
    "overlapping": overlapping_chunks,
}


def get_chunker(chunker_type: str = "semantic"):
    """C7 — dispatch (text_chunking.py:566-592): unknown type falls back
    to the semantic chunker (reference logs a warning)."""
    return CHUNKERS.get(chunker_type.lower(), semantic_chunks)


# --------------------------------------------------------------------------- #
# Spark operator: df → (id, chunk_id, chunk) via Arrow-batched pandas UDF
# --------------------------------------------------------------------------- #
def chunk_array_udf(chunker_type: str, **params) -> Column:
    """Returns a pandas_udf Column factory: text column → array<string>."""
    fn = get_chunker(chunker_type)

    @pandas_udf("array<string>")
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: fn(t or "", **params))

    return _chunk


def chunk_documents(
    df: DataFrame,
    chunker_type: str = "semantic",
    id_col: str = "doc_id",
    text_col: str = "text",
    **params,
) -> DataFrame:
    """C8 — chunk application (crawl_agent.py:889-937 wires per-strategy
    params; min_chunk_size = chunk_size // 10 there). Produces the
    ``chunks(doc_id, chunk_id, chunk)`` table."""
    udf = chunk_array_udf(chunker_type, **params)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(udf(F.col(text_col))).alias("chunk_id", "chunk"),
    )
