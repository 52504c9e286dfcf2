"""BPE trainer vs the pure-Python reference algorithm (Sennrich ACL'16).

The distributed trainer (operators/bpe.py) must learn the exact same
merge list, in the same order, as the classic single-process algorithm
with the same deterministic tie-break (count DESC, left ASC, right
ASC) — and encode unseen words to the same symbol sequences.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from crawl4ai_spark.operators.bpe import (
    apply_bpe,
    encode_corpus,
    train_bpe,
    word_freqs,
)


# --------------------------------------------------------------------------- #
# pure-Python reference (Sennrich et al. 2016, Algorithm 1)
# --------------------------------------------------------------------------- #
def _ref_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pairs: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] = pairs.get(p, 0) + freq
    return pairs


def _ref_merge(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    out: dict[tuple[str, ...], int] = {}
    for syms, freq in vocab.items():
        merged: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + freq
    return out


def ref_train(
    words: dict[str, int], n_merges: int, min_count: int = 2
) -> tuple[list[tuple[str, str]], dict[str, tuple[str, ...]]]:
    vocab = {tuple(w): f for w, f in words.items()}
    word_of = {tuple(w): [w] for w in words}
    # track word -> current symbols via parallel encode at the end
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _ref_stats(vocab)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_count:
            break
        merges.append(best[0])
        vocab = _ref_merge(vocab, best[0])
    return merges, {w: ref_encode(w, merges) for w in words}


def ref_encode(word: str, merges: list[tuple[str, str]]) -> tuple[str, ...]:
    syms = list(word)
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return tuple(syms)


def _spark_words(spark, words: dict[str, int]):
    return spark.createDataFrame(
        [(w, f) for w, f in words.items()], "word string, freq long"
    ).repartition(4, "word")


# --------------------------------------------------------------------------- #
# fixed corpora
# --------------------------------------------------------------------------- #
CORPUS = {
    "low": 5, "lower": 2, "lowest": 6, "newer": 6, "new": 2,
    "wider": 3, "widest": 4, "slow": 7, "slower": 4, "glow": 1,
}


def test_train_matches_reference(spark):
    merges, out = train_bpe(_spark_words(spark, CORPUS), n_merges=12)
    ref_merges, ref_words = ref_train(CORPUS, n_merges=12)
    assert merges == ref_merges
    got = {r["word"]: tuple(r["syms"]) for r in out.collect()}
    assert got == ref_words


def test_train_early_stop_min_count(spark):
    words = {"ab": 1, "cd": 1}  # every pair count 1 < min_count 2
    merges, out = train_bpe(_spark_words(spark, words), n_merges=5, min_count=2)
    assert merges == []
    got = {r["word"]: tuple(r["syms"]) for r in out.collect()}
    assert got == {"ab": ("a", "b"), "cd": ("c", "d")}


def test_repeated_symbol_merge_semantics(spark):
    # "aaaa" + merge (a,a): left-to-right non-overlapping -> aa aa;
    # "aaa" -> aa a. The lookaround regexp must match the reference.
    words = {"aaaa": 3, "aaa": 2}
    merges, out = train_bpe(_spark_words(spark, words), n_merges=1)
    ref_merges, ref_words = ref_train(words, n_merges=1)
    assert merges == ref_merges == [("a", "a")]
    got = {r["word"]: tuple(r["syms"]) for r in out.collect()}
    assert got == ref_words
    assert got["aaaa"] == ("aa", "aa")
    assert got["aaa"] == ("aa", "a")


def test_apply_bpe_unseen_words(spark):
    merges, _ = ref_train(CORPUS, n_merges=8), None
    merges = merges[0]
    unseen = {"slowest": 1, "newest": 1, "w": 1, "lowly": 1}
    out = apply_bpe(_spark_words(spark, unseen), merges)
    got = {r["word"]: tuple(r["syms"]) for r in out.collect()}
    assert got == {w: ref_encode(w, merges) for w in unseen}


def test_word_freqs_from_docs(spark):
    docs = spark.createDataFrame(
        [("a b  a", ), ("b\tc", )], "text string"
    )
    got = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


@settings(max_examples=15, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=6),
)
def test_property_train_matches_reference(spark, words, n_merges):
    merges, out = train_bpe(_spark_words(spark, words), n_merges=n_merges)
    ref_merges, ref_words = ref_train(words, n_merges=n_merges)
    assert merges == ref_merges
    got = {r["word"]: tuple(r["syms"]) for r in out.collect()}
    assert got == ref_words


def test_vocab_coverage_oov_accounting(spark):
    """vocab_coverage vs a pure-Python recompute: the top-K vocab is
    frequency-then-lexicographic deterministic and per-doc OOV counts
    match exactly (the sizing loop a tokenizer trainer runs)."""
    from collections import Counter

    from crawl4ai_spark.queries.indexops import VOCAB_K, q_vocab_coverage

    sf = "/root/testdata/sf0.001"
    docs = {r.doc_id: (r.text or "").split()
            for r in spark.read.parquet(f"{sf}/documents.parquet").collect()}
    freq = Counter(w for ws in docs.values() for w in ws)
    vocab = {w for w, _ in sorted(freq.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]}
    rows = {r.doc_id: r for r in q_vocab_coverage(spark, sf).collect()}
    assert set(rows) == set(docs)
    for i, ws in docs.items():
        r = rows[i]
        assert r.n_tokens == len(ws)
        assert r.n_oov == sum(1 for w in ws if w not in vocab)
        assert 0.0 <= r.oov_rate <= 1.0


def test_encode_corpus_matches_reference_in_order(spark):
    """Corpus encoding via the distinct-word join: every document's
    token sequence equals the pure-Python per-word encode flattened in
    word order, across repeated words, multi-space gaps, and docs
    sharing words (the join fan-out must not reorder or drop)."""
    merges, _ = ref_train(CORPUS, 8)
    docs = [
        (0, "low lower lowest"),
        (1, "slow  slow glow"),          # repeated word + double space
        (2, "newer widest low slow"),
        (3, "glow"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_tokens, list(r.tokens))
           for r in encode_corpus(df, merges).collect()}
    for i, text in docs:
        words = text.split()
        want = [s for w in words for s in ref_encode(w, merges)]
        assert got[i] == (len(words), len(want), want), i
