"""Chunker unit tests (SURVEY §2.5 C1-C8) — hand-computed goldens for
the reference's exact loop semantics plus UDF/pure-Python agreement."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl4ai_spark.operators.chunking import (
    fixed_chunks,
    get_chunker,
    overlapping_chunks,
    regex_chunks,
    semantic_chunks,
    sentence_chunks,
    sliding_chunks,
    split_sentences,
)


# ---------------------------------------------------------------- C1 fixed
class TestFixedChunks:
    def test_empty(self):
        assert fixed_chunks("") == []

    def test_short_text_single_chunk(self):
        assert fixed_chunks("hello world", 100, 10) == ["hello world"]

    def test_space_backtrack(self):
        # size 10: end=10 lands on 'w' of "world" -> backtracks to space at 8
        text = "abc defg world tail"
        out = fixed_chunks(text, 10, 2)
        assert out[0] == "abc defg"  # text[0:8], text[8]==' '
        # next start = 8-2 = 6
        assert out[1] == text[6:][: len(out[1])]

    def test_no_space_cuts_mid_word(self):
        text = "a" * 25
        out = fixed_chunks(text, 10, 2)
        assert out[0] == "a" * 10  # backtrack exhausts -> cut at size

    def test_overlap_clamped_to_half(self):
        # overlap >= size -> size // 2 (text_chunking.py:98-99)
        out = fixed_chunks("ab cd ef gh ij kl mn op", 8, 8)
        out2 = fixed_chunks("ab cd ef gh ij kl mn op", 8, 4)
        assert out == out2

    def test_terminates_on_tail(self):
        # documented deviation: the reference loops forever here
        out = fixed_chunks("word " * 100, 64, 16)
        assert out[-1].endswith("word") or out[-1].endswith("word ")
        assert len(out) < 50

    def test_overlap_progression(self):
        text = "aa bb cc dd ee ff gg hh"
        out = fixed_chunks(text, 6, 2)
        # start=0: end=6 -> text[6]=' '? "aa bb " -> index 5 is ' ', 6 is 'c'
        # backtrack 6->5 (' ' at 5): chunk text[0:5]="aa bb", start=3
        assert out[0] == "aa bb"
        assert out[1] == text[3:8]  # "bb cc"


# ---------------------------------------------------------------- C2 sentence
class TestSentenceChunks:
    def test_split_fallback_semantics(self):
        # re.split(r'\.(?=\s)', ...): '.' consumed only when followed by ws
        assert split_sentences("a. b. c") == ["a", " b", " c"]
        assert split_sentences("a.b") == ["a.b"]

    def test_greedy_packing(self):
        # max=10, min=3: "abcd" + " " + "efgh" = 9 chars fits; adding "ijkl"
        # would exceed -> flush
        text = "abcd. efgh. ijkl"
        out = sentence_chunks(text, max_chunk_size=10, min_chunk_size=3)
        assert out == ["abcd  efgh", " ijkl"]

    def test_min_chunk_blocks_flush(self):
        # cur shorter than min never flushes even over max
        out = sentence_chunks("ab. cdefghijklmnop", max_chunk_size=5, min_chunk_size=10)
        assert out == ["ab  cdefghijklmnop"]

    def test_empty(self):
        assert sentence_chunks("") == []


# ---------------------------------------------------------------- C3 semantic
class TestSemanticChunks:
    def test_header_boundaries(self):
        text = "# Title\nbody one\n\nsecond para"
        out = semantic_chunks(text, max_chunk_size=1000, min_chunk_size=1)
        # boundaries: md header at 0, blank line match at \n\n
        assert "".join(out) == text

    def test_no_boundaries_falls_back_to_sentences(self):
        text = "plain words only here"
        assert semantic_chunks(text, 1000, 1) == sentence_chunks(text, 1000, 1)

    def test_sections_cover_text(self):
        text = "Intro:\nalpha beta\n\n## Sec\ngamma delta"
        out = semantic_chunks(text, 1000, 1)
        assert "".join(out) == text


# ---------------------------------------------------------------- C4 regex
class TestRegexChunks:
    def test_default_paragraphs(self):
        assert regex_chunks("a\n\nb\n\n\n\nc") == ["a", "b", "c"]

    def test_sequential_patterns(self):
        assert regex_chunks("a|b;c|d", patterns=[r"\|", ";"]) == ["a", "b", "c", "d"]

    def test_empty_parts_dropped(self):
        assert regex_chunks("  x  \n\n   \n\n y", None) == ["x", "y"]


# ---------------------------------------------------------------- C5 sliding
class TestSlidingChunks:
    def test_small_returns_original_text(self):
        assert sliding_chunks("a  b", 10, 5) == ["a  b"]  # original, not rejoined

    def test_windows_and_dropped_tail(self):
        words = [str(i) for i in range(12)]
        out = sliding_chunks(" ".join(words), window_size=5, step=4)
        # starts at 0 and 4 (8 > 12-5=7 excluded): tail words 9..11 dropped
        assert out == [" ".join(words[0:5]), " ".join(words[4:9])]

    def test_exact_fit(self):
        words = [str(i) for i in range(9)]
        out = sliding_chunks(" ".join(words), 5, 4)
        assert out == [" ".join(words[0:5]), " ".join(words[4:9])]


# ------------------------------------------------------------- C6 overlapping
class TestOverlappingChunks:
    def test_small_returns_text(self):
        assert overlapping_chunks("a b c", 10, 2) == ["a b c"]

    def test_tail_merge(self):
        # window=6, overlap=2 -> step=4; 13 words: i=0(6),4(6),8(5>=3 keep),
        # 12(len 1 < 3 -> merge into prev extended to end)
        words = [f"w{i}" for i in range(13)]
        out = overlapping_chunks(" ".join(words), 6, 2)
        assert out[0] == " ".join(words[0:6])
        assert out[1] == " ".join(words[4:10])
        assert out[2] == " ".join(words[8:13])  # extended through end
        assert len(out) == 3

    def test_no_merge_when_tail_big_enough(self):
        words = [f"w{i}" for i in range(11)]  # i=0(6),4(6),8(3 >= 3 keep)
        out = overlapping_chunks(" ".join(words), 6, 2)
        assert out == [" ".join(words[0:6]), " ".join(words[4:10]), " ".join(words[8:11])]

    def test_overlap_clamp(self):
        assert overlapping_chunks("a b c d e f", 2, 5) == overlapping_chunks("a b c d e f", 2, 1)


# ---------------------------------------------------------------- dispatch
def test_dispatch_unknown_falls_back_to_semantic():
    assert get_chunker("nope") is get_chunker("semantic")
    assert get_chunker("FIXED") is fixed_chunks


# ----------------------------------------------------- property: termination
@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet=" abcdefg.\n#", max_size=300),
    st.integers(2, 40),
    st.integers(0, 50),
)
def test_fixed_chunks_terminate_and_cover_prefix(text, size, overlap):
    out = fixed_chunks(text, size, overlap)
    if text:
        assert out and out[0] == text[: len(out[0])]
    else:
        assert out == []


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=80), st.integers(2, 20), st.integers(0, 25))
def test_overlapping_chunks_cover_all_words(words, win, ov):
    text = " ".join(words)
    out = overlapping_chunks(text, win, ov)
    if not words:
        assert out in ([], [""]) or out == [text]
        return
    joined = " ".join(out).split()
    assert set(joined) == set(words)
    assert out[-1].split()[-1] == words[-1]  # last word always reachable


# ------------------------------------------------- Spark UDF == pure Python
@pytest.mark.parametrize("kind,params", [
    ("fixed", {"chunk_size": 32, "chunk_overlap": 8}),
    ("sentence", {"max_chunk_size": 60, "min_chunk_size": 20}),
    ("semantic", {"max_chunk_size": 80, "min_chunk_size": 20}),
    ("sliding", {"window_size": 6, "step": 3}),
    ("overlapping", {"window_size": 8, "overlap": 3}),
])
def test_chunk_documents_matches_pure_python(spark, kind, params):
    from crawl4ai_spark.operators.chunking import chunk_documents

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3,
        "one. two. three. four. five. six seven eight nine ten",
        "# Head\npara one\n\npara two more words here\n\nIntro:\nfinal",
        "",
        "single",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk"]
        for r in chunk_documents(df, kind, **params).collect()
    }
    fn = get_chunker(kind)
    want = {
        (i, j): c
        for i, t in enumerate(texts)
        for j, c in enumerate(fn(t, **params))
    }
    assert got == want
