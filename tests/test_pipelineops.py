"""Semantic invariants for the corpus-curation tier (queries/pipelineops.py).

The DuckDB oracles prove cross-engine equality; these tests pin the
*meaning*: CC equals a union-find ground truth, line dedup kills verbatim
copies, decontamination flags the planted eval leaks, sampling is a pure
deterministic filter.
"""

from __future__ import annotations

import pytest

from crawl4ai_spark.queries import pipelineops as P
from crawl4ai_spark.queries.dataops import q_dedup_minhash_lsh

SF = "/root/testdata/sf0.001"


def test_cc_matches_union_find(spark):
    pairs = [
        (r.a_id, r.b_id)
        for r in q_dedup_minhash_lsh(spark, SF).select("a_id", "b_id").collect()
    ]
    assert pairs, "minhash corpus must produce near-dup edges"
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth_comp = {x: find(x) for x in parent}
    truth_sizes: dict[int, int] = {}
    for x, c in truth_comp.items():
        truth_sizes[c] = truth_sizes.get(c, 0) + 1

    got = {
        r.id: (r.component_id, r.component_size)
        for r in P.q_dedup_minhash_cc(spark, SF).collect()
    }
    assert set(got) == set(truth_comp)
    for x, (cid, size) in got.items():
        assert cid == truth_comp[x], f"node {x}: component {cid} != {truth_comp[x]}"
        assert size == truth_sizes[truth_comp[x]]
    # canonical id is the min of its component
    for x, (cid, _) in got.items():
        assert cid <= x


def test_dedup_lines_kills_verbatim_copies(spark):
    rows = {r.id: r for r in P.q_dedup_lines(spark, SF).collect()}
    # doc_id % 7 == 0 docs have a verbatim copy at id+2000000: every full
    # line occurs in ≥2 docs, so both lose all their (full) lines.
    victims = [i for i in rows if i >= 2000000]
    assert victims
    for c in victims:
        base = c - 2000000
        assert rows[c].n_dropped == rows[base].n_dropped
        # all lines shared between the two copies are dropped
        assert rows[c].n_dropped >= rows[c].n_lines - 1  # tail short-line slack
    # docs with no duplicate lines keep their text intact
    clean = [r for r in rows.values() if r.n_dropped == 0]
    assert clean
    for r in clean[:5]:
        assert r.kept_text.count("\n") == r.n_lines - 1


def test_decontaminate_flags_planted_leaks(spark):
    hits = {r.id: r.n_hits for r in P.q_decontaminate_ngram(spark, SF).collect()}
    # doc 0 is eval (0 % 97 == 0); its verbatim copy (2000000) and
    # appended-tail near-dup (1000000) are training docs sharing 8-grams.
    assert 2000000 in hits and hits[2000000] > 0
    assert 1000000 in hits and hits[1000000] > 0
    # eval docs themselves are never reported
    assert all(not (i < 1000000 and i % 97 == 0) for i in hits)


def test_sample_stratified_deterministic_and_bounded(spark):
    df = P.q_sample_stratified(spark, SF)
    a = sorted((r.doc_id, r.lang, r.bucket) for r in df.collect())
    b = sorted((r.doc_id, r.lang, r.bucket) for r in df.collect())
    assert a == b
    rates = dict(P.SAMPLE_PERMILLE)
    for doc_id, lang, bucket in a:
        assert 0 <= bucket < rates.get(lang, P.SAMPLE_DEFAULT)
    langs = {lang for _, lang, _ in a}
    assert "en" in langs
    # en keeps ~2x the rate of de on the same hash — weak sanity on mix
    n = {lg: sum(1 for _, l2, _ in a if l2 == lg) for lg in langs}
    assert n["en"] > n["de"]


def test_quality_gopher_rule_columns(spark):
    rows = P.q_quality_gopher(spark, SF).collect()
    assert len(rows) == 500
    for r in rows[:20]:
        assert 0.0 <= r.alpha_ratio <= 1.0
        assert r.mean_word_len > 0
        assert r.symbol_ratio == 0.0  # corpus has no # or ellipsis
        expected = (
            P.GOPHER_MIN_WORDS <= r.n_words <= P.GOPHER_MAX_WORDS
            and P.GOPHER_MWL_LO <= r.mean_word_len <= P.GOPHER_MWL_HI
            and r.symbol_ratio < P.GOPHER_SYMBOL_MAX
            and r.bullet_ratio <= P.GOPHER_BULLET_MAX
            and r.ellipsis_ratio <= P.GOPHER_ELLIPSIS_MAX
            and r.alpha_ratio >= P.GOPHER_ALPHA_MIN
            and r.n_stop_hits >= P.GOPHER_STOP_MIN
        )
        assert r.passes == expected
    # both outcomes occur (short docs fail the word-count bound)
    outcomes = {r.passes for r in rows}
    assert outcomes == {True, False}, f"degenerate gate: {outcomes}"


# --------------------------------------------------------------------------- #
# round-3 additions: caption pairing, substring dedup, mixing, histogram
# --------------------------------------------------------------------------- #
def _spans_df(spark, rows):
    """rows: list of (doc_id, [(kind, text, ref, offset), ...])"""
    data = [
        (d, [{"kind": k, "text": t, "media_ref": r, "offset": o} for k, t, r, o in sp])
        for d, sp in rows
    ]
    return spark.createDataFrame(
        data,
        "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_caption_pairs_prefers_preceding_text(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.multimodal import caption_pairs

    df = _spans_df(spark, [
        # media first (no preceding text) -> 'next'
        (1, [("image", "alt", "a.png", 0), ("text", "after", None, 1)]),
        # text both sides -> nearest preceding wins
        (2, [("text", "far", None, 0), ("text", "near", None, 2),
             ("media", "m", "b.pdf", 3), ("text", "post", None, 4)]),
        # no text spans at all -> side 'none', null caption
        (3, [("image", "x", "c.png", 0), ("link", "l", "u", 1)]),
    ])
    got = {
        (r.doc_id, r.p.media_ref): (r.p.caption, r.p.side, r.p.caption_offset)
        for r in df.select("doc_id", F.explode(caption_pairs("spans")).alias("p")).collect()
    }
    assert got[(1, "a.png")] == ("after", "next", 1)
    assert got[(2, "b.pdf")] == ("near", "prev", 2)
    assert got[(3, "c.png")] == (None, "none", None)


def test_dedup_substring_boundary_and_short_docs(spark):
    """A duplicate passage that straddles dedup_lines' disjoint cut is
    caught by the overlapping windows; docs shorter than SUB_K tokens are
    excluded entirely (no zero-window rows)."""
    out = {r.id: r for r in P.q_dedup_substring(spark, SF).collect()}
    # exact copies (id+2000000 rows) share every window with their base
    exact_ids = [i for i in out if i >= 2000000]
    assert exact_ids, "exact-copy shard must be present"
    for i in exact_ids[:20]:
        assert out[i].dup_ratio == 1.0 and not out[i].keep
    # every row has at least one window
    assert all(r.n_windows >= 1 for r in out.values())


def test_mix_weights_sum_to_one(spark):
    rows = P.q_mix_weights(spark, SF).collect()
    assert len(rows) >= 2
    s = sum(r.weight for r in rows)
    assert abs(s - 1.0) < 1e-4
    for r in rows:
        assert 0 < r.sample_rate <= 1.0
        # alpha=0.5 upsamples the tail: rate decreases as n_docs grows
    by_n = sorted(rows, key=lambda r: r.n_docs)
    rates = [r.sample_rate for r in by_n]
    assert rates == sorted(rates, reverse=True) or rates[0] == 1.0


def test_token_hist_covers_corpus(spark):
    from crawl4ai_spark.queries.dataops import _corpus

    rows = P.q_token_hist(spark, SF).collect()
    assert sum(r.n_docs for r in rows) == _corpus(spark, SF).count()
    for r in rows:
        # bin b holds counts in [2^(b-1), 2^b)
        assert r.min_tokens >= 2 ** (r.bin - 1)
        assert r.max_tokens < 2 ** r.bin


def test_caption_pairs_span_order_invariant(spark):
    """caption_pairs keys on the offset FIELD, not array position: a
    permuted spans array yields the same pairs (span arrays arrive in
    storage order from some sources, shuffled from others)."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.multimodal import caption_pairs

    spans = [("text", "t0", None, 0), ("image", "i1", "a.png", 1),
             ("text", "t2", None, 2), ("media", "m3", "b.pdf", 3),
             ("link", "l4", "u", 4), ("text", "t5", None, 5)]
    perm = [spans[i] for i in (3, 0, 5, 2, 4, 1)]
    a = _spans_df(spark, [(1, spans)])
    b = _spans_df(spark, [(1, perm)])

    def pairs(df):
        return sorted(
            (r.p.media_ref, r.p.caption, r.p.side, r.p.caption_offset)
            for r in df.select(F.explode(caption_pairs("spans")).alias("p")).collect()
        )

    assert pairs(a) == pairs(b)
    assert pairs(a) == [("a.png", "t0", "prev", 0), ("b.pdf", "t2", "prev", 2)]


def test_dsir_weights_semantics(spark):
    """DSIR: every target (eval) document is target-like by construction
    (weight ≥ 0, kept); weights are finite; n_bigrams = max(0, tokens-1)."""
    import duckdb

    from crawl4ai_spark.queries.pipelineops import q_dsir_weights

    rows = {r.doc_id: r for r in q_dsir_weights(spark, SF).collect()}
    assert len(rows) == 500
    nbg = dict(duckdb.sql(
        f"""select doc_id, greatest(len(list_filter(
            regexp_split_to_array(text, '\\s+'), w -> w <> '')) - 1, 0)
            from '{SF}/documents.parquet'""").fetchall())
    kept = 0
    for did, r in rows.items():
        assert r.weight == r.weight and abs(r.weight) < 1e6
        assert r.keep == (r.weight >= 0)
        assert r.n_bigrams == nbg[did]
        if r.is_eval:
            assert r.keep, f"target doc {did} must be target-like"
        kept += int(r.keep)
    assert 0 < kept < len(rows)


def test_domain_cap_bounds_and_matches_single_window(spark):
    """Two-level capped selection == the naive single-window ground
    truth (computed per source in Python), and no source exceeds DC_CAP."""
    from crawl4ai_spark.functions.hashing import h60_py
    import duckdb

    rows = q_rows = P.q_domain_cap(spark, SF).collect()
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    assert all(len(v) <= P.DC_CAP for v in per_src.values())

    docs = duckdb.sql(
        f"select doc_id, source from '{SF}/documents.parquet'").fetchall()
    truth: dict[str, list] = {}
    for did, src in docs:
        truth.setdefault(src, []).append((h60_py(f"dcp:{did}"), did))
    for src, lst in truth.items():
        want = [d for _, d in sorted(lst)[: P.DC_CAP]]
        got = [r.doc_id for r in sorted(per_src.get(src, []), key=lambda r: r.rk)]
        assert got == want, src
        # rk is the exact global per-source rank, 1-based contiguous
        assert [r.rk for r in sorted(per_src.get(src, []), key=lambda r: r.rk)] == list(
            range(1, len(want) + 1))


def test_quality_c4_line_gate(spark):
    """clean_text is exactly the kept 10-token lines (>= 5 words, no
    'javascript'), doc-level keep needs >= 3 kept lines and no bad
    substrings — checked against an independent Python evaluation of
    the same rules. The gate must be OPERABLE: both keep classes
    present on the synthetic corpus."""
    import re

    import duckdb

    rows = {r.doc_id: r for r in P.q_quality_c4(spark, SF).collect()}
    docs = duckdb.sql(f"select doc_id, text from '{SF}/documents.parquet'").fetchall()
    assert len(rows) == len(docs)
    kept_docs = 0
    for did, text in docs:
        toks = [w for w in re.split(r"\s+", text) if w != ""]
        lines = [" ".join(toks[i:i + P.LINE_TOKENS])
                 for i in range(0, len(toks), P.LINE_TOKENS)]
        kept = [
            x for x in lines
            if len([w for w in re.split(r"\s+", x.strip(" ")) if w]) >= P.C4_MIN_LINE_WORDS
            and "javascript" not in x.lower()
        ]
        n_punct = len([x for x in lines if re.search(r'[.!?"]$', x.rstrip(" "))])
        bad = "lorem ipsum" in text.lower() or "{" in text
        r = rows[did]
        assert r.n_lines == len(lines)
        assert r.n_kept == len(kept), (did, r.n_kept, len(kept))
        assert r.n_punct_lines == n_punct
        assert r.clean_text == "\n".join(kept)
        assert r.keep == (len(kept) >= P.C4_MIN_KEPT_LINES and not bad)
        kept_docs += int(r.keep)
    assert 0 < kept_docs < len(rows)  # both classes present


def test_quality_linear_model_semantics(spark):
    """prob is the sigmoid of the mean hashed-bucket weight (checked
    against an independent Python evaluation), empty docs never keep,
    and the corpus splits (both classes present)."""
    import math

    from crawl4ai_spark.functions.hashing import h60_py
    import duckdb

    rows = {r.doc_id: r for r in P.q_quality_linear(spark, SF).collect()}
    docs = duckdb.sql(f"select doc_id, text from '{SF}/documents.parquet'").fetchall()
    assert len(rows) == len(docs)
    kept = 0
    for did, text in docs:
        toks = [w for w in __import__("re").split(r"\s+", text) if w != ""]
        sw = sum(
            ((h60_py("qlw:" + str(h60_py("qlb:" + w) % P.QL_D)) % 2001) - 1000) / 1000.0
            for w in toks
        )
        prob = round(1.0 / (1.0 + math.exp(-(sw / max(1, len(toks))))), 6)
        r = rows[did]
        assert r.n_toks == len(toks)
        assert abs(r.prob - prob) < 2e-6, (did, r.prob, prob)
        assert r.keep == (prob >= 0.5 and len(toks) > 0)
        kept += int(r.keep)
    assert 0 < kept < len(rows)


def test_url_blocklist_semantics(spark):
    """Subdomain matching (never bare string-suffix), path-prefix
    narrowing, deterministic multi-rule fold, clean rows kept."""
    from crawl4ai_spark.queries.pipelineops import apply_url_blocklist

    urls = spark.createDataFrame(
        [
            (1, "https://block0.com/p/1", "block0.com", "/p/1"),
            (2, "https://www.block0.com/p/2", "www.block0.com", "/p/2"),
            (3, "https://notblock0.com/p/3", "notblock0.com", "/p/3"),
            (4, "https://ok0.org/dl/4", "ok0.org", "/dl/4"),
            (5, "https://ok0.org/p/5", "ok0.org", "/p/5"),
            (6, "https://deep.a.block0.com/x", "deep.a.block0.com", "/x"),
            (7, "https://clean.org/p/7", "clean.org", "/p/7"),
            (8, "https://both.test/x", "both.test", "/x"),
        ],
        "doc_id long, url string, host string, path string",
    )
    bl = spark.createDataFrame(
        [("block0.com", None, "ads"), ("ok0.org", "/dl/", "malware"),
         ("both.test", None, "zz"), ("both.test", None, "aa")],
        "domain string, path_prefix string, category string",
    )
    got = {r.doc_id: (r.category, r.keep)
           for r in apply_url_blocklist(urls, bl).collect()}
    assert got[1] == ("ads", False)          # exact domain
    assert got[2] == ("ads", False)          # subdomain
    assert got[3] == ("", True)              # string-suffix trap: kept
    assert got[4] == ("malware", False)      # path prefix fires
    assert got[5] == ("", True)              # path prefix doesn't
    assert got[6] == ("ads", False)          # deep subdomain
    assert got[7] == ("", True)
    assert got[8] == ("aa", False)           # multi-rule fold = min(category)
    assert len(got) == 8                     # one row per input


def test_perplexity_bucket_shares_and_order(spark):
    """Within each language: bucket boundaries respect the score order
    (max head ppl <= min middle ppl <= min tail ppl) and the head/middle
    cumulative shares clear 30%/60% at the bucket granularity."""
    from collections import defaultdict

    from crawl4ai_spark.queries.pipelineops import q_perplexity_bucket

    rows = q_perplexity_bucket(spark, SF).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        b = defaultdict(list)
        for r in rs:
            b[r.bucket].append(r.ppl_q)
        if "middle" in b and "head" in b:
            assert max(b["head"]) <= min(b["middle"]), lang
        if "tail" in b and "middle" in b:
            assert max(b["middle"]) <= min(b["tail"]), lang
        n = len(rs)
        n_head = len(b.get("head", []))
        n_mid = len(b.get("middle", []))
        # head crosses 30% (first bucket at/over the cut is included) and
        # head-minus-its-last-ppl-class stays under 30%
        assert n_head * 10 >= 3 * n, lang
        if b.get("head"):
            hm = max(b["head"])
            assert (n_head - sum(1 for q in b["head"] if q == hm)) * 10 < 3 * n, lang
        assert (n_head + n_mid) * 10 >= 6 * n, lang


def test_semdedup_matches_numpy_reference(spark):
    """SemDeDup meaning (arXiv:2303.09540): within each max-cosine
    cluster, every duplicate pair (cos >= T) drops its member CLOSER to
    the centroid (tie: higher id) — the keep set equals a full numpy
    recompute, and no two kept items in one cell are near-duplicates."""
    import numpy as np

    from crawl4ai_spark.queries.dataops import (
        SEM_CELLS, SEMDEDUP_T, _ecorpus, q_semdedup,
    )

    got = {r.id: r for r in q_semdedup(spark, SF).collect()}
    corpus = {r.id: np.array(r.v, dtype=np.float64)
              for r in _ecorpus(spark, SF).collect()}
    assert set(got) == set(corpus)

    def cos(a, b):
        return float(a @ b) / (float(np.sqrt(a @ a)) * float(np.sqrt(b @ b)))

    cents = [corpus[i] for i in sorted(corpus) if i < SEM_CELLS]
    cell, cent_sim = {}, {}
    for i, v in corpus.items():
        sims = [cos(c, v) for c in cents]
        cell[i], cent_sim[i] = int(np.argmax(sims)), max(sims)
        assert got[i].cell == cell[i]

    drops = set()
    ids = sorted(corpus)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            if cell[a] != cell[b] or cos(corpus[a], corpus[b]) < SEMDEDUP_T:
                continue
            if cent_sim[a] > cent_sim[b]:
                drops.add(a)
            elif cent_sim[b] > cent_sim[a]:
                drops.add(b)
            else:
                drops.add(max(a, b))
    assert {i for i, r in got.items() if not r.keep} == drops
    assert drops, "the planted near/exact dups must produce drops"
    # no two kept members of one cell are near-duplicates
    kept = [i for i, r in got.items() if r.keep]
    for x, a in enumerate(kept):
        for b in kept[x + 1:]:
            if cell[a] == cell[b]:
                assert cos(corpus[a], corpus[b]) < SEMDEDUP_T


def test_boilerplate_strip_removes_templates_keeps_body(spark):
    """Template lines (per-host NAV header / COPYRIGHT footer, planted on
    every page of a host) are stripped from every doc; body lines unique
    to a doc survive verbatim and in order."""
    rows = P.q_boilerplate_strip(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_boiler >= 2, "header+footer must both be template"
        assert "NAV " not in r.kept_text
        assert "COPYRIGHT " not in r.kept_text
        assert r.n_lines >= 2
    # kept body equals the doc's own line cut (order preserved): spot-check
    # via the source table for one doc with text
    import pyspark.sql.functions as F

    d = spark.read.parquet(f"{SF}/documents.parquet")
    doc = d.where(F.length("text") > 50).orderBy("doc_id").first()
    toks = doc.text.split()
    expect_lines = [
        " ".join(toks[i:i + P.BP_LINE]) for i in range(0, len(toks), P.BP_LINE)
    ]
    got = {r.id: r for r in rows}[int(doc.doc_id)]
    kept = got.kept_text.split("\n") if got.kept_text else []
    # every kept line is a body line of the doc, in original order
    assert kept == [ln for ln in expect_lines if ln in set(kept)]
    # and a line is only dropped if it is host-frequent (template rule),
    # which for unique prose should mean: nothing beyond header/footer
    # unless the corpus genuinely repeats it on >=50% of the host's pages
    assert got.n_boiler <= 2 + (len(expect_lines) - len(kept))


def test_dedup_intradoc_drops_second_widget_keeps_body(spark):
    """Within-doc dedup: the planted widget line (opens AND closes every
    page) loses exactly its second occurrence; unique body lines all
    survive in order; docs gain no cross-document coupling (a line
    repeated across docs but once per doc is untouched)."""
    rows = P.q_dedup_intradoc(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_dupes >= 1                      # the closing widget
        assert r.kept_text.startswith("WIDGET promo ")
        assert r.kept_text.count("WIDGET promo ") == 1
        assert r.n_lines - r.n_dupes == len(r.kept_text.split("\n"))


def test_script_detect_dominants(spark):
    """Each transliteration class lands on its script: the 4 synthetic
    classes produce all four dominant scripts, and counts partition the
    letters (Latin lost == other script gained for the vowel classes)."""
    from crawl4ai_spark.queries.dataops import q_script_detect

    rows = q_script_detect(spark, SF).collect()
    import collections
    by_class = collections.defaultdict(set)
    for r in rows:
        by_class[r.id % 4].add(r.script)
    assert by_class[0] == {"latin"}
    assert "cyrillic" in by_class[1] and "greek" in by_class[2]
    assert "cjk" in by_class[3]
    for r in rows:
        if r.id % 4 == 1:
            assert r.n_greek == 0 and r.n_cjk == 0
        if r.id % 4 == 2:
            assert r.n_cyrillic == 0 and r.n_cjk == 0


def test_cdc_boundary_resynchronization(spark):
    """The CDC property fixed windows lack: after a front insertion,
    chunk boundaries re-synchronize and the tail chunks still dedup.
    Doc B = one junk token + doc A's text; beyond the perturbation
    window every A-chunk re-appears verbatim in B. Also: an appended
    tail changes only the final chunk (the near-dup corpus shape)."""
    from crawl4ai_spark.queries.pipelineops import cdc_chunks

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu "
            "one two three four five six seven eight nine ten")
    docs = spark.createDataFrame(
        [(1, base), (2, "INSERTED " + base), (3, base + " APPENDED")],
        "id long, text string")
    rows = cdc_chunks(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.id, []).append(r.chunk)
    a, b, c = by_doc[1], by_doc[2], by_doc[3]
    # each doc reassembles exactly from its chunks (no token lost)
    assert " ".join(a) == base and " ".join(c) == base + " APPENDED"
    # front insertion: all A-chunks after the first boundary survive in B
    shared_ab = set(a) & set(b)
    assert len(shared_ab) >= len(a) - 1 and len(a) >= 3
    # appended tail: only A's final chunk can differ from C's chunks
    assert set(a[:-1]) <= set(c)


def test_sample_weighted_es_semantics(spark):
    """Efraimidis–Spirakis sample: exactly k rows (corpus permitting),
    keys are the deterministic hash-uniform transform ln(u)/w (always
    <= 0), and the cut is the global top-k — no surviving key may be
    smaller than any excluded one."""
    import math

    from crawl4ai_spark.functions.hashing import h60_py
    from crawl4ai_spark.queries.pipelineops import (WS_CHARS_PER_UNIT, WS_K,
                                                    WS_M, WS_SALT,
                                                    q_sample_weighted)

    sf = "/root/testdata/sf0.01"
    docs = {r.doc_id: (r.text or "")
            for r in spark.read.parquet(f"{sf}/documents.parquet").collect()}

    def key(doc_id, text):
        w = 1 + len(text) // WS_CHARS_PER_UNIT
        u = ((h60_py(f"{WS_SALT}{doc_id}") % WS_M) + 1) / float(WS_M + 1)
        return round(math.log(u) / w, 9)

    ref = sorted(((key(i, t), -i) for i, t in docs.items()), reverse=True)
    want = {-negi for _, negi in ref[:WS_K]}
    rows = q_sample_weighted(spark, sf).collect()
    assert len(rows) == min(WS_K, len(docs))
    assert {r.doc_id for r in rows} == want
    for r in rows:
        assert r.es_key <= 0.0
        assert r.w == 1 + len(docs[r.doc_id]) // WS_CHARS_PER_UNIT


def test_kn_bigram_lm_is_proper_distribution(spark):
    """Interpolated KN sanity: with the unseen-continuation mass added
    back (D * N1+(w1 .)/c(w1 .) * sum_unseen N1+(. w2)/B), every
    context w1's probabilities sum to exactly 1 — the smoothed model is
    a proper distribution, not just per-row arithmetic. Also pins the
    continuation identity sum_w2 N1+(. w2) == B."""
    from crawl4ai_spark.queries.pipelineops import KN_D, q_kn_bigram_lm

    rows = q_kn_bigram_lm(spark, "/root/testdata/sf0.001").collect()
    assert rows
    b = rows[0].n_bigram_types
    n1b = {}                      # per-w2 continuation count (global)
    by_w1 = {}
    for r in rows:
        n1b[r.w2] = r.n1plus_back
        by_w1.setdefault(r.w1, []).append(r)
    assert sum(n1b.values()) == b          # sum of N1+(. w2) == B
    for w1, rs in by_w1.items():
        tot, n1f = rs[0].c_w1, rs[0].n1plus_fwd
        assert tot == sum(r.c for r in rs) and n1f == len(rs)
        seen = {r.w2 for r in rs}
        unseen_mass = sum(v for w2, v in n1b.items() if w2 not in seen)
        full = sum(r.p_kn for r in rs) + KN_D * n1f / tot * (unseen_mass / b)
        assert abs(full - 1.0) < 1e-6, (w1, full)


def test_license_detect_classes(spark):
    """The provenance gate maps each synthesized footer class to its
    license label, and train_ok holds exactly for the permissive set
    (BY, BY-SA, CC0) — NC/ND, rights reservations, and missing markers
    are all excluded."""
    from crawl4ai_spark.queries.pipelineops import q_license_detect

    want = {0: "cc-by", 1: "cc-by-sa", 2: "cc-by-nc", 3: "cc-by-nd",
            4: "cc-by-nc-sa", 5: "cc0", 6: "all-rights-reserved",
            7: "none", 8: "none"}
    ok = {"cc-by", "cc-by-sa", "cc0"}
    rows = q_license_detect(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.license == want[r.doc_id % 9]
        assert r.train_ok == (r.license in ok)


def test_badwords_gate_matches_word_boundaries(spark):
    rows = spark.createDataFrame(
        [
            (0, "dup here and dup again"),     # two whole-token hits
            (1, "duplicate words only"),       # substring must NOT match
            (2, "clean text entirely"),
            (3, ""),                           # empty doc: 0 tokens, keep
            (4, "forbidden"),                  # the never-in-corpus word
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in P.badwords_gate(rows).collect()}
    assert (got[0].n_bad, got[0].keep) == (2, False)
    assert (got[1].n_bad, got[1].keep) == (0, True)
    assert (got[2].n_bad, got[2].keep) == (0, True)
    assert (got[3].n_tokens, got[3].n_bad, got[3].keep) == (0, 0, True)
    assert got[3].bad_frac == 0.0
    assert (got[4].n_bad, got[4].keep) == (1, False)
    assert got[0].bad_frac == pytest.approx(2 / 5)
    # the corpus query exercises both list paths: 'dup' hits, and no
    # doc is flagged for anything else
    corpus = P.q_badwords_gate(spark, SF).collect()
    flagged = [r for r in corpus if not r.keep]
    assert flagged and all(r.n_bad > 0 for r in flagged)
    assert any(r.keep for r in corpus)


def test_shard_pack_balance_and_rank_equivalence(spark):
    from crawl4ai_spark.queries.dataops import SP_SHARDS, q_shard_pack
    from crawl4ai_spark.queries.registry import table as _t

    rows = q_shard_pack(spark, SF).collect()
    assert [r.shard for r in rows] == list(range(SP_SHARDS))
    docs = _t(spark, SF, "documents").select("doc_id", "text").collect()
    sizes = sorted(
        (len([w for w in (r.text or "").split() if w]), int(r.doc_id))
        for r in docs
    )
    sizes = [(n, d) for n, d in sizes]
    # brute-force serpentine LPT over the single-window global rank
    order = sorted(sizes, key=lambda x: (-x[0], x[1]))
    totals = [0] * SP_SHARDS
    counts = [0] * SP_SHARDS
    for r0, (n, _) in enumerate(order):
        pos = r0 % SP_SHARDS
        shard = pos if (r0 // SP_SHARDS) % 2 == 0 else SP_SHARDS - 1 - pos
        totals[shard] += n
        counts[shard] += 1
    assert [r.sum_tokens for r in rows] == totals
    assert [r.n_docs for r in rows] == counts
    # the balance property the serpentine deal exists for: per-shard
    # totals within one max-document of each other
    assert max(totals) - min(totals) <= max(n for n, _ in sizes)


def test_zorder_scan_pruning_tradeoff(spark):
    from crawl4ai_spark.queries.dataops import (
        N_ZFILES, q_zorder_scan_pruning)

    rows = {r.layout: r for r in q_zorder_scan_pruning(spark, SF).collect()}
    assert set(rows) == {"lex", "zorder"}
    for r in rows.values():
        assert r.n_files == N_ZFILES
        assert r.rows_min >= 1
    lex, z = rows["lex"], rows["zorder"]
    # lex is optimal on its leading dim and worthless on the trailing
    # one (every file spans the full b range); z-order pays a bounded
    # factor on a to make b prunable — strictly better in aggregate
    # near-worthless: >= 90% of all possible file-opens (sparse sf0.001
    # buckets can miss a b value in a file, so not exactly 16 * N files)
    assert lex.scanned_b >= int(0.9 * 16 * N_ZFILES)
    assert z.scanned_b < lex.scanned_b
    assert z.scanned_a <= 2 * lex.scanned_a
    assert z.scanned_a + z.scanned_b < lex.scanned_a + lex.scanned_b


def test_winnow_fingerprints_matches_python_twin(spark):
    import hashlib

    from crawl4ai_spark.queries.dataops import _corpus
    from crawl4ai_spark.queries.pipelineops import (
        WIN_K, WIN_W, q_winnow_fingerprints)

    docs = {int(r.id): (r.text or "") for r in _corpus(spark, SF).collect()}

    def winnow(text):
        t = [w for w in text.split() if w]
        if len(t) < WIN_K:
            return None, set(), set()
        grams = [
            hashlib.md5(" ".join(t[i:i + WIN_K]).encode()).hexdigest()
            for i in range(len(t) - WIN_K + 1)
        ]
        sel = set()
        for w0 in range(len(grams) - WIN_W + 1):
            win = grams[w0:w0 + WIN_W]
            h = min(win)
            # ties -> rightmost
            pos = w0 + max(i for i, g in enumerate(win) if g == h)
            sel.add((pos, grams[pos]))
        return len(grams), sel, {h for _, h in sel}

    twins = {d: winnow(text) for d, text in docs.items()}
    got = {r.id: r for r in q_winnow_fingerprints(spark, SF).collect()}
    from collections import Counter
    owners = Counter()
    for d, (_, _, hs) in twins.items():
        for h in hs:
            owners[h] += 1
    for d, (n_grams, sel, hs) in twins.items():
        if n_grams is None:
            assert d not in got
            continue
        r = got[d]
        assert (r.n_grams, r.n_selected) == (n_grams, len(sel))
        assert r.n_shared == sum(1 for p, h in sel if owners[h] > 1)
        # expected density ~ 2/(w+1); selection never exceeds one pick
        # per window start
        assert r.n_selected <= max(0, n_grams - WIN_W + 1)
    # the winnowing GUARANTEE on the planted exact copies (id + 2000000
    # duplicates id): identical docs share every fingerprint
    for d, (n_grams, sel, hs) in twins.items():
        if d >= 2000000 and n_grams:
            src = twins[d - 2000000]
            assert hs and hs == src[2]
            assert got[d].n_shared == got[d].n_selected
