"""Tests for the S5/S6/S7/S8/U1 surface operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


class TestCacheModes:
    def _fetch(self, df):
        return df.withColumn("content", F.concat(F.lit("body:"), F.col("url")))

    def _run(self, spark, mode):
        from crawl4ai_spark.operators.cache import cached_fetch

        sel = spark.createDataFrame([("u1",), ("u2",), ("u3",)], ["url"])
        cache = spark.createDataFrame([("u1", "cached:u1")], ["url", "content"])
        pages, writes = cached_fetch(sel, cache, self._fetch, mode)
        got = {r.url: (r.content, r.from_cache) for r in pages.collect()}
        wrote = None if writes is None else {r.url for r in writes.collect()}
        return got, wrote

    def test_enabled_reads_and_writes(self, spark):
        got, wrote = self._run(spark, "enabled")
        assert got["u1"] == ("cached:u1", True)
        assert got["u2"] == ("body:u2", False)
        assert wrote == {"u2", "u3"}

    def test_bypass_refetches_all(self, spark):
        got, wrote = self._run(spark, "BYPASS")  # case-insensitive
        assert got["u1"] == ("body:u1", False)
        assert wrote == {"u1", "u2", "u3"}

    def test_read_only(self, spark):
        got, wrote = self._run(spark, "read_only")
        assert got["u1"][1] is True and wrote is None

    def test_disabled(self, spark):
        got, wrote = self._run(spark, "disabled")
        assert all(not fc for _, fc in got.values()) and wrote is None

    def test_unknown_defaults_to_enabled(self, spark):
        from crawl4ai_spark.operators.cache import resolve_cache_mode

        assert resolve_cache_mode("whatever") == "enabled"
        assert resolve_cache_mode(None) == "enabled"


class TestMemory:
    def test_add_and_retrieve(self, spark):
        from crawl4ai_spark.operators.memory import add_knowledge, retrieve_relevant

        mem = add_knowledge(spark, None, [("u1", "spark shuffle join"), ("u2", "cats and dogs")])
        mem = add_knowledge(spark, mem, [("u3", "spark partitions")])
        assert mem.count() == 3
        assert [r.vec_id for r in mem.orderBy("vec_id").collect()] == [0, 1, 2]
        got = retrieve_relevant(mem, "spark shuffle join", k=1).collect()
        assert len(got) == 1 and got[0].url == "u1"  # exact text → sim 1.0


class TestStrategy:
    def test_analyze_always_default(self):
        from crawl4ai_spark.agent import CrawlStrategy, analyze_website

        assert analyze_website("https://x", use_llm=True) == CrawlStrategy()

    def test_keywords_force_best_first(self):
        from crawl4ai_spark.agent import CrawlStrategy, apply_strategy
        from crawl4ai_spark.config import CrawlConfig, resolve_strategy

        cfg = apply_strategy(CrawlConfig(seeds=["https://x"]),
                             CrawlStrategy(focus_keywords=("spark", "data")))
        assert cfg.strategy == "best_first" and cfg.query == "spark data"
        assert resolve_strategy(cfg) == "best_first"  # use_ai_agent set

    def test_enhance_stub_raises(self, spark):
        from crawl4ai_spark.agent import enhance_content

        df = spark.createDataFrame([("m",)], ["markdown"])
        with pytest.raises(NotImplementedError):
            enhance_content(df)

    def test_enhance_injected_model_end_to_end(self, spark):
        """r3 verdict item 5: a deterministic fake model through the
        Arrow/pandas_udf path proves batching, truncation (reference
        10k-char cap, ai_agent.py:187), schema, and per-row pairing —
        the stub boundary stays a stub, the plumbing is exercised."""
        from crawl4ai_spark.agent import ENHANCE_TRUNCATE, enhance_content

        rows = [(f"u{i}", f"w{i} " * 4000) for i in range(12)]  # > 10k chars each
        df = spark.createDataFrame(rows, ["url", "markdown"]).repartition(4)
        fake = lambda t: f"E[{len(t)}]{t[:6]}"  # noqa: E731 — deterministic, length-revealing
        out = {r.url: r.enhanced for r in
               enhance_content(df, model=fake).collect()}
        assert len(out) == 12
        for i in range(12):
            # model saw EXACTLY the truncated input, matched to its row
            t = (f"w{i} " * 4000)[:ENHANCE_TRUNCATE]
            assert out[f"u{i}"] == f"E[{len(t)}]{t[:6]}"
        # schema: enhanced appended, temp column dropped
        res = enhance_content(df, model=fake)
        assert res.columns == ["url", "markdown", "enhanced"]

    def test_answer_question_injected_model(self, spark):
        """U3 plumbing: question broadcast into every row's model call,
        context truncated at the reference's 15k cap (ai_agent.py:252)."""
        from crawl4ai_spark.agent import ANSWER_TRUNCATE, answer_question

        df = spark.createDataFrame(
            [("short", "tiny context"), ("long", "c" * 20_000)],
            ["url", "markdown"])
        fake = lambda q, c: f"{q}|{len(c)}"  # noqa: E731
        out = {r.url: r.answer for r in
               answer_question(df, "why?", model=fake).collect()}
        assert out["short"] == "why?|12"
        assert out["long"] == f"why?|{ANSWER_TRUNCATE}"
        df2 = spark.createDataFrame([("m",)], ["markdown"])
        with pytest.raises(NotImplementedError):
            answer_question(df2, "q")


class TestSinks:
    def test_collect_downloads(self, spark, corpus_dir):
        from crawl4ai_spark.operators.sinks import collect_downloads

        docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
        pdfs = collect_downloads(docs, download_pdfs=True)
        assert pdfs.where(F.col("ext") != "pdf").count() == 0
        both = collect_downloads(docs, download_pdfs=True, download_images=True)
        assert both.count() > pdfs.count()

    def test_download_size_cap(self, spark, corpus_dir):
        from crawl4ai_spark.operators.sinks import collect_downloads

        docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
        all_refs = collect_downloads(docs, download_pdfs=True)
        sizes = all_refs.select("media_ref").distinct().withColumn(
            "n_bytes", F.lit(100 * 1024 * 1024)
        )
        capped = collect_downloads(docs, download_pdfs=True, blob_sizes=sizes,
                                   max_file_size_mb=10)
        assert capped.count() == 0

    def test_save_markdown(self, spark, tmp_path):
        from crawl4ai_spark.operators.sinks import save_markdown

        df = spark.createDataFrame(
            [("https://a/x", "# A"), ("https://b/y", "# B")], ["url", "raw_md"]
        )
        n = save_markdown(df, str(tmp_path / "md"))
        assert n == 2
        files = sorted(p.name for p in (tmp_path / "md").iterdir())
        assert all(f.endswith(".md") for f in files) and len(files) == 2


def test_exclude_external_images_filter(spark):
    """P9: exclude_external=True drops off-host images from the inventory
    (reference exclude_external_images, crawl_agent.py:164)."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.markdown import images_of

    df = spark.createDataFrame(
        [(
            "host1.example.com",
            [
                {"kind": "image", "text": "a", "media_ref": "https://host1.example.com/i/1.png", "offset": 0},
                {"kind": "image", "text": "b", "media_ref": "https://cdn.other.net/i/2.png", "offset": 1},
            ],
        )],
        "host string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    all_imgs = df.select(images_of("spans", "host").alias("im")).first().im
    kept = df.select(images_of("spans", "host", exclude_external=True).alias("im")).first().im
    assert len(all_imgs) == 2 and len(kept) == 1
    assert kept[0].src == "https://host1.example.com/i/1.png"
    assert [i.is_external for i in all_imgs] == [False, True]


def test_save_markdown_bulk_parallel(spark, tmp_path):
    """S6 bulk path (VERDICT r2 #9): 1k pages exported via df.write.text
    with no driver-side iteration; every page present exactly once."""
    from pyspark.sql import functions as F
    from crawl4ai_spark.operators.sinks import save_markdown_bulk

    df = spark.range(1000).select(
        F.concat(F.lit("https://h/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("# doc "), F.col("id").cast("string")).alias("raw_md"),
    )
    out = tmp_path / "bulk"
    save_markdown_bulk(df, str(out), max_records_per_file=200)
    parts = [p for p in out.iterdir() if p.name.startswith("part-")]
    assert len(parts) >= 5  # maxRecordsPerFile bounds file size
    text = "".join(p.read_text() for p in parts)
    assert text.count("## Page: ") == 1000
    assert "## Page: https://h/p/999\n\n# doc 999" in text


class TestWarcSink:
    def test_warc_format_and_roundtrip(self, spark, tmp_path):
        """S6b: records carry ISO 28500 framing, Content-Length counts
        payload octets (multi-byte chars included), record IDs are
        deterministic, and written parts concatenate into a stream a
        simple WARC reader splits back into the same pages."""
        import glob
        import re

        from crawl4ai_spark.operators.sinks import warc_format, write_warc

        rows = [("https://a.com/1", "hello"),
                ("https://a.com/2", "héllo\nworld"),   # 2-byte é + newline
                ("https://a.com/3", None)]
        df = spark.createDataFrame(rows, "url string, raw_md string")
        out = {r.url: r for r in warc_format(df).collect()}
        assert out["https://a.com/1"].content_length == 5
        assert out["https://a.com/2"].content_length == len("héllo\nworld".encode())
        assert out["https://a.com/3"].content_length == 0
        rec = out["https://a.com/1"].warc
        assert rec.startswith("WARC/1.0\r\nWARC-Type: resource\r\n")
        assert rec.endswith("\r\n\r\n")
        assert "WARC-Target-URI: https://a.com/1\r\n" in rec
        assert re.search(r"WARC-Record-ID: <urn:h60:\d+>", rec)
        # determinism: same URL -> same record id
        again = {r.url: r.warc for r in warc_format(df).collect()}
        assert again["https://a.com/1"] == rec

        write_warc(df.repartition(1), str(tmp_path / "warc"))
        stream = "".join(
            open(p, newline="").read()
            for p in sorted(glob.glob(f"{tmp_path}/warc/part-*")))
        # exact ISO 28500 framing: every record ends with two CRLFs and
        # the next begins immediately — no stray writer LF between
        # records (payload bytes may of course contain \n)
        assert "\r\n\r\n\n" not in stream
        assert stream.endswith("\r\n\r\n")
        for part in stream.split("WARC/1.0")[1:]:
            assert part.endswith("\r\n\r\n")
        # a minimal reader: split on the version line
        records = ["WARC/1.0" + r for r in stream.split("WARC/1.0") if r.strip()]
        assert len(records) == 3
        uris = {re.search(r"WARC-Target-URI: (\S+)", r).group(1) for r in records}
        assert uris == {u for u, _ in rows}

    def test_wet_format_refers_to_and_roundtrip(self, spark):
        """WET conversion records: WARC-Refers-To carries the SOURCE
        capture's urn:h60 record id (the id warc_format mints for the
        same URI), the conversion's own id is salted so the two never
        collide, and the record parses back through parse_warc with
        the extra header tolerated and the payload intact."""
        import re

        from crawl4ai_spark.operators.sinks import (
            parse_warc, warc_format, wet_format)

        rows = [("https://a.com/1", "extracted text"),
                ("https://a.com/2", "héllo\r\n\r\nWARC/1.0 decoy")]
        df = spark.createDataFrame(rows, "url string, text string")
        src = {r.url: r.warc for r in
               warc_format(df, payload_col="text").collect()}
        wet = {r.url: r.warc for r in wet_format(df).collect()}
        for url, _ in rows:
            rec = wet[url]
            assert rec.startswith("WARC/1.0\r\nWARC-Type: conversion\r\n")
            src_id = re.search(r"WARC-Record-ID: (<urn:h60:\d+>)",
                               src[url]).group(1)
            own_id = re.search(r"WARC-Record-ID: (<urn:h60:\d+>)",
                               rec).group(1)
            assert f"WARC-Refers-To: {src_id}\r\n" in rec
            assert own_id != src_id          # salted id never collides
        # parse tolerates the extra header; decoy payload framed exactly
        stream = spark.createDataFrame(
            [("s0", "".join(wet[u] for u, _ in rows))],
            "stream_id string, stream string")
        recs = {r.url: r for r in parse_warc(stream).collect()}
        assert recs["https://a.com/2"].payload == "héllo\r\n\r\nWARC/1.0 decoy"
        assert all(r.warc_type == "conversion" for r in recs.values())
        # default warc_format output is byte-identical with no refers_to
        assert "WARC-Refers-To" not in src["https://a.com/1"]

    def test_wat_export_json_and_roundtrip(self, spark):
        """WAT metadata records: the payload is VALID JSON whose link
        list matches the page's link spans in span order, the envelope
        carries the target URI, and the full record stream parses back
        through parse_warc (metadata type, refers-to tolerated)."""
        import json

        from crawl4ai_spark.operators.sinks import parse_warc
        from crawl4ai_spark.queries.spansops import (_span_docs,
                                                     q_wat_export)

        sf = "/root/testdata/sf0.001"
        rows = {r.doc_id: r for r in q_wat_export(spark, sf).collect()}
        spans = {r.doc_id: r.spans for r in _span_docs(spark, sf).collect()}
        assert set(rows) == set(spans)
        for i, r in rows.items():
            payload = r.wat.split("\r\n\r\n")[1]
            doc = json.loads(payload)          # valid JSON, always
            env = doc["Envelope"]
            assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == r.url
            links = [l["url"] for l in
                     env["Payload-Metadata"]["HTML-Metadata"]["Links"]]
            want = [s.media_ref for s in spans[i] if s.kind == "link"]
            assert links == want and r.n_links == len(want)
        # the concatenated records survive the length-respecting parser
        sample = [rows[i] for i in sorted(rows)[:5]]
        stream = spark.createDataFrame(
            [("s0", "".join(r.wat for r in sample))],
            "stream_id string, stream string")
        back = parse_warc(stream).collect()
        assert [b.url for b in back] == [r.url for r in sample]
        assert all(b.warc_type == "metadata" for b in back)

    def test_parse_warc_length_respecting_roundtrip(self, spark, tmp_path):
        """S6b read path: parse(export(X)) == X even when payloads embed
        a full decoy record header and blank lines — a regex/split
        reader mis-frames these; the Content-Length walk must not."""
        import glob

        from crawl4ai_spark.operators.sinks import parse_warc, write_warc

        decoy = ("WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: "
                 "https://evil.example/fake\r\nContent-Length: 0\r\n\r\n\r\n\r\n")
        rows = [
            ("https://a.com/1", "plain"),
            ("https://a.com/2", f"before {decoy} after"),       # embedded record
            ("https://a.com/3", "para one\r\n\r\npara two"),    # blank line in body
            ("https://a.com/4", ""),
            ("https://a.com/5", "héllo wörld ünïcode"),         # multi-byte octets
        ]
        df = spark.createDataFrame(rows, "url string, raw_md string")
        write_warc(df.repartition(1), str(tmp_path / "warc"))
        parts = sorted(glob.glob(f"{tmp_path}/warc/part-*"))
        stream = "".join(open(p, newline="").read() for p in parts)
        streams = spark.createDataFrame([("s0", stream)], "stream_id string, stream string")

        recs = parse_warc(streams).collect()
        assert len(recs) == len(rows)  # decoy did NOT become a 6th record
        got = {r.url: r for r in recs}
        assert set(got) == {u for u, _ in rows}
        for url, payload in rows:
            r = got[url]
            assert r.payload == payload
            assert r.content_length == len(payload.encode())
            assert r.warc_type == "resource"
            assert r.warc_date == "2026-01-01T00:00:00Z"
        # rec_idx preserves stream order; stream_id passes through
        assert [r.stream_id for r in recs] == ["s0"] * len(rows)
        assert sorted(r.rec_idx for r in recs) == list(range(len(rows)))

    def test_parse_warc_rejects_misframed_stream(self, spark):
        from crawl4ai_spark.operators.sinks import parse_warc

        bad = spark.createDataFrame(
            [("s0", "HTTP/1.1 200 OK\r\n\r\nnot a warc")],
            "stream_id string, stream string")
        import pytest as _pytest
        with _pytest.raises(Exception, match="bad record start"):
            parse_warc(bad).collect()

    def test_parse_warc_truncated_stream_raises(self, spark):
        """A part file cut mid-payload (or mid-header) must fail loudly,
        never emit a short payload under a full content_length."""
        from crawl4ai_spark.operators.sinks import parse_warc
        import pytest as _pytest

        full = ("WARC/1.0\r\nWARC-Type: resource\r\n"
                "WARC-Target-URI: https://a.com/1\r\n"
                "Content-Length: 10\r\n\r\n0123456789\r\n\r\n")
        cut_payload = full[:full.index("0123") + 4]     # 6 payload octets short
        cut_header = full[:20]                           # no CRLFCRLF yet
        for bad, msg in ((cut_payload, "truncated record"),
                         (cut_header, "truncated header")):
            df = spark.createDataFrame([("s0", bad)],
                                       "stream_id string, stream string")
            with _pytest.raises(Exception, match=msg):
                parse_warc(df).collect()


def test_rel_canonical_semantics(spark):
    """Canonical folding obeys the production guards: cross-host
    declarations are ignored (the hijack vector), folds are single-hop
    (every fold target is itself self-canonical), and group counts
    balance: every page lands in exactly one effective group."""
    from crawl4ai_spark.queries.crawlops import q_rel_canonical

    rows = q_rel_canonical(spark, "/root/testdata/sf0.001").collect()
    by_id = {r.id: r for r in rows}
    for r in rows:
        if r.cross_host_ignored:
            assert r.effective_url == r.url and r.is_self
        if not r.is_self:
            # single-hop: the target page declares nothing (self-canonical)
            tgt = int(r.effective_url.rsplit("/", 1)[1])
            assert by_id[tgt].is_self
    # fold accounting: sum over distinct groups == page count
    groups = {}
    for r in rows:
        groups[r.effective_url] = r.n_folded
    assert sum(groups.values()) == len(rows)


def test_dust_params_three_outcomes(spark):
    """The miner separates the three evidence classes: session varies
    freely and never changes the digest (irrelevant), page changes the
    digest in-group (violations > 0, not irrelevant), id never varies
    within its groups (support 0 — no rule either way)."""
    from crawl4ai_spark.queries.crawlops import q_dust_params

    rows = {(r.host, r.param): r
            for r in q_dust_params(spark, "/root/testdata/sf0.01").collect()}
    for host in ("host0.example.com", "host1.example.com"):
        s, p, i = rows[(host, "session")], rows[(host, "page")], rows[(host, "id")]
        assert s.irrelevant and s.violations == 0 and s.support >= 5
        assert (not p.irrelevant) and p.violations > 0
        assert i.support == 0 and not i.irrelevant


def test_revisit_304_accounting(spark):
    """Bandwidth ledger balances per host: saved + transferred == full,
    and the 304 rate reflects the synthesized 1-in-4 mutation."""
    from crawl4ai_spark.queries.crawlops import q_revisit_304

    for r in q_revisit_304(spark, "/root/testdata/sf0.01").collect():
        assert r.n_modified + r.n_not_modified == r.n_urls
        assert 0 < r.n_modified < r.n_urls
        assert 0.0 < r.saved_frac < 1.0
        assert r.bytes_saved <= r.bytes_full


def test_hreflang_reciprocity_classes(spark):
    """The validator separates the three annotation classes the fixture
    builds: intact clusters are fully reciprocal; every 5th cluster's
    en-de pair drops BOTH directions (en omits de, so de's annotation
    to en is one-way) while en-fr and de-fr survive; annotations into
    phantom pages are never reciprocated."""
    from crawl4ai_spark.queries.crawlops import q_hreflang_reciprocal

    rows = {r.url: r for r in
            q_hreflang_reciprocal(spark, "/root/testdata/sf0.01").collect()}
    n_docs = 500
    full_clusters = n_docs // 3
    broken = asymmetric = intact = 0
    for url, r in rows.items():
        c = int(url.rsplit("/", 1)[1])
        if c >= full_clusters:       # tail cluster: phantom fr member
            assert not r.fully_reciprocal
            continue
        if c % 5 == 0 and r.lang == "en":
            # omitted its de link: declares 1 (fr), reciprocal 1
            assert r.n_declared == 1 and r.n_reciprocal == 1
            assert r.fully_reciprocal
            broken += 1
        elif c % 5 == 0 and r.lang == "de":
            # declares 2 but en never links back: one-way dropped
            assert r.n_declared == 2 and r.n_reciprocal == 1
            assert not r.fully_reciprocal
            asymmetric += 1
        else:
            assert r.n_declared == 2 and r.n_reciprocal == 2
            assert r.fully_reciprocal
            intact += 1
    assert broken and asymmetric and intact


def test_soft404_classes(spark):
    """Probe-match detection separates the classes exactly: every 9th
    page (the host error template + noise) is flagged with high
    Jaccard; every real page scores far below the threshold."""
    from crawl4ai_spark.queries.crawlops import (SOFT404_JACCARD,
                                                 q_soft404_detect)

    rows = q_soft404_detect(spark, "/root/testdata/sf0.01").collect()
    flagged = {r.id for r in rows if r.is_soft404}
    assert flagged == {r.id for r in rows if r.id % 9 == 0}
    for r in rows:
        if r.id % 9 == 0:
            assert r.jaccard >= SOFT404_JACCARD
        else:
            assert r.jaccard < 0.3


def test_url_alias_groups_semantics(spark):
    """Alias CC: every component elects exactly one canonical (its min
    id), membership is closed under the synthetic edge rules, and the
    redirect∪canonical union actually bridges signals (a component
    containing both edge kinds exists)."""
    from crawl4ai_spark.queries.crawlops import q_url_alias_groups

    rows = q_url_alias_groups(spark, "/root/testdata/sf0.01").collect()
    assert rows
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.canonical_id, []).append(r)
    for cid, members in by_comp.items():
        ids = {m.id for m in members}
        assert cid == min(ids)
        assert sum(1 for m in members if m.is_canonical) == 1
        for m in members:
            assert m.n_aliases == len(members)
    # membership closure: an id with a redirect edge shares its hub's
    # component; a canonical declarer shares its target's component
    comp_of = {r.id: r.canonical_id for r in rows}
    for r in rows:
        if r.id % 5 == 3:
            hub = r.id - (r.id % 100)
            assert comp_of.get(hub) == r.canonical_id
        if r.id % 3 == 1 and r.id >= 7:
            assert comp_of.get(r.id - 7) == r.canonical_id
    # the union must bridge: some component holds a redirect-edge node
    # AND a canonical-edge node that is not itself redirect-edged
    bridged = any(
        any(m.id % 5 == 3 for m in ms)
        and any(m.id % 3 == 1 and m.id >= 7 and m.id % 5 != 3 for m in ms)
        for ms in by_comp.values()
    )
    assert bridged


def test_cloaking_detect_semantics(spark):
    from crawl4ai_spark.queries import crawlops as C

    rows = C.q_cloaking_detect(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        if r.id % 17 == 0:
            # keyword-stuffed bot view shares ~no tokens with the text
            assert r.is_cloaked and r.jaccard < C.CLOAK_JACCARD
        elif r.id % 11 == 0:
            # benign dynamism (one rotating token) must NOT flag; the
            # dip scales with 1/doc-length, well above the threshold
            assert not r.is_cloaked and r.jaccard >= 0.75
        else:
            assert not r.is_cloaked and r.jaccard == 1.0


# --------------------------------------------------------------------------- #
# U5 residue (r4 verdict #6): JS hook composition order + wait_for channels
# --------------------------------------------------------------------------- #
def test_js_hook_composition_order():
    """crawl_agent.py:699-728 composes hooks in a specific, observable
    order: pre PREPENDS, post APPENDS, auth PREPENDS LAST (outermost-
    first), lazy-loading appends after everything — so the final program
    is auth ; pre ; base ; post ; lazy. compose_js_hooks must reproduce
    the concatenation byte-exactly, including joins around empties."""
    from crawl4ai_spark.config import CrawlConfig, compose_js_hooks

    cfg = CrawlConfig(
        seeds=["https://h/"], js_code="base()",
        auth_hook_js="auth()", pre_request_hook_js="pre()",
        post_request_hook_js="post()")
    assert compose_js_hooks(cfg) == "auth();\npre();\nbase();\npost()"
    # lazy script appends last, gated on enable_lazy_loading
    cfg2 = CrawlConfig(
        seeds=["https://h/"], js_code="base()", auth_hook_js="auth()",
        enable_lazy_loading=True)
    assert compose_js_hooks(cfg2, lazy_load_js="lazy()") == "auth();\nbase();\nlazy()"
    assert compose_js_hooks(cfg2) == "auth();\nbase()"  # no lazy script given
    # the reference joins even around an empty base (existing_js or "")
    cfg3 = CrawlConfig(seeds=["https://h/"], pre_request_hook_js="pre()")
    assert compose_js_hooks(cfg3) == "pre();\n"
    # order sensitivity: auth-before-pre differs from pre-before-auth —
    # i.e. the composition is NOT a sorted merge, it is the reference's
    # exact wrap order
    cfg4 = CrawlConfig(
        seeds=["https://h/"], js_code="b()",
        auth_hook_js="A()", pre_request_hook_js="P()")
    assert compose_js_hooks(cfg4) == "A();\nP();\nb()"


def test_wait_for_prefix_validated():
    from crawl4ai_spark.config import CrawlConfig

    with pytest.raises(ValueError, match="css:"):
        CrawlConfig(seeds=["https://h/"], multi_step_wait_for=".more-item")
    CrawlConfig(seeds=["https://h/"], multi_step_wait_for="css:.x")
    CrawlConfig(seeds=["https://h/"], multi_step_wait_for="js:window.y")


def test_wait_for_channels_distinct_and_deterministic(spark):
    """The css: channel is a per-DOC structural die — a doc either
    reveals at EVERY step or at none — while js: and the legacy ''
    channel roll per step; different channels give different (but each
    deterministic) reveal schedules over the same corpus."""
    from crawl4ai_spark.fixtures import VirtualCorpus, doc_url

    vc = VirtualCorpus(n_docs=400, n_hosts=8)
    base = spark.range(300).select(
        doc_url(F.col("id") + 90, 400, 8).alias("url"))

    def sizes(steps, wait_for):
        df = vc.fetch(base, steps=steps, wait_for=wait_for)
        return {r.url: r.n for r in
                df.select("url", F.size("spans").alias("n")).collect()}

    s0 = sizes(0, "")
    for ch in ("", "css:.more-item", "js:window.__loaded"):
        a = sizes(2, ch)
        b = sizes(2, ch)
        assert a == b, ch                       # deterministic per channel
        assert all(a[u] >= s0[u] for u in s0)   # prefix-extension holds
    css1 = sizes(1, "css:.more-item")
    css2 = sizes(2, "css:.more-item")
    js2 = sizes(2, "js:window.__loaded")
    legacy2 = sizes(2, "")
    # distinct channels -> distinct schedules on this corpus
    assert css2 != js2 and js2 != legacy2
    # structural semantics: a doc that timed out at step 1 under css:
    # lacks the selector target and times out at EVERY later step too
    for u in s0:
        if css1[u] == s0[u]:
            assert css2[u] == s0[u], u
        else:
            assert css2[u] > css1[u], u  # satisfying docs reveal each step
    # different css selectors roll different per-doc dies
    assert sizes(2, "css:.other") != css2
