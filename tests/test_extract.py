"""HTML parse + extraction tests (S3/S4, E1/E2, P5/P10, E8)."""

from __future__ import annotations

import json

from crawl4ai_spark.operators.extract import (
    css_select,
    extract_with_schema,
    html_to_spans,
    parse_html,
    read_raw_html,
    xpath_select,
)

HTML = """
<html><head><title>T</title><style>.x{}</style></head>
<body>
  <h1>Main Title</h1>
  <p class="intro">Hello <b>world</b></p>
  <div id="nav"><a href="/a">Link A</a><a href="/b" class="ext">Link B</a></div>
  <img src="/i.png" alt="pic">
  <video src="/v.mp4"></video>
  <script>var x=1;</script>
  <form><input name="q"></form>
  <iframe srcdoc="&lt;p&gt;inner&lt;/p&gt;"></iframe>
  <ul><li class="item">one</li><li class="item">two</li></ul>
</body></html>
"""


class TestHtmlToSpans:
    def test_span_sequence(self):
        spans = html_to_spans(HTML)
        kinds = [s["kind"] for s in spans]
        assert "heading" in kinds and "link" in kinds and "image" in kinds and "media" in kinds
        h = next(s for s in spans if s["kind"] == "heading")
        assert h["text"] == "Main Title"
        assert [s["offset"] for s in spans] == list(range(len(spans)))

    def test_excluded_tags_dropped(self):
        spans = html_to_spans(HTML)
        assert not any("var x=1" in (s["text"] or "") for s in spans)
        assert not any(".x{}" in (s["text"] or "") for s in spans)

    def test_remove_forms(self):
        with_form = html_to_spans("<form><p>inside</p></form><p>out</p>")
        no_form = html_to_spans("<form><p>inside</p></form><p>out</p>", remove_forms=True)
        assert any(s["text"] == "inside" for s in with_form)
        assert not any(s["text"] == "inside" for s in no_form)

    def test_iframe_merge(self):
        spans = html_to_spans(HTML, process_iframes=True)
        assert any(s["text"] == "inner" for s in spans)
        spans_off = html_to_spans(HTML, process_iframes=False)
        assert not any(s["text"] == "inner" for s in spans_off)

    def test_link_and_media_refs(self):
        spans = html_to_spans(HTML)
        links = [s for s in spans if s["kind"] == "link"]
        assert {s["media_ref"] for s in links} == {"/a", "/b"}
        vid = next(s for s in spans if s["kind"] == "media")
        assert vid["media_ref"] == "/v.mp4"

    def test_keep_attrs_whitelist(self):
        """P10: with a keep_attrs whitelist, stripped attributes stop
        feeding the extraction (img src gone, href kept)."""
        spans = html_to_spans(HTML, keep_attrs=["href"])
        links = [s for s in spans if s["kind"] == "link"]
        assert {s["media_ref"] for s in links} == {"/a", "/b"}
        img = next(s for s in spans if s["kind"] == "image")
        assert img["media_ref"] is None  # src stripped
        assert img["text"] == ""  # alt stripped too
        # default (None) keeps everything
        img2 = next(s for s in html_to_spans(HTML) if s["kind"] == "image")
        assert img2["media_ref"] == "/i.png"

    def test_keep_data_attributes(self):
        h = '<div data-x="1" id="d"><a href="/z" data-k="v">z</a></div>'
        from crawl4ai_spark.operators.extract import filter_attrs, parse_html

        root = filter_attrs(parse_html(h), ["id"], keep_data_attributes=True)
        d = next(n for n in root.walk() if n.tag == "div")
        a = next(n for n in root.walk() if n.tag == "a")
        assert d.attrs == {"data-x": "1", "id": "d"}
        assert a.attrs == {"data-k": "v"}  # href stripped, data-* kept

    def test_iframe_src_span(self):
        """E8: src-only iframes surface as iframe spans when
        process_iframes is on (resolved later by merge_iframes_by_src)."""
        h = '<p>a</p><iframe src="https://x.com/child"></iframe><p>b</p>'
        spans = html_to_spans(h, process_iframes=True)
        fr = [s for s in spans if s["kind"] == "iframe"]
        assert len(fr) == 1 and fr[0]["media_ref"] == "https://x.com/child"
        assert not [s for s in html_to_spans(h) if s["kind"] == "iframe"]


class TestCss:
    def test_selectors(self):
        root = parse_html(HTML)
        assert len(css_select(root, "li.item")) == 2
        assert css_select(root, "#nav a")[0].attrs["href"] == "/a"
        assert css_select(root, "p.intro")[0].text() == "Hello world"
        assert css_select(root, "a.ext")[0].text() == "Link B"
        assert css_select(root, "[href=/b]")[0].tag == "a"


class TestXpath:
    def test_selectors(self):
        root = parse_html(HTML)
        assert len(xpath_select(root, "//li")) == 2
        assert xpath_select(root, "//div[@id='nav']/a/@href") == ["/a", "/b"]
        assert xpath_select(root, "//h1/text()") == ["Main Title"]
        assert xpath_select(root, "//p[@class='intro']")[0].text() == "Hello world"


class TestSchemaExtraction:
    SCHEMA = {
        "baseSelector": "li.item",
        "fields": [{"name": "label", "selector": "*", "type": "text"}],
    }

    def test_css_schema(self):
        rows = extract_with_schema(HTML, {
            "baseSelector": "#nav",
            "fields": [
                {"name": "first", "selector": "a", "type": "text"},
                {"name": "href", "selector": "a", "type": "attribute", "attribute": "href"},
            ],
        })
        assert rows == [{"first": "Link A", "href": "/a"}]

    def test_xpath_schema(self):
        rows = extract_with_schema(HTML, {
            "baseSelector": "//div[@id='nav']",
            "fields": [{"name": "links", "selector": "//a/@href", "type": "text"}],
        }, mode="xpath")
        assert rows == [{"links": "/a"}]


def test_raw_source_spark(spark):
    df = read_raw_html(spark, [HTML, "<p>tiny</p>"])
    rows = {r.doc_id: r.spans for r in df.collect()}
    assert len(rows) == 2
    spans0 = rows["raw://0"]
    assert any(s.kind == "heading" and s.text == "Main Title" for s in spans0)
    assert [s.offset for s in spans0] == list(range(len(spans0)))
    # span-sequence equality vs the pure-Python parser (per-row invariant)
    want = html_to_spans(HTML)
    got = [{"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset} for s in spans0]
    assert got == want


def test_extraction_udf_spark(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.extract import extraction_udf

    df = spark.createDataFrame([(HTML,)], ["html"])
    schema = {
        "baseSelector": "li.item",
        "fields": [{"name": "label", "selector": "*", "type": "text"}],
    }
    out = df.select(extraction_udf(schema)(F.col("html")).alias("ex")).first().ex
    assert json.loads(out) == [{"label": "one"}, {"label": "two"}]


def test_merge_iframes_by_src_spark(spark):
    """E8: iframe spans resolve against the corpus — the child document's
    spans are spliced at the iframe position with contiguous offsets;
    unresolvable iframes keep their span."""
    from crawl4ai_spark.operators.extract import merge_iframes_by_src

    parent = "<p>before</p><iframe src='doc://child'></iframe><p>after</p>"
    child = "<h1>Child Title</h1><p>child body</p>"
    orphan = "<p>x</p><iframe src='doc://missing'></iframe>"
    df = read_raw_html(spark, [parent, child, orphan], process_iframes=True)
    from pyspark.sql import functions as F

    df = df.withColumn(
        "doc_id",
        F.when(F.col("doc_id") == "raw://1", "doc://child").otherwise(F.col("doc_id")),
    )
    merged = {r.doc_id: [dict(kind=s.kind, text=s.text, offset=s.offset) for s in r.spans]
              for r in merge_iframes_by_src(df).collect()}
    p = merged["raw://0"]
    assert [s["text"] for s in p] == ["before", "Child Title", "child body", "after"]
    assert [s["offset"] for s in p] == [0, 1, 2, 3]
    assert [s["kind"] for s in p] == ["text", "heading", "text", "text"]
    o = merged["raw://2"]
    assert any(s["kind"] == "iframe" for r in [o] for s in r), o


# --------------------------------------------------------------------------- #
# round 3: srcset/picture, selector breadth, nested schemas, empty-spans merge
# --------------------------------------------------------------------------- #
SRCSET_HTML = """
<body>
  <img src="/base.png" srcset="/small.png 1x, /big.png 2x" alt="hero">
  <picture>
    <source srcset="/p1.webp 640w, /p2.webp 1280w">
    <source src="/p3.jpg">
    <img src="/fallback.jpg" alt="pic">
  </picture>
</body>
"""


class TestSrcset:
    def test_img_srcset_variants(self):
        spans = html_to_spans(SRCSET_HTML)
        imgs = [s for s in spans if s["kind"] == "image"]
        refs = [s["media_ref"] for s in imgs]
        assert "/base.png" in refs and "/small.png" in refs and "/big.png" in refs
        hero = [s for s in imgs if s["media_ref"] in ("/small.png", "/big.png")]
        assert all(s["text"] == "hero" for s in hero)  # variants carry the alt

    def test_picture_sources_and_fallback(self):
        spans = html_to_spans(SRCSET_HTML)
        refs = [s["media_ref"] for s in spans if s["kind"] == "image"]
        for r in ("/p1.webp", "/p2.webp", "/p3.jpg", "/fallback.jpg"):
            assert r in refs, r
        # document order: picture sources before the img fallback
        assert refs.index("/p1.webp") < refs.index("/fallback.jpg")

    def test_offsets_stay_dense(self):
        spans = html_to_spans(SRCSET_HTML)
        assert [s["offset"] for s in spans] == list(range(len(spans)))


NESTED_HTML = """
<body>
  <section class="charge-methodology">
    <div class="w-tab-content">
      <div><h3 class="heading-50">Sec1</h3>
        <div class="course"><span class="name">A</span><img class="icon" src="/a.png"></div>
        <div class="course"><span class="name">B</span><img class="icon" src="/b.png"></div>
      </div>
      <div class="deep"><div><h3 class="heading-50">NotChild</h3></div></div>
    </div>
  </section>
  <div data-role="x" class="tagged">has-attr</div>
</body>
"""


class TestSelectorBreadth:
    def test_child_combinator(self):
        root = parse_html(NESTED_HTML)
        # children of .w-tab-content only — not the h3 nested two deep
        hits = css_select(root, ".w-tab-content > div")
        assert len(hits) == 2
        direct = css_select(root, ".w-tab-content > div > h3.heading-50")
        assert [h.text() for h in direct] == ["Sec1"]

    def test_attr_presence(self):
        root = parse_html(NESTED_HTML)
        hits = css_select(root, "div[data-role]")
        assert len(hits) == 1 and hits[0].text() == "has-attr"
        assert css_select(root, "div[data-role=x]")[0].text() == "has-attr"
        assert css_select(root, "[data-role='x'].tagged")[0].text() == "has-attr"

    def test_nested_schema(self):
        schema = {
            "baseSelector": "section.charge-methodology .w-tab-content > div",
            "fields": [
                {"name": "title", "selector": "h3.heading-50", "type": "text"},
                {
                    "name": "courses", "selector": ".course", "type": "list",
                    "fields": [
                        {"name": "name", "selector": ".name", "type": "text"},
                        {"name": "icon", "selector": ".icon", "type": "attribute",
                         "attribute": "src"},
                    ],
                },
                {
                    "name": "first_course", "selector": ".course", "type": "nested",
                    "fields": [{"name": "name", "selector": ".name", "type": "text"}],
                },
            ],
        }
        rows = extract_with_schema(NESTED_HTML, schema)
        assert len(rows) == 2
        assert rows[0]["title"] == "Sec1"
        assert rows[0]["courses"] == [
            {"name": "A", "icon": "/a.png"}, {"name": "B", "icon": "/b.png"}]
        assert rows[0]["first_course"] == {"name": "A"}
        assert rows[1]["courses"] == [] and rows[1]["first_course"] is None


GRAMMAR_HTML = """
<body>
  <ul id="menu">
    <li class="item">one</li>
    <li class="item special">two</li>
    <li class="item">three</li>
    <li class="item">four</li>
    <li class="item">five</li>
  </ul>
  <h2>Title</h2>
  <p class="lead">lead para</p>
  <p>second para</p>
  <p>third para</p>
  <a href="https://cdn.example.com/pkg.tar.gz">tarball</a>
  <a href="https://example.com/docs/page.html">docs</a>
  <a href="/local/path">local</a>
  <div rel="nofollow sponsored">tagged-rel</div>
</body>
"""


class TestSelectorGrammarR4:
    """r3 verdict item 4: sibling combinators, attribute substring
    operators, :nth-child — the commonest forms in real JsonCss schemas
    (original-README.md:353-387)."""

    def setup_method(self):
        self.root = parse_html(GRAMMAR_HTML)

    def test_adjacent_sibling(self):
        hits = css_select(self.root, "h2 + p")
        assert [h.text() for h in hits] == ["lead para"]

    def test_general_sibling(self):
        hits = css_select(self.root, "h2 ~ p")
        assert [h.text() for h in hits] == ["lead para", "second para", "third para"]
        # anchored further: .lead ~ p skips the lead itself
        hits2 = css_select(self.root, "p.lead ~ p")
        assert [h.text() for h in hits2] == ["second para", "third para"]

    def test_attr_prefix_suffix_substring(self):
        assert [a.text() for a in css_select(self.root, "a[href^=https]")] == ["tarball", "docs"]
        assert [a.text() for a in css_select(self.root, "a[href$='.html']")] == ["docs"]
        assert [a.text() for a in css_select(self.root, "a[href*=example.com]")] == ["tarball", "docs"]
        assert [d.text() for d in css_select(self.root, "div[rel~=sponsored]")] == ["tagged-rel"]
        assert css_select(self.root, "div[rel~=sponsor]") == []  # word, not substring

    def test_nth_child(self):
        assert [n.text() for n in css_select(self.root, "#menu li:nth-child(2)")] == ["two"]
        assert [n.text() for n in css_select(self.root, "#menu li:nth-child(odd)")] == ["one", "three", "five"]
        assert [n.text() for n in css_select(self.root, "#menu li:nth-child(2n)")] == ["two", "four"]
        assert [n.text() for n in css_select(self.root, "#menu li:nth-child(2n+1)")] == ["one", "three", "five"]
        assert [n.text() for n in css_select(self.root, "#menu li:nth-child(-n+2)")] == ["one", "two"]
        assert [n.text() for n in css_select(self.root, "li:first-child")] == ["one"]
        assert [n.text() for n in css_select(self.root, "li:last-child")] == ["five"]

    def test_unknown_pseudo_safe_default(self):
        assert css_select(self.root, "li:hover") == []

    def test_not_pseudo(self):
        hits = css_select(self.root, "#menu li:not(.special)")
        assert [h.text() for h in hits] == ["one", "three", "four", "five"]
        # compound argument
        assert [h.text() for h in css_select(self.root, "p:not(.lead)")] == [
            "second para", "third para"]
        # argument with its own parens is out of subset → safe no-match
        assert css_select(self.root, "li:not(:nth-child(2))") == []
        assert css_select(self.root, "li:not()") == []

    def test_of_type_pseudos(self):
        # h2 is the 2nd element child of body but the 1st h2
        assert [h.text() for h in css_select(self.root, "h2:first-of-type")] == ["Title"]
        assert css_select(self.root, "h2:first-child") == []
        assert [h.text() for h in css_select(self.root, "p:nth-of-type(2)")] == ["second para"]
        assert [h.text() for h in css_select(self.root, "a:last-of-type")] == ["local"]
        assert [h.text() for h in css_select(self.root, "ul:only-child")] == []
        assert [h.text() for h in css_select(self.root, "#menu li:nth-of-type(odd)")] == [
            "one", "three", "five"]

    def test_whitespace_inside_protected_regions(self):
        # spec-legal spaced an+b form, and attr values containing spaces,
        # must not be split as descendant combinators
        assert [n.text() for n in css_select(self.root, "#menu li:nth-child(2n + 1)")] == [
            "one", "three", "five"]
        root = parse_html('<p title="x y">a</p><p title="xy">b</p>')
        assert [h.text() for h in css_select(root, 'p[title="x y"]')] == ["a"]
        # protected '+' stays protected while real combinators still split
        root2 = parse_html('<h2>t</h2><p title="a+b">hit</p><p>miss</p>')
        assert [h.text() for h in css_select(root2, 'h2 + p[title="a+b"]')] == ["hit"]

    def test_dash_match_operator(self):
        root = parse_html('<p lang="en-US">a</p><p lang="en">b</p><p lang="fr">c</p>'
                          '<p lang="ens">d</p>')
        assert [h.text() for h in css_select(root, "p[lang|=en]")] == ["a", "b"]


class TestXPathGrammarR4:
    """XPath predicate breadth: positional, last(), contains(),
    attribute presence, chained predicates."""

    def setup_method(self):
        self.root = parse_html(GRAMMAR_HTML)

    def test_positional_and_last(self):
        assert [n.text() for n in xpath_select(self.root, "//ul/li[2]")] == ["two"]
        assert [n.text() for n in xpath_select(self.root, "//ul/li[last()]")] == ["five"]
        assert xpath_select(self.root, "//ul/li[9]") == []
        assert xpath_select(self.root, "//ul/li[2]/text()") == ["two"]

    def test_contains_attr_and_text(self):
        assert xpath_select(self.root, "//a[contains(@href,'example.com')]/@href") == [
            "https://cdn.example.com/pkg.tar.gz", "https://example.com/docs/page.html"]
        assert [n.text() for n in xpath_select(self.root, "//li[contains(text(),'hre')]")] == ["three"]

    def test_attr_presence(self):
        assert [n.text() for n in xpath_select(self.root, "//div[@rel]")] == ["tagged-rel"]
        assert xpath_select(self.root, "//p[@rel]") == []

    def test_chained_predicates(self):
        # class filter then position-within-filtered
        assert [n.text() for n in
                xpath_select(self.root, "//ul/li[contains(@class,'item')][2]")] == ["two"]
        assert [n.text() for n in
                xpath_select(self.root, "//li[contains(@class,'special')][last()]")] == ["two"]

    def test_unknown_predicate_safe_default(self):
        assert xpath_select(self.root, "//li[position() mod 2 = 0]") == []

    def test_schema_with_grammar_forms(self):
        schema = {
            "baseSelector": "ul#menu",
            "fields": [
                {"name": "second", "selector": "li:nth-child(2)", "type": "text"},
                {"name": "after_first", "selector": "li:first-child + li", "type": "text"},
            ],
        }
        rows = extract_with_schema(GRAMMAR_HTML, schema)
        assert rows == [{"second": "two", "after_first": "two"}]


def test_merge_iframes_empty_spans_survive(spark):
    """ADVICE r2: a doc with an empty spans array must survive the merge
    with empty spans, not be dropped by the explode."""
    from pyspark.sql import functions as F
    from crawl4ai_spark.operators.extract import merge_iframes_by_src

    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    docs = spark.createDataFrame(
        [("doc://a", [("text", "x", None, 0), ("iframe", "", "doc://b", 1)]),
         ("doc://b", [("text", "y", None, 0)]),
         ("doc://empty", [])],
        schema,
    )
    merged = {r["doc_id"]: r["spans"] for r in merge_iframes_by_src(docs).collect()}
    assert set(merged) == {"doc://a", "doc://b", "doc://empty"}
    assert merged["doc://empty"] == []
    assert [s["text"] for s in merged["doc://a"]] == ["x", "y"]


def test_bm25_fit_ladder(spark):
    """P2: BM25 span filter keeps query-bearing spans and feeds the E5
    fit ladder (empty fit output falls back to raw markdown)."""
    from pyspark.sql import functions as F
    from crawl4ai_spark.operators import markdown as M

    schema = "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    docs = spark.createDataFrame(
        [("d1", [("text", "spark engine overview", None, 0),
                 ("text", "unrelated words entirely", None, 1),
                 ("heading", "spark data guide", None, 2)]),
         ("d2", [("text", "nothing about the topic", None, 0)])],
        schema,
    )
    fit = M.bm25_fit_spans("spans", "spark data", threshold=0.1)
    out = docs.select(
        "doc_id",
        F.size(fit).alias("n_fit"),
        M.fit_ladder(M.spans_to_markdown(fit), M.spans_to_markdown("spans")).alias("md"),
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows["d1"]["n_fit"] == 2  # both spark-bearing spans kept, filler dropped
    assert "unrelated" not in rows["d1"]["md"]
    assert rows["d2"]["n_fit"] == 0
    assert "nothing about the topic" in rows["d2"]["md"]  # ladder fallback


class TestSelectorList:
    """Selector lists 'a, b' (CSS grouping): deduped union in document
    order; commas inside [attr] / pseudo parens never split."""

    def setup_method(self):
        self.root = parse_html(GRAMMAR_HTML)

    def test_union_document_order(self):
        hits = css_select(self.root, "h2, p.lead, li.special")
        assert [h.tag for h in hits] == ["li", "h2", "p"]
        assert [h.text() for h in hits] == ["two", "Title", "lead para"]

    def test_overlapping_groups_dedupe(self):
        # 'p' matches all three paras; 'p.lead' re-matches the first
        hits = css_select(self.root, "p, p.lead")
        assert [h.text() for h in hits] == [
            "lead para", "second para", "third para"]

    def test_protected_commas_and_whitespace(self):
        one = css_select(self.root, ' li:nth-child(2) , a[href$=".tar.gz"] ')
        assert [h.text() for h in one] == ["two", "tarball"]

    def test_group_with_combinators(self):
        hits = css_select(self.root, "h2 + p, #menu > li.special")
        assert [h.text() for h in hits] == ["two", "lead para"]

    def test_single_group_with_stray_comma(self):
        # 'h1,' must tolerate the trailing comma exactly like 'h1, h2,'
        one = parse_html("<body><h2>Title</h2></body>")
        assert [h.text() for h in css_select(one, "h2,")] == ["Title"]
        assert css_select(one, ",") == []


class TestSelectorGrammarR4S2:
    """Session-2 grammar growth: :nth-last-child / :nth-last-of-type /
    :empty / the [attr=v i] case-insensitivity flag."""

    def setup_method(self):
        self.root = parse_html(
            '<body><ul><li>a</li><li>b</li><li>c</li><li>d</li></ul>'
            '<div Lang="EN-us"></div><p>text</p><span></span></body>')

    def test_nth_last_child(self):
        hits = css_select(self.root, "li:nth-last-child(2)")
        assert [h.text() for h in hits] == ["c"]
        odd = css_select(self.root, "li:nth-last-child(odd)")
        assert [h.text() for h in odd] == ["b", "d"]

    def test_nth_last_of_type(self):
        assert [h.text() for h in
                css_select(self.root, "li:nth-last-of-type(1)")] == ["d"]

    def test_empty(self):
        hits = css_select(self.root, ":empty")
        assert {h.tag for h in hits} == {"div", "span"}
        assert not css_select(self.root, "p:empty")

    def test_attr_case_insensitive_flag(self):
        assert not css_select(self.root, '[lang="en-US"]')
        hits = css_select(self.root, '[lang="en-US" i]')
        assert [h.tag for h in hits] == ["div"]
        assert [h.tag for h in css_select(self.root, "[lang^=EN i]")] == ["div"]


class TestXpathUnion:
    def setup_method(self):
        self.root = parse_html(GRAMMAR_HTML)

    def test_node_union_document_order(self):
        hits = xpath_select(self.root, "//h2 | //p[@class='lead']")
        assert [h.tag for h in hits] == ["h2", "p"]
        # overlap dedupes
        hits2 = xpath_select(self.root, "//p | //p[@class='lead']")
        assert [h.text() for h in hits2] == [
            "lead para", "second para", "third para"]

    def test_attr_union_keeps_branch_order(self):
        vals = xpath_select(self.root, "//a/@href | //div/@rel")
        assert vals == [
            "https://cdn.example.com/pkg.tar.gz",
            "https://example.com/docs/page.html",
            "/local/path",
            "nofollow sponsored",
        ]

    def test_shielded_pipe_in_quotes(self):
        # a literal '|' inside a predicate string must not split
        root = parse_html('<body><a title="x|y">t</a></body>')
        hits = xpath_select(root, "//a[contains(@title,'x|y')]")
        assert [h.text() for h in hits] == ["t"]

    def test_empty_whitespace_is_a_child(self):
        # CSS/cssselect: '<div> </div>' is NOT :empty
        r = parse_html("<body><div> </div><div></div></body>")
        hits = css_select(r, "div:empty")
        assert len(hits) == 1

    def test_xpath_union_stray_pipe(self):
        # a trailing '|' must not resolve to the [document] root
        r = parse_html("<body><h2>T</h2></body>")
        assert [h.tag for h in xpath_select(r, "//h2 | ")] == ["h2"]
        assert xpath_select(r, " | ") == []
