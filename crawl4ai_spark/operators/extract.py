"""HTML parsing + schema extraction operators (S3/S4, E1/E2, P5/P10, E8).

The reference drives bs4/lxml through the crawl4ai library
(LXMLWebScrapingStrategy at crawl_agent.py:656, JsonCss/JsonXPath
strategies at crawl_agent.py:554-570); neither bs4 nor lxml exists in
this container, so the engine carries a small stdlib ``html.parser``
DOM (tree of tag/attrs/children) plus:

* ``html_to_spans`` — HTML → the input_hint span sequence, honoring the
  excluded-tags list (default script/style/svg/noscript —
  crawl_agent.py:159), ``remove_forms``/``keep_attrs`` (P10,
  crawl_agent.py:181-183) and ``process_iframes`` (E8: srcdoc content
  is merged inline, crawl_agent.py:160).
* ``css_select`` — selector subset: ``tag``, ``.class``, ``#id``,
  ``tag.class``, descendant chains ("div p a"), child ``>`` and sibling
  ``+``/``~`` combinators, selector lists ``a, b``, ``[attr]``/
  ``[attr=v]`` plus the substring operators
  ``^=``/``$=``/``*=``/``~=``/``|=`` and the case-insensitivity flag
  ``[attr=v i]``, the structural pseudos
  ``:nth-child(an+b|odd|even|k)``/``:nth-last-child``/``:first-child``/
  ``:last-child``/``:only-child``/``:empty`` and the of-type twins
  ``:nth-of-type``/``:nth-last-of-type``/``:first-of-type``/
  ``:last-of-type``, and ``:not(compound)`` (argument may not itself
  carry pseudo parens).
* ``xpath_select`` — subset: ``//tag``, ``/a/b`` absolute chains,
  chained predicates ``[@attr='v']``/``[@attr]``/
  ``[contains(@attr,'v')]``/``[contains(text(),'v')]``/``[n]``/
  ``[last()]``, trailing ``/@attr`` and ``/text()``, and union
  expressions ``a | b``.
* ``extract_with_schema`` — JsonCss/JsonXPath schema shape
  (baseSelector + fields[{name, selector, type: text|attribute|html}])
  applied per document; Spark operator = Arrow-batched pandas UDF
  returning the extraction as a JSON string column (the reference's
  ``extracted_content`` is JSON too).

File-/raw-source parity (test_file_url.py:6-98): ``read_html_files``
reads ``file://`` fixtures via spark.read wholetext; ``read_raw_html``
wraps inline strings — both land in the same parse stage.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EXCLUDED_TAGS = ["script", "style", "svg", "noscript"]  # crawl_agent.py:159
_VOID = {"br", "hr", "img", "input", "meta", "link", "source", "area", "base", "col", "embed", "track", "wbr"}
_HEADINGS = {f"h{i}" for i in range(1, 7)}
_MEDIA_TAGS = {"video", "audio", "embed"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "text_parts",
                 "has_char_data")

    def __init__(self, tag: str, attrs: dict, parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node] = []
        self.parent = parent
        self.text_parts: list[str] = []
        # CSS :empty semantics: ANY character data (even whitespace)
        # makes an element non-empty, though whitespace-only runs are
        # dropped from text_parts at parse time
        self.has_char_data = False

    def text(self) -> str:
        parts = list(self.text_parts)
        for c in self.children:
            parts.append(c.text())
        return re.sub(r"\s+", " ", " ".join(p for p in parts if p)).strip()

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        n = self.cur
        while n is not self.root:
            if n.tag == tag:
                self.cur = n.parent
                return
            n = n.parent

    def handle_data(self, data):
        if data:
            self.cur.has_char_data = True
        if data.strip():
            self.cur.text_parts.append(data)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html or "")
    return b.root


# --------------------------------------------------------------------------- #
# HTML → spans (S3/S4 parse stage)
# --------------------------------------------------------------------------- #
def filter_attrs(root: Node, keep_attrs: list[str], keep_data_attributes: bool = False) -> Node:
    """P10 — HTML attribute filtering (reference config keep_attrs /
    keep_data_attributes, crawl_agent.py:181-183): strip every attribute
    not in the whitelist; ``keep_data_attributes`` additionally keeps
    ``data-*``. Mutates and returns the tree."""
    keep = set(keep_attrs)
    for n in root.walk():
        n.attrs = {
            k: v for k, v in n.attrs.items()
            if k in keep or (keep_data_attributes and k.startswith("data-"))
        }
    return root


def _srcset_urls(srcset: str | None) -> list[str]:
    """Candidate URLs from a srcset value ('url 1x, url2 2x, url3 640w'):
    comma-separated candidates, URL = first whitespace-token of each."""
    if not srcset:
        return []
    out = []
    for cand in srcset.split(","):
        toks = cand.strip().split()
        if toks:
            out.append(toks[0])
    return out


def html_to_spans(
    html: str,
    excluded_tags: list[str] | None = None,
    remove_forms: bool = False,
    process_iframes: bool = False,
    keep_attrs: list[str] | None = None,
    keep_data_attributes: bool = False,
) -> list[dict]:
    """HTML → span sequence. ``keep_attrs`` (P10): when given, the DOM's
    attributes are whitelist-filtered BEFORE extraction, so e.g.
    keep_attrs=['href'] preserves link targets but drops img src
    (media_ref None); None = keep everything. ``process_iframes`` (E8):
    srcdoc content is parsed and merged inline; src-only iframes emit an
    ``iframe`` span carrying the src so ``merge_iframes_by_src`` can
    splice the referenced document in an in-corpus join."""
    excluded = set(excluded_tags if excluded_tags is not None else EXCLUDED_TAGS)
    if remove_forms:
        excluded.add("form")
    spans: list[dict] = []

    def emit(kind: str, text: str, ref: str | None):
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": len(spans)})

    def visit(node: Node):
        if node.tag in excluded:
            return
        t = node.tag
        if t in _HEADINGS:
            emit("heading", node.text(), None)
            return
        if t == "a":
            emit("link", node.text(), node.attrs.get("href"))
            return
        if t == "img":
            alt = node.attrs.get("alt") or ""
            src = node.attrs.get("src")
            emit("image", alt, src)
            # responsive variants (original-README.md:139: srcset support):
            # one image span per distinct srcset candidate URL
            for variant in _srcset_urls(node.attrs.get("srcset")):
                if variant != src:
                    emit("image", alt, variant)
            return
        if t == "picture":
            # <picture>: <source srcset/src> variants + the <img> fallback
            # (original-README.md:139: picture support). Variants emit in
            # document order before the fallback img, mirroring the DOM.
            seen: set[str] = set()
            img = None
            for c in node.children:
                if c.tag == "source":
                    for variant in _srcset_urls(c.attrs.get("srcset")) or (
                        [c.attrs["src"]] if c.attrs.get("src") else []
                    ):
                        if variant not in seen:
                            seen.add(variant)
                            emit("image", "", variant)
                elif c.tag == "img" and img is None:
                    img = c
            if img is not None:
                visit(img)
            return
        if t in _MEDIA_TAGS:
            src = node.attrs.get("src")
            if not src:
                for c in node.children:
                    if c.tag == "source" and c.attrs.get("src"):
                        src = c.attrs["src"]
                        break
            emit("media", node.text(), src)
            return
        if t == "iframe":
            if process_iframes:
                if node.attrs.get("srcdoc"):
                    for child in parse_html(node.attrs["srcdoc"]).children:
                        visit(child)
                elif node.attrs.get("src"):
                    emit("iframe", node.text(), node.attrs["src"])
            return
        own = re.sub(r"\s+", " ", " ".join(node.text_parts)).strip()
        if own:
            emit("text", own, None)
        for c in node.children:
            visit(c)

    root = parse_html(html)
    if keep_attrs is not None:
        filter_attrs(root, keep_attrs, keep_data_attributes)
    visit(root)
    return spans


# --------------------------------------------------------------------------- #
# CSS selector subset
# --------------------------------------------------------------------------- #
# components of a compound selector, in any order: tag/*, #id, .class,
# [attr], [attr <op> v] with op in =/^=/$=/*=/~=/|=, and structural pseudos
# :nth-child(an+b|odd|even|k) / :first-child / :last-child /
# :nth-of-type(...) / :first-of-type / :last-of-type / :only-child /
# :not(<compound without pseudo-args>) — full tokenization instead of
# one fixed-order regex. Boundary: a pseudo argument cannot itself
# contain ')' (so :not(:nth-child(2)) is out of subset → no match).
_PART_RX = re.compile(
    r"(?P<tag>^[a-zA-Z][\w-]*|^\*)|(?P<id>#[\w-]+)|(?P<cls>\.[\w-]+)"
    r"|\[(?P<ak>[\w-]+)(?:(?P<aop>[\^$*~|]?=)(?P<av>[^\]]+))?\]"
    r"|(?P<pseudo>:[\w-]+(?:\([^)]*\))?)"
)

_NTH_RX = re.compile(r"([+-]?\d*)n([+-]\s*\d+)?")


def _nth_match(arg: str, p: int) -> bool:
    """CSS an+b micro-grammar: does 1-based position p satisfy arg?
    Whitespace around the sign is spec-legal ('2n + 1') — stripped."""
    arg = arg.strip().lower().replace(" ", "")
    if arg == "odd":
        a, b = 2, 1
    elif arg == "even":
        a, b = 2, 0
    else:
        m = _NTH_RX.fullmatch(arg)
        if m:
            astr = m.group(1)
            a = 1 if astr in ("", "+") else (-1 if astr == "-" else int(astr))
            b = int((m.group(2) or "0").replace(" ", ""))
        else:
            try:
                a, b = 0, int(arg)
            except ValueError:
                return False
    if a == 0:
        return p == b
    return (p - b) % a == 0 and (p - b) // a >= 0


def _elem_position(node: Node) -> tuple[int, int]:
    """(1-based position among parent's element children, sibling count).
    Text lives in text_parts, so ``children`` is element-only already."""
    if node.parent is None:
        return 1, 1
    sibs = node.parent.children
    for i, s in enumerate(sibs):
        if s is node:
            return i + 1, len(sibs)
    return 1, len(sibs)


def _typed_position(node: Node) -> tuple[int, int]:
    """(1-based position among same-tag siblings, same-tag count) — the
    of-type axis."""
    if node.parent is None:
        return 1, 1
    sibs = [s for s in node.parent.children if s.tag == node.tag]
    for i, s in enumerate(sibs):
        if s is node:
            return i + 1, len(sibs)
    return 1, len(sibs)


def _match_pseudo(node: Node, pseudo: str) -> bool:
    name, _, arg = pseudo[1:].partition("(")
    arg = arg.rstrip(")")
    p, n = _elem_position(node)
    if name == "nth-child":
        return _nth_match(arg, p)
    if name == "nth-last-child":
        return _nth_match(arg, n - p + 1)
    if name == "first-child":
        return p == 1
    if name == "last-child":
        return p == n
    if name == "only-child":
        return n == 1
    if name == "empty":
        # CSS semantics (matching cssselect/browsers): any character
        # data, INCLUDING whitespace-only runs, makes a node non-empty
        return not node.children and not node.has_char_data
    if name in ("nth-of-type", "nth-last-of-type", "first-of-type", "last-of-type"):
        tp, tn = _typed_position(node)
        if name == "nth-of-type":
            return _nth_match(arg, tp)
        if name == "nth-last-of-type":
            return _nth_match(arg, tn - tp + 1)
        return tp == 1 if name == "first-of-type" else tp == tn
    if name == "not":
        # CSS :not() over a compound selector; argument pseudos with
        # their own parens are outside the tokenizable subset and fall
        # to the unparsable-gap safe default inside _match_simple.
        arg = arg.strip()
        return bool(arg) and not _match_simple(node, arg)
    return False  # unknown pseudo → no match (safe default)


def _match_simple(node: Node, sel: str) -> bool:
    if not sel:
        return False
    pos = 0
    for m in _PART_RX.finditer(sel):
        if m.start() != pos:
            return False  # unparsable gap → no match (safe default)
        pos = m.end()
        if m.group("tag"):
            if m.group("tag") != "*" and node.tag != m.group("tag").lower():
                return False
        elif m.group("id"):
            if node.attrs.get("id") != m.group("id")[1:]:
                return False
        elif m.group("cls"):
            if m.group("cls")[1:] not in node.classes():
                return False
        elif m.group("ak"):
            k, op, v = m.group("ak"), m.group("aop"), m.group("av")
            if v is None:  # [attr] presence test
                if k not in node.attrs:
                    return False
            else:
                got = node.attrs.get(k)
                raw = v.strip()
                # case-insensitivity flag: [attr=v i] (CSS Selectors 4);
                # unquoted values cannot contain spaces, so a trailing
                # whitespace+i is unambiguous
                ci = re.fullmatch(r"(.*?)\s+[iI]", raw, flags=re.S)
                if ci:
                    raw = ci.group(1)
                want = raw.strip("'\"")
                if got is None:
                    return False
                if ci:
                    got, want = got.lower(), want.lower()
                if op == "=":
                    ok = got == want
                elif op == "^=":
                    ok = want != "" and got.startswith(want)
                elif op == "$=":
                    ok = want != "" and got.endswith(want)
                elif op == "*=":
                    ok = want != "" and want in got
                elif op == "|=":  # dash-match: exact or "<want>-..."
                    ok = got == want or got.startswith(want + "-")
                else:  # ~= whitespace-separated word match
                    ok = want in got.split()
                if not ok:
                    return False
        elif m.group("pseudo"):
            if not _match_pseudo(node, m.group("pseudo")):
                return False
    return pos == len(sel)


def _tokenize_selector(selector: str) -> list[tuple[str, str]]:
    """→ [(combinator, simple_selector)]: combinator ' ' (descendant),
    '>' (child), '+' (next sibling), '~' (subsequent siblings); the
    first entry's combinator is ' '. Combinator characters AND spaces
    inside [attr...] or pseudo parens (e.g. [attr~=v], [title="x y"],
    [href^='a+b'], :nth-child(2n + 1)) are protected from splitting."""
    _shield = {">": "\x00", "+": "\x01", "~": "\x02", " ": "\x03"}

    def protect(m: re.Match) -> str:
        inner = m.group(0)
        for c, repl in _shield.items():
            inner = inner.replace(c, repl)
        return inner

    sel = re.sub(r"\[[^\]]*\]|\([^)]*\)", protect, selector)
    for c in ">+~":
        sel = sel.replace(c, f" {c} ")
    toks = []
    for t in sel.split():
        for c, repl in _shield.items():
            t = t.replace(repl, c)
        toks.append(t)
    out: list[tuple[str, str]] = []
    comb = " "
    for t in toks:
        if t in (">", "+", "~"):
            comb = t
            continue
        out.append((comb, t))
        comb = " "
    return out


def _split_selector_list(selector: str) -> list[str]:
    """Split a selector LIST on top-level commas ('h1, .x > li');
    commas inside [attr…] or pseudo parens are protected."""
    sel = re.sub(
        r"\[[^\]]*\]|\([^)]*\)", lambda m: m.group(0).replace(",", "\x04"),
        selector,
    )
    return [p.replace("\x04", ",").strip() for p in sel.split(",") if p.strip()]


def css_select(root: Node, selector: str) -> list[Node]:
    """CSS subset in document order: simple selectors (tag/#id/.cls/
    [attr]/[attr{=,^=,$=,*=,~=,|=}v]/:nth-child/:first-child/
    :last-child/:only-child/:nth-of-type/:first-of-type/:last-of-type/
    :not(compound), chained on one base), descendant chains, child '>',
    the sibling combinators '+' / '~', and selector lists 'a, b'
    (deduped union in document order) — reference schemas use full
    cssselect, e.g. 'section.x .y > div' (original-README.md:353-387)."""
    groups = _split_selector_list(selector)
    if not groups:
        return []
    if len(groups) > 1:
        seen: set[int] = set()
        out = []
        for g in groups:
            for n in css_select(root, g):
                if id(n) not in seen:
                    seen.add(id(n))
                    out.append(n)
        order = {id(n): i for i, n in enumerate(root.walk())}
        out.sort(key=lambda n: order.get(id(n), 1 << 30))
        return out
    # groups[0], not the original: a tolerated stray comma ('h1,') must
    # not reach the simple-selector tokenizer as part of the token
    steps = _tokenize_selector(groups[0])
    if not steps:
        return []
    matched = [n for n in root.walk() if n.tag != "[document]" and _match_simple(n, steps[0][1])]
    for comb, part in steps[1:]:
        nxt = []
        seen = set()
        for m in matched:
            if comb == ">":
                pool = m.children
            elif comb in ("+", "~"):
                if m.parent is None:
                    continue
                sibs = m.parent.children
                i = next((k for k, s in enumerate(sibs) if s is m), None)
                if i is None:
                    continue
                pool = sibs[i + 1:i + 2] if comb == "+" else sibs[i + 1:]
            else:
                pool = (d for d in m.walk() if d is not m)
            for d in pool:
                if id(d) not in seen and _match_simple(d, part):
                    nxt.append(d)
                    seen.add(id(d))
        matched = nxt
    # re-sort to document order (sibling/child hops can interleave)
    order = {id(n): i for i, n in enumerate(root.walk())}
    matched.sort(key=lambda n: order.get(id(n), 1 << 30))
    return matched


# --------------------------------------------------------------------------- #
# XPath subset
# --------------------------------------------------------------------------- #
_XP_STEP_RX = re.compile(r"^([\w*-]+|text\(\)|@[\w-]+)((?:\[[^\]]*\])*)$")
_XP_PRED_RX = re.compile(r"\[([^\]]*)\]")


def _xpath_pred(cands: list, pred: str) -> list:
    """One XPath predicate over a candidate list (subset; unknown forms
    → empty, the engine's safe default)."""
    pred = pred.strip()
    if pred == "last()":
        return cands[-1:]
    if pred.isdigit():
        i = int(pred)
        return cands[i - 1:i] if 1 <= i <= len(cands) else []
    m = re.match(r"^contains\(\s*@([\w-]+)\s*,\s*['\"]([^'\"]*)['\"]\s*\)$", pred)
    if m:
        return [n for n in cands if m.group(2) in (n.attrs.get(m.group(1)) or "")]
    m = re.match(r"^contains\(\s*text\(\)\s*,\s*['\"]([^'\"]*)['\"]\s*\)$", pred)
    if m:
        return [n for n in cands if m.group(1) in n.text()]
    m = re.match(r"^@([\w-]+)\s*=\s*['\"]([^'\"]*)['\"]$", pred)
    if m:
        return [n for n in cands if n.attrs.get(m.group(1)) == m.group(2)]
    m = re.match(r"^@([\w-]+)$", pred)
    if m:
        return [n for n in cands if m.group(1) in n.attrs]
    return []


def xpath_select(root: Node, expr: str) -> list:
    """Subset: //tag and /a/b chains with chained predicates
    [@attr='v'] / [@attr] / [contains(@attr,'v')] /
    [contains(text(),'v')] / [n] / [last()], plus trailing /@attr or
    /text(). Returns Nodes or strings (for @attr / text()).

    Union expressions ``a | b`` evaluate each branch and concatenate
    (Node hits deduped by identity and re-sorted to document order;
    string hits keep branch order — documented subset semantics).

    Positional predicates rank within each context node's candidate
    list — exact XPath semantics on the child axis; on ``//`` this is
    the per-context-descendant ranking, i.e. ``(//div)[2]`` rather than
    lxml's per-parent ``//div[2]`` (documented subset deviation)."""
    expr = expr.strip()
    # top-level union: '|' inside quoted predicate strings is shielded
    shielded = re.sub(r"'[^']*'|\"[^\"]*\"",
                      lambda m: m.group(0).replace("|", "\x05"), expr)
    if "|" in shielded:
        out: list = []
        seen_ids: set[int] = set()
        any_node = False
        for part in shielded.split("|"):
            part = part.replace("\x05", "|").strip()
            if not part:
                continue  # stray '|' must not resolve to the document root
            for h in xpath_select(root, part):
                if isinstance(h, Node):
                    any_node = True
                    if id(h) not in seen_ids:
                        seen_ids.add(id(h))
                        out.append(h)
                else:
                    out.append(h)
        if any_node:
            order = {id(n): i for i, n in enumerate(root.walk())}
            out.sort(key=lambda n: order.get(id(n), 1 << 30)
                     if isinstance(n, Node) else 1 << 30)
        return out
    steps = re.findall(r"(/{1,2})([^/]+)", expr)
    ctx: list[Node] = [root]
    for i, (axis, step) in enumerate(steps):
        last = i == len(steps) - 1
        if last and step.startswith("@"):
            return [n.attrs.get(step[1:]) for n in ctx if n.attrs.get(step[1:]) is not None]
        if last and step == "text()":
            return [n.text() for n in ctx]
        m = _XP_STEP_RX.match(step)
        if not m:
            return []
        tag, preds = m.group(1), _XP_PRED_RX.findall(m.group(2) or "")

        def hit(n: Node) -> bool:
            return tag == "*" or n.tag == tag.lower()

        nxt: list[Node] = []
        seen: set[int] = set()
        for c in ctx:
            pool = (d for d in c.walk() if d is not c) if axis == "//" else iter(c.children)
            cands = [d for d in pool if hit(d)]
            for p in preds:
                cands = _xpath_pred(cands, p)
            nxt.extend(d for d in cands if id(d) not in seen and not seen.add(id(d)))
        ctx = nxt
    return ctx


# --------------------------------------------------------------------------- #
# E1/E2: schema extraction
# --------------------------------------------------------------------------- #
def _field_value(base: Node, f: dict, select) -> object:
    """One field of a JsonCss/JsonXPath schema. Scalar types: text |
    attribute | html. Structured types (nested-schema shapes, reference
    original-README.md:353-387 / crawl4ai JsonCssExtractionStrategy):
    ``nested`` → dict of sub-fields on the first hit; ``list`` /
    ``nested_list`` → one dict of sub-fields per hit."""
    ftype = f.get("type", "text")
    hits = select(base, f["selector"]) if f.get("selector") else [base]
    if ftype in ("nested", "list", "nested_list"):
        subs = f.get("fields", [])

        def row_of(node):
            return {sf["name"]: _field_value(node, sf, select) for sf in subs}

        nodes = [h for h in hits if isinstance(h, Node)]
        if ftype == "nested":
            return row_of(nodes[0]) if nodes else None
        return [row_of(n) for n in nodes]
    if not hits:
        return None
    h = hits[0]
    if not isinstance(h, Node):
        return h
    if ftype == "attribute":
        return h.attrs.get(f.get("attribute", ""))
    return h.text()


def extract_with_schema(html: str, schema: dict, mode: str = "css") -> list[dict]:
    """JsonCss/JsonXPath schema: {baseSelector, fields:[{name, selector,
    type: text|attribute|html|nested|list|nested_list, ...}]} → list of
    row dicts (nested types recurse with their own ``fields``)."""
    root = parse_html(html)
    select = css_select if mode == "css" else xpath_select
    bases = select(root, schema.get("baseSelector", "*")) or []
    return [
        {f["name"]: _field_value(b, f, select) for f in schema.get("fields", [])}
        for b in bases
        if isinstance(b, Node)
    ]


def extraction_udf(schema: dict, mode: str = "css"):
    """html column → JSON string column (Arrow-batched)."""

    @pandas_udf("string")
    def run(htmls: pd.Series) -> pd.Series:
        return htmls.map(lambda h: json.dumps(extract_with_schema(h or "", schema, mode), sort_keys=True))

    return run


def spans_udf(excluded_tags: list[str] | None = None, remove_forms: bool = False,
              process_iframes: bool = False):
    """html column → input_hint spans column (Arrow-batched)."""

    @pandas_udf("array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    def run(htmls: pd.Series) -> pd.Series:
        return htmls.map(
            lambda h: html_to_spans(h or "", excluded_tags, remove_forms, process_iframes)
        )

    return run


# --------------------------------------------------------------------------- #
# E8: iframe-by-src merge — in-corpus join, pure DataFrame ops
# --------------------------------------------------------------------------- #
def merge_iframes_by_src(docs: DataFrame) -> DataFrame:
    """E8 — the reference merges iframe CONTENT into the parent page
    (crawl_agent.py:160,669). ``srcdoc`` iframes are inlined at parse
    time (html_to_spans); src-referenced iframes become ``iframe`` spans
    whose media_ref is resolved HERE by joining against the corpus
    itself (no network): the referenced document's spans are spliced in
    place of the iframe span, offsets re-indexed. Unresolvable iframes
    keep their span. Shape: explode → left join on media_ref=doc_id →
    re-assemble sorted by (parent position, child position) — all
    JVM-side, one join + one agg."""
    # posexplode_outer twice: a document with an EMPTY spans array (or an
    # empty resolved piece) must survive with empty spans, not vanish —
    # the null placeholder rows are dropped inside collect_list (nulls
    # are skipped), keeping the doc_id group alive.
    ex = docs.select(
        "doc_id", F.posexplode_outer("spans").alias("pos", "s")
    )
    child = docs.select(
        F.col("doc_id").alias("_src"), F.col("spans").alias("_child_spans")
    )
    joined = ex.join(
        child,
        (F.col("s.kind") == "iframe") & (F.col("s.media_ref") == F.col("_src")),
        "left",
    )
    # resolved iframes expand to their child spans; everything else (and
    # unresolved iframes) passes through as a single-element array
    empty = F.array().cast(docs.schema["spans"].dataType)
    pieces = joined.select(
        "doc_id", "pos",
        F.when(F.col("s").isNull(), empty)
        .when(F.col("_child_spans").isNotNull(), F.col("_child_spans"))
        .otherwise(F.array("s")).alias("piece"),
    ).select("doc_id", "pos", F.posexplode_outer("piece").alias("cpos", "s"))
    assembled = pieces.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.when(F.col("s").isNotNull(), F.struct("pos", "cpos", F.col("s").alias("s")))
            )
        ).alias("ordered")
    )
    reindexed = F.transform(
        F.col("ordered"),
        lambda x, i: F.struct(
            x["s"]["kind"].alias("kind"),
            x["s"]["text"].alias("text"),
            x["s"]["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return assembled.select("doc_id", reindexed.alias("spans"))


# --------------------------------------------------------------------------- #
# S3/S4 sources
# --------------------------------------------------------------------------- #
def read_html_files(spark: SparkSession, glob: str, **parse_kw) -> DataFrame:
    """file:// source: wholetext files → documents(doc_id, spans)."""
    raw = spark.read.text(glob, wholetext=True).withColumn(
        "doc_id", F.concat(F.lit("file://"), F.input_file_name())
    )
    return raw.select("doc_id", spans_udf(**parse_kw)(F.col("value")).alias("spans"))


def read_raw_html(spark: SparkSession, htmls: list[str], **parse_kw) -> DataFrame:
    """raw: source: inline HTML strings → documents(doc_id, spans)."""
    df = spark.createDataFrame(
        [(f"raw://{i}", h) for i, h in enumerate(htmls)], ["doc_id", "html"]
    )
    return df.select("doc_id", spans_udf(**parse_kw)(F.col("html")).alias("spans"))
