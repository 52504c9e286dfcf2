"""Deterministic synthetic web-graph fixtures (FIXTURES.md §1-3).

Generates the authoritative input shape from BASELINE.json.input_hint:

    documents(doc_id STRING, spans ARRAY<STRUCT<kind, text, media_ref, offset>>)

entirely with Spark column expressions over ``spark.range(n_docs)`` — no
Python row loop, no wall-clock, no RNG state: every value is a pure
function of (doc index, span index) via ``xxhash64``, so the corpus is
byte-identical across runs and parallelism levels, and generation scales
linearly to bench sizes (1e6-1e7 docs).

Graph properties exercised (reference behaviors they test):
* Zipf-ish host sizes (hot-domain skew → host_salt politeness salting)
* duplicate link variants — fragment, unsorted query params, uppercase
  host, explicit default port — that canonicalize to the same URL
  (URL-seen dedup, north rule)
* external + social-media links (include_external / social filters,
  /root/reference/crawl_agent.py:163-166)
* blacklist path terms ('login') hitting the F5 scorer penalty
  (/root/reference/ai_agent.py:225) and robots disallow rules
* image/media spans with mixed extensions (download filters,
  /root/reference/crawl_agent.py:753-761)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "spark", "data", "crawl", "frontier", "query", "engine", "page", "link",
    "host", "batch", "round", "table", "span", "media", "text", "deep",
    "fast", "slow", "index", "shard", "bloom", "robots", "fetch", "parse",
    "rank", "score", "depth", "budget", "seen", "hash", "merge", "scan",
]
IMG_EXT = ["jpg", "png", "gif", "webp"]
MEDIA_EXT = ["pdf", "docx", "xlsx", "csv", "mp4"]
QUERY_KEYWORDS = "spark data"  # best-first fixture query


def _h(tag: str, *cols: Column) -> Column:
    """Deterministic non-negative pseudo-random bigint from tag+indices."""
    return F.pmod(F.xxhash64(F.lit(tag), *cols), F.lit(1_000_000_007))


def _let(value: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``value`` once and reference
    it any number of times inside ``body`` via a lambda variable.

    Column composition in this file would otherwise INLINE a copy of the
    ``value`` subtree at every use site — the doc-index regexp_extract
    appeared 416 times in the synthesized-spans tree, putting the analyzed
    plan at ~68 KB and costing ~0.65 s of driver-side analyze+optimize per
    crawl round (batch-size-independent), plus repeated per-row evaluation
    at runtime (codegen subexpression elimination does not reach inside
    lambda bodies). Encoding the binding as
    ``get(transform(array(value), body), 0)`` keeps one copy of the
    subtree; the per-row cost is one 1-element array allocation."""
    return F.get(F.transform(F.array(value), body), 0)


def host_index(i: Column, n_hosts: int, n_docs: int) -> Column:
    """Zipf-ish host assignment via contiguous cube-sized blocks: host h
    owns doc indices [N*(h/H)^3, N*((h+1)/H)^3) — the LAST host is the
    hot one (~3/H of all docs). Contiguous blocks let the link generator
    pick same-host targets with pure arithmetic (no host→docs inversion)."""
    frac = (i.cast("double") + F.lit(0.5)) / F.lit(float(n_docs))
    h = F.floor(F.lit(float(n_hosts)) * F.pow(frac, F.lit(1.0 / 3.0))).cast("int")
    return F.least(F.lit(n_hosts - 1), F.greatest(F.lit(0), h))


def _same_host_target(i: Column, j: Column, n_docs: int, n_hosts: int) -> Column:
    """A doc index in (approximately) the same host block as doc i."""
    def body(h: Column) -> Column:
        lo = F.ceil(F.lit(float(n_docs)) * F.pow(h / n_hosts, F.lit(3.0))).cast("long")
        hi = F.ceil(F.lit(float(n_docs)) * F.pow((h + 1) / n_hosts, F.lit(3.0))).cast("long")
        size = F.greatest(F.lit(1).cast("long"), hi - lo)
        return F.least(F.lit(n_docs - 1).cast("long"), lo + F.pmod(_h("st", i, j), size))

    return _let(host_index(i, n_hosts, n_docs).cast("double"), body)


def _pathseg(i: Column) -> Column:
    return (
        F.when(F.pmod(i, F.lit(13)) == 0, F.lit("login/p"))
        .when(F.pmod(i, F.lit(13)) == 1, F.lit("a/b/c"))
        .otherwise(F.lit("p"))
    )


def doc_url(i: Column, n_docs: int, n_hosts: int) -> Column:
    """Canonical URL of doc i — already in canonical form by construction."""
    return F.concat(
        F.lit("https://host"), host_index(i, n_hosts, n_docs).cast("string"),
        F.lit(".example.com/"), _pathseg(i), F.lit("/"), i.cast("string"),
    )


def _words(i: Column, j: Column, tag: str) -> Column:
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    m = F.lit(3) + F.pmod(_h(tag + "n", i, j), F.lit(10))
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda w: F.element_at(vocab, (F.pmod(_h(tag, i, j, w), F.lit(len(VOCAB))) + 1).cast("int")),
        ),
        " ",
    )


def redirect_alias(t: Column, n_docs: int, n_hosts: int) -> Column:
    """One-hop redirect alias of doc t: /r/<t> 301s to doc_url(t) (F12)."""
    return F.concat(
        F.lit("https://host"), host_index(t, n_hosts, n_docs).cast("string"),
        F.lit(".example.com/r/"), t.cast("string"),
    )


def _link_href(i: Column, j: Column, n_docs: int, n_hosts: int) -> Column:
    """Link variants over a 20-sided die: 0-1 any-host (cross-host
    discovery), 2-11 plain same-host, 12 redirect alias (resolves to the
    plain URL through the redirects table — dedup-through-redirect),
    13 fragment dup, 14-15 query-order dups (canonicalize equal,
    fetch-miss), 16 uppercase dup, 17 default-port dup, 18 external
    host, 19 social."""
    t_any = F.pmod(_h("lt", i, j), F.lit(n_docs))
    t_same = _same_host_target(i, j, n_docs, n_hosts)

    def with_v(v: Column) -> Column:
        def with_t(t: Column) -> Column:
            t_s = t.cast("string")

            def with_h(h_t: Column) -> Column:
                def with_seg(seg: Column) -> Column:
                    base = F.concat(
                        F.lit("https://host"), h_t, F.lit(".example.com/"), seg,
                        F.lit("/"), t_s)  # == doc_url(t) by construction
                    upper_variant = F.concat(
                        F.lit("HTTPS://HOST"), h_t, F.lit(".EXAMPLE.COM/"), seg,
                        F.lit("/"), t_s)
                    port_variant = F.concat(
                        F.lit("https://host"), h_t, F.lit(".example.com:443/"), seg,
                        F.lit("/"), t_s)
                    redirect = F.concat(
                        F.lit("https://host"), h_t, F.lit(".example.com/r/"), t_s
                    )  # == redirect_alias(t)
                    ext = F.concat(
                        F.lit("https://ext"), F.pmod(_h("e", i, j), F.lit(20)).cast("string"),
                        F.lit(".other.net/x/"), t_s)
                    social = F.concat(F.lit("https://facebook.com/share/"), t_s)
                    return (
                        F.when(v <= 11, base)
                        .when(v == 12, redirect)
                        .when(v == 13, F.concat(base, F.lit("#sec"), j.cast("string")))
                        .when(v == 14, F.concat(base, F.lit("?b=2&a=1")))
                        .when(v == 15, F.concat(base, F.lit("?a=1&b=2")))
                        .when(v == 16, upper_variant)
                        .when(v == 17, port_variant)
                        .when(v == 18, ext)
                        .otherwise(social)
                    )

                return _let(_pathseg(t), with_seg)

            return _let(host_index(t, n_hosts, n_docs).cast("string"), with_h)

        return _let(F.when(v <= 1, t_any).otherwise(t_same), with_t)

    return _let(F.pmod(_h("lv", i, j), F.lit(20)), with_v)


def spans_for_index(i: Column, n_docs: int, n_hosts: int = 20,
                    min_spans: int = 6, extra_spans: int = 14,
                    lazy: bool = False, steps: int = 0,
                    wait_for: str = "") -> Column:
    """Span array of doc i as a pure column expression — the corpus is a
    deterministic function of the index, so a fetch can SYNTHESIZE the
    document from its URL (VirtualCorpus) instead of joining a stored
    table; both paths produce byte-identical spans.

    ``lazy=True`` is the U5 fetch-simulation knob (the reference's
    enable_lazy_loading browser option, crawl_agent.py:699-781 — no Spark
    analog, modeled as a corpus parameter per SURVEY §2.8): every 4th doc
    (die on _h("lz", i)) exposes 1-3 EXTRA trailing spans — the content a
    scrolled/lazy-loaded render would reveal. The lazy array is a strict
    prefix-extension of the base array, so enabling it only ever ADDS
    discovered outlinks.

    ``steps=k`` is the multi-step SESSION knob (the reference's
    multi_step_js_actions / multi_step_wait_conditions,
    crawl_agent.py:147-150,691-692; examples/multi_step_interaction.py —
    k sequential page interactions like scroll + click-More, each
    revealing more content): step s reveals 1-3 extra trailing spans for
    ~2/3 of docs (die on _h("ms{s}", i)); the other 1/3 models the
    step's wait_for condition timing out (the browser returns the
    current state and the session proceeds to the next step). Each step
    count's array is a strict prefix-extension of the previous one, so
    the k-step crawl's discovered-outlink set monotonically grows with
    k — exactly the reference's 30→60→90-items "More" loop shape.

    ``wait_for`` selects the step-wait CHANNEL (the reference's
    ``wait_for`` "css:" / "js:" prefixes, crawl_agent.py:127), each a
    distinct deterministic die:

    * ``""`` — the legacy per-(doc, step) die above;
    * ``"css:<sel>"`` — structural wait: the page either contains the
      selector's target or never will, so the die is per-DOC, keyed on
      the selector text (_h("css"+sel, i), 3/4 succeed): a satisfying
      doc reveals at EVERY step, a non-satisfying one times out at
      every step;
    * ``"js:<expr>"`` — behavioral wait: scripts race per interaction,
      so the die is per-(doc, step), keyed on the expression text
      (different expressions give independent schedules).

    All channels preserve the strict prefix-extension property."""
    n_spans = F.lit(min_spans) + F.pmod(_h("ns", i), F.lit(extra_spans))
    if lazy:
        n_spans = n_spans + F.when(
            F.pmod(_h("lz", i), F.lit(4)) == 0, F.lit(1) + F.pmod(_h("lzn", i), F.lit(3))
        ).otherwise(F.lit(0))
    for s in range(1, max(0, steps) + 1):
        if wait_for.startswith("css:"):
            resolved = F.pmod(_h("css" + wait_for[4:], i), F.lit(4)) != 0
        elif wait_for.startswith("js:"):
            resolved = F.pmod(_h(f"js{wait_for[3:]}#{s}", i), F.lit(3)) != 0
        else:
            resolved = F.pmod(_h(f"ms{s}", i), F.lit(3)) != 0
        n_spans = n_spans + F.when(
            resolved,
            F.lit(1) + F.pmod(_h(f"msn{s}", i), F.lit(3)),
        ).otherwise(F.lit(0))

    def with_host(h_i: Column) -> Column:
        def span(j: Column) -> Column:
            def with_k(k: Column) -> Column:
                kind = (
                    F.when(j == 0, F.lit("heading"))
                    .when(k <= 3, F.lit("text"))
                    .when(k == 4, F.lit("heading"))
                    .when(k <= 7, F.lit("link"))
                    .when(k == 8, F.lit("image"))
                    .otherwise(F.lit("media"))
                )
                img_ext = F.array(*[F.lit(e) for e in IMG_EXT])
                med_ext = F.array(*[F.lit(e) for e in MEDIA_EXT])
                img_ref = F.concat(F.lit("https://host"), h_i, F.lit(".example.com/img/"),
                                   i.cast("string"), F.lit("_"), j.cast("string"), F.lit("."),
                                   F.element_at(img_ext, (F.pmod(_h("x", i, j), F.lit(4)) + 1).cast("int")))
                med_ref = F.concat(F.lit("https://host"), h_i, F.lit(".example.com/file/"),
                                   i.cast("string"), F.lit("_"), j.cast("string"), F.lit("."),
                                   F.element_at(med_ext, (F.pmod(_h("m", i, j), F.lit(5)) + 1).cast("int")))
                media_ref = (
                    F.when(kind == "link", _link_href(i, j, n_docs, n_hosts))
                    .when(kind == "image", img_ref)
                    .when(kind == "media", med_ref)
                    .otherwise(F.lit(None).cast("string"))
                )
                return F.struct(
                    kind.alias("kind"),
                    _words(i, j, "t").alias("text"),
                    media_ref.alias("media_ref"),
                    j.cast("int").alias("offset"),
                )

            return _let(F.pmod(_h("k", i, j), F.lit(10)), with_k)

        return F.transform(F.sequence(F.lit(0), n_spans - 1), span)

    return _let(host_index(i, n_hosts, n_docs).cast("string"), with_host)


def build_documents(spark: SparkSession, n_docs: int, n_hosts: int = 20,
                    min_spans: int = 6, extra_spans: int = 14) -> DataFrame:
    """The interleaved text+media corpus (input_hint shape), columnar-born."""
    df = spark.range(n_docs).toDF("i")
    i = F.col("i")
    return df.select(
        doc_url(i, n_docs, n_hosts).alias("doc_id"),
        spans_for_index(i, n_docs, n_hosts, min_spans, extra_spans).alias("spans"),
    )


class VirtualCorpus:
    """A web of ``n_docs`` synthetic documents defined arithmetically —
    no storage at all. ``fetch(url)`` parses the doc index out of the URL
    and synthesizes the span array with the same column expressions the
    parquet fixture generator uses, so a crawl over a VirtualCorpus is
    byte-identical to one over the written corpus (tested).

    This is the honest fetch cost model for scheduler benchmarks: a real
    crawl pays O(batch) per round (HTTP + parse per URL), never
    O(corpus) — a corpus *join* stand-in scans/shuffles the whole table
    every round, which at 10^10 URLs measures the join, not the engine.
    A 10^10-entry frontier is just ``VirtualCorpus(n_docs=10**10)``.
    """

    def __init__(self, n_docs: int, n_hosts: int = 20,
                 min_spans: int = 6, extra_spans: int = 14,
                 mirror_every: int | None = None):
        self.n_docs = n_docs
        self.n_hosts = n_hosts
        self.min_spans = min_spans
        self.extra_spans = extra_spans
        # mirror_every=k: the last doc of every k-consecutive group
        # (i % k == k-1) serves the GROUP HEAD's content byte-identically
        # (spans synthesized from index i - (k-1)) — a 1/k duplicate-
        # content rate modeling the mirror/print-view/session-id-alias
        # share of real crawls (Heritrix reports 25-30%; k=4 ≈ 25%).
        # Consecutive indices share a host block, so mirrors are
        # same-host — visible to content_dedup under either digest
        # keying. URL validity/status still key on the REQUESTED index;
        # only the served content aliases. None = every doc unique.
        self.mirror_every = mirror_every
        # Column-expression cache: the spans synthesis tree is ~5k nodes
        # and costs ~0.8s of py4j round-trips to BUILD — per crawl round
        # that was pure driver overhead. Column objects are unresolved
        # expressions, reusable across DataFrames, so build once per
        # (url column, lazy) and reattach every round.
        self._expr_cache: dict[tuple[str, bool, int, str], tuple[Column, Column, Column]] = {}

    def seed_urls(self, host: int, n: int) -> list[str]:
        """First n doc URLs on a host block (driver-side arithmetic)."""
        import math

        lo = math.ceil(self.n_docs * (host / self.n_hosts) ** 3)
        out = []
        i = max(0, lo)
        while len(out) < n and i < self.n_docs:
            out.append(self._url_py(i))
            i += 1
        return out

    def _url_py(self, i: int) -> str:
        # python mirror of doc_url()/host_index()/_pathseg()
        frac = (i + 0.5) / float(self.n_docs)
        h = int(self.n_hosts * frac ** (1.0 / 3.0))
        h = min(self.n_hosts - 1, max(0, h))
        seg = "login/p" if i % 13 == 0 else ("a/b/c" if i % 13 == 1 else "p")
        return f"https://host{h}.example.com/{seg}/{i}"

    def fetch(self, selected: DataFrame, url_col: str = "url",
              with_title: bool = False, lazy: bool = False,
              steps: int = 0, wait_for: str = "") -> DataFrame:
        """Append ``spans`` + ``_st`` (fetched/missing) columns — plus
        ``_title`` when asked — by synthesizing the document for valid doc
        URLs. One ``select`` so the cached trees resolve in a single
        analysis pass (each DataFrame op analyzes eagerly; the spans tree
        costs ~0.3s per resolution).

        ``_title`` is the first heading span's text, computed
        arithmetically: span 0 is ALWAYS a heading by construction
        (spans_for_index), so the first-heading lookup reduces to
        ``_words(i, 0)`` — no second evaluation of the spans tree."""
        spans_c, st_c, title_c = self.fetch_cols(url_col, lazy, steps, wait_for)
        cols = [spans_c.alias("spans"), st_c.alias("_st")] + (
            [title_c.alias("_title")] if with_title else [])
        return selected.select("*", *cols)

    def fetch_cols(self, url_col: str = "url", lazy: bool = False,
                   steps: int = 0, wait_for: str = ""):
        """The cached UNALIASED (spans, status, title) synthesis columns —
        callers that already pay a projection (e.g. the crawl fetch stage)
        splice these into their OWN single select, so the ~5k-node tree is
        analyzed once per round instead of once per chained DataFrame op."""
        key = (url_col, lazy, steps, wait_for)
        if key not in self._expr_cache:
            u = F.col(url_col)
            idx = F.regexp_extract(u, "/([0-9]+)$", 1)
            i_raw = F.when(idx == "", F.lit(-1)).otherwise(idx).cast("long")

            def _valid(i: Column) -> Column:
                return (i >= 0) & (i < self.n_docs) & (
                    u == doc_url(i, self.n_docs, self.n_hosts))

            # each output column binds the parsed doc index ONCE (_let):
            # inlining it at every use site made the spans tree ~70 KB of
            # duplicated regexp_extract/pow chains — ~0.65 s of driver
            # analyze+optimize per crawl round, batch-size-independent
            def _with_content_i(i: Column, body) -> Column:
                # mirror_every: group tails serve the group head's content.
                # The remapped index gets its OWN let-binding — inlining
                # the when(pmod...) wrapper at each of the ~400 index use
                # sites inside the spans tree would re-bloat the plan the
                # let-binding exists to shrink. mirror off → no extra node.
                if self.mirror_every is None:
                    return body(i)
                k = int(self.mirror_every)
                ci = F.when(F.pmod(i, F.lit(k)) == k - 1,
                            i - (k - 1)).otherwise(i)
                return _let(ci, body)

            spans_c = _let(i_raw, lambda i: F.when(
                _valid(i),
                _with_content_i(i, lambda ci: spans_for_index(
                    ci, self.n_docs, self.n_hosts, self.min_spans,
                    self.extra_spans, lazy=lazy, steps=steps,
                    wait_for=wait_for)),
            ).otherwise(F.lit(None)))
            st_c = _let(i_raw, lambda i: F.when(
                _valid(i), F.lit("fetched")).otherwise(F.lit(None)))
            title_c = (
                _let(i_raw, lambda i: F.when(
                    _valid(i),
                    _with_content_i(i, lambda ci: _words(ci, F.lit(0), "t"))))
                if self.min_spans >= 1 else F.lit(None).cast("string")
            )
            self._expr_cache[key] = (spans_c, st_c, title_c)
        return self._expr_cache[key]


def build_robots(spark: SparkSession, n_hosts: int = 20) -> DataFrame:
    """robots(host, allow, disallow, crawl_delay): every 5th host blocks
    /login but carves out /login/p/1* via a longer allow rule (REP
    longest-match: the more specific allow overrides the disallow)."""
    g = F.col("g")
    blocks_login = (F.pmod(g, F.lit(5)) == 0) | (g == n_hosts - 1)
    return (
        spark.range(n_hosts).toDF("g")
        .select(
            F.concat(F.lit("host"), g.cast("string"), F.lit(".example.com")).alias("host"),
            F.when(blocks_login, F.array(F.lit("/login/p/1")))
            .otherwise(F.array().cast("array<string>")).alias("allow"),
            F.when(blocks_login, F.array(F.lit("/login")))
            .when(F.pmod(g, F.lit(7)) == 0, F.array(F.lit("/private")))
            .otherwise(F.array().cast("array<string>")).alias("disallow"),
            (F.lit(0.5) + F.pmod(g, F.lit(4)).cast("double") * 0.5).alias("crawl_delay"),
        )
    )


def build_redirects(spark: SparkSession, n_docs: int, n_hosts: int = 20) -> DataFrame:
    """redirects(src_url, dst_url): /r/<t> → doc_url(t) for every doc,
    plus a second hop /rr/<t> → /r/<t> (chain testing, F12). Both sides
    are already canonical by construction."""
    df = spark.range(n_docs).toDF("i")
    i = F.col("i")
    one = df.select(
        redirect_alias(i, n_docs, n_hosts).alias("src_url"),
        doc_url(i, n_docs, n_hosts).alias("dst_url"),
    )
    h = host_index(i, n_hosts, n_docs).cast("string")
    two = df.select(
        F.concat(F.lit("https://host"), h, F.lit(".example.com/rr/"), i.cast("string")).alias("src_url"),
        redirect_alias(i, n_docs, n_hosts).alias("dst_url"),
    )
    return one.unionByName(two)


def budgets_from_crawl_delay(robots: DataFrame, round_period_s: float = 2.0) -> DataFrame:
    """F8: derive per-round host budgets from robots crawl_delay (the
    reference sleeps crawl_delay between same-host fetches,
    crawl_agent.py:1035-1040; in the batch-round model that rate limit
    becomes a per-round fetch budget): budget = max(1, round_period /
    crawl_delay). Hosts without a delay get an effectively-unbounded
    budget."""
    return robots.select(
        "host",
        F.when(
            F.col("crawl_delay").isNotNull() & (F.col("crawl_delay") > 0),
            F.greatest(F.lit(1), F.floor(F.lit(round_period_s) / F.col("crawl_delay"))),
        ).otherwise(F.lit(1_000_000_000)).cast("int").alias("budget"),
    )


def build_host_budgets(spark: SparkSession, n_hosts: int = 20, base_budget: int = 4) -> DataFrame:
    g = F.col("g")
    return (
        spark.range(n_hosts).toDF("g")
        .select(
            F.concat(F.lit("host"), g.cast("string"), F.lit(".example.com")).alias("host"),
            (F.lit(base_budget) + F.pmod(g, F.lit(4))).cast("int").alias("budget"),
        )
    )


def write_fixtures(spark: SparkSession, out_dir: str, n_docs: int = 1000,
                   n_hosts: int = 20, **doc_kw) -> None:
    build_documents(spark, n_docs, n_hosts, **doc_kw).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    build_robots(spark, n_hosts).write.mode("overwrite").parquet(f"{out_dir}/robots.parquet")
    build_host_budgets(spark, n_hosts).write.mode("overwrite").parquet(f"{out_dir}/hosts.parquet")
    build_redirects(spark, n_docs, n_hosts).write.mode("overwrite").parquet(f"{out_dir}/redirects.parquet")
