"""Span-document operators: markdown rendering, content filters,
inventories, stats — all pure column expressions over the input_hint
span schema ``ARRAY<STRUCT<kind,text,media_ref,offset>>``.

Reference parity:
* E4 markdown generation (crawl_agent.py:653,806-820; citation-link
  rewriting per original-README.md:104-107): ``spans_to_markdown`` is
  the raw ladder, ``fit_markdown`` the post-filter ladder; the
  span-sequence (kind, text, media_ref, order) is the per-row invariant.
* E5 content ladders (crawl_agent.py:245-250, 362-365): ``coalesce``
  chains and the multi-page "\\n\\n## Page: {url}\\n\\n" concat
  (crawl_agent.py:252-257).
* E6 title (crawl_agent.py:877-885): first heading span, fallback URL.
* E7 media inventory (app.py:911-930).
* P1 PruningContentFilter (crawl_agent.py:528-534): the reference
  delegates the block-scoring heuristic to the crawl4ai library; ours
  is a pinned deterministic formula (word-count ramp × tag weight,
  threshold default 0.48, threshold_type fixed|auto) with the same
  parameter surface.
* A1/A4 stats & concat (crawl_agent.py:826-831, 1120-1136).

Everything here is JVM-side (filter/transform/aggregate column exprs)
— whole-stage codegen, no Python in the path, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRUNE_THRESHOLD = 0.48       # reference default, crawl_agent.py:42
MIN_WORD_THRESHOLD = 0      # reference default, crawl_agent.py:158


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def sorted_spans(spans: Column | str) -> Column:
    """Spans in document order (offset asc) — the canonical sequence."""
    s = _c(spans)
    return F.array_sort(
        s, lambda a, b: F.when(a["offset"] < b["offset"], -1).when(a["offset"] > b["offset"], 1).otherwise(0)
    )


# --------------------------------------------------------------------------- #
# P1: pruning score — word-count ramp × kind weight, clamped to [0,1]
# --------------------------------------------------------------------------- #
def span_word_count(sp: Column) -> Column:
    return F.size(F.filter(F.split(F.coalesce(sp["text"], F.lit("")), "\\s+"), lambda w: w != ""))


def span_score(sp: Column) -> Column:
    wc = span_word_count(sp).cast("double")
    base = F.least(F.lit(1.0), F.lit(0.2) + F.lit(0.05) * wc)
    weight = (
        F.when(sp["kind"] == "heading", F.lit(1.2))
        .when(sp["kind"] == "text", F.lit(1.0))
        .when(sp["kind"] == "link", F.lit(0.6))
        .otherwise(F.lit(0.5))  # image / media
    )
    return F.least(F.lit(1.0), F.round(base * weight, 6))


def fit_spans(
    spans: Column | str,
    threshold: float = PRUNE_THRESHOLD,
    threshold_type: str = "fixed",
    min_word_threshold: int = MIN_WORD_THRESHOLD,
) -> Column:
    """Pruned span sequence. ``auto`` threshold = mean span score of the
    document (computed per row, still a pure expression)."""
    s = _c(spans)
    if threshold_type == "auto":
        total = F.aggregate(s, F.lit(0.0), lambda acc, sp: acc + span_score(sp))
        thr = F.when(F.size(s) > 0, total / F.size(s)).otherwise(F.lit(0.0))
    else:
        thr = F.lit(float(threshold))
    return F.filter(
        s,
        lambda sp: (span_score(sp) >= thr)
        & (span_word_count(sp) >= F.lit(int(min_word_threshold))),
    )


# --------------------------------------------------------------------------- #
# P2: BM25ContentFilter — span-level BM25 against the page's own blocks
# --------------------------------------------------------------------------- #
BM25_THRESHOLD = 0.1  # reference default, crawl_agent.py:48
BM25_K1 = 1.2
BM25_B = 0.75


def _span_tokens(sp: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.coalesce(sp["text"], F.lit(""))), "\\s+"), lambda w: w != ""
    )


def bm25_span_score(spans: Column | str, query: str,
                    k1: float = BM25_K1, b: float = BM25_B):
    """Per-span BM25 scorer vs the page's own span blocks (the reference's
    BM25ContentFilter treats each text chunk of the page as a document and
    the page as the corpus — crawl_agent.py:535-540). Returns a function
    sp -> score Column, plus nothing is shuffled: N, avgdl and per-term
    document frequencies are aggregates over the SAME array, so the whole
    thing stays a per-row column expression (codegen, 100 TB-safe)."""
    s = _c(spans)
    terms = [t for t in query.lower().split() if t]
    n = F.size(s).cast("double")
    total_dl = F.aggregate(
        s, F.lit(0).cast("double"), lambda acc, sp: acc + F.size(_span_tokens(sp))
    )
    avgdl = F.greatest(total_dl / F.greatest(n, F.lit(1.0)), F.lit(1e-9))
    dfs = [
        F.size(F.filter(s, lambda sp: F.array_contains(_span_tokens(sp), t))).cast("double")
        for t in terms
    ]

    def score(sp: Column) -> Column:
        dl = F.size(_span_tokens(sp)).cast("double")
        parts = None
        for t, df in zip(terms, dfs):
            tf = F.size(F.filter(_span_tokens(sp), lambda w: w == F.lit(t))).cast("double")
            idf = F.log((n - df + 0.5) / (df + 0.5) + 1.0)
            p = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            parts = p if parts is None else parts + p
        return parts if parts is not None else F.lit(0.0)

    return score


def bm25_fit_spans(spans: Column | str, query: str,
                   threshold: float = BM25_THRESHOLD,
                   k1: float = BM25_K1, b: float = BM25_B) -> Column:
    """P2 fit filter: keep spans whose BM25 score vs ``query`` clears the
    threshold (reference BM25ContentFilter(query, threshold=0.1)). Feeds
    the same E5 fit ladder as the pruning filter."""
    score = bm25_span_score(spans, query, k1=k1, b=b)
    return F.filter(sorted_spans(spans), lambda sp: score(sp) >= F.lit(float(threshold)))


def bm25_fit_markdown(spans: Column | str, query: str,
                      threshold: float = BM25_THRESHOLD) -> Column:
    return spans_to_markdown(bm25_fit_spans(spans, query, threshold))


# --------------------------------------------------------------------------- #
# E4: markdown renderer
# --------------------------------------------------------------------------- #
def _render_span(sp: Column) -> Column:
    text = F.coalesce(sp["text"], F.lit(""))
    ref = F.coalesce(sp["media_ref"], F.lit(""))
    return (
        F.when(sp["kind"] == "heading", F.concat(F.lit("## "), text, F.lit("\n\n")))
        .when(sp["kind"] == "image", F.concat(F.lit("!["), text, F.lit("]("), ref, F.lit(")\n\n")))
        .when(
            sp["kind"].isin("link", "media"),
            F.concat(F.lit("["), text, F.lit("]("), ref, F.lit(")\n\n")),
        )
        .otherwise(F.concat(text, F.lit("\n\n")))
    )


def spans_to_markdown(spans: Column | str) -> Column:
    """raw_markdown: concatenation of rendered spans in offset order."""
    return F.aggregate(
        sorted_spans(spans), F.lit(""), lambda acc, sp: F.concat(acc, _render_span(sp))
    )


def spans_to_markdown_citations(spans: Column | str) -> Column:
    """Citation-style markdown (original-README.md:104-107): links become
    ``[text]⟨N⟩`` numbered in document order, with a references section
    appended listing ``⟨N⟩: url``."""
    s = sorted_spans(spans)
    links = F.filter(s, lambda sp: sp["kind"] == "link")
    # per-span citation number = 1 + number of link spans strictly before it
    def render(sp: Column) -> Column:
        n_before = F.size(
            F.filter(links, lambda l: l["offset"] < sp["offset"])
        )
        cite = F.concat(F.lit("["), F.coalesce(sp["text"], F.lit("")), F.lit("]⟨"),
                        (n_before + 1).cast("string"), F.lit("⟩\n\n"))
        return F.when(sp["kind"] == "link", cite).otherwise(_render_span(sp))

    body = F.aggregate(s, F.lit(""), lambda acc, sp: F.concat(acc, render(sp)))
    refs = F.aggregate(
        F.zip_with(
            links,
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(links))),
            lambda l, i: F.concat(F.lit("⟨"), i.cast("string"), F.lit("⟩: "),
                                  F.coalesce(l["media_ref"], F.lit("")), F.lit("\n")),
        ),
        F.lit(""),
        lambda acc, x: F.concat(acc, x),
    )
    return F.when(F.size(links) == 0, body).otherwise(
        F.concat(body, F.lit("## References\n\n"), refs)
    )


def fit_markdown(spans: Column | str, **prune_kw) -> Column:
    return spans_to_markdown(fit_spans(spans, **prune_kw))


def content_ladder(markdown: Column, raw_markdown: Column, html: Column | None = None) -> Column:
    """E5 raw ladder: markdown → raw_markdown → html placeholder."""
    fallback = html if html is not None else F.lit("")
    return F.coalesce(markdown, raw_markdown, fallback)


def fit_ladder(fit_md: Column, markdown: Column) -> Column:
    """E5 fit ladder (crawl_agent.py:362-365): fit_markdown → markdown.
    Empty fit output falls back too (reference checks truthiness)."""
    return F.when((fit_md.isNull()) | (fit_md == ""), markdown).otherwise(fit_md)


# --------------------------------------------------------------------------- #
# E6: title — first heading span, fallback URL
# --------------------------------------------------------------------------- #
def title_of(spans: Column | str, url: Column | str) -> Column:
    heading = F.get(F.filter(sorted_spans(spans), lambda sp: sp["kind"] == "heading"), 0)["text"]
    return F.coalesce(heading, _c(url))


# --------------------------------------------------------------------------- #
# E7 + A1: inventories and per-page stats
# --------------------------------------------------------------------------- #
def links_of(spans: Column | str, page_host: Column | str) -> Column:
    """ARRAY<STRUCT<url,text,is_external>> from link spans."""
    return F.transform(
        F.filter(sorted_spans(spans), lambda sp: sp["kind"] == "link"),
        lambda sp: F.struct(
            sp["media_ref"].alias("url"),
            sp["text"].alias("text"),
            (
                F.regexp_extract(F.lower(F.coalesce(sp["media_ref"], F.lit(""))), "https?://([^/:]+)", 1)
                != F.lower(_c(page_host))
            ).alias("is_external"),
        ),
    )


def images_of(
    spans: Column | str,
    page_host: Column | str,
    exclude_external: bool = False,
) -> Column:
    """ARRAY<STRUCT<src,alt,is_external>> from image spans.
    ``exclude_external=True`` (P9, reference exclude_external_images —
    crawl_agent.py:164) drops images hosted off the page's host."""
    imgs = F.transform(
        F.filter(sorted_spans(spans), lambda sp: sp["kind"] == "image"),
        lambda sp: F.struct(
            sp["media_ref"].alias("src"),
            sp["text"].alias("alt"),
            (
                F.regexp_extract(F.lower(F.coalesce(sp["media_ref"], F.lit(""))), "https?://([^/:]+)", 1)
                != F.lower(_c(page_host))
            ).alias("is_external"),
        ),
    )
    if exclude_external:
        imgs = F.filter(imgs, lambda x: ~x["is_external"])
    return imgs


def _ref_host(sp: Column) -> Column:
    return F.regexp_extract(F.lower(F.coalesce(sp["media_ref"], F.lit(""))), "https?://([^/:]+)", 1)


def page_stat_arrays(
    spans: Column | str,
    page_host: Column | str,
    include_external: bool = False,
    exclude_social: bool = False,
    exclude_domains: list[str] | None = None,
    exclude_external_images: bool = False,
    download_exts: list[str] | None = None,
) -> Column:
    """A1 stat arrays (reference crawl_result stats —
    crawl_agent.py:826-831,868-872): ``filtered_links`` = link URLs the
    configured filters exclude, ``filtered_images`` = image srcs dropped
    by exclude_external_images, ``downloaded_files`` = media refs the S7
    download sink would take (extension die). Pure column exprs in
    document order."""
    from ..config import SOCIAL_DOMAINS

    s = sorted_spans(spans)
    host = F.lower(_c(page_host))

    def link_excluded(sp: Column) -> Column:
        h = _ref_host(sp)
        pred = F.lit(False)
        if not include_external:
            pred = pred | (h != host)
        if exclude_social:
            soc = "|".join(d.replace(".", r"\.") for d in SOCIAL_DOMAINS)
            pred = pred | h.rlike(f"(^|\\.)({soc})$")
        if exclude_domains:
            pred = pred | h.isin([d.lower() for d in exclude_domains])
        return pred

    filtered_links = F.transform(
        F.filter(s, lambda sp: (sp["kind"] == "link") & link_excluded(sp)),
        lambda sp: sp["media_ref"],
    )
    if exclude_external_images:
        filtered_images = F.transform(
            F.filter(s, lambda sp: (sp["kind"] == "image") & (_ref_host(sp) != host)),
            lambda sp: sp["media_ref"],
        )
    else:
        filtered_images = F.array().cast("array<string>")
    exts = [e.lower() for e in (download_exts or [])]
    ext_of = lambda sp: F.lower(  # noqa: E731
        F.regexp_extract(F.coalesce(sp["media_ref"], F.lit("")), r"\.([a-zA-Z0-9]+)$", 1))
    downloaded = F.transform(
        F.filter(s, lambda sp: (sp["kind"] == "media") & ext_of(sp).isin(exts)),
        lambda sp: sp["media_ref"],
    ) if exts else F.array().cast("array<string>")
    return F.struct(
        filtered_links.alias("filtered_links"),
        filtered_images.alias("filtered_images"),
        downloaded.alias("downloaded_files"),
    )


def page_stats(spans: Column | str) -> Column:
    """A1 per-crawl stats struct: link/image/media counts + word total."""
    s = _c(spans)

    def count(kind: str) -> Column:
        return F.size(F.filter(s, lambda sp: sp["kind"] == kind))

    words = F.aggregate(s, F.lit(0), lambda acc, sp: acc + span_word_count(sp))
    return F.struct(
        count("link").alias("link_count"),
        count("image").alias("image_count"),
        count("media").alias("media_count"),
        count("heading").alias("heading_count"),
        words.alias("word_count"),
    )


# --------------------------------------------------------------------------- #
# A4/E5: ordered multi-page concat
# --------------------------------------------------------------------------- #
def concat_pages(df: DataFrame, group_col: str, url_col: str, md_col: str, order_col: str) -> DataFrame:
    """Combined content per group in crawl-rank order:
    pages joined as "\\n\\n## Page: {url}\\n\\n{md}" segments with "\\n"
    (crawl_agent.py:252-257)."""
    seg = F.concat(F.lit("\n\n## Page: "), F.col(url_col), F.lit("\n\n"), F.col(md_col))
    kv = F.struct(F.col(order_col).alias("k"), seg.alias("v"))
    return (
        df.groupBy(group_col)
        .agg(F.array_sort(F.collect_list(kv)).alias("kvs"))
        .select(
            group_col,
            F.array_join(F.transform("kvs", lambda x: x["v"]), "\n").alias("combined"),
        )
    )
