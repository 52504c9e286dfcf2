"""Span-document operator queries (input_hint schema) with oracles.

The driver's flat ``documents(text)`` table is deterministically lifted
into the input_hint span shape (8-token groups → spans with arithmetic
kinds/refs) identically in both engines; the Spark side then exercises
the REAL operators from ``operators/markdown.py`` (renderer, pruning
filter, inventories, page concat) while DuckDB mirrors the rendered
strings directly. This puts E4/E5/E6/E7/P1/A1/A4 under the value-hash
correctness gate, not just unit tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import markdown as M
from .registry import query, table as _t

GROUP = 8  # tokens per derived span


# --------------------------------------------------------------------------- #
# span derivation (identical arithmetic in both dialects)
# --------------------------------------------------------------------------- #
def derived_spans(doc_id: Column, text: Column) -> Column:
    toks = F.filter(F.split(text, "\\s+"), lambda w: w != "")
    n = F.size(toks)

    def span(g: Column) -> Column:
        gtext = F.array_join(F.slice(toks, g * GROUP + 1, GROUP), " ")
        k = F.pmod(doc_id * 7 + g, F.lit(10))
        kind = (
            F.when(g == 0, F.lit("heading"))
            .when(k <= 4, F.lit("text"))
            .when(k <= 6, F.lit("link"))
            .when(k == 7, F.lit("image"))
            .when(k == 8, F.lit("media"))
            .otherwise(F.lit("heading"))
        )
        h = F.pmod(doc_id + g, F.lit(7)).cast("string")
        tgt = F.pmod(doc_id * 31 + g * 17, F.lit(1000)).cast("string")
        base = F.concat(F.lit("https://host"), h, F.lit(".example.com/"))
        ref = (
            F.when(kind == "link", F.concat(base, F.lit("p/"), tgt))
            .when(kind == "image", F.concat(base, F.lit("img/"), doc_id.cast("string"), F.lit("_"), g.cast("string"), F.lit(".png")))
            .when(kind == "media", F.concat(base, F.lit("file/"), doc_id.cast("string"), F.lit("_"), g.cast("string"), F.lit(".pdf")))
            .otherwise(F.lit(None).cast("string"))
        )
        return F.struct(kind.alias("kind"), gtext.alias("text"), ref.alias("media_ref"), g.cast("int").alias("offset"))

    return F.when(
        n > 0, F.transform(F.sequence(F.lit(0), F.floor((n - 1) / GROUP).cast("int")), span)
    ).otherwise(F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>"))


def _span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dataops import _wide

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    # fold-width exchange BEFORE the span lift (see dataops._wide): the
    # per-doc span synthesis + downstream array math (BM25 fit, renderer)
    # otherwise run on the scan's one non-empty split
    base = _wide(d.select(i.alias("doc_id"), "text"), key="doc_id")
    return base.select("doc_id", derived_spans(F.col("doc_id"), F.col("text")).alias("spans"))


# DuckDB CTEs: one row per derived span with kind/text/ref/score pieces.
_SP_SQL = f"""
    toks AS (
        SELECT doc_id::BIGINT AS doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS t
        FROM documents
    ),
    sp AS (
        SELECT doc_id, u.g AS g,
               array_to_string(list_slice(t, u.g * {GROUP} + 1, u.g * {GROUP} + {GROUP}), ' ') AS gtext,
               len(list_slice(t, u.g * {GROUP} + 1, u.g * {GROUP} + {GROUP})) AS wc,
               (CASE WHEN u.g = 0 THEN 'heading'
                     WHEN (doc_id * 7 + u.g) % 10 <= 4 THEN 'text'
                     WHEN (doc_id * 7 + u.g) % 10 <= 6 THEN 'link'
                     WHEN (doc_id * 7 + u.g) % 10 = 7 THEN 'image'
                     WHEN (doc_id * 7 + u.g) % 10 = 8 THEN 'media'
                     ELSE 'heading' END) AS kind,
               ('https://host' || ((doc_id + u.g) % 7)::VARCHAR || '.example.com/') AS base,
               ((doc_id * 31 + u.g * 17) % 1000)::VARCHAR AS tgt
        FROM toks, unnest(generate_series(0, (len(t) - 1) // {GROUP})) AS u(g)
        WHERE len(t) > 0
    ),
    spans AS (
        SELECT doc_id, g, gtext, wc, kind,
               (CASE WHEN kind = 'link' THEN base || 'p/' || tgt
                     WHEN kind = 'image' THEN base || 'img/' || doc_id::VARCHAR || '_' || g::VARCHAR || '.png'
                     WHEN kind = 'media' THEN base || 'file/' || doc_id::VARCHAR || '_' || g::VARCHAR || '.pdf'
                     ELSE NULL END) AS ref,
               (CASE WHEN kind = 'heading' THEN '## ' || gtext || e'\\n\\n'
                     WHEN kind = 'image' THEN '![' || gtext || '](' ||
                          base || 'img/' || doc_id::VARCHAR || '_' || g::VARCHAR || '.png' || e')\\n\\n'
                     WHEN kind = 'link' THEN '[' || gtext || '](' || base || 'p/' || tgt || e')\\n\\n'
                     WHEN kind = 'media' THEN '[' || gtext || '](' ||
                          base || 'file/' || doc_id::VARCHAR || '_' || g::VARCHAR || '.pdf' || e')\\n\\n'
                     ELSE gtext || e'\\n\\n' END) AS piece,
               least(1.0, round(least(1.0, 0.2 + 0.05 * wc) *
                     (CASE WHEN kind = 'heading' THEN 1.2 WHEN kind = 'text' THEN 1.0
                           WHEN kind = 'link' THEN 0.6 ELSE 0.5 END), 6)) AS score
        FROM sp
    )
"""


# --------------------------------------------------------------------------- #
# E4: raw markdown rendering
# --------------------------------------------------------------------------- #
@query(
    "spans_markdown",
    f"""
    WITH {_SP_SQL}
    SELECT doc_id, string_agg(piece, '' ORDER BY g) AS raw_md
    FROM spans GROUP BY doc_id
    """,
)
def q_spans_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    sd = _span_docs(spark, sf_dir)
    return sd.select("doc_id", M.spans_to_markdown("spans").alias("raw_md"))


# --------------------------------------------------------------------------- #
# P1 + E5: pruning filter + fit ladder
# --------------------------------------------------------------------------- #
@query(
    "spans_fit_filter",
    f"""
    WITH {_SP_SQL}
    SELECT doc_id,
           count(*)::BIGINT AS n_spans,
           sum(CASE WHEN score >= 0.48 THEN 1 ELSE 0 END)::BIGINT AS n_fit,
           coalesce(string_agg(CASE WHEN score >= 0.48 THEN piece END, '' ORDER BY g), '') AS fit_md
    FROM spans GROUP BY doc_id
    """,
)
def q_spans_fit_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    sd = _span_docs(spark, sf_dir)
    fit = M.fit_spans("spans")
    return sd.select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        F.size(fit).cast("long").alias("n_fit"),
        M.spans_to_markdown(fit).alias("fit_md"),
    )


# --------------------------------------------------------------------------- #
# P2 + E5: BM25ContentFilter as a span filter + fit ladder
# --------------------------------------------------------------------------- #
BM25_FIT_QUERY = "spark data"  # two vocab terms; reference BM25ContentFilter(query, 0.1)

_BM25_TERMS = BM25_FIT_QUERY.split()
_BM25_TF = ", ".join(
    f"len(list_filter(list_filter(regexp_split_to_array(lower(gtext), '\\s+'), w -> w <> ''), "
    f"w -> w = '{t}')) AS tf{i}"
    for i, t in enumerate(_BM25_TERMS)
)
_BM25_SCORE = " + ".join(
    f"(ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1) * tf{i} * 2.2"
    f" / (tf{i} + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))"
    for i in range(len(_BM25_TERMS))
)


@query(
    "spans_bm25_fit",
    f"""
    WITH {_SP_SQL},
    scored AS (
        SELECT doc_id, g, piece, wc::DOUBLE AS dl, {_BM25_TF},
               count(*) OVER (PARTITION BY doc_id)::DOUBLE AS n,
               greatest(sum(wc) OVER (PARTITION BY doc_id)::DOUBLE
                        / greatest(count(*) OVER (PARTITION BY doc_id), 1), 1e-9) AS avgdl
        FROM spans
    ),
    dfs AS (
        SELECT *,
               {', '.join(f'sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id)::DOUBLE AS df{i}' for i in range(len(_BM25_TERMS)))}
        FROM scored
    ),
    fit AS (
        SELECT doc_id, g, piece, ({_BM25_SCORE}) >= 0.1 AS keep
        FROM dfs
    )
    SELECT doc_id,
           count(*)::BIGINT AS n_spans,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_fit,
           coalesce(string_agg(CASE WHEN keep THEN piece END, '' ORDER BY g), '') AS fit_md
    FROM fit GROUP BY doc_id
    """,
)
def q_spans_bm25_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: the REAL bm25_fit_spans operator (operators/markdown.py) under
    the value-hash gate — per-span BM25 vs the page's own blocks, kept
    spans rendered through the same markdown path as the pruning filter
    (reference crawl_agent.py:535-540)."""
    sd = _span_docs(spark, sf_dir)
    fit = M.bm25_fit_spans("spans", BM25_FIT_QUERY)
    return sd.select(
        "doc_id",
        F.size("spans").cast("long").alias("n_spans"),
        F.size(fit).cast("long").alias("n_fit"),
        M.spans_to_markdown(fit).alias("fit_md"),
    )


# --------------------------------------------------------------------------- #
# E6 + E7 + A1: title, inventories, per-page stats
# --------------------------------------------------------------------------- #
@query(
    "spans_inventory",
    f"""
    WITH {_SP_SQL}
    SELECT doc_id,
           arg_min(gtext, g) FILTER (WHERE kind = 'heading') AS title,
           sum(CASE WHEN kind = 'link' THEN 1 ELSE 0 END)::BIGINT AS link_count,
           sum(CASE WHEN kind = 'image' THEN 1 ELSE 0 END)::BIGINT AS image_count,
           sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END)::BIGINT AS media_count,
           sum(CASE WHEN kind = 'heading' THEN 1 ELSE 0 END)::BIGINT AS heading_count,
           sum(wc)::BIGINT AS word_count,
           sum(CASE WHEN kind = 'link'
                    AND (doc_id + g) % 7 <> doc_id % 7 THEN 1 ELSE 0 END)::BIGINT AS external_links
    FROM spans GROUP BY doc_id
    """,
)
def q_spans_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    sd = _span_docs(spark, sf_dir)
    page_url = F.concat(
        F.lit("https://host"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
    )
    host = F.concat(F.lit("host"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"), F.lit(".example.com"))
    stats = M.page_stats("spans")
    links = M.links_of("spans", host)
    return sd.select(
        "doc_id",
        M.title_of("spans", page_url).alias("title"),
        stats["link_count"].cast("long").alias("link_count"),
        stats["image_count"].cast("long").alias("image_count"),
        stats["media_count"].cast("long").alias("media_count"),
        stats["heading_count"].cast("long").alias("heading_count"),
        stats["word_count"].cast("long").alias("word_count"),
        F.size(F.filter(links, lambda l: l["is_external"])).cast("long").alias("external_links"),
    )


# --------------------------------------------------------------------------- #
# A1 stat arrays: filtered_links / filtered_images / downloaded_files
# (reference crawl_agent.py:826-831,868-872). Page host = doc_id % 7;
# link/image hosts are (doc_id+g) % 7, so externality is arithmetic.
# Arrays compare as ','-joined strings (document order) — engine-stable.
# --------------------------------------------------------------------------- #
@query(
    "spans_stat_arrays",
    f"""
    WITH {_SP_SQL}
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN kind = 'link'
                    AND (doc_id + g) % 7 <> doc_id % 7 THEN ref END, ',' ORDER BY g), '')
               AS filtered_links,
           coalesce(string_agg(CASE WHEN kind = 'image'
                    AND (doc_id + g) % 7 <> doc_id % 7 THEN ref END, ',' ORDER BY g), '')
               AS filtered_images,
           coalesce(string_agg(CASE WHEN kind = 'media' THEN ref END, ',' ORDER BY g), '')
               AS downloaded_files
    FROM spans GROUP BY doc_id
    """,
)
def q_spans_stat_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the REAL page_stat_arrays operator under the hash gate —
    filters configured as (include_external=False,
    exclude_external_images=True, download pdf)."""
    sd = _span_docs(spark, sf_dir)
    host = F.concat(F.lit("host"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
                    F.lit(".example.com"))
    arrs = M.page_stat_arrays(
        "spans", host, include_external=False, exclude_external_images=True,
        download_exts=["pdf"],
    )
    return sd.select(
        "doc_id",
        F.array_join(arrs["filtered_links"], ",").alias("filtered_links"),
        F.array_join(arrs["filtered_images"], ",").alias("filtered_images"),
        F.array_join(arrs["downloaded_files"], ",").alias("downloaded_files"),
    )


# --------------------------------------------------------------------------- #
# A4 + E5: ordered multi-page concat per source group
# --------------------------------------------------------------------------- #
@query(
    "pages_concat",
    f"""
    WITH {_SP_SQL},
    md AS (
        SELECT s.doc_id, d.source,
               'https://host' || (s.doc_id % 7)::VARCHAR || '.example.com/p/' || s.doc_id::VARCHAR AS url,
               string_agg(s.piece, '' ORDER BY s.g) AS raw_md
        FROM spans s JOIN documents d ON d.doc_id = s.doc_id
        GROUP BY s.doc_id, d.source
    )
    SELECT source,
           string_agg(e'\\n\\n## Page: ' || url || e'\\n\\n' || raw_md, e'\\n' ORDER BY doc_id) AS combined
    FROM md GROUP BY source
    """,
)
def q_pages_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    md = d.select(
        i.alias("doc_id"),
        "source",
        F.concat(
            F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
            F.lit(".example.com/p/"), i.cast("string"),
        ).alias("url"),
        M.spans_to_markdown(derived_spans(i, F.col("text"))).alias("raw_md"),
    )
    return M.concat_pages(md, "source", "url", "raw_md", "doc_id")


# --------------------------------------------------------------------------- #
# E4 citations variant: numbered link rewriting + references section
# --------------------------------------------------------------------------- #
@query(
    "spans_markdown_citations",
    f"""
    WITH {_SP_SQL},
    numbered AS (
        SELECT *,
               (CASE WHEN kind = 'link'
                     THEN row_number() OVER (PARTITION BY doc_id, (CASE WHEN kind = 'link' THEN 1 ELSE 0 END) ORDER BY g)
                     END) AS cite
        FROM spans
    ),
    body AS (
        SELECT doc_id,
               string_agg(CASE WHEN kind = 'link'
                               THEN '[' || gtext || ']⟨' || cite::VARCHAR || e'⟩\\n\\n'
                               ELSE piece END, '' ORDER BY g) AS body_md,
               coalesce(string_agg(CASE WHEN kind = 'link'
                               THEN '⟨' || cite::VARCHAR || '⟩: ' || ref || e'\\n' END, '' ORDER BY g), '') AS refs,
               sum(CASE WHEN kind = 'link' THEN 1 ELSE 0 END) AS n_links
        FROM numbered GROUP BY doc_id
    )
    SELECT doc_id,
           (CASE WHEN n_links = 0 THEN body_md
                 ELSE body_md || e'## References\\n\\n' || refs END) AS md
    FROM body
    """,
)
def q_spans_markdown_citations(spark: SparkSession, sf_dir: str) -> DataFrame:
    sd = _span_docs(spark, sf_dir)
    return sd.select("doc_id", M.spans_to_markdown_citations("spans").alias("md"))


# --------------------------------------------------------------------------- #
# E8: iframe-by-src merge under the oracle gate — a synthetic corpus where
# every doc is [text a, iframe -> child, text b] (child = (d*13+7) % N);
# the Spark side runs the REAL merge operator (explode -> corpus join ->
# reassemble, operators/extract.py); DuckDB mirrors the splice: the child's
# full span array (including ITS iframe span — the merge is single-level)
# replaces the parent's iframe span, offsets re-indexed.
# --------------------------------------------------------------------------- #
@query(
    "iframe_merge",
    """
    WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
    ids AS (SELECT doc_id::BIGINT AS d FROM documents),
    rows_ AS (
        -- parent span 0
        SELECT d, 0 AS pos, 0 AS cpos, 'text' AS kind,
               'a' || d::VARCHAR AS text, NULL::VARCHAR AS media_ref
        FROM ids
        UNION ALL
        -- spliced child spans (child c = (d*13+7) % n): the child's full
        -- [text, iframe, text] array, iframe span included (single-level)
        SELECT d, 1, 0, 'text', 'a' || c::VARCHAR, NULL
        FROM (SELECT d, (d * 13 + 7) % (SELECT n FROM n) AS c FROM ids) ch0
        UNION ALL
        SELECT d, 1, 1, 'iframe', '',
               'doc://' || ((c * 13 + 7) % (SELECT n FROM n))::VARCHAR
        FROM (SELECT d, (d * 13 + 7) % (SELECT n FROM n) AS c FROM ids) ch1
        UNION ALL
        SELECT d, 1, 2, 'text', 'b' || c::VARCHAR, NULL
        FROM (SELECT d, (d * 13 + 7) % (SELECT n FROM n) AS c FROM ids) ch2
        UNION ALL
        -- parent span 2
        SELECT d, 2, 0, 'text', 'b' || d::VARCHAR, NULL FROM ids
    )
    SELECT ('doc://' || d::VARCHAR) AS doc_id,
           (row_number() OVER (PARTITION BY d ORDER BY pos, cpos) - 1)::INT AS offset,
           kind, text, media_ref
    FROM rows_
    """,
)
def q_iframe_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.extract import merge_iframes_by_src

    d = _t(spark, sf_dir, "documents")
    n = d.count()
    i = F.col("doc_id").cast("long")
    child = F.pmod(i * 13 + 7, F.lit(n))
    spans = F.array(
        F.struct(F.lit("text").alias("kind"),
                 F.concat(F.lit("a"), i.cast("string")).alias("text"),
                 F.lit(None).cast("string").alias("media_ref"),
                 F.lit(0).alias("offset")),
        F.struct(F.lit("iframe").alias("kind"), F.lit("").alias("text"),
                 F.concat(F.lit("doc://"), child.cast("string")).alias("media_ref"),
                 F.lit(1).alias("offset")),
        F.struct(F.lit("text").alias("kind"),
                 F.concat(F.lit("b"), i.cast("string")).alias("text"),
                 F.lit(None).cast("string").alias("media_ref"),
                 F.lit(2).alias("offset")),
    )
    docs = d.select(F.concat(F.lit("doc://"), i.cast("string")).alias("doc_id"),
                    spans.alias("spans"))
    merged = merge_iframes_by_src(docs)
    return merged.select(
        "doc_id", F.posexplode("spans").alias("_o", "s")
    ).select(
        "doc_id", F.col("s.offset").alias("offset"), F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"), F.col("s.media_ref").alias("media_ref"),
    )


# --------------------------------------------------------------------------- #
# interleaved media→text caption pairing (OBELICS-style alignment)
# --------------------------------------------------------------------------- #
@query(
    "media_captions",
    f"""
    WITH {_SP_SQL},
    win AS (
        SELECT doc_id, g, kind, ref,
               last_value(CASE WHEN kind = 'text' THEN gtext END IGNORE NULLS) OVER w_prev AS prev_text,
               last_value(CASE WHEN kind = 'text' THEN g END IGNORE NULLS) OVER w_prev AS prev_off,
               first_value(CASE WHEN kind = 'text' THEN gtext END IGNORE NULLS) OVER w_next AS next_text,
               first_value(CASE WHEN kind = 'text' THEN g END IGNORE NULLS) OVER w_next AS next_off
        FROM spans
        WINDOW w_prev AS (PARTITION BY doc_id ORDER BY g
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               w_next AS (PARTITION BY doc_id ORDER BY g
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT doc_id, g::BIGINT AS offset, ref AS media_ref,
           (CASE WHEN prev_text IS NOT NULL THEN prev_off
                 WHEN next_text IS NOT NULL THEN next_off END)::BIGINT AS caption_offset,
           coalesce(prev_text, next_text) AS caption,
           (CASE WHEN prev_text IS NOT NULL THEN 'prev'
                 WHEN next_text IS NOT NULL THEN 'next' ELSE 'none' END) AS side
    FROM win WHERE kind IN ('image', 'media')
    """,
)
def q_media_captions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every image/media span paired with its nearest text span (caption
    candidate) — the real ``caption_pairs`` array operator (pure HOFs,
    map-side) vs a DuckDB window-function mirror."""
    from ..operators.multimodal import caption_pairs

    sd = _span_docs(spark, sf_dir)
    return (
        sd.select("doc_id", F.explode(caption_pairs("spans")).alias("p"))
        .select(
            "doc_id",
            F.col("p.offset").cast("long").alias("offset"),
            F.col("p.media_ref").alias("media_ref"),
            F.col("p.caption_offset").cast("long").alias("caption_offset"),
            F.col("p.caption").alias("caption"),
            F.col("p.side").alias("side"),
        )
    )


# --------------------------------------------------------------------------- #
# media_freq_dedup — document-frequency boilerplate media removal
# --------------------------------------------------------------------------- #
# A media asset referenced by many documents is boilerplate (logos,
# icons, tracking pixels) — interleaved-corpus pipelines (the
# OBELICS-style pass) drop it before caption pairing so repeated chrome
# never becomes a training pair. Frequency key: a query-local ref
# derivation that plants the realistic shape — ~10% of media spans
# ((doc_id*31+g*17) % 200 < 20) resolve to one of 5 shared CDN "logo"
# assets whose document frequency grows with the corpus at EVERY scale,
# the rest stay doc-unique content images (df=1) like the span lift's
# own refs (which embed doc_id, so raw they'd make every doc its
# asset's sole owner and df could never separate chrome from content).
BOILER_DF = 2  # a ref in MORE THAN this many distinct docs is boilerplate


@query(
    "media_freq_dedup",
    f"""
    WITH {_SP_SQL},
    med AS (
        SELECT doc_id,
               (CASE WHEN (doc_id * 31 + g * 17) % 200 < 20
                     THEN 'https://cdn.example.com/logo'
                          || ((doc_id * 31 + g * 17) % 5)::VARCHAR || '.png'
                     ELSE 'https://host' || ((doc_id + g) % 7)::VARCHAR
                          || '.example.com/img/' || doc_id::VARCHAR || '_'
                          || g::VARCHAR || '.png' END) AS mref
        FROM spans WHERE kind IN ('image', 'media')
    ),
    freq AS (SELECT mref, count(DISTINCT doc_id) AS df FROM med GROUP BY mref)
    SELECT m.doc_id,
           count(*)::BIGINT AS n_media,
           sum(CASE WHEN f.df > {BOILER_DF} THEN 1 ELSE 0 END)::BIGINT AS n_boiler,
           sum(CASE WHEN f.df > {BOILER_DF} THEN 0 ELSE 1 END)::BIGINT AS n_kept,
           round(sum(CASE WHEN f.df > {BOILER_DF} THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 6) AS boiler_ratio
    FROM med m JOIN freq f USING (mref)
    GROUP BY m.doc_id
    """,
)
def q_media_freq_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate-media accounting: document frequency per
    shared media ref (hash groupBy on the ref — only refs shuffle, never
    blobs or span text), flagged refs joined back, per-doc rollup. The
    same two-shuffle shape as dedup_lines; linear in media spans."""
    sd = _span_docs(spark, sf_dir)
    med = (
        sd.select("doc_id", F.explode_outer("spans").alias("s"))
        .where(F.col("s.kind").isin("image", "media"))
        .select(
            "doc_id",
            F.when(
                F.pmod(F.col("doc_id") * 31 + F.col("s.offset") * 17, F.lit(200)) < 20,
                F.concat(
                    F.lit("https://cdn.example.com/logo"),
                    F.pmod(F.col("doc_id") * 31 + F.col("s.offset") * 17, F.lit(5)).cast("string"),
                    F.lit(".png"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("https://host"),
                    F.pmod(F.col("doc_id") + F.col("s.offset"), F.lit(7)).cast("string"),
                    F.lit(".example.com/img/"),
                    F.col("doc_id").cast("string"), F.lit("_"),
                    F.col("s.offset").cast("string"),
                    F.lit(".png"),
                )
            ).alias("mref"),
        )
    )
    freq = med.groupBy("mref").agg(F.count_distinct("doc_id").alias("df"))
    boiler = F.when(F.col("df") > BOILER_DF, 1).otherwise(0)
    return (
        med.join(freq, "mref")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_media"),
            F.sum(boiler).alias("n_boiler"),
            F.sum(1 - boiler).alias("n_kept"),
            F.round(F.sum(boiler) / F.count("*").cast("double"), 6).alias("boiler_ratio"),
        )
    )


# --------------------------------------------------------------------------- #
# seq_pack_interleaved — multimodal sequence packing (text + image tokens)
# --------------------------------------------------------------------------- #
# The interleaved twin of dataops' seq_pack: a document's budget cost is
# its text token count PLUS a fixed IMG_TOKENS per image/media span (the
# patch-token footprint a vision encoder contributes to the sequence),
# packed per source shard in doc_id order via window prefix sums — the
# scale-safe unit (per-shard windows parallelize like per-file packing;
# a global order would be one serial cumsum).
IMG_TOKENS = 16
INTER_BUDGET = 128


@query(
    "seq_pack_interleaved",
    f"""
    WITH {_SP_SQL},
    cost AS (
        SELECT s.doc_id, d.source,
               sum(CASE WHEN s.kind IN ('image', 'media') THEN 0 ELSE s.wc END)::BIGINT
                   AS n_text_tokens,
               sum(CASE WHEN s.kind IN ('image', 'media') THEN 1 ELSE 0 END)::BIGINT
                   AS n_media,
               sum(CASE WHEN s.kind IN ('image', 'media') THEN {IMG_TOKENS}
                        ELSE s.wc END)::BIGINT AS cost
        FROM spans s JOIN documents d ON d.doc_id = s.doc_id
        GROUP BY s.doc_id, d.source
    )
    SELECT doc_id, source, n_text_tokens, n_media, cost,
           (coalesce(sum(cost) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {INTER_BUDGET})::BIGINT
               AS pack_id,
           (coalesce(sum(cost) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % {INTER_BUDGET})::BIGINT
               AS offset_in_pack
    FROM cost
    """,
)
def q_seq_pack_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack interleaved documents into fixed INTER_BUDGET-token training
    sequences where media spans cost IMG_TOKENS each: per-doc cost is a
    pure array fold over the spans column (no explode — map-side, inside
    the scan projection), packing is the two-level (block-sharded)
    prefix sum from dataops.pack_prefix — few mega-sources no longer
    serialize (r3 verdict item 6)."""
    from .dataops import pack_prefix

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    spans = derived_spans(i, F.col("text"))
    is_media = lambda s: s["kind"].isin("image", "media")  # noqa: E731
    wc = lambda s: F.size(F.split(s["text"], " "))  # noqa: E731

    def fold(per_span):
        return F.aggregate(spans, F.lit(0).cast("long"),
                           lambda acc, s: acc + per_span(s))

    base = d.where(F.size(spans) > 0).select(
        i.alias("doc_id"),
        "source",
        fold(lambda s: F.when(is_media(s), F.lit(0)).otherwise(wc(s)).cast("long"))
            .alias("n_text_tokens"),
        fold(lambda s: F.when(is_media(s), F.lit(1)).otherwise(F.lit(0)).cast("long"))
            .alias("n_media"),
        fold(lambda s: F.when(is_media(s), F.lit(IMG_TOKENS)).otherwise(wc(s)).cast("long"))
            .alias("cost"),
    )
    j, pre = pack_prefix(base, "cost")
    return j.select(
        "doc_id", "source", "n_text_tokens", "n_media", "cost",
        F.floor(pre / INTER_BUDGET).cast("long").alias("pack_id"),
        F.pmod(pre, F.lit(INTER_BUDGET)).cast("long").alias("offset_in_pack"),
    )


# --------------------------------------------------------------------------- #
# U5: multi-step session reveal (reference multi_step_js_actions /
# multi_step_wait_conditions, crawl_agent.py:147-150,691-692;
# examples/multi_step_interaction.py — scroll / click-More / wait loops).
# The batch model: a session over a page is a monotone sequence of span-
# prefix reveals — step 0 is the initial render, each of the doc's
# K = 1 + doc_id%3 JS actions reveals 1-4 more spans unless its wait_for
# condition times out. The wait CHANNEL (crawl_agent.py:127 "css:" /
# "js:" prefixes) is assigned per doc (doc_id%3) and picks the die, the
# same three channels the engine fetch-sim models
# (fixtures.spans_for_index(wait_for=...)):
#   ''    → per-(doc, step) die   (doc_id*13 + t) % 3 == 0 times out
#   css:  → per-DOC structural die (doc_id*11) % 4 == 0 — a doc lacking
#           the selector's target times out at EVERY step
#   js:   → per-(doc, step) behavioral die (doc_id*17 + t*3) % 3 == 0,
#           an independent schedule from ''
# All arithmetic is integer → exact cross-engine; the Spark side slices
# the REAL derived span arrays, the oracle mirrors over a kind list.
# --------------------------------------------------------------------------- #
@query(
    "session_steps_spans",
    f"""
    WITH {_SP_SQL},
    kinds AS MATERIALIZED (
        SELECT doc_id, count(*)::BIGINT AS n, list(kind ORDER BY g) AS ks
        FROM sp GROUP BY doc_id
    ),
    sess AS MATERIALIZED (
        SELECT doc_id, n, ks, (1 + doc_id % 3)::INT AS k,
               CASE WHEN doc_id % 3 = 1 THEN 'css:.more-item'
                    WHEN doc_id % 3 = 2 THEN 'js:window.__loaded'
                    ELSE '' END AS channel,
               list_prepend(0, list_transform(generate_series(1, (1 + doc_id % 3)::INT), t ->
                   CASE WHEN doc_id % 3 = 1 THEN
                            CASE WHEN (doc_id*11) % 4 <> 0
                                 THEN 1 + (doc_id*7 + t*5) % 4 ELSE 0 END
                        WHEN doc_id % 3 = 2 THEN
                            CASE WHEN (doc_id*17 + t*3) % 3 <> 0
                                 THEN 1 + (doc_id*7 + t*5) % 4 ELSE 0 END
                        ELSE
                            CASE WHEN (doc_id*13 + t) % 3 <> 0
                                 THEN 1 + (doc_id*7 + t*5) % 4 ELSE 0 END
                   END)) AS rv
        FROM kinds
    ),
    stepped AS (
        SELECT doc_id, n, ks, k, channel, rv, u.s AS step,
               greatest(n - list_reduce(rv, (a, b) -> a + b), least(n, 1)) AS v0
        FROM sess, unnest(generate_series(0, k)) AS u(s)
    ),
    vis AS (
        SELECT doc_id, k, n, ks, channel, step,
               least(n, v0 + list_reduce(list_slice(rv, 1, step + 1), (a, b) -> a + b)) AS v,
               CASE WHEN step = 0 THEN 0
                    ELSE least(n, v0 + list_reduce(list_slice(rv, 1, step), (a, b) -> a + b))
               END AS vprev
        FROM stepped
    )
    SELECT doc_id, step::INT AS step, k::INT AS n_steps, channel,
           v::BIGINT AS n_visible, (v - vprev)::BIGINT AS n_new,
           len(list_filter(ks[1:v::INT], x -> x = 'link'))::BIGINT AS n_links_visible,
           (v = n) AS sess_done
    FROM vis
    """,
)
def q_session_steps_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    sd = _span_docs(spark, sf_dir).where(F.size("spans") > 0)
    i = F.col("doc_id")
    n = F.size("spans").cast("long")
    k = (F.lit(1) + F.pmod(i, F.lit(3))).cast("int")
    ci = F.pmod(i, F.lit(3))
    channel = (F.when(ci == 1, F.lit("css:.more-item"))
               .when(ci == 2, F.lit("js:window.__loaded"))
               .otherwise(F.lit("")))

    def reveal(t):
        amount = F.lit(1) + F.pmod(i * 7 + t * 5, F.lit(4))
        resolved = (
            F.when(ci == 1, F.pmod(i * 11, F.lit(4)) != 0)       # css: per-doc
            .when(ci == 2, F.pmod(i * 17 + t * 3, F.lit(3)) != 0)  # js: per-step
            .otherwise(F.pmod(i * 13 + t, F.lit(3)) != 0))       # legacy die
        return F.when(resolved, amount).otherwise(F.lit(0)).cast("long")

    def psum(s):
        # sum of reveals 1..s; s may be 0 (Spark sequence(1,0) would
        # DESCEND, so guard) — all inside the row, no shuffle
        return F.when(s == 0, F.lit(0).cast("long")).otherwise(
            F.aggregate(F.sequence(F.lit(1), s), F.lit(0).cast("long"),
                        lambda acc, t: acc + reveal(t)))

    v0 = F.greatest(n - psum(k), F.least(n, F.lit(1).cast("long")))
    base = sd.select(
        "doc_id", F.col("spans"), n.alias("n"), k.alias("k"),
        channel.alias("channel"), v0.alias("v0"),
        F.explode(F.sequence(F.lit(0), k)).alias("step"),
    )
    s = F.col("step")
    v = F.least(F.col("n"), F.col("v0") + psum(s))
    vprev = F.when(s == 0, F.lit(0).cast("long")).otherwise(
        F.least(F.col("n"), F.col("v0") + psum(s - 1)))
    return base.select(
        "doc_id", s.cast("int").alias("step"), F.col("k").alias("n_steps"),
        "channel",
        v.alias("n_visible"), (v - vprev).alias("n_new"),
        F.size(F.filter(F.slice("spans", F.lit(1), v.cast("int")),
                        lambda sp: sp["kind"] == "link")).cast("long")
        .alias("n_links_visible"),
        (v == F.col("n")).alias("sess_done"),
    )


# --------------------------------------------------------------------------- #
# WAT export (Common Crawl's metadata sidecar, completing the
# WARC / WAT / WET interchange triple): a WARC/1.0 ``metadata`` record
# per page whose JSON payload carries the envelope subset consumers
# actually read — target URI, page title, and the ordered outlink list
# (the input the CC link-graph / webgraph pipelines are built from).
# WARC-Refers-To points at the source capture, the record id is salted
# ('#wat'). Scale posture: the outlink array is built with array HOFs
# (filter/transform on the span column — map-side, NO explode), the
# JSON by string concat in the scan projection; double-quote/backslash
# escaping on the title mirrors in both engines.
# --------------------------------------------------------------------------- #
from ..functions import hashing as _H  # noqa: E402 (tier-local import)

_WAT_H60_OWN = _H.h60_sql("url || '#wat'")
_WAT_H60_SRC = _H.h60_sql("url")


@query(
    "wat_export",
    f"""
    WITH {_SP_SQL},
    perdoc AS (
        SELECT doc_id,
               coalesce(max(CASE WHEN g = 0 THEN gtext END), '') AS title,
               coalesce(string_agg(CASE WHEN kind = 'link'
                            THEN '{{"url":"' || ref || '"}}' END, ',' ORDER BY g), '') AS links_json,
               count(*) FILTER (WHERE kind = 'link')::BIGINT AS n_links
        FROM spans GROUP BY doc_id
    ),
    pages AS (
        SELECT d.doc_id::BIGINT AS doc_id,
               'https://host' || (d.doc_id % 7)::VARCHAR || '.example.com/p/'
                   || d.doc_id::VARCHAR AS url,
               coalesce(p.n_links, 0) AS n_links,
               ('{{"Envelope":{{"WARC-Header-Metadata":{{"WARC-Target-URI":"'
                || 'https://host' || (d.doc_id % 7)::VARCHAR || '.example.com/p/' || d.doc_id::VARCHAR
                || '"}},"Payload-Metadata":{{"HTML-Metadata":{{"Head":{{"Title":"'
                || replace(replace(coalesce(p.title, ''), '\\', '\\\\'), '"', '\\"')
                || '"}},"Links":[' || coalesce(p.links_json, '') || ']}}}}}}}}') AS payload
        FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
    ),
    recs AS (
        SELECT doc_id, url, n_links, payload,
               {{RID_OWN}} AS rid_own, {{RID_SRC}} AS rid_src
        FROM pages
    )
    SELECT doc_id, url, n_links,
           strlen(payload)::BIGINT AS content_length,
           'WARC/1.0' || chr(13) || chr(10)
           || 'WARC-Type: metadata' || chr(13) || chr(10)
           || 'WARC-Record-ID: <urn:h60:'
           || rid_own::VARCHAR || '>' || chr(13) || chr(10)
           || 'WARC-Date: 2026-01-01T00:00:00Z' || chr(13) || chr(10)
           || 'WARC-Refers-To: <urn:h60:' || rid_src::VARCHAR || '>' || chr(13) || chr(10)
           || 'WARC-Target-URI: ' || url || chr(13) || chr(10)
           || 'Content-Type: application/json' || chr(13) || chr(10)
           || 'Content-Length: ' || strlen(payload)::VARCHAR
           || chr(13) || chr(10) || chr(13) || chr(10)
           || payload || chr(13) || chr(10) || chr(13) || chr(10) AS wat
    FROM recs
    """.replace("{RID_OWN}", _WAT_H60_OWN).replace("{RID_SRC}", _WAT_H60_SRC),
)
def q_wat_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sinks import warc_format
    from ..functions.hashing import h60

    sd = _span_docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://host"),
        F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
    )
    first = F.get(F.col("spans"), 0)
    title = F.coalesce(
        F.when(first["kind"] == "heading", first["text"]), F.lit(""))
    esc = F.replace(F.replace(title, F.lit("\\"), F.lit("\\\\")),
                    F.lit('"'), F.lit('\\"'))
    links = F.filter(F.col("spans"), lambda s: s.kind == "link")
    links_json = F.concat_ws(
        ",", F.transform(links, lambda s: F.concat(
            F.lit('{"url":"'), s.media_ref, F.lit('"}'))))
    payload = F.concat(
        F.lit('{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"'),
        url,
        F.lit('"},"Payload-Metadata":{"HTML-Metadata":{"Head":{"Title":"'),
        esc, F.lit('"},"Links":['), links_json, F.lit("]}}}}"),
    )
    pages = sd.select(
        F.col("doc_id"), url.alias("url"),
        F.size(links).cast("long").alias("n_links"),
        payload.alias("payload"),
    )
    src_id = F.concat(F.lit("<urn:h60:"), h60(F.col("url")).cast("string"),
                      F.lit(">"))
    return warc_format(
        pages, url_col="url", payload_col="payload",
        content_type="application/json", record_type="metadata",
        refers_to=src_id, record_id_salt="#wat",
    ).select("doc_id", "url", "n_links", "content_length",
             F.col("warc").alias("wat"))
