"""Multimodal pipeline queries under the oracle gate.

The engine's media path (operators/multimodal.py) is real mapInPandas
plumbing over synthetic blobs whose header/body arithmetic is pure
md5 — so DuckDB can recompute every output from first principles:

    blob = MAGIC | kind(1) | w(u16) | h(u16) | n(u16) | body[w*h]
    digest = md5(media_ref) bytes; w = 16 + d0 % 240; h = 16 + d1 % 240
    n = 1 (image) else 1 + d2 % 64; body[i] = digest[i % 16]

The Spark side runs the REAL pipeline (build_media_blobs →
extract_media_meta / media_features / sample_frames, Arrow-batched);
the oracle re-derives the same numbers from the md5 hex string. Feature
histograms are compared as integer counts (normalized float32 ratios
are scaled back by the pixel count — exact for counts ≤ 2^16), so no
cross-engine float noise enters the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..operators.multimodal import (
    build_media_blobs,
    extract_media_meta,
    media_features,
    phash_variants,
    sample_frames,
)
from .registry import query, table as _t

# ext die matches S7's media_ext_filter shape; includes video/audio kinds
_EXTS = ["jpg", "png", "mp4", "wav", "webp", "gif", "mp3", "webm"]

_EXT_LIST_SQL = "['" + "', '".join(_EXTS) + "']"
_REF_SQL = (
    "('https://host' || (doc_id % 7)::VARCHAR || '.example.com/media/' || "
    f"doc_id::VARCHAR || '.' || ({_EXT_LIST_SQL})[(doc_id % 8)::INT + 1])"
)

# digest byte k (0-based) of md5(ref) as an integer
def _db(ref_expr: str, k: int) -> str:
    return f"(('0x' || substr(md5({ref_expr}), {2 * k + 1}, 2))::INT)"


_KIND_SQL = (
    "(CASE WHEN ext IN ('jpg', 'jpeg', 'png', 'gif', 'webp') THEN 'image' "
    "WHEN ext IN ('mp4', 'webm') THEN 'video' "
    "WHEN ext IN ('mp3', 'wav') THEN 'audio' ELSE 'image' END)"
)

_BASE_SQL = f"""
    refs AS (
        SELECT DISTINCT {_REF_SQL} AS media_ref,
               ({_EXT_LIST_SQL})[(doc_id % 8)::INT + 1] AS ext
        FROM documents
    ),
    hdr AS (
        SELECT media_ref, {_KIND_SQL} AS kind,
               16 + {_db('media_ref', 0)} % 240 AS width,
               16 + {_db('media_ref', 1)} % 240 AS height,
               (CASE WHEN {_KIND_SQL} = 'image' THEN 1
                     ELSE 1 + {_db('media_ref', 2)} % 64 END) AS n_frames
        FROM refs
    )
"""


def _refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    exts = F.array(*[F.lit(e) for e in _EXTS])
    ref = F.concat(
        F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
        F.lit(".example.com/media/"), i.cast("string"), F.lit("."),
        F.element_at(exts, F.pmod(i, F.lit(8)).cast("int") + 1),
    )
    return d.select(ref.alias("media_ref"))


@query(
    "media_meta",
    f"""
    WITH {_BASE_SQL}
    SELECT media_ref, kind, width::INT AS width, height::INT AS height,
           n_frames::INT AS n_frames,
           (11 + width * height)::BIGINT AS n_bytes
    FROM hdr
    """,
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """build_media_blobs → extract_media_meta, the real Arrow pipeline."""
    blobs = build_media_blobs(_refs(spark, sf_dir))
    return extract_media_meta(blobs).select(
        "media_ref", "kind", "width", "height", "n_frames", "n_bytes"
    )


@query(
    "media_frames",
    f"""
    WITH {_BASE_SQL}
    SELECT media_ref, (f.f * 10)::INT AS frame_idx,
           width::INT AS width, height::INT AS height
    FROM hdr, unnest(generate_series(0, (n_frames - 1) // 10)) AS f(f)
    WHERE kind = 'video'
    """,
)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = build_media_blobs(_refs(spark, sf_dir))
    return sample_frames(blobs, every=10)


# feature histogram, integer-recovered: body[i] = digest[i % 16], so
# bucket b's count = Σ_j<16 [digest[j] % 16 == b] * (cycles + (j < rem))
# with cycles = (w*h) // 16, rem = (w*h) % 16.
_CNT_SQL = ", ".join(
    f"""CAST(list_sum(list_transform(generate_series(0, 15),
        j -> (CASE WHEN ('0x' || substr(md5(media_ref), 2 * j + 1, 2))::INT % 16 = {b}
                   THEN (width * height) // 16 + (CASE WHEN j < (width * height) % 16 THEN 1 ELSE 0 END)
                   ELSE 0 END))) AS BIGINT) AS c{b}"""
    for b in range(4)
)


@query(
    "media_features_hist",
    f"""
    WITH {_BASE_SQL}
    SELECT media_ref, (width * height)::BIGINT AS n_px, {_CNT_SQL}
    FROM hdr
    """,
)
def q_media_features_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media_features (L1-normalized float32 histogram) scaled back to
    exact integer counts by the pixel total — float-noise-free compare."""
    blobs = build_media_blobs(_refs(spark, sf_dir))
    feats = media_features(blobs, dim=16)
    meta = extract_media_meta(blobs).select(
        "media_ref", (F.col("width") * F.col("height")).cast("long").alias("n_px")
    )
    j = feats.join(meta, "media_ref")
    return j.select(
        "media_ref", "n_px",
        *[
            F.round(F.get("features", b).cast("double") * F.col("n_px"), 0)
            .cast("long").alias(f"c{b}")
            for b in range(4)
        ],
    )


# --------------------------------------------------------------------------- #
# perceptual-hash near-dup: originals vs responsive thumbnails (aHash-60)
# --------------------------------------------------------------------------- #
PHASH_HAMMING_T = 12


@query(
    "media_phash_dedup",
    f"""
    WITH {_BASE_SQL},
    imgs AS (SELECT media_ref, width AS w, height AS h FROM hdr WHERE kind = 'image'),
    dims AS (
        SELECT media_ref, w, h,
               greatest(1, floor(w * least(1.0, 64.0 / greatest(w, h))))::INT AS nw,
               greatest(1, floor(h * least(1.0, 64.0 / greatest(w, h))))::INT AS nh
        FROM imgs
    ),
    cells AS (
        SELECT yy.y AS y, xx.x AS x
        FROM (SELECT unnest(generate_series(0, 7)) AS y) yy,
             (SELECT unnest(generate_series(0, 7)) AS x) xx
    ),
    -- body[i] = md5(ref) byte (i % 16); orig samples [y*h//8, x*w//8],
    -- thumb composes the real nearest-neighbor resize index math
    samp AS (
        SELECT media_ref AS base_ref, media_ref AS out_ref, y, x,
               ((y * h) // 8) * w + ((x * w) // 8) AS pix
        FROM dims, cells
        UNION ALL
        SELECT media_ref, media_ref || '#thumb', y, x,
               ((((y * nh) // 8) * h) // nh) * w + ((((x * nw) // 8) * w) // nw) AS pix
        FROM dims, cells
    ),
    px AS (
        SELECT out_ref, y * 8 + x AS j,
               ('0x' || substr(md5(base_ref), 2 * (pix % 16) + 1, 2))::INT AS v
        FROM samp
    ),
    pxt AS (
        SELECT out_ref, j, v, sum(v) OVER (PARTITION BY out_ref) AS tot FROM px
    ),
    hs AS (
        SELECT out_ref AS media_ref,
               sum(CASE WHEN j < 60 AND v * 64 > tot
                        THEN (1::BIGINT << j) ELSE 0::BIGINT END)::BIGINT AS phash
        FROM pxt GROUP BY out_ref
    ),
    segs AS (
        SELECT media_ref, phash, b.band, (phash >> (b.band * 15)) & 32767 AS key
        FROM hs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
    ),
    cand AS (
        SELECT DISTINCT a.media_ref AS a_ref, b.media_ref AS b_ref,
               a.phash AS sa, b.phash AS sb
        FROM segs a JOIN segs b
          ON a.band = b.band AND a.key = b.key AND a.media_ref < b.media_ref
    )
    SELECT a_ref, b_ref, bit_count(xor(sa, sb))::INT AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {PHASH_HAMMING_T}
    """,
)
def q_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup over the REAL multimodal pipeline: blobs →
    aHash-60 of original + nearest-neighbor thumbnail (the srcset/
    responsive-variant shape byte-exact dedup misses) → 4×15-bit band
    LSH join → hamming verify. Candidate generation is LSH (recall < 1
    for heavily rescaled non-square images — documented, like
    dedup_embedding); both engines compute the identical subset.

    Scale: blob bytes stay map-side in mapInPandas; only (ref, phash)
    pairs shuffle, and the self-join is banded — pair count Σ n_band²,
    never n²."""
    blobs = build_media_blobs(_refs(spark, sf_dir))
    # repartition = ReusedExchange barrier: the self-join reuses ONE
    # mapInPandas pass instead of synthesizing + hashing blobs twice
    ph = phash_variants(blobs).repartition("media_ref")
    bands = F.array(*[H.simhash_band(F.col("phash"), b) for b in range(4)])
    segs = ph.select("media_ref", "phash", F.posexplode_outer(bands).alias("band", "key"))
    a, b = segs.alias("a"), segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.media_ref") < F.col("b.media_ref")),
        )
        .select(
            F.col("a.media_ref").alias("a_ref"), F.col("b.media_ref").alias("b_ref"),
            F.col("a.phash").alias("sa"), F.col("b.phash").alias("sb"),
        )
        .dropDuplicates(["a_ref", "b_ref"])
    )
    ham = H.hamming60(F.col("sa"), F.col("sb"))
    return cand.where(ham <= PHASH_HAMMING_T).select(
        "a_ref", "b_ref", ham.cast("int").alias("hamming"))


# --------------------------------------------------------------------------- #
# interleaved caption-quality scoring (the CLIP-filter shape, deterministic)
# --------------------------------------------------------------------------- #
CAPTION_KEEP_MIN = 0.4   # cosine threshold (≈ observed median: 8-token captions
                         # spread thin over 16 buckets vs dense media histograms)


def _tvec16(text_col) -> "F.Column":
    """Deterministic 16-bucket token-hash histogram of a text column —
    the text-tower stand-in shared by the CLIP-shape ops (md5-60 token
    hash % 16, left-fold accumulation; DuckDB twin in ``_tvec_sql``)."""
    toks = F.filter(F.split(F.coalesce(text_col, F.lit("")), r"\s+"),
                    lambda w: w != "")
    hashes = F.transform(toks, lambda w: F.pmod(H.h60(w), F.lit(16)).cast("int"))
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 16),
        lambda acc, hh: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(15)),
            lambda c, i: c + F.when(hh == i, 1).otherwise(0),
        ),
    )


def _dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _media_vec16(refs: DataFrame) -> DataFrame:
    """(media_ref, mv) — the media-tower stand-in: the REAL blob
    pipeline's 16-bucket byte histogram recovered to integer counts.

    Pinned-width repartition before the blob stage: AQE coalesces the
    small (ref-string) exchange to ONE partition, which would serialize
    the expensive mapInPandas blob synthesis; pinning the count keeps
    the Arrow stage at full parallelism (tiny rows in, heavy work per
    row — the one case where AQE's size heuristic is wrong)."""
    from ..operators.multimodal import media_features_meta

    n = int(refs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    blobs = build_media_blobs(refs.repartition(n, "media_ref"))
    # single decode pass yields features AND the pixel count — the
    # two-op form (media_features ⋈ extract_media_meta) synthesized and
    # decoded every blob twice and paid a join to reunite the halves
    fm = media_features_meta(blobs, dim=16)
    return fm.select(
        "media_ref",
        F.transform(
            "features",
            lambda f: F.round(f.cast("double") * F.col("n_px"), 0).cast("long")
        ).alias("mv"),
    )


def _cosine6(tv, mv) -> "F.Column":
    """round(cos(tv, mv), 6); 0.0 when either side is null/zero."""
    dot, nt, nm = _dot(tv, mv), F.sqrt(_dot(tv, tv)), F.sqrt(_dot(mv, mv))
    return F.when((nt > 0) & (nm > 0) & mv.isNotNull() & tv.isNotNull(),
                  F.round(dot / (nt * nm), 6)).otherwise(F.lit(0.0))


@query(
    "media_caption_score",
    None,  # SQL assembled below (needs spansops' span CTE)
)
def q_media_caption_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION/DataComp-shape caption filtering over the interleaved
    corpus: every (media span, caption candidate) pair from the
    OBELICS-style alignment gets an image-text similarity score and a
    keep flag. The embedding stage is the documented deterministic
    stand-in (K1 stub philosophy): media vector = the real pipeline's
    16-bucket byte histogram recovered to integer counts; text vector =
    16-bucket token-hash histogram (md5-60 % 16); score = cosine with a
    fixed fold order, so DuckDB reproduces every double bit-for-bit.
    Swap the two vectorizers for CLIP towers in production — the join
    shape, Arrow batching, and filter semantics are what's under test.

    Scale: blobs stay map-side (mapInPandas); the caption side is pure
    array HOFs inside the scan; the only shuffle is the (media_ref →
    16 ints) feature join, broadcast-size per media shard."""
    from ..operators.multimodal import caption_pairs
    from .spansops import _span_docs

    sd = _span_docs(spark, sf_dir)
    pairs = (
        sd.select("doc_id", F.explode(caption_pairs("spans")).alias("p"))
        .select(
            "doc_id", F.col("p.offset").cast("long").alias("offset"),
            F.col("p.media_ref").alias("media_ref"),
            F.col("p.caption").alias("caption"),
        )
    )
    mvec = _media_vec16(pairs.select("media_ref"))
    j = pairs.withColumn("tv", _tvec16(F.col("caption"))).join(
        mvec, "media_ref", "left")
    score = _cosine6(F.col("tv"), F.col("mv"))
    return j.select(
        "doc_id", "offset", "media_ref",
        score.alias("score"),
        (score >= F.lit(CAPTION_KEEP_MIN)).alias("keep"),
    )


def _fold16_sql(term: str) -> str:
    """Σ over i=1..16 of ``term`` (uses i), fixed left-fold order."""
    return (f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(generate_series(1, 16), i -> {term})), (a, b) -> a + b)")


def _register_caption_score_sql() -> None:
    from ..functions.hashing import h60_sql
    from .registry import _ORACLES
    from .spansops import _SP_SQL

    db_j = "('0x' || substr(md5(media_ref), 2 * j + 1, 2))::INT"
    mcnt = (f"CAST(list_sum(list_transform(generate_series(0, 15), j -> "
            f"CASE WHEN {db_j} % 16 = b THEN (w * h) // 16 + "
            f"(CASE WHEN j < (w * h) % 16 THEN 1 ELSE 0 END) ELSE 0 END)) AS BIGINT)")
    _ORACLES["media_caption_score"] = f"""
    WITH {_SP_SQL},
    win AS (
        SELECT doc_id, g, kind, ref,
               last_value(CASE WHEN kind = 'text' THEN gtext END IGNORE NULLS) OVER w_prev AS prev_text,
               first_value(CASE WHEN kind = 'text' THEN gtext END IGNORE NULLS) OVER w_next AS next_text
        FROM spans
        WINDOW w_prev AS (PARTITION BY doc_id ORDER BY g
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               w_next AS (PARTITION BY doc_id ORDER BY g
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ),
    caps AS (
        SELECT doc_id, g AS off, ref AS media_ref,
               coalesce(prev_text, next_text) AS caption
        FROM win WHERE kind IN ('image', 'media')
    ),
    mdims AS (
        SELECT media_ref,
               16 + ('0x' || substr(md5(media_ref), 1, 2))::INT % 240 AS w,
               16 + ('0x' || substr(md5(media_ref), 3, 2))::INT % 240 AS h
        FROM (SELECT DISTINCT media_ref FROM caps)
    ),
    mvec AS MATERIALIZED (
        SELECT media_ref,
               list_transform(generate_series(0, 15), b -> {mcnt}) AS mv
        FROM mdims
    ),
    tok AS MATERIALIZED (
        SELECT doc_id, off, media_ref,
               list_transform(
                   list_filter(regexp_split_to_array(coalesce(caption, ''), '\\s+'),
                               w -> w <> ''),
                   w -> ({h60_sql('w')} % 16)::INT) AS hs
        FROM caps
    ),
    tvec AS MATERIALIZED (
        SELECT doc_id, off, media_ref,
               list_transform(generate_series(0, 15),
                              b -> len(list_filter(hs, x -> x = b))::BIGINT) AS tv
        FROM tok
    ),
    scored AS (
        SELECT t.doc_id, t.off, t.media_ref,
               {_fold16_sql('t.tv[i]::DOUBLE * m.mv[i]::DOUBLE')} AS dot,
               sqrt({_fold16_sql('t.tv[i]::DOUBLE * t.tv[i]::DOUBLE')}) AS nt,
               sqrt({_fold16_sql('m.mv[i]::DOUBLE * m.mv[i]::DOUBLE')}) AS nm
        FROM tvec t LEFT JOIN mvec m USING (media_ref)
    )
    SELECT doc_id, off::BIGINT AS offset, media_ref,
           (CASE WHEN nt > 0 AND nm > 0 THEN round(dot / (nt * nm), 6)
                 ELSE 0.0 END) AS score,
           (CASE WHEN nt > 0 AND nm > 0
                 THEN round(dot / (nt * nm), 6) >= {CAPTION_KEEP_MIN}
                 ELSE FALSE END) AS keep
    FROM scored
    """


_register_caption_score_sql()


# --------------------------------------------------------------------------- #
# interleaved document assembly (the MMC4 shape: global image→text assignment)
# --------------------------------------------------------------------------- #
@query(
    "interleave_assemble",
    None,  # SQL assembled below (needs spansops' span CTE)
)
def q_interleave_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMC4-shape interleaved assembly: assign every image/media span to
    the BEST-matching text span of its document by image-text similarity
    (argmax over the whole document, not just the adjacent span the
    OBELICS-style ``media_captions`` pairing uses — MMC4 §2 does exactly
    this with CLIP scores over each document's sentence list). Ties break
    to the earliest text span; documents with no text spans keep the
    media row with a NULL assignment and score 0.

    Same deterministic stand-in towers as media_caption_score (byte
    histogram ↔ token-hash histogram, md5-exact on both engines); swap
    for CLIP in production — the assignment join/argmax shape is what's
    under test.

    Scale: the media×text cross is PER-DOCUMENT (bounded by page span
    counts, never corpus-sized) and runs in one doc_id-keyed shuffle;
    the media-vector join keys on media_ref only. Both sides prune to
    (id, 16 ints) before shuffling; blob bytes stay map-side."""
    from pyspark.sql import Window

    from .spansops import _span_docs

    sd = _span_docs(spark, sf_dir)
    rows = sd.select("doc_id", F.explode_outer("spans").alias("s"))
    texts = rows.where(F.col("s.kind") == "text").select(
        "doc_id",
        F.col("s.offset").cast("long").alias("t_off"),
        _tvec16(F.col("s.text")).alias("tv"),
    )
    media = rows.where(F.col("s.kind").isin("image", "media")).select(
        "doc_id",
        F.col("s.offset").cast("long").alias("offset"),
        F.col("s.media_ref").alias("media_ref"),
    )
    # no distinct: derived media refs embed {doc_id}_{g} — unique per
    # span already, and an agg exchange here would let AQE re-coalesce
    # the blob stage _media_vec16 deliberately keeps wide
    mvec = _media_vec16(media.select("media_ref"))
    j = (
        media.join(mvec, "media_ref")
        .join(texts, "doc_id", "left")
        .withColumn("score", _cosine6(F.col("tv"), F.col("mv")))
    )
    w = Window.partitionBy("doc_id", "offset").orderBy(
        F.desc("score"), F.asc_nulls_last("t_off"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id", "offset", "media_ref",
            F.col("t_off").alias("assigned_offset"),
            "score",
        )
    )


def _register_interleave_assemble_sql() -> None:
    from ..functions.hashing import h60_sql
    from .registry import _ORACLES
    from .spansops import _SP_SQL

    db_j = "('0x' || substr(md5(media_ref), 2 * j + 1, 2))::INT"
    mcnt = (f"CAST(list_sum(list_transform(generate_series(0, 15), j -> "
            f"CASE WHEN {db_j} % 16 = b THEN (w * h) // 16 + "
            f"(CASE WHEN j < (w * h) % 16 THEN 1 ELSE 0 END) ELSE 0 END)) AS BIGINT)")
    nt2 = _fold16_sql('t.tv[i]::DOUBLE * t.tv[i]::DOUBLE')
    nm2 = _fold16_sql('v.mv[i]::DOUBLE * v.mv[i]::DOUBLE')
    dot = _fold16_sql('t.tv[i]::DOUBLE * v.mv[i]::DOUBLE')
    _ORACLES["interleave_assemble"] = f"""
    WITH {_SP_SQL},
    texts AS MATERIALIZED (
        SELECT doc_id, g AS t_off,
               list_transform(generate_series(0, 15),
                   b -> len(list_filter(
                       list_transform(
                           list_filter(regexp_split_to_array(coalesce(gtext, ''), '\\s+'),
                                       w -> w <> ''),
                           w -> ({h60_sql('w')} % 16)::INT),
                       x -> x = b))::BIGINT) AS tv
        FROM spans WHERE kind = 'text'
    ),
    media AS (
        SELECT doc_id, g AS off, ref AS media_ref
        FROM spans WHERE kind IN ('image', 'media')
    ),
    mdims AS (
        SELECT media_ref,
               16 + ('0x' || substr(md5(media_ref), 1, 2))::INT % 240 AS w,
               16 + ('0x' || substr(md5(media_ref), 3, 2))::INT % 240 AS h
        FROM (SELECT DISTINCT media_ref FROM media)
    ),
    mvec AS MATERIALIZED (
        SELECT media_ref,
               list_transform(generate_series(0, 15), b -> {mcnt}) AS mv
        FROM mdims
    ),
    scored AS (
        SELECT m.doc_id, m.off, m.media_ref, t.t_off,
               (CASE WHEN sqrt({nt2}) > 0 AND sqrt({nm2}) > 0
                     THEN round({dot} / (sqrt({nt2}) * sqrt({nm2})), 6)
                     ELSE 0.0 END) AS score
        FROM media m JOIN mvec v USING (media_ref)
             LEFT JOIN texts t USING (doc_id)
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id, off
            ORDER BY score DESC, t_off ASC NULLS LAST) AS rn
        FROM scored
    )
    SELECT doc_id, off::BIGINT AS offset, media_ref,
           t_off::BIGINT AS assigned_offset, score
    FROM ranked WHERE rn = 1
    """


_register_interleave_assemble_sql()
