"""Multimodal plumbing tests: schema, batching, stub boundary."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from crawl4ai_spark.operators.multimodal import (
    build_media_blobs,
    decode_media,
    extract_media_meta,
    media_features,
    media_refs_of_spans,
    resize_images,
    sample_frames,
    synth_blob,
)


def test_strict_decode_is_stubbed():
    _, blob = synth_blob("https://x/img/1.png")
    with pytest.raises(NotImplementedError):
        decode_media(blob, strict=True)


def test_synth_blob_deterministic_roundtrip():
    kind, blob = synth_blob("https://h/file/a.mp4")
    assert kind == "video"
    m = decode_media(blob)
    assert m["kind"] == "video" and m["n_frames"] >= 1
    assert synth_blob("https://h/file/a.mp4")[1] == blob


def test_pipeline_over_span_corpus(spark, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    refs = media_refs_of_spans(docs)
    assert refs.count() > 0
    blobs = build_media_blobs(refs)
    assert blobs.columns == ["media_ref", "kind", "data"]

    meta = extract_media_meta(blobs)
    got = meta.limit(5).collect()
    assert all(r.width >= 16 and r.n_bytes > 11 for r in got)
    # images have exactly 1 frame; videos more
    bad = meta.where((F.col("kind") == "image") & (F.col("n_frames") != 1)).count()
    assert bad == 0

    feats = media_features(blobs, dim=8)
    row = feats.first()
    assert len(row.features) == 8
    assert abs(sum(row.features) - 1.0) < 1e-3  # L1 normalized

    small = resize_images(blobs, max_side=32)
    assert small.where((F.col("width") > 32) | (F.col("height") > 32)).count() == 0
    one = small.first()
    assert len(one.pixels) == one.width * one.height

    frames = sample_frames(blobs, every=16)
    vids = meta.where(F.col("kind") == "video").count()
    if vids:
        assert frames.count() >= vids  # at least frame 0 each


def test_blob_join_broadcasts_metadata_not_bytes(spark, corpus_dir):
    """The meta projection joined back to spans must not carry `data`."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    refs = media_refs_of_spans(docs)
    blobs = build_media_blobs(refs)
    meta = extract_media_meta(blobs)
    joined = (
        docs.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind").isin("image", "media"))
        .join(F.broadcast(meta), F.col("s.media_ref") == F.col("media_ref"))
    )
    assert "data" not in joined.columns
    assert joined.count() > 0


def test_phash_variants_semantics(spark):
    """aHash-60: thumb of a ≤64px image hashes identically (resize is a
    no-op); every image yields exactly an 'orig' and a '#thumb' row; the
    hash is confined to 60 bits."""
    from crawl4ai_spark.operators.multimodal import phash_variants

    refs = spark.createDataFrame(
        [(f"https://h/img/{i}.png",) for i in range(40)], ["media_ref"])
    ph = {(r.media_ref, r.variant): r.phash
          for r in phash_variants(build_media_blobs(refs)).collect()}
    assert len(ph) == 80
    import hashlib

    for i in range(40):
        ref = f"https://h/img/{i}.png"
        orig = ph[(ref, "orig")]
        thumb = ph[(f"{ref}#thumb", "thumb")]
        assert 0 <= orig < (1 << 60) and 0 <= thumb < (1 << 60)
        d = hashlib.md5(ref.encode()).digest()
        w, h = 16 + d[0] % 240, 16 + d[1] % 240
        if max(w, h) <= 64:
            assert thumb == orig  # resize no-op → identical sampling


def test_caption_score_semantics(spark):
    """Caption-quality scores are cosines of non-negative vectors
    (∈ [0, 1]), keep ↔ score ≥ threshold, and media spans with no text
    span in the document score 0."""
    from crawl4ai_spark.queries.mediaops import CAPTION_KEEP_MIN, q_media_caption_score

    rows = q_media_caption_score(spark, "/root/testdata/sf0.001").collect()
    assert rows
    kept = 0
    for r in rows:
        assert 0.0 <= r.score <= 1.0
        assert r.keep == (r.score >= CAPTION_KEEP_MIN)
        kept += int(r.keep)
    # the threshold splits, not rubber-stamps
    assert 0 < kept < len(rows)


def test_interleave_assemble_semantics(spark):
    """MMC4-shape assignment: one row per media span, the assigned text
    span exists in the same document, its score is the document argmax
    (earliest-offset tie-break), and no-text docs get NULL/0 rows."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.queries.mediaops import q_interleave_assemble
    from crawl4ai_spark.queries.spansops import _span_docs

    sf = "/root/testdata/sf0.001"
    rows = q_interleave_assemble(spark, sf).collect()
    assert rows

    sd = _span_docs(spark, sf).select("doc_id", F.explode("spans").alias("s"))
    media = {(r.doc_id, r.offset) for r in sd.where(
        F.col("s.kind").isin("image", "media")).select(
        "doc_id", F.col("s.offset").cast("long").alias("offset")).collect()}
    text_offs = {}
    for r in sd.where(F.col("s.kind") == "text").select(
            "doc_id", F.col("s.offset").cast("long").alias("offset")).collect():
        text_offs.setdefault(r.doc_id, set()).add(r.offset)

    assert {(r.doc_id, r.offset) for r in rows} == media  # exactly once each
    for r in rows:
        have_text = bool(text_offs.get(r.doc_id))
        if have_text:
            assert r.assigned_offset in text_offs[r.doc_id]
            assert 0.0 <= r.score <= 1.0
        else:
            assert r.assigned_offset is None and r.score == 0.0
