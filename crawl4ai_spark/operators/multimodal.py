"""Multimodal column operators: image/audio/video as opaque binary.

Model: media lives in a ``media_blobs(media_ref STRING, kind STRING,
data BINARY, meta STRUCT<...>)`` table keyed by the span's media_ref
(S7 collects the refs; this table holds payloads). Decode / feature
extraction / resize / frame-sampling run as Arrow-batched functions
over ``mapInPandas`` — the schema, batch shape, partitioning, and UDF
signatures are real and tested; the actual codec step is STUBBED (no
image/audio libraries in this container): ``decode_media`` with
``strict=True`` raises NotImplementedError where PIL/ffmpeg would be
called, and the default deterministic fake parses our synthetic header
instead so the pipeline is end-to-end testable.

Scale: blobs are the wide column — keep them out of shuffles. All ops
here are map-side (mapInPandas, no groupBy); joins against spans tables
broadcast the *metadata* projection, never the bytes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"C4SB"  # synthetic blob header: MAGIC | kind(1) | w(u16) | h(u16) | n(u16)

KIND_CODES = {"image": 1, "audio": 2, "video": 3}
CODE_KINDS = {v: k for k, v in KIND_CODES.items()}


# --------------------------------------------------------------------------- #
# synthetic blob source (deterministic; stands in for fetched bytes)
# --------------------------------------------------------------------------- #
def synth_blob(media_ref: str) -> tuple[str, bytes]:
    """Deterministic fake payload for a media_ref: kind from extension,
    dims from md5 — the fetch stage's stand-in, like the span corpus."""
    ext = media_ref.rsplit(".", 1)[-1].lower() if "." in media_ref else ""
    kind = (
        "image" if ext in ("jpg", "jpeg", "png", "gif", "webp")
        else "video" if ext in ("mp4", "webm")
        else "audio" if ext in ("mp3", "wav")
        else "image"
    )
    h = hashlib.md5(media_ref.encode()).digest()
    w = 16 + h[0] % 240
    ht = 16 + h[1] % 240
    n = 1 if kind == "image" else 1 + h[2] % 64
    body = (h * ((w * ht) // 16 + 1))[: w * ht]
    return kind, MAGIC + struct.pack("<BHHH", KIND_CODES[kind], w, ht, n) + body


def build_media_blobs(df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """media_refs → media_blobs(media_ref, kind, data) via mapInPandas."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, blobs = [], []
            for ref in pdf[ref_col]:
                k, b = synth_blob(ref or "")
                kinds.append(k)
                blobs.append(b)
            yield pd.DataFrame({"media_ref": pdf[ref_col], "kind": kinds, "data": blobs})

    return df.select(ref_col).distinct().mapInPandas(
        run, "media_ref string, kind string, data binary"
    )


# --------------------------------------------------------------------------- #
# decode: STUB boundary
# --------------------------------------------------------------------------- #
def decode_media(data: bytes, strict: bool = False) -> dict:
    """Parse a blob into (kind, width, height, n_frames, pixels).

    ``strict=True`` marks the real-codec path: raises NotImplementedError
    (PIL / libav are not in this container). The default parses the
    deterministic synthetic header, keeping every downstream operator
    runnable and the Spark plumbing fully exercised.
    """
    if strict:
        raise NotImplementedError(
            "real image/audio/video decoding requires PIL/ffmpeg — not "
            "available in this container; wire a codec here in production"
        )
    if not data or data[:4] != MAGIC:
        return {"kind": None, "width": 0, "height": 0, "n_frames": 0, "pixels": b""}
    code, w, h, n = struct.unpack("<BHHH", data[4:11])
    return {
        "kind": CODE_KINDS.get(code),
        "width": int(w),
        "height": int(h),
        "n_frames": int(n),
        "pixels": data[11:],
    }


# --------------------------------------------------------------------------- #
# metadata extraction / features / resize / frame sampling
# --------------------------------------------------------------------------- #
MEDIA_META_SCHEMA = "media_ref string, kind string, width int, height int, n_frames int, n_bytes long"


def extract_media_meta(blobs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["data"]):
                m = decode_media(data)
                rows.append((ref, m["kind"], m["width"], m["height"], m["n_frames"],
                             len(data) if data is not None else 0))
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "width", "height", "n_frames", "n_bytes"])

    return blobs.mapInPandas(run, MEDIA_META_SCHEMA)


def _feature_kernel(data, dim: int):
    """One decode + byte-histogram feature per blob — the SINGLE kernel
    both feature operators call, so their outputs can never diverge.
    Returns (features list[float32], n_px)."""
    m = decode_media(data)
    px = np.frombuffer(m["pixels"], dtype=np.uint8)
    hist = np.bincount(px % dim, minlength=dim).astype(np.float64) if px.size else np.zeros(dim)
    tot = hist.sum() or 1.0
    return ((hist / tot).astype(np.float32).tolist(),
            int(m["width"]) * int(m["height"]))


def media_features(blobs: DataFrame, dim: int = 16) -> DataFrame:
    """Per-blob feature vector: byte-histogram folded to ``dim`` buckets,
    L1-normalized — the deterministic stand-in for a CNN/CLIP embedding;
    swap ``_feature_kernel`` for a model in production (same plumbing)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, feats = [], []
            for ref, data in zip(pdf["media_ref"], pdf["data"]):
                f, _ = _feature_kernel(data, dim)
                refs.append(ref)
                feats.append(f)
            yield pd.DataFrame({"media_ref": refs, "features": feats})

    return blobs.mapInPandas(run, "media_ref string, features array<float>")


def media_features_meta(blobs: DataFrame, dim: int = 16) -> DataFrame:
    """``media_features`` + pixel count in ONE decode pass — the consumer
    that needs both (the CLIP-shape tower in queries/mediaops) would
    otherwise run the blob pipeline twice and pay a join to reunite
    them. Same feature math as media_features BY CONSTRUCTION (shared
    ``_feature_kernel``)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, feats, npx = [], [], []
            for ref, data in zip(pdf["media_ref"], pdf["data"]):
                f, n_px = _feature_kernel(data, dim)
                refs.append(ref)
                feats.append(f)
                npx.append(n_px)
            yield pd.DataFrame({"media_ref": refs, "features": feats, "n_px": npx})

    return blobs.mapInPandas(run, "media_ref string, features array<float>, n_px long")


def resize_images(blobs: DataFrame, max_side: int = 64) -> DataFrame:
    """Nearest-neighbor downscale of the synthetic pixel grid (the real
    path would call PIL.Image.resize — STUB boundary is decode_media)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["data"]):
                m = decode_media(data)
                if m["kind"] != "image" or not m["width"]:
                    continue
                w, h = m["width"], m["height"]
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                px = np.frombuffer(m["pixels"][: w * h], dtype=np.uint8)
                if px.size < w * h:
                    px = np.pad(px, (0, w * h - px.size))
                grid = px.reshape(h, w)
                yi = (np.arange(nh) * h // nh)
                xi = (np.arange(nw) * w // nw)
                small = grid[np.ix_(yi, xi)]
                rows.append((ref, nw, nh, small.tobytes()))
            yield pd.DataFrame(rows, columns=["media_ref", "width", "height", "pixels"])

    return blobs.mapInPandas(run, "media_ref string, width int, height int, pixels binary")


def sample_frames(blobs: DataFrame, every: int = 10) -> DataFrame:
    """video → one row per sampled frame index (0, every, 2*every, ...)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["data"]):
                m = decode_media(data)
                if m["kind"] != "video":
                    continue
                for fi in range(0, m["n_frames"], every):
                    rows.append((ref, fi, m["width"], m["height"]))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "width", "height"])

    return blobs.mapInPandas(run, "media_ref string, frame_idx int, width int, height int")


def phash_variants(blobs: DataFrame, thumb_side: int = 64) -> DataFrame:
    """Per IMAGE blob: a 60-bit average-hash (aHash) of the pixel grid,
    for the original AND its nearest-neighbor thumbnail (``ref#thumb``)
    — the perceptual-dedup signature for responsive-image variants
    (srcset/<picture> emit the same image at several scales; byte-exact
    dedup misses them, aHash survives the rescale).

    Exact integer math end to end so the DuckDB oracle can recompute it:
    sample an 8×8 grid (cell (y,x) → pixel [y*h//8, x*w//8]), mean over
    all 64 samples, bit j=y*8+x set iff sample*64 > total (strict), pack
    the FIRST 60 bits (BIGINT-safe both engines, reuses the simhash
    band/hamming tooling). The thumbnail is the real resize_images
    index math composed: thumb[a,b] = grid[a*h//nh, b*w//nw].

    Map-side only (mapInPandas); the wide blob bytes never shuffle —
    downstream joins carry (ref, phash) pairs."""
    def _ahash(grid: np.ndarray) -> int:
        gh, gw = grid.shape
        yi = (np.arange(8) * gh) // 8
        xi = (np.arange(8) * gw) // 8
        s = grid[np.ix_(yi, xi)].astype(np.int64).ravel()
        tot = int(s.sum())
        return sum(1 << j for j in range(60) if int(s[j]) * 64 > tot)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, variants, hashes = [], [], []
            for ref, data in zip(pdf["media_ref"], pdf["data"]):
                m = decode_media(data)
                if m["kind"] != "image" or not m["width"]:
                    continue
                w, h = m["width"], m["height"]
                px = np.frombuffer(m["pixels"][: w * h], dtype=np.uint8)
                if px.size < w * h:
                    px = np.pad(px, (0, w * h - px.size))
                grid = px.reshape(h, w)
                refs.append(ref)
                variants.append("orig")
                hashes.append(_ahash(grid))
                scale = min(1.0, thumb_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                yi = (np.arange(nh) * h) // nh
                xi = (np.arange(nw) * w) // nw
                refs.append(f"{ref}#thumb")
                variants.append("thumb")
                hashes.append(_ahash(grid[np.ix_(yi, xi)]))
            yield pd.DataFrame({"media_ref": refs, "variant": variants,
                                "phash": pd.array(hashes, dtype="int64")})

    return blobs.mapInPandas(run, "media_ref string, variant string, phash long")


# --------------------------------------------------------------------------- #
# spans → media pipeline glue
# --------------------------------------------------------------------------- #
def media_refs_of_spans(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Distinct media_refs of image/media spans — the S7 collection step."""
    return (
        docs.select(F.explode(spans_col).alias("s"))
        .where(F.col("s.kind").isin("image", "media"))
        .select(F.col("s.media_ref").alias("media_ref"))
        .where(F.col("media_ref").isNotNull())
        .distinct()
    )


def caption_pairs(spans) -> "F.Column":
    """Interleaved media→text alignment: for every image/media span pick
    the nearest text span of the SAME document as its caption candidate —
    the nearest preceding text span by offset, else the nearest following
    one (the OBELICS-style pairing an interleaved text+media pretraining
    corpus extracts before CLIP-filtering; reference media inventories
    stop at counts — original-README.md:139 lists images/videos with
    surrounding metadata, this op materializes the pairs).

    Pure array higher-order functions over the spans column: two
    ``aggregate`` folds per media span, all JVM-side inside the scan
    projection — no explode before pairing, no shuffle, no UDF. At
    100 TB this runs map-side at whatever parallelism the scan has.

    Returns array<struct<offset,media_ref,caption_offset,caption,side>>;
    ``side`` is 'prev' | 'next' | 'none' (document has no text spans).
    """
    sp = F.col(spans) if isinstance(spans, str) else spans
    texts = F.filter(sp, lambda s: s["kind"] == "text")

    def pair(m):
        prev = F.aggregate(
            texts,
            F.struct(F.lit(-1).alias("o"), F.lit(None).cast("string").alias("t")),
            lambda acc, s: F.when(
                (s["offset"] < m["offset"]) & (s["offset"] > acc["o"]),
                F.struct(s["offset"].cast("int").alias("o"), s["text"].alias("t")),
            ).otherwise(acc),
        )
        nxt = F.aggregate(
            texts,
            F.struct(F.lit(2**31 - 1).alias("o"), F.lit(None).cast("string").alias("t")),
            lambda acc, s: F.when(
                (s["offset"] > m["offset"]) & (s["offset"] < acc["o"]),
                F.struct(s["offset"].cast("int").alias("o"), s["text"].alias("t")),
            ).otherwise(acc),
        )
        cap_off = (
            F.when(prev["t"].isNotNull(), prev["o"])
            .when(nxt["t"].isNotNull(), nxt["o"])
            .otherwise(F.lit(None).cast("int"))
        )
        side = (
            F.when(prev["t"].isNotNull(), F.lit("prev"))
            .when(nxt["t"].isNotNull(), F.lit("next"))
            .otherwise(F.lit("none"))
        )
        return F.struct(
            m["offset"].cast("int").alias("offset"),
            m["media_ref"].alias("media_ref"),
            cap_off.alias("caption_offset"),
            F.coalesce(prev["t"], nxt["t"]).alias("caption"),
            side.alias("side"),
        )

    media = F.filter(sp, lambda s: (s["kind"] == "image") | (s["kind"] == "media"))
    return F.transform(media, pair)
