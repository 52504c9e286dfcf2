"""Clustering operators K1-K6 (reference clustering_strategies.py).

The reference's CosineStrategy pipeline (clustering_strategies.py:159-225):
word-count filter (>=10 words, :113-130) → embed → semantic-relevance
filter (cosine >= 0.3 vs query, :132-157) → AgglomerativeClustering
(n_clusters=min(top_k, n), cosine affinity, :207-215) → labels mapped
back with -1 for filtered rows (:218-220), all-0 when <=1 cluster
(:199-204).

Spark shape: clustering is per-document over its chunks — thousands of
tiny independent problems, so ``applyInPandas`` per doc_id is the right
primitive (embarrassingly parallel across docs; the O(n³) agglomerative
loop only ever sees one doc's chunks). No sklearn in this sandbox, so
the agglomerative algorithm is implemented in numpy with documented
deterministic tie-breaks; SURVEY.md Appendix A #3 notes the reference's
ward+cosine combination is itself invalid in modern sklearn — ward here
operates on euclidean distances of L2-normalized vectors.

K1 (embedding): production wires a real encoder via ``mapInPandas``;
the sandbox default is a STUB — a deterministic md5-seeded vector
generator, clearly marked, exercising the identical Spark plumbing
(schema, Arrow batching, partitioning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS

WORD_COUNT_THRESHOLD = 10   # clustering_strategies.py:76
SIM_THRESHOLD = 0.3         # clustering_strategies.py:77
TOP_K = 3                   # clustering_strategies.py:80


# --------------------------------------------------------------------------- #
# K1: embedding — mapInPandas plumbing with a stubbed encoder
# --------------------------------------------------------------------------- #
def fake_encode(texts: list[str], dim: int = 64) -> np.ndarray:
    """STUB encoder (no model weights in sandbox): deterministic unit
    vectors seeded from md5(text). Swap for a SentenceTransformer batch
    encode in production — the Spark plumbing is identical."""
    out = np.empty((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        seed = int.from_bytes(hashlib.md5((t or "").encode()).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(dim)
        out[i] = (v / (np.linalg.norm(v) or 1.0)).astype(np.float32)
    return out


def embed_texts(
    df: DataFrame,
    text_col: str = "chunk",
    dim: int = 64,
    encoder: Callable[[list[str]], np.ndarray] | None = None,
    batch_size: int = 256,
) -> DataFrame:
    """Append an ``embedding array<float>`` column via mapInPandas —
    Arrow-batched, encoder called once per batch (GPU-friendly shape)."""
    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    enc = encoder or (lambda ts: fake_encode(ts, dim))
    cols = list(df.columns)
    # fresh StructType — .add() would mutate the DataFrame's cached schema
    schema = StructType(
        list(df.schema.fields) + [StructField("embedding", ArrayType(FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                part = pdf.iloc[lo : lo + batch_size].copy()
                vecs = enc(part[text_col].fillna("").tolist())
                part["embedding"] = [v.astype(np.float32).tolist() for v in vecs]
                yield part[cols + ["embedding"]]

    return df.mapInPandas(run, schema)


# --------------------------------------------------------------------------- #
# K2: agglomerative clustering (numpy, deterministic)
# --------------------------------------------------------------------------- #
def _linkage_update(d: np.ndarray, sizes: np.ndarray, i: int, j: int, method: str) -> np.ndarray:
    """Lance-Williams distance update for merging cluster j into i."""
    if method == "single":
        return np.minimum(d[i], d[j])
    if method == "complete":
        return np.maximum(d[i], d[j])
    if method == "average":
        return (sizes[i] * d[i] + sizes[j] * d[j]) / (sizes[i] + sizes[j])
    if method == "ward":
        n = sizes[i] + sizes[j] + sizes
        return np.sqrt(
            np.maximum(
                0.0,
                ((sizes[i] + sizes) * d[i] ** 2 + (sizes[j] + sizes) * d[j] ** 2 - sizes * d[i, j] ** 2) / n,
            )
        )
    raise ValueError(f"unknown linkage {method}")


def agglomerative_labels(x: np.ndarray, n_clusters: int, linkage: str = "ward") -> np.ndarray:
    """Bottom-up agglomerative clustering to ``n_clusters``.

    Distances: cosine for single/complete/average (matching the
    reference's affinity='cosine'); ward uses euclidean over
    L2-normalized rows (documented deviation — ward+cosine is invalid,
    SURVEY Appendix A #3). Ties merge the lexicographically smallest
    (i, j) pair; final labels are renumbered by smallest member index,
    so output is deterministic regardless of float platform quirks.
    """
    n = len(x)
    if n == 0:
        return np.empty(0, dtype=int)
    if n_clusters >= n:
        return np.arange(n)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    xn = x / np.where(norms == 0, 1.0, norms)
    if linkage == "ward":
        diff = xn[:, None, :] - xn[None, :, :]
        d = np.sqrt((diff**2).sum(-1))
    else:
        d = 1.0 - xn @ xn.T
        np.fill_diagonal(d, 0.0)
    d = np.round(d, 12)  # kill platform fp dust before tie-breaking
    active = list(range(n))
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    sizes = np.ones(n)
    big = np.inf
    while len(active) > n_clusters:
        best = (big, -1, -1)
        for ai in range(len(active)):
            for aj in range(ai + 1, len(active)):
                i, j = active[ai], active[aj]
                if d[i, j] < best[0]:
                    best = (d[i, j], i, j)
        _, i, j = best
        d[i, :] = _linkage_update(d, sizes, i, j, linkage)
        d[:, i] = d[i, :]
        d[i, i] = 0.0
        sizes[i] += sizes[j]
        members[i].extend(members[j])
        del members[j]
        active.remove(j)
    order = sorted(active, key=lambda c: min(members[c]))
    labels = np.empty(n, dtype=int)
    for lbl, c in enumerate(order):
        labels[members[c]] = lbl
    return labels


def cosine_cluster_texts(
    texts: list[str],
    embeddings: np.ndarray,
    word_count_threshold: int = WORD_COUNT_THRESHOLD,
    sim_threshold: float = SIM_THRESHOLD,
    top_k: int = TOP_K,
    linkage: str = "ward",
    query_embedding: np.ndarray | None = None,
) -> list[int]:
    """CosineStrategy.cluster label semantics (clustering_strategies.py:159-225)."""
    if not texts:
        return []
    valid = [i for i, t in enumerate(texts) if len((t or "").split()) >= word_count_threshold]
    if not valid:
        return [0] * len(texts)
    emb = embeddings[valid]
    if query_embedding is not None:
        qe = query_embedding / (np.linalg.norm(query_embedding) or 1.0)
        en = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        sims = en @ qe
        keep = [i for i, s in enumerate(sims) if s >= sim_threshold]
        if not keep:
            return [0] * len(texts)
        valid = [valid[i] for i in keep]
        emb = emb[keep]
    n_clusters = min(top_k, len(emb))
    if n_clusters <= 1:
        return [0] * len(texts)  # reference quirk: ALL rows get 0 (:199-204)
    sub = agglomerative_labels(emb, n_clusters, linkage)
    labels = [-1] * len(texts)
    for i, idx in enumerate(valid):
        labels[idx] = int(sub[i])
    return labels


# --------------------------------------------------------------------------- #
# Spark operator: per-doc clustering via applyInPandas
# --------------------------------------------------------------------------- #
def cluster_chunks(
    df: DataFrame,
    doc_col: str = "doc_id",
    chunk_id_col: str = "chunk_id",
    text_col: str = "chunk",
    emb_col: str = "embedding",
    strategy: str = "cosine",
    **params,
) -> DataFrame:
    """``clusters(doc_id, chunk_id, label)`` — one independent clustering
    problem per document. K6 dispatch quirk reproduced: 'kmeans' is an
    alias of cosine; 'hierarchical' forces ward linkage
    (clustering_strategies.py:284-309)."""
    s = strategy.lower()
    if s in ("hierarchical", "agglomerative"):
        params["linkage"] = "ward"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(chunk_id_col)
        emb = np.array([np.asarray(v, dtype=np.float64) for v in pdf[emb_col]])
        labels = cosine_cluster_texts(pdf[text_col].tolist(), emb, **params)
        return pd.DataFrame({
            "doc_id": pdf[doc_col].values,
            "chunk_id": pdf[chunk_id_col].values,
            "label": labels,
        })

    return df.groupBy(doc_col).applyInPandas(run, "doc_id long, chunk_id int, label int")


# --------------------------------------------------------------------------- #
# K3: cluster summary; K4: cluster keywords
# --------------------------------------------------------------------------- #
def cluster_summary(chunks: DataFrame, labels: DataFrame) -> DataFrame:
    """clusters → Dict[label, texts] as a table (clustering_strategies.py:38-53)."""
    j = chunks.join(labels, ["doc_id", "chunk_id"])
    kv = F.struct(F.col("chunk_id").alias("k"), F.col("chunk").alias("v"))
    return (
        j.groupBy("doc_id", "label")
        .agg(F.array_sort(F.collect_list(kv)).alias("kvs"))
        .select("doc_id", "label", F.transform("kvs", lambda x: x["v"]).alias("texts"))
    )


def cluster_keywords(summary: DataFrame, top_n: int = 5) -> DataFrame:
    """Top-n terms per (doc, label): CountVectorizer semantics —
    lowercase, token pattern \\w\\w+, stopwords removed, top_n by
    frequency, output alphabetical (clustering_strategies.py:246-263).
    Deterministic tie-break: (count desc, term asc). Pure DataFrame ops
    (tokenize → explode → count → window), no Python."""
    from pyspark.sql import Window

    terms = (
        summary.select("doc_id", "label", F.explode("texts").alias("t"))
        .select(
            "doc_id", "label",
            F.explode(F.expr(r"regexp_extract_all(lower(t), '\\w\\w+', 0)")).alias("term"),
        )
        .where(~F.col("term").isin(STOPWORDS))
    )
    counted = terms.groupBy("doc_id", "label", "term").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id", "label").orderBy(F.col("cnt").desc(), F.col("term").asc())
    top = counted.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= top_n)
    return (
        top.groupBy("doc_id", "label")
        .agg(F.array_sort(F.collect_list("term")).alias("keywords"))
    )
