"""S8/U4: agent vector memory as a Spark table (reference ai_agent.py:25-71).

The reference stores (url, content, metadata) documents in a Chroma
collection with OpenAI embeddings and retrieves top-3 by similarity.
Spark-native shape: an ``embeddings``-style snapshot-friendly DataFrame
``(vec_id, url, content, embedding array<float>)`` plus brute-force
cosine top-k (the baseline ANN path; the LSH-bucketed variant in
queries/dataops.py is the scale path). The encoder is pluggable — the
sandbox default is the deterministic stub from operators.clustering.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .clustering import fake_encode

RETRIEVE_K = 3  # reference default, ai_agent.py:61


def add_knowledge(
    spark: SparkSession,
    memory: DataFrame | None,
    rows: list[tuple[str, str]],
    dim: int = 64,
    encoder=None,
) -> DataFrame:
    """Append (url, content) documents; embeddings computed driver-side
    for the handful of rows an agent stores (bulk ingestion would use
    operators.clustering.embed_texts over mapInPandas)."""
    enc = encoder or (lambda ts: fake_encode(ts, dim))
    start = 0 if memory is None else (memory.agg(F.max("vec_id")).first()[0] or 0) + 1
    vecs = enc([c for _, c in rows])
    data = [
        (start + i, url, content, [float(x) for x in vecs[i]])
        for i, (url, content) in enumerate(rows)
    ]
    new = spark.createDataFrame(
        data, "vec_id long, url string, content string, embedding array<float>"
    )
    return new if memory is None else memory.unionByName(new)


def retrieve_relevant(
    memory: DataFrame,
    query: str,
    k: int = RETRIEVE_K,
    dim: int = 64,
    encoder=None,
) -> DataFrame:
    """Top-k memory rows by cosine similarity to the query embedding —
    pure column math over ARRAY<FLOAT> (no vector store)."""
    enc = encoder or (lambda ts: fake_encode(ts, dim))
    qv = [float(x) for x in np.asarray(enc([query])[0], dtype=np.float64)]
    q = F.array(*[F.lit(x) for x in qv])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), q, lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v,
        )
    )
    qn = float(np.linalg.norm(qv)) or 1.0
    sim = dot / (nrm * F.lit(qn))
    # orderBy + limit plans as TakeOrderedAndProject — a distributed
    # top-k (per-partition heads merged on the driver), NOT a
    # single-partition window; safe to reuse as a bulk top-k template
    return (
        memory.withColumn("sim", sim)
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )
