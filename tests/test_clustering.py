"""Clustering operator tests (SURVEY §2.6 K1-K6)."""

from __future__ import annotations

import numpy as np
import pytest

from crawl4ai_spark.operators.clustering import (
    agglomerative_labels,
    cosine_cluster_texts,
    fake_encode,
)


def _blob(center, n, seed):
    rng = np.random.default_rng(seed)
    return center + 0.01 * rng.standard_normal((n, len(center)))


class TestAgglomerative:
    def test_two_obvious_clusters(self):
        x = np.vstack([_blob([1.0, 0.0, 0.0], 5, 1), _blob([0.0, 1.0, 0.0], 5, 2)])
        for linkage in ("single", "complete", "average", "ward"):
            labels = agglomerative_labels(x, 2, linkage)
            assert len(set(labels[:5])) == 1 and len(set(labels[5:])) == 1
            assert labels[0] != labels[5]

    def test_label_numbering_by_first_member(self):
        x = np.vstack([_blob([0.0, 1.0], 3, 3), _blob([1.0, 0.0], 3, 4)])
        labels = agglomerative_labels(x, 2, "average")
        assert labels[0] == 0  # cluster containing row 0 is labeled 0

    def test_n_clusters_geq_n(self):
        x = np.eye(3)
        assert list(agglomerative_labels(x, 5, "ward")) == [0, 1, 2]

    def test_deterministic(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal((20, 8))
        a = agglomerative_labels(x, 4, "ward")
        b = agglomerative_labels(x.copy(), 4, "ward")
        assert (a == b).all()


class TestCosineStrategy:
    def test_word_count_filter_labels_minus_one(self):
        texts = ["short", " ".join(["w"] * 12), " ".join(["v"] * 12), " ".join(["u"] * 12)]
        emb = np.vstack([
            [1, 0], [1, 0.01], [0, 1], [0.01, 1],
        ]).astype(float)
        labels = cosine_cluster_texts(texts, emb, top_k=2)
        assert labels[0] == -1
        assert labels[1] != labels[2] or labels[2] == labels[3]

    def test_no_valid_rows_all_zero(self):
        assert cosine_cluster_texts(["a", "b"], np.eye(2)) == [0, 0]

    def test_single_cluster_all_zero_reference_quirk(self):
        # n_clusters <= 1 → EVERY row 0, even filtered ones (:199-204)
        texts = ["tiny", " ".join(["w"] * 12)]
        assert cosine_cluster_texts(texts, np.eye(2), top_k=3) == [0, 0]

    def test_semantic_filter(self):
        texts = [" ".join(["w"] * 12)] * 3
        emb = np.array([[1.0, 0.0], [0.9, 0.1], [-1.0, 0.0]])
        labels = cosine_cluster_texts(
            texts, emb, top_k=2, query_embedding=np.array([1.0, 0.0])
        )
        assert labels[2] == -1  # anti-aligned row filtered by sim_threshold
        assert labels[0] >= 0 and labels[1] >= 0


class TestEncoderStub:
    def test_deterministic_unit_vectors(self):
        a = fake_encode(["x", "y"], dim=16)
        b = fake_encode(["x", "y"], dim=16)
        assert np.allclose(a, b)
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)
        assert not np.allclose(a[0], a[1])


@pytest.mark.usefixtures("spark")
class TestSparkPipeline:
    def test_cluster_and_keywords(self, spark):
        from crawl4ai_spark.operators.clustering import (
            cluster_chunks,
            cluster_keywords,
            cluster_summary,
            embed_texts,
        )

        rows = []
        for d in range(3):
            for c in range(6):
                topic = "alpha beta gamma" if c % 2 == 0 else "delta epsilon zeta"
                rows.append((d, c, f"{topic} filler words number {c} " + "pad " * 8))
        df = spark.createDataFrame(rows, "doc_id long, chunk_id int, chunk string")
        emb = embed_texts(df, "chunk", dim=16)
        labels = cluster_chunks(emb, top_k=2)
        got = labels.collect()
        assert len(got) == 18
        assert {r["label"] for r in got} <= {-1, 0, 1}
        summ = cluster_summary(df, labels)
        kw = cluster_keywords(summ, top_n=3).collect()
        assert all(1 <= len(r["keywords"]) <= 3 for r in kw)
        assert all(r["keywords"] == sorted(r["keywords"]) for r in kw)

    def test_kmeans_alias_matches_cosine(self, spark):
        from crawl4ai_spark.operators.clustering import cluster_chunks, embed_texts

        rows = [(0, c, "word " * 15 + str(c)) for c in range(5)]
        df = embed_texts(
            spark.createDataFrame(rows, "doc_id long, chunk_id int, chunk string"),
            "chunk", dim=8,
        )
        a = sorted(map(tuple, cluster_chunks(df, strategy="kmeans", linkage="average").collect()))
        b = sorted(map(tuple, cluster_chunks(df, strategy="cosine", linkage="average").collect()))
        assert a == b
