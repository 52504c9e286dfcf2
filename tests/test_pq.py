"""Product-quantization ANN (queries/dataops.py PQ tier): the DuckDB
oracle proves cross-engine equality; these pin the MEANING against a
pure-python PQ twin at sf0.001 — encode, ADC ranking, and the two
recall measurements — plus the dominance invariant rerank >= direct.
"""

from __future__ import annotations

from crawl4ai_spark.queries import dataops as D
from crawl4ai_spark.queries.registry import table as _t

SF = "/root/testdata/sf0.001"


def _vectors(spark):
    return {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in _t(spark, SF, "embeddings").collect()
    }


def _sub_l2(a, b, s):
    lo = s * D.SUB_DIM
    return sum((a[i] - b[i]) ** 2 for i in range(lo, lo + D.SUB_DIM))


def _encode(vecs, cb):
    codes = {}
    for vid, v in vecs.items():
        codes[vid] = [
            min(range(D.K_PQ), key=lambda k: (_sub_l2(v, cb[k], s), k)) + 1
            for s in range(D.M_SUB)
        ]
    return codes


def test_ann_pq_adc_matches_brute_force(spark):
    vecs = _vectors(spark)
    cb = [vecs[k] for k in range(D.K_PQ)]
    codes = _encode(vecs, cb)
    got = {}
    for r in D.q_ann_pq_adc(spark, SF).collect():
        got.setdefault(r.q_id, []).append((r.rank, r.n_id, r.adist))
    assert set(got) == set(range(D.PQ_NQ))
    for q in range(D.PQ_NQ):
        qd = [
            [_sub_l2(vecs[q], cb[k], s) for k in range(D.K_PQ)]
            for s in range(D.M_SUB)
        ]
        scored = sorted(
            (
                (sum(qd[s][codes[n][s] - 1] for s in range(D.M_SUB)), n)
                for n in vecs
                if n != q
            ),
        )[: D.TOP_K]
        want = [
            (i + 1, n, round(d, 6)) for i, (d, n) in enumerate(scored)
        ]
        assert sorted(got[q]) == want


def test_ann_pq_recall_rerank_dominates_direct(spark):
    rows = D.q_ann_pq_recall(spark, SF).collect()
    assert len(rows) == D.PQ_NQ
    for r in rows:
        # a direct ADC@k hit is in the shortlist and nothing outside the
        # exact top-k can outrank it in the re-rank, so rerank >= direct
        assert r.n_rerank >= r.n_direct
        assert r.recall_direct == r.n_direct / D.TOP_K
        assert r.recall_rerank == r.n_rerank / D.TOP_K
    # the shortlist re-rank is the production path: it must actually
    # recover signal on this corpus, not just tie the direct ranking
    assert sum(r.n_rerank for r in rows) > sum(r.n_direct for r in rows)


def test_ann_ivfpq_probe_matches_brute_force(spark):
    import math

    vecs = _vectors(spark)
    cb = [vecs[k] for k in range(D.K_PQ)]
    codes = _encode(vecs, cb)
    cents = [vecs[k] for k in range(D.N_CELLS)]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a))
                      * math.sqrt(sum(y * y for y in b)))

    def sims(v):
        return [cos(c, v) for c in cents]

    def best2(v):
        s = sims(v)
        b1 = s.index(max(s))
        s2 = [(-2.0 if i == b1 else x) for i, x in enumerate(s)]
        return b1, s2.index(max(s2))

    cell = {vid: best2(v)[0] for vid, v in vecs.items()}
    got = {}
    for r in D.q_ann_ivfpq_probe(spark, SF).collect():
        got.setdefault(r.q_id, []).append((r.rank, r.n_id, r.adist))
    assert set(got) == set(range(D.PQ_NQ))
    for q in range(D.PQ_NQ):
        probed = set(best2(vecs[q]))
        qd = [
            [_sub_l2(vecs[q], cb[k], s) for k in range(D.K_PQ)]
            for s in range(D.M_SUB)
        ]
        scored = sorted(
            (
                (sum(qd[s][codes[n][s] - 1] for s in range(D.M_SUB)), n)
                for n in vecs
                if n != q and cell[n] in probed
            ),
        )[:3]
        want = [(i + 1, n, round(d, 6)) for i, (d, n) in enumerate(scored)]
        assert sorted(got[q]) == want
        # the probe actually pruned: fewer candidates than the corpus
        n_cand = sum(1 for n in vecs if n != q and cell[n] in probed)
        assert n_cand < len(vecs) - 1
