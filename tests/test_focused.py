"""Focused crawling (operators/focused.py): NB trainer vs a pure-Python
twin, bootstrap labeling, anchor aggregation, and the full gen-1 →
gen-2 engine loop (Chakrabarti WWW'99)."""

from __future__ import annotations

import math

import pytest

from crawl4ai_spark.operators.focused import (
    NBModel,
    anchor_texts_for_targets,
    focused_scores,
    label_by_keywords,
    nb_score,
    nb_train,
)


# --------------------------------------------------------------------------- #
# pure-Python twin (multinomial NB, Laplace smoothing, log-odds form)
# --------------------------------------------------------------------------- #
def py_nb(docs: list[tuple[str, bool]], s: float = 1.0):
    c_rel: dict[str, int] = {}
    c_irr: dict[str, int] = {}
    t_rel = t_irr = n_rel = n_irr = 0
    vocab: set[str] = set()
    for text, rel in docs:
        if rel:
            n_rel += 1
        else:
            n_irr += 1
        for w in text.split():
            vocab.add(w)
            if rel:
                c_rel[w] = c_rel.get(w, 0) + 1
                t_rel += 1
            else:
                c_irr[w] = c_irr.get(w, 0) + 1
                t_irr += 1
    dr, di = t_rel + s * len(vocab), t_irr + s * len(vocab)
    weights = {
        w: math.log((c_rel.get(w, 0) + s) / dr)
        - math.log((c_irr.get(w, 0) + s) / di)
        for w in vocab
    }
    prior = math.log(n_rel + s) - math.log(n_irr + s)
    default_w = math.log(s / dr) - math.log(s / di)

    def score(text: str) -> float:
        return prior + sum(weights.get(w, default_w) for w in text.split())

    return weights, prior, default_w, score


CORPUS = [
    ("spark shuffle partition join", True),
    ("spark broadcast join skew salt", True),
    ("window aggregate spark stream", True),
    ("cat video cat meme", False),
    ("meme stream video channel", False),
    ("cooking recipe video", False),
]


def _pages(spark):
    return spark.createDataFrame(
        CORPUS, "text string, relevant boolean")


def test_nb_train_matches_python_twin(spark):
    model = nb_train(_pages(spark))
    w_ref, prior_ref, dw_ref, _ = py_nb(CORPUS)
    got = {r.term: r.w for r in model.weights.collect()}
    assert set(got) == set(w_ref)
    for t, w in w_ref.items():
        assert got[t] == pytest.approx(w, rel=1e-12), t
    assert model.prior == pytest.approx(prior_ref, rel=1e-12)
    assert model.default_w == pytest.approx(dw_ref, rel=1e-12)


def test_nb_score_matches_python_twin(spark):
    model = nb_train(_pages(spark))
    _, _, _, score_ref = py_nb(CORPUS)
    tests = [
        ("a", "spark join now"),            # trained terms + one unseen
        ("b", "cat video"),
        ("c", "totally unseen words here"),  # all default_w
        ("d", ""),                           # empty text -> prior exactly
    ]
    df = spark.createDataFrame(tests, "url string, text string")
    got = {r.url: r.score for r in nb_score(df, model).collect()}
    for key, text in tests:
        assert got[key] == pytest.approx(score_ref(text), rel=1e-12), key
    assert got["d"] == pytest.approx(model.prior, rel=1e-12)
    # sanity: the topical text outranks the off-topic one
    assert got["a"] > got["b"]


def test_nb_train_rejects_empty(spark):
    empty = spark.createDataFrame([], "text string, relevant boolean")
    with pytest.raises(Exception):
        nb_train(empty)


def test_label_by_keywords_token_exact(spark):
    df = spark.createDataFrame(
        [("java is here",), ("javascript only",), ("no match",)],
        "text string")
    got = [r.relevant for r in
           label_by_keywords(df, ["java"]).orderBy("text").collect()]
    # ordered by text: "java is here", "javascript only", "no match"
    assert got == [True, False, False]


def test_anchor_texts_for_targets(spark):
    rows = [
        ([("link", "Read this", "https://t/1", 0),
          ("link", "also this", "https://t/1", 1),
          ("link", None, "https://t/2", 2),
          ("text", "body", None, 3)],),
        ([("link", "Read this", "https://t/1", 0)],),
    ]
    schema = ("spans array<struct<kind:string,text:string,"
              "media_ref:string,offset:int>>")
    df = spark.createDataFrame(rows, schema)
    got = {r.url: r.text for r in anchor_texts_for_targets(df).collect()}
    # distinct anchors, sorted, joined; null anchor becomes ''
    assert got == {"https://t/1": "Read this also this", "https://t/2": ""}


def test_focused_feedback_end_to_end(spark, corpus_dir, tmp_path):
    """Gen-1 BFS fetches a sample; its own pages bootstrap-label and
    train the NB model; anchor scores steer gen-2 best-first. The
    logged gen-2 order must be non-increasing in score within every
    round, and the override must actually reach the log (normalized
    scores are not link_score's 0.1 multiples)."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.config import CrawlConfig
    from crawl4ai_spark.operators.frontier import CrawlEngine
    from tests.test_crawl import get_seeds

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    seeds = get_seeds(spark, corpus_dir)[:1]
    g1 = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), strategy="bfs", max_depth=3,
                    max_pages=40, respect_robots=False),
        str(tmp_path / "nb_g1"))
    g1.run()
    # bootstrap topic: a token that actually occurs in the fixture corpus
    tok = (
        g1.pages().where("status = 'fetched'")
        .select(F.explode("spans").alias("s"))
        .where("s.kind = 'text'")
        .select(F.explode(F.split("s.text", "\\s+")).alias("w"))
        .where("w <> ''")
        .groupBy("w").count().orderBy(F.desc("count"), "w")
        .limit(1).collect()[0].w
    )
    scores = focused_scores(g1.pages(), [tok])
    n = scores.count()
    assert n > 0
    lohi = scores.agg(F.min("score"), F.max("score")).collect()[0]
    assert 0.0 <= lohi[0] and lohi[1] <= 1.0
    g2 = CrawlEngine(
        spark, docs,
        CrawlConfig(seeds=list(seeds), strategy="best_first", max_depth=3,
                    max_pages=40, respect_robots=False),
        str(tmp_path / "nb_g2"), url_scores=scores)
    g2.run()
    pg = g2.pages().orderBy("rank").collect()
    assert len(pg) > 3
    by_round: dict[int, list[float]] = {}
    for r in pg:
        by_round.setdefault(r.fetch_round, []).append(r.score)
    for rnd, ss in by_round.items():
        assert ss == sorted(ss, reverse=True), (rnd, ss)
    assert any(round(r.score * 10, 6) % 1 != 0 for r in pg)
