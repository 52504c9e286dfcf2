"""Content-seen dedup (cfg.content_dedup) — Heritrix-style digest
suppression of duplicate-content extraction.

The suppression rule (drop a fetched page iff an earlier-rank page with
the same (host,) content digest was extracted at depth ≤ its own) is
RESULT-INVARIANT by construction: identical content ⇒ identical link
set, and shallower-or-equal ⇒ every p_depth gate passed at least as
generously — so pages/seen/order must be byte-identical with the flag
on or off. These tests pin that invariance per strategy, the depth
Pareto case a naive first-rank-wins rule gets wrong, host keying under
include_external, and resume-exactness of the digests table.
"""

from __future__ import annotations

from dataclasses import replace

from crawl4ai_spark.config import CrawlConfig
from crawl4ai_spark.operators.frontier import CrawlEngine

import pytest

SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
          "media_ref:string,offset:int>>")
H = "https://m.example.com"


def doc(url, *links, text="body"):
    spans = [("text", text, None, 0)]
    spans += [("link", f"to {i}", l, i + 1) for i, l in enumerate(links)]
    return (url, spans)


def mirror_corpus(spark, host=H):
    """Duplicate-heavy tree: dup1/dup2/dup3 share byte-identical spans
    (all linking c and d), discovered at different depths/rounds."""
    rows = [
        doc(f"{host}/seed", f"{host}/a", f"{host}/dup1", f"{host}/dup2"),
        doc(f"{host}/a", f"{host}/dup3", f"{host}/b"),
        # identical content ⇒ identical link spans (kind, text, ref, offset)
        (f"{host}/dup1", [("text", "MIRROR", None, 0),
                          ("link", "c", f"{host}/c", 1),
                          ("link", "d", f"{host}/d", 2)]),
        (f"{host}/dup2", [("text", "MIRROR", None, 0),
                          ("link", "c", f"{host}/c", 1),
                          ("link", "d", f"{host}/d", 2)]),
        (f"{host}/dup3", [("text", "MIRROR", None, 0),
                          ("link", "c", f"{host}/c", 1),
                          ("link", "d", f"{host}/d", 2)]),
        doc(f"{host}/b"),
        doc(f"{host}/c", f"{host}/e"),
        doc(f"{host}/d"),
        doc(f"{host}/e"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def page_tuples(eng):
    return [(r.rank, r.url, r.depth, r.status, r.parent_rank,
             r.parent_offset, r.path)
            for r in eng.pages().orderBy("rank").collect()]


def seen_set(eng):
    return {(r.url, r.state) for r in eng.url_seen().collect()}


@pytest.mark.parametrize("strategy", ["bfs", "dfs", "best_first"])
def test_content_dedup_invariance(spark, tmp_path, strategy):
    docs = mirror_corpus(spark)
    base = CrawlConfig(seeds=[f"{H}/seed"], strategy=strategy, max_depth=4,
                       max_pages=20, round_size=3, respect_robots=False,
                       use_ai_agent=(strategy == "best_first"))
    off = CrawlEngine(spark, docs, base, str(tmp_path / "off"))
    off.run()
    on = CrawlEngine(spark, docs, replace(base, content_dedup=True),
                     str(tmp_path / "on"))
    on.run()
    assert page_tuples(on) == page_tuples(off)
    assert seen_set(on) == seen_set(off)
    # evidence the gate actually fired: 3 mirror copies fetched, but the
    # digests table holds one row per distinct extracted content
    fetched = on.pages().where("status = 'fetched'").count()
    digs = on.digests_tbl.read(spark)
    n_digs = digs.select("dig").distinct().count()
    assert n_digs < fetched, "no duplicate content was suppressed"


def test_content_dedup_depth_pareto(spark, tmp_path):
    """A deep copy extracted FIRST (rank order) must not suppress a later
    shallow copy whose links still clear the depth gate — the case a
    naive first-rank-wins digest rule silently loses pages on."""
    dup_spans = [("text", "DUP", None, 0), ("link", "x", f"{H}/x", 1)]
    docs = spark.createDataFrame([
        doc(f"{H}/seed", f"{H}/a", f"{H}/shallow"),
        doc(f"{H}/a", f"{H}/b"),
        doc(f"{H}/b", f"{H}/deep"),
        (f"{H}/deep", dup_spans),      # depth 3 == max_depth: extracts nothing
        (f"{H}/shallow", dup_spans),   # depth 1: must still extract /x
        doc(f"{H}/x"),
    ], SCHEMA)
    base = CrawlConfig(seeds=[f"{H}/seed"], strategy="dfs", max_depth=3,
                       max_pages=20, round_size=1, respect_robots=False)
    off = CrawlEngine(spark, docs, base, str(tmp_path / "off"))
    off.run()
    on = CrawlEngine(spark, docs, replace(base, content_dedup=True),
                     str(tmp_path / "on"))
    on.run()
    # DFS visits deep (depth 3) before shallow (depth 1)
    order = [r.url for r in off.pages().orderBy("rank").collect()]
    assert order.index(f"{H}/deep") < order.index(f"{H}/shallow")
    assert f"{H}/x" in {r.url for r in on.pages().collect()}
    assert page_tuples(on) == page_tuples(off)
    assert seen_set(on) == seen_set(off)


@pytest.mark.parametrize("include_external", [False, True])
def test_content_dedup_cross_host(spark, tmp_path, include_external):
    """Cross-host mirrors: with include_external the digest keys on
    content alone (the mirror is suppressed); internal-only crawls key
    on (host, content) — each host's copy must extract its own links."""
    h2 = "https://mirror.example.org"
    dup = lambda host: (f"{host}/dup", [("text", "SAME", None, 0),
                                        ("link", "c", f"{host}/c", 1)])
    rows = [
        doc(f"{H}/seed", f"{H}/dup", f"{h2}/dup"),
        dup(H), dup(h2),
        doc(f"{H}/c"), doc(f"{h2}/c"),
    ]
    # NOTE: cross-host identical content requires RELATIVE-equivalent
    # links; here the two copies link their own host's /c, so their span
    # arrays differ ⇒ different digests under either keying. Add a pair
    # of byte-identical cross-host copies with an absolute shared link:
    rows += [
        (f"{H}/abs", [("text", "ABS", None, 0),
                      ("link", "z", f"{H}/z", 1)]),
        (f"{h2}/abs", [("text", "ABS", None, 0),
                       ("link", "z", f"{H}/z", 1)]),
        doc(f"{H}/z"),
    ]
    rows[0] = doc(f"{H}/seed", f"{H}/dup", f"{h2}/dup",
                  f"{H}/abs", f"{h2}/abs")
    docs = spark.createDataFrame(rows, SCHEMA)
    base = CrawlConfig(seeds=[f"{H}/seed"], strategy="bfs", max_depth=3,
                       max_pages=30, include_external=include_external,
                       respect_robots=False)
    off = CrawlEngine(spark, docs, base, str(tmp_path / "off"))
    off.run()
    on = CrawlEngine(spark, docs, replace(base, content_dedup=True),
                     str(tmp_path / "on"))
    on.run()
    assert page_tuples(on) == page_tuples(off)
    assert seen_set(on) == seen_set(off)
    if include_external:
        # the byte-identical cross-host pair folded to one digest
        digs = on.digests_tbl.read(spark)
        fetched = on.pages().where("status = 'fetched'").count()
        assert digs.select("dig").distinct().count() < fetched


def test_content_dedup_virtual_mirror_invariance(spark, tmp_path):
    """VirtualCorpus(mirror_every=4): a 25%-duplicate synthetic web (the
    bench corpus for crawl_dedup_throughput). Tracked-order crawl with
    content_dedup on must equal off exactly, and the digests table must
    show the mirror share actually folding."""
    from crawl4ai_spark.fixtures import VirtualCorpus

    vc = VirtualCorpus(n_docs=4000, n_hosts=6, mirror_every=4)
    # 8 consecutive doc indices: every 4-block ends in a mirror of its
    # head, so the seed set itself carries ≥1 duplicate-content pair
    seeds = vc.seed_urls(5, 8)
    base = CrawlConfig(seeds=seeds, strategy="bfs", max_depth=3,
                       max_pages=80, round_size=20, include_external=True,
                       respect_robots=False)
    off = CrawlEngine(spark, vc, base, str(tmp_path / "off"))
    off.run()
    on = CrawlEngine(spark, vc, replace(base, content_dedup=True),
                     str(tmp_path / "on"))
    on.run()
    assert page_tuples(on) == page_tuples(off)
    assert seen_set(on) == seen_set(off)
    fetched = on.pages().where("status = 'fetched'").count()
    n_digs = on.digests_tbl.read(spark).select("dig").distinct().count()
    assert n_digs < fetched, "mirror corpus produced no content folds"


def test_content_dedup_resume_exact(spark, tmp_path):
    """Kill after round 1 → resume: the digests table rolls back with the
    checkpoint and replays exactly; final tables equal an uninterrupted
    run (the north rule's resume-exactness extends to digest state)."""
    docs = mirror_corpus(spark)
    cfg = CrawlConfig(seeds=[f"{H}/seed"], strategy="bfs", max_depth=4,
                      max_pages=20, round_size=3, respect_robots=False,
                      content_dedup=True)
    full = CrawlEngine(spark, docs, cfg, str(tmp_path / "full"))
    full.run()
    part = CrawlEngine(spark, docs, replace(cfg, max_rounds=1),
                       str(tmp_path / "part"))
    part.run()
    resumed = CrawlEngine(spark, docs, cfg, str(tmp_path / "part"))
    resumed.run(resume=True)
    assert page_tuples(resumed) == page_tuples(full)
    assert seen_set(resumed) == seen_set(full)
    a = sorted((r.dig, r.min_depth)
               for r in full.digests_tbl.read(spark).collect())
    b = sorted((r.dig, r.min_depth)
               for r in resumed.digests_tbl.read(spark).collect())
    assert a == b
