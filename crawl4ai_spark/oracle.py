"""Sequential pure-Python crawl oracle (golden-order generator).

Single-threaded implementation of the engine's crawl semantics — the
specification the distributed engine must reproduce (SURVEY.md §5.2):
BFS/DFS/Best-First selection exactly as the reference configures them
(/root/reference/crawl_agent.py:575-615), the deterministic F5 scorer
with stable ties (/root/reference/ai_agent.py:210-236), first-discovery
URL-seen dedup over canonical URLs, robots prefix rules, per-host
politeness budgets.

With politeness off and no round cap, the round model reduces to
textbook sequential traversal order (tests additionally verify BFS
against a literal FIFO-queue implementation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .config import SOCIAL_DOMAINS, CrawlConfig, resolve_strategy
from .functions.scoring import keyword_score_py, link_score_py
from .functions.urls import canonicalize_py, rep_best_py, url_host_py, url_path_py


@dataclass
class OracleResult:
    pages: list = field(default_factory=list)   # dicts: rank,url,depth,status,title
    seen: dict = field(default_factory=dict)    # url -> state
    rounds: int = 0


def run_oracle(
    docs: dict[str, list[dict]],
    cfg: CrawlConfig,
    robots: dict[str, list[str]] | None = None,
    budgets: dict[str, int] | None = None,
    redirects: dict[str, str] | None = None,
    max_redirect_hops: int = 2,
    politeness_map: dict[str, str] | None = None,
) -> OracleResult:
    strategy = resolve_strategy(cfg)

    def resolve(u: str) -> str:
        """F12 twin of the engine's capped redirect-map walk."""
        if redirects is None:
            return u
        for _ in range(max_redirect_hops):
            nxt = redirects.get(u)
            if nxt is None:
                return u
            u = nxt
        return u

    def prio_key(n: dict):
        if strategy == "dfs":
            return (n["path"], n["url"])
        if strategy == "best_first":
            return (-n["score"], n["parent_rank"], n["parent_offset"], n["url"])
        return (n["depth"], n["parent_rank"], n["parent_offset"], n["url"])

    frontier: list[dict] = []
    seen: dict[str, str] = {}
    for i, raw in enumerate(cfg.seeds):
        u = resolve(canonicalize_py(raw))
        if u in seen:
            continue
        seen[u] = "frontier"
        frontier.append({
            "url": u, "host": url_host_py(u), "depth": 0, "score": 1.0,
            "parent_rank": -1, "parent_offset": i, "path": str(i).zfill(6),
        })

    pages: list[dict] = []
    fetched = 0
    round_no = 1
    while round_no <= cfg.max_rounds and frontier:
        remaining = None if cfg.max_pages is None else cfg.max_pages - fetched
        if remaining is not None and remaining <= 0:
            break
        limit = remaining
        if cfg.round_size is not None:
            limit = cfg.round_size if limit is None else min(limit, cfg.round_size)

        cand = sorted(frontier, key=prio_key)
        if cfg.politeness and budgets is not None:
            from .functions.urls import registrable_domain_py
            from .functions.xxhash import xxhash64_str

            salts = max(1, cfg.politeness_salts)
            mg = getattr(cfg, "salt_min_grants", None)
            # politeness grouping key mirror: host, or (domain mode) the
            # PSL registrable domain — budgets dict is keyed the same way
            if getattr(cfg, "politeness_key", "host") == "domain":
                pol_key = registrable_domain_py
            elif politeness_map is not None:
                # mapped mode mirror (engine politeness_map): vhost →
                # shared key (e.g. IP); unmapped hosts keep themselves
                pol_key = lambda h: politeness_map.get(h, h)  # noqa: E731
            else:
                pol_key = lambda h: h  # noqa: E731
            by_key: dict[tuple[str, int], int] = {}
            kept = []
            for n in cand:
                pk = pol_key(n["host"])
                b = budgets.get(pk, 1_000_000_000)
                salt = xxhash64_str(n["url"]) % salts
                if mg:
                    # adaptive salting — mirrors the engine exactly:
                    # ns = clamp(ceil(budget/mg), 1, salts); queue id is
                    # the stored salt folded by a second modulus; per-queue
                    # budget = ceil(budget/ns)
                    ns = min(salts, max(1, math.ceil(b / mg)))
                    key = (pk, salt % ns)
                    qb = max(1, math.ceil(b / ns))
                else:
                    key = (pk, salt)
                    qb = max(1, math.ceil(b / salts))
                c = by_key.get(key, 0)
                if c < qb:
                    by_key[key] = c + 1
                    kept.append(n)
            cand = kept
        selected = cand if limit is None else cand[:limit]
        if not selected:
            break
        sel_urls = {n["url"] for n in selected}
        frontier = [n for n in frontier if n["url"] not in sel_urls]

        new_links: dict[str, dict] = {}
        for n in selected:
            fetched += 1
            spans = docs.get(n["url"])
            status = "fetched" if spans is not None else "missing"
            title = n["url"]
            if spans is not None:
                for s in spans:
                    if s["kind"] == "heading":
                        title = s["text"]
                        break
            pages.append({
                "rank": fetched, "url": n["url"], "depth": n["depth"],
                "status": status, "title": title,
            })
            if spans is None or n["depth"] >= cfg.max_depth:
                continue
            for s in spans:
                if s["kind"] != "link":
                    continue
                u = resolve(canonicalize_py(s["media_ref"]))
                h = url_host_py(u)
                if not cfg.include_external and h != n["host"]:
                    continue
                if cfg.exclude_social and any(
                    h == d or h.endswith("." + d) for d in SOCIAL_DOMAINS
                ):
                    continue
                if h in cfg.exclude_domains:
                    continue
                if (cfg.max_url_length is not None
                        and len(u.encode()) > cfg.max_url_length):
                    continue  # spider-trap guard twin
                if cfg.max_path_segments is not None and len(
                        [p for p in url_path_py(u).split("/") if p]
                ) > cfg.max_path_segments:
                    continue
                if cfg.scorer == "keyword" and cfg.score_keywords:
                    sc = keyword_score_py(u, cfg.score_keywords)  # F6
                else:
                    sc = link_score_py(u, s["text"], cfg.query)  # F5
                if cfg.score_threshold is not None and sc < cfg.score_threshold:
                    continue  # reference score-threshold: drop pre-enqueue
                cand_link = {
                    "url": u, "host": h, "depth": n["depth"] + 1,
                    "score": sc,
                    "parent_rank": fetched, "parent_offset": s["offset"],
                    "path": n["path"] + "/" + str(s["offset"]).zfill(6),
                }
                prev = new_links.get(u)
                if prev is None or (cand_link["parent_rank"], cand_link["parent_offset"]) < (
                    prev["parent_rank"], prev["parent_offset"]
                ):
                    new_links[u] = cand_link

        for u, n in sorted(new_links.items()):
            if u in seen:
                continue
            if cfg.respect_robots and robots is not None:
                rules = robots.get(n["host"], [])
                if isinstance(rules, dict):
                    allow, dis = rules.get("allow", []), rules.get("disallow", [])
                else:  # plain list = disallow-only (back-compat)
                    allow, dis = [], rules
                path = url_path_py(u)
                # REP longest-match (incl. RFC 9309 *-/$-wildcards):
                # most specific rule wins, allow wins ties
                best_dis = rep_best_py(path, dis)
                best_allow = rep_best_py(path, allow)
                if best_dis > best_allow:
                    seen[u] = "robots_blocked"
                    continue
            seen[u] = "frontier"
            frontier.append(n)
        round_no += 1

    return OracleResult(pages=pages, seen=seen, rounds=round_no - 1)


def load_docs_pandas(documents_path: str) -> dict[str, list[dict]]:
    """Load the fixture corpus into the oracle's dict-of-spans form."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(documents_path).to_pylist()
    return {
        r["doc_id"]: sorted(r["spans"], key=lambda s: s["offset"])
        for r in tbl
    }
