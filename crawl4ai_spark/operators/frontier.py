"""The crawl engine: URL frontier + fetch scheduler in batch rounds.

Re-expresses the reference's deep-crawl strategies (BFS/DFS/Best-First,
/root/reference/crawl_agent.py:575-615) as a driver round loop over
snapshot-committed DataFrames — the idiomatic Spark shape of a crawler:

    round r:
      select batch   priority sort + per-host politeness rank-and-limit
      fetch          join selected frontier vs the corpus (stand-in for
                     the HTTP stage, which in production is a mapInPandas
                     Arrow-batched fetcher — the scheduling is identical)
      extract        outlinks from span arrays: filter/transform/
                     posexplode — all JVM-side, no per-row Python
      canonicalize   lowercase host / strip fragment+default port /
                     sort query params (functions.urls), xxhash64 key
      dedup          exact left_anti join vs url_seen (+ in-batch
                     first-discovery dedup by window rank)
      robots         broadcast join + disallow-prefix predicate
      commit         pages/url_seen/frontier/metrics snapshots + an
                     atomic round checkpoint (tables.Checkpoint)

Crawl ORDER is an explicit sortable column (global rank), not an
execution artifact: BFS rank = (depth, parent_rank, parent_offset),
DFS = lexicographic materialized path (preorder), Best-First =
(score desc, discovery order) with stable ties — reproducing the
reference's Python ``sorted`` stability (/root/reference/ai_agent.py:236).

Scale notes (10^10 frontier):
* url_seen and frontier are hash-distributed by xxhash64(url); the
  anti-join is a shuffle hash join on a LONG-keyed table — AQE handles
  residual skew. A Bloom sidecar per shard (operators.seen_filter) cuts
  the anti-join's probe volume; the exact join stays the ground truth.
* hot hosts: politeness window partitions by (host, host_salt) with the
  budget split across ``politeness_salts`` salts, so one mega-host's
  rank-and-limit doesn't serialize into one task.
* global rank assignment (track_order): with a round budget the rank is
  a two-level top-k — parallel per-partition cuts, then one window over
  ≤ P×limit survivors (bounded by budget, never frontier size); with no
  budget (BFS full-order) ranks come from depth-block offsets (an
  O(max_depth) collect) + per-depth windows. No window ever spans the
  whole frontier in a single partition. Throughput mode
  (track_order=False, max_pages=None) skips all global windows.
* the frontier is an append-only log in EVERY mode: new links append,
  and "pending" is derived by anti-joining the pages table (the
  tombstone set). Per-round writes are O(delta); only the pending scan
  is O(frontier), which priority selection inherently needs.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ..config import SOCIAL_DOMAINS, CrawlConfig, resolve_strategy
from ..functions.scoring import keyword_score, link_score
from ..functions.urls import canonicalize, url_hash, url_host, url_path
from ..tables import Checkpoint, SnapshotTable
from .cuckoo import build_cuckoo_shards, cuckoo_anti_join, cuckoo_delete, merge_cuckoo_shards
from .seen_filter import (
    bloom_anti_join,
    build_bloom_shards,
    build_bloom_shards_hrw,
    grow_bloom_shards,
    merge_bloom_shards,
)

FRONTIER_COLS = [
    "url", "url_hash", "host", "host_salt", "depth", "score",
    "parent_rank", "parent_offset", "path", "discovered_round",
]

# touched by reopen() in sweep mode: the frontier log then carries
# re-dispatch rows, so url_seen() first-discovery-dedupes (flag keeps
# the dedup shuffle off the normal path where the log is unique-by-url)
REOPEN_FLAG = "reopened.flag"


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        cfg: CrawlConfig,
        state_dir: str,
        robots: DataFrame | None = None,
        host_budgets: DataFrame | None = None,
        redirects: DataFrame | None = None,
        max_redirect_hops: int = 2,
        trap_templates: DataFrame | None = None,
        nofollow_pages: DataFrame | None = None,
        url_scores: DataFrame | None = None,
        politeness_map: DataFrame | None = None,
    ):
        self.spark = spark
        # NB: do NOT persist() the corpus — a deserialized nested-row cache
        # anti-scales badly (GC + block-manager contention measured 2.5x
        # SLOWER than re-scanning parquet at 16 threads); the columnar scan
        # with OS page cache is both faster and scales with cores. At
        # 100 TB the equivalent choice is "bucketed parquet by url_hash,
        # rescanned per round with pushdown", never executor-cached rows.
        self.corpus = corpus
        self.cfg = cfg
        self.strategy = resolve_strategy(cfg)
        if url_scores is not None and cfg.strategy.lower() == "best_first":
            # the F4 fallback (best_first → bfs without the AI agent,
            # crawl_agent.py:607-615) exists because the reference has no
            # scoring signal without the agent; an external url_scores
            # table IS a scoring signal, so it keeps best_first live
            self.strategy = "best_first"
        self.frontier_tbl = SnapshotTable(state_dir, "frontier")
        self.pending_tbl = SnapshotTable(state_dir, "pending")
        self.seen_tbl = SnapshotTable(state_dir, "url_seen")
        self.pages_tbl = SnapshotTable(state_dir, "pages")
        self.metrics_tbl = SnapshotTable(state_dir, "metrics")
        self.bloom_tbl = SnapshotTable(state_dir, "blooms")
        self.redirects_tbl = SnapshotTable(state_dir, "redirects")
        # retry snapshot (cfg.max_retries > 0): the not-yet-due transient
        # re-dispatches. Overwrite-per-round like pending — a retry row
        # is CONSUMED by dispatching it (removed from the next snapshot),
        # so no anti-join against pages is ever needed, and checkpoint
        # rollback replays the exact due/not-due split.
        self.retries_tbl = SnapshotTable(state_dir, "retries")
        # content-seen digests (cfg.content_dedup): append-only
        # (digest, min_depth) rows — the shallowest depth at which each
        # span-content digest has been EXTRACTED. A later fetched copy at
        # depth ≥ that min contributes no outlinks (see config.py).
        self.digests_tbl = SnapshotTable(state_dir, "digests")
        # conditional re-fetch validators (cfg.conditional_fetch):
        # overwrite-mode (url, prev_dig) — the latest successfully-fetched
        # content digest per reopened URL, written by reopen(), probed as
        # a broadcast left-join in the fetch projection. One row per due
        # URL, never crawl-sized.
        self.revdig_tbl = SnapshotTable(state_dir, "revisit_digests")
        self.state_dir = state_dir
        self.ckp = Checkpoint(state_dir)
        # bloom_hrw shard ids + seen-size estimate: concrete values are
        # (re)established at run() entry (fresh → range(bloom_shards);
        # resume → checkpoint), growth updates them per round
        self._hrw_ids: list[int] = list(range(cfg.bloom_shards))
        self._seen_est = 0
        self.robots = robots
        self.host_budgets = host_budgets
        # F8 completion: with politeness on, no explicit budgets table,
        # and a robots frame carrying crawl_delay, derive the per-round
        # budgets from the robots-declared pacing (budget =
        # round_period_s / crawl_delay) — the rate limit the reference
        # honors by sleeping between same-host fetches becomes the
        # rank-and-limit grant of the batch round model.
        if (
            cfg.politeness
            and host_budgets is None
            and robots is not None
            and cfg.round_period_s is not None
            and "crawl_delay" in robots.columns
        ):
            from ..fixtures import budgets_from_crawl_delay

            self.host_budgets = budgets_from_crawl_delay(
                robots, round_period_s=cfg.round_period_s
            )
        # Heritrix-style shared-infrastructure politeness: an explicit
        # (host, pkey) mapping — e.g. vhost → resolved IP address, the
        # ip_politeness query's universe — groups budgets, retry debits,
        # and the rank-and-limit windows on pkey, so co-hosted vhosts
        # share one grant. Hosts absent from the map keep their own
        # hostname as the key (a partial DNS cache stays safe). Kept
        # orthogonal to the PSL mode: a composed domain+map key would
        # be ambiguous (which side wins for a mapped subdomain?), so the
        # combination fails loudly.
        if politeness_map is not None and cfg.politeness_key != "host":
            raise ValueError(
                "politeness_map requires politeness_key='host' "
                f"(got {cfg.politeness_key!r})")
        self.politeness_map = politeness_map
        if politeness_map is not None and self.host_budgets is not None:
            # roll ANY budgets table up to the mapped key with
            # min(budget) — the same conservative fold as domain mode;
            # budgets already keyed by pkey values (hostnames absent
            # from the map) pass through as singleton groups.
            pm = politeness_map.select(
                F.col("host").alias("_mh"), F.col("pkey").alias("_mp"))
            self.host_budgets = (
                self.host_budgets
                .join(F.broadcast(pm), F.col("host") == F.col("_mh"), "left")
                .groupBy(F.coalesce("_mp", "host").alias("host"))
                .agg(F.min("budget").alias("budget"))
            )
        if cfg.politeness_key == "domain" and self.host_budgets is not None:
            # roll ANY budgets table (explicit or robots-derived) up to
            # the registrable domain: min(budget) — the most conservative
            # member host paces the whole registrant (shared origin
            # infrastructure). Idempotent when the table is already
            # domain-keyed (registrable_domain(domain) == domain, groups
            # are singletons); without this, a host-keyed table would
            # never match _select_batch's domain join keys and politeness
            # would silently become unbounded.
            from ..functions.urls import registrable_domain

            self.host_budgets = self.host_budgets.groupBy(
                registrable_domain(F.col("host")).alias("host")
            ).agg(F.min("budget").alias("budget"))
        self.redirects = redirects
        self.max_redirect_hops = max_redirect_hops
        # (host, template) classes to never enqueue — the crawl_traps
        # control-loop output (queries/schedops.py) fed back into the
        # engine: discovered links are templated (digit runs → {d}, long
        # hex tokens → {h}) and dropped by a broadcast anti-join, the
        # same map-side shape as the domain/social excludes.
        self.trap_templates = trap_templates
        # REP follow-gate (meta robots / X-Robots-Tag "nofollow"): page
        # URLs whose OUTLINKS must not be followed — the page itself is
        # still fetched and logged (robots.txt gates FETCHING; meta
        # robots gates INDEXING/FOLLOWING — see the meta_robots query,
        # its producer). Applied as a broadcast anti-join on the parent
        # URL BEFORE the span explode, so a nofollow page costs zero
        # link-extraction work.
        self.nofollow_pages = nofollow_pages
        # Link-graph feedback (url, score): externally computed crawl
        # priorities — pagerank/trustrank/OPIC/anchor relevance from a
        # previous generation (operators/linkgraph.py, its producers) —
        # override the URL-string scorer per discovered link, closing
        # the graph → frontier loop the way traps/budgets/nofollow close
        # theirs. Contract: ONE row per canonical url (the producer's
        # groupBy key guarantees it); keys match the FINAL post-redirect
        # canonical URL. Joined AFTER the in-batch first-discovery dedup
        # so both sides are keyed (and the left side already exchanged)
        # on url; URLs absent from the table keep their scorer score.
        self.url_scores = url_scores
        # size estimates for output partitioning (never for semantics);
        # reset + maintained by run() from per-round observations
        self._batch_est = max(1, len(cfg.seeds))
        self._pending_est = max(1, len(cfg.seeds))
        self._pending_mode = "table"
        self._link_ratio = 4.0

    # ------------------------------------------------------------------ #
    def _priority(self, round_no: int | None = None) -> list:
        if self.strategy == "dfs":
            return [F.col("path").asc(), F.col("url").asc()]
        if self.strategy == "best_first":
            key = F.col("score")
            if self.cfg.age_boost is not None and round_no is not None:
                # anti-starvation aging (config.age_boost): priority
                # grows per waiting round — pure column arithmetic on
                # stored fields, so the boosted key costs nothing extra
                # in the rank windows and stays deterministic
                key = key + F.lit(float(self.cfg.age_boost)) * (
                    F.lit(round_no) - F.col("discovered_round"))
            return [
                key.desc(),
                F.col("parent_rank").asc(), F.col("parent_offset").asc(),
                F.col("url").asc(),
            ]
        return [  # bfs: level order, within level by discovery order
            F.col("depth").asc(),
            F.col("parent_rank").asc(), F.col("parent_offset").asc(),
            F.col("url").asc(),
        ]

    def _seed_frontier(self) -> DataFrame:
        cfg = self.cfg
        if not cfg.seeds:
            raise ValueError("CrawlConfig.seeds is empty — nothing to crawl")
        seeds = self.spark.createDataFrame(
            [(u, i) for i, u in enumerate(cfg.seeds)], ["raw_url", "seed_idx"]
        )
        seeds = seeds.select(
            canonicalize("raw_url", cfg.strip_params).alias("url"), "seed_idx")
        seeds = self._resolve_redirects(seeds)  # F12: seed on the FINAL url
        w = Window.partitionBy("url").orderBy(F.col("seed_idx").asc())
        seeds = seeds.withColumn("_r", F.row_number().over(w)).where(F.col("_r") == 1)
        if self.redirects is not None:
            self._record_redirects(seeds, 0)
        c = F.col("url")
        return seeds.select(
            c.alias("url"),
            url_hash(c).alias("url_hash"),
            url_host(c).alias("host"),
            F.pmod(F.xxhash64(c), F.lit(max(1, cfg.politeness_salts))).cast("int").alias("host_salt"),
            F.lit(0).alias("depth"),
            F.lit(1.0).alias("score"),
            F.lit(-1).cast("long").alias("parent_rank"),
            F.col("seed_idx").cast("int").alias("parent_offset"),
            F.lpad(F.col("seed_idx").cast("string"), 6, "0").alias("path"),
            F.lit(0).alias("discovered_round"),
        )

    # ------------------------------------------------------------------ #
    def _resolve_redirects(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        """F12: replace ``url`` with its final target by following the
        redirects map up to ``max_redirect_hops`` joins (the reference
        caps redirect chains; original-README.md:523 records them).
        Adds ``redirect_src`` — the ORIGINAL alias url for rows that
        moved, null otherwise. The map join is a plain hash join keyed
        on the canonical url: at 10^10 scale the redirects table is
        bucketed by url_hash like every other engine table (AQE picks
        broadcast when the map is small). No-op (null column) when no
        redirects table is configured."""
        if self.redirects is None:
            # no column at all (not even a null constant): redirect_src
            # would otherwise ride the dedup groupBy and seen anti-join
            # exchanges of every round; downstream drop()s are lenient
            return df
        r = self.redirects.select(
            F.col("src_url").alias(url_col), F.col("dst_url").alias("_dst")
        )
        out = df.withColumn("redirect_src", F.lit(None).cast("string"))
        for _ in range(self.max_redirect_hops):
            out = (
                out.join(r, url_col, "left")
                .withColumn(
                    "redirect_src",
                    F.when(
                        F.col("_dst").isNotNull() & F.col("redirect_src").isNull(),
                        F.col(url_col),
                    ).otherwise(F.col("redirect_src")),
                )
                .withColumn(url_col, F.coalesce("_dst", url_col))
                .drop("_dst")
            )
        return out

    def _record_redirects(self, df: DataFrame, round_no: int) -> None:
        """Record observed alias→final mappings in the redirects table
        (src keyed like url_seen: canonical url + xxhash64). The seed-time
        call (round 0) OVERWRITES, mirroring frontier_tbl.overwrite: it
        runs before any round checkpoint exists, so an append there would
        be re-done on resume and duplicate the seed alias rows."""
        m = (
            df.where(F.col("redirect_src").isNotNull())
            .select(
                F.col("redirect_src").alias("src_url"),
                url_hash(F.col("redirect_src")).alias("src_hash"),
                F.col("url").alias("dst_url"),
                url_hash(F.col("url")).alias("dst_hash"),
                F.lit(round_no).alias("observed_round"),
            )
            .dropDuplicates(["src_url"])
        )
        if round_no == 0:
            self.redirects_tbl.overwrite(m)
        else:
            self.redirects_tbl.append(m)

    # ------------------------------------------------------------------ #
    def _select_batch(self, frontier: DataFrame, limit: int | None,
                      retry_debits: DataFrame | None = None,
                      round_no: int | None = None):
        """Rank-and-limit selection. ``retry_debits`` (host, _debit) counts
        this round's due retry re-dispatches per host: they are deducted
        from the host's politeness grant BEFORE fresh selection, so total
        per-host dispatch (fresh + retries) honors the budget — a host
        that just timed out doesn't get budget + n_retries fetches.
        Residual overdraw is bounded: if due retries alone exceed the
        budget, fresh selection gets 0 and dispatch = n_due (retries hold
        grants from the round that first selected them)."""
        pri = self._priority(round_no)
        cand = frontier
        if self.cfg.politeness and self.host_budgets is not None:
            salts = max(1, self.cfg.politeness_salts)
            mg = self.cfg.salt_min_grants
            # politeness grouping key: the host column, or (domain mode)
            # the PSL registrable domain computed over it — budgets,
            # debits, and the rank windows all group on this key
            hk = "host"
            if self.cfg.politeness_key == "domain":
                from ..functions.urls import registrable_domain

                hk = "_pk"
                cand = cand.withColumn(hk, registrable_domain(F.col("host")))
            elif self.politeness_map is not None:
                hk = "_pk"
                pm = F.broadcast(self.politeness_map.select(
                    F.col("host").alias("_mh"), F.col("pkey").alias("_mp")))
                cand = (
                    cand.join(pm, F.col("host") == F.col("_mh"), "left")
                    .withColumn(hk, F.coalesce("_mp", "host"))
                    .drop("_mh", "_mp")
                )
            if retry_debits is not None:
                debit = F.coalesce(F.col("_debit"), F.lit(0)).cast("long")
            else:
                debit = F.lit(0).cast("long")

            def _join_debits(df: DataFrame) -> DataFrame:
                if retry_debits is None:
                    return df
                return df.join(F.broadcast(retry_debits), hk, "left")

            if mg:
                # adaptive salting: queues scale with the host's budget —
                # ns = clamp(ceil(budget/mg), 1, salts). Long-tail hosts
                # fold to one queue (budget enforced EXACTLY); hot hosts
                # keep up to `salts` queues so no single window partition
                # sorts the whole hot-host candidate set. The stored
                # host_salt (pmod(xxhash64(url), salts)) folds stably to
                # the queue id via a second pmod, so the mapping is a pure
                # function of (url, budget) — the python oracle mirrors it.
                budgets = F.broadcast(self.host_budgets.select(
                    F.col("host").alias(hk),
                    F.col("budget").cast("long").alias("_b")))
                w = Window.partitionBy(hk, "_q").orderBy(*pri)
                # _ns (queue count) stays a pure function of (url, budget)
                # — the python oracle mirrors it — only the per-queue
                # GRANT shrinks by the debit. debit == 0 reduces exactly
                # to the undebited formula (greatest(1, ceil(_b/_ns))).
                cand = (
                    _join_debits(cand.join(budgets, hk, "left"))
                    .withColumn("_b", F.coalesce("_b", F.lit(1_000_000_000)))
                    .withColumn("_ns", F.least(
                        F.lit(salts),
                        F.greatest(F.lit(1), F.ceil(F.col("_b") / F.lit(mg)))
                    ).cast("int"))
                    .withColumn("_q", F.pmod("host_salt", F.col("_ns")))
                    .withColumn("_budget", F.when(
                        debit >= F.col("_b"), F.lit(0)
                    ).otherwise(F.greatest(
                        F.lit(1),
                        F.ceil((F.col("_b") - debit) / F.col("_ns")))).cast("int"))
                    .withColumn("_hr", F.row_number().over(w))
                    .where(F.col("_hr") <= F.col("_budget"))
                    .drop("_hr", "_budget", "_b", "_ns", "_q", *(
                        [hk] if hk != "host" else []), *(
                        ["_debit"] if retry_debits is not None else []))
                )
            else:
                budgets = F.broadcast(self.host_budgets.select(
                    F.col("host").alias(hk),
                    F.col("budget").cast("long").alias("_b")))
                w = Window.partitionBy(hk, "host_salt").orderBy(*pri)
                cand = (
                    _join_debits(cand.join(budgets, hk, "left"))
                    .withColumn("_b", F.coalesce("_b", F.lit(1_000_000_000)))
                    .withColumn("_budget", F.when(
                        debit >= F.col("_b"), F.lit(0)
                    ).otherwise(F.greatest(
                        F.lit(1),
                        F.ceil((F.col("_b") - debit) / F.lit(salts)))).cast("int"))
                    .withColumn("_hr", F.row_number().over(w))
                    .where(F.col("_hr") <= F.col("_budget"))
                    .drop("_hr", "_budget", "_b", *(
                        [hk] if hk != "host" else []), *(
                        ["_debit"] if retry_debits is not None else []))
                )
        if limit is not None:
            if self._pending_est <= limit:
                # the whole pending set fits in the round budget — the
                # two-level pre-cut's per-partition sort is pure waste
                # (every row survives it); rank directly. The window
                # input is bounded by pending itself, and the rank<=limit
                # filter keeps semantics identical even if the estimate
                # ever under-counted (it's a perf heuristic, not a gate).
                wg = Window.orderBy(*pri)
                cand = (
                    cand.withColumn("rank_in_round", F.row_number().over(wg))
                    .where(F.col("rank_in_round") <= limit)
                )
            else:
                cand = self._global_rank_topk(cand, pri, limit)
        elif self.cfg.track_order:
            cand = self._global_rank_full(cand, pri)
        else:
            cand = cand.withColumn("rank_in_round", F.lit(0))
        return cand

    # Above this estimated candidate count the final top-k rank switches
    # from the single-partition window to the range-partitioned two-level
    # rank (two small extra jobs, no serial sort) — see _global_rank_topk.
    RANK_RANGE_THRESHOLD = 2_000_000

    def _global_rank_topk(self, cand: DataFrame, pri: list, limit: int) -> DataFrame:
        """Distributed exact top-k + rank. The classic two-level cut,
        done SHUFFLE-FREE: sort each partition in place, then
        ``monotonically_increasing_id`` (partition id in the high bits,
        row position in the low 33 bits) gives the within-partition rank
        without any exchange — each partition keeps its local
        top-``limit``, so the FINAL rank only ever sees ≤ P×limit
        survivors: bounded by the round budget, NEVER by frontier size.
        The global top-k is a subset of the union of per-partition
        top-k's, so the result is exact.

        The final rank is size-adaptive. Small candidate sets (the test/
        bench regime — per-round job floors dominate there) rank through
        one total-order window: a single-task sort of ≤ P×limit rows,
        zero extra jobs. Past RANK_RANGE_THRESHOLD the serial sort's
        bytes become the round's critical path, so the rank goes
        two-level instead: range-exchange the survivors on the priority
        (sampled boundaries), sort within partitions, and add broadcast
        per-partition offsets from an O(P)-row count collect — every
        sort is parallel and the only serial state is P counts. Both
        paths produce IDENTICAL ranks: every priority list ends with the
        unique ``url`` tiebreak (a total order), so ranks are exact and
        deterministic whatever partition boundaries the range sampler
        picked (pytest pins window == range equality)."""
        mask = F.lit((1 << 33) - 1)
        cut = (
            cand.sortWithinPartitions(*pri)
            .withColumn(
                "_lrk", F.monotonically_increasing_id().bitwiseAND(mask)
            )
            .where(F.col("_lrk") < limit)
        )
        if getattr(self, "_pending_est", 0) <= self.RANK_RANGE_THRESHOLD:
            wg = Window.orderBy(*pri)  # ≤ P×limit rows by construction
            return (
                cut.withColumn("rank_in_round", F.row_number().over(wg))
                .where(F.col("rank_in_round") <= limit)
                .drop("_lrk")
            )
        # range path. BOTH intermediates persist: `cut` because the range
        # sampler's pass would otherwise re-run the local sort, and
        # `part` because the counts job and the returned plan MUST share
        # one materialization — re-executing repartitionByRange could
        # sample different boundaries, and offsets computed under one
        # partitioning applied to another would corrupt ranks. Released
        # after the round's fetch commits (run() unpersists _rank_cache).
        cut = cut.persist()
        nparts = self.spark.sparkContext.defaultParallelism
        part = (
            cut.repartitionByRange(nparts, *pri)
            .sortWithinPartitions(*pri)
            .withColumn("_pid", F.spark_partition_id())
            .withColumn(
                "_lrk2", F.monotonically_increasing_id().bitwiseAND(mask))
        ).persist()
        self._rank_cache = [cut, part]
        counts = {
            r["_pid"]: r["n"]
            for r in part.groupBy("_pid").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
        off_expr, acc = F.lit(0).cast("long"), 0
        for p in sorted(counts):
            off_expr = F.when(F.col("_pid") == p, F.lit(acc)).otherwise(off_expr)
            acc += counts[p]
        return (
            part.withColumn(
                "rank_in_round",
                (off_expr + F.col("_lrk2") + 1).cast("int"))
            .where(F.col("rank_in_round") <= limit)
            .drop("_lrk", "_lrk2", "_pid")
        )

    def _global_rank_full(self, cand: DataFrame, pri: list) -> DataFrame:
        """Exact global rank with NO limit (track_order over the whole
        candidate set). Only BFS offers a cheap order-aligned block key:
        rank = (count of shallower-depth rows) + within-depth rank. The
        per-depth counts are an O(max_depth)-row collect — deterministic
        (pure function of the snapshot, unlike range-partitioner
        sampling) — and the within-depth windows run one task per depth;
        no window ever spans the whole frontier in one partition. DFS /
        best-first have no such block key: an unbounded global rank
        there is inherently a serial sort, so we require a budget."""
        if self.strategy != "bfs":
            raise ValueError(
                "track_order with no max_pages/round_size requires strategy='bfs' "
                "(depth-block ranks); set round_size or max_pages for dfs/best_first"
            )
        counts = {
            r["depth"]: r["cnt"]
            for r in cand.groupBy("depth").agg(F.count("*").alias("cnt")).collect()
        }
        if not counts:
            return cand.withColumn("rank_in_round", F.lit(0))
        off_expr, acc = F.lit(0), 0
        for d in sorted(counts):
            off_expr = F.when(F.col("depth") == d, F.lit(acc)).otherwise(off_expr)
            acc += counts[d]
        wd = Window.partitionBy("depth").orderBy(*pri[1:])  # pri[0] is depth
        return cand.withColumn(
            "rank_in_round", (off_expr + F.row_number().over(wd)).cast("int")
        )

    # ------------------------------------------------------------------ #
    # rows-per-output-file targets: narrow frontier/pending rows vs wide
    # span pages (which also want synthesis parallelism). Sizing writes to
    # the data instead of a fixed 32 keeps small rounds from paying 32
    # file creates + 32 footer reads every subsequent scan — measured
    # ~0.45s per small write and ~0.6s per 100-file log scan on tmpfs.
    FRONTIER_ROWS_PER_FILE = 150_000
    PAGES_ROWS_PER_FILE = 2_000

    def _parts_for(self, est_rows: int, rows_per_file: int, over: int = 1) -> int:
        """Partition count for a stage/write sized at ``est_rows``.
        ``over`` > 1 oversplits beyond core count (up to over×cores):
        per-URL synthesis/extract cost varies with simulated doc size,
        so a one-wave stage (tasks == cores) pays the whole skew as
        tail idle time; 3-4 waves amortize it (measured: the fattest
        crawl round's fetch stage at 4 cores was a single 4-task wave
        whose straggler set the stage time)."""
        par = self.spark.sparkContext.defaultParallelism
        return max(1, min(par * max(1, over), -(-max(1, est_rows) // rows_per_file)))

    # ------------------------------------------------------------------ #
    # maybe-seen sidecar dispatch (north rule: "partitioned Bloom/cuckoo
    # URL-seen filter"). Both kinds share the blooms SnapshotTable slot
    # and the exact-join confirmation; only the shard format differs.
    def _sidecar_kind(self) -> str | None:
        if self.cfg.seen_sidecar:
            return self.cfg.seen_sidecar
        return "bloom" if self.cfg.use_bloom else None

    def _sidecar_build(self, rows: DataFrame) -> DataFrame:
        cfg = self.cfg
        kind = self._sidecar_kind()
        if kind == "cuckoo":
            return build_cuckoo_shards(
                rows, n_shards=cfg.bloom_shards, n_buckets=cfg.cuckoo_buckets)
        if kind == "bloom_hrw":
            return build_bloom_shards_hrw(
                rows, self._hrw_ids, n_bits=cfg.bloom_bits, k=cfg.bloom_k)
        return build_bloom_shards(
            rows, n_shards=cfg.bloom_shards, n_bits=cfg.bloom_bits, k=cfg.bloom_k)

    def _sidecar_merge(self, existing: DataFrame | None, delta_rows: DataFrame) -> DataFrame:
        cfg = self.cfg
        if self._sidecar_kind() == "cuckoo":
            # cuckoo inserts the delta's hashes into the existing tables
            # (cogrouped) — bitset OR has no cuckoo analog
            return merge_cuckoo_shards(
                existing, delta_rows,
                n_shards=cfg.bloom_shards, n_buckets=cfg.cuckoo_buckets)
        return merge_bloom_shards(existing, self._sidecar_build(delta_rows))

    def _sidecar_anti_join(self, new_links: DataFrame, seen: DataFrame) -> DataFrame:
        cfg = self.cfg
        shards = self.bloom_tbl.read(self.spark)
        kind = self._sidecar_kind()
        if kind == "cuckoo":
            return cuckoo_anti_join(
                new_links, seen, shards, url_col="url", hash_col="url_hash",
                n_shards=cfg.bloom_shards, n_buckets=cfg.cuckoo_buckets)
        if kind == "bloom_hrw":
            return bloom_anti_join(
                new_links, seen, shards, url_col="url", hash_col="url_hash",
                n_bits=cfg.bloom_bits, k=cfg.bloom_k, shard_ids=self._hrw_ids)
        return bloom_anti_join(
            new_links, seen, shards, url_col="url", hash_col="url_hash",
            n_shards=cfg.bloom_shards, n_bits=cfg.bloom_bits, k=cfg.bloom_k)

    def _fetch(self, selected: DataFrame, round_no: int, fetched_so_far: int) -> DataFrame:
        """Fetch stage. Two stand-ins for the production mapInPandas HTTP
        fetcher (scheduling/dedup/ordering identical in all three):

        * DataFrame corpus — left join vs the stored table (test path);
        * VirtualCorpus — synthesize the document from the URL itself:
          O(batch) per round like a real fetch, no corpus scan/shuffle
          (the bench path; a corpus join at 10^10 docs would measure the
          join, not the scheduler)."""
        from ..fixtures import VirtualCorpus

        # spread the write across executors: AQE coalesces this small-at-
        # test-scale shuffle to 1-2 partitions, which would serialize the
        # parquet write AND next round's scan; url_hash keeps it even.
        # Repartition BEFORE fetch/synthesis so only the narrow frontier
        # rows ride the shuffle — the wide span structs are produced
        # map-side after the exchange (an exchange is a projection
        # barrier: Catalyst won't hoist the synthesis above it).
        # Partition count scales with the batch-size estimate.
        selected = selected.repartition(
            self._parts_for(self._batch_est, self.PAGES_ROWS_PER_FILE, over=4),
            "url_hash")
        if isinstance(self.corpus, VirtualCorpus):
            # ONE select: the cached synthesis columns (spans/status and
            # the arithmetic _title — span 0 is the heading by
            # construction) splice straight into the output projection.
            # Chaining corpus.fetch().select() would eagerly analyze the
            # ~5k-node synthesis tree twice per round — pure driver cost.
            spans_c, st_c, title_c = self.corpus.fetch_cols(
                lazy=self.cfg.enable_lazy_loading,
                steps=self.cfg.multi_step_actions,
                wait_for=self.cfg.multi_step_wait_for)
            joined, status, heading, spans_out = selected, st_c, title_c, spans_c
        else:
            docs = self.corpus.select(
                F.col("doc_id").alias("url"), "spans", F.lit("fetched").alias("_st")
            )
            joined = selected.join(docs, "url", "left")
            status = F.col("_st")
            heading = F.get(F.filter("spans", lambda s: s["kind"] == "heading"), 0)["text"]
            spans_out = F.col("spans")
        cfg = self.cfg
        rank = (F.lit(fetched_so_far) + F.col("rank_in_round")).cast("long")
        st = F.coalesce(status, F.lit("missing"))
        title = F.coalesce(heading, F.col("url"))  # E6 ladder
        attempt = F.lit(1).cast("int")
        if cfg.max_retries > 0:
            # retry re-dispatches keep their ORIGINAL rank (crawl order =
            # dispatch order); attempt rides through from the snapshot
            rank = F.coalesce(F.col("_retry_rank"), rank)
            attempt = F.col("attempt").cast("int")
            if cfg.retry_failure_every > 0:
                # deterministic per-(url, attempt) transient die — the
                # fetch-sim stand-in for timeouts/5xx. Only successful
                # synthesis can fail transiently (missing = permanent
                # 404) and the final allowed attempt always resolves.
                die = F.pmod(
                    F.xxhash64(F.concat(
                        F.col("url"), F.lit("#"), attempt.cast("string"))),
                    F.lit(cfg.retry_failure_every)) == 0
                st = F.when(
                    (attempt <= F.lit(cfg.max_retries)) & die
                    & (st == F.lit("fetched")),
                    F.lit("transient")).otherwise(st)
            # a transient fetch returned no content: null spans, url title
            is_tr = st == F.lit("transient")
            spans_out = F.when(is_tr, F.lit(None)).otherwise(spans_out)
            title = F.when(is_tr, F.col("url")).otherwise(title)
        if cfg.conditional_fetch:
            # HTTP 304 model: a reopened URL whose content digest matches
            # its stored validator (revisit_digests, written by reopen())
            # logs not_modified with null spans — no body on the wire,
            # no extraction (the extract stage gates on status='fetched').
            # The compare runs AFTER the transient die (a revalidation
            # that times out is transient like any fetch) and only
            # upgrades successful fetches. First fetches never match: the
            # broadcast map holds only reopened URLs.
            rd = self.revdig_tbl.read(self.spark)
            if rd is not None:
                rd = F.broadcast(rd.select(
                    F.col("url").alias("_rd_url"),
                    F.col("prev_dig").alias("_prev_dig")))
                joined = joined.join(
                    rd, joined["url"] == F.col("_rd_url"), "left")
                is_304 = (F.col("_prev_dig").isNotNull()
                          & (self._content_digest(spans_out)
                             == F.col("_prev_dig"))
                          & (st == F.lit("fetched")))
                st = F.when(is_304, F.lit("not_modified")).otherwise(st)
                spans_out = F.when(is_304, F.lit(None)).otherwise(spans_out)
                title = F.when(is_304, F.col("url")).otherwise(title)
        out = [
            "url", "url_hash", "host", "depth",
            rank.alias("rank"),
            F.lit(round_no).alias("fetch_round"),
            st.alias("status"),
            title.alias("title"),
            spans_out.alias("spans"), "score", "parent_rank", "parent_offset", "path",
            attempt.alias("attempt"),
        ]
        if cfg.content_dedup or cfg.conditional_fetch:
            # content-seen digest materialized at fetch time: the gate and
            # the digest-table append read it column-pruned from the round
            # delta instead of rehashing every span array (twice) per
            # round. conditional_fetch also materializes it so a later
            # reopen() can snapshot per-URL validators column-pruned from
            # the log (fetched rows only — a 304/transient row's digest
            # is digest-of-null and is never read).
            out.append(self._content_digest(spans_out).alias("_dig"))
        return joined.select(*out)

    # ------------------------------------------------------------------ #
    def _extract_cols(self) -> dict:
        """Config-static Column trees of the extract stage, built once per
        engine (py4j tree construction is per-round driver overhead
        otherwise; Columns are unresolved exprs, reusable across rounds)."""
        if getattr(self, "_xc", None) is None:
            cfg = self.cfg
            if cfg.scorer == "keyword" and cfg.score_keywords:
                sc = keyword_score("url", cfg.score_keywords)  # F6
            else:
                sc = link_score("url", "anchor", cfg.query)  # F5 (default)
            u = F.col("url")
            self._xc = {
                "explode": F.posexplode(
                    F.filter("spans", lambda s: s["kind"] == "link")).alias("_i", "s"),
                "canon": canonicalize(F.col("href"), cfg.strip_params),
                "host": url_host(u).alias("host"),
                "u_path": url_path(u).alias("u_path"),
                "score": sc.alias("score"),
                "url_hash": url_hash("url").alias("url_hash"),
                "host_salt": F.pmod(
                    F.xxhash64("url"), F.lit(max(1, cfg.politeness_salts))
                ).cast("int").alias("host_salt"),
                "path": F.concat(
                    "p_path", F.lit("/"),
                    F.lpad(F.col("offset").cast("string"), 6, "0")).alias("path"),
            }
        return self._xc

    def _content_digest(self, spans: Column | None = None) -> Column:
        """Span-content digest for content-seen dedup — xxhash64 straight
        over the nested span array (hash expressions support nested rows;
        no JSON serialization). With include_external=False (default) the
        digest keys on (host, content): the internal-only link filter
        keys on the PARENT host, so only same-host copies are
        link-equivalent; with externals allowed, content alone determines
        the link set (config.py). Computed ONCE, in the fetch projection,
        and materialized as the pages log's ``_dig`` column — the gate
        and the digest-table append then read a column-pruned
        (url, rank, depth, _dig) slice of the round delta and never
        rescan or rehash the spans payload."""
        cols = [F.col("spans") if spans is None else spans]
        if not self.cfg.include_external:
            cols.append(F.col("host"))
        return F.xxhash64(*cols)

    def _content_gate(self, parents: DataFrame) -> DataFrame:
        """Content-seen suppression (cfg.content_dedup): drop a fetched
        page iff an earlier-rank page with the same digest was extracted
        at depth ≤ this page's depth — exactly the condition under which
        its whole link set is already enqueued (identical content ⇒
        identical links; shallower-or-equal ⇒ every p_depth gate passed
        at least as generously), so pages/seen/order stay byte-identical
        to content_dedup=False (tested per strategy). Two checks: the
        digests table carries the min EXTRACTED depth per digest over all
        previous rounds (all earlier ranks by construction), and an
        in-batch running-min window per digest (group size = this batch's
        copies of ONE document — mirror-group sized, never
        frontier-sized) for same-round copies.

        Scale shape: the decision runs on a SLIM projection (url, rank,
        depth, digest — the digest is read column-pruned from the round
        delta), so the heavy spans payload never enters the gate; the
        history check STREAMS the O(crawl-history) digest table map-side
        against a broadcast of the slim batch (inner probe, `hits`) —
        the history table is never shuffled, aggregated, or broadcast,
        the same one-pass-over-the-log shape as the exact URL-seen
        anti-join. The verdict applies back as a broadcast anti-join
        against the SUPPRESSED url set — bounded by the round's
        duplicate count, a fraction of the operator-chosen round budget
        at any corpus size."""
        slim = parents.select("url", "rank", "depth", "_dig").persist()
        self._slim_handle = slim
        # One tiny per-digest batch aggregate drives BOTH cheapenings
        # (r4 verdict #4): its max depth probes the history table in one
        # streamed pass, and its count pre-filters the running-min window
        # to digests that actually repeat in-batch. Rows are (long, int,
        # long) — broadcasting this instead of the full slim batch (url
        # strings) cuts the driver round-trip ~6x.
        bd = slim.groupBy(F.col("_dig").alias("dig")).agg(
            F.max("depth").alias("_dmax"),
            F.count(F.lit(1)).alias("_n"))
        hist = self.digests_tbl.read(self.spark)
        self._hist_for_round = hist
        if hist is not None:
            # per-digest history floor, restricted to digests in this
            # batch that CAN be suppressed (hist min_depth <= batch max
            # depth): hist STREAMS map-side against the broadcast digest
            # aggregate — the history table is never shuffled, and this
            # is the round's ONLY pass over it (the digest-append's
            # blocker check below reuses the same floor).
            probe = (hist.join(F.broadcast(bd),
                               (hist["dig"] == bd["dig"])
                               & (hist["min_depth"] <= bd["_dmax"]), "inner")
                     .groupBy(hist["dig"].alias("_pdig"))
                     .agg(F.min("min_depth").alias("_hmin")))
            self._probe_cache = probe = probe.persist()
            self._probe_for_round = probe = F.broadcast(probe)
            marked = (slim.join(probe, slim["_dig"] == F.col("_pdig"), "left")
                      .withColumn("_hsup", F.coalesce(
                          F.col("_hmin") <= F.col("depth"), F.lit(False)))
                      .drop("_pdig", "_hmin"))
        else:
            self._probe_for_round = None
            marked = slim.withColumn("_hsup", F.lit(False))
        # in-batch running min over history-SURVIVING earlier rows only
        # (a history-suppressed copy was never extracted this round; its
        # digest's historical extraction already gated everyone above).
        # The window runs ONLY over digests with in-batch count > 1 — a
        # unique digest's preceding-rows min is null by construction, so
        # restricting the sort/partition to the duplicate fraction
        # (mirror-group sized) is exact.
        dups = F.broadcast(bd.where(F.col("_n") > 1).select("dig"))
        dup_rows = marked.join(dups, marked["_dig"] == dups["dig"],
                               "left_semi")
        uni_rows = marked.join(dups, marked["_dig"] == dups["dig"],
                               "left_anti")
        w = (Window.partitionBy("_dig")
             .orderBy(F.col("rank").asc(), F.col("url").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
        bmin = F.min(F.when(~F.col("_hsup"), F.col("depth"))).over(w)
        dup_rows = dup_rows.withColumn(
            "_sup", F.col("_hsup") | F.coalesce(
                bmin <= F.col("depth"), F.lit(False)))
        marked = uni_rows.withColumn("_sup", F.col("_hsup")).unionByName(
            dup_rows)
        # marked feeds TWO actions this round (the broadcast anti-join
        # inside the frontier append, then the digest-table append) —
        # persist so the history probe + window run once, not twice
        marked = marked.persist()
        self._marked_handle = marked
        self._gated_slim = marked.where(~F.col("_sup")).select(
            "url", "_dig", "depth")
        suppressed = marked.where(F.col("_sup")).select("url")
        return parents.join(F.broadcast(suppressed), "url", "left_anti")

    def _extract_links(self, pages_batch: DataFrame, round_no: int) -> DataFrame:
        cfg = self.cfg
        xc = self._extract_cols()
        parents = pages_batch.where(F.col("status") == "fetched")
        if self.nofollow_pages is not None:
            # follow-gate before the explode: nofollow parents contribute
            # no outlinks at all (they stay fetched/logged/indexed)
            nf = F.broadcast(
                self.nofollow_pages.select(F.col("url").alias("_nf_url")))
            parents = parents.join(
                nf, parents["url"] == nf["_nf_url"], "left_anti")
        if cfg.content_dedup:
            # (also stashes self._gated_slim for the digest-table append)
            parents = self._content_gate(parents)
        links = (
            parents
            .select(
                F.col("url").alias("p_url"), F.col("host").alias("p_host"),
                F.col("depth").alias("p_depth"), F.col("rank").alias("p_rank"),
                F.col("path").alias("p_path"),
                xc["explode"],
            )
            .select(
                "p_url", "p_host", "p_depth", "p_rank", "p_path",
                F.col("s.media_ref").alias("href"),
                F.col("s.text").alias("anchor"),
                F.col("s.offset").alias("offset"),
            )
        )
        links = links.select(
            xc["canon"].alias("url"), "anchor", "offset", "p_host", "p_depth", "p_rank", "p_path",
        )
        # F12: filters, scoring, dedup and the seen set all key on the
        # FINAL url (the landed page), as the reference does
        links = self._resolve_redirects(links)
        links = links.select("*", xc["host"], xc["u_path"])
        if not cfg.include_external:
            links = links.where(F.col("host") == F.col("p_host"))
        if cfg.exclude_social:
            soc = "|".join(d.replace(".", r"\.") for d in SOCIAL_DOMAINS)
            links = links.where(~F.col("host").rlike(f"(^|\\.)({soc})$"))
        if cfg.exclude_domains:
            links = links.where(~F.col("host").isin(cfg.exclude_domains))
        if cfg.max_url_length is not None:
            # spider-trap guard: ever-growing URLs die here, map-side,
            # before any shuffle or seen-set traffic
            links = links.where(
                F.octet_length(F.col("url")) <= F.lit(int(cfg.max_url_length)))
        if cfg.max_path_segments is not None:
            segs = F.size(F.filter(
                F.split(F.col("u_path"), "/"), lambda s: s != ""))
            links = links.where(segs <= F.lit(int(cfg.max_path_segments)))
        if self.trap_templates is not None:
            tpl = F.regexp_replace(
                F.regexp_replace(F.col("u_path"), r"[0-9a-f]{8,}", "{h}"),
                r"[0-9]+", "{d}")
            traps = F.broadcast(self.trap_templates.select(
                F.col("host").alias("_th"), F.col("template").alias("_tt")))
            links = links.withColumn("_tpl", tpl).join(
                traps,
                (F.col("host") == F.col("_th")) & (F.col("_tpl") == F.col("_tt")),
                "left_anti").drop("_tpl")
        links = links.where(F.col("p_depth") < cfg.max_depth)

        # Slim the dedup-exchange row (r4 verdict #2): u_path is consumed
        # only by the robots split (post anti-join) and redirect_src only
        # by _record_redirects — when those features are off, neither
        # string rides the groupBy min_by exchange or the seen anti-join.
        extras = []
        if cfg.respect_robots and self.robots is not None:
            extras.append("u_path")
        if self.redirects is not None:
            extras.append("redirect_src")
        scored = links.select(
            "url",
            xc["url_hash"],
            "host",
            xc["host_salt"],
            (F.col("p_depth") + 1).alias("depth"),
            xc["score"],
            F.col("p_rank").cast("long").alias("parent_rank"),
            F.col("offset").alias("parent_offset"),
            xc["path"],
            F.lit(round_no).alias("discovered_round"),
            *extras,
        )
        if cfg.score_threshold is not None and self.url_scores is None:
            # reference score-threshold semantics: below-threshold links
            # are dropped pre-enqueue (never fetched, never "seen").
            # Plain map-side filter BEFORE the dedup exchange — shrinks
            # the shuffle instead of adding one. (With url_scores the
            # threshold must see the EFFECTIVE score, so it moves after
            # the override join below.)
            scored = scored.where(F.col("score") >= F.lit(float(cfg.score_threshold)))
        # in-batch first-discovery dedup: keep min (parent_rank, offset).
        # groupBy + min_by instead of a window: hash aggregation gets a
        # map-side partial combine, so duplicate-heavy link batches (the
        # norm — fixture rounds see ~1.6 raw links per distinct url)
        # shrink BEFORE the exchange, and no per-partition sort runs.
        # (parent_rank, parent_offset) is unique per url — one span, one
        # link — so min_by ties cannot occur and the pick is deterministic.
        rest = [c for c in scored.columns if c != "url"]
        picked = scored.groupBy("url").agg(
            F.min_by(F.struct(*rest),
                     F.struct("parent_rank", "parent_offset")).alias("_s"))
        picked = picked.select("url", *[F.col(f"_s.{c}").alias(c) for c in rest])
        if self.url_scores is not None:
            # graph-feedback override: one row per url (producer contract),
            # left side already hash-exchanged on url by the dedup agg
            ovr = self.url_scores.select(
                F.col("url").alias("_ovr_url"),
                F.col("score").cast("double").alias("_ext"))
            picked = (
                picked.join(ovr, picked["url"] == F.col("_ovr_url"), "left")
                .drop("_ovr_url")
                .withColumn("score", F.coalesce("_ext", "score"))
                .drop("_ext")
            )
            if cfg.score_threshold is not None:
                picked = picked.where(
                    F.col("score") >= F.lit(float(cfg.score_threshold)))
        return picked

    # ------------------------------------------------------------------ #
    def _robots_split(self, new_links: DataFrame):
        """(allowed, blocked): REP longest-match evaluation — the most
        specific (longest) matching rule among allow+disallow wins, and
        allow wins length ties (RFC 9309 §2.2.2). Blocked iff the best
        matching disallow is strictly longer than the best matching
        allow. Rules may use RFC 9309 §2.2.3 wildcards: ``*`` matches
        any char run, a trailing ``$`` anchors end-of-path (plain
        prefix rules keep the regex-free fast path). Broadcast join —
        the robots table is one row per host; rule evaluation is pure
        column exprs (functions.urls.rep_best_match)."""
        if not self.cfg.respect_robots or self.robots is None:
            return new_links.drop("u_path"), None
        from ..functions.urls import rep_best_match

        cols = ["host", "disallow"]
        has_allow = "allow" in self.robots.columns
        if has_allow:
            cols.append("allow")
        r = F.broadcast(self.robots.select(*cols))
        j = new_links.join(r, "host", "left")

        def best(rules: str) -> F.Column:
            return rep_best_match(F.col("u_path"), F.col(rules))

        blocked_pred = best("disallow") > (best("allow") if has_allow else F.lit(0))
        drop = ["disallow", "u_path"] + (["allow"] if has_allow else [])
        allowed = j.where(~blocked_pred).drop(*drop)
        blocked = j.where(blocked_pred).drop(*drop)
        return allowed, blocked

    # ------------------------------------------------------------------ #
    def _sweep_mode(self) -> bool:
        """BFS throughput fast path: with no page budget, no politeness
        and no order tracking, round r's batch is EXACTLY the fresh links
        discovered in round r-1 — no pending scan, no priority windows,
        no url_seen materialization (the frontier log doubles as the
        seen set). Ordered modes share the append-only frontier but must
        scan it each round to select by priority; sweep touches only the
        per-round delta end to end."""
        cfg = self.cfg
        return (
            not cfg.track_order
            and cfg.max_pages is None
            and not cfg.politeness
            and cfg.round_size is None
            and self.strategy == "bfs"
        )

    # ------------------------------------------------------------------ #
    def run(self, resume: bool = False) -> dict:
        cfg, spark = self.cfg, self.spark
        sweep = self._sweep_mode()
        self._metrics_parts: list[DataFrame] = []
        # _batch_est = rows entering fetch; _pending_est = pending-table
        # size; _link_ratio = observed fresh-links-per-fetched-page.
        self._batch_est = max(1, len(cfg.seeds))
        self._pending_est = max(1, len(cfg.seeds))
        self._link_ratio = 4.0
        self._retries_est = 0
        ck = self.ckp.latest() if resume else None
        if ck is None:
            _ts = time.monotonic()
            sobs = Observation()
            self.frontier_tbl.overwrite(
                self._seed_frontier().observe(sobs, F.count(F.lit(1)).alias("n")))
            self._prof_mark(0, "seed_overwrite", _ts)
            seeds = self.frontier_tbl.read(spark)
            # ordered modes start in "delta" pending mode: the seed
            # overwrite IS the frontier's latest commit, so round 1's
            # pending set is exactly _read_delta(frontier) — no separate
            # pending materialization until a round leaves a remainder
            self._pending_mode = "delta"
            self._pending_est = int(sobs.get["n"])
            # bloom_hrw: the shard-id set is engine state (growth changes
            # it mid-crawl) — initialized here, persisted per round in the
            # checkpoint so rollback/resume replays growth exactly
            self._hrw_ids = list(range(cfg.bloom_shards))
            self._seen_est = self._pending_est
            if self._sidecar_kind():
                self.bloom_tbl.overwrite(self._sidecar_build(seeds))
            round_no, fetched = 1, 0
        else:
            # Roll back any table commits that happened after the last
            # durable checkpoint — the interrupted round replays exactly.
            for name, tbl in (("frontier", self.frontier_tbl), ("url_seen", self.seen_tbl),
                              ("pages", self.pages_tbl), ("metrics", self.metrics_tbl),
                              ("blooms", self.bloom_tbl), ("redirects", self.redirects_tbl),
                              ("pending", self.pending_tbl), ("retries", self.retries_tbl),
                              ("digests", self.digests_tbl),
                              ("revisit_digests", self.revdig_tbl)):
                if name in ck["versions"]:
                    tbl.rollback(ck["versions"][name])
            round_no, fetched = ck["round"] + 1, ck["fetched"]
            self._hrw_ids = ck.get("hrw_ids") or list(range(cfg.bloom_shards))
            self._seen_est = ck.get("seen_est", 0)
            if self._sidecar_kind() == "bloom_hrw" and not ck.get("seen_est"):
                # checkpoint predates the estimate: recount the log once
                fr = self.frontier_tbl.read(spark)
                self._seen_est = 0 if fr is None else fr.count()
            if cfg.max_retries > 0:
                if "retries_est" in ck:
                    self._retries_est = ck["retries_est"]
                else:
                    # checkpoint predates retries: count the snapshot once
                    r = self.retries_tbl.read(spark)
                    self._retries_est = 0 if r is None else r.count()
            if sweep:
                d = self._read_delta(self.frontier_tbl)
                self._batch_est = 1 if d is None else max(1, d.count())
            elif "pending_mode" in ck:
                self._pending_mode = ck["pending_mode"]
                self._pending_est = ck["pending_est"]
            else:
                # checkpoint predates the pending snapshot: re-derive it
                # once from the log (discovered minus fetched) and carry
                # on incrementally from there
                log = self.frontier_tbl.read(spark)
                pages = self.pages_tbl.read(spark)
                if log is not None:
                    pend = log if pages is None else log.join(
                        pages.select("url"), "url", "left_anti")
                    self.pending_tbl.overwrite(pend.select(*FRONTIER_COLS))
                self._pending_mode = "table"
                p = self.pending_tbl.read(spark)
                self._pending_est = 0 if p is None else p.count()
            if self._sidecar_kind() and self.bloom_tbl.read(spark) is None:
                # resuming a crawl whose checkpoint predates the sidecar:
                # rebuild the sidecar from the full current seen set —
                # a partial (delta-only) bloom would let already-seen
                # URLs test definitely-new and re-enter the frontier
                src = self.seen_tbl.read(spark)
                if src is not None:
                    src = src.select("url", "url_hash")
                fr = self.frontier_tbl.read(spark)
                if fr is not None:
                    fr = fr.select("url", "url_hash")
                    src = fr if src is None else src.unionByName(fr)
                if src is not None:
                    self.bloom_tbl.overwrite(self._sidecar_build(src))

        while round_no <= cfg.max_rounds:
            remaining = None if cfg.max_pages is None else cfg.max_pages - fetched
            if remaining is not None and remaining <= 0:
                break
            limit = remaining
            if cfg.round_size is not None:
                limit = cfg.round_size if limit is None else min(limit, cfg.round_size)

            t0 = time.monotonic()
            retries_out = cfg.max_retries > 0 and self._retries_est > 0
            rsnap = due = due_debits = None
            if cfg.max_retries > 0:
                rsnap = self.retries_tbl.read(spark)
                if rsnap is not None:
                    due = rsnap.where(F.col("due_round") <= round_no)
                    if retries_out and cfg.politeness and self.host_budgets is not None:
                        # per-host count of this round's due re-dispatches,
                        # deducted from the politeness grant in
                        # _select_batch (ADVICE r3: retries must not ride
                        # on top of the budget). Snapshot is coalesce(1)
                        # and tiny — the agg broadcasts.
                        if cfg.politeness_key == "domain":
                            from ..functions.urls import registrable_domain

                            due_debits = due.groupBy(
                                registrable_domain(F.col("host")).alias("_pk")
                            ).agg(F.count("*").cast("long").alias("_debit"))
                        elif self.politeness_map is not None:
                            pm = F.broadcast(self.politeness_map.select(
                                F.col("host").alias("_mh"),
                                F.col("pkey").alias("_mp")))
                            due_debits = (
                                due.join(pm, F.col("host") == F.col("_mh"),
                                         "left")
                                .groupBy(F.coalesce("_mp", "host").alias("_pk"))
                                .agg(F.count("*").cast("long").alias("_debit"))
                            )
                        else:
                            due_debits = due.groupBy("host").agg(
                                F.count("*").cast("long").alias("_debit"))
            if sweep:
                # delta-only selection: last round's appended links
                delta = self._read_delta(self.frontier_tbl)
                if delta is None:
                    if not retries_out:
                        break
                    # no new links, but transient retries are pending —
                    # dispatch an (empty-frontier ∪ due-retries) round
                    delta = self.frontier_tbl.read(spark).where(F.lit(False))
                selected = delta.withColumn("rank_in_round", F.lit(0))
            else:
                self._batch_est = max(1, (
                    self._pending_est if limit is None
                    else min(limit, self._pending_est)
                ))
                # ordered modes never re-derive pending from a full
                # frontier-log scan + pages anti-join. Two sources:
                # * "delta" mode — the previous round drained pending
                #   completely (the common keeping-up regime), so pending
                #   IS the frontier's latest delta: zero extra I/O.
                # * "table" mode — a remainder was left behind; pending
                #   is its own snapshot, maintained incrementally below.
                if self._pending_mode == "delta":
                    pending = self._read_delta(self.frontier_tbl)
                else:
                    pending = self.pending_tbl.read(spark)
                if pending is None:
                    if not retries_out:
                        break
                    pending = self.frontier_tbl.read(spark).where(F.lit(False))
                selected = self._select_batch(
                    pending, limit, retry_debits=due_debits, round_no=round_no)
            if cfg.max_retries > 0:
                # dispatch = fresh selection (attempt 1) ∪ due retries.
                # Due rows bypass ranking/seen — they already hold a rank
                # and live in the frontier log; dispatching CONSUMES them
                # (the next snapshot is written without them below). Their
                # per-host counts were already deducted from the fresh
                # selection's politeness grant above.
                selected = selected.select(
                    "*", F.lit(1).cast("int").alias("attempt"),
                    F.lit(None).cast("long").alias("_retry_rank"))
                if due is not None:
                    selected = selected.unionByName(due.select(
                        *FRONTIER_COLS, F.lit(0).alias("rank_in_round"),
                        F.col("attempt").cast("int").alias("attempt"),
                        F.col("retry_rank").cast("long").alias("_retry_rank")))
            obs = Observation()
            pages_batch = self._fetch(selected, round_no, fetched).observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                # coalesce: sum over an EMPTY batch observes as NULL
                F.coalesce(F.sum(F.when(F.col("status") == "transient", 1)
                                 .otherwise(0)), F.lit(0)).alias("n_tr"),
                F.coalesce(F.sum(F.when(F.col("attempt") > 1, 1)
                                 .otherwise(0)), F.lit(0)).alias("n_rt"),
            )
            self.pages_tbl.append(pages_batch)
            if getattr(self, "_rank_cache", None):
                # the range-rank intermediates (selection is committed to
                # the pages log now; later stages re-read the delta files)
                for h in self._rank_cache:
                    h.unpersist()
                self._rank_cache = None
            self._prof_mark(round_no, "select+fetch+write_pages", t0)
            # row counts from the write's own observation — no extra job.
            # n_sel = FRESH dispatches (rank slots + pending consumption);
            # retries reuse their original rank and came from the snapshot.
            n_total = int(obs.get["n"])
            n_tr = int(obs.get["n_tr"])
            n_rt = int(obs.get["n_rt"])
            n_sel = n_total - n_rt
            if n_total == 0:
                if retries_out and round_no < cfg.max_rounds:
                    # backoff gap: nothing due yet — commit an empty round
                    # so due_round can be reached (bounded by the backoff)
                    self.ckp.commit(round_no, self._versions(), self._ckp_extra(fetched))
                    round_no += 1
                    continue
                break
            pages_batch = self._read_delta(self.pages_tbl)

            new_links = self._extract_links(pages_batch, round_no)
            # the append-only frontier log IS the seen set (every mode);
            # robots-blocked URLs never enter the log and live in seen_tbl
            seen = self.frontier_tbl.read(spark).select("url")
            blocked_seen = self.seen_tbl.read(spark)
            if blocked_seen is not None:
                seen = seen.unionByName(blocked_seen.select("url"))
            if self._sidecar_kind():
                # definitely-new links skip the anti-join shuffle; only
                # maybe-seen ones get the exact confirmation (F10 stays exact)
                fresh = self._sidecar_anti_join(new_links, seen)
            else:
                fresh = new_links.join(seen, "url", "left_anti")
            if self.redirects is not None:
                # record alias→final mappings whose target is newly seen
                self._record_redirects(fresh, round_no)
            fresh = fresh.drop("redirect_src")
            allowed, blocked = self._robots_split(fresh)

            t1 = time.monotonic()
            fobs = Observation()
            self.frontier_tbl.append(
                allowed.select(*FRONTIER_COLS)
                .observe(fobs, F.count(F.lit(1)).alias("n"))
                .repartition(
                    self._parts_for(int(self._link_ratio * n_sel),
                                    self.FRONTIER_ROWS_PER_FILE, over=4),
                    "url_hash"))
            n_fresh = int(fobs.get["n"])
            self._link_ratio = max(0.5, n_fresh / max(1, n_sel))
            self._batch_est = max(1, n_fresh)  # sweep: next round's batch
            self._prof_mark(round_no, "extract+dedup+write_frontier", t1)

            if cfg.content_dedup:
                # record this round's extracted digests: per-digest min
                # depth, appended only where it improves the table (rows
                # per digest ≤ max_depth, so the table stays ~one row per
                # distinct content). Lands BEFORE the round checkpoint —
                # versions commit atomically, rollback/resume replays it.
                td = time.monotonic()
                bmin = (self._gated_slim
                        .groupBy(F.col("_dig").alias("dig"))
                        .agg(F.min("depth").alias("min_depth")))
                probe = self._probe_for_round
                if probe is not None:
                    # strict improvements only (keeps the table ~one row
                    # per digest): a batch min is blocked by any existing
                    # row at ≤ its depth ⟺ the per-digest history floor
                    # (_hmin, already materialized by the gate's single
                    # history pass this round) is ≤ the batch min —
                    # a broadcast anti-join, no second history scan.
                    bmin = bmin.join(
                        probe,
                        (bmin["dig"] == F.col("_pdig"))
                        & (F.col("_hmin") <= bmin["min_depth"]),
                        "left_anti")
                self.digests_tbl.append(bmin)
                if probe is not None:
                    self._probe_cache.unpersist()
                self._marked_handle.unpersist()
                self._slim_handle.unpersist()
                self._prof_mark(round_no, "content_digests", td)

            if not sweep:
                # incremental pending maintenance. leftover is EXACT:
                # n_sel/n_fresh are observed counts, pending_est was exact
                # (seed count observed; induction below). A fully-drained
                # round needs NO write at all — next round's pending is
                # the frontier delta just appended ("delta" mode). Only a
                # remainder forces materialization: broadcast anti-join of
                # pending vs this round's batch (≤ round budget) ∪ the
                # fresh delta files — no shuffle, no pages-table scan, no
                # recompute of the extract pipeline.
                t2 = time.monotonic()
                leftover = self._pending_est - n_sel
                if leftover <= 0:
                    self._pending_mode = "delta"
                    self._pending_est = n_fresh
                else:
                    remainder = pending.join(
                        F.broadcast(pages_batch.select("url")), "url", "left_anti"
                    ).select(*FRONTIER_COLS)
                    fresh_delta = self._read_delta(self.frontier_tbl)
                    nxt = remainder if fresh_delta is None else remainder.unionByName(
                        fresh_delta.select(*FRONTIER_COLS))
                    self._pending_est = leftover + n_fresh
                    self.pending_tbl.overwrite(
                        nxt.coalesce(self._parts_for(self._pending_est,
                                                     self.FRONTIER_ROWS_PER_FILE)))
                    self._pending_mode = "table"
                self._prof_mark(round_no, "pending_update", t2)

            if cfg.max_retries > 0 and (n_tr > 0 or n_rt > 0):
                # next snapshot = not-yet-due rows ∪ this round's new
                # transients (attempt+1, exponential due_round). Due rows
                # just dispatched are dropped by the due_round filter —
                # consumed exactly once, replayed exactly on rollback.
                t4 = time.monotonic()
                later = (rsnap.where(F.col("due_round") > round_no)
                         if rsnap is not None else None)
                nxt = later
                if n_tr > 0:
                    salts = max(1, cfg.politeness_salts)
                    backoff = F.ceil(F.pow(
                        F.lit(float(cfg.retry_backoff_base)),
                        (F.col("attempt") - 1).cast("double"))).cast("int")
                    newr = pages_batch.where(F.col("status") == "transient").select(
                        "url", "url_hash", "host",
                        F.pmod(F.xxhash64("url"), F.lit(salts)).cast("int").alias("host_salt"),
                        "depth", "score", "parent_rank", "parent_offset", "path",
                        F.lit(round_no).alias("discovered_round"),
                        (F.col("attempt") + 1).cast("int").alias("attempt"),
                        F.col("rank").cast("long").alias("retry_rank"),
                        (F.lit(round_no) + backoff).cast("int").alias("due_round"),
                    )
                    nxt = newr if nxt is None else nxt.unionByName(newr)
                self._retries_est = self._retries_est - n_rt + n_tr
                if nxt is not None:
                    self.retries_tbl.overwrite(nxt.coalesce(1))
                self._prof_mark(round_no, "retries_update", t4)

            if blocked is not None:
                self.seen_tbl.append(blocked.select(
                    "url", "url_hash", F.lit(round_no).alias("first_round"),
                    F.lit("robots_blocked").alias("state")))
            if self._sidecar_kind():
                seen_delta = self._read_delta(self.frontier_tbl)
                if seen_delta is not None:
                    seen_delta = seen_delta.select("url", "url_hash")
                # robots-blocked rows live in seen_tbl, not the frontier
                # log — without them a rediscovered blocked URL would
                # test definitely-new, bypass the exact confirmation,
                # and be re-appended to seen_tbl every round
                if blocked is not None:
                    b_delta = self._read_delta(self.seen_tbl)
                    if b_delta is not None:
                        b_delta = b_delta.select("url", "url_hash")
                        seen_delta = (
                            b_delta if seen_delta is None
                            else seen_delta.unionByName(b_delta)
                        )
                if seen_delta is not None:
                    self.bloom_tbl.overwrite(self._sidecar_merge(
                        self.bloom_tbl.read(spark), seen_delta))
                # incremental HRW growth: when the seen estimate (seeds +
                # Σ fresh appends — exact for the frontier log) crosses
                # grow_at keys/shard, DOUBLE the shard set. Only the new
                # shards' bitsets are built (keys they win under the grown
                # id set — one scan, ≈half the keys written); surviving
                # bitsets pass through byte-identical, stale bits and all
                # (Bloom superset: no false negatives, fpp nudge only).
                # The overwrite lands BEFORE this round's checkpoint, so
                # versions + hrw_ids commit atomically per round.
                self._seen_est += n_fresh
                if (self._sidecar_kind() == "bloom_hrw"
                        and cfg.sidecar_grow_at is not None
                        and self._seen_est
                        > cfg.sidecar_grow_at * len(self._hrw_ids)):
                    tg = time.monotonic()
                    old_ids = self._hrw_ids
                    nxt_id = max(old_ids) + 1
                    new_ids = list(range(nxt_id, nxt_id + len(old_ids)))
                    all_ids = old_ids + new_ids
                    seen_all = self.frontier_tbl.read(spark).select(
                        "url", "url_hash")
                    blk = self.seen_tbl.read(spark)
                    if blk is not None:
                        seen_all = seen_all.unionByName(
                            blk.select("url", "url_hash"))
                    self.bloom_tbl.overwrite(grow_bloom_shards(
                        seen_all, self.bloom_tbl.read(spark), all_ids,
                        new_ids, n_bits=cfg.bloom_bits, k=cfg.bloom_k))
                    self._hrw_ids = all_ids
                    self._prof_mark(round_no, "sidecar_grow", tg)

            elapsed = time.monotonic() - t0
            metrics = (
                pages_batch.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count("*").alias("fetched"),
                     F.sum(F.when(F.col("status") == "missing", 1).otherwise(0)).alias("missing"))
                .select(F.lit(round_no).alias("round"), "partition_id", "fetched", "missing",
                        F.lit(float(elapsed)).alias("elapsed_s"))
            )
            # buffered (lazy over immutable pages-delta files); flushed in
            # one append every METRICS_FLUSH_ROUNDS rounds BEFORE the round
            # checkpoint (a crash loses at most that many rounds of metrics
            # — bounded, documented) and once after the loop. Saves one
            # write job per round in every mode.
            self._metrics_parts.append(metrics)
            if len(self._metrics_parts) >= self.METRICS_FLUSH_ROUNDS:
                self._flush_metrics()

            fetched += n_sel
            self.ckp.commit(round_no, self._versions(), self._ckp_extra(fetched))
            if cfg.auto_compact_every and round_no % cfg.auto_compact_every == 0:
                # after the checkpoint: a crash mid-compaction resumes from
                # the just-committed round; the compact snapshots (if any
                # landed) are simply rolled back past — data files are
                # immutable, nothing is lost
                t3 = time.monotonic()
                self.compact_state()
                self._prof_mark(round_no, "auto_compact", t3)
            round_no += 1

        _tf = time.monotonic()
        if self._metrics_parts and round_no > 1:
            # the final flush appends AFTER the last round's checkpoint;
            # re-commit that round's checkpoint with the flushed metrics
            # version so a later resume(rollback) can never delete the
            # durably-written metrics rows
            self._flush_metrics()
            self.ckp.commit(round_no - 1, self._versions(), self._ckp_extra(fetched))
        else:
            self._flush_metrics()
        self._prof_mark(round_no, "final_metrics_flush", _tf)
        return {"rounds": round_no - 1, "fetched": fetched}

    def _ckp_extra(self, fetched: int) -> dict:
        """Per-round checkpoint extras: progress counters plus the
        bloom_hrw shard-id set (growth state — rollback must replay it)."""
        return {
            "fetched": fetched,
            "pending_mode": getattr(self, "_pending_mode", "table"),
            "pending_est": self._pending_est,
            "retries_est": self._retries_est,
            "seen_est": getattr(self, "_seen_est", 0),
            "hrw_ids": getattr(self, "_hrw_ids", None),
        }

    def _versions(self) -> dict[str, int]:
        return {
            "frontier": self.frontier_tbl.current_version(),
            "url_seen": self.seen_tbl.current_version(),
            "pages": self.pages_tbl.current_version(),
            "metrics": self.metrics_tbl.current_version(),
            "blooms": self.bloom_tbl.current_version(),
            "redirects": self.redirects_tbl.current_version(),
            "pending": self.pending_tbl.current_version(),
            "retries": self.retries_tbl.current_version(),
            "digests": self.digests_tbl.current_version(),
            "revisit_digests": self.revdig_tbl.current_version(),
        }

    METRICS_FLUSH_ROUNDS = 8

    def compact_state(self, target_bytes: int | None = None,
                      min_files: int = 8) -> dict[str, int]:
        """Bin-pack small files in the append-mode state tables (frontier
        log, pages, url_seen, metrics, redirects). Overwrite-mode tables
        (pending, blooms) are replaced wholesale each commit and are
        already size-coalesced, so they are left alone. Safe at any point
        between rounds: content is unchanged and each compact manifest
        carries the pre-compact delta forward, so delta reads, delta-mode
        pending, and checkpoint-rollback resume stay exact (tested)."""
        out: dict[str, int] = {}
        for name, tbl in (("frontier", self.frontier_tbl), ("pages", self.pages_tbl),
                          ("url_seen", self.seen_tbl), ("metrics", self.metrics_tbl),
                          ("redirects", self.redirects_tbl), ("digests", self.digests_tbl)):
            v = tbl.compact(self.spark, target_bytes=target_bytes, min_files=min_files)
            if v is not None:
                out[name] = v
        return out

    def expire_state_snapshots(self) -> dict[str, dict]:
        """Iceberg expire_snapshots over the engine tables, retaining
        everything from the last durable checkpoint forward (resume rolls
        back to it, never earlier). Reclaims the superseded pre-compaction
        small files once a newer checkpoint no longer pins them."""
        ck = self.ckp.latest()
        if ck is None:
            return {}
        out: dict[str, dict] = {}
        for name, tbl in (("frontier", self.frontier_tbl), ("url_seen", self.seen_tbl),
                          ("pages", self.pages_tbl), ("metrics", self.metrics_tbl),
                          ("blooms", self.bloom_tbl), ("redirects", self.redirects_tbl),
                          ("pending", self.pending_tbl), ("retries", self.retries_tbl),
                          ("digests", self.digests_tbl),
                          ("revisit_digests", self.revdig_tbl)):
            keep = ck["versions"].get(name)
            if keep:
                out[name] = tbl.expire_snapshots(keep)
        return out

    # ------------------------------------------------------------------ #
    # Freshness loop (queries/schedops.recrawl_schedule → engine) and the
    # F10 TTL-deletion path the cuckoo sidecar exists for. Both are
    # maintenance ops BETWEEN runs, like compact_state: they re-commit the
    # checkpoint so SIGKILL-at-any-point resume semantics are preserved.
    def reopen(self, due: DataFrame) -> int:
        """Re-enqueue already-crawled URLs for RE-FETCH without
        forgetting them — the consumer for ``recrawl_schedule``'s
        hot/warm buckets. Discovery metadata (depth/score/path/parent)
        rides along unchanged, so ranking and politeness treat the
        revisit like the original visit; the URL-seen set is untouched,
        so the re-fetched page's outlinks still dedup against history
        and only NEWLY-ADDED links enter the frontier.

        After ``reopen``, ``run(resume=True)`` dispatches the reopened
        rows and appends one new resolved row per URL to the pages log
        (the log is a fetch LOG — fetch_round/rank distinguish
        generations, so ``pages(resolved=True)`` returns one row per
        visit, not per URL). Mechanics: ordered modes union the rows
        into the pending snapshot (no frontier-log append); sweep mode
        — whose selection IS the log's latest delta — appends them as a
        re-dispatch delta and flips the ``REOPEN_FLAG`` so
        ``url_seen()`` first-discovery-dedupes from then on. URLs with
        a pending transient retry are already scheduled and are left to
        the retry path.

        ``due``: DataFrame with a ``url`` column (canonicalized here).
        Returns the number of URLs re-enqueued (0 if none matched the
        crawl history). NB: the round counter persists across resume —
        a crawl that ended by exhausting max_rounds (or max_pages)
        needs those caps raised on the resuming engine's config or the
        revisit rounds never run."""
        spark = self.spark
        ck = self.ckp.latest()
        if ck is None:
            raise ValueError("reopen() requires a checkpointed crawl — run() first")
        log = self.frontier_tbl.read(spark)
        if log is None:
            return 0
        want = due.select(
            canonicalize("url", self.cfg.strip_params).alias("url")).distinct()
        hist = log.join(F.broadcast(want), "url", "left_semi")
        # one row per url (the log may already carry re-dispatch rows):
        # first-discovery metadata wins, deterministically
        rest = [c for c in FRONTIER_COLS if c != "url"]
        rows = (hist.groupBy("url")
                .agg(F.min_by(F.struct(*rest), F.col("discovered_round")).alias("_s"))
                .select("url", "_s.*").select(*FRONTIER_COLS))
        rsnap = self.retries_tbl.read(spark)
        if rsnap is not None:
            # a URL with a pending transient retry is already scheduled —
            # the retry path owns it (reopening it too would start a
            # second attempt chain and double-fetch)
            rows = rows.join(F.broadcast(rsnap.select("url").distinct()),
                             "url", "left_anti")
        # pending must be read BEFORE any frontier commit (delta-mode
        # pending and the sweep selection both alias the log's latest
        # delta files)
        if self._sweep_mode():
            pend = self._read_delta(self.frontier_tbl)
        else:
            pend = (self._read_delta(self.frontier_tbl)
                    if ck.get("pending_mode") == "delta"
                    else self.pending_tbl.read(spark))
        if pend is not None:
            pend = pend.select(*FRONTIER_COLS)
            # already-pending URLs will be fetched anyway — reopening
            # them would double-dispatch within one round
            rows = rows.join(pend.select("url"), "url", "left_anti")
        n = rows.count()
        if n == 0:
            return 0
        if self.cfg.conditional_fetch:
            # Snapshot each reopened URL's latest successfully-fetched
            # content digest — the validator the re-fetch revalidates
            # against (HTTP If-None-Match model). Fetched rows only: a
            # prior not_modified/transient generation carries no body, so
            # the newest body-bearing row is the validator, and its
            # digest still matching means 304 again. Column-pruned read
            # of the pages log when the crawl materialized _dig;
            # recomputed from spans for the due-sized slice otherwise.
            # Overwrite keeps entries for urls NOT in this reopen (their
            # retry chains may still be draining).
            pg = self.pages_tbl.read(spark)
            if pg is not None:
                dig = (F.col("_dig") if "_dig" in pg.columns
                       else self._content_digest())
                prev = (pg.where(F.col("status") == "fetched")
                        .join(F.broadcast(rows.select("url")),
                              "url", "left_semi")
                        .select("url", "rank", dig.alias("_d"))
                        .groupBy("url")
                        .agg(F.max_by("_d", F.col("rank")).alias("prev_dig")))
                old = self.revdig_tbl.read(spark)
                if old is not None:
                    prev = prev.unionByName(
                        old.join(prev.select("url"), "url", "left_anti"))
                self.revdig_tbl.overwrite(prev)
        if self._sweep_mode():
            # sweep selection reads ONLY the latest delta: the new delta
            # must be (reopened ∪ still-undispatched old delta) or a
            # truncated crawl's pending links would be silently dropped
            # (they live in the log = seen set, so never rediscovered).
            # Old-delta rows get a second log row; the REOPEN_FLAG makes
            # url_seen() first-discovery-dedupe from here on.
            nxt = rows if pend is None else rows.unionByName(pend)
            self.frontier_tbl.append(nxt)
            with open(os.path.join(self.state_dir, REOPEN_FLAG), "w") as fh:
                fh.write("1")
            extra = {"fetched": ck["fetched"],
                     "pending_mode": ck.get("pending_mode", "table"),
                     "pending_est": ck.get("pending_est", 0)}
        else:
            nxt = rows if pend is None else pend.unionByName(rows)
            self.pending_tbl.overwrite(nxt)
            extra = {"fetched": ck["fetched"], "pending_mode": "table",
                     "pending_est": ck.get("pending_est", 0) + n}
        extra["retries_est"] = ck.get("retries_est", 0)
        self.ckp.commit(ck["round"], self._versions(), extra)
        return n

    def forget(self, urls: DataFrame) -> int:
        """Delete URLs from the URL-seen set — the TTL/recrawl deletion
        path the cuckoo sidecar exists for (config: cuckoo "supports
        deletion (recrawl/TTL)"). The URLs leave the frontier log, the
        robots-blocked table, the pending snapshot, the retry snapshot,
        and the sidecar — cuckoo: per-fingerprint bucket/stash deletion,
        no rebuild; bloom: full rebuild from the surviving seen set
        (bitsets cannot delete) — so later rounds RE-DISCOVER them
        through links as if never seen (fresh depth/score/rank at
        rediscovery). The pages log keeps history; the redirects log is
        an observation log and is left alone. Returns the number of
        distinct URLs removed from the seen set.

        Scale shape: the log rewrite is one anti-join against a
        broadcast removal set (TTL batches are small relative to the
        log) — the same O(log) pass a compaction pays; the cuckoo
        sidecar update cogroups only the removal hashes per shard."""
        spark = self.spark
        ck = self.ckp.latest()
        if ck is None:
            raise ValueError("forget() requires a checkpointed crawl — run() first")
        want = urls.select(
            canonicalize("url", self.cfg.strip_params).alias("url")).distinct()
        log = self.frontier_tbl.read(spark)
        blocked = self.seen_tbl.read(spark)
        pool = None if log is None else log.select("url", "url_hash")
        if blocked is not None:
            b = blocked.select("url", "url_hash")
            pool = b if pool is None else pool.unionByName(b)
        if pool is None:
            return 0
        removals = pool.join(F.broadcast(want), "url", "left_semi").distinct()
        n = removals.count()
        if n == 0:
            return 0
        # the log's latest delta is live state — sweep selection reads it
        # and delta-mode pending aliases it — so it must be read BEFORE
        # the overwrite and re-appended (minus removals) afterwards, or a
        # truncated sweep's pending links would strand: the overwrite's
        # whole file set would otherwise become "the delta" (re-dispatching
        # the entire log), and a zero-row delta would drop the pending work.
        old_delta = self._read_delta(self.frontier_tbl)
        pend = (old_delta if ck.get("pending_mode") == "delta"
                else self.pending_tbl.read(spark))
        if log is not None:
            surviving = None
            base = log.join(F.broadcast(want), "url", "left_anti")
            if old_delta is not None:
                old_delta = old_delta.select(*FRONTIER_COLS)
                surviving = old_delta.join(F.broadcast(want), "url", "left_anti")
                # move the delta rows out of the base so re-appending them
                # keeps log content exactly (log ∖ removals), no dup rows
                base = base.join(old_delta.select("url").distinct(),
                                 "url", "left_anti")
            self.frontier_tbl.overwrite(base.select(*FRONTIER_COLS))
            self.frontier_tbl.append(
                surviving if surviving is not None
                else log.where(F.lit(False)).select(*FRONTIER_COLS))
        if blocked is not None:
            self.seen_tbl.overwrite(
                blocked.join(F.broadcast(want), "url", "left_anti"))
        pending_est = 0
        if pend is not None:
            pobs = Observation()
            pend = pend.select(*FRONTIER_COLS).join(
                F.broadcast(want), "url", "left_anti")
            self.pending_tbl.overwrite(
                pend.observe(pobs, F.count(F.lit(1)).alias("n")))
            pending_est = int(pobs.get["n"])
        retries_est = ck.get("retries_est", 0)
        r = self.retries_tbl.read(spark)
        if r is not None:
            robs = Observation()
            r2 = r.join(F.broadcast(want), "url", "left_anti")
            self.retries_tbl.overwrite(
                r2.observe(robs, F.count(F.lit(1)).alias("n")).coalesce(1))
            retries_est = int(robs.get["n"])
        rv = self.revdig_tbl.read(spark)
        if rv is not None:
            # a forgotten URL re-discovered later is a FIRST fetch again —
            # its stale revalidation entry must not 304 it
            self.revdig_tbl.overwrite(
                rv.join(F.broadcast(want), "url", "left_anti"))
        kind = self._sidecar_kind()
        if kind == "cuckoo":
            shards = self.bloom_tbl.read(spark)
            if shards is not None:
                self.bloom_tbl.overwrite(cuckoo_delete(
                    shards, removals, hash_col="url_hash",
                    n_shards=self.cfg.bloom_shards,
                    n_buckets=self.cfg.cuckoo_buckets))
        elif kind == "bloom":
            src = self.frontier_tbl.read(spark)
            if src is not None:
                src = src.select("url", "url_hash")
            b2 = self.seen_tbl.read(spark)
            if b2 is not None:
                b2 = b2.select("url", "url_hash")
                src = b2 if src is None else src.unionByName(b2)
            if src is not None:
                self.bloom_tbl.overwrite(self._sidecar_build(src))
        self.ckp.commit(ck["round"], self._versions(), {
            "fetched": ck["fetched"], "pending_mode": "table",
            "pending_est": pending_est, "retries_est": retries_est})
        return n

    def _prof_mark(self, round_no: int, stage: str, t0: float) -> None:
        """Per-stage wall timings, printed when SPARK_GRAFT_PROFILE=1 —
        the feedback loop for ordered-mode throughput work."""
        if os.environ.get("SPARK_GRAFT_PROFILE"):
            print(f"PROF r{round_no} {stage}: {time.monotonic() - t0:.3f}s", flush=True)

    def _flush_metrics(self) -> None:
        if not self._metrics_parts:
            return
        flat = self._metrics_parts[0]
        for m in self._metrics_parts[1:]:
            flat = flat.unionByName(m)
        self.metrics_tbl.append(flat)
        self._metrics_parts = []

    # ------------------------------------------------------------------ #
    def _read_delta(self, tbl: SnapshotTable) -> DataFrame | None:
        """Read only the files added by the latest commit (write-then-read
        keeps each round's lineage flat — the parquet round-trip IS the
        checkpoint, no .cache()/unpersist bookkeeping). None if the last
        commit added no files (e.g. an empty append)."""
        delta = tbl.latest_delta_files()
        if not delta:
            return None
        return tbl.read_files(self.spark, delta)

    # ------------------------------------------------------------------ #
    def _versions_at(self, as_of_round: int) -> dict[str, int]:
        """Table versions pinned by round ``as_of_round``'s checkpoint —
        the engine-level time-travel resolver. Raises with the available
        rounds when that round never checkpointed; reading a version
        whose snapshot was expired (compact_state + expire) raises from
        the table layer — expired history is gone by design."""
        ck = self.ckp.at_round(as_of_round)
        if ck is None:
            raise ValueError(
                f"no checkpoint for round {as_of_round}; "
                f"available rounds: {self.ckp.rounds()}")
        return ck["versions"]

    def pages(self, resolved: bool = False,
              as_of_round: int | None = None) -> DataFrame | None:
        """The fetch log. With retries enabled it also carries the
        transient attempts (status='transient', null spans, same rank as
        the eventual resolution); ``resolved=True`` filters to the final
        row per VISIT — what a no-retry crawl's pages table looks like.
        A ``reopen()`` recrawl appends one further resolved row per
        revisit (fetch_round/rank distinguish generations).
        Caveat: a run truncated by max_pages/max_rounds while retries
        were pending leaves those URLs transient-only in the log, so
        ``resolved=True`` drops them entirely (see CrawlConfig.max_retries
        docstring); resuming with a higher cap drains them.
        ``as_of_round`` time-travels: the log as of that round's durable
        checkpoint (Iceberg snapshot-read analog)."""
        v = (None if as_of_round is None
             else self._versions_at(as_of_round)["pages"])
        df = self.pages_tbl.read(self.spark, v)
        if df is not None and "_dig" in df.columns:
            # engine-internal content-seen digest — not part of the
            # public pages surface (schema-stable across content_dedup)
            df = df.drop("_dig")
        if df is None or not resolved:
            return df
        return df.where(F.col("status") != "transient")

    def url_seen(self, as_of_round: int | None = None) -> DataFrame | None:
        """The deduplicated URL-seen set, derived: the append-only
        frontier log IS the seen set in every mode (state 'frontier'),
        plus robots-blocked rows materialized in seen_tbl — one fewer
        write job per round than materializing seen rows redundantly.
        ``as_of_round`` time-travels both underlying tables to the
        round's checkpointed versions."""
        vs = None if as_of_round is None else self._versions_at(as_of_round)
        base = self.seen_tbl.read(
            self.spark, None if vs is None else vs["url_seen"])
        fr = self.frontier_tbl.read(
            self.spark, None if vs is None else vs["frontier"])
        derived = None
        if fr is not None:
            derived = fr.select(
                "url", "url_hash",
                F.col("discovered_round").alias("first_round"),
                F.lit("frontier").alias("state"),
            )
            if os.path.exists(os.path.join(self.state_dir, REOPEN_FLAG)):
                # sweep-mode reopen() appends re-dispatch rows to the
                # log; first discovery wins in the seen view. Guarded by
                # the flag so the normal path (log unique by url) never
                # pays the dedup exchange.
                derived = (derived.groupBy("url", "url_hash", "state")
                           .agg(F.min("first_round").alias("first_round"))
                           .select("url", "url_hash", "first_round", "state"))
        if base is None:
            return derived
        return base if derived is None else derived.unionByName(base)

    def metrics(self, as_of_round: int | None = None) -> DataFrame | None:
        v = (None if as_of_round is None
             else self._versions_at(as_of_round)["metrics"])
        return self.metrics_tbl.read(self.spark, v)

    def redirects_resolved(self) -> DataFrame | None:
        """F12: observed redirect mappings — redirects(src_url, src_hash,
        dst_url, dst_hash, observed_round), seen-set keyed on dst."""
        return self.redirects_tbl.read(self.spark)

    def fsck(self) -> DataFrame:
        """State-table integrity audit — the operational check a 100 TB
        crawl runs before trusting a resumed state dir (storage-level
        Iceberg manifests guarantee files exist; THIS guarantees the
        tables still satisfy the engine's cross-table invariants after
        any mix of kills, resumes, reopens and compactions):

        - ``pages_url_in_seen``      every fetched/attempted URL is in
                                     the seen set (F10's contract — a
                                     miss means double-fetch exposure)
        - ``resolved_rank_unique``   crawl order is a total order: no
                                     two resolved rows share a rank
        - ``page_host_matches_url``  pages.host is derived state; a
                                     mismatch breaks every politeness
                                     and budget rollup keyed on it
        - ``transient_unresolved``   ranks whose rows are transient-only
                                     (expected 0 on a drained crawl;
                                     > 0 flags the documented
                                     max_pages/max_rounds truncation)
        - ``frontier_hash_unique``   the append-only log never
                                     re-discovers a URL within a round
                                     generation
        - ``frontier_hash_consistent`` stored url_hash equals the hash
                                     recomputed from the stored
                                     canonical URL (bit-rot / foreign-
                                     writer detector)
        - ``pending_subset_of_frontier`` the snapshot-mode pending
                                     derivation only ever narrows the
                                     log

        Each check is one anti-join / distinct-count over a state
        table — a handful of bounded jobs, no driver-side row data.
        Returns (check, n_violations); a clean state dir is all zeros.
        """
        spark = self.spark
        checks: list[tuple[str, int]] = []
        pages = self.pages()
        seen = self.url_seen()
        fr = self.frontier_tbl.read(spark)
        pend = self.pending_tbl.read(spark)
        if pages is not None and seen is not None:
            checks.append((
                "pages_url_in_seen",
                pages.select("url_hash").distinct()
                .join(seen.select("url_hash").distinct(),
                      "url_hash", "left_anti").count()))
        if pages is not None:
            res = pages.where(F.col("status") != "transient")
            checks.append((
                "resolved_rank_unique",
                res.count() - res.select("rank").distinct().count()))
            checks.append((
                "page_host_matches_url",
                res.where(url_host(F.col("url")) != F.col("host")).count()))
            checks.append((
                "transient_unresolved",
                pages.groupBy("rank").agg(
                    F.max((F.col("status") != "transient").cast("int"))
                    .alias("_r")).where(F.col("_r") == 0).count()))
        if fr is not None:
            checks.append((
                "frontier_hash_unique",
                fr.count()
                - fr.select("url_hash", "discovered_round")
                    .distinct().count()))
            strip = self.cfg.strip_params
            checks.append((
                "frontier_hash_consistent",
                fr.where(url_hash(canonicalize(F.col("url"), strip))
                         != F.col("url_hash")).count()))
        if pend is not None and fr is not None:
            checks.append((
                "pending_subset_of_frontier",
                pend.select("url_hash")
                .join(fr.select("url_hash").distinct(),
                      "url_hash", "left_anti").count()))
        return spark.createDataFrame(
            checks, "check string, n_violations long")
