"""Crawl job configuration (the engine's declarative "query").

Mirrors the reference's CrawlConfig surface
(/root/reference/crawl_agent.py:23-183) reduced to the fields that
change engine *semantics* (strategy, depth/page caps, external/social
filters, politeness, robots). Rendering/browser knobs of the reference
(JS hooks, lazy-load, sessions — /root/reference/crawl_agent.py:699-781)
have no Spark analog and are modeled as fetch-simulation parameters of
the synthetic corpus; they are intentionally NOT silently accepted here.

Strategy resolution quirks reproduced:
* best_first withOUT an AI agent silently falls back to BFS
  (/root/reference/crawl_agent.py:607-615) — ``resolve_strategy``.
* the "AI analyze" path always lands on the default strategy (the
  reference's regex parser NameErrors and falls back —
  /root/reference/ai_agent.py:149,172-174) → default CrawlStrategy =
  (depth 2, pages 10, bfs) — our defaults.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SOCIAL_DOMAINS = [
    "facebook.com", "twitter.com", "x.com", "instagram.com", "linkedin.com",
    "tiktok.com", "youtube.com", "pinterest.com", "reddit.com",
]


@dataclass
class CrawlConfig:
    seeds: list[str] = field(default_factory=list)
    strategy: str = "bfs"             # bfs | dfs | best_first
    max_depth: int = 2                # reference default (crawl_agent.py:59)
    max_pages: int = 10               # reference default (crawl_agent.py:60)
    include_external: bool = False
    query: str = ""                   # best-first scorer terms (F5)
    scorer: str = "contextual"        # contextual (F5) | keyword (F6)
    score_keywords: list[str] = field(default_factory=list)  # F6 keyword list
    # Deep-crawl score threshold (reference original-README.md:510
    # "Score Thresholds: Filter URLs based on relevance scores"): links
    # scoring below the threshold are dropped at extraction — never
    # enqueued, never in the seen set. None = keep all (default).
    score_threshold: float | None = None
    politeness: bool = False          # per-host per-round budgets (hosts table)
    # F8 pacing: with politeness on and NO explicit host_budgets table,
    # a robots frame carrying crawl_delay derives budgets as
    # round_period_s / crawl_delay (see CrawlEngine.__init__). None =
    # never derive (explicit budgets or unbounded).
    round_period_s: float | None = None
    # Politeness grouping key: "host" (default — one budget per hostname)
    # or "domain" (PSL registrable domain, functions.urls.registrable_
    # domain): subdomain-sharded sites (img1…img9.example.com) share ONE
    # budget instead of multiplying it, multi-tenant suffixes
    # (*.github.io) correctly do NOT fold. In domain mode the
    # host_budgets table's ``host`` column carries DOMAIN values;
    # robots-derived budgets (round_period_s) roll up per domain with
    # min(budget) — the most conservative member host paces the whole
    # registrant.
    politeness_key: str = "host"
    politeness_salts: int = 1         # >1: split hot-host budget across salts (scale mode)
    # Adaptive salting (skew handling): when set, a host's budget is
    # split across ceil(budget / salt_min_grants) salt queues, capped at
    # politeness_salts — hot hosts keep their parallel queues (no
    # single-queue sort straggler at 10^10-frontier scale) while
    # long-tail hosts collapse to ONE queue and get their budget
    # EXACTLY (fixed per-queue ceil(budget/salts) over-grants up to
    # salts-1 extra fetches on small-budget hosts). None = fixed salts.
    salt_min_grants: int | None = None
    respect_robots: bool = True
    exclude_social: bool = False
    exclude_domains: list[str] = field(default_factory=list)
    # Spider-trap URL guards (every production crawler carries these —
    # calendar pages, session-id mirrors and redirect loops mint
    # ever-longer URLs that a template trap map only catches after the
    # fact): links whose canonical URL exceeds max_url_length octets or
    # whose path has more than max_path_segments '/'-segments are
    # dropped pre-enqueue (never fetched, never "seen" — same contract
    # as score_threshold). None = no guard. Map-side filters before the
    # dedup exchange; the sequential oracle mirrors both.
    max_url_length: int | None = None
    max_path_segments: int | None = None
    # DUST feedback (queries/crawlops.dust_params is the learner):
    # query-parameter names stripped during URL canonicalization — the
    # content-irrelevant params (session ids, click trackers) whose
    # aliases would otherwise multiply the frontier. Applied everywhere
    # the engine canonicalizes (seeds, discovered links, reopen/forget
    # inputs), so aliases fold in the URL-seen set; a URL whose every
    # param is stripped folds onto its bare path.
    strip_params: tuple[str, ...] | None = None
    round_size: int | None = None     # fetches per round; 1 = sequential conformance
    # track_order=True assigns exact global crawl ranks (off = throughput
    # mode). Scale guard: dfs/best_first with track_order and NO
    # max_pages/round_size raises ValueError at run time — an unbounded
    # global rank for those strategies is inherently a serial sort (BFS
    # gets depth-block ranks instead); set round_size or max_pages.
    track_order: bool = True
    max_rounds: int = 1000
    use_ai_agent: bool = False        # needed for best_first (see resolve_strategy)
    # U5 fetch-simulation: the reference's enable_lazy_loading browser
    # option (crawl_agent.py:699-781) has no Spark analog; over a
    # VirtualCorpus it deterministically exposes extra trailing spans on
    # lazy pages (see fixtures.spans_for_index(lazy=...)). Ignored for
    # DataFrame corpora (stored spans are what they are).
    enable_lazy_loading: bool = False
    # U5 multi-step sessions: the reference's multi_step_enabled /
    # multi_step_js_actions / multi_step_wait_conditions (crawl_agent.py:
    # 147-150,691-692; examples/multi_step_interaction.py — scroll,
    # click "More", wait for items, repeat). In the batch fetch-sim the
    # ONLY observable effect of k JS actions is more revealed content, so
    # the knob is the step COUNT: each step deterministically extends the
    # span array (strict prefix-extension; a per-(doc, step) die models
    # the step's wait_for timing out and revealing nothing — the session
    # still proceeds, as the reference's arun does). Ignored for
    # DataFrame corpora. See fixtures.spans_for_index(steps=...).
    multi_step_actions: int = 0
    # U5 wait_for channels (crawl_agent.py:127 — "CSS selector or JS
    # expression to wait for (prefix with 'css:' or 'js:')"): the fetch-
    # sim models the two prefixes as DISTINCT deterministic channels
    # instead of one per-step die. "css:<sel>" waits on page STRUCTURE —
    # the page either has the selector's target or it never will, so the
    # die is per-DOC (a doc whose structure satisfies the selector
    # reveals at every step; one that lacks it times out every step).
    # "js:<expr>" waits on page BEHAVIOR — scripts race per interaction,
    # so the die is per-(doc, step, expr). "" keeps the legacy
    # per-(doc, step) die. See fixtures.spans_for_index(wait_for=...).
    multi_step_wait_for: str = ""
    # U5 JS hook program (crawl_agent.py:136-138,699-728): the reference
    # composes auth_hook_js / pre_request_hook_js / js_code /
    # post_request_hook_js (+ a lazy-loading script) into ONE js_code
    # string with ";\n" joins, in a specific order — pre PREPENDS, post
    # APPENDS, auth PREPENDS LAST (so it ends up outermost-first), lazy
    # appends after everything. compose_js_hooks() reproduces that
    # byte-exactly; the conformance test pins the order.
    js_code: str = ""
    auth_hook_js: str = ""
    pre_request_hook_js: str = ""
    post_request_hook_js: str = ""
    # Anti-starvation aging for best_first: a pending URL's effective
    # priority grows by age_boost per round it waits (score + age_boost ×
    # (round − discovered_round)), so a page a static scorer ranks low is
    # still fetched in bounded time — at a 10^10-URL frontier a purely
    # static priority starves the tail forever. None (default) keeps the
    # reference's static ordering (oracle-conformant); the boosted order
    # remains deterministic (same tiebreaks on the boosted key).
    age_boost: float | None = None
    # Content-seen dedup (Heritrix's content-digest "duplicate detection"
    # / IRLbot's content-seen test): a fetched page whose span-content
    # digest was already EXTRACTED by an earlier-ranked page contributes
    # no outlinks — the explode/canonicalize/redirect/dedup pipeline is
    # skipped for mirror copies (session-id aliases, print views, cross-
    # host mirrors; 25-30% of real crawls). The page itself is still
    # fetched/logged/indexed. Result-INVARIANT by construction: identical
    # content ⇒ identical link set, so suppression is exact iff the
    # earlier extraction was at depth ≤ this page's depth (its links
    # passed every depth gate the later copy's would) and, with
    # include_external=False, on the same host (the internal-only filter
    # keys on the parent host). The engine enforces exactly that rule —
    # digest = xxhash64(spans [, host]); suppress iff an earlier-rank,
    # shallower-or-equal extraction of the same digest exists (history
    # min-depth table + in-batch running-min window) — so pages/seen/
    # order are byte-identical to content_dedup=False (tested per
    # strategy). Digest min-depths checkpoint per round (resume-exact).
    content_dedup: bool = False
    # Conditional re-fetch (HTTP 304 model) for reopen() revisits: a
    # re-dispatched URL whose span-content digest is UNCHANGED since its
    # last successful fetch logs status='not_modified' with null spans
    # (no body came over the wire — the prior generation's row carries
    # the content) and contributes no outlinks (extraction gates on
    # status='fetched'), exactly an If-None-Match revalidation hit. The
    # digest compare is the sandbox stand-in for the server's ETag
    # validator. reopen() snapshots each due URL's latest fetched digest
    # into an overwrite-mode revisit_digests state table (broadcast-
    # sized: one row per due URL), so the per-round cost is one
    # broadcast left-join on the batch — first fetches and fresh crawls
    # are byte-identical to conditional_fetch=False (no revisits ⇒ the
    # table never matches). Changed pages fetch normally; their new
    # outlinks still dedup against the URL-seen set. queries/crawlops
    # revisit_304 is the analytics twin (bandwidth saved per host).
    conditional_fetch: bool = False
    use_bloom: bool = False           # Bloom-sidecar prefilter for the seen-set anti-join
    bloom_shards: int = 16
    bloom_bits: int = 1 << 23         # bits per shard (1 MiB)
    bloom_k: int = 7
    # Which maybe-seen sidecar fronts the exact anti-join (north rule:
    # "partitioned Bloom/cuckoo URL-seen filter"): None → exact join
    # only (or "bloom" when use_bloom=True, back-compat); "cuckoo" →
    # 4-slot/16-bit-fingerprint cuckoo tables (operators/cuckoo.py) —
    # supports deletion (recrawl/TTL) and lower fpp per byte. Both
    # shard by pmod(url_hash, bloom_shards). "bloom_hrw" → Bloom shards
    # addressed by rendezvous hashing (growable: see sidecar_grow_at).
    seen_sidecar: str | None = None
    # bloom_hrw only: when the tracked seen-set estimate exceeds
    # grow_at × n_shards, DOUBLE the shard set mid-crawl. HRW addressing
    # makes growth incremental — only the new shards' bitsets are built
    # (a key's winner never moves between surviving shards), old bitsets
    # stay byte-identical, and the grown set persists via the round
    # checkpoint so rollback/resume replays it exactly. None = fixed set.
    sidecar_grow_at: int | None = None
    cuckoo_buckets: int = 1 << 15     # buckets/shard (× 4 slots × 2 B = 256 KiB)
    # Iceberg-style state maintenance: every N rounds (after the round's
    # checkpoint) bin-pack small data files in the engine tables
    # (SnapshotTable.compact). Long crawls accrue one small file group
    # per round; the seen-set / pending scans then re-open every footer
    # each round — file count, not bytes, dominates small-state I/O.
    # Compaction preserves delta reads (the manifest carries the
    # pre-compact delta) so resume and delta-mode pending stay exact.
    auto_compact_every: int | None = None
    # Retry/backoff for TRANSIENT fetch failures (timeouts, 5xx): a
    # failed attempt is durably logged in pages (status='transient') and
    # re-dispatched after an exponential round backoff
    # (due_round = round + retry_backoff_base**(attempt-1)), reusing its
    # ORIGINAL crawl rank (crawl order = dispatch order; the retry is
    # the same dispatch resolving late). attempt is capped at
    # max_retries+1 — a DISPATCHED final attempt always resolves
    # (transient means transient). Truncation caveat: if max_pages or
    # max_rounds is exhausted while retries are still pending, the run
    # ends with those URLs unresolved — their pages rows are
    # transient-only (pages(resolved=True) drops them) and run()'s
    # fetched count still includes their first dispatch; resume() the
    # run with a higher cap to drain them (the retry snapshot persists).
    # max_retries=0 disables the whole path (no schema or
    # plan change for existing crawls beyond the constant attempt=1
    # column on pages). The fetch SIM rolls a deterministic per-
    # (url, attempt) die: transient iff pmod(xxhash64(url#attempt),
    # retry_failure_every)==0 — a real deployment replaces the die with
    # the HTTP fetcher's error class, everything else is identical.
    max_retries: int = 0
    retry_failure_every: int = 0      # 0 = fetch sim never fails transiently
    retry_backoff_base: int = 2

    def __post_init__(self) -> None:
        # every consumer dispatches on == "domain": a typo would silently
        # degrade to per-host politeness, so fail loudly instead
        if self.politeness_key not in ("host", "domain"):
            raise ValueError(
                f"politeness_key must be 'host' or 'domain', got "
                f"{self.politeness_key!r}")
        if self.seen_sidecar not in (None, "bloom", "cuckoo", "bloom_hrw"):
            raise ValueError(
                f"seen_sidecar must be None, 'bloom', 'cuckoo' or "
                f"'bloom_hrw', got {self.seen_sidecar!r}")
        if self.sidecar_grow_at is not None and self.seen_sidecar != "bloom_hrw":
            raise ValueError(
                "sidecar_grow_at requires seen_sidecar='bloom_hrw' — "
                "modulo-addressed sidecars cannot grow without a full "
                "rebuild (growth moves keys between surviving shards)")
        w = self.multi_step_wait_for
        if w and not (w.startswith("css:") or w.startswith("js:")):
            # the reference treats an unprefixed wait_for as a raw value
            # passed to the browser layer; here the two channels have
            # DIFFERENT deterministic semantics, so an unprefixed value
            # would silently pick one — fail loudly instead
            raise ValueError(
                "multi_step_wait_for must be '' or start with 'css:' or "
                f"'js:' (crawl_agent.py:127), got {w!r}")


def compose_js_hooks(cfg: CrawlConfig, lazy_load_js: str = "") -> str:
    """The effective js_code string, composed EXACTLY as the reference
    does (crawl_agent.py:699-728): each configured hook wraps the
    running string with ``";\\n"`` joins —

        1. pre_request_hook_js  PREPENDS:  pre ;\\n base
        2. post_request_hook_js APPENDS:   ... ;\\n post
        3. auth_hook_js         PREPENDS:  auth ;\\n ...   (outermost-first)
        4. lazy-loading script  APPENDS:   ... ;\\n lazy

    The order is observable (auth runs before pre even though pre is
    applied first) and joins fire even around empty strings, exactly as
    the reference's ``existing_js or ""`` concatenations do."""
    js = cfg.js_code or ""
    if cfg.pre_request_hook_js:
        js = cfg.pre_request_hook_js + ";\n" + js
    if cfg.post_request_hook_js:
        js = js + ";\n" + cfg.post_request_hook_js
    if cfg.auth_hook_js:
        js = cfg.auth_hook_js + ";\n" + js
    if cfg.enable_lazy_loading and lazy_load_js:
        js = js + ";\n" + lazy_load_js
    return js


def resolve_strategy(cfg: CrawlConfig) -> str:
    s = cfg.strategy.lower()
    if s not in ("bfs", "dfs", "best_first"):
        return "bfs"
    if s == "best_first" and not cfg.use_ai_agent:
        return "bfs"  # reference fallback, crawl_agent.py:607-615
    return s
