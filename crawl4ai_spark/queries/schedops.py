"""Crawl-scheduling analytics (round-3 tier): trap detection, freshness-
driven recrawl priority, and yield-proportional host budget allocation.

These are the control-loop queries a production frontier runs BETWEEN
crawl rounds — the reference's deep-crawl strategies pick the next page
(crawl_agent.py BFS/best-first config); at 10^10-URL scale the scheduler
additionally needs to (a) stop feeding infinite URL spaces, (b) decide
when to REVISIT a page, and (c) turn observed per-host yield into the
next round's politeness budgets:

- ``crawl_traps``      — URL-template trap detection: canonical paths are
  templated (digit runs → ``{d}``, long hex tokens → ``{h}``), and a
  (host, template) class is flagged when it owns an outsized share of
  the host's distinct URLs while being parameter-rich (≥2 placeholders)
  — the calendar-page / session-id signature. Pure column exprs + two
  hash aggs; the host-total join is a broadcast (hosts are a tiny dim).
- ``recrawl_schedule`` — Cho–Garcia-Molina-style freshness scheduling:
  per URL, a change-rate estimate λ = changes/observations from the
  fetch-observation log and a staleness clock since the last visit;
  revisit priority = λ · staleness_hours, bucketed hot/warm/cold. All
  timestamp math in exact integer seconds (unix_timestamp second-floor,
  the house events-window convention); the global clock is a 1-row agg
  broadcast, not a single-partition window.
- ``host_budget_alloc`` — next-round politeness budgets proportional to
  observed host yield (docs clearing the content-length gate), clamped
  to [MIN, MAX], with the adaptive salt count (ceil(budget/PER_SALT))
  the politeness-salting stage would use (operators/frontier.py's
  budget-proportional salt queues). Integer arithmetic end to end.

Oracle determinism follows crawlops.py: integer µs timestamps, explicit
rounding, identical IEEE double operation order in both dialects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.urls import canonicalize, url_hash, url_host
from .registry import query, table as _t

# --------------------------------------------------------------------------- #
# crawl_traps — URL-template trap detection
# --------------------------------------------------------------------------- #
# Synthetic URL universe (doc_id % 10 class die): half the universe is
# calendar-shaped (two numeric path params, heavy collisions), the rest
# spread over article/tag/print/session/about shapes.
TRAP_MIN_SHARE = 0.25   # template owns ≥25% of the host's distinct URLs
TRAP_MIN_PARAMS = 2     # and is parameter-rich (≥2 templated tokens)

_TRAP_PATH_SQL = """
    (CASE
        WHEN doc_id % 10 < 5 THEN
            '/cal/' || (2000 + doc_id % 9)::VARCHAR || '/' || (1 + doc_id % 12)::VARCHAR
        WHEN doc_id % 10 = 5 THEN '/article/' || doc_id::VARCHAR
        WHEN doc_id % 10 = 6 THEN '/tag/' || source
        WHEN doc_id % 10 = 7 THEN '/p/' || doc_id::VARCHAR || '/print'
        WHEN doc_id % 10 = 8 THEN '/session/' || substr(md5(doc_id::VARCHAR), 1, 12)
        ELSE '/about'
    END)
"""


def _trap_path(i: F.Column, source: F.Column) -> F.Column:
    cls = F.pmod(i, F.lit(10))
    return (
        F.when(cls < 5, F.concat(
            F.lit("/cal/"), (F.lit(2000) + F.pmod(i, F.lit(9))).cast("string"),
            F.lit("/"), (F.lit(1) + F.pmod(i, F.lit(12))).cast("string")))
        .when(cls == 5, F.concat(F.lit("/article/"), i.cast("string")))
        .when(cls == 6, F.concat(F.lit("/tag/"), source))
        .when(cls == 7, F.concat(F.lit("/p/"), i.cast("string"), F.lit("/print")))
        .when(cls == 8, F.concat(
            F.lit("/session/"), F.substring(F.md5(i.cast("string")), 1, 12)))
        .otherwise(F.lit("/about"))
    )


@query(
    "crawl_traps",
    f"""
    WITH urls AS (
        SELECT DISTINCT
               'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               'https://host' || (doc_id % 7)::VARCHAR || '.example.com'
                   || {_TRAP_PATH_SQL} AS url,
               regexp_replace(regexp_replace({_TRAP_PATH_SQL},
                   '[0-9a-f]{{8,}}', '{{h}}', 'g'), '[0-9]+', '{{d}}', 'g') AS template
        FROM documents
    ),
    per_tpl AS (
        SELECT host, template,
               count(DISTINCT url)::BIGINT AS n_urls,
               ((length(template) - length(replace(template, '{{', ''))))::INT AS n_params
        FROM urls GROUP BY host, template
    )
    SELECT host, template, n_urls, n_params,
           sum(n_urls) OVER (PARTITION BY host)::BIGINT AS host_total,
           round(n_urls::DOUBLE / sum(n_urls) OVER (PARTITION BY host), 4) AS share,
           (n_urls::DOUBLE / sum(n_urls) OVER (PARTITION BY host) >= {TRAP_MIN_SHARE}
            AND n_params >= {TRAP_MIN_PARAMS}) AS is_trap
    FROM per_tpl
    """,
)
def q_crawl_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag (host, path-template) classes that look like crawler traps.

    Scale shape: template derivation is pure string exprs (codegen); the
    distinct + groupBy are two hash aggs keyed (host, template) — partial
    map-side combine makes the shuffle carry one row per class, and the
    host-total is a window over the already-tiny class table (one row
    per host × template, bounded by the template vocabulary, NOT by URL
    count — safe at 10^10 URLs)."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    path = _trap_path(i, F.col("source"))
    host = F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                    F.lit(".example.com"))
    tpl = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{h}"), r"[0-9]+", "{d}")
    urls = d.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("url"),
        tpl.alias("template"),
    ).distinct()
    per_tpl = urls.groupBy("host", "template").agg(
        F.countDistinct("url").alias("n_urls"))
    # placeholders each contribute one '{' — computed from the group KEY
    n_params = (
        F.length("template")
        - F.length(F.replace(F.col("template"), F.lit("{"), F.lit("")))
    ).cast("int")
    w = Window.partitionBy("host")
    share_raw = F.col("n_urls").cast("double") / F.sum("n_urls").over(w)
    return per_tpl.withColumn("n_params", n_params).select(
        "host", "template", F.col("n_urls").cast("long").alias("n_urls"), "n_params",
        F.sum("n_urls").over(w).cast("long").alias("host_total"),
        F.round(share_raw, 4).alias("share"),
        ((share_raw >= F.lit(TRAP_MIN_SHARE))
         & (F.col("n_params") >= F.lit(TRAP_MIN_PARAMS))).alias("is_trap"),
    )


# --------------------------------------------------------------------------- #
# recrawl_schedule — freshness-driven revisit priority
# --------------------------------------------------------------------------- #
HOT_MIN = 3.0      # priority thresholds (λ · staleness_hours)
WARM_MIN = 0.75


@query(
    "recrawl_schedule",
    """
    WITH obs AS (
        -- floor(epoch(..)) matches Spark's unix_timestamp() second-floor
        SELECT 'https://host' || (user_id % 7)::VARCHAR || '.example.com/p/'
                   || user_id::VARCHAR AS url,
               floor(epoch(ts))::BIGINT AS ts_s,
               (CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS changed
        FROM events
    ),
    clock AS (SELECT max(ts_s) AS now_s FROM obs),
    per_url AS (
        SELECT url, count(*)::BIGINT AS n_obs, sum(changed)::BIGINT AS n_changed,
               max(ts_s) AS last_s
        FROM obs GROUP BY url
    )
    SELECT url, n_obs, n_changed,
           round(n_changed::DOUBLE / n_obs, 6) AS change_rate,
           (now_s - last_s)::BIGINT AS staleness_s,
           round((n_changed::DOUBLE / n_obs)
                 * ((now_s - last_s)::DOUBLE / 3600.0), 6) AS priority,
           (CASE WHEN (n_changed::DOUBLE / n_obs)
                      * ((now_s - last_s)::DOUBLE / 3600.0) >= 3.0 THEN 'hot'
                 WHEN (n_changed::DOUBLE / n_obs)
                      * ((now_s - last_s)::DOUBLE / 3600.0) >= 0.75 THEN 'warm'
                 ELSE 'cold' END) AS bucket
    FROM per_url, clock
    """,
)
def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL revisit priority: λ · staleness (Cho & Garcia-Molina's
    uniform-allocation surrogate over an estimated Poisson change rate).

    The observation log (here: events rows keyed to a URL) reduces with
    ONE hash agg (map-side combine); the global clock joins back as a
    1-row broadcast — no single-partition window, no second shuffle.
    Timestamp math is exact integer microseconds; the only doubles are
    the final ratio/product, computed with the same operation order in
    both engines."""
    e = _t(spark, sf_dir, "events")
    u = F.col("user_id").cast("long")
    obs = e.select(
        F.concat(F.lit("https://host"), F.pmod(u, F.lit(7)).cast("string"),
                 F.lit(".example.com/p/"), u.cast("string")).alias("url"),
        F.unix_timestamp(F.col("ts")).alias("ts_s"),
        F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(0)).alias("changed"),
    )
    per_url = obs.groupBy("url").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum("changed").cast("long").alias("n_changed"),
        F.max("ts_s").alias("last_s"),
    )
    clock = obs.agg(F.max("ts_s").alias("now_s"))
    lam = F.col("n_changed").cast("double") / F.col("n_obs")
    stale_h = (F.col("now_s") - F.col("last_s")).cast("double") / 3600.0
    prio_raw = lam * stale_h
    return per_url.crossJoin(F.broadcast(clock)).select(
        "url", "n_obs", "n_changed",
        F.round(lam, 6).alias("change_rate"),
        (F.col("now_s") - F.col("last_s")).cast("long").alias("staleness_s"),
        F.round(prio_raw, 6).alias("priority"),
        F.when(prio_raw >= F.lit(HOT_MIN), F.lit("hot"))
        .when(prio_raw >= F.lit(WARM_MIN), F.lit("warm"))
        .otherwise(F.lit("cold")).alias("bucket"),
    )


# --------------------------------------------------------------------------- #
# host_budget_alloc — yield-proportional politeness budgets
# --------------------------------------------------------------------------- #
TOTAL_BUDGET = 10_000
BUDGET_MIN, BUDGET_MAX = 50, 3_000
PER_SALT = 500          # one salt queue per 500 granted fetches
YIELD_MIN_CHARS = 300   # a doc "yields" if it clears the content gate


@query(
    "host_budget_alloc",
    f"""
    WITH per_host AS (
        SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               count(*)::BIGINT AS n_pages,
               sum(CASE WHEN n_chars >= {YIELD_MIN_CHARS} THEN 1 ELSE 0 END)::BIGINT AS yield_docs
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT greatest(1, sum(yield_docs)) AS total_yield FROM per_host),
    alloc AS (
        SELECT host, n_pages, yield_docs,
               greatest({BUDGET_MIN}, least({BUDGET_MAX},
                   ({TOTAL_BUDGET} * yield_docs) // total_yield))::INT AS budget
        FROM per_host, tot
    )
    SELECT host, n_pages, yield_docs, budget,
           ((budget + {PER_SALT - 1}) // {PER_SALT})::INT AS salts
    FROM alloc
    """,
)
def q_host_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-round per-host budgets ∝ observed yield, clamped, plus the
    salt-queue count the adaptive politeness stage would spin up.

    One hash agg per host + a 1-row broadcast total; the division is
    integer floor (exact cross-engine), never a float share. At 10^10
    URLs the per-host table is bounded by the host vocabulary —
    millions, not billions — and the whole query stays two stages."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    per_host = d.groupBy(
        F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com")).alias("host")
    ).agg(
        F.count("*").cast("long").alias("n_pages"),
        F.sum(F.when(F.col("n_chars") >= YIELD_MIN_CHARS, 1).otherwise(0))
        .cast("long").alias("yield_docs"),
    )
    # greatest(1, ...) zero guard (ADVICE r3): if no document clears the
    # gate, div 0 is NULL in Spark but errors/diverges in DuckDB — guard
    # both sides identically (matches host_budgets_from_yield below)
    tot = per_host.agg(
        F.greatest(F.lit(1), F.sum("yield_docs")).alias("total_yield"))
    budget = F.greatest(
        F.lit(BUDGET_MIN),
        F.least(F.lit(BUDGET_MAX),
                F.expr(f"({TOTAL_BUDGET} * yield_docs) div total_yield")),
    ).cast("int")
    return (
        per_host.crossJoin(F.broadcast(tot))
        .withColumn("budget", budget)
        .select(
            "host", "n_pages", "yield_docs", "budget",
            F.expr(f"cast((budget + {PER_SALT - 1}) div {PER_SALT} as int)").alias("salts"),
        )
    )


def host_budgets_from_yield(pages: DataFrame,
                            total_budget: int = TOTAL_BUDGET,
                            budget_min: int = BUDGET_MIN,
                            budget_max: int = BUDGET_MAX,
                            min_spans: int = 3) -> DataFrame:
    """Engine-side twin of ``host_budget_alloc``: turn an OBSERVED crawl's
    pages table into the next run's politeness budgets — yield is the
    count of fetched pages clearing a span-count gate, budget is the
    clamped integer-floor share of ``total_budget``. The output feeds
    straight into ``CrawlEngine(host_budgets=...)``, closing the
    crawl → measure → allocate → crawl control loop the same way
    ``trap_templates`` closes the trap loop.

    One hash agg keyed by host + a 1-row broadcast total — bounded by
    the host vocabulary at any corpus scale."""
    per_host = (
        pages.where(F.col("status") == "fetched")
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.sum(F.when(F.size("spans") >= min_spans, 1).otherwise(0))
            .cast("long").alias("yield_docs"),
        )
    )
    tot = per_host.agg(
        F.greatest(F.lit(1), F.sum("yield_docs")).alias("total_yield"))
    budget = F.greatest(
        F.lit(budget_min),
        F.least(F.lit(budget_max),
                F.expr(f"({total_budget} * yield_docs) div total_yield")),
    ).cast("int")
    return (
        per_host.crossJoin(F.broadcast(tot))
        .withColumn("budget", budget)
        .select("host", "n_pages", "yield_docs", "budget")
    )


def host_budgets_from_rank(host_rank: DataFrame,
                           total_budget: int = TOTAL_BUDGET,
                           budget_min: int = BUDGET_MIN,
                           budget_max: int = BUDGET_MAX) -> DataFrame:
    """Authority-driven twin of ``host_budgets_from_yield``: turn host
    PageRank (graphops.host_pagerank — url is the host name, rank its
    authority share) into politeness budgets, so discovered cross-host
    structure steers the frontier the same way observed yield does.
    Rank is already a share (sums to <= 1), so budget is the clamped
    integer floor of ``total_budget * rank``; fixed-point scaling (1e9)
    keeps the division integer-exact and order-free.

    Bounded by the host vocabulary at any scale: the host graph is
    ~6 orders smaller than the page graph, and this is one projection
    over it — no shuffle at all."""
    scaled = (F.col("rank") * F.lit(1_000_000_000)).cast("long")
    budget = F.greatest(
        F.lit(budget_min).cast("long"),
        F.least(F.lit(budget_max).cast("long"),
                F.expr(f"({total_budget} * _rank_fp) div 1000000000")),
    ).cast("int")
    return host_rank.withColumn("_rank_fp", scaled).select(
        F.col("url").alias("host"),
        F.col("rank"),
        budget.alias("budget"),
    )


def host_budgets_from_errors(pages: DataFrame, base: DataFrame,
                             err_cap_pct: int = 80) -> DataFrame:
    """Error-feedback twin of ``host_budgets_from_yield`` — the third
    leg of the control loop (yield→budget, authority→budget, and now
    errors→budget): a host whose fetches keep timing out gets its next
    run's politeness budget decayed by its observed transient rate
    (backing off a struggling origin is what politeness is FOR; the
    per-round retry debit handles the current run, this handles the
    next). budget = base * (100 - min(err_pct, cap)) / 100 in pure
    integer arithmetic (order-free, cross-engine exact), floored at 1.

    Every BASE host survives: a host with no attempts this run (not
    reached, or throttled out entirely) keeps its base budget at zero
    error — an inner join here would silently drop it from the output
    and the next run's engine would treat it as unbudgeted (unbounded).

    One hash agg keyed by host + a broadcast join against the base
    budgets — bounded by the host vocabulary at any corpus scale."""
    per_host = pages.groupBy("host").agg(
        F.count("*").cast("long").alias("n_attempts"),
        F.sum(F.when(F.col("status") == "transient", 1).otherwise(0))
        .cast("long").alias("n_transient"),
    )
    err_pct = F.expr("(CASE WHEN n_attempts = 0 THEN 0 "
                     "ELSE (100 * n_transient) div n_attempts END)")
    decayed = F.expr(
        f"greatest(1, (budget * (100 - least(_err_pct, {int(err_cap_pct)}))) div 100)")
    return (
        base.select("host", F.col("budget").cast("long"))
        .join(F.broadcast(per_host), "host", "left")
        .withColumn("n_attempts", F.coalesce("n_attempts", F.lit(0)).cast("long"))
        .withColumn("n_transient", F.coalesce("n_transient", F.lit(0)).cast("long"))
        .withColumn("_err_pct", err_pct)
        .select(
            "host", "n_attempts", "n_transient",
            F.col("_err_pct").cast("int").alias("err_pct"),
            decayed.cast("int").alias("budget"),
        )
    )


def host_budgets_from_304(pages: DataFrame, base: DataFrame,
                          fresh_cap_pct: int = 80) -> DataFrame:
    """Freshness-feedback twin of ``host_budgets_from_errors`` — the
    revisit-economics control leg: a host whose conditional re-fetches
    (``CrawlConfig(conditional_fetch=True)``) keep coming back
    ``not_modified`` changes rarely, so spending next run's revisit
    budget there buys no new bytes (Cho & Garcia-Molina's freshness
    argument, applied as a budget decay; ``revisit_304`` is the
    bandwidth-accounting query twin). budget = base * (100 -
    min(fresh_pct, cap)) / 100 in pure integer arithmetic, floored at
    1; hosts with no resolved revisits keep their base (no evidence ⇒
    no decay), and every base host survives the left join.

    Revisit detection needs no generation column: per host,
    n_revisits = (resolved rows) − (distinct urls with a resolved row)
    — every resolved row beyond a url's first is a revisit — and only
    revisits can log not_modified at all, so fresh_pct =
    100·n_304/n_revisits. One hash agg keyed by host + a broadcast
    join against the base budgets, bounded by the host vocabulary."""
    resolved = F.col("status") != "transient"
    per_host = pages.groupBy("host").agg(
        (F.sum(resolved.cast("long"))
         - F.count_distinct(F.when(resolved, F.col("url"))))
        .cast("long").alias("n_revisits"),
        F.sum((F.col("status") == "not_modified").cast("long"))
        .cast("long").alias("n_304"),
    )
    fresh_pct = F.expr("(CASE WHEN n_revisits = 0 THEN 0 "
                       "ELSE (100 * n_304) div n_revisits END)")
    decayed = F.expr(
        f"greatest(1, (budget * (100 - least(_fresh_pct, "
        f"{int(fresh_cap_pct)}))) div 100)")
    return (
        base.select("host", F.col("budget").cast("long"))
        .join(F.broadcast(per_host), "host", "left")
        .withColumn("n_revisits", F.coalesce("n_revisits", F.lit(0)).cast("long"))
        .withColumn("n_304", F.coalesce("n_304", F.lit(0)).cast("long"))
        .withColumn("_fresh_pct", fresh_pct)
        .select(
            "host", "n_revisits", "n_304",
            F.col("_fresh_pct").cast("int").alias("fresh_pct"),
            decayed.cast("int").alias("budget"),
        )
    )


def host_budgets_from_bytes(pages: DataFrame, base: DataFrame,
                            byte_target: int,
                            nbytes_col: str | None = None,
                            pctl: int | None = None) -> DataFrame:
    """Bandwidth-ceiling leg — the SEVENTH control leg (yield,
    authority, errors, growth, language, revisit-economics, and now
    BYTES): politeness budgets count URLs, but the resource a crawl
    actually rations is bandwidth — a host serving 1 MB pages costs
    50× a host serving 20 KB pages at the same URL grant (Mercator
    budgeted hosts in bytes for exactly this reason). Per host,
    avg_bytes = total_payload div n_fetched over this generation's
    fetched pages (payload surrogate: Σ octet_length of span texts —
    the engine's pages carry extracted spans, not raw bodies; pass
    ``nbytes_col`` when a real byte count column exists, e.g. from
    http_headers_parse or a WARC sidecar). The next grant is CAPPED at
    the URL count whose expected bytes fit ``byte_target``:

        budget = greatest(1, least(base, byte_target div avg_bytes))

    in pure integer arithmetic (order-free, cross-engine exact). A
    ceiling, never a raise: light hosts keep their base, heavy hosts
    decay toward byte_target/avg_bytes. Hosts with no fetched evidence
    — or zero observed bytes — keep their base (no evidence ⇒ no cap),
    and every base host survives the left join.

    ``pctl`` swaps the mean for a per-host TAIL quantile (e.g. 90):
    avg_bytes becomes the exact p{pctl} by explicit integer rank
    selection — the ``host_payload_quantiles`` arithmetic — so hosts
    whose payload distribution is skewed (one 2 MB page among 20 KB
    pages) are capped on what a bad round can actually cost, not on a
    mean the tail dwarfs. Costs one per-host window sort (spillable,
    bounded by the host's page count) instead of the plain agg.

    One host-keyed hash agg (the span fold is a map-side array HOF —
    blobs never shuffle) + a broadcast join against the host-vocabulary
    base. ``host_budget_bytes`` is the oracle-certified query twin."""
    if byte_target <= 0:
        raise ValueError("byte_target must be a positive byte count")
    if pctl is not None and not 1 <= int(pctl) <= 100:
        raise ValueError("pctl must be in [1, 100]")
    if nbytes_col is None:
        nb = F.aggregate(
            F.coalesce(F.col("spans"), F.array()),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.octet_length(F.coalesce(s["text"], F.lit(""))).cast("long"),
        )
    else:
        nb = F.col(nbytes_col).cast("long")
    fetched = (pages.where(F.col("status") == "fetched")
               .select("host", nb.alias("_nb")))
    if pctl is None:
        per_host = fetched.groupBy("host").agg(
            F.count("*").cast("long").alias("n_fetched"),
            F.sum("_nb").cast("long").alias("total_bytes"),
        )
        avg_b = F.expr("(CASE WHEN n_fetched = 0 THEN 0 "
                       "ELSE total_bytes div n_fetched END)")
    else:
        from pyspark.sql import Window
        wv = Window.partitionBy("host").orderBy("_nb")
        wn = Window.partitionBy("host")
        ranked = fetched.select(
            "host", "_nb",
            F.row_number().over(wv).alias("_rn"),
            F.count(F.lit(1)).over(wn).alias("_n"),
        )
        per_host = ranked.groupBy("host").agg(
            F.max("_n").cast("long").alias("n_fetched"),
            F.sum("_nb").cast("long").alias("total_bytes"),
            F.max(F.when(
                F.col("_rn") == F.expr(f"({int(pctl)} * _n + 99) div 100"),
                F.col("_nb"))).cast("long").alias("_pv"),
        )
        avg_b = F.expr("coalesce(_pv, 0)")
    capped = F.expr(
        f"greatest(1, (CASE WHEN _avg = 0 THEN budget "
        f"ELSE least(budget, greatest(1, {int(byte_target)} div _avg)) END))")
    return (
        base.select("host", F.col("budget").cast("long"))
        .join(F.broadcast(per_host), "host", "left")
        .withColumn("n_fetched", F.coalesce("n_fetched", F.lit(0)).cast("long"))
        .withColumn("total_bytes",
                    F.coalesce("total_bytes", F.lit(0)).cast("long"))
        .withColumn("_avg", avg_b)
        .select(
            "host", "n_fetched", "total_bytes",
            F.col("_avg").cast("long").alias("avg_bytes"),
            capped.cast("int").alias("budget"),
        )
    )


def host_budgets_from_novelty(pages: DataFrame, frontier: DataFrame,
                              base: DataFrame,
                              floor_pct: int = 20,
                              cfg=None) -> DataFrame:
    """Saturation-feedback twin of ``host_budgets_from_yield`` — the
    fourth control-loop leg (yield, authority, errors, and now frontier
    GROWTH): a host whose extraction work keeps re-finding URLs the
    crawl already knows has been crawled out, and further politeness
    grants there buy no new frontier (the ``frontier_novelty`` query is
    the offline twin of this signal; IRLbot keys queue admission off
    the same ratio). budget = base · max(novelty_pct, floor_pct) / 100
    in pure integer arithmetic, floored at 1 — saturated hosts decay
    toward floor_pct, still-growing hosts keep their base.

    Novelty here is DISCOVERY PER EXTRACTION, not "share of outlinks in
    the seen set" (the cumulative seen set absorbs every extracted
    outlink the same round it is extracted, so that ratio is ~0 for any
    host the moment its first round ends): per TARGET host, n_new =
    frontier rows with discovered_round ≥ 1 (every non-seed first
    discovery) and n_out = Σ over rounds of that round's DISTINCT
    followable extracted targets. Re-extracting a known URL in a later
    round inflates n_out but never n_new — exactly the wasted work that
    defines saturation — so a fresh crawl reads 100 and a drained one
    decays toward its re-link density. n_new ≤ n_out by construction
    (a first discovery is also that round's distinct extraction).
    ``frontier`` is the engine's frontier log
    (``eng.frontier_tbl.read(spark)``: url_hash, host,
    discovered_round).

    A host with NO extraction evidence keeps its base budget: zero
    evidence is not saturation (depth-capped, throttled out, or newly
    budgeted), mirroring the errors leg's no-attempts rule. Pass the
    crawl's ``cfg`` so only FOLLOWABLE outlinks count (gates the
    engine's include_external / exclude_social / exclude_domains would
    drop can never grow the frontier).

    Scale shape: one explode + a (round, host, hash) distinct + two
    host-keyed hash aggs + broadcast joins against the host-vocabulary
    base — no windows, bounded output at any corpus size."""
    from .. import config as _cfgmod

    strip = getattr(cfg, "strip_params", None) if cfg is not None else None
    canon = canonicalize(F.col("_s.media_ref"), strip)
    links = (
        pages.where(F.col("status") == "fetched")
        .select("host", "fetch_round", F.explode("spans").alias("_s"))
        .where(F.col("_s.kind") == "link")
        .select("host", "fetch_round", canon.alias("_u"))
        .withColumn("_lh", url_host(F.col("_u")))
    )
    if cfg is not None:
        if not cfg.include_external:
            links = links.where(F.col("_lh") == F.col("host"))
        if cfg.exclude_social:
            soc = "|".join(d.replace(".", r"\.")
                           for d in _cfgmod.SOCIAL_DOMAINS)
            links = links.where(~F.col("_lh").rlike(f"(^|\\.)({soc})$"))
        if cfg.exclude_domains:
            links = links.where(~F.col("_lh").isin(cfg.exclude_domains))
    per_host = (
        links.select("fetch_round", F.col("_lh").alias("host"),
                     url_hash(F.col("_u")).alias("_h"))
        .distinct()
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_out"))
    )
    grown = (
        frontier.where(F.col("discovered_round") >= 1)
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_new"))
    )
    nov_pct = F.expr("(CASE WHEN n_out = 0 THEN 100 "
                     "ELSE (100 * least(n_new, n_out)) div n_out END)")
    decayed = F.expr(
        f"greatest(1, (budget * greatest(_nov_pct, {int(floor_pct)})) div 100)")
    return (
        base.select("host", F.col("budget").cast("long"))
        .join(F.broadcast(per_host), "host", "left")
        .join(F.broadcast(grown), "host", "left")
        .withColumn("n_out", F.coalesce("n_out", F.lit(0)).cast("long"))
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)).cast("long"))
        .withColumn("_nov_pct", nov_pct)
        .select(
            "host", "n_out", "n_new",
            F.col("_nov_pct").cast("int").alias("novelty_pct"),
            decayed.cast("int").alias("budget"),
        )
    )


# --------------------------------------------------------------------------- #
# snapshot_diff / host_change_rates — cross-generation crawl diff
# --------------------------------------------------------------------------- #
# Two deterministic crawl generations derived from the documents table
# (the same class-die style as _TRAP_PATH_SQL): generation A misses the
# doc_id%13 slice (pages NEW in B), generation B misses the doc_id%17
# slice (pages REMOVED since A), and the doc_id%10<3 slice changed
# content between generations (fingerprint mismatch). The diff is the
# analytic that DECIDES what reopen()/recrawl_schedule revisit.
_DIFF_SQL = """
    gen_a AS (
        SELECT doc_id, md5(text) AS fp
        FROM documents WHERE doc_id % 13 <> 0
    ),
    gen_b AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 10 < 3 THEN md5(text || '#v2')
                     ELSE md5(text) END) AS fp
        FROM documents WHERE doc_id % 17 <> 0
    ),
    diff AS (
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
               (CASE WHEN a.doc_id IS NULL THEN 'added'
                     WHEN b.doc_id IS NULL THEN 'removed'
                     WHEN a.fp <> b.fp THEN 'changed'
                     ELSE 'stable' END) AS status
        FROM gen_a a FULL OUTER JOIN gen_b b ON a.doc_id = b.doc_id
    )
"""


def _diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # explicit presence markers: membership must come from the join
    # sides, not fingerprint nullability (md5(NULL text) is NULL and
    # would misread a present-in-both page as added/removed — the
    # oracle keys membership on the join column)
    a = d.where(F.pmod(F.col("doc_id"), F.lit(13)) != 0).select(
        "doc_id", F.md5("text").alias("fp_a"), F.lit(True).alias("in_a"))
    b = d.where(F.pmod(F.col("doc_id"), F.lit(17)) != 0).select(
        "doc_id",
        F.when(F.pmod(F.col("doc_id"), F.lit(10)) < 3,
               F.md5(F.concat(F.col("text"), F.lit("#v2"))))
        .otherwise(F.md5("text")).alias("fp_b"),
        F.lit(True).alias("in_b"))
    j = a.join(b, "doc_id", "full_outer")
    return j.select(
        F.col("doc_id"),
        F.when(F.col("in_a").isNull(), F.lit("added"))
        .when(F.col("in_b").isNull(), F.lit("removed"))
        .when(~F.col("fp_a").eqNullSafe(F.col("fp_b")), F.lit("changed"))
        .otherwise(F.lit("stable")).alias("status"),
    )


@query(
    "snapshot_diff",
    f"""
    WITH {_DIFF_SQL}
    SELECT 'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/'
               || doc_id::VARCHAR AS url,
           'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
           status
    FROM diff
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL diff between two crawl generations (added / removed /
    changed / stable by content fingerprint) — the incremental-crawl
    analytic that feeds reopen(): 'changed' URLs are re-fetch
    candidates, 'removed' feed forget(). One full-outer hash join
    co-partitioned on the unique URL key (no skew possible); both
    generation scans prune to (doc_id, text)."""
    h = F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    return _diff(spark, sf_dir).select(
        F.concat(F.lit("https://host"), h, F.lit(".example.com/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("host"), h, F.lit(".example.com")).alias("host"),
        "status",
    )


@query(
    "host_change_rates",
    f"""
    WITH {_DIFF_SQL}
    SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
           count(*)::BIGINT AS n_urls,
           sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)::BIGINT AS n_added,
           sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)::BIGINT AS n_removed,
           sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)::BIGINT AS n_changed,
           sum(CASE WHEN status = 'stable' THEN 1 ELSE 0 END)::BIGINT AS n_stable,
           round(sum(CASE WHEN status <> 'stable' THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS churn
    FROM diff GROUP BY 1
    """,
)
def q_host_change_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level churn between crawl generations: the per-host change
    pressure that calibrates recrawl_schedule's λ priors and the
    freshness share of host budgets. One hash agg over the diff (counts
    fold map-side); churn is a single double division, identically
    ordered in both engines."""
    d = _diff(spark, sf_dir)
    host = F.concat(F.lit("host"),
                    F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
                    F.lit(".example.com")).alias("host")
    c = lambda s: F.sum(F.when(F.col("status") == s, 1).otherwise(0)).cast("long")
    return d.select(host, "status").groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"),
        c("added").alias("n_added"),
        c("removed").alias("n_removed"),
        c("changed").alias("n_changed"),
        c("stable").alias("n_stable"),
        F.round(
            F.sum(F.when(F.col("status") != "stable", 1).otherwise(0))
            .cast("double") / F.count("*"), 6).alias("churn"),
    )


# --------------------------------------------------------------------------- #
# host_budget_errors — the errors→budget leg of the scheduling control
# loop as a named query: attempts are synthesized from documents (the
# doc_id%19 slice is transient, ~5% — the bench's retry rate), base
# budgets vary per host, and the decayed budget must match the pure
# integer formula in both engines.
# --------------------------------------------------------------------------- #
@query(
    "host_budget_errors",
    """
    WITH attempts AS (
        SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               (CASE WHEN doc_id % 19 = 0 THEN 'transient' ELSE 'fetched' END) AS status
        FROM documents
    ),
    per_host AS (
        SELECT host, count(*)::BIGINT AS n_attempts,
               sum(CASE WHEN status = 'transient' THEN 1 ELSE 0 END)::BIGINT
                   AS n_transient
        FROM attempts GROUP BY 1
    ),
    base AS (
        SELECT DISTINCT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               (100 + (doc_id % 7) * 50)::BIGINT AS budget
        FROM documents
    )
    SELECT b.host,
           coalesce(p.n_attempts, 0)::BIGINT AS n_attempts,
           coalesce(p.n_transient, 0)::BIGINT AS n_transient,
           (CASE WHEN coalesce(p.n_attempts, 0) = 0 THEN 0
                 ELSE (100 * p.n_transient) // p.n_attempts END)::INT AS err_pct,
           greatest(1, (b.budget * (100 - least(
               CASE WHEN coalesce(p.n_attempts, 0) = 0 THEN 0
                    ELSE (100 * p.n_transient) // p.n_attempts END,
               80))) // 100)::INT AS budget
    FROM base b LEFT JOIN per_host p USING (host)
    """,
)
def q_host_budget_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    host = F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                    F.lit(".example.com"))
    pages = d.select(
        host.alias("host"),
        F.when(F.pmod(i, F.lit(19)) == 0, F.lit("transient"))
        .otherwise(F.lit("fetched")).alias("status"),
    )
    base = d.select(
        host.alias("host"),
        (F.lit(100) + F.pmod(i, F.lit(7)) * 50).cast("long").alias("budget"),
    ).distinct()
    return host_budgets_from_errors(pages, base)


# --------------------------------------------------------------------------- #
# poisson_revisit — bias-corrected change-frequency estimation (Cho &
# Garcia-Molina, "Estimating Frequency of Change", TOIT'03). The naive
# X/n change rate recrawl_schedule uses UNDERESTIMATES λ: several
# changes between two polls are observed as one. The repeated-access
# estimator λ̂ = -ln((n - X + 0.5)/(n + 0.5)) / I corrects the bias and
# stays finite at X = n (a page that changed every poll). From λ̂ the
# scheduler derives the revisit interval that sustains a target
# freshness P(unchanged at revisit) ≥ 0.8: t* = -ln(0.8)/λ̂, capped.
# Pure column arithmetic — one projection, no shuffle at all; ln is
# cross-engine-stable here exactly as in the BM25/DSIR oracles.
# --------------------------------------------------------------------------- #
REVISIT_TARGET_C = 0.2231435513142097   # -ln(0.8), inlined in BOTH dialects
REVISIT_CAP_H = 720.0                   # 30 days: the λ→0 fallback


@query(
    "poisson_revisit",
    f"""
    WITH polls AS (
        SELECT doc_id::BIGINT AS id,
               'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/'
                   || doc_id::VARCHAR AS url,
               (4 + doc_id % 13)::BIGINT AS n_polls,
               (doc_id % (4 + doc_id % 13 + 1))::BIGINT AS n_changed,
               (1 + doc_id % 5)::DOUBLE AS interval_h
        FROM documents
    ),
    est AS (
        SELECT url, n_polls, n_changed, interval_h,
               round(-ln((n_polls - n_changed + 0.5::DOUBLE)
                         / (n_polls + 0.5::DOUBLE)) / interval_h, 9)
                   AS lambda_per_h
        FROM polls
    )
    SELECT url, n_polls, n_changed, interval_h, lambda_per_h,
           round(CASE WHEN lambda_per_h > 0.0
                      THEN least({REVISIT_CAP_H!r}::DOUBLE,
                                 {REVISIT_TARGET_C!r}::DOUBLE / lambda_per_h)
                      ELSE {REVISIT_CAP_H!r}::DOUBLE END, 6) AS revisit_h
    FROM est
    """,
)
def q_poisson_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    n = (F.lit(4) + F.pmod(i, F.lit(13))).cast("long")
    x = F.pmod(i, n + 1).cast("long")
    iv = (F.lit(1) + F.pmod(i, F.lit(5))).cast("double")
    polls = d.select(
        F.concat(F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com/p/"), i.cast("string")).alias("url"),
        n.alias("n_polls"), x.alias("n_changed"), iv.alias("interval_h"))
    lam = F.round(
        -F.log((F.col("n_polls") - F.col("n_changed") + F.lit(0.5))
               / (F.col("n_polls") + F.lit(0.5))) / F.col("interval_h"), 9)
    est = polls.select("url", "n_polls", "n_changed", "interval_h",
                       lam.alias("lambda_per_h"))
    return est.select(
        "url", "n_polls", "n_changed", "interval_h", "lambda_per_h",
        F.round(
            F.when(F.col("lambda_per_h") > 0.0,
                   F.least(F.lit(REVISIT_CAP_H),
                           F.lit(REVISIT_TARGET_C) / F.col("lambda_per_h")))
            .otherwise(F.lit(REVISIT_CAP_H)), 6).alias("revisit_h"))


# --------------------------------------------------------------------------- #
# host_skew_stats — frontier hot-host diagnosis + salting plan
# --------------------------------------------------------------------------- #
# Skewed host assignment: an explicit Zipf-ish die — h0 owns 50% of
# the URL mass, h1 25%, h2/h3 12.5% each — the deterministic stand-in
# for the hot-domain frontier shape the north rule names.
SKEW_PER_SALT = 64      # URLs one politeness salt-queue absorbs per round
SKEW_HOT_SHARE = 0.25   # a host past this share of the frontier is "hot"


@query(
    "host_skew_stats",
    f"""
    WITH urls AS (
        SELECT (CASE WHEN doc_id % 16 < 8 THEN 'h0'
                     WHEN doc_id % 16 < 12 THEN 'h1'
                     WHEN doc_id % 16 < 14 THEN 'h2'
                     ELSE 'h3' END) AS host
        FROM documents
    ),
    per_host AS (
        SELECT host, count(*)::BIGINT AS n_urls FROM urls GROUP BY host
    ),
    tot AS (SELECT sum(n_urls)::BIGINT AS total FROM per_host)
    SELECT host, n_urls,
           round(n_urls::DOUBLE / (SELECT total FROM tot), 9) AS share,
           ((n_urls + {SKEW_PER_SALT} - 1) // {SKEW_PER_SALT})::BIGINT AS n_salts,
           (n_urls::DOUBLE / (SELECT total FROM tot)
                > {SKEW_HOT_SHARE!r}) AS is_hot
    FROM per_host
    """,
)
def q_host_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-host skew diagnosis — the between-rounds report that decides
    the frontier's salting plan (operators/frontier.py's budget-
    proportional salt queues): per host, its share of pending URLs and
    the salt-queue count needed to keep every politeness task under
    SKEW_PER_SALT URLs. At 10^10-frontier scale the host dimension is
    ~6 orders smaller than the URL table, so this is one hash groupBy
    plus a 1-row total broadcast back — never a global window. The
    explicit die concentrates 50% of mass on h0, modeling the
    hot-domain shape the north rule names — is_hot flags exactly the
    hosts whose share justifies extra salt queues."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    m = F.pmod(i, F.lit(16))
    host = (F.when(m < 8, F.lit("h0")).when(m < 12, F.lit("h1"))
            .when(m < 14, F.lit("h2")).otherwise(F.lit("h3")))
    per_host = (
        d.select(host.alias("host"))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_urls"))
    )
    tot = per_host.agg(F.sum("n_urls").cast("long").alias("total"))
    share = F.col("n_urls").cast("double") / F.col("total")
    return (
        per_host.crossJoin(F.broadcast(tot))
        .select(
            "host", "n_urls",
            F.round(share, 9).alias("share"),
            ((F.col("n_urls") + F.lit(SKEW_PER_SALT - 1))
             / F.lit(SKEW_PER_SALT)).cast("long").alias("n_salts"),
            (share > F.lit(SKEW_HOT_SHARE)).alias("is_hot"),
        )
    )


# --------------------------------------------------------------------------- #
# seen_shard_fp — URL-seen Bloom-shard fill / false-positive accounting
# --------------------------------------------------------------------------- #
# The engine's sidecar (operators/seen_filter.py) runs 2^23-bit shards;
# the constants here are scaled down so the sf test corpus exercises the
# whole fill curve (empty → saturated) instead of sitting at fill≈0.
from ..functions import hashing as _H  # noqa: E402  (tier-local import)
# The arithmetic is the same closed form the sizing decision uses at
# 10^10 URLs: fill = 1-(1-1/m)^(kn), fp = fill^k, capacity n_opt =
# ⌊m·ln2/k⌋ (the 50%-fill optimum). ln(1-1/m) and n_opt are evaluated
# in PYTHON and inlined as literals so both engines exponentiate the
# identical double; fp = fill^k is expanded to k explicit
# multiplications (no pow()) so the IEEE operation sequence is
# identical cross-engine.
import math as _math

SEEN_M_BITS = 64
SEEN_K = 3
SEEN_SHARDS = 64
SEEN_FP_BUDGET = 0.01
_SEEN_ALPHA = _math.log(1.0 - 1.0 / SEEN_M_BITS)      # ln(1 - 1/m)
SEEN_N_OPT = int(SEEN_M_BITS * _math.log(2.0) / SEEN_K)  # shard capacity


def _fp_from_fill(fill_expr: str) -> str:
    return "(" + " * ".join([fill_expr] * SEEN_K) + ")"


@query(
    "seen_shard_fp",
    f"""
    WITH urls AS (
        SELECT 'https://host' || (doc_id % 7)::VARCHAR
                   || '.example.com/p/' || doc_id::VARCHAR AS url
        FROM documents
    ),
    sharded AS (
        SELECT {_H.h60_sql('url')} % {SEEN_SHARDS} AS shard FROM urls
    ),
    per_shard AS (
        SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_urls
        FROM sharded GROUP BY shard
    ),
    filled AS (
        SELECT shard, n_urls,
               (1.0::DOUBLE - exp(({SEEN_K} * n_urls)::DOUBLE
                                  * {_SEEN_ALPHA!r}::DOUBLE)) AS fill
        FROM per_shard
    )
    SELECT shard, n_urls,
           round(fill, 9) AS fill_ratio,
           round({_fp_from_fill('fill')}, 9) AS fp_rate,
           ((n_urls + {SEEN_N_OPT} - 1) // {SEEN_N_OPT})::BIGINT AS shards_needed,
           ({_fp_from_fill('fill')} > {SEEN_FP_BUDGET!r}) AS over_budget
    FROM filled
    """,
)
def q_seen_shard_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-seen Bloom-shard accounting — the capacity report that tells
    the dedup tier WHEN to re-shard: per shard, its URL load, fill
    ratio, expected false-positive rate, and the split factor restoring
    the ≤50%-fill optimum. A Bloom false positive here means a URL
    silently never crawled, so the FP budget is a correctness-adjacent
    SLO, not a tuning nicety. Shard assignment is the sidecar's
    hash-mod (portable h60 standing in for the engine's xxhash64 —
    same role, oracle-expressible); one hash groupBy on the shard key,
    closed-form column math after. Scales: the per-shard table is
    O(SEEN_SHARDS) rows regardless of corpus size."""
    from ..functions import hashing as H
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://host"),
        F.pmod(F.col("doc_id").cast("long"), F.lit(7)).cast("string"),
        F.lit(".example.com/p/"), F.col("doc_id").cast("string"))
    per_shard = (
        d.select((H.h60(url) % SEEN_SHARDS).cast("long").alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").cast("long").alias("n_urls"))
    )
    fill = F.lit(1.0) - F.exp(
        (F.lit(SEEN_K) * F.col("n_urls")).cast("double") * F.lit(_SEEN_ALPHA))
    fp = fill
    for _ in range(SEEN_K - 1):
        fp = fp * fill
    return per_shard.select(
        "shard", "n_urls",
        F.round(fill, 9).alias("fill_ratio"),
        F.round(fp, 9).alias("fp_rate"),
        ((F.col("n_urls") + F.lit(SEEN_N_OPT - 1))
         / F.lit(SEEN_N_OPT)).cast("long").alias("shards_needed"),
        (fp > F.lit(SEEN_FP_BUDGET)).alias("over_budget"),
    )


# --------------------------------------------------------------------------- #
# revisit_value — freshness × importance recrawl allocation
# --------------------------------------------------------------------------- #
# Closes the last scheduling loop: poisson_revisit estimates HOW OFTEN a
# page changes, link_pagerank estimates HOW MUCH a page matters — the
# recrawl scheduler needs both (Cho & Garcia-Molina TOIT'03; Edwards et
# al. WWW'01 weight refresh by page value). Expected value of revisiting
# url u within horizon H = importance(u) × P(changed by H) =
# (1 + indegree) × (1 − e^{−λ̂·H}). Revisit slots are allocated PER HOST
# (the politeness budget is per-host, so the contention is per-host):
# top REVISIT_SLOTS by value win the next round's slots.
#
# Scale shape: λ̂ is pure column math; indegree is one hash groupBy on
# dst_url; the join keys on url; the rank window partitions by host —
# bounded by the host's candidate count (the same per-host partitions
# the politeness stage already salts when hot). No global window.
from .spansops import _SP_SQL as _REVISIT_SP_SQL  # noqa: E402 (tier-local)

REVISIT_HORIZON_H = 24.0
REVISIT_SLOTS = 4


@query(
    "revisit_value",
    f"""
    WITH {_REVISIT_SP_SQL},
    links AS (
        SELECT ref AS dst_url FROM spans WHERE kind = 'link'
    ),
    indeg AS (
        SELECT dst_url, count(*)::BIGINT AS n_inlinks FROM links GROUP BY dst_url
    ),
    polls AS (
        SELECT 'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/'
                   || doc_id::VARCHAR AS url,
               'host' || (doc_id % 7)::VARCHAR AS host,
               (4 + doc_id % 13)::BIGINT AS n_polls,
               (doc_id % (4 + doc_id % 13 + 1))::BIGINT AS n_changed,
               (1 + doc_id % 5)::DOUBLE AS interval_h
        FROM documents
    ),
    est AS (
        SELECT p.url, p.host,
               coalesce(i.n_inlinks, 0)::BIGINT AS n_inlinks,
               round(-ln((p.n_polls - p.n_changed + 0.5::DOUBLE)
                         / (p.n_polls + 0.5::DOUBLE)) / p.interval_h, 9)
                   AS lambda_per_h
        FROM polls p LEFT JOIN indeg i ON p.url = i.dst_url
    ),
    valued AS (
        SELECT url, host, n_inlinks, lambda_per_h,
               round(1.0::DOUBLE - exp(-(lambda_per_h * {REVISIT_HORIZON_H!r}::DOUBLE)), 9)
                   AS p_change,
               round((1 + n_inlinks)::DOUBLE
                     * round(1.0::DOUBLE - exp(-(lambda_per_h * {REVISIT_HORIZON_H!r}::DOUBLE)), 9), 9)
                   AS value
        FROM est
    )
    SELECT url, host, n_inlinks, lambda_per_h, p_change, value,
           slot, (slot <= {REVISIT_SLOTS}) AS selected
    FROM (
        SELECT *, row_number() OVER (PARTITION BY host
                                     ORDER BY value DESC, url ASC) AS slot
        FROM valued
    )
    """,
)
def q_revisit_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness×importance recrawl allocation: expected revisit value =
    (1 + indegree) × P(page changed within the horizon), P from the
    bias-corrected Poisson λ̂ (poisson_revisit), indegree from the
    outlink graph (graphops). Per host, the top REVISIT_SLOTS values
    win the next round's politeness slots — the per-URL companion to
    host_budget_alloc's per-host split. The selected set feeds
    eng.reopen exactly like stale_from_sitemap's."""
    from .spansops import _span_docs

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    sd = _span_docs(spark, sf_dir)
    indeg = (
        sd.select(F.explode_outer("spans").alias("s"))
        .where(F.col("s.kind") == "link")
        .groupBy(F.col("s.media_ref").alias("dst_url"))
        .agg(F.count("*").cast("long").alias("n_inlinks"))
    )
    n = (F.lit(4) + F.pmod(i, F.lit(13))).cast("long")
    x = F.pmod(i, n + 1).cast("long")
    iv = (F.lit(1) + F.pmod(i, F.lit(5))).cast("double")
    polls = d.select(
        F.concat(F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com/p/"), i.cast("string")).alias("url"),
        F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string")).alias("host"),
        n.alias("n_polls"), x.alias("n_changed"), iv.alias("interval_h"))
    est = (
        polls.join(indeg, polls.url == indeg.dst_url, "left")
        .select(
            "url", "host",
            F.coalesce(F.col("n_inlinks"), F.lit(0)).cast("long").alias("n_inlinks"),
            F.round(
                -F.log((F.col("n_polls") - F.col("n_changed") + F.lit(0.5))
                       / (F.col("n_polls") + F.lit(0.5))) / F.col("interval_h"),
                9).alias("lambda_per_h"),
        )
    )
    p_change = F.round(
        F.lit(1.0) - F.exp(-(F.col("lambda_per_h") * F.lit(REVISIT_HORIZON_H))), 9)
    valued = est.select(
        "url", "host", "n_inlinks", "lambda_per_h",
        p_change.alias("p_change"),
        F.round((F.lit(1) + F.col("n_inlinks")).cast("double") * p_change,
                9).alias("value"),
    )
    w = Window.partitionBy("host").orderBy(F.col("value").desc(), F.col("url").asc())
    return valued.select(
        "*", F.row_number().over(w).alias("slot")
    ).withColumn("selected", F.col("slot") <= REVISIT_SLOTS)


# --------------------------------------------------------------------------- #
# ip_politeness — vhost→IP shared-budget rollup
# --------------------------------------------------------------------------- #
# Politeness budgets per HOSTNAME under-throttle co-hosted sites: ten
# vhosts on one box each get a full budget and the box takes 10× the
# intended load (Heritrix ships IP-politeness for exactly this). Given
# per-host requested budgets (the yield-proportional ones
# host_budget_alloc emits), roll them up to the resolved IP and, when
# an IP's total request exceeds IP_ROUND_CAP, scale every co-hosted
# host's grant proportionally (integer floor-div — deterministic, never
# over-grants; the ungranted remainder is the next round's headroom).
# Scale shape: two hash aggs (host, then ip) + one broadcast-size join
# back; the IP dimension is smaller than the host dimension.
IP_ROUND_CAP = 60     # fetches per IP per round
IP_N_HOSTS = 21       # synthetic vhost universe
IP_N_ADDRS = 6        # packed onto 6 addresses (3-4 vhosts each)


@query(
    "ip_politeness",
    f"""
    WITH hosts AS (
        SELECT 'host' || (doc_id % {IP_N_HOSTS})::VARCHAR || '.example.com' AS host,
               (doc_id % {IP_N_HOSTS})::BIGINT AS hnum,
               sum((n_chars >= 300)::INT)::BIGINT AS yield_docs
        FROM documents GROUP BY doc_id % {IP_N_HOSTS}
    ),
    req AS (
        SELECT host, hnum,
               '203.0.113.' || (hnum % {IP_N_ADDRS})::VARCHAR AS ip,
               least(64, 4 + yield_docs)::BIGINT AS host_req
        FROM hosts
    ),
    per_ip AS (
        SELECT ip, sum(host_req)::BIGINT AS ip_req_total FROM req GROUP BY ip
    )
    SELECT r.host, r.ip, r.host_req, p.ip_req_total,
           (p.ip_req_total > {IP_ROUND_CAP}) AS capped,
           (CASE WHEN p.ip_req_total > {IP_ROUND_CAP}
                 THEN ({IP_ROUND_CAP} * r.host_req) // p.ip_req_total
                 ELSE r.host_req END)::BIGINT AS granted
    FROM req r JOIN per_ip p ON r.ip = p.ip
    """,
)
def q_ip_politeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP-level politeness rollup: co-hosted vhosts share one address's
    fetch budget. Per host, the requested (yield-derived) budget; per
    IP, the total request; when the total exceeds IP_ROUND_CAP every
    vhost's grant scales by integer proportion (floor-div: Σ granted ≤
    cap, no over-grant). The granted table is CrawlEngine
    host_budgets input — same front door as host_budget_alloc, one
    rollup deeper."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    hosts = (
        d.groupBy(F.pmod(i, F.lit(IP_N_HOSTS)).alias("hnum"))
        .agg(F.sum(F.when(F.col("n_chars") >= 300, 1).otherwise(0))
             .cast("long").alias("yield_docs"))
    )
    req = hosts.select(
        F.concat(F.lit("host"), F.col("hnum").cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.concat(F.lit("203.0.113."),
                 F.pmod(F.col("hnum"), F.lit(IP_N_ADDRS)).cast("string")).alias("ip"),
        F.least(F.lit(64), F.lit(4) + F.col("yield_docs")).cast("long").alias("host_req"),
    )
    per_ip = req.groupBy("ip").agg(
        F.sum("host_req").cast("long").alias("ip_req_total"))
    over = F.col("ip_req_total") > IP_ROUND_CAP
    return (
        req.join(F.broadcast(per_ip), "ip")
        .select(
            "host", "ip", "host_req", "ip_req_total",
            over.alias("capped"),
            F.when(over, F.expr(f"({IP_ROUND_CAP} * host_req) div ip_req_total"))
            .otherwise(F.col("host_req")).cast("long").alias("granted"),
        )
    )


def ip_politeness_inputs(granted: DataFrame,
                         cap: int = IP_ROUND_CAP) -> tuple[DataFrame, DataFrame]:
    """Adapt an ``ip_politeness``-shaped rollup (host, ip, ip_req_total)
    into the two ``CrawlEngine`` inputs of IP-keyed politeness: the
    (host → pkey) ``politeness_map`` and the per-address budget table
    (budget = least(cap, ip_req_total) — an uncapped address keeps its
    aggregate request, a capped one gets exactly the cap; the engine's
    per-key rank-and-limit then enforces the shared grant across the
    address's vhosts). This is the engine-side consumption of the IP
    rollup; the alternative FINER split — per-host ``granted`` budgets
    with NO map — uses the same query output through the existing
    host_budgets front door, but cannot pool unused grants between
    co-hosted vhosts the way the shared key does.

    Both outputs are host-vocabulary-sized (broadcastable at any crawl
    scale); the map dedupes defensively so a grants table carrying
    multiple rows per host cannot fan the budget join out."""
    pmap = granted.select("host", F.col("ip").alias("pkey")).distinct()
    budgets = (
        granted.groupBy(F.col("ip").alias("host"))
        .agg(F.least(F.lit(cap).cast("long"), F.max("ip_req_total"))
             .cast("long").alias("budget"))
    )
    return pmap, budgets


# --------------------------------------------------------------------------- #
# harvest_rate — focused-crawl efficiency curve
# --------------------------------------------------------------------------- #
# The focused-crawl acceptance metric (Chakrabarti et al., WWW'99):
# harvest rate = relevant pages / pages fetched, as a function of crawl
# progress. Best-first drains the frontier in descending scorer-band
# order, so the curve at band boundaries is exact without materializing
# a global crawl order: per band, fetched/relevant counts (one hash
# agg); cumulative sums run over the O(HARVEST_BANDS)-row band table —
# a window over ≤8 rows at ANY corpus size, never over URLs. The
# synthetic die makes true relevance increase with the scorer band
# (P(rel|b) = P(d%7 ≥ 9−2b)), so the curve declines as the crawl digs —
# the canonical focused-crawl shape a flat (band-blind) crawler lacks.
HARVEST_BANDS = 8


@query(
    "harvest_rate",
    f"""
    WITH scored AS (
        SELECT ((doc_id * 13) % {HARVEST_BANDS})::BIGINT AS band,
               ((((doc_id * 13) % {HARVEST_BANDS}) * 2 + doc_id % 7) >= 9)
                   AS relevant
        FROM documents
    ),
    per_band AS (
        SELECT band, count(*)::BIGINT AS fetched,
               sum(relevant::INT)::BIGINT AS n_relevant
        FROM scored GROUP BY band
    )
    SELECT band, fetched, n_relevant,
           sum(fetched) OVER w AS cum_fetched,
           sum(n_relevant) OVER w AS cum_relevant,
           round((sum(n_relevant) OVER w)::DOUBLE
                 / (sum(fetched) OVER w), 9) AS harvest
    FROM per_band
    WINDOW w AS (ORDER BY band DESC ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    """,
)
def q_harvest_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focused-crawl harvest curve: cumulative relevant/fetched ratio as
    best-first drains scorer bands high→low. The per-URL pass is one
    hash groupBy on the band; the cumulative window runs over the
    HARVEST_BANDS-row aggregate only (scale-free). Read: harvest at
    band b = crawl efficiency if the crawler stops after draining
    bands ≥ b — where the curve crosses the operator's floor is the
    score_threshold to set (CrawlConfig.score_threshold)."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    band = F.pmod(i * 13, F.lit(HARVEST_BANDS)).cast("long")
    scored = d.select(
        band.alias("band"),
        ((band * 2 + F.pmod(i, F.lit(7))) >= 9).alias("relevant"))
    per_band = scored.groupBy("band").agg(
        F.count("*").cast("long").alias("fetched"),
        F.sum(F.col("relevant").cast("int")).cast("long").alias("n_relevant"))
    w = (Window.orderBy(F.col("band").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return per_band.select(
        "band", "fetched", "n_relevant",
        F.sum("fetched").over(w).alias("cum_fetched"),
        F.sum("n_relevant").over(w).alias("cum_relevant"),
        F.round(F.sum("n_relevant").over(w).cast("double")
                / F.sum("fetched").over(w), 9).alias("harvest"),
    )


# --------------------------------------------------------------------------- #
# refresh_policy_compare — uniform vs proportional refresh allocation
# --------------------------------------------------------------------------- #
# Cho & Garcia-Molina ("Effective Page Refresh Policies for Web
# Crawlers", TODS'03): given per-page change rates λ_i and a fixed total
# refresh budget R, time-averaged freshness under periodic refresh at
# rate f is F(λ,f) = (f/λ)(1 − e^{−λ/f}). The counterintuitive classic:
# allocating f_i ∝ λ_i ("refresh what changes most") LOSES to uniform
# f_i = R/N, because hopeless fast-changers soak budget that uniform
# spends keeping slow-changers perfectly fresh. This query computes
# corpus freshness under both policies from the poisson_revisit λ̂s.
#
# Determinism at scale: per-page freshness is scaled to int64
# (round(F·1e9)) so the corpus sum is an integer — associative,
# order-free, exact under any partitioning (the embed_centroid
# fixed-point trick); the only doubles cross the engine boundary
# pre-rounded at 9. Two 1-row aggs, zero windows.
REFRESH_RATE_PER_PAGE = 0.1   # R/N: one revisit per 10h per page on average
_FRESH_SCALE = 1_000_000_000


@query(
    "refresh_policy_compare",
    f"""
    WITH polls AS (
        SELECT doc_id::BIGINT AS id,
               (4 + doc_id % 13)::BIGINT AS n_polls,
               (doc_id % (4 + doc_id % 13 + 1))::BIGINT AS n_changed,
               (1 + doc_id % 5)::DOUBLE AS interval_h
        FROM documents
    ),
    est AS (
        SELECT id,
               round(-ln((n_polls - n_changed + 0.5::DOUBLE)
                         / (n_polls + 0.5::DOUBLE)) / interval_h, 9)
                   AS lam
        FROM polls
    ),
    tot AS (
        SELECT count(*)::BIGINT AS n,
               round(sum(round(lam * {_FRESH_SCALE}, 0))
                     / {_FRESH_SCALE}::DOUBLE, 9) AS sum_lam
        FROM est
    ),
    rates AS (
        SELECT id, lam,
               {REFRESH_RATE_PER_PAGE!r}::DOUBLE AS f_uni,
               round({REFRESH_RATE_PER_PAGE!r}::DOUBLE * (SELECT n FROM tot)
                     * lam / (SELECT sum_lam FROM tot), 9) AS f_prop
        FROM est
    ),
    fresh AS (
        SELECT id,
               (CASE WHEN lam <= 0.0 THEN 1.0::DOUBLE
                     ELSE (f_uni / lam) * (1.0::DOUBLE - exp(-(lam / f_uni)))
                END) AS fr_uni,
               (CASE WHEN lam <= 0.0 THEN 1.0::DOUBLE
                     WHEN f_prop <= 0.0 THEN 0.0::DOUBLE
                     ELSE (f_prop / lam) * (1.0::DOUBLE - exp(-(lam / f_prop)))
                END) AS fr_prop
        FROM rates
    ),
    acc AS (
        SELECT count(*)::BIGINT AS n,
               sum(round(fr_uni * {_FRESH_SCALE}, 0)::BIGINT)::BIGINT AS s_uni,
               sum(round(fr_prop * {_FRESH_SCALE}, 0)::BIGINT)::BIGINT AS s_prop
        FROM fresh
    )
    SELECT policy, n_pages, freshness FROM (
        SELECT 'uniform' AS policy, n AS n_pages,
               round(s_uni / (n * {_FRESH_SCALE}::DOUBLE), 9) AS freshness
        FROM acc
        UNION ALL
        SELECT 'proportional' AS policy, n AS n_pages,
               round(s_prop / (n * {_FRESH_SCALE}::DOUBLE), 9) AS freshness
        FROM acc
    )
    """,
)
def q_refresh_policy_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus freshness under uniform vs λ-proportional refresh
    allocation at the same total budget (Cho–GM TODS'03): uniform wins
    — the policy decision behind recrawl_schedule's flat bucket rates.
    Per-page freshness folds as fixed-point int64 (order-free exact
    sums under any partitioning); output is 2 rows."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    n = (F.lit(4) + F.pmod(i, F.lit(13))).cast("long")
    x = F.pmod(i, n + 1).cast("long")
    iv = (F.lit(1) + F.pmod(i, F.lit(5))).cast("double")
    lam = F.round(
        -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / iv, 9)
    est = d.select(lam.alias("lam"))
    tot = est.agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum(F.round(F.col("lam") * _FRESH_SCALE, 0))
                / F.lit(float(_FRESH_SCALE)), 9).alias("sum_lam"))
    rates = est.crossJoin(F.broadcast(tot)).select(
        "lam", "n",
        F.lit(REFRESH_RATE_PER_PAGE).alias("f_uni"),
        F.round(F.lit(REFRESH_RATE_PER_PAGE) * F.col("n") * F.col("lam")
                / F.col("sum_lam"), 9).alias("f_prop"))

    def _fresh(f: F.Column) -> F.Column:
        return (F.when(F.col("lam") <= 0.0, F.lit(1.0))
                .when(f <= 0.0, F.lit(0.0))
                .otherwise((f / F.col("lam"))
                           * (F.lit(1.0) - F.exp(-(F.col("lam") / f)))))

    acc = rates.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.round(_fresh(F.col("f_uni")) * _FRESH_SCALE, 0).cast("long"))
        .cast("long").alias("s_uni"),
        F.sum(F.round(_fresh(F.col("f_prop")) * _FRESH_SCALE, 0).cast("long"))
        .cast("long").alias("s_prop"))
    uni = acc.select(
        F.lit("uniform").alias("policy"), F.col("n").alias("n_pages"),
        F.round(F.col("s_uni") / (F.col("n") * F.lit(float(_FRESH_SCALE))),
                9).alias("freshness"))
    pro = acc.select(
        F.lit("proportional").alias("policy"), F.col("n").alias("n_pages"),
        F.round(F.col("s_prop") / (F.col("n") * F.lit(float(_FRESH_SCALE))),
                9).alias("freshness"))
    return uni.unionAll(pro)


# --------------------------------------------------------------------------- #
# frontier_novelty — outlink novelty ratio / coverage-saturation signal
# --------------------------------------------------------------------------- #
# The crawl's stopping signal: when a host's extracted outlinks are
# almost all ALREADY-KNOWN pages, the crawl has saturated that host and
# further rounds there buy nothing (the frontier-growth complement of
# harvest_rate's relevance curve; IRLbot's queue management keys off
# the same ratio). Per source host: outlinks extracted, how many hit
# the known-page universe (url join — the same anti-join shape the
# engine's seen-set dedup runs), novelty = new/total, saturated when
# novelty drops under the floor. One big-big hash join on the url key
# (both sides shuffle-partitioned on it) + one host groupBy.
NOVELTY_FLOOR = 0.2


@query(
    "frontier_novelty",
    f"""
    WITH {_REVISIT_SP_SQL},
    pages AS (
        SELECT 'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/'
                   || doc_id::VARCHAR AS url
        FROM documents
    ),
    links AS (
        SELECT 'host' || (doc_id % 7)::VARCHAR AS src_host, ref AS dst_url
        FROM spans WHERE kind = 'link'
    ),
    tagged AS (
        SELECT l.src_host, (p.url IS NOT NULL) AS known
        FROM links l LEFT JOIN pages p ON l.dst_url = p.url
    )
    SELECT src_host, count(*)::BIGINT AS n_out,
           sum((NOT known)::INT)::BIGINT AS n_new,
           round(sum((NOT known)::INT)::DOUBLE / count(*), 9) AS novelty,
           (sum((NOT known)::INT)::DOUBLE / count(*)
                < {NOVELTY_FLOOR!r}) AS saturated
    FROM tagged GROUP BY src_host
    """,
)
def q_frontier_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host outlink novelty: the share of extracted outlinks NOT in
    the known-page universe. Novelty under NOVELTY_FLOOR marks the
    host saturated — the budget allocator's signal to shift politeness
    grants toward hosts still yielding frontier growth (feeds
    host_budgets like host_budget_alloc/ip_politeness)."""
    from .spansops import _span_docs

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    pages = d.select(
        F.concat(F.lit("https://host"), F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com/p/"), i.cast("string")).alias("url"))
    sd = _span_docs(spark, sf_dir)
    links = (
        sd.select("doc_id", F.explode_outer("spans").alias("s"))
        .where(F.col("s.kind") == "link")
        .select(
            F.concat(F.lit("host"),
                     F.pmod(F.col("doc_id"), F.lit(7)).cast("string")).alias("src_host"),
            F.col("s.media_ref").alias("dst_url"))
    )
    tagged = links.join(pages, links.dst_url == pages.url, "left").select(
        "src_host", F.col("url").isNotNull().alias("known"))
    new_cnt = F.sum((~F.col("known")).cast("int")).cast("long")
    return tagged.groupBy("src_host").agg(
        F.count("*").cast("long").alias("n_out"),
        new_cnt.alias("n_new"),
        F.round(new_cnt.cast("double") / F.count("*"), 9).alias("novelty"),
        ((new_cnt.cast("double") / F.count("*")) < F.lit(NOVELTY_FLOOR))
        .alias("saturated"),
    )


# --------------------------------------------------------------------------- #
# Per-host language profile — the steering signal for a multilingual
# crawl (CCNet/OSCAR split their pipelines per language; a crawler with
# per-language corpus targets allocates host budgets by what a host
# actually serves). One hash groupBy on (host, lang) + a host-total
# broadcast join; shares are integer-ratio-derived doubles rounded to
# 9 (identical op sequence both engines); dominance is count-then-lang
# deterministic (no window — a self-join on the per-host max keeps the
# plan two hash aggs + two broadcast-size joins, scale-free in the
# number of languages).
# --------------------------------------------------------------------------- #
LANG_N_HOSTS = 7


@query(
    "host_lang_profile",
    f"""
    WITH counts AS (
        SELECT 'host' || (doc_id % {LANG_N_HOSTS})::VARCHAR || '.example.com' AS host,
               lang, count(*)::BIGINT AS n_docs
        FROM documents GROUP BY 1, 2
    ),
    totals AS (
        SELECT host, sum(n_docs)::BIGINT AS host_docs,
               max(n_docs)::BIGINT AS max_docs
        FROM counts GROUP BY 1
    ),
    dom AS (
        SELECT c.host, min(c.lang) AS dom_lang
        FROM counts c JOIN totals t
          ON c.host = t.host AND c.n_docs = t.max_docs
        GROUP BY 1
    )
    SELECT c.host, c.lang, c.n_docs, t.host_docs,
           round(c.n_docs::DOUBLE / t.host_docs::DOUBLE, 9) AS share,
           (c.lang = d.dom_lang) AS is_dominant
    FROM counts c
    JOIN totals t ON c.host = t.host
    JOIN dom d ON c.host = d.host
    """,
)
def q_host_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("host"),
        F.pmod(F.col("doc_id").cast("long"), F.lit(LANG_N_HOSTS)).cast("string"),
        F.lit(".example.com"),
    )
    counts = d.select(host.alias("host"), "lang").groupBy("host", "lang").agg(
        F.count("*").alias("n_docs"))
    totals = counts.groupBy("host").agg(
        F.sum("n_docs").alias("host_docs"), F.max("n_docs").alias("max_docs"))
    dom = (
        counts.join(totals, "host")
        .where(F.col("n_docs") == F.col("max_docs"))
        .groupBy("host").agg(F.min("lang").alias("dom_lang"))
    )
    return (
        counts.join(totals.select("host", "host_docs"), "host")
        .join(dom, "host")
        .select(
            "host", "lang", "n_docs", "host_docs",
            F.round(F.col("n_docs").cast("double") / F.col("host_docs").cast("double"), 9)
             .alias("share"),
            (F.col("lang") == F.col("dom_lang")).alias("is_dominant"),
        )
    )


# --------------------------------------------------------------------------- #
# Engine-side trap mining + the one-call generation planner
# --------------------------------------------------------------------------- #
def trap_templates_from_frontier(frontier: DataFrame,
                                 min_share: float = TRAP_MIN_SHARE,
                                 min_params: int = TRAP_MIN_PARAMS,
                                 min_urls: int = 1) -> DataFrame:
    """Engine-side twin of ``crawl_traps``: mine (host, template) trap
    classes from the engine's OWN frontier log (``eng.frontier_tbl
    .read(spark)`` — url, host) instead of a synthesized corpus, using
    the identical templating the engine's extraction-time trap filter
    applies (hex runs ≥ 8 → '{h}' first, then digit runs → '{d}').
    Output is the flagged rows only, shaped exactly for
    ``CrawlEngine(trap_templates=...)`` — the mine → crawl feedback leg
    beside yield/errors/novelty → budget.

    Scale shape: template derivation is pure string exprs in the scan;
    the distinct + groupBy shuffles carry one row per (host, template)
    class (bounded by the template vocabulary, not URL count); the
    host-share window runs over that class table."""
    path = F.regexp_replace(F.col("url"), "^[a-z]+://[^/]*", "")
    tpl = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{h}"), r"[0-9]+", "{d}")
    urls = frontier.select("host", "url", tpl.alias("template")).distinct()
    per_tpl = urls.groupBy("host", "template").agg(
        F.countDistinct("url").alias("n_urls"))
    n_params = (
        F.length("template")
        - F.length(F.replace(F.col("template"), F.lit("{"), F.lit("")))
    ).cast("int")
    w = Window.partitionBy("host")
    return (
        per_tpl.withColumn("n_params", n_params)
        .withColumn("_share",
                    F.col("n_urls").cast("double") / F.sum("n_urls").over(w))
        .where((F.col("_share") >= F.lit(min_share))
               & (F.col("n_params") >= F.lit(min_params))
               & (F.col("n_urls") >= F.lit(min_urls)))
        .select("host", "template")
    )


def plan_next_generation(pages: DataFrame, frontier: DataFrame, cfg=None, *,
                         total_budget: int = TOTAL_BUDGET,
                         budget_min: int = BUDGET_MIN,
                         budget_max: int = BUDGET_MAX,
                         err_cap_pct: int = 80,
                         novelty_floor_pct: int = 20,
                         byte_target: int | None = None,
                         rank: str | None = "opic",
                         mine_traps: bool = True,
                         trap_min_urls: int = 1) -> dict:
    """The generation planner: ONE call from generation N's outputs to
    generation N+1's ``CrawlEngine`` inputs, composing every control
    leg this engine closes individually:

    - ``host_budgets``: yield → errors → novelty → 304 chained (a
      host's grant is its yield-proportional share, decayed by its
      transient rate, decayed again by frontier saturation, decayed
      again by its revisit not_modified rate when conditional_fetch
      revisits produced evidence — each leg's output is the next
      leg's base, so the composed budget is monotonically ≤ the
      yield-only grant and ≥ 1; the 304 leg is the identity on logs
      with no resolved revisits; pass ``byte_target`` to chain the
      bandwidth ceiling — heavy-payload hosts capped at the URL count
      whose expected bytes fit the target).
    - ``url_scores``: the observed outlink graph (fetched pages' link
      spans) ranked by OPIC (Abiteboul WWW'03 — the importance measure
      built for crawling; ``rank="pagerank"`` swaps the estimator,
      ``rank=None`` skips scoring) and normalized into the engine's
      [0, 1] scorer scale by ``linkgraph.scores_from_rank``.
    - ``trap_templates``: (host, template) classes mined from the
      frontier log by ``trap_templates_from_frontier``.

    Freshness is deliberately NOT composed here: reopen sets come from
    the channel-specific producers (stale_from_sitemap, feed_fresh,
    recrawl_schedule / poisson_revisit) because each needs evidence
    this generation's tables don't carry alone (sitemaps, feeds, or a
    multi-generation observation log) — pass their output to
    ``eng.reopen`` beside these inputs.

    Usage::

        plan = plan_next_generation(g1.pages(),
                                    g1.frontier_tbl.read(spark), cfg)
        g2 = CrawlEngine(spark, docs, cfg2, state_dir,
                         host_budgets=plan["host_budgets"],
                         url_scores=plan["url_scores"],
                         trap_templates=plan["trap_templates"])

    Scale shape: every leg is host- or template-vocabulary bounded;
    the graph rank is the OPIC/PageRank per-iteration join+agg over
    the observed edge list; nothing here touches blob payloads."""
    from ..operators.linkgraph import opic, pagerank, scores_from_rank

    by_yield = host_budgets_from_yield(
        pages, total_budget=total_budget,
        budget_min=budget_min, budget_max=budget_max)
    by_err = host_budgets_from_errors(
        pages, by_yield.select("host", "budget"), err_cap_pct=err_cap_pct)
    by_nov = host_budgets_from_novelty(
        pages, frontier, by_err.select("host", "budget"),
        floor_pct=novelty_floor_pct, cfg=cfg).select("host", "budget")
    # revisit-economics leg: identity when the log carries no resolved
    # revisits (fresh_pct = 0 for every host), so chaining it is free
    # for first-generation crawls and active exactly when
    # conditional_fetch revisits produced not_modified evidence
    budgets = host_budgets_from_304(pages, by_nov).select("host", "budget")
    # bandwidth ceiling (opt-in: needs a per-generation byte target to
    # mean anything): caps each host's grant at the URL count whose
    # expected payload fits byte_target — never raises a budget, so the
    # composed monotonicity (≤ yield-only grant, ≥ 1) is preserved
    if byte_target is not None:
        budgets = host_budgets_from_bytes(
            pages, budgets, byte_target).select("host", "budget")

    scores = None
    if rank is not None:
        edges = (
            pages.where(F.col("status") == "fetched")
            .select(F.col("url").alias("src_url"),
                    F.explode("spans").alias("_s"))
            .where(F.col("_s.kind") == "link")
            .select("src_url", F.col("_s.media_ref").alias("dst_url"))
        )
        if rank == "opic":
            scores = scores_from_rank(opic(edges), col="importance")
        elif rank == "pagerank":
            scores = scores_from_rank(pagerank(edges), col="rank")
        else:
            raise ValueError(f"unknown rank estimator: {rank!r}")

    traps = (trap_templates_from_frontier(frontier, min_urls=trap_min_urls)
             if mine_traps else None)
    return {"host_budgets": budgets, "url_scores": scores,
            "trap_templates": traps}


def host_budgets_from_lang(profile: DataFrame, targets: dict[str, int],
                           total_budget: int = TOTAL_BUDGET,
                           budget_min: int = BUDGET_MIN,
                           budget_max: int = BUDGET_MAX) -> DataFrame:
    """Language-targeted budgets — the FIFTH control leg (yield,
    authority, errors, growth, and now LANGUAGE): a multilingual
    pipeline with per-language corpus targets (the mix_weights /
    CCNet-split world) should spend its politeness grants on the hosts
    that actually serve the under-collected languages. ``profile`` is
    ``host_lang_profile``'s shape (host, lang, share); ``targets`` maps
    lang → integer weight (e.g. the mix_weights sample-rate
    percentages). A host's relevance is Σ share·weight over its
    languages, kept in FIXED POINT (share round-scaled to 1e9 before
    the integer multiply) so the fold is associative and order-free;
    budget = clamp(total · host_rel ÷ Σ rel), integer floor division,
    zero-total guarded like host_budget_alloc. Hosts serving no target
    language decay to ``budget_min``, not zero — politeness budgets
    gate pacing, never reachability.

    One host-keyed hash agg + a 1-row broadcast — host-vocabulary
    bounded at any corpus scale."""
    if not targets:
        raise ValueError("targets must map at least one lang to a weight")
    w = F.lit(0).cast("long")
    for lang, weight in sorted(targets.items()):
        w = F.when(F.col("lang") == lang, F.lit(int(weight)).cast("long")).otherwise(w)
    rel = (F.round(F.col("share") * 1_000_000_000).cast("long") * w)
    per_host = profile.select("host", rel.alias("_rel")).groupBy("host").agg(
        F.sum("_rel").alias("rel"))
    tot = per_host.agg(F.greatest(F.lit(1).cast("long"),
                                  F.sum("rel")).alias("total_rel"))
    budget = F.greatest(
        F.lit(budget_min).cast("long"),
        F.least(F.lit(budget_max).cast("long"),
                F.expr(f"({total_budget} * rel) div total_rel")),
    ).cast("int")
    return (
        per_host.crossJoin(F.broadcast(tot))
        .select("host", "rel", budget.alias("budget"))
    )


# --------------------------------------------------------------------------- #
# host_budget_bytes — the bandwidth-ceiling leg as a named query:
# per-page payload bytes synthesized from documents (strlen(text) — the
# deterministic stand-in for Content-Length), the doc_id%19 slice
# transient (excluded from the byte evidence, same die as
# host_budget_errors), base budgets vary per host, and the capped
# budget must match host_budgets_from_bytes' pure integer formula in
# both engines.
# --------------------------------------------------------------------------- #
BYTES_TARGET = 200_000


@query(
    "host_budget_bytes",
    f"""
    WITH pages AS (
        SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               (CASE WHEN doc_id % 19 = 0 THEN 'transient'
                     ELSE 'fetched' END) AS status,
               strlen(coalesce(text, ''))::BIGINT AS nbytes
        FROM documents
    ),
    per_host AS (
        SELECT host, count(*)::BIGINT AS n_fetched,
               sum(nbytes)::BIGINT AS total_bytes
        FROM pages WHERE status = 'fetched' GROUP BY 1
    ),
    base AS (
        SELECT DISTINCT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               (100 + (doc_id % 7) * 50)::BIGINT AS budget
        FROM documents
    ),
    j AS (
        SELECT b.host, b.budget,
               coalesce(p.n_fetched, 0)::BIGINT AS n_fetched,
               coalesce(p.total_bytes, 0)::BIGINT AS total_bytes,
               (CASE WHEN coalesce(p.n_fetched, 0) = 0 THEN 0
                     ELSE p.total_bytes // p.n_fetched END)::BIGINT AS avg_bytes
        FROM base b LEFT JOIN per_host p USING (host)
    )
    SELECT host, n_fetched, total_bytes, avg_bytes,
           greatest(1, (CASE WHEN avg_bytes = 0 THEN budget
                             ELSE least(budget, greatest(1,
                                 {BYTES_TARGET} // avg_bytes)) END))::INT
               AS budget
    FROM j
    """,
)
def q_host_budget_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    host = F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                    F.lit(".example.com"))
    pages = d.select(
        host.alias("host"),
        F.when(F.pmod(i, F.lit(19)) == 0, F.lit("transient"))
        .otherwise(F.lit("fetched")).alias("status"),
        F.octet_length(F.coalesce(F.col("text"), F.lit("")))
        .cast("long").alias("nbytes"),
    )
    base = d.select(
        host.alias("host"),
        (F.lit(100) + F.pmod(i, F.lit(7)) * 50).cast("long").alias("budget"),
    ).distinct()
    return host_budgets_from_bytes(pages, base, BYTES_TARGET,
                                   nbytes_col="nbytes")


# --------------------------------------------------------------------------- #
# host_payload_quantiles — the tail audit for the bandwidth leg: the
# bytes budget caps on AVG payload, but bandwidth incidents come from
# the TAIL (one host serving p99 = 40× its median). Per host, exact
# p50/p90/p99 payload bytes by explicit rank selection — rank r_q =
# ceil(q·n) computed as (q·100·n + 99) // 100 in integers, the value
# picked by row_number over the host's nbytes order — so both engines
# select the identical element with NO engine quantile builtin (whose
# interpolation conventions differ). avg_bytes ties the report to
# host_budgets_from_bytes' cap; tail_ratio = p99/max(1,p50) flags the
# skewed hosts whose cap should come from the tail, not the mean.
#
# Scale shape: one per-host window sort (spillable, bounded by the
# host's page count) + one hash agg; payload synthesized as
# strlen(text) from documents — the same Content-Length stand-in as
# host_budget_bytes.
# --------------------------------------------------------------------------- #
@query(
    "host_payload_quantiles",
    """
    WITH pages AS (
        SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               strlen(coalesce(text, ''))::BIGINT AS nbytes
        FROM documents
    ),
    ranked AS (
        SELECT host, nbytes,
               row_number() OVER (PARTITION BY host ORDER BY nbytes) AS rn,
               count(*) OVER (PARTITION BY host) AS n
        FROM pages
    )
    SELECT host,
           max(n)::BIGINT AS n_pages,
           (sum(nbytes) // max(n))::BIGINT AS avg_bytes,
           max(CASE WHEN rn = (50 * n + 99) // 100 THEN nbytes END)::BIGINT AS p50,
           max(CASE WHEN rn = (90 * n + 99) // 100 THEN nbytes END)::BIGINT AS p90,
           max(CASE WHEN rn = (99 * n + 99) // 100 THEN nbytes END)::BIGINT AS p99,
           round(max(CASE WHEN rn = (99 * n + 99) // 100 THEN nbytes END)::DOUBLE
                 / greatest(1, max(CASE WHEN rn = (50 * n + 99) // 100
                                        THEN nbytes END)), 6) AS tail_ratio
    FROM ranked GROUP BY host
    """,
)
def q_host_payload_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    pages = d.select(
        F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com")).alias("host"),
        F.octet_length(F.coalesce(F.col("text"), F.lit("")))
        .cast("long").alias("nbytes"),
    )
    wv = Window.partitionBy("host").orderBy("nbytes")
    wn = Window.partitionBy("host")
    ranked = pages.select(
        "host", "nbytes",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda q: F.max(
        F.when(F.col("rn") == F.expr(f"({q} * n + 99) div 100"),
               F.col("nbytes"))).cast("long")
    return ranked.groupBy("host").agg(
        F.max("n").cast("long").alias("n_pages"),
        F.expr("sum(nbytes) div max(n)").cast("long").alias("avg_bytes"),
        pick(50).alias("p50"),
        pick(90).alias("p90"),
        pick(99).alias("p99"),
        F.round(pick(99).cast("double")
                / F.greatest(F.lit(1).cast("long"), pick(50)), 6)
        .alias("tail_ratio"),
    )


# --------------------------------------------------------------------------- #
# drain_forecast — "when does this generation finish": given each
# host's pending queue and its politeness budget (the yield-
# proportional alloc above), the rounds-to-drain per host is a pure
# ceiling division, the generation's makespan is the max over hosts,
# and the hosts ON that max are the bottleneck — the queue a scheduler
# either re-budgets (raise the clamp), re-shards (salt queues), or
# consciously accepts before launching. The spare column quantifies
# capacity wasted waiting on the bottleneck: budget x makespan -
# pending fetch-slots that go unused per host. All integer arithmetic
# (ceil-div as (p + b - 1) div b), one host agg + a 1-row broadcast
# max — the per-host table is bounded by the host vocabulary at any
# corpus scale.
# --------------------------------------------------------------------------- #
@query(
    "drain_forecast",
    f"""
    WITH per_host AS (
        SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com' AS host,
               count(*)::BIGINT AS pending,
               sum(CASE WHEN n_chars >= {YIELD_MIN_CHARS} THEN 1 ELSE 0 END)::BIGINT AS yield_docs
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT greatest(1, sum(yield_docs)) AS total_yield FROM per_host),
    alloc AS (
        SELECT host, pending,
               greatest({BUDGET_MIN}, least({BUDGET_MAX},
                   ({TOTAL_BUDGET} * yield_docs) // total_yield))::BIGINT AS budget
        FROM per_host, tot
    ),
    rounds AS (
        SELECT host, pending, budget,
               ((pending + budget - 1) // budget)::BIGINT AS rounds_to_drain
        FROM alloc
    ),
    mk AS (SELECT max(rounds_to_drain)::BIGINT AS makespan FROM rounds)
    SELECT r.host, r.pending, r.budget, r.rounds_to_drain, m.makespan,
           (r.rounds_to_drain = m.makespan) AS is_bottleneck,
           (r.budget * m.makespan - r.pending)::BIGINT AS spare
    FROM rounds r, mk m
    """,
)
def q_drain_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    per_host = d.groupBy(
        F.concat(F.lit("host"), F.pmod(i, F.lit(7)).cast("string"),
                 F.lit(".example.com")).alias("host")
    ).agg(
        F.count("*").cast("long").alias("pending"),
        F.sum(F.when(F.col("n_chars") >= YIELD_MIN_CHARS, 1).otherwise(0))
        .cast("long").alias("yield_docs"),
    )
    tot = per_host.agg(
        F.greatest(F.lit(1), F.sum("yield_docs")).alias("total_yield"))
    # `div` (int64) rather than F.floor(x / y): the double path rounds
    # differently from the oracle's BIGINT // once products pass 2^53 —
    # same bit-exact convention as the host_budget_* siblings above.
    alloc = per_host.crossJoin(F.broadcast(tot)).select(
        "host", "pending",
        F.greatest(
            F.lit(BUDGET_MIN),
            F.least(
                F.lit(BUDGET_MAX),
                F.expr(f"({TOTAL_BUDGET} * yield_docs) div total_yield"),
            ),
        ).cast("long").alias("budget"),
    )
    rounds = alloc.select(
        "host", "pending", "budget",
        F.expr("(pending + budget - 1) div budget")
        .cast("long").alias("rounds_to_drain"),
    )
    mk = rounds.agg(F.max("rounds_to_drain").cast("long").alias("makespan"))
    return rounds.crossJoin(F.broadcast(mk)).select(
        "host", "pending", "budget", "rounds_to_drain", "makespan",
        (F.col("rounds_to_drain") == F.col("makespan")).alias("is_bottleneck"),
        (F.col("budget") * F.col("makespan") - F.col("pending"))
        .cast("long").alias("spare"),
    )
