"""Mergeable-sketch tier: cardinality / overlap / frequency estimation
for frontier accounting at 10^10-URL scale.

At a 10^10-entry frontier, exact per-shard accounting (distinct URL
counts per seen-shard, overlap between crawl generations, per-template
frequencies) is itself a large job: a `count(DISTINCT url)` is a full
shuffle of every URL string, and a cross-generation overlap is a join
of two 10^10-row tables. The operational answers a scheduler needs are
estimates with known error — and the textbook sketches (HyperLogLog,
KMV/bottom-k, Count-Min) are *mergeable*: each executor folds its
partition into a constant-size state, states merge associatively
across shards/rounds, and nothing but the sketch ever shuffles.

The sketch queries below compute the sketch with **integer-exact
arithmetic in pure column expressions** (the only floating-point steps
are final divisions of exact integers, identically sequenced in both
engines), so the DuckDB oracle certifies the sketch bit-for-bit — not
just "close". The per-row hash is the cross-engine ``h60`` (60-bit
md5; the production engine would swap in xxhash64 — same plan shape).

Papers: Flajolet et al., "HyperLogLog" (AOFA'07); Bar-Yossef et al.,
"Counting distinct elements in a data stream" (RANDOM'02, KMV);
Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch" (J.Alg'05).

Reference tie-in: the reference's crawl bookkeeping is exact in-memory
Python sets/dicts (/root/reference/crawl_agent.py session stats); these
are the distributed, constant-memory counterparts its semantics imply
at web scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE31, h60, h60_sql
from ..functions.urls import canonicalize, canonicalize_sql
from .registry import query, table as _t

# --------------------------------------------------------------------------- #
# HLL parameters: p=6 → m=64 registers over the 60-bit h60 hash
# (top 6 bits = register index, low 54 bits = rank suffix).
# --------------------------------------------------------------------------- #
HLL_M = 64
HLL_W = 54                      # suffix width: 60 - log2(m)
HLL_POW_W = 1 << HLL_W          # 2^54
HLL_ALPHA = 0.709               # Flajolet's alpha_64
# raw estimate E = alpha*m^2 / (S / 2^W) = C / S with S the FIXED-POINT
# register sum  S = sum_j 2^(W - M_j)  (exact BIGINT: <= m * 2^W < 2^60)
HLL_C = HLL_ALPHA * HLL_M * HLL_M * float(HLL_POW_W)
HLL_LC_CUT = 2.5 * HLL_M        # small-range correction threshold
# linear-counting lookup  m*ln(m/V) for V=0..m — Python-computed
# literals shared by BOTH engines, so no libm call ever runs at query
# time (ln differs in the last ulp across runtimes; a literal cannot).
HLL_LC = [0.0] + [round(HLL_M * math.log(HLL_M / v), 6) for v in range(1, HLL_M + 1)]
N_SHARDS = 8

KMV_K = 128                     # bottom-k sketch size
KMV_RANGE = float(1 << 60)      # h60 value range

CMS_D = 4                       # count-min rows
CMS_W = 512                     # count-min columns
# fixed affine permutations (a*h + b) mod M31 mod W — a bounded so the
# product stays far under 2^63 (a <= 1e8, h < 2^31).
CMS_AB = [(99990001, 12345), (67867967, 987654), (86028121, 555557),
          (49979687, 31337)]


# --------------------------------------------------------------------------- #
# shared synthetic URL universe: 3 messy variants per doc fold to ONE
# canonical URL — the sketches consume the post-canonicalization
# distinct-hash stream, exactly where they sit in the engine
# (functions/urls.canonicalize → h60 → sketch).
# --------------------------------------------------------------------------- #
_VARIANTS_SQL = """
    variants AS (
        SELECT u.url_raw
        FROM documents d,
             unnest([
                'https://host' || (d.doc_id % 7)::VARCHAR || '.example.com/p/' || d.doc_id::VARCHAR,
                'HTTPS://HOST' || (d.doc_id % 7)::VARCHAR || '.EXAMPLE.COM/p/' || d.doc_id::VARCHAR || '#sec',
                'https://host' || (d.doc_id % 7)::VARCHAR || '.example.com:443/p/' || d.doc_id::VARCHAR || '?z=1&a=2'
             ]) AS u(url_raw)
    ),
    urls AS (
        SELECT DISTINCT {canon} AS url FROM variants
    )
""".format(canon=canonicalize_sql("url_raw", "duckdb"))


def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long").alias("doc_id"))
    i = F.col("doc_id")
    h7 = F.pmod(i, F.lit(7)).cast("string")
    s = i.cast("string")
    variants = F.array(
        F.concat(F.lit("https://host"), h7, F.lit(".example.com/p/"), s),
        F.concat(F.lit("HTTPS://HOST"), h7, F.lit(".EXAMPLE.COM/p/"), s, F.lit("#sec")),
        F.concat(F.lit("https://host"), h7, F.lit(".example.com:443/p/"), s, F.lit("?z=1&a=2")),
    )
    return (
        d.select(F.explode(variants).alias("url_raw"))
        .select(canonicalize("url_raw").alias("url"))
        .distinct()
    )


# --------------------------------------------------------------------------- #
# seen_cardinality_hll — per-seen-shard HLL distinct-URL estimate + the
# merged global estimate (register-wise max across shards)
# --------------------------------------------------------------------------- #
_HLL_LC_SQL = "[" + ", ".join(repr(x) for x in HLL_LC) + "]"

@query(
    "seen_cardinality_hll",
    f"""
    WITH {_VARIANTS_SQL},
    hs AS (SELECT {h60_sql('url')} AS h FROM urls),
    base AS (
        SELECT h % {N_SHARDS} AS shard,
               h // {HLL_POW_W} AS idx,
               h % {HLL_POW_W} AS v
        FROM hs
    ),
    rho AS (
        SELECT shard, idx,
               (CASE WHEN v = 0 THEN {HLL_W + 1}
                     ELSE {HLL_W + 1} - length(bin(v)) END) AS rho
        FROM base
    ),
    regs AS (SELECT shard, idx, max(rho) AS m FROM rho GROUP BY 1, 2),
    allregs AS (
        SELECT shard::BIGINT AS shard, idx, m FROM regs
        UNION ALL
        SELECT -1::BIGINT, idx, max(m) FROM regs GROUP BY 2
    ),
    agg AS (
        SELECT shard,
               count(*)::BIGINT AS n_present,
               sum((1::BIGINT << ({HLL_W} - m)))::BIGINT AS s_present
        FROM allregs GROUP BY 1
    ),
    ex AS (
        SELECT shard::BIGINT AS shard, count(*)::BIGINT AS n_exact
        FROM base GROUP BY 1
        UNION ALL
        SELECT -1::BIGINT, count(*)::BIGINT FROM base
    ),
    est AS (
        SELECT a.shard,
               e.n_exact,
               ({HLL_M} - a.n_present)::BIGINT AS v_zero,
               (a.s_present + ({HLL_M} - a.n_present) * {HLL_POW_W})::BIGINT AS s_fixed
        FROM agg a JOIN ex e ON a.shard = e.shard
    ),
    fin AS (
        SELECT shard, n_exact, v_zero, s_fixed,
               round(CASE WHEN ({HLL_C!r} / s_fixed) <= {HLL_LC_CUT!r} AND v_zero > 0
                          THEN {_HLL_LC_SQL}[v_zero + 1]
                          ELSE {HLL_C!r} / s_fixed END, 2) AS est
        FROM est
    )
    SELECT shard, n_exact, v_zero, s_fixed, est,
           round((est - n_exact) / n_exact * 100, 2) AS rel_err_pct
    FROM fin
    """,
)
def q_seen_cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-URL cardinality per URL-seen shard plus the
    shard-merged global estimate (row shard=-1): the constant-memory
    answer to "how many distinct URLs does each seen-shard hold" that
    the Bloom-sidecar sizing (seen_shard_fp) needs WITHOUT an exact
    count(DISTINCT) shuffle of every URL string. Registers are a
    (shard, idx) → max(rho) groupBy whose partials fold map-side; the
    global sketch is register-wise max — the merge that makes per-round
    incremental maintenance free. The register sum is kept in FIXED
    POINT (sum of 2^(W-M_j) as BIGINT) and linear-counting values come
    from a Python-literal table, so both engines emit bit-identical
    estimates. At 10^10 URLs only 64 registers per shard ever shuffle."""
    urls = _urls(spark, sf_dir)
    h = h60("url")
    idx_c, rho_c = hll_register_cols(h)
    rho = urls.select(
        F.pmod(h, F.lit(N_SHARDS)).alias("shard"),
        idx_c.alias("idx"),
        rho_c.alias("rho"),
    )
    regs = rho.groupBy("shard", "idx").agg(F.max("rho").alias("m"))
    allregs = regs.select(F.col("shard").cast("long").alias("shard"), "idx", "m").unionByName(
        regs.groupBy("idx").agg(F.max("m").alias("m"))
        .select(F.lit(-1).cast("long").alias("shard"), "idx", "m")
    )
    agg = allregs.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_present"),
        F.expr(f"sum(shiftleft(CAST(1 AS BIGINT), {HLL_W} - m))").cast("long").alias("s_present"),
    )
    ex = rho.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count("*").cast("long").alias("n_exact")
    ).unionByName(
        rho.agg(F.count("*").cast("long").alias("n_exact"))
        .select(F.lit(-1).cast("long").alias("shard"), "n_exact")
    )
    est = agg.join(ex, "shard").select(
        "shard", "n_exact",
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("v_zero"),
        (F.col("s_present")
         + (F.lit(HLL_M) - F.col("n_present")) * F.lit(HLL_POW_W)).cast("long").alias("s_fixed"),
    )
    lc = F.array(*[F.lit(x) for x in HLL_LC])
    raw = F.lit(HLL_C) / F.col("s_fixed")
    fin = est.select(
        "shard", "n_exact", "v_zero", "s_fixed",
        F.round(
            F.when((raw <= F.lit(HLL_LC_CUT)) & (F.col("v_zero") > 0),
                   F.get(lc, F.col("v_zero").cast("int")))
            .otherwise(raw), 2).alias("est"),
    )
    return fin.select(
        "shard", "n_exact", "v_zero", "s_fixed", "est",
        F.round((F.col("est") - F.col("n_exact")) / F.col("n_exact") * 100, 2)
        .alias("rel_err_pct"),
    )


# --------------------------------------------------------------------------- #
# url_overlap_kmv — bottom-k (KMV) sketch overlap between two crawl
# generations: union cardinality + Jaccard without joining the full sets
# --------------------------------------------------------------------------- #
_KMV_URL_SQL = (
    "('https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/' || doc_id::VARCHAR)"
)
_KMV_GENS_SQL = f"""
    hs AS (
        SELECT {h60_sql(_KMV_URL_SQL)} AS h, doc_id::BIGINT AS doc_id
        FROM documents
    ),
    ha AS (SELECT h FROM hs WHERE doc_id % 13 <> 0),
    hb AS (SELECT h FROM hs WHERE doc_id % 17 <> 0),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT {KMV_K}),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT {KMV_K}),
    ku AS (
        SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
        ORDER BY h LIMIT {KMV_K}
    )
"""


@query(
    "url_overlap_kmv",
    f"""
    WITH {_KMV_GENS_SQL},
    scal AS (
        SELECT (SELECT count(*)::BIGINT FROM ku) AS n_u,
               (SELECT max(h) FROM ku) AS kth_min,
               (SELECT count(*)::BIGINT FROM ku
                 WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)) AS n_match,
               (SELECT count(*)::BIGINT FROM ha) AS n_a,
               (SELECT count(*)::BIGINT FROM hb) AS n_b,
               (SELECT count(*)::BIGINT FROM ha JOIN hb USING (h)) AS n_inter
    ),
    fin AS (
        SELECT {KMV_K}::BIGINT AS k, n_a, n_b,
               (n_a + n_b - n_inter)::BIGINT AS n_union, n_inter, kth_min,
               round(CASE WHEN n_u < {KMV_K} THEN n_u::DOUBLE
                          ELSE {float(KMV_K - 1)!r} * {KMV_RANGE!r} / kth_min END,
                     2) AS est_union,
               round(n_match::DOUBLE / n_u, 6) AS est_jaccard
        FROM scal
    )
    SELECT k, n_a, n_b, n_union, n_inter, kth_min, est_union, est_jaccard,
           round((est_union - n_union) / n_union * 100, 2) AS err_union_pct,
           round(n_inter::DOUBLE / n_union, 6) AS exact_jaccard
    FROM fin
    """,
)
def q_url_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) sketch comparison of two crawl generations (the
    snapshot_diff membership dies): estimated union cardinality from
    the k-th smallest hash of the union sketch, and estimated Jaccard
    as the fraction of union-sketch members present in BOTH per-set
    sketches — the standard identity (a union-sketch element that
    belongs to A is necessarily among A's k smallest). Each bottom-k is
    ``ORDER BY h LIMIT k`` → TakeOrderedAndProject: per-partition heads
    merge on the driver, never a global sort — at 10^10 URLs per
    generation only k=128 hashes per side ever leave the executors.
    Exact counts ride along as the verification twin (test-SF-sized;
    the sketch columns are the scale path)."""
    d = _t(spark, sf_dir, "documents").select(F.col("doc_id").cast("long").alias("doc_id"))
    url = F.concat(
        F.lit("https://host"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
        F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
    )
    hs = d.select(h60(url).alias("h"), "doc_id")
    ha = hs.where(F.pmod("doc_id", F.lit(13)) != 0).select("h")
    hb = hs.where(F.pmod("doc_id", F.lit(17)) != 0).select("h")
    ka = ha.orderBy("h").limit(KMV_K)
    kb = hb.orderBy("h").limit(KMV_K)
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(KMV_K)
    matches = ku.join(ka, "h").join(kb, "h")
    scal = (
        ku.agg(F.count("*").cast("long").alias("n_u"), F.max("h").alias("kth_min"))
        .crossJoin(matches.agg(F.count("*").cast("long").alias("n_match")))
        .crossJoin(ha.agg(F.count("*").cast("long").alias("n_a")))
        .crossJoin(hb.agg(F.count("*").cast("long").alias("n_b")))
        .crossJoin(ha.join(hb, "h").agg(F.count("*").cast("long").alias("n_inter")))
    )
    fin = scal.select(
        F.lit(KMV_K).cast("long").alias("k"),
        "n_a", "n_b",
        (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("long").alias("n_union"),
        "n_inter", "kth_min",
        F.round(
            F.when(F.col("n_u") < KMV_K, F.col("n_u").cast("double"))
            .otherwise(F.lit(float(KMV_K - 1)) * F.lit(KMV_RANGE) / F.col("kth_min")),
            2).alias("est_union"),
        F.round(F.col("n_match").cast("double") / F.col("n_u"), 6).alias("est_jaccard"),
    )
    return fin.select(
        "k", "n_a", "n_b", "n_union", "n_inter", "kth_min", "est_union", "est_jaccard",
        F.round((F.col("est_union") - F.col("n_union")) / F.col("n_union") * 100, 2)
        .alias("err_union_pct"),
        F.round(F.col("n_inter").cast("double") / F.col("n_union"), 6)
        .alias("exact_jaccard"),
    )


# --------------------------------------------------------------------------- #
# template_heavy_hitters — Count-Min frequency estimates per URL template
# --------------------------------------------------------------------------- #
def _cms_cols_sql(hm: str) -> list[str]:
    return [f"((({a} * {hm} + {b}) % {MERSENNE31}) % {CMS_W})" for a, b in CMS_AB]


_CMS_OCC_SQL = f"""
    occ AS (
        SELECT 'host' || (doc_id % 7)::VARCHAR || '.example.com/' || source || '/N' AS t
        FROM documents
    ),
    occh AS (SELECT t, {h60_sql('t')} % {MERSENNE31} AS hm FROM occ)
"""


@query(
    "template_heavy_hitters",
    f"""
    WITH {_CMS_OCC_SQL},
    counters AS (
        SELECT row_i, col_i, count(*)::BIGINT AS cnt
        FROM (
            {" UNION ALL ".join(f"SELECT {i} AS row_i, {c} AS col_i FROM occh" for i, c in enumerate(_cms_cols_sql("hm")))}
        ) GROUP BY 1, 2
    ),
    cand AS (SELECT t, min(hm) AS hm, count(*)::BIGINT AS n_exact FROM occh GROUP BY 1),
    keys AS (
        {" UNION ALL ".join(f"SELECT t, {i} AS row_i, {c} AS col_i FROM cand" for i, c in enumerate(_cms_cols_sql("hm")))}
    ),
    est AS (
        SELECT k.t, min(c.cnt)::BIGINT AS cms_est
        FROM keys k JOIN counters c ON k.row_i = c.row_i AND k.col_i = c.col_i
        GROUP BY 1
    )
    SELECT cand.t AS template, cand.n_exact, est.cms_est,
           (est.cms_est - cand.n_exact)::BIGINT AS overcount
    FROM cand JOIN est ON cand.t = est.t
    """,
)
def q_template_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates per URL template (digits
    folded to 'N' — the crawl_traps key): the constant-memory heavy-
    hitter detector for frontier admission when template cardinality
    itself is too large to groupBy exactly (session-id explosions mint
    unbounded distinct templates; the CMS stays d×w = 4×512 counters no
    matter what). Counter increments are a (row, col) integer-sum
    groupBy — map-side combinable and mergeable across shards/rounds by
    plain addition; estimates are min over d counters, so the error is
    strictly ONE-SIDED (est >= exact always, pinned by test). Exact
    counts ride along as the verification twin."""
    d = _t(spark, sf_dir, "documents")
    occ = d.select(
        F.concat(
            F.lit("host"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example.com/"), F.col("source"), F.lit("/N"),
        ).alias("t")
    )
    occh = occ.select("t", F.pmod(h60("t"), F.lit(MERSENNE31)).alias("hm"))

    def cms_col(i: int) -> F.Column:
        a, b = CMS_AB[i]
        return F.pmod(F.pmod(F.lit(a) * F.col("hm") + F.lit(b), F.lit(MERSENNE31)),
                      F.lit(CMS_W))

    pairs = occh.select(
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row_i"), cms_col(i).alias("col_i"))
            for i in range(CMS_D)
        ])).alias("p")
    ).select("p.row_i", "p.col_i")
    counters = pairs.groupBy("row_i", "col_i").agg(F.count("*").cast("long").alias("cnt"))

    cand = occh.groupBy("t").agg(
        F.min("hm").alias("hm"), F.count("*").cast("long").alias("n_exact")
    )
    keys = cand.select(
        "t",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row_i"), cms_col(i).alias("col_i"))
            for i in range(CMS_D)
        ])).alias("p"),
    ).select("t", "p.row_i", "p.col_i")
    est = keys.join(counters, ["row_i", "col_i"]).groupBy("t").agg(
        F.min("cnt").cast("long").alias("cms_est")
    )
    return cand.join(est, "t").select(
        F.col("t").alias("template"), "n_exact", "cms_est",
        (F.col("cms_est") - F.col("n_exact")).cast("long").alias("overcount"),
    )


# --------------------------------------------------------------------------- #
# shard_rebalance — rendezvous (HRW) vs modulo reshard movement
# --------------------------------------------------------------------------- #
HRW_N1 = 8
HRW_N2 = 12


@query(
    "shard_rebalance",
    f"""
    WITH docs AS (
        SELECT 'https://host' || (doc_id % 7)::VARCHAR || '.example.com/p/'
                   || doc_id::VARCHAR AS url
        FROM documents
    ),
    scores AS (
        SELECT url, t.s AS s,
               {h60_sql("(url || '#' || t.s::VARCHAR)")} AS score
        FROM docs, range({HRW_N2}) t(s)
    ),
    a1 AS (
        SELECT url, min(s)::BIGINT AS shard FROM scores
        WHERE s < {HRW_N1}
          AND score = (SELECT max(score) FROM scores i
                       WHERE i.url = scores.url AND i.s < {HRW_N1})
        GROUP BY url
    ),
    a2 AS (
        SELECT url, min(s)::BIGINT AS shard FROM scores
        WHERE score = (SELECT max(score) FROM scores i WHERE i.url = scores.url)
        GROUP BY url
    ),
    hrw AS (
        SELECT 'hrw' AS scheme, count(*)::BIGINT AS n_urls,
               sum(CASE WHEN a1.shard <> a2.shard THEN 1 ELSE 0 END)::BIGINT AS n_moved
        FROM a1 JOIN a2 USING (url)
    ),
    modm AS (
        SELECT 'mod' AS scheme, count(*)::BIGINT AS n_urls,
               sum(CASE WHEN ({h60_sql('url')} % {HRW_N1})
                        <> ({h60_sql('url')} % {HRW_N2}) THEN 1 ELSE 0 END)::BIGINT AS n_moved
        FROM docs
    )
    SELECT scheme, n_urls, n_moved,
           round(n_moved::DOUBLE / n_urls * 100, 2) AS moved_pct
    FROM (SELECT * FROM hrw UNION ALL SELECT * FROM modm)
    """,
)
def q_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshard-movement comparison for growing the URL-seen store from
    8 to 12 shards: rendezvous/HRW hashing (Thaler & Ravishankar '96 —
    each key goes to the shard maximizing h(key, shard)) moves only the
    keys a NEW shard wins (expected (N2-N1)/N2 = 1/3), while modulo
    assignment reassigns ~2/3 — the reason a 10^10-URL seen store keyed
    by `h % n` cannot be grown without rehashing the world. The argmax
    is computed as max-score + min-shard-at-max, identically sequenced
    in both engines (ties deterministic); the per-key scores are
    map-side only — at scale the argmax folds in one pass over a
    generated column, nothing but (url, shard) pairs ever shuffle."""
    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        F.concat(
            F.lit("https://host"), F.pmod(F.col("doc_id"), F.lit(7)).cast("string"),
            F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
        ).alias("url")
    )
    scores = urls.select(
        "url", F.explode(F.sequence(F.lit(0), F.lit(HRW_N2 - 1))).alias("s")
    ).select(
        "url", "s",
        h60(F.concat(F.col("url"), F.lit("#"), F.col("s").cast("string"))).alias("score"),
    )

    def assign(sc: DataFrame) -> DataFrame:
        mx = sc.groupBy("url").agg(F.max("score").alias("mx"))
        return (
            sc.join(mx, "url")
            .where(F.col("score") == F.col("mx"))
            .groupBy("url").agg(F.min("s").cast("long").alias("shard"))
        )

    a1 = assign(scores.where(F.col("s") < HRW_N1))
    a2 = assign(scores)
    hrw = (
        a1.withColumnRenamed("shard", "s1")
        .join(a2.withColumnRenamed("shard", "s2"), "url")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.sum(F.when(F.col("s1") != F.col("s2"), 1).otherwise(0))
            .cast("long").alias("n_moved"),
        ).select(F.lit("hrw").alias("scheme"), "n_urls", "n_moved")
    )
    h = h60("url")
    modm = urls.agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum(F.when(F.pmod(h, F.lit(HRW_N1)) != F.pmod(h, F.lit(HRW_N2)), 1)
              .otherwise(0)).cast("long").alias("n_moved"),
    ).select(F.lit("mod").alias("scheme"), "n_urls", "n_moved")
    return hrw.unionByName(modm).select(
        "scheme", "n_urls", "n_moved",
        F.round(F.col("n_moved").cast("double") / F.col("n_urls") * 100, 2)
        .alias("moved_pct"),
    )


# --------------------------------------------------------------------------- #
# reusable HLL pieces (shared with the streaming cardinality tracker)
# --------------------------------------------------------------------------- #
def hll_register_cols(h) -> tuple:
    """(idx, rho) columns for a 60-bit non-negative hash column: top
    p bits index the register, rho = leading-zero count of the low W
    bits + 1 (bin() has no leading zeros in either engine, so rho is
    W+1 - bit_length, with the v=0 case pinned explicitly)."""
    idx = F.shiftright(h, HLL_W)
    v = h.bitwiseAND(F.lit(HLL_POW_W - 1))
    rho = (
        F.when(v == 0, F.lit(HLL_W + 1))
        .otherwise(F.lit(HLL_W + 1) - F.length(F.bin(v)))
    )
    return idx, rho


def hll_estimate(regs: DataFrame) -> DataFrame:
    """One-row estimate from a max-merged register table (idx, m):
    (v_zero, s_fixed, est) — the identical fixed-point arithmetic the
    seen_cardinality_hll query certifies against DuckDB."""
    agg = regs.agg(
        F.count("*").cast("long").alias("n_present"),
        F.expr(f"sum(shiftleft(CAST(1 AS BIGINT), {HLL_W} - m))")
        .cast("long").alias("s_present"),
    ).select(
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("v_zero"),
        (F.col("s_present")
         + (F.lit(HLL_M) - F.col("n_present")) * F.lit(HLL_POW_W))
        .cast("long").alias("s_fixed"),
    )
    lc = F.array(*[F.lit(x) for x in HLL_LC])
    raw = F.lit(HLL_C) / F.col("s_fixed")
    return agg.select(
        "v_zero", "s_fixed",
        F.round(
            F.when((raw <= F.lit(HLL_LC_CUT)) & (F.col("v_zero") > 0),
                   F.get(lc, F.col("v_zero").cast("int")))
            .otherwise(raw), 2).alias("est"),
    )
