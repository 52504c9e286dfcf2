"""Training-data pipeline operators as oracle-checked queries.

Deduplication (exact / MinHash+LSH / SimHash / n-gram Jaccard),
similarity search (brute-force cosine top-k, LSH-bucketed), BM25
ranking (reference P2, crawl_agent.py:535-540), keyword extraction
(reference K4, clustering_strategies.py:227-263), and the
SQL-expressible chunkers C4/C5 (text_chunking.py:398-497).

Dedup corpus: the documents table unioned with deterministic
perturbations (appended-tail near-dups for doc_id%5==0, verbatim copies
for doc_id%7==0) so the operators have guaranteed positives at every sf.

All hashes are md5-derived (functions.hashing) so DuckDB reproduces them
bit-for-bit; all vector math is explicit left-to-right folds over
float→double casts so both engines execute the identical IEEE sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T
from .registry import query, table as _t

# --------------------------------------------------------------------------- #
# shared dedup corpus
# --------------------------------------------------------------------------- #
NEAR_TAIL = " extracted near duplicate tail"

_CORPUS_SQL = f"""
    SELECT doc_id::BIGINT AS id, text, lang FROM documents
    UNION ALL
    SELECT doc_id::BIGINT + 1000000, text || '{NEAR_TAIL}', lang
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id::BIGINT + 2000000, text, lang
    FROM documents WHERE doc_id % 7 = 0
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    base = d.select(i.alias("id"), "text", "lang")
    near = (
        d.where(F.pmod(i, F.lit(5)) == 0)
        .select((i + 1000000).alias("id"), F.concat("text", F.lit(NEAR_TAIL)).alias("text"), "lang")
    )
    exact = (
        d.where(F.pmod(i, F.lit(7)) == 0)
        .select((i + 2000000).alias("id"), "text", "lang")
    )
    return base.unionByName(near).unionByName(exact)


# --------------------------------------------------------------------------- #
# exact dedup: hash-groupBy, canonical id = min(id) per group
# --------------------------------------------------------------------------- #
@query(
    "dedup_exact",
    f"""
    WITH corpus AS ({_CORPUS_SQL})
    SELECT md5(text) AS content_hash,
           min(id)::BIGINT AS canonical_id,
           count(*)::BIGINT AS n_members
    FROM corpus GROUP BY 1 HAVING count(*) > 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _corpus(spark, sf_dir)
    return (
        c.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("id").alias("canonical_id"), F.count("*").alias("n_members"))
        .where(F.col("n_members") > 1)
    )


# --------------------------------------------------------------------------- #
# MinHash + LSH near-dup: 3-shingles → 12-perm signature → 4 bands × 3 rows
# → band-bucket join → exact-Jaccard verify ≥ 0.6
# --------------------------------------------------------------------------- #
SHINGLE_K = 3
N_PERM = 12
N_BANDS = 4
ROWS_PER_BAND = 3
JACCARD_T = 0.6


def _jaccard(sa, sb):
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    return inter / (F.size(sa) + F.size(sb) - inter)


def _wide(df: DataFrame, key: str = "id") -> DataFrame:
    """Spread a per-row-heavy projection across all cores BEFORE the
    fold. The test fixtures are single-row-group parquet files, so the
    scan yields ONE non-empty split and a signature fold (simhash
    counts, minhash shingle hashing) serializes on one core — observed
    as a (5+1)/6 stage: five empty tasks, one doing everything. The
    pinned narrow exchange (explicit count → AQE cannot coalesce it)
    costs O(input bytes) once and buys fold parallelism; it earns its
    keep whenever per-row compute dwarfs shuffle IO, which holds for
    every signature fold here. At production scale a many-row-group
    scan already supplies width and this becomes a cheap reshuffle on
    the downstream join key."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, key)


@query(
    "dedup_minhash_lsh",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS (
        SELECT id,
               list_distinct({H.shingles_sql(T.tokens_sql('text'), SHINGLE_K)}) AS s
        FROM corpus
    ),
    sig AS (
        SELECT id, s, {H.minhash_sig_sql('s', N_PERM)} AS sig FROM sh
    ),
    bands AS (
        SELECT id, s, b.band, ({H.band_keys_sql('sig', N_BANDS, ROWS_PER_BAND)})[b.band + 1] AS key
        FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band) b
    ),
    cand AS (
        SELECT DISTINCT a.id AS a_id, b.id AS b_id, a.s AS sa, b.s AS sb
        FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    verified AS (
        SELECT a_id, b_id,
               len(list_intersect(sa, sb))::DOUBLE
                 / (len(sa) + len(sb) - len(list_intersect(sa, sb))) AS j
        FROM cand
    )
    SELECT a_id, b_id, round(j, 6) AS jaccard FROM verified WHERE j >= {JACCARD_T}
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fold-width exchange: shingling runs at defaultParallelism instead
    # of on the scan's one non-empty split (see _wide)
    c = _wide(_corpus(spark, sf_dir))
    # barrier 1 (repartition by id): shingle sets computed ONCE and
    # hash-partitioned by id — the exchange is reused (ReusedExchange)
    # by both shingle back-joins below, so the shingling never re-runs
    sh = (
        c.select("id", F.array_distinct(H.shingles(T.tokens("text"), SHINGLE_K)).alias("s"))
        .repartition(F.col("id"))
    )
    # barrier 2: the per-shingle base hashes (the only md5 in minhash) run
    # exactly once per doc — without it CollapseProject re-inlines the
    # hash transform into every permutation-min AND both sides of the
    # band self-join (same pathology the SimHash query documents). The
    # affine permutation mins + band keys downstream are pure arithmetic
    # over the materialized hash array, cheap to recompute per side.
    hs = sh.select("id", H.shingle_hashes(F.col("s")).alias("hs")).repartition(F.col("id"))
    # slim band rows: (id, band, key) only — the shingle arrays never
    # ride through the band-join shuffle; they are joined back by id
    # AFTER banding, when the candidate set is already tiny
    bands = hs.select(
        "id",
        # *_outer: InferFiltersFromGenerate would otherwise re-inline the
        # whole signature into a size()>0 filter pushed to the scan
        F.posexplode_outer(
            H.band_keys(H.minhash_sig_from_hashes(F.col("hs"), N_PERM), N_BANDS, ROWS_PER_BAND)
        ).alias("band", "key"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    cand = cand.join(
        sh.select(F.col("id").alias("a_id"), F.col("s").alias("sa")), "a_id"
    ).join(sh.select(F.col("id").alias("b_id"), F.col("s").alias("sb")), "b_id")
    j = _jaccard(F.col("sa"), F.col("sb"))
    return (
        cand.withColumn("j", j)
        .where(F.col("j") >= JACCARD_T)
        .select("a_id", "b_id", F.round("j", 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------- #
# SimHash near-dup: 60-bit simhash, 4×15-bit LSH segments, hamming ≤ 8
# --------------------------------------------------------------------------- #
HAMMING_T = 8


@query(
    "dedup_simhash",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    -- staged + MATERIALIZED: hash once per token, count once per doc,
    -- pack against the materialized counts column (inlining re-runs the
    -- md5 60x per token / the fold 60x per doc — ~30x slower oracle)
    tok AS MATERIALIZED (
        SELECT id, {T.tokens_sql('text')} AS toks FROM corpus
    ),
    cnt AS MATERIALIZED (
        SELECT id, len(toks)::BIGINT AS n,
               {H.simhash_counts_sql(H.simhash_hashes_sql('toks'))} AS cnt
        FROM tok
    ),
    sh AS MATERIALIZED (
        SELECT id, {H.simhash_pack_sql('cnt', 'n')} AS sim FROM cnt
    ),
    segs AS (
        SELECT id, sim, b.band, (sim >> (b.band * 15)) & 32767 AS key
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) b
    ),
    cand AS (
        SELECT DISTINCT a.id AS a_id, b.id AS b_id, a.sim AS sa, b.sim AS sb
        FROM segs a JOIN segs b ON a.band = b.band AND a.key = b.key AND a.id < b.id
    )
    SELECT a_id, b_id, bit_count(xor(sa, sb))::INT AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {HAMMING_T}
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fold-width exchange BEFORE the per-doc bit-count fold (see _wide):
    # 6.5 s → 1.1 s warm at sf0.1/local[32]
    c = _wide(_corpus(spark, sf_dir))
    toks = T.tokens("text")
    # two-stage: materialize per-bit counts once, then pack (the packing
    # expression references counts 60x — inline it and the fold re-runs
    # per bit; this split is ~10x faster)
    counted = c.select("id", H.simhash_counts(toks).alias("cnt"), F.size(toks).alias("n"))
    # repartition = optimizer barrier: without it, CollapseProject re-inlines
    # the simhash fold into both sides of the band self-join (3x slower);
    # with it the signature is computed exactly once per doc. Also the
    # right partitioning for the downstream band join at scale.
    sh = (
        counted.select("id", H.simhash_pack(F.col("cnt"), F.col("n")).alias("sim"))
        .repartition(F.col("id"))  # CollapseProject barrier (see above)
    )
    bands = F.array(*[H.simhash_band(F.col("sim"), b) for b in range(4)])
    segs = sh.select("id", "sim", F.posexplode_outer(bands).alias("band", "key"))
    a, b = segs.alias("a"), segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"),
            F.col("a.sim").alias("sa"), F.col("b.sim").alias("sb"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    ham = H.hamming60(F.col("sa"), F.col("sb"))
    return cand.where(ham <= HAMMING_T).select("a_id", "b_id", ham.cast("int").alias("hamming"))


# --------------------------------------------------------------------------- #
# exact n-gram Jaccard near-dup (blocked by lang — the brute-force baseline)
# --------------------------------------------------------------------------- #
@query(
    "dedup_ngram_jaccard",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS (
        SELECT id, lang,
               list_distinct({H.shingles_sql(T.tokens_sql('text'), SHINGLE_K)}) AS s
        FROM corpus
    ),
    pairs AS (
        SELECT a.id AS a_id, b.id AS b_id,
               len(list_intersect(a.s, b.s))::DOUBLE
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.id < b.id
        WHERE len(a.s) > 0 AND len(b.s) > 0
    )
    SELECT a_id, b_id, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.5
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _corpus(spark, sf_dir)
    sh = c.select("id", "lang", F.array_distinct(H.shingles(T.tokens("text"), SHINGLE_K)).alias("s")).where(
        F.size("s") > 0
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(b, (F.col("a.lang") == F.col("b.lang")) & (F.col("a.id") < F.col("b.id"))).select(
        F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"),
        _jaccard(F.col("a.s"), F.col("b.s")).alias("j"),
    )
    return pairs.where(F.col("j") >= 0.5).select("a_id", "b_id", F.round("j", 6).alias("jaccard"))


# --------------------------------------------------------------------------- #
# similarity search over embeddings
# --------------------------------------------------------------------------- #
DIM = 64
TOP_K = 5


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, {DIM}), "
        f"i -> ({a})[i]::DOUBLE * ({b})[i]::DOUBLE)), (acc, x) -> acc + x)"
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _cos(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _cos_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"


@query(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT q.q_id, e.vec_id AS n_id,
               {_cos_sql('q.qe', 'e.embedding')} AS sim
        FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id
    )
    SELECT q_id::BIGINT AS q_id, n_id::BIGINT AS n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC)::INT AS rank,
           round(sim, 6) AS sim
    FROM scored QUALIFY rank <= {TOP_K}
    """,
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(e.select(F.col("vec_id").alias("n_id"), "embedding"))
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", _cos(F.col("qe"), F.col("embedding")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= TOP_K)
        .select(
            F.col("q_id").cast("long"), F.col("n_id").cast("long"),
            "rank", F.round("sim", 6).alias("sim"),
        )
    )


# LSH-bucketed ANN: bucket = sign bits of the first 6 dims (axis-aligned
# random-hyperplane LSH with pinned hyperplanes so both engines agree);
# candidates share the bucket — the scale path vs the brute-force baseline.
N_SIGN_BITS = 6


def _bucket_sql(e: str) -> str:
    bits = " + ".join(
        f"(CASE WHEN ({e})[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)" for i in range(N_SIGN_BITS)
    )
    return f"({bits})"


def _bucket(e) -> F.Column:
    b = F.lit(0)
    for i in range(N_SIGN_BITS):
        b = b + F.when(F.get(e, i) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


@query(
    "ann_lsh_bucket",
    f"""
    WITH b AS (
        SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, embedding AS qe, bucket FROM b WHERE vec_id < 20),
    scored AS (
        SELECT q.q_id, e.vec_id AS n_id,
               {_cos_sql('q.qe', 'e.embedding')} AS sim
        FROM q JOIN b e ON e.bucket = q.bucket AND e.vec_id <> q.q_id
    )
    SELECT q_id::BIGINT AS q_id, n_id::BIGINT AS n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC)::INT AS rank,
           round(sim, 6) AS sim
    FROM scored QUALIFY rank <= 3
    """,
)
def q_ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    b = e.select("vec_id", "embedding", _bucket(F.col("embedding")).alias("bucket"))
    q = b.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(b.select(F.col("vec_id").alias("n_id"), "embedding", "bucket"), "bucket")
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", _cos(F.col("qe"), F.col("embedding")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select(
            F.col("q_id").cast("long"), F.col("n_id").cast("long"),
            "rank", F.round("sim", 6).alias("sim"),
        )
    )


# --------------------------------------------------------------------------- #
# embedding-cosine near-dup: LSH sign-bucket join (same bucket key as
# ann_lsh_bucket) → exact cosine verify ≥ threshold. The embedding-space
# twin of MinHash/SimHash: candidates only within a bucket, never
# all-pairs — the pair count is Σ_b n_b², not n². Like the text dedup
# corpus, positives are planted deterministically: exact copies
# (vec_id%11==0) and first-component +0.25 perturbations (vec_id%7==0,
# cosine ≈ 0.97 on these unit vectors). A perturbation that flips the
# first sign bit lands in another bucket and is honestly missed — LSH
# recall < 1 by design, identically in both engines.
# --------------------------------------------------------------------------- #
COS_DUP_T = 0.9

_ECORPUS_SQL = f"""
    SELECT vec_id::BIGINT AS id, list_transform(embedding, x -> x::DOUBLE) AS v
    FROM embeddings
    UNION ALL
    SELECT vec_id::BIGINT + 100000,
           list_transform(generate_series(1, {DIM}),
             i -> CASE WHEN i = 1 THEN embedding[1]::DOUBLE + 0.25
                       ELSE embedding[i]::DOUBLE END)
    FROM embeddings WHERE vec_id % 7 = 0
    UNION ALL
    SELECT vec_id::BIGINT + 200000, list_transform(embedding, x -> x::DOUBLE)
    FROM embeddings WHERE vec_id % 11 = 0
"""


def _ecorpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    i = F.col("vec_id").cast("long")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    pert = F.zip_with(
        "embedding",
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda x, j: F.when(j == 1, x.cast("double") + 0.25).otherwise(x.cast("double")),
    )
    base = e.select(i.alias("id"), dbl.alias("v"))
    near = e.where(F.pmod(i, F.lit(7)) == 0).select((i + 100000).alias("id"), pert.alias("v"))
    exact = e.where(F.pmod(i, F.lit(11)) == 0).select((i + 200000).alias("id"), dbl.alias("v"))
    return base.unionByName(near).unionByName(exact)


@query(
    "dedup_embedding",
    f"""
    WITH corpus AS ({_ECORPUS_SQL}),
    b AS (
        SELECT id, v, {_bucket_sql('v')} AS bucket FROM corpus
    ),
    pairs AS (
        SELECT a.id AS a_id, e.id AS b_id,
               {_cos_sql('a.v', 'e.v')} AS c
        FROM b a JOIN b e ON a.bucket = e.bucket AND a.id < e.id
    )
    SELECT a_id, b_id, round(c, 6) AS cosine
    FROM pairs WHERE c >= {COS_DUP_T}
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _ecorpus(spark, sf_dir)
    # pinned exchange on the JOIN key: acts as the CollapseProject
    # barrier (bucket computed once), spreads the Σ_b n_b² cosine verify
    # across defaultParallelism tasks (AQE coalesced the unpinned
    # exchange to ONE task at test scale), and both self-join sides
    # reuse the same shuffle (ReusedExchange)
    par = spark.sparkContext.defaultParallelism
    b = c.select("id", "v", _bucket(F.col("v")).alias("bucket")).repartition(par, "bucket")
    a, e = b.alias("a"), b.alias("b")
    pairs = a.join(
        e,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"),
        _cos(F.col("a.v"), F.col("b.v")).alias("c"),
    )
    return pairs.where(F.col("c") >= COS_DUP_T).select(
        "a_id", "b_id", F.round("c", 6).alias("cosine"),
    )


# --------------------------------------------------------------------------- #
# IVF ANN: coarse quantizer with PINNED centroids (the first N_CELLS
# vectors by vec_id — deterministic, no trained k-means state to ship
# cross-engine), cell assignment by max cosine, query probes its
# N_PROBE nearest cells, exact re-rank inside the probed cells. The
# second scale path next to the sign-bit LSH bucket join: cells bound
# the candidate set to ~n*nprobe/n_cells per query.
# --------------------------------------------------------------------------- #
N_CELLS = 8
N_PROBE = 2

_IVF_SIMS_SQL = (
    f"list_transform(generate_series(0, {N_CELLS - 1}), "
    f"ci -> {_cos_sql('c.cent[ci + 1]', 'e.embedding')})"
)
_IVF_MASKED_SQL = (
    f"list_transform(generate_series(1, {N_CELLS}), "
    "mi -> CASE WHEN mi = list_position(sims, list_max(sims)) "
    "THEN -2.0 ELSE sims[mi] END)"
)


@query(
    "ann_ivf_probe",
    f"""
    WITH cents AS (
        SELECT list(list_transform(embedding, x -> x::DOUBLE) ORDER BY vec_id) AS cent
        FROM embeddings WHERE vec_id < {N_CELLS}
    ),
    assigned AS (
        SELECT e.vec_id, e.embedding, {_IVF_SIMS_SQL} AS sims
        FROM embeddings e, cents c
    ),
    cells AS (
        SELECT vec_id, embedding,
               (list_position(sims, list_max(sims)) - 1)::INT AS cell
        FROM assigned
    ),
    qprobe AS (
        SELECT vec_id AS q_id, embedding AS qe, unnest([
            (list_position(sims, list_max(sims)) - 1)::INT,
            (list_position({_IVF_MASKED_SQL}, list_max({_IVF_MASKED_SQL})) - 1)::INT
        ]) AS cell
        FROM assigned WHERE vec_id < 10
    ),
    scored AS (
        SELECT qp.q_id, c.vec_id AS n_id, {_cos_sql('qp.qe', 'c.embedding')} AS sim
        FROM qprobe qp JOIN cells c ON c.cell = qp.cell AND c.vec_id <> qp.q_id
    )
    SELECT q_id::BIGINT AS q_id, n_id::BIGINT AS n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC)::INT AS rank,
           round(sim, 6) AS sim
    FROM scored QUALIFY rank <= 3
    """,
)
def q_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    cents = [
        r.embedding
        for r in e.where(F.col("vec_id") < N_CELLS).orderBy("vec_id").collect()
    ]
    # per-row cosine against each pinned centroid (broadcast as literals)
    sims = F.array(*[
        _cos(F.array(*[F.lit(float(x)) for x in cv]), F.col("embedding"))
        for cv in cents
    ])
    # fold-width exchange before the 8×64-dim per-row centroid cosines
    # (see _wide), then a PINNED barrier after them: cells and qprobe
    # both consume `assigned`, so the exchange materializes sims once
    # (ReusedExchange) instead of recomputing per consumer — and AQE
    # cannot coalesce it to one task under the broadcast probe join
    par = spark.sparkContext.defaultParallelism
    assigned = _wide(e, key="vec_id").select(
        "vec_id", "embedding", sims.alias("sims")
    ).repartition(par, "vec_id")
    best = F.array_position(F.col("sims"), F.array_max("sims")) - 1
    masked = F.transform(
        F.sequence(F.lit(1), F.lit(N_CELLS)),
        lambda i: F.when(
            i == F.array_position(F.col("sims"), F.array_max("sims")), F.lit(-2.0)
        ).otherwise(F.element_at("sims", i.cast("int"))),
    )
    second = F.array_position(masked, F.array_max(masked)) - 1
    cells = assigned.select("vec_id", "embedding", best.cast("int").alias("cell"))
    qprobe = (
        assigned.where(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"),
            F.explode(F.array(best.cast("int"), second.cast("int"))).alias("cell"),
        )
    )
    scored = (
        F.broadcast(qprobe)
        .join(cells, "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("n_id"), _cos(F.col("qe"), F.col("embedding")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select(
            F.col("q_id").cast("long"), F.col("n_id").cast("long"),
            "rank", F.round("sim", 6).alias("sim"),
        )
    )


# --------------------------------------------------------------------------- #
# BM25 ranking (reference BM25ContentFilter parameterization: P2)
# --------------------------------------------------------------------------- #
BM25_TERMS = ["data", "spark", "table"]  # fixed order = summation order
K1, B = 1.2, 0.75


@query(
    "bm25_rank",
    (lambda toks=T.tokens_sql("text"): f"""
    WITH base AS (
        SELECT doc_id::BIGINT AS doc_id, len({toks}) AS dl,
               {', '.join(
                   f"len(list_filter({toks}, w -> lower(w) = '{t}')) AS tf{i}"
                   for i, t in enumerate(BM25_TERMS)
               )}
        FROM documents
    ),
    stats AS (
        SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE / count(*) AS avgdl,
               {', '.join(
                   f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
                   for i in range(len(BM25_TERMS))
               )}
        FROM base
    )
    SELECT doc_id,
           round({' + '.join(
               f"(ln((stats.n - df{i} + 0.5) / (df{i} + 0.5) + 1) * tf{i} * {K1 + 1}"
               f" / (tf{i} + {K1} * (1 - {B} + {B} * dl / stats.avgdl)))"
               for i in range(len(BM25_TERMS))
           )}, 4) AS bm25
    FROM base, stats
    WHERE {' + '.join(f'tf{i}' for i in range(len(BM25_TERMS)))} > 0
    """)(),
)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    # fold-width exchange before the 4 per-doc tokenizations, then a
    # reuse barrier after: `base` feeds BOTH the corpus-stats agg and
    # the final scoring join — the barrier makes the second consumer a
    # ReusedExchange instead of re-tokenizing (see _wide)
    wide = _wide(d.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
                 key="doc_id")
    base = wide.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[
            # eagerly evaluated inside the comprehension — no late binding
            F.size(F.filter(toks, lambda w: F.lower(w) == F.lit(t))).alias(f"tf{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    base = _wide(base, key="doc_id")
    stats = base.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).cast("double").alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(BM25_TERMS)):
        tf = F.col(f"tf{i}").cast("double")
        df = F.col(f"df{i}")
        idf = F.log((F.col("n") - df + 0.5) / (df + 0.5) + 1)
        part = idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
        score = part if score is None else score + part
    tf_any = sum(F.col(f"tf{i}") for i in range(len(BM25_TERMS)))
    return j.where(tf_any > 0).select("doc_id", F.round(score, 4).alias("bm25"))


# --------------------------------------------------------------------------- #
# text normalization: the standard pre-dedup cleanup pass — lowercase,
# strip control chars, collapse whitespace runs, trim. Input is the word
# soup MADE messy deterministically (tabs/CRs/NBSP-ish injections keyed
# on doc_id) so the normalizer has real work; output is hash-compared.
# Pure column exprs — at 100 TB this runs inside the scan projection.
# --------------------------------------------------------------------------- #
_MESSY_TEXT_SQL = r"""
    ('  ' || (CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END)
          || (CASE WHEN doc_id % 3 = 0 THEN chr(9) || chr(13) || 'Tail  Words' ELSE '' END)
          || (CASE WHEN doc_id % 5 = 0 THEN chr(11) || chr(12) ELSE '' END) || ' ')
"""


@query(
    "text_normalize",
    f"""
    SELECT doc_id::BIGINT AS doc_id,
           -- explicit class: RE2's \\s excludes \\x0B (vertical tab),
           -- Java's includes it — spell the set out so engines agree
           trim(regexp_replace(lower({_MESSY_TEXT_SQL}), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS text_norm
    FROM documents
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    messy = F.concat(
        F.lit("  "),
        F.when(F.pmod(i, F.lit(2)) == 0, F.upper("text")).otherwise(F.col("text")),
        F.when(F.pmod(i, F.lit(3)) == 0, F.concat(F.lit("\t\r"), F.lit("Tail  Words"))).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(5)) == 0, F.lit("\x0b\x0c")).otherwise(F.lit("")),
        F.lit(" "),
    )
    norm = F.trim(F.regexp_replace(F.lower(messy), "[ \\t\\n\\r\\f\\x0B]+", " "))
    return d.select(i.alias("doc_id"), norm.alias("text_norm"))


# --------------------------------------------------------------------------- #
# Gopher-style repetition quality signal: fraction of all word bigrams
# taken by the most frequent bigram (high → boilerplate/spam). Shape:
# explode bigrams → per-(doc,gram) counts → per-doc max / total — two
# partial-aggregating groupBys, no per-row Python, no window.
# --------------------------------------------------------------------------- #
@query(
    "repetition_score",
    f"""
    WITH grams AS (
        SELECT doc_id::BIGINT AS doc_id, g.g AS gram
        FROM documents,
             unnest({H.shingles_sql(T.tokens_sql('text'), 2)}) AS g(g)
    ),
    counts AS (
        SELECT doc_id, gram, count(*)::BIGINT AS n FROM grams GROUP BY 1, 2
    )
    SELECT doc_id,
           sum(n)::BIGINT AS n_bigrams,
           max(n)::BIGINT AS top_bigram_n,
           round(max(n)::DOUBLE / sum(n), 6) AS top_frac
    FROM counts GROUP BY doc_id
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(H.shingles(T.tokens("text"), 2)).alias("gram"),
    )
    counts = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("n"))
    return counts.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.max("n").alias("top_bigram_n"),
        F.round(F.max("n").cast("double") / F.sum("n"), 6).alias("top_frac"),
    )


# --------------------------------------------------------------------------- #
# K4: top-N keywords per group (stopword-filtered term counts)
# --------------------------------------------------------------------------- #
TOP_TERMS = 5


@query(
    "keywords_topn",
    f"""
    WITH terms AS (
        SELECT lang, lower(u.w) AS term
        FROM documents, unnest({T.tokens_sql('text')}) AS u(w)
        WHERE lower(u.w) NOT IN ({', '.join(f"'{w}'" for w in T.STOPWORDS)})
          AND regexp_matches(lower(u.w), '^[a-z]{{2,}}$')
    ),
    counted AS (
        SELECT lang, term, count(*)::BIGINT AS cnt FROM terms GROUP BY 1, 2
    )
    SELECT lang, term, cnt,
           row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term ASC)::INT AS rk
    FROM counted QUALIFY rk <= {TOP_TERMS}
    """,
)
def q_keywords_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    terms = (
        d.select("lang", F.explode(T.tokens("text")).alias("w"))
        .select("lang", F.lower("w").alias("term"))
        .where(~F.col("term").isin(T.STOPWORDS) & F.col("term").rlike("^[a-z]{2,}$"))
    )
    counted = terms.groupBy("lang", "term").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("term").asc())
    return (
        counted.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= TOP_TERMS)
    )


# --------------------------------------------------------------------------- #
# C5: sliding-window chunking (word windows, size 20 step 10 — reference
# semantics: tail words beyond the last full window are dropped)
# --------------------------------------------------------------------------- #
WIN, STEP = 20, 10


@query(
    "chunk_sliding",
    f"""
    WITH toks AS (
        SELECT doc_id::BIGINT AS doc_id, {T.tokens_sql('text')} AS t FROM documents
    )
    SELECT doc_id, w.i::INT AS chunk_id,
           (CASE WHEN len(t) <= {WIN} THEN array_to_string(t, ' ')
                 ELSE array_to_string(list_slice(t, w.i * {STEP} + 1, w.i * {STEP} + {WIN}), ' ')
            END) AS chunk
    FROM toks,
         unnest(generate_series(0, (CASE WHEN len(t) <= {WIN} THEN 0
                                         ELSE floor((len(t) - {WIN}) / {STEP})::BIGINT END))) AS w(i)
    """,
)
def q_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.col("doc_id").cast("long").alias("doc_id"), T.tokens("text").alias("t"))
    n = F.size("t")
    n_win = F.when(n <= WIN, F.lit(0)).otherwise(F.floor((n - WIN) / STEP)).cast("int")
    return toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_win)).alias("chunk_id"),
        "t",
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int"),
        F.when(F.size("t") <= WIN, F.array_join("t", " "))
        .otherwise(F.array_join(F.slice("t", F.col("chunk_id") * STEP + 1, WIN), " "))
        .alias("chunk"),
    )


# --------------------------------------------------------------------------- #
# C4: regex chunking — split on a pattern, strip, drop empties, re-index
# (reference text_chunking.py:398-441)
# --------------------------------------------------------------------------- #
CHUNK_PATTERN = "data"


@query(
    "chunk_regex",
    f"""
    WITH split_docs AS (
        SELECT doc_id::BIGINT AS doc_id,
               list_filter(list_transform(string_split_regex(text, '{CHUNK_PATTERN}'),
                                          p -> trim(p)), p -> p <> '') AS chunks
        FROM documents
    )
    SELECT doc_id, (i.i - 1)::INT AS chunk_id, chunks[i.i] AS chunk
    FROM split_docs, unnest(generate_series(1, len(chunks))) AS i(i)
    """,
)
def q_chunk_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    chunks = F.filter(
        F.transform(F.split("text", CHUNK_PATTERN), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "chunk"),
    ).select("doc_id", F.col("chunk_id").cast("int"), "chunk")


# --------------------------------------------------------------------------- #
# K3-adjacent: per-label embedding centroid. BOTH engines compute the
# 2^-40-QUANTIZED mean: each element is floor(x * 2^40) in int64, summed
# with a plain groupBy (associative + commutative → order-free, map-side
# combinable, no collect_list of all vectors into one row), then divided
# back. The quantization makes exact cross-engine agreement hold BY
# CONSTRUCTION for ANY float input — no magnitude precondition (an
# earlier version claimed int-sum == ordered-double-fold bit-for-bit,
# which required every element to be a multiple of 2^-40; real fixture
# values like 1.3e-06 violate that). The quantized mean differs from the
# true mean by < 2^-40 ≈ 9.1e-13 absolute — far below the 6-decimal
# output rounding and below float32 input precision itself. Headroom:
# per-element |floor(x*2^40)| < 2^41, so int64 holds > 2^21 vectors per
# label per dim before overflow; at larger scale drop the scale factor
# or sum as decimal(38,0) — the aggregation shape is unchanged.
# --------------------------------------------------------------------------- #
_FXP = 2.0 ** 40  # power-of-two quantization scale (exact in double)
@query(
    "embed_centroid",
    f"""
    SELECT label::BIGINT AS label, count(*)::BIGINT AS n,
           {', '.join(
               f"round((sum(CAST(floor(embedding[{i + 1}]::DOUBLE * {_FXP!r}) AS BIGINT))::DOUBLE"
               f" / {_FXP!r}) / count(*), 6) AS c{i}"
               for i in range(4))}
    FROM embeddings GROUP BY label
    """,
)
def q_embed_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    # fixed-point int64 per-dim sums: one hash agg with map-side partial
    # combine; vectors never collect into a single row (scale path)
    fx = [
        F.sum(F.floor(F.get("embedding", i).cast("double") * F.lit(_FXP)).cast("long")).alias(f"s{i}")
        for i in range(4)
    ]
    summed = e.groupBy("label").agg(F.count("*").alias("n"), *fx)
    return summed.select(
        F.col("label").cast("long").alias("label"), "n",
        *[
            F.round((F.col(f"s{i}").cast("double") / F.lit(_FXP)) / F.col("n"), 6).alias(f"c{i}")
            for i in range(4)
        ],
    )


# --------------------------------------------------------------------------- #
# PII redaction: the standard pre-training scrub pass — emails, phone
# numbers, IPv4s replaced with typed placeholder tokens. PII is INJECTED
# deterministically (keyed on doc_id) so the redactor has real work and
# both engines derive byte-identical inputs; counts + redacted text are
# hash-compared. Pure regexp column exprs — runs inside the scan
# projection at 100 TB, no shuffle.
# --------------------------------------------------------------------------- #
_EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RX = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"
_IP_RX = r"([0-9]{1,3}\.){3}[0-9]{1,3}"

_PII_TEXT_SQL = """
    (text
     || (CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || doc_id::VARCHAR || '@mail' || (doc_id % 7)::VARCHAR || '.example.org now'
              ELSE '' END)
     || (CASE WHEN doc_id % 4 = 0
              THEN ' call +' || (100 + doc_id % 900)::VARCHAR || '-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
              ELSE '' END)
     || (CASE WHEN doc_id % 5 = 0
              THEN ' from 10.' || (doc_id % 256)::VARCHAR || '.0.' || (doc_id % 250)::VARCHAR
              ELSE '' END))
"""


@query(
    "pii_redact",
    f"""
    WITH base AS (SELECT doc_id::BIGINT AS doc_id, {_PII_TEXT_SQL} AS t FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RX}'))::BIGINT AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RX}'))::BIGINT AS n_phones,
           len(regexp_extract_all(t, '{_IP_RX}'))::BIGINT AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(t,
               '{_EMAIL_RX}', '<EMAIL>', 'g'),
               '{_PHONE_RX}', '<PHONE>', 'g'),
               '{_IP_RX}', '<IP>', 'g') AS redacted
    FROM base
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    t = F.concat(
        F.col("text"),
        F.when(F.pmod(i, F.lit(3)) == 0, F.concat(
            F.lit(" contact user"), i.cast("string"), F.lit("@mail"),
            F.pmod(i, F.lit(7)).cast("string"), F.lit(".example.org now"))).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(4)) == 0, F.concat(
            F.lit(" call +"), (F.lit(100) + F.pmod(i, F.lit(900))).cast("string"),
            F.lit("-555-"), F.lpad(F.pmod(i, F.lit(10000)).cast("string"), 4, "0"))).otherwise(F.lit("")),
        F.when(F.pmod(i, F.lit(5)) == 0, F.concat(
            F.lit(" from 10."), F.pmod(i, F.lit(256)).cast("string"),
            F.lit(".0."), F.pmod(i, F.lit(250)).cast("string"))).otherwise(F.lit("")),
    )
    red = F.regexp_replace(F.regexp_replace(F.regexp_replace(
        t, _EMAIL_RX, "<EMAIL>"), _PHONE_RX, "<PHONE>"), _IP_RX, "<IP>")
    return d.select(
        i.alias("doc_id"),
        F.regexp_count(t, F.lit(_EMAIL_RX)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(_PHONE_RX)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(_IP_RX)).cast("long").alias("n_ips"),
        red.alias("redacted"),
    )


# --------------------------------------------------------------------------- #
# sequence packing: pretraining-style document concatenation into fixed
# token-budget packs, PER SOURCE SHARD (the scale-safe unit — a global
# pack order would be one serial cumsum; per-source windows parallelize
# across shards exactly like per-file packing in a real pipeline).
# pack_id = exclusive-prefix-sum(tokens) / budget within (source, doc_id
# order); offset_in_pack = that prefix sum mod budget.
# --------------------------------------------------------------------------- #
PACK_BUDGET = 64
PACK_BLOCK = 128  # docs per prefix-sum block (sub-shard of a source)


def pack_prefix(base: DataFrame, value_col: str,
                order_col: str = "doc_id",
                block: int = PACK_BLOCK) -> tuple[DataFrame, "F.Column"]:
    """Two-level exclusive prefix sum of ``value_col`` within ``source``
    in ``order_col`` order — the scale path for sequence packing (r3
    verdict: a single per-source window is one serial cumsum per source,
    so a 3-mega-source corpus runs 3 tasks).

    Level 1: in-block exclusive prefix via a window over (source,
    doc_id // block) — parallelism = #blocks, not #sources. Level 2:
    per-source exclusive prefix over the BLOCK TOTALS (#blocks rows,
    O(n/block) — the only serial-per-source piece). The block-offset
    join keys on (source, block), the same key as level 1's exchange, so
    it co-partitions rather than reshuffling the doc table. Identical
    output to the single-window form by associativity of +, since
    (block asc, order asc) == (order asc) within a source.

    Returns (df_with_internal_cols, exclusive_prefix_column)."""
    from pyspark.sql import Window as W

    b = base.withColumn(
        "_blk", F.floor(F.col(order_col) / F.lit(block)).cast("long"))
    totals = b.groupBy("source", "_blk").agg(
        F.sum(value_col).alias("_bt"))
    w_blk = (W.partitionBy("source").orderBy("_blk")
             .rowsBetween(W.unboundedPreceding, -1))
    offs = totals.select(
        "source", "_blk",
        F.coalesce(F.sum("_bt").over(w_blk), F.lit(0)).alias("_boff"))
    j = b.join(offs, ["source", "_blk"])
    w_in = (W.partitionBy("source", "_blk").orderBy(order_col)
            .rowsBetween(W.unboundedPreceding, -1))
    pre = F.col("_boff") + F.coalesce(F.sum(value_col).over(w_in), F.lit(0))
    return j, pre


@query(
    "seq_pack",
    f"""
    WITH toks AS (
        SELECT doc_id::BIGINT AS doc_id, source,
               len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> ''))::BIGINT AS n_tokens
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           (coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {PACK_BUDGET})::BIGINT AS pack_id,
           (coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % {PACK_BUDGET})::BIGINT AS offset_in_pack
    FROM toks
    """,
)
def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    n_tok = T.token_count_ws("text").cast("long")
    base = d.select(i.alias("doc_id"), "source", n_tok.alias("n_tokens"))
    j, pre = pack_prefix(base, "n_tokens")
    return j.select(
        "doc_id", "source", "n_tokens",
        F.floor(pre / PACK_BUDGET).cast("long").alias("pack_id"),
        F.pmod(pre, F.lit(PACK_BUDGET)).cast("long").alias("offset_in_pack"),
    )


# --------------------------------------------------------------------------- #
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
# cluster-then-prune. Embeddings are assigned to their max-cosine
# cluster (PINNED centroids — the first SEM_CELLS corpus vectors by id,
# no trained k-means state to ship cross-engine; production swaps in
# trained centroids, same plan — and the CELL COUNT must grow with the
# corpus, K ~ N/B for a bounded per-cell size B, exactly as the paper
# runs 50k clusters over LAION: with K fixed the pair count degrades
# toward all-pairs); within each cluster, pairs above the
# cosine threshold form duplicate groups and the member CLOSEST to the
# centroid is dropped (the paper keeps low-centroid-sim outliers —
# they carry the cluster's diversity). Scale shape: candidate pairs are
# Σ n_cell² (bounded by the clustering), never n²; centroid broadcast
# is O(SEM_CELLS); only (id, cell, cent_sim, v) shuffles.
# Complements dedup_embedding (LSH pair-finding): SemDeDup emits a
# KEEP-LIST over semantic clusters, not a pair list.
# --------------------------------------------------------------------------- #
SEM_CELLS = 8
SEMDEDUP_T = 0.92

_SEM_SIMS_SQL = (
    f"list_transform(generate_series(0, {SEM_CELLS - 1}), "
    f"ci -> {_cos_sql('c.cent[ci + 1]', 'o.v')})"
)


@query(
    "semdedup",
    f"""
    WITH corpus AS ({_ECORPUS_SQL}),
    cents AS (
        SELECT list(v ORDER BY id) AS cent FROM corpus WHERE id < {SEM_CELLS}
    ),
    cells AS MATERIALIZED (
        SELECT id, v,
               (list_position(sims, list_max(sims)) - 1)::INT AS cell,
               list_max(sims) AS cent_sim
        FROM (SELECT o.id, o.v, {_SEM_SIMS_SQL} AS sims FROM corpus o, cents c)
    ),
    drops AS (
        SELECT DISTINCT CASE WHEN a.cent_sim > b.cent_sim THEN a.id
                             WHEN b.cent_sim > a.cent_sim THEN b.id
                             ELSE greatest(a.id, b.id) END AS id
        FROM cells a JOIN cells b ON a.cell = b.cell AND a.id < b.id
        WHERE {_cos_sql('a.v', 'b.v')} >= {SEMDEDUP_T}
    )
    SELECT c.id::BIGINT AS id, c.cell, round(c.cent_sim, 6) AS cent_sim,
           (d.id IS NULL) AS keep
    FROM cells c LEFT JOIN drops d ON c.id = d.id
    """,
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _ecorpus(spark, sf_dir)
    cents = [
        r.v for r in c.where(F.col("id") < SEM_CELLS).orderBy("id").collect()
    ]
    sims = F.array(*[
        _cos(F.array(*[F.lit(float(x)) for x in cv]), F.col("v"))
        for cv in cents
    ])
    par = spark.sparkContext.defaultParallelism
    # fold-width exchange before the SEM_CELLS×DIM per-row centroid
    # cosines (_wide), then a PINNED cell-keyed barrier after: the
    # self-join's two sides and the final keep-join all consume `cells`
    # through one ReusedExchange instead of re-folding per consumer,
    # and AQE cannot coalesce the Σ n_cell² verify onto one task.
    assigned = _wide(c, key="id").select("id", "v", sims.alias("sims"))
    best = (F.array_position(F.col("sims"), F.array_max("sims")) - 1).cast("int")
    cells = assigned.select(
        "id", "v", best.alias("cell"), F.array_max("sims").alias("cent_sim")
    ).repartition(par, "cell")
    a, b = cells.alias("a"), cells.alias("b")
    drops = (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id")))
        .where(_cos(F.col("a.v"), F.col("b.v")) >= SEMDEDUP_T)
        .select(
            F.when(F.col("a.cent_sim") > F.col("b.cent_sim"), F.col("a.id"))
            .when(F.col("b.cent_sim") > F.col("a.cent_sim"), F.col("b.id"))
            .otherwise(F.greatest(F.col("a.id"), F.col("b.id")))
            .alias("id")
        )
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return cells.join(drops, "id", "left").select(
        F.col("id").cast("long"), "cell",
        F.round("cent_sim", 6).alias("cent_sim"),
        F.col("dropped").isNull().alias("keep"),
    )


# --------------------------------------------------------------------------- #
# script_detect — Unicode-script detection (the writing-system twin of
# lang_id: CJK/Cyrillic/Greek text defeats a Latin-n-gram language
# model, so pipelines gate on SCRIPT first and pick the lang-ID model
# per script). Counts letters per script block with codepoint-class
# regexes and picks the dominant script with a fixed tie order. The
# corpus is made genuinely multilingual by deterministic per-class
# transliteration (translate() over the vowels/common letters — same
# builtin in both engines). Pure column expressions in the scan.
# --------------------------------------------------------------------------- #
# transliteration maps cover the 11 highest-frequency letters (~75% of
# letter occurrences in English-like text) so the target script is
# genuinely DOMINANT, not a minority garnish
_SC_SRC = "aeiounstrhl"
_SC_CYR = "аеіоунстрхл"   # Cyrillic (U+0430…)
_SC_GRK = "αεηουνστρχλ"   # Greek (U+03B1…)
_SC_CJK = "中文数据处理系统分析器"  # 11 CJK chars


def _script_count(text_expr: str, lo: int, hi: int) -> str:
    # DuckDB regexp_replace replaces only the FIRST match without 'g'
    return (f"length(regexp_replace({text_expr}, "
            f"'[^{chr(lo)}-{chr(hi)}]', '', 'g'))::BIGINT")


@query(
    "script_detect",
    f"""
    WITH multi AS (
        SELECT doc_id::BIGINT AS id,
               CASE doc_id % 4
                 WHEN 1 THEN translate(coalesce(text, ''), '{_SC_SRC}', '{_SC_CYR}')
                 WHEN 2 THEN translate(coalesce(text, ''), '{_SC_SRC}', '{_SC_GRK}')
                 WHEN 3 THEN translate(coalesce(text, ''), '{_SC_SRC}', '{_SC_CJK}')
                 ELSE coalesce(text, '')
               END AS mtext
        FROM documents
    ),
    counts AS (
        SELECT id,
               length(regexp_replace(mtext, '[^A-Za-z]', '', 'g'))::BIGINT AS n_latin,
               {_script_count('mtext', 0x0400, 0x04FF)} AS n_cyrillic,
               {_script_count('mtext', 0x0370, 0x03FF)} AS n_greek,
               {_script_count('mtext', 0x4E00, 0x9FFF)} AS n_cjk
        FROM multi
    )
    SELECT id, n_latin, n_cyrillic, n_greek, n_cjk,
           (CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_greek
                      AND n_latin >= n_cjk THEN 'latin'
                 WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_cjk THEN 'cyrillic'
                 WHEN n_greek >= n_cjk THEN 'greek'
                 ELSE 'cjk' END) AS script
    FROM counts
    """,
)
def q_script_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    t = F.coalesce(F.col("text"), F.lit(""))
    mtext = (
        F.when(F.pmod(i, F.lit(4)) == 1, F.translate(t, _SC_SRC, _SC_CYR))
        .when(F.pmod(i, F.lit(4)) == 2, F.translate(t, _SC_SRC, _SC_GRK))
        .when(F.pmod(i, F.lit(4)) == 3, F.translate(t, _SC_SRC, _SC_CJK))
        .otherwise(t)
    )

    def cnt(lo: int, hi: int) -> F.Column:
        return F.length(
            F.regexp_replace(F.col("mtext"), f"[^{chr(lo)}-{chr(hi)}]", "")
        ).cast("long")

    c = d.select(i.alias("id"), mtext.alias("mtext")).select(
        "id",
        F.length(F.regexp_replace("mtext", "[^A-Za-z]", "")).cast("long").alias("n_latin"),
        cnt(0x0400, 0x04FF).alias("n_cyrillic"),
        cnt(0x0370, 0x03FF).alias("n_greek"),
        cnt(0x4E00, 0x9FFF).alias("n_cjk"),
    )
    lat, cyr, grk, cjk = (F.col(x) for x in ("n_latin", "n_cyrillic", "n_greek", "n_cjk"))
    return c.select(
        "id", "n_latin", "n_cyrillic", "n_greek", "n_cjk",
        F.when((lat >= cyr) & (lat >= grk) & (lat >= cjk), F.lit("latin"))
        .when((cyr >= grk) & (cyr >= cjk), F.lit("cyrillic"))
        .when(grk >= cjk, F.lit("greek"))
        .otherwise(F.lit("cjk")).alias("script"),
    )


# --------------------------------------------------------------------------- #
# dedup_lsh_recall — measure, don't guess (dedup tier): the banded
# MinHash pipeline's candidate RECALL against the exact all-pairs
# baseline, on the same corpus at the same τ. Because the LSH pipeline
# verifies candidates with exact Jaccard, its misses are exactly the
# true pairs whose signatures never collided in any band — the
# (1 - (1 - s^r)^b) curve made empirical. One summary row: true pairs,
# candidates generated, pairs caught, recall, and verify precision
# (caught/candidates — the wasted-verify burden). This is the offline
# gate you run when tuning (bands × rows) against a real shingle
# distribution, the dedup twin of index_champion_recall.
#
# The all-pairs side is the VERIFICATION BASELINE (quarantined to
# measurement runs, never the production dedup path) — and it must NOT
# inherit dedup_ngram_jaccard's lang-blocking: blocking is a candidate
# OPTIMIZATION, and ground truth built from an optimization undercounts
# (this corpus has cross-lang pairs above τ that the blocked baseline
# misses but LSH catches — measured recall would exceed 1 against the
# blocked "truth"). The LSH side is the flagship's exact shape
# (hash-once, slim band self-join).
# --------------------------------------------------------------------------- #
@query(
    "dedup_lsh_recall",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS MATERIALIZED (
        SELECT id, lang,
               list_distinct({H.shingles_sql(T.tokens_sql('text'), SHINGLE_K)}) AS s
        FROM corpus
    ),
    tp AS MATERIALIZED (
        SELECT a.id AS a_id, b.id AS b_id
        FROM sh a JOIN sh b ON a.id < b.id
        WHERE len(a.s) > 0 AND len(b.s) > 0
          AND len(list_intersect(a.s, b.s))::DOUBLE
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
              >= {JACCARD_T}
    ),
    sig AS (
        SELECT id, {H.minhash_sig_sql('s', N_PERM)} AS sig FROM sh
    ),
    bands AS MATERIALIZED (
        SELECT id, b.band,
               ({H.band_keys_sql('sig', N_BANDS, ROWS_PER_BAND)})[b.band + 1] AS key
        FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band) b
    ),
    cand AS MATERIALIZED (
        SELECT DISTINCT a.id AS a_id, b.id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.id < b.id
    ),
    caught AS (
        SELECT c.a_id FROM cand c JOIN tp t
          ON t.a_id = c.a_id AND t.b_id = c.b_id
    ),
    k AS (
        SELECT (SELECT count(*) FROM tp)::BIGINT AS n_true,
               (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
               (SELECT count(*) FROM caught)::BIGINT AS n_caught
    )
    SELECT n_true, n_candidates, n_caught,
           round(n_caught::DOUBLE / greatest(1, n_true), 6) AS recall,
           round(n_caught::DOUBLE / greatest(1, n_candidates), 6)
               AS verify_precision
    FROM k
    """,
)
def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _wide(_corpus(spark, sf_dir))
    sh = (
        c.select(
            "id", "lang",
            F.array_distinct(H.shingles(T.tokens("text"), SHINGLE_K)).alias("s"),
        )
        .repartition(F.col("id"))   # shingles once; reused by all consumers
    )
    a, b = sh.alias("a"), sh.alias("b")
    jac = _jaccard(F.col("a.s"), F.col("b.s"))
    tp = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .where((F.size("a.s") > 0) & (F.size("b.s") > 0) & (jac >= JACCARD_T))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
    )
    hs = sh.select("id", H.shingle_hashes(F.col("s")).alias("hs")).repartition(
        F.col("id"))
    bands = hs.select(
        "id",
        F.posexplode_outer(
            H.band_keys(
                H.minhash_sig_from_hashes(F.col("hs"), N_PERM),
                N_BANDS, ROWS_PER_BAND)
        ).alias("band", "key"),
    )
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(bb, (F.col("ba.band") == F.col("bb.band"))
                & (F.col("ba.key") == F.col("bb.key"))
                & (F.col("ba.id") < F.col("bb.id")))
        .select(F.col("ba.id").alias("a_id"), F.col("bb.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    n_true = tp.agg(F.count(F.lit(1)).alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_caught = (tp.join(cand, ["a_id", "b_id"])
                .agg(F.count(F.lit(1)).alias("n_caught")))
    one = F.lit(1).cast("long")
    return (
        n_true.crossJoin(F.broadcast(n_cand)).crossJoin(F.broadcast(n_caught))
        .select(
            "n_true", "n_candidates", "n_caught",
            F.round(F.col("n_caught").cast("double")
                    / F.greatest(one, F.col("n_true")), 6).alias("recall"),
            F.round(F.col("n_caught").cast("double")
                    / F.greatest(one, F.col("n_candidates")), 6)
            .alias("verify_precision"),
        )
    )


# --------------------------------------------------------------------------- #
# shard_pack — balanced output shards for corpus export: assign every
# document to one of SP_SHARDS shards so per-shard token totals are
# near-equal (the file layout you want when the next stage is a
# fixed-worker training job reading one shard per reader). Deterministic
# LPT ("longest processing time") approximation: order docs by
# (n_tokens DESC, doc_id ASC) and deal them out SERPENTINE
# (boustrophedon) — pass 0 fills shards 0..S-1, pass 1 fills S-1..0 —
# which bounds the imbalance by one document per pass instead of plain
# round-robin's systematic bias toward low shards. Complements seq_pack
# (which packs docs INTO fixed-budget sequences; this balances docs
# ACROSS a fixed shard count).
#
# Scale shape: the global rank the deal needs is built TWO-LEVEL (the
# pack_prefix / build_sitemaps trick): in-bucket row_number windows
# partitioned by a RANGE bucket of the sort key (bucket = n_tokens div
# SP_BLOCK, so bucket order == key order), plus bucket offsets from the
# per-bucket count table — joined via a tiny broadcast non-equi join
# (the count table is <= max_tokens/SP_BLOCK rows by construction)
# rather than a single-partition window, so no stage ever serializes.
# The final rollup is one S-row hash agg.
# --------------------------------------------------------------------------- #
SP_SHARDS = 8   # export shard count
SP_BLOCK = 8    # token-count range width per ranking bucket

_SP_SHARD_SQL = (
    f"CASE WHEN (r0 // {SP_SHARDS}) % 2 = 0 THEN r0 % {SP_SHARDS} "
    f"ELSE {SP_SHARDS - 1} - (r0 % {SP_SHARDS}) END"
)


@query(
    "shard_pack",
    f"""
    WITH t AS (
        SELECT doc_id::BIGINT AS doc_id,
               {T.token_count_ws_sql('text')}::BIGINT AS n_tokens
        FROM documents
    ),
    r AS (
        SELECT doc_id, n_tokens,
               row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) - 1
                   AS r0
        FROM t
    ),
    a AS (SELECT n_tokens, ({_SP_SHARD_SQL})::BIGINT AS shard FROM r)
    SELECT shard, count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS sum_tokens,
           min(n_tokens)::BIGINT AS min_tokens,
           max(n_tokens)::BIGINT AS max_tokens
    FROM a GROUP BY shard ORDER BY shard
    """,
)
def q_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        T.token_count_ws("text").cast("long").alias("n_tokens"),
    )
    base = base.withColumn(
        "_blk", F.floor(F.col("n_tokens") / F.lit(SP_BLOCK)).cast("long"))
    # bucket offsets: docs in strictly HIGHER buckets rank first (sort is
    # n_tokens DESC); the count table is tiny, so a broadcast non-equi
    # self-join replaces a single-partition window
    counts = base.groupBy("_blk").agg(F.count(F.lit(1)).alias("_n"))
    offs = (
        counts.alias("a")
        .join(F.broadcast(counts.alias("b")),
              F.col("b._blk") > F.col("a._blk"), "left")
        .groupBy(F.col("a._blk").alias("_blk"))
        .agg(F.coalesce(F.sum("b._n"), F.lit(0)).alias("_off"))
    )
    w_in = Window.partitionBy("_blk").orderBy(
        F.desc("n_tokens"), F.asc("doc_id"))
    ranked = (
        base.withColumn("_ir", F.row_number().over(w_in))
        .join(F.broadcast(offs), "_blk")
        .withColumn("r0", (F.col("_off") + F.col("_ir") - 1).cast("long"))
    )
    pos = F.pmod(F.col("r0"), F.lit(SP_SHARDS))
    shard = F.when(
        F.pmod(F.floor(F.col("r0") / SP_SHARDS), F.lit(2)) == 0, pos
    ).otherwise(F.lit(SP_SHARDS - 1) - pos)
    return (
        ranked.select(shard.cast("long").alias("shard"), "n_tokens")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------- #
# Product quantization (Jégou et al., PAMI 2011): the ANN-tier member
# that makes 10^10-vector search MEMORY-bounded. The 64-d float vector
# (256 B) compresses to M_SUB one-byte codes (8 B, 32x): each of M_SUB
# contiguous subspaces is quantized to its nearest of K_PQ pinned
# codewords, and search runs in the COMPRESSED domain via ADC
# (asymmetric distance computation) — the query builds one M_SUB x K_PQ
# table of subspace distances, then every corpus vector scores as
# M_SUB table lookups, never touching raw floats. Complements the
# existing family: ann_cosine_topk (exact baseline), ann_lsh_bucket /
# ann_ivf_probe (candidate pruning); PQ prunes BYTES, not candidates —
# production composes IVF cells with PQ codes (IVF-PQ). Codebooks are
# pinned per the IVF/SemDeDup convention (subvectors of the first K_PQ
# corpus vectors; production swaps in k-means-trained ones, same plan)
# — and as with SemDeDup's cells, a real deployment grows K_PQ/M_SUB
# with corpus size and trains per-subspace, which only changes the
# broadcast literals.
#
# Scale shape: encoding is one embarrassingly-parallel projection
# (nested array HOFs in codegen, no shuffle); the codebook is a
# broadcast literal (K_PQ * DIM doubles); ADC joins the 10-row query
# table (with its distance table prebuilt per query) to codes as a
# broadcast nested-loop — at 10^10 vectors the corpus side streams
# codes only (8 B/row). All distance arithmetic is ORDERED double
# folds (never a groupBy float sum), so DuckDB certifies the ranking
# bit-for-bit.
# --------------------------------------------------------------------------- #
M_SUB = 8                 # subspaces
SUB_DIM = DIM // M_SUB    # dims per subspace
K_PQ = 16                 # codewords per subspace
PQ_NQ = 10                # query rows (vec_id < PQ_NQ)
PQ_R = 50                 # ADC shortlist size for the re-rank recall gate


def _l2sub_sql(a: str, b: str) -> str:
    """Squared L2 over subspace ``s`` (an in-scope SQL var, 0-based) —
    ordered fold, same shape as _dot_sql."""
    d = f"(({a})[s * {SUB_DIM} + i]::DOUBLE - ({b})[s * {SUB_DIM} + i]::DOUBLE)"
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, {SUB_DIM}), i -> {d} * {d})), "
        f"(acc, x) -> acc + x)"
    )


def _l2_sql(a: str, b: str) -> str:
    d = f"(({a})[i]::DOUBLE - ({b})[i]::DOUBLE)"
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(generate_series(1, {DIM}), i -> {d} * {d})), "
        f"(acc, x) -> acc + x)"
    )


# shared CTE block: codes for every vector + per-query ADC tables
_PQ_CODES_SQL = f"""
    e AS (SELECT vec_id::BIGINT AS id,
                 list_transform(embedding, x -> x::DOUBLE) AS v
          FROM embeddings),
    cb AS (SELECT list(v ORDER BY id) AS c FROM e WHERE id < {K_PQ}),
    dists AS MATERIALIZED (
        SELECT e.id, g.s, k.k, {_l2sub_sql('c.c[k.k]', 'e.v')} AS d
        FROM e CROSS JOIN cb c
             CROSS JOIN generate_series(0, {M_SUB - 1}) g(s)
             CROSS JOIN generate_series(1, {K_PQ}) k(k)
    ),
    codes AS MATERIALIZED (
        SELECT id, list(k ORDER BY s) AS code FROM (
            SELECT id, s, k,
                   row_number() OVER (PARTITION BY id, s
                                      ORDER BY d ASC, k ASC) AS rn
            FROM dists) t
        WHERE rn = 1 GROUP BY id
    ),
    qtabs AS MATERIALIZED (
        SELECT q_id, list(dk ORDER BY s) AS qd FROM (
            SELECT id AS q_id, s, list(d ORDER BY k) AS dk
            FROM dists WHERE id < {PQ_NQ} GROUP BY id, s) t
        GROUP BY q_id
    )
"""

_PQ_ADIST_SQL = (
    f"list_reduce(list_prepend(0.0::DOUBLE, "
    f"list_transform(generate_series(1, {M_SUB}), "
    f"s -> (t.qd)[s][(c.code)[s]])), (acc, x) -> acc + x)"
)

_PQ_SQL = f"""{_PQ_CODES_SQL},
    adc AS (
        SELECT t.q_id, c.id AS n_id, {_PQ_ADIST_SQL} AS adist
        FROM qtabs t JOIN codes c ON c.id <> t.q_id
    )
"""


def _pq_sub_l2(v, cw, s):
    """Squared L2 between subspace ``s`` (0-based lambda var) of vector
    ``v`` and codeword ``cw`` — ordered fold, the _l2sub_sql twin."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(SUB_DIM)),
        F.lit(0.0),
        lambda acc, i: acc
        + (F.get(v, s * SUB_DIM + i - 1) - F.get(cw, s * SUB_DIM + i - 1))
        * (F.get(v, s * SUB_DIM + i - 1) - F.get(cw, s * SUB_DIM + i - 1)),
    )


def _pq_frames(spark: SparkSession, sf_dir: str):
    """(codes_df, queries_df): per-vector PQ codes (1-based codeword ids
    per subspace) and per-query ADC tables qd[s][k]. The codebook rides
    as a one-row broadcast (array of K_PQ vectors) and every loop is a
    runtime HOF over a sequence — NOT python-unrolled literals, which
    blow the generated processNext() past janino's 64 KB method cap at
    K_PQ >= 16 and knock the whole stage off codegen."""
    e = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cb = e.where(F.col("id") < K_PQ).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("id", "v"))),
            lambda r: r["v"],
        ).alias("cb")
    )
    ec = e.crossJoin(F.broadcast(cb))
    v, cbc = F.col("v"), F.col("cb")

    def code_s(s):
        dists = F.transform(
            F.sequence(F.lit(1), F.lit(K_PQ)),
            lambda k: _pq_sub_l2(v, F.get(cbc, k - 1), s),
        )
        return F.array_position(dists, F.array_min(dists)).cast("int")

    codes = ec.select(
        "id",
        F.transform(F.sequence(F.lit(0), F.lit(M_SUB - 1)), code_s)
        .alias("code"),
    )
    qd = F.transform(
        F.sequence(F.lit(0), F.lit(M_SUB - 1)),
        lambda s: F.transform(
            F.sequence(F.lit(1), F.lit(K_PQ)),
            lambda k: _pq_sub_l2(v, F.get(cbc, k - 1), s),
        ),
    )
    queries = ec.where(F.col("id") < PQ_NQ).select(
        F.col("id").alias("q_id"), qd.alias("qd"))
    return codes, queries


def _pq_adc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ADC scoring frame (q_id, n_id, adist) — the compressed-
    domain distance of every corpus vector to every query, scored as
    M_SUB table lookups into the per-query distance table."""
    codes, queries = _pq_frames(spark, sf_dir)
    pair = (
        F.broadcast(queries)
        .crossJoin(codes.select(F.col("id").alias("n_id"), "code"))
        .where(F.col("n_id") != F.col("q_id"))
    )
    adist = F.aggregate(
        F.sequence(F.lit(0), F.lit(M_SUB - 1)),
        F.lit(0.0),
        lambda acc, s: acc + F.get(F.get(F.col("qd"), s),
                                   F.get(F.col("code"), s) - 1),
    )
    return pair.select("q_id", "n_id", adist.alias("adist"))


@query(
    "ann_pq_adc",
    f"""
    WITH {_PQ_SQL}
    SELECT q_id::BIGINT AS q_id, n_id::BIGINT AS n_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adist ASC, n_id ASC)::INT AS rank,
           round(adist, 6) AS adist
    FROM adc QUALIFY rank <= {TOP_K}
    """,
)
def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _pq_adc_scored(spark, sf_dir)
    w = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= TOP_K)
        .select(
            F.col("q_id").cast("long"), F.col("n_id").cast("long"),
            "rank", F.round("adist", 6).alias("adist"),
        )
    )


# --------------------------------------------------------------------------- #
# ann_pq_recall — measure, don't guess (the champion/LSH convention):
# per query, recall@k of the DIRECT compressed-domain ADC ranking
# against exact squared-L2 top-k, AND recall@k of the production
# pattern — ADC retrieves a PQ_R shortlist, exact distances re-rank it
# (what IVF-PQ systems actually serve). This is the offline gate you
# run when sizing M_SUB/K_PQ/PQ_R against a real embedding
# distribution; identical arithmetic in both engines certifies the
# measurement. Measured floor on THIS corpus (near-random unit
# vectors, the hardest case for PQ — real embeddings cluster):
# direct@5 ~0.2, shortlist@50 0.60/0.72/0.78 at K_PQ 8/16/32; 1-8
# fixed-point Lloyd refinements of the pinned codebooks move
# shortlist@50 by at most +0.08 (evaluated, not worth the training
# stage here — production trains per-subspace k-means offline).
# --------------------------------------------------------------------------- #
@query(
    "ann_pq_recall",
    f"""
    WITH {_PQ_SQL},
    exact AS (
        SELECT q.id AS q_id, e.id AS n_id, {_l2_sql('q.v', 'e.v')} AS d2
        FROM e q JOIN e ON e.id <> q.id
        WHERE q.id < {PQ_NQ}
    ),
    exact_top AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY d2 ASC, n_id ASC) AS rn
            FROM exact) t WHERE rn <= {TOP_K}
    ),
    pq_rn AS (
        SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adist ASC, n_id ASC) AS rn
        FROM adc
    ),
    pq_top AS (SELECT q_id, n_id FROM pq_rn WHERE rn <= {TOP_K}),
    -- production path: ADC shortlist of PQ_R, exact re-rank to top-k
    shortlist AS (SELECT q_id, n_id FROM pq_rn WHERE rn <= {PQ_R}),
    rerank_top AS (
        SELECT q_id, n_id FROM (
            SELECT s.q_id, s.n_id,
                   row_number() OVER (PARTITION BY s.q_id
                                      ORDER BY x.d2 ASC, s.n_id ASC) AS rn
            FROM shortlist s
            JOIN exact x ON x.q_id = s.q_id AND x.n_id = s.n_id) t
        WHERE rn <= {TOP_K}
    )
    SELECT x.q_id::BIGINT AS q_id,
           count(p.n_id)::BIGINT AS n_direct,
           round(count(p.n_id)::DOUBLE / {TOP_K}, 6) AS recall_direct,
           count(r.n_id)::BIGINT AS n_rerank,
           round(count(r.n_id)::DOUBLE / {TOP_K}, 6) AS recall_rerank
    FROM exact_top x
    LEFT JOIN pq_top p ON p.q_id = x.q_id AND p.n_id = x.n_id
    LEFT JOIN rerank_top r ON r.q_id = x.q_id AND r.n_id = x.n_id
    GROUP BY x.q_id
    """,
)
def q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("id"), "embedding")

    def l2(a, b) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = e.where(F.col("id") < PQ_NQ).select(
        F.col("id").alias("q_id"), F.col("embedding").alias("qe"))
    exact = (
        F.broadcast(q)
        .crossJoin(e.select(F.col("id").alias("n_id"), "embedding"))
        .where(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", l2(F.col("qe"), F.col("embedding")).alias("d2"))
    )
    exact = exact.localCheckpoint(eager=False)  # two consumers below
    we = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("n_id"))
    exact_top = (
        exact.withColumn("rn", F.row_number().over(we))
        .where(F.col("rn") <= TOP_K).select("q_id", "n_id")
    )
    wa = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("n_id"))
    pq_rn = (
        _pq_adc_scored(spark, sf_dir)
        .withColumn("rn", F.row_number().over(wa))
        .localCheckpoint(eager=False)  # top-k + shortlist consumers
    )
    pq_top = pq_rn.where(F.col("rn") <= TOP_K).select("q_id", "n_id")
    shortlist = pq_rn.where(F.col("rn") <= PQ_R).select("q_id", "n_id")
    wr = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("n_id"))
    rerank_top = (
        shortlist.join(exact, ["q_id", "n_id"])
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= TOP_K).select("q_id", "n_id")
    )
    return (
        exact_top.alias("x")
        .join(pq_top.alias("p"),
              (F.col("p.q_id") == F.col("x.q_id"))
              & (F.col("p.n_id") == F.col("x.n_id")), "left")
        .join(rerank_top.alias("r"),
              (F.col("r.q_id") == F.col("x.q_id"))
              & (F.col("r.n_id") == F.col("x.n_id")), "left")
        .groupBy(F.col("x.q_id").alias("q_id"))
        .agg(
            F.count(F.col("p.n_id")).cast("long").alias("n_direct"),
            F.round(F.count(F.col("p.n_id")).cast("double") / TOP_K, 6)
            .alias("recall_direct"),
            F.count(F.col("r.n_id")).cast("long").alias("n_rerank"),
            F.round(F.count(F.col("r.n_id")).cast("double") / TOP_K, 6)
            .alias("recall_rerank"),
        )
    )


# --------------------------------------------------------------------------- #
# zorder_scan_pruning — file-layout economics, MEASURED: at 100 TB the
# scan you avoid is the cheapest scan, and what a reader can skip is
# decided when the WRITER orders rows into files (parquet/Iceberg keep
# per-file column min/max; a file whose [min,max] excludes the
# predicate is never opened). This query lays the events table out two
# ways — lexicographic (time bucket, then user bucket) and Z-ORDER
# (Morton bit-interleave of the two bucket keys, the Iceberg/Delta
# OPTIMIZE ZORDER strategy) — then probes every point value of EACH
# dimension against the per-file min/max ranges and reports how many
# file-opens each layout costs. Lex is optimal for the leading dim and
# worthless for the trailing one; Z-order pays a bounded factor on the
# leading dim to make BOTH dims prunable — the measured tradeoff, not
# the folklore.
#
# Scale shape: bucket + interleave are pure integer projections at the
# scan; file stats are one groupBy(layout, file); the probe sweep is a
# broadcast cross join against the 2*N_ZFILES-row stats table. No
# window, no collect, integer-exact in both engines. Production would
# hand `zcode` straight to a write's sortWithinPartitions/ORDER BY —
# this query is the decision gate for WHICH layout to write.
# --------------------------------------------------------------------------- #
Z_BITS = 4                 # bucket resolution per dimension (16 levels)
N_ZFILES = 8               # files per layout = top-3 bits of the code


def _z_interleave_sql(a: str, b: str) -> str:
    """8-bit Morton code: a's bits at odd positions, b's at even."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({a}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({b}) // {1 << i}) % 2) * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"


def _z_interleave(a: F.Column, b: F.Column) -> F.Column:
    code = F.lit(0)
    for i in range(Z_BITS):
        code = code + F.pmod(F.floor(a / (1 << i)), F.lit(2)) * (1 << (2 * i + 1))
        code = code + F.pmod(F.floor(b / (1 << i)), F.lit(2)) * (1 << (2 * i))
    return code


_Z_LEVELS = 1 << Z_BITS
_Z_SHIFT = (2 * Z_BITS) - (N_ZFILES.bit_length() - 1)   # top-3 code bits


@query(
    "zorder_scan_pruning",
    f"""
    WITH tb AS (
        SELECT min(epoch(ts)::BIGINT) AS mn, max(epoch(ts)::BIGINT) AS mx FROM events
    ),
    k AS (
        SELECT least({_Z_LEVELS - 1},
                     ((epoch(ts)::BIGINT - mn) * {_Z_LEVELS}) // (mx - mn + 1)
               )::BIGINT AS a,
               (user_id % {_Z_LEVELS})::BIGINT AS b
        FROM events, tb
    ),
    laid AS (
        SELECT 'lex' AS layout, a, b,
               ((a * {_Z_LEVELS} + b) // {1 << _Z_SHIFT})::BIGINT AS file_id
        FROM k
        UNION ALL
        SELECT 'zorder' AS layout, a, b,
               ({_z_interleave_sql('a', 'b')} // {1 << _Z_SHIFT})::BIGINT
        FROM k
    ),
    stats AS (
        SELECT layout, file_id, count(*)::BIGINT AS n_rows,
               min(a) AS min_a, max(a) AS max_a,
               min(b) AS min_b, max(b) AS max_b
        FROM laid GROUP BY layout, file_id
    )
    SELECT layout,
           count(DISTINCT file_id)::BIGINT AS n_files,
           min(n_rows)::BIGINT AS rows_min,
           max(n_rows)::BIGINT AS rows_max,
           (SELECT count(*) FROM stats s, generate_series(0, {_Z_LEVELS - 1}) p(v)
             WHERE s.layout = stats_outer.layout
               AND p.v BETWEEN s.min_a AND s.max_a)::BIGINT AS scanned_a,
           (SELECT count(*) FROM stats s, generate_series(0, {_Z_LEVELS - 1}) p(v)
             WHERE s.layout = stats_outer.layout
               AND p.v BETWEEN s.min_b AND s.max_b)::BIGINT AS scanned_b
    FROM stats stats_outer
    GROUP BY layout
    """,
)
def q_zorder_scan_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tb = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("mn"),
        F.max(F.unix_timestamp("ts")).alias("mx"),
    )
    k = ev.crossJoin(F.broadcast(tb)).select(
        F.least(
            F.lit(_Z_LEVELS - 1),
            F.floor(((F.unix_timestamp("ts") - F.col("mn")) * _Z_LEVELS)
                    / (F.col("mx") - F.col("mn") + 1)),
        ).cast("long").alias("a"),
        F.pmod(F.col("user_id"), F.lit(_Z_LEVELS)).cast("long").alias("b"),
    )
    lex = k.select(
        F.lit("lex").alias("layout"), "a", "b",
        F.floor((F.col("a") * _Z_LEVELS + F.col("b")) / (1 << _Z_SHIFT))
        .cast("long").alias("file_id"),
    )
    zed = k.select(
        F.lit("zorder").alias("layout"), "a", "b",
        F.floor(_z_interleave(F.col("a"), F.col("b")) / (1 << _Z_SHIFT))
        .cast("long").alias("file_id"),
    )
    stats = (
        lex.unionByName(zed)
        .groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("a").alias("min_a"), F.max("a").alias("max_a"),
            F.min("b").alias("min_b"), F.max("b").alias("max_b"),
        )
        .localCheckpoint(eager=False)  # rollup + probe-sweep consumers
    )
    probes = spark.range(_Z_LEVELS).select(F.col("id").alias("v"))
    sweep = (
        stats.crossJoin(F.broadcast(probes))
        .groupBy("layout")
        .agg(
            F.sum(F.col("v").between(F.col("min_a"), F.col("max_a"))
                  .cast("long")).alias("scanned_a"),
            F.sum(F.col("v").between(F.col("min_b"), F.col("max_b"))
                  .cast("long")).alias("scanned_b"),
        )
    )
    roll = stats.groupBy("layout").agg(
        F.countDistinct("file_id").cast("long").alias("n_files"),
        F.min("n_rows").cast("long").alias("rows_min"),
        F.max("n_rows").cast("long").alias("rows_max"),
    )
    return roll.join(sweep, "layout").select(
        "layout", "n_files", "rows_min", "rows_max",
        F.col("scanned_a").cast("long"), F.col("scanned_b").cast("long"),
    )


# --------------------------------------------------------------------------- #
# ann_ivfpq_probe — the composition the two tiers above exist for:
# IVF cells bound the CANDIDATE set (~n*probe/cells per query, the
# ann_ivf_probe coarse quantizer), PQ codes bound the BYTES touched per
# candidate (ADC lookups, never raw floats) — together the standard
# billion-vector serving layout (Jégou's IVFADC). Each query probes its
# N_PROBE nearest cells and ADC-scores only those cells' members.
# Scale shape: centroids broadcast (N_CELLS literals), candidate join
# keys on cell, the corpus side contributes (id, cell, code) — 8 bytes
# of payload per vector; nothing else shuffles.
# --------------------------------------------------------------------------- #
@query(
    "ann_ivfpq_probe",
    f"""
    WITH {_PQ_CODES_SQL},
    cents AS (
        SELECT list(list_transform(embedding, x -> x::DOUBLE) ORDER BY vec_id) AS cent
        FROM embeddings WHERE vec_id < {N_CELLS}
    ),
    assigned AS (
        SELECT e.vec_id, {_IVF_SIMS_SQL} AS sims
        FROM embeddings e, cents c
    ),
    cells AS (
        SELECT vec_id, (list_position(sims, list_max(sims)) - 1)::INT AS cell
        FROM assigned
    ),
    qprobe AS (
        SELECT vec_id AS q_id, unnest([
            (list_position(sims, list_max(sims)) - 1)::INT,
            (list_position({_IVF_MASKED_SQL}, list_max({_IVF_MASKED_SQL})) - 1)::INT
        ]) AS cell
        FROM assigned WHERE vec_id < {PQ_NQ}
    ),
    scored AS (
        SELECT t.q_id, c.id AS n_id, {_PQ_ADIST_SQL} AS adist
        FROM qprobe qp
        JOIN cells m ON m.cell = qp.cell AND m.vec_id <> qp.q_id
        JOIN codes c ON c.id = m.vec_id
        JOIN qtabs t ON t.q_id = qp.q_id
    )
    SELECT q_id::BIGINT AS q_id, n_id::BIGINT AS n_id,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY adist ASC, n_id ASC)::INT AS rank,
           round(adist, 6) AS adist
    FROM scored QUALIFY rank <= 3
    """,
)
def q_ann_ivfpq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    cents = [
        r.embedding
        for r in e.where(F.col("vec_id") < N_CELLS).orderBy("vec_id").collect()
    ]
    sims = F.array(*[
        _cos(F.array(*[F.lit(float(x)) for x in cv]), F.col("embedding"))
        for cv in cents
    ])
    assigned = e.select(F.col("vec_id").cast("long").alias("vec_id"),
                        sims.alias("sims"))
    best = F.array_position(F.col("sims"), F.array_max("sims")) - 1
    masked = F.transform(
        F.sequence(F.lit(1), F.lit(N_CELLS)),
        lambda i: F.when(
            i == F.array_position(F.col("sims"), F.array_max("sims")),
            F.lit(-2.0),
        ).otherwise(F.element_at("sims", i.cast("int"))),
    )
    second = F.array_position(masked, F.array_max(masked)) - 1
    cells = assigned.select("vec_id", best.cast("int").alias("cell"))
    qprobe = (
        assigned.where(F.col("vec_id") < PQ_NQ)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(F.array(best.cast("int"), second.cast("int")))
            .alias("cell"),
        )
    )
    codes, queries = _pq_frames(spark, sf_dir)
    cand = (
        cells.join(F.broadcast(qprobe), "cell")
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", F.col("vec_id").alias("n_id"))
    )
    pair = (
        cand.join(codes.withColumnRenamed("id", "n_id"), "n_id")
        .join(F.broadcast(queries), "q_id")
    )
    adist = F.aggregate(
        F.sequence(F.lit(0), F.lit(M_SUB - 1)),
        F.lit(0.0),
        lambda acc, s: acc + F.get(F.get(F.col("qd"), s),
                                   F.get(F.col("code"), s) - 1),
    )
    scored = pair.select("q_id", "n_id", adist.alias("adist"))
    w = Window.partitionBy("q_id").orderBy(F.asc("adist"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select(
            F.col("q_id").cast("long"), F.col("n_id").cast("long"),
            "rank", F.round("adist", 6).alias("adist"),
        )
    )
