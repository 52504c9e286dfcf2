"""Corpus-curation pipeline operators (round-3 tier): quality gating,
line-level dedup, benchmark decontamination, duplicate-cluster
canonicalization, and deterministic stratified sampling.

These extend the training-data surface past the reference's own
operators with the curation steps a 100 TB pretraining pipeline runs
between crawl and tokenization (the shapes published for Gopher/MassiveText
rule filtering, CCNet line dedup, and GPT-3-style eval decontamination):

- ``quality_gopher``   — MassiveText-style rule gate: word-count bounds,
  mean word length, symbol-to-word ratio, bullet/ellipsis line ratios,
  alphabetic-word ratio, stopword-presence vote. Pure column expressions
  (whole-stage codegen); every rule is a reported column so downstream
  can re-threshold without recompute.
- ``dedup_lines``      — CCNet-style cross-document line dedup: docs are
  cut into 10-token lines, a line kept only if no OTHER document contains
  the same line (md5 line hash, count-distinct docs per hash). Two
  shuffles (hash-groupBy + join back) — the canonical scale shape.
- ``decontaminate_ngram`` — flag training docs sharing any word-8-gram
  with the eval partition (deterministic holdout: base doc_id % 97 == 0);
  eval n-grams are broadcast (the eval set is always tiny next to the
  corpus), so the scan side never shuffles.
- ``dedup_minhash_cc`` — connected components over the verified
  MinHash-LSH near-dup edges (min-label propagation to fixpoint, the
  GraphFrames/large-star pattern): each near-dup CLUSTER — not just each
  pair — gets one canonical id, which is what a real dedup pass keeps.
- ``sample_stratified`` — deterministic per-language hash sampling
  (md5-bucket < per-mille rate): reproducible corpus mixing with no RNG
  state, safe to re-run incrementally at any scale.

Oracle determinism follows dataops.py: md5-derived hashes only, explicit
rounding, identical fold orders in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T
from .dataops import _CORPUS_SQL, _corpus, q_dedup_minhash_lsh
from .registry import _ORACLES, query, table as _t

# --------------------------------------------------------------------------- #
# quality_gopher — MassiveText-style rule gate
# --------------------------------------------------------------------------- #
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO, GOPHER_MWL_HI = 3.0, 10.0
GOPHER_SYMBOL_MAX = 0.1      # (# + ellipsis) per word
GOPHER_BULLET_MAX = 0.9      # lines starting with a bullet
GOPHER_ELLIPSIS_MAX = 0.3    # lines ending with ...
GOPHER_ALPHA_MIN = 0.8       # words containing a letter
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
# The published rule asks for >= 2 distinct stopwords; the synthetic corpus
# vocabulary carries only "the" from this list, so the operable floor here
# is 1 — the rule STRUCTURE (distinct-stopword vote) is what's under test.
GOPHER_STOP_MIN = 1          # distinct stopwords required


@query(
    "quality_gopher",
    f"""
    WITH t AS (
        SELECT doc_id::BIGINT AS doc_id,
               {T.tokens_sql('text')} AS w,
               regexp_split_to_array(text, '\n') AS ln
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(w)::BIGINT AS n_words,
               round((CASE WHEN len(w) > 0 THEN
                   coalesce(list_reduce(list_prepend(0::BIGINT,
                       list_transform(w, x -> length(x)::BIGINT)),
                       (a, b) -> a + b), 0)::DOUBLE / len(w)
                   ELSE 0.0 END), 6) AS mean_word_len,
               round((CASE WHEN len(w) > 0 THEN
                   (len(list_filter(w, x -> x = '#'))
                    + len(regexp_extract_all(array_to_string(w, ' '), '\\.\\.\\.')))::DOUBLE
                   / len(w) ELSE 0.0 END), 6) AS symbol_ratio,
               round((CASE WHEN len(ln) > 0 THEN
                   len(list_filter(ln, x -> regexp_matches(x, '^\\s*[-*]\\s')))::DOUBLE
                   / len(ln) ELSE 0.0 END), 6) AS bullet_ratio,
               round((CASE WHEN len(ln) > 0 THEN
                   len(list_filter(ln, x -> regexp_matches(x, '\\.\\.\\.\\s*$')))::DOUBLE
                   / len(ln) ELSE 0.0 END), 6) AS ellipsis_ratio,
               round((CASE WHEN len(w) > 0 THEN
                   len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                   / len(w) ELSE 0.0 END), 6) AS alpha_ratio,
               len(list_distinct(list_filter(w, x -> lower(x) IN
                   ({', '.join(f"'{s}'" for s in GOPHER_STOPWORDS)}))))::BIGINT AS n_stop_hits
        FROM t
    )
    SELECT *,
           (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
            AND mean_word_len BETWEEN {GOPHER_MWL_LO} AND {GOPHER_MWL_HI}
            AND symbol_ratio < {GOPHER_SYMBOL_MAX}
            AND bullet_ratio <= {GOPHER_BULLET_MAX}
            AND ellipsis_ratio <= {GOPHER_ELLIPSIS_MAX}
            AND alpha_ratio >= {GOPHER_ALPHA_MIN}
            AND n_stop_hits >= {GOPHER_STOP_MIN}) AS passes
    FROM m
    """,
)
def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    w = T.tokens("text")
    ln = F.split(F.col("text"), "\n")
    n = F.size(w)
    nl = F.size(ln)

    def ratio(num, den):
        return F.when(den > 0, F.round(num.cast("double") / den, 6)).otherwise(F.lit(0.0))

    total_chars = F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    n_symbols = (
        F.size(F.filter(w, lambda x: x == "#"))
        + F.size(F.regexp_extract_all(F.array_join(w, " "), F.lit("\\.\\.\\."), 0))
    )
    m = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.cast("long").alias("n_words"),
        ratio(total_chars, n).alias("mean_word_len"),
        ratio(n_symbols, n).alias("symbol_ratio"),
        ratio(F.size(F.filter(ln, lambda x: x.rlike("^\\s*[-*]\\s"))), nl).alias("bullet_ratio"),
        ratio(F.size(F.filter(ln, lambda x: x.rlike("\\.\\.\\.\\s*$"))), nl).alias("ellipsis_ratio"),
        ratio(F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))), n).alias("alpha_ratio"),
        F.size(
            F.array_distinct(F.filter(w, lambda x: F.lower(x).isin(GOPHER_STOPWORDS)))
        ).cast("long").alias("n_stop_hits"),
    )
    return m.withColumn(
        "passes",
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_word_len").between(GOPHER_MWL_LO, GOPHER_MWL_HI)
        & (F.col("symbol_ratio") < GOPHER_SYMBOL_MAX)
        & (F.col("bullet_ratio") <= GOPHER_BULLET_MAX)
        & (F.col("ellipsis_ratio") <= GOPHER_ELLIPSIS_MAX)
        & (F.col("alpha_ratio") >= GOPHER_ALPHA_MIN)
        & (F.col("n_stop_hits") >= GOPHER_STOP_MIN),
    )


# --------------------------------------------------------------------------- #
# dedup_lines — CCNet-style cross-document line dedup
# --------------------------------------------------------------------------- #
LINE_TOKENS = 10  # tokens per synthetic line


@query(
    "dedup_lines",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT id, {T.tokens_sql('text')} AS t FROM corpus),
    lines AS (
        SELECT id, i AS pos,
               array_to_string(t[(i * {LINE_TOKENS} + 1):((i + 1) * {LINE_TOKENS})], ' ') AS line
        FROM tok, unnest(generate_series(0,
            cast(ceil(len(t) / {LINE_TOKENS}.0) AS INT) - 1)) AS u(i)
        WHERE len(t) > 0
    ),
    hashed AS (SELECT id, pos, line, md5(line) AS h FROM lines),
    dup AS (SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT id) > 1),
    flagged AS (
        SELECT id, pos, line, h IN (SELECT h FROM dup) AS is_dup FROM hashed
    )
    SELECT id,
           count(*)::BIGINT AS n_lines,
           coalesce(sum(CASE WHEN is_dup THEN 1 ELSE 0 END), 0)::BIGINT AS n_dropped,
           coalesce(string_agg(CASE WHEN NOT is_dup THEN line END, chr(10) ORDER BY pos), '')
               AS kept_text
    FROM flagged GROUP BY id
    """,
)
def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut each doc into LINE_TOKENS-token lines; a line survives only if no
    other document contains an identical line (count-distinct docs per md5
    line hash > 1 → dropped from every doc). Scale shape: one hash-groupBy
    over (line-hash) + one join back — both shuffles are on the line hash,
    never on document text; per-doc reassembly is a bounded collect_list."""
    c = _corpus(spark, sf_dir)
    t = T.tokens("text")
    n_lines = F.ceil(F.size(t) / F.lit(float(LINE_TOKENS))).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(t, i * LINE_TOKENS + 1, LINE_TOKENS), " "),
    )
    lines = (
        c.where(F.size(t) > 0)
        .select("id", F.posexplode(lines_arr).alias("pos", "line"))
        .withColumn("h", F.md5("line"))
    )
    dup = (
        lines.groupBy("h")
        .agg(F.count_distinct("id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("h", F.lit(True).alias("is_dup"))
    )
    flagged = lines.join(dup, "h", "left").withColumn(
        "is_dup", F.coalesce(F.col("is_dup"), F.lit(False))
    )
    return flagged.groupBy("id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("is_dup"), F.struct("pos", "line"))
                    )
                ),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("kept_text"),
    )


# --------------------------------------------------------------------------- #
# decontaminate_ngram — eval-set 8-gram overlap flagging
# --------------------------------------------------------------------------- #
DECON_K = 8        # word n-gram length
EVAL_MOD = 97      # base docs with doc_id % 97 == 0 form the eval holdout

_EVAL_PRED = f"(id % {EVAL_MOD} = 0 AND id < 1000000)"


@query(
    "decontaminate_ngram",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    sh AS (
        SELECT id, list_distinct({H.shingles_sql(T.tokens_sql('text'), DECON_K)}) AS s
        FROM corpus
    ),
    ev AS (SELECT DISTINCT g FROM sh, unnest(s) AS u(g) WHERE {_EVAL_PRED}),
    tr AS (SELECT id, g FROM sh, unnest(s) AS u(g) WHERE NOT {_EVAL_PRED})
    SELECT id, count(DISTINCT g)::BIGINT AS n_hits
    FROM tr WHERE g IN (SELECT g FROM ev)
    GROUP BY id
    """,
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing any word-8-gram with the eval holdout.

    The eval side (distinct 8-grams of the holdout docs) is broadcast —
    an eval benchmark is KBs-to-MBs next to a 100 TB corpus — so the
    corpus-side n-gram scan joins map-side with zero shuffle of corpus
    data; the only shuffle is the per-doc hit count."""
    c = _corpus(spark, sf_dir)
    sh = c.select(
        "id", F.array_distinct(H.shingles(T.tokens("text"), DECON_K)).alias("s")
    )
    is_eval = (F.col("id") % EVAL_MOD == 0) & (F.col("id") < 1000000)
    ev = (
        sh.where(is_eval)
        .select(F.explode("s").alias("g"))
        .distinct()
    )
    tr = sh.where(~is_eval).select("id", F.explode("s").alias("g"))
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy("id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )


# --------------------------------------------------------------------------- #
# dedup_minhash_cc — connected components over verified near-dup edges
# --------------------------------------------------------------------------- #
CC_MAX_ITERS = 15


@query(
    "dedup_minhash_cc",
    # Reuse the dedup_minhash_lsh oracle verbatim as the edge source so the
    # two queries can never drift apart.
    f"""
    WITH RECURSIVE pairs AS ({{MINHASH_SQL}}),
    edges AS (
        SELECT a_id AS a, b_id AS b FROM pairs
        UNION
        SELECT b_id, a_id FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS n FROM edges),
    reach(src, node) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
    )
    SELECT src AS id, min(node)::BIGINT AS component_id,
           count(*)::BIGINT AS component_size
    FROM reach GROUP BY src
    """,
)
def q_dedup_minhash_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse verified MinHash-LSH near-dup PAIRS into CLUSTERS: iterative
    min-label propagation (each node takes the min label among itself and
    its neighbors) until fixpoint — the standard distributed-CC pattern
    (GraphFrames' large-star/small-star without the per-iteration
    restructuring; near-dup components are shallow, so diameter — and the
    iteration count — is small). Each iteration is one shuffle join on the
    edge list; labels are cached and localCheckpointed every iteration so
    the loop's lineage stays O(1)."""
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select("a_id", "b_id")
    edges = (
        pairs.select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
        .unionByName(pairs.select(F.col("b_id").alias("a"), F.col("a_id").alias("b")))
        .distinct()
        .cache()
    )
    labels = edges.select(F.col("a").alias("n")).distinct().withColumn("label", F.col("n"))
    labels = labels.localCheckpoint()
    for _ in range(CC_MAX_ITERS):
        nbr_min = (
            edges.join(labels, edges["b"] == labels["n"])
            .groupBy(edges["a"].alias("n2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new = (
            labels.join(nbr_min, labels["n"] == nbr_min["n2"], "left")
            .select(
                "n",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        new = new.localCheckpoint()
        changed = (
            new.alias("x")
            .join(labels.alias("y"), "n")
            .where(F.col("x.label") != F.col("y.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    sizes = labels.groupBy("label").agg(F.count("*").alias("component_size"))
    return (
        labels.join(sizes, "label")
        .select(
            F.col("n").alias("id"),
            F.col("label").alias("component_id"),
            F.col("component_size"),
        )
    )


# Splice the minhash oracle in after registration (f-string braces kept
# literal above so the reused SQL's own braces never collide).
_ORACLES["dedup_minhash_cc"] = _ORACLES["dedup_minhash_cc"].replace(
    "{MINHASH_SQL}", _ORACLES["dedup_minhash_lsh"]
)


# --------------------------------------------------------------------------- #
# sample_stratified — deterministic per-language hash sampling
# --------------------------------------------------------------------------- #
SAMPLE_PERMILLE = {"en": 500, "de": 250, "es": 250, "fr": 125, "zh": 125}
SAMPLE_DEFAULT = 1000  # unknown languages kept in full
SAMPLE_SALT = "smp:"


@query(
    "sample_stratified",
    f"""
    WITH d AS (
        SELECT doc_id::BIGINT AS doc_id, lang,
               {H.h60_sql(f"'{SAMPLE_SALT}' || doc_id::VARCHAR")} % 1000 AS bucket,
               CASE lang
                   {' '.join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_PERMILLE.items())}
                   ELSE {SAMPLE_DEFAULT} END AS rate
        FROM documents
    )
    SELECT doc_id, lang, bucket::BIGINT AS bucket FROM d WHERE bucket < rate
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language reproducible downsampling: keep doc iff
    md5-bucket(doc_id) < per-mille rate for its language. No RNG state, no
    shuffle — a pure filter that prunes at the scan, composes with
    incremental reruns, and yields the exact same corpus mix on any
    cluster size."""
    d = _t(spark, sf_dir, "documents")
    bucket = H.h60(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))) % 1000
    rate = F.lit(SAMPLE_DEFAULT)
    for k, v in reversed(SAMPLE_PERMILLE.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return (
        d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            bucket.cast("long").alias("bucket"),
            rate.alias("rate"),
        )
        .where(F.col("bucket") < F.col("rate"))
        .drop("rate")
    )


# --------------------------------------------------------------------------- #
# dedup_substring — overlapping k-gram duplicate-passage detection
# --------------------------------------------------------------------------- #
SUB_K = 8          # window length in tokens
SUB_RATIO = 0.5    # drop a doc when >= half its windows are shared


@query(
    "dedup_substring",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT id, {T.tokens_sql('text')} AS t FROM corpus),
    win AS (
        SELECT id, md5(array_to_string(t[(u.i + 1):(u.i + {SUB_K})], ' ')) AS h
        FROM tok, unnest(generate_series(0, len(t) - {SUB_K})) AS u(i)
        WHERE len(t) >= {SUB_K}
    ),
    dup AS (SELECT h FROM win GROUP BY h HAVING count(DISTINCT id) > 1),
    flagged AS (SELECT id, h IN (SELECT h FROM dup) AS is_dup FROM win)
    SELECT id,
           count(*)::BIGINT AS n_windows,
           sum(CASE WHEN is_dup THEN 1 ELSE 0 END)::BIGINT AS n_dup,
           round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6) AS dup_ratio,
           (round(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6) < {SUB_RATIO})
               AS keep
    FROM flagged GROUP BY id
    """,
)
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-passage detection at EVERY token alignment: overlapping
    SUB_K-token windows (vs dedup_lines' disjoint cuts, which miss
    duplicates that straddle a line boundary) — the Spark-shaped stand-in
    for suffix-array exact-substring dedup (Lee et al. 2022): a doc is
    dropped when >= SUB_RATIO of its windows appear verbatim in another
    doc. Scale shape: window hashes only (text never leaves the map
    side), one hash-groupBy + one join back, both keyed on the window
    hash; ~n_tokens rows per doc, linear in corpus size."""
    c = _corpus(spark, sf_dir)
    t = T.tokens("text")
    wins = F.transform(
        F.sequence(F.lit(0), F.size(t) - SUB_K),
        lambda i: F.md5(F.array_join(F.slice(t, i + 1, SUB_K), " ")),
    )
    w = c.where(F.size(t) >= SUB_K).select("id", F.explode(wins).alias("h"))
    dup = (
        w.groupBy("h")
        .agg(F.count_distinct("id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("h", F.lit(True).alias("is_dup"))
    )
    flagged = w.join(dup, "h", "left").withColumn(
        "is_dup", F.coalesce(F.col("is_dup"), F.lit(False))
    )
    ratio = F.round(
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        / F.count("*").cast("double"),
        6,
    )
    return flagged.groupBy("id").agg(
        F.count("*").alias("n_windows"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup"),
        ratio.alias("dup_ratio"),
        (ratio < SUB_RATIO).alias("keep"),
    )


# --------------------------------------------------------------------------- #
# mix_weights — temperature-based language rebalancing (alpha = 0.5)
# --------------------------------------------------------------------------- #
MIX_BUDGET = 2000  # target docs in the mixed corpus


@query(
    "mix_weights",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    per AS (
        SELECT lang, count(*)::BIGINT AS n_docs,
               sum(len({T.tokens_sql('text')}))::BIGINT AS n_tokens
        FROM corpus GROUP BY lang
    ),
    tot AS (
        SELECT list_reduce(list_prepend(0.0::DOUBLE,
                   list_transform(list(n_docs ORDER BY lang), n -> sqrt(n::DOUBLE))),
               (a, b) -> a + b) AS tot
        FROM per
    )
    SELECT lang, n_docs, n_tokens,
           round(sqrt(n_docs::DOUBLE) / tot, 6) AS weight,
           round(least(1.0, {MIX_BUDGET} * (sqrt(n_docs::DOUBLE) / tot) / n_docs), 6)
               AS sample_rate
    FROM per, tot
    """,
)
def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-pretraining
    rebalance: weight ∝ n_docs^0.5, alpha=0.5 upsamples the tail): per
    language, the normalized mixing weight and the per-doc sample rate
    that realizes a MIX_BUDGET-doc mixture. The normalizer is an
    order-pinned fold over the per-language sqrt terms (sorted by lang)
    so both engines sum identical doubles in the same sequence. One
    groupBy over the corpus; output is O(languages) rows."""
    c = _corpus(spark, sf_dir)
    per = c.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(T.tokens("text"))).alias("n_tokens"),
    )
    tot = per.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("lang", "n_docs"))),
            F.lit(0.0),
            lambda acc, x: acc + F.sqrt(x["n_docs"].cast("double")),
        ).alias("tot")
    )
    w = F.sqrt(F.col("n_docs").cast("double")) / F.col("tot")
    return per.crossJoin(F.broadcast(tot)).select(
        "lang", "n_docs", "n_tokens",
        F.round(w, 6).alias("weight"),
        F.round(F.least(F.lit(1.0), F.lit(MIX_BUDGET) * w / F.col("n_docs")), 6)
            .alias("sample_rate"),
    )


# --------------------------------------------------------------------------- #
# token_hist — log2-binned sequence-length histogram
# --------------------------------------------------------------------------- #
@query(
    "token_hist",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    n AS (SELECT id, len({T.tokens_sql('text')})::BIGINT AS n_tokens FROM corpus)
    SELECT length(bin(n_tokens))::BIGINT AS bin,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           min(n_tokens)::BIGINT AS min_tokens,
           max(n_tokens)::BIGINT AS max_tokens
    FROM n GROUP BY 1
    """,
)
def q_token_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram in power-of-two bins (bin = bit length
    of the whitespace token count — integer arithmetic, no float log2
    edge cases at exact powers of two): the doc/token mass per length
    class that sizes seq_pack budgets and shuffle partitioning. Single
    map-side projection + one tiny groupBy."""
    c = _corpus(spark, sf_dir)
    n = c.select(F.size(T.tokens("text")).cast("long").alias("n_tokens"))
    return (
        n.withColumn("bin", F.length(F.conv(F.col("n_tokens"), 10, 2)).cast("long"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


# --------------------------------------------------------------------------- #
# dsir_weights — hashed-bigram importance weights vs a target set (DSIR)
# --------------------------------------------------------------------------- #
DSIR_BUCKETS = 64


@query("dsir_weights", None)  # SQL registered below (assembled from emitters)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023) in its
    published hashed-n-gram form: word bigrams hash into 64 buckets;
    unigram-bucket generative models of the TARGET set (the deterministic
    doc_id % 97 == 0 holdout, same convention as decontaminate_ngram) and
    the RAW corpus are estimated with add-1 smoothing; each document's
    importance weight is Σ_f c_f · (ln p_target(f) − ln p_raw(f)), i.e.
    the log-likelihood ratio of its bucket counts. keep = weight ≥ 0
    (resampling keeps target-like documents).

    Determinism: per-doc bucket counts fold map-side over the hashed
    bigram array (no explode before the global agg); the 64-bucket model
    is ONE hash agg + a 1-row broadcast; the per-doc weight folds the
    count and log-ratio arrays in index order, so both engines sum the
    same doubles in the same order. At 100 TB the shuffle carries
    64 rows × docs of (bucket, count) partial-combined pairs — the model
    table itself is 64 rows regardless of corpus size."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    t = T.tokens("text")
    n = F.size(t)
    hs = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda k: F.pmod(
            H.h60(F.concat(F.get(t, k - 1), F.lit(" "), F.get(t, k))),
            F.lit(DSIR_BUCKETS)).cast("int"),
    )).otherwise(F.array().cast("array<int>"))
    # fold-width exchange (see dataops._wide): the O(64×bigrams) count
    # fold otherwise runs on the scan's one non-empty split
    from .dataops import _wide

    base = _wide(d.select(
        i.alias("id"), (F.pmod(i, F.lit(97)) == 0).alias("is_eval"), "text"))
    cvec = base.select(
        "id", "is_eval",
        F.aggregate(
            hs,
            F.array_repeat(F.lit(0).cast("long"), DSIR_BUCKETS),
            lambda acc, hh: F.zip_with(
                acc, F.sequence(F.lit(0), F.lit(DSIR_BUCKETS - 1)),
                lambda c, b: c + F.when(hh == b, 1).otherwise(0)),
        ).alias("c"),
    )
    # reuse barrier: cvec feeds BOTH the 64-bucket model agg and the
    # final weight projection — without an exchange here the count fold
    # is recomputed per consumer; with it the second consumer reads a
    # ReusedExchange of the folded (id, is_eval, c) rows
    cvec = _wide(cvec)
    buckets = (
        cvec.select("is_eval", F.posexplode_outer("c").alias("bucket", "cnt"))
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("r_f"),
             F.sum(F.when(F.col("is_eval"), F.col("cnt")).otherwise(0))
             .cast("long").alias("t_f"))
    )
    tots = buckets.agg(F.sum("r_f").alias("r_tot"), F.sum("t_f").alias("t_tot"))
    lr = (
        buckets.crossJoin(F.broadcast(tots))
        .select("bucket",
                (F.log((F.col("t_f") + 1).cast("double") / (F.col("t_tot") + DSIR_BUCKETS))
                 - F.log((F.col("r_f") + 1).cast("double") / (F.col("r_tot") + DSIR_BUCKETS))
                 ).alias("lr"))
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "lr"))),
            lambda s: s["lr"]).alias("lrv"))
    )
    raw = F.aggregate(
        F.zip_with("c", "lrv", lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, v: acc + v)
    return cvec.crossJoin(F.broadcast(lr)).select(
        F.col("id").alias("doc_id"), "is_eval",
        F.aggregate("c", F.lit(0).cast("long"), lambda a, v: a + v).alias("n_bigrams"),
        F.round(raw, 6).alias("weight"),
        (raw >= 0).alias("keep"),
    )


def _register_dsir_sql() -> None:
    from ..functions.hashing import h60_sql
    from ..functions.text import tokens_sql
    from .registry import _ORACLES

    B = DSIR_BUCKETS
    fold = (f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(generate_series(1, {B}), i -> c[i]::DOUBLE * lrv[i])), "
            f"(a, b) -> a + b)")
    _ORACLES["dsir_weights"] = f"""
    WITH docs AS MATERIALIZED (
        SELECT doc_id::BIGINT AS doc_id, (doc_id % 97 = 0) AS is_eval,
               {tokens_sql('text')} AS t
        FROM documents
    ),
    bg AS MATERIALIZED (
        SELECT doc_id, is_eval,
               list_transform(generate_series(1, len(t) - 1),
                              k -> ({h60_sql("(t[k] || ' ' || t[k + 1])")} % {B})::INT) AS hs
        FROM docs
    ),
    cvec AS MATERIALIZED (
        SELECT doc_id, is_eval,
               list_transform(generate_series(0, {B - 1}),
                              b -> len(list_filter(hs, x -> x = b))::BIGINT) AS c
        FROM bg
    ),
    buckets AS (
        SELECT u.b AS bucket,
               sum(cv.c[u.b + 1])::BIGINT AS r_f,
               sum(CASE WHEN cv.is_eval THEN cv.c[u.b + 1] ELSE 0 END)::BIGINT AS t_f
        FROM cvec cv CROSS JOIN (SELECT unnest(generate_series(0, {B - 1})) AS b) u
        GROUP BY 1
    ),
    tots AS (SELECT sum(r_f)::BIGINT AS r_tot, sum(t_f)::BIGINT AS t_tot FROM buckets),
    lrt AS MATERIALIZED (
        SELECT list(ln((t_f + 1)::DOUBLE / (t_tot + {B}))
                    - ln((r_f + 1)::DOUBLE / (r_tot + {B})) ORDER BY bucket) AS lrv
        FROM buckets, tots
    )
    SELECT doc_id, is_eval,
           list_reduce(list_prepend(0::BIGINT, c), (a, b) -> a + b)::BIGINT AS n_bigrams,
           round({fold}, 6) AS weight,
           ({fold} >= 0) AS keep
    FROM cvec, lrt
    """


_register_dsir_sql()


# --------------------------------------------------------------------------- #
# domain_cap — per-source contribution cap (round-4 tier)
# --------------------------------------------------------------------------- #
DC_CAP = 15      # max docs any single source may contribute
DC_SHARDS = 4    # level-1 sub-shards bounding the per-source window

_DC_H = H.h60_sql("'dcp:' || doc_id::VARCHAR")


@query(
    "domain_cap",
    f"""
    WITH d AS (
        SELECT doc_id::BIGINT AS doc_id, source, {_DC_H} AS h
        FROM documents
    ),
    r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
        FROM d
    )
    SELECT doc_id, source, rk::BIGINT AS rk FROM r WHERE rk <= {DC_CAP}
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap any single source's contribution at DC_CAP docs, chosen by a
    salted-hash priority (deterministic, seedless, re-runnable) — the
    standard curation guard against one domain dominating the mix (C4
    and RefinedWeb both cap per-domain mass).

    Scale shape: the naive form is ONE row_number window per source —
    a mega-source (half the corpus from one host) serializes its whole
    partition through one task's sort. Here selection is two-level:
    level 1 ranks within (source, shard) for DC_SHARDS hash sub-shards
    and cuts at DC_CAP — any row ranked > DC_CAP within its own shard
    is provably > DC_CAP globally, so the cut is lossless — bounding
    the level-2 per-source window at DC_SHARDS x DC_CAP rows no matter
    how large the source is. The oracle is the single-window form;
    identical output proves the pre-cut exact."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    s = i.cast("string")
    base = d.select(
        i.alias("doc_id"),
        "source",
        H.h60(F.concat(F.lit("dcp:"), s)).alias("h"),
        F.pmod(H.h60(F.concat(F.lit("dcs:"), s)), F.lit(DC_SHARDS)).alias("shard"),
    )
    w1 = Window.partitionBy("source", "shard").orderBy("h", "doc_id")
    pre = base.withColumn("r1", F.row_number().over(w1)).where(F.col("r1") <= DC_CAP)
    w2 = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        pre.withColumn("rk", F.row_number().over(w2).cast("long"))
        .where(F.col("rk") <= DC_CAP)
        .select("doc_id", "source", "rk")
    )


# --------------------------------------------------------------------------- #
# quality_linear — fasttext-shape hashed linear quality classifier
# --------------------------------------------------------------------------- #
QL_D = 64        # hashed feature dimension
QL_SALT_B = "qlb:"   # token -> bucket salt
QL_SALT_W = "qlw:"   # bucket -> weight salt

# DuckDB weight expression for one token `w`: bucket = h60(salt_b||w) % D,
# weight = (h60(salt_w||bucket) % 2001 - 1000) / 1000  in [-1, 1]
_QL_BUCKET = "(" + H.h60_sql(f"'{QL_SALT_B}' || w") + f" % {QL_D})"
_QL_WEIGHT = (
    "(("
    + H.h60_sql(f"'{QL_SALT_W}' || {_QL_BUCKET}::VARCHAR")
    + " % 2001) - 1000) / 1000.0"
)
_QL_PROB = "round(1.0 / (1.0 + exp(-(sw / GREATEST(n_toks, 1)))), 6)"


@query(
    "quality_linear",
    f"""
    WITH t AS MATERIALIZED (
        SELECT doc_id::BIGINT AS doc_id, {T.tokens_sql('text')} AS toks
        FROM documents
    ),
    s AS MATERIALIZED (
        SELECT doc_id, len(toks)::BIGINT AS n_toks,
               COALESCE(list_sum(list_transform(toks, w -> {_QL_WEIGHT})), 0.0) AS sw
        FROM t
    )
    SELECT doc_id, n_toks, {_QL_PROB} AS prob,
           ({_QL_PROB} >= 0.5 AND n_toks > 0) AS keep
    FROM s
    """,
)
def q_quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality classifier in the fasttext/DCLM shape: hashed
    bag-of-words into a QL_D-dim feature space, a fixed linear weight
    vector (here derived deterministically from the bucket id — a real
    deployment broadcasts trained weights, same plan), mean-pooled and
    squashed through a sigmoid; keep iff p >= 0.5 on a non-empty doc.
    Pure column expressions — the whole model evaluates inside
    whole-stage codegen at the scan, no UDF, no shuffle beyond the
    fold-width exchange. Weight lookup is two md5 applications per
    token; a broadcast map-join variant would trade that for a join —
    at 64 buckets the inline form wins (no shuffle, no build side).
    """
    from .dataops import _wide

    d = _t(spark, sf_dir, "documents")
    base = _wide(d.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
                 key="doc_id")
    toks = T.tokens("text")

    def wgt(w):
        b = F.pmod(H.h60(F.concat(F.lit(QL_SALT_B), w)), F.lit(QL_D))
        return (
            F.pmod(H.h60(F.concat(F.lit(QL_SALT_W), b.cast("string"))), F.lit(2001))
            - 1000
        ) / F.lit(1000.0)

    par = spark.sparkContext.defaultParallelism
    # exchange barrier: prob/keep both read `sw` — without it CollapseProject
    # inlines the whole token-hash fold once per consumer (2x the md5 work)
    folded = base.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.aggregate(toks, F.lit(0.0), lambda acc, w: acc + wgt(w)).alias("sw"),
    ).repartition(par, "doc_id")
    prob = F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(F.col("sw") / F.greatest(F.lit(1), F.col("n_toks"))))),
        6,
    )
    return folded.select(
        "doc_id",
        "n_toks",
        prob.alias("prob"),
        ((prob >= 0.5) & (F.col("n_toks") > 0)).alias("keep"),
    )


# --------------------------------------------------------------------------- #
# quality_c4 — C4/T5 line-level heuristics gate
# --------------------------------------------------------------------------- #
C4_MIN_KEPT_LINES = 3   # C4: drop pages with < 3 (kept) sentences
C4_MIN_LINE_WORDS = 5   # C4: keep lines with >= 5 words
# Corpus calibrations (same convention as GOPHER_STOP_MIN's footnote):
# the synthetic corpus is a single line of space-separated tokens with
# no sentence punctuation, so (a) "lines" are LINE_TOKENS-token windows
# — the dedup_lines convention — making the >=5-words rule operable
# (the trailing partial window fails it, short docs fail the doc gate);
# (b) the terminal-punctuation predicate is emitted as a per-doc COUNT
# column (n_punct_lines, 0 here) instead of folding into keep. The rule
# STRUCTURE is present and oracled; a production corpus folds it back.
_C4_LINE_OK = (
    f"len(list_filter(string_split_regex(trim(x), '\\s+'), w -> w != '')) "
    f">= {C4_MIN_LINE_WORDS} "
    "AND NOT contains(lower(x), 'javascript')"
)
_C4_PUNCT = "regexp_matches(rtrim(x), '[.!?\"]$')"


@query(
    "quality_c4",
    f"""
    WITH t AS (
        SELECT doc_id::BIGINT AS doc_id, text, {T.tokens_sql('text')} AS w
        FROM documents
    ),
    d AS (
        SELECT doc_id, text,
               list_transform(
                   generate_series(0, CAST(ceil(len(w) / {LINE_TOKENS}.0) AS BIGINT) - 1),
                   i -> array_to_string(
                       w[(i * {LINE_TOKENS} + 1):((i + 1) * {LINE_TOKENS})], ' ')) AS ln
        FROM t
    ),
    m AS (
        SELECT doc_id,
               len(ln)::BIGINT AS n_lines,
               list_filter(ln, x -> {_C4_LINE_OK}) AS kept,
               len(list_filter(ln, x -> {_C4_PUNCT}))::BIGINT AS n_punct_lines,
               (contains(lower(text), 'lorem ipsum')
                OR contains(text, '{{')) AS has_badsub
        FROM d
    )
    SELECT doc_id, n_lines, len(kept)::BIGINT AS n_kept, n_punct_lines,
           -- duckdb: array_to_string of an empty list is NULL; spark's
           -- array_join is '' — pin the empty-doc representation
           coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
           (len(kept) >= {C4_MIN_KEPT_LINES} AND NOT has_badsub) AS keep
    FROM m
    """,
)
def q_quality_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's (T5) cleaning heuristics as a line-level gate: keep lines
    carrying >= C4_MIN_LINE_WORDS words that don't mention javascript;
    drop whole docs containing 'lorem ipsum' or '{' (code), or with
    fewer than C4_MIN_KEPT_LINES surviving lines; report the
    terminal-punctuation line count (see the calibration note above —
    the synthetic corpus carries no punctuation, so that rule is a
    reported column rather than a keep conjunct). Emits the
    RECONSTRUCTED clean_text (kept lines re-joined), so downstream
    stages consume the filtered page exactly as C4 does.

    All array HOFs + string predicates in one projection — evaluates in
    whole-stage codegen at the scan, no shuffle, no UDF. The doc-level
    Gopher gate (quality_gopher) and this line-level gate compose: real
    pipelines run both."""
    d = _t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    nw = F.ceil(F.size(toks) / F.lit(float(LINE_TOKENS))).cast("int")
    ln = F.when(F.size(toks) > 0, F.transform(
        F.sequence(F.lit(0), nw - 1),
        lambda i: F.array_join(F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "),
    )).otherwise(F.array().cast("array<string>"))

    def line_ok(x):
        words = F.filter(F.split(F.trim(x), "\\s+"), lambda w: w != "")
        return (F.size(words) >= C4_MIN_LINE_WORDS) & ~F.lower(x).contains("javascript")

    m = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(ln).cast("long").alias("n_lines"),
        F.filter(ln, line_ok).alias("kept"),
        F.size(F.filter(ln, lambda x: F.rtrim(x).rlike('[.!?"]$')))
        .cast("long").alias("n_punct_lines"),
        (F.lower(F.col("text")).contains("lorem ipsum")
         | F.col("text").contains("{")).alias("has_badsub"),
    )
    return m.select(
        "doc_id", "n_lines",
        F.size("kept").cast("long").alias("n_kept"),
        "n_punct_lines",
        F.array_join("kept", "\n").alias("clean_text"),
        ((F.size("kept") >= C4_MIN_KEPT_LINES) & ~F.col("has_badsub")).alias("keep"),
    )


# --------------------------------------------------------------------------- #
# url_blocklist — UT1/URL-blocklist gate (domain suffix + path-prefix rules)
# --------------------------------------------------------------------------- #
# RefinedWeb/FineWeb first-stage filtering drops documents whose URL hits
# a curated blocklist (the UT1 "adult/ads/malware" lists): a host matches
# a rule when it EQUALS the listed domain or is a subdomain of it
# (host endswith '.'||domain — never a bare string suffix), optionally
# narrowed by a path prefix. The generic operator takes the blocklist as
# a DataFrame so a production run broadcasts the real UT1 dump.


def apply_url_blocklist(urls: DataFrame, blocklist: DataFrame) -> DataFrame:
    """Gate ``urls(doc_id, url, host, path)`` against
    ``blocklist(domain, path_prefix, category)``; returns one row per
    input with the matched ``category`` ('' when clean) and ``keep``.

    Scale shape: the host's dot-suffixes (≥2 labels — a bare TLD never
    matches a list entry) expand map-side (≤ label-count rows, ~3-5),
    the blocklist joins as a broadcast, and ONE hash agg per doc folds
    multi-rule hits to the deterministic min(category). Nothing beyond
    the doc-keyed agg shuffles at any corpus size."""
    labels = F.split(F.col("host"), r"\.")
    n = F.size(labels)
    sufs = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )).otherwise(F.array().cast("array<string>"))
    cand = urls.select(
        "doc_id", "url", "path", F.explode_outer(sufs).alias("suf"))
    b = F.broadcast(blocklist.select("domain", "path_prefix", "category"))
    hit = cand.join(
        b,
        (F.col("suf") == F.col("domain"))
        & (F.col("path_prefix").isNull()
           | F.col("path").startswith(F.col("path_prefix"))),
        "left",
    )
    return (
        hit.groupBy("doc_id", "url")
        .agg(F.min("category").alias("_cat"))
        .select(
            "doc_id", "url",
            F.coalesce(F.col("_cat"), F.lit("")).alias("category"),
            F.col("_cat").isNull().alias("keep"),
        )
    )


@query(
    "url_blocklist",
    """
    WITH urls AS (
        SELECT doc_id::BIGINT AS doc_id,
               (CASE WHEN doc_id % 5 = 0 THEN 'www.block' || (doc_id % 3)::VARCHAR || '.com'
                     WHEN doc_id % 5 = 1 THEN 'block' || (doc_id % 3)::VARCHAR || '.com'
                     WHEN doc_id % 5 = 2 THEN 'notblock' || (doc_id % 3)::VARCHAR || '.com'
                     WHEN doc_id % 5 = 3 THEN 'ok' || (doc_id % 7)::VARCHAR || '.org'
                     ELSE 'a.b.block' || (doc_id % 3)::VARCHAR || '.com' END) AS host,
               (CASE WHEN doc_id % 2 = 0 THEN '/dl/' ELSE '/p/' END)
                   || doc_id::VARCHAR AS path
        FROM documents
    ),
    m AS (
        SELECT doc_id, 'https://' || host || path AS url,
               least(
                   CASE WHEN host = 'block0.com' OR ends_with(host, '.block0.com')
                        THEN 'ads' END,
                   CASE WHEN host = 'block1.com' OR ends_with(host, '.block1.com')
                        THEN 'adult' END,
                   CASE WHEN host = 'block2.com' OR ends_with(host, '.block2.com')
                        THEN 'tracker' END,
                   CASE WHEN (host = 'ok0.org' OR ends_with(host, '.ok0.org'))
                             AND starts_with(path, '/dl/')
                        THEN 'malware' END) AS cat
        FROM urls
    )
    SELECT doc_id, url, coalesce(cat, '') AS category, (cat IS NULL) AS keep
    FROM m
    """,
)
def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-shape URL gate over a synthetic host universe via the generic
    broadcast suffix-join operator (the oracle hand-expands the literal
    ruleset, so suffix/equality/path semantics are pinned independently
    of the operator's own machinery). 'notblock0.com' is the string-
    suffix trap: it ends with 'block0.com' but is NOT a subdomain and
    must be kept."""
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    host = (
        F.when(F.pmod(i, F.lit(5)) == 0,
               F.concat(F.lit("www.block"), F.pmod(i, F.lit(3)).cast("string"), F.lit(".com")))
        .when(F.pmod(i, F.lit(5)) == 1,
              F.concat(F.lit("block"), F.pmod(i, F.lit(3)).cast("string"), F.lit(".com")))
        .when(F.pmod(i, F.lit(5)) == 2,
              F.concat(F.lit("notblock"), F.pmod(i, F.lit(3)).cast("string"), F.lit(".com")))
        .when(F.pmod(i, F.lit(5)) == 3,
              F.concat(F.lit("ok"), F.pmod(i, F.lit(7)).cast("string"), F.lit(".org")))
        .otherwise(
            F.concat(F.lit("a.b.block"), F.pmod(i, F.lit(3)).cast("string"), F.lit(".com")))
    )
    path = F.concat(
        F.when(F.pmod(i, F.lit(2)) == 0, F.lit("/dl/")).otherwise(F.lit("/p/")),
        i.cast("string"))
    urls = d.select(
        i.alias("doc_id"), host.alias("host"), path.alias("path"),
        F.concat(F.lit("https://"), host, path).alias("url"))
    bl = urls.sparkSession.createDataFrame(
        [("block0.com", None, "ads"), ("block1.com", None, "adult"),
         ("block2.com", None, "tracker"), ("ok0.org", "/dl/", "malware")],
        "domain string, path_prefix string, category string")
    return apply_url_blocklist(urls, bl)


# --------------------------------------------------------------------------- #
# perplexity_bucket — CCNet head/middle/tail split, histogram-CDF shape
# --------------------------------------------------------------------------- #
# CCNet buckets each language's documents by LM perplexity: best 30% =
# head, next 30% = middle, rest = tail. The reference pipeline SORTS each
# language shard; the scale-safe equivalent used here quantizes the score
# to an integer and derives the 30%/60% cut points from a per-language
# histogram CDF — the histogram is bounded by the quantization (≤1000
# rows per language at ANY corpus size), so no global sort ever runs.
# The LM itself is sandbox-deterministic: per-token score = h60(token)
# mod 1000 (a trained deployment swaps in real logprobs, same plan).
PPL_Q = 1000        # quantization buckets (hist rows per language ≤ this)
PPL_HEAD_PCT = 3    # ×10%: head = best 30%
PPL_MID_PCT = 6     # ×10%: middle = next 30%


@query(
    "perplexity_bucket",
    f"""
    WITH d AS MATERIALIZED (
        SELECT doc_id::BIGINT AS doc_id, lang, {T.tokens_sql('text')} AS tk
        FROM documents
    ),
    s AS MATERIALIZED (
        SELECT doc_id, lang, len(tk)::BIGINT AS n_toks,
               coalesce(list_aggregate(
                   list_transform(tk, w -> {H.h60_sql('w')} % {PPL_Q}),
                   'sum'), 0)::BIGINT AS sum_lp
        FROM d
    ),
    sc AS MATERIALIZED (
        SELECT doc_id, lang,
               (CASE WHEN n_toks = 0 THEN {PPL_Q - 1}
                     ELSE sum_lp // n_toks END)::INT AS ppl_q
        FROM s
    ),
    hist AS (SELECT lang, ppl_q, count(*)::BIGINT AS cnt FROM sc GROUP BY 1, 2),
    cum AS (
        SELECT lang, ppl_q,
               sum(cnt) OVER (PARTITION BY lang ORDER BY ppl_q)::BIGINT AS cum,
               sum(cnt) OVER (PARTITION BY lang)::BIGINT AS total
        FROM hist
    ),
    thr AS (
        SELECT lang,
               min(CASE WHEN cum * 10 >= {PPL_HEAD_PCT} * total THEN ppl_q END)::INT AS head_max,
               min(CASE WHEN cum * 10 >= {PPL_MID_PCT} * total THEN ppl_q END)::INT AS middle_max
        FROM cum GROUP BY lang
    )
    SELECT sc.doc_id, sc.lang, sc.ppl_q,
           (CASE WHEN sc.ppl_q <= thr.head_max THEN 'head'
                 WHEN sc.ppl_q <= thr.middle_max THEN 'middle'
                 ELSE 'tail' END) AS bucket
    FROM sc JOIN thr USING (lang)
    """,
)
def q_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language perplexity bucketing without a per-language sort.

    Plan: one map-side token fold (quantized integer score), ONE hash
    agg to the (lang, ppl_q) histogram, a window over the bounded
    histogram (at most PPL_Q = 1000 rows per language — scale-free), a 1-row-per-
    language threshold agg broadcast back onto the docs. Integer
    arithmetic end to end, so both engines bucket identically."""
    from .dataops import _wide

    d = _t(spark, sf_dir, "documents")
    toks = T.tokens("text")
    base = _wide(d.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "text"),
        key="doc_id")
    s = base.select(
        "doc_id", "lang",
        F.size(toks).cast("long").alias("n_toks"),
        F.aggregate(
            F.transform(toks, lambda w: F.pmod(H.h60(w), F.lit(PPL_Q))),
            F.lit(0).cast("long"), lambda a, x: a + x).alias("sum_lp"),
    )
    sc = s.select(
        "doc_id", "lang",
        F.when(F.col("n_toks") == 0, F.lit(PPL_Q - 1))
        .otherwise(F.expr("sum_lp div n_toks")).cast("int").alias("ppl_q"),
    )
    hist = sc.groupBy("lang", "ppl_q").agg(F.count("*").cast("long").alias("cnt"))
    from pyspark.sql import Window

    wq = Window.partitionBy("lang").orderBy("ppl_q") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wl = Window.partitionBy("lang")
    cum = hist.select(
        "lang", "ppl_q",
        F.sum("cnt").over(wq).cast("long").alias("cum"),
        F.sum("cnt").over(wl).cast("long").alias("total"),
    )
    thr = cum.groupBy("lang").agg(
        F.min(F.when(F.col("cum") * 10 >= PPL_HEAD_PCT * F.col("total"),
                     F.col("ppl_q"))).cast("int").alias("head_max"),
        F.min(F.when(F.col("cum") * 10 >= PPL_MID_PCT * F.col("total"),
                     F.col("ppl_q"))).cast("int").alias("middle_max"),
    )
    return sc.join(F.broadcast(thr), "lang").select(
        "doc_id", "lang", "ppl_q",
        F.when(F.col("ppl_q") <= F.col("head_max"), F.lit("head"))
        .when(F.col("ppl_q") <= F.col("middle_max"), F.lit("middle"))
        .otherwise(F.lit("tail")).alias("bucket"),
    )


# --------------------------------------------------------------------------- #
# boilerplate_strip — per-site template-line removal (the cleaning step
# between raw extraction and quality gating: nav bars, footers, cookie
# banners repeat on every page of a host; body prose does not). A line
# is template iff it appears on >= BP_MIN pages of the SAME host and on
# >= BP_RATIO_PCT% of them — the host-frequency rule CCNet/RefinedWeb
# style pipelines apply before doc-level filters. Distinct from
# dedup_lines (corpus-global, any 2 docs): the denominator here is the
# host's page count, so a 2-page microsite and a 1M-page portal get the
# same RATIO semantics.
#
# Scale: shuffles only on (host, line-hash) — never on document text;
# the per-host page count is a slim broadcastable rollup; per-doc
# reassembly is the bounded collect_list pattern. The integer compare
# (nd * 100 >= PCT * np) keeps the ratio exact in both engines.
# Host synthesis: doc_id % BP_HOSTS, the crawl tier's host rule; each
# page gets a deterministic per-host NAV header and COPYRIGHT footer
# line so the template signal is real and its removal assertable.
# --------------------------------------------------------------------------- #
BP_HOSTS = 7
BP_MIN = 3           # template needs >= 3 supporting pages
BP_RATIO_PCT = 50    # ... covering >= 50% of the host's pages
BP_LINE = 12         # tokens per synthetic body line


@query(
    "boilerplate_strip",
    f"""
    WITH docs AS (
        SELECT doc_id::BIGINT AS id,
               'host' || (doc_id % {BP_HOSTS})::VARCHAR AS host,
               coalesce(text, '') AS text
        FROM documents
    ),
    tok AS (SELECT id, host, {T.tokens_sql('text')} AS t FROM docs),
    body AS (
        SELECT id, host, i + 1 AS pos,
               array_to_string(t[(i * {BP_LINE} + 1):((i + 1) * {BP_LINE})], ' ') AS line
        FROM tok, unnest(generate_series(0,
            cast(ceil(len(t) / {BP_LINE}.0) AS INT) - 1)) AS u(i)
        WHERE len(t) > 0
    ),
    lines AS (
        SELECT id, host, 0 AS pos,
               'NAV ' || host || ' home about contact' AS line FROM docs
        UNION ALL SELECT id, host, pos, line FROM body
        UNION ALL SELECT id, host, 1000000 AS pos,
               'COPYRIGHT ' || host || ' all rights reserved' AS line FROM docs
    ),
    hashed AS (SELECT id, host, pos, line, md5(line) AS h FROM lines),
    hp AS (SELECT host, count(DISTINCT id) AS np FROM docs GROUP BY 1),
    bp AS (
        SELECT f.host, f.h
        FROM (SELECT host, h, count(DISTINCT id) AS nd
              FROM hashed GROUP BY 1, 2) f
        JOIN hp USING (host)
        WHERE f.nd >= {BP_MIN} AND f.nd * 100 >= {BP_RATIO_PCT} * hp.np
    ),
    flagged AS (
        SELECT hashed.id, hashed.host, hashed.pos, hashed.line,
               (bp.h IS NOT NULL) AS is_bp
        FROM hashed LEFT JOIN bp
          ON hashed.host = bp.host AND hashed.h = bp.h
    )
    SELECT id, host,
           count(*)::BIGINT AS n_lines,
           coalesce(sum(CASE WHEN is_bp THEN 1 ELSE 0 END), 0)::BIGINT AS n_boiler,
           coalesce(string_agg(CASE WHEN NOT is_bp THEN line END,
                               chr(10) ORDER BY pos), '') AS kept_text
    FROM flagged GROUP BY id, host
    """,
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    docs = d.select(
        i.alias("id"),
        F.concat(F.lit("host"), F.pmod(i, F.lit(BP_HOSTS)).cast("string")).alias("host"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    t = T.tokens("text")
    n_body = F.ceil(F.size(t) / F.lit(float(BP_LINE))).cast("int")
    body_arr = F.when(
        F.size(t) > 0,
        F.transform(
            F.sequence(F.lit(0), n_body - 1),
            lambda j: F.array_join(F.slice(t, j * BP_LINE + 1, BP_LINE), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hdr = F.concat(F.lit("NAV "), F.col("host"), F.lit(" home about contact"))
    ftr = F.concat(F.lit("COPYRIGHT "), F.col("host"), F.lit(" all rights reserved"))
    lines = docs.select(
        "id", "host",
        F.posexplode(F.concat(F.array(hdr), body_arr, F.array(ftr))).alias("pos", "line"),
    ).withColumn("h", F.md5("line"))
    hp = docs.groupBy("host").agg(F.count_distinct("id").alias("np"))
    bp = (
        lines.groupBy("host", "h")
        .agg(F.count_distinct("id").alias("nd"))
        .join(F.broadcast(hp), "host")
        .where((F.col("nd") >= BP_MIN) & (F.col("nd") * 100 >= BP_RATIO_PCT * F.col("np")))
        .select("host", "h", F.lit(True).alias("is_bp"))
    )
    flagged = lines.join(bp, ["host", "h"], "left").withColumn(
        "is_bp", F.coalesce(F.col("is_bp"), F.lit(False))
    )
    return flagged.groupBy("id", "host").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("is_bp"), 1).otherwise(0)).alias("n_boiler"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(~F.col("is_bp"), F.struct("pos", "line")))
                ),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("kept_text"),
    )


# --------------------------------------------------------------------------- #
# dedup_intradoc — WITHIN-document repeated-line removal (generated
# pages repeat widgets/disclaimers inside one page; corpus-level
# dedup_lines can't see it because the duplicate never crosses a
# document boundary — its rule is count-distinct DOCS per line). Keeps
# the FIRST occurrence of each line per document. The duplicate signal
# is planted: every page opens AND closes with the same per-doc widget
# line (the repeated-promo/disclaimer shape), so exactly that second
# occurrence must drop while unique body lines all survive.
# Scale: the rank window partitions on (doc, line-hash) — group size
# is bounded by one document's repetition count, never corpus-sized.
# --------------------------------------------------------------------------- #
@query(
    "dedup_intradoc",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT id, {T.tokens_sql('text')} AS t FROM corpus),
    body AS (
        SELECT id, i + 1 AS pos,
               array_to_string(t[(i * {LINE_TOKENS} + 1):((i + 1) * {LINE_TOKENS})], ' ') AS line
        FROM tok, unnest(generate_series(0,
            cast(ceil(len(t) / {LINE_TOKENS}.0) AS INT) - 1)) AS u(i)
        WHERE len(t) > 0
    ),
    lines AS (
        SELECT id, 0 AS pos, 'WIDGET promo ' || (id % 5)::VARCHAR AS line FROM corpus
        UNION ALL SELECT id, pos, line FROM body
        UNION ALL SELECT id, 1000000 AS pos,
               'WIDGET promo ' || (id % 5)::VARCHAR AS line FROM corpus
    ),
    ranked AS (
        SELECT id, pos, line,
               row_number() OVER (PARTITION BY id, md5(line) ORDER BY pos) AS occ
        FROM lines
    )
    SELECT id,
           count(*)::BIGINT AS n_lines,
           sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dupes,
           coalesce(string_agg(CASE WHEN occ = 1 THEN line END,
                               chr(10) ORDER BY pos), '') AS kept_text
    FROM ranked GROUP BY id
    """,
)
def q_dedup_intradoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _corpus(spark, sf_dir)
    t = T.tokens("text")
    n_lines = F.ceil(F.size(t) / F.lit(float(LINE_TOKENS))).cast("int")
    body_arr = F.when(
        F.size(t) > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(t, i * LINE_TOKENS + 1, LINE_TOKENS), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # planted per-doc widget line: same text opens and closes the page
    # (the repeated-promo shape) — posexplode keeps [widget, body…,
    # widget] in order, so occ=1 is the opening occurrence
    widget = F.concat(F.lit("WIDGET promo "), F.pmod(F.col("id"), F.lit(5)).cast("string"))
    lines = (
        c.select("id", F.posexplode(
            F.concat(F.array(widget), body_arr, F.array(widget))).alias("pos", "line"))
        .withColumn("h", F.md5("line"))
    )
    from pyspark.sql import Window as W

    occ = F.row_number().over(W.partitionBy("id", "h").orderBy("pos"))
    ranked = lines.withColumn("occ", occ)
    return ranked.groupBy("id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).alias("n_dupes"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("occ") == 1, F.struct("pos", "line")))
                ),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("kept_text"),
    )


# --------------------------------------------------------------------------- #
# cdc_dedup — content-defined chunking dedup (rolling-hash boundaries,
# the rsync/LBFS/FastCDC family). Fixed-window substring dedup
# (dedup_substring) shifts ALL window hashes after one token insertion;
# CDC cuts chunks where a w-token rolling hash hits a mask, so
# boundaries re-synchronize right after an edit and shared suffixes
# still dedup. On the dedup corpus the exact-duplicate docs share every
# chunk and the appended-tail near-dups share every chunk but the last.
# Whole pipeline is array HOFs in the scan projection (one md5 per
# token, arithmetic < 2^46 so Spark LONG and DuckDB BIGINT agree), then
# one explode + one hash groupBy on the chunk string — only (chunk,
# doc) rows shuffle, never token arrays. No min/max chunk clamps (the
# production FastCDC refinement) — documented simplification; the mask
# sets the MEAN chunk at 2^CDC_MASK_BITS tokens.
# --------------------------------------------------------------------------- #
CDC_W = 3            # rolling window (tokens)
CDC_MASK = 7         # boundary when r % 8 == 0 → mean chunk ~8 tokens


def _cdc_sql() -> str:
    m = H.MERSENNE31
    h = H.h60_sql("w")
    return f"""
    WITH corpus AS ({_CORPUS_SQL}),
    toks AS (
        SELECT id, {T.tokens_sql('text')} AS tk FROM corpus
    ),
    hashed AS (
        SELECT id, tk, list_transform(tk, w -> {h} % {m}) AS hs,
               len(tk) AS n
        FROM toks WHERE len(tk) >= 1
    ),
    cut AS (
        SELECT id, tk, n,
               list_prepend(0::BIGINT, list_append(
                   list_filter(generate_series(3::BIGINT, n::BIGINT),
                       i -> (hs[i-2] * 961 + hs[i-1] * 31 + hs[i]) % {m}
                                % {CDC_MASK + 1} = 0
                            AND i < n),
                   n::BIGINT)) AS cuts
        FROM hashed
    ),
    chunks AS (
        SELECT id,
               unnest(list_transform(generate_series(2, len(cuts)),
                   j -> array_to_string(
                       list_slice(tk, (cuts[j-1] + 1)::BIGINT,
                                  cuts[j]::BIGINT), ' '))) AS chunk
        FROM cut
    )
    SELECT chunk,
           len({T.tokens_sql('chunk')})::BIGINT AS n_tokens,
           count(*)::BIGINT AS n_total,
           count(DISTINCT id)::BIGINT AS n_docs,
           min(id)::BIGINT AS first_doc
    FROM chunks GROUP BY chunk
    """


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """(id, text) → one row per (id, chunk) under content-defined
    boundaries — the reusable core of cdc_dedup (tests drive it on a
    controlled corpus to pin the boundary re-synchronization property)."""
    m = F.lit(H.MERSENNE31)
    tk = T.tokens(F.col("text"))
    hashed = docs.select("id", tk.alias("tk")).where(F.size("tk") >= 1).select(
        "id", "tk",
        F.transform("tk", lambda w: F.pmod(H.h60(w), m)).alias("hs"),
        F.size("tk").cast("long").alias("n"))
    # 1-based rolling positions i in [3, n); F.get is 0-based
    roll = lambda hs, i: F.pmod(  # noqa: E731
        F.get(hs, i - 3) * 961 + F.get(hs, i - 2) * 31 + F.get(hs, i - 1), m)
    bnds = F.when(
        F.col("n") >= 3,
        F.filter(
            F.sequence(F.lit(3).cast("long"), F.col("n")),
            lambda i: (F.pmod(roll(F.col("hs"), i), F.lit(CDC_MASK + 1)) == 0)
                      & (i < F.col("n")),
        ),
    ).otherwise(F.array().cast("array<long>"))
    cut = hashed.select(
        "id", "tk", "n",
        F.concat(F.array(F.lit(0).cast("long")), bnds,
                 F.array(F.col("n"))).alias("cuts"))
    chunk_of = lambda j: F.array_join(  # noqa: E731
        F.slice(F.col("tk"), (F.get(F.col("cuts"), j - 2) + 1).cast("int"),
                (F.get(F.col("cuts"), j - 1)
                 - F.get(F.col("cuts"), j - 2)).cast("int")), " ")
    return cut.select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(2), F.size("cuts")),
            lambda j: chunk_of(j))).alias("chunk"))


@query("cdc_dedup", _cdc_sql())
def q_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = cdc_chunks(_corpus(spark, sf_dir))
    return chunks.groupBy("chunk").agg(
        F.count("*").cast("long").alias("n_total"),
        F.countDistinct("id").cast("long").alias("n_docs"),
        F.min("id").cast("long").alias("first_doc"),
    ).select(
        "chunk",
        F.size(T.tokens(F.col("chunk"))).cast("long").alias("n_tokens"),
        "n_total", "n_docs", "first_doc")


# --------------------------------------------------------------------------- #
# sample_weighted — Efraimidis–Spirakis weighted reservoir (top-k by key)
# --------------------------------------------------------------------------- #
WS_SALT = "ws-v1"
WS_M = 1 << 30          # hash-to-uniform resolution
WS_K = 64               # sample size
WS_CHARS_PER_UNIT = 64  # weight = 1 + len(text)/this (long docs favored)


@query(
    "sample_weighted",
    f"""
    WITH d AS (
        SELECT doc_id::BIGINT AS doc_id,
               (1 + length(coalesce(text, '')) // {WS_CHARS_PER_UNIT})::BIGINT AS w,
               (({H.h60_sql(f"'{WS_SALT}' || doc_id::VARCHAR")} % {WS_M}) + 1)::DOUBLE
                   / {float(WS_M + 1)!r} AS u
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, w, round(ln(u) / w, 9) AS es_key FROM d
    )
    SELECT doc_id, w, es_key FROM keyed
    ORDER BY es_key DESC, doc_id LIMIT {WS_K}
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis–Spirakis A-Res): each doc
    draws key u^(1/w) — here its monotone log form ln(u)/w — from a
    salted-hash uniform, and the sample is the global top-k by key:
    inclusion probability proportional to weight, no RNG state, exactly
    reproducible on any cluster. The top-k is Spark's
    TakeOrderedAndProject (per-partition heads merged on the driver,
    never a global sort), the same physical shape at 10^10 rows; keys
    round to 9 with a doc_id tiebreak so the cut is cross-engine exact.
    The training-data use: length-weighted (or quality-weighted)
    subsampling where plain Bernoulli under-represents long documents."""
    d = _t(spark, sf_dir, "documents")
    w = (F.lit(1) + F.floor(
        F.length(F.coalesce(F.col("text"), F.lit(""))) / WS_CHARS_PER_UNIT
    )).cast("long")
    u = (
        (H.h60(F.concat(F.lit(WS_SALT), F.col("doc_id").cast("string"))) % WS_M)
        + 1
    ).cast("double") / F.lit(float(WS_M + 1))
    keyed = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        w.alias("w"),
        F.round(F.log(u) / w, 9).alias("es_key"),
    )
    return keyed.orderBy(F.desc("es_key"), "doc_id").limit(WS_K)


# --------------------------------------------------------------------------- #
# Interpolated Kneser-Ney bigram LM counting kernel (Kneser & Ney
# ICASSP'95; Chen & Goodman '98 interpolated form) — the trainer leg of
# the CCNet perplexity gate: perplexity_bucket SCORES documents with a
# hashed LM; this produces the smoothed model from the corpus itself
# (CCNet trains KenLM 5-grams on Wikipedia — same counting shapes, here
# at order 2 so the full model is oracle-checkable).
#
#   p_kn(w2|w1) = (c(w1 w2) - D)/c(w1 .) + D * N1+(w1 .)/c(w1 .) * N1+(. w2)/B
#
# with discount D = 0.75, N1+(w1 .) = distinct continuations of w1,
# N1+(. w2) = distinct left contexts of w2 (the Kneser-Ney continuation
# count — "how many contexts does w2 complete", not raw frequency), and
# B = distinct bigram types. Scale shape: one explode + three map-side-
# combined groupBys on slim (word, word) keys + a 1-row broadcast for B
# — no windows, no collect. Vocabulary-sized output at any corpus size
# (Heaps' law), exactly like the BPE trainer's (word, freq) posture.
# Float discipline: both engines evaluate the identical expression
# shape left-to-right on doubles, rounded to 9 decimals.
# --------------------------------------------------------------------------- #
KN_D = 0.75


@query(
    "kn_bigram_lm",
    f"""
    WITH grams AS (
        SELECT g.g AS gram
        FROM documents,
             unnest({H.shingles_sql(T.tokens_sql('text'), 2)}) AS g(g)
    ),
    bigrams AS (
        SELECT split_part(gram, ' ', 1) AS w1,
               split_part(gram, ' ', 2) AS w2,
               count(*)::BIGINT AS c
        FROM grams GROUP BY 1, 2
    ),
    lefts AS (
        SELECT w1, sum(c)::BIGINT AS tot, count(*)::BIGINT AS n1f
        FROM bigrams GROUP BY 1
    ),
    rights AS (
        SELECT w2, count(*)::BIGINT AS n1b FROM bigrams GROUP BY 1
    ),
    total AS (
        SELECT count(*)::BIGINT AS b FROM bigrams
    )
    SELECT bg.w1, bg.w2, bg.c,
           l.tot AS c_w1, l.n1f AS n1plus_fwd, r.n1b AS n1plus_back,
           total.b AS n_bigram_types,
           round((bg.c::DOUBLE - {KN_D}) / l.tot::DOUBLE
                 + {KN_D} * l.n1f::DOUBLE / l.tot::DOUBLE
                   * (r.n1b::DOUBLE / total.b::DOUBLE), 9) AS p_kn
    FROM bigrams bg
    JOIN lefts l USING (w1)
    JOIN rights r USING (w2)
    CROSS JOIN total
    """,
)
def q_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        F.explode(H.shingles(T.tokens("text"), 2)).alias("gram"))
    bigrams = grams.select(
        F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("w2"),
    ).groupBy("w1", "w2").agg(F.count("*").alias("c"))
    lefts = bigrams.groupBy("w1").agg(
        F.sum("c").alias("c_w1"), F.count("*").alias("n1plus_fwd"))
    rights = bigrams.groupBy("w2").agg(F.count("*").alias("n1plus_back"))
    total = bigrams.agg(F.count("*").alias("n_bigram_types"))
    joined = (
        bigrams.join(lefts, "w1").join(rights, "w2")
        .crossJoin(F.broadcast(total))
    )
    d_ = F.lit(KN_D)
    p = (
        (F.col("c").cast("double") - d_) / F.col("c_w1").cast("double")
        + d_ * F.col("n1plus_fwd").cast("double") / F.col("c_w1").cast("double")
        * (F.col("n1plus_back").cast("double") / F.col("n_bigram_types").cast("double"))
    )
    return joined.select(
        "w1", "w2", "c", "c_w1", "n1plus_fwd", "n1plus_back",
        "n_bigram_types", F.round(p, 9).alias("p_kn"),
    )


# --------------------------------------------------------------------------- #
# License detection — the provenance gate a training-data pipeline runs
# before anything else keeps a page: rel="license" / Creative-Commons
# href markers (the machine-readable channel ccREL defines and CC
# license chooser emits) and the "all rights reserved" text claim.
# train_ok is the conservative policy: permissive licenses only (BY,
# BY-SA, CC0/public domain); NC/ND restrict reuse and an explicit
# rights reservation or NO marker defaults to not-ok. A deterministic
# footer is synthesized per doc_id (the fixture-synthesis pattern of
# feedops/meta_robots); detection is one regexp_extract + substring
# tests in the scan projection — scale-free.
# --------------------------------------------------------------------------- #
_LIC_FOOTER_SQL = """
    (CASE doc_id % 9
     WHEN 0 THEN '<footer><a rel="license" href="https://creativecommons.org/licenses/by/4.0/">CC BY 4.0</a></footer>'
     WHEN 1 THEN '<footer><a rel="license" href="https://creativecommons.org/licenses/by-sa/4.0/">CC BY-SA 4.0</a></footer>'
     WHEN 2 THEN '<footer><a rel="license" href="https://creativecommons.org/licenses/by-nc/4.0/">CC BY-NC 4.0</a></footer>'
     WHEN 3 THEN '<footer><a rel="license" href="https://creativecommons.org/licenses/by-nd/4.0/">CC BY-ND</a></footer>'
     WHEN 4 THEN '<footer><a rel="license" href="http://creativecommons.org/licenses/by-nc-sa/3.0/">some rights</a></footer>'
     WHEN 5 THEN '<footer><a rel="license" href="https://creativecommons.org/publicdomain/zero/1.0/">CC0</a></footer>'
     WHEN 6 THEN '<footer><p>&copy; 2026 Example. All Rights Reserved.</p></footer>'
     ELSE '<footer><p>about | contact</p></footer>' END)
"""


def _lic_footer(i: F.Column) -> F.Column:
    cases = {
        0: '<footer><a rel="license" href="https://creativecommons.org/licenses/by/4.0/">CC BY 4.0</a></footer>',
        1: '<footer><a rel="license" href="https://creativecommons.org/licenses/by-sa/4.0/">CC BY-SA 4.0</a></footer>',
        2: '<footer><a rel="license" href="https://creativecommons.org/licenses/by-nc/4.0/">CC BY-NC 4.0</a></footer>',
        3: '<footer><a rel="license" href="https://creativecommons.org/licenses/by-nd/4.0/">CC BY-ND</a></footer>',
        4: '<footer><a rel="license" href="http://creativecommons.org/licenses/by-nc-sa/3.0/">some rights</a></footer>',
        5: '<footer><a rel="license" href="https://creativecommons.org/publicdomain/zero/1.0/">CC0</a></footer>',
        6: '<footer><p>&copy; 2026 Example. All Rights Reserved.</p></footer>',
    }
    expr = F.lit("<footer><p>about | contact</p></footer>")
    for k, v in cases.items():
        expr = F.when(F.pmod(i, F.lit(9)) == k, F.lit(v)).otherwise(expr)
    return expr


@query(
    "license_detect",
    f"""
    WITH pages AS (
        SELECT doc_id::BIGINT AS doc_id,
               ('<html><body><p>' || coalesce(text, '') || '</p>'
                || {_LIC_FOOTER_SQL} || '</body></html>') AS html
        FROM documents
    ),
    det AS (
        SELECT doc_id,
               regexp_extract(html, 'creativecommons\\.org/licenses/([a-z-]+)/', 1) AS cc_variant,
               (html LIKE '%creativecommons.org/publicdomain/zero/%') AS is_cc0,
               (lower(html) LIKE '%all rights reserved%') AS is_arr
        FROM pages
    )
    SELECT doc_id,
           CASE WHEN is_cc0 THEN 'cc0'
                WHEN cc_variant <> '' THEN 'cc-' || cc_variant
                WHEN is_arr THEN 'all-rights-reserved'
                ELSE 'none' END AS license,
           CASE WHEN is_cc0 THEN TRUE
                WHEN cc_variant IN ('by', 'by-sa') THEN TRUE
                ELSE FALSE END AS train_ok
    FROM det
    """,
)
def q_license_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("long")
    html = F.concat(
        F.lit("<html><body><p>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit("</p>"), _lic_footer(i), F.lit("</body></html>"),
    )
    det = d.select(
        i.alias("doc_id"),
        F.regexp_extract(html, r"creativecommons\.org/licenses/([a-z-]+)/", 1)
         .alias("cc_variant"),
        html.contains("creativecommons.org/publicdomain/zero/").alias("is_cc0"),
        F.lower(html).contains("all rights reserved").alias("is_arr"),
    )
    lic = (
        F.when(F.col("is_cc0"), F.lit("cc0"))
        .when(F.col("cc_variant") != "", F.concat(F.lit("cc-"), F.col("cc_variant")))
        .when(F.col("is_arr"), F.lit("all-rights-reserved"))
        .otherwise(F.lit("none"))
    )
    ok = (
        F.when(F.col("is_cc0"), F.lit(True))
        .when(F.col("cc_variant").isin("by", "by-sa"), F.lit(True))
        .otherwise(F.lit(False))
    )
    return det.select("doc_id", lic.alias("license"), ok.alias("train_ok"))


# --------------------------------------------------------------------------- #
# badwords_gate — C4's token-level blocklist filter ("List of Dirty,
# Naughty, Obscene..." in the T5 paper; RefinedWeb/FineWeb run the same
# shape). Distinct from quality_c4 (SUBSTRING heuristics: 'lorem
# ipsum', '{') and url_blocklist (URL/domain rules): this one matches
# WHOLE TOKENS against a word list, so 'scrape' never trips a rule for
# 'rape' — the word-boundary property the C4 paper calls out. The
# operator takes the list as a parameter (a production run broadcasts
# the real LDNOOBW dump, ~1.7k terms); the query pins a deterministic
# stand-in drawn from the synthetic vocabulary ('dup' hits ~5% of
# docs, 'forbidden' never occurs — both match paths exercised).
#
# Scale shape: the list folds into an In-predicate inside an array HOF
# — one projection in whole-stage codegen at the scan, no explode, no
# shuffle, no UDF. A 1.7k-term production list compiles the same way
# (Catalyst turns large In into a hash set); beyond ~10k terms you'd
# switch to a broadcast join against exploded tokens, same output.
# --------------------------------------------------------------------------- #
BADWORDS = ("dup", "forbidden")
_BADWORDS_SQL = ", ".join(f"'{w}'" for w in BADWORDS)


def badwords_gate(docs: DataFrame, words: tuple[str, ...] = BADWORDS,
                  text_col: str = "text") -> DataFrame:
    """Per-doc blocklist audit over ``docs(doc_id, text)``: token count,
    blocklisted-token count, density, and C4's any-hit keep verdict."""
    toks = T.tokens(text_col)
    n_bad = F.size(F.filter(toks, lambda w: w.isin(*words)))
    n_tok = F.size(toks)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        n_bad.cast("long").alias("n_bad"),
        F.round(n_bad.cast("double") / F.greatest(F.lit(1), n_tok), 6)
        .alias("bad_frac"),
        (n_bad == 0).alias("keep"),
    )


@query(
    "badwords_gate",
    f"""
    WITH t AS (
        SELECT doc_id::BIGINT AS doc_id, {T.tokens_sql('text')} AS w
        FROM documents
    )
    SELECT doc_id,
           len(w)::BIGINT AS n_tokens,
           len(list_filter(w, x -> x IN ({_BADWORDS_SQL})))::BIGINT AS n_bad,
           round(len(list_filter(w, x -> x IN ({_BADWORDS_SQL})))::DOUBLE
                 / greatest(1, len(w)), 6) AS bad_frac,
           (len(list_filter(w, x -> x IN ({_BADWORDS_SQL}))) = 0) AS keep
    FROM t
    """,
)
def q_badwords_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return badwords_gate(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------- #
# winnow_fingerprints — winnowing (Schleimer/Wilkerson/Aiken, SIGMOD
# 2003; the MOSS algorithm): LOCAL document fingerprinting with a
# guarantee the k-gram samplers above don't have. Hash every WIN_K-gram,
# slide a window of WIN_W consecutive gram hashes, keep the minimum of
# each window (ties -> rightmost; the paper's robust variant also
# prefers the previous window's pick — documented simplification), and
# dedupe the picks. Two provable properties: (a) any match of
# WIN_W + WIN_K - 1 tokens or longer between two documents shares at
# least one selected fingerprint — detection is GUARANTEED above that
# length, unlike MinHash's probabilistic recall; (b) expected density
# of the selection is 2/(WIN_W+1) — storage is a tuned fraction of the
# full gram set. dedup_substring keeps EVERY window hash; winnowing is
# what you store when 100 TB of every-window hashes is the bottleneck.
#
# Scale shape: each gram row fans out to the <= WIN_W windows covering
# it (slim (id, pos, hash) rows, map-side), one groupBy(id, window)
# min-struct picks the fingerprint, one distinct folds overlapping
# windows' repeated picks. Hashes are md5 hex strings (the
# dedup_substring convention) so "min" is plain lexicographic order in
# both engines. Only (id, hash) pairs ever shuffle.
# --------------------------------------------------------------------------- #
WIN_K = 4   # tokens per gram
WIN_W = 4   # gram hashes per winnowing window


@query(
    "winnow_fingerprints",
    f"""
    WITH corpus AS ({_CORPUS_SQL}),
    tok AS (SELECT id, {T.tokens_sql('text')} AS t FROM corpus),
    grams AS (
        SELECT id, u.i AS pos,
               md5(array_to_string(t[(u.i + 1):(u.i + {WIN_K})], ' ')) AS h,
               len(t) - {WIN_K} AS max_pos
        FROM tok, unnest(generate_series(0, len(t) - {WIN_K})) AS u(i)
        WHERE len(t) >= {WIN_K}
    ),
    fan AS (
        SELECT id, pos, h, w.w0
        FROM grams, unnest(generate_series(
            greatest(0, pos - {WIN_W - 1}),
            least(pos, max_pos - {WIN_W - 1}))) AS w(w0)
        WHERE max_pos >= {WIN_W - 1}
    ),
    picks AS (
        SELECT id, w0, pos, h FROM (
            SELECT id, w0, pos, h,
                   row_number() OVER (PARTITION BY id, w0
                                      ORDER BY h ASC, pos DESC) AS rn
            FROM fan) t WHERE rn = 1
    ),
    sel AS (SELECT DISTINCT id, pos, h FROM picks),
    shared AS (SELECT h FROM sel GROUP BY h HAVING count(DISTINCT id) > 1)
    SELECT g.id,
           count(DISTINCT g.pos)::BIGINT AS n_grams,
           count(DISTINCT s.pos)::BIGINT AS n_selected,
           round(count(DISTINCT s.pos)::DOUBLE
                 / greatest(1, count(DISTINCT g.pos)), 6) AS density,
           count(DISTINCT CASE WHEN s.h IN (SELECT h FROM shared)
                               THEN s.pos END)::BIGINT AS n_shared
    FROM grams g
    LEFT JOIN sel s ON s.id = g.id AND s.pos = g.pos
    GROUP BY g.id
    """,
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dataops import _corpus

    c = _corpus(spark, sf_dir)
    t = T.tokens("text")
    grams_arr = F.when(
        F.size(t) >= WIN_K,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - WIN_K),
            lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.array_join(F.slice(t, i + 1, WIN_K), " ")).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))
    grams = (
        c.select(F.col("id"), F.explode(grams_arr).alias("g"),
                 (F.size(t) - WIN_K).alias("max_pos"))
        .select("id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"),
                "max_pos")
    )
    fan = (
        grams.where(F.col("max_pos") >= WIN_W - 1)
        .select(
            "id", "pos", "h",
            F.explode(F.sequence(
                F.greatest(F.lit(0), F.col("pos") - (WIN_W - 1)),
                F.least(F.col("pos"), F.col("max_pos") - (WIN_W - 1)),
            )).alias("w0"),
        )
    )
    # min (h asc, pos desc) per window: min-struct with bit-flipped pos
    picks = (
        fan.groupBy("id", "w0")
        .agg(F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).alias("m"))
        .select("id", (-F.col("m.np")).alias("pos"), F.col("m.h").alias("h"))
    )
    sel = picks.select("id", "pos", "h").distinct().localCheckpoint(eager=False)
    shared = (
        sel.groupBy("h")
        .agg(F.countDistinct("id").alias("nd"))
        .where(F.col("nd") > 1)
        .select("h", F.lit(True).alias("is_shared"))
    )
    selj = sel.join(F.broadcast(shared), "h", "left").select(
        "id", "pos", F.coalesce("is_shared", F.lit(False)).alias("is_shared"))
    per_sel = selj.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum(F.col("is_shared").cast("long")).alias("n_shared"),
    )
    per_gram = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        per_gram.join(per_sel, "id", "left")
        .select(
            "id",
            F.col("n_grams").cast("long"),
            F.coalesce("n_selected", F.lit(0)).cast("long").alias("n_selected"),
            F.round(F.coalesce("n_selected", F.lit(0)).cast("double")
                    / F.greatest(F.lit(1), F.col("n_grams")), 6)
            .alias("density"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
        )
    )
