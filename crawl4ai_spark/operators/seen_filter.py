"""Partitioned Bloom-filter sidecar for the URL-seen set (north rule).

At 10^10-URL scale the exact ``left_anti`` join against ``url_seen``
shuffles every candidate URL. The Bloom sidecar cuts that: the seen set
is sharded by ``pmod(url_hash, n_shards)``; each shard gets a Bloom
bitset sized for its cardinality. New candidates test membership first —
*definitely-new* URLs (the overwhelming majority on a growing frontier)
skip the anti-join entirely; only *maybe-seen* candidates proceed to the
exact join, which remains the ground truth (no false dedup from Bloom
collisions, matching F10's exactness requirement).

Layout: bit positions are computed JVM-side (``xxhash64(url, seed_i)``
columns — k hashes per URL, no Python in the hash path); only the final
bitset set/test touches numpy, Arrow-batched per shard. Shard bitsets
are small enough to broadcast (default 1 MiB/shard → 10^7 URLs/shard at
~1% fpp with k=7; at 10^10 URLs use 1024 shards and per-executor local
test via the broadcast).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_BITS = 1 << 23  # 8 Mbit = 1 MiB per shard
DEFAULT_K = 7


def shard_of(url_hash: Column | str, n_shards: int) -> Column:
    h = F.col(url_hash) if isinstance(url_hash, str) else url_hash
    return F.pmod(h, F.lit(n_shards)).cast("int")


def bit_positions(url: Column | str, n_bits: int = DEFAULT_BITS, k: int = DEFAULT_K) -> Column:
    """k bit positions per URL from salted xxhash64 — pure JVM columns."""
    u = F.col(url) if isinstance(url, str) else url
    return F.array(*[
        F.pmod(F.xxhash64(F.lit(i), u), F.lit(n_bits)).cast("long") for i in range(k)
    ])


def _fold_bitsets(pos: DataFrame, n_bits: int) -> DataFrame:
    """Fold ``(shard, pos: array<long>)`` rows into one bitset per shard
    (applyInPandas — numpy OR over the shard's bit positions)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        if len(pdf):
            flat = np.concatenate(pdf["pos"].to_numpy())
            np.bitwise_or.at(bits, (flat // 8).astype(np.int64), (1 << (flat % 8)).astype(np.uint8))
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "bits": [bits.tobytes()]})

    return pos.groupBy("shard").applyInPandas(build, "shard int, bits binary")


def build_bloom_shards(
    seen: DataFrame,
    url_col: str = "url",
    hash_col: str = "url_hash",
    n_shards: int = 16,
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """→ ``blooms(shard INT, bits BINARY)`` — one bitset per shard,
    built by an applyInPandas fold over that shard's bit positions."""
    pos = seen.select(
        shard_of(hash_col, n_shards).alias("shard"),
        bit_positions(url_col, n_bits, k).alias("pos"),
    )
    return _fold_bitsets(pos, n_bits)


# --------------------------------------------------------------------------- #
# Rendezvous (HRW) shard addressing — the growable sidecar.
#
# Modulo addressing cannot grow: changing ``n_shards`` moves keys BETWEEN
# surviving shards (shard_rebalance query: ~65% movement 8→12), and a key
# tested against its new shard's old bitset would read a FALSE NEGATIVE —
# so modulo growth forces a full sidecar rebuild from the 10^10-row seen
# set. Under rendezvous hashing (Thaler & Ravishankar, HRW '98) a key's
# winner is argmax over shards of mix(key, shard_id); adding shards leaves
# every old shard's score untouched, so a winner either STAYS or moves to
# a NEW shard — never between old shards. Growth therefore builds bitsets
# only for the new shards (one scan, writes only the won keys) and keeps
# every old bitset byte-identical: keys that left remain as stale set bits
# (a Bloom superset — still no false negatives, marginally higher fpp,
# reclaimed at the next full rebuild/compaction).
# --------------------------------------------------------------------------- #


def hrw_shard_of(url_hash: Column | str, shard_ids: list[int]) -> Column:
    """Rendezvous winner: the shard id maximizing xxhash64(id, url_hash).
    Pure column expression (array of (score, id) structs → array_max);
    struct ordering breaks score ties by the smaller id, deterministically."""
    h = F.col(url_hash) if isinstance(url_hash, str) else url_hash
    scored = F.array(*[
        F.struct(F.xxhash64(F.lit(int(s)), h).alias("w"),
                 F.lit(int(s)).cast("int").alias("id"))
        for s in sorted(int(s) for s in shard_ids)
    ])
    return F.array_max(scored)["id"]


def build_bloom_shards_hrw(
    seen: DataFrame,
    shard_ids: list[int],
    url_col: str = "url",
    hash_col: str = "url_hash",
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
    only_ids: list[int] | None = None,
) -> DataFrame:
    """Bloom shards addressed by rendezvous winner over ``shard_ids``.
    ``only_ids`` restricts the fold to keys won by those shards — the
    incremental growth path (new shards only, old bitsets untouched)."""
    pos = seen.select(
        hrw_shard_of(hash_col, shard_ids).alias("shard"),
        bit_positions(url_col, n_bits, k).alias("pos"),
    )
    if only_ids is not None:
        pos = pos.where(F.col("shard").isin([int(i) for i in only_ids]))
    return _fold_bitsets(pos, n_bits)


def grow_bloom_shards(
    seen_all: DataFrame,
    blooms: DataFrame,
    all_ids: list[int],
    new_ids: list[int],
    url_col: str = "url",
    hash_col: str = "url_hash",
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Grow the HRW sidecar to ``all_ids`` (⊇ the old ids ∪ ``new_ids``):
    build bitsets ONLY for the new shards from the keys they win under the
    grown id set; surviving shards' rows pass through byte-identical. The
    one full-seen-set scan writes only the moved fraction (≈ |new|/|all|
    of keys); nothing else shuffles."""
    new_bits = build_bloom_shards_hrw(
        seen_all, all_ids, url_col=url_col, hash_col=hash_col,
        n_bits=n_bits, k=k, only_ids=new_ids)
    return blooms.unionByName(new_bits)


def bloom_maybe_seen(
    candidates: DataFrame,
    blooms: DataFrame,
    url_col: str = "url",
    hash_col: str = "url_hash",
    n_shards: int = 16,
    n_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
    shard_ids: list[int] | None = None,
) -> DataFrame:
    """Append ``maybe_seen`` boolean. False → definitely not in the seen
    set (Bloom guarantee); True → must be confirmed by the exact join.
    ``shard_ids`` switches addressing from modulo to rendezvous (the
    growable sidecar) — a missing shard row (no keys won yet) tests
    definitely-new, which is exact for that shard."""
    addr = (shard_of(hash_col, n_shards) if shard_ids is None
            else hrw_shard_of(hash_col, shard_ids))
    withpos = candidates.withColumn("_shard", addr).withColumn(
        "_pos", bit_positions(url_col, n_bits, k)
    )
    joined = withpos.join(F.broadcast(blooms.withColumnRenamed("shard", "_shard")), "_shard", "left")

    @pandas_udf("boolean")
    def test(bits: pd.Series, pos: pd.Series) -> pd.Series:
        out = np.empty(len(bits), dtype=bool)
        for i in range(len(bits)):
            b = bits.iloc[i]
            if b is None:
                out[i] = False
                continue
            arr = np.frombuffer(b, dtype=np.uint8)
            p = np.asarray(pos.iloc[i], dtype=np.int64)
            out[i] = bool(np.all(arr[p // 8] & (1 << (p % 8).astype(np.uint8))))
        return pd.Series(out)

    return joined.withColumn("maybe_seen", test(F.col("bits"), F.col("_pos"))).drop(
        "_shard", "_pos", "bits"
    )


def merge_bloom_shards(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """OR the delta's shard bitsets into the existing sidecar (full outer
    per shard) — the incremental per-round update path."""
    if existing is None:
        return delta
    e = existing.withColumnRenamed("bits", "bits_a")
    d = delta.withColumnRenamed("bits", "bits_b")
    joined = e.join(d, "shard", "full_outer")

    @pandas_udf("binary")
    def orbits(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            if x is None:
                out.append(y)
            elif y is None:
                out.append(x)
            else:
                out.append(
                    (np.frombuffer(x, dtype=np.uint8) | np.frombuffer(y, dtype=np.uint8)).tobytes()
                )
        return pd.Series(out)

    return joined.select("shard", orbits(F.col("bits_a"), F.col("bits_b")).alias("bits"))


def bloom_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: DataFrame,
    url_col: str = "url",
    **bloom_kw,
) -> DataFrame:
    """Exact anti-join with Bloom pre-filter: definitely-new rows bypass
    the shuffle; maybe-seen rows get the exact left_anti confirmation.
    Result is IDENTICAL to a plain anti-join (tested), just cheaper.

    ``blooms=None`` (e.g. resuming a crawl whose checkpoint predates
    ``use_bloom``, so the sidecar table is empty) degrades to the plain
    exact anti-join — everything is treated as maybe-seen."""
    if blooms is None:
        return candidates.join(seen.select(F.col(url_col)), url_col, "left_anti")
    flagged = bloom_maybe_seen(candidates, blooms, url_col=url_col, **bloom_kw)
    fresh = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed = maybe.join(seen.select(F.col(url_col)), url_col, "left_anti")
    return fresh.unionByName(confirmed)
