"""Partitioned cuckoo-filter sidecar for the URL-seen set (north rule).

The north rule names a "partitioned Bloom/cuckoo URL-seen filter"; this
is the cuckoo half (the Bloom half lives in ``seen_filter.py``). Same
contract as the Bloom sidecar: a *maybe-seen* pre-filter in front of the
exact ``left_anti`` join — definitely-new URLs skip the shuffle, the
exact join stays the ground truth. What cuckoo adds over Bloom
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14):

* **deletion** — a recrawl/TTL policy can retire URLs from the sidecar
  without rebuilding it (Bloom bitsets only grow);
* lower false-positive rate per byte at high load (16-bit fingerprints,
  4-slot buckets ≈ 0.02% fpp vs ~1% for the 1 MiB Bloom shard);
* bounded lookup cost: exactly two bucket probes + a stash check.

Layout mirrors the Bloom sidecar: the seen set is sharded by
``pmod(url_hash, n_shards)``; each shard owns one cuckoo table
(``n_buckets`` × 4 slots × uint16 fingerprints) plus a small stash.
The 64-bit ``url_hash`` is computed JVM-side (``xxhash64`` — no Python
in the hash path); fingerprint/bucket derivation is pure vectorized
numpy over that int64, Arrow-batched per shard, identical on the build
and test sides.

False-negative safety (the F10 exactness requirement): a cuckoo insert
can fail after MAX_KICKS evictions; a dropped insert would be a false
negative → wrong dedup. Overflows therefore go to a per-shard **stash**
((bucket, fingerprint) keys) that every lookup also checks — membership
for inserted items is guaranteed, so ``cuckoo_anti_join`` is IDENTICAL
to the plain anti-join (tested), just cheaper.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SLOTS = 4
DEFAULT_BUCKETS = 1 << 15  # 32768 buckets × 4 slots × 2 B = 256 KiB/shard
MAX_KICKS = 500
_BULK_PASSES = 8

SHARDS_SCHEMA = "shard int, table binary, stash binary"


def shard_of(url_hash: Column | str, n_shards: int) -> Column:
    h = F.col(url_hash) if isinstance(url_hash, str) else url_hash
    return F.pmod(h, F.lit(n_shards)).cast("int")


# ------------------------------------------------------------------ #
# numpy core — all derivation from the signed-int64 Spark xxhash64.
# Deterministic and shared by build/test/delete so both sides agree.
# ------------------------------------------------------------------ #
def _derive(h: np.ndarray, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprint uint16 ∈ [1, 65535], primary bucket int64)."""
    u = h.astype(np.int64).view(np.uint64)
    fp = (u >> np.uint64(32)) % np.uint64(65535) + np.uint64(1)
    # mix so the bucket is independent of the low bits already consumed
    # by the shard modulus (splitmix64-style finalizer)
    m = (u ^ (u >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    m ^= m >> np.uint64(29)
    b1 = (m % np.uint64(n_buckets)).astype(np.int64)
    return fp.astype(np.uint16), b1


def _alt_bucket(b: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key alternate: b ^ h(fp). n_buckets is a power of two so
    XOR stays in range and alt(alt(b)) == b (needed for delete/kicks)."""
    hfp = (fp.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
    return (b.astype(np.uint64) ^ (hfp % np.uint64(n_buckets))).astype(np.int64)


def _stash_keys(b: np.ndarray, fp: np.ndarray) -> np.ndarray:
    return (b.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)


def _bulk_insert(
    table: np.ndarray, stash: list[int], fp: np.ndarray, b1: np.ndarray, n_buckets: int
) -> None:
    """Insert (fp, b1) pairs into the (n_buckets, SLOTS) uint16 table.
    Vectorized placement passes handle the bulk (at sane load nearly
    everything lands in a pass or two); a per-item kick loop relocates
    the stragglers; anything still homeless goes to the stash."""
    pend_fp, pend_b = fp.astype(np.uint16), b1.astype(np.int64)
    for _ in range(_BULK_PASSES):
        if not len(pend_fp):
            return
        placed = np.zeros(len(pend_fp), dtype=bool)
        for use_alt in (False, True):
            b = _alt_bucket(pend_b, pend_fp, n_buckets) if use_alt else pend_b
            for s in range(SLOTS):
                cand = np.flatnonzero(~placed & (table[b, s] == 0))
                if not len(cand):
                    continue
                # one winner per bucket per pass (first occurrence)
                _, first = np.unique(b[cand], return_index=True)
                win = cand[first]
                # re-check freeness (an earlier slot pass can't collide —
                # distinct s — but alt-pass may target a bucket a primary
                # pass just filled in THIS slot)
                win = win[table[b[win], s] == 0]
                table[b[win], s] = pend_fp[win]
                placed[win] = True
        pend_fp, pend_b = pend_fp[~placed], pend_b[~placed]
    # kick loop for the tail (deterministic slot rotation)
    for k in range(len(pend_fp)):
        f, b = int(pend_fp[k]), int(pend_b[k])
        done = False
        for kick in range(MAX_KICKS):
            row = table[b]
            z = np.flatnonzero(row == 0)
            if len(z):
                table[b, z[0]] = f
                done = True
                break
            s = kick % SLOTS
            f, table[b, s] = int(table[b, s]), f
            b = int(_alt_bucket(np.array([b]), np.array([f], np.uint16), n_buckets)[0])
        if not done:
            stash.append(int((b << 16) | f))


def _pack(table: np.ndarray, stash: list[int]) -> tuple[bytes, bytes]:
    return table.tobytes(), np.asarray(sorted(stash), dtype=np.uint64).tobytes()


def _unpack(table_b: bytes | None, stash_b: bytes | None, n_buckets: int):
    if table_b is None:
        table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
    else:
        table = np.frombuffer(table_b, dtype=np.uint16).reshape(n_buckets, SLOTS).copy()
    stash = np.frombuffer(stash_b, dtype=np.uint64) if stash_b else np.empty(0, np.uint64)
    return table, stash


# ------------------------------------------------------------------ #
# DataFrame surface
# ------------------------------------------------------------------ #
def build_cuckoo_shards(
    seen: DataFrame,
    hash_col: str = "url_hash",
    n_shards: int = 16,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """→ ``(shard INT, table BINARY, stash BINARY)`` — one cuckoo table
    per shard, built by an applyInPandas fold over that shard's hashes."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of two"
    pos = seen.select(
        shard_of(hash_col, n_shards).alias("shard"), F.col(hash_col).alias("h")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        stash: list[int] = []
        if len(pdf):
            fp, b1 = _derive(pdf["h"].to_numpy(np.int64), n_buckets)
            _bulk_insert(table, stash, fp, b1, n_buckets)
        tb, sb = _pack(table, stash)
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "table": [tb], "stash": [sb]}
        )

    return pos.groupBy("shard").applyInPandas(build, SHARDS_SCHEMA)


def cuckoo_maybe_seen(
    candidates: DataFrame,
    shards: DataFrame,
    hash_col: str = "url_hash",
    n_shards: int = 16,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Append ``maybe_seen``. False → definitely not inserted (stash
    closes the false-negative hole); True → confirm via exact join."""
    withs = candidates.withColumn("_shard", shard_of(hash_col, n_shards))
    joined = withs.join(
        F.broadcast(shards.withColumnRenamed("shard", "_shard")), "_shard", "left"
    )

    @pandas_udf("boolean")
    def test(shard: pd.Series, table_b: pd.Series, stash_b: pd.Series, h: pd.Series) -> pd.Series:
        out = np.zeros(len(h), dtype=bool)
        hv = h.to_numpy(np.int64)
        sh = shard.to_numpy()
        for s in pd.unique(sh):  # vectorize per shard-group in the batch
            idx = np.flatnonzero(sh == s)
            tb = table_b.iloc[idx[0]]
            if tb is None:  # no table for this shard → nothing inserted
                continue
            table, stash = _unpack(tb, stash_b.iloc[idx[0]], n_buckets)
            fp, b1 = _derive(hv[idx], n_buckets)
            b2 = _alt_bucket(b1, fp, n_buckets)
            hit = (table[b1] == fp[:, None]).any(1) | (table[b2] == fp[:, None]).any(1)
            if len(stash):
                hit |= np.isin(_stash_keys(b1, fp), stash) | np.isin(
                    _stash_keys(b2, fp), stash
                )
            out[idx] = hit
        return pd.Series(out)

    return joined.withColumn(
        "maybe_seen", test(F.col("_shard"), F.col("table"), F.col("stash"), F.col(hash_col))
    ).drop("_shard", "table", "stash")


def merge_cuckoo_shards(
    existing: DataFrame | None,
    delta: DataFrame,
    hash_col: str = "url_hash",
    n_shards: int = 16,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Insert the delta's hashes into the existing shard tables (cogrouped
    applyInPandas) — the incremental per-round update path. Shards with
    no prior table start empty; shards with no delta pass through."""
    pos = delta.select(
        shard_of(hash_col, n_shards).alias("shard"), F.col(hash_col).alias("h")
    )
    if existing is None:
        return build_cuckoo_shards(delta, hash_col, n_shards, n_buckets)

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left):
            shard = int(left["shard"].iloc[0])
            table, stash_arr = _unpack(left["table"].iloc[0], left["stash"].iloc[0], n_buckets)
        else:
            shard = int(right["shard"].iloc[0])
            table, stash_arr = _unpack(None, None, n_buckets)
        stash = [int(x) for x in stash_arr]
        if len(right):
            fp, b1 = _derive(right["h"].to_numpy(np.int64), n_buckets)
            _bulk_insert(table, stash, fp, b1, n_buckets)
        tb, sb = _pack(table, stash)
        return pd.DataFrame({"shard": [shard], "table": [tb], "stash": [sb]})

    return (
        existing.groupBy("shard")
        .cogroup(pos.groupBy("shard"))
        .applyInPandas(lambda left, right: merge(left, right), SHARDS_SCHEMA)
    )


def cuckoo_delete(
    shards: DataFrame,
    removals: DataFrame,
    hash_col: str = "url_hash",
    n_shards: int = 16,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Remove one matching fingerprint per removal from its bucket pair
    (or the stash) — the cuckoo deletion that Bloom cannot do. Deleting a
    URL that was never inserted is a no-op (standard cuckoo caveat: only
    delete what you inserted, or a colliding twin's slot may be freed —
    membership then falls back to the exact join, never wrong dedup)."""
    pos = removals.select(
        shard_of(hash_col, n_shards).alias("shard"), F.col(hash_col).alias("h")
    )

    def rm(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(columns=["shard", "table", "stash"])
        shard = int(left["shard"].iloc[0])
        table, stash_arr = _unpack(left["table"].iloc[0], left["stash"].iloc[0], n_buckets)
        stash = [int(x) for x in stash_arr]
        if len(right):
            fp, b1 = _derive(right["h"].to_numpy(np.int64), n_buckets)
            b2 = _alt_bucket(b1, fp, n_buckets)
            for i in range(len(fp)):
                f = int(fp[i])
                removed = False
                for b in (int(b1[i]), int(b2[i])):
                    hitslots = np.flatnonzero(table[b] == f)
                    if len(hitslots):
                        table[b, hitslots[0]] = 0
                        removed = True
                        break
                if not removed:
                    for key in (int((b1[i] << 16) | f), int((b2[i] << 16) | f)):
                        if key in stash:
                            stash.remove(key)
                            break
        tb, sb = _pack(table, stash)
        return pd.DataFrame({"shard": [shard], "table": [tb], "stash": [sb]})

    return (
        shards.groupBy("shard")
        .cogroup(pos.groupBy("shard"))
        .applyInPandas(lambda left, right: rm(left, right), SHARDS_SCHEMA)
    )


def cuckoo_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    shards: DataFrame | None,
    url_col: str = "url",
    hash_col: str = "url_hash",
    n_shards: int = 16,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Exact anti-join with cuckoo pre-filter — result IDENTICAL to the
    plain anti-join (tested), definitely-new rows skip the shuffle.
    ``shards=None`` degrades to the plain exact anti-join."""
    if shards is None:
        return candidates.join(seen.select(F.col(url_col)), url_col, "left_anti")
    flagged = cuckoo_maybe_seen(candidates, shards, hash_col, n_shards, n_buckets)
    fresh = flagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.where(F.col("maybe_seen")).drop("maybe_seen")
    confirmed = maybe.join(seen.select(F.col(url_col)), url_col, "left_anti")
    return fresh.unionByName(confirmed)
