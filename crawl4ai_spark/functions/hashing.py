"""Cross-engine deterministic hashing primitives.

The engine's hot-path keys use ``xxhash64`` (JVM built-in, no Python).
For operators whose results must be *verifiable by the DuckDB oracle*
(minhash/simhash/LSH dedup, fingerprints), xxhash64 does not exist in
DuckDB — so those operators use a 60-bit hash derived from ``md5``,
which both engines implement identically:

    Spark :  conv(substring(md5(s), 1, 15), 16, 10)  → BIGINT
    DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex chars = 60 bits < 2^63, so the value fits a signed BIGINT in
both engines with no overflow ambiguity. Each helper here has a Spark
Column form and a SQL-emitter form so the engine plan and the oracle
share one definition.

Scale note: md5 is ~3x slower than xxhash64 but still JVM-side
whole-stage-codegen — acceptable for the dedup operators where
cross-engine verifiability is the point; the frontier/seen-set path
stays on xxhash64 (functions/urls.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1: rolling-hash modulus (products stay < 2^36)


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


# --------------------------------------------------------------------------- #
# 60-bit md5 hash
# --------------------------------------------------------------------------- #
def h60(s: Column | str) -> Column:
    """60-bit non-negative BIGINT hash of a string (cross-engine)."""
    return F.conv(F.substring(F.md5(_c(s)), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB SQL emitting the identical 60-bit hash."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def h60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# --------------------------------------------------------------------------- #
# word-level polynomial rolling fingerprint (document fingerprinting)
# --------------------------------------------------------------------------- #
def rolling_fingerprint(tokens: Column) -> Column:
    """h = fold(tokens, h*31 + h60(w) mod M) — order-sensitive doc fingerprint.

    Kept under MERSENNE31 so ``h*31 + wh < 2^36`` — identical arithmetic in
    Spark LONG and DuckDB BIGINT (DuckDB errors on overflow; Spark wraps —
    staying small avoids both behaviors ever differing).
    """
    wh = lambda w: F.pmod(h60(w), F.lit(MERSENNE31))  # noqa: E731
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * 31 + wh(w), F.lit(MERSENNE31)),
    )


def rolling_fingerprint_sql(tokens_expr: str) -> str:
    m = MERSENNE31
    return (
        f"coalesce(list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({tokens_expr}, w -> {h60_sql('w')} % {m})), "
        f"(acc, wh) -> (acc * 31 + wh) % {m}), 0)"
    )


# --------------------------------------------------------------------------- #
# shingles (word k-grams)
# --------------------------------------------------------------------------- #
def shingles(tokens: Column, k: int) -> Column:
    """Word k-gram strings; empty array when the doc has < k tokens."""
    n = F.size(tokens)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.array_join(F.slice(tokens, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(tokens_expr: str, k: int) -> str:
    return (
        f"(CASE WHEN len({tokens_expr}) >= {k} THEN "
        f"list_transform(generate_series(1, len({tokens_expr}) - {k} + 1), "
        f"i -> array_to_string(list_slice({tokens_expr}, i, i + {k} - 1), ' ')) "
        f"ELSE [] END)"
    )


# --------------------------------------------------------------------------- #
# MinHash signature — classic affine-permutation family over ONE base hash
# per shingle: h = h60(s) mod M31, perm p's value = (a_p*h + b_p) mod M31.
# One md5 per shingle total (vs one per perm per shingle for salted-hash
# permutations — 12x less hashing, the dominant cost at corpus scale).
# a_p/b_p are fixed LCG-derived constants so both engines embed identical
# literals; products stay < 2^62 so BIGINT arithmetic never overflows in
# either engine (DuckDB errors on overflow; Spark wraps — neither happens).
# --------------------------------------------------------------------------- #
def _minhash_ab(n_perm: int) -> list[tuple[int, int]]:
    out = []
    for p in range(1, n_perm + 1):
        a = (1103515245 * p + 12345) % MERSENNE31 or 1
        b = (214013 * p + 2531011) % MERSENNE31
        out.append((a, b))
    return out


def shingle_hashes(shingle_arr: Column) -> Column:
    """Base hashes: h60(s) mod M31 per shingle (the only md5 in minhash)."""
    return F.transform(shingle_arr, lambda s: F.pmod(h60(s), F.lit(MERSENNE31)))


def shingle_hashes_sql(shingles_expr: str) -> str:
    return f"list_transform({shingles_expr}, s -> {h60_sql('s')} % {MERSENNE31})"


def _affine(a: int, b: int):
    # closure (not default-arg lambda): pyspark derives the HOF lambda's
    # arity from the Python signature, so default args would break it
    return lambda h: F.pmod(h * a + b, F.lit(MERSENNE31))


def minhash_sig_from_hashes(hs: Column, n_perm: int) -> Column:
    """n_perm minhash values from precomputed base hashes. Empty shingle
    set → all-zero signature (a real min is ~never 0)."""
    return F.array(*[
        F.coalesce(F.array_min(F.transform(hs, _affine(a, b))), F.lit(0).cast("long"))
        for a, b in _minhash_ab(n_perm)
    ])


def minhash_sig(shingle_arr: Column, n_perm: int) -> Column:
    """Single-expression form; prefer shingle_hashes → project →
    minhash_sig_from_hashes in pipelines so the base-hash array is
    materialized once per row, not re-derived per permutation."""
    return minhash_sig_from_hashes(shingle_hashes(shingle_arr), n_perm)


def minhash_sig_sql(shingles_expr: str, n_perm: int) -> str:
    m = MERSENNE31
    hs = shingle_hashes_sql(shingles_expr)
    elems = ", ".join(
        f"coalesce(list_min(list_transform({hs}, h -> (h * {a} + {b}) % {m})), 0)"
        for a, b in _minhash_ab(n_perm)
    )
    return f"[{elems}]"


def band_keys(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """LSH band keys: band b's key = h60(b || ':' || sig[b*r .. b*r+r-1])."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: h60(
            F.concat(
                b.cast("string"),
                F.lit(":"),
                F.array_join(
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                ),
            )
        ),
    )


def band_keys_sql(sig_expr: str, n_bands: int, rows_per_band: int) -> str:
    inner = h60_sql(
        "b::VARCHAR || ':' || array_to_string(list_transform("
        f"list_slice({sig_expr}, b * {rows_per_band} + 1, (b + 1) * {rows_per_band}), "
        "v -> v::VARCHAR), ',')"
    )
    return f"list_transform(generate_series(0, {n_bands - 1}), b -> {inner})"


# --------------------------------------------------------------------------- #
# SimHash (60-bit)
# --------------------------------------------------------------------------- #
def simhash_counts(tokens: Column) -> Column:
    """Per-bit set-counts (length-60 int array) — materialize this in its
    own projection, then apply ``simhash_pack``: packing references the
    counts 60 times, and a materialized column keeps that O(1) per ref
    instead of re-evaluating the whole fold per bit."""
    # hash once per token (fold over the hash array, not the tokens —
    # the 60 bit extractions then reference the lambda var, not 60 md5s)
    hashes = F.transform(tokens, h60)
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 60),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[
                # literal shift amounts: F.shiftright requires a Python int
                F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("int")
                for j in range(60)
            ]),
            lambda a, b: a + b,
        ),
    )


def simhash_pack(counts: Column, n_tokens: Column) -> Column:
    sim = F.lit(0).cast("long")
    for j in range(60):
        sim = sim + F.when(
            F.get(counts, j) * 2 > n_tokens, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sim


def simhash60(tokens: Column) -> Column:
    """Classic simhash over unit-weight tokens, 60-bit (fits BIGINT both engines).

    bit j of the result = 1 iff (# tokens with bit j set) * 2 > # tokens.
    Ties (exactly half) → 0, matching the strict '>' in the SQL emitter.

    NB: single-expression form — the packing step inlines the counts
    fold 60×. Prefer simhash_counts → project → simhash_pack in real
    pipelines (10×+ faster); this form exists for expression contexts.
    """
    return simhash_pack(simhash_counts(tokens), F.size(tokens))


def simhash_hashes_sql(tokens_expr: str) -> str:
    """Hash once per token (mirror of the Spark side's hash-once barrier —
    inlining h60 into the per-bit extraction re-runs the md5 60× per
    token and made the DuckDB oracle ~30× slower than this split)."""
    return f"list_transform({tokens_expr}, w -> {h60_sql('w')})"


def simhash_counts_sql(hashes_expr: str) -> str:
    """Per-bit set-counts fold over pre-computed hashes; materialize the
    result (AS MATERIALIZED CTE) before packing references it 60×."""
    bits_of = "list_transform(generate_series(0, 59), j -> (h >> j) & 1)"
    return (
        f"list_reduce(list_prepend(list_transform(generate_series(0, 59), j -> 0::BIGINT), "
        f"list_transform({hashes_expr}, h -> {bits_of})), "
        f"(acc, bits) -> list_transform(generate_series(1, 60), i -> acc[i] + bits[i]))"
    )


def simhash_pack_sql(counts_expr: str, n_expr: str) -> str:
    pack = (
        f"list_transform(generate_series(1, 60), i -> CASE WHEN ({counts_expr})[i] * 2 > "
        f"({n_expr}) THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END)"
    )
    return f"list_reduce(list_prepend(0::BIGINT, {pack}), (a, b) -> a + b)"


def simhash60_sql(tokens_expr: str) -> str:
    """Single-expression form (counts/pack inlined). Exists for expression
    contexts only — staged CTEs via simhash_hashes_sql/simhash_counts_sql/
    simhash_pack_sql are 30×+ faster, mirroring the Spark-side split."""
    counts = simhash_counts_sql(simhash_hashes_sql(tokens_expr))
    return simhash_pack_sql(counts, f"len({tokens_expr})")


def hamming60(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_band(sim: Column | str, band: int, bits: int = 15) -> Column:
    """One of 60/bits contiguous bit-segments — LSH key for hamming join."""
    return F.shiftright(_c(sim), band * bits).bitwiseAND(F.lit((1 << bits) - 1))
