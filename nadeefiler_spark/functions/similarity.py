"""Similarity primitives: cosine, MinHash, SimHash — expression-first.

Everything stays JVM-side (higher-order array functions, xxhash64,
bitwise ops); no Python in the hot path. Hash mixing uses Spark's
built-in xxhash64 with distinct seeds — deterministic across runs,
executors, and parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 61) - 1
MASK64 = (1 << 64) - 1
AFFINE_SEED = 0x5EED_CAFE


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays (double math)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for seed i, min over shingles of
    xxhash64(shingle, seed=i) (as unsigned-ish via abs).

    Returns array<bigint> of length num_hashes. Runs per row over the
    shingle array — no explode, no shuffle.
    """
    sig = [
        F.array_min(F.transform(shingles, lambda s: F.abs(F.xxhash64(s, F.lit(i)))))
        for i in range(num_hashes)
    ]
    return F.array(*sig)


def word_shingle_hashes(c: Column | str, n: int = 3) -> Column:
    """64-bit hashes of word n-gram shingles, computed arithmetically.

    The string-shingle path (array_join of slices per position) costs
    O(tokens x n) interpreted string builds per row; here each token is
    hashed ONCE and consecutive hashes combine with an order-sensitive
    rotate-xor — O(tokens) arithmetic, ~5x faster (measured 6.8s ->
    ~1.5s on 5k docs). Bitwise ops wrap (no ANSI overflow), unlike
    multiply-combine. Collision probability ~2^-64 per pair — fine for
    LSH candidates and near-dup Jaccard; use text.word_shingles when the
    actual shingle strings are needed.
    """
    from . import text as X

    toks = X.tokens(c)
    h = F.transform(toks, lambda t: F.xxhash64(t))
    m = F.size(toks) - (n - 1)
    parts = [F.slice(h, i + 1, m) for i in range(n)]
    comb = parts[0]
    for p in parts[1:]:
        comb = F.zip_with(
            comb, p,
            lambda a, b: F.shiftleft(a, 13)
            .bitwiseXOR(F.shiftrightunsigned(a, 51))
            .bitwiseXOR(b),
        )
    return F.when(m >= 1, comb).otherwise(F.expr("cast(array() as array<bigint>)"))


def minhash_signature_hashed(shingle_hashes: Column, num_hashes: int = 64) -> Column:
    """MinHash signature over pre-hashed shingles (array<bigint>).

    Expression-only variant (64 transform+array_min passes); kept as a
    compatibility/reference path — the production signature stage is
    :func:`minhash_signature_arrow` (one vectorized numpy pass; measured
    3-5x cheaper per row at 64 hashes).
    """
    sig = [
        F.array_min(F.transform(shingle_hashes, lambda s: F.abs(F.xxhash64(s, F.lit(i)))))
        for i in range(num_hashes)
    ]
    return F.array(*sig)


def affine_consts(num_hashes: int, seed: int = AFFINE_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) uint64 constants for the affine MinHash family
    h_i(x) = a_i * x + b_i  (mod 2^64), a_i odd (a bijection of Z_2^64).

    Exported so a pure-Python twin can reproduce signatures exactly
    (tests/test_dedup_similarity.py golden-equality check).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 64, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 64, size=num_hashes, dtype=np.uint64)
    return a, b


def affine_minhash_py(shingle_hashes: list[int], num_hashes: int = 64,
                      seed: int = AFFINE_SEED) -> list[int]:
    """Pure-Python twin of :func:`minhash_signature_arrow` (no numpy in
    the hot loop semantics: plain ints mod 2^64, signed-int64 output)."""
    a, b = affine_consts(num_hashes, seed)
    out = []
    for ai, bi in zip(a.tolist(), b.tolist()):
        m = min(((ai * (h & MASK64) + bi) & MASK64) for h in shingle_hashes)
        out.append(m - (1 << 64) if m >= (1 << 63) else m)
    return out


def minhash_signature_arrow(shingle_hashes: Column, num_hashes: int = 64,
                            seed: int = AFFINE_SEED) -> Column:
    """Vectorized MinHash signature: ONE numpy pass per row instead of 64
    interpreted expression passes.

    Input: array<bigint> pre-hashed shingles (from
    :func:`word_shingle_hashes` — Spark xxhash64, JVM-side). The hash
    family is affine-mod-2^64 with odd multipliers (a permutation family;
    public LSH construction), applied in uint64 numpy with natural
    wraparound — deterministic across executors, batch sizes, and
    parallelism because it is a pure per-row function of the input array.
    Empty input -> all int64-max sentinel (never matches a real bucket).
    """
    a, b = affine_consts(num_hashes, seed)
    a2, b2 = a[:, None], b[:, None]
    sentinel = np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def sig(col: pd.Series) -> pd.Series:
        out = []
        for row in col:
            h = np.asarray(row, dtype=np.int64).astype(np.uint64)
            if h.size == 0:
                out.append(sentinel)
            else:
                out.append((a2 * h[None, :] + b2).min(axis=1).view(np.int64))
        return pd.Series(out)

    return sig(shingle_hashes)


def minhash_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band keys for LSH: hash of each band's slice of the signature.

    Returns array<struct<band:int, key:bigint>> — explode and group on
    (band, key) to get candidate buckets.
    """
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                )
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return F.array(*entries)


def simhash64(toks: Column) -> Column:
    """64-bit SimHash over a token array.

    For each bit position j: sum over tokens of (+1 if bit j of
    xxhash64(token) set else -1); fingerprint bit j = sign of the sum.
    Expressed with one pass per bit over the (small) per-row token
    array — still expression-only and embarrassingly parallel.
    """
    h = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_sum(bit: int):
        return lambda acc, v: acc + F.when(
            v.bitwiseAND(F.lit(bit).cast("long")) != 0, 1
        ).otherwise(-1)

    bits = []
    for j in range(64):
        # two's-complement: bit 63 as a signed-long literal is Long.MIN
        bit = (1 << j) if j < 63 else -(1 << 63)
        contrib = F.aggregate(h, F.lit(0), bit_sum(bit))
        bits.append(F.when(contrib > 0, F.lit(bit).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash64_arrow(token_hashes: Column) -> Column:
    """Vectorized SimHash over pre-hashed tokens (array<bigint>).

    Bit-for-bit identical to :func:`simhash64` fed the same xxhash64
    token hashes (one 2D numpy bit-count per row instead of 64 aggregate
    expression passes): fingerprint bit j is set iff more tokens have
    bit j set than clear. Empty input -> 0 (same as the expression path,
    where every contrib aggregate is 0, never > 0).
    """
    shifts = np.arange(64, dtype=np.uint64)
    powers = np.uint64(1) << shifts

    @F.pandas_udf("bigint")
    def fp(col: pd.Series) -> pd.Series:
        vals = np.zeros(len(col), dtype=np.uint64)
        for i, row in enumerate(col):
            h = np.asarray(row, dtype=np.int64).astype(np.uint64)
            if h.size == 0:
                continue
            ones = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
            # contrib_j = ones - (n - ones) > 0  <=>  2*ones > n
            vals[i] = powers[2 * ones > h.size].sum(dtype=np.uint64)
        return pd.Series(vals.view(np.int64))

    return fp(token_hashes)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_chunks(fp: Column, n_chunks: int = 4) -> Column:
    """Split a 64-bit fingerprint into n 16-bit chunk keys for LSH
    blocking (two fingerprints within hamming distance < n_chunks share
    at least one chunk — pigeonhole)."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    entries = [
        F.struct(
            F.lit(i).alias("chunk"),
            F.shiftrightunsigned(fp, i * width).bitwiseAND(F.lit(mask).cast("long")).alias("key"),
        )
        for i in range(n_chunks)
    ]
    return F.array(*entries)
