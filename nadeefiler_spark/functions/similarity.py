"""Similarity primitives: cosine, MinHash, SimHash — expression-first.

Everything stays JVM-side (higher-order array functions, xxhash64,
bitwise ops); no Python in the hot path. Hash mixing uses Spark's
built-in xxhash64 with distinct seeds — deterministic across runs,
executors, and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 61) - 1


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
    """MinHash signature over pre-hashed shingles (array<bigint>)."""
    sig = [
        F.array_min(F.transform(shingle_hashes, lambda s: F.abs(F.xxhash64(s, F.lit(i)))))
        for i in range(num_hashes)
    ]
    return F.array(*sig)


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
