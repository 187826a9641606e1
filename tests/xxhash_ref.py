"""Pure-Python twin of Spark's ``xxhash64`` expression.

XXH64 is Yann Collet's public xxHash algorithm (BSD); Spark applies it
with default seed 42, hashing UTF-8 bytes for strings, the 8-byte value
for longs, and the zero-extended 4-byte value for ints. This twin exists
so the MinHash/SimHash dedup pipelines can be verified end-to-end by an
implementation that shares NO code with the engine under test
(tests/test_hash_twins.py asserts exact equality against
``F.xxhash64`` first, then against the full pair pipelines).
"""

from __future__ import annotations

M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(v: int, n: int) -> int:
    return ((v << n) | (v >> (64 - n))) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i + 32 <= length:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * P2) & M64, 31) * P1) & M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * P2) & M64, 31) * P1) & M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * P2) & M64, 31) * P1) & M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * P2) & M64, 31) * P1) & M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M64, 31) * P1) & M64
            h = (h * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + length) & M64
    while i + 8 <= length:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= length:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        i += 4
    while i < length:
        h ^= (data[i] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        i += 1
    return _fmix(h)


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 64-bit value (Spark hashes LongType this way)."""
    h = (seed + P5 + 8) & M64
    h ^= (_rotl(((v & M64) * P2) & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def xxh64_int(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 32-bit value, zero-extended (Spark IntegerType)."""
    h = (seed + P5 + 4) & M64
    h ^= ((v & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def to_signed(v: int) -> int:
    """Unsigned 64-bit -> Java/Spark signed long."""
    return v - (1 << 64) if v >= (1 << 63) else v


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64(string_col)``: UTF-8 bytes, signed result."""
    return to_signed(xxh64_bytes(s.encode("utf-8"), seed))
