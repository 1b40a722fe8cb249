"""Pure-Python XXH64 reference (public algorithm, Yann Collet's xxHash).

Used only to validate the DuckDB SQL-macro implementation in
etl_cotrip_signs_spark/functions/xxh64_sql.py against known-good values —
Spark's `xxhash64` is the same algorithm with seed 42 (spec-conformant;
Spark pins reference vectors in its own test suite).
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc: int, w: int) -> int:
    return (_rotl((acc + w * P2) & M, 31) * P1) & M


def _merge(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * P1 + P4) & M


def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        i = 0
        while i + 32 <= n:
            w = [int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little") for j in range(4)]
            v1, v2, v3, v4 = _round(v1, w[0]), _round(v2, w[1]), _round(v3, w[2]), _round(v4, w[3])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + P5) & M
        i = 0
    h = (h + n) & M
    while i + 8 <= n:
        w = int.from_bytes(data[i : i + 8], "little")
        h = (_rotl(h ^ _round(0, w), 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        w = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl(h ^ (w * P1) & M, 23) * P2 + P3) & M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Spark-compatible signed view of the 64-bit hash."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= 1 << 63 else h
