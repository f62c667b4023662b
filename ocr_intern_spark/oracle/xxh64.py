"""Pure-Python XXH64 — an independent implementation of the public
xxHash64 specification (Collet, github.com/Cyan4973/xxHash), used as
the oracle for the engine's xxhash64-based fast paths
(`dedup_minhash_fast`, `dedup_minhash_fast_lsh_buckets`), which have
no DuckDB-expressible oracle because `F.xxhash64` is Spark-side.

Spark's `XxHash64` expression (catalyst XXH64) follows the reference
spec with per-type input encoding and multi-argument CHAINING:

* each argument is hashed with the running hash as its seed
  (initial seed 42);
* IntegerType is hashed as its 4 little-endian bytes (the spec's
  4-byte tail step), LongType as 8 LE bytes, StringType as its UTF-8
  bytes through the full streaming algorithm.

This module implements the byte-level spec once and dispatches the
same encodings, so signatures computed here are bit-identical to the
Spark column — verified by `tests/test_xxh64_oracle.py` against
`F.xxhash64` over ints, longs and strings (including >32-byte
strings that exercise the 4-accumulator stripe loop).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of a byte string; returns the UNSIGNED 64-bit hash."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            (l1, l2, l3, l4) = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = (
                _round(v1, l1),
                _round(v2, l2),
                _round(v3, l3),
                _round(v4, l4),
            )
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, lane)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, i)
        h ^= (lane * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*vals, seed: int = 42) -> int:
    """Replicates Spark's `F.xxhash64(*cols)` chaining and per-type
    encoding; returns the SIGNED 64-bit value Spark emits. Each value
    is `("i32", int)`, `("i64", int)` or `("str", str)` matching the
    Spark-side column types (python int literals under `F.lit` are
    IntegerType when they fit in 32 bits)."""
    h = seed
    for kind, v in vals:
        if kind == "i32":
            h = xxh64(struct.pack("<i", v), h)
        elif kind == "i64":
            h = xxh64(struct.pack("<q", v), h)
        elif kind == "str":
            h = xxh64(v.encode("utf-8"), h)
        else:  # pragma: no cover - caller bug
            raise ValueError(f"unknown kind {kind!r}")
    return _signed(h & _M)
