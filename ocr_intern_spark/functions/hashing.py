"""Cross-engine FNV-1a-64 SQL fragment builders.

Shared by dedup (minhash portable path) and text (CDC chunking) —
lives in functions/ so operator modules can use it without importing
each other (dedup imports text, so text must never import dedup at
module scope). Semantics: exact 64-bit FNV-1a over the string's
codepoints, expressed in signed-BIGINT wrap-around arithmetic that
Spark SQL and DuckDB evaluate identically (the 32×32 split-multiply
keeps every intermediate inside int64).
"""

from __future__ import annotations

FNV_OFFSET = -3750763034362895579  # 14695981039346656037 - 2^64
_M32, _B32, _HALF = 4294967295, 4294967296, 2147483648


def fnv_step(xor: str) -> str:
    """One FNV-1a round: (h ^ c) * 0x100000001b3 mod 2^64, in signed
    64-bit SQL arithmetic (prime = 2^40 + 2^8 + 0xb3 → 256/435
    split-multiply)."""
    mid = (
        f"((({xor}) & {_M32}) * 256 + ((({xor}) >> 32) & {_M32}) * 435"
        f" + ((((({xor}) & {_M32}) * 435) >> 32) & {_M32})) & {_M32}"
    )
    return (
        f"CAST((CASE WHEN {mid} >= {_HALF} THEN ({mid}) - {_B32} "
        f"ELSE {mid} END) * {_B32} + (((({xor}) & {_M32}) * 435) & {_M32})"
        f" AS BIGINT)"
    )


def fnv1a64_spark(expr: str) -> str:
    """Spark SQL FNV-1a-64 of a non-empty string expression (BIGINT)."""
    return (
        f"aggregate(transform(split({expr}, ''), ch -> ascii(ch)), "
        f"CAST({FNV_OFFSET} AS BIGINT), (h, c) -> {fnv_step('(h ^ c)')})"
    )


def fnv1a64_duckdb(expr: str) -> str:
    """DuckDB SQL FNV-1a-64 of the same string expression — identical
    output to fnv1a64_spark (list_reduce has no init param, so the
    offset basis is prepended to the codepoint list)."""
    return (
        f"list_reduce(list_prepend(CAST({FNV_OFFSET} AS BIGINT), "
        f"list_transform(string_split({expr}, ''), "
        f"ch -> CAST(unicode(ch) AS BIGINT))), "
        f"(h, c) -> {fnv_step('xor(h, c)')})"
    )
