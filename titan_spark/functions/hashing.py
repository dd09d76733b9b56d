"""Portable 64-bit hashing — identical in Spark and DuckDB SQL.

Near-dup signatures (MinHash, SimHash) only need a deterministic,
well-mixed 64-bit integer hash; they do not need xxhash64 specifically.
Deriving the hash from ``md5`` (a built-in with bit-identical output in
both engines) makes every signature pipeline expressible as an ANSI-SQL
oracle, converting rows-only correctness checks into full value-hash
checks.  The hash stays JVM-side in Spark (``md5``/``conv`` are built-in
codegen expressions — no Python executes per row).

h60(x) = int(md5(x)[0:15], 16): the top 60 bits of the digest, always
non-negative, fits a signed 64-bit integer in both engines.

Reference parity note: Titan hashes index keys with a configurable
HashingUtil (titan-core hashPrefixKey); the hash function identity is an
implementation detail there too — only determinism and spread matter.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# number of leading hex chars of the md5 digest used (15 → 60 bits)
_HEX_CHARS = 15


def portable_hash64(col: Column | str) -> Column:
    """Spark side: 60-bit non-negative integer hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, _HEX_CHARS), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB side: the exact same h60 over an arbitrary SQL expression."""
    return f"CAST(('0x' || substr(md5({expr}), 1, {_HEX_CHARS})) AS BIGINT)"


def fast_hash64(col: Column | str) -> Column:
    """Production-default 64-bit hash: ``xxhash64`` (a JVM codegen
    intrinsic, several× cheaper per value than the md5-derived portable
    hash). It has no DuckDB twin — select ``portable_hash64`` when the
    pipeline must be value-checkable against an ANSI-SQL oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


HASH_FNS = {"portable": portable_hash64, "xxhash64": fast_hash64}


def resolve_hash_fn(hash_fn):
    """'portable' | 'xxhash64' | a Column->Column callable."""
    if callable(hash_fn):
        return hash_fn
    return HASH_FNS[hash_fn]
