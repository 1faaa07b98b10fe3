"""Portable deterministic hashing.

Every hash that feeds a correctness-checked operator (minhash, simhash,
fingerprints, LSH bands) must be computable bit-identically by the DuckDB
oracle, so we avoid engine-specific hashes (Spark's xxhash64 / DuckDB's
`hash`) and derive integers from MD5 hex prefixes — MD5 is identical
everywhere.  60 bits (15 hex chars) keeps all arithmetic inside a signed
64-bit lane in both engines.

Spark-side expressions here; the matching SQL text lives next to the oracle
queries (__spark_entry__.py) — keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for minhash permutations: prime, ~2e9 so a*h+b stays < 2^63.
MINHASH_P = 2_000_000_011


def md5_long(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative BIGINT.
    DuckDB equivalent: CAST(('0x' || substr(md5(x), 1, 15)) AS UBIGINT)::BIGINT
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def md5_long48(col: Column) -> Column:
    """First 48 bits of md5 — used for simhash bit sampling (48-bit
    signatures keep shift arithmetic well inside int64)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast("long")


def minhash_seed(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for permutation i — same closed form in the
    SQL oracle: a = (i*2654435761 + 1) % P, b = (i*40503 + 17) % P."""
    return ((i * 2654435761 + 1) % MINHASH_P, (i * 40503 + 17) % MINHASH_P)
