"""Portable deterministic hashing shared by the dedup/similarity operators.

``phash`` produces the same 60-bit integer in Spark and in DuckDB
(``('0x' || substr(md5(x), 1, 15))::BIGINT``), so every hash-driven operator
(minhash, simhash, fingerprints, LSH banding) is exactly reproducible by an
oracle SQL — the correctness gate covers the full pipeline, not just row
counts.  md5 is a JVM-side codegen'd expression; at scale this stays in
whole-stage codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB expression template for the same hash
PHASH_SQL = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def phash(c: Column) -> Column:
    """60-bit deterministic hash of a string column (md5 hex prefix)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def phash_seeded(c: Column, seed: int) -> Column:
    """Seeded variant: hash of ``value || '#' || seed``."""
    return phash(F.concat(c, F.lit(f"#{seed}")))


def phash_seeded_sql(expr: str, seed: int) -> str:
    return PHASH_SQL.format(expr=f"({expr} || '#{seed}')")
