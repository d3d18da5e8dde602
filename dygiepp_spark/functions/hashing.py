"""Portable deterministic hashing shared by dedup/fingerprint operators.

Everything is built on md5 hex strings because they are bit-identical in
Spark and DuckDB (and any other engine), unlike xxhash64/murmur which are
engine-specific. ``hash60`` maps a string to a 60-bit non-negative int via
the first 15 hex chars:

* Spark : ``conv(substring(md5(x), 1, 15), 16, 10) :: bigint``
* DuckDB: ``('0x' || substr(md5(x), 1, 15)) :: BIGINT``

md5 is NOT for security here — it is a cheap, portable, uniform hash.
At 100 TB scale you would swap xxhash64 (JVM-side, ~10x faster) once the
oracle-parity constraint is dropped; the operators take the hash column
builder as a parameter for exactly that reason.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def md5_hex(col: Column) -> Column:
    return F.md5(col)


def hash60(col: Column) -> Column:
    """60-bit integer hash of a string column (portable, non-negative)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def seeded(seed: int, col: Column) -> Column:
    """Seed-prefixed input so k independent hash functions come cheap."""
    return F.concat(F.lit(f"{seed}:"), col)


def hash60_sql(expr: str) -> str:
    """DuckDB twin of hash60()."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def md5_sql(expr: str) -> str:
    return f"md5({expr})"
