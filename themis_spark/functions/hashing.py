"""Portable + fast hashing helpers.

Two families:

* ``xxhash64``-based — fast, JVM-native, used internally (salting, bucket
  assignment) where cross-engine reproducibility doesn't matter.
* ``md5``-based 60-bit — slower but PORTABLE: the same value is computable
  in DuckDB as ``('0x' || substr(md5(x), 1, 15))::BIGINT``, which lets the
  driver's DuckDB oracle re-derive MinHash/fingerprint results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column | str) -> Column:
    """Portable 60-bit non-negative hash: first 15 hex digits of md5.

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def hash60_seeded(col: Column | str, seed: int) -> Column:
    """Seeded portable hash — seed is prepended as text, so DuckDB can
    replay it: ``('0x'||substr(md5(seed || ':' || x),1,15))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return hash60(F.concat(F.lit(f"{seed}:"), c.cast("string")))


def salt_col(key: Column | str, buckets: int) -> Column:
    """Deterministic salt for skew-defeating two-stage aggregation:
    ``pmod(xxhash64(key), buckets)``. Deterministic (no rand()) so
    checkpoint-resumed runs re-derive identical partitioning
    (SURVEY.md §7.3.8)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


def bucket_of(key: Column | str, buckets: int) -> Column:
    """Stable partition-bucket assignment for table layout (Iceberg
    ``bucket(url)`` analogue on plain Parquet)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")
