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


# Universal affine hash family over the Mersenne prime 2^31-1 — the
# MinHash permutations. ONE md5 per shingle (hash60 % P gives the base),
# then each permutation i is the cheap codegen arithmetic
# (a_i*base + b_i) % P. All intermediates < 2^62, so 64-bit signed
# arithmetic is exact and overflow-free in BOTH Spark and DuckDB —
# the whole family replays bit-exactly in the SQL oracle.
MERSENNE_P = 2_147_483_647  # 2^31 - 1

_A_MULT = 0x9E3779B1  # Knuth multiplicative constants: deterministic,
_B_MULT = 0x85EBCA77  # seed-free parameter schedule for the family


def affine_params(i: int) -> tuple[int, int]:
    """(a_i, b_i) for permutation ``i``: a in [1, P-1], b in [0, P-1]."""
    a = 1 + (i * _A_MULT) % (MERSENNE_P - 1)
    b = (i * _B_MULT) % MERSENNE_P
    return a, b


def affine_hash(base: Column, i: int) -> Column:
    """Permutation ``i`` applied to a base-hash column in [0, P)."""
    a, b = affine_params(i)
    return (base * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


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
