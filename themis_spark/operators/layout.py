"""Data-layout management: Z-order clustering and compaction planning.

At 100 TB the dominant cost of every query is the scan, and the scan's
cost is decided by FILE LAYOUT long before Catalyst sees a plan:
min/max zone maps only prune files whose key ranges are narrow, and a
table written in arrival order has every file spanning the whole key
space. The two operators here are the layout side of the engine:

* **Z-order clustering** — interleave the bits of several (normalized)
  columns into one space-filling-curve value and range-write by it, so
  each output file covers a small HYPER-RECTANGLE of the key space and
  min/max pruning works for EVERY clustered column at once (the
  Databricks/Iceberg ``ZORDER BY`` idea, from Morton 1966 — public).
  A sort by (a, b) prunes scans filtered on ``a`` but not on ``b``;
  the z-curve prunes both at ~equal fidelity.
* **Compaction planning** — group small files into target-sized write
  groups (the Iceberg ``rewrite_data_files`` planning step). Streaming
  ingestion produces thousands of KB-sized files per partition; scans
  then pay one task + one open per file. The plan is a pure function
  of the file-stats frame (metadata-scale, thousands of rows — never
  corpus data).

Determinism contract: normalization is exact integer arithmetic
(``(x - min) * 2^bits // (max - min + 1)``), the z-value is pure bit
interleaving, and compaction groups come from an integer running-sum
bin rule — every output replays bit-for-bit in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zorder_value_col(cols: list[Column], bits: int = 16) -> Column:
    """Morton/Z-value of ``n`` already-normalized integer columns (each
    in ``[0, 2^bits)``): bit ``b`` of column ``i`` lands at position
    ``b*n + i``. Pure codegen bit arithmetic — ``n*bits`` shift/mask
    terms, no shuffle, no Python. ``n*bits`` must fit a signed long."""
    n = len(cols)
    if not cols:
        raise ValueError("zorder needs at least one column")
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits overflows a long")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        x = c.cast("long")
        for b in range(bits):
            z = z + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)),
                                b * n + i)
    return z


def normalized_rank_col(c: Column, mn: Column, mx: Column,
                        bits: int = 16) -> Column:
    """Exact-integer min/max normalization into ``[0, 2^bits)``:
    ``floor((x - min) * 2^bits / (max - min + 1))``. Monotone and
    bit-replayable: the quotient's numerator stays below 2^53 for key
    spans up to 2^(53-bits), so the double division is exact and
    ``floor`` equals integer division on both engines.

    The exactness bound is ENFORCED at runtime, mirroring
    ``zorder_frame``'s fail-loudly posture: a key span above
    2^(53-bits) (e.g. a hash-valued column under the default 16 bits)
    would silently lose division exactness — and above 2^(62-bits)
    silently wrap the non-ANSI long multiply — producing wrong z-values
    with no error. ``assert_true`` raises instead; a negative span can
    only come from ``mx - mn`` itself wrapping (|keys| > 2^63), which
    the same guard catches. Wide domains should be pre-bucketed (e.g.
    ``hash % 2^bits``) before z-ordering."""
    span = (mx - mn + 1).cast("long")
    limit = F.lit(1 << (53 - bits)).cast("long")
    guard = F.assert_true(
        (span >= F.lit(1).cast("long")) & (span <= limit),
        F.concat(F.lit(f"normalized_rank_col: key span exceeds 2^{53 - bits}"
                       " (exact-division bound for bits="
                       f"{bits}) or wrapped; span="),
                 span.cast("string")))
    rank = F.floor((c.cast("long") - mn)
                   * F.lit(1 << bits).cast("long") / span).cast("long")
    # assert_true evaluates to NULL on pass (or throws) — thread it
    # through a one-branch when() so the guard survives optimization
    # (an equal-branch otherwise() could be simplified away)
    return F.when(guard.isNull(), rank)


def zorder_frame(df: DataFrame, cols: list[str], bits: int = 16,
                 n_buckets: int = 64) -> DataFrame:
    """``df`` + ``zval`` (the Morton value over min/max-normalized
    ``cols``) + ``zbucket`` (fixed-width bin of the z space — the
    deterministic stand-in for a range-writer's file assignment).

    The min/max bounds ride in as ONE broadcast single-row aggregate —
    no driver-side job during plan construction, nothing corpus-sized
    moves. ``floor`` semantics throughout; Spark's integral ``/`` is
    cast-after-divide, so the casts below pin the exact bit pattern the
    oracle replays."""
    # zbucket multiplies zval by n_buckets in long arithmetic: the
    # product must also fit 62 bits or it wraps silently (non-ANSI) —
    # fail loudly at plan build instead of emitting negative buckets
    import math

    if bits * len(cols) + math.ceil(math.log2(max(n_buckets, 2))) > 62:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits x {n_buckets} buckets "
            "overflows the long z-bucket product; lower bits or buckets")
    aggs = []
    for c in cols:
        aggs += [F.min(c).cast("long").alias(f"__mn_{c}"),
                 F.max(c).cast("long").alias(f"__mx_{c}")]
    bounds = F.broadcast(df.agg(*aggs))
    ranks = [normalized_rank_col(F.col(c), F.col(f"__mn_{c}"),
                                 F.col(f"__mx_{c}"), bits) for c in cols]
    z = zorder_value_col(ranks, bits)
    zmax = 1 << (bits * len(cols))
    return (
        df.crossJoin(bounds)
        .select(*df.columns, z.alias("zval"))
        .withColumn("zbucket",
                    F.floor(F.col("zval") * n_buckets / F.lit(zmax))
                    .cast("long"))
    )


def cluster_by_zorder(df: DataFrame, cols: list[str], bits: int = 16,
                      n_files: int = 64) -> DataFrame:
    """The write-side plan: range-partition on the z-value and sort
    within partitions, so each output file covers one compact z-range =
    one small hyper-rectangle per clustered column. Feed straight to
    ``.write`` — the plan shape (RangePartitioning + in-partition Sort)
    is asserted in tests."""
    zf = zorder_frame(df, cols, bits, n_files)
    return (zf.repartitionByRange(n_files, "zval")
            .sortWithinPartitions("zval"))


def zorder_bucket_stats(df: DataFrame, cols: list[str], bits: int = 16,
                        n_buckets: int = 64) -> DataFrame:
    """Layout audit: per z-bucket row count and per-column min/max —
    the zone-map narrowness a scan planner would actually exploit.
    Tight per-bucket ranges on EVERY clustered column are the whole
    point of the curve (asserted quantitatively in tests)."""
    zf = zorder_frame(df, cols, bits, n_buckets)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return zf.groupBy("zbucket").agg(*aggs)


def compaction_plan(files: DataFrame, size_col: str = "n_bytes",
                    path_col: str = "path",
                    target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Assign files to target-sized write groups: files ordered by path
    (deterministic), binned by the FIXED target-width windows of the
    cumulative size — one window expression, ``group = (cumsum(size) -
    1) // target``. Every file after a group's first fits inside the
    group's window (``sum(files[1:]) < target``, test-asserted); a
    group exceeds the target only by the overhang of its straddling
    first file. This closed form replays bit-for-bit in SQL, unlike
    the greedy reset-on-overflow variant whose boundary is a
    data-dependent recurrence. The input is a file-STATS frame (one
    row per file — metadata scale, hence the single-partition window);
    output adds ``compact_group`` and per-file ``group_bytes``.

    Edge case: LEADING zero-byte files have ``cumsum = 0`` and the raw
    bin rule would assign them ``floor(-1/target) = -1`` — a
    sentinel-looking group id. They are clamped into group 0 (a
    zero-byte file belongs in whatever group it precedes)."""
    w = Window.orderBy(path_col).rowsBetween(Window.unboundedPreceding, 0)
    csum = F.sum(F.col(size_col)).over(w)
    grouped = files.select(
        "*", F.greatest(
            F.floor((csum - 1) / F.lit(target_bytes)), F.lit(0))
        .cast("long").alias("compact_group"))
    totals = grouped.groupBy("compact_group").agg(
        F.sum(size_col).alias("group_bytes"))
    return grouped.join(totals, "compact_group").select(
        path_col, size_col, "compact_group", "group_bytes")
