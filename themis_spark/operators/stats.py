"""Per-column statistics, fused into one aggregation pass (SURVEY 2(b).3–5).

Everything is a single ``groupBy(partition_id).agg(...)`` — Catalyst
splits it into partial (map-side) + final aggregation automatically, so
at 1000 executors each partition contributes one tiny partial row and the
exchange is negligible. Histograms use FIXED equi-width buckets compiled
into conditional-sum expressions (pure codegen, no extra shuffle, no
second scan) so they stay mergeable across partitions and across resumed
runs. Distinct counts use HLL sketches (mergeable binary state).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class HistSpec:
    column: str
    lo: float
    hi: float
    nbins: int = 20


_HLL_OK = (T.StringType, T.IntegerType, T.LongType, T.BinaryType)


def _hist_array(col: Column, spec: HistSpec) -> Column:
    """Equi-width histogram as nbins+2 conditional sums (bucket 0 =
    underflow, nbins+1 = overflow) — width_bucket semantics, expressed so
    the whole histogram rides in the same hash-agg as min/max/count."""
    w = (spec.hi - spec.lo) / spec.nbins
    bucket = F.when(col.isNull(), F.lit(None)).when(col < spec.lo, F.lit(0)).when(
        col >= spec.hi, F.lit(spec.nbins + 1)
    ).otherwise((F.floor((col - spec.lo) / F.lit(w)) + 1).cast("int"))
    return F.array(
        *[
            F.coalesce(F.sum(F.when(bucket == i, 1).otherwise(0)), F.lit(0)).cast("long")
            for i in range(spec.nbins + 2)
        ]
    )


def column_stats(
    df: DataFrame,
    columns: list[str],
    partition_col: str | None = "part_id",
    hist_specs: list[HistSpec] | None = None,
    run_id: str = "r0",
    with_hll: bool = True,
) -> DataFrame:
    """One-pass per-partition stats → long-format metrics rows
    (FIXTURES.md §2 metrics schema)."""
    hist_by_col = {h.column: h for h in (hist_specs or [])}
    dtypes = dict(df.dtypes)
    part: Column = (
        F.col(partition_col).cast("string")
        if partition_col and partition_col in df.columns
        else F.lit("0")
    )

    aggs: list[Column] = []
    for c in columns:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}__cnt"))
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
        field = df.schema[c].dataType
        if with_hll and isinstance(field, _HLL_OK):
            aggs.append(F.hll_sketch_agg(col).alias(f"{c}__hll"))
        else:
            aggs.append(F.lit(None).cast("binary").alias(f"{c}__hll"))
        if c in hist_by_col:
            spec = hist_by_col[c]
            aggs.append(_hist_array(col, spec).alias(f"{c}__hist"))
            aggs.append(F.lit(float(spec.lo)).alias(f"{c}__hist_lo"))
            aggs.append(F.lit(float(spec.hi)).alias(f"{c}__hist_hi"))
        else:
            aggs.append(F.lit(None).cast("array<long>").alias(f"{c}__hist"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__hist_lo"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__hist_hi"))

    wide = df.groupBy(part.alias("partition_id")).agg(*aggs)

    # wide → long: one struct per column, exploded. The agg result is a
    # handful of rows (one per partition), so this reshape is free.
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__cnt").alias("cnt"),
            F.col(f"{c}__nulls").alias("nulls"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
            F.col(f"{c}__hll").alias("hll_sketch"),
            F.col(f"{c}__hist").alias("histogram"),
            F.col(f"{c}__hist_lo").alias("hist_lo"),
            F.col(f"{c}__hist_hi").alias("hist_hi"),
        )
        for c in columns
    ]
    return (
        wide.select("partition_id", F.explode(F.array(*structs)).alias("m"))
        .select(
            F.lit(run_id).alias("run_id"),
            "partition_id",
            "m.column", "m.cnt", "m.nulls", "m.min_v", "m.max_v",
            "m.hll_sketch", "m.histogram", "m.hist_lo", "m.hist_hi",
        )
    )


def distinct_estimate(metrics: DataFrame, column: str) -> int:
    """Merge per-partition HLL sketches → one distinct estimate. Sketches
    are mergeable across partitions AND across resumed runs (they're
    stored in the metrics table as binary state)."""
    row = (
        metrics.where((F.col("column") == column) & F.col("hll_sketch").isNotNull())
        .agg(F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("est"))
        .first()
    )
    return int(row["est"]) if row and row["est"] is not None else 0


def merge_histograms(metrics: DataFrame, column: str) -> list[int]:
    """Sum per-partition histogram arrays element-wise (driver-side on the
    tiny metrics frame)."""
    rows = (
        metrics.where((F.col("column") == column) & F.col("histogram").isNotNull())
        .select("histogram")
        .collect()
    )
    if not rows:
        return []
    acc = [0] * len(rows[0]["histogram"])
    for r in rows:
        for i, v in enumerate(r["histogram"]):
            acc[i] += v
    return acc


def ks_statistic(hist_a: list[int], hist_b: list[int]) -> float:
    """Two-sample KS statistic between two equi-width histograms with the
    same bucket layout: max |CDF_a − CDF_b|. O(nbins), driver-side —
    the heavy lifting (bucket counting) already happened distributed."""
    ta, tb = sum(hist_a), sum(hist_b)
    if ta == 0 or tb == 0 or len(hist_a) != len(hist_b):
        return 0.0
    ca = cb = 0.0
    worst = 0.0
    for a, b in zip(hist_a, hist_b):
        ca += a / ta
        cb += b / tb
        worst = max(worst, abs(ca - cb))
    return worst
