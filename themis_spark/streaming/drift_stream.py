"""Streaming distribution-drift monitor: per-event-time-window
equi-width histograms with watermarked late-data handling, and PSI
against a fixed reference histogram as a STATELESS projection on top —
so the whole monitor is ONE stateful aggregation whose state is
O(nbins) numbers per open window, regardless of stream volume.

This is the streaming counterpart of the batch drift pass
(operators/stats.py: _hist_array + psi_statistic;
operators/constraints.py: drift_check): a continuously-crawled corpus
publishes last crawl's bucket counts (column_stats → merge_histograms)
as the reference, and every micro-batch updates this crawl's windowed
buckets. When a window's PSI crosses the threshold the sink row carries
``drifted = true`` — the alert a 10¹²-row pipeline pages on instead of
re-scanning anything.

Scale shape: the bucket assignment is a scan-stage CASE chain (same
expression as the batch histogram, so batch and stream agree by
construction); the aggregation shuffles one (window, nbins+2 partial
sums) row per task per window; the PSI arithmetic is a per-row
projection of the agg output. No Python, no applyInPandasWithState —
bounded state comes from the watermark evicting closed windows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from themis_spark.operators.stats import HistSpec


def _bucket_col(spec: HistSpec):
    """Identical bucket semantics to the batch _hist_array: bucket 0 =
    underflow, nbins+1 = overflow, NULL stays NULL (uncounted)."""
    col = F.col(spec.column).cast("double")
    w = (spec.hi - spec.lo) / spec.nbins
    return (
        F.when(col.isNull(), F.lit(None))
        .when(col < spec.lo, F.lit(0))
        .when(col >= spec.hi, F.lit(spec.nbins + 1))
        .otherwise((F.floor((col - spec.lo) / F.lit(w)) + 1).cast("int"))
    )


def windowed_histogram_stream(
    stream_df: DataFrame,
    spec: HistSpec,
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Equi-width histogram per event-time window:
    ``(window_start, window_end, hist: array<long>, n: long)`` where
    ``hist`` has nbins+2 buckets (underflow + overflow) and ``n`` is
    the non-NULL row count (sum of the buckets). Late rows beyond
    ``watermark`` are dropped; closed windows emit exactly once in
    append mode. Works identically on a batch frame (no watermark
    applied) so batch/stream parity is testable on the same input.
    """
    bucket = _bucket_col(spec)
    sums = [
        F.coalesce(F.sum(F.when(bucket == i, 1).otherwise(0)), F.lit(0))
        .cast("long").alias(f"__b{i}")
        for i in range(spec.nbins + 2)
    ]
    src = stream_df
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    agged = src.groupBy(F.window(ts_col, window).alias("__win")).agg(*sums)
    hist = F.array(*[F.col(f"__b{i}") for i in range(spec.nbins + 2)])
    return agged.select(
        F.col("__win.start").alias("window_start"),
        F.col("__win.end").alias("window_end"),
        hist.alias("hist"),
        F.aggregate(hist, F.lit(0).cast("long"),
                    lambda acc, v: acc + v).alias("n"),
    )


def psi_drift_stream(
    stream_df: DataFrame,
    spec: HistSpec,
    reference_hist: list[int],
    ts_col: str = "warc_ts",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    eps: float = 1e-6,
    threshold: float = 0.25,
) -> DataFrame:
    """PSI per event-time window against a FIXED reference histogram
    (the published bucket counts of a prior crawl/slice):
    ``(window_start, window_end, n, psi, drifted)``.

    The reference proportions are Python floats folded into the plan
    (O(nbins) literals — a model-like artifact, not data); the window's
    own proportions come from the single stateful histogram
    aggregation, so PSI adds ZERO state. Matches the batch
    ``psi_statistic`` exactly on the same buckets (same eps flooring):
    Σ (p_win − p_ref)·ln(p_win/p_ref), empty buckets floored at
    ``eps``. Windows whose rows are all NULL emit ``psi = NULL``.
    """
    if len(reference_hist) != spec.nbins + 2:
        raise ValueError(
            f"reference_hist must have nbins+2 = {spec.nbins + 2} buckets, "
            f"got {len(reference_hist)}")
    tb = float(sum(reference_hist))
    if tb <= 0:
        raise ValueError("reference_hist is empty")
    p_ref = [max(c / tb, eps) for c in reference_hist]

    hist = windowed_histogram_stream(stream_df, spec, ts_col, window, watermark)
    n = F.col("n").cast("double")
    psi = None
    for i, pb in enumerate(p_ref):
        pa = F.greatest(F.element_at("hist", i + 1).cast("double") / n,
                        F.lit(eps))
        contrib = (pa - F.lit(pb)) * F.log(pa / F.lit(pb))
        psi = contrib if psi is None else psi + contrib
    psi = F.when(F.col("n") > 0, psi)  # all-NULL window: no proportions
    return hist.select(
        "window_start", "window_end", "n",
        psi.alias("psi"),
        (psi > F.lit(float(threshold))).alias("drifted"),
    )
