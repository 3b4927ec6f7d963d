"""Temporal joins and window aggregations Spark's DataFrame API lacks
as primitives: as-of join, range (interval) join, tumbling-window
rollups.

These are standard time-series / web-analytics operators (align each
page re-crawl with the previous snapshot, attribute a click to the most
recent view, band documents into length buckets, count events per
hour). All are compositions of built-in operators — no Python in any
hot path — chosen for their 100 TB shuffle shape:

* **as-of join** — the union-tag formulation: tag both inputs, union,
  ONE window over the join key carrying the most recent right row
  forward. One shuffle total (the window's hash exchange on the key),
  versus the naive join→group-max→re-join which shuffles both inputs
  twice and joins twice. Per-key ordering is inherent to as-of
  semantics, so a pathological hot key is a sequential tail by
  definition (same argument as sessionization).
* **range join** — broadcast nested-loop when the ranges side is a
  small dimension (bands, IP blocks); a bucket-decomposed equi-join
  when it isn't: each range explodes into the fixed-width buckets it
  covers, points hash to their bucket, and the join becomes an
  equi-join plus a residual predicate — Catalyst picks hash/sort-merge
  strategies and AQE handles skew, neither of which it can do for a
  raw non-equi condition.
* **tumbling windows** — ``F.window`` (native, map-side bucket
  assignment) + partial+final hash agg; exchange is O(windows ×
  groups), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType
from pyspark.sql.window import Window


def _as_micros(df: DataFrame, col: str) -> Column:
    """Orderable integer-microsecond view of a ts column. Timestamps go
    through unix_micros (session tz pinned UTC → matches DuckDB's
    naive-as-UTC epoch_us); integral columns pass through as long."""
    t = df.schema[col].dataType
    c = F.col(col)
    if isinstance(t, (TimestampType, TimestampNTZType)):
        return F.unix_micros(c.cast("timestamp"))
    return c.cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    suffix: str = "_r",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the latest right row with the same key
    and ``right_ts <= left_ts`` (backward, inclusive — DuckDB/pandas
    ``ASOF JOIN`` semantics). Left rows with no match keep NULL payload
    (left-outer).

    Returns the left columns plus each payload column as
    ``<name><suffix>`` and the matched right timestamp as
    ``matched_ts_us`` (NULL when unmatched). ``tolerance_us`` bounds
    the look-back: matches older than the tolerance are nulled.

    The payload travels as ONE struct so a legitimately-NULL payload
    field inside the most recent right row is preserved rather than
    skipped back to an older row (the classic last(ignorenulls) trap).

    Ties: a right row at exactly left_ts matches; among right rows
    sharing (key, ts) the result is which ever sorts last — pre-
    aggregate the right side to unique (key, ts) when that matters.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload is None:
        payload = [c for c in right.columns if c not in keys + [right_ts]]
    pl = [(p, p + suffix) for p in payload]
    lcols = [c for c in left.columns if c not in keys]

    lts = _as_micros(left, left_ts)
    rts = _as_micros(right, right_ts)
    rstruct_t = ", ".join(
        [f"`{n}`: {right.schema[p].dataType.simpleString()}" for p, n in pl]
        + ["`_mts`: bigint"])
    L = left.select(
        *keys, lts.alias("_ts"), F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(f"struct<{rstruct_t}>").alias("_pay"),
    )
    R = right.select(
        *keys, rts.alias("_ts"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(p).alias(n) for p, n in pl],
                 rts.alias("_mts")).alias("_pay"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_pay", ignorenulls=True).over(w)
    u = L.unionByName(R).withColumn("_c", carried).where(F.col("_side") == 1)
    if tolerance_us is not None:
        u = u.withColumn(
            "_c",
            F.when(F.col("_ts") - F.col("_c._mts") <= F.lit(int(tolerance_us)),
                   F.col("_c")))
    out_pl = [F.col(f"_c.{n}").alias(n) for _, n in pl]
    return u.select(
        *keys, *[F.col(c) for c in lcols],
        *out_pl, F.col("_c._mts").alias("matched_ts_us"),
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval join: each point row matched to every range row with
    ``lo <= point < hi`` (inner).

    Default path broadcasts the ranges side — correct for dimension-
    sized range tables (score bands, IP blocks, SLA tiers), where the
    plan is a scan-stage BroadcastNestedLoopJoin: the corpus never
    shuffles. With ``bucket_width`` the join is decomposed instead:
    ranges explode into the width-w buckets they overlap, points key to
    their bucket, and Spark runs a plain equi-join on the bucket plus
    the residual range predicate — the scale path when the ranges side
    is too large to broadcast (output is still bounded because each
    point meets only the ranges overlapping its bucket).
    """
    p = F.col(point_col)
    pred = (p >= F.col(lo_col)) & (p < F.col(hi_col))
    if bucket_width is None:
        return points.join(F.broadcast(ranges), pred)
    w = int(bucket_width)
    rb = ranges.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / w),
            # hi is exclusive: a range ending exactly on a bucket edge
            # does not reach into that bucket
            F.floor((F.col(hi_col) - 1) / w),
        )),
    )
    pb = points.withColumn("_bucket", F.floor(p / w))
    return pb.join(rb, ["_bucket"]).where(pred).drop("_bucket")


def tumbling_agg(
    df: DataFrame,
    ts: str = "ts",
    width: str = "1 hour",
    by: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling-window rollup: count (plus caller aggregates) per
    ``width`` window per group, window start reported as exact integer
    microseconds (``window_start_us``) so the DuckDB oracle
    (``time_bucket``) replays boundaries bit-exactly.

    Window assignment is a map-side expression (``F.window``); the only
    exchange is the partial+final aggregation on (window, groups).
    """
    by = by or []
    aggs = aggs or []
    c = F.col(ts).cast("timestamp")
    win = F.window(c, width)
    g = (
        df.where(F.col(ts).isNotNull())
        .groupBy(win.alias("_w"), *by)
        .agg(F.count(F.lit(1)).alias("n_events"), *aggs)
    )
    rest = [n for n in g.columns if n != "_w"]
    return g.select(
        F.unix_micros(F.col("_w.start")).alias("window_start_us"), *rest)
