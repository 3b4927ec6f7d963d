"""Gap-based sessionization over event streams (batch form).

Web-analytics / training-telemetry pipelines segment per-user event
sequences into sessions: a new session starts when the gap since the
user's previous event exceeds a threshold. The classic formulation is
two window functions over one partitioning — lag to flag session
starts, then a running sum of flags to number them — followed by a
per-session aggregate.

Scale shape: ONE shuffle on the user key for both windows (same window
spec, Spark evaluates them in a single WindowExec), plus the final
aggregation exchange on (user, session_seq). There is no per-row
Python. Per-user skew is inherent to sessionization — a user's events
must be ordered together — so a single pathological user is a
sequential tail by definition; AQE-level skew splitting still balances
partitions that merely contain many normal users. Timestamps compare
in exact integer microseconds (unix_micros / epoch_us) so the DuckDB
oracle replays session boundaries exactly.

The streaming analogue (stateful, watermark-driven) belongs to
streaming/; this batch operator is the backfill/replay path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    gap_minutes: float = 30.0,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Assign ``session_seq`` (1-based per user) to every event. Rows
    with NULL user or ts are dropped (they cannot be ordered). Ordering
    ties on ts break on ``tiebreak`` for determinism."""
    gap_us = int(gap_minutes * 60 * 1_000_000)
    w = Window.partitionBy(user).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    # cast handles TIMESTAMP_NTZ parquet columns (unix_micros requires
    # TIMESTAMP); the engine session pins spark.sql.session.timeZone=UTC
    # so the cast is the naive-as-UTC reading, same as DuckDB epoch_us
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = (prev.isNull() | ((us - prev) > gap_us)).cast("long")
    running = Window.partitionBy(user).orderBy(
        F.col(ts).asc(), F.col(tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.where(F.col(user).isNotNull() & F.col(ts).isNotNull())
        .withColumn("session_seq", F.sum(new_session).over(running))
    )


def session_stats(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    gap_minutes: float = 30.0,
    event_type: str | None = None,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session rollup: ``(user, session_seq, n_events, start_us,
    end_us, duration_us[, n_event_types])``. Integer-microsecond bounds
    keep the result exact and oracle-replayable."""
    s = sessionize(df, user, ts, gap_minutes, tiebreak)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    ]
    if event_type is not None:
        aggs.append(F.countDistinct(F.col(event_type)).alias("n_event_types"))
    return s.groupBy(F.col(user), F.col("session_seq")).agg(*aggs)


def funnel(
    df: DataFrame,
    steps: list[str],
    user: str = "user_id",
    ts: str = "ts",
    event_type: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Ordered funnel analysis: how far each user progresses through
    ``steps`` (e.g. view → click → purchase), advancing only on events
    STRICTLY later than the previous step's reach time. Returns
    ``(user, stage, reach_1_us … reach_k_us)`` — stage = completed
    steps, reach columns NULL past it.

    Plan shape: filter to funnel event types (scan-stage; usually a
    small fraction), ONE groupBy(user) collecting the sorted
    (time, type) events, then a native array fold (``F.aggregate``)
    that walks each user's timeline once — state is (stage, reach
    times), advanced when the next step's type appears after the
    current reach time. One exchange total, no window, no Python;
    per-user state is bounded by that user's funnel events (same
    inherent per-key ordering as sessionization).

    The strict ``>`` advance rule makes results independent of how
    same-microsecond events tie-break, so two engines (and two runs)
    agree exactly — the DuckDB oracle replays it as k chained
    min-after-previous aggregations.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    evs = (
        df.where(F.col(user).isNotNull() & F.col(ts).isNotNull()
                 & F.col(event_type).isin(*steps))
        .select(F.col(user), F.struct(
            us.alias("u"),
            F.col(tiebreak).alias("tb"),
            F.col(event_type).alias("t"),
        ).alias("e"))
    )
    per_user = evs.groupBy(user).agg(
        F.array_sort(F.collect_list("e")).alias("__evs"))

    step_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.array().cast("array<long>").alias("reach"),
    )
    fold = F.aggregate(
        F.col("__evs"), init,
        lambda st, e: F.when(
            (st["stage"] < k)
            & (e["t"] == F.try_element_at(step_arr, st["stage"] + 1))
            & ((st["stage"] == 0)
               | (e["u"] > F.try_element_at(st["reach"], st["stage"]))),
            F.struct(
                (st["stage"] + 1).cast("int").alias("stage"),
                F.array_append(st["reach"], e["u"]).alias("reach"),
            ),
        ).otherwise(st),
    )
    staged = per_user.select(F.col(user), fold.alias("__f"))
    return staged.select(
        F.col(user),
        F.col("__f.stage").alias("stage"),
        *[F.try_element_at(F.col("__f.reach"), F.lit(i + 1)).alias(f"reach_{i + 1}_us")
          for i in range(k)],
    )
