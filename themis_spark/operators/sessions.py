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
