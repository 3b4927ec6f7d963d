"""Streaming sessionization — the unbounded-stream analogue of
``operators/sessions.py`` (the batch backfill/replay path).

Uses Spark's NATIVE session windows (``F.session_window``): state is one
open window per active (user) key, merged as events arrive and emitted
once the event-time watermark passes the window's close — bounded state
on an unbounded stream, late data handled by the watermark, no custom
``applyInPandasWithState`` needed for the standard gap semantics.

Boundary contract vs the batch operator: identical session membership
(an event more than ``gap`` after the previous one opens a new session —
for the inclusive-gap edge Spark treats a gap of exactly ``gap`` as the
same session, matching the batch op's ``> gap`` split rule), identical
``start_us`` and ``n_events``. The native window's ``end`` is
``last_event + gap`` (the window close), so the batch ``end_us``
(= last event) equals ``end_us - gap_us`` here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats_stream(
    stream_df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-session rollup over a stream: ``(user, start_us, last_us,
    n_events)`` — one row per closed session window.

    One stateful aggregation: groupBy(session_window, user). The
    exchange hashes on the user key; per-key state is the open
    window(s) only, expired by the watermark.
    """
    gap_us = F.lit(_interval_micros(gap))
    w = (
        stream_df.where(F.col(user).isNotNull() & F.col(ts).isNotNull())
        .withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("_w"), F.col(user))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return w.select(
        F.col(user),
        F.unix_micros(F.col("_w.start").cast("timestamp")).alias("start_us"),
        (F.unix_micros(F.col("_w.end").cast("timestamp")) - gap_us)
        .alias("last_us"),
        "n_events",
    )


def _interval_micros(spec: str) -> int:
    """Microseconds in a simple '<n> <unit>' interval spec."""
    n, unit = spec.split()
    scale = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(n) * scale * 1_000_000
