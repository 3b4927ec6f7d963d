"""Streaming sessionization agrees with the batch operator."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from themis_spark.operators import sessions as SS
from themis_spark.streaming.sessions_stream import (
    _interval_micros, session_stats_stream,
)


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


def test_interval_micros():
    assert _interval_micros("30 minutes") == 30 * 60 * 1_000_000
    assert _interval_micros("1 hour") == 3_600_000_000
    assert _interval_micros("2 days") == 2 * 86400 * 1_000_000


def test_stream_matches_batch_sessions(spark, tmpdir_path):
    rows = [
        (1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(20)),
        (4, 1, _ts(60)), (5, 1, _ts(80)),
        (6, 2, _ts(5)),
        (7, None, _ts(1)), (8, 3, None),
        # watermark driver: append-mode session windows emit only once
        # the event-time watermark passes their close; this far-future
        # event advances it past every other session's close, and its
        # own (still-open) session correctly stays unemitted
        (9, 99, _ts(600)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    df.write.mode("overwrite").parquet(f"{tmpdir_path}/ev")

    stream = spark.readStream.schema(df.schema).parquet(f"{tmpdir_path}/ev")
    q = (session_stats_stream(stream, gap="30 minutes",
                              watermark="1 minute")
         .writeStream.format("memory").queryName("sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["start_us"]): (r["n_events"], r["last_us"])
           for r in spark.sql("select * from sess").collect()}

    batch = SS.session_stats(df, gap_minutes=30).collect()
    expect = {(r["user_id"], r["start_us"]): (r["n_events"], r["end_us"])
              for r in batch if r["user_id"] != 99}
    assert got == expect
    assert len(got) == 3  # (1: two sessions) + (2: one); null rows dropped
