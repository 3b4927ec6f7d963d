"""Streaming deduplication over continuously-arriving crawl data.

The batch engine's exact-dedup operator (operators/dedup.py) groups on a
content digest; its streaming analogue must bound state on an unbounded
stream. Two regimes:

* ``exact_dedup_stream`` — drop re-crawls whose (digest) key was already
  seen within the watermark horizon: ``dropDuplicatesWithinWatermark``
  keeps per-key state only until the event-time watermark passes, so
  state is O(keys per horizon), not O(keys ever). This is the 100 TB/day
  shape: a crawl re-fetches the same url/content within hours-days;
  duplicates further apart than the horizon are left for the nightly
  batch dedup pass (the two compose — stream dedup bounds the daily
  growth, batch dedup is the global ground truth).
* ``seen_key_counts_stream`` — instead of dropping, annotate: windowed
  per-key occurrence counts (watermarked groupBy), for monitoring
  re-crawl rates without mutating the stream.

Digest computation is the same map-side native column the batch op uses
(xxhash64/sha2 over the text bytes) — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_content_digest(df: DataFrame, text_col: str = "text",
                        digest_col: str = "digest") -> DataFrame:
    """64-hex sha256 of the UTF-8 text bytes, computed map-side (the
    same digest operators/dedup.py exact_duplicates groups on)."""
    return df.withColumn(
        digest_col,
        F.sha2(F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8"), 256),
    )


def exact_dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "warc_ts",
    watermark: str = "2 hours",
    text_col: str = "text",
) -> DataFrame:
    """First occurrence of each content digest within the watermark
    horizon passes; later re-crawls drop. State per key expires once the
    event-time watermark moves past it (bounded state on an unbounded
    stream — the property the batch operator doesn't need but a stream
    must have)."""
    keyed = with_content_digest(stream_df, text_col)
    keys = key_cols or ["digest"]
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def seen_key_counts_stream(
    stream_df: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    text_col: str = "text",
) -> DataFrame:
    """Windowed re-crawl monitoring: per (window, digest) occurrence
    counts, emitting only keys seen more than once — the streaming
    analogue of duplicate_keys. Watermark bounds the aggregation state;
    late rows beyond it drop."""
    keyed = with_content_digest(stream_df, text_col)
    return (
        keyed.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("digest"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 1)
        .select(F.col("w.start").alias("window_start"), "digest", "cnt")
    )
