"""Streaming validation: the same compiled plan applied to a stream.

The reference is strictly batch (one validate() call per document); the
streaming wrapper is the engine's forward path for continuously-arriving
crawl data: ``readStream`` over a directory/table → the SAME fused
violations projection (a compiled plan is just Column expressions — it
composes with streaming frames unchanged) → windowed, watermarked
violation-rate aggregation → ``foreachBatch`` sink reusing the batch
writers. State stays bounded by the watermark; late rows beyond it drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from themis_spark.operators.validate import annotate
from themis_spark.plans.compiler import CompiledPlan


def annotate_stream(stream_df: DataFrame, plan: CompiledPlan,
                    keep: list[str] | None = None) -> DataFrame:
    """Identical projection as the batch pass — works on streaming frames
    because the plan is pure Column expressions + Arrow UDFs."""
    return annotate(stream_df, plan, keep=keep)


def violation_rate_stream(
    annotated: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed violation rate with late-data handling: rows later than
    the watermark are dropped, keeping state bounded on unbounded
    streams."""
    return (
        annotated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("n_violations") > 0).cast("long")).alias("bad_rows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rows",
            "bad_rows",
            (F.col("bad_rows") / F.col("rows")).alias("violation_rate"),
        )
    )


def host_violation_tracker(
    annotated: DataFrame,
    key_col: str = "host",
    threshold: float = 0.10,
    min_rows: int = 100,
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState —
    SURVEY 2(c) streaming row): per-key cumulative violation tracking
    across micro-batches.

    Keeps ``(rows_seen, bad_rows)`` per key in the state store (grows
    O(#distinct keys), independent of stream length) and emits the key's
    updated cumulative rate each batch, flagging keys whose rate crosses
    ``threshold`` after ``min_rows`` observations — the "this host's
    extraction broke mid-crawl" alarm a windowed aggregate can't express
    (it needs lifetime state, not a window).

    Arrow-batched like everything else: the update function sees pandas
    frames per key per batch, never per-row Python over the stream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (f"{key_col} string, rows bigint, bad_rows bigint, "
                  "rate double, flagged boolean")
    state_schema = "rows bigint, bad_rows bigint"

    def update(key, pdfs, state: GroupState):
        rows, bad = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            rows += len(pdf)
            bad += int((pdf["n_violations"] > 0).sum())
        state.update((rows, bad))
        rate = (bad / rows) if rows else 0.0
        yield pd.DataFrame(
            [[key[0], rows, bad, rate, bool(rows >= min_rows and rate >= threshold)]],
            columns=[key_col, "rows", "bad_rows", "rate", "flagged"],
        )

    return (
        annotated.select(key_col, "n_violations")
        .groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def start_validation_stream(
    stream_df: DataFrame,
    plan: CompiledPlan,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "url",
    partition_col: str = "part_id",
    run_id: str = "stream",
):
    """foreachBatch sink: every micro-batch goes through the batch
    violation writer — one code path for batch and streaming outputs."""
    from themis_spark.operators.validate import violations_df

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        ann = annotate(batch_df, plan, keep=[key_col, partition_col])
        (
            violations_df(ann, key_col, partition_col, run_id=f"{run_id}-{batch_id}")
            .write.mode("append")
            .parquet(f"{out_dir}/violations")
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
