"""The fused per-partition validate pass (SURVEY.md 2(b).2).

One ``select`` computes every compiled keyword check (native Column trees
→ whole-stage codegen) plus the Arrow-path validators, producing a single
``violations`` array column per row. Violation detail rows, per-partition
verdicts, and column stats all derive from that one annotated frame — the
pass itself is shuffle-free by construction; only the tiny verdict/stats
aggregations exchange data.

Reference parity: the single-pass collect-all-errors walk of
playlyfe/themis (src/themis.js generated validators push every failing
keyword into one report), lifted from one document to one table partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from themis_spark.plans.compiler import CompiledPlan


def annotate(df: DataFrame, plan: CompiledPlan, keep: list[str] | None = None) -> DataFrame:
    """Project the input down to what's needed (column pruning — never
    drag ``html`` binary through the pass unless a check reads it) and
    attach the fused ``violations`` array + ``n_violations``."""
    passthrough = [c for c in (keep or df.columns) if c in df.columns]
    out = df.select(
        *passthrough,
        plan.violations_col().alias("violations"),
    )
    return out.withColumn("n_violations", F.size("violations"))


def violations_df(
    annotated: DataFrame,
    key_col: str = "url",
    partition_col: str | None = "part_id",
    run_id: str = "r0",
) -> DataFrame:
    """Explode the violations array into the reference-contract rows
    (url, partition_id, run_id, keyword, instance_path, schema_path,
    detail) — FIXTURES.md §2."""
    cols = [F.col(key_col).alias("url")]
    if partition_col and partition_col in annotated.columns:
        cols.append(F.col(partition_col).cast("string").alias("partition_id"))
    else:
        cols.append(F.lit("0").alias("partition_id"))
    # no pre-filter on n_violations: explode() already drops empty arrays,
    # and a filter would force a second evaluation of the (expensive)
    # violations expression — one ArrowEvalPython + one codegen pass total
    return (
        annotated.select(*cols, F.explode("violations").alias("v"))
        .select(
            "url",
            "partition_id",
            F.lit(run_id).alias("run_id"),
            F.col("v.keyword").alias("keyword"),
            F.col("v.instance_path").alias("instance_path"),
            F.col("v.schema_path").alias("schema_path"),
            F.col("v.detail").alias("detail"),
        )
    )


def verdicts_df(
    annotated: DataFrame,
    partition_col: str | None = "part_id",
    run_id: str = "r0",
) -> DataFrame:
    """Per-partition pass/fail verdict (FIXTURES.md §2): partial+final
    hash agg, one tiny exchange."""
    part: Column = (
        F.col(partition_col).cast("string")
        if partition_col and partition_col in annotated.columns
        else F.lit("0")
    )
    return (
        annotated.groupBy(part.alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_violations").alias("violation_rows"),
        )
        .select(
            "partition_id",
            F.lit(run_id).alias("run_id"),
            "rows",
            "violation_rows",
            (F.col("violation_rows") == 0).alias("passed"),
        )
    )
