"""End-to-end checkpointed validation runs (reference EP2', SURVEY §3.2).

A run over a partitioned pages table produces four output tables
(FIXTURES.md §2): violations, verdicts, metrics, lineage. Work is
partition-granular and idempotently resumable:

1. list input partitions; anti-set against lineage rows marked 'done'
   → remaining work set (partition-pruned scan — only those directories
   are read, SURVEY 2(b).1);
2. run the fused validate+stats pass over the remaining partitions in
   batches of ``partitions_per_batch`` (one Spark job per batch, NOT per
   partition — per-partition jobs would be a driver-side loop that can't
   scale); each batch's outputs land via dynamic partition overwrite
   (idempotent replace, the Parquet stand-in for Iceberg
   overwritePartitions), then lineage rows commit;
3. a killed run re-executes at most one uncommitted batch; committed
   partitions are never re-validated (tested by tests/test_resume.py).

Cross-partition constraints (uniqueness, referential, drift,
text-invariant) run after the per-partition pass over the full table —
they are global by nature and are recorded in the verdicts under
partition_id='__global__'.

Per-stage wall-clock is recorded in RunResult.stage_secs (BASELINE.md
protocol step 5) so scaling regressions are attributable to
scan+validate vs constraint shuffles vs sink commits.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from themis_spark.operators import validate as V
from themis_spark.operators import constraints as C
from themis_spark.operators.stats import HistSpec, column_stats
from themis_spark.plans.compiler import CompiledPlan, compile_plan
from themis_spark.sources.tableio import ParquetTable


@dataclass
class RunConfig:
    schema: dict
    out_dir: str
    run_id: str = "r0"
    key_col: str = "url"
    partition_col: str = "part_id"
    stats_columns: list[str] = field(default_factory=list)
    hist_specs: list[HistSpec] = field(default_factory=list)
    unique_keys: list[str] = field(default_factory=list)
    fk: tuple[DataFrame, str, str] | None = None  # (child_df, child_key, parent_key)
    #: reference extraction for the per-row text invariant (BASELINE.json
    #: input_hint: byte-identical extracted text per url) — None disables
    text_invariant_ref: DataFrame | None = None
    partitions_per_batch: int | None = None  # None = all remaining in one job
    max_batches: int | None = None  # tests: stop early to simulate a kill


@dataclass
class RunResult:
    run_id: str
    partitions_done: list
    partitions_skipped: list
    rows: int
    violation_rows: int
    global_violations: int
    #: per-stage wall seconds: validate_sink / stats / verdict_commit /
    #: constraints — the attribution record for scaling analysis
    stage_secs: dict = field(default_factory=dict)


def _lineage_table(spark: SparkSession, cfg: RunConfig) -> ParquetTable:
    return ParquetTable(spark, f"{cfg.out_dir}/lineage", "part_id")


def completed_partitions(spark: SparkSession, cfg: RunConfig) -> set:
    t = _lineage_table(spark, cfg)
    if not t.exists():
        return set()
    rows = (
        t.read()
        .where((F.col("status") == "done") & (F.col("run_id") == cfg.run_id))
        .select("part_id")
        .distinct()
        .collect()
    )
    return {r["part_id"] for r in rows}


def run_validation(spark: SparkSession, table: ParquetTable, cfg: RunConfig) -> RunResult:
    all_parts = table.list_partitions()
    done = completed_partitions(spark, cfg)
    remaining = [p for p in all_parts if p not in done]

    plan: CompiledPlan = compile_plan(cfg.schema, table.read(partitions=[]).schema)

    batch_size = cfg.partitions_per_batch or max(len(remaining), 1)
    batches = [remaining[i : i + batch_size] for i in range(0, len(remaining), batch_size)]
    if cfg.max_batches is not None:
        batches = batches[: cfg.max_batches]

    viol_t = ParquetTable(spark, f"{cfg.out_dir}/violations", "partition_id")
    verd_t = ParquetTable(spark, f"{cfg.out_dir}/verdicts", "partition_id")
    metr_t = ParquetTable(spark, f"{cfg.out_dir}/metrics", "partition_id")
    lin_t = _lineage_table(spark, cfg)

    stage = {"validate_sink": 0.0, "stats": 0.0, "verdict_commit": 0.0,
             "constraints": 0.0}
    total_rows = total_viol = 0
    done_now: list = []
    for batch in batches:
        started = time.time()
        df = table.read(partitions=batch)
        # defer_residual: the big scan runs 100% JVM-side; rows whose
        # dynamic JSON recurses past the unroll depth are validated by a
        # separate tiny Arrow job (residual_violations_df below) over a
        # column-pruned scan — Python workers never spawn on clean data
        annotated = V.annotate(df, plan, keep=[cfg.key_col, cfg.partition_col],
                               defer_residual=True)

        # scan 1 (the only pass that runs the compiled validators):
        # violations straight to their partitioned sink. The explode
        # output is tiny relative to the scan, so clustering it onto its
        # partition key first costs one small shuffle and cuts the files
        # committed from (#tasks × #partitions) slivers to one per
        # partition — the commit protocol renames files serially on the
        # driver. No .persist() round-trip and no count re-run (round-1
        # advice): per-partition violation counts ride ON the write job
        # itself via Observation (conditional sums — one per batch
        # partition), so the counts cost zero extra jobs.
        t0 = time.time()
        viol = V.violations_df(annotated, cfg.key_col, cfg.partition_col, cfg.run_id)
        residual = V.residual_violations_df(df, plan, cfg.key_col,
                                            cfg.partition_col, cfg.run_id)
        if residual is not None:
            viol = viol.unionByName(residual)
        viol = viol.repartition(F.col("partition_id"))
        obs = None
        if len(batch) <= 64:
            from pyspark.sql import Observation

            obs = Observation()
            viol = viol.observe(obs, *[
                F.sum(F.when(F.col("partition_id") == str(p), 1).otherwise(0))
                .alias(f"p{p}")
                for p in batch
            ])
        viol_t.overwrite_partitions(viol)
        stage["validate_sink"] += time.time() - t0

        # scan 2 (no Python, pure codegen aggregation): per-partition stats
        # — its cnt+nulls also yields exact per-partition row counts, so
        # verdicts need NO third scan and NO re-run of the validators
        t0 = time.time()
        stats_cols = cfg.stats_columns or [cfg.key_col]
        metrics = column_stats(df, stats_cols, cfg.partition_col,
                               cfg.hist_specs, cfg.run_id)
        metrics = metrics.cache()
        try:
            if cfg.stats_columns:
                # tiny frame (rows = partitions × columns): one writer
                # task, else every agg task opens a file in every
                # partition dir and the commit renames hundreds of
                # slivers. repartition, NOT coalesce — coalesce(1) would
                # narrow the aggregation stage itself to one task
                metr_t.overwrite_partitions(metrics.repartition(1))
            rows_per_part = {
                r["partition_id"]: int(r["rows"])
                for r in metrics.where(F.col("column") == stats_cols[0])
                .select("partition_id", (F.col("cnt") + F.col("nulls")).alias("rows"))
                .collect()
            }
            stage["stats"] += time.time() - t0

            # verdicts: violation counts came for free from the write
            # job's Observation (fallback: aggregate the written sink —
            # still no cache of the exploded frame); per-partition frames
            # are tiny (one row per partition), so building verdicts
            # driver-side avoids extra Spark jobs — serial job latency,
            # not data volume, bounds small-batch runs
            t0 = time.time()
            if obs is not None:
                got = obs.get
                viol_per_part = {str(p): int(got[f"p{p}"] or 0) for p in batch}
            else:
                batch_ids = [str(p) for p in batch]
                viol_per_part = {
                    str(r["partition_id"]): int(r["n"])
                    for r in viol_t.read()
                    .where(F.col("partition_id").isin(batch_ids))
                    .groupBy("partition_id")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            verdict_rows = [
                (pid, cfg.run_id, n, viol_per_part.get(pid, 0), viol_per_part.get(pid, 0) == 0)
                for pid, n in sorted(rows_per_part.items())
            ]
            verd_t.overwrite_partitions(
                spark.createDataFrame(
                    verdict_rows,
                    "partition_id string, run_id string, rows bigint, "
                    "violation_rows bigint, passed boolean",
                ).coalesce(1)
            )
            total_rows += sum(rows_per_part.values())
            total_viol += sum(viol_per_part.values())
        finally:
            metrics.unpersist()
        # lineage commit LAST: a kill before this line leaves the batch
        # uncommitted and it re-runs idempotently (outputs are overwritten
        # per-partition, so the retry converges to the same bytes)
        lineage = spark.createDataFrame(
            [(cfg.run_id, int(p), "done", started, time.time()) for p in batch],
            "run_id string, part_id int, status string, started_ts double, finished_ts double",
        )
        lin_t.append(lineage.coalesce(1), partitioned=False)
        stage["verdict_commit"] += time.time() - t0
        done_now.extend(batch)

    # ---- global constraints (cross-partition by nature)
    t0 = time.time()
    global_viol = 0
    if done_now or done:
        full = table.read()
        gv: list[DataFrame] = []
        for key in cfg.unique_keys:
            # hash-compressed two-stage plan: the big exchange carries
            # 8-byte xxhash64(key) rows instead of key strings; exact
            # re-count over the broadcast candidate set (see
            # constraints.duplicate_keys_hashed)
            dups = C.duplicate_keys_hashed(full, key)
            gv.append(
                dups.select(
                    F.col(key).cast("string").alias("url"),
                    F.lit("0").alias("partition_id"),
                    F.lit(cfg.run_id).alias("run_id"),
                    F.lit("unique").alias("keyword"),
                    F.lit(f"$.{key}").alias("instance_path"),
                    F.lit(f"#/constraints/unique/{key}").alias("schema_path"),
                    F.concat(F.lit("count="), F.col("cnt").cast("string")).alias("detail"),
                )
            )
        if cfg.fk is not None:
            child, ck, pk = cfg.fk
            gv.append(C.referential_violations(child, ck, full, pk, run_id=cfg.run_id))
        if cfg.text_invariant_ref is not None:
            gv.append(C.invariant_violations(full, cfg.text_invariant_ref,
                                             key=cfg.key_col, run_id=cfg.run_id))
        if gv:
            allg = gv[0]
            for g in gv[1:]:
                allg = allg.unionByName(g)
            allg = allg.withColumn("partition_id", F.lit("__global__")).repartition(1).cache()
            try:
                global_viol = allg.count()
                viol_t.overwrite_partitions(allg)
            finally:
                allg.unpersist()
    stage["constraints"] = time.time() - t0

    return RunResult(
        run_id=cfg.run_id,
        partitions_done=done_now,
        partitions_skipped=sorted(done),
        rows=total_rows,
        violation_rows=total_viol,
        global_violations=global_viol,
        stage_secs={k: round(v, 3) for k, v in stage.items()},
    )
