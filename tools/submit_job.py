"""spark-submit entry point for a validation run (the north rule's
deployment shape: ``spark-submit --py-files themis_spark.zip
tools/submit_job.py ...`` on a multi-executor cluster).

The engine is import-clean for --py-files distribution: no module-level
SparkSession, no filesystem state outside the configured table paths,
compiled plans are driver-side objects whose executor-shipped parts
(Column expressions, picklable Arrow validators) serialize with the
task closures.

Usage (any Spark master — local[N], local-cluster, YARN, k8s):

    PYTHONPATH= spark-submit \
        --master local-cluster[2,2,2048] \
        --py-files /path/to/themis_spark.zip \
        tools/submit_job.py \
        --pages /data/pages --out /data/run1 --run-id r1 \
        --stats-columns url,text,lang --unique-keys url

Build the zip with ``python tools/submit_job.py --build-zip DEST`` (no
Spark needed for that step).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def build_zip(dest: str) -> str:
    """Package the library for --py-files: the themis_spark package
    tree, sources included, pycache excluded."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "themis_spark")
    out = dest if dest.endswith(".zip") else os.path.join(dest, "themis_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--build-zip", metavar="DEST",
                    help="package themis_spark.zip for --py-files and exit")
    ap.add_argument("--pages", help="pages table directory (partitioned parquet)")
    ap.add_argument("--out", help="output directory (violations/verdicts/metrics/lineage)")
    ap.add_argument("--run-id", default="r0")
    ap.add_argument("--partition-col", default="part_id")
    ap.add_argument("--key-col", default="url")
    ap.add_argument("--schema-json", help="path to a JSON Schema file "
                    "(default: the built-in Common-Crawl pages schema)")
    ap.add_argument("--stats-columns", default="",
                    help="comma-separated columns for the fused stats pass")
    ap.add_argument("--unique-keys", default="",
                    help="comma-separated columns checked for cross-row uniqueness")
    ap.add_argument("--partitions-per-batch", type=int, default=None)
    args = ap.parse_args()

    if args.build_zip:
        print(build_zip(args.build_zip))
        return
    if not args.pages or not args.out:
        ap.error("--pages and --out are required for a run")

    # imports AFTER argparse: in --py-files mode the zip is only on
    # sys.path once the SparkContext bootstraps the driver environment
    from pyspark.sql import SparkSession

    # spark-submit owns master/deploy config; the builder adds the
    # engine's tuned SQL defaults (AQE, Arrow batch size, dynamic
    # partition overwrite, the InferFiltersFromGenerate exclusion).
    # Correctness does NOT depend on these: the idempotent-overwrite
    # mode is also pinned per-write inside TableIO.
    from themis_spark.session import ENGINE_CONF

    b = SparkSession.builder.appName(f"themis-validate-{args.run_id}")
    for k, v in ENGINE_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()

    from themis_spark.runner import RunConfig, run_validation
    from themis_spark.sources.tableio import ParquetTable

    if args.schema_json:
        with open(args.schema_json) as f:
            schema = json.load(f)
    else:
        from themis_spark.sources.pages import PAGES_SCHEMA_JSON as schema

    table = ParquetTable(spark, args.pages, args.partition_col)
    cfg = RunConfig(
        schema=schema,
        out_dir=args.out,
        run_id=args.run_id,
        key_col=args.key_col,
        partition_col=args.partition_col,
        stats_columns=[c for c in args.stats_columns.split(",") if c],
        unique_keys=[c for c in args.unique_keys.split(",") if c],
        partitions_per_batch=args.partitions_per_batch,
    )
    res = run_validation(spark, table, cfg)
    print(json.dumps({
        "run_id": res.run_id,
        "rows": res.rows,
        "violation_rows": res.violation_rows,
        "global_violations": res.global_violations,
        "partitions_done": [str(p) for p in res.partitions_done],
        "partitions_skipped": [str(p) for p in res.partitions_skipped],
        "stage_secs": res.stage_secs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
