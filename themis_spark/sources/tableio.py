"""Partition-granular table IO.

Production design targets Iceberg (partition listing, partition-pruned
scans, atomic ``overwritePartitions``); this sandbox has no Iceberg
runtime jar, so the concrete backend is partitioned Parquet with Spark's
dynamic partition overwrite, which gives the same idempotent
replace-partition commit semantics the checkpoint/resume logic needs
(SURVEY.md §7.3.7). The API is deliberately Iceberg-shaped so swapping
``format("parquet")`` → ``format("iceberg")`` is the only change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetTable:
    """A partitioned Parquet table addressed by directory."""

    def __init__(self, spark: SparkSession, path: str, partition_col: str = "part_id"):
        self.spark = spark
        self.path = path
        self.partition_col = partition_col

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not n.startswith(("_", ".")) for n in os.listdir(self.path)
        )

    def read(self, partitions: list | None = None) -> DataFrame:
        df = self.spark.read.parquet(self.path)
        if partitions is not None:
            # partition-column predicate → Catalyst partition pruning:
            # only the named directories are scanned (resume work set)
            df = df.filter(F.col(self.partition_col).isin(partitions))
        return df

    def list_partitions(self) -> list:
        if not self.exists():
            return []
        vals = []
        prefix = f"{self.partition_col}="
        for name in os.listdir(self.path):
            if name.startswith(prefix):
                raw = name[len(prefix):]
                vals.append(int(raw) if raw.lstrip("-").isdigit() else raw)
        return sorted(vals)

    def overwrite_partitions(self, df: DataFrame) -> None:
        """Replace exactly the partitions present in ``df`` (dynamic
        partition overwrite ≈ Iceberg overwritePartitions)."""
        (
            df.write.mode("overwrite")
            .partitionBy(self.partition_col)
            .parquet(self.path)
        )

    def append(self, df: DataFrame, partitioned: bool = True) -> None:
        w = df.write.mode("append")
        if partitioned:
            w = w.partitionBy(self.partition_col)
        w.parquet(self.path)
