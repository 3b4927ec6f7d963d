"""TableIO backend interface parity: the parquet backend implements the
contract the runner depends on; the Iceberg backend exposes the SAME
four-method surface and fails loudly (not silently) without its runtime
jar (round-1 verdict missing item 5)."""

import pytest

from themis_spark.sources.tableio import IcebergTable, ParquetTable, open_table

IFACE = ["exists", "read", "list_partitions", "overwrite_partitions", "append"]


def test_backends_share_interface():
    for m in IFACE:
        assert callable(getattr(ParquetTable, m))
        assert callable(getattr(IcebergTable, m))


def test_open_table_factory(spark, tmp_path):
    t = open_table(spark, str(tmp_path / "t"))
    assert isinstance(t, ParquetTable)
    with pytest.raises(ValueError):
        open_table(spark, "x", format="delta")


def test_iceberg_raises_cleanly_without_runtime(spark):
    # this sandbox has no iceberg-spark-runtime jar: constructing the
    # backend must raise a clear actionable error, not defer failure to
    # the first read
    with pytest.raises(RuntimeError, match="Iceberg Spark runtime"):
        open_table(spark, "cat.db.pages", format="iceberg")


def test_parquet_partition_roundtrip(spark, tmp_path):
    t = open_table(spark, str(tmp_path / "t"), partition_col="p")
    df = spark.createDataFrame([(1, 10), (1, 11), (2, 20)], "p int, v int")
    t.overwrite_partitions(df)
    assert t.list_partitions() == [1, 2]
    assert t.read(partitions=[1]).count() == 2
    # idempotent replace: rewriting partition 1 does not touch partition 2
    t.overwrite_partitions(spark.createDataFrame([(1, 99)], "p int, v int"))
    assert t.read().count() == 2
    assert {r["v"] for r in t.read(partitions=[2]).collect()} == {20}
