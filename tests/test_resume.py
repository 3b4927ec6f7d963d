"""Checkpoint/resume: a killed run resumes idempotently — no partition is
validated twice, and final outputs are identical to an uninterrupted run
(SURVEY.md §5.3, north_rule resumability clause)."""

from pyspark.sql import functions as F

from themis_spark.runner import RunConfig, completed_partitions, run_validation
from themis_spark.sources.pages import PAGES_SCHEMA_JSON, write_pages_dataset
from themis_spark.sources.tableio import ParquetTable

N = 8_000


def _cfg(out_dir, **kw):
    base = dict(
        schema=PAGES_SCHEMA_JSON, out_dir=out_dir, run_id="r1",
        stats_columns=["url", "lang"], unique_keys=["url"],
    )
    base.update(kw)
    return RunConfig(**base)


def test_kill_and_resume(spark, tmpdir_path):
    write_pages_dataset(spark, f"{tmpdir_path}/data", N, n_partitions=8)
    table = ParquetTable(spark, f"{tmpdir_path}/data/pages", "part_id")

    # run A: "killed" after 2 batches of 2 partitions (4 of 8 done)
    res1 = run_validation(
        spark, table, _cfg(f"{tmpdir_path}/killed", partitions_per_batch=2, max_batches=2)
    )
    assert len(res1.partitions_done) == 4
    assert completed_partitions(spark, _cfg(f"{tmpdir_path}/killed")) == set(res1.partitions_done)

    # resume: only the remaining 4 run; the first 4 are never re-validated
    res2 = run_validation(spark, table, _cfg(f"{tmpdir_path}/killed"))
    assert sorted(res2.partitions_skipped) == sorted(res1.partitions_done)
    assert sorted(res2.partitions_done + res2.partitions_skipped) == list(range(8))
    assert not set(res2.partitions_done) & set(res1.partitions_done)

    # reference: one uninterrupted run
    res_full = run_validation(spark, table, _cfg(f"{tmpdir_path}/full"))
    assert res_full.rows == N

    for out in ["violations", "verdicts", "metrics"]:
        a = spark.read.parquet(f"{tmpdir_path}/killed/{out}")
        b = spark.read.parquet(f"{tmpdir_path}/full/{out}")
        # sketch bytes are merge-order-dependent; `batch` is layout
        # metadata and legitimately differs between batch splits
        drop = {"metrics": ["hll_sketch", "batch"],
                "violations": ["batch"],
                "verdicts": ["batch"]}.get(out, [])
        a, b = a.drop(*drop), b.drop(*drop)
        assert a.count() == b.count(), out
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, out

    # idempotence: re-running a fully-done run does nothing
    res3 = run_validation(spark, table, _cfg(f"{tmpdir_path}/killed"))
    assert res3.partitions_done == [] and len(res3.partitions_skipped) == 8


def test_resume_with_changed_batch_size_never_double_counts(spark, tmpdir_path):
    """A run killed mid-batch leaves an uncommitted violations directory;
    resuming with a DIFFERENT partitions_per_batch writes different batch
    labels, so the stale directory would double-count its partitions'
    violations. Lineage-driven cleanup removes it at resume start."""
    import os
    import shutil

    write_pages_dataset(spark, f"{tmpdir_path}/data", N, n_partitions=8)
    table = ParquetTable(spark, f"{tmpdir_path}/data/pages", "part_id")

    out = f"{tmpdir_path}/geom"
    run_validation(spark, table, _cfg(out, partitions_per_batch=2, max_batches=2))
    # simulate a kill AFTER the batch [6,7] violations write but BEFORE
    # its lineage commit: copy a committed batch dir to the stale label.
    # The resume below runs partitions 4-7 as ONE batch labelled b4, so
    # b6 is exactly the stale directory a same-geometry overwrite would
    # never touch.
    viol_dir = f"{out}/violations"
    shutil.copytree(os.path.join(viol_dir, "batch=b0"),
                    os.path.join(viol_dir, "batch=b6"))
    # resume with a different geometry (one batch for all remaining)
    run_validation(spark, table, _cfg(out))
    assert not os.path.exists(os.path.join(viol_dir, "batch=b6"))

    ref = f"{tmpdir_path}/geom_ref"
    run_validation(spark, table, _cfg(ref))
    a = spark.read.parquet(viol_dir).drop("batch")
    b = spark.read.parquet(f"{ref}/violations").drop("batch")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_global_constraint_violations_written(spark, tmpdir_path):
    write_pages_dataset(spark, f"{tmpdir_path}/data", N, n_partitions=4)
    table = ParquetTable(spark, f"{tmpdir_path}/data/pages", "part_id")
    res = run_validation(spark, table, _cfg(f"{tmpdir_path}/out"))
    assert res.global_violations > 0
    viol = spark.read.parquet(f"{tmpdir_path}/out/violations")
    glob = viol.where(F.col("partition_id") == "__global__")
    assert glob.where("keyword = 'unique'").count() > 0
