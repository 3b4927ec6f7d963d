"""Deployment-shape test: the engine runs under ``spark-submit
--py-files themis_spark.zip`` on a multi-executor master, from a
working directory that does NOT have the repo on sys.path — the north
rule's cluster submission path, end to end."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    home = os.environ.get("SPARK_HOME")
    if home and os.path.exists(os.path.join(home, "bin", "spark-submit")):
        return os.path.join(home, "bin", "spark-submit")
    return shutil.which("spark-submit")


@pytest.mark.spark
def test_spark_submit_pyfiles_run(spark, tmpdir_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH/SPARK_HOME")

    from themis_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 2000, n_partitions=2)
    pages.write.mode("overwrite").partitionBy("part_id").parquet(f"{tmpdir_path}/pages")

    # build the --py-files artifact
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_job.py"),
         "--build-zip", tmpdir_path],
        capture_output=True, text=True, check=True)
    zip_path = out.stdout.strip()
    assert zip_path.endswith("themis_spark.zip") and os.path.exists(zip_path)

    # run from a NEUTRAL cwd with the repo scrubbed from PYTHONPATH: the
    # executors and driver must get themis_spark from the zip alone
    workdir = tempfile.mkdtemp(prefix="submit_cwd_")
    script = os.path.join(workdir, "job.py")
    shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), script)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    p = subprocess.run(
        [submit, "--master", "local-cluster[2,2,1024]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path, script,
         "--pages", f"{tmpdir_path}/pages", "--out", f"{tmpdir_path}/out",
         "--run-id", "submit1", "--stats-columns", "url,lang",
         "--unique-keys", "url"],
        capture_output=True, text=True, cwd=workdir, env=env, timeout=600)
    assert p.returncode == 0, p.stderr[-3000:]
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    assert line, p.stdout[-2000:]
    res = json.loads(line[-1])
    assert res["rows"] == 2000 and res["violation_rows"] > 0
    assert sorted(res["partitions_done"]) == ["0", "1"]

    # table = per-batch violations + the cross-partition (__global__) set
    viol = spark.read.parquet(f"{tmpdir_path}/out/violations")
    assert viol.count() == res["violation_rows"] + res["global_violations"]
    verd = spark.read.parquet(f"{tmpdir_path}/out/verdicts")
    assert verd.count() == 2
