"""Draft-4 conformance through the SPARK surface (FIXTURES.md §3 harness):
all corpus cases loaded into ONE DataFrame of JSON-string documents and
validated in a single Arrow-batched pass — verdicts compared per row.

This exercises the real distribution path: compiled validator closures
cloudpickled to executors, applied per Arrow batch via mapInPandas.
"""

import glob
import json
import os

import pandas as pd
import pytest

from themis_spark.plans.pyvalidator import compile_python_validator

SUITE = os.path.join(os.path.dirname(__file__), "suite", "draft4", "*.json")


def _load_all():
    validators = {}
    rows = []
    for path in sorted(glob.glob(SUITE)):
        name = os.path.basename(path)[:-5]
        with open(path) as f:
            groups = json.load(f)
        for gi, group in enumerate(groups):
            key = f"{name}:{gi}"
            validators[key] = compile_python_validator(group["schema"])
            for ti, test in enumerate(group["tests"]):
                rows.append((key, ti, json.dumps(test["data"]), test["valid"]))
    return validators, rows


@pytest.mark.spark
def test_suite_on_spark(spark):
    validators, rows = _load_all()
    df = spark.createDataFrame(rows, "grp string, case_idx int, doc string, expected boolean")

    def run_batch(batches):
        for pdf in batches:
            verdicts = []
            for grp, doc in zip(pdf["grp"], pdf["doc"]):
                verdicts.append(not validators[grp].validate(json.loads(doc)))
            pdf = pdf.assign(actual=pd.Series(verdicts, index=pdf.index))
            yield pdf

    out = df.repartition(8).mapInPandas(
        run_batch, "grp string, case_idx int, doc string, expected boolean, actual boolean"
    )
    bad = out.where("expected <> actual").collect()
    assert not bad, f"{len(bad)} conformance mismatches on Spark: {bad[:10]}"
    assert out.count() == len(rows)
