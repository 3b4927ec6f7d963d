"""Draft-4 conformance through the NATIVE engine path: every corpus case
compiled with ``compile_plan`` (Variant-native bounded unroll / Arrow
fallback dispatch — the engine's REAL table path, not just the Python
ground-truth validator) and verified against the expected verdicts.

Harness shape (one Spark pass for the whole corpus): each conformance
group becomes ONE string column of a wide DataFrame (fixed-width names →
unambiguous instance-path prefixes); each group's schema registers under
its own URI and is referenced via $ref so internal '#' refs resolve
against the GROUP schema, not the harness wrapper. ``json_columns``
forces JSON interpretation (corpus data are arbitrary JSON values)."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from themis_spark.plans.compiler import compile_plan
from themis_spark.plans.parser import SchemaRegistry

SUITE = os.path.join(os.path.dirname(__file__), "suite", "draft4", "*.json")


def _load_groups():
    groups = []
    for path in sorted(glob.glob(SUITE)):
        name = os.path.basename(path)[:-5]
        with open(path) as f:
            for gi, group in enumerate(json.load(f)):
                groups.append((f"{name}:{gi}", group["schema"], group["tests"]))
    return groups


@pytest.mark.spark
def test_suite_through_compile_plan(spark):
    groups = _load_groups()
    reg = SchemaRegistry()
    props = {}
    colname = {}
    for i, (label, schema, _tests) in enumerate(groups):
        uri = f"conf{i:03d}"
        reg.add(schema, uri)
        col = f"g{i:03d}"
        colname[label] = col
        props[col] = {"$ref": uri}

    n_rows = max(len(t) for _, _, t in groups)
    rows = []
    for r in range(n_rows):
        row = []
        for _, _, tests in groups:
            row.append(json.dumps(tests[r]["data"]) if r < len(tests) else None)
        rows.append(tuple(row))
    ddl = ", ".join(f"{props_col} string" for props_col in props)
    df = spark.createDataFrame(
        [(r,) + row for r, row in enumerate(rows)],
        f"row_id int, {ddl}")

    wrapper = {"type": "object", "properties": props}
    plan = compile_plan(wrapper, df.schema, registry=reg,
                        json_columns=set(props))

    ann = plan.prepare(df).select(
        "row_id", plan.violations_col().alias("violations"))
    failed = set()  # (row, col) pairs with ≥1 violation
    for rec in ann.select("row_id", F.explode("violations").alias("v")).collect():
        ip = rec["v"]["instance_path"]
        assert ip.startswith("$.g"), ip
        failed.add((rec["row_id"], ip[2:6]))

    mismatches = []
    for label, _schema, tests in [(l, s, t) for l, s, t in groups]:
        col = colname[label]
        for r, test in enumerate(tests):
            actual_valid = (r, col) not in failed
            if actual_valid != test["valid"]:
                mismatches.append(
                    (label, test.get("description", r), test["data"],
                     "expected", test["valid"]))
    assert not mismatches, (
        f"{len(mismatches)} native-path conformance mismatches: "
        f"{mismatches[:12]}")