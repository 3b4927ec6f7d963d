"""Draft-4 conformance: every corpus case against the compiled Python
validator (the ground-truth core; SURVEY.md §5.1)."""

import glob
import json
import os

import pytest

from themis_spark.plans.pyvalidator import compile_python_validator

SUITE = os.path.join(os.path.dirname(__file__), "suite", "draft4", "*.json")


def _cases():
    for path in sorted(glob.glob(SUITE)):
        name = os.path.basename(path)[:-5]
        with open(path) as f:
            groups = json.load(f)
        for gi, group in enumerate(groups):
            for ti, test in enumerate(group["tests"]):
                yield pytest.param(
                    group["schema"], test["data"], test["valid"],
                    id=f"{name}[{gi}:{ti}] {test['description'][:50]}",
                )


@pytest.mark.parametrize("schema,data,valid", _cases())
def test_case(schema, data, valid):
    v = compile_python_validator(schema)
    violations = v.validate(data)
    assert (not violations) == valid, f"violations={violations}"


def test_violation_triple_contract():
    """Violation rows carry (keyword, instance_path, schema_path) — the
    reference-compatibility contract (BASELINE.json north_star)."""
    v = compile_python_validator(
        {"id": "s1", "properties": {"a": {"items": {"minimum": 5}}}}
    )
    out = v.validate({"a": [7, 3]})
    assert out == [("minimum", "$.a[1]", "s1#/properties/a/items/minimum")]
