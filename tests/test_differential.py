"""Differential testing: the NATIVE Column compile path must agree with
the ground-truth Python validator (plans/pyvalidator.py) on typed rows.

Hypothesis generates random typed rows + keyword parameters; both paths
validate the same data; verdict sets must match exactly. This pins the
tricky typed-table semantics (SQL NULL = absent; value keywords pass on
absent; draft-4 numeric edge cases) against the conformance-tested core.
"""

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from themis_spark.plans.compiler import compile_plan
from themis_spark.plans.pyvalidator import compile_python_validator

TEXT = st.one_of(st.none(), st.text(alphabet="abxy ", max_size=12))
NUM = st.one_of(st.none(), st.integers(min_value=-50, max_value=50))

ROWS = st.lists(st.tuples(TEXT, NUM, TEXT), min_size=1, max_size=12)

SCHEMAS = st.fixed_dictionaries(
    {
        "type": st.just("object"),
        "required": st.lists(st.sampled_from(["s", "n", "t"]), max_size=3, unique=True),
        "properties": st.fixed_dictionaries(
            {
                "s": st.fixed_dictionaries(
                    {"type": st.just("string")},
                    optional={
                        "minLength": st.integers(0, 6),
                        "maxLength": st.integers(2, 10),
                        "pattern": st.sampled_from(["^a", "b$", "x"]),
                        "enum": st.lists(st.sampled_from(["a", "ab", "xy", "b"]), min_size=1, max_size=3),
                    },
                ),
                "n": st.fixed_dictionaries(
                    {"type": st.just("integer")},
                    optional={
                        "minimum": st.integers(-20, 20),
                        "maximum": st.integers(-20, 20),
                        "exclusiveMinimum": st.booleans(),
                        "exclusiveMaximum": st.booleans(),
                        "multipleOf": st.integers(1, 7),
                    },
                ),
            }
        ),
    }
)


def _python_verdict(schema: dict, row: tuple) -> bool:
    """Ground truth: a typed row as a JSON object, SQL NULL = absent."""
    doc = {}
    for k, v in zip(["s", "n", "t"], row):
        if v is not None:
            doc[k] = v
    v = compile_python_validator(schema)
    return v.is_valid(doc)


@pytest.mark.spark
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=ROWS, schema=SCHEMAS)
def test_native_path_matches_python_core(spark, rows, schema):
    # exclusive bounds without the bound itself are meaningless in draft-4
    props = schema["properties"]
    if "exclusiveMinimum" in props["n"] and "minimum" not in props["n"]:
        props["n"].pop("exclusiveMinimum")
    if "exclusiveMaximum" in props["n"] and "maximum" not in props["n"]:
        props["n"].pop("exclusiveMaximum")

    df = spark.createDataFrame(rows, "s string, n long, t string")
    plan = compile_plan(schema, df.schema)
    got = [
        r["ok"]
        for r in plan.prepare(df).select((F.size(plan.violations_col()) == 0).alias("ok")).collect()
    ]
    want = [_python_verdict(schema, row) for row in rows]
    assert got == want, f"schema={json.dumps(schema)} rows={rows}"


# ---- combinators on typed columns (round-2: native anyOf/oneOf/not/allOf)

_BRANCH = st.one_of(
    st.fixed_dictionaries({}, optional={
        "minimum": st.integers(-20, 20),
        "maximum": st.integers(-20, 20),
        "multipleOf": st.integers(1, 7),
        "enum": st.lists(st.integers(-5, 5), min_size=1, max_size=3),
    }),
    st.fixed_dictionaries({"type": st.just("string")}),
)

_COMB_SCHEMAS = st.fixed_dictionaries({
    "type": st.just("object"),
    "properties": st.fixed_dictionaries({
        "n": st.one_of(
            st.fixed_dictionaries({"anyOf": st.lists(_BRANCH, min_size=1, max_size=3)}),
            st.fixed_dictionaries({"oneOf": st.lists(_BRANCH, min_size=1, max_size=3)}),
            st.fixed_dictionaries({"allOf": st.lists(_BRANCH, min_size=1, max_size=3)}),
            st.fixed_dictionaries({"not": _BRANCH}),
        ),
    }),
})


@pytest.mark.spark
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=ROWS, schema=_COMB_SCHEMAS)
def test_native_combinators_match_python_core(spark, rows, schema):
    df = spark.createDataFrame(rows, "s string, n long, t string")
    plan = compile_plan(schema, df.schema)
    assert not plan.arrow_specs, "combinators over longs must stay native"
    got = [
        r["ok"]
        for r in plan.prepare(df).select((F.size(plan.violations_col()) == 0).alias("ok")).collect()
    ]
    want = [_python_verdict(schema, row) for row in rows]
    assert got == want, f"schema={json.dumps(schema)} rows={rows}"
