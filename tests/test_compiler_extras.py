"""defaults projection, broadcast-set enum, apply_defaults."""

from pyspark.sql import functions as F

from themis_spark.plans.compiler import (
    compile_plan, defaults_projection, semi_join_filter,
)
from themis_spark.plans.pyvalidator import apply_defaults


def test_defaults_projection_native(spark):
    schema = {
        "type": "object",
        "properties": {
            "lang": {"type": "string", "default": "en"},
            "n": {"type": "integer", "minimum": 0, "default": 0},
        },
    }
    df = spark.createDataFrame([("fr", 3), (None, None)], "lang string, n long")
    out = df.select(*defaults_projection(schema, df.columns)).collect()
    assert out[0]["lang"] == "fr" and out[0]["n"] == 3
    assert out[1]["lang"] == "en" and out[1]["n"] == 0
    # defaults applied BEFORE validation → no violations on the filled frame
    filled = df.select(*defaults_projection(schema, df.columns))
    plan = compile_plan(schema, filled.schema)
    assert plan.prepare(filled).select(F.size(plan.violations_col()).alias("n")).agg(F.sum("n")).first()[0] == 0


def test_apply_defaults_python():
    schema = {
        "properties": {
            "a": {"default": 1},
            "b": {"properties": {"c": {"default": "x"}}},
        }
    }
    out = apply_defaults(schema, {"b": {}})
    assert out == {"a": 1, "b": {"c": "x"}}
    src = {"b": {}}
    apply_defaults(schema, src)
    assert src == {"b": {}}  # input never mutated


def test_semi_join_filter_broadcast(spark):
    df = spark.createDataFrame([(i, f"k{i % 5}") for i in range(100)], "id long, k string")
    allowed = spark.createDataFrame([("k0",), ("k1",)], "v string")
    out = semi_join_filter(df, "k", allowed, "v")
    assert out.count() == 40
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
