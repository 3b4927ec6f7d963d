"""Native nested-object checks: StructType recursion and MapType object
keywords compile to pure Column expressions (no Arrow fallback needed)."""

from pyspark.sql import functions as F

from themis_spark.plans.compiler import compile_plan


def _violations(spark, df, schema):
    plan = compile_plan(schema, df.schema)
    assert not plan.arrow_specs, "nested typed checks must stay native"
    rows = plan.prepare(df).select(plan.violations_col().alias("v")).collect()
    return [
        [(x["keyword"], x["instance_path"]) for x in r["v"]] for r in rows
    ], plan


def test_struct_recursion(spark):
    df = spark.createDataFrame(
        [
            (1, ("alice", 30)),
            (2, ("x", None)),      # name too short, age absent
            (3, None),             # whole object absent (not required)
        ],
        "id long, person struct<name: string, age: long>",
    )
    schema = {
        "type": "object",
        "properties": {
            "person": {
                "type": "object",
                "required": ["name", "age"],
                "properties": {
                    "name": {"type": "string", "minLength": 2},
                    "age": {"type": "integer", "minimum": 0, "maximum": 150},
                },
            }
        },
    }
    viols, plan = _violations(spark, df, schema)
    assert viols[0] == []
    assert ("minLength", "$.person.name") in viols[1]
    assert ("required", "$.person.age") in viols[1]
    assert viols[2] == []  # absent object: nested checks pass


def test_struct_deep_nesting(spark):
    df = spark.createDataFrame(
        [((("ok",),),), ((("",),),)],
        "a struct<b: struct<c: string>>",
    )
    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "object", "properties": {
                "b": {"type": "object", "properties": {
                    "c": {"type": "string", "minLength": 1}}}}}
        },
    }
    viols, _ = _violations(spark, df, schema)
    assert viols[0] == []
    assert viols[1] == [("minLength", "$.a.b.c")]


def test_map_object_keywords(spark):
    df = spark.createDataFrame(
        [
            (1, {"host": "a.com", "h-lang": "en"}),
            (2, {"host": "b.com", "x-extra": "1"}),  # additional key
            (3, {"h-lang": "en"}),                   # missing required host
            (4, {"host": "c.com", "h1": "y", "h2": "z",
                 "h3": "w", "h4": "v", "h5": "u"}),  # too many properties
        ],
        "id long, headers map<string, string>",
    )
    schema = {
        "type": "object",
        "properties": {
            "headers": {
                "type": "object",
                "required": ["host"],
                "maxProperties": 5,
                "properties": {"host": {"minLength": 3}},
                "patternProperties": {"^h": {"maxLength": 10}},
                "additionalProperties": False,
            }
        },
    }
    viols, _ = _violations(spark, df, schema)
    assert viols[0] == []
    assert ("additionalProperties", "$.headers") in viols[1]
    assert ("required", "$.headers.host") in viols[2]
    assert ("maxProperties", "$.headers") in viols[3]


def test_map_pattern_value_check(spark):
    df = spark.createDataFrame(
        [(1, {"ha": "short"}), (2, {"ha": "way too long a value here"})],
        "id long, m map<string, string>",
    )
    schema = {
        "type": "object",
        "properties": {"m": {"patternProperties": {"^h": {"maxLength": 10}}}},
    }
    viols, _ = _violations(spark, df, schema)
    assert viols[0] == [] and ("patternProperties", "$.m") in viols[1]
