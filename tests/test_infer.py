"""Schema inference (plans/infer.py): type-string parser units, the
two-pass native profile, draft-4 assembly, and the round-trip guarantee —
an inferred schema never rejects the data it was derived from, and the
result feeds straight back into the engine's own validators.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from themis_spark.plans import infer as I
from themis_spark.plans.pyvalidator import compile_python_validator


# ------------------------------------------------------------------- parser

def test_parse_scalars_and_decimal():
    assert I.parse_variant_type("BIGINT").kind == "BIGINT"
    d = I.parse_variant_type("DECIMAL(21,1)")
    assert d.kind == "DECIMAL" and d.decimal_scale == 1
    assert I.variant_type_to_draft4(I.parse_variant_type("DECIMAL(5,0)")) == {
        "type": "integer"}
    assert I.variant_type_to_draft4(I.parse_variant_type("DECIMAL(5,2)")) == {
        "type": "number"}
    assert I.variant_type_to_draft4(I.parse_variant_type("VOID")) == {"type": "null"}
    assert I.variant_type_to_draft4(I.parse_variant_type("VARIANT")) == {}


def test_parse_nested_object_array():
    n = I.parse_variant_type(
        "OBJECT<a: DECIMAL(21,1), b: OBJECT<c: ARRAY<BIGINT>>, e: ARRAY<VARIANT>>")
    assert set(n.fields) == {"a", "b", "e"}
    assert n.fields["b"].fields["c"].element.kind == "BIGINT"
    s = I.variant_type_to_draft4(n)
    assert s["properties"]["b"]["properties"]["c"] == {
        "type": "array", "items": {"type": "integer"}}
    assert s["properties"]["e"] == {"type": "array"}  # heterogeneous -> open


def test_parse_backquoted_and_empty():
    n = I.parse_variant_type("OBJECT<`weird key`: BIGINT, `a``b`: STRING>")
    assert set(n.fields) == {"weird key", "a`b"}
    assert I.parse_variant_type("OBJECT<>").fields == {}
    with pytest.raises(ValueError):
        I.parse_variant_type("OBJECT<a: BIGINT")


def test_child_path_quoting():
    assert I._child_path("$", "ok_name") == "$.ok_name"
    assert I._child_path("$", "weird key") == "$['weird key']"


# ----------------------------------------------------------------- profiles

ROWS = [
    '{"a": 1, "b": {"c": [1, 2], "d": "x"}, "tag": "t1"}',
    '{"a": 2.5, "b": {"c": [3], "d": "y"}}',
    '{"a": null, "b": {"c": [], "d": "z"}, "tag": "t2"}',
]


def _df(spark):
    return spark.createDataFrame([(r,) for r in ROWS], "j string")


def test_profile_counts(spark):
    prof = {r["path"]: r for r in I.json_path_profile(_df(spark), "j").collect()}
    assert prof["$"]["n_present"] == 3 and prof["$"]["jtype"] == "object"
    assert prof["$.a"]["n_present"] == 3  # JSON null IS present
    assert prof["$.a"]["n_null"] == 1
    assert prof["$.a"]["jtype"] == "number"  # 1 merged with 2.5
    assert prof["$.tag"]["n_present"] == 2 and prof["$.tag"]["n_null"] == 0
    assert prof["$.b.c"]["jtype"] == "array"


def test_profile_is_native_single_agg(spark):
    df = _df(spark)
    plan = I.json_path_profile(df, "j")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_infer_schema_shape_and_required(spark):
    schema = I.infer_draft4_schema(_df(spark), "j")
    assert schema["type"] == "object"
    # null absorbed by the merged type string is resurfaced as a union
    assert schema["properties"]["a"]["type"] == ["null", "number"]
    assert sorted(schema["required"]) == ["a", "b"]  # tag present in 2/3 only
    assert schema["properties"]["b"]["required"] == ["c", "d"]
    # 2/3 presence passes a lower required_min_frac
    loose = I.infer_draft4_schema(_df(spark), "j", required_min_frac=0.6)
    assert "tag" in loose["required"]


def test_infer_round_trip_accepts_source_rejects_other(spark):
    schema = I.infer_draft4_schema(_df(spark), "j")
    v = compile_python_validator(schema)
    for r in ROWS:
        assert v.is_valid(json.loads(r)), r
    assert not v.is_valid({"a": "wrong type", "b": {"c": [1], "d": "x"}})
    assert not v.is_valid({"a": 1, "b": {"c": [1]}})          # missing b.d
    assert not v.is_valid({"b": {"c": ["s"], "d": "x"}, "a": 1})  # items type


def test_infer_odd_keys_round_trip(spark):
    rows = ['{"weird key": 1, "ok": "x"}', '{"weird key": 2}']
    df = spark.createDataFrame([(r,) for r in rows], "j string")
    schema = I.infer_draft4_schema(df, "j")
    assert schema["required"] == ["weird key"]
    v = compile_python_validator(schema)
    assert all(v.is_valid(json.loads(r)) for r in rows)
    assert not v.is_valid({"ok": "x"})


def test_infer_from_typed_json_of_table(spark):
    # the shape the engine meets in practice: a JSON metadata column
    # synthesized from typed columns, inferred, then re-validated
    df = spark.range(50).select(
        F.to_json(F.struct(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), F.col("id").cast("string")).alias("src"),
            F.struct((F.col("id") * 2).alias("n")).alias("meta"),
        )).alias("props"))
    schema = I.infer_draft4_schema(df, "props")
    assert sorted(schema["required"]) == ["doc_id", "meta", "src"]
    assert schema["properties"]["doc_id"] == {"type": "integer"}
    assert schema["properties"]["meta"]["properties"]["n"] == {"type": "integer"}
    v = compile_python_validator(schema)
    assert v.is_valid({"doc_id": 1, "src": "s1", "meta": {"n": 2}})


def test_infer_bounds_and_enum(spark):
    rows = [
        '{"n": 3, "s": "abc", "lang": "en", "flag": true}',
        '{"n": 10, "s": "abcdef", "lang": "de", "flag": false}',
        '{"n": 7, "s": "ab", "lang": "en"}',
        '{"n": 5, "s": "abcd", "lang": null}',
    ]
    df = spark.createDataFrame([(r,) for r in rows], "j string")
    schema = I.infer_draft4_schema(df, "j", bounds=True, enum_max=5)
    p = schema["properties"]
    assert p["n"]["minimum"] == 3 and p["n"]["maximum"] == 10
    assert p["s"]["minLength"] == 2 and p["s"]["maxLength"] == 6
    # JSON null joins the enum so the union type stays satisfiable
    assert p["lang"]["enum"] == ["de", "en", None]
    assert p["lang"]["type"] == ["null", "string"]
    assert p["flag"]["enum"] == [False, True]
    # bounds/enums stay round-trip-safe on the source rows
    v = compile_python_validator(schema)
    for r in rows:
        assert v.is_valid(json.loads(r)), r
    assert not v.is_valid({"n": 11, "s": "abc", "lang": "en"})   # > maximum
    assert not v.is_valid({"n": 3, "s": "a", "lang": "en"})      # < minLength
    assert not v.is_valid({"n": 3, "s": "ab", "lang": "xx"})     # not in enum


def test_infer_enum_cap_respected(spark):
    df = spark.range(200).select(
        F.to_json(F.struct((F.col("id") % 50).cast("string").alias("many"),
                           (F.col("id") % 3).alias("few"))).alias("j"))
    schema = I.infer_draft4_schema(df, "j", enum_max=5)
    p = schema["properties"]
    assert "enum" not in p["many"]  # 50 distinct > cap
    assert sorted(p["few"]["enum"]) == [0, 1, 2]
