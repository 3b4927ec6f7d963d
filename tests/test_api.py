"""Reference-parity API facade: Themis.validator / validate / registerFormat
shapes over this engine — single-document reports, multi-schema $ref
dispatch (both registration orders), anonymous index ids, and the table
form producing the same triples as the single-document form.
"""

from __future__ import annotations

import themis_spark as T


ADDR = {
    "id": "http://example.com/address",
    "type": "object",
    "required": ["city"],
    "properties": {"city": {"type": "string"}},
}
PERSON = {
    "id": "http://example.com/person",
    "type": "object",
    "properties": {
        "name": {"type": "string", "minLength": 2},
        "address": {"$ref": "http://example.com/address"},
    },
}


def test_single_schema_report_shape():
    v = T.validator({"type": "object", "required": ["a"],
                     "properties": {"a": {"type": "integer"}}})
    ok = v.validate({"a": 1})
    assert ok == {"valid": True, "errors": []}
    bad = v.validate({"a": "x"})
    assert not bad["valid"]
    [err] = bad["errors"]
    assert err["keyword"] == "type" and err["instance_path"] == "$.a"
    # schema paths carry the registry uri prefix — same convention as
    # the table path's violation rows (anonymous schemas register as "0")
    assert err["schema_path"].endswith("#/properties/a/type")


def test_multi_schema_cross_ref_both_orders():
    for schemas in ([ADDR, PERSON], [PERSON, ADDR]):
        v = T.validator(schemas)
        assert set(v.schema_ids) == {"http://example.com/address",
                                     "http://example.com/person"}
        good = {"name": "Jo", "address": {"city": "Berlin"}}
        assert v.is_valid(good, "http://example.com/person")
        bad = {"name": "Jo", "address": {}}
        rep = v.validate(bad, "http://example.com/person")
        assert not rep["valid"]
        assert rep["errors"][0]["keyword"] == "required"
        # engine convention: required reports the MISSING property's path
        assert rep["errors"][0]["instance_path"] == "$.address.city"
        assert rep["errors"][0]["schema_path"].startswith(
            "http://example.com/address")


def test_anonymous_schemas_get_index_ids():
    v = T.validator([{"type": "integer"}, {"type": "string"}])
    assert v.schema_ids == ["0", "1"]
    assert v.is_valid(3, "0") and not v.is_valid(3, "1")
    # first schema is the default
    assert v.is_valid(3)


def test_custom_format_through_facade():
    v = T.validator({"type": "string", "format": "even-length"},
                    formats={"even-length": lambda s: len(s) % 2 == 0})
    assert v.is_valid("ab") and not v.is_valid("abc")


def test_validate_table_matches_single_doc_triples(spark):
    schema = {
        "id": "pages",
        "type": "object",
        "required": ["url", "lang"],
        "properties": {
            "url": {"type": "string", "pattern": "^https?://"},
            "lang": {"enum": ["en", "de"]},
        },
    }
    rows = [
        ("https://example.com/a", "en"),
        ("ftp://example.com/b", "de"),
        ("https://example.com/c", "xx"),
    ]
    v = T.validator(schema)
    df = spark.createDataFrame(rows, "url string, lang string")
    got = sorted(
        (r["url"], r["keyword"], r["instance_path"], r["schema_path"])
        for r in v.validate_table(df, key_col="url").collect())
    want = []
    for url, lang in rows:
        for e in v.validate({"url": url, "lang": lang})["errors"]:
            want.append((url, e["keyword"], e["instance_path"], e["schema_path"]))
    assert got == sorted(want) and len(got) == 2


def test_validator_from_table_detects_drift(spark):
    from themis_spark.api import validator_from_table

    healthy = spark.createDataFrame(
        [(f'{{"lang": "{l}", "n": {n}}}',)
         for n, l in zip(range(5, 10), ["en", "de", "en", "de", "en"])],
        "j string")
    v = validator_from_table(healthy, "j", bounds=True, enum_max=4)
    assert v.is_valid({"lang": "en", "n": 7})
    drifted = v.validate({"lang": "xx", "n": 99})
    assert not drifted["valid"]
    kws = {e["keyword"] for e in drifted["errors"]}
    assert "enum" in kws and "maximum" in kws

    # cross-regime: the schema inferred from the JSON column compiles
    # against a TYPED table and flags the same drift distributedly
    later = spark.createDataFrame(
        [(1, "en", 6), (2, "zz", 5), (3, "de", 99)], "url long, lang string, n long")
    viol = v.validate_table(later, key_col="url").collect()
    got = {(r["url"], r["keyword"]) for r in viol}
    assert ("2", "enum") in got or (2, "enum") in got
    assert ("3", "maximum") in got or (3, "maximum") in got
    assert not any(u in ("1", 1) for (u, _k) in got)


def test_facade_repair_table(spark):
    from themis_spark.api import validator

    v = validator({
        "id": "r", "type": "object",
        "properties": {"n": {"type": "integer", "minimum": 0},
                       "lang": {"type": "string", "default": "en"}},
    })
    df = spark.createDataFrame([(1, "5", None), (2, "bad", "de")],
                               "doc_id long, n string, lang string")
    out = {r["doc_id"]: r for r in v.repair_table(df).collect()}
    assert out[1]["n"] == 5 and out[1]["lang"] == "en"
    assert out[2]["n"] is None and out[2]["lang"] == "de"
    rep = {(r["column"], r["remedy"]): r["n"]
           for r in v.repair_report(df).collect()}
    assert rep[("n", "coerced")] == 1 and rep[("n", "uncoercible")] == 1
    assert rep[("lang", "defaulted")] == 1


def test_validate_table_resolves_cross_schema_refs(spark):
    """A $ref from schema A into schema B must resolve on the TABLE path
    exactly like the single-document path — validate_table used to compile
    against a fresh registry that only knew schema A."""
    from themis_spark.api import validator

    common = {"id": "common", "definitions": {"pos": {"minimum": 1}}}
    page = {"id": "page", "type": "object",
            "properties": {"n": {"$ref": "common#/definitions/pos"}}}
    v = validator([page, common])

    # single-document path
    assert v.is_valid({"n": 3}, "page")
    bad = v.validate({"n": 0}, "page")
    assert not bad["valid"]
    triple = (bad["errors"][0]["keyword"], bad["errors"][0]["schema_path"])

    # table path: same rows, same triples
    df = spark.createDataFrame([(1, 3), (2, 0)], "url long, n long")
    rows = v.validate_table(df, "page").collect()
    assert len(rows) == 1
    assert rows[0]["url"] == 2
    assert (rows[0]["keyword"], rows[0]["schema_path"]) == triple


def test_validate_table_anonymous_schema_stable_paths(spark):
    """Anonymous schemas keep their index-derived uri on re-compile: the
    table path's schema_path prefix must match the single-doc path."""
    from themis_spark.api import validator

    v = validator([{"type": "object", "properties": {"n": {"minimum": 1}}}])
    doc_err = v.validate({"n": 0})["errors"][0]["schema_path"]
    df = spark.createDataFrame([(1, 0)], "url long, n long")
    rows = v.validate_table(df).collect()
    assert rows[0]["schema_path"] == doc_err


def test_validate_table_dispatch_per_row_schema(spark):
    import themis_spark as T
    from pyspark.sql import functions as F

    v = T.validator([
        {"id": "strict", "type": "object", "required": ["url"],
         "properties": {"n": {"type": "integer", "minimum": 10}}},
        {"id": "loose", "type": "object",
         "properties": {"n": {"type": "integer", "minimum": 0}}},
    ])
    rows = [
        ("a", 5, "strict"),    # fails strict minimum 10
        ("b", 5, "loose"),     # passes loose minimum 0
        ("c", -1, "loose"),    # fails loose
        ("d", 50, "strict"),   # passes strict
        ("e", 1, "mystery"),   # unknown schema id
        ("f", 1, None),        # null schema id
    ]
    df = spark.createDataFrame(rows, "url string, n long, schema_id string")
    got = v.validate_table_dispatch(df).collect()
    by_url = {}
    for r in got:
        by_url.setdefault(r["url"], []).append((r["keyword"], r["schema_id"]))
    assert ("minimum", "strict") in by_url["a"]
    assert "b" not in by_url and "d" not in by_url
    assert ("minimum", "loose") in by_url["c"]
    assert by_url["e"] == [("$dispatch", "mystery")]
    assert by_url["f"][0][0] == "$dispatch" and by_url["f"][0][1] is None
    # rows are never double-validated across branches
    assert all(len(v) == 1 for v in by_url.values())


def test_validate_table_dispatch_works_on_streams(spark, tmpdir_path):
    # dispatch branches are stateless (where + fused validate + union),
    # so the same API must compose onto readStream unchanged
    import themis_spark as T

    v = T.validator([
        {"id": "s1", "type": "object",
         "properties": {"n": {"type": "integer", "minimum": 10}}},
    ])
    df = spark.createDataFrame(
        [("a", 5, "s1"), ("b", 50, "s1"), ("c", 1, "nope")],
        "url string, n long, schema_id string")
    df.write.mode("append").parquet(f"{tmpdir_path}/din")
    stream = spark.readStream.schema(df.schema).parquet(f"{tmpdir_path}/din")
    out = v.validate_table_dispatch(stream)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("disp")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["url"], r["keyword"]) for r in
           spark.sql("select * from disp").collect()}
    assert got == {("a", "minimum"), ("c", "$dispatch")}
