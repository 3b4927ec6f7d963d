"""Tests for the schema-driven repair pass."""

from __future__ import annotations

import pytest

from themis_spark.operators.repair import repair_report, repair_table

SCHEMA = {
    "id": "docs",
    "type": "object",
    "properties": {
        "n": {"type": "integer", "minimum": 0, "maximum": 100},
        "lang": {"type": "string", "default": "en"},
        "score": {"type": "number"},
    },
}


def _df(spark):
    return spark.createDataFrame(
        [(1, "42", None, "0.5"), (2, "oops", "de", "x"),
         (3, "-7", None, None), (4, "250", "fr", "1.25")],
        "doc_id long, n string, lang string, score string")


def test_repair_coerce_and_default(spark):
    out = {r["doc_id"]: r for r in repair_table(_df(spark), SCHEMA).collect()}
    assert out[1]["n"] == 42 and out[1]["lang"] == "en"
    assert out[2]["n"] is None and out[2]["lang"] == "de"  # uncoercible
    assert out[3]["n"] == -7  # no clamp by default
    assert out[1]["score"] == 0.5 and out[2]["score"] is None
    assert out[1]["doc_id"] == 1  # untouched column passes through


def test_repair_clamp(spark):
    out = {r["doc_id"]: r for r in
           repair_table(_df(spark), SCHEMA, clamp=True).collect()}
    assert out[3]["n"] == 0      # clamped up to minimum
    assert out[4]["n"] == 100    # clamped down to maximum


def test_repair_types(spark):
    rep = repair_table(_df(spark), SCHEMA)
    kinds = dict(rep.dtypes)
    assert kinds["n"] == "bigint" and kinds["score"] == "double"
    assert kinds["lang"] == "string"


def test_repair_report_counts(spark):
    rows = repair_report(_df(spark), SCHEMA, clamp=True).collect()
    got = {(r["column"], r["remedy"]): r["n"] for r in rows}
    assert got[("n", "coerced")] == 3        # 42, -7, 250
    assert got[("n", "uncoercible")] == 1    # "oops"
    assert got[("n", "clamped_lo")] == 1     # -7
    assert got[("n", "clamped_hi")] == 1     # 250
    assert got[("lang", "defaulted")] == 2
    assert got[("score", "coerced")] == 2
    assert got[("score", "uncoercible")] == 1


def test_repair_report_refuses_unrepairable(spark):
    df = _df(spark).select("doc_id")
    with pytest.raises(ValueError):
        repair_report(df, SCHEMA)


def test_repair_no_shuffle_no_python(spark):
    plan = (repair_table(_df(spark), SCHEMA, clamp=True)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
