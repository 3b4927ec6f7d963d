"""Mojibake repair (operators/repair.py) and HLL set overlap
(operators/stats.py::hll_set_overlap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import themis_spark.operators.repair as R
import themis_spark.operators.stats as ST

ORIG_FULL = "it’s a café — “fine” €5"
ORIG_1252 = "it’s a café — “fine €5"  # avoids bytes undefined in cp1252


@pytest.fixture(scope="module")
def moji(spark):
    rows = [
        (0, ORIG_FULL.encode("utf-8").decode("latin-1")),   # control-form
        (1, ORIG_1252.encode("utf-8").decode("cp1252")),    # printed-form
        (2, "plain ascii only"),
        (3, "JOÃO lives"),            # legit Ã + ASCII: marker must not fire
        (4, "中文 mixed with itâ€™s bad"),  # >U+00FF chars: gated passthrough
        (5, None),
        (6, "Ã© but also ü standalone"),    # marker fires, bytes invalid UTF-8
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return rows, {r["doc_id"]: r for r in R.repair_mojibake(df).collect()}


def test_both_mojibake_flavors_restore_byte_exact(moji):
    _, out = moji
    assert out[0]["detected"] and out[0]["repaired"] == ORIG_FULL
    assert out[1]["detected"] and out[1]["repaired"] == ORIG_1252


def test_clean_and_unsafe_rows_pass_through(moji):
    rows, out = moji
    for i in (2, 3):
        assert not out[i]["detected"]
    for i in (2, 3, 4, 6):  # unchanged even when detection fired (6)
        assert out[i]["repaired"] == rows[i][1]
    assert out[5]["repaired"] is None


def test_repair_is_scan_stage(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = R.repair_mojibake(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_double_mangled_single_pass_is_stable(spark):
    # double-encoded text repairs one layer per pass and stays safe
    once = ORIG_1252.encode("utf-8").decode("cp1252")
    twice = once.encode("utf-8").decode("latin-1")  # outer layer latin-1:
    # cp1252 would hit its undefined byte 0x9D on this content
    df = spark.createDataFrame([(0, twice)], "doc_id long, text string")
    r1 = R.repair_mojibake(df).first()["repaired"]
    assert r1 == once
    df2 = spark.createDataFrame([(0, r1)], "doc_id long, text string")
    assert R.repair_mojibake(df2).first()["repaired"] == ORIG_1252


def test_hll_overlap_estimates_track_exact(spark):
    # two overlapping key ranges with known exact overlap
    a = spark.range(0, 6000).select(F.col("id").alias("k"))
    b = spark.range(4000, 10000).select(F.col("id").alias("k"))
    r = ST.hll_set_overlap(a, b, "k").first()
    assert abs(r["est_a"] - 6000) <= 0.05 * 6000
    assert abs(r["est_b"] - 6000) <= 0.05 * 6000
    assert abs(r["est_union"] - 10000) <= 0.05 * 10000
    assert abs(r["est_intersection"] - 2000) <= 0.15 * 2000
    assert 0.1 < r["jaccard_est"] < 0.3  # true 0.2


def test_hll_overlap_empty_inputs_defined(spark):
    # review finding (r5): two empty inputs gave est_union = 0 and a
    # NULL jaccard under non-ANSI division — now defined as 0.0, and
    # est_intersection is clamped at 0 (inclusion-exclusion of noisy
    # estimates can go negative)
    e = spark.range(0).select(F.col("id").alias("k"))
    r = ST.hll_set_overlap(e, e, "k").first()
    assert r["est_union"] == 0 and r["jaccard_est"] == 0.0
    assert r["est_intersection"] == 0
    # disjoint sets: intersection estimate must never be negative
    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(3000, 6000).select(F.col("id").alias("k"))
    r2 = ST.hll_set_overlap(a, b, "k").first()
    assert r2["est_intersection"] >= 0


def test_hll_overlap_plan_has_no_corpus_join(spark):
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(500, 1500).select(F.col("id").alias("k"))
    plan = ST.hll_set_overlap(a, b, "k")._jdf.queryExecution() \
        .executedPlan().toString()
    # the only join is the broadcast of two 1-row sketch frames
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan


def test_misra_gries_guarantees_under_pressure(spark):
    # high-cardinality stream with 3 planted heavy tokens: the summary
    # must keep every token with freq > total_err, bound every surviving
    # count as lower <= exact <= upper, and respect err <= N/(k+1)
    import pyspark.sql.functions as F2

    n = 20_000
    df = spark.range(n).select(
        F2.when(F2.col("id") % 4 == 0,
                F2.concat(F2.lit("heavy_"), (F2.col("id") % 3).cast("string")))
        .otherwise(F2.concat(F2.lit("tail_"),
                             (F2.col("id") % 4999).cast("string")))
        .alias("token"))
    k = 16
    hh = {r["token"]: r for r in
          ST.heavy_hitters_mg(df, "token", n_counters=k).collect()}
    exact = {r["token"]: r["cnt"] for r in
             df.groupBy("token").agg(F2.count(F2.lit(1)).alias("cnt"))
             .collect()}
    terr = next(iter(hh.values()))
    terr = terr["upper"] - terr["lower"]
    assert 0 < terr <= n // (k + 1)  # pressure actually happened
    for tok, cnt in exact.items():
        if cnt > terr:
            assert tok in hh, tok
        if tok in hh:
            assert hh[tok]["lower"] <= cnt <= hh[tok]["upper"], tok
    for t in ("heavy_0", "heavy_1", "heavy_2"):
        assert t in hh


def test_trailing_line_terminator_bytes_pass_through(spark):
    # review finding: Java's $ matches BEFORE a final line terminator,
    # so a trailing U+0085 (the latin-1-decoded cp1252 ellipsis byte --
    # invalid UTF-8 alone) or U+2028 (> U+00FF) slipped past the
    # validity gate and CRASHED the strict decode. With the \\z anchor
    # these rows must pass through unchanged instead.
    rows = [(0, "it\u00e2\u0080\u0099s fine\u0085"),
            (1, "it\u00e2\u0080\u0099s fine\u2028"),
            (2, "it\u00e2\u0080\u0099s fine\u2029")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["repaired"] for r in R.repair_mojibake(df).collect()}
    for i, t in rows:
        assert out[i] == t, i
    # and a VALID mojibake string ending in a terminator still repairs:
    # the terminator is part of the mangled byte stream
    orig = "caf\u00e9 ok\n"
    mangled = orig.encode("utf-8").decode("latin-1")
    df2 = spark.createDataFrame([(0, mangled)], "doc_id long, text string")
    assert R.repair_mojibake(df2).first()["repaired"] == orig
