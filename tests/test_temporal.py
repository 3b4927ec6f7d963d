"""Tests for as-of join, range join, and tumbling-window rollups."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from themis_spark.operators import temporal as T


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


# ----------------------------------------------------------------- as-of

def _clicks_views(spark):
    clicks = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 2, _ts(5)), (4, 1, _ts(3))],
        "click_id long, user_id long, ts timestamp")
    views = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(25), 200.0), (3, _ts(1), 999.0)],
        "user_id long, ts timestamp, value double")
    return clicks, views


def test_asof_backward_match(spark):
    clicks, views = _clicks_views(spark)
    got = {r["click_id"]: r for r in
           T.asof_join(clicks, views, on="user_id").collect()}
    assert got[1]["value_r"] == 100.0   # ts=10 -> view at 5
    assert got[2]["value_r"] == 200.0   # ts=30 -> view at 25
    assert got[3]["value_r"] is None    # user 2 has no views
    assert got[4]["value_r"] is None    # ts=3 precedes first view at 5
    assert got[1]["matched_ts_us"] is not None


def test_asof_equal_ts_matches_inclusive(spark):
    left = spark.createDataFrame([(1, 1, _ts(5))],
                                 "id long, k long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(5), 7.0)],
                                  "k long, ts timestamp, value double")
    out = T.asof_join(left, right, on="k").collect()
    assert out[0]["value_r"] == 7.0


def test_asof_tolerance(spark):
    clicks, views = _clicks_views(spark)
    got = {r["click_id"]: r["value_r"] for r in T.asof_join(
        clicks, views, on="user_id",
        tolerance_us=4 * 60 * 1_000_000).collect()}
    assert got[2] is None   # view at 25 is 5 min before click at 30 > 4 min
    assert got[4] is None


def test_asof_null_payload_field_not_skipped(spark):
    # most recent right row has a NULL payload — must NOT fall back to
    # the older non-null row (struct carry, not per-column carry)
    left = spark.createDataFrame([(1, 1, _ts(10))],
                                 "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 5.0), (1, _ts(8), None)],
        "k long, ts timestamp, value double")
    out = T.asof_join(left, right, on="k").collect()
    assert out[0]["value_r"] is None
    assert out[0]["matched_ts_us"] is not None  # it DID match (the ts=8 row)


def test_asof_single_exchange_no_python(spark):
    clicks, views = _clicks_views(spark)
    plan = _plan(T.asof_join(clicks, views, on="user_id"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "SortMergeJoin" not in plan


# ------------------------------------------------------------ range join

def _bands(spark):
    return spark.createDataFrame(
        [(0, 100, "short"), (100, 1000, "medium"), (1000, 10**9, "long")],
        "lo long, hi long, band string")


def test_range_join_broadcast(spark):
    pts = spark.createDataFrame(
        [(1, 50), (2, 100), (3, 999), (4, 1000)], "id long, n long")
    out = {r["id"]: r["band"] for r in
           T.range_join(pts, _bands(spark), "n").collect()}
    assert out == {1: "short", 2: "medium", 3: "medium", 4: "long"}
    plan = _plan(T.range_join(pts, _bands(spark), "n"))
    assert "BroadcastNestedLoopJoin" in plan


def test_range_join_bucketed_same_result(spark):
    pts = spark.createDataFrame(
        [(i, i * 37 % 2000) for i in range(200)], "id long, n long")
    bands = _bands(spark)
    a = sorted((r["id"], r["band"]) for r in
               T.range_join(pts, bands, "n").collect())
    b = sorted((r["id"], r["band"]) for r in
               T.range_join(pts, bands, "n", bucket_width=64).collect())
    assert a == b and len(a) == 200
    plan = _plan(T.range_join(pts, bands, "n", bucket_width=64))
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_exclusive_hi_edge(spark):
    pts = spark.createDataFrame([(1, 128)], "id long, n long")
    bands = spark.createDataFrame([(0, 128, "a"), (128, 256, "b")],
                                  "lo long, hi long, band string")
    for kw in ({}, {"bucket_width": 128}):
        out = T.range_join(pts, bands, "n", **kw).collect()
        assert [r["band"] for r in out] == ["b"]


# -------------------------------------------------------------- tumbling

def test_tumbling_counts_and_boundaries(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "a"), (2, _ts(59), "a"), (3, _ts(60), "a"),
         (4, _ts(61), "b"), (5, None, "a")],
        "id long, ts timestamp, g string")
    out = {(r["window_start_us"], r["g"]): r["n_events"]
           for r in T.tumbling_agg(df, by=["g"]).collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    hour = 3600 * 1_000_000
    assert out[(base, "a")] == 2
    assert out[(base + hour, "a")] == 1
    assert out[(base + hour, "b")] == 1
    assert len(out) == 3  # NULL ts dropped


def test_tumbling_extra_aggs(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 10.0), (2, _ts(2), 30.0)],
        "id long, ts timestamp, v double")
    out = T.tumbling_agg(df, aggs=[F.sum("v").alias("sum_v")]).collect()
    assert len(out) == 1 and out[0]["sum_v"] == 40.0 and out[0]["n_events"] == 2
