"""Tests for gap-based sessionization and the corpus vocabulary op."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from themis_spark.operators import sessions as SS
from themis_spark.operators import text as X


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


def test_sessionize_gap_boundaries(spark):
    # user 1: events at 0, 10, 20 (one session), then 60 (new: gap 40 > 30),
    # then 80 (same); user 2: single event
    rows = [
        (1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(20)),
        (4, 1, _ts(60)), (5, 1, _ts(80)),
        (6, 2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["event_id"]: r["session_seq"]
           for r in SS.sessionize(df, gap_minutes=30).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1}


def test_sessionize_exact_gap_is_same_session(spark):
    # gap strictly greater than threshold starts a session; == stays
    rows = [(1, 1, _ts(0)), (2, 1, _ts(30)), (3, 1, _ts(60.0001))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["event_id"]: r["session_seq"]
           for r in SS.sessionize(df, gap_minutes=30).collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_session_stats_rollup(spark):
    rows = [
        (1, 1, _ts(0), "view"), (2, 1, _ts(10), "click"),
        (3, 1, _ts(60), "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = {(r["user_id"], r["session_seq"]): r
           for r in SS.session_stats(df, gap_minutes=30,
                                     event_type="event_type").collect()}
    s1 = out[(1, 1)]
    assert s1["n_events"] == 2 and s1["n_event_types"] == 2
    assert s1["duration_us"] == 10 * 60 * 1_000_000
    s2 = out[(1, 2)]
    assert s2["n_events"] == 1 and s2["duration_us"] == 0


def test_sessionize_drops_null_user_or_ts(spark):
    rows = [(1, None, _ts(0)), (2, 1, None), (3, 1, _ts(0))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    assert SS.sessionize(df).count() == 1


def test_sessionize_single_window_exchange(spark):
    rows = [(i, i % 3, _ts(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    plan = _plan(SS.sessionize(df))
    # both windows share one partitioning: exactly one exchange, one Window
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocabulary_counts_and_order(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, "the cat runs"), (3, None)],
        "doc_id long, text string")
    rows = X.vocabulary(df, k=3).collect()
    assert [r["token"] for r in rows] == ["the", "cat", "and"]
    assert rows[0]["tf"] == 3 and rows[0]["df"] == 2
    assert rows[1]["tf"] == 2 and rows[1]["df"] == 2
    assert rows[2]["tf"] == 1 and rows[2]["df"] == 1  # 'and' before 'hat'/'runs'


def test_vocabulary_topk_no_global_sort(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i % 5} common words") for i in range(50)],
        "doc_id long, text string")
    plan = _plan(X.vocabulary(df, k=2))
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------- funnel

def test_funnel_stages(spark):
    rows = [
        # user 1 completes view(0) -> click(10) -> purchase(20)
        (1, 1, _ts(0), "view"), (2, 1, _ts(10), "click"),
        (3, 1, _ts(20), "purchase"),
        # user 2: click BEFORE any view never counts; view(5)->click(8)
        (4, 2, _ts(1), "click"), (5, 2, _ts(5), "view"),
        (6, 2, _ts(8), "click"),
        # user 3: only purchase -> stage 0
        (7, 3, _ts(2), "purchase"),
        # user 4: view then SAME-microsecond click -> strict > excludes
        (8, 4, _ts(3), "view"), (9, 4, _ts(3), "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: r for r in
           SS.funnel(df, ["view", "click", "purchase"]).collect()}
    assert got[1]["stage"] == 3
    assert got[1]["reach_1_us"] < got[1]["reach_2_us"] < got[1]["reach_3_us"]
    assert got[2]["stage"] == 2 and got[2]["reach_3_us"] is None
    assert got[3]["stage"] == 0 and got[3]["reach_1_us"] is None
    assert got[4]["stage"] == 1  # same-us click does not advance


def test_funnel_single_exchange_no_python(spark):
    rows = [(i, i % 3, _ts(i), "view") for i in range(30)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    plan = _plan(SS.funnel(df, ["view", "click"]))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_funnel_empty_steps_raises(spark):
    import pytest as _pt
    df = spark.createDataFrame([], "event_id long, user_id long, ts timestamp, event_type string")
    with _pt.raises(ValueError):
        SS.funnel(df, [])
