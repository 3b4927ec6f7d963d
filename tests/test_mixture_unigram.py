"""Tests for unigram LM scoring, mixture planning/sampling, and
schema-profile drift diff."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from themis_spark.operators import stats as ST
from themis_spark.operators import text as X
from themis_spark.plans.infer import json_path_profile, profile_diff


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- unigram

def test_unigram_logprob_hand_computed(spark):
    # corpus: a:2, b:2, c:1, total=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, None)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in X.unigram_logprob(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_tokens"] == 3
    assert got[1]["mean_logprob"] == pytest.approx(math.log(2 / 5), abs=1e-6)
    assert got[2]["n_tokens"] == 2
    expect2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert got[2]["mean_logprob"] == pytest.approx(expect2, abs=1e-6)


def test_unigram_rare_tokens_score_lower(spark):
    rows = [(i, "common words repeated here") for i in range(20)]
    rows.append((99, "zxqv jkwp bbnm qqrr"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["mean_logprob"]
           for r in X.unigram_logprob(df).collect()}
    assert out[99] < out[0]


def test_unigram_no_python_in_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = _plan(X.unigram_logprob(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- mixture

def _docs(spark):
    # lang a: 10 docs x 100 chars; lang b: 5 docs x 100; lang c: 2 x 100
    rows = [(i, "a", 100) for i in range(10)]
    rows += [(100 + i, "b", 100) for i in range(5)]
    rows += [(200 + i, "c", 100) for i in range(2)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def test_mixture_plan_targets_and_rates(spark):
    d = _docs(spark)
    plan = {r["lang"]: r for r in ST.mixture_plan(
        d, "lang", {"a": 1, "b": 1}, budget=600, size_col="n_chars").collect()}
    assert set(plan) == {"a", "b"}  # 'c' not in parts -> excluded
    assert plan["a"]["avail"] == 1000 and plan["a"]["target"] == 300
    assert plan["a"]["rate_ppm"] == 300_000
    assert plan["b"]["avail"] == 500 and plan["b"]["target"] == 300
    # target > avail -> capped at 1e6 (take everything)
    assert plan["b"]["rate_ppm"] == 600_000


def test_mixture_plan_rate_caps_at_one(spark):
    d = _docs(spark)
    plan = {r["lang"]: r for r in ST.mixture_plan(
        d, "lang", {"c": 1}, budget=10_000, size_col="n_chars").collect()}
    assert plan["c"]["avail"] == 200
    assert plan["c"]["rate_ppm"] == 1_000_000


def test_mixture_plan_rows_mode_and_bad_parts(spark):
    d = _docs(spark)
    plan = {r["lang"]: r for r in ST.mixture_plan(
        d, "lang", {"a": 3, "b": 1}, budget=8).collect()}
    assert plan["a"]["avail"] == 10 and plan["a"]["target"] == 6
    assert plan["b"]["target"] == 2
    with pytest.raises(ValueError):
        ST.mixture_plan(d, "lang", {}, budget=8)


def test_mixture_take_deterministic_and_bounded(spark):
    d = _docs(spark)
    plan = ST.mixture_plan(d, "lang", {"a": 1, "b": 1}, budget=1200,
                           size_col="n_chars")
    take1 = sorted(r["doc_id"] for r in
                   ST.mixture_take(d, plan, "lang", "doc_id").collect())
    take2 = sorted(r["doc_id"] for r in
                   ST.mixture_take(d, plan, "lang", "doc_id").collect())
    assert take1 == take2 and len(take1) > 0
    # full-rate plan keeps every row of planned strata
    full = ST.mixture_plan(d, "lang", {"a": 1, "b": 1}, budget=10**9,
                           size_col="n_chars")
    assert ST.mixture_take(d, full, "lang", "doc_id").count() == 15


def test_mixture_take_no_corpus_shuffle(spark):
    d = _docs(spark)
    plan = ST.mixture_plan(d, "lang", {"a": 1}, budget=500, size_col="n_chars")
    p = _plan(ST.mixture_take(d, plan, "lang", "doc_id"))
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


# ------------------------------------------------------------ profile diff

def test_profile_diff_statuses(spark):
    base = spark.createDataFrame(
        [("$", "object", 10, 0), ("$.a", "integer", 10, 0),
         ("$.gone", "string", 4, 0), ("$.t", "integer", 9, 0)],
        "path string, jtype string, n_present long, n_null long")
    cur = spark.createDataFrame(
        [("$", "object", 12, 0), ("$.a", "integer", 12, 0),
         ("$.new", "boolean", 3, 0), ("$.t", "string", 11, 0)],
        "path string, jtype string, n_present long, n_null long")
    got = {r["path"]: r for r in profile_diff(base, cur).collect()}
    assert got["$.a"]["status"] == "unchanged"
    assert got["$.gone"]["status"] == "removed"
    assert got["$.new"]["status"] == "added"
    assert got["$.t"]["status"] == "type_changed"
    assert got["$.t"]["base_jtype"] == "integer"
    assert got["$.t"]["cur_jtype"] == "string"
    assert got["$.new"]["base_present"] is None
    assert got["$.new"]["cur_present"] == 3


def test_profile_diff_end_to_end_via_variant(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    base = json_path_profile(
        df.select(F.to_json(F.struct("doc_id")).alias("j")), "j")
    cur = json_path_profile(
        df.select(F.to_json(F.struct(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.lit(True).alias("flag"))).alias("j")), "j")
    got = {r["path"]: r["status"] for r in profile_diff(base, cur).collect()}
    assert got["$.doc_id"] == "type_changed"
    assert got["$.flag"] == "added"
    assert got["$"] == "unchanged"


# ------------------------------------------------------------ group sample

def test_group_sample_exact_k_and_deterministic(spark):
    rows = [(i, "a" if i < 40 else "b") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s1 = sorted(r["doc_id"] for r in
                ST.group_sample(df, "lang", 5, "doc_id").collect())
    s2 = sorted(r["doc_id"] for r in
                ST.group_sample(df, "lang", 5, "doc_id").collect())
    assert s1 == s2 and len(s1) == 10
    by_lang = {}
    for r in ST.group_sample(df, "lang", 5, "doc_id").collect():
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_lang["a"]) == 5 and len(by_lang["b"]) == 5


def test_group_sample_small_group_keeps_all(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, None)],
                               "doc_id long, lang string")
    out = ST.group_sample(df, "lang", 10, "doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]  # null group dropped


def test_group_sample_seed_changes_selection(spark):
    rows = [(i, "a") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = {r["doc_id"] for r in ST.group_sample(df, "lang", 20, "doc_id", seed=1).collect()}
    b = {r["doc_id"] for r in ST.group_sample(df, "lang", 20, "doc_id", seed=2).collect()}
    assert a != b and len(a) == len(b) == 20


def test_group_sample_window_group_limit_plan(spark):
    df = spark.createDataFrame([(i, "a") for i in range(100)],
                               "doc_id long, lang string")
    plan = _plan(ST.group_sample(df, "lang", 3, "doc_id"))
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan


# ----------------------------------------------------------------- tf-idf

def test_tfidf_top_terms_hand_computed(spark):
    import math
    # doc 1: "apple apple pie", doc 2: "pie crust", doc 3: "banana split"
    # N=3; df: apple 1, pie 2, crust 1, banana 1, split 1
    df = spark.createDataFrame(
        [(1, "apple apple pie"), (2, "pie crust"), (3, "banana split")],
        "doc_id long, text string")
    got = {(r["doc_id"], r["rank"]): r for r in
           X.tfidf_top_terms(df, k=2).collect()}
    assert got[(1, 1)]["token"] == "apple"
    assert got[(1, 1)]["score"] == pytest.approx(2 * math.log(3 / 1), abs=1e-6)
    assert got[(1, 2)]["token"] == "pie"
    assert got[(1, 2)]["score"] == pytest.approx(1 * math.log(3 / 2), abs=1e-6)
    # doc 2 ties crust(ln3) > pie(ln1.5); doc 3 ties banana/split on token asc
    assert got[(2, 1)]["token"] == "crust"
    assert got[(3, 1)]["token"] == "banana"
    assert got[(3, 2)]["token"] == "split"


def test_tfidf_no_python_no_cartesian(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b c")],
                               "doc_id long, text string")
    plan = _plan(X.tfidf_top_terms(df))
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


# -------------------------------------------------------------- key skew

def test_key_skew_report_values(spark):
    rows = [(i, "hot") for i in range(80)] + [(100 + i, f"k{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, key string")
    r = ST.key_skew_report(df, "key", k=3).collect()[0]
    assert r["n_rows"] == 100 and r["n_keys"] == 21
    assert r["max_cnt"] == 80
    assert r["top1_share_ppm"] == 800_000
    assert r["topk_share_ppm"] == 820_000  # hot(80) + two singletons


def test_key_skew_report_null_keys_ignored(spark):
    df = spark.createDataFrame([(1, None), (2, "a"), (3, "a")],
                               "id long, key string")
    r = ST.key_skew_report(df, "key").collect()[0]
    assert r["n_rows"] == 2 and r["n_keys"] == 1
    assert r["top1_share_ppm"] == 1_000_000


def test_key_skew_plan_top_k_no_global_sort(spark):
    df = spark.createDataFrame([(i, f"k{i % 7}") for i in range(70)],
                               "id long, key string")
    plan = _plan(ST.key_skew_report(df, "key"))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


# ------------------------------------------------------------ vocab drift

def test_vocab_drift_detects_shift(spark):
    base = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)],
        "doc_id long, text string")
    cur = spark.createDataFrame(
        [(i, "alpha alpha spamword") for i in range(10)],
        "doc_id long, text string")
    got = {r["token"]: r for r in X.vocab_drift(base, cur, k=3).collect()}
    assert set(got) == {"alpha", "beta", "gamma"}
    # beta/gamma vanished -> large positive contribution; alpha grew
    assert got["beta"]["psi_contrib"] > 1.0
    assert got["beta"]["p_cur"] == 0.0  # eps floor rounds away at 6 dp
    assert got["alpha"]["p_cur"] > got["alpha"]["p_base"]
    assert got["alpha"]["psi_contrib"] > 0  # (p-q)ln(p/q) >= 0 always


def test_vocab_drift_identical_slices_zero(spark):
    df = spark.createDataFrame(
        [(i, "one two three") for i in range(5)], "doc_id long, text string")
    got = X.vocab_drift(df, df, k=3).collect()
    assert all(abs(r["psi_contrib"]) < 1e-6 for r in got)
    assert all(r["p_base"] == r["p_cur"] for r in got)


# ------------------------------------------------------------- correlation

def test_correlation_matrix_values(spark):
    import pytest as _pt
    # y = 2x (corr 1); z = -x (corr -1); w independent-ish
    rows = [(float(i), 2.0 * i, -float(i), float((i * 7) % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double, z double, w double")
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in ST.correlation_matrix(df, ["x", "y", "z", "w"]).collect()}
    assert len(got) == 6
    assert got[("x", "y")] == _pt.approx(1.0, abs=1e-6)
    assert got[("x", "z")] == _pt.approx(-1.0, abs=1e-6)
    assert abs(got[("x", "w")]) < 0.5


def test_correlation_matrix_requires_two(spark):
    import pytest as _pt
    df = spark.createDataFrame([(1.0,)], "x double")
    with _pt.raises(ValueError):
        ST.correlation_matrix(df, ["x"])
