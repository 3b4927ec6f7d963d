"""Tests for the round-2 training-data pipeline additions: Gopher-style
quality rules, repetition fractions, benchmark decontamination, and
heavy-hitter profiling — semantics on planted inputs plus the physical
properties that make each safe at web scale (no Python in the hot path,
broadcast where mandated, distributed top-k instead of a global sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from themis_spark.operators import dedup as D
from themis_spark.operators import stats as ST
from themis_spark.operators import text as X


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


GOOD = ("the quick brown fox jumps over the lazy dog and then it was "
        "time for all of us to walk home in the light rain that had "
        "started to fall softly on the quiet town streets while we "
        "talked about the long day and planned for tomorrow morning "
        "with coffee and bread and a little bit of hope")


# --------------------------------------------------------------- gopher rules

def test_gopher_pass_and_fail_rules(spark):
    rows = [
        (1, GOOD),                              # well-formed -> pass
        (2, "short text only"),                 # < 50 words
        (3, " ".join(["####"] * 60)),           # symbol ratio + no alpha
        (4, " ".join(["a"] * 60)),              # mean word len < 3
        (5, " ".join(["zzzz"] * 60)),           # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in df.select("doc_id", *X.gopher_quality_cols("text")).collect()
    }
    assert got[1]["gopher_pass"] == 1
    assert got[2]["gopher_pass"] == 0 and got[2]["n_words"] == 3
    assert got[3]["gopher_pass"] == 0 and got[3]["alpha_word_ratio"] == 0.0
    assert got[4]["gopher_pass"] == 0 and got[4]["mean_word_len"] == 1.0
    assert got[5]["gopher_pass"] == 0 and got[5]["stopword_hits"] == 0
    # symbol ratio counts # and ... per word
    assert got[3]["symbol_ratio"] > 0.1


def test_gopher_empty_text_is_defined(spark):
    df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    rows = df.select("doc_id", *X.gopher_quality_cols("text")).collect()
    for r in rows:
        assert r["n_words"] == 0 and r["gopher_pass"] == 0
        assert r["mean_word_len"] == 0.0 and r["alpha_word_ratio"] == 0.0


def test_gopher_is_pure_native(spark):
    df = spark.range(10).select(F.lit(GOOD).alias("text"))
    plan = _plan(df.select(*X.gopher_quality_cols("text")))
    assert "Python" not in plan and "MapInPandas" not in plan


# ---------------------------------------------------------------- repetition

def test_repetition_fractions(spark):
    rows = [
        (1, "a b c d e f g h"),          # all unique -> 0 everywhere
        (2, "x y x y x y x y"),          # heavy 2-token loop
        (3, ""),                          # defined on empty
        (4, "solo"),                      # shorter than any gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           df.select("doc_id", *X.repetition_cols("text")).collect()}
    assert got[1]["dup_word_frac"] == 0.0
    assert got[1]["dup_2gram_frac"] == 0.0
    # 8 tokens, 2 distinct -> 0.75; 7 bigrams, 2 distinct ("x y","y x")
    assert got[2]["dup_word_frac"] == 0.75
    assert round(got[2]["dup_2gram_frac"], 4) == round(1 - 2 / 7, 4)
    assert got[3]["dup_word_frac"] == 0.0 and got[3]["dup_3gram_frac"] == 0.0
    assert got[4]["dup_2gram_frac"] == 0.0


def test_ngrams_col_guards_short_docs(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    out = df.select(
        X.ngrams_col("text", 3).alias("g3"),
        X.ngrams_col("text", 2).alias("g2"),
    ).first()
    assert out["g3"] == [] and out["g2"] == ["a b"]


def test_df_forms_match_cols_forms(spark):
    """repetition_df / gopher_quality_df are the single-evaluation scan
    forms — values must equal the inline cols forms exactly."""
    rows = [(1, GOOD), (2, "x y x y x y"), (3, ""), (4, "## ... #")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(X.repetition_df(df).collect())
    b = sorted(df.select("doc_id", *X.repetition_cols("text")).collect())
    assert a == b
    c = sorted(X.gopher_quality_df(df).collect())
    d = sorted(df.select("doc_id", *X.gopher_quality_cols("text")).collect())
    assert c == d


def test_repetition_df_single_gram_build(spark):
    """The optimized plan must tokenize once and build grams via the
    shifted-zip form: no per-element lambda touches the tokenizer (the
    transform(sequence, slice)-form re-evaluates it per gram position —
    the HOF-lambda CSE gap), and the split expression appears exactly
    once (tokens materialize in the staged select; grams reference the
    attribute)."""
    df = spark.range(10).select(
        F.concat(F.lit(GOOD), F.col("id").cast("string")).alias("text"),
        F.col("id").alias("doc_id"))
    plan = X.repetition_df(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("transform(") == 0, plan
    assert plan.count("zip_with(") == 3, plan  # 1 (bigram) + 2 (trigram)
    assert plan.count("split(") == 1, plan


# ------------------------------------------------------------ decontamination

def test_contamination_hits_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string")
    docs = spark.createDataFrame([
        # contains the benchmark's first 8-gram verbatim
        (1, "xx alpha beta gamma delta epsilon zeta eta theta yy"),
        (2, "completely different words with no overlap at all here ok"),
        # 7-gram overlap only -> NOT contaminated at n=8
        (3, "alpha beta gamma delta epsilon zeta eta nope filler filler"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r["n_contaminated"] for r in
           D.contamination_hits(docs, bench, shingle_n=8).collect()}
    assert got == {1: 1}


def test_contamination_join_is_broadcast(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(GOOD).alias("text"))
    bench = docs.where(F.col("doc_id") < 3)
    plan = _plan(D.contamination_hits(docs, bench, shingle_n=8))
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "Python" not in plan


# -------------------------------------------------------------- heavy hitters

def test_frequent_values_ranks_and_ties(spark):
    df = spark.createDataFrame(
        [(v,) for v in ["b"] * 5 + ["a"] * 5 + ["c"] * 2 + ["d"]],
        "k string")
    got = ST.frequent_values(df, "k", k=3).collect()
    assert [(r["rank"], r["value"], r["cnt"]) for r in got] == [
        (1, "a", 5), (2, "b", 5), (3, "c", 2)]


def test_frequent_values_uses_distributed_topk(spark):
    df = spark.range(10000).select((F.col("id") % 97).alias("v"))
    plan = _plan(ST.frequent_values(df, "v", k=5))
    # TakeOrderedAndProject = per-task k-row heaps, no global Sort of
    # the full distinct-value set
    assert "TakeOrderedAndProject" in plan, plan[:800]


# ------------------------------------------------------ functional deps

def test_fd_violations(spark):
    from themis_spark.operators.constraints import fd_violations
    df = spark.createDataFrame(
        [("a.com", "en"), ("a.com", "en"), ("b.com", "en"), ("b.com", "de"),
         ("c.com", None), ("c.com", "fr"), (None, "en")],
        "domain string, lang string")
    got = {r["domain"]: (r["n_rhs"], r["n_rows"])
           for r in fd_violations(df, "domain", "lang").collect()}
    # b.com violates (en+de); c.com does NOT (null ignored); a.com holds
    assert got == {"b.com": (2, 2)}


def test_fd_violations_multi_lhs(spark):
    from themis_spark.operators.constraints import fd_violations
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y"), ("a", 2, "x")],
        "s string, v long, out string")
    got = fd_violations(df, ["s", "v"], "out").collect()
    assert len(got) == 1 and got[0]["s"] == "a" and got[0]["v"] == 1


def test_filter_funnel_first_fail_attribution(spark):
    """Each row is charged to the FIRST failing rule; NULL rule results
    fail; n_in chains stage to stage."""
    from pyspark.sql import functions as F
    from themis_spark.operators.text import apply_filters, filter_funnel

    df = spark.createDataFrame(
        [(1, 10, "en"), (2, 10, "zz"),   # both fail rule 0 (len>=20)
         (3, 30, "zz"),                  # passes 0, fails 1
         (4, 30, None),                  # NULL lang -> fails 1
         (5, 30, "en")],                 # survives
        "id long, n long, lang string")
    rules = [("long_enough", F.col("n") >= 20),
             ("lang_known", F.col("lang") == "en")]
    rows = {r["rule"]: r for r in filter_funnel(df, rules).collect()}
    assert rows["long_enough"]["n_in"] == 5
    assert rows["long_enough"]["n_dropped"] == 2
    assert rows["lang_known"]["n_in"] == 3
    assert rows["lang_known"]["n_dropped"] == 2
    assert rows["lang_known"]["n_out"] == 1
    kept = [r["id"] for r in apply_filters(df, rules).collect()]
    assert kept == [5]
