"""Tests for the round-2 additions: PII detection/redaction, URL
canonicalization + canonical-URL dedup, Tukey-fence outlier stats, and
signature-verified MinHash-LSH pairs — semantics on planted inputs plus
the physical properties (no Python in the hot path, broadcast bounds
join, single-exchange verified LSH) that make each safe at web scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from themis_spark.operators import dedup as D
from themis_spark.operators import pii as P
from themis_spark.operators import stats as ST
from themis_spark.operators import web as W


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------ PII

PII_TEXT = (
    "reach me at jane.doe+spam@mail.example.com or 555-010-1234, "
    "server 10.0.0.1, ssn 123-45-6789, card 4111 1111 1111 1111"
)


def test_pii_counts_per_kind(spark):
    df = spark.createDataFrame([(1, PII_TEXT), (2, "no pii here at all")],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r for r in P.pii_flags(df).collect()}
    hit = rows[1]
    assert hit["n_email"] == 1
    assert hit["n_phone"] == 1
    assert hit["n_ipv4"] == 1
    assert hit["n_ssn"] == 1
    assert hit["n_ccn"] == 1
    assert hit["has_pii"] is True
    clean = rows[2]
    assert clean["has_pii"] is False
    assert all(clean[f"n_{k}"] == 0 for k in P.PII_PATTERNS)


def test_pii_redaction_replaces_every_match(spark):
    df = spark.createDataFrame([(1, PII_TEXT)], "doc_id long, text string")
    row = P.redact(df).collect()[0]
    out = row["clean_text"]
    assert "<EMAIL>" in out and "<PHONE>" in out and "<IPV4>" in out
    assert "<SSN>" in out and "<CCN>" in out
    assert "@" not in out and "4111" not in out and "10.0.0.1" not in out
    assert row["n_redacted"] == 5


def test_pii_specificity_order_no_double_redaction(spark):
    # an SSN-shaped string must become exactly one <SSN>, not a <PHONE>
    # remnant; a card must not decay into two phone-ish fragments
    df = spark.createDataFrame(
        [(1, "id 123-45-6789 end"), (2, "pay 4111-1111-1111-1111 now")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"] for r in P.redact(df).collect()}
    assert got[1] == "id <SSN> end"
    assert got[2] == "pay <CCN> now"


def test_pii_stats_corpus_rollup(spark):
    df = spark.createDataFrame(
        [(1, PII_TEXT), (2, "x@example.org wrote"), (3, "nothing")],
        "doc_id long, text string")
    row = P.pii_stats(df).collect()[0]
    assert row["total_email"] == 2
    assert row["docs_with_pii"] == 2
    assert row["n_docs"] == 3
    assert abs(row["pii_doc_frac"] - 2 / 3) < 1e-6


def test_pii_plan_is_native(spark):
    df = spark.createDataFrame([(1, PII_TEXT)], "doc_id long, text string")
    plan = _plan(P.pii_flags(df))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------ URL canonicalization

def test_canonical_url_rules(spark):
    cases = [
        # fragment dropped
        ("https://a.example.com/p#sec", "https://a.example.com/p"),
        # host lowercased, path case preserved
        ("HTTPS://A.Example.COM/Path", "https://a.example.com/Path"),
        # default ports dropped
        ("http://a.example.com:80/p", "http://a.example.com/p"),
        ("https://a.example.com:443/p", "https://a.example.com/p"),
        # non-default port kept
        ("https://a.example.com:8443/p", "https://a.example.com:8443/p"),
        # trailing slash dropped (root too)
        ("https://a.example.com/", "https://a.example.com"),
        ("https://a.example.com/p/", "https://a.example.com/p"),
        # tracking params dropped, others kept in order
        ("https://a.example.com/p?utm_source=x&id=1&gclid=z&q=2",
         "https://a.example.com/p?id=1&q=2"),
        # all params tracking -> '?' dropped entirely
        ("https://a.example.com/p?utm_campaign=x&fbclid=y",
         "https://a.example.com/p"),
        # ref is tracking; pref is not (anchored prefix match)
        ("https://a.example.com/p?ref=rss&pref=1",
         "https://a.example.com/p?pref=1"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", W.canonical_url_col("url").alias("c")).collect()}
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, f"{raw!r}: got {got[i]!r}, want {want!r}"


def test_canonical_duplicates_groups_variants(spark):
    variants = [
        "https://Site.Example.com/page?utm_source=a",
        "https://site.example.com/page/",
        "https://site.example.com:443/page#top",
    ]
    rows = [(i, u) for i, u in enumerate(variants)]
    rows += [(10, "https://other.example.com/x")]
    df = spark.createDataFrame(rows, "i long, url string")
    out = W.canonical_duplicates(df, "url").collect()
    assert len(out) == 1
    assert out[0]["canonical_url"] == "https://site.example.com/page"
    assert out[0]["n_variants"] == 3 and out[0]["n_rows"] == 3


def test_canonical_plan_is_native(spark):
    df = spark.createDataFrame([(1, "https://a.example.com/")], "i long, url string")
    plan = _plan(df.select(W.canonical_url_col("url")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------ outlier stats

def test_outlier_stats_exact_tukey(spark):
    # 1..100 plus two planted outliers; q1=25.75, q3=75.25 (interpolated
    # over 102 values), fences at q1-1.5*iqr / q3+1.5*iqr
    vals = list(range(1, 101)) + [10_000, -10_000]
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               "i long, v double")
    row = ST.outlier_stats(df, "v", exact=True).collect()[0]
    assert row["n_rows"] == 102
    assert row["n_low"] == 1 and row["n_high"] == 1 and row["n_outliers"] == 2
    assert row["lo"] < 1 and row["hi"] > 100


def test_outlier_rows_and_groups(spark):
    rows = [(i, "a", float(i % 10)) for i in range(100)]
    rows += [(100, "a", 1e6), (101, "b", 5.0)]
    df = spark.createDataFrame(rows, "k long, g string, v double")
    out = ST.outlier_rows(df, "v", key="k", by=["g"], exact=True).collect()
    assert [r["k"] for r in out] == [100]
    stats = {r["g"]: r for r in
             ST.outlier_stats(df, "v", by=["g"], exact=True).collect()}
    assert stats["a"]["n_outliers"] == 1
    assert stats["b"]["n_outliers"] == 0


def test_outlier_bounds_join_is_broadcast(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(50)],
                               "k long, v double")
    plan = _plan(ST.outlier_stats(df, "v", exact=True))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------- verified MinHash-LSH

def test_lsh_verified_pairs_scores_and_filters(spark):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    near = base + " extra"
    far = ("one two three four five six seven eight nine ten eleven "
           "twelve thirteen fourteen fifteen sixteen")
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)],
        "doc_id long, text string")
    out = D.lsh_verified_pairs(df, num_hashes=12, bands=6, threshold=0.5)
    rows = {(r["a_key"], r["b_key"]): r["est_jaccard"] for r in out.collect()}
    assert rows[(1, 4)] == 1.0            # identical docs agree everywhere
    assert (1, 2) in rows and rows[(1, 2)] >= 0.5
    assert all(3 not in pair for pair in rows)


def test_lsh_verified_matches_candidates_at_zero_threshold(spark):
    docs = [(i, f"doc {i % 7} shared shingle text body common words here "
                f"padding {i % 3}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cand = set(map(tuple, D.lsh_candidate_pairs(
        df, num_hashes=12, bands=6).collect()))
    ver = D.lsh_verified_pairs(df, num_hashes=12, bands=6, threshold=0.0)
    got = {(r["a_key"], r["b_key"]) for r in ver.collect()}
    assert got == cand


def test_lsh_verified_single_exchange(spark):
    df = spark.createDataFrame(
        [(i, f"words {i} common base text") for i in range(20)],
        "doc_id long, text string")
    plan = _plan(D.lsh_verified_pairs(df, num_hashes=8, bands=4))
    # one bucket exchange + the distinct's exchange — the corpus is
    # never re-joined for verification
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# ------------------------------------------------------------ winsorize

def test_clip_outliers_values(spark):
    from themis_spark.operators.stats import clip_outliers
    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 100])]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r["id"]: r for r in
           clip_outliers(df, "v", by=["g"], exact=True).collect()}
    # q1=2, q3=4, iqr=2 -> fences [-1, 7]: only 100 clips (to 7.0)
    assert out[4]["v_clipped"] == 7.0 and out[4]["v_was_clipped"]
    assert out[0]["v_clipped"] == 1.0 and not out[0]["v_was_clipped"]
    assert out[4]["v"] == 100.0  # original untouched


def test_clip_outliers_null_and_plan(spark):
    from themis_spark.operators.stats import clip_outliers
    rows = [(1, "a", 1.0), (2, "a", 2.0), (3, "a", None)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    res = clip_outliers(df, "v", by=["g"], exact=True)
    out = {r["id"]: r for r in res.collect()}
    assert out[3]["v_clipped"] is None and not out[3]["v_was_clipped"]
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BatchEvalPython" not in plan
