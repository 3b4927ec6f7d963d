"""Tests for the round-2 web-pipeline additions: URL feature extraction,
per-domain profiling, corpus-level (CCNet-style) line dedup, and
deterministic stratified sampling — semantics on planted inputs plus the
physical properties (native scan-stage expressions, broadcast set, zero
corpus shuffle) that make them web-scale-safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from themis_spark.operators import dedup as D
from themis_spark.operators import stats as ST
from themis_spark.operators import web as W


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ----------------------------------------------------------------- url parts

def test_url_features_parse(spark):
    rows = [
        (1, "https://news.example.co.uk/world/europe/story?id=7&ref=rss#top"),
        (2, "http://example.com/"),
        (3, "https://a.b.example.org"),
        (4, "ftp://files.example.net/pub/data.bin"),
        (5, "https://localhost"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r["id"]: r for r in df.select("id", *W.url_features_cols("url")).collect()}

    assert got[1]["scheme"] == "https"
    assert got[1]["host"] == "news.example.co.uk"
    assert got[1]["registered_domain"] == "co.uk"  # last-2-label heuristic
    assert got[1]["tld"] == "uk"
    assert got[1]["path_depth"] == 3
    assert got[1]["n_query_params"] == 2

    assert got[2]["path_depth"] == 0 and got[2]["n_query_params"] == 0
    assert got[3]["registered_domain"] == "example.org"
    assert got[4]["scheme"] == "ftp" and got[4]["path_depth"] == 2
    assert got[5]["registered_domain"] == "localhost" and got[5]["tld"] == "localhost"


def test_url_features_native(spark):
    df = spark.createDataFrame([(1, "https://example.com/a")], "id long, url string")
    plan = _plan(df.select(*W.url_features_cols("url")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # scan-stage projection only


def test_domain_stats(spark):
    rows = [
        (f"https://{h}/p{i}", 100 + i, lang)
        for i, (h, lang) in enumerate(
            [("a.example.com", "en"), ("b.example.com", "de"),
             ("a.example.com", "en"), ("only.other.org", "fr")]
        )
    ]
    df = spark.createDataFrame(rows, "url string, n_chars long, lang string")
    got = {r["registered_domain"]: r
           for r in W.domain_stats(df, "url", n_chars="n_chars", lang="lang").collect()}
    assert got["example.com"]["n_pages"] == 3
    assert got["example.com"]["n_hosts"] == 2
    assert got["example.com"]["n_langs"] == 2
    assert got["other.org"]["n_pages"] == 1
    assert abs(got["other.org"]["avg_chars"] - 103.0) < 1e-9


# ------------------------------------------------------------ line-level dedup

BOILER = "subscribe to our newsletter"
BOILER2 = "all rights reserved"


def _line_docs(spark):
    rows = [
        (1, f"unique opening one\n{BOILER}\nreal content alpha\n{BOILER2}"),
        (2, f"{BOILER}\nreal content beta\n{BOILER2}"),
        (3, f"real content gamma\n{BOILER}\n\n  \n{BOILER2}"),
        (4, "entirely unique document with no boilerplate at all"),
        (5, f"{BOILER}"),  # document that is ONLY boilerplate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_common_line_hashes_document_frequency(spark):
    df = _line_docs(spark)
    common = D.common_line_hashes(df, min_docs=3)
    rows = common.collect()
    # BOILER appears in 4 docs, BOILER2 in 3 — both pass min_docs=3;
    # every content line appears once.
    assert len(rows) == 2
    assert all(r["n_docs"] >= 3 for r in rows)
    # occurrence-vs-document frequency: a line repeated WITHIN one doc
    # counts once
    df2 = spark.createDataFrame(
        [(1, "x\nx\nx"), (2, "y")], "doc_id long, text string")
    assert D.common_line_hashes(df2, min_docs=2).count() == 0


def test_common_line_hashes_frac_threshold(spark):
    df = _line_docs(spark)  # 5 docs; frac 0.7 -> ceil(3.5) = 4 docs
    rows = D.common_line_hashes(df, min_doc_frac=0.7).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 4  # only BOILER


def test_remove_common_lines(spark):
    df = _line_docs(spark)
    common = D.common_line_hashes(df, min_docs=3)
    got = {r["doc_id"]: r
           for r in D.remove_common_lines(df, common).collect()}
    assert got[1]["clean_text"] == "unique opening one\nreal content alpha"
    assert got[1]["n_removed"] == 2 and got[1]["n_lines"] == 4
    assert got[2]["clean_text"] == "real content beta"
    assert got[3]["clean_text"] == "real content gamma"
    assert got[3]["n_lines"] == 3  # blank/whitespace lines never counted
    assert got[4]["n_removed"] == 0
    assert got[5]["clean_text"] == "" and got[5]["n_removed"] == 1


def test_remove_common_lines_is_broadcast_no_corpus_shuffle(spark):
    df = _line_docs(spark)
    common = D.common_line_hashes(df, min_docs=3)
    plan = _plan(D.remove_common_lines(df, common))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the only Exchange is inside the tiny common-line aggregation, never
    # keyed by doc — the corpus rows themselves are cleaned map-side
    assert "Exchange hashpartitioning(doc_id" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------- stratified sampling

def test_stratified_sample_rates_and_determinism(spark):
    n = 20000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
         .when(F.col("id") % 3 == 1, "de")
         .otherwise("fr").alias("lang"),
    )
    rates = {"en": 0.5, "de": 0.1}
    s1 = ST.stratified_sample(df, "lang", rates, key="doc_id", seed=7)
    s2 = ST.stratified_sample(df, "lang", rates, key="doc_id", seed=7)
    rows1 = sorted(r["doc_id"] for r in s1.collect())
    rows2 = sorted(r["doc_id"] for r in s2.collect())
    assert rows1 == rows2  # fully deterministic

    by_lang = {r["lang"]: r["cnt"]
               for r in s1.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert abs(by_lang["en"] / (n / 3) - 0.5) < 0.05
    assert abs(by_lang["de"] / (n / 3) - 0.1) < 0.03
    assert "fr" not in by_lang  # default_rate = 0.0

    other_seed = sorted(
        r["doc_id"]
        for r in ST.stratified_sample(df, "lang", rates, key="doc_id", seed=8).collect()
    )
    assert other_seed != rows1  # seed actually participates


def test_stratified_sample_exact_bounds_and_native(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    assert ST.stratified_sample(df, "lang", {"en": 1.0}, key="doc_id").count() == 500
    assert ST.stratified_sample(df, "lang", {"en": 0.0}, key="doc_id").count() == 0
    kept = ST.stratified_sample(df, "lang", {}, key="doc_id", default_rate=1.0)
    assert kept.count() == 500
    plan = _plan(ST.stratified_sample(df, "lang", {"en": 0.5}, key="doc_id"))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------------- grouped top-k pages

def test_top_pages_per_domain(spark):
    rows = []
    for d in ("aaa.com", "bbb.org"):
        for i in range(5):
            rows.append((f"https://www.{d}/p{i}", float(i)))
    df = spark.createDataFrame(rows, "url string, quality double")
    got = W.top_pages_per_domain(df, "url", "quality", k=2).collect()
    by_dom = {}
    for r in got:
        by_dom.setdefault(r["registered_domain"], []).append((r["rank"], r["url"]))
    assert len(got) == 4
    assert sorted(by_dom["aaa.com"]) == [
        (1, "https://www.aaa.com/p4"), (2, "https://www.aaa.com/p3")]
    # deterministic tie-break on url
    tie = spark.createDataFrame(
        [("https://t.com/b", 1.0), ("https://t.com/a", 1.0)], "url string, quality double")
    top1 = W.top_pages_per_domain(tie, "url", "quality", k=1).collect()
    assert top1[0]["url"] == "https://t.com/a"


def test_top_pages_uses_window_group_limit(spark):
    df = spark.createDataFrame(
        [("https://x.com/a", 1.0)], "url string, quality double")
    plan = _plan(W.top_pages_per_domain(df, "url", "quality", k=3))
    assert "WindowGroupLimit" in plan  # per-task top-k before the exchange


# ------------------------------------------------------ constraint discovery

def test_suggest_constraints_exact(spark):
    rows = [(i, f"u{i}", "en" if i % 2 else "de", None if i % 3 == 0 else i * 2)
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, key string, lang string, v long")
    got = {r["column"]: r
           for r in ST.suggest_constraints(df, ["id", "key", "lang", "v"],
                                           exact=True).collect()}
    assert got["id"]["unique_candidate"] and got["id"]["not_null_candidate"]
    assert got["key"]["unique_candidate"]
    assert got["lang"]["enum_candidate"] and got["lang"]["n_distinct"] == 2
    assert not got["lang"]["unique_candidate"]
    assert not got["v"]["not_null_candidate"] and got["v"]["n_nulls"] == 20
    assert got["v"]["unique_candidate"]  # distinct among non-null
    assert got["id"]["min_v"] == "0" and got["id"]["max_v"] == "59"


def test_suggest_constraints_hll_band(spark):
    df = spark.range(5000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"))
    got = {r["column"]: r
           for r in ST.suggest_constraints(df, ["id", "bucket"]).collect()}
    assert got["id"]["unique_candidate"]          # HLL within the 2% band
    assert not got["bucket"]["unique_candidate"]
    assert got["bucket"]["enum_candidate"]
    plan = _plan(ST.suggest_constraints(df, ["id"]))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_remove_common_lines_join_strategy_matches_map(spark):
    df = _line_docs(spark)
    common = D.common_line_hashes(df, min_docs=3)
    m = {r["doc_id"]: r for r in
         D.remove_common_lines(df, common, strategy="map").collect()}
    got = D.remove_common_lines(df, common, strategy="join")
    j = {r["doc_id"]: r for r in got.collect()}
    assert set(m) == set(j)
    for k in m:
        assert (m[k]["clean_text"], m[k]["n_lines"], m[k]["n_removed"]) == \
               (j[k]["clean_text"], j[k]["n_lines"], j[k]["n_removed"]), k
    plan = _plan(got)
    assert "BroadcastHashJoin" in plan  # O(1) probe per line
    # auto picks map for tiny sets
    assert "BroadcastHashJoin" not in _plan(
        D.remove_common_lines(df, common, strategy="auto"))
