"""Sentence segmentation, PMI collocations, URL template mining."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import themis_spark.operators.text as X
import themis_spark.operators.web as WB


def test_sentence_spans_boundaries_and_indices(spark):
    rows = [(0, "Hello world. How are you?  Fine! Done"),
            (1, "no terminator"), (2, None), (3, "Trailing. ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["sent_idx"], r["sentence"], r["n_words"])
           for r in X.sentence_spans(df)
           .orderBy("doc_id", "sent_idx").collect()]
    assert got == [
        (0, 0, "Hello world.", 2), (0, 1, "How are you?", 3),
        (0, 2, "Fine!", 1), (0, 3, "Done", 1),
        (1, 0, "no terminator", 2),
        (3, 0, "Trailing.", 1),  # empty tail fragment dropped
    ]
    plan = X.sentence_spans(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_collocations_rank_real_pairs_above_chance(spark):
    # 'san francisco' always adjacent; control words shuffled
    docs = [(i, "san francisco " + " ".join(
        f"w{(i * 7 + j) % 9}" for j in range(8))) for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = X.collocations(df, min_count=5, k=5).collect()
    assert (out[0]["a"], out[0]["b"]) == ("san", "francisco")
    # PMI value sanity against hand-computed counts
    top = out[0]
    toks_per_doc = 10
    nt = 60 * toks_per_doc
    nb = 60 * (toks_per_doc - 1)
    c_a = c_b = c_ab = 60
    expect = round(math.log((c_ab * nt * nt) / (nb * c_a * c_b)), 6)
    assert abs(top["pmi"] - expect) < 1e-6


def test_collocations_pmi_normalizer_is_prefilter_total(spark):
    # review finding (r5): the p(ab) normalizer must be the TRUE bigram
    # total, not the post-min_count-filtered total — here rare bigrams
    # ('rare rvalN', each unique) are dropped by the filter but still
    # count toward nb; the old code inflated every PMI by
    # ln(total/filtered_total)
    docs = [(i, f"san francisco rare rval{i}") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = X.collocations(df, min_count=5, k=3).collect()
    got = {(r["a"], r["b"]): r["pmi"] for r in out}
    nt = 40 * 4           # token total
    nb = 40 * 3           # TRUE bigram total (3 per doc, incl. dropped)
    c = 40
    expect_sf = round(math.log((c * nt * nt) / (nb * c * c)), 6)
    assert abs(got[("san", "francisco")] - expect_sf) < 1e-6
    # ('francisco','rare') also survives: same counts, same PMI
    assert abs(got[("francisco", "rare")] - expect_sf) < 1e-6


def test_url_templates_collapse_ids(spark):
    rows = [(f"https://a.com/item/{i}/view",) for i in range(20)] \
        + [(f"https://a.com/u/deadbeef{i:04d}/profile",) for i in range(3)] \
        + [("https://a.com/static/about",), (None,)]
    df = spark.createDataFrame(rows, "url string")
    got = {r["template"]: r for r in WB.url_templates(df).collect()}
    assert got["/item/{n}/view"]["n_urls"] == 20
    assert got["/item/{n}/view"]["n_distinct"] == 20
    assert got["/item/{n}/view"]["example"] == "https://a.com/item/0/view"
    assert got["/u/{h}/profile"]["n_urls"] == 3  # 12-char hex run -> {h}
    assert got["/static/about"]["n_urls"] == 1
    assert len(got) == 3


def test_url_templates_collapse_uppercase_hex(spark):
    # review finding: uppercase hex ids (real-world hashes/UUIDs) were
    # not collapsed by the lowercase-only class
    rows = [(f"https://a.com/dl/9F86D081884C7D65{i}/f",) for i in range(4)] \
        + [("https://a.com/dl/AbCdEf0123456789/f",)]
    df = spark.createDataFrame(rows, "url string")
    got = {r["template"]: r["n_urls"] for r in WB.url_templates(df).collect()}
    assert got == {"/dl/{h}/f": 5}
