"""Exact-substring dedup (Lee et al. 2021 window-hash form): semantics
on a planted corpus, edge cases, partitioning-invariance, plan shape."""

import pytest
from pyspark.sql import functions as F

from themis_spark.operators import dedup as D

ROWS = [
    (1, "a b c d e f g h i j"),        # copied wholesale into doc 2
    (2, "x y a b c d e f g h i j z"),  # contains doc 1 entirely
    (3, "p q r s t u v w"),            # 8 unique tokens: no duplication
    (4, None),                         # NULL text
    (5, "one two"),                    # shorter than the window
    (6, "r r r r r r r r r r"),        # self-repetition within one doc
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_spans_mark_cross_doc_and_self_duplication(spark, corpus):
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in D.duplicate_substring_spans(corpus, window=8).collect()
    }
    # doc 1: all 3 of its windows recur in doc 2 -> one merged span 0..9
    # doc 2: the copied run occupies token positions 2..11
    # doc 6: its 3 identical windows collide with EACH OTHER
    assert spans == {(1, 0, 9, 3), (2, 2, 11, 3), (6, 0, 9, 3)}


def test_removal_keeps_one_canonical_occurrence(spark, corpus):
    out = {r.doc_id: r for r in
           D.remove_duplicate_substrings(corpus, window=8).collect()}
    assert len(out) == 6  # every input row survives, NULL text included
    assert out[4].clean_text == "" and out[4].n_tokens == 0
    # owner (smallest (doc_id, pos)) keeps its text verbatim
    assert out[1].clean_text == "a b c d e f g h i j"
    assert out[1].n_removed == 0
    # the non-owner copy is cut, unique flanks survive
    assert out[2].clean_text == "x y z"
    assert out[2].n_removed == 10 and out[2].n_tokens == 13
    # unique and too-short docs pass through untouched
    assert out[3].n_removed == 0 and out[3].clean_text == "p q r s t u v w"
    assert out[5].n_removed == 0 and out[5].clean_text == "one two"
    # self-repetition: the pos-0 window owns; one window-length survives
    assert out[6].clean_text == "r" and out[6].n_removed == 9


def test_removal_preserves_original_casing(spark):
    # hashing is case-insensitive (lowercased tokenization) but the
    # reconstructed clean_text must keep the ORIGINAL casing — docs with
    # no duplicated content pass through byte-identical modulo
    # whitespace runs, and survivors of a cut keep their case
    df = spark.createDataFrame(
        [(1, "The Quick Brown Fox Jumps Over The Lazy Dog Daily"),
         (2, "PRE the quick brown fox jumps over the lazy dog daily POST"),
         (3, "Unique Mixed-Case Sentence With NO Duplicated Window Here OK")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           D.remove_duplicate_substrings(df, window=8).collect()}
    # owner (doc 1) untouched, original casing intact
    assert out[1].clean_text == "The Quick Brown Fox Jumps Over The Lazy Dog Daily"
    # non-owner copy cut; surviving flanks keep THEIR casing
    assert out[2].clean_text == "PRE POST"
    # never-duplicated doc is byte-identical
    assert out[3].clean_text == \
        "Unique Mixed-Case Sentence With NO Duplicated Window Here OK"
    assert out[3].n_removed == 0


def test_spans_empty_when_no_duplication(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (2, "one two three four five six seven eight nine")],
        "doc_id long, text string")
    assert D.duplicate_substring_spans(df, window=8).count() == 0


def test_results_invariant_under_partitioning(spark, corpus):
    base = sorted(
        tuple(r) for r in D.remove_duplicate_substrings(corpus).collect())
    skewed = sorted(
        tuple(r) for r in
        D.remove_duplicate_substrings(corpus.repartition(7)).collect())
    assert base == skewed


def test_plan_no_python_no_global_window(spark, corpus):
    for df in (D.duplicate_substring_spans(corpus, window=8),
               D.remove_duplicate_substrings(corpus, window=8)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # the island-merge windows are partitioned by document — a
        # partition-less window would serialize the corpus onto one task
        assert "SinglePartition" not in plan, plan


def test_substring_stats_fraction(spark, corpus):
    out = {r.doc_id: r for r in
           D.duplicate_substring_stats(corpus, window=8).collect()}
    assert len(out) == 6
    assert (out[1].n_tokens, out[1].dup_tokens, out[1].dup_fraction) == (10, 10, 1.0)
    assert (out[2].n_tokens, out[2].dup_tokens) == (13, 10)
    assert out[2].dup_fraction == round(10 / 13, 6)
    assert out[3].dup_tokens == 0 and out[3].dup_fraction == 0.0
    assert out[4].n_tokens == 0 and out[4].dup_fraction == 0.0  # NULL text
    assert out[6].dup_fraction == 1.0  # self-repetition covers the doc
