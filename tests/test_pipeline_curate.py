"""End-to-end curation recipe (themis_spark.pipeline.curate): the
composition of blocklist -> quality rules -> classifier -> exact dedup
-> LSH near-dup -> packing, with funnel attribution."""

from pyspark.sql import functions as F

from themis_spark.operators.text import hashed_weights
from themis_spark.pipeline import CurationConfig, curate

GOOD = ("the quick brown fox jumps over the lazy dog and keeps on "
        "running through the quiet green field toward the old wooden "
        "fence near the river bank")


def _corpus(spark):
    rows = [
        # survivor
        (1, GOOD, "https://ok.example.com/a"),
        # exact duplicate of 1 (whitespace-normalized)
        (2, GOOD.replace("  ", " ") + " ", "https://ok.example.com/b"),
        # near duplicate of 1 (one word changed)
        (3, GOOD.replace("fox", "cat"), "https://ok.example.com/c"),
        # blocklisted host
        (4, GOOD, "https://ads.example.com/x"),
        # too short
        (5, "tiny", "https://ok.example.com/d"),
        # symbol spam (fails gopher symbol ratio)
        (6, "# # # # # # # # # # # #", "https://ok.example.com/e"),
        # distinct survivor
        (7, "completely different readable text about sailing boats "
            "across calm water under a clear morning sky with steady "
            "wind from the north and gulls overhead", "https://ok.example.com/f"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, url string")


def test_curate_funnel_dedup_and_packing(spark):
    cfg = CurationConfig(
        blocked_hosts=["ads.example.com"],
        min_tokens=5,
        jaccard_threshold=0.5,
        ctx_len=64,
        pack_buckets=2,
    )
    out = curate(_corpus(spark), cfg)

    survivors = {r["doc_id"] for r in out["survivors"].collect()}
    # 2 drops as exact dup of 1, 3 as near dup of 1, 4 blocked,
    # 5 short, 6 symbol spam
    assert survivors == {1, 7}

    funnel = {r["rule"]: r for r in out["funnel"].collect()}
    assert funnel["blocklist"]["n_dropped"] == 1
    assert funnel["length"]["n_dropped"] == 1
    assert funnel["gopher_symbols"]["n_dropped"] == 1
    # first-fail accounting: n_in decreases monotonically
    assert funnel["length"]["n_in"] == funnel["blocklist"]["n_out"]

    pack = out["packing"].collect()
    assert sum(r["n_docs"] for r in pack) == 2
    total_tokens = sum(r["total_tokens"] for r in pack)
    got_tokens = sum(
        r["n_tokens"] for r in out["survivors"].select("n_tokens").collect())
    assert total_tokens == got_tokens


def test_curate_classifier_stage_filters(spark):
    # a strongly negative bias drops every doc at the classifier stage
    cfg = CurationConfig(
        min_tokens=5, near_dup=False,
        classifier_weights=hashed_weights(64), classifier_bias=-100.0)
    out = curate(_corpus(spark), cfg)
    assert out["survivors"].count() == 0

    cfg_pos = CurationConfig(
        min_tokens=5, near_dup=False,
        classifier_weights=hashed_weights(64), classifier_bias=100.0)
    out_pos = curate(_corpus(spark), cfg_pos)
    # positive bias keeps everything the rules kept (minus exact dups)
    assert out_pos["survivors"].count() > 0


def test_curate_plan_has_no_python(spark):
    out = curate(_corpus(spark), CurationConfig(min_tokens=5))
    plan = out["survivors"]._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_with_classifier_scores_matches_keyed_form(spark):
    from themis_spark.operators.text import (
        classifier_scores,
        hashed_weights,
        with_classifier_scores,
    )

    df = _corpus(spark)
    w = hashed_weights(64)
    keyed = {r["doc_id"]: r for r in
             classifier_scores(df, weights=w, bias=0.1).collect()}
    framed = {r["doc_id"]: r for r in
              with_classifier_scores(df, weights=w, bias=0.1).collect()}
    assert set(framed) >= set(keyed)
    for k, r in keyed.items():
        assert framed[k]["clf_logit"] == r["logit"]
        assert framed[k]["clf_label"] == r["label"]
        assert framed[k]["clf_n_tokens"] == r["n_tokens"]
        # input columns pass through
        assert framed[k]["url"] is not None
