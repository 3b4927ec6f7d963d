"""Engine-level tests on the seeded synthetic pages table: planted
anomalies are found at the planted rates; stats/constraints/drift behave
(SURVEY.md §5.3)."""

import pytest
from pyspark.sql import functions as F

from themis_spark.operators import constraints as C
from themis_spark.operators import validate as V
from themis_spark.operators.stats import (
    HistSpec, column_stats, distinct_estimate, ks_statistic, merge_histograms,
)
from themis_spark.plans.compiler import compile_plan
from themis_spark.sources.pages import PAGES_SCHEMA_JSON, generate_links, generate_pages

N = 20_000


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, N, n_partitions=8).cache()


def test_fused_pass_finds_planted_anomalies(spark, pages):
    plan = compile_plan(PAGES_SCHEMA_JSON, pages.schema)
    ann = V.annotate(pages, plan, keep=["url", "part_id"])
    counts = {
        r["keyword"]: r["count"]
        for r in V.violations_df(ann).groupBy("keyword").count().collect()
    }
    # planted rates (FIXTURES.md §1): 1% bad lang, 0.5% bad url scheme,
    # 1% null text (required), 1% short text, ~2% dup meta tags
    assert abs(counts["enum"] - 0.01 * N) < 0.005 * N
    assert abs(counts["pattern"] - 0.005 * N) < 0.004 * N
    assert counts["required"] >= 0.008 * N  # null text (warc_ts not required)
    assert counts["minLength"] >= 0.007 * N
    assert counts["uniqueItems"] >= 0.015 * N  # 2% planted + vocab collisions


def test_verdicts_per_partition(spark, pages):
    plan = compile_plan(PAGES_SCHEMA_JSON, pages.schema)
    ann = V.annotate(pages, plan, keep=["url", "part_id"])
    verd = V.verdicts_df(ann).collect()
    assert len(verd) == 8
    assert sum(r["rows"] for r in verd) == N
    assert all(not r["passed"] for r in verd)  # anomalies planted everywhere


def test_uniqueness_finds_planted_dups(spark, pages):
    dups = C.duplicate_keys(pages, "url").agg(F.sum("cnt"), F.count("*")).first()
    total_dup_rows, dup_keys = int(dups[0]), int(dups[1])
    # 0.5% of rows re-emit an earlier url
    assert 0.002 * N < dup_keys < 0.01 * N
    # salted variant returns the identical result set
    salted = C.duplicate_keys(pages, "url", salted=True)
    plain = C.duplicate_keys(pages, "url")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_duplicate_examples_capped(spark, pages):
    ex = C.duplicate_examples(pages, "url", n_examples=2).limit(5).collect()
    assert ex and all(len(r["examples"]) <= 2 for r in ex)


def test_referential_orphans(spark, pages):
    links = generate_links(spark, N // 2, N)
    orphans = C.referential_orphans(links, "src_url", pages, "url")
    n = orphans.count()
    # ~1% planted orphans + ~1% urls lost to dup/scheme corruption
    assert 0.005 * (N // 2) < n < 0.05 * (N // 2)
    # every reported orphan truly has no parent
    joined = orphans.join(pages.select("url"), orphans["src_url"] == pages["url"], "inner")
    assert joined.count() == 0
    # broadcast variant agrees
    nb = C.referential_orphans(links, "src_url", pages, "url", broadcast_parent=True).count()
    assert nb == n


def test_stats_and_hll(spark, pages):
    metrics = column_stats(
        pages, ["url", "text", "lang"], hist_specs=[], run_id="t"
    ).cache()
    row = metrics.where("column = 'text'").agg(
        F.sum("cnt").alias("cnt"), F.sum("nulls").alias("nulls")
    ).first()
    assert row["cnt"] + row["nulls"] == N
    assert abs(row["nulls"] - 0.01 * N) < 0.005 * N  # 1% planted null text
    est = distinct_estimate(metrics, "url")
    exact = pages.select("url").distinct().count()
    assert abs(est - exact) / exact < 0.05  # HLL within 5%
    metrics.unpersist()


def test_histogram_and_ks_drift(spark, pages):
    spec = HistSpec("ts_num", 1704067200.0, 1735689600.0, 20)  # 2024 in epoch-s
    withnum = pages.withColumn("ts_num", F.unix_timestamp("warc_ts").cast("double"))
    m_now = column_stats(withnum, ["ts_num"], hist_specs=[spec], run_id="a")
    drifted = generate_pages(spark, N, n_partitions=8, seed=1042, drift=True).withColumn(
        "ts_num", F.unix_timestamp("warc_ts").cast("double")
    )
    m_drift = column_stats(drifted, ["ts_num"], hist_specs=[spec], run_id="b")

    h_now = merge_histograms(m_now, "ts_num")
    assert sum(h_now) > 0.99 * N  # nulls excluded
    # same distribution vs itself: KS == 0
    assert ks_statistic(h_now, h_now) == 0.0
    res = C.drift_check(m_drift, m_now, "ts_num", threshold=0.1)
    # +90-day shift over a 365-day window → KS ≈ 90/365 ≈ 0.25
    assert res["drifted"] and 0.15 < res["ks"] < 0.4


def test_invariant_operator_finds_planted_mismatches(spark, pages):
    """invariant_violations (SURVEY 2(b).11, round-1 missing item 4): the
    engine operator — not just a test — emits the violation-row contract
    for every url whose extracted text diverges from the reference."""
    base = pages.dropDuplicates(["url"])
    ref = base.select(
        "url",
        F.when(F.pmod(F.xxhash64("url"), F.lit(50)) == 0,
               F.concat(F.coalesce("text", F.lit("")), F.lit("CORRUPTED")))
        .otherwise(F.col("text")).alias("text"),
    )
    v = C.invariant_violations(base, ref).cache()
    n = v.count()
    expected = base.where(F.pmod(F.xxhash64("url"), F.lit(50)) == 0).count()
    assert 0 < n <= expected  # null-text rows coalesce differently → <=
    row = v.first()
    assert row["keyword"] == "text_invariant"
    assert row["instance_path"] == "$.text"
    assert row["schema_path"].endswith("/constraints/text_invariant/url")
    # identical reference → zero violations
    assert C.invariant_violations(base, base.select("url", "text")).count() == 0
    v.unpersist()


def test_invariant_catches_missing_rows(spark, pages):
    """A dropped or phantom row is an invariant failure, not a silent
    pass: keys on only one side of the full-outer digest join surface
    with a <missing> digest."""
    base = pages.dropDuplicates(["url"]).select("url", "text").cache()
    short = base.where(F.pmod(F.xxhash64("url"), F.lit(4)) != 0)
    # reference has rows the run dropped → every missing url is violated
    m = C.invariant_mismatches(short, base)
    assert m.count() == base.count() - short.count()
    assert m.where(F.col("__h_actual") == "<missing>").count() == m.count()
    # run has rows the reference lacks (phantom rows) → also violations
    m2 = C.invariant_mismatches(base, short)
    assert m2.count() == base.count() - short.count()
    assert m2.where(F.col("__h_ref") == "<missing>").count() == m2.count()
    base.unpersist()


def test_text_invariant_across_parallelism(spark):
    """Byte-identical text per url across runs and parallelism levels
    (BASELINE.json input_hint per-row invariant)."""
    a = generate_pages(spark, 2000, n_partitions=4).select(
        "url", F.sha2(F.encode(F.coalesce("text", F.lit("")), "UTF-8"), 256).alias("h")
    )
    b = generate_pages(spark, 2000, n_partitions=4).repartition(17).select(
        "url", F.sha2(F.encode(F.coalesce("text", F.lit("")), "UTF-8"), 256).alias("h")
    )
    mismatches = (
        a.alias("a").join(b.alias("b"), "url")
        .where(F.col("a.h") != F.col("b.h"))
        .count()
    )
    assert mismatches == 0
