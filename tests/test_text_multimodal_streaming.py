"""Text analysis, multimodal plumbing, and streaming validation tests."""

import pytest
from pyspark.sql import functions as F

from themis_spark.operators import multimodal as M
from themis_spark.operators import text as X


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "  spaced   out  tokens "), (3, ""), (4, "one")],
        "id long, text string",
    )
    rows = {r["id"]: (r["n"], r["b"]) for r in df.select(
        "id", X.token_count_col("text").alias("n"),
        X.bpe_ish_token_count_col("text").alias("b")).collect()}
    assert rows[1] == (2, 2)
    assert rows[2][0] == 3
    assert rows[3] == (0, 0)
    assert rows[4] == (1, 1)
    # punctuation splits in the BPE-ish counter but not whitespace counter
    df2 = spark.createDataFrame([(1, "don't stop, world!")], "id long, text string")
    r = df2.select(X.token_count_col("text").alias("n"),
                   X.bpe_ish_token_count_col("text").alias("b")).first()
    assert r["n"] == 3 and r["b"] == 7  # don ' t stop , world !


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat of the mat and it was good for all"),
            (2, "el gato que vive en la casa de los vecinos"),
            (3, "der hund und die katze sind nicht zu hause"),
            (4, "le chat et les oiseaux sont dans un jardin"),
            (5, "zzz qqq xxx www"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["lang"] for r in df.select("id", X.language_id_col("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "und"}


def test_quality_score_ordering(spark):
    good = "the quality of this document is high and it was written for people " * 10
    bad = "$$$ ### !!! @@@ %%%"
    df = spark.createDataFrame([(1, good), (2, bad)], "id long, text string")
    s = {r["id"]: r["q"] for r in df.select("id", X.quality_score_col("text").alias("q")).collect()}
    assert s[1] > 0.8 and s[2] < 0.4


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "Some  Document text"), (2, "some document text"), (3, "other")],
        "id long, text string",
    )
    fp = {r["id"]: r["f"] for r in df.select("id", X.fingerprint_col("text").alias("f")).collect()}
    assert fp[1] == fp[2] != fp[3]
    # winnow sketch: robust to a small suffix edit (shares most mins)
    df2 = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789"), (2, "abcdefghijklmnopqrstuvwxyz012345____")],
        "id long, text string",
    )
    w = {r["id"]: set(r["w"]) for r in df2.select(
        "id", X.winnow_fingerprint_col("text", gram=8, keep=4).alias("w")).collect()}
    assert len(w[1] & w[2]) >= 2


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")).cache()


def test_media_meta_plumbing(spark, media):
    meta = M.extract_media_meta(media, deterministic_fake=True)
    rows = meta.collect()
    assert len(rows) == 50
    r0 = rows[0]
    assert r0["n_bytes"] > 0 and len(r0["sha256"]) == 64 and r0["format"] == "fake"
    # deterministic across partitioning
    again = {r["doc_id"]: r["sha256"] for r in
             M.extract_media_meta(media.repartition(7), deterministic_fake=True).collect()}
    assert all(again[r["doc_id"]] == r["sha256"] for r in rows)


def test_media_real_decode_raises_without_pil(spark, media):
    if M._HAS_PIL:
        pytest.skip("PIL installed")
    import pandas as pd
    with pytest.raises(NotImplementedError):
        M._decode_real(b"xxx")


def test_frame_sample_fanout(spark, media):
    frames = M.frame_sample_stub(media, every_n=2)
    pdf = frames.toPandas()
    assert (pdf.groupby("doc_id").size() >= 1).all()
    assert set(pdf.columns) == {"doc_id", "frame_idx", "frame_sha"}


def test_binary_stats_native(spark, media):
    r = M.binary_stats(media).first()
    assert r["cnt"] == 50 and r["min_bytes"] > 0 and r["total_bytes"] >= r["max_bytes"]


def test_streaming_validation(spark, tmpdir_path):
    from themis_spark.plans.compiler import compile_plan
    from themis_spark.sources.pages import PAGES_SCHEMA_JSON, generate_pages
    from themis_spark.streaming.validate_stream import (
        start_validation_stream, violation_rate_stream, annotate_stream,
    )

    pages = generate_pages(spark, 2000, n_partitions=4)
    pages.write.mode("overwrite").parquet(f"{tmpdir_path}/in")
    plan = compile_plan(PAGES_SCHEMA_JSON, pages.schema)

    stream = spark.readStream.schema(pages.schema).parquet(f"{tmpdir_path}/in")
    q = start_validation_stream(
        stream, plan, f"{tmpdir_path}/out", f"{tmpdir_path}/ckpt",
        key_col="url", partition_col="part_id",
    )
    q.awaitTermination(120)
    viol = spark.read.parquet(f"{tmpdir_path}/out/violations")
    kws = {r["keyword"] for r in viol.select("keyword").distinct().collect()}
    assert {"enum", "pattern", "required"} <= kws

    # windowed violation-rate aggregation compiles on a streaming frame
    ann = annotate_stream(stream, plan, keep=["url", "warc_ts", "part_id"])
    rates = violation_rate_stream(ann, ts_col="warc_ts", window="30 days", watermark="60 days")
    q2 = (rates.writeStream.format("memory").queryName("rates")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got = spark.sql("select * from rates").collect()
    assert got and all(0 <= r["violation_rate"] <= 1 for r in got)


def test_stateful_host_violation_tracker(spark, tmpdir_path):
    """applyInPandasWithState custom stateful operator: cumulative
    per-host violation state across micro-batches (lifetime state, not a
    window)."""
    from pyspark.sql import functions as F

    from themis_spark.plans.compiler import compile_plan
    from themis_spark.sources.pages import PAGES_SCHEMA_JSON, generate_pages
    from themis_spark.streaming.validate_stream import (
        annotate_stream, host_violation_tracker,
    )

    pages = generate_pages(spark, 3000, n_partitions=4)
    pages.write.mode("overwrite").parquet(f"{tmpdir_path}/sin")
    plan = compile_plan(PAGES_SCHEMA_JSON, pages.schema)

    stream = spark.readStream.schema(pages.schema).parquet(f"{tmpdir_path}/sin")
    ann = annotate_stream(stream, plan, keep=["url", "lang"]).withColumn(
        "host", F.regexp_extract("url", r"https?://([^/]+)/", 1))
    tracked = host_violation_tracker(ann, key_col="host",
                                     threshold=0.0, min_rows=1)
    q = (tracked.writeStream.format("memory").queryName("tracked")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "select host, max(rows) rows, max(bad_rows) bad from tracked group by host"
    ).collect()
    assert got and sum(r["rows"] for r in got) == 3000
    # cumulative counts agree with the batch pass
    from themis_spark.operators.validate import annotate as batch_annotate
    batch = batch_annotate(pages, plan, keep=["url"])
    total_bad = batch.where("n_violations > 0").count()
    assert sum(r["bad"] for r in got) == total_bad


def test_extracted_text_roundtrip(spark):
    # extraction from page bytes must reproduce the text byte-identically
    # (the north-rule per-row invariant), including tag stripping and
    # whitespace collapse
    from pyspark.sql import functions as F

    rows = [
        (1, "plain words only here"),
        (2, "nested <b>bold</b> and <i>italic</i> markup"),
        (3, "spaced   out     words"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    html = F.encode(F.concat(
        F.lit("<html><head><title>x</title></head><body><div>"),
        F.col("text"), F.lit("</div></body></html>")), "UTF-8")
    got = {r["id"]: r["ext"]
           for r in df.select("id", X.extracted_text_col(html).alias("ext")).collect()}
    assert got[1] == "plain words only here"
    assert got[2] == "nested bold and italic markup"     # tags -> space, collapsed
    assert got[3] == "spaced out words"                  # whitespace normalized
    # head/title content never leaks into the extraction
    assert "x" != got[1][:1]


def test_classifier_and_funnel_ops_work_on_streams(spark, tmpdir_path):
    # stateless scan-stage ops (classifier scoring, blocklist flagging)
    # must compose onto readStream unchanged — no batch-only API leaks
    from themis_spark.operators.text import classifier_scores, hashed_weights
    from themis_spark.operators.web import blocklist_filter

    df = spark.createDataFrame(
        [(1, "clean text here", "https://ads.example.com/x"),
         (2, "more text", "https://ok.example.com/y")],
        "doc_id long, text string, url string")
    df.write.mode("overwrite").parquet(f"{tmpdir_path}/cin")
    stream = spark.readStream.schema(df.schema).parquet(f"{tmpdir_path}/cin")

    scored = classifier_scores(stream, weights=hashed_weights(64))
    flagged = blocklist_filter(stream, host_suffixes=["ads.example.com"])
    assert scored.isStreaming and flagged.isStreaming

    q = (scored.writeStream.format("memory").queryName("cls")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql("select * from cls").collect()}
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 2

    q2 = (flagged.writeStream.format("memory").queryName("blk")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    blk = {r["doc_id"]: r["blocked"] for r in spark.sql("select * from blk").collect()}
    assert blk == {1: True, 2: False}


def test_streaming_packing_continues_across_batches(spark, tmpdir_path):
    # per-bucket offsets must carry across micro-batches: batch 2 starts
    # exactly where batch 1 left off (checkpointed custom state). The
    # sink is parquet because the memory sink cannot recover from a
    # checkpoint (same constraint as the neardup resume test).
    import os

    from themis_spark.streaming.pack_stream import pack_offsets_stream

    src = f"{tmpdir_path}/pin"
    sink, ckpt = f"{tmpdir_path}/pout", f"{tmpdir_path}/pckpt"
    schema = "doc_id long, n_tokens long"
    # 2 vs 10: a numeric key must sort NUMERICALLY within the batch
    # (the old string cast ordered "10" < "2"); keys keep their type
    b1 = spark.createDataFrame([(2, 100), (10, 50), (3, 300)], schema)
    # flat append into one dir: the file stream source does not recurse
    # into nested .parquet subdirectories
    b1.write.mode("append").parquet(src)

    def run_batches():
        stream = spark.readStream.schema(b1.schema).parquet(src)
        placed = pack_offsets_stream(stream, ctx_len=128, buckets=1)
        q = (placed.writeStream.format("parquet").outputMode("append")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_batches()
    got1 = {r["key"]: r for r in spark.read.parquet(sink).collect()}
    assert got1[2]["start_tok"] == 0
    assert got1[3]["start_tok"] == 100
    assert got1[10]["start_tok"] == 400 and got1[10]["n_chunks"] == 1

    # the one-batch case now reproduces batch pack_offsets exactly
    from themis_spark.operators.stats import pack_offsets
    batch_rows = {r["doc_id"]: r for r in
                  pack_offsets(b1, ctx_len=128, buckets=1).collect()}
    assert all(batch_rows[k]["start_tok"] == got1[k]["start_tok"]
               for k in (2, 3, 10))

    # second file arrives -> resumed stream continues the offsets
    b2 = spark.createDataFrame([(4, 10), (5, 0)], schema)
    b2.write.mode("append").parquet(src)
    run_batches()
    got2 = {r["key"]: r for r in spark.read.parquet(sink).collect()}
    assert got2[4]["start_tok"] == 450  # 100+50+300
    assert got2[5]["n_chunks"] == 0 and got2[5]["first_chunk"] is None


def test_streaming_psi_drift_matches_batch(spark, tmpdir_path):
    """Streaming PSI monitor: batch/stream parity on the same input, a
    drifted window flags, and the whole plan is one stateful agg."""
    from themis_spark.operators.stats import HistSpec, psi_statistic
    from themis_spark.sources.pages import generate_pages
    from themis_spark.streaming.drift_stream import (
        psi_drift_stream,
        windowed_histogram_stream,
    )

    pages = (
        generate_pages(spark, 2000, n_partitions=4)
        # pages carry (url, warc_ts, html, text, lang, meta) — derive the
        # monitored metric; drop the planted NULL warc_ts rows so batch
        # and stream count the same rows (streaming drops null event time)
        .where(F.col("warc_ts").isNotNull())
        .withColumn("n_chars", F.length(F.coalesce("text", F.lit(""))))
    )
    spec = HistSpec("n_chars", lo=0.0, hi=20000.0, nbins=10)

    # reference = the batch histogram of the SAME data -> PSI must be ~0
    # (all 2024 timestamps land in one 3650-day epoch-aligned window)
    ref_row = windowed_histogram_stream(
        pages, spec, window="3650 days").collect()
    assert len(ref_row) == 1
    ref = ref_row[0]["hist"]

    # append mode only emits CLOSED windows: plant one far-future
    # sentinel row (NULL metric — contributes to no bucket) whose event
    # time pushes the watermark past the real window's end; its own
    # window stays open and never emits.
    sentinel = (pages.limit(1)
                .withColumn("warc_ts", F.lit("2040-01-01").cast("timestamp"))
                .withColumn("n_chars", F.lit(None).cast("int")))
    pages.unionByName(sentinel).write.mode("overwrite") \
        .parquet(f"{tmpdir_path}/din")

    stream = spark.readStream.schema(pages.schema).parquet(f"{tmpdir_path}/din")
    out = psi_drift_stream(stream, spec, list(ref), window="3650 days",
                           watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("psi0")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from psi0").collect()
    assert len(got) == 1
    assert got[0]["psi"] is not None and abs(got[0]["psi"]) < 1e-9
    assert got[0]["drifted"] is False
    assert got[0]["n"] == sum(ref)

    # a genuinely shifted reference must flag, and the streaming PSI
    # must equal the batch psi_statistic on the same two histograms
    shifted = list(ref[1:]) + [ref[0]]  # rotate buckets: hard shift
    out2 = psi_drift_stream(stream, spec, shifted, window="3650 days",
                            watermark="0 seconds", threshold=0.25)
    q2 = (out2.writeStream.format("memory").queryName("psi1")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = spark.sql("select * from psi1").collect()
    assert len(got2) == 1
    expect = psi_statistic(list(ref), shifted)
    assert abs(got2[0]["psi"] - expect) < 1e-9
    assert got2[0]["drifted"] == (expect > 0.25)


def test_streaming_psi_checkpoint_resume(spark, tmpdir_path):
    """Kill-and-resume: the windowed histogram state survives a
    checkpoint restart — the second run processes only the new file and
    closed windows carry counts from BOTH batches."""
    from themis_spark.operators.stats import HistSpec
    from themis_spark.streaming.drift_stream import psi_drift_stream

    src, ckpt, sink = (f"{tmpdir_path}/{d}" for d in ("src", "ck", "out"))

    def batch(rows):
        return spark.createDataFrame(
            [(t, float(v)) for t, v in rows], "ts string, value double") \
            .select(F.col("ts").cast("timestamp").alias("ts"), "value")

    # window = 1 day epoch-aligned; watermark 0: the sentinel at day D+2
    # closes day D. batch 1: 3 rows in day one bucket 1
    batch([("2024-01-01 01:00:00", 10.0), ("2024-01-01 02:00:00", 20.0),
           ("2024-01-01 03:00:00", 30.0)]).write.parquet(f"{src}/b1")

    def run():
        stream = spark.readStream.schema(
            "ts timestamp, value double").option(
            "pathGlobFilter", "*.parquet").parquet(f"{src}/*")
        out = psi_drift_stream(
            stream, HistSpec("value", lo=0.0, hi=100.0, nbins=2),
            [5, 5, 5, 5], ts_col="ts", window="1 day",
            watermark="0 seconds")
        q = (out.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()  # no window closes yet (watermark == max ts, < day-1 end)
    # batch 2: one more day-1 row + a day-3 sentinel that closes day 1
    batch([("2024-01-01 04:00:00", 80.0),
           ("2024-01-03 01:00:00", 50.0)]).write.parquet(f"{src}/b2")
    run()

    got = spark.read.schema(
        "window_start timestamp, window_end timestamp, n long, "
        "psi double, drifted boolean").parquet(sink).collect()
    assert len(got) == 1
    # 3 rows from the pre-restart batch + 1 after: state continued
    assert got[0]["n"] == 4
    assert got[0]["psi"] is not None
