"""Streaming near-dup detection: custom applyInPandasWithState state
survives across micro-batches and bounds itself per bucket."""

from __future__ import annotations

import datetime as dt

from themis_spark.streaming.neardup_stream import _interval_ms, near_dedup_stream

BASE = ("the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz under the harvest moon and nobody notices the time")


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


def _run(spark, path):
    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, text string").parquet(path)
    out = near_dedup_stream(stream, num_hashes=12, bands=4,
                            threshold=0.6, ttl=None)
    q = (out.writeStream.format("memory").queryName("neardup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return {(r["key"], r["dup_of"]) for r in
            spark.sql("select * from neardup").collect()}


def test_interval_ms():
    assert _interval_ms("2 hours") == 7_200_000
    assert _interval_ms("30 seconds") == 30_000


def test_near_dup_found_across_micro_batches(spark, tmpdir_path):
    near = BASE.replace("harvest moon", "harvest moon tonight")
    far = " ".join(f"tok{i}" for i in range(40))

    b1 = spark.createDataFrame([("a", _ts(0), BASE)],
                               "url string, warc_ts timestamp, text string")
    b1.write.mode("append").parquet(f"{tmpdir_path}/in")
    pairs = _run(spark, f"{tmpdir_path}/in")
    assert pairs == set()  # first sighting is the representative

    # second micro-batch arrives later: near-dup of a, plus an unrelated doc
    b2 = spark.createDataFrame([("b", _ts(10), near), ("c", _ts(11), far)],
                               "url string, warc_ts timestamp, text string")
    b2.write.mode("append").parquet(f"{tmpdir_path}/in")
    spark.catalog.dropTempView("neardup")
    pairs = _run(spark, f"{tmpdir_path}/in")
    # availableNow reprocesses from scratch (fresh checkpointless query):
    # batch semantics stand in for two batches of one run — a is seen
    # first (earlier ts), b matches its stored signature, c matches nothing
    assert ("b", "a") in pairs
    assert all(k != "c" and d != "c" for (k, d) in pairs)


def test_state_survives_within_one_query_run(spark, tmpdir_path):
    """The real cross-batch proof: ONE streaming query with a checkpoint,
    fed a second file between availableNow runs — batch 2's near-dup must
    match batch 1's representative held in the state store."""
    near = BASE.replace("slow waltz", "slower waltz")
    src, ckpt, sink = (f"{tmpdir_path}/src", f"{tmpdir_path}/ckpt",
                       f"{tmpdir_path}/out")

    spark.createDataFrame([("a", _ts(0), BASE)],
                          "url string, warc_ts timestamp, text string"
                          ).write.mode("append").parquet(src)

    def run_once():
        # parquet sink: the memory sink cannot recover from a checkpoint
        stream = spark.readStream.schema(
            "url string, warc_ts timestamp, text string").parquet(src)
        out = near_dedup_stream(stream, num_hashes=12, bands=4,
                                threshold=0.6, ttl=None)
        q = (out.writeStream.format("parquet").outputMode("append")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["key"], r["dup_of"]) for r in
                spark.read.parquet(sink).collect()}

    assert run_once() == set()

    spark.createDataFrame([("b", _ts(10), near)],
                          "url string, warc_ts timestamp, text string"
                          ).write.mode("append").parquet(src)
    # resumed from the checkpoint: only the new file is a new batch, so
    # the match can ONLY come from state persisted by the first run
    assert ("b", "a") in run_once()


def test_bucket_state_is_bounded(spark, tmpdir_path):
    """max_reps caps representatives per bucket: 30 identical docs emit
    dups against the single stored representative, state stays O(1)."""
    rows = [(f"d{i:02d}", _ts(i), BASE) for i in range(30)]
    spark.createDataFrame(rows, "url string, warc_ts timestamp, text string"
                          ).write.mode("append").parquet(f"{tmpdir_path}/in")
    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, text string"
        ).parquet(f"{tmpdir_path}/in")
    out = near_dedup_stream(stream, num_hashes=12, bands=4,
                            threshold=0.6, max_reps=2, ttl=None)
    q = (out.writeStream.format("memory").queryName("capped")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from capped").collect()
    dup_of = {r["dup_of"] for r in got}
    # every duplicate resolves to the first-seen representative
    assert dup_of == {"d00"}
    assert {r["key"] for r in got} == {f"d{i:02d}" for i in range(1, 30)}
