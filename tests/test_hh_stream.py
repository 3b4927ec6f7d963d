"""Streaming Misra-Gries heavy hitters (streaming/hh_stream.py):
cross-batch state via a real checkpoint, per-bucket guarantees against
exact counts, bounded state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_spark.streaming.hh_stream import heavy_hitters_stream


def _write(spark, path, tokens):
    spark.createDataFrame([(t,) for t in tokens], "token string") \
        .write.mode("append").parquet(path)


def _run(spark, src, ckpt, sink):
    stream = spark.readStream.schema("token string").parquet(src)
    out = heavy_hitters_stream(stream, n_buckets=4, n_counters=8, ttl=None)
    q = (out.writeStream.format("parquet").outputMode("append")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    df = spark.read.parquet(sink)
    # latest snapshot per bucket = the max-err emission... err alone is
    # not monotone-unique; use the file batch id via input_file_name? The
    # append sink accumulates snapshots — take, per (bucket, token), the
    # row with the HIGHEST lower (counts only grow within a run for a
    # resident token under no eviction pressure in these fixtures)
    return df


def test_counts_accumulate_across_checkpointed_batches(spark, tmpdir_path):
    src, ckpt, sink = (f"{tmpdir_path}/src", f"{tmpdir_path}/ckpt",
                       f"{tmpdir_path}/out")
    _write(spark, src, ["heavy"] * 10 + ["x", "y"])
    df = _run(spark, src, ckpt, sink)
    snap1 = {r["token"]: r["lower"] for r in df.collect()}
    assert snap1["heavy"] == 10

    # second file = second micro-batch resumed from the checkpoint: the
    # counter must CONTINUE from state, not restart
    _write(spark, src, ["heavy"] * 7 + ["z"])
    df = _run(spark, src, ckpt, sink)
    best = {r["token"]: r["lower"]
            for r in df.groupBy("token")
            .agg(F.max("lower").alias("lower")).collect()}
    assert best["heavy"] == 17
    assert best["x"] == 1 and best["z"] == 1


def test_guarantees_under_eviction_pressure(spark, tmpdir_path):
    src, ckpt, sink = (f"{tmpdir_path}/src", f"{tmpdir_path}/ckpt",
                       f"{tmpdir_path}/out")
    # many distinct tail tokens force decrement passes in some bucket;
    # the planted heavy token must survive with a bounded undercount
    tokens = ["heavy"] * 400 + [f"tail{i}" for i in range(600)]
    _write(spark, src, tokens)
    df = _run(spark, src, ckpt, sink)
    rows = df.collect()
    by_tok = {r["token"]: r for r in rows}
    assert "heavy" in by_tok
    r = by_tok["heavy"]
    assert r["lower"] <= 400
    assert 400 - r["lower"] <= r["err"]  # MG undercount bound, per token
    # state bounded: no bucket snapshot exceeds n_counters rows
    import collections
    per_bucket = collections.Counter(r["bucket"] for r in rows)
    assert max(per_bucket.values()) <= 8
