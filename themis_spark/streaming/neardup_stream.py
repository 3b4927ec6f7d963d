"""Streaming NEAR-duplicate detection with custom LSH-bucket state.

``dedup_stream.exact_dedup_stream`` handles byte-identical re-crawls with
Spark's built-in ``dropDuplicatesWithinWatermark`` — no custom state
needed. Near-duplicates (template rewraps, timestamp stamps, boilerplate
edits) have no built-in streaming operator: detecting them across
micro-batches needs per-LSH-bucket state holding representative MinHash
signatures, which is exactly the ``applyInPandasWithState`` use case
(SURVEY.md §2(c) custom stateful streaming).

Shape, per micro-batch:

* map-side: the SAME portable MinHash signature family as the batch
  operator (operators/dedup.py — one md5 per shingle, affine
  permutations), banded exactly like ``lsh_candidate_pairs``;
* one exchange: ``groupBy(band, bh)`` routes each doc's ``bands`` tiny
  (band, bh, key, sig) rows to their bucket's state partition;
* per-bucket state: at most ``max_reps`` representative ``(key,
  signature)`` pairs — a degenerate boilerplate bucket therefore holds
  O(max_reps) state and compares O(max_reps) per row, never O(rows)
  (the streaming analogue of the batch ``max_bucket_size`` cap);
* emit: ``(key, dup_of, band, est_sim)`` rows where ``est_sim`` is the
  fraction of agreeing MinHash components (the standard unbiased
  Jaccard estimator) ≥ ``threshold``. The same pair can surface from
  several bands — consumers ``dropDuplicates(["key", "dup_of"])`` per
  sink batch (kept out of the operator: a second stateful stage would
  double the state for a purely cosmetic dedup).

State lifetime: ``ttl`` (processing-time timeout) expires idle buckets,
bounding state on an unbounded crawl the same way the watermark bounds
``exact_dedup_stream``; pass ``ttl=None`` for unbounded state in tests.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from themis_spark.functions.hashing import hash60
from themis_spark.operators.dedup import base_hash_col, minhash_cols_from_base

_OUT_SCHEMA = "key string, dup_of string, band int, est_sim double"
_STATE_SCHEMA = "keys array<string>, sigs array<array<long>>"


def _banded_signatures(
    df: DataFrame, key: str, text: str, ts_col: str,
    num_hashes: int, bands: int, shingle_n: int,
) -> DataFrame:
    """(band, bh, k, ts, sig) rows — bands per doc, map-side only (the
    batch signature family inlined so ``ts`` rides along without a
    stream-stream join; same two-step materialization of the base-hash
    array)."""
    based = df.select(F.col(key), F.col(ts_col).alias("__ts"),
                      base_hash_col(F.col(text), shingle_n).alias("__bh"))
    sigs = based.select(F.col(key), F.col("__ts"),
                        *minhash_cols_from_base(F.col("__bh"), num_hashes))
    rows_per_band = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            hash60(F.concat_ws(
                "|", *[F.col(f"minhash_{b * rows_per_band + r}")
                       for r in range(rows_per_band)])).alias("bh"),
        )
        for b in range(bands)
    ]
    sig_arr = F.array(*[F.col(f"minhash_{i}") for i in range(num_hashes)])
    return (
        sigs.where(F.col("minhash_0").isNotNull())
        .select(F.col(key).cast("string").alias("k"), F.col("__ts").alias("ts"),
                sig_arr.alias("sig"),
                F.explode(F.array(*band_structs)).alias("bb"))
        .select("k", "ts", "sig", "bb.band", "bb.bh")
    )


def near_dedup_stream(
    stream_df: DataFrame,
    key: str = "url",
    text: str = "text",
    ts_col: str = "warc_ts",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
    max_reps: int = 8,
    ttl: str | None = "2 hours",
) -> DataFrame:
    """Near-duplicate rows ``(key, dup_of, band, est_sim)`` detected
    against representatives seen in EARLIER micro-batches (and earlier
    rows of the same batch) — custom stateful streaming via
    ``applyInPandasWithState``."""
    exploded = _banded_signatures(stream_df, key, text, ts_col,
                                  num_hashes, bands, shingle_n)
    nh = float(num_hashes)
    ttl_ms = _interval_ms(ttl) if ttl else None

    def fn(bucket: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        keys: list
        sig_list: list
        if state.exists:
            keys, sig_list = state.get
            keys, sig_list = list(keys), [list(s) for s in sig_list]
        else:
            keys, sig_list = [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic processing order within the micro-batch
        batch = batch.sort_values(["ts", "k"], kind="mergesort")
        out_key, out_dup, out_band, out_sim = [], [], [], []
        for k, band, sig in zip(batch["k"], batch["band"], batch["sig"]):
            # plain Python ints: the state tuple is pickled for the JVM
            # state store, which rejects numpy scalars
            sig = [int(x) for x in sig]
            hit = None
            for rk, rs in zip(keys, sig_list):
                agree = sum(1 for a, b in zip(sig, rs) if a == b)
                if agree / nh >= threshold:
                    hit = (rk, agree / nh)
                    break
            if hit is not None:
                out_key.append(k)
                out_dup.append(hit[0])
                out_band.append(int(band))
                out_sim.append(hit[1])
            elif len(keys) < max_reps:
                keys.append(k)
                sig_list.append(sig)
        state.update((keys, sig_list))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"key": out_key, "dup_of": out_dup,
                            "band": out_band, "est_sim": out_sim})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return (
        exploded.groupBy("band", "bh")
        .applyInPandasWithState(fn, _OUT_SCHEMA, _STATE_SCHEMA,
                                "append", timeout)
    )


def _interval_ms(interval: str) -> int:
    n, unit = interval.split()
    per = {"second": 1_000, "seconds": 1_000,
           "minute": 60_000, "minutes": 60_000,
           "hour": 3_600_000, "hours": 3_600_000,
           "day": 86_400_000, "days": 86_400_000}[unit]
    return int(n) * per
