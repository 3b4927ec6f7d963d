"""Streaming heavy hitters: per-bucket Misra-Gries state.

The streaming counterpart of ``operators.stats.heavy_hitters_mg``.
Batch MG summarizes per input PARTITION and merges; a stream instead
routes every token to ONE stable content-hash bucket, so each bucket's
state is a true Misra-Gries summary of that bucket's ENTIRE substream —
the textbook guarantees hold per token exactly (all of a token's
occurrences land in its bucket): ``freq(t) - lower(t) <= err_bucket``,
``err_bucket <= n_bucket/(k'+1)``, and any token with
``freq > err_bucket`` is resident.

Shape per micro-batch: one exchange (``groupBy(bucket)`` over 8-byte
hash buckets), O(n_buckets × k') total state, and each trigger emits
the bucket's full candidate snapshot — an append-mode CHANGELOG
(consumers keep the latest batch per bucket; a second stateful stage
to diff snapshots would double state for cosmetics, same trade as
``near_dedup_stream``'s per-band duplicates).

Rows inside a micro-batch process in sorted token order — Misra-Gries
results are arrival-order dependent, and a deterministic order makes
checkpoint-resume tests (and reruns) bit-stable.

State lifetime: ``ttl`` processing-time timeout expires idle buckets
(counts restart from zero — correct for "heavy RIGHT NOW" monitoring,
documented); ``ttl=None`` for unbounded state.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from themis_spark.functions.hashing import hash60
from themis_spark.streaming.neardup_stream import _interval_ms

_OUT_SCHEMA = "bucket int, token string, lower long, err long"
_STATE_SCHEMA = "tokens array<string>, counts array<long>, err long"


def heavy_hitters_stream(
    stream_df: DataFrame,
    col: str = "token",
    n_buckets: int = 32,
    n_counters: int = 16,
    ttl: str | None = None,
) -> DataFrame:
    """``(bucket, token, lower, err)`` snapshot rows per micro-batch —
    ``lower`` is the resident counter (guaranteed under-count), ``err``
    the bucket's decrement passes so far (the per-token error bound)."""
    src = (
        stream_df.select(F.col(col).cast("string").alias("t"))
        .where(F.col("t").isNotNull())
        .select("t", (hash60(F.col("t")) % n_buckets).cast("int")
                .alias("bucket"))
    )
    ttl_ms = _interval_ms(ttl) if ttl else None

    def fn(bucket: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            tokens, counts, err = state.get
            counters = {t: int(c) for t, c in zip(tokens, counts)}
            err = int(err)
        else:
            counters, err = {}, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        for t in sorted(batch["t"]):
            if t in counters:
                counters[t] += 1
            elif len(counters) < n_counters:
                counters[t] = 1
            else:
                # classic MG decrement-all pass (see batch operator)
                err += 1
                for x in list(counters):
                    counters[x] -= 1
                    if counters[x] == 0:
                        del counters[x]
        state.update((list(counters), [counters[t] for t in counters], err))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        b = int(bucket[0])
        yield pd.DataFrame({
            "bucket": [b] * len(counters),
            "token": list(counters),
            "lower": list(counters.values()),
            "err": [err] * len(counters),
        })

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return src.groupBy("bucket").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "append", timeout)
