"""Streaming sequence packing: concat-and-chunk layout assignment over
an unbounded document stream.

The batch operator (``stats.pack_offsets``) lays documents end-to-end
per hash bucket with a window prefix sum; a stream cannot window over
its whole history, so the running stream offset is CUSTOM STATE — one
long per bucket — carried across micro-batches with
``applyInPandasWithState`` (SURVEY.md §2(c) custom stateful streaming,
beside the near-dup tracker).

Shape, per micro-batch:

* map-side: ``bucket = pmod(hash60(key), buckets)`` plus the token
  count — the same portable bucket assignment as the batch operator;
* one exchange: ``groupBy(bucket)`` routes each document's one tiny
  (key, n_tokens) row to its packing stream's state partition;
* per-bucket state: a single ``next_start`` offset (O(1) — the
  smallest possible streaming state);
* emit: the batch operator's row shape ``(key, bucket, n_tokens,
  start_tok, first_chunk, n_chunks)``.

Ordering contract: a stream packs in ARRIVAL order (micro-batch order,
then TYPED key within a batch — deterministic given the same batch
boundaries; numeric keys sort numerically, so the layout agrees with
the batch operator's orderBy, not a lexicographic proxy). The batch
operator's global (bucket, key) order is only
reproduced when everything arrives in one batch; continuation is the
invariant that matters here: batch N+1's first document starts exactly
where batch N's stream left off, so a checkpoint-resumed job keeps
packing the same streams without gaps or overlaps.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from themis_spark.functions.hashing import hash60

_OUT_FIELDS = ("bucket int, n_tokens long, start_tok long, "
               "first_chunk long, n_chunks long")
_STATE_SCHEMA = "next_start long"


def pack_offsets_stream(
    stream_df: DataFrame,
    key: str = "doc_id",
    tokens: str = "n_tokens",
    ctx_len: int = 2048,
    buckets: int = 64,
) -> DataFrame:
    """Per-document packing placements over a stream — the streaming
    form of ``stats.pack_offsets`` (same chunk arithmetic, state-carried
    offsets). ``tokens`` names an integer column on the stream (compute
    it map-side with ``text.token_count_col`` when starting from raw
    text). The key keeps its ORIGINAL type end-to-end and each
    micro-batch sorts on that typed key — numeric keys order
    numerically (10 after 2, not before), so the everything-in-one-batch
    case reproduces the batch operator's (bucket, key) layout exactly
    for any orderable key type."""
    key_dt = stream_df.schema[key].dataType.simpleString()
    out_schema = f"key {key_dt}, " + _OUT_FIELDS
    base = stream_df.select(
        F.col(key).alias("k"),
        F.pmod(hash60(F.col(key)), F.lit(buckets)).cast("int").alias("bucket"),
        F.col(tokens).cast("long").alias("n_tokens"),
    )

    def fn(bucket: Any, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        start = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("k", kind="mergesort")
        rows = {"key": [], "bucket": [], "n_tokens": [], "start_tok": [],
                "first_chunk": [], "n_chunks": []}
        for k, tok in zip(batch["k"], batch["n_tokens"]):
            tok = int(tok) if (tok is not None and tok == tok) else 0  # NULL/NaN-safe
            rows["key"].append(k)
            rows["bucket"].append(int(bucket[0]))
            rows["n_tokens"].append(tok)
            rows["start_tok"].append(start)
            if tok > 0:
                first = start // ctx_len
                rows["first_chunk"].append(first)
                rows["n_chunks"].append((start + tok - 1) // ctx_len - first + 1)
            else:
                rows["first_chunk"].append(None)
                rows["n_chunks"].append(0)
            start += tok
        state.update((int(start),))
        yield pd.DataFrame(rows)

    return (
        base.groupBy("bucket")
        .applyInPandasWithState(fn, out_schema, _STATE_SCHEMA,
                                "append", GroupStateTimeout.NoTimeout)
    )
