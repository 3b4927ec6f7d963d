"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED behind import guards — this
container has no image/audio libraries — but everything Spark-side is
real and tested: schemas, batch shapes, partitioning, UDF signatures.
``deterministic_fake=True`` substitutes a seeded fake decoder so the
distributed plumbing is verifiable end-to-end; installing Pillow/librosa
on a real cluster replaces one function.

Design point for 100 TB of media: binary payloads NEVER shuffle — all
feature extraction is map-side (mapInPandas over the scan), and outputs
are small typed columns. Batch size is bounded by bytes, not rows
(spark.sql.execution.arrow.maxRecordsPerBatch in session.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_META_SCHEMA = (
    "n_bytes bigint, sha256 string, format string, width int, height int, n_frames int"
)


def _decode_real(payload: bytes) -> tuple:
    if not _HAS_PIL:
        raise NotImplementedError(
            "real image decode requires Pillow; run with deterministic_fake=True "
            "in this sandbox or install PIL on the cluster"
        )
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return (img.format or "unknown", img.width, img.height, getattr(img, "n_frames", 1))


def _decode_fake(payload: bytes) -> tuple:
    """Deterministic fake decode: metadata derived from the payload bytes
    so results are stable across runs/partitionings."""
    h = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    return ("fake", 16 + h % 1024, 16 + (h >> 10) % 1024, 1 + h % 8)


def extract_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    key_cols: tuple[str, ...] = ("doc_id",),
    deterministic_fake: bool = True,
) -> DataFrame:
    """binary payload → typed metadata rows, Arrow batch at a time."""
    decode = _decode_fake if deterministic_fake else _decode_real
    key_schema = ", ".join(f"{k} bigint" for k in key_cols)
    out_schema = f"{key_schema}, {MEDIA_META_SCHEMA}"
    keys = list(key_cols)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                payload = bytes(payload) if payload is not None else b""
                fmt, w, h, nf = decode(payload)
                rows.append(
                    [row[k] for k in keys]
                    + [len(payload), hashlib.sha256(payload).hexdigest(), fmt, w, h, nf]
                )
            yield pd.DataFrame(
                rows,
                columns=keys + ["n_bytes", "sha256", "format", "width", "height", "n_frames"],
            )

    return df.select(*keys, payload_col).mapInPandas(process, out_schema)


def resize_stub(df: DataFrame, payload_col: str = "payload",
                key_cols: tuple[str, ...] = ("doc_id",),
                target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Resize plumbing: passes payload bytes through the Arrow boundary
    and back (the real kernel would transform them). Output schema and
    batch mechanics are production-shaped."""
    keys = list(key_cols)
    key_schema = ", ".join(f"{k} bigint" for k in keys)
    out_schema = f"{key_schema}, resized binary, target_w int, target_h int"
    tw, th = target

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    **{k: pdf[k] for k in keys},
                    "resized": pdf[payload_col],  # identity stub
                    "target_w": tw,
                    "target_h": th,
                }
            )

    return df.select(*keys, payload_col).mapInPandas(process, out_schema)


def frame_sample_stub(df: DataFrame, payload_col: str = "payload",
                      key_cols: tuple[str, ...] = ("doc_id",), every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (explodes inside the Arrow batch — realistic fan-out shape)."""
    keys = list(key_cols)
    key_schema = ", ".join(f"{k} bigint" for k in keys)
    out_schema = f"{key_schema}, frame_idx int, frame_sha string"

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col] or b"")
                _, _, _, nf = _decode_fake(payload)
                for i in range(0, nf, max(every_n, 1)):
                    sha = hashlib.sha256(payload + i.to_bytes(4, "big")).hexdigest()
                    rows.append([row[k] for k in keys] + [i, sha])
            yield pd.DataFrame(rows, columns=keys + ["frame_idx", "frame_sha"])

    return df.select(*keys, payload_col).mapInPandas(process, out_schema)


def binary_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Native (no-Python) binary column stats: sizes without decoding."""
    size = F.length(F.col(payload_col))
    return df.agg(
        F.count(F.col(payload_col)).alias("cnt"),
        F.sum(size).alias("total_bytes"),
        F.min(size).alias("min_bytes"),
        F.max(size).alias("max_bytes"),
        F.avg(size).alias("avg_bytes"),
    )
