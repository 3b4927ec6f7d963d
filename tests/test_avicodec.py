"""AVI/MJPEG container codec (functions/avicodec.py) and its Spark
paths (multimodal.frame_sample / extract_media_meta / decode_image).

Round-trips are BIT-EXACT in the constant-fill + all-ones-quant regime
(same exactness contract as the JPEG codec tests); malformed containers
must fail loudly, never return a wrong frame table.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from themis_spark.functions import avicodec as AV
from themis_spark.functions import imagecodec as IC


def _clip(n=4, w=8, h=6, base=97, **kw):
    frames = [np.full((h, w, 3), base + i * 5, dtype=np.uint8)
              for i in range(n)]
    return frames, AV.encode_avi_mjpeg(frames, **kw)


def test_meta_is_header_only_and_exact():
    _, payload = _clip(n=5, w=10, h=4, fps=25)
    m = AV.avi_meta(payload)
    assert m == {"width": 10, "height": 4, "n_frames": 5,
                 "us_per_frame": 40000, "handler": "MJPG"}


def test_round_trip_constant_frames_bit_exact():
    frames, payload = _clip(n=4)
    chunks = AV.avi_frame_chunks(payload)
    assert len(chunks) == 4
    for i, (off, size) in enumerate(chunks):
        out = AV.decode_avi_frame(payload, off, size)
        assert np.array_equal(out, frames[i])


@pytest.mark.parametrize("kw", [dict(subsampling="420"),
                                dict(restart_interval=2),
                                dict(subsampling="420", restart_interval=1)])
def test_round_trip_420_and_restart_markers(kw):
    frames, payload = _clip(n=3, w=9, h=5, **kw)  # odd dims: used-grid
    for i, (off, size) in enumerate(AV.avi_frame_chunks(payload)):
        assert np.array_equal(AV.decode_avi_frame(payload, off, size),
                              frames[i])


def test_malformed_containers_raise():
    _, payload = _clip()
    with pytest.raises(AV.AviError):
        AV.avi_meta(payload[:40])  # truncated mid-header
    with pytest.raises(AV.AviError):
        AV.avi_meta(b"RIFF" + struct.pack("<I", 4) + b"WAVE")  # not AVI
    # declared chunk size overrunning the container must not be walked
    bad = bytearray(payload)
    movi_at = payload.index(b"movi")
    dc_at = payload.index(b"00dc", movi_at)
    struct.pack_into("<I", bad, dc_at + 4, 1 << 30)
    with pytest.raises(AV.AviError):
        AV.avi_frame_chunks(bytes(bad))


def test_mismatched_frame_dims_refused():
    frames = [np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)]
    with pytest.raises(AV.AviError):
        AV.encode_avi_mjpeg(frames)


def test_sniff_and_still_decode_dispatch():
    frames, payload = _clip()
    assert IC.sniff_format(payload) == "avi"
    fmt, img = IC.decode_image(payload)  # stills path = first frame
    assert fmt == "avi" and np.array_equal(img, frames[0])


def test_spark_frame_sample_and_meta(spark):
    import themis_spark.operators.multimodal as M

    rows = []
    expect = {}
    for doc_id in range(6):
        n = doc_id % 3 + 2
        frames = [np.full((5, 7, 3), 40 + doc_id * 10 + i, dtype=np.uint8)
                  for i in range(n)]
        rows.append((doc_id, bytearray(AV.encode_avi_mjpeg(frames))))
        for i in range(0, n, 2):
            expect[(doc_id, i)] = hashlib.sha256(
                frames[i].tobytes()).hexdigest()
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    got = {(r["doc_id"], r["frame_idx"]): r["frame_sha"]
           for r in M.frame_sample(df, every_n=2).collect()}
    assert got == expect

    meta = {r["doc_id"]: r for r in M.extract_media_meta(
        df, deterministic_fake=False).collect()}
    for doc_id in range(6):
        m = meta[doc_id]
        assert (m["format"], m["width"], m["height"], m["n_frames"]) == \
            ("avi", 7, 5, doc_id % 3 + 2)
