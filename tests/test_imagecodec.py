"""Builtin numpy image codecs + the real multimodal kernels they power:
PPM/BMP round-trips, nearest-neighbor resize, concatenated-P6 video
frame sampling — pure-python units first, then the Spark mapInPandas
kernels end-to-end on real pixels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from themis_spark.functions import imagecodec as IC
from themis_spark.operators import multimodal as M


def _gradient(h: int, w: int) -> np.ndarray:
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.arange(h, dtype=np.uint8)[:, None]
    img[:, :, 2] = 7
    return img


# ------------------------------------------------------------------ codecs

def test_ppm_roundtrip():
    img = _gradient(5, 9)
    payload = IC.encode_ppm(img)
    assert IC.sniff_format(payload) == "ppm"
    out = IC.decode_ppm(payload)
    assert out.shape == (5, 9, 3) and (out == img).all()


def test_ppm_header_comments_and_whitespace():
    img = _gradient(2, 3)
    payload = b"P6\n# a comment\n 3\t2 # inline\n255\n" + img.tobytes()
    out = IC.decode_ppm(payload)
    assert out.shape == (2, 3, 3) and (out == img).all()


def test_bmp_roundtrip_with_row_padding():
    # width 3 -> 9-byte rows padded to 12: exercises the stride logic
    img = _gradient(4, 3)
    payload = IC.encode_bmp(img)
    assert IC.sniff_format(payload) == "bmp"
    out = IC.decode_bmp(payload)
    assert out.shape == (4, 3, 3) and (out == img).all()


def test_decode_image_rejects_compressed():
    with pytest.raises(IC.UnsupportedImageError):
        IC.decode_image(b"\x89PNG\r\n\x1a\nxxxx")


def test_resize_nearest_shape_and_determinism():
    img = _gradient(10, 20)
    small = IC.resize_nearest(img, 5, 4)
    assert small.shape == (4, 5, 3)
    # upscale keeps corner pixels
    big = IC.resize_nearest(img, 40, 20)
    assert big.shape == (20, 40, 3)
    assert (big[0, 0] == img[0, 0]).all() and (big[-1, -1] == img[-1, -1]).all()


def test_video_offsets_and_frame_decode():
    frames = [_gradient(3, 4), _gradient(3, 4) + 1, _gradient(3, 4) + 2]
    payload = b"".join(IC.encode_ppm(f) for f in frames)
    offs = IC.video_frame_offsets(payload)
    assert [(w, h) for _, w, h in offs] == [(4, 3)] * 3
    for i, (off, _, _) in enumerate(offs):
        assert (IC.decode_video_frame(payload, off) == frames[i]).all()


# ----------------------------------------------------------- spark kernels

def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary")


def test_extract_media_meta_real_decode(spark):
    payloads = [
        IC.encode_ppm(_gradient(6, 8)),
        IC.encode_bmp(_gradient(5, 3)),
        b"".join(IC.encode_ppm(_gradient(2, 2)) for _ in range(4)),  # ppmv
    ]
    meta = {r["doc_id"]: r for r in M.extract_media_meta(
        _media_df(spark, payloads), deterministic_fake=False).collect()}
    assert (meta[0]["format"], meta[0]["width"], meta[0]["height"]) == ("ppm", 8, 6)
    assert (meta[1]["format"], meta[1]["width"], meta[1]["height"]) == ("bmp", 3, 5)
    assert (meta[2]["format"], meta[2]["n_frames"]) == ("ppmv", 4)
    for i, p in enumerate(payloads):
        assert meta[i]["n_bytes"] == len(p)
        assert meta[i]["sha256"] == hashlib.sha256(p).hexdigest()


def test_resize_images_real_pixels(spark):
    img = _gradient(10, 20)
    out = M.resize_images(
        _media_df(spark, [IC.encode_ppm(img), IC.encode_bmp(img)]),
        target=(5, 4)).collect()
    expected = IC.encode_ppm(IC.resize_nearest(img, 5, 4))
    by_id = {r["doc_id"]: r for r in out}
    assert bytes(by_id[0]["resized"]) == expected
    assert bytes(by_id[1]["resized"]) == expected  # same pixels via bmp
    assert by_id[0]["src_format"] == "ppm" and by_id[1]["src_format"] == "bmp"


def test_frame_sample_real_frames(spark):
    frames = [_gradient(3, 4) + i for i in range(5)]
    payload = b"".join(IC.encode_ppm(f) for f in frames)
    rows = M.frame_sample(_media_df(spark, [payload]), every_n=2).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r in rows:
        want = hashlib.sha256(frames[r["frame_idx"]].tobytes()).hexdigest()
        assert r["frame_sha"] == want and (r["width"], r["height"]) == (4, 3)
