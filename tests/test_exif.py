"""EXIF orientation: APP1/TIFF parse, the 8 upright transforms, and the
normalization wiring through resize/perceptual-hash/oriented_decode.

The transform oracle is the involution property: for each orientation o
the camera stores ``inverse_o(scene)``; applying the correction must
reproduce the scene array exactly (integer index permutations — exact).
This catches direction mistakes (e.g. o=6 corrected CCW instead of CW
yields rot180 of the scene, not the scene).
"""

from __future__ import annotations

import numpy as np
import pytest

from themis_spark.functions import imagecodec as IC
from themis_spark.functions import jpegcodec as JC

SCENE = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)

# what a camera would STORE for each orientation value (the inverse of
# the correction transform applied to the upright scene)
STORED = {
    1: SCENE,
    2: SCENE[:, ::-1],
    3: SCENE[::-1, ::-1],
    4: SCENE[::-1],
    5: np.transpose(SCENE, (1, 0, 2)),
    6: np.rot90(SCENE, 1),   # correction is CW90 → stored is CCW90
    7: np.transpose(SCENE, (1, 0, 2))[::-1, ::-1],
    8: np.rot90(SCENE, 3),
}


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_apply_orientation_recovers_scene(o):
    out = IC.apply_exif_orientation(STORED[o], o)
    assert np.array_equal(out, SCENE), o


def test_missing_and_malformed_exif_is_none():
    plain = JC.encode_jpeg_baseline(np.full((3, 4, 3), 7, np.uint8))
    assert JC.jpeg_exif_orientation(plain) is None
    # APP1 present but gibberish TIFF: advisory metadata → None, and the
    # stream must still pixel-decode
    import struct

    body = b"Exif\x00\x00" + b"XX" + b"\x00" * 10
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    tampered = plain[:2] + seg + plain[2:]
    assert JC.jpeg_exif_orientation(tampered) is None
    assert JC.decode_jpeg(tampered).shape == (3, 4, 3)


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_splice_then_parse_round_trip(o):
    plain = JC.encode_jpeg_baseline(np.full((3, 4, 3), 50, np.uint8))
    assert JC.jpeg_exif_orientation(
        JC.insert_exif_orientation(plain, o)) == o


def test_big_endian_tiff_parses():
    import struct

    plain = JC.encode_jpeg_baseline(np.full((3, 4, 3), 50, np.uint8))
    tiff = (b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 0x0112, 3, 1)
            + struct.pack(">HH", 6, 0) + struct.pack(">I", 0))
    body = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert JC.jpeg_exif_orientation(plain[:2] + seg + plain[2:]) == 6


def test_oriented_decode_swaps_display_dims(spark):
    import themis_spark.operators.multimodal as M

    img = np.full((3, 7, 3), 80, np.uint8)  # stored 7×3
    rows = [(int(o), bytearray(JC.insert_exif_orientation(
        JC.encode_jpeg_baseline(img), o))) for o in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in M.oriented_decode(df).collect()}
    for o in range(1, 9):
        r = got[o]
        assert r["orientation"] == o
        expect = (3, 7) if o >= 5 else (7, 3)  # display (w, h)
        assert (r["width"], r["height"]) == expect, o


def test_perceptual_hash_is_rotation_invariant_with_exif(spark):
    # the same gradient photo uploaded upright and stored-rotated-with-
    # EXIF must hash IDENTICALLY once orientation is normalized
    import themis_spark.operators.multimodal as M

    rng = np.random.default_rng(3)
    scene = (rng.integers(0, 255, (16, 24, 3))).astype(np.uint8)
    upright = IC.encode_ppm(scene)  # lossless container, orientation 1
    stored = np.ascontiguousarray(np.rot90(scene, 1))  # camera CCW90
    rotated_jpeg = JC.insert_exif_orientation(
        JC.encode_jpeg_baseline(stored), 6)
    df = spark.createDataFrame(
        [(0, bytearray(upright)), (1, bytearray(rotated_jpeg))],
        "doc_id long, payload binary")
    h = {r["doc_id"]: (r["ahash"], r["dhash"])
         for r in M.perceptual_hashes(df).collect()}
    # all-ones-quant JPEG is near-lossless on gradients; aHash/dHash
    # bucket to 8×8 means so residual quant noise cancels
    assert h[0] == h[1], h
