"""Perceptual image hashing (functions/perceptual.py) + Hamming-blocked
image near-dup (multimodal.image_near_duplicates over
dedup.hamming_near_duplicates).

Kernel tests pin the integer-exact aHash/dHash semantics on
hand-computed grids and verify the generated DCT basis against the
O(n^4) direct transform (the JPEG-codec discipline); Spark tests drive
the full decode → hash → banded-blocking plan and its exact-recall
guarantee on planted near-duplicate images.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from themis_spark.functions import imagecodec as IC
from themis_spark.functions import perceptual as P
from themis_spark.operators import dedup as D
from themis_spark.operators import multimodal as M


def _img(gray: np.ndarray) -> np.ndarray:
    """Constant-channel RGB image from a grayscale grid (BT.601 of
    (v,v,v) is exactly v)."""
    return np.repeat(gray.astype(np.uint8)[:, :, None], 3, axis=2)


# ----------------------------------------------------------- kernels

def test_grayscale_bt601_floor_semantics():
    img = np.zeros((1, 2, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)   # 299*255/1000 = 76.245 -> 76
    img[0, 1] = (0, 0, 255)   # 114*255/1000 = 29.07  -> 29
    g = P.grayscale_bt601(img)
    assert g.tolist() == [[76, 29]]
    # constant channels gray to exactly v
    assert P.grayscale_bt601(_img(np.array([[123]]))).tolist() == [[123]]


def test_diff_hash_hand_computed():
    # 9x8 horizontal ramp: downsample is identity, every right neighbor
    # strictly brighter -> all 64 bits set
    gray = np.tile(np.arange(9), (8, 1))
    assert P.diff_hash(_img(gray)) == (1 << 64) - 1
    # flat image -> no strict increase anywhere -> 0
    assert P.diff_hash(_img(np.full((8, 9), 7))) == 0


def test_average_hash_hand_computed():
    # 8x8 ramp g(x,y)=x: total=224, bit set iff x*64 > 224/8... i.e.
    # g*64 > 224 per sample -> x >= 4 -> nibble 0xF0 per row
    gray = np.tile(np.arange(8), (8, 1))
    assert P.average_hash(_img(gray)) == 0xF0F0F0F0F0F0F0F0
    # flat image: no sample strictly above the mean -> 0
    assert P.average_hash(_img(np.full((8, 8), 9))) == 0


def test_dct_basis_matches_direct_transform():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(8, 8))
    m = P._dct_matrix(8)
    n = 8
    direct = np.zeros((n, n))
    for u in range(n):
        for v in range(n):
            s = 0.0
            for x in range(n):
                for y in range(n):
                    s += (a[x, y]
                          * np.cos(np.pi * (2 * x + 1) * u / (2 * n))
                          * np.cos(np.pi * (2 * y + 1) * v / (2 * n)))
            cu = np.sqrt(1 / n) if u == 0 else np.sqrt(2 / n)
            cv = np.sqrt(1 / n) if v == 0 else np.sqrt(2 / n)
            direct[u, v] = cu * cv * s
    assert np.allclose(m @ a @ m.T, direct, atol=1e-10)


def test_hashes_survive_resize_and_reencode():
    # block-structured image (a natural-image stand-in with broadband
    # spectrum — LINEAR gradients are pHash's degenerate case: all low
    # AC coefficients sit at ~0 so median-threshold bits are noise); a
    # nearest-neighbor resized copy and a PNG re-encode must hash
    # identically, a different image must land far
    rng = np.random.default_rng(9)
    blocky = lambda s: _img(np.repeat(np.repeat(s, 4, axis=0), 8, axis=1))
    base = blocky(rng.integers(0, 256, (8, 6), dtype=np.uint8))
    other = blocky(rng.integers(0, 256, (8, 6), dtype=np.uint8))
    resized = IC.resize_nearest(base, 36, 24)
    reencoded = IC.decode_png(IC.encode_png(base))
    for fn in (P.average_hash, P.diff_hash, P.dct_hash):
        assert bin(fn(base) ^ fn(reencoded)).count("1") == 0, fn.__name__
        assert bin(fn(base) ^ fn(resized)).count("1") == 0, fn.__name__
        assert bin(fn(base) ^ fn(other)).count("1") > 12, fn.__name__


def test_to_signed64():
    assert P.to_signed64(5) == 5
    assert P.to_signed64((1 << 64) - 1) == -1
    assert P.to_signed64(1 << 63) == -(1 << 63)


# ------------------------------------------------------ spark operators

def _media(spark, imgs: list[np.ndarray]):
    rows = [(i, bytearray(IC.encode_ppm(img))) for i, img in enumerate(imgs)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_perceptual_hashes_match_kernels(spark):
    rng = np.random.default_rng(11)
    imgs = [rng.integers(0, 256, (12, 17, 3), dtype=np.uint8)
            for _ in range(6)]
    out = {r["doc_id"]: r for r in
           M.perceptual_hashes(_media(spark, imgs),
                               methods=("ahash", "dhash", "phash")).collect()}
    for i, img in enumerate(imgs):
        assert out[i]["ahash"] == P.to_signed64(P.average_hash(img))
        assert out[i]["dhash"] == P.to_signed64(P.diff_hash(img))
        assert out[i]["phash"] == P.to_signed64(P.dct_hash(img))


def test_perceptual_hashes_rejects_unknown_method(spark):
    df = _media(spark, [np.zeros((8, 8, 3), dtype=np.uint8)])
    with pytest.raises(ValueError):
        M.perceptual_hashes(df, methods=("md5ish",))


def test_hamming_near_duplicates_pigeonhole_guard(spark):
    sigs = spark.createDataFrame([(0, 1)], "doc_id long, sig long")
    with pytest.raises(ValueError):
        D.hamming_near_duplicates(sigs, max_hamming=4)  # 64/16 covers <= 3
    with pytest.raises(ValueError):
        D.hamming_near_duplicates(sigs, bits=64, block_bits=17)


def test_hamming_near_duplicates_exact_recall(spark):
    # brute-force ground truth over random 64-bit signatures + planted
    # near pairs: banding must find EXACTLY the hamming<=3 set
    rng = np.random.default_rng(5)
    sigs = [int(rng.integers(0, 1 << 63)) for _ in range(40)]
    for i in range(0, 12, 2):  # plant near pairs: flip <=3 bits
        sigs[i + 1] = sigs[i] ^ sum(1 << int(b) for b in
                                    rng.choice(64, size=(i % 3) + 1,
                                               replace=False))
    signed = [P.to_signed64(s % (1 << 64)) for s in sigs]
    expected = sorted(
        (a, b) for a in range(40) for b in range(a + 1, 40)
        if bin((signed[a] ^ signed[b]) & ((1 << 64) - 1)).count("1") <= 3)
    df = spark.createDataFrame(list(enumerate(signed)),
                               "doc_id long, sig long")
    got = sorted((r["a_key"], r["b_key"]) for r in
                 D.hamming_near_duplicates(df, max_hamming=3).collect())
    assert got == expected and len(expected) >= 6


def test_image_near_duplicates_end_to_end(spark):
    # three groups: each group = one gradient + a one-pixel variant
    # (near-dup, small hamming) ; cross-group gradients differ
    # gradients must differ in SIGN structure, not just slope — dHash
    # records only the sign of horizontal differences, so any two
    # monotone-rising ramps hash identically
    x = np.arange(20).reshape(1, -1)
    y = np.arange(16).reshape(-1, 1)
    imgs = []
    for grid in [5 * x + 3 * y,            # rising in x
                 150 - 5 * x + 3 * y,      # falling in x
                 (x % 4) * 50 + 2 * y]:    # sawtooth in x
        base = (grid % 256).astype(np.uint8)
        var = base.copy()
        var[0, 0] = (int(var[0, 0]) + 40) % 200
        imgs += [_img(base), _img(var)]
    pairs = M.image_near_duplicates(_media(spark, imgs),
                                    method="dhash", max_hamming=3).collect()
    found = {(r["a_key"], r["b_key"]) for r in pairs}
    for g in range(3):
        assert (2 * g, 2 * g + 1) in found, (g, found)
    # no cross-group pair sneaks in
    for (a, b) in found:
        assert a // 2 == b // 2, (a, b)


def test_image_near_duplicates_plan_shape(spark):
    df = _media(spark, [np.zeros((8, 9, 3), dtype=np.uint8)])
    plan = (M.image_near_duplicates(df)
            ._jdf.queryExecution().executedPlan().toString())
    # payload bytes never shuffle: hashes are map-side, the only
    # exchanges carry (band, 8-byte sig) rows
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload" not in line, line
    assert plan.count("MapInPandas") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------ audio fingerprint

def _wav(vals: np.ndarray) -> bytes:
    import struct

    data = np.asarray(vals).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    return (b"RIFF" + (4 + 8 + len(fmt) + 8 + len(data)).to_bytes(4, "little")
            + b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)


def test_audio_energy_hash_hand_computed():
    from themis_spark.functions import audiocodec as AC

    # 65 spans of 2 samples with strictly rising |amplitude| -> all bits
    vals = np.repeat(np.arange(1, 66), 2)
    _, samples = AC.decode_wav(_wav(vals))
    assert P.audio_energy_hash(samples) == (1 << 64) - 1
    # constant amplitude -> no strict increase -> 0
    _, flat = AC.decode_wav(_wav(np.full(130, 7)))
    assert P.audio_energy_hash(flat) == 0
    # silence / empty
    assert P.audio_energy_hash(np.zeros((0, 1))) == 0


def test_audio_energy_hash_gain_invariant():
    from themis_spark.functions import audiocodec as AC

    rng = np.random.default_rng(13)
    vals = rng.integers(-500, 500, 1300)
    _, a = AC.decode_wav(_wav(vals))
    _, b = AC.decode_wav(_wav(vals * 8))  # +18 dB, no clipping
    assert P.audio_energy_hash(a) == P.audio_energy_hash(b)


def test_audio_near_duplicates_end_to_end(spark):
    rng = np.random.default_rng(17)
    base = rng.integers(-800, 800, 1300)
    tweak = base.copy()
    tweak[:20] = tweak[:20] + 50          # one span's energy nudged
    other = rng.integers(-800, 800, 1300)
    rows = [(i, bytearray(_wav(v))) for i, v in enumerate([base, tweak, other])]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {(r["a_key"], r["b_key"]): r["hamming"]
             for r in M.audio_near_duplicates(df, max_hamming=3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 2
    assert (0, 2) not in pairs and (1, 2) not in pairs
