"""Progressive JPEG codec (T.81 Annex G): exact coefficient-level
equivalence with the baseline codec, scan-script variants, restart
markers, partial (display-order) streams, and the Spark decode path.

The load-bearing property: a progressive stream whose successive-
approximation script descends to Al=0 reconstructs EXACTLY the same
quantized coefficients as a baseline stream of the same image and
quant tables, so decoded pixels must be byte-identical between the two
codecs — a much stronger oracle than an error bound."""

import numpy as np
import pytest

from themis_spark.functions.imagecodec import UnsupportedImageError
from themis_spark.functions.jpegcodec import (
    decode_jpeg,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    jpeg_dims,
)
from themis_spark.functions.jpegprogressive import (
    decode_jpeg_progressive,
    default_scan_script,
    encode_jpeg_progressive,
    spectral_only_script,
)


def _gradient(h, w):
    g = (np.linspace(0, 255, h * w).reshape(h, w)).astype(np.uint8)
    return np.stack([g, g[::-1], np.roll(g, 3, axis=1)], axis=-1)


def _assert_equals_baseline(img, **kw):
    prog = decode_jpeg_progressive(encode_jpeg_progressive(img, **kw))
    base = decode_jpeg_baseline(encode_jpeg_baseline(
        img, qtable_luma=kw.get("qtable_luma"),
        qtable_chroma=kw.get("qtable_chroma"),
        subsampling=kw.get("subsampling", "444")))
    assert np.array_equal(prog, base), (img.shape, kw)


def test_default_script_matches_baseline_exactly():
    # odd dims exercise partial MCUs; 20x20 at 4:2:0 exercises the
    # used-grid vs full-MCU-grid distinction in non-interleaved scans
    for shape in ((8, 8), (7, 10), (17, 23), (20, 20), (16, 16)):
        img = _gradient(*shape)
        for sub in ("444", "420"):
            _assert_equals_baseline(img, subsampling=sub)


def test_noise_and_flat_regions_match_baseline():
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, (24, 19, 3), dtype=np.uint8)
    _assert_equals_baseline(noise)
    _assert_equals_baseline(noise, subsampling="420")
    # long flat runs force multi-block EOB runs interleaved with
    # refinement correction bits — the fiddliest wire format
    flat = np.full((48, 48, 3), 130, dtype=np.uint8)
    flat[30, 31] = (17, 200, 99)
    _assert_equals_baseline(flat)
    _assert_equals_baseline(flat, subsampling="420")


def test_spectral_only_script_matches_baseline():
    img = _gradient(17, 14)
    for sub in ("444", "420"):
        payload = encode_jpeg_progressive(
            img, subsampling=sub, scans=spectral_only_script(3))
        base = decode_jpeg_baseline(encode_jpeg_baseline(
            img, subsampling=sub))
        assert np.array_equal(decode_jpeg_progressive(payload), base)


def test_grayscale_matches_baseline():
    g = (np.arange(15 * 11).reshape(15, 11) % 251).astype(np.uint8)
    prog = decode_jpeg_progressive(encode_jpeg_progressive(g))
    base = decode_jpeg_baseline(encode_jpeg_baseline(g))
    assert np.array_equal(prog, base)
    payload = encode_jpeg_progressive(g, scans=spectral_only_script(1))
    assert np.array_equal(decode_jpeg_progressive(payload), base)


def test_lossy_quant_tables_match_baseline():
    qt = np.full((8, 8), 16)
    qt[0, 0] = 8
    img = _gradient(21, 18)
    _assert_equals_baseline(img, qtable_luma=qt)
    _assert_equals_baseline(img, qtable_luma=qt,
                            qtable_chroma=np.full((8, 8), 24),
                            subsampling="420")


def test_restart_markers_do_not_change_pixels():
    img = _gradient(19, 25)
    plain = decode_jpeg_progressive(encode_jpeg_progressive(img))
    for ri in (1, 2, 5):
        with_rst = decode_jpeg_progressive(
            encode_jpeg_progressive(img, restart_interval=ri))
        assert np.array_equal(with_rst, plain), ri
    # restart + 4:2:0 + spectral-only
    p = encode_jpeg_progressive(img, subsampling="420", restart_interval=3,
                                scans=spectral_only_script(3))
    q = encode_jpeg_progressive(img, subsampling="420",
                                scans=spectral_only_script(3))
    assert np.array_equal(decode_jpeg_progressive(p),
                          decode_jpeg_progressive(q))


def test_partial_scan_script_decodes_coarse():
    # a stream carrying only the early scans is a VALID progressive
    # JPEG (that is the point of the format); the decoder must produce
    # the coarse preview, not crash
    img = _gradient(16, 16)
    # DC + a few luma AC only: decodes (chroma still flat, so coarse)
    first_two = default_scan_script(3)[:2]
    out2 = decode_jpeg_progressive(encode_jpeg_progressive(
        img, scans=first_two))
    assert out2.shape == img.shape
    # all Ah=0 scans but no refinement: every band present at reduced
    # precision — close to the image, not exact
    first_five = default_scan_script(3)[:5]
    out5 = decode_jpeg_progressive(encode_jpeg_progressive(
        img, scans=first_five))
    err5 = np.abs(out5.astype(int) - img.astype(int))
    assert err5.mean() < 8
    assert err5.mean() < np.abs(out2.astype(int) - img.astype(int)).mean()


def test_dispatch_and_dims():
    img = _gradient(9, 13)
    prog = encode_jpeg_progressive(img)
    base = encode_jpeg_baseline(img)
    assert np.array_equal(decode_jpeg(prog), decode_jpeg_progressive(prog))
    assert np.array_equal(decode_jpeg(base), decode_jpeg_baseline(base))
    assert jpeg_dims(prog) == (13, 9)
    # lossless SOF3 still refused loudly by the dispatcher
    sof3 = bytearray(base)
    i = sof3.find(b"\xff\xc0")
    sof3[i + 1] = 0xC3
    with pytest.raises(UnsupportedImageError, match="SOF3"):
        decode_jpeg(bytes(sof3))


def test_decode_bomb_guard_applies_to_progressive():
    img = _gradient(8, 8)
    payload = bytearray(encode_jpeg_progressive(img))
    i = payload.find(b"\xff\xc2")
    payload[i + 5:i + 9] = (65535).to_bytes(2, "big") * 2
    with pytest.raises(UnsupportedImageError, match="MAX_PIXELS"):
        decode_jpeg_progressive(bytes(payload))


def test_truncated_entropy_is_loud():
    img = _gradient(16, 16)
    payload = encode_jpeg_progressive(img)
    with pytest.raises(UnsupportedImageError):
        decode_jpeg_progressive(payload[:len(payload) // 2])


def test_spark_decode_path_progressive(spark):
    # the mapInPandas decode/resize path now accepts progressive payloads
    from themis_spark.operators.multimodal import (
        extract_media_meta,
        resize_images,
    )

    rows = []
    for i in range(8):
        img = np.full((3 + i % 5, 4 + i % 7, 3), 60 + i, dtype=np.uint8)
        rows.append((i, bytearray(encode_jpeg_progressive(
            img, subsampling="420" if i % 2 else "444"))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    meta = {r.doc_id: r for r in extract_media_meta(
        df, deterministic_fake=False).collect()}
    assert all(meta[i].format == "jpeg" for i in range(8))
    assert meta[1].width == 5 and meta[1].height == 4
    out = {r.doc_id: r for r in resize_images(df, target=(3, 2)).collect()}
    exp = b"P6\n3 2\n255\n" + bytes([60 + 1]) * 18
    assert bytes(out[1].resized) == exp
