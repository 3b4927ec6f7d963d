"""Pure-stdlib baseline JPEG codec: round-trip matrix, exactness
regimes, structural failure modes, and the Spark decode path."""

import numpy as np
import pytest

from themis_spark.functions.imagecodec import UnsupportedImageError
from themis_spark.functions.jpegcodec import (
    ZIGZAG,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    jpeg_dims,
)


def _gradient(h, w, seed=0):
    g = (np.linspace(0, 255, h * w).reshape(h, w)).astype(np.uint8)
    return np.stack([g, g[::-1], np.roll(g, 3, axis=1)], axis=-1)


def test_zigzag_is_the_standard_order():
    # generated, not transcribed — pin the well-known prefix/suffix
    assert ZIGZAG[:16] == [0, 1, 8, 16, 9, 2, 3, 10,
                           17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_constant_image_roundtrips_exactly():
    # all-ones quant tables: a constant block has ONE integer DC coeff
    # and every codec step is integer-preserving — bit-exact round trip
    for v in (0, 99, 128, 183, 255):
        img = np.full((7, 10, 3), v, dtype=np.uint8)
        for sub in ("444", "420"):
            dec = decode_jpeg_baseline(encode_jpeg_baseline(
                img, subsampling=sub))
            assert np.array_equal(dec, img), (v, sub)


def test_roundtrip_error_bounds():
    img = _gradient(17, 23)
    # 4:4:4 unit tables: only YCbCr<->RGB rounding — within ±2
    d = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert np.abs(d.astype(int) - img.astype(int)).max() <= 2
    # noise too (unit tables quantize nothing away)
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    d2 = decode_jpeg_baseline(encode_jpeg_baseline(noise))
    assert np.abs(d2.astype(int) - noise.astype(int)).max() <= 2
    # 4:2:0 with smooth chroma: averaging loses almost nothing
    g = img[..., 0]
    smooth = np.stack([g, g, g], axis=-1)
    d3 = decode_jpeg_baseline(encode_jpeg_baseline(smooth, subsampling="420"))
    assert np.abs(d3.astype(int) - smooth.astype(int)).max() <= 1
    # real (lossy) quant table: bounded but visibly lossy
    qt = np.full((8, 8), 16)
    qt[0, 0] = 8
    d4 = decode_jpeg_baseline(encode_jpeg_baseline(img, qtable_luma=qt))
    assert 2 < np.abs(d4.astype(int) - img.astype(int)).max() < 128


def test_grayscale_and_dims():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 13), dtype=np.uint8)
    enc = encode_jpeg_baseline(img)
    assert jpeg_dims(enc) == (13, 9)
    dec = decode_jpeg_baseline(enc)
    assert dec.shape == (9, 13, 3)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 1
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])


def test_restart_markers_do_not_change_pixels():
    img = _gradient(17, 23)
    base = decode_jpeg_baseline(encode_jpeg_baseline(img))
    for ri in (1, 2, 5):
        d = decode_jpeg_baseline(encode_jpeg_baseline(
            img, restart_interval=ri))
        assert np.array_equal(d, base), ri
    d420 = decode_jpeg_baseline(encode_jpeg_baseline(img, subsampling="420"))
    d420r = decode_jpeg_baseline(encode_jpeg_baseline(
        img, subsampling="420", restart_interval=1))
    assert np.array_equal(d420r, d420)


def test_structural_failures_are_loud():
    img = np.full((8, 8, 3), 10, dtype=np.uint8)
    enc = bytearray(encode_jpeg_baseline(img))
    with pytest.raises(UnsupportedImageError):
        decode_jpeg_baseline(b"\x89PNG not a jpeg")
    with pytest.raises(UnsupportedImageError):
        decode_jpeg_baseline(bytes(enc[:40]))  # truncated mid-header
    # flip SOF0 -> SOF2 (progressive): must refuse, not mis-decode
    sof = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:sof + 1]) + b"\xc2" + bytes(enc[sof + 2:])
    with pytest.raises(UnsupportedImageError):
        decode_jpeg_baseline(prog)
    with pytest.raises(UnsupportedImageError):
        encode_jpeg_baseline(img, subsampling="422")


def test_non_interleaved_multiscan_refused():
    # a conformant baseline stream MAY carry one scan per component;
    # the decoder reads only the first SOS, so it must refuse rather
    # than return a grayscale-replicated Y plane as "the image"
    import struct as _s
    img = np.full((8, 8, 3), 42, dtype=np.uint8)
    enc = bytes(encode_jpeg_baseline(img))
    sos = enc.find(b"\xff\xda")
    assert sos > 0
    ln = _s.unpack(">H", enc[sos + 2:sos + 4])[0]
    seg = enc[sos + 4:sos + 2 + ln]
    ns = seg[0]
    assert ns == 3
    # rewrite the SOS header to claim a single-component scan (Y only);
    # entropy bytes stay — the refusal fires before any entropy decode
    new_seg = bytes([1]) + seg[1:3] + seg[1 + 2 * ns:]
    new_sos = b"\xff\xda" + _s.pack(">H", len(new_seg) + 2) + new_seg
    patched = enc[:sos] + new_sos + enc[sos + 2 + ln:]
    with pytest.raises(UnsupportedImageError, match="non-interleaved"):
        decode_jpeg_baseline(patched)


def test_decode_bomb_guard():
    # hostile SOF dims must raise BEFORE allocating MCU planes
    import struct as _s
    from themis_spark.functions import jpegcodec as JC
    img = np.full((8, 8, 3), 42, dtype=np.uint8)
    enc = bytes(encode_jpeg_baseline(img))
    sof = enc.find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) H(2) W(2) ... -> patch H and W
    bomb = (enc[:sof + 5] + _s.pack(">HH", 65535, 65535)
            + enc[sof + 9:])
    with pytest.raises(UnsupportedImageError, match="MAX_PIXELS"):
        decode_jpeg_baseline(bomb)
    # but the header-only metadata path still reads the dims fine
    assert JC.jpeg_dims(bomb) == (65535, 65535)


def test_jpeg_dims_reads_every_sof_type():
    # metadata must succeed on progressive/arithmetic streams the full
    # decoder rejects (mm_meta over a real crawl hits SOF2 constantly)
    import struct as _s
    from themis_spark.functions import jpegcodec as JC

    def header_only(marker: int, w: int, h: int) -> bytes:
        seg = _s.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        return (b"\xff\xd8" + bytes([0xFF, marker])
                + _s.pack(">H", len(seg) + 2) + seg + b"\xff\xd9")

    for marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
        assert JC.jpeg_dims(header_only(marker, 123, 45)) == (123, 45)
    # SOF2 payload through the Arrow metadata path end-to-end is
    # covered by the mm_meta_dims oracle query
    with pytest.raises(UnsupportedImageError):
        decode_jpeg_baseline(header_only(0xC2, 123, 45))


def test_idct_matches_direct_definition():
    # the codec's matrix IDCT vs the textbook O(n^4) DCT-III sum
    import math
    rng = np.random.default_rng(11)
    coefs = rng.normal(0, 50, (8, 8))
    from themis_spark.functions.jpegcodec import _DCTM
    fast = _DCTM.T @ coefs @ _DCTM
    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt((1 if u == 0 else 2) / 8)
                    cv = math.sqrt((1 if v == 0 else 2) / 8)
                    s += (cu * cv * coefs[u, v]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            slow[x, y] = s
    assert np.abs(fast - slow).max() < 1e-9


def test_spark_decode_path(spark):
    # the mapInPandas decode/resize path accepts baseline JPEG payloads
    from themis_spark.operators.multimodal import (
        extract_media_meta,
        resize_images,
    )

    rows = []
    for i in range(12):
        img = np.full((3 + i % 5, 4 + i % 7, 3), 60 + i, dtype=np.uint8)
        rows.append((i, bytearray(encode_jpeg_baseline(
            img, subsampling="420" if i % 2 else "444"))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    meta = {r.doc_id: r for r in extract_media_meta(
        df, deterministic_fake=False).collect()}
    assert all(meta[i].format == "jpeg" for i in range(12))
    assert meta[1].width == 5 and meta[1].height == 4
    out = {r.doc_id: r for r in resize_images(df, target=(3, 2)).collect()}
    # constant fill survives decode+resize exactly: P6 header + fill
    exp = b"P6\n3 2\n255\n" + bytes([60 + 1]) * 18
    assert bytes(out[1].resized) == exp
