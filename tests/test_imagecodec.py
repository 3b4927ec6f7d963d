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


# --------------------------------------------------------------------- PNG

def _noisy(h: int, w: int) -> np.ndarray:
    # deterministic non-constant pixels: every filter produces distinct
    # encoded bytes, so each unfilter path is genuinely exercised
    idx = np.arange(h * w * 3, dtype=np.int64)
    return ((idx * 97 + (idx * idx) % 251) % 256).astype(np.uint8).reshape(h, w, 3)


def test_png_roundtrip_every_filter():
    img = _noisy(11, 7)
    for f in range(5):
        payload = IC.encode_png(img, row_filters=[f])
        assert IC.sniff_format(payload) == "png"
        out = IC.decode_png(payload)
        assert out.shape == (11, 7, 3) and (out == img).all(), f"filter {f}"
    # mixed filters across rows (the realistic encoder output)
    payload = IC.encode_png(img, row_filters=[0, 1, 2, 3, 4])
    assert (IC.decode_png(payload) == img).all()
    fmt, out = IC.decode_image(payload)
    assert fmt == "png" and (out == img).all()


def _png_handbuilt(w, h, ctype, scanlines, plte=None):
    import zlib

    def chunk(t, d):
        return (len(d).to_bytes(4, "big") + t + d
                + zlib.crc32(t + d).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, ctype, 0, 0, 0]))
    raw = b"".join(b"\x00" + s for s in scanlines)
    out = IC._PNG_SIG + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_grayscale_palette_rgba():
    # grayscale (ctype 0) expands to RGB
    gray = _png_handbuilt(3, 2, 0, [bytes([10, 20, 30]), bytes([40, 50, 60])])
    out = IC.decode_png(gray)
    assert out.shape == (2, 3, 3) and (out[0, 1] == [20, 20, 20]).all()
    # palette (ctype 3) resolves through PLTE
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    pal = _png_handbuilt(3, 1, 3, [bytes([2, 0, 1])], plte=plte)
    out = IC.decode_png(pal)
    assert (out[0] == [[0, 0, 255], [255, 0, 0], [0, 255, 0]]).all()
    # RGBA (ctype 6) drops alpha
    rgba = _png_handbuilt(2, 1, 6, [bytes([1, 2, 3, 9, 4, 5, 6, 9])])
    out = IC.decode_png(rgba)
    assert (out[0] == [[1, 2, 3], [4, 5, 6]]).all()


def test_png_rejects_unsupported_variants():
    img = _noisy(2, 2)
    ok = IC.encode_png(img)
    # 16-bit depth
    deep = bytearray(ok)
    deep[24] = 16  # IHDR bit-depth byte
    with pytest.raises(IC.UnsupportedImageError):
        IC.decode_png(bytes(deep))
    # Adam7 interlace
    inter = bytearray(ok)
    inter[28] = 1  # IHDR interlace byte (crc mismatch irrelevant: we don't check crc)
    with pytest.raises(IC.UnsupportedImageError):
        IC.decode_png(bytes(inter))
    # truncated pixel stream
    with pytest.raises(IC.UnsupportedImageError):
        IC.decode_png(b"\x89PNG\r\n\x1a\nxxxx")


def test_resize_images_decodes_png(spark):
    img = _gradient(10, 20)
    out = M.resize_images(
        _media_df(spark, [IC.encode_png(img, row_filters=[0, 1, 2, 3, 4])]),
        target=(5, 4)).collect()
    expected = IC.encode_ppm(IC.resize_nearest(img, 5, 4))
    assert bytes(out[0]["resized"]) == expected
    assert out[0]["src_format"] == "png"


def test_extract_media_meta_real_decode_png(spark):
    img = _gradient(6, 9)
    rows = M.extract_media_meta(
        _media_df(spark, [IC.encode_png(img)]),
        deterministic_fake=False).collect()
    r = rows[0]
    assert (r["format"], r["width"], r["height"], r["n_frames"]) == ("png", 9, 6, 1)


def test_adam7_interlaced_round_trip():
    import numpy as np

    from themis_spark.functions import imagecodec as IC

    rng = np.random.default_rng(5)
    # edge sizes exercise empty passes (<8 px axes) and every filter
    for (h, w) in [(1, 1), (2, 3), (7, 5), (8, 8), (13, 17), (9, 1), (1, 9)]:
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        for filters in (None, [0, 1, 2, 3, 4]):
            p = IC.encode_png(img, row_filters=filters, interlace=True)
            assert np.array_equal(IC.decode_png(p), img), (h, w, filters)


def test_adam7_truncated_pass_raises():
    import numpy as np
    import pytest
    import zlib

    from themis_spark.functions import imagecodec as IC

    img = np.zeros((16, 16, 3), np.uint8)
    p = bytearray(IC.encode_png(img, interlace=True))
    # shrink the IDAT payload: recompress a truncated raw stream
    sig_end = 8
    pos = sig_end
    out = bytearray(p[:sig_end])
    while pos < len(p):
        ln = int.from_bytes(p[pos:pos + 4], "big")
        typ = bytes(p[pos + 4:pos + 8])
        data = bytes(p[pos + 8:pos + 8 + ln])
        if typ == b"IDAT":
            raw = zlib.decompress(data)[:-10]
            data = zlib.compress(raw)
            ln = len(data)
        out += ln.to_bytes(4, "big") + typ + data \
            + zlib.crc32(typ + data).to_bytes(4, "big")
        pos += 12 + int.from_bytes(p[pos:pos + 4], "big")
    with pytest.raises(IC.UnsupportedImageError):
        IC.decode_png(bytes(out))
