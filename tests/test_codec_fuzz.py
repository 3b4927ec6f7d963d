"""Codec fuzzing: untrusted crawl bytes against every builtin decoder.

Contract under test (the fail-closed posture of the multimodal stack):
for ARBITRARY bytes each decoder either returns a well-formed result or
raises its typed error (UnsupportedImageError / AviError) — never a
bare struct.error / IndexError / zlib.error that would surface as an
opaque executor crash, and never a hang. Plus hypothesis round-trip
properties for the lossless encoders.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from themis_spark.functions import avicodec as AV
from themis_spark.functions import gifcodec as GC
from themis_spark.functions import imagecodec as IC
from themis_spark.functions import jpegcodec as JC
from themis_spark.functions import webpcodec as WC

TYPED = (IC.UnsupportedImageError, AV.AviError)

MAGICS = [b"", b"P6", b"BM", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff",
          b"GIF89a", b"GIF87a", b"RIFF\x20\x00\x00\x00AVI ",
          b"RIFF\x20\x00\x00\x00WEBP"]


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(prefix=st.sampled_from(MAGICS), body=st.binary(max_size=400))
def test_decoders_fail_typed_on_garbage(prefix, body):
    payload = prefix + body
    for fn in (IC.decode_image, JC.jpeg_dims, JC.jpeg_exif_orientation,
               AV.avi_meta, AV.avi_frame_chunks, GC.gif_frame_meta,
               IC.video_frame_offsets, WC.webp_meta, WC.decode_webp):
        try:
            fn(payload)
        except TYPED:
            pass
        # anything else propagates and fails the test


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pos=st.integers(min_value=0, max_value=10_000),
       val=st.integers(min_value=0, max_value=255))
def test_single_byte_corruption_is_typed_or_decodes(pos, val):
    img = (np.arange(9 * 12 * 3, dtype=np.uint32) % 251).astype(np.uint8) \
        .reshape(9, 12, 3)
    fixtures = [
        IC.encode_png(img, row_filters=[0, 1, 2, 3, 4]),
        IC.encode_bmp(img),
        GC.encode_gif([img // 32 * 32]),
        JC.encode_jpeg_baseline(img),
        AV.encode_avi_mjpeg([img, img]),
        WC.encode_webp_vp8l(img, mode="lz77"),
        WC.encode_webp_vp8l(img // 64 * 64, mode="palette"),
    ]
    for payload in fixtures:
        mutated = bytearray(payload)
        p = pos % len(mutated)
        mutated[p] = val
        try:
            out = IC.decode_image(bytes(mutated))
            # wrong pixels are acceptable (entropy bytes carry no
            # integrity check — true of every codec); invalid SHAPES
            # are not
            assert isinstance(out[1], np.ndarray) and out[1].ndim == 3
        except TYPED:
            pass


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(h=st.integers(1, 12), w=st.integers(1, 12), seed=st.integers(0, 999))
def test_lossless_round_trips(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(IC.decode_png(IC.encode_png(img)), img)
    assert np.array_equal(
        IC.decode_png(IC.encode_png(img, row_filters=[4, 3, 2, 1, 0],
                                    interlace=True)), img)
    assert np.array_equal(IC.decode_bmp(IC.encode_bmp(img)), img)
    assert np.array_equal(IC.decode_ppm(IC.encode_ppm(img)), img)
    q = img // 64 * 64  # <=256 distinct colors for the GIF palette
    assert np.array_equal(GC.decode_gif(GC.encode_gif([q]))[0], q)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(h=st.integers(1, 10), w=st.integers(1, 10), fill=st.integers(0, 255),
       sub=st.sampled_from(["444", "420"]))
def test_jpeg_constant_fill_exact(h, w, fill, sub):
    img = np.full((h, w, 3), fill, dtype=np.uint8)
    out = JC.decode_jpeg(JC.encode_jpeg_baseline(img, subsampling=sub))
    assert np.array_equal(out, img)
