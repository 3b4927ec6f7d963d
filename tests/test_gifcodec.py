"""GIF codec (functions/gifcodec.py): LZW, palettes, interlace,
animation compositing, transparency, disposal — plus the Spark
integration paths (metadata, resize, animated frame sampling).

GIF is lossless, so every round-trip asserts BIT-EXACT pixels; the
hand-built streams pin the spec behaviors the encoder doesn't emit
(transparency, disposal 2, local color tables).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from themis_spark.functions import gifcodec as G
from themis_spark.functions import imagecodec as IC
from themis_spark.functions.imagecodec import UnsupportedImageError
from themis_spark.operators import multimodal as M


def _palimg(rng, pal_size, h, w, pal=None):
    pal = rng.integers(0, 256, (pal_size, 3), dtype=np.uint8) if pal is None else pal
    return pal[rng.integers(0, len(pal), (h, w))]


# ------------------------------------------------------------ round-trips

def test_roundtrip_basic():
    rng = np.random.default_rng(1)
    img = _palimg(rng, 7, 19, 23)
    assert np.array_equal(G.decode_gif(G.encode_gif(img))[0], img)


def test_roundtrip_interlaced():
    rng = np.random.default_rng(2)
    for h in (4, 5, 8, 13):  # odd heights hit every interlace pass shape
        img = _palimg(rng, 5, h, 9)
        dec = G.decode_gif(G.encode_gif(img, interlace=True))[0]
        assert np.array_equal(dec, img), h


def test_roundtrip_256_colors_and_lzw_growth():
    # 256-color palette forces 8-bit min code size; 80x120 image grows
    # the LZW table through multiple width bumps
    rng = np.random.default_rng(3)
    pal = np.array([[i, (i * 7) % 256, (i * 13) % 256] for i in range(256)],
                   dtype=np.uint8)
    img = _palimg(rng, 256, 80, 120, pal=pal)
    assert np.array_equal(G.decode_gif(G.encode_gif(img))[0], img)


def test_roundtrip_two_colors():
    img = np.zeros((6, 7, 3), dtype=np.uint8)
    img[::2] = (255, 255, 255)
    assert np.array_equal(G.decode_gif(G.encode_gif(img))[0], img)


def test_roundtrip_animation():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (9, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 9, (11, 13))] for _ in range(4)]
    dec = G.decode_gif(G.encode_gif(frames))
    assert len(dec) == 4
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)


def test_lzw_table_full_reset():
    # an image with enough distinct runs to fill the 4096-entry table
    # forces the encoder's mid-stream CLEAR + reset path
    rng = np.random.default_rng(5)
    pal = np.array([[i, i, i] for i in range(256)], dtype=np.uint8)
    img = pal[rng.integers(0, 256, (120, 160))]
    assert np.array_equal(G.decode_gif(G.encode_gif(img))[0], img)


# -------------------------------------------------------- spec behaviors

def _hand_gif(w, h, gct, blocks):
    bits = max(1, int(np.ceil(np.log2(len(gct)))))
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (bits - 1))
    out += b"\x00\x00"
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(gct)] = gct
    out += table.tobytes()
    for b in blocks:
        out += b
    out.append(0x3B)
    return bytes(out)


def _image_block(left, top, idx, mcs=2, interlace=False):
    h, w = idx.shape
    out = bytearray(b"\x2c")
    out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)
    out.append(mcs)
    data = G._lzw_encode(mcs, idx.astype(np.uint8).tobytes())
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0x00)
    return bytes(out)


def test_transparency_composites_over_previous_frame():
    gct = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   dtype=np.uint8)
    f1 = np.full((4, 4), 1, dtype=np.uint8)          # all red
    f2 = np.array([[2, 0], [0, 3]], dtype=np.uint8)  # 0 = transparent here
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"        # flags=0x01: transparent idx 0
    payload = _hand_gif(4, 4, gct, [_image_block(0, 0, f1),
                                    gce, _image_block(1, 1, f2)])
    frames = G.decode_gif(payload)
    assert len(frames) == 2
    assert (frames[0] == [200, 0, 0]).all()
    # frame 2: green at (1,1), blue at (2,2); transparent spots keep red
    assert (frames[1][1, 1] == [0, 200, 0]).all()
    assert (frames[1][2, 2] == [0, 0, 200]).all()
    assert (frames[1][1, 2] == [200, 0, 0]).all()
    assert (frames[1][2, 1] == [200, 0, 0]).all()


def test_disposal_background_clears_region():
    gct = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   dtype=np.uint8)
    f1 = np.full((2, 2), 1, dtype=np.uint8)
    f2 = np.full((4, 4), 2, dtype=np.uint8)
    # disposal=2 on frame 1: its region restores to bg (index 0) before
    # frame 2 draws — but frame 2 covers the whole canvas anyway, so
    # check an UNCOVERED layout instead: frame2 is 1x1
    f2 = np.array([[3]], dtype=np.uint8)
    gce_disp2 = b"\x21\xf9\x04\x08\x00\x00\x00\x00"  # disposal=2
    payload = _hand_gif(4, 4, gct, [gce_disp2, _image_block(0, 0, f1),
                                    _image_block(3, 3, f2)])
    frames = G.decode_gif(payload)
    assert (frames[0][0, 0] == [200, 0, 0]).all()
    # after disposal, frame 1's region is background again
    assert (frames[1][0, 0] == [10, 10, 10]).all()
    assert (frames[1][3, 3] == [0, 0, 200]).all()


def test_local_color_table_overrides_global():
    gct = np.array([[1, 1, 1], [2, 2, 2]], dtype=np.uint8)
    lct = np.array([[9, 9, 9], [77, 88, 99]], dtype=np.uint8)
    idx = np.array([[1]], dtype=np.uint8)
    block = bytearray(b"\x2c" + b"\x00\x00\x00\x00"
                      + (1).to_bytes(2, "little") + (1).to_bytes(2, "little"))
    block.append(0x80 | 0)  # LCT present, size 2
    block += lct.tobytes()
    block.append(2)
    data = G._lzw_encode(2, idx.tobytes())
    block += bytes([len(data)]) + data + b"\x00"
    payload = _hand_gif(1, 1, gct, [bytes(block)])
    assert (G.decode_gif(payload)[0][0, 0] == [77, 88, 99]).all()


def test_metadata_walker_counts_frames_without_decode():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 5, (9, 11))] for _ in range(4)]
    assert G.gif_frame_meta(G.encode_gif(frames)) == (11, 9, 4)
    assert G.gif_dims(G.encode_gif(frames[0])) == (11, 9)


# ----------------------------------------------------------- fail-closed

def test_refuses_garbage_and_truncation():
    with pytest.raises(UnsupportedImageError):
        G.decode_gif(b"NOTAGIF" + b"\x00" * 20)
    rng = np.random.default_rng(7)
    ok = G.encode_gif(_palimg(rng, 4, 6, 6))
    with pytest.raises(UnsupportedImageError):
        G.decode_gif(ok[:20])


def test_refuses_decode_bomb_header():
    hostile = bytearray(G.encode_gif(np.zeros((2, 2, 3), dtype=np.uint8)))
    hostile[6:8] = (65535).to_bytes(2, "little")
    hostile[8:10] = (65535).to_bytes(2, "little")
    with pytest.raises(UnsupportedImageError, match="refusing"):
        G.decode_gif(bytes(hostile))


def test_restore_previous_disposal_decodes():
    # disposal 3 is supported since round 4 (restore-previous
    # compositing) — a single frame with it simply decodes
    gct = np.array([[0, 0, 0], [1, 1, 1]], dtype=np.uint8)
    gce = b"\x21\xf9\x04\x0c\x00\x00\x00\x00"  # disposal=3
    idx = np.zeros((1, 1), dtype=np.uint8)
    payload = _hand_gif(1, 1, gct, [gce, _image_block(0, 0, idx)])
    frames = G.decode_gif(payload)
    assert len(frames) == 1 and (frames[0] == [0, 0, 0]).all()


def test_refuses_out_of_palette_index():
    gct = np.array([[0, 0, 0], [1, 1, 1]], dtype=np.uint8)
    idx = np.array([[3]], dtype=np.uint8)  # palette has 2 entries
    payload = _hand_gif(1, 1, gct, [_image_block(0, 0, idx)])
    with pytest.raises(UnsupportedImageError, match="palette"):
        G.decode_gif(payload)


def test_encoder_refuses_too_many_colors():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)  # ~1k colors
    with pytest.raises(UnsupportedImageError, match="256"):
        G.encode_gif(img)


# ------------------------------------------------------ spark integration

def test_spark_meta_resize_and_frame_sample(spark):
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    still = pal[rng.integers(0, 6, (10, 14))]
    anim = [pal[rng.integers(0, 6, (8, 8))] for _ in range(5)]
    rows = [(0, bytearray(G.encode_gif(still))),
            (1, bytearray(G.encode_gif(anim)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    meta = {r["doc_id"]: r for r in M.extract_media_meta(
        df, deterministic_fake=False,
        fields=("format", "width", "height", "n_frames")).collect()}
    assert meta[0]["format"] == "gif" and meta[0]["n_frames"] == 1
    assert (meta[0]["width"], meta[0]["height"]) == (14, 10)
    assert meta[1]["n_frames"] == 5

    res = M.resize_images(df.where(F.col("doc_id") == 0), target=(7, 5)) \
           .collect()[0]
    expected = IC.encode_ppm(IC.resize_nearest(still, 7, 5))
    assert bytes(res["resized"]) == expected and res["src_format"] == "gif"

    samples = M.frame_sample(df.where(F.col("doc_id") == 1),
                             every_n=2).collect()
    assert [r["frame_idx"] for r in samples] == [0, 2, 4]
    import hashlib
    # frame_sample returns COMPOSITED full-canvas frames; full-canvas
    # opaque frames composite to themselves
    for r in samples:
        assert r["frame_sha"] == hashlib.sha256(
            anim[r["frame_idx"]].tobytes()).hexdigest()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        c = data[i:i + 255]
        out.append(len(c))
        out += c
    out.append(0)
    return bytes(out)


def _gce_frame(left, top, w, h, indices, disposal):
    from themis_spark.functions.gifcodec import _lzw_encode

    gce = b"\x21\xf9" + _sub_blocks(bytes([disposal << 2, 0, 0, 0]))
    desc = (b"\x2c" + left.to_bytes(2, "little") + top.to_bytes(2, "little")
            + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00")
    return gce + desc + bytes([2]) + _sub_blocks(_lzw_encode(2, bytes(indices)))


def test_disposal3_restores_previous_canvas():
    import numpy as np

    from themis_spark.functions.gifcodec import decode_gif

    pal = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    hdr = (b"GIF89a" + (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
           + bytes([0x80 | 1, 0, 0]) + pal)
    # frame 1 paints the whole canvas red with disposal=3: after it
    # shows, the canvas must revert to background before frame 2
    f1 = _gce_frame(0, 0, 4, 4, [1] * 16, 3)
    f2 = _gce_frame(1, 1, 2, 2, [2] * 4, 0)
    frames = decode_gif(hdr + f1 + f2 + b"\x3b")
    assert len(frames) == 2
    assert (frames[0] == [255, 0, 0]).all()
    assert (frames[1][1:3, 1:3] == [0, 255, 0]).all()
    assert (frames[1][0, 0] == [0, 0, 0]).all()  # red is GONE, not kept
