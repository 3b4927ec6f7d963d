"""AVI / Motion-JPEG container codec, pure stdlib.

The 'real video' path beside the PPMV test container: RIFF-framed AVI
(Microsoft's public AVI/OpenDML spec) carrying one ``vids`` stream with
FOURCC ``MJPG``, where every frame is an independent baseline JPEG —
the layout webcams, security cameras and plenty of crawl-scraped clips
ship. Because frames are self-contained JPEGs, pixel decode reuses
``jpegcodec`` wholesale (including its MAX_PIXELS decode-bomb guard and
progressive dispatch); this module only walks RIFF chunks.

Surface:

* :func:`avi_meta` — container metadata (dims, frame count, handler,
  µs/frame) from the header walk alone — NO entropy decode, the
  metadata fast path (same contract as ``gif_frame_meta``).
* :func:`avi_frame_chunks` — ``(offset, size)`` index of the video
  frames in the ``movi`` list (walked directly; the optional ``idx1``
  index is not trusted — real-world files disagree on its offset
  convention).
* :func:`decode_avi_frame` — one frame → ``(h,w,3)`` RGB.
* :func:`encode_avi_mjpeg` — conformant writer used to generate test
  fixtures in this Pillow-/ffmpeg-less container.

Malformed or truncated containers raise :class:`AviError` loudly —
never a silently-wrong frame table.
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    pass


def _u32(buf: bytes, off: int) -> int:
    if off + 4 > len(buf):
        raise AviError("avi: truncated dword")
    return struct.unpack_from("<I", buf, off)[0]


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, data_off, size) for each RIFF chunk in [pos, end);
    chunks are word-aligned (odd sizes carry one pad byte)."""
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        size = _u32(buf, pos + 4)
        data = pos + 8
        if data + size > end:
            raise AviError(f"avi: chunk {fourcc!r} overruns container")
        yield fourcc, data, size
        pos = data + size + (size & 1)


def _top_level(payload: bytes):
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise AviError("not an AVI (RIFF/'AVI ') stream")
    riff_size = _u32(payload, 4)
    end = min(8 + riff_size, len(payload))
    if 8 + riff_size > len(payload):
        raise AviError("avi: RIFF size overruns payload")
    return _chunks(payload, 12, end)


def avi_meta(payload: bytes) -> dict:
    """Header-only container metadata: ``{width, height, n_frames,
    us_per_frame, handler}``. ``n_frames`` counts actual frame chunks in
    ``movi`` (the avih dwTotalFrames field is advisory and real muxers
    get it wrong); the walk touches chunk headers only."""
    width = height = us_per_frame = None
    handler = None
    n_frames = 0
    saw_movi = False
    for fourcc, data, size in _top_level(payload):
        if fourcc == b"LIST" and payload[data:data + 4] == b"hdrl":
            for fc2, d2, s2 in _chunks(payload, data + 4, data + size):
                if fc2 == b"avih":
                    if s2 < 40:
                        raise AviError("avi: short avih header")
                    us_per_frame = _u32(payload, d2)
                    width = _u32(payload, d2 + 32)
                    height = _u32(payload, d2 + 36)
                elif fc2 == b"LIST" and payload[d2:d2 + 4] == b"strl":
                    for fc3, d3, s3 in _chunks(payload, d2 + 4, d2 + s2):
                        if fc3 == b"strh" and payload[d3:d3 + 4] == b"vids":
                            handler = payload[d3 + 4:d3 + 8].decode(
                                "latin-1").strip("\x00 ")
        elif fourcc == b"LIST" and payload[data:data + 4] == b"movi":
            saw_movi = True
            n_frames += len(_movi_frames(payload, data + 4, data + size))
    if width is None or not saw_movi:
        raise AviError("avi: missing hdrl/avih or movi list")
    return {"width": width, "height": height, "n_frames": n_frames,
            "us_per_frame": us_per_frame, "handler": handler}


def _movi_frames(payload: bytes, pos: int, end: int) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for fourcc, data, size in _chunks(payload, pos, end):
        if fourcc == b"LIST" and payload[data:data + 4] == b"rec ":
            out.extend(_movi_frames(payload, data + 4, data + size))
        elif fourcc[2:4] in (b"dc", b"db"):  # compressed / uncompressed video
            out.append((data, size))
    return out


def avi_frame_chunks(payload: bytes) -> list[tuple[int, int]]:
    """``[(offset, size), …]`` of the video frame chunks, in stream
    order, from walking ``movi`` directly."""
    for fourcc, data, size in _top_level(payload):
        if fourcc == b"LIST" and payload[data:data + 4] == b"movi":
            return _movi_frames(payload, data + 4, data + size)
    raise AviError("avi: no movi list")


def decode_avi_frame(payload: bytes, offset: int, size: int) -> np.ndarray:
    """Decode one MJPG frame chunk → (h,w,3) uint8 RGB (jpegcodec
    handles baseline AND progressive streams, dims/pixels guards
    included)."""
    from themis_spark.functions.jpegcodec import decode_jpeg

    return decode_jpeg(bytes(payload[offset:offset + size]))


# ------------------------------------------------------------------ writer

def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     subsampling: str = "444",
                     restart_interval: int = 0) -> bytes:
    """Mux ``(h,w,3)`` uint8 frames into a conformant MJPG AVI (JPEG
    per frame via ``encode_jpeg_baseline``; all-ones quant default —
    exactly lossless for constant frames, the oracle regime)."""
    from themis_spark.functions.jpegcodec import encode_jpeg_baseline

    if not frames:
        raise AviError("avi: need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise AviError("avi: all frames must share dimensions")
        jpegs.append(encode_jpeg_baseline(
            f, subsampling=subsampling, restart_interval=restart_interval))
    max_size = max(len(j) for j in jpegs)
    us_per_frame = 1_000_000 // max(fps, 1)

    avih = struct.pack(
        "<14I", us_per_frame, max_size * max(fps, 1), 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIii", 0, 0, 0, 0, 1, max(fps, 1), 0, len(frames),
        max_size, -1, 0) + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = b""
    idx_entries = []
    for j in jpegs:
        # idx1 offsets: relative to the 'movi' fourcc (the common
        # convention); our reader walks movi directly and ignores them
        idx_entries.append((4 + len(movi_body), len(j)))
        movi_body += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(b"idx1", b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)
        for off, size in idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
