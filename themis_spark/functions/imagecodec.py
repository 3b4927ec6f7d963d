"""Pure-numpy image codecs for the multimodal kernels.

The container has no Pillow/libjpeg, but uncompressed formats are just
byte layouts — parseable with numpy alone. Supported here:

* **PPM (P6)** — the netpbm binary RGB format: ASCII header
  ``P6 <width> <height> <maxval>`` then ``width*height*3`` raw bytes.
* **BMP (24-bit BI_RGB)** — little-endian header, uncompressed BGR
  rows stored bottom-up, each row padded to 4 bytes.
* **PPMV** — a concatenated-P6 "video": frames are back-to-back P6
  streams (our frame-sampling container; real codecs slot in behind
  the same function signature).

These run INSIDE Arrow batches on executors (mapInPandas kernels in
operators/multimodal.py) — per-batch Python over ndarray columns, never
per-row UDFs. Compressed formats (JPEG/PNG/…) still require an external
library and raise ``UnsupportedImageError`` so callers fail loudly
instead of silently skipping rows.
"""

from __future__ import annotations

import numpy as np


class UnsupportedImageError(ValueError):
    """Payload is not a format the builtin codecs can decode."""


def sniff_format(payload: bytes) -> str | None:
    """Best-effort container sniff from magic bytes (no decode)."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    return None


# ------------------------------------------------------------------- PPM (P6)

def _parse_ppm_header(payload: bytes, start: int = 0) -> tuple[int, int, int, int]:
    """Returns (width, height, maxval, data_offset). Handles arbitrary
    whitespace and ``#`` comments per the netpbm spec."""
    if payload[start:start + 2] != b"P6":
        raise UnsupportedImageError("not a P6 ppm stream")
    pos = start + 2
    fields: list[int] = []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if pos < n and payload[pos:pos + 1] == b"#":  # comment to EOL
            while pos < n and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        tok = bytearray()
        while pos < n and not payload[pos:pos + 1].isspace():
            tok += payload[pos:pos + 1]
            pos += 1
        if not tok:
            raise UnsupportedImageError("truncated ppm header")
        fields.append(int(tok))
    pos += 1  # single whitespace byte after maxval, then raw data
    w, h, maxval = fields
    if maxval > 255:
        raise UnsupportedImageError("16-bit ppm not supported")
    return w, h, maxval, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 bytes → (h, w, 3) uint8 array."""
    w, h, _, off = _parse_ppm_header(payload)
    need = w * h * 3
    data = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → P6 bytes (the kernels' output format)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


# -------------------------------------------------------------- BMP (24-bit)

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise UnsupportedImageError("not a bmp stream")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise UnsupportedImageError(f"only 24-bit BI_RGB bmp supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[:, :, ::-1]  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → bottom-up 24-bit BI_RGB BMP bytes."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, bottom-up
    data = rows.tobytes()
    header = (
        b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


# ------------------------------------------------------------------ dispatch

def decode_image(payload: bytes) -> tuple[str, np.ndarray]:
    """Decode any builtin-supported still image → (format, (h,w,3) array).
    Raises ``UnsupportedImageError`` for compressed formats."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        return "ppm", decode_ppm(payload)
    if fmt == "bmp":
        return "bmp", decode_bmp(payload)
    raise UnsupportedImageError(f"builtin codecs cannot decode format={fmt!r}")


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize by integer index mapping — deterministic,
    allocation-bounded, no interpolation libraries."""
    h, w = img.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return img[ys][:, xs]


# ------------------------------------------------- concatenated-P6 "video"

def video_frame_offsets(payload: bytes) -> list[tuple[int, int, int]]:
    """Frame index for a PPMV (concatenated P6) stream:
    [(offset, width, height), …] without materializing frames."""
    out = []
    pos = 0
    while pos < len(payload) and payload[pos:pos + 2] == b"P6":
        w, h, _, data_off = _parse_ppm_header(payload, pos)
        out.append((pos, w, h))
        pos = data_off + w * h * 3
    return out


def decode_video_frame(payload: bytes, offset: int) -> np.ndarray:
    """Decode the single frame starting at ``offset`` in a PPMV stream."""
    w, h, _, data_off = _parse_ppm_header(payload, offset)
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=data_off)
    return data.reshape(h, w, 3)
