"""Pure-stdlib/numpy image codecs for the multimodal kernels.

The container has no Pillow/libjpeg, but several formats are decodable
with the stdlib + numpy alone. Supported here:

* **PPM (P6)** — the netpbm binary RGB format: ASCII header
  ``P6 <width> <height> <maxval>`` then ``width*height*3`` raw bytes.
* **BMP (24-bit BI_RGB)** — little-endian header, uncompressed BGR
  rows stored bottom-up, each row padded to 4 bytes.
* **PNG** — the one COMPRESSED format fully decodable without external
  libraries: zlib (stdlib) inflate of the IDAT stream + the five
  scanline filters (None/Sub/Up/Average/Paeth) per the PNG spec.
  8-bit depth, color types 0 (grayscale), 2 (RGB), 3 (palette), 6
  (RGBA — alpha dropped), plain or Adam7-interlaced; 16-bit raises.
* **PPMV** — a concatenated-P6 "video": frames are back-to-back P6
  streams (our frame-sampling container; real codecs slot in behind
  the same function signature).

These run INSIDE Arrow batches on executors (mapInPandas kernels in
operators/multimodal.py) — per-batch Python over ndarray columns, never
per-row UDFs. JPEG/WebP still require an external library and raise
``UnsupportedImageError`` so callers fail loudly instead of silently
skipping rows.
"""

from __future__ import annotations

import zlib

import numpy as np


class UnsupportedImageError(ValueError):
    """Payload is not a format the builtin codecs can decode."""


#: shared decode-bomb ceiling (pixels) for ALL builtin codecs — same
#: posture as Pillow's MAX_IMAGE_PIXELS. jpegcodec/gifcodec import this
#: value, so the policy lives in exactly one place.
MAX_PIXELS = 64_000_000


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
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
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
        if not tok or not tok.isdigit():
            raise UnsupportedImageError("malformed ppm header")
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
    # hostile-header guards (decode-bomb cap shared with gif/jpeg
    # policy; truncated pixel data must raise typed, not ValueError)
    if w <= 0 or h == 0 or w * h > MAX_PIXELS:
        raise UnsupportedImageError(f"bmp: refusing {w}x{h}")
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if off < 0 or off + stride * h > len(payload):
        raise UnsupportedImageError("bmp: truncated pixel data")
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


# ----------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per pixel by PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


def _png_chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        yield typ, payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IEND":
            return


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters. Up/None vectorize; Sub/
    Average/Paeth carry a left-neighbor dependency, so those rows walk
    per byte (this is the declared Python kernel — per Arrow batch on
    executors, never per-row UDF)."""
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 255
        elif f == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 255
        elif f == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 255
        else:
            raise UnsupportedImageError(f"png filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB array, pure stdlib zlib + numpy.
    Grayscale expands to RGB, palette entries resolve through PLTE,
    RGBA drops alpha (no compositing — the training-data contract is
    raw pixel content). Adam7 interlace deinterlaces (each pass is an
    independently filtered sub-image per the PNG spec); 16-bit depth
    raises."""
    if payload[:8] != _PNG_SIG:
        raise UnsupportedImageError("not a png stream")
    ihdr, plte, idat = None, None, bytearray()
    for typ, data in _png_chunks(payload):
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
    if ihdr is None or not idat:
        raise UnsupportedImageError("png missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if depth != 8:
        raise UnsupportedImageError(f"png bit depth {depth} not supported")
    if ctype not in _PNG_CHANNELS:
        raise UnsupportedImageError(f"png color type {ctype} not supported")
    if comp != 0 or filt != 0:
        raise UnsupportedImageError("nonstandard png compression/filter method")
    if interlace not in (0, 1):
        raise UnsupportedImageError(f"png interlace method {interlace}")
    nch = _PNG_CHANNELS[ctype]
    stride = w * nch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise UnsupportedImageError(f"png: corrupt zlib stream ({e})")
    if interlace == 0:
        if len(raw) != h * (stride + 1):
            raise UnsupportedImageError("png pixel data length mismatch")
        img = _png_unfilter(raw, h, stride, nch).reshape(h, w, nch)
    else:
        img = _png_deinterlace_adam7(raw, w, h, nch)
    if ctype == 0:  # grayscale -> RGB
        return np.repeat(img, 3, axis=2)
    if ctype == 3:  # palette
        if plte is None:
            raise UnsupportedImageError("palette png missing PLTE")
        pal = np.frombuffer(plte, np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        return pal[img[:, :, 0]]
    if ctype == 6:  # RGBA -> drop alpha
        return np.ascontiguousarray(img[:, :, :3])
    return img


#: Adam7 pass grid: (x_start, y_start, x_step, y_step), PNG spec §8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_deinterlace_adam7(raw: bytes, w: int, h: int,
                           nch: int) -> np.ndarray:
    """Reassemble the 7 Adam7 passes: each non-empty pass is its own
    filtered sub-image (filters reference neighbours WITHIN the pass),
    unfiltered independently and scattered onto the output grid."""
    img = np.zeros((h, w, nch), np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = pw * nch
        need = ph * (stride + 1)
        if pos + need > len(raw):
            raise UnsupportedImageError("png: truncated Adam7 pass data")
        sub = _png_unfilter(raw[pos:pos + need], ph, stride, nch)
        img[y0::dy, x0::dx] = sub.reshape(ph, pw, nch)
        pos += need
    if pos != len(raw):
        raise UnsupportedImageError("png pixel data length mismatch")
    return img


def encode_png(img: np.ndarray, row_filters: list[int] | None = None,
               interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → color-type-2 PNG bytes. ``row_filters``
    cycles real filter types (0–4) across rows — the fixture writer for
    tests that must exercise every unfilter path with spec-true filter
    arithmetic (encode applies the true forward filters).
    ``interlace=True`` writes Adam7: each pass filtered independently,
    exactly the layout the decoder's deinterlacer consumes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]

    def filter_rows(sub: np.ndarray) -> bytes:
        sh, sw = sub.shape[:2]
        raw = bytearray()
        prev = np.zeros(sw * 3, np.int32)
        z3 = np.zeros(3, np.int32)
        for y in range(sh):
            line = sub[y].reshape(-1).astype(np.int32)
            f = row_filters[y % len(row_filters)] if row_filters else 0
            left = np.concatenate([z3, line[:-3]])
            upleft = np.concatenate([z3, prev[:-3]])
            if f == 0:
                enc = line
            elif f == 1:
                enc = (line - left) & 255
            elif f == 2:
                enc = (line - prev) & 255
            elif f == 3:
                enc = (line - ((left + prev) >> 1)) & 255
            elif f == 4:
                p = left + prev - upleft
                pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                              np.abs(p - upleft))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, upleft))
                enc = (line - pred) & 255
            else:
                raise ValueError(f"png filter type {f}")
            raw.append(f)
            raw += enc.astype(np.uint8).tobytes()
            prev = line
        return bytes(raw)

    if interlace:
        raw = b"".join(
            filter_rows(np.ascontiguousarray(img[y0::dy, x0::dx]))
            for x0, y0, dx, dy in _ADAM7
            if (w - x0 + dx - 1) // dx > 0 and (h - y0 + dy - 1) // dy > 0)
    else:
        raw = filter_rows(img)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 1 if interlace else 0]))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# ------------------------------------------------------------------ dispatch

def decode_image(payload: bytes) -> tuple[str, np.ndarray]:
    """Decode any builtin-supported still image → (format, (h,w,3) array).
    WebP decodes for the lossless (VP8L) variant, including inside a
    VP8X extended container (functions/webpcodec.py); lossy VP8 and
    arithmetic/lossless JPEG raise ``UnsupportedImageError``."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        return "ppm", decode_ppm(payload)
    if fmt == "bmp":
        return "bmp", decode_bmp(payload)
    if fmt == "png":
        return "png", decode_png(payload)
    if fmt == "jpeg":
        from themis_spark.functions.jpegcodec import decode_jpeg

        return "jpeg", decode_jpeg(payload)
    if fmt == "gif":
        from themis_spark.functions.gifcodec import decode_gif

        return "gif", decode_gif(payload)[0]  # first frame for stills
    if fmt == "avi":
        from themis_spark.functions.avicodec import (avi_frame_chunks,
                                                     decode_avi_frame)

        off, size = avi_frame_chunks(payload)[0]  # first frame for stills
        return "avi", decode_avi_frame(payload, off, size)
    if fmt == "webp":
        from themis_spark.functions.webpcodec import decode_webp

        return "webp", decode_webp(payload)
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


# --------------------------------------------------- EXIF orientation

def apply_exif_orientation(img: np.ndarray, orientation: int | None) -> np.ndarray:
    """Undo the stored-pixel transform the EXIF orientation tag records
    (the 8 TIFF/Exif values; same mapping as Pillow's exif_transpose).
    Pure integer index permutations — exact, allocation-bounded."""
    if orientation in (None, 0, 1):
        return img
    if orientation == 2:
        return img[:, ::-1]
    if orientation == 3:
        return img[::-1, ::-1]
    if orientation == 4:
        return img[::-1]
    if orientation == 5:
        return np.transpose(img, (1, 0, 2))
    if orientation == 6:
        return np.rot90(img, 3)
    if orientation == 7:
        return np.transpose(img, (1, 0, 2))[::-1, ::-1]
    if orientation == 8:
        return np.rot90(img, 1)
    raise UnsupportedImageError(f"exif orientation out of range: {orientation}")


def decode_image_oriented(payload: bytes) -> tuple[str, np.ndarray, int]:
    """:func:`decode_image` + EXIF orientation normalization for JPEG
    payloads → (format, upright pixels, orientation). Cameras store
    sensor-order pixels and record the rotation in EXIF; hashing or
    resizing the raw array makes the SAME photo shot in portrait vs
    landscape look like different content — normalize first."""
    fmt, img = decode_image(payload)
    if fmt != "jpeg":
        return fmt, img, 1
    from themis_spark.functions.jpegcodec import jpeg_exif_orientation

    o = jpeg_exif_orientation(payload) or 1
    return fmt, apply_exif_orientation(img, o), o
