"""Pure-stdlib GIF (87a/89a) codec for the multimodal kernels.

Like imagecodec.py / jpegcodec.py: no image libraries exist in this
container, but GIF is a fully-specified byte layout (GIF89a
specification, CompuServe 1990; the LZW variant is the one from the
spec's Appendix F). Decoder supports global/local color tables,
interlacing, multiple frames (animation) with disposal methods 0-3 and
GCE transparency — everything a real crawl's GIFs commonly use;
malformed streams raise ``UnsupportedImageError`` loudly (fail-closed).
The encoder exists so tests can generate conformant streams in this
container (palette images, optional interlace, multi-frame animations)
and round-trip BIT-EXACTLY: GIF is lossless, so decode(encode(img))
must equal img.

Design note for the Spark side: entropy decode is inherently serial per
stream but runs inside Arrow batches under ``mapInPandas`` — many
streams per task, payloads never shuffle (same contract as the JPEG
codec).
"""

from __future__ import annotations

import numpy as np

from themis_spark.functions.imagecodec import UnsupportedImageError

# decode-bomb guard, same policy as jpegcodec.MAX_PIXELS: a hostile
# header must not allocate planes before any pixel data is validated
from themis_spark.functions.imagecodec import MAX_PIXELS  # noqa: E402


# ------------------------------------------------------------------ LZW

def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    CLEAR resets the table, codes cap at 12 bits (table full => the
    encoder must emit CLEAR before growing again)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader (LSB-first within each byte, per the GIF spec)
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                raise UnsupportedImageError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise UnsupportedImageError("gif: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise UnsupportedImageError("gif: LZW code out of range")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    return bytes(out[:expected])


def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    """Spec-conformant LZW: emits CLEAR first, grows the table to 12
    bits, emits CLEAR and resets when full."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            if next_code >= (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = end + 1
        prev = bytes([byte])
    if prev:
        emit(table[prev], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -------------------------------------------------------------- parsing

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _deinterlace(rows: np.ndarray, h: int) -> np.ndarray:
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos; returns
    (data, position after the 0x00 terminator)."""
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise UnsupportedImageError("gif: unterminated sub-blocks")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos:pos + size])
        pos += size


def sniff_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


def gif_dims(payload: bytes) -> tuple[int, int]:
    """Canvas dims from the logical screen descriptor (metadata path —
    no entropy decode, mirrors jpegcodec.jpeg_dims)."""
    if not sniff_gif(payload) or len(payload) < 13:
        raise UnsupportedImageError("not a GIF stream")
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    return w, h


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """GIF bytes → list of full-canvas RGB uint8 frames (h, w, 3).

    Frames composite per the GIF89a animation model: disposal 0/1 keep
    the previous canvas, disposal 2 restores the frame's region to the
    background color, disposal 3 restores the canvas to its state
    before the frame rendered (one canvas snapshot held only while a
    restore-previous frame is in flight); GCE transparency skips
    indexed pixels during compositing.
    """
    if not sniff_gif(payload):
        raise UnsupportedImageError("not a GIF stream")
    w, h = gif_dims(payload)
    if w * h > MAX_PIXELS or w == 0 or h == 0:
        raise UnsupportedImageError(f"gif: refusing {w}x{h} canvas")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        if pos + 3 * size > len(payload):
            raise UnsupportedImageError("gif: truncated global color table")
        gct = np.frombuffer(payload[pos:pos + 3 * size],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * size
    bg_index = payload[11]

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:, :] = gct[bg_index]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    n = len(payload)

    while pos < n:
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= n:
                raise UnsupportedImageError("gif: truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                data, pos = _sub_blocks(payload, pos)
                if len(data) >= 4:
                    flags = data[0]
                    disposal = (flags >> 2) & 0x07
                    transparent = data[3] if flags & 0x01 else None
            else:  # comment / plain text / application: skip
                _, pos = _sub_blocks(payload, pos)
            continue
        if marker != 0x2C:
            raise UnsupportedImageError(f"gif: unexpected block 0x{marker:02x}")

        if pos + 9 > n:
            raise UnsupportedImageError("gif: truncated image descriptor")
        left = int.from_bytes(payload[pos:pos + 2], "little")
        top = int.from_bytes(payload[pos + 2:pos + 4], "little")
        fw = int.from_bytes(payload[pos + 4:pos + 6], "little")
        fh = int.from_bytes(payload[pos + 6:pos + 8], "little")
        fpacked = payload[pos + 8]
        pos += 9
        if fw == 0 or fh == 0:
            raise UnsupportedImageError("gif: empty frame rectangle")
        if left + fw > w or top + fh > h:
            raise UnsupportedImageError("gif: frame exceeds canvas")
        lct = gct
        if fpacked & 0x80:
            size = 2 << (fpacked & 0x07)
            if pos + 3 * size > n:
                raise UnsupportedImageError("gif: truncated local color table")
            lct = np.frombuffer(payload[pos:pos + 3 * size],
                                dtype=np.uint8).reshape(-1, 3)
            pos += 3 * size
        if lct is None:
            raise UnsupportedImageError("gif: no color table for frame")
        if pos >= n:
            raise UnsupportedImageError("gif: truncated image data")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise UnsupportedImageError(f"gif: bad LZW min code size {mcs}")
        data, pos = _sub_blocks(payload, pos)
        idx = np.frombuffer(_lzw_decode(mcs, data, fw * fh), dtype=np.uint8)
        if len(idx) < fw * fh:
            raise UnsupportedImageError("gif: not enough pixel data")
        idx = idx.reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx, fh)
        if idx.max() >= len(lct):
            raise UnsupportedImageError("gif: pixel index outside palette")

        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + fh, left:left + fw]
        rgb = lct[idx]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 3:  # restore-previous: undo this frame's render
            canvas[:, :] = saved
        if disposal == 2:  # restore region to background
            bg = gct[bg_index] if gct is not None and bg_index < len(gct) \
                else np.zeros(3, dtype=np.uint8)
            canvas[top:top + fh, left:left + fw] = bg
        disposal = 0
        transparent = None

    if not frames:
        raise UnsupportedImageError("gif: no image data")
    return frames


# -------------------------------------------------------------- encoder

def _palette_of(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    colors: dict[tuple[int, int, int], int] = {}
    index_frames = []
    for img in frames:
        flat = img.reshape(-1, 3)
        idx = np.empty(len(flat), dtype=np.uint8)
        for i, px in enumerate(map(tuple, flat.tolist())):
            if px not in colors:
                if len(colors) >= 256:
                    raise UnsupportedImageError(
                        "gif encoder: more than 256 distinct colors")
                colors[px] = len(colors)
            idx[i] = colors[px]
        index_frames.append(idx.reshape(img.shape[:2]))
    pal = np.zeros((max(2, len(colors)), 3), dtype=np.uint8)
    for px, i in colors.items():
        pal[i] = px
    return pal, index_frames


def _interlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    return idx[order]


def encode_gif(frames: list[np.ndarray] | np.ndarray,
               interlace: bool = False) -> bytes:
    """RGB uint8 frame(s) → GIF89a bytes with one global palette
    (<= 256 distinct colors across all frames — lossless by
    construction, tests round-trip bit-exactly)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise UnsupportedImageError("gif encoder: frame size mismatch")
    pal, index_frames = _palette_of(frames)
    # palette size must be a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(len(pal)))))
    size = 1 << bits
    table = np.zeros((size, 3), dtype=np.uint8)
    table[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (bits - 1))  # GCT present, size = 2^bits
    out += b"\x00\x00"  # bg index, aspect
    out += table.tobytes()
    mcs = max(2, bits)
    for idx in index_frames:
        if len(frames) > 1:  # GCE so animated decoders keep each frame
            out += b"\x21\xf9\x04\x04\x02\x00\x00\x00"  # disposal=1
        out += b"\x2c" + b"\x00\x00\x00\x00"
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        rows = _interlace(idx) if interlace else idx
        out.append(mcs)
        data = _lzw_encode(mcs, rows.tobytes())
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0x00)
    out.append(0x3B)
    return bytes(out)


def gif_frame_meta(payload: bytes) -> tuple[int, int, int]:
    """(canvas_w, canvas_h, n_frames) WITHOUT entropy decode — the
    metadata fast path (mirrors jpegcodec.jpeg_dims): walks the block
    structure, skipping color tables and data sub-blocks by length."""
    w, h = gif_dims(payload)
    packed = payload[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    n = len(payload)
    while pos < n:
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:
            break
        if marker == 0x21:
            pos += 1  # label
            _, pos = _sub_blocks(payload, pos)
            continue
        if marker != 0x2C:
            raise UnsupportedImageError(f"gif: unexpected block 0x{marker:02x}")
        if pos + 9 > n:
            raise UnsupportedImageError("gif: truncated image descriptor")
        fpacked = payload[pos + 8]
        pos += 9
        if fpacked & 0x80:
            pos += 3 * (2 << (fpacked & 0x07))
        pos += 1  # LZW min code size
        _, pos = _sub_blocks(payload, pos)
        n_frames += 1
    if n_frames == 0:
        raise UnsupportedImageError("gif: no image data")
    return w, h, n_frames
