"""Pure-stdlib baseline JPEG codec (numpy + math only, no Pillow).

Closes the round-2 "compressed media decode" depth gap for the format a
Common-Crawl multimodal pipeline actually meets: JFIF **baseline
sequential DCT** (SOF0) — generic Huffman tables from DHT, 8/16-bit
DQT, arbitrary sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0 by
pixel-replication upsampling), restart intervals, byte unstuffing,
1- or 3-component INTERLEAVED scans. Progressive (SOF2) streams decode
via :mod:`themis_spark.functions.jpegprogressive` (``decode_jpeg``
dispatches on the frame marker); arithmetic coding, lossless, and
non-interleaved multi-scan BASELINE layouts remain explicit non-goals
and fail loudly (``jpeg_dims`` still reads every SOFn header, so the
metadata path works on streams the decoders reject). ``MAX_PIXELS``
guards against decode bombs: hostile SOF dims in untrusted crawl bytes
raise before any plane allocation.

An encoder is included for the same reason the PNG/PPM codecs have one:
the container has no image library, so tests are round-trips plus
hand-derived exactness cases (an all-ones quant table makes constant
blocks round-trip EXACTLY: the only nonzero coefficient is the integer
DC, every step is integer-preserving, so oracle queries can state the
decoded bytes as a formula). The decoder accepts any conformant
baseline stream, not just this encoder's output: Huffman tables, quant
tables, sampling factors and restart intervals are all read from the
file.

Like the other codecs this is a DECLARED Python kernel — it runs inside
Arrow batches under ``mapInPandas`` (operators/multimodal.py), never
per-row in a hot scan. Reference parity note: the reference
(playlyfe/themis, SURVEY.md §2) has no media operators; this belongs to
the north rule's training-pipeline layer.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from themis_spark.functions.imagecodec import UnsupportedImageError

#: decode-bomb ceiling (pixels) — same posture as Pillow's
#: MAX_IMAGE_PIXELS: 64 MPix of float64 planes is ~1.5 GB peak, the
#: most an executor task should ever spend on one crawl image. Checked
#: BEFORE plane allocation so a hostile 65535x65535 header cannot OOM.
from themis_spark.functions.imagecodec import MAX_PIXELS  # noqa: E402

# ------------------------------------------------------------ constants

#: zigzag scan order, generated (not transcribed): diagonal s = r+c walks
#: alternate direction — odd s goes top→down, even s bottom→up.
def _zigzag_order() -> list[int]:
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        rs = rng if s % 2 == 1 else reversed(rng)
        out.extend(r * 8 + (s - r) for r in rs)
    return out


ZIGZAG = _zigzag_order()
_UNZIG = np.argsort(np.array(ZIGZAG))

#: orthonormal 8-point DCT-II matrix: forward D = M @ B @ M.T
_DCTM = np.array(
    [[math.sqrt((1.0 if k == 0 else 2.0) / 8.0)
      * math.cos((2 * n + 1) * k * math.pi / 16.0)
      for n in range(8)] for k in range(8)])

# Encoder Huffman tables (any Kraft-valid canonical tables are
# conformant — they travel in DHT). DC uses the well-known mixed-length
# layout (categories 0..11); AC uses a generated uniform-9-bit table
# over the full (run,size) alphabet, keeping the table data-free.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0] * 8 + [162] + [0] * 7
_AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-walking decoder."""
    return {lc: sym for sym, lc in _canonical_codes(bits, vals).items()}


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


# ------------------------------------------------------------ bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment reader: unstuffs FF00, stops at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise UnsupportedImageError("jpeg: entropy data truncated")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise UnsupportedImageError(
                        f"jpeg: unexpected marker 0xFF{nxt:02X} inside "
                        "entropy data" if nxt is not None else
                        "jpeg: truncated at 0xFF")
            else:
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise UnsupportedImageError("jpeg: invalid Huffman code")

    def sync_restart(self, n: int) -> None:
        """Discard pad bits and consume the expected RSTn marker."""
        self._n = 0
        if (self.pos + 1 >= len(self.data)
                or self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + (n & 7)):
            raise UnsupportedImageError("jpeg: missing restart marker")
        self.pos += 2


# ------------------------------------------------------------ encoder


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(planes: list[np.ndarray]) -> np.ndarray:
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_block(bw: _BitWriter, coefs: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    zz = coefs.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    cat = _category(diff)
    length, code = dc_codes[cat]
    bw.write(code, length)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        cat = _category(v)
        length, code = ac_codes[(run << 4) | cat]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
        if i == last_nz:
            break
    if last_nz < 63:
        length, code = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg_baseline(img: np.ndarray,
                         qtable_luma: np.ndarray | None = None,
                         qtable_chroma: np.ndarray | None = None,
                         restart_interval: int = 0,
                         subsampling: str = "444") -> bytes:
    """Encode ``(h,w,3)`` RGB (or ``(h,w)`` grayscale) uint8 → baseline
    JFIF bytes, one interleaved scan. ``subsampling`` is ``"444"`` or
    ``"420"`` (2×2-averaged chroma — the layout nearly every real crawl
    JPEG uses). Default quant tables are ALL ONES — near-lossless, and
    exactly lossless for constant blocks (the oracle-replayable
    regime); pass real tables for lossy behavior."""
    gray = img.ndim == 2
    if subsampling not in ("444", "420"):
        raise UnsupportedImageError(f"unsupported subsampling {subsampling!r}")
    if gray:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [np.rint(ycc[..., i]) for i in range(3)]
    h, w = planes[0].shape
    if not (0 < h < 65536 and 0 < w < 65536):
        raise UnsupportedImageError("jpeg: dims out of range")
    ql = (np.ones((8, 8)) if qtable_luma is None else
          np.asarray(qtable_luma, dtype=np.float64).reshape(8, 8))
    qc = (ql if qtable_chroma is None else
          np.asarray(qtable_chroma, dtype=np.float64).reshape(8, 8))
    ncomp = 1 if gray else 3
    sub = 2 if (subsampling == "420" and not gray) else 1
    # per-component (plane, h-sampling, v-sampling, qtable id)
    if sub == 2:
        ep = np.pad(planes[0], ((0, h % 2), (0, w % 2)), mode="edge")
        chroma = [(np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                   .reshape(ep.shape[0] // 2, 2, ep.shape[1] // 2, 2)
                   .mean(axis=(1, 3)))
                  for p in planes[1:]]
        comps = [(planes[0], 2, 2, 0)] + [(np.rint(c), 1, 1, 1)
                                          for c in chroma]
    else:
        comps = [(planes[ci], 1, 1, 0 if ci == 0 else 1)
                 for ci in range(ncomp)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0/JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    qts = [ql] + ([] if gray else [qc])
    for tid, qt in enumerate(qts):  # DQT, 8-bit precision
        zz = qt.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz.tobytes()
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, (_, ch, cv, qid) in enumerate(comps):
        out += bytes([ci + 1, (ch << 4) | cv, qid if not gray else 0])
    for cls, tid, bits, vals in ((0, 0, _DC_BITS, _DC_VALS),
                                 (1, 0, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    # pad each component plane to its full MCU grid (edge replicate)
    padded = []
    for plane, ch, cv, qid in comps:
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]),
                           (0, pw - plane.shape[1])), mode="edge")
        padded.append((p, ch, cv, qts[min(qid, len(qts) - 1)]))
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bytes(bw.out) + bytes([0xFF, 0xD0 + (rst & 7)])
                bw = _BitWriter()
                rst += 1
                preds = [0] * ncomp
            for ci, (p, ch, cv, qt) in enumerate(padded):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coefs = _DCTM @ block @ _DCTM.T
                        q = np.rint(coefs / qt).astype(np.int64)
                        preds[ci] = _encode_block(bw, q, preds[ci],
                                                  dc_codes, ac_codes)
            mcu += 1
    bw.flush()
    out += bytes(bw.out) + b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------ decoder


# every SOFn frame marker (T.81 table B.1): baseline C0, extended C1,
# progressive C2, lossless C3, differential C5-C7, arithmetic C9-CB,
# differential-arithmetic CD-CF (C4=DHT, C8=JPG, CC=DAC are NOT frames)
_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC))


def jpeg_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the SOF header — no entropy decode, the
    metadata fast path. Reads EVERY SOFn frame type (progressive SOF2,
    arithmetic SOF9... included): metadata extraction must succeed on
    streams the full decoder rejects, so ``mm_meta`` works across a
    real crawl while ``decode_jpeg_baseline`` keeps failing loudly."""
    for marker, seg, _ in _segments(payload):
        if marker in _SOF_MARKERS:
            _, h, w = struct.unpack(">BHH", seg[:5])
            return (w, h)
    raise UnsupportedImageError("jpeg: no SOF marker found")


def _segments(payload: bytes):
    """Yield (marker, segment_bytes, next_pos) until SOS or EOI."""
    if payload[:2] != b"\xff\xd8":
        raise UnsupportedImageError("not a jpeg stream")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise UnsupportedImageError("jpeg: marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            return
        ln = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        if pos + 2 + ln > len(payload):
            raise UnsupportedImageError("jpeg: segment truncated")
        seg = payload[pos + 4:pos + 2 + ln]
        yield marker, seg, pos + 2 + ln
        if marker == 0xDA:  # SOS: entropy data follows, caller takes over
            return
        pos += 2 + ln


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode any supported JFIF stream → ``(h, w, 3)`` uint8 RGB,
    dispatching on the frame type: SOF0/SOF1 → the baseline-sequential
    decoder below, SOF2 → the progressive decoder
    (:mod:`themis_spark.functions.jpegprogressive`). Everything else
    (lossless, arithmetic, hierarchical) still fails loudly."""
    for marker, _seg, _ in _segments(payload):
        if marker in _SOF_MARKERS:
            if marker in (0xC0, 0xC1):
                return decode_jpeg_baseline(payload)
            if marker == 0xC2:
                from themis_spark.functions.jpegprogressive import (
                    decode_jpeg_progressive)
                return decode_jpeg_progressive(payload)
            raise UnsupportedImageError(
                f"jpeg: frame type SOF{marker - 0xC0} unsupported "
                "(baseline sequential and progressive-Huffman only)")
    raise UnsupportedImageError("jpeg: no SOF marker found")


def decode_jpeg_baseline(payload: bytes) -> np.ndarray:
    """Decode baseline-sequential JFIF bytes → ``(h, w, 3)`` uint8 RGB
    (grayscale replicates into 3 channels, matching decode_image's
    contract). Raises :class:`UnsupportedImageError` for progressive /
    arithmetic / >2× sampling streams."""
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    restart = 0
    H = W = 0
    scan: list[dict] = []
    data_pos = -1
    for marker, seg, nxt in _segments(payload):
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec == 0:
                    vals = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    vals = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                if len(vals) != 64:
                    raise UnsupportedImageError("jpeg: truncated DQT")
                qt = np.zeros(64)
                qt[ZIGZAG] = vals.astype(np.float64)
                qtables[tid] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                # hostile/corrupt DHT: short counts array or fewer
                # symbol bytes than the counts promise
                if len(bits) < 16 or len(vals) < n:
                    raise UnsupportedImageError("jpeg: truncated DHT")
                htables[(cls, tid)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, H, W, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise UnsupportedImageError("jpeg: only 8-bit precision")
            if len(seg) < 6 + 3 * nc:
                raise UnsupportedImageError("jpeg: truncated SOF")
            for ci in range(nc):
                cid, hv, qid = seg[6 + 3 * ci:9 + 3 * ci]
                h, v = hv >> 4, hv & 0xF
                # T.81 allows 1..4; zero factors (corrupt/hostile SOF)
                # would divide by zero in the upsampler
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise UnsupportedImageError(
                        f"jpeg: bad sampling factors {h}x{v}")
                comps.append({"id": cid, "h": h, "v": v, "q": qid})
        elif marker in (0xC2, 0xC3, 0xC9, 0xCA):
            raise UnsupportedImageError(
                "jpeg: progressive/arithmetic streams unsupported "
                "(baseline sequential only)")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if len(seg) < 1 + 2 * ns:
                raise UnsupportedImageError("jpeg: truncated SOS header")
            for si in range(ns):
                cid, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next((c for c in comps if c["id"] == cid), None)
                if comp is None:
                    raise UnsupportedImageError(
                        f"jpeg: scan references unknown component {cid}")
                scan.append({**comp, "dc": tabs >> 4, "ac": tabs & 0xF})
            data_pos = nxt
    if data_pos < 0 or not scan:
        raise UnsupportedImageError("jpeg: no scan found")
    if len(scan) < len(comps):
        # conformant baseline MAY ship one scan per component
        # (non-interleaved); _segments stops at the first SOS, so
        # decoding would silently return just the first scan's plane —
        # refuse loudly instead of returning wrong pixels
        raise UnsupportedImageError(
            "jpeg: non-interleaved multi-scan baseline unsupported "
            f"(first scan covers {len(scan)}/{len(comps)} components)")
    if H * W > MAX_PIXELS:
        # decode-bomb guard: SOF dims are attacker-controlled in crawl
        # bytes (65535x65535 would allocate ~34 GB of planes before any
        # entropy data is validated); same posture as Pillow's
        # MAX_IMAGE_PIXELS — raise before allocating
        raise UnsupportedImageError(
            f"jpeg: {W}x{H} exceeds MAX_PIXELS={MAX_PIXELS} "
            "(decode-bomb guard; raise jpegcodec.MAX_PIXELS to override)")
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        raise UnsupportedImageError("jpeg: sampling factors beyond 2x2")
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in scan]
    rd = _BitReader(payload, data_pos)
    preds = [0] * len(scan)
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu = my * mcux + mx
            if restart and mcu and mcu % restart == 0:
                rd.sync_restart(rst)
                rst += 1
                preds = [0] * len(scan)
            for si, c in enumerate(scan):
                try:
                    qt = qtables[c["q"]]
                    dct = htables[(0, c["dc"])]
                    act = htables[(1, c["ac"])]
                except KeyError as e:
                    raise UnsupportedImageError(
                        f"jpeg: scan references missing table {e}")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64)
                        cat = rd.read_symbol(dct)
                        diff = 0
                        if cat:
                            diff = rd.read_bits(cat)
                            if diff < (1 << (cat - 1)):
                                diff -= (1 << cat) - 1
                        preds[si] += diff
                        zz[0] = preds[si]
                        k = 1
                        while k < 64:
                            sym = rd.read_symbol(act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise UnsupportedImageError(
                                        "jpeg: bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise UnsupportedImageError(
                                    "jpeg: AC index overflow")
                            v = rd.read_bits(size)
                            if v < (1 << (size - 1)):
                                v -= (1 << size) - 1
                            zz[k] = v
                            k += 1
                        coefs = np.zeros(64)
                        coefs[ZIGZAG] = zz * qt.reshape(64)[ZIGZAG]
                        block = _DCTM.T @ coefs.reshape(8, 8) @ _DCTM
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[si][y0:y0 + 8, x0:x0 + 8] = block + 128.0
    full = []
    for si, c in enumerate(scan):
        p = planes[si]
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:H, :W])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(full) != 3:
        raise UnsupportedImageError("jpeg: unsupported component count")
    return _ycbcr_to_rgb(full)


# ----------------------------------------------------------------- EXIF

def jpeg_exif_orientation(payload: bytes) -> int | None:
    """Orientation (tag 0x0112, values 1–8) from the first APP1 Exif
    segment's TIFF IFD0, or ``None`` when absent. Unlike the pixel
    codecs, malformed EXIF returns ``None`` instead of raising: the
    tag is ADVISORY display metadata pervasively corrupted by real
    editors, and a broken orientation must not make an otherwise
    decodable crawl image fail — the neutral reading is 'no rotation
    recorded' (TIFF 6.0 / Exif 2.3, public specs)."""
    for marker, seg, _ in _segments(payload):
        if marker != 0xE1 or seg[:6] != b"Exif\x00\x00":
            continue
        tiff = seg[6:]
        try:
            if tiff[:2] == b"II":
                fmt = "<"
            elif tiff[:2] == b"MM":
                fmt = ">"
            else:
                return None
            if struct.unpack(fmt + "H", tiff[2:4])[0] != 42:
                return None
            ifd = struct.unpack(fmt + "I", tiff[4:8])[0]
            n = struct.unpack(fmt + "H", tiff[ifd:ifd + 2])[0]
            for i in range(n):
                e = ifd + 2 + 12 * i
                tag, typ = struct.unpack(fmt + "HH", tiff[e:e + 4])
                if tag == 0x0112 and typ == 3:  # SHORT
                    val = struct.unpack(fmt + "H", tiff[e + 8:e + 10])[0]
                    return val if 1 <= val <= 8 else None
            return None
        except struct.error:
            return None
    return None


def insert_exif_orientation(payload: bytes, orientation: int) -> bytes:
    """Splice a minimal APP1 Exif segment (one-entry IFD0 carrying the
    orientation tag) right after SOI — the fixture writer for testing
    orientation handling in this Pillow-less container."""
    if payload[:2] != b"\xff\xd8":
        raise UnsupportedImageError("not a jpeg stream")
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation must be 1..8, got {orientation}")
    tiff = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0112, 3, 1)
            + struct.pack("<HH", orientation, 0)
            + struct.pack("<I", 0))
    body = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return payload[:2] + seg + payload[2:]
