"""Pure-stdlib WebP support: container metadata for every variant and a
full VP8L (lossless) pixel decoder.

WebP is the one common web image format the builtin codec family did
not cover (round-4 verdict missing-item 1: >10% of images on modern
crawls) — a multimodal pass over real Common Crawl would fail-closed on
every WebP payload. This module closes that in two tiers, written
against the public specs only (RIFF container spec + "WebP Lossless
Bitstream Specification"; VP8 frame header per RFC 6386 §9.1):

* **Metadata fast path** (``webp_meta``): dims + variant + frame count
  from the RIFF chunk headers alone — ``VP8X`` canvas (24-bit wh),
  ``VP8L`` 14-bit wh stream header, lossy ``VP8 `` keyframe header.
  No entropy decode; this is what ``mm_meta`` runs at 100 TB.
* **VP8L lossless decode** (``decode_webp``): the complete lossless
  bitstream — LSB-first bit reader, canonical prefix codes (simple +
  normal forms, code-length codes with 16/17/18 repeats and the
  max-symbol cap), meta prefix groups, color cache, LZ77 backward
  references with the 120-entry short-distance plane map, and all four
  transforms inverted in reverse stream order (predictor with the 14
  modes, cross-channel color transform, subtract-green, color indexing
  with sub-byte pixel bundling). Lossy VP8 pixel data needs a full VP8
  intra decoder + loop filter and is NOT implemented: it raises
  ``UnsupportedImageError`` loudly (fail-closed, like the other
  codecs) while its dims still come from the metadata tier.

``encode_webp_vp8l`` is the fixture writer (same role as encode_png /
encode_gif): a naive but spec-true encoder able to emit every feature
the decoder consumes — literal-only, LZ77 with map-coded and plain
distances, subtract-green, predictor and color transforms with their
entropy-coded sub-images, palette (color-indexing) with bundling, and
color-cache hits — so round-trip tests exercise each path bit-exactly.

Decode is an executor-side Arrow-batch kernel like the rest of the
codec family (operators/multimodal.py) — per-batch Python, never a
per-row UDF — with the shared ``MAX_PIXELS`` decode-bomb ceiling and
typed ``UnsupportedImageError`` on every malformed-input path.
"""

from __future__ import annotations

import numpy as np

from themis_spark.functions.imagecodec import MAX_PIXELS, UnsupportedImageError

# ----------------------------------------------------------- bit I/O

_VP8L_MAGIC = 0x2F


class _Bits:
    """LSB-first bit reader over bytes (the VP8L convention). Raises
    typed on overrun — truncated payloads must never read garbage."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > self.nbits:
            raise UnsupportedImageError("vp8l: truncated bitstream")
        v = 0
        for i in range(n):
            v |= ((self.data[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v


class _BitW:
    """LSB-first bit writer (fixture encoder side)."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        for i in range(nbits):
            self.cur |= ((val >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.n = 0

    def write_code(self, code: int, length: int) -> None:
        # prefix codes are walked MSB-of-code first
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.cur)
            self.cur, self.n = 0, 0
        return bytes(self.out)


# ------------------------------------------------------ prefix codes


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, canonical code), DEFLATE-style assignment
    (shorter first, ties by symbol order)."""
    nz = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev = 0
    for l, s in nz:
        code <<= (l - prev)
        prev = l
        codes[s] = (l, code)
        code += 1
    return codes


class _Huff:
    """Canonical prefix decoder. A single-symbol code consumes ZERO
    bits per read (the spec's degenerate-tree rule); multi-symbol codes
    must be COMPLETE (fail-closed on over/under-subscribed lengths)."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise UnsupportedImageError("vp8l: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        self.table = {}
        code = 0
        prev = 0
        for l, s in sorted(nz):
            code <<= (l - prev)
            prev = l
            if (l, code) in self.table or code >= (1 << l):
                raise UnsupportedImageError("vp8l: over-subscribed code")
            self.table[(l, code)] = s
            code += 1
        if code != (1 << prev):
            raise UnsupportedImageError("vp8l: incomplete prefix code")
        self.max_len = prev

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            s = self.table.get((length, code))
            if s is not None:
                return s
            if length > self.max_len:
                raise UnsupportedImageError("vp8l: invalid code word")


#: order in which code-length-code lengths are stored (spec §6.2.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _Bits, alphabet: int) -> _Huff:
    if br.read(1):  # simple code: 1 or 2 symbols
        num_symbols = br.read(1) + 1
        sym0 = br.read(8) if br.read(1) else br.read(1)
        lengths = [0] * alphabet
        if sym0 >= alphabet:
            raise UnsupportedImageError("vp8l: simple-code symbol out of range")
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet or sym1 == sym0:
                raise UnsupportedImageError("vp8l: bad simple-code symbols")
            lengths[sym1] = 1
        return _Huff(lengths)
    # normal code: code lengths themselves prefix-coded
    num_cl = 4 + br.read(4)
    cl = [0] * 19
    for i in range(num_cl):
        cl[_CL_ORDER[i]] = br.read(3)
    cl_tree = _Huff(cl)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    sym = 0
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        c = cl_tree.read(br)
        if c < 16:
            lengths[sym] = c
            sym += 1
            if c:
                prev_len = c
        elif c == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet:
                raise UnsupportedImageError("vp8l: repeat overruns alphabet")
            for _ in range(rep):
                lengths[sym] = prev_len
                sym += 1
        elif c == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet:
            raise UnsupportedImageError("vp8l: zero-run overruns alphabet")
    return _Huff(lengths)


def _prefix_value(code: int, br: _Bits) -> int:
    """Length/distance prefix decoding (spec §5.2.2): 24 codes like
    DEFLATE's — small values direct, then exponentially sized ranges
    with extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits, extra_value) — encoder side,
    exact inverse of :func:`_prefix_value`: x = value-1 lands in
    [(2+b)·2^e, (3+b)·2^e) for code 2e+2+b."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    e = x.bit_length() - 2
    b = (x >> e) & 1
    return 2 * e + 2 + b, e, x & ((1 << e) - 1)


# 120-entry short-distance map (spec §5.2.2): (dx, dy) neighbor offsets
# ordered by squared distance, then larger dy first, then |dx| with the
# positive offset before the negative. dist = dy*width + dx (min 1).
def _gen_distance_map() -> list[tuple[int, int]]:
    cand = [(x, y) for y in range(9) for x in range(-7, 9)
            if y > 0 or x > 0]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                             abs(p[0]), p[0] < 0))
    return cand[:120]


_DIST_MAP = _gen_distance_map()
_DIST_CODE = {v: i + 1 for i, v in enumerate(_DIST_MAP)}


def _plane_to_dist(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(1, dy * xsize + dx)


# -------------------------------------------------- transform inverses


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _pred_avg2_px(a: int, b: int) -> int:
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select_pred(l: int, t: int, tl: int) -> int:
    pa = pb = 0
    for sh in (24, 16, 8, 0):
        p = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        pa += abs(p - ((l >> sh) & 0xFF))
        pb += abs(p - ((t >> sh) & 0xFF))
    return l if pa <= pb else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)
                      - ((tl >> sh) & 0xFF)) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _pred_avg2_px(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        # C-semantics (a - b) / 2 truncates toward zero
        out |= _clamp(a + int((a - b) / 2)) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _pred_avg2_px(_pred_avg2_px(l, tr), t)
    if mode == 6:
        return _pred_avg2_px(l, tl)
    if mode == 7:
        return _pred_avg2_px(l, t)
    if mode == 8:
        return _pred_avg2_px(tl, t)
    if mode == 9:
        return _pred_avg2_px(t, tr)
    if mode == 10:
        return _pred_avg2_px(_pred_avg2_px(l, tl), _pred_avg2_px(t, tr))
    if mode == 11:
        return _select_pred(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise UnsupportedImageError(f"vp8l: predictor mode {mode}")


def _add_px(a: int, b: int) -> int:
    """Per-channel modulo-256 addition of two packed ARGB values."""
    return (((a & 0xFF000000) + (b & 0xFF000000)) & 0xFF000000) \
        | (((a & 0x00FF0000) + (b & 0x00FF0000)) & 0x00FF0000) \
        | (((a & 0x0000FF00) + (b & 0x0000FF00)) & 0x0000FF00) \
        | (((a & 0x000000FF) + (b & 0x000000FF)) & 0x000000FF)


def _sub_px(a: int, b: int) -> int:
    return (((a & 0xFF000000) - (b & 0xFF000000)) & 0xFF000000) \
        | (((a & 0x00FF0000) - (b & 0x00FF0000)) & 0x00FF0000) \
        | (((a & 0x0000FF00) - (b & 0x0000FF00)) & 0x0000FF00) \
        | (((a & 0x000000FF) - (b & 0x000000FF)) & 0x000000FF)


def _predictor_inverse(pix: list[int], w: int, h: int, sub: list[int],
                       size_bits: int, sub_w: int) -> None:
    """In-place: pix holds residues; add the per-block prediction, in
    scan order (predictions read already-reconstructed neighbors).
    Edge rules per spec: (0,0) predicts opaque black, top row predicts
    LEFT, left column predicts TOP; TR on the right edge wraps to the
    leftmost pixel of the same row (libwebp convention: row start)."""
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]
            elif x == 0:
                pred = pix[i - w]
            else:
                mode = (sub[(y >> size_bits) * sub_w + (x >> size_bits)]
                        >> 8) & 0xFF
                l = pix[i - 1]
                t = pix[i - w]
                tr = pix[i - w + 1] if x + 1 < w else pix[i - w]
                tl = pix[i - w - 1]
                pred = _predict(mode, l, t, tr, tl)
            pix[i] = _add_px(pix[i], pred)


def _predictor_forward(pix: list[int], w: int, h: int, sub: list[int],
                       size_bits: int, sub_w: int) -> list[int]:
    """Forward predictor (fixture encoder + round-trip tests): residue
    = pixel - prediction, predictions from the ORIGINAL pixels (which
    equal the decoder's reconstructed ones, processed in scan order)."""
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]
            elif x == 0:
                pred = pix[i - w]
            else:
                mode = (sub[(y >> size_bits) * sub_w + (x >> size_bits)]
                        >> 8) & 0xFF
                tr = pix[i - w + 1] if x + 1 < w else pix[i - w]
                pred = _predict(mode, pix[i - 1], pix[i - w], tr,
                                pix[i - w - 1])
            out[i] = _sub_px(pix[i], pred)
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-8-bit product >> 5 (spec §4.2)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _color_inverse(pix: list[int], w: int, h: int, sub: list[int],
                   size_bits: int, sub_w: int) -> None:
    """In-place inverse cross-channel color transform. The transform
    element rides in a sub-image pixel: green_to_red in BLUE bits,
    green_to_blue in GREEN bits, red_to_blue in RED bits."""
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = sub[(y >> size_bits) * sub_w + (x >> size_bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            p = pix[i]
            g = (p >> 8) & 0xFF
            r = (p >> 16) & 0xFF
            b = p & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _color_forward(pix: list[int], w: int, h: int, sub: list[int],
                   size_bits: int, sub_w: int) -> list[int]:
    out = list(pix)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = sub[(y >> size_bits) * sub_w + (x >> size_bits)]
            g2r = cte & 0xFF
            g2b = (cte >> 8) & 0xFF
            r2b = (cte >> 16) & 0xFF
            p = pix[i]
            g = (p >> 8) & 0xFF
            r0 = (p >> 16) & 0xFF
            b0 = p & 0xFF
            r = (r0 - _ct_delta(g2r, g)) & 0xFF
            b = (b0 - _ct_delta(g2b, g) - _ct_delta(r2b, r0)) & 0xFF
            out[i] = (p & 0xFF00FF00) | (r << 16) | b
    return out


def _subtract_green_inverse(pix: list[int]) -> None:
    for i, p in enumerate(pix):
        g = (p >> 8) & 0xFF
        r = ((p >> 16) + g) & 0xFF
        b = (p + g) & 0xFF
        pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _palette_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _color_index_inverse(pix: list[int], packed_w: int, h: int,
                         palette: list[int], pbits: int,
                         orig_w: int) -> list[int]:
    """Unbundle sub-byte indices from the green channel and look up the
    delta-decoded palette; out-of-range indices decode to transparent
    black per spec."""
    n = len(palette)
    out = [0] * (orig_w * h)
    if pbits == 0:
        for i, p in enumerate(pix):
            idx = (p >> 8) & 0xFF
            out[i] = palette[idx] if idx < n else 0
        return out
    per = 1 << pbits            # pixels bundled per packed pixel
    bw = 8 >> pbits             # bits per index
    mask = (1 << bw) - 1
    for y in range(h):
        for px in range(packed_w):
            g = (pix[y * packed_w + px] >> 8) & 0xFF
            for k in range(per):
                x = px * per + k
                if x >= orig_w:
                    break
                idx = (g >> (k * bw)) & mask
                out[y * orig_w + x] = palette[idx] if idx < n else 0
    return out


# ---------------------------------------------------------- decoding


def _hash_pixel(p: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)


def _decode_entropy_image(br: _Bits, w: int, h: int,
                          is_level0: bool) -> tuple[list[int], list, int]:
    """One image stream (spec §6): transforms (level 0 only), color
    cache, optional meta prefix groups (level 0), prefix codes, then
    the LZ77-coded ARGB stream. Returns (pixels, transforms, xsize) —
    xsize may shrink under color-indexing bundling."""
    transforms: list[tuple] = []
    xsize = w
    if is_level0:
        seen = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise UnsupportedImageError("vp8l: duplicate transform")
            seen.add(t)
            if t == 2:  # subtract green: no payload
                transforms.append((2, None))
            elif t in (0, 1):  # predictor / color transform
                size_bits = br.read(3) + 2
                bs = 1 << size_bits
                tw = (xsize + bs - 1) >> size_bits
                th = (h + bs - 1) >> size_bits
                sub, _, _ = _decode_entropy_image(br, tw, th, False)
                transforms.append((t, (size_bits, sub, tw)))
            else:  # 3: color indexing
                n_colors = br.read(8) + 1
                raw_pal, _, _ = _decode_entropy_image(br, n_colors, 1, False)
                palette = []
                acc = 0
                for dp in raw_pal:  # successive-difference coded
                    acc = _add_px(acc, dp)
                    palette.append(acc)
                pbits = _palette_bits(n_colors)
                transforms.append((3, (palette, pbits, xsize)))
                if pbits:
                    xsize = (xsize + (1 << pbits) - 1) >> pbits
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise UnsupportedImageError(f"vp8l: cache bits {cache_bits}")
    meta = None
    meta_bits = 0
    meta_w = 0
    num_groups = 1
    if is_level0 and br.read(1):  # meta prefix-code image
        meta_bits = br.read(3) + 2
        bs = 1 << meta_bits
        mw = (xsize + bs - 1) >> meta_bits
        mh = (h + bs - 1) >> meta_bits
        meta_img, _, _ = _decode_entropy_image(br, mw, mh, False)
        meta = [(p >> 8) & 0xFFFF for p in meta_img]  # (red<<8)|green
        num_groups = max(meta) + 1
        meta_w = mw
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(num_groups):
        groups.append((
            _read_prefix_code(br, 256 + 24 + cache_size),  # green+len+cache
            _read_prefix_code(br, 256),                    # red
            _read_prefix_code(br, 256),                    # blue
            _read_prefix_code(br, 256),                    # alpha
            _read_prefix_code(br, 40),                     # distance
        ))
    n = xsize * h
    pix = [0] * n
    cache = [0] * cache_size
    pos = 0
    g_tree, r_tree, b_tree, a_tree, d_tree = groups[0]
    while pos < n:
        if meta is not None:
            x = pos % xsize
            y = pos // xsize
            g_tree, r_tree, b_tree, a_tree, d_tree = groups[
                meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        s = g_tree.read(br)
        if s < 256:  # literal
            red = r_tree.read(br)
            blue = b_tree.read(br)
            alpha = a_tree.read(br)
            p = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = p
            pos += 1
            if cache_size:
                cache[_hash_pixel(p, cache_bits)] = p
        elif s < 280:  # LZ77 backward reference
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(d_tree.read(br), br)
            dist = _plane_to_dist(dist_code, xsize)
            if dist > pos or pos + length > n:
                raise UnsupportedImageError("vp8l: backward ref out of range")
            for _ in range(length):
                p = pix[pos - dist]
                pix[pos] = p
                pos += 1
                if cache_size:
                    cache[_hash_pixel(p, cache_bits)] = p
        else:  # color-cache hit
            idx = s - 280
            if idx >= cache_size:
                raise UnsupportedImageError("vp8l: cache index out of range")
            pix[pos] = cache[idx]
            pos += 1
    return pix, transforms, xsize


def decode_vp8l(stream: bytes) -> np.ndarray:
    """Raw VP8L chunk payload → (h, w, 3) uint8 RGB (alpha dropped —
    same contract as the PNG RGBA path)."""
    if not stream or stream[0] != _VP8L_MAGIC:
        raise UnsupportedImageError("vp8l: bad signature byte")
    br = _Bits(stream)
    br.read(8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint
    if br.read(3) != 0:
        raise UnsupportedImageError("vp8l: unknown version")
    if w * h > MAX_PIXELS:
        raise UnsupportedImageError(f"vp8l: refusing {w}x{h}")
    pix, transforms, xsize = _decode_entropy_image(br, w, h, True)
    # inverse transforms in reverse stream order
    for t, arg in reversed(transforms):
        if t == 3:
            palette, pbits, orig_w = arg
            pix = _color_index_inverse(pix, xsize, h, palette, pbits, orig_w)
            xsize = orig_w
        elif t == 2:
            _subtract_green_inverse(pix)
        elif t == 1:
            size_bits, sub, sub_w = arg
            _color_inverse(pix, xsize, h, sub, size_bits, sub_w)
        else:
            size_bits, sub, sub_w = arg
            _predictor_inverse(pix, xsize, h, sub, size_bits, sub_w)
    arr = np.array(pix, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 3), np.uint8)
    out[:, :, 0] = (arr >> 16) & 0xFF
    out[:, :, 1] = (arr >> 8) & 0xFF
    out[:, :, 2] = arr & 0xFF
    return out


# --------------------------------------------------- RIFF container


def _riff_chunks(payload: bytes):
    """Walk WebP RIFF chunks: yields (fourcc, offset, size). Sizes are
    validated against the buffer (truncation raises typed)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise UnsupportedImageError("not a webp stream")
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        fourcc = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if pos + 8 + size > n:
            raise UnsupportedImageError("webp: truncated chunk")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks pad to even


def webp_meta(payload: bytes) -> dict:
    """Metadata fast path — dims/variant/frames from chunk headers, no
    entropy decode:

    * ``VP8X`` extended header: 24-bit canvas width/height minus one;
      animation frame count from the ``ANMF`` chunks.
    * ``VP8L``: 14-bit wh from the 5-byte stream header.
    * ``VP8 `` lossy keyframe: 3-byte frame tag, the 0x9D012A start
      code, then 14-bit wh (RFC 6386 §9.1).
    """
    variant = None
    w = h = None
    n_frames = 0
    for fourcc, off, size in _riff_chunks(payload):
        if fourcc == b"VP8X" and size >= 10:
            variant = variant or "vp8x"
            if w is None:
                w = 1 + int.from_bytes(payload[off + 4:off + 7], "little")
                h = 1 + int.from_bytes(payload[off + 7:off + 10], "little")
        elif fourcc == b"VP8L" and size >= 5:
            variant = "vp8l" if variant is None else variant
            if w is None:
                bits = int.from_bytes(payload[off + 1:off + 5], "little")
                if payload[off] != _VP8L_MAGIC:
                    raise UnsupportedImageError("vp8l: bad signature byte")
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
        elif fourcc == b"VP8 " and size >= 10:
            variant = "vp8" if variant is None else variant
            if w is None:
                if payload[off + 3:off + 6] != b"\x9d\x01\x2a":
                    raise UnsupportedImageError("vp8: bad start code")
                w = int.from_bytes(payload[off + 6:off + 8], "little") & 0x3FFF
                h = int.from_bytes(payload[off + 8:off + 10], "little") & 0x3FFF
        elif fourcc == b"ANMF":
            n_frames += 1
    if variant is None or w is None:
        raise UnsupportedImageError("webp: no image chunk found")
    return {"variant": variant, "width": w, "height": h,
            "n_frames": max(1, n_frames)}


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP container → pixels. VP8L (lossless) decodes fully — also
    when wrapped in a VP8X extended container; lossy VP8 raises loudly
    (dims remain available via :func:`webp_meta`)."""
    for fourcc, off, size in _riff_chunks(payload):
        if fourcc == b"VP8L":
            return decode_vp8l(payload[off:off + size])
    m = webp_meta(payload)
    raise UnsupportedImageError(
        f"webp: variant {m['variant']!r} needs a full VP8 intra decoder "
        "(builtin support covers lossless VP8L; dims via webp_meta)")


# ------------------------------------------------- fixture encoder


def _assign_complete_lengths(n: int) -> list[int]:
    """Shortest COMPLETE canonical length assignment for n symbols
    (Kraft sum exactly 1): 2^k - n codes at depth k-1, the rest at k."""
    if n == 1:
        return [1]
    k = (n - 1).bit_length()
    short = (1 << k) - n
    return [k - 1] * short + [k] * (n - short)


def _write_prefix_code(bw: _BitW, lengths: list[int], alphabet: int) -> None:
    """Emit one prefix code in normal form (code-length codes + the
    max-symbol cap when the tail is all zeros), or simple form for <=2
    symbols that fit its value budget."""
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if not nz:
        raise ValueError("fixture encoder: empty code")
    if len(nz) <= 2 and all(s < 256 for s in nz) \
            and all(lengths[s] == 1 for s in nz):
        # simple form: 1-2 symbols, 8-bit (or 1-bit) symbol values
        bw.write(1, 1)
        bw.write(len(nz) - 1, 1)
        if nz[0] < 2:
            bw.write(0, 1)
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # normal code
    last = max(nz)
    # build the code-length symbol sequence (16 repeat-prev unused: the
    # fixture writer spells every length; zero runs use 17/18)
    seq: list[tuple[int, int, int]] = []  # (cl_symbol, extra_bits, extra_val)
    i = 0
    while i <= last:
        if lengths[i] == 0:
            j = i
            while j <= last and lengths[j] == 0:
                j += 1
            run = j - i
            while run > 0:
                if run >= 11:
                    take = min(run, 138)
                    seq.append((18, 7, take - 11))
                elif run >= 3:
                    take = min(run, 10)
                    seq.append((17, 3, take - 3))
                else:
                    take = 1
                    seq.append((0, 0, 0))
                run -= take
            i = j
        else:
            seq.append((lengths[i], 0, 0))
            i += 1
    used = sorted({s for s, _, _ in seq})
    cl_lengths = [0] * 19
    if len(used) == 1:
        cl_lengths[used[0]] = 1
    else:
        for sym, l in zip(used, _assign_complete_lengths(len(used))):
            cl_lengths[sym] = l
    # num_code_lengths must cover every used symbol's position in order
    need = max(_CL_ORDER.index(s) for s in used) + 1
    num_cl = max(4, need)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    # The "max symbol" field is a READ BUDGET: the decoder decrements it
    # once per code-length token and stops at zero, zero-filling the
    # tail. If the sequence covers the whole alphabet the loop ends on
    # its own (no cap needed); otherwise the cap must equal the exact
    # token count or the decoder would read past our tokens.
    if last + 1 == alphabet:
        bw.write(0, 1)
    else:
        if len(seq) < 2:
            raise ValueError("fixture encoder: degenerate token count")
        bw.write(1, 1)
        val = len(seq) - 2
        k = 0
        while (1 << (2 + 2 * k)) <= val:  # smallest 2+2k-bit field
            k += 1
        if k > 7:
            raise ValueError("fixture encoder: token count too large")
        bw.write(k, 3)
        bw.write(val, 2 + 2 * k)
    cl_codes = _canonical_codes(cl_lengths)
    for sym, extra_bits, extra_val in seq:
        l, c = cl_codes[sym]
        bw.write_code(c, l)
        if extra_bits:
            bw.write(extra_val, extra_bits)


def _emit_image(bw: _BitW, pix: list[int], xsize: int,
                use_lz77: str | None = None,
                cache_bits: int = 0, level0: bool = False) -> None:
    """Entropy-code one image's pixel stream: color-cache header,
    prefix codes sized to the actual symbol usage, then tokens.
    ``use_lz77``: None (literal-only), "map" (dist 1 / xsize via the
    short-distance plane map), or "plain" (dist 1 via code 121).
    The meta-prefix bit exists only at level 0 (sub-resolution images
    have no such field in the spec)."""
    # tokenize
    tokens: list[tuple] = []  # ("lit", p) | ("copy", length, dist)
    n = len(pix)
    pos = 0
    cache = [0] * (1 << cache_bits) if cache_bits else []
    while pos < n:
        p = pix[pos]
        if cache_bits and cache[_hash_pixel(p, cache_bits)] == p and pos > 0:
            tokens.append(("cache", _hash_pixel(p, cache_bits)))
            pos += 1
            continue
        if use_lz77:
            best = None
            for dist in ((1, xsize) if use_lz77 == "map" else (1,)):
                if dist > pos:
                    continue
                run = 0
                while (pos + run < n and run < 256
                       and pix[pos + run] == pix[pos + run - dist]):
                    run += 1
                if run >= 3 and (best is None or run > best[0]):
                    best = (run, dist)
            if best:
                for k in range(best[0]):
                    q = pix[pos + k]
                    if cache_bits:
                        cache[_hash_pixel(q, cache_bits)] = q
                tokens.append(("copy", best[0], best[1]))
                pos += best[0]
                continue
        tokens.append(("lit", p))
        if cache_bits:
            cache[_hash_pixel(p, cache_bits)] = p
        pos += 1
    # gather alphabets
    cache_size = (1 << cache_bits) if cache_bits else 0
    g_alpha = 256 + 24 + cache_size
    g_count: dict[int, int] = {}
    r_count: dict[int, int] = {}
    b_count: dict[int, int] = {}
    a_count: dict[int, int] = {}
    d_count: dict[int, int] = {}
    for tok in tokens:
        if tok[0] == "lit":
            p = tok[1]
            g_count[(p >> 8) & 0xFF] = 1
            r_count[(p >> 16) & 0xFF] = 1
            b_count[p & 0xFF] = 1
            a_count[(p >> 24) & 0xFF] = 1
        elif tok[0] == "copy":
            lc, _, _ = _prefix_encode(tok[1])
            g_count[256 + lc] = 1
            if use_lz77 == "map" and tok[2] in (1, xsize):
                dcode = _DIST_CODE[(1, 0)] if tok[2] == 1 else _DIST_CODE[(0, 1)]
            else:
                dcode = tok[2] + 120
            dc, _, _ = _prefix_encode(dcode)
            d_count[dc] = 1
        else:
            g_count[280 + tok[1]] = 1

    def lengths_for(count: dict[int, int], alphabet: int) -> list[int]:
        syms = sorted(count)
        if not syms:
            syms = [0]
        lens = _assign_complete_lengths(len(syms))
        out = [0] * alphabet
        for s, l in zip(syms, lens):
            out[s] = l
        return out

    g_lengths = lengths_for(g_count, g_alpha)
    r_lengths = lengths_for(r_count, 256)
    b_lengths = lengths_for(b_count, 256)
    a_lengths = lengths_for(a_count, 256)
    d_lengths = lengths_for(d_count, 40)
    # header: color cache, then (level 0 only) the meta-prefix bit
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix codes
    for lens, alpha in ((g_lengths, g_alpha), (r_lengths, 256),
                       (b_lengths, 256), (a_lengths, 256),
                       (d_lengths, 40)):
        _write_prefix_code(bw, lens, alpha)
    def codes_or_single(lengths: list[int]):
        # a single-symbol tree consumes ZERO bits per read in the
        # decoder — the encoder must emit nothing for it
        nz = sum(1 for l in lengths if l > 0)
        return None if nz == 1 else _canonical_codes(lengths)

    def emit(codes, sym: int) -> None:
        if codes is None:
            return
        l, c = codes[sym]
        bw.write_code(c, l)

    g_codes = codes_or_single(g_lengths)
    r_codes = codes_or_single(r_lengths)
    b_codes = codes_or_single(b_lengths)
    a_codes = codes_or_single(a_lengths)
    d_codes = codes_or_single(d_lengths)
    for tok in tokens:
        if tok[0] == "lit":
            p = tok[1]
            emit(g_codes, (p >> 8) & 0xFF)
            emit(r_codes, (p >> 16) & 0xFF)
            emit(b_codes, p & 0xFF)
            emit(a_codes, (p >> 24) & 0xFF)
        elif tok[0] == "copy":
            length, dist = tok[1], tok[2]
            lc, eb, ev = _prefix_encode(length)
            emit(g_codes, 256 + lc)
            if eb:
                bw.write(ev, eb)
            if use_lz77 == "map" and dist in (1, xsize):
                dcode = _DIST_CODE[(1, 0)] if dist == 1 else _DIST_CODE[(0, 1)]
            else:
                dcode = dist + 120
            dc, deb, dev = _prefix_encode(dcode)
            emit(d_codes, dc)
            if deb:
                bw.write(dev, deb)
        else:
            emit(g_codes, 280 + tok[1])


def encode_webp_vp8l(img: np.ndarray, mode: str = "literal") -> bytes:
    """(h, w, 3) uint8 RGB → lossless WebP bytes. ``mode`` selects
    which decoder path the fixture exercises: ``literal``, ``lz77``
    (map-coded distances), ``lz77_plain`` (distance 1 via plain code
    121), ``cache`` (color-cache hits), ``subtract_green``,
    ``predictor`` (mode grid cycling all 14 predictors, entropy-coded
    sub-image), ``color`` (cross-channel transform, coded sub-image),
    ``palette`` (color indexing; bundles sub-byte indices when the
    image has <= 16 distinct colors)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    pix = [(0xFF000000 | (int(r) << 16) | (int(g) << 8) | int(b))
           for r, g, b in img.reshape(-1, 3)]
    bw = _BitW()
    bw.write(_VP8L_MAGIC, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha hint
    bw.write(0, 3)  # version
    xsize = w
    use_lz77 = {"lz77": "map", "lz77_plain": "plain"}.get(mode)
    cache_bits = 3 if mode == "cache" else 0
    if mode == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        for i, p in enumerate(pix):
            g = (p >> 8) & 0xFF
            r = ((p >> 16) - g) & 0xFF
            b = (p - g) & 0xFF
            pix[i] = (p & 0xFF00FF00) | (r << 16) | b
    elif mode in ("predictor", "color"):
        size_bits = 2
        bs = 1 << size_bits
        sub_w = (w + bs - 1) >> size_bits
        sub_h = (h + bs - 1) >> size_bits
        if mode == "predictor":
            sub = [0xFF000000 | (((i * 5) % 14) << 8)
                   for i in range(sub_w * sub_h)]
            pix = _predictor_forward(pix, w, h, sub, size_bits, sub_w)
            bw.write(1, 1)
            bw.write(0, 2)
        else:
            ctes = [(0x10, 0xF0, 0x08), (0x00, 0x20, 0x00), (0xE8, 0x05, 0x30)]
            sub = [0xFF000000 | (c[2] << 16) | (c[1] << 8) | c[0]
                   for c in (ctes[i % 3] for i in range(sub_w * sub_h))]
            pix = _color_forward(pix, w, h, sub, size_bits, sub_w)
            bw.write(1, 1)
            bw.write(1, 2)
        bw.write(size_bits - 2, 3)
        _emit_image(bw, sub, sub_w)
    elif mode == "palette":
        seen: dict[int, int] = {}
        for p in pix:
            if p not in seen:
                seen[p] = len(seen)
        palette = list(seen)
        n_colors = len(palette)
        if n_colors > 256:
            raise ValueError("palette fixture needs <= 256 distinct colors")
        pbits = _palette_bits(n_colors)
        idx = [seen[p] for p in pix]
        if pbits:
            per = 1 << pbits
            bwid = 8 >> pbits
            packed_w = (w + per - 1) >> pbits
            packed = []
            for y in range(h):
                for px in range(packed_w):
                    g = 0
                    for k in range(per):
                        x = px * per + k
                        if x < w:
                            g |= idx[y * w + x] << (k * bwid)
                    packed.append(0xFF000000 | (g << 8))
            pix = packed
            xsize = packed_w
        else:
            pix = [0xFF000000 | (i << 8) for i in idx]
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n_colors - 1, 8)
        deltas = [palette[0]] + [_sub_px(palette[i], palette[i - 1])
                                 for i in range(1, n_colors)]
        _emit_image(bw, deltas, n_colors)
    bw.write(0, 1)  # end of transforms
    _emit_image(bw, pix, xsize, use_lz77=use_lz77, cache_bits=cache_bits,
                level0=True)
    stream = bw.done()
    chunk = b"VP8L" + len(stream).to_bytes(4, "little") + stream
    if len(stream) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def encode_webp_vp8x(inner: bytes, canvas_w: int, canvas_h: int) -> bytes:
    """Wrap an encoded WebP's image chunk in a VP8X extended container
    (metadata-tier fixture: canvas dims come from the VP8X header)."""
    chunks = b""
    for fourcc, off, size in _riff_chunks(inner):
        if fourcc in (b"VP8L", b"VP8 "):
            body = inner[off:off + size]
            chunks = fourcc + size.to_bytes(4, "little") + body
            if size & 1:
                chunks += b"\x00"
            break
    if not chunks:
        raise UnsupportedImageError("vp8x wrap: no image chunk in input")
    vp8x = (b"\x00" + b"\x00\x00\x00"
            + (canvas_w - 1).to_bytes(3, "little")
            + (canvas_h - 1).to_bytes(3, "little"))
    payload = b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x + chunks
    return b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload


def encode_vp8_lossy_stub(w: int, h: int) -> bytes:
    """A minimal lossy-VP8 WebP whose FRAME HEADER is valid (keyframe
    tag + start code + dims) but whose coefficient data is absent —
    the metadata tier reads dims from it; decode refuses loudly.
    RFC 6386 §9.1 layout."""
    frame_tag = (0 | (0 << 1) | (1 << 4) | (10 << 5)).to_bytes(3, "little")
    header = frame_tag + b"\x9d\x01\x2a" + w.to_bytes(2, "little") \
        + h.to_bytes(2, "little")
    body = header + b"\x00" * 10
    chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
