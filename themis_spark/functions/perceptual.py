"""Perceptual image hashing: aHash / dHash / pHash over decoded pixels.

The image-side analogue of SimHash for text: two renderings of the same
picture (re-encoded, resized, slightly recompressed) land within a few
bits of Hamming distance, so near-duplicate IMAGES reduce to the same
banded Hamming-blocking plan the text near-dup operators already use
(operators/dedup.hamming_near_duplicates).

Kernels are deliberately integer-exact where the DuckDB oracle replays
them (aHash/dHash: BT.601 grayscale with floor division, nearest-
neighbor downsampling by integer index mapping — the same convention as
imagecodec.resize_nearest — and strict > comparisons). pHash needs a
real 2-D DCT (floats); its basis matrix is GENERATED from the DCT-II
definition and cross-checked against an O(n^4) direct transform in
tests, mirroring the JPEG codec's IDCT discipline.

All hashes are 64-bit, returned as Python ints in [0, 2^64); callers
that store them in Spark LongType wrap to signed via ``to_signed64``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "grayscale_bt601", "downsample_nearest", "average_hash", "diff_hash",
    "dct_hash", "to_signed64",
]


def to_signed64(h: int) -> int:
    """Map [0, 2^64) to the equivalent signed 64-bit value (Spark LongType)."""
    return h - (1 << 64) if h >= (1 << 63) else h


def grayscale_bt601(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma with FLOOR division — integer-exact, so a
    constant (v, v, v) pixel grays to exactly v (299+587+114 = 1000)."""
    if img.ndim == 2:
        return img.astype(np.int64)
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    return (299 * r + 587 * g + 114 * b) // 1000


def downsample_nearest(gray: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Integer index mapping ``src = dst * size // target`` — identical
    convention to imagecodec.resize_nearest, so the oracle states sample
    positions with pure integer arithmetic."""
    h, w = gray.shape
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return gray[ys][:, xs]


def average_hash(img: np.ndarray) -> int:
    """aHash: 8x8 grayscale, bit = sample strictly above the mean.

    The mean compare is exact integer arithmetic (g * 64 > total), no
    float rounding — a sample equal to the mean is 0."""
    g = downsample_nearest(grayscale_bt601(img), 8, 8)
    total = int(g.sum())
    bits = (g.astype(np.int64) * 64) > total
    h = 0
    for i, b in enumerate(bits.flatten()):
        if b:
            h |= 1 << i
    return h


def diff_hash(img: np.ndarray) -> int:
    """dHash: 9x8 grayscale, bit = right neighbor strictly brighter.

    Gradient-based, the most re-encode-robust of the cheap hashes."""
    g = downsample_nearest(grayscale_bt601(img), 9, 8)
    bits = g[:, 1:] > g[:, :-1]
    h = 0
    for i, b in enumerate(bits.flatten()):
        if b:
            h |= 1 << i
    return h


def _dct_matrix(n: int) -> np.ndarray:
    # orthonormal DCT-II basis, generated from the definition (verified
    # against the O(n^4) direct transform in tests/test_perceptual.py)
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT32 = _dct_matrix(32)


def dct_hash(img: np.ndarray) -> int:
    """pHash: 32x32 grayscale → 2-D DCT-II → top-left 8x8 coefficients
    excluding DC → bit = coefficient strictly above their median."""
    g = downsample_nearest(grayscale_bt601(img), 32, 32).astype(np.float64)
    coefs = _DCT32 @ g @ _DCT32.T
    low = coefs[:8, :8].flatten()[1:]  # drop DC
    med = np.median(low)
    h = 0
    for i, c in enumerate(low):
        if c > med:
            h |= 1 << i
    return h


def audio_energy_hash(samples: np.ndarray, frames: int = 65) -> int:
    """Audio dHash: 64-bit fingerprint of a PCM clip's energy PROFILE.

    The time-domain analogue of diff_hash: split the clip into
    ``frames`` equal spans (sample i belongs to span ``i*frames//n`` —
    the same integer index mapping as the image downsampler), sum
    |integer PCM| per span, bit j = span j+1 strictly louder than span
    j. Robust to uniform volume changes (a positive gain preserves the
    > order of span energies) and to re-encoding at the same depth
    (integer-exact end to end: decode_wav's float32 values are dyadic
    rationals, ``* 32768`` recovers the raw ints exactly — except that
    large gains may clip, which is a real signal change, not hash
    noise). A chromaprint-style spectral
    fingerprint would slot in behind the same 64-bit contract.

    Pairs near-dup via dedup.hamming_near_duplicates exactly like
    SimHash/pHash signatures.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    q = np.rint(samples.astype(np.float64) * 32768.0).astype(np.int64)
    mono = q.sum(axis=1)
    n = len(mono)
    if n == 0:
        return 0
    idx = np.arange(n) * frames // n
    e = np.zeros(frames, dtype=np.int64)
    np.add.at(e, idx, np.abs(mono))
    bits = e[1:] > e[:-1]
    h = 0
    for i, b in enumerate(bits):
        if b:
            h |= 1 << i
    return h
