"""Pure-numpy WAV (RIFF/PCM) codec for the multimodal audio kernels.

Like imagecodec.py: no external audio libraries exist in this
container, but uncompressed PCM WAV is just a byte layout. Supports
8-bit unsigned and 16-bit signed PCM, any channel count. Compressed
codecs (MP3/OGG/FLAC) raise ``UnsupportedAudioError`` — fail-closed,
never a silently skipped row.
"""

from __future__ import annotations

import numpy as np


class UnsupportedAudioError(ValueError):
    """Payload is not a PCM WAV the builtin codec can decode."""


def sniff_audio(payload: bytes) -> str | None:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"ID3" or payload[:2] == b"\xff\xfb":
        return "mp3"
    if payload[:4] == b"OggS":
        return "ogg"
    if payload[:4] == b"fLaC":
        return "flac"
    return None


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float32 samples in [-1, 1] shaped
    (n_frames, n_channels)). Walks RIFF chunks (fmt may not be first)."""
    if sniff_audio(payload) != "wav":
        raise UnsupportedAudioError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedAudioError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise UnsupportedAudioError(f"only PCM supported (format={audio_format})")
    if bits == 8:
        raw = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
        samples = (raw - 128.0) / 128.0
    elif bits == 16:
        raw = np.frombuffer(data, dtype="<i2").astype(np.float32)
        samples = raw / 32768.0
    else:
        raise UnsupportedAudioError(f"{bits}-bit PCM not supported")
    frames = len(samples) // channels
    return sample_rate, samples[: frames * channels].reshape(frames, channels)


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """(n_frames, n_channels) float array in [-1, 1] → PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    if bits == 8:
        data = (np.clip(samples, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        raise UnsupportedAudioError(f"{bits}-bit PCM not supported")
    block = channels * bits // 8
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def audio_features(sample_rate: int, samples: np.ndarray) -> dict:
    """Standard scalar features a training pipeline filters on: duration,
    RMS energy, peak amplitude, zero-crossing rate (mono mixdown)."""
    mono = samples.mean(axis=1)
    n = len(mono)
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0
    return {
        "sample_rate": sample_rate,
        "n_channels": int(samples.shape[1]),
        "n_frames": n,
        "duration_sec": round(n / sample_rate, 6) if sample_rate else 0.0,
        "rms": round(float(np.sqrt(np.mean(mono ** 2))), 6) if n else 0.0,
        "peak": round(float(np.max(np.abs(mono))), 6) if n else 0.0,
        "zero_crossing_rate": round(zc / (n - 1), 6) if n > 1 else 0.0,
    }
