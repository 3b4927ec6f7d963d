"""WAV codec units + the real audio-feature Spark kernel: round-trips
for 8/16-bit PCM, chunk-walking robustness, and feature math checked
against closed-form signals (sine wave, constant, silence).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from themis_spark.functions import audiocodec as AC
from themis_spark.operators import multimodal as M


def _sine(sr=8000, freq=440, dur=0.25):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * math.pi * freq * t).astype(np.float32)


def test_wav_roundtrip_16bit_stereo():
    sig = np.stack([_sine(), -_sine()], axis=1)
    payload = AC.encode_wav(sig, 8000, bits=16)
    assert AC.sniff_audio(payload) == "wav"
    sr, out = AC.decode_wav(payload)
    assert sr == 8000 and out.shape == sig.shape
    assert np.abs(out - sig).max() < 1e-3


def test_wav_roundtrip_8bit_mono():
    sig = _sine(dur=0.1)
    sr, out = AC.decode_wav(AC.encode_wav(sig, 4000, bits=8))
    assert sr == 4000 and out.shape == (len(sig), 1)
    # 8-bit PCM: half-step quantization (1/254) + the conventional
    # 127-encode/128-decode scale asymmetry bound the error at ~1/64
    assert np.abs(out[:, 0] - sig).max() < 1 / 64 + 1e-6


def test_wav_chunk_walk_tolerates_extra_chunks():
    # LIST chunk between fmt and data — common in real files
    base = AC.encode_wav(_sine(dur=0.05), 8000)
    fmt_and_data = base[12:]
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    body = fmt_and_data[:24] + extra + fmt_and_data[24:]
    payload = b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body
    sr, out = AC.decode_wav(payload)
    assert sr == 8000 and len(out) == int(8000 * 0.05)


def test_wav_rejects_compressed():
    with pytest.raises(AC.UnsupportedAudioError):
        AC.decode_wav(b"ID3\x04\x00" + b"\x00" * 20)


def test_audio_features_closed_form():
    sr = 8000
    sig = _sine(sr=sr, freq=400, dur=0.5)
    f = AC.audio_features(sr, sig[:, None])
    assert f["duration_sec"] == 0.5 and f["n_channels"] == 1
    # full-scale sine: rms = 1/sqrt(2), peak = 1, zcr ~ 2*freq/sr
    assert abs(f["rms"] - 1 / math.sqrt(2)) < 1e-3
    assert abs(f["peak"] - 1.0) < 1e-3
    assert abs(f["zero_crossing_rate"] - 2 * 400 / sr) < 0.005


def test_extract_audio_features_spark(spark):
    payloads = [
        AC.encode_wav(_sine(dur=0.25), 8000, bits=16),
        AC.encode_wav(np.zeros(400, dtype=np.float32), 4000, bits=16),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in M.extract_audio_features(df).collect()}
    assert got[0]["sample_rate"] == 8000 and got[0]["duration_sec"] == 0.25
    assert abs(got[0]["rms"] - 1 / math.sqrt(2)) < 1e-3
    assert got[1]["rms"] == 0.0 and got[1]["peak"] == 0.0
    assert got[1]["n_frames"] == 400 and got[1]["duration_sec"] == 0.1
