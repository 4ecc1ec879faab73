"""WAV read/write without libsndfile.

The reference uses the soundfile package (C libsndfile) for all audio I/O
(``spev_real_metrics.py:31,827``).  This is a dependency-free implementation
via the stdlib ``wave`` module (16-bit PCM and float32 WAVs), sufficient for
dataset ingestion and synthesis output.  A C++ fast path for bulk dataset
decode lives in the native runtime (``native/``).
"""

from __future__ import annotations

import struct
import wave

import numpy as np
from spev_tpu.errors import UserError


def write_wav(path: str, data: np.ndarray, sr: int = 22050) -> None:
    """Write mono float waveform in [-1, 1] as 16-bit PCM."""
    data = np.asarray(data, dtype=np.float32)
    pcm = np.clip(data, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file → (float32 mono waveform in [-1, 1], sample_rate).

    Handles 16/24/32-bit PCM and IEEE float (format 3) files; multi-channel
    input is averaged to mono (librosa.load(mono=True) behavior).
    """
    # stdlib wave only supports PCM; parse the RIFF header ourselves to also
    # accept float WAVs.
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise UserError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise UserError(f"{path}: missing fmt/data chunk")
    audio_format, n_ch, sr, _, _, bits = fmt
    if audio_format == 0xFFFE and len(body) >= 24:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = struct.unpack("<H", body[24:26])[0] if len(body) >= 26 else 1
    if audio_format == 3:  # IEEE float
        x = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8").astype(np.float32)
    elif bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
    elif bits == 24:
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        x = (
            (b[:, 0].astype(np.int32))
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise UserError(f"{path}: unsupported bit depth {bits}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, sr


def resample_linear(y: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Cheap linear resampler for dataset prep when rates differ."""
    if sr_in == sr_out:
        return y
    n_out = int(round(len(y) * sr_out / sr_in))
    xi = np.linspace(0.0, len(y) - 1, n_out)
    return np.interp(xi, np.arange(len(y)), y).astype(np.float32)
