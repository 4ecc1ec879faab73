"""Framed STFT / mel spectrogram as MXU-friendly matmul kernels.

The reference delegates all spectral analysis to librosa
(``spev_real_metrics.py:363-371``: ``librosa.feature.melspectrogram(y, sr,
n_fft=1024, hop_length=256, n_mels=80)`` with the librosa defaults
``center=True``, periodic Hann window, ``power=2.0``, slaney-normalized
non-HTK mel filterbank).  This module reproduces those numerics natively:

- The DFT is expressed as two real matmuls against precomputed cos/sin bases
  ``(n_fft, n_freqs)`` so the hot loop is ``frames @ basis`` on the MXU
  instead of an FFT butterfly (which maps poorly onto the systolic array for
  these sizes).  For n_fft=1024 the bases are ~2 MB each and live in HBM as
  jit constants.
- The mel filterbank is the slaney-scale, slaney-normalized triangular bank
  (librosa default ``htk=False, norm='slaney'``), precomputed on host with
  numpy and folded into the jitted graph.

All functions are shape-static and jit/pjit-safe; batch them with `vmap`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# host-side constant builders (numpy; folded into jitted graphs as constants)
# ---------------------------------------------------------------------------


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches ``scipy.signal.get_window('hann', N)``
    with ``fftbins=True``, which is the librosa default)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


@functools.lru_cache(maxsize=None)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag rDFT bases of shape (n_fft, n_fft//2+1)."""
    n = np.arange(n_fft)[:, None].astype(np.float64)
    k = np.arange(n_fft // 2 + 1)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def _hz_to_mel(frequencies: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa ``hz_to_mel(htk=False)``)."""
    frequencies = np.asarray(frequencies, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = frequencies / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = frequencies >= min_log_hz
    mels = np.where(
        log_t,
        min_log_mel + np.log(np.maximum(frequencies, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sr: int = 22050,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_freqs).

    Numerically equivalent to ``librosa.filters.mel(sr=sr, n_fft=n_fft,
    n_mels=n_mels, fmin=fmin, fmax=fmax)`` with default htk=False,
    norm='slaney'.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)), n_mels + 2)
    mel_f = _mel_to_hz(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney normalization: constant energy per channel
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# device-side ops
# ---------------------------------------------------------------------------


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int, center: bool = True) -> jnp.ndarray:
    """Slice a 1-D signal into overlapping frames, shape (n_frames, n_fft).

    With ``center=True`` reflect-pads by n_fft//2 (librosa convention), so
    ``n_frames = 1 + len(y) // hop_length``.
    """
    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop_length
    # gather-based framing: index matrix (n_frames, n_fft)
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    return y[idx]


def stft_power(
    y: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Power spectrogram |STFT|^2, shape (n_frames, n_freqs).

    Matmul-DFT formulation: real and imaginary parts come from two
    ``(n_frames, n_fft) @ (n_fft, n_freqs)`` matmuls on the MXU.
    """
    if win_length is None:
        win_length = n_fft
    win = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        win = jnp.pad(win, (pad, n_fft - win_length - pad))
    frames = frame_signal(y, n_fft, hop_length, center) * win[None, :]
    cos_b, sin_b = _dft_bases(n_fft)
    re = jnp.dot(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32, precision="highest")
    im = jnp.dot(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32, precision="highest")
    return re * re + im * im


def stft_complex(
    y: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int | None = None,
    center: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(real, imag) STFT parts, each (n_frames, n_freqs)."""
    if win_length is None:
        win_length = n_fft
    win = jnp.asarray(hann_window(win_length))
    frames = frame_signal(y, n_fft, hop_length, center) * win[None, :]
    cos_b, sin_b = _dft_bases(n_fft)
    re = jnp.dot(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32, precision="highest")
    im = jnp.dot(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32, precision="highest")
    return re, im


def istft(
    re: jnp.ndarray,
    im: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    length: int | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add and COLA normalization.

    Matches librosa's ``istft`` (Hann analysis+synthesis window).  The
    inverse rDFT is again two matmuls against transposed bases; overlap-add
    is a scatter-add (replaced by a Pallas kernel for the serving path).
    """
    n_frames, n_freqs = re.shape
    cos_b, sin_b = _dft_bases(n_fft)
    # irfft via matmul: x[n] = (1/N) * [X[0] + 2*sum_{k=1..N/2-1}(...) + X[N/2]*cos]
    scale = np.full((n_freqs,), 2.0, dtype=np.float32)
    scale[0] = 1.0
    scale[-1] = 1.0
    cos_t = (cos_b * scale[None, :]).astype(np.float32) / n_fft  # (n_fft, n_freqs)
    sin_t = (sin_b * scale[None, :]).astype(np.float32) / n_fft
    # x[n] = (1/N) Σ_k scale_k (re_k cos(2πkn/N) - im_k sin(2πkn/N));
    # sin_t is built from the forward basis -sin, so the im term enters with +.
    frames = (
        jnp.dot(re, jnp.asarray(cos_t).T, preferred_element_type=jnp.float32, precision="highest")
        + jnp.dot(im, jnp.asarray(sin_t).T, preferred_element_type=jnp.float32, precision="highest")
    )
    win = jnp.asarray(hann_window(n_fft))
    frames = frames * win[None, :]

    out_len = n_fft + hop_length * (n_frames - 1)
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    sig = jnp.zeros((out_len,), dtype=re.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))
    # COLA normalization by the summed squared window
    wsq = jnp.zeros((out_len,), dtype=re.dtype).at[idx.reshape(-1)].add(
        jnp.broadcast_to((win * win)[None, :], (n_frames, n_fft)).reshape(-1)
    )
    sig = sig / jnp.maximum(wsq, 1e-8)
    if center:
        sig = sig[n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        if sig.shape[0] < length:  # librosa zero-pads when asked for more
            sig = jnp.pad(sig, (0, length - sig.shape[0]))
        else:
            sig = sig[:length]
    return sig


def mel_spectrogram(
    y: jnp.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> jnp.ndarray:
    """Power mel spectrogram, shape (n_mels, n_frames).

    Equivalent to ``librosa.feature.melspectrogram`` with the reference's
    arguments (``spev_real_metrics.py:363``) — note the reference calls it
    WITHOUT fmin/fmax, so librosa defaults fmax=sr/2 apply there; we expose
    both and the dataset pipeline passes fmax=sr/2 for parity.
    """
    power = stft_power(y, n_fft=n_fft, hop_length=hop_length)  # (T, F)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))  # (M, F)
    return jnp.dot(power, fb.T, preferred_element_type=jnp.float32, precision="highest").T


def log_mel_spectrogram(
    y: jnp.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    floor: float = 1e-5,
    clip_min: float = -10.0,
    clip_max: float = 2.0,
) -> jnp.ndarray:
    """Reference log-mel: ``clip(log(clip(mel, 1e-5, inf)), -10, 2)``
    (``spev_real_metrics.py:364-366``).  Shape (n_mels, n_frames)."""
    mel = mel_spectrogram(y, sr, n_fft, hop_length, n_mels, fmin, fmax)
    return jnp.clip(jnp.log(jnp.maximum(mel, floor)), clip_min, clip_max)
