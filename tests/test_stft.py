"""Golden tests for the matmul-DFT STFT / mel stack against independent
numpy-FFT reference implementations (librosa semantics, SURVEY.md §2.1/2.2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spev_tpu.ops import stft as S


def _np_stft_power(y, n_fft=1024, hop=256):
    """Independent reference: numpy FFT with reflect padding + periodic Hann."""
    pad = n_fft // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(y) - n_fft) // hop
    out = np.empty((n_frames, n_fft // 2 + 1))
    for t in range(n_frames):
        fr = y[t * hop : t * hop + n_fft] * win
        spec = np.fft.rfft(fr)
        out[t] = np.abs(spec) ** 2
    return out


def _np_mel_fb(sr=22050, n_fft=1024, n_mels=80, fmin=0.0, fmax=8000.0):
    """Independent slaney filterbank built bin-by-bin."""

    def hz2mel(f):
        f = np.asarray(f, dtype=float)
        out = f / (200.0 / 3)
        log_region = f >= 1000.0
        out = np.where(
            log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0), out
        )
        return out

    def mel2hz(m):
        m = np.asarray(m, dtype=float)
        out = m * (200.0 / 3)
        log_region = m >= 15.0
        out = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), out)
        return out

    pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fb = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        for k, f in enumerate(freqs):
            if lo < f < hi:
                fb[m, k] = (f - lo) / (c - lo) if f <= c else (hi - f) / (hi - c)
        fb[m] *= 2.0 / (hi - lo)
    return fb


@pytest.fixture(scope="module")
def signal(rng=None):
    r = np.random.default_rng(42)
    t = np.arange(22050) / 22050.0
    return (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 1000 * t)
        + 0.05 * r.standard_normal(len(t))
    ).astype(np.float32)


def test_stft_power_matches_numpy(signal):
    ours = np.asarray(S.stft_power(jnp.asarray(signal)))
    ref = _np_stft_power(signal)
    assert ours.shape == ref.shape
    assert ours.shape[0] == 1 + len(signal) // 256
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_mel_filterbank_matches_independent_slaney():
    ours = S.mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    ref = _np_mel_fb()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_log_mel_range_and_shape(signal):
    lm = np.asarray(S.log_mel_spectrogram(jnp.asarray(signal), fmax=22050 / 2))
    assert lm.shape[0] == 80
    assert lm.min() >= -10.0 - 1e-6 and lm.max() <= 2.0 + 1e-6
    # a 220 Hz + 1 kHz signal is not silence: some bins well above the floor
    assert (lm > -8).any()


def test_istft_roundtrip(signal):
    re, im = S.stft_complex(jnp.asarray(signal))
    recon = np.asarray(S.istft(re, im, length=len(signal)))
    # interior should reconstruct nearly exactly (COLA)
    err = np.abs(recon[1024:-1024] - signal[1024:-1024])
    assert err.max() < 1e-3
