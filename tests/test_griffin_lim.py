"""Griffin-Lim / NNLS mel inversion sanity: a pure tone must survive the
mel → audio round trip with its spectral peak intact."""

import numpy as np
import jax.numpy as jnp

from spev_tpu.ops.stft import mel_spectrogram, stft_power
from spev_tpu.ops.griffin_lim import nnls_mel_inverse, mel_to_audio


def test_nnls_inverts_mel_of_tone():
    t = np.arange(11025) / 22050.0
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = mel_spectrogram(jnp.asarray(y), fmax=8000.0)
    power = np.asarray(nnls_mel_inverse(mel, fmax=8000.0))  # (T, F)
    # the reconstructed linear spectrogram must peak near 440 Hz
    freqs = np.linspace(0, 22050 / 2, 513)
    peak_bin = power[power.shape[0] // 2].argmax()
    assert abs(freqs[peak_bin] - 440.0) < 45.0


def test_mel_to_audio_keeps_tone():
    t = np.arange(11025) / 22050.0
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = mel_spectrogram(jnp.asarray(y), fmax=8000.0)
    wav = np.asarray(mel_to_audio(mel, n_iter=16))
    assert wav.shape[0] == 256 * mel.shape[1]
    spec = np.asarray(stft_power(jnp.asarray(wav)))
    freqs = np.linspace(0, 22050 / 2, 513)
    mid = spec[spec.shape[0] // 2]
    assert abs(freqs[mid.argmax()] - 440.0) < 45.0
    assert np.isfinite(wav).all()
