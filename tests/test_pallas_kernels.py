"""Pallas kernels vs their XLA ground-truth counterparts (interpret mode on
CPU; the same kernels compile for TPU)."""

import numpy as np
import jax.numpy as jnp

from spev_tpu.ops.stft import hann_window, log_mel_spectrogram, stft_complex, istft
from spev_tpu.ops.pallas.kernels import fused_log_mel, overlap_add


def _signal(n=22050, seed=0):
    r = np.random.default_rng(seed)
    t = np.arange(n) / 22050.0
    return (
        0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * r.standard_normal(n)
    ).astype(np.float32)


def test_fused_log_mel_matches_xla():
    y = _signal()
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(y), fmax=8000.0))
    ours = np.asarray(fused_log_mel(jnp.asarray(y), fmax=8000.0, interpret=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_fused_log_mel_short_signal():
    y = _signal(5000, seed=1)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(y), fmax=8000.0))
    ours = np.asarray(fused_log_mel(jnp.asarray(y), fmax=8000.0, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_overlap_add_matches_istft():
    y = _signal(8192, seed=2)
    re, im = stft_complex(jnp.asarray(y))
    ref = np.asarray(istft(re, im, length=len(y)))

    # reproduce istft's internals up to the OLA: windowed inverse frames
    from spev_tpu.ops.stft import _dft_bases

    n_fft, hop = 1024, 256
    cos_b, sin_b = _dft_bases(n_fft)
    scale = np.full((n_fft // 2 + 1,), 2.0, np.float32)
    scale[0] = scale[-1] = 1.0
    cos_t = cos_b * scale / n_fft
    sin_t = sin_b * scale / n_fft
    frames = np.asarray(re) @ cos_t.T + np.asarray(im) @ sin_t.T
    frames = frames * hann_window(n_fft)[None, :]

    out = np.asarray(overlap_add(jnp.asarray(frames), interpret=True))
    # istft trims n_fft//2 from both ends (center convention)
    trimmed = out[n_fft // 2 : n_fft // 2 + len(y)]
    np.testing.assert_allclose(trimmed, ref, atol=1e-4)


def test_fused_length_regulator_matches_xla():
    from spev_tpu.ops.length_regulator import length_regulate, length_regulate_feature
    from spev_tpu.ops.pallas.length_regulator_kernel import length_regulate_fused

    rng = np.random.default_rng(0)
    B, T, H, F, M = 3, 16, 32, 5, 64
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    feats = rng.standard_normal((B, T, F)).astype(np.float32)
    durs = rng.integers(0, 5, size=(B, T)).astype(np.float32)
    durs[1] = 0  # all-zero row -> one zero frame
    durs[2, 3] = np.nan  # guard

    xe_ref, len_ref = length_regulate(jnp.asarray(x), jnp.asarray(durs), M)
    fe_ref = np.stack(
        [np.asarray(length_regulate_feature(jnp.asarray(feats[..., i]), jnp.asarray(durs), M))
         for i in range(F)], axis=-1,
    )
    xe, fe, lens = length_regulate_fused(
        jnp.asarray(x), jnp.asarray(feats), jnp.asarray(durs), M, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(len_ref))
    np.testing.assert_allclose(np.asarray(xe), np.asarray(xe_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fe), fe_ref, atol=1e-5)
