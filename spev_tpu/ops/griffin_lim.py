"""On-device Griffin-Lim vocoder fallback.

The reference falls back to ``librosa.feature.inverse.mel_to_audio(exp(mel))``
when no HiFi-GAN checkpoint is present (``spev_real_metrics.py:727-733``),
which is (1) an NNLS inversion of the mel filterbank to a linear power
spectrogram and (2) 32 iterations of Griffin-Lim with momentum 0.99.

Here both stages run on the TPU inside one jitted graph:

- NNLS is a fixed-iteration projected-gradient solve (`lax.scan`), with all
  per-iteration work a (F, M) @ (M, T) matmul on the MXU;
- Griffin-Lim is a `lax.scan` over ISTFT→STFT projection pairs, with
  complex values carried as (re, im) float pairs (matmul-DFT kernels from
  `spev_tpu.ops.stft`).

The reference's host implementation is iterative CPU code — this is the
component with the largest RTF win from the TPU port.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from spev_tpu.ops.stft import mel_filterbank, stft_complex, istft


def nnls_mel_inverse(
    mel_power: jnp.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    n_iter: int = 60,
) -> jnp.ndarray:
    """Invert a power mel spectrogram (n_mels, T) to a linear power
    spectrogram (T, n_freqs) via projected-gradient NNLS
    (librosa ``mel_to_stft`` equivalent)."""
    n_mels = mel_power.shape[0]
    A = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))  # (M, F)
    b = mel_power  # (M, T)
    # Lipschitz step from the largest eigenvalue of A^T A (host-side power
    # iteration on the constant filterbank).
    A_np = np.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    lip = float(np.linalg.norm(A_np, 2) ** 2)
    step = 1.0 / max(lip, 1e-8)

    x0 = jnp.maximum(jnp.matmul(A.T, b, precision="highest"), 0.0)  # (F, T)

    def body(x, _):
        grad = jnp.matmul(A.T, jnp.matmul(A, x, precision="highest") - b, precision="highest")
        x = jnp.maximum(x - step * grad, 0.0)
        return x, None

    x, _ = jax.lax.scan(body, x0, None, length=n_iter)
    return x.T  # (T, F)


def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    seed: int = 0,
) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction from a magnitude spectrogram
    (T, n_freqs) → waveform.  Matches librosa's momentum formulation
    (``librosa.griffinlim`` defaults: n_iter=32, momentum=0.99, random
    phase init)."""
    T, F = magnitude.shape
    # degenerate inputs (fewer frames than one analysis window of overlap)
    # cannot be projected through ISTFT→STFT (reflect padding would exceed
    # the signal); return silence of the requested length
    if T * hop_length < n_fft:
        return jnp.zeros((length if length is not None else hop_length * max(T - 1, 0),))
    key = jax.random.PRNGKey(seed)
    phase = jax.random.uniform(key, (T, F), minval=-np.pi, maxval=np.pi)
    ang_re, ang_im = jnp.cos(phase), jnp.sin(phase)
    # during iterations, reconstruct at the length whose re-STFT has exactly
    # T frames; the caller-requested length is applied only on the final pass
    iter_len = hop_length * (T - 1)

    def project(ang_re, ang_im):
        sig = istft(magnitude * ang_re, magnitude * ang_im, n_fft, hop_length, length=iter_len)
        return stft_complex(sig, n_fft, hop_length)

    def body(carry, _):
        ang_re, ang_im, prev_re, prev_im = carry
        reb_re, reb_im = project(ang_re, ang_im)
        c = momentum / (1.0 + momentum)
        new_re = reb_re - c * prev_re
        new_im = reb_im - c * prev_im
        mag = jnp.sqrt(new_re * new_re + new_im * new_im) + 1e-16
        return (new_re / mag, new_im / mag, reb_re, reb_im), None

    init = (ang_re, ang_im, jnp.zeros_like(ang_re), jnp.zeros_like(ang_im))
    (ang_re, ang_im, _, _), _ = jax.lax.scan(body, init, None, length=n_iter)
    final_len = length if length is not None else iter_len
    return istft(magnitude * ang_re, magnitude * ang_im, n_fft, hop_length, length=final_len)


def mel_to_audio(
    mel_power: jnp.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    n_iter: int = 32,
    seed: int = 0,
) -> jnp.ndarray:
    """librosa ``mel_to_audio`` equivalent: power mel (n_mels, T) → waveform.

    The reference vocoder fallback feeds ``exp(log_mel)`` here with
    fmin/fmax from its CONFIG (``spev_real_metrics.py:730-733``)."""
    power = nnls_mel_inverse(mel_power, sr, n_fft, fmin, fmax)  # (T, F)
    magnitude = jnp.sqrt(jnp.maximum(power, 0.0))
    return griffin_lim(
        magnitude, n_fft=n_fft, hop_length=hop_length, n_iter=n_iter, seed=seed,
        length=hop_length * mel_power.shape[1],
    )
