"""Objective quality metrics — the reference's evaluation targets.

The reference documents quality targets without implementing their
measurement (``PRODUCTION_SYSTEM_SUMMARY.md:227-231``: MCD < 6.0 dB,
F0 RMSE < 20 Hz, duration error < 10%).  This module implements them:

- **MCD** (mel-cepstral distortion): DCT-II cepstra of log-mel frames,
  coefficients 1..K (energy c0 excluded), the standard
  (10/ln10)·√2·‖Δc‖₂ formulation, averaged over aligned frames.
- **F0 RMSE**: Hz-domain RMSE over frames both tracks voice (framework YIN
  tracker).
- **Duration error**: mean |pred−target|/target over phonemes.

All computations run through the framework's own jitted DSP.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from spev_tpu.ops.features import yin_f0


def _dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n_out, n_in)."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis[0] *= 1.0 / np.sqrt(2.0)
    return (basis * np.sqrt(2.0 / n_in)).astype(np.float32)


def mel_cepstral_distortion(
    mel_a: np.ndarray, mel_b: np.ndarray, n_coeffs: int = 13
) -> float:
    """MCD in dB between two log-mel spectrograms (T, n_mels); frames
    aligned by truncation to the shorter length."""
    T = min(mel_a.shape[0], mel_b.shape[0])
    if T == 0:
        return float("nan")
    a, b = np.asarray(mel_a[:T], np.float64), np.asarray(mel_b[:T], np.float64)
    D = _dct_matrix(a.shape[1], n_coeffs + 1)
    ca = a @ D.T
    cb = b @ D.T
    diff = ca[:, 1:] - cb[:, 1:]  # exclude the energy coefficient
    const = 10.0 / np.log(10.0) * np.sqrt(2.0)
    return float(const * np.mean(np.sqrt(np.sum(diff**2, axis=1))))


def f0_rmse_hz(
    wav_a: np.ndarray,
    wav_b: np.ndarray,
    sr: int = 22050,
    hop_length: int = 256,
) -> float:
    """RMSE of F0 (Hz) over frames where both signals are voiced."""
    fa, _, va = yin_f0(jnp.asarray(wav_a), sr=sr, hop_length=hop_length)
    fb, _, vb = yin_f0(jnp.asarray(wav_b), sr=sr, hop_length=hop_length)
    T = min(fa.shape[0], fb.shape[0])
    fa, fb = np.asarray(fa)[:T], np.asarray(fb)[:T]
    both = np.isfinite(fa) & np.isfinite(fb)
    if not both.any():
        return float("nan")
    return float(np.sqrt(np.mean((fa[both] - fb[both]) ** 2)))


def duration_error_pct(pred_durs: np.ndarray, target_durs: np.ndarray) -> float:
    """Mean relative per-phoneme duration error in percent (valid targets
    only)."""
    p = np.asarray(pred_durs, np.float64)
    t = np.asarray(target_durs, np.float64)
    n = min(len(p), len(t))
    p, t = p[:n], t[:n]
    valid = t > 0
    if not valid.any():
        return float("nan")
    return float(100.0 * np.mean(np.abs(p[valid] - t[valid]) / t[valid]))


def evaluate_pair(mel_pred, mel_target, wav_pred=None, wav_target=None,
                  pred_durs=None, target_durs=None) -> dict:
    """All applicable quality metrics for one utterance pair, with the
    reference's target thresholds attached."""
    out = {
        "mcd_db": mel_cepstral_distortion(mel_pred, mel_target),
        "mcd_target_db": 6.0,
    }
    if wav_pred is not None and wav_target is not None:
        out["f0_rmse_hz"] = f0_rmse_hz(wav_pred, wav_target)
        out["f0_rmse_target_hz"] = 20.0
    if pred_durs is not None and target_durs is not None:
        out["duration_error_pct"] = duration_error_pct(pred_durs, target_durs)
        out["duration_error_target_pct"] = 10.0
    return out
