"""Frame-level acoustic features: RMS, spectral centroid, YIN/pyin-style F0.

The reference extracts training targets with librosa
(``spev_real_metrics.py:311-316,369-371``):

- ``librosa.feature.rms(y, hop_length=256)`` → per-frame log-RMS energy;
- ``librosa.feature.spectral_centroid(y, sr)`` → brightness proxy;
- ``librosa.pyin(y, fmin=60, fmax=500, sr)`` → F0 and ``voiced_prob``
  (breathiness target is ``1 - mean(voiced_prob)``, roughness is the std of
  voiced log-F0 — SURVEY.md §2.2).

This module reimplements them natively in JAX.  RMS and centroid are exact
librosa equivalents.  F0/voicing is a "pyin-lite": the YIN cumulative-mean
normalized difference function (CMNDF) computed with FFT autocorrelation,
parabolic interpolation for sub-bin F0, and pyin's Beta(2, 18) threshold
prior integrated into a per-frame voicing probability — without the full
pyin HMM Viterbi smoothing (the targets are z-scored per-corpus, so the
small bias this removes washes out; the reference's own F0 path is replaced,
not wrapped, because librosa is not a dependency of this framework).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from spev_tpu.ops.stft import frame_signal, stft_power


def rms_energy(
    y: jnp.ndarray,
    frame_length: int = 2048,
    hop_length: int = 256,
    center: bool = True,
) -> jnp.ndarray:
    """Per-frame RMS, equivalent to ``librosa.feature.rms`` (zero padding
    when centered, matching librosa's ``pad_mode='constant'``)."""
    if center:
        y = jnp.pad(y, (frame_length // 2, frame_length // 2))
    n_frames = 1 + (y.shape[0] - frame_length) // hop_length
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(frame_length, dtype=jnp.int32)[None, :]
    )
    frames = y[idx]
    return jnp.sqrt(jnp.mean(frames * frames, axis=-1))


def spectral_centroid(
    y: jnp.ndarray,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int = 256,
) -> jnp.ndarray:
    """Spectral centroid in Hz per frame (librosa-equivalent: magnitude
    spectrogram, centroid = sum(f * S) / sum(S))."""
    power = stft_power(y, n_fft=n_fft, hop_length=hop_length)  # (T, F)
    mag = jnp.sqrt(jnp.maximum(power, 0.0))
    freqs = jnp.asarray(
        np.linspace(0.0, sr / 2.0, n_fft // 2 + 1).astype(np.float32)
    )
    num = jnp.sum(mag * freqs[None, :], axis=-1)
    den = jnp.maximum(jnp.sum(mag, axis=-1), 1e-10)
    return num / den


# ---------------------------------------------------------------------------
# YIN / pyin-lite F0
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _beta_threshold_weights(n_thresholds: int = 100, a: float = 2.0, b: float = 18.0):
    """pyin's Beta(2, 18) prior over absolute thresholds in (0, 1]."""
    edges = np.linspace(0.0, 1.0, n_thresholds + 1)
    # probability mass in each threshold bin under Beta(a, b)
    from scipy.stats import beta as beta_dist

    cdf = beta_dist.cdf(edges, a, b)
    weights = np.diff(cdf)
    thresholds = edges[1:]
    return thresholds.astype(np.float32), weights.astype(np.float32)


def _cmndf(frames: jnp.ndarray, tau_max: int, win_length: int) -> jnp.ndarray:
    """Cumulative-mean-normalized difference function per frame.

    frames: (N, frame_length) with frame_length >= win_length + tau_max.
    Returns (N, tau_max + 1) CMNDF values; d'(0) = 1 by convention.
    """
    n_frames, frame_length = frames.shape
    w = win_length
    # cross-correlation c(tau) = sum_{j<w} x[j] x[j+tau] via FFT
    n_pad = int(2 ** np.ceil(np.log2(frame_length + tau_max + 1)))
    fx = jnp.fft.rfft(frames, n=n_pad, axis=-1)
    fw = jnp.fft.rfft(frames[:, :w], n=n_pad, axis=-1)
    corr = jnp.fft.irfft(fx * jnp.conj(fw), n=n_pad, axis=-1)[:, : tau_max + 1]
    # energy terms: e0 = sum_{j<w} x[j]^2 ; e(tau) = sum_{j<w} x[j+tau]^2
    sq = frames * frames
    csum = jnp.concatenate([jnp.zeros((n_frames, 1), frames.dtype), jnp.cumsum(sq, axis=-1)], axis=-1)
    tau = jnp.arange(tau_max + 1)
    e_tau = csum[:, tau + w] - csum[:, tau]  # (N, tau_max+1)
    e0 = e_tau[:, :1]
    diff = e0 + e_tau - 2.0 * corr  # YIN difference function d(tau)
    diff = jnp.maximum(diff, 0.0)
    # cumulative mean normalization: d'(tau) = d(tau) * tau / cumsum(d)(tau)
    cum = jnp.cumsum(diff[:, 1:], axis=-1)
    cmndf = diff[:, 1:] * jnp.arange(1, tau_max + 1) / jnp.maximum(cum, 1e-12)
    return jnp.concatenate([jnp.ones((n_frames, 1), frames.dtype), cmndf], axis=-1)


def yin_f0(
    y: jnp.ndarray,
    sr: int = 22050,
    fmin: float = 60.0,
    fmax: float = 500.0,
    frame_length: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    viterbi: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """pyin-lite F0 tracker.

    Returns (f0, voiced_flag, voiced_prob), each (n_frames,), mirroring the
    ``librosa.pyin`` call signature/output used by the reference
    (``spev_real_metrics.py:311,369``; note the reference uses hop 512 for
    the stats pass — the pyin default — and 256 for per-file features).
    Unvoiced frames get f0 = nan like pyin.  ``viterbi`` applies the
    two-state voiced/unvoiced Viterbi smoothing to the flags (the reduced
    form of pyin's HMM; docs/PARITY.md #2).
    """
    win_length = frame_length // 2
    tau_min = max(1, int(sr / fmax))
    tau_max = min(int(np.ceil(sr / fmin)), frame_length - win_length - 1)

    if center:
        y = jnp.pad(y, (frame_length // 2, frame_length // 2))
    frames = frame_signal(y, frame_length, hop_length, center=False)
    cmndf = _cmndf(frames, tau_max, win_length)  # (N, tau_max+1)

    lags = jnp.arange(tau_max + 1)
    in_range = (lags >= tau_min) & (lags <= tau_max)
    masked = jnp.where(in_range[None, :], cmndf, jnp.inf)

    # trough detection: local minima of CMNDF in the valid lag range
    interior = masked[:, 1:-1]
    is_trough = (interior < masked[:, :-2]) & (interior <= masked[:, 2:])
    trough_vals = jnp.where(is_trough, interior, jnp.inf)  # (N, tau_max-1)

    # voicing probability: pyin's Beta(2,18) prior over absolute thresholds —
    # the probability mass of thresholds for which at least one trough
    # qualifies — plus pyin's ``no_trough_prob``: when no trough clears a
    # sampled threshold, 1% of that threshold's mass still goes to the
    # voiced hypothesis (librosa pyin default no_trough_prob=0.01).
    thresholds, weights = _beta_threshold_weights()
    min_trough = jnp.min(trough_vals, axis=-1)  # (N,)
    p_any = jnp.sum(
        jnp.asarray(weights)[None, :] * (min_trough[:, None] < jnp.asarray(thresholds)[None, :]),
        axis=-1,
    )
    voiced_prob = jnp.clip(p_any + _NO_TROUGH_PROB * (1.0 - p_any), 0.0, 1.0)

    # F0 candidate: first trough under the canonical YIN threshold 0.1,
    # falling back to the global minimum (pyin behavior without the HMM).
    yin_thresh = 0.1
    under = trough_vals < yin_thresh
    any_under = jnp.any(under, axis=-1)
    first_under = jnp.argmax(under, axis=-1)
    global_min = jnp.argmin(trough_vals, axis=-1)
    best = jnp.where(any_under, first_under, global_min) + 1  # offset: interior index -> lag

    # parabolic interpolation around the selected lag
    n = cmndf.shape[0]
    rows = jnp.arange(n)
    c0 = cmndf[rows, jnp.maximum(best - 1, 0)]
    c1 = cmndf[rows, best]
    c2 = cmndf[rows, jnp.minimum(best + 1, tau_max)]
    denom = c0 + c2 - 2.0 * c1
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (c0 - c2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    period = best.astype(jnp.float32) + delta

    f0 = sr / jnp.maximum(period, 1e-6)
    f0 = jnp.clip(f0, fmin, fmax)
    if viterbi:
        # pyin's HMM, reduced to its voiced/unvoiced backbone: Viterbi over
        # 2 states with switch probability 0.01 and the per-frame voicing
        # mass as the observation — isolated spurious flips (a single
        # unvoiced frame inside a voiced run, or vice versa) get smoothed
        # exactly as the full HMM's voiced-marginal does.  The F0 track
        # stays per-frame best-trough (librosa's voiced_prob is likewise
        # not HMM-smoothed; only flags/f0 decoding are).
        voiced_flag = _viterbi_voicing(voiced_prob)
    else:
        voiced_flag = voiced_prob > 0.5
    f0 = jnp.where(voiced_flag, f0, jnp.nan)
    return f0, voiced_flag, voiced_prob


_NO_TROUGH_PROB = 0.01  # librosa pyin default
_SWITCH_PROB = 0.01  # librosa pyin default voiced<->unvoiced transition


def _viterbi_voicing(voiced_prob: jnp.ndarray) -> jnp.ndarray:
    """Two-state (voiced=1 / unvoiced=0) Viterbi decode of per-frame
    voicing probabilities; uniform initial state, switch prob 0.01."""
    eps = 1e-10
    obs = jnp.stack(
        [jnp.log(1.0 - voiced_prob + eps), jnp.log(voiced_prob + eps)], axis=-1
    )  # (N, 2)
    log_stay = float(np.log(1.0 - _SWITCH_PROB))
    log_switch = float(np.log(_SWITCH_PROB))

    def fwd(carry, ob):
        # carry: (2,) best log-prob per state
        stay = carry + log_stay
        switch = carry[::-1] + log_switch
        best = jnp.maximum(stay, switch)
        ptr = (switch > stay).astype(jnp.int32)  # 1 = came from other state
        return best + ob, ptr

    init = jnp.log(jnp.asarray([0.5, 0.5])) + obs[0]
    final, ptrs = jax.lax.scan(fwd, init, obs[1:])  # ptrs: (N-1, 2)

    last = jnp.argmax(final).astype(jnp.int32)

    def back(state, ptr):
        # carry: state at time t+1; ptr = backpointer into time t+1;
        # emits the state at t+1, carries the state at t
        prev = jnp.where(ptr[state] == 1, 1 - state, state)
        return prev, state

    first, states_tail = jax.lax.scan(back, last, ptrs, reverse=True)
    states = jnp.concatenate([first[None], states_tail])  # times 0 .. N-1
    return states.astype(bool)
