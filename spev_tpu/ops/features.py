"""Frame-level acoustic features: RMS, spectral centroid, YIN/pyin-style F0.

The reference extracts training targets with librosa
(``spev_real_metrics.py:311-316,369-371``):

- ``librosa.feature.rms(y, hop_length=256)`` → per-frame log-RMS energy;
- ``librosa.feature.spectral_centroid(y, sr)`` → brightness proxy;
- ``librosa.pyin(y, fmin=60, fmax=500, sr)`` → F0 and ``voiced_prob``
  (breathiness target is ``1 - mean(voiced_prob)``, roughness is the std of
  voiced log-F0 — SURVEY.md §2.2).

This module reimplements them natively in JAX.  RMS and centroid are exact
librosa equivalents.  Two F0 trackers are provided:

- ``pyin_f0`` — the **full pyin HMM** with librosa's semantics: per-trough
  Boltzmann×Beta(2, 18) candidate probabilities, a 0.1-semitone pitch-bin
  lattice doubled into voiced/unvoiced halves, a triangular local-transition
  kernel bounded by ``max_transition_rate`` octaves/s, and a Viterbi decode
  over the full candidate × voicing state space.  This is the default
  extractor for training targets (``AudioConfig.f0_method='pyin'``).
- ``yin_f0`` — a "pyin-lite" fast path: the same CMNDF + Beta threshold
  prior (so ``voiced_prob``, and hence the breath target, is *identical* to
  the full pyin's pre-Viterbi voicing mass), but per-frame best-trough F0
  with only a 2-state voicing Viterbi.  Used where a cheap symmetric
  comparison suffices (e.g. F0-RMSE between two wavs in ``diag/quality``).

librosa is not a dependency of this framework; both paths are native JAX
re-derivations of the published algorithm (Mauch & Dixon 2014) matched to
librosa's defaults, since the reference's targets come from
``librosa.pyin`` (``spev_real_metrics.py:311-316,408-415``).
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


# ---------------------------------------------------------------------------
# Full pyin: candidate-lattice HMM (librosa semantics)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pyin_lattice(
    sr: int,
    fmin: float,
    fmax: float,
    hop_length: int,
    n_bins_per_semitone: int,
    max_transition_rate: float,
    switch_prob: float,
):
    """Static pyin lattice pieces: bin center frequencies, log-transition
    matrix over the doubled (voiced ⊕ unvoiced) pitch-bin state space, and
    the log initial distribution.  Pure numpy — computed once per config.

    Matches librosa.pyin: ``n_pitch_bins = floor(12·bps·log2(fmax/fmin))+1``
    bins at 1/bps-semitone resolution; within-voicing transitions are a
    triangular window of half-width ``round(rate·12·hop/sr)·bps`` bins,
    truncated at the range edges and renormalized per row; voicing flips
    with probability ``switch_prob``; the chain starts uniform over the
    unvoiced half.
    """
    bps = n_bins_per_semitone
    n_bins = int(np.floor(12 * bps * np.log2(fmax / fmin))) + 1
    freqs = fmin * 2.0 ** (np.arange(n_bins) / (12.0 * bps))

    max_semitones_per_frame = round(max_transition_rate * 12 * hop_length / sr)
    width = max_semitones_per_frame * bps + 1  # odd triangular window length
    half = width // 2
    # triang(2k+1) at offset d from center: (k + 1 - |d|) / (k + 1)
    offs = np.arange(-half, half + 1)
    tri = (half + 1 - np.abs(offs)) / (half + 1)
    local = np.zeros((n_bins, n_bins))
    for i in range(n_bins):
        lo, hi = max(0, i - half), min(n_bins, i + half + 1)
        local[i, lo:hi] = tri[(lo - i) + half : (hi - i) + half]
    local /= local.sum(axis=1, keepdims=True)

    t_switch = np.array(
        [[1.0 - switch_prob, switch_prob], [switch_prob, 1.0 - switch_prob]]
    )
    transition = np.kron(t_switch, local)  # (2n, 2n)

    p_init = np.zeros(2 * n_bins)
    p_init[n_bins:] = 1.0 / n_bins

    tiny = np.finfo(np.float64).tiny
    log_trans = np.log(transition + tiny).astype(np.float32)
    log_init = np.log(p_init + tiny).astype(np.float32)
    return n_bins, freqs.astype(np.float32), log_trans, log_init


def _trough_probs(
    cmndf_band: jnp.ndarray,
    n_thresholds: int,
    beta_a: float,
    beta_b: float,
    boltzmann_parameter: float,
    no_trough_prob: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-lag candidate probabilities and parabolic shifts for each frame.

    ``cmndf_band``: (N, L) CMNDF restricted to the valid lag band
    [tau_min, tau_max].  Returns ``(probs, shifts)`` both (N, L); probs is
    zero at non-trough lags and sums (per frame) to the pyin voiced mass.

    librosa semantics: a lag is a trough when it is a local minimum of the
    band (strict left, non-strict right; edge-padded), with the first lag a
    trough iff d'[0] < d'[1].  For each of ``n_thresholds`` absolute
    thresholds with Beta(a, b) prior mass, qualifying troughs (height below
    the threshold) split that mass by a Boltzmann prior over their lag-order
    rank; thresholds that no trough clears give ``no_trough_prob`` of their
    mass to the global-minimum trough.
    """
    n, L = cmndf_band.shape
    thresholds, beta_w = _beta_threshold_weights(n_thresholds, beta_a, beta_b)
    thresholds = jnp.asarray(thresholds)
    beta_w = jnp.asarray(beta_w)

    left = jnp.concatenate([cmndf_band[:, :1], cmndf_band[:, :-1]], axis=1)
    right = jnp.concatenate([cmndf_band[:, 1:], cmndf_band[:, -1:]], axis=1)
    is_trough = (cmndf_band < left) & (cmndf_band <= right)
    is_trough = is_trough.at[:, 0].set(cmndf_band[:, 0] < cmndf_band[:, 1])

    heights = jnp.where(is_trough, cmndf_band, jnp.inf)  # (N, L)
    global_min = jnp.argmin(heights, axis=1)  # (N,)

    lam = boltzmann_parameter
    one_minus = 1.0 - float(np.exp(-lam))

    def per_threshold(acc, tw):
        thr, w = tw
        probs_acc, nt_acc = acc
        qual = heights < thr  # (N, L)
        n_troughs = jnp.sum(qual, axis=1, keepdims=True)  # (N, 1)
        rank = jnp.cumsum(qual, axis=1) - 1  # (N, L), rank in lag order
        denom = 1.0 - jnp.exp(-lam * jnp.maximum(n_troughs, 1).astype(jnp.float32))
        boltz = one_minus * jnp.exp(-lam * rank.astype(jnp.float32)) / denom
        probs_acc = probs_acc + w * jnp.where(qual, boltz, 0.0)
        nt_acc = nt_acc + w * (n_troughs[:, 0] == 0)
        return (probs_acc, nt_acc), None

    (probs, nt_mass), _ = jax.lax.scan(
        per_threshold,
        (jnp.zeros((n, L)), jnp.zeros((n,))),
        (thresholds, beta_w),
    )
    probs = probs.at[jnp.arange(n), global_min].add(no_trough_prob * nt_mass)
    # keep the mass on actual troughs only (global_min of an all-unvoiced
    # frame may land on a non-trough argmin; librosa skips such frames)
    any_trough = jnp.any(is_trough, axis=1, keepdims=True)
    probs = jnp.where(is_trough & any_trough, probs, 0.0)

    # parabolic shifts on the band (boundary lags keep shift 0; |shift|>1
    # zeroed, matching librosa's _parabolic_interpolation)
    c0, c1, c2 = cmndf_band[:, :-2], cmndf_band[:, 1:-1], cmndf_band[:, 2:]
    a = (c0 + c2 - 2.0 * c1) / 2.0
    b = (c2 - c0) / 2.0
    shift_mid = -b / (2.0 * a + 1e-30)
    shift_mid = jnp.where(jnp.abs(shift_mid) > 1.0, 0.0, shift_mid)
    shifts = jnp.pad(shift_mid, ((0, 0), (1, 1)))
    return probs, shifts


def pyin_f0(
    y: jnp.ndarray,
    sr: int = 22050,
    fmin: float = 60.0,
    fmax: float = 500.0,
    frame_length: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    n_thresholds: int = 100,
    beta_parameters: tuple[float, float] = (2.0, 18.0),
    boltzmann_parameter: float = 2.0,
    resolution: float = 0.1,
    max_transition_rate: float = 35.92,
    switch_prob: float = 0.01,
    no_trough_prob: float = 0.01,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full pyin F0 tracker — librosa.pyin semantics, native JAX.

    Returns ``(f0, voiced_flag, voiced_prob)``, each (n_frames,):

    - ``voiced_prob``: per-frame voiced candidate mass (clipped to [0, 1]),
      computed *before* Viterbi exactly as librosa does — this is what the
      breath target ``1 − mean(voiced_prob)`` consumes
      (reference ``spev_real_metrics.py:311-316``);
    - ``f0``: the Viterbi-decoded pitch-bin center frequency (quantized to
      ``resolution`` semitones like librosa's), NaN on unvoiced frames;
    - ``voiced_flag``: decoded state in the voiced half of the lattice.

    The HMM is the full candidate lattice: ``n_pitch_bins`` voiced states at
    1/``resolution``-per-semitone spacing plus a mirrored unvoiced half;
    triangular local pitch transitions bounded by ``max_transition_rate``
    octaves/s; voicing switch probability ``switch_prob``.  All pieces are
    static for a given config, so the whole tracker jits with fixed shapes
    (Viterbi is a ``lax.scan`` over frames of a dense max-plus step — the
    (2n)² step fits comfortably in VMEM and vectorizes on the VPU).

    Known deviations from librosa, both documented + tested as inert:
    parallel troughs landing in the same 0.1-semitone bin *sum* their mass
    (librosa's fancy-index assignment keeps the last); candidates rounding
    past the top bin are dropped (librosa writes them into a row the
    unvoiced fill then overwrites — also a drop).
    """
    bps = int(np.ceil(1.0 / resolution))
    n_bins, freqs, log_trans, log_init = _pyin_lattice(
        sr, fmin, fmax, hop_length, bps, max_transition_rate, switch_prob
    )

    win_length = frame_length // 2
    tau_min = max(1, int(sr / fmax))
    tau_max = min(int(np.ceil(sr / fmin)), frame_length - win_length - 1)

    if center:
        y = jnp.pad(y, (frame_length // 2, frame_length // 2))
    frames = frame_signal(y, frame_length, hop_length, center=False)
    cmndf = _cmndf(frames, tau_max, win_length)  # (N, tau_max+1)
    band = cmndf[:, tau_min : tau_max + 1]  # (N, L)
    n = band.shape[0]

    beta_a, beta_b = beta_parameters
    probs, shifts = _trough_probs(
        band, n_thresholds, beta_a, beta_b, boltzmann_parameter, no_trough_prob
    )

    periods = (
        jnp.arange(tau_min, tau_max + 1, dtype=jnp.float32)[None, :] + shifts
    )
    f0_cand = sr / jnp.maximum(periods, 1e-6)
    bin_idx = 12.0 * bps * jnp.log2(jnp.maximum(f0_cand, 1e-6) / fmin)
    bin_idx = jnp.clip(jnp.round(bin_idx), 0, n_bins).astype(jnp.int32)

    # scatter candidate mass into the voiced half (bin == n_bins → dropped)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], bin_idx.shape)
    obs_voiced = jnp.zeros((n, n_bins + 1)).at[rows, bin_idx].add(probs)[:, :n_bins]
    voiced_prob = jnp.clip(jnp.sum(obs_voiced, axis=1), 0.0, 1.0)
    obs_unvoiced = jnp.broadcast_to(
        ((1.0 - voiced_prob) / n_bins)[:, None], (n, n_bins)
    )
    obs = jnp.concatenate([obs_voiced, obs_unvoiced], axis=1)  # (N, 2n)
    log_obs = jnp.log(obs + float(np.finfo(np.float64).tiny))

    # Viterbi over the doubled lattice
    log_trans = jnp.asarray(log_trans)

    def fwd(carry, ob):
        scores = carry[:, None] + log_trans  # (2n, 2n): prev -> cur
        best = jnp.max(scores, axis=0)
        ptr = jnp.argmax(scores, axis=0).astype(jnp.int32)
        return best + ob, ptr

    init = jnp.asarray(log_init) + log_obs[0]
    final, ptrs = jax.lax.scan(fwd, init, log_obs[1:])  # ptrs: (N-1, 2n)
    last = jnp.argmax(final).astype(jnp.int32)

    def back(state, ptr):
        return ptr[state], state

    first, tail = jax.lax.scan(back, last, ptrs, reverse=True)
    states = jnp.concatenate([first[None], tail])  # (N,)

    voiced_flag = states < n_bins
    f0 = jnp.asarray(freqs)[states % n_bins]
    f0 = jnp.where(voiced_flag, f0, jnp.nan)
    return f0, voiced_flag, voiced_prob
