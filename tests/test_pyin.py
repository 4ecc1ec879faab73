"""Full pyin HMM vs a literal librosa-semantics oracle.

The reference extracts breath/rough training targets from ``librosa.pyin``
(``/root/reference/spev_real_metrics.py:311-316,408-415``).  librosa is not
installed in this environment, so the oracle below is an *independent,
literal numpy/scipy transcription of librosa.pyin's published algorithm*
(Mauch & Dixon 2014 + librosa 0.10 defaults): O(n²) YIN difference function,
CMNDF, per-frame troughs, Beta(2, 18) threshold prior split by a Boltzmann
rank prior, the 0.1-semitone candidate lattice doubled into voiced/unvoiced
halves, triangular local transitions bounded by 35.92 octaves/s, and a dense
log-space Viterbi.  ``spev_tpu.ops.features.pyin_f0`` (vectorized JAX,
FFT-based CMNDF, scan-based Viterbi) must match it:

- ``voiced_prob`` (the breath target's input) within 5e-4,
- decoded ``voiced_flag`` exactly,
- decoded ``f0`` on voiced frames within 1e-3 relative,

which bounds the deviation of the breath (``1 − mean(voiced_prob)``) and
rough (std of voiced log-F0) targets from the reference's extractor
semantics — the VERDICT-r2 #2 requirement.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spev_tpu.ops.features import pyin_f0

_TINY = np.finfo(np.float64).tiny


def _oracle_pyin(
    y,
    sr,
    fmin,
    fmax,
    frame_length=2048,
    hop_length=512,
    n_thresholds=100,
    beta_parameters=(2.0, 18.0),
    boltzmann_parameter=2.0,
    resolution=0.1,
    max_transition_rate=35.92,
    switch_prob=0.01,
    no_trough_prob=0.01,
):
    """Literal librosa.pyin, slow numpy/scipy."""
    import scipy.stats

    win_length = frame_length // 2
    min_period = max(1, int(sr / fmax))
    max_period = min(int(np.ceil(sr / fmin)), frame_length - win_length - 1)
    L = max_period - min_period + 1

    ypad = np.pad(np.asarray(y, np.float64), frame_length // 2)
    n_frames = 1 + (len(ypad) - frame_length) // hop_length

    thr = np.linspace(0.0, 1.0, n_thresholds + 1)
    beta_probs = np.diff(scipy.stats.beta.cdf(thr, *beta_parameters))

    bps = int(np.ceil(1.0 / resolution))
    n_bins = int(np.floor(12 * bps * np.log2(fmax / fmin))) + 1
    freqs = fmin * 2.0 ** (np.arange(n_bins) / (12.0 * bps))

    obs = np.zeros((n_frames, 2 * n_bins))
    collisions = 0
    for i in range(n_frames):
        fr = ypad[i * hop_length : i * hop_length + frame_length]
        # YIN difference function, literal O(n^2)
        d = np.zeros(max_period + 1)
        for tau in range(max_period + 1):
            diff = fr[:win_length] - fr[tau : tau + win_length]
            d[tau] = np.dot(diff, diff)
        cum_mean = np.cumsum(d[1:]) / np.arange(1, max_period + 1)
        dprime = np.ones(max_period + 1)
        dprime[1:] = d[1:] / (cum_mean + _TINY)
        band = dprime[min_period : max_period + 1]

        # parabolic shifts (boundary lags 0; |shift| > 1 zeroed)
        pa = (band[:-2] + band[2:] - 2.0 * band[1:-1]) / 2.0
        pb = (band[2:] - band[:-2]) / 2.0
        s = -pb / (2.0 * pa + _TINY)
        s[np.abs(s) > 1.0] = 0.0
        shifts = np.zeros(L)
        shifts[1:-1] = s

        # troughs: strict left, non-strict right (edge padded), first lag
        # a trough iff band[0] < band[1]
        left = np.r_[band[0], band[:-1]]
        right = np.r_[band[1:], band[-1]]
        is_trough = (band < left) & (band <= right)
        is_trough[0] = band[0] < band[1]
        tr = np.nonzero(is_trough)[0]
        if len(tr) == 0:
            continue
        h = band[tr]
        qual = h[:, None] < thr[None, 1:]  # (n_tr, n_thresholds)
        pos = np.cumsum(qual, axis=0) - 1
        ntr = qual.sum(axis=0)
        prior = scipy.stats.boltzmann.pmf(
            pos, boltzmann_parameter, np.maximum(ntr, 1)
        )
        prior[~qual] = 0.0
        p = prior @ beta_probs
        gm = int(np.argmin(h))
        n_below = int(np.count_nonzero(~qual[gm]))
        p[gm] += no_trough_prob * beta_probs[:n_below].sum()

        periods = (tr + min_period).astype(np.float64) + shifts[tr]
        f0c = sr / periods
        bins = np.clip(
            np.round(12 * bps * np.log2(f0c / fmin)), 0, n_bins
        ).astype(int)
        # librosa fancy-index assignment: duplicate bins keep the last
        nz = p > 0
        collisions += len(bins[nz]) - len(np.unique(bins[nz]))
        row = np.zeros(2 * n_bins + 1)
        row[bins] = p
        obs[i] = row[: 2 * n_bins]

    voiced_prob = np.clip(obs[:, :n_bins].sum(axis=1), 0.0, 1.0)
    obs[:, n_bins:] = ((1.0 - voiced_prob) / n_bins)[:, None]

    # transition: triangular local window kron voicing switch
    max_semi = round(max_transition_rate * 12 * hop_length / sr)
    width = max_semi * bps + 1
    half = width // 2
    offs = np.arange(-half, half + 1)
    tri = (half + 1 - np.abs(offs)) / (half + 1)
    local = np.zeros((n_bins, n_bins))
    for i in range(n_bins):
        lo, hi = max(0, i - half), min(n_bins, i + half + 1)
        local[i, lo:hi] = tri[(lo - i) + half : (hi - i) + half]
    local /= local.sum(axis=1, keepdims=True)
    t_switch = np.array(
        [[1 - switch_prob, switch_prob], [switch_prob, 1 - switch_prob]]
    )
    transition = np.kron(t_switch, local)

    p_init = np.zeros(2 * n_bins)
    p_init[n_bins:] = 1.0 / n_bins

    # dense log-space Viterbi
    log_obs = np.log(obs + _TINY)
    log_trans = np.log(transition + _TINY)
    score = np.log(p_init + _TINY) + log_obs[0]
    ptrs = np.zeros((n_frames - 1, 2 * n_bins), dtype=int)
    for t in range(1, n_frames):
        cand = score[:, None] + log_trans
        ptrs[t - 1] = np.argmax(cand, axis=0)
        score = cand[ptrs[t - 1], np.arange(2 * n_bins)] + log_obs[t]
    states = np.zeros(n_frames, dtype=int)
    states[-1] = int(np.argmax(score))
    for t in range(n_frames - 2, -1, -1):
        states[t] = ptrs[t, states[t + 1]]

    voiced_flag = states < n_bins
    f0 = freqs[states % n_bins]
    f0 = np.where(voiced_flag, f0, np.nan)
    return f0, voiced_flag, voiced_prob, collisions


def _test_signal(sr):
    """0.6 s: vibrato tone → silence → steady tone, light noise."""
    rng = np.random.RandomState(7)
    n = int(0.6 * sr)
    t = np.arange(n) / sr
    f0 = 180.0 * (1 + 0.03 * np.sin(2 * np.pi * 4 * t))
    y = np.sin(2 * np.pi * np.cumsum(f0) / sr)
    y[int(0.25 * sr) : int(0.38 * sr)] = 0.0
    y += 0.005 * rng.randn(n)
    return y.astype(np.float32)


@pytest.mark.slow
def test_pyin_matches_librosa_semantics_oracle():
    sr = 22050
    y = _test_signal(sr)
    kw = dict(sr=sr, fmin=80.0, fmax=400.0, hop_length=512)

    f0_o, vf_o, vp_o, collisions = _oracle_pyin(y, **kw)
    # scope guard: the known sum-vs-last-wins deviation (features.py
    # docstring) is inert on this signal — no two troughs share a bin
    assert collisions == 0

    f0_j, vf_j, vp_j = jax.jit(
        lambda x: pyin_f0(x, frame_length=2048, **kw)
    )(jnp.asarray(y))
    f0_j, vf_j, vp_j = map(np.asarray, (f0_j, vf_j, vp_j))

    assert f0_j.shape == f0_o.shape
    # breath-target input: voiced_prob
    assert np.max(np.abs(vp_j - vp_o)) < 5e-4
    # decoded voicing path
    assert np.array_equal(vf_j, vf_o)
    # decoded f0 on voiced frames (bin-center frequencies)
    v = vf_o
    assert np.allclose(f0_j[v], f0_o[v], rtol=1e-3)
    # rough-target input: std of voiced log-F0
    r_o = np.std(np.log(f0_o[v]))
    r_j = np.std(np.log(f0_j[v]))
    assert abs(r_j - r_o) < 1e-3


def test_pyin_tracks_tone_within_grid():
    sr = 22050
    t = np.arange(int(0.5 * sr)) / sr
    y = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    f0, vf, vp = jax.jit(lambda x: pyin_f0(x, sr=sr, hop_length=256))(
        jnp.asarray(y)
    )
    f0, vf, vp = map(np.asarray, (f0, vf, vp))
    mid = slice(4, len(f0) - 4)
    assert np.all(vf[mid])
    assert np.mean(vp[mid]) > 0.9
    # decoded bins are on the 0.1-semitone grid; 220 Hz must land within
    # half a bin (0.05 semitone ≈ 0.29%)
    assert np.all(np.abs(f0[mid] / 220.0 - 1.0) < 0.004)


def test_pyin_noise_is_unvoiced():
    sr = 22050
    y = 0.1 * np.random.RandomState(0).randn(int(0.4 * sr)).astype(np.float32)
    f0, vf, vp = jax.jit(lambda x: pyin_f0(x, sr=sr, hop_length=256))(
        jnp.asarray(y)
    )
    vf, vp = np.asarray(vf), np.asarray(vp)
    assert np.mean(vp) < 0.2
    assert np.mean(vf) < 0.1
    assert np.all(np.isnan(np.asarray(f0)[~vf]))


def test_pyin_glide_obeys_transition_bound():
    """A 150→300 Hz glide: the Viterbi track must follow within the
    triangular transition window (max_transition_rate octaves/s)."""
    sr = 22050
    hop = 256
    t = np.arange(int(0.5 * sr)) / sr
    f0_true = 150.0 * 2 ** (t / 0.5)  # one octave over 0.5 s = 2 oct/s
    y = np.sin(2 * np.pi * np.cumsum(f0_true) / sr).astype(np.float32)
    f0, vf, _ = jax.jit(lambda x: pyin_f0(x, sr=sr, hop_length=hop))(
        jnp.asarray(y)
    )
    f0, vf = np.asarray(f0), np.asarray(vf)
    mid = slice(4, len(f0) - 4)
    assert np.all(vf[mid])
    centers = np.arange(len(f0)) * hop / sr
    err_semitones = 12 * np.abs(np.log2(f0[mid] / np.interp(centers[mid], t, f0_true)))
    assert np.median(err_semitones) < 0.5
    # per-frame jump bounded by the lattice transition width
    max_semi = round(35.92 * 12 * hop / sr)
    jumps = 12 * np.abs(np.diff(np.log2(f0[mid])))
    assert np.all(jumps <= max_semi + 0.2)


def test_breath_target_separates_breathy_from_clean():
    """1 − mean(voiced_prob): higher for noise-dominated (breathy) speech
    proxy than for a clean tone — the training-target contract."""
    sr = 22050
    rng = np.random.RandomState(3)
    t = np.arange(int(0.4 * sr)) / sr
    clean = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    breathy = (0.4 * np.sin(2 * np.pi * 200 * t) + 0.6 * rng.randn(len(t))).astype(
        np.float32
    )
    fn = jax.jit(lambda x: pyin_f0(x, sr=sr, hop_length=256))
    _, _, vp_c = fn(jnp.asarray(clean))
    _, _, vp_b = fn(jnp.asarray(breathy))
    b_clean = 1.0 - float(np.mean(np.asarray(vp_c)))
    b_breathy = 1.0 - float(np.mean(np.asarray(vp_b)))
    assert b_breathy > b_clean + 0.1
