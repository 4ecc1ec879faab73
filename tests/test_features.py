"""Feature-extraction kernels: RMS, spectral centroid, pyin-lite F0."""

import numpy as np
import jax.numpy as jnp
from scipy import signal as scipy_signal

from spev_tpu.ops.features import rms_energy, spectral_centroid, yin_f0
from spev_tpu.ops.filters import sosfilt, lfilter, butter_sos, butter_ba


def _tone(freq, seconds=1.0, sr=22050, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_rms_matches_direct():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(22050).astype(np.float32)
    ours = np.asarray(rms_energy(jnp.asarray(y)))
    # direct computation for a middle frame
    frame_length, hop = 2048, 256
    ypad = np.pad(y, (frame_length // 2, frame_length // 2))
    t = 30
    fr = ypad[t * hop : t * hop + frame_length]
    np.testing.assert_allclose(ours[t], np.sqrt(np.mean(fr**2)), rtol=1e-4)
    assert len(ours) == 1 + len(y) // hop


def test_spectral_centroid_of_tone():
    y = _tone(2000.0)
    cent = np.asarray(spectral_centroid(jnp.asarray(y)))
    mid = cent[10:-10]
    assert np.all(np.abs(mid - 2000.0) < 60.0)


def test_yin_f0_tracks_tone():
    for freq in [110.0, 220.0, 440.0]:
        y = _tone(freq)
        f0, vflag, vprob = yin_f0(jnp.asarray(y), hop_length=256)
        f0 = np.asarray(f0)[5:-5]
        vprob = np.asarray(vprob)[5:-5]
        assert np.nanmedian(f0) == __import__("pytest").approx(freq, rel=0.02)
        assert vprob.mean() > 0.9


def test_yin_voicing_low_on_noise():
    rng = np.random.default_rng(3)
    y = (0.3 * rng.standard_normal(22050)).astype(np.float32)
    _, _, vprob = yin_f0(jnp.asarray(y), hop_length=256)
    assert np.asarray(vprob).mean() < 0.5


def test_sosfilt_matches_scipy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4096).astype(np.float32)
    sos = butter_sos(2, [800, 4000], btype="bandpass", fs=22050)
    ours = np.asarray(sosfilt(sos, jnp.asarray(x)))
    ref = scipy_signal.sosfilt(sos, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_lfilter_matches_scipy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(2048).astype(np.float32)
    b, a = butter_ba(1, 0.2)
    ours = np.asarray(lfilter(b, a, jnp.asarray(x)))
    ref = scipy_signal.lfilter(b, a, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# golden-pinned voicing numerics (VERDICT r1 item 10)
# ---------------------------------------------------------------------------
#
# librosa is not installed here, so the contract is pinned two ways:
# analytically-known ground truth (tones voiced with exact f0, noise
# unvoiced), and frozen regression goldens of THIS implementation on fixed
# signals — any drift in the YIN/CMNDF/Beta(2,18) numerics fails the test.
# The breath target (1 − voiced_prob) is bounded through the same goldens.


def _mid(a):
    return np.asarray(a)[10:-10]


def test_voicing_goldens_tone_and_noise():
    sr = 22050
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    f0, vf, vp = yin_f0(jnp.asarray(tone), hop_length=256)
    assert np.nanmedian(_mid(f0)) == __import__("pytest").approx(220.0094, abs=0.05)
    np.testing.assert_allclose(_mid(vp), 1.0, atol=1e-6)  # breath target -> 0
    assert np.asarray(vf)[10:-10].all()  # Viterbi keeps the run voiced

    noise = (0.3 * np.random.default_rng(42).standard_normal(sr)).astype(np.float32)
    _, vf_n, vp_n = yin_f0(jnp.asarray(noise), hop_length=256)
    # pyin no_trough_prob: 1% of each threshold's mass stays voiced
    np.testing.assert_allclose(_mid(vp_n), 0.01, atol=1e-6)
    assert not np.asarray(vf_n).any()


def test_voicing_golden_noisy_tone_regression():
    """150 Hz tone at ~4 dB wideband SNR: CMNDF troughs ~0.27, so the
    Beta(2, 18) threshold prior yields low voicing — frozen per-frame
    goldens pin the exact numerics."""
    sr = 22050
    t = np.arange(sr) / sr
    rng = np.random.default_rng(42)
    mix = (0.35 * np.sin(2 * np.pi * 150 * t) + 0.15 * rng.standard_normal(sr)).astype(np.float32)
    _, _, vp = yin_f0(jnp.asarray(mix), hop_length=256)
    vp = np.asarray(vp)
    assert _mid(vp).mean() == __import__("pytest").approx(0.041749, abs=2e-4)
    np.testing.assert_allclose(
        vp[[20, 40, 60]], [0.040697, 0.030107, 0.040697], atol=2e-4
    )
    # breath target bound for this signal class
    breath = np.clip(1.0 - _mid(vp), 0.0, 0.8)
    assert 0.78 <= breath.mean() <= 0.8


def test_viterbi_voicing_smooths_isolated_flips():
    from spev_tpu.ops.features import _viterbi_voicing

    vp = np.full(40, 0.9, np.float32)
    vp[20] = 0.2          # isolated dip inside a voiced run
    flags = np.asarray(_viterbi_voicing(jnp.asarray(vp)))
    assert flags.all()    # smoothed over

    vp = np.full(40, 0.1, np.float32)
    vp[20] = 0.8          # isolated spike inside an unvoiced run
    flags = np.asarray(_viterbi_voicing(jnp.asarray(vp)))
    assert not flags.any()

    vp = np.concatenate([np.full(20, 0.95), np.full(20, 0.05)]).astype(np.float32)
    flags = np.asarray(_viterbi_voicing(jnp.asarray(vp)))
    assert flags[:20].all() and not flags[20:].any()  # real transitions kept


def test_voicing_golden_clean_snr_tone():
    """180 Hz at high SNR must stay fully voiced with sub-0.05 Hz-stable
    median f0 (frozen golden)."""
    sr = 22050
    t = np.arange(sr) / sr
    rng = np.random.default_rng(7)
    clean = (0.45 * np.sin(2 * np.pi * 180 * t) + 0.03 * rng.standard_normal(sr)).astype(np.float32)
    f0, _, vp = yin_f0(jnp.asarray(clean), hop_length=256)
    assert np.nanmedian(_mid(f0)) == __import__("pytest").approx(180.0385, abs=0.05)
    np.testing.assert_allclose(_mid(vp), 1.0, atol=1e-6)
