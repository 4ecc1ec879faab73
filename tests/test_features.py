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
