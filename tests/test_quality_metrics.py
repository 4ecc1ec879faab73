"""Quality metrics: MCD, F0 RMSE, duration error — plus a diag.trace smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

from spev_tpu.diag.quality import (
    duration_error_pct,
    evaluate_pair,
    f0_rmse_hz,
    mel_cepstral_distortion,
)
from spev_tpu.ops.stft import log_mel_spectrogram


def _tone(freq, seconds=1.0, sr=22050):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mcd_zero_for_identical():
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((50, 80)).astype(np.float32)
    assert mel_cepstral_distortion(mel, mel) == pytest.approx(0.0)


def test_mcd_orders_similarity():
    y1 = _tone(220.0)
    y2 = _tone(225.0)  # nearly identical
    y3 = _tone(440.0)  # different
    m1 = np.asarray(log_mel_spectrogram(jnp.asarray(y1), fmax=11025.0)).T
    m2 = np.asarray(log_mel_spectrogram(jnp.asarray(y2), fmax=11025.0)).T
    m3 = np.asarray(log_mel_spectrogram(jnp.asarray(y3), fmax=11025.0)).T
    close = mel_cepstral_distortion(m1, m2)
    far = mel_cepstral_distortion(m1, m3)
    assert 0 < close < far


def test_f0_rmse():
    a, b = _tone(220.0), _tone(220.0)
    assert f0_rmse_hz(a, b) < 2.0
    c = _tone(240.0)
    assert f0_rmse_hz(a, c) == pytest.approx(20.0, abs=4.0)


def test_duration_error():
    assert duration_error_pct([10, 10], [10, 10]) == pytest.approx(0.0)
    assert duration_error_pct([11, 9], [10, 10]) == pytest.approx(10.0)
    assert np.isnan(duration_error_pct([1], [0]))


def test_evaluate_pair_keys():
    mel = np.zeros((10, 80), np.float32)
    out = evaluate_pair(mel, mel, pred_durs=[2, 2], target_durs=[2, 2])
    assert out["mcd_db"] == pytest.approx(0.0)
    assert out["duration_error_pct"] == pytest.approx(0.0)
    assert out["mcd_target_db"] == 6.0


def test_profiler_trace_smoke(tmp_path):
    import jax
    from spev_tpu.diag.profiling import StepTimer, trace

    timer = StepTimer()
    with trace(str(tmp_path / "trace")):
        timer.record(jax.jit(lambda x: x * 2 + 1), jnp.ones((128, 128)))
    s = timer.summary(warmup=0)
    assert s["steps"] == 1 and s["mean_s"] > 0
    import glob

    assert glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)
