"""Advanced-model surface: VAD/speaker conditioning, physiological rules,
mel-domain voice-quality DSP."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spev_tpu.config import ModelConfig
from spev_tpu.models.advanced import (
    age_pitch_scale,
    apply_advanced,
    init_advanced,
    lung_capacity_effect,
)
from spev_tpu.models.fastspeech2 import apply_fastspeech2
from spev_tpu.ops.mel_dsp import (
    add_breathiness_noise,
    add_roughness_modulation,
    apply_nasality,
    apply_voice_quality,
)

CFG = ModelConfig(vocab_size=23, embed_dim=32, hidden_dim=32, n_mels=8,
                  max_phonemes=16, max_frames=64, n_speakers=4)


@pytest.fixture(scope="module")
def setup():
    params = init_advanced(jax.random.PRNGKey(0), CFG)
    # positive duration constant so the inference path emits frames
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.0])
    rng = np.random.default_rng(0)
    ids = np.zeros((2, CFG.max_phonemes), np.int32)
    ids[:, :8] = rng.integers(1, CFG.vocab_size, size=(2, 8))
    lens = np.full((2,), 8, np.int32)
    return params, jnp.asarray(ids), jnp.asarray(lens)


def test_zero_init_vad_is_noop(setup):
    params, ids, lens = setup
    base = apply_fastspeech2(params, CFG, ids, lens)
    adv = apply_advanced(params, CFG, ids, lens, vad=jnp.asarray([[0.5, -0.3, 0.8]] * 2))
    np.testing.assert_allclose(
        np.asarray(base["mel_pred"]), np.asarray(adv["mel_pred"]), atol=1e-6
    )


def test_speaker_embedding_changes_output(setup):
    params, ids, lens = setup
    a = apply_advanced(params, CFG, ids, lens, speaker_ids=jnp.asarray([0, 0]))
    b = apply_advanced(params, CFG, ids, lens, speaker_ids=jnp.asarray([1, 1]))
    assert not np.allclose(np.asarray(a["mel_pred"]), np.asarray(b["mel_pred"]))


def test_trained_vad_changes_output(setup):
    params, ids, lens = setup
    import copy

    p2 = jax.tree.map(lambda x: x, params)
    p2["advanced"] = dict(p2["advanced"])
    p2["advanced"]["vad_proj"] = {
        "weight": 0.1 * jax.random.normal(jax.random.PRNGKey(3), (CFG.hidden_dim, 3)),
        "bias": jnp.zeros((CFG.hidden_dim,)),
    }
    a = apply_advanced(p2, CFG, ids, lens, vad=jnp.asarray([[0.0, 0.0, 0.0]] * 2))
    b = apply_advanced(p2, CFG, ids, lens, vad=jnp.asarray([[1.0, -1.0, 0.5]] * 2))
    assert not np.allclose(np.asarray(a["mel_pred"]), np.asarray(b["mel_pred"]))


def test_word_emphasis_extends_durations(setup):
    params, ids, lens = setup
    params = jax.tree.map(lambda x: x, params)
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.0])
    emph = np.ones((2, CFG.max_phonemes), np.float32)
    base = apply_advanced(params, CFG, ids, lens, emphasis=jnp.asarray(emph))
    emph2 = emph.copy()
    emph2[:, :8] = 2.0
    strong = apply_advanced(params, CFG, ids, lens, emphasis=jnp.asarray(emph2))
    assert int(strong["mel_len"].sum()) > int(base["mel_len"].sum())


def test_age_pitch_formula():
    assert age_pitch_scale(25.0) == pytest.approx(1.0)
    assert age_pitch_scale(5.0) == pytest.approx(1.0 + 20 * 0.008)
    assert age_pitch_scale(75.0) == pytest.approx(1.0 - 50 * 0.008)


def test_lung_capacity_effect():
    full = lung_capacity_effect(1.0)
    assert full.breath_boost == pytest.approx(0.0) and full.duration_scale == pytest.approx(1.0)
    low = lung_capacity_effect(0.5)
    assert low.breath_boost > 0 and low.duration_scale > 1.0


def test_mel_dsp_zero_strength_is_noop():
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 30, 80)).astype(np.float32) - 4)
    key = jax.random.PRNGKey(0)
    out = apply_voice_quality(mel, key, 0.0, 0.0, 0.0, clip_min=-100, clip_max=100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mel), atol=1e-6)


def test_mel_dsp_effects_target_bands():
    mel = jnp.zeros((1, 50, 80)) - 4.0
    key = jax.random.PRNGKey(0)
    breathy = np.asarray(add_breathiness_noise(mel, 1.0, key))
    assert np.abs(breathy[0, :, 40:80] + 4).mean() > 0.1
    assert np.abs(breathy[0, :, :40] + 4).max() < 1e-6

    rough = np.asarray(add_roughness_modulation(mel, 1.0))
    assert np.abs(rough[0, :, :20] + 4).mean() > 0.1
    assert np.abs(rough[0, :, 20:] + 4).max() < 1e-6

    nasal = np.asarray(apply_nasality(mel, 1.0))
    assert (nasal[0, 0, 20:45] > -4).all()  # mid boost
    assert (nasal[0, 0, 60:] < -4).all()  # high cut
