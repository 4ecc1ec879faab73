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


# ---------------------------------------------------------------------------
# learned nasality channel (PRODUCTION_SYSTEM_SUMMARY.md:55-69,133)
# ---------------------------------------------------------------------------


def test_nasality_head_init_and_noop():
    """use_nasality adds a 7th predictor + embedding conv; an untrained head
    (output_norm bias 0, zero conv bias) is a strict no-op on base numerics."""
    import dataclasses
    from spev_tpu.models.fastspeech2 import init_fastspeech2

    cfg = dataclasses.replace(CFG, n_speakers=1, use_nasality=True)
    cfg_base = dataclasses.replace(cfg, use_nasality=False)
    base = init_fastspeech2(jax.random.PRNGKey(0), cfg_base)
    base["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.0])
    nasal_full = init_fastspeech2(jax.random.PRNGKey(1), cfg)
    assert "nasal_predictor" in nasal_full and "nasal_embedding" in nasal_full
    # graft the nasal head onto the base params so the rest is identical
    params = dict(base)
    params["nasal_predictor"] = nasal_full["nasal_predictor"]
    params["nasal_embedding"] = nasal_full["nasal_embedding"]

    rng = np.random.default_rng(0)
    ids = np.zeros((1, cfg.max_phonemes), np.int32)
    ids[:, :8] = rng.integers(1, cfg.vocab_size, size=(1, 8))
    lens = jnp.asarray([8], jnp.int32)

    out_base = apply_fastspeech2(base, cfg_base, jnp.asarray(ids), lens)
    out_nasal = apply_fastspeech2(params, cfg, jnp.asarray(ids), lens)
    assert "nasal_pred" in out_nasal
    # untrained head: predictor emits its LayerNorm(1) bias = 0 everywhere
    np.testing.assert_allclose(np.asarray(out_nasal["nasal_pred"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_nasal["mel_pred"]), np.asarray(out_base["mel_pred"]), atol=1e-6
    )
    # a nonzero nasality control flows through the (std-0.01) embedding conv
    out_ctl = apply_fastspeech2(
        params, cfg, jnp.asarray(ids), lens,
        target_nasal=jnp.full((1, cfg.max_phonemes), 1.0),
    )
    assert np.abs(np.asarray(out_ctl["mel_pred"]) - np.asarray(out_base["mel_pred"])).max() > 1e-6


@pytest.mark.slow
def test_nasality_loss_term_trains():
    """A batch with a 'nasal' key + use_nasality adds 0.1·L_nasal to the loss
    and trains the nasal head."""
    import dataclasses
    from spev_tpu.config import SpevConfig, TrainConfig
    from spev_tpu.parallel.mesh import make_mesh, shard_batch
    from spev_tpu.train.trainer import init_train_state, make_train_step

    P, M, H, V, NMEL = 16, 64, 32, 23, 8
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=V, embed_dim=H, hidden_dim=H, n_mels=NMEL,
                          max_phonemes=P, max_frames=M, use_nasality=True),
        train=TrainConfig(batch_size=4, warmup_steps=10),
    )
    mesh = make_mesh((1,), ("data",))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    assert "nasal_predictor" in state.params

    rng = np.random.default_rng(0)
    B, n_ph = 4, 8
    ids = np.zeros((B, P), np.int32)
    ids[:, :n_ph] = rng.integers(1, V, size=(B, n_ph))
    durs = np.zeros((B, P), np.float32)
    durs[:, :n_ph] = 4
    feat = lambda lo, hi: np.where(durs > 0, rng.uniform(lo, hi, (B, P)), 0.0).astype(np.float32)
    batch = {
        "ids": ids, "lens": np.full((B,), n_ph, np.int32), "durs": durs,
        "mel": np.clip(rng.standard_normal((B, M, NMEL)).astype(np.float32) - 4, -10, 2),
        "mel_lens": durs.sum(axis=1).astype(np.int32),
        "log_durs": (np.log(np.maximum(durs, 1) + 1) * (durs > 0)).astype(np.float32),
        "pitch": feat(-1, 1), "energy": feat(-1, 1), "breath": feat(0, 0.8),
        "rough": feat(0, 1.5), "bright": feat(-1, 1), "nasal": feat(0.2, 0.9),
    }
    step = make_train_step(cfg, mesh, state.params, use_dropout=False)
    before = np.asarray(state.params["nasal_predictor"]["proj"]["weight"]).copy()
    state, metrics = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(1))
    assert "l_nasal" in metrics
    assert np.isfinite(float(metrics["l_nasal"])) and float(metrics["l_nasal"]) > 0
    after = np.asarray(state.params["nasal_predictor"]["proj"]["weight"])
    assert np.abs(after - before).max() > 0  # the nasal head received gradient
