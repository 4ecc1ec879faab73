"""Agents: vocal-event DSP, prosody policies/curves, embodied orchestration,
policy model."""

import numpy as np
import pytest
import jax

from spev_tpu.agents.events import VocalEventSynth
from spev_tpu.agents.prosody import CurveGenerator, ProsodyManager, ProsodyPolicy, vad_to_knobs
from spev_tpu.agents.embodied import EmbodiedAgent
from spev_tpu.models.policy import apply_policy_model, init_policy_model


def test_event_synth_shapes_and_finiteness():
    es = VocalEventSynth()
    sigh = es.get_event("sigh")
    breath = es.get_event("breath_in")
    grunt = es.get_event("grunt")
    unknown = es.get_event("cough")
    assert len(sigh) == int(22050 * 1.2)
    assert len(breath) == int(22050 * 0.4)
    assert len(grunt) == int(22050 * 0.2)
    assert len(unknown) == 100 and not unknown.any()
    for x in (sigh, breath, grunt):
        assert np.isfinite(x).all()
        assert np.abs(x).max() > 1e-4  # actually produces audio
        assert np.abs(x).max() < 1.0


def test_event_spectral_bands():
    """The sigh must concentrate energy in its 800-4000 Hz band."""
    import jax.numpy as jnp
    from spev_tpu.ops.stft import stft_power

    es = VocalEventSynth()
    sigh = es.get_event("sigh")
    spec = np.asarray(stft_power(jnp.asarray(sigh))).mean(axis=0)
    freqs = np.linspace(0, 22050 / 2, len(spec))
    in_band = spec[(freqs > 800) & (freqs < 4000)].mean()
    out_band = spec[freqs > 6000].mean()
    assert in_band > 10 * out_band


def test_prosody_policy_reference_tables():
    p = ProsodyPolicy()
    assert p.get_knobs("exhausted")["breathiness"] == 0.7
    assert p.get_knobs("excited")["pitch_scale"] == 1.3
    assert p.get_knobs("unknown_emotion") == p.default_style
    assert set(p.styles) == {"neutral", "exhausted", "excited", "secretive", "angry"}


def test_curve_generator_primitives():
    np.testing.assert_allclose(CurveGenerator.linear(0.9, 0.0, 3), [0.9, 0.45, 0.0])
    np.testing.assert_allclose(CurveGenerator.constant(0.5, 4), [0.5] * 4)
    bell = CurveGenerator.bell(0.8, 5)
    assert bell[2] == pytest.approx(0.8) and bell[0] == pytest.approx(0.8 * np.exp(-5))
    osc = CurveGenerator.oscillator(0.3, 0.2, 3.0, 100)
    assert osc.max() <= 0.5 + 1e-9 and osc.min() >= 0.1 - 1e-9


def test_prosody_manager_curves():
    m = ProsodyManager()
    c = m.get_curves("relief", 10)
    assert c["breath"][0] == pytest.approx(0.9) and c["breath"][-1] == pytest.approx(0.0)
    assert c["bright"][0] == pytest.approx(-1.0) and c["bright"][-1] == pytest.approx(0.5)
    assert c["pitch_scale"] == 0.9 and c["speed_scale"] == 1.1
    assert set(m.styles) == {"neutral", "exhausted", "relief", "anxious", "angry"}


def test_vad_mapping_ranges():
    for v, a, d in [(-1, -1, -1), (1, 1, 1), (0, 0, 0), (-0.5, 0.8, -0.2)]:
        k = vad_to_knobs(v, a, d)
        assert 0.0 <= k["breathiness"] <= 0.8
        assert 0.0 <= k["roughness"] <= 1.5
        assert -2.5 <= k["brightness"] <= 2.5
    assert vad_to_knobs(0, 0, 0)["pitch_scale"] == pytest.approx(1.0)
    assert vad_to_knobs(0, 1, 0)["pitch_scale"] > 1.0  # arousal raises pitch


@pytest.fixture(scope="module")
def agent(tmp_path_factory):
    import jax.numpy as jnp

    from spev_tpu.config import ModelConfig
    from spev_tpu.infer.synthesis import Synthesizer
    from spev_tpu.models.fastspeech2 import init_fastspeech2
    from spev_tpu.text.vocab import Vocab
    from spev_tpu.train.checkpoint import save_checkpoint

    vocab = Vocab.build([chr(c) for c in range(ord("a"), ord("p"))])
    cfg = ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32, n_mels=80)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.2])
    path = str(tmp_path_factory.mktemp("ck") / "m.spev")
    save_checkpoint(path, params, vocab=vocab.symbols, stats={})
    synth = Synthesizer(path, model_cfg=cfg, g2p_backend="rules",
                        phoneme_buckets=(64,), frame_buckets=(256,))
    return synth


def test_embodied_agent_static(agent):
    a = EmbodiedAgent(None, synthesizer=agent, temporal=False)
    audio = a.synthesize("I am tired [sigh] but fine", emotion="exhausted")
    assert np.isfinite(audio).all()
    # two speech segments + sigh (1.2s) + 0.1s silence
    assert len(audio) > int(22050 * 1.3)


def test_embodied_agent_temporal(agent):
    a = EmbodiedAgent(None, synthesizer=agent, temporal=True)
    audio = a.synthesize("oh [breath] relief", emotion="relief")
    assert np.isfinite(audio).all() and len(audio) > int(22050 * 0.5)


def test_embodied_agent_long_segment_chunks(agent):
    """A speech segment longer than the largest phoneme bucket (64 here)
    is synthesized in bucket-sized spans with the curve trajectory sliced
    across them — not an error."""
    a = EmbodiedAgent(None, synthesizer=agent, temporal=True)
    long_text = " ".join(["calming phrase edge"] * 12)  # > 64 phonemes
    assert len(agent.g2p.phonemes(long_text)) > 64
    audio = a.synthesize(long_text, emotion="relief")
    assert np.isfinite(audio).all() and len(audio) > 0


def test_policy_model_ranges():
    params = init_policy_model(jax.random.PRNGKey(0), vocab_size=50, hidden=16)
    ids = np.random.default_rng(0).integers(0, 50, size=(2, 12))
    breath, rough, bright = apply_policy_model(params, ids)
    assert breath.shape == (2, 12)
    assert float(breath.min()) >= 0.0 and float(breath.max()) <= 1.0
    assert float(rough.min()) >= 0.0 and float(rough.max()) <= 1.0
    assert float(bright.min()) >= -2.0 and float(bright.max()) <= 2.0
