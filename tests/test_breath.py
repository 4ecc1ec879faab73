"""Breath-need planner + mid-utterance breath insertion (the documented
"breath-need predictor → duration extension driven by lung_capacity",
reference ``PRODUCTION_SYSTEM_SUMMARY.md:91-94``): the air-budget model
decides per phrase boundary whether the speaker inhales, and the advanced
inference path assembles the waveform phrase-wise around the C10
breath-in events."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spev_tpu.agents.breath import (
    BreathEvent,
    CAPACITY_PHONEMES,
    phrase_air_cost,
    plan_breaths,
    split_phrases,
)


def test_split_phrases():
    assert split_phrases("hello there") == ["hello there"]
    assert split_phrases("one, two. three!") == ["one,", "two.", "three!"]
    assert split_phrases("a — b; c") == ["a —", "b;", "c"]
    assert split_phrases("") == []


def test_full_capacity_short_text_no_breaths():
    # three short phrases, full lungs: nothing triggers
    assert plan_breaths([10, 10, 10], lung_capacity=1.0) == [None, None]


def test_low_capacity_inserts_breaths():
    plan = plan_breaths([10, 10, 10], lung_capacity=0.3)
    assert any(plan), plan
    for ev in plan:
        if ev is not None:
            assert isinstance(ev, BreathEvent)
            assert 0.0 < ev.intensity <= 0.9
            assert 0.2 < ev.duration <= 0.65


def test_breath_count_monotone_in_need():
    """Lower capacity / longer phrases / slower speech can only add
    breaths — the planner is monotone in air need."""
    counts = [14, 12, 16, 10, 15]

    def n_breaths(**kw):
        return sum(e is not None for e in plan_breaths(counts, **kw))

    by_capacity = [n_breaths(lung_capacity=lc) for lc in (1.0, 0.7, 0.4, 0.2)]
    assert by_capacity == sorted(by_capacity)
    assert by_breaths_strictly_increase(by_capacity)

    by_rate = [n_breaths(lung_capacity=0.6, duration_scale=s)
               for s in (0.8, 1.0, 1.6)]
    assert by_rate == sorted(by_rate)


def by_breaths_strictly_increase(xs):
    return xs[-1] > xs[0]  # the extremes must actually differ


def test_breath_depth_scales_with_deficit():
    """An almost-empty reservoir produces a deeper, longer inhale than a
    shallow top-up."""
    shallow = plan_breaths([20, 20], lung_capacity=0.8)[0]
    deep = plan_breaths([40, 20], lung_capacity=0.4)[0]
    assert shallow is not None and deep is not None
    assert deep.air_before < shallow.air_before
    assert deep.intensity > shallow.intensity
    assert deep.duration > shallow.duration


def test_air_cost_model():
    assert phrase_air_cost(int(CAPACITY_PHONEMES), 1.0) == pytest.approx(1.0)
    assert phrase_air_cost(30, 0.5) == pytest.approx(phrase_air_cost(60, 1.0))
    assert phrase_air_cost(30, 1.0, duration_scale=2.0) == pytest.approx(
        phrase_air_cost(60, 1.0))


def _tiny_synth(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_synthesis import _make_ckpt, _vocab, NMEL

    from spev_tpu.infer.synthesis import Synthesizer

    vocab = _vocab()
    path, cfg = _make_ckpt(tmp_path, vocab)
    return Synthesizer(path, hifigan_dir=None, model_cfg=cfg,
                       g2p_backend="rules",
                       phoneme_buckets=(64,), frame_buckets=(256,))


def test_low_lung_capacity_inserts_audible_breaths(tmp_path):
    """End-to-end: lung_capacity < 1 on multi-phrase text inserts inhale
    audio between phrases — the waveform grows beyond the mel's hop span
    by exactly the planned breath+pause samples."""
    from spev_tpu.agents.breath import plan_breaths, split_phrases
    from spev_tpu.infer.advanced_api import synthesize_advanced_controls

    synth = _tiny_synth(tmp_path)
    text = "first phrase here, second phrase follows, third phrase ends now"
    hop, sr = synth.audio.hop_length, synth.audio.sample_rate

    wav_full, mel_full = synthesize_advanced_controls(synth, text,
                                                      lung_capacity=1.0)
    assert wav_full.shape[0] == mel_full.shape[0] * hop  # no insertion

    wav_low, mel_low = synthesize_advanced_controls(synth, text,
                                                    lung_capacity=0.2)
    phrases = split_phrases(text)
    counts = [len(synth.g2p.phonemes(p)) for p in phrases]
    from spev_tpu.models.advanced import lung_capacity_effect

    dur_s = lung_capacity_effect(0.2).duration_scale
    plan = plan_breaths(counts, 0.2, duration_scale=dur_s)
    n_breaths = sum(e is not None for e in plan)
    assert n_breaths >= 1
    extra = wav_low.shape[0] - mel_low.shape[0] * hop
    expected = sum(int(sr * e.duration) + 2 * int(0.06 * sr)
                   for e in plan if e is not None)
    assert extra == expected
    # the inserted spans are audible, not silence
    assert np.abs(wav_low).max() > 0
    assert np.isfinite(wav_low).all()


def test_breath_path_preserves_word_emphasis_alignment(tmp_path):
    """Word-emphasis scales stay aligned to their words across the
    phrase-wise assembly (sliced per phrase, not restarted)."""
    from spev_tpu.infer.advanced_api import synthesize_advanced_controls

    synth = _tiny_synth(tmp_path)
    text = "alpha beta, gamma delta, epsilon zeta"
    # emphasize the 3rd word (gamma — first word of phrase 2)
    wav_e, mel_e = synthesize_advanced_controls(
        synth, text, lung_capacity=0.2, word_emphasis="1,1,2.0,1,1,1")
    wav_p, mel_p = synthesize_advanced_controls(
        synth, text, lung_capacity=0.2, word_emphasis="1,1,1,1,1,1")
    # the emphasized run spends more frames (duration scaling is
    # multiplicative through the length regulator)
    assert mel_e.shape[0] > mel_p.shape[0]
