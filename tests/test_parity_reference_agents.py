"""Orchestration parity vs the ACTUAL /root/reference/spev_embodied_core.py.

Imports the real coordinator module (with its TTS/vocoder/phonemizer deps
stubbed), then checks:

- the emotion→knob rules table is byte-identical to ours
  (spev_embodied_core.py:118-171),
- ``EmbodiedAgent.synthesize`` and our agent produce the SAME orchestration
  trace on tagged text — token split, event dispatch, post-event 0.1 s
  silence, per-segment control values, p/d control scalars, concat order
  (spev_embodied_core.py:200-255).

Both agents are driven with recording fakes so the comparison isolates the
coordinator logic itself.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference"
SR = 22050


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref_embodied():
    # the coordinator does `from spev_real_metrics import RealMetricsFastSpeech2,
    # Vocoder, CONFIG, DEVICE` — satisfy it with a light stand-in so importing
    # the orchestration layer doesn't pull librosa/matplotlib
    fake_rm = _stub(
        "spev_real_metrics",
        RealMetricsFastSpeech2=object,
        Vocoder=object,
        CONFIG={"sr": SR},
        DEVICE="cpu",
    )
    stubs = {
        "spev_real_metrics": fake_rm,
        "soundfile": _stub("soundfile"),
        "phonemizer": _stub("phonemizer", phonemize=lambda text, **k: text.replace(" ", "")),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_embodied", f"{REF_DIR}/spev_embodied_core.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def test_prosody_policy_tables_match_reference(ref_embodied):
    from spev_tpu.agents.prosody import ProsodyPolicy

    ref = ref_embodied.ProsodyPolicy()
    ours = ProsodyPolicy()
    assert set(ref.styles) == set(ours.styles)
    for emotion, knobs in ref.styles.items():
        assert ours.styles[emotion] == knobs, emotion
    assert ours.default_style == ref.default_style
    # unknown emotion falls back to neutral on both sides
    assert ours.get_knobs("nope") == ref.get_knobs("nope")


class _Trace:
    """Records the orchestration as (kind, payload) events."""

    def __init__(self):
        self.events = []


def _drive_reference(ref_embodied, text, emotion):
    """Run the REAL EmbodiedAgent.synthesize with recording fakes."""
    agent = ref_embodied.EmbodiedAgent.__new__(ref_embodied.EmbodiedAgent)
    trace = _Trace()
    agent.policy = ref_embodied.ProsodyPolicy()

    class FakeEventSynth:
        def get_event(self, name):
            trace.events.append(("event", name))
            return np.zeros(321, np.float32)

    class FakeTTS:
        def __call__(self, ids, lens, **kw):
            trace.events.append((
                "speech",
                int(lens[0]),
                round(float(kw["target_breath"][0, 0]), 6),
                round(float(kw["target_rough"][0, 0]), 6),
                round(float(kw["target_bright"][0, 0]), 6),
                round(kw["p_control"], 6),
                round(kw["d_control"], 6),
            ))
            return {"mel_pred": torch.zeros(1, 5, 8)}

        def eval(self):
            return self

    class FakeVocoder:
        def infer(self, mel):
            return np.zeros(100, np.float32)

    agent.event_synth = FakeEventSynth()
    agent.tts_model = FakeTTS()
    agent.vocoder = FakeVocoder()
    agent.vocab = ["<PAD>", "<UNK>", "<SIL>"] + list("abcdefghijklmnopqrstuvwxyz")
    agent.ph_to_idx = {p: i for i, p in enumerate(agent.vocab)}

    wav = agent.synthesize(text, emotion=emotion)
    return trace.events, wav


def _drive_ours(text, emotion):
    """Run our EmbodiedAgent.synthesize with an equivalent fake synthesizer."""
    from spev_tpu.agents.embodied import EmbodiedAgent

    trace = _Trace()

    class FakeG2P:
        def phonemes(self, text):
            # mirror the reference stub: <SIL> + chars-without-spaces + <SIL>
            return ["<SIL>"] + list(text.replace(" ", "")) + ["<SIL>"]

    class FakeSynth:
        g2p = FakeG2P()

        def phonemes_to_ids(self, phones):
            return np.arange(len(phones), dtype=np.int32)

        def synthesize_ids(self, ids, breath, rough, bright,
                           pitch_scale, duration_scale, **kw):
            trace.events.append((
                "speech", len(ids),
                round(float(breath[0]), 6), round(float(rough[0]), 6),
                round(float(bright[0]), 6),
                round(pitch_scale, 6), round(duration_scale, 6),
            ))
            return np.zeros(100, np.float32), None

    agent = EmbodiedAgent.__new__(EmbodiedAgent)
    agent.synth = FakeSynth()
    agent.temporal = False
    agent.sr = SR

    from spev_tpu.agents.events import VocalEventSynth
    from spev_tpu.agents.prosody import ProsodyManager, ProsodyPolicy

    class FakeEvents(VocalEventSynth):
        def get_event(self, name):
            trace.events.append(("event", name))
            return np.zeros(321, np.float32)

    agent.event_synth = FakeEvents()
    agent.policy = ProsodyPolicy()
    agent.manager = ProsodyManager()

    wav = agent.synthesize(text, emotion=emotion)
    return trace.events, wav


@pytest.mark.parametrize("emotion", ["neutral", "exhausted", "angry"])
def test_orchestration_trace_matches_reference(ref_embodied, emotion):
    text = "I am tired [sigh] but fine [breath] really"
    ref_trace, ref_wav = _drive_reference(ref_embodied, text, emotion)
    our_trace, our_wav = _drive_ours(text, emotion)
    assert ref_trace == our_trace
    # mixer: event(321) + 0.1s silence + speech(100), same totals both sides
    assert len(ref_wav) == len(our_wav)


def test_orchestration_silence_after_event(ref_embodied):
    ref_trace, ref_wav = _drive_reference(ref_embodied, "[sigh]", "neutral")
    our_trace, our_wav = _drive_ours("[sigh]", "neutral")
    assert ref_trace == our_trace == [("event", "sigh")]
    assert len(ref_wav) == len(our_wav) == 321 + int(SR * 0.1)
