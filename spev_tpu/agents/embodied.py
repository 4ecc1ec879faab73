"""Embodied agents: the coordinator that blends events and speech.

Rebuilds both reference agents on top of the compiled `Synthesizer`:

- static-knob agent (``spev_embodied_core.py:176-255``): regex-split on
  ``[event]`` tags; events → procedural DSP + 0.1 s silence; speech →
  constant control tensors from the emotion knobs; concatenation mixer;
- temporal agent (``spev_temporal_policy.py:174-252``): identical
  orchestration but per-phoneme control *curves* sampled from the
  ProsodyManager, with the reference's pitch/speed scalars.

One agent class serves both modes (``temporal=`` flag), since they differ
only in how controls are produced.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

from spev_tpu.agents.events import VocalEventSynth
from spev_tpu.agents.prosody import ProsodyManager, ProsodyPolicy
from spev_tpu.infer.synthesis import Synthesizer

_EVENT_RE = re.compile(r"(\[.*?\])")


class EmbodiedAgent:
    def __init__(
        self,
        checkpoint: str | tuple,
        hifigan_dir: Optional[str] = None,
        temporal: bool = False,
        synthesizer: Optional[Synthesizer] = None,
        sr: int = 22050,
    ):
        self.synth = synthesizer or Synthesizer(checkpoint, hifigan_dir=hifigan_dir)
        self.temporal = temporal
        self.event_synth = VocalEventSynth(sr=sr)
        self.policy = ProsodyPolicy()
        self.manager = ProsodyManager()
        self.sr = sr

    def _speech_segment(self, text: str, emotion: str) -> np.ndarray:
        phones = self.synth.g2p.phonemes(text)
        n = len(phones)
        ids = self.synth.phonemes_to_ids(phones)
        if self.temporal:
            # curves are sampled over the whole segment; over-bucket
            # segments are span-chunked inside synthesize_ids with the
            # trajectory sliced consistently
            curves = self.manager.get_curves(emotion, n)
            breath = np.asarray(curves["breath"], np.float32)
            rough = np.asarray(curves["rough"], np.float32)
            bright = np.asarray(curves["bright"], np.float32)
            pitch_scale = float(curves["pitch_scale"])
            duration_scale = float(curves["speed_scale"])
        else:
            knobs = self.policy.get_knobs(emotion)
            breath = np.full((n,), knobs["breathiness"], np.float32)
            rough = np.full((n,), knobs["roughness"], np.float32)
            bright = np.full((n,), knobs["brightness"], np.float32)
            pitch_scale = float(knobs["pitch_scale"])
            duration_scale = float(knobs["duration_scale"])

        wav, _ = self.synth.synthesize_ids(
            ids,
            breath=breath,
            rough=rough,
            bright=bright,
            pitch_scale=pitch_scale,
            duration_scale=duration_scale,
        )
        return np.asarray(wav, np.float32)

    def synthesize(self, text_input: str, emotion: str = "neutral") -> np.ndarray:
        """Text with ``[event]`` tags → one audio stream (concatenation
        mixer, reference ``:254``)."""
        tokens = [t.strip() for t in _EVENT_RE.split(text_input) if t.strip()]
        segments = []
        for token in tokens:
            if token.startswith("[") and token.endswith("]"):
                name = token[1:-1].lower()
                if self.temporal:
                    segments.append(self.event_synth.generate_simple(name))
                else:
                    segments.append(self.event_synth.get_event(name))
                segments.append(np.zeros(int(self.sr * 0.1), np.float32))
            else:
                segments.append(np.asarray(self._speech_segment(token, emotion), np.float32))
        if not segments:
            return np.zeros(100, np.float32)
        return np.concatenate(segments)
