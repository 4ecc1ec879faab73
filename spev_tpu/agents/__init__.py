"""spev_tpu.agents — the embodied coordinator layer ("spinal cord").

Rebuilds the reference's two coordinator generations (SURVEY.md C10-C16):
procedural vocal-event synthesis (sighs/breaths/grunts), the static
emotion→knob prosody policy, the temporal curve engine (emotion→per-phoneme
control trajectories), the learned acoustic-policy model architecture, and
the embodied agents that orchestrate events + speech into one audio stream.
"""

from spev_tpu.agents.events import VocalEventSynth
from spev_tpu.agents.prosody import ProsodyPolicy, CurveGenerator, ProsodyManager
from spev_tpu.agents.embodied import EmbodiedAgent

__all__ = [
    "VocalEventSynth",
    "ProsodyPolicy",
    "CurveGenerator",
    "ProsodyManager",
    "EmbodiedAgent",
]
