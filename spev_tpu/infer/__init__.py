"""spev_tpu.infer — synthesis API: jitted text→mel→waveform serving path."""

from spev_tpu.infer.vocoder import Vocoder
from spev_tpu.infer.synthesis import Synthesizer, infer_tts

__all__ = ["Vocoder", "Synthesizer", "infer_tts"]
