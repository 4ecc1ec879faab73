"""spev_tpu.infer — synthesis API: jitted text→mel→waveform serving path.

Lazy submodules: `streaming` (chunked vocoding + clause-level incremental
text synthesis) and `batching` (request coalescing for concurrent
serving) import on first attribute access.
"""

from spev_tpu.infer.vocoder import Vocoder
from spev_tpu.infer.synthesis import Synthesizer, infer_tts

__all__ = ["Vocoder", "Synthesizer", "infer_tts", "CoalescingBatcher"]


def __getattr__(name):
    if name == "CoalescingBatcher":
        from spev_tpu.infer.batching import CoalescingBatcher

        return CoalescingBatcher
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
