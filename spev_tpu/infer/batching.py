"""Request coalescing for the HTTP serving endpoint.

The reference serves one request at a time (``infer_tts`` per CLI call).
On a TPU the fused serving graph is throughput-optimal at batch ≥ 8
(docs/BENCH.md: batch 16 runs 1785× real-time, B=1 runs ~340×), so a
production endpoint should coalesce concurrent requests into one device
batch.  `CoalescingBatcher` is that layer:

- callers block in `submit(text, **controls)`;
- a single worker thread drains the queue, waiting up to ``window_ms``
  after the first request to let a batch form (bounded by ``max_batch``);
- the batch runs through `Synthesizer.synthesize_many` — per-request
  scales/voice-quality vectors keep mixed-control workloads in ONE
  batch, length-sorted grouping and adaptive frame buckets come for
  free;
- results (or the per-batch error) are handed back to each waiter.

The worker owns the *batched* serving graph; streaming and advanced
requests dispatch concurrently from their own handler threads.  That is
safe because the Synthesizer locks graph get-or-create internally (one
compiled callable per bucket) and JAX dispatch is thread-safe — the
device executes enqueued graphs in order.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np

_SCALE_KEYS = ("duration_scale", "pitch_scale", "energy_scale")
_QUALITY_KEYS = ("breathiness", "roughness", "brightness")
_DEFAULTS = {"duration_scale": 1.0, "pitch_scale": 1.0, "energy_scale": 1.0,
             "breathiness": 0.1, "roughness": 0.05, "brightness": 0.0}


class _Pending:
    __slots__ = ("text", "controls", "event", "result", "error")

    def __init__(self, text: str, controls: dict):
        self.text = text
        self.controls = controls
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None


class CoalescingBatcher:
    """Batch concurrent synthesis requests onto one device graph.

    Args:
      synth: a `Synthesizer`.
      max_batch: largest coalesced batch (device batch size).
      window_ms: how long the worker waits after the first queued request
        for more to arrive.  0 still coalesces whatever is already queued
        (no artificial latency), >0 trades that much first-request
        latency for better batch formation under load.
    """

    def __init__(self, synth, max_batch: int = 16, window_ms: float = 5.0):
        self.synth = synth
        self.max_batch = int(max_batch)
        self.window_s = float(window_ms) / 1000.0
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="spev-batcher")
        self._worker.start()

    def submit(self, text: str, timeout: Optional[float] = None, **controls):
        """Block until the request's (waveform, mel) is ready."""
        item = _Pending(text, controls)
        self._q.put(item)
        if not item.event.wait(timeout):
            raise TimeoutError("synthesis request timed out")
        if item.error is not None:
            raise item.error
        return item.result

    # -- worker -------------------------------------------------------------

    def _collect(self) -> list:
        import time

        first = self._q.get()  # block for the first request
        batch = [first]
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            try:
                batch.append(self._q.get(timeout=max(remaining, 0.0)))
            except queue.Empty:
                break
        return batch

    def _run_batch(self, batch: list) -> None:
        # pad to the next power of two (cap max_batch): bounds the distinct
        # device batch sizes to log2(max_batch)+1 XLA compilations instead
        # of one per concurrency level.  The pad template is the SHORTEST
        # request (cheapest filler rows); if even that is over the largest
        # phoneme bucket padding would multiply the serial span-chunking
        # path, so skip it.  The over-bucket test must count PHONEMES, not
        # characters: cmudict/rules tokens run ~3 chars each (a 300-char
        # in-bucket text would wrongly skip padding and compile a fresh
        # odd-sized graph), and digit expansion goes the other way.  One
        # host-side G2P call on the shortest text is microseconds.
        n = len(batch)
        tmpl = min(range(n), key=lambda j: len(batch[j].text))
        padded = 1
        while padded < n:
            padded *= 2
        padded = min(padded, self.max_batch)
        try:
            tmpl_phonemes = len(self.synth.g2p.phonemes(batch[tmpl].text))
        except Exception:
            tmpl_phonemes = len(batch[tmpl].text)  # G2P failure: retry path
        if tmpl_phonemes > self.synth.phoneme_buckets[-1]:
            padded = n
        texts = [p.text for p in batch] + [batch[tmpl].text] * (padded - n)
        merged: dict = {}
        for key in _SCALE_KEYS + _QUALITY_KEYS:
            vals = [p.controls.get(key, _DEFAULTS[key]) for p in batch]
            vals += [vals[tmpl]] * (padded - n)
            merged[key] = np.asarray(vals, np.float32)
        results = self.synth.synthesize_many(
            texts, batch_size=self.max_batch, **merged
        )
        for p, r in zip(batch, results[:n]):
            p.result = r

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            try:
                self._run_batch(batch)
            except BaseException:
                # isolate the failure: retry each request alone so one bad
                # request (e.g. a G2P failure) doesn't 500 its batchmates
                for p in batch:
                    try:
                        self._run_batch([p])
                    except BaseException as e:
                        p.error = e
            finally:
                for p in batch:
                    p.event.set()
