"""Bucketed batching: utterances → static-shape padded numpy batches.

Replaces the reference's DataLoader + pad_sequence collate
(``spev_real_metrics.py:449-462``) with deterministic length-bucketed
batching so every batch compiles to one of a small set of static shapes
(phoneme bucket × frame bucket).  Batches carry everything the trainer's
loss needs, including per-sample target frame counts (``mel_lens``) for the
reference's batch-max mel-loss denominator.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from spev_tpu.text.vocab import Vocab, pick_bucket
from spev_tpu.errors import UserError

# shared loader pool for per-batch utterance reads: uncompressed npz loads
# are IO + GIL-releasing memcpy, so a few threads cut batch staging time
# ~linearly.  One process-wide pool (lazily created) — per-batcher pools
# would leak threads across the test suite's many instances.
_POOL: Optional[ThreadPoolExecutor] = None


def _load_pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(max_workers=4, thread_name_prefix="spev-load")
    return _POOL


def collate(
    utterances: List[dict],
    vocab: Vocab,
    max_phonemes: int,
    max_frames: int,
    n_mels: int = 80,
) -> Dict[str, np.ndarray]:
    """Pad a list of cached utterances to static buckets.

    Matches the reference's __getitem__/collate semantics
    (``spev_real_metrics.py:433-462``): ids via ``.get(p, 0)`` fallback,
    ``log_durs = log(clamp(durs, min=1) + 1)``, zero padding everywhere.
    """
    B = len(utterances)
    out = {
        "ids": np.zeros((B, max_phonemes), np.int32),
        "lens": np.zeros((B,), np.int32),
        "durs": np.zeros((B, max_phonemes), np.float32),
        "log_durs": np.zeros((B, max_phonemes), np.float32),
        "mel": np.zeros((B, max_frames, n_mels), np.float32),
        "mel_lens": np.zeros((B,), np.int32),
        "pitch": np.zeros((B, max_phonemes), np.float32),
        "energy": np.zeros((B, max_phonemes), np.float32),
        "breath": np.zeros((B, max_phonemes), np.float32),
        "rough": np.zeros((B, max_phonemes), np.float32),
        "bright": np.zeros((B, max_phonemes), np.float32),
    }
    if all("nasal" in u for u in utterances):
        # learned nasality target (caches built before the channel existed
        # simply omit the key and train without the nasal loss term)
        out["nasal"] = np.zeros((B, max_phonemes), np.float32)
    if any("speaker_id" in u for u in utterances):
        out["speaker_ids"] = np.zeros((B,), np.int32)
    if all("vad" in u for u in utterances):
        # per-utterance (3,) emotion-VAD target (data/emotion.py); caches
        # built without emotion labels simply omit the key
        out["vad"] = np.zeros((B, 3), np.float32)
    for b, u in enumerate(utterances):
        if "speaker_ids" in out and "speaker_id" in u:
            out["speaker_ids"][b] = int(u["speaker_id"])
        if "vad" in out:
            out["vad"][b] = u["vad"]
        phs = [str(p) for p in u["phs"]]
        n = len(phs)
        t = int(u["mel"].shape[0])
        if n > max_phonemes or t > max_frames:
            raise UserError(f"utterance exceeds bucket: {n} ph / {t} frames")
        out["ids"][b, :n] = vocab.encode(phs, fallback=0)
        out["lens"][b] = n
        durs = np.asarray(u["durs"], np.float32)
        out["durs"][b, :n] = durs
        out["log_durs"][b, :n] = np.log(np.maximum(durs, 1.0) + 1.0)
        out["mel"][b, :t] = u["mel"]
        out["mel_lens"][b] = t
        for k in ("pitch", "energy", "breath", "rough", "bright"):
            out[k][b, :n] = u[k]
        if "nasal" in out:
            out["nasal"][b, :n] = u["nasal"]
    return out


class BucketBatcher:
    """Deterministic shuffled batching grouped by length buckets."""

    def __init__(
        self,
        dataset,
        vocab: Vocab,
        batch_size: int = 16,
        phoneme_buckets: Sequence[int] = (64, 128, 256),
        frame_buckets: Sequence[int] = (256, 512, 1024, 2048),
        n_mels: int = 80,
        indices: Optional[Sequence[int]] = None,
        drop_remainder: bool = False,
        seed: int = 0,
    ):
        self.ds = dataset
        self.vocab = vocab
        self.batch_size = batch_size
        self.phoneme_buckets = tuple(sorted(phoneme_buckets))
        self.frame_buckets = tuple(sorted(frame_buckets))
        self.n_mels = n_mels
        self.indices = list(indices) if indices is not None else list(range(len(dataset)))
        self.drop_remainder = drop_remainder
        self.seed = seed
        # precompute bucket keys once — from the cache metadata's
        # per-utterance lengths when present (one json read instead of one
        # full npz load per utterance; 13k loads on LJSpeech), falling back
        # to loading for caches built before the field existed
        lengths = getattr(dataset, "lengths", None)
        self._keys = {}
        for i in self.indices:
            if lengths is not None and i < len(lengths) and lengths[i] is not None:
                n, t = int(lengths[i][0]), int(lengths[i][1])
            else:
                u = self.ds.load_utterance(i)
                n, t = len(u["phs"]), int(u["mel"].shape[0])
            try:
                self._keys[i] = (
                    pick_bucket(n, self.phoneme_buckets),
                    pick_bucket(t, self.frame_buckets),
                )
            except ValueError:
                self._keys[i] = None  # over-long: dropped

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        rng = random.Random(self.seed + epoch)
        order = [i for i in self.indices if self._keys[i] is not None]
        rng.shuffle(order)
        groups: Dict[tuple, list] = {}
        for i in order:
            groups.setdefault(self._keys[i], []).append(i)
            g = groups[self._keys[i]]
            if len(g) == self.batch_size:
                yield self._emit(g)
                groups[self._keys[i]] = []
        for key, g in groups.items():
            if g and not self.drop_remainder:
                # pad the final partial batch by repeating samples so shapes
                # stay static (repeats contribute slightly overweighted
                # gradient; negligible and deterministic)
                while len(g) < self.batch_size:
                    g.append(g[len(g) % max(1, len(g))])
                yield self._emit(g)

    def _emit(self, idxs: list) -> Dict[str, np.ndarray]:
        P, M = self._keys[idxs[0]]
        utts = list(_load_pool().map(self.ds.load_utterance, idxs))
        return collate(utts, self.vocab, P, M, self.n_mels)


def train_val_split(n: int, val_fraction: float = 0.05, seed: int = 0):
    """Reference 95/5 random split (``spev_real_metrics.py:486-488``)."""
    idx = list(range(n))
    random.Random(seed).shuffle(idx)
    val = max(1, int(n * val_fraction)) if n > 1 else 0
    return idx[val:], idx[:val]
