"""Phoneme vocabulary with the reference's conventions.

The reference builds its vocab as ``sorted(set(marks) | {'<PAD>', '<UNK>',
'<SIL>'})`` (``spev_real_metrics.py:328,428``) — note the specials are NOT
pinned to fixed indices; ``'<PAD>'`` happens to sort first (index 0, the
embedding padding_idx) because ``'<'`` precedes alphanumerics.  Lookup
fallback is inconsistent in the reference (``.get(p, 0)`` in the dataset
``:438`` vs ``.get(p, 1)`` in inference ``:670,754``); we expose the
fallback explicitly and default each call site to its reference value.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np

from spev_tpu.errors import UserError

PAD = "<PAD>"
UNK = "<UNK>"
SIL = "<SIL>"
SPECIALS = (PAD, UNK, SIL)


class Vocab:
    def __init__(self, symbols: Sequence[str]):
        """symbols: the full sorted vocab list (as stored in checkpoints)."""
        self.symbols: List[str] = list(symbols)
        self._index = {s: i for i, s in enumerate(self.symbols)}

    @staticmethod
    def build(marks: Iterable[str]) -> "Vocab":
        """Reference construction: sorted union with the three specials."""
        return Vocab(sorted(set(marks) | set(SPECIALS)))

    def __len__(self) -> int:
        return len(self.symbols)

    def __contains__(self, s: str) -> bool:
        return s in self._index

    @property
    def pad_id(self) -> int:
        return self._index.get(PAD, 0)

    @property
    def sil_id(self) -> int:
        return self._index.get(SIL, 0)

    def encode(self, phones: Sequence[str], fallback: int = 1) -> np.ndarray:
        """Phoneme marks → int32 IDs.  fallback=1 matches the reference's
        inference path (``spev_real_metrics.py:754``); pass 0 for the
        dataset path (``:438``)."""
        return np.asarray([self._index.get(p, fallback) for p in phones], dtype=np.int32)

    def decode(self, ids: Sequence[int]) -> List[str]:
        return [self.symbols[int(i)] for i in ids]


def pad_to_bucket(ids: np.ndarray, bucket: int, pad_id: int = 0) -> np.ndarray:
    """Right-pad a 1-D id array to the static phoneme bucket."""
    if len(ids) > bucket:
        raise UserError(f"utterance has {len(ids)} phonemes > bucket {bucket}")
    out = np.full((bucket,), pad_id, dtype=np.int32)
    out[: len(ids)] = ids
    return out


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket ≥ n (for compile-count-bounded bucketing)."""
    for b in sorted(buckets):
        if n <= b:
            return b
    raise UserError(f"length {n} exceeds largest bucket {max(buckets)}")
