"""Ground-truth-aligned (GTA) mels for vocoder fine-tuning.

The HiFi-GAN checkpoint the reference downloads is ``LJ_FT_T2_V3`` —
*fine-tuned on acoustic-model outputs* (reference
``PRODUCTION_SYSTEM_SUMMARY.md:214-218``): the vocoder learns to invert
the mels the acoustic model actually produces rather than ground-truth
mels, closing the acoustic→vocoder train/serve mismatch.  The reference
can only download the result of that workflow; this module runs it:
teacher-forced forward passes (target durations + all variance targets
from the feature cache), so each predicted mel aligns frame-for-frame
with its ground-truth waveform — ``spev-vocoder-train --gta_checkpoint``
then trains on (predicted mel, ground-truth audio) pairs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np
import jax

from spev_tpu.config import ModelConfig
from spev_tpu.models.fastspeech2 import apply_fastspeech2
from spev_tpu.text.vocab import Vocab, pick_bucket


def compute_gta_mels(
    checkpoint: str,
    ds,
    model_cfg: Optional[ModelConfig] = None,
    batch_size: int = 8,
    phoneme_buckets: Sequence[int] = (64, 128, 256),
    frame_buckets: Sequence[int] = (256, 512, 1024, 2048),
) -> Dict[int, np.ndarray]:
    """Teacher-forced predicted mels for every utterance of ``ds``.

    Returns {dataset index: (T, n_mels) float32} with T = the utterance's
    ground-truth mel frame count (durations are cache-rescaled to match,
    so sum(durs) == gt frames).  Utterances longer than the largest bucket
    are skipped (reported, not fatal).
    """
    from spev_tpu.data.batching import collate
    from spev_tpu.infer.synthesis import _load_any_checkpoint
    from spev_tpu.train.checkpoint import load_model_config

    params, vocab_list, _stats = _load_any_checkpoint(checkpoint)
    vocab = Vocab(vocab_list)
    if model_cfg is None:
        stored = load_model_config(checkpoint) if str(checkpoint).endswith(".spev") else {}
        base = ModelConfig(**stored) if stored else ModelConfig()
        model_cfg = dataclasses.replace(base, vocab_size=len(vocab))

    # group indices by (phoneme, frame) bucket so each compiled graph is
    # reused across the corpus (BucketBatcher's metadata fast path)
    lengths = getattr(ds, "lengths", None)
    groups: Dict[tuple, list] = {}
    skipped = []
    for i in range(len(ds)):
        if lengths is not None and i < len(lengths) and lengths[i] is not None:
            n, t = int(lengths[i][0]), int(lengths[i][1])
        else:
            u = ds.load_utterance(i)
            n, t = len(u["phs"]), int(u["mel"].shape[0])
        try:
            key = (pick_bucket(n, phoneme_buckets), pick_bucket(t, frame_buckets))
        except ValueError:
            skipped.append(i)
            continue
        groups.setdefault(key, []).append(i)
    if skipped:
        print(f"gta: {len(skipped)} utterances exceed the largest bucket — skipped")

    fwd_cache: Dict[tuple, callable] = {}

    def get_fwd(P: int, M: int):
        if (P, M) not in fwd_cache:
            cfg_pm = dataclasses.replace(model_cfg, max_phonemes=P, max_frames=M)

            def fwd(p, ids, lens, durs, pitch, energy, breath, rough, bright, nasal):
                out = apply_fastspeech2(
                    p, cfg_pm, ids, lens,
                    target_durations=durs, target_pitch=pitch,
                    target_energy=energy, target_breath=breath,
                    target_rough=rough, target_bright=bright,
                    target_nasal=nasal, deterministic=True,
                )
                return out["mel_pred"], out["mel_len"]

            fwd_cache[(P, M)] = jax.jit(fwd)
        return fwd_cache[(P, M)]

    mels: Dict[int, np.ndarray] = {}
    for (P, M), idxs in sorted(groups.items()):
        fwd = get_fwd(P, M)
        for start in range(0, len(idxs), batch_size):
            g = idxs[start : start + batch_size]
            pad = g + [g[0]] * (batch_size - len(g))  # static batch shape
            utts = [ds.load_utterance(i) for i in pad]
            b = collate(utts, vocab, P, M, model_cfg.n_mels)
            mel, mel_len = fwd(
                params, b["ids"], b["lens"], b["durs"], b["pitch"], b["energy"],
                b["breath"], b["rough"], b["bright"], b.get("nasal"),
            )
            mel = np.asarray(mel, np.float32)
            mel_len = np.asarray(mel_len)
            for row, i in enumerate(g):
                mels[i] = mel[row, : int(mel_len[row])]
    return mels
