"""In-training synthesis sanity probes.

The reference runs three fixed sentences every 10 epochs and warns on
flatline (std < 0.1) or out-of-range mean (outside [-8, 1])
(``spev_real_metrics.py:656-707``) — cheap integration tests kept here as a
first-class diagnostic.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

TEST_TEXTS = [
    "Hello world, this is a test.",
    "The quick brown fox jumps over the lazy dog.",
    "Testing speech synthesis quality.",
]


def mel_statistics(mel: np.ndarray) -> dict:
    stats = {
        "mean": float(np.mean(mel)),
        "std": float(np.std(mel)),
        "min": float(np.min(mel)),
        "max": float(np.max(mel)),
    }
    stats["flatline_warning"] = stats["std"] < 0.1
    stats["range_warning"] = stats["mean"] > 1.0 or stats["mean"] < -8.0
    return stats


def test_inference_probe(trainer, log_dir: str, epoch: int, texts: Optional[List[str]] = None):
    """Run the probe sentences through the current params; print stats, save
    mel PNGs, warn on suspicious output."""
    from spev_tpu.infer.synthesis import Synthesizer
    from spev_tpu.diag.plots import save_mel_plot

    texts = texts or TEST_TEXTS
    vocab_syms = trainer.vocab.symbols if hasattr(trainer.vocab, "symbols") else trainer.vocab
    synth = Synthesizer(
        (jnp_tree(trainer.state.params), list(vocab_syms), trainer.stats),
        hifigan_dir=None,
        model_cfg=trainer.cfg.model,
    )
    results = []
    for idx, text in enumerate(texts):
        try:
            phones = synth.g2p.phonemes(text)
            ids = synth.phonemes_to_ids(phones)
            # mel-only probe (no vocoder): run the acoustic graph
            from spev_tpu.models.fastspeech2 import apply_fastspeech2
            from spev_tpu.text.vocab import pad_to_bucket
            import dataclasses

            P = synth.phoneme_buckets[-1]
            cfg = dataclasses.replace(synth.model_cfg, max_phonemes=P)
            out = apply_fastspeech2(
                synth.params, cfg,
                jnp.asarray(pad_to_bucket(ids, P, synth.vocab.pad_id)[None]),
                jnp.asarray([len(ids)], jnp.int32),
            )
            L = int(out["mel_len"][0])
            mel = np.asarray(out["mel_pred"])[0, :L]
            stats = mel_statistics(mel)
            results.append(stats)
            print(
                f"   Probe {idx + 1}: mean={stats['mean']:.2f}, std={stats['std']:.2f}, "
                f"min={stats['min']:.2f}, max={stats['max']:.2f}"
            )
            if stats["flatline_warning"]:
                print("   WARNING: very low variance - possible silence/flatline")
            if stats["range_warning"]:
                print("   WARNING: unusual mean value")
            os.makedirs(log_dir, exist_ok=True)
            save_mel_plot(
                mel.T,
                os.path.join(log_dir, f"test_e{epoch + 1}_t{idx + 1}.png"),
                title=f"Probe epoch {epoch + 1} text {idx + 1}",
            )
        except Exception as e:  # probe failures must not kill training
            print(f"   Probe {idx + 1} failed: {e}")
    return results


def jnp_tree(tree):
    import jax

    return jax.tree.map(jnp.asarray, tree)
