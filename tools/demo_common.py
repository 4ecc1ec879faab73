"""Shared setup for the quality-evidence tools.

`tools/quality_trajectory.py` (dashboard trajectory) and
`tools/make_demo.py` (committed audio artifacts) must train EXACTLY the
same configuration — the docs/QUALITY.md bounds are calibrated to it —
so the corpus/model/trainer construction lives here once.

The caller must configure the JAX platform (8 virtual CPU devices, cpu
backend) BEFORE importing this module; both tools do so at the top of
their files.
"""

import os
import tempfile
from types import SimpleNamespace

from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
from spev_tpu.data.batching import BucketBatcher, train_val_split
from spev_tpu.data.dataset import SpevDataset
from spev_tpu.data.synthetic import generate_formant_corpus
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.trainer import Trainer


def build_quality_setup(epochs: int, lr_mult: float = 1.0) -> SimpleNamespace:
    """The docs/QUALITY.md training setup: 120-utterance formant corpus,
    hidden-96 model with vp_output_norm=False, 90/10 split, bucketed
    batchers.  Returns everything the tools need.

    ``lr_mult`` perturbs the learning rate (gate-calibration adversarial
    arm, tools/gate_calibration.py); 1.0 is the calibrated setup."""
    work = tempfile.mkdtemp(prefix="spev_quality_")
    root, cache = os.path.join(work, "corpus"), os.path.join(work, "cache")
    tg_dir = generate_formant_corpus(root, n_utterances=120, seed=0)
    ds = SpevDataset(root, textgrid_dir=tg_dir, cache_dir=cache,
                     g2p_backend="rules", stats_sample=60)
    vocab = Vocab(ds.vocab)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=96, hidden_dim=96,
                          n_mels=80, max_phonemes=32, max_frames=256,
                          vp_output_norm=False),
        train=TrainConfig(batch_size=16, warmup_steps=50, epochs=epochs,
                          warmup_epochs=2, learning_rate=2e-3 * lr_mult),
    )
    tr_idx, va_idx = train_val_split(len(ds), 0.1, seed=0)
    trainer = Trainer(cfg, vocab, ds.stats, ckpt_dir=os.path.join(work, "ck"),
                      log_dir=os.path.join(work, "logs"))
    bt = BucketBatcher(ds, vocab, batch_size=16, phoneme_buckets=(32,),
                       frame_buckets=(256,), indices=tr_idx)
    bv = BucketBatcher(ds, vocab, batch_size=16, phoneme_buckets=(32,),
                       frame_buckets=(256,), indices=va_idx)
    return SimpleNamespace(work=work, corpus_root=root, cache=cache, ds=ds,
                           vocab=vocab, cfg=cfg, trainer=trainer,
                           bt=bt, bv=bv, va_idx=va_idx)
