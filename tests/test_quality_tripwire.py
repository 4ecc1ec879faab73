"""Quick-tier quality tripwire (VERDICT r4 #6).

The calibrated convergence gate lives in the slow tier (~12 min), so the
quick tier a builder actually runs caught no training-quality regression
at all.  This probe is the cheap tripwire: the REAL pipeline end to end —
formant corpus → SpevDataset (pyin/mel extraction) → bucketed batches →
jitted masked train steps — at toy scale, asserting that a few epochs of
optimization actually move the training signals:

- train loss falls by >= 15% from the first epoch (broken numerics —
  wrong masking, NaN-poisoned grads, mis-scaled targets — leave it flat
  or NaN; measured healthy drop in the CI env: 34%);
- teacher-forced duration error improves and ends < 60% (random-init
  sits near 100%; the calibrated slow gate asserts the full < 10%
  target).

Bounds carry ~2x headroom over the measured trajectory so they trip on
breakage, not on numeric drift.  Runtime: ~85 s user time on the 8-vCPU
CI env (test cache warm).
"""

import os
import tempfile

import numpy as np

from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
from spev_tpu.data.batching import BucketBatcher
from spev_tpu.data.dataset import SpevDataset
from spev_tpu.data.synthetic import generate_formant_corpus
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.trainer import Trainer


def test_training_moves_quality_signals():
    with tempfile.TemporaryDirectory() as work:
        root = os.path.join(work, "corpus")
        tg = generate_formant_corpus(root, n_utterances=16, seed=0,
                                     syllable_range=(2, 4))
        ds = SpevDataset(root, textgrid_dir=tg,
                         cache_dir=os.path.join(work, "cache"),
                         g2p_backend="rules", stats_sample=16)
        vocab = Vocab(ds.vocab)
        cfg = SpevConfig(
            model=ModelConfig(vocab_size=len(vocab), embed_dim=32,
                              hidden_dim=32, n_mels=80, max_phonemes=32,
                              max_frames=256, vp_output_norm=False),
            train=TrainConfig(batch_size=8, warmup_steps=4, epochs=10,
                              warmup_epochs=0, learning_rate=2e-3),
        )
        trainer = Trainer(cfg, vocab, ds.stats,
                          ckpt_dir=os.path.join(work, "ck"),
                          log_dir=os.path.join(work, "logs"))
        bt = BucketBatcher(ds, vocab, batch_size=8, phoneme_buckets=(32,),
                           frame_buckets=(256,))
        losses, dur_errs = [], []
        for epoch in range(cfg.train.epochs):
            m = trainer.train_epoch(bt.epoch(epoch))
            trainer.validate(bt.epoch(0))
            losses.append(float(m["train_loss"]))
            q = trainer.last_quality
            if "val_dur_err_pct" in q:
                dur_errs.append(float(q["val_dur_err_pct"]))

        assert np.isfinite(losses).all(), losses
        drop = (losses[0] - losses[-1]) / losses[0]
        assert drop >= 0.15, (
            f"train loss fell only {drop:.0%} over {len(losses)} epochs "
            f"({losses[0]:.3f} -> {losses[-1]:.3f}): training numerics "
            f"regression")
        assert dur_errs, "duration-error signal missing from val quality"
        assert dur_errs[-1] < 60.0, (
            f"duration error {dur_errs[-1]:.0f}% after {len(losses)} epochs "
            f"(random-init is ~100%): duration pathway regression")
        assert dur_errs[-1] < dur_errs[0], (dur_errs[0], dur_errs[-1])
