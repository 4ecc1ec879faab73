"""End-to-end integration: synthetic corpus → dataset build → two-phase
training (duration-only warmup then full) → checkpointing → synthesis from
the trained checkpoint.  This is the framework's full-stack smoke test."""

import os

import numpy as np
import pytest
import jax

from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
from spev_tpu.data.batching import BucketBatcher, train_val_split
from spev_tpu.data.dataset import SpevDataset
from spev_tpu.diag.probes import mel_statistics
from spev_tpu.infer.synthesis import Synthesizer
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.trainer import Trainer
from tests.test_data import _make_corpus


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    cache = str(tmp_path_factory.mktemp("cache"))
    work = str(tmp_path_factory.mktemp("work"))
    _make_corpus(root, n=6, seconds=0.7)
    ds = SpevDataset(root, cache_dir=cache, g2p_backend="rules", stats_sample=6)
    vocab = Vocab(ds.vocab)

    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32,
                          n_mels=80, max_phonemes=64, max_frames=128),
        train=TrainConfig(batch_size=3, warmup_steps=5, epochs=3, warmup_epochs=1,
                          learning_rate=5e-4),
    )
    tr, va = train_val_split(len(ds), 0.2, seed=0)
    trainer = Trainer(cfg, vocab, ds.stats,
                      ckpt_dir=os.path.join(work, "ck"),
                      log_dir=os.path.join(work, "logs"))
    batcher = BucketBatcher(ds, vocab, batch_size=3,
                            phoneme_buckets=(64,), frame_buckets=(128,), indices=tr)
    val_batcher = BucketBatcher(ds, vocab, batch_size=3,
                                phoneme_buckets=(64,), frame_buckets=(128,), indices=va)
    history = []
    for epoch in range(cfg.train.epochs):
        m = trainer.train_epoch(batcher.epoch(epoch))
        history.append(m["train_loss"])
    val = trainer.validate(val_batcher.epoch(0))
    trainer.save("last")
    assert trainer.maybe_save_best(val)
    return trainer, history, val, cfg, os.path.join(work, "ck")


def test_training_progresses(trained):
    trainer, history, val, cfg, _ = trained
    assert len(history) == 3
    assert all(np.isfinite(h) for h in history)
    # epoch 0 is the duration-only warmup phase (different loss composition);
    # compare within the full-loss phase
    assert history[2] < history[1]
    assert np.isfinite(val)
    assert int(trainer.state.step) > 0
    assert trainer.nan_count == 0


def test_checkpoints_written(trained):
    *_, ckpt_dir = trained
    assert os.path.exists(os.path.join(ckpt_dir, "last.spev"))
    assert os.path.exists(os.path.join(ckpt_dir, "best.spev"))


def test_resume_from_checkpoint(trained):
    trainer, _, _, cfg, ckpt_dir = trained
    fresh = Trainer(cfg, trainer.vocab, trainer.stats,
                    ckpt_dir=ckpt_dir, log_dir=ckpt_dir)
    fresh.restore(os.path.join(ckpt_dir, "last.spev"))
    assert int(fresh.state.step) == int(trainer.state.step)
    assert fresh.epoch == trainer.epoch


def test_synthesis_from_trained_checkpoint(trained):
    trainer, _, _, cfg, ckpt_dir = trained
    synth = Synthesizer(os.path.join(ckpt_dir, "best.spev"),
                        model_cfg=cfg.model, g2p_backend="rules",
                        phoneme_buckets=(64,), frame_buckets=(128,))
    # teacher the duration constant upward if the short training left it 0
    wav, mel = synth.synthesize("hello there", duration_scale=3.0)
    assert mel.shape[0] >= 1 and np.isfinite(wav).all()
    stats = mel_statistics(mel)
    assert -10.0 <= stats["mean"] <= 2.0
