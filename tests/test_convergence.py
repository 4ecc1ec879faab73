"""Training-quality convergence proof on the synthetic formant corpus.

The reference documents quality targets it never measures
(``/root/reference/PRODUCTION_SYSTEM_SUMMARY.md:227-231``: MCD < 6.0 dB,
duration error < 10%).  This environment has no network (no LJSpeech, no
upstream vocoder), so this test is the strongest offline proof: train the
FULL pipeline (formant corpus → TextGrid alignments → dataset build with
pyin/mel target extraction → bucketed batches → jitted train steps →
per-epoch quality dashboard) and assert the dashboard metrics MOVE TO
TARGET, not merely that loss falls:

- duration error reaches the reference's < 10% target (requires
  ``vp_output_norm=False`` — the reference's LayerNorm(1) quirk makes the
  duration predictor a learned *constant*, which can never track per-phone
  durations; the quirk-faithful mode stays the parity default, this test
  runs the documented "fixed" mode);
- teacher-forced val MCD drops by >60% from its first-epoch value and
  under the corpus-calibrated bound (see docs/QUALITY.md for the full
  150-epoch trajectory this bound was calibrated from);
- both improve monotonically in the aggregate (first-third vs last-third
  medians), i.e. the trend is convergence, not noise.

Runtime: ~8-9 min on an 8-vCPU host (slow-marked).
"""

import os

import numpy as np
import pytest

from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
from spev_tpu.data.batching import BucketBatcher, train_val_split
from spev_tpu.data.dataset import SpevDataset
from spev_tpu.data.synthetic import generate_formant_corpus
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.trainer import Trainer

N_UTTS = 120
EPOCHS = 45


@pytest.fixture(scope="module")
def dashboard(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fcorpus"))
    cache = str(tmp_path_factory.mktemp("fcache"))
    work = str(tmp_path_factory.mktemp("fwork"))
    tg_dir = generate_formant_corpus(root, n_utterances=N_UTTS, seed=0)
    ds = SpevDataset(root, textgrid_dir=tg_dir, cache_dir=cache,
                     g2p_backend="rules", stats_sample=60)
    vocab = Vocab(ds.vocab)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=96, hidden_dim=96,
                          n_mels=80, max_phonemes=32, max_frames=256,
                          vp_output_norm=False),
        train=TrainConfig(batch_size=16, warmup_steps=50, epochs=EPOCHS,
                          warmup_epochs=2, learning_rate=2e-3),
    )
    tr, va = train_val_split(len(ds), 0.1, seed=0)
    trainer = Trainer(cfg, vocab, ds.stats, ckpt_dir=os.path.join(work, "ck"),
                      log_dir=os.path.join(work, "logs"))
    bt = BucketBatcher(ds, vocab, batch_size=16, phoneme_buckets=(32,),
                       frame_buckets=(256,), indices=tr)
    bv = BucketBatcher(ds, vocab, batch_size=16, phoneme_buckets=(32,),
                       frame_buckets=(256,), indices=va)
    hist = []
    for epoch in range(cfg.train.epochs):
        m = trainer.train_epoch(bt.epoch(epoch))
        val = trainer.validate(bv.epoch(0))
        q = trainer.last_quality
        hist.append({
            "loss": float(m["train_loss"]), "val": float(val),
            "mcd": float(q.get("val_mcd_db", np.nan)),
            "durerr": float(q.get("val_dur_err_pct", np.nan)),
        })
    from tools.gate_calibration import freerun_frame_errors

    hist_ns = list(hist)
    errors = freerun_frame_errors(trainer, ds, vocab, cfg, va)
    return {"hist": hist_ns, "freerun": errors}


@pytest.fixture(scope="module")
def freerun_errors(dashboard):
    return dashboard["freerun"]


@pytest.mark.slow
def test_duration_error_reaches_reference_target(dashboard):
    dashboard = dashboard["hist"]
    final = np.median([h["durerr"] for h in dashboard[-3:]])
    assert np.isfinite(final)
    assert final < 10.0, [h["durerr"] for h in dashboard]


@pytest.mark.slow
def test_mcd_converges_toward_target(dashboard):
    dashboard = dashboard["hist"]
    mcds = np.array([h["mcd"] for h in dashboard])
    assert np.all(np.isfinite(mcds))
    final = np.median(mcds[-5:])
    # calibrated bounds with <=1.5x headroom (VERDICT r3 #5): under the
    # `mixed` training default this exact setup measures final-5 median
    # MCD 26.4 dB = 0.192x epoch 0 (tools/gate_calibration.py, bit-
    # deterministic for a fixed seed in the CI env; docs/QUALITY.md has
    # the 150-epoch trajectory).  The old 60-dB bound could not catch a
    # 2x regression; these fail a deliberate 10% LR perturbation
    # (docs/QUALITY.md gate-validation table).
    assert final < 0.29 * mcds[0], (mcds[0], final, list(mcds))
    assert final < 40.0, (final, list(mcds))


@pytest.mark.slow
def test_freerun_frame_count_generalizes(dashboard, freerun_errors):
    """FREE-RUNNING inference (predicted durations, no teacher forcing) on
    every held-out utterance: the predicted frame count must track the
    ground truth — the duration predictor's generalization, which the
    teacher-forced dashboard cannot see (the 150-epoch demo measured
    0.8-2.7%; the calibrated 45-epoch bound carries <=1.5x headroom)."""
    med = float(np.median(freerun_errors))
    assert np.isfinite(med)
    assert med < 9.0, freerun_errors


@pytest.mark.slow
def test_dashboard_trend_is_convergent(dashboard):
    dashboard = dashboard["hist"]
    k = len(dashboard) // 3
    for key in ("mcd", "durerr", "val"):
        first = np.median([h[key] for h in dashboard[:k]])
        last = np.median([h[key] for h in dashboard[-k:]])
        assert last < first, (key, first, last)
