"""GTA (ground-truth-aligned) vocoder fine-tuning — the upstream LJ_FT
workflow (reference ``PRODUCTION_SYSTEM_SUMMARY.md:214-218``: the
downloaded vocoder was fine-tuned on acoustic-model outputs).  Covers
``spev_tpu.infer.gta.compute_gta_mels`` and the
``spev-vocoder-train --gta_checkpoint`` surface."""

import os

import numpy as np
import pytest

from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
from spev_tpu.data.dataset import SpevDataset
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.trainer import Trainer
from tests.test_data import _make_corpus


@pytest.fixture(scope="module")
def corpus_ckpt(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    cache = str(tmp_path_factory.mktemp("cache"))
    work = str(tmp_path_factory.mktemp("work"))
    _make_corpus(root, n=4, seconds=0.7)
    ds = SpevDataset(root, cache_dir=cache, g2p_backend="rules", stats_sample=4)
    vocab = Vocab(ds.vocab)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32,
                          n_mels=80, max_phonemes=64, max_frames=128),
        train=TrainConfig(batch_size=2, warmup_steps=5, epochs=1),
    )
    trainer = Trainer(cfg, vocab, ds.stats,
                      ckpt_dir=os.path.join(work, "ck"),
                      log_dir=os.path.join(work, "logs"))
    ckpt = trainer.save("gta_test")
    return root, cache, ds, cfg, ckpt


def test_gta_mels_align_with_ground_truth(corpus_ckpt):
    """Every utterance gets a teacher-forced mel whose frame count equals
    the ground-truth mel's (durations are cache-rescaled to match), in the
    model's mel domain."""
    from spev_tpu.infer.gta import compute_gta_mels

    root, cache, ds, cfg, ckpt = corpus_ckpt
    mels = compute_gta_mels(ckpt, ds, batch_size=3,
                            phoneme_buckets=(64,), frame_buckets=(128,))
    assert set(mels) == set(range(len(ds)))
    for i in range(len(ds)):
        gt = ds.load_utterance(i)["mel"]
        assert mels[i].shape == gt.shape  # frame-for-frame alignment
        assert np.isfinite(mels[i]).all()
        assert mels[i].min() >= -10.0 and mels[i].max() <= 2.0


def test_crop_batcher_uses_gta_mels_not_gt(corpus_ckpt):
    """The GAN step's losses cannot reveal mis-wired conditioning (a
    fresh-init generator attenuates the mel input to ~1e-7 output scale),
    so pin the wiring itself: with gta_by_path set, every mel crop must be
    a slice of the TEACHER-FORCED mel, not of the ground-truth mel."""
    import glob

    from spev_tpu.cli.vocoder import make_crop_batcher
    from spev_tpu.config import AudioConfig

    root, cache, ds, cfg, ckpt = corpus_ckpt
    audio = AudioConfig()
    wavs = sorted(glob.glob(os.path.join(root, "*.wav")))
    # synthetic teacher-forced stand-ins, clearly distinct from real mels
    gta_by_path = {}
    for w, path in enumerate(wavs):
        T = ds.load_utterance(w)["mel"].shape[0]
        gta_by_path[path] = np.full((T, 80), float(w) - 50.0, np.float32)

    batch = make_crop_batcher(wavs, audio, segment_frames=8, batch_size=4,
                              gta_by_path=gta_by_path)
    mels, wavs_out = batch()
    assert mels.shape == (4, 8, 80) and wavs_out.shape == (4, 8 * audio.hop_length)
    # each crop row is constant at one of the stand-in values -> it came
    # from gta_by_path; an fx.mel crop of a tone+noise wav never is
    for row in mels:
        assert row.std() == 0.0 and row[0, 0] <= -46.0

    # and without gta_by_path the same batcher yields real extracted mels
    batch_gt = make_crop_batcher(wavs, audio, segment_frames=8, batch_size=4)
    mels_gt, _ = batch_gt()
    assert all(row.std() > 0.0 for row in mels_gt)


def test_gta_skips_overlong_utterances(corpus_ckpt):
    from spev_tpu.infer.gta import compute_gta_mels

    root, cache, ds, cfg, ckpt = corpus_ckpt
    # frame bucket smaller than any utterance -> everything skipped
    mels = compute_gta_mels(ckpt, ds, phoneme_buckets=(64,), frame_buckets=(8,))
    assert mels == {}


@pytest.mark.slow
def test_vocoder_cli_gta_end_to_end(corpus_ckpt, tmp_path, monkeypatch):
    """spev-vocoder-train --gta_checkpoint: full GTA loop — dataset build,
    teacher-forced mels, GAN steps on (pred mel, gt wav) crops."""
    from spev_tpu.cli.vocoder import main

    root, cache, ds, cfg, ckpt = corpus_ckpt
    monkeypatch.chdir(tmp_path)
    main([
        "--data_dir", root, "--cache_dir", cache,
        "--gta_checkpoint", ckpt,
        "--steps", "2", "--batch_size", "2", "--segment_frames", "8",
        "--config", "tiny", "--periods", "2", "--scales", "1",
        "--log_every", "1", "--save_every", "2", "--name", "gta_run",
    ])
    assert os.path.exists(
        os.path.join(str(tmp_path), "checkpoints", "gta_run", "gen_00000002.spev")
    )
