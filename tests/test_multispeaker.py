"""Multi-speaker path (LibriTTS-R stretch config): speaker labels from
filenames → speaker ids through batching → speaker-conditioned training
steps on the mesh."""

import os

import numpy as np
import pytest
import jax

from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
from spev_tpu.data.batching import BucketBatcher
from spev_tpu.data.dataset import SpevDataset
from spev_tpu.parallel.mesh import make_mesh, shard_batch
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.trainer import Trainer, init_train_state
from spev_tpu.utils.wavio import write_wav


@pytest.fixture(scope="module")
def ms_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ms_corpus"))
    rng = np.random.default_rng(0)
    sr = 22050
    for spk in ("101", "202"):
        for j in range(2):
            t = np.arange(int(0.7 * sr)) / sr
            f0 = 120 if spk == "101" else 220
            y = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))
            base = f"{spk}_1_{j}"
            write_wav(os.path.join(root, base + ".wav"), y.astype(np.float32), sr)
            with open(os.path.join(root, base + ".txt"), "w") as f:
                f.write("multi speaker line")
    cache = str(tmp_path_factory.mktemp("ms_cache"))
    return SpevDataset(root, cache_dir=cache, g2p_backend="rules",
                       stats_sample=4, multi_speaker=True)


def test_speakers_extracted(ms_dataset):
    assert ms_dataset.speakers == ["101", "202"]
    sids = {int(ms_dataset.load_utterance(i)["speaker_id"]) for i in range(len(ms_dataset))}
    assert sids == {0, 1}


def test_batches_carry_speaker_ids(ms_dataset):
    vocab = Vocab(ms_dataset.vocab)
    b = BucketBatcher(ms_dataset, vocab, batch_size=2,
                      phoneme_buckets=(64,), frame_buckets=(128,))
    batch = next(iter(b.epoch(0)))
    assert "speaker_ids" in batch and batch["speaker_ids"].shape == (2,)


@pytest.mark.slow
def test_multispeaker_training_step(ms_dataset):
    vocab = Vocab(ms_dataset.vocab)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32,
                          n_mels=80, max_phonemes=64, max_frames=128,
                          n_speakers=len(ms_dataset.speakers)),
        train=TrainConfig(batch_size=2, warmup_steps=5, epochs=1),
    )
    mesh = make_mesh((2,), ("data",))
    trainer = Trainer(cfg, vocab, ms_dataset.stats, ckpt_dir="/tmp/ms_ck",
                      log_dir="/tmp/ms_logs", mesh=mesh)
    assert "advanced" in trainer.state.params
    assert "speaker_embedding" in trainer.state.params["advanced"]
    b = BucketBatcher(ms_dataset, vocab, batch_size=2,
                      phoneme_buckets=(64,), frame_buckets=(128,))
    m = trainer.train_epoch(shard_batch(mesh, batch) for batch in b.epoch(0))
    assert np.isfinite(m["train_loss"]) and trainer.nan_count == 0
    # speaker embedding received gradient (changed from init)
    emb = np.asarray(trainer.state.params["advanced"]["speaker_embedding"]["weight"])
    fresh = init_train_state(jax.random.PRNGKey(0), cfg)
    emb0 = np.asarray(fresh.params["advanced"]["speaker_embedding"]["weight"])
    assert not np.allclose(emb, emb0)


def test_synthetic_multispeaker_corpus_and_eval(tmp_path):
    """n_speakers>1 corpus generation: spk{k}_ prefixes, distinct voices,
    and evaluate_checkpoint routing speaker ids through apply_advanced."""
    from spev_tpu.data.synthetic import generate_formant_corpus, speaker_voice
    from spev_tpu.infer.evaluate import evaluate_checkpoint

    root = str(tmp_path / "corpus")
    tg = generate_formant_corpus(root, n_utterances=6, seed=0, n_speakers=3)
    names = sorted(os.listdir(root))
    assert "spk0_utt0000.wav" in names and "spk2_utt0002.wav" in names
    # voices are deterministically spread (F0 register strictly increasing)
    mults = [speaker_voice(k, 3)[0] for k in range(3)]
    assert mults[0] < mults[1] < mults[2]

    ds = SpevDataset(root, textgrid_dir=tg, cache_dir=str(tmp_path / "cache"),
                     g2p_backend="rules", stats_sample=6, multi_speaker=True)
    assert ds.speakers == ["spk0", "spk1", "spk2"]
    vocab = Vocab(ds.vocab)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32,
                          n_mels=80, max_phonemes=64, max_frames=256,
                          n_speakers=3),
        train=TrainConfig(batch_size=2, warmup_steps=5, epochs=1),
    )
    trainer = Trainer(cfg, vocab, ds.stats,
                      ckpt_dir=str(tmp_path / "ck"), log_dir=str(tmp_path / "lg"))
    ckpt = trainer.save("ms_eval")
    res = evaluate_checkpoint(ckpt, ds, batch_size=2,
                              phoneme_buckets=(64,), frame_buckets=(256,))
    assert res["aggregate"]["n_utterances"] == 6
    for v in res["per_utterance"].values():
        assert np.isfinite(v["mcd_db"]) and np.isfinite(v["dur_err_pct"])


def test_run_training_multi_speaker_flag(tmp_path, monkeypatch):
    """The CLI surface (--multi_speaker on spev-train/spev-advanced-train):
    run_training derives speaker labels, sizes the speaker table from the
    corpus, and the saved checkpoint carries the embedding."""
    from types import SimpleNamespace

    from spev_tpu.cli.common import run_training
    from spev_tpu.train.checkpoint import load_model_config, load_params

    root = str(tmp_path / "corpus")
    os.makedirs(root)
    rng = np.random.default_rng(0)
    sr = 22050
    for spk in ("101", "202"):
        for j in range(2):
            t = np.arange(int(0.7 * sr)) / sr
            f0 = 120 if spk == "101" else 220
            y = 0.4 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(len(t))
            base = f"{spk}_1_{j}"
            write_wav(os.path.join(root, base + ".wav"), y.astype(np.float32), sr)
            with open(os.path.join(root, base + ".txt"), "w") as f:
                f.write("multi speaker line")

    monkeypatch.chdir(tmp_path)
    args = SimpleNamespace(
        data_dir=root, textgrid_dir=None,
        cache_dir=str(tmp_path / "cache"), force_rebuild=False,
        multi_speaker=True, lr=1e-3, batch_size=2, grad_accum=1,
        epochs=1, name="ms_cli", resume=None,
    )
    run_training(args, model_overrides={
        "embed_dim": 32, "hidden_dim": 32, "n_mels": 80,
        "max_phonemes": 64, "max_frames": 128,
    })
    ckpt = os.path.join(str(tmp_path), "checkpoints", "ms_cli", "last.spev")
    assert os.path.exists(ckpt)
    params, _, _ = load_params(ckpt)
    assert "advanced" in params and "speaker_embedding" in params["advanced"]
    assert load_model_config(ckpt).get("n_speakers") == 2
