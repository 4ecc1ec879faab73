"""Trainable VAD emotion pathway: emotion labels from filenames → fixed
emotion→VAD table → per-utterance (3,) targets through the cache and
batching → ``vad_proj`` receives gradient in the train step (the
documented-as-trained VAD embedding, reference
``PRODUCTION_SYSTEM_SUMMARY.md:71-82,124-133``)."""

import os

import numpy as np
import pytest
import jax

from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
from spev_tpu.data.batching import BucketBatcher
from spev_tpu.data.dataset import SpevDataset
from spev_tpu.data.emotion import (
    EMOTION_VAD,
    canonical_emotion,
    emotion_from_basename,
    vad_for_emotion,
)
from spev_tpu.parallel.mesh import make_mesh, shard_batch
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.trainer import Trainer, init_train_state
from spev_tpu.utils.wavio import write_wav


def test_emotion_table_and_aliases():
    assert canonical_emotion("Happy") == "happy"
    assert canonical_emotion("ANGER") == "angry"
    assert canonical_emotion("joy") == "happy"
    assert canonical_emotion("stoic") is None
    v = vad_for_emotion("sad")
    assert v.shape == (3,) and v.dtype == np.float32
    assert tuple(v) == EMOTION_VAD["sad"]
    with pytest.raises(KeyError):
        vad_for_emotion("stoic")


def test_emotion_from_basename():
    # the ESD prepper convention: {utt_id}_{emotion}
    assert emotion_from_basename("0011_000351_angry") == "angry"
    assert emotion_from_basename("spk0_utt0007_happy.wav") == "happy"
    assert emotion_from_basename("utt0007") is None
    assert emotion_from_basename("utt_0007") is None  # unknown suffix


def test_emotion_registers_loglinear():
    """The synthetic registers are log-linear in VAD and ordered the way
    produced emotional speech is: arousal ↑ pitch/level, ↓ duration."""
    from spev_tpu.data.synthetic import emotion_prosody

    f0 = {e: emotion_prosody(EMOTION_VAD[e])[0] for e in EMOTION_VAD}
    dur = {e: emotion_prosody(EMOTION_VAD[e])[1] for e in EMOTION_VAD}
    lvl = {e: emotion_prosody(EMOTION_VAD[e])[2] for e in EMOTION_VAD}
    assert f0["happy"] > f0["neutral"] > f0["sad"]
    assert dur["sad"] > dur["neutral"] > dur["happy"]
    assert lvl["angry"] > lvl["neutral"] > lvl["sad"]


@pytest.fixture(scope="module")
def emo_dataset(tmp_path_factory):
    from spev_tpu.data.synthetic import generate_formant_corpus

    root = str(tmp_path_factory.mktemp("emo_corpus"))
    tg = generate_formant_corpus(
        root, n_utterances=8, seed=0,
        emotions=("neutral", "happy", "sad", "angry"),
    )
    cache = str(tmp_path_factory.mktemp("emo_cache"))
    return SpevDataset(root, textgrid_dir=tg, cache_dir=cache,
                       g2p_backend="rules", stats_sample=4, emotion_vad=True)


def test_corpus_files_carry_emotion_suffix(emo_dataset):
    assert emo_dataset.emotions == ["angry", "happy", "neutral", "sad"]
    vads = {tuple(np.round(np.asarray(emo_dataset.load_utterance(i)["vad"], np.float64), 4))
            for i in range(len(emo_dataset))}
    expected = {tuple(np.round(np.asarray(EMOTION_VAD[e], np.float64), 4))
                for e in ("neutral", "happy", "sad", "angry")}
    assert vads == expected


def test_batches_carry_vad(emo_dataset):
    vocab = Vocab(emo_dataset.vocab)
    b = BucketBatcher(emo_dataset, vocab, batch_size=4,
                      phoneme_buckets=(64,), frame_buckets=(256,))
    batch = next(iter(b.epoch(0)))
    assert batch["vad"].shape == (4, 3) and batch["vad"].dtype == np.float32
    assert np.abs(batch["vad"]).max() > 0  # non-neutral rows present


def test_cache_without_labels_rejected(emo_dataset, tmp_path):
    """Reusing a cache built WITHOUT emotion labels under emotion_vad=True
    must fail loudly instead of silently training without VAD targets."""
    from spev_tpu.errors import UserError

    # build a label-free cache over the same corpus
    root = os.path.dirname(emo_dataset._resolve(emo_dataset.files[0]))
    data_dir = None
    # reconstruct the corpus dir from any wav next to the textgrids
    # (the fixture's tmp dirs): easier — make a tiny fresh corpus
    sr = 22050
    data_dir = str(tmp_path / "corpus")
    os.makedirs(data_dir)
    t = np.arange(int(0.5 * sr)) / sr
    write_wav(os.path.join(data_dir, "a_happy.wav"),
              (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32), sr)
    with open(os.path.join(data_dir, "a_happy.txt"), "w") as f:
        f.write("hello")
    cache = str(tmp_path / "cache")
    SpevDataset(data_dir, cache_dir=cache, g2p_backend="rules", stats_sample=1)
    with pytest.raises(UserError):
        SpevDataset(data_dir, cache_dir=cache, g2p_backend="rules",
                    stats_sample=1, emotion_vad=True)


@pytest.mark.slow
def test_vad_proj_receives_gradient(emo_dataset):
    """One epoch with VAD-labeled batches: vad_proj must move off its
    zero init (the round-3 gap: zero-init + no gradient path = the
    emotion embedding could never learn)."""
    vocab = Vocab(emo_dataset.vocab)
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32,
                          n_mels=80, max_phonemes=64, max_frames=256,
                          use_vad=True),
        train=TrainConfig(batch_size=4, warmup_steps=5, epochs=1),
    )
    mesh = make_mesh((2,), ("data",))
    trainer = Trainer(cfg, vocab, emo_dataset.stats, ckpt_dir="/tmp/emo_ck",
                      log_dir="/tmp/emo_logs", mesh=mesh)
    assert "vad_proj" in trainer.state.params["advanced"]
    w0 = np.asarray(trainer.state.params["advanced"]["vad_proj"]["weight"])
    assert np.all(w0 == 0)
    b = BucketBatcher(emo_dataset, vocab, batch_size=4,
                      phoneme_buckets=(64,), frame_buckets=(256,))
    m = trainer.train_epoch(shard_batch(mesh, batch) for batch in b.epoch(0))
    assert np.isfinite(m["train_loss"]) and trainer.nan_count == 0
    w1 = np.asarray(trainer.state.params["advanced"]["vad_proj"]["weight"])
    assert np.abs(w1).max() > 0, "vad_proj received no gradient"


@pytest.mark.slow
def test_vad_changes_eval_outputs(emo_dataset):
    """After vad_proj moves off zero, eval routes batch['vad'] through the
    advanced wrapper: different VAD inputs give different predictions."""
    from spev_tpu.models.advanced import apply_advanced, init_advanced

    vocab = Vocab(emo_dataset.vocab)
    # functional predictors: the LayerNorm(1) parity quirk outputs a
    # constant, which would sever VAD from the duration prediction
    mcfg = ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32,
                       n_mels=80, max_phonemes=64, max_frames=256,
                       use_vad=True, vp_output_norm=False)
    params = init_advanced(jax.random.PRNGKey(0), mcfg)
    # give the projection a deterministic non-zero value
    params["advanced"]["vad_proj"]["weight"] = (
        0.05 * jax.random.normal(jax.random.PRNGKey(1), (mcfg.hidden_dim, 3))
    )
    ids = np.zeros((2, 64), np.int32)
    ids[:, :5] = 3
    lens = np.full((2,), 5, np.int32)
    happy = np.tile(np.asarray(EMOTION_VAD["happy"], np.float32), (2, 1))
    sad = np.tile(np.asarray(EMOTION_VAD["sad"], np.float32), (2, 1))
    out_h = apply_advanced(params, mcfg, ids, lens, vad=happy)
    out_s = apply_advanced(params, mcfg, ids, lens, vad=sad)
    assert not np.allclose(np.asarray(out_h["log_duration_pred"]),
                           np.asarray(out_s["log_duration_pred"]))
