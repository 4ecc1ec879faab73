"""CLI surface: every reference flag parses; the infer path drives the full
stack against a tiny trained-at-random checkpoint."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spev_tpu.cli.real_metrics import build_parser as rm_parser
from spev_tpu.cli.spev_advanced import build_parser as adv_parser, synthesize_advanced
from spev_tpu.cli.spev_tts import build_parser as tts_parser
from spev_tpu.cli.embodied import _parser as agent_parser


def test_real_metrics_flag_surface():
    args = rm_parser().parse_args(
        ["--mode", "infer", "--text", "hi", "--breathiness", "0.3", "--roughness", "0.1",
         "--brightness", "-0.5", "--pitch_scale", "1.2", "--duration_scale", "0.8",
         "--energy_scale", "1.1", "--checkpoint", "x.spev", "--output", "o.wav"]
    )
    assert args.brightness == -0.5 and args.duration_scale == 0.8
    args = rm_parser().parse_args(
        ["--mode", "train", "--data_dir", "d", "--textgrid_dir", "tg", "--name", "run",
         "--resume", "ck", "--epochs", "5", "--batch_size", "4", "--grad_accum", "2",
         "--lr", "1e-4", "--hifigan_dir", "hg"]
    )
    assert args.grad_accum == 2 and args.resume == "ck"


def test_spev_tts_flag_surface():
    args = tts_parser().parse_args(
        ["--mode", "train", "--warmup_epochs", "7", "--epochs", "20"]
    )
    assert args.warmup_epochs == 7
    args = tts_parser().parse_args(
        ["--mode", "infer", "--checkpoint", "c", "--text", "t",
         "--duration_scale", "1.3", "--pitch_scale", "0.9"]
    )
    assert args.duration_scale == 1.3


def test_advanced_flag_surface():
    args = adv_parser().parse_args(
        ["--mode", "infer", "--breathiness", "0.4", "--roughness", "0.2",
         "--nasality", "0.3", "--valence", "0.5", "--arousal", "-0.2",
         "--dominance", "0.1", "--age", "70", "--lung_capacity", "0.6",
         "--word_emphasis", "1.0,1.5,1.0", "--output", "a.wav"]
    )
    assert args.nasality == 0.3 and args.lung_capacity == 0.6
    assert adv_parser().parse_args(["--mode", "train"]).epochs == 150  # documented default


def test_agent_flag_surfaces():
    a = agent_parser(False).parse_args(
        ["--text", "hi [sigh]", "--emotion", "exhausted", "--checkpoint", "c"]
    )
    assert a.emotion == "exhausted"
    t = agent_parser(True).parse_args(
        ["--text", "x", "--emotion", "relief", "--checkpoint", "c"]
    )
    assert t.emotion == "relief"
    with pytest.raises(SystemExit):
        agent_parser(True).parse_args(["--text", "x", "--emotion", "secretive", "--checkpoint", "c"])


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from spev_tpu.config import ModelConfig
    from spev_tpu.models.advanced import init_advanced
    from spev_tpu.text.vocab import Vocab
    from spev_tpu.train.checkpoint import save_checkpoint

    vocab = Vocab.build([chr(c) for c in range(ord("a"), ord("p"))] + [" "])
    cfg = ModelConfig(vocab_size=len(vocab), embed_dim=32, hidden_dim=32, n_mels=80)
    params = init_advanced(jax.random.PRNGKey(0), cfg)
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.2])
    path = str(tmp_path_factory.mktemp("ck") / "m.spev")
    save_checkpoint(path, params, vocab=vocab.symbols, stats={})
    return path, cfg


def test_advanced_infer_path_end_to_end(tiny_ckpt, monkeypatch):
    """Drive synthesize_advanced with all controls active (Griffin-Lim)."""
    path, cfg = tiny_ckpt
    import spev_tpu.infer.synthesis as S

    orig = S.Synthesizer

    def patched(checkpoint, hifigan_dir=None, **kw):
        return orig(checkpoint, hifigan_dir=None, model_cfg=cfg, g2p_backend="rules",
                    phoneme_buckets=(64,), frame_buckets=(128,))

    monkeypatch.setattr("spev_tpu.infer.synthesis.Synthesizer", patched)
    args = adv_parser().parse_args(
        ["--mode", "infer", "--checkpoint", path, "--text", "hi there",
         "--breathiness", "0.3", "--nasality", "0.2", "--age", "60",
         "--lung_capacity", "0.7", "--word_emphasis", "1.0,1.4"]
    )
    wav, mel = synthesize_advanced(args)
    assert np.isfinite(wav).all() and mel.shape[0] >= 1


def test_word_emphasis_extends_audio(tiny_ckpt, monkeypatch):
    """Emphasis >1 on a word must lengthen its phonemes' durations."""
    path, cfg = tiny_ckpt
    import spev_tpu.infer.synthesis as S

    orig = S.Synthesizer

    def patched(checkpoint, hifigan_dir=None, **kw):
        return orig(checkpoint, hifigan_dir=None, model_cfg=cfg, g2p_backend="rules",
                    phoneme_buckets=(64,), frame_buckets=(256,))

    monkeypatch.setattr("spev_tpu.infer.synthesis.Synthesizer", patched)
    base_args = ["--mode", "infer", "--checkpoint", path, "--text", "hello there friend"]
    _, mel_plain = synthesize_advanced(adv_parser().parse_args(base_args))
    _, mel_emph = synthesize_advanced(
        adv_parser().parse_args(base_args + ["--word_emphasis", "3.0,3.0,3.0"])
    )
    assert mel_emph.shape[0] > mel_plain.shape[0]


def test_friendly_errors():
    from spev_tpu.infer.synthesis import _load_any_checkpoint
    from spev_tpu.text.emphasis import parse_emphasis

    with pytest.raises(FileNotFoundError, match="train one first"):
        _load_any_checkpoint("/definitely/not/here.spev")
    with pytest.raises(ValueError, match="comma-separated numbers"):
        parse_emphasis("abc,,")
