"""End-to-end synthesis stack: Synthesizer on a random-weight model with
both vocoder paths, bucket-invariance of the masked HiFi-GAN, and the
reference-shaped infer_tts entry."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spev_tpu.config import ModelConfig
from spev_tpu.models.fastspeech2 import init_fastspeech2
from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator, apply_hifigan, init_hifigan
from spev_tpu.infer.synthesis import Synthesizer
from spev_tpu.infer.vocoder import Vocoder
from spev_tpu.text.vocab import Vocab
from spev_tpu.train.checkpoint import save_checkpoint

H, NMEL = 32, 80


def _vocab():
    marks = [chr(c) for c in range(ord("a"), ord("p"))]
    return Vocab.build(marks)


def _make_ckpt(tmp_path, vocab):
    cfg = ModelConfig(vocab_size=len(vocab), embed_dim=H, hidden_dim=H, n_mels=NMEL)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    # give the duration bias a positive value so predicted durations > 0
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.2])
    path = str(tmp_path / "model.spev")
    save_checkpoint(path, params, vocab=vocab.symbols, stats={"p_mean": 0.0})
    return path, cfg


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = HiFiGANConfig(
        resblock="2",
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        num_mels=NMEL,
    )
    return HiFiGANGenerator(cfg, init_hifigan(jax.random.PRNGKey(1), cfg))


def test_hifigan_bucket_masking_invariance(tiny_gen):
    """A bucket-padded run with mel_len masking must equal the exact-length
    run on the valid prefix (the waveform-parity mechanism)."""
    rng = np.random.default_rng(0)
    L, BUCKET = 37, 64
    mel = rng.standard_normal((1, L, NMEL)).astype(np.float32)
    exact = np.asarray(apply_hifigan(tiny_gen.params, tiny_gen.cfg, jnp.asarray(mel)))
    padded = np.zeros((1, BUCKET, NMEL), np.float32)
    padded[:, :L] = mel
    padded[:, L:] = 3.3  # garbage in the pad region must not leak
    bucket = np.asarray(
        apply_hifigan(tiny_gen.params, tiny_gen.cfg, jnp.asarray(padded), mel_len=jnp.asarray([L]))
    )
    hop = tiny_gen.cfg.hop_recovery
    np.testing.assert_allclose(bucket[:, : L * hop], exact, atol=1e-5)


def test_synthesizer_griffin_lim(tmp_path):
    vocab = _vocab()
    path, cfg = _make_ckpt(tmp_path, vocab)
    synth = Synthesizer(
        path, hifigan_dir=None, model_cfg=cfg, g2p_backend="rules",
        phoneme_buckets=(64,), frame_buckets=(256,),
    )
    wav, mel = synth.synthesize("hello", duration_scale=1.0)
    assert mel.ndim == 2 and mel.shape[1] == NMEL
    assert mel.shape[0] >= 1
    assert wav.shape[0] == mel.shape[0] * 256
    assert np.isfinite(wav).all()
    assert mel.min() >= -10 - 1e-5 and mel.max() <= 2 + 1e-5


def test_synthesizer_neural_vocoder(tmp_path, tiny_gen):
    vocab = _vocab()
    path, cfg = _make_ckpt(tmp_path, vocab)
    synth = Synthesizer(
        path, model_cfg=cfg, g2p_backend="rules",
        phoneme_buckets=(64,), frame_buckets=(256,),
    )
    synth.vocoder = Vocoder(generator=tiny_gen)
    wav, mel = synth.synthesize(
        "test", breathiness=0.4, roughness=0.2, brightness=0.5,
        pitch_scale=1.1, duration_scale=0.9,
    )
    assert wav.shape[0] == mel.shape[0] * tiny_gen.cfg.hop_recovery
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0


def test_synthesizer_curve_controls(tmp_path, tiny_gen):
    vocab = _vocab()
    path, cfg = _make_ckpt(tmp_path, vocab)
    synth = Synthesizer(
        path, model_cfg=cfg, g2p_backend="rules",
        phoneme_buckets=(64,), frame_buckets=(256,),
    )
    synth.vocoder = Vocoder(generator=tiny_gen)
    phones = synth.g2p.phonemes("temporal curve test")
    n = len(phones)
    wav, mel = synth.synthesize(
        "temporal curve test",
        breath_curve=np.linspace(0.9, 0.0, n),
        bright_curve=np.linspace(-1.0, 0.5, n),
    )
    assert np.isfinite(wav).all() and mel.shape[0] > 0
