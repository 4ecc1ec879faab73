"""Pallas kernels vs their XLA ground-truth counterparts (interpret mode on
CPU; the same kernels compile for TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spev_tpu.ops.stft import hann_window, log_mel_spectrogram, stft_complex, istft
from spev_tpu.ops.pallas.kernels import fused_log_mel, overlap_add


def _signal(n=22050, seed=0):
    r = np.random.default_rng(seed)
    t = np.arange(n) / 22050.0
    return (
        0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * r.standard_normal(n)
    ).astype(np.float32)


def test_fused_log_mel_matches_xla():
    y = _signal()
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(y), fmax=8000.0))
    ours = np.asarray(fused_log_mel(jnp.asarray(y), fmax=8000.0, interpret=True))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_fused_log_mel_short_signal():
    y = _signal(5000, seed=1)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(y), fmax=8000.0))
    ours = np.asarray(fused_log_mel(jnp.asarray(y), fmax=8000.0, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_overlap_add_matches_istft():
    y = _signal(8192, seed=2)
    re, im = stft_complex(jnp.asarray(y))
    ref = np.asarray(istft(re, im, length=len(y)))

    # reproduce istft's internals up to the OLA: windowed inverse frames
    from spev_tpu.ops.stft import _dft_bases

    n_fft, hop = 1024, 256
    cos_b, sin_b = _dft_bases(n_fft)
    scale = np.full((n_fft // 2 + 1,), 2.0, np.float32)
    scale[0] = scale[-1] = 1.0
    cos_t = cos_b * scale / n_fft
    sin_t = sin_b * scale / n_fft
    frames = np.asarray(re) @ cos_t.T + np.asarray(im) @ sin_t.T
    frames = frames * hann_window(n_fft)[None, :]

    out = np.asarray(overlap_add(jnp.asarray(frames), interpret=True))
    # istft trims n_fft//2 from both ends (center convention)
    trimmed = out[n_fft // 2 : n_fft // 2 + len(y)]
    np.testing.assert_allclose(trimmed, ref, atol=1e-4)


def test_fused_length_regulator_matches_xla():
    from spev_tpu.ops.length_regulator import length_regulate, length_regulate_feature
    from spev_tpu.ops.pallas.length_regulator_kernel import length_regulate_fused

    rng = np.random.default_rng(0)
    B, T, H, F, M = 3, 16, 32, 5, 64
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    feats = rng.standard_normal((B, T, F)).astype(np.float32)
    durs = rng.integers(0, 5, size=(B, T)).astype(np.float32)
    durs[1] = 0  # all-zero row -> one zero frame
    durs[2, 3] = np.nan  # guard

    xe_ref, len_ref = length_regulate(jnp.asarray(x), jnp.asarray(durs), M)
    fe_ref = np.stack(
        [np.asarray(length_regulate_feature(jnp.asarray(feats[..., i]), jnp.asarray(durs), M))
         for i in range(F)], axis=-1,
    )
    xe, fe, lens = length_regulate_fused(
        jnp.asarray(x), jnp.asarray(feats), jnp.asarray(durs), M, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(len_ref))
    np.testing.assert_allclose(np.asarray(xe), np.asarray(xe_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fe), fe_ref, atol=1e-5)


def test_fused_length_regulator_vjp_matches_gather():
    """The custom VJP (transposed selection matmul) must produce the same
    cotangents as differentiating the XLA gather path — including
    zero-duration phonemes (no gradient) and the all-zero-row guard."""
    import jax
    from spev_tpu.ops.length_regulator import length_regulate, length_regulate_feature
    from spev_tpu.ops.pallas.length_regulator_kernel import length_regulate_fused

    rng = np.random.default_rng(1)
    B, T, H, F, M = 3, 16, 32, 5, 64
    x = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, T, F)), jnp.float32)
    d = np.zeros((B, T), np.float32)
    d[0, :8] = 4
    d[1, :5] = [3, 0, 7, 2, 1]  # zero-duration phoneme inside a row
    durs = jnp.asarray(d)       # row 2 all-zero -> one zero frame
    w = jnp.asarray(rng.standard_normal((M, H)), jnp.float32)

    def loss_fused(x, feats):
        xo, fo, _ = length_regulate_fused(x, feats, durs, M, interpret=True)
        return jnp.sum(xo * w) + jnp.sum(fo**2)

    def loss_gather(x, feats):
        xo, _ = length_regulate(x, durs, M)
        fo = jnp.stack(
            [length_regulate_feature(feats[..., i], durs, M) for i in range(F)], -1
        )
        return jnp.sum(xo * w) + jnp.sum(fo**2)

    v1, (gx1, gf1) = jax.value_and_grad(loss_fused, argnums=(0, 1))(x, feats)
    v2, (gx2, gf2) = jax.value_and_grad(loss_gather, argnums=(0, 1))(x, feats)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), atol=1e-5)
    # zero-duration phonemes and padded tails receive zero cotangent
    assert np.all(np.asarray(gx1)[1, 1] == 0) and np.all(np.asarray(gx1)[2] == 0)


def test_model_forward_with_pallas_lr_matches():
    """cfg.use_pallas_lr must be output-identical to the gather path."""
    import dataclasses
    import jax
    from spev_tpu.config import ModelConfig
    from spev_tpu.models.fastspeech2 import apply_fastspeech2, init_fastspeech2
    import spev_tpu.ops.pallas.length_regulator_kernel as lrk

    # force interpret mode on CPU
    orig = lrk.length_regulate_fused
    lrk_interp = lambda *a, **k: orig(*a, **{**k, "interpret": True}) if "interpret" not in k else orig(*a, **k)

    cfg = ModelConfig(vocab_size=19, embed_dim=16, hidden_dim=16, n_mels=8,
                      max_phonemes=16, max_frames=64)
    cfg_p = dataclasses.replace(cfg, use_pallas_lr=True)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray([1.3])
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 19, size=(2, 16)).astype(np.int32))
    lens = jnp.asarray([10, 14], jnp.int32)

    a = apply_fastspeech2(params, cfg, ids, lens)
    try:
        lrk.length_regulate_fused = lrk_interp
        b = apply_fastspeech2(params, cfg_p, ids, lens)
    finally:
        lrk.length_regulate_fused = orig
    np.testing.assert_array_equal(np.asarray(a["mel_len"]), np.asarray(b["mel_len"]))
    np.testing.assert_allclose(np.asarray(a["mel_pred"]), np.asarray(b["mel_pred"]), atol=1e-5)


def test_pallas_lr_auto_resolution():
    """'auto' selects the fused kernel for ALL graphs on TPU (it has a
    custom VJP, so gradient contexts are safe) and always falls back to
    the XLA gather on CPU."""
    import jax
    from spev_tpu.config import ModelConfig
    from spev_tpu.models import fastspeech2 as fs2
    from spev_tpu.models.fastspeech2 import apply_fastspeech2, init_fastspeech2
    import spev_tpu.ops.pallas.length_regulator_kernel as lrk
    import spev_tpu.utils.platform as plat

    cfg = ModelConfig(vocab_size=19, embed_dim=16, hidden_dim=16, n_mels=8,
                      max_phonemes=16, max_frames=64)
    assert cfg.use_pallas_lr == "auto"
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 19, size=(1, 16)).astype(np.int32))
    lens = jnp.asarray([10], jnp.int32)

    def boom(*a, **k):
        raise AssertionError("fused kernel selected")

    durs = jnp.where(jnp.arange(16)[None, :] < 10, 4.0, 0.0)
    zeros = jnp.zeros((1, 16), jnp.float32)
    orig_kernel, orig_on_tpu = lrk.length_regulate_fused, plat.on_tpu
    try:
        lrk.length_regulate_fused = boom
        # CPU (on_tpu False): auto → gather for every graph
        apply_fastspeech2(params, cfg, ids, lens)
        apply_fastspeech2(params, cfg, ids, lens, target_durations=durs,
                          target_pitch=zeros, target_energy=zeros,
                          target_breath=zeros, target_rough=zeros,
                          target_bright=zeros)
        # pretend-TPU: every graph selects the fused kernel — serving,
        # teacher-forced (training), and dropout graphs alike
        plat.on_tpu = lambda: True
        fs2.on_tpu = plat.on_tpu  # in case of a direct from-import
        with pytest.raises(AssertionError, match="fused kernel"):
            apply_fastspeech2(params, cfg, ids, lens)
        with pytest.raises(AssertionError, match="fused kernel"):
            apply_fastspeech2(params, cfg, ids, lens, target_durations=durs,
                              target_pitch=zeros, target_energy=zeros,
                              target_breath=zeros, target_rough=zeros,
                              target_bright=zeros)
        with pytest.raises(AssertionError, match="fused kernel"):
            apply_fastspeech2(params, cfg, ids, lens, deterministic=False,
                              dropout_rng=jax.random.PRNGKey(1))
    finally:
        lrk.length_regulate_fused = orig_kernel
        plat.on_tpu = orig_on_tpu
