"""Polyphase-folded HiFi-GAN must reproduce the standard path exactly
(float-rounding tolerance; the folded kernels contain the same tap weights,
only the conv lowering changes)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spev_tpu.models.hifigan import HiFiGANConfig, apply_hifigan, init_hifigan
from spev_tpu.models.hifigan_folded import (
    apply_hifigan_folded,
    fold_hifigan,
    stage_folds,
)


def tiny_v1():
    return HiFiGANConfig(
        resblock="1",
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        num_mels=8,
    )


def tiny_v3():
    return HiFiGANConfig(
        resblock="2",
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
        num_mels=8,
    )


def test_stage_folds_v1_full_size():
    cfg = HiFiGANConfig()  # 512 initial: channels 256,128,64,32
    assert stage_folds(cfg) == [1, 1, 2, 4]


def test_stage_folds_divide_strides():
    for cfg in (tiny_v1(), tiny_v3(), HiFiGANConfig()):
        folds = stage_folds(cfg)
        r = 1
        for f, u in zip(folds, cfg.upsample_rates):
            assert (r * u) % f == 0
            r = f


@pytest.mark.parametrize("make_cfg", [tiny_v1, tiny_v3])
def test_folded_matches_standard(make_cfg):
    cfg = make_cfg()
    params = init_hifigan(jax.random.PRNGKey(0), cfg)
    folded = fold_hifigan(params, cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(np.clip(rng.standard_normal((2, 24, cfg.num_mels)) - 4, -10, 2).astype(np.float32))

    ref = np.asarray(apply_hifigan(params, cfg, mel))
    out = np.asarray(apply_hifigan_folded(folded, cfg, mel))
    assert out.shape == ref.shape == (2, 24 * cfg.hop_recovery)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def wide_v1():
    """Initial channels high enough that stage 0 folds at r=1 — exercises
    the rhs-dilated branch of `_fold_regular` (wide stages keep their k
    taps + rhs_dilation instead of a dense scattered kernel)."""
    return HiFiGANConfig(
        resblock="1",
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=256,
        resblock_kernel_sizes=(3, 11),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)),
        num_mels=8,
    )


def test_folded_rhs_dilated_wide_stage_matches():
    cfg = wide_v1()
    assert stage_folds(cfg)[0] == 1  # stage 0 stays unfolded (128 ch)
    params = init_hifigan(jax.random.PRNGKey(2), cfg)
    folded = fold_hifigan(params, cfg)
    # the wide stage's dilated convs must carry rhs_dilation, not a
    # scattered dense kernel
    dilated = folded["stages"][0][1]["convs1"][2]  # k=11, d=5 conv
    assert dilated.dil == 5 and dilated.wf.shape[0] == 11
    rng = np.random.default_rng(2)
    mel = jnp.asarray(np.clip(rng.standard_normal((2, 16, cfg.num_mels)) - 4, -10, 2).astype(np.float32))
    ref = np.asarray(apply_hifigan(params, cfg, mel))
    out = np.asarray(apply_hifigan_folded(folded, cfg, mel))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_unfold_dilated_mode_matches():
    """The documented negative-result mode (r>1 dilated convs run unfolded
    with rhs_dilation; docs/BENCH.md) must stay numerically exact — it is
    a supported fold_hifigan flag, not dead code."""
    cfg = tiny_v1()
    params = init_hifigan(jax.random.PRNGKey(3), cfg)
    folded = fold_hifigan(params, cfg, unfold_dilated=True)
    # at least one r>1 dilated conv must actually take the unfolded form
    assert any(
        p.fold == 1 and p.dil > 1
        for st in folded["stages"] for blk in st
        for p in blk.get("convs1", blk.get("convs", []))
    )
    rng = np.random.default_rng(3)
    mel = jnp.asarray(np.clip(rng.standard_normal((2, 24, cfg.num_mels)) - 4, -10, 2).astype(np.float32))
    ref = np.asarray(apply_hifigan(params, cfg, mel))
    out = np.asarray(apply_hifigan_folded(folded, cfg, mel))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_folded_matches_standard_masked():
    """Bucket masking (mel_len) must stay row-exact through the folds."""
    cfg = tiny_v1()
    params = init_hifigan(jax.random.PRNGKey(1), cfg)
    folded = fold_hifigan(params, cfg)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(np.clip(rng.standard_normal((2, 24, cfg.num_mels)) - 4, -10, 2).astype(np.float32))
    mel_len = jnp.asarray([15, 24], jnp.int32)

    ref = np.asarray(apply_hifigan(params, cfg, mel, mel_len=mel_len))
    out = np.asarray(apply_hifigan_folded(folded, cfg, mel, mel_len=mel_len))
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # and masked == exact-length run on the valid prefix
    hop = cfg.hop_recovery
    exact = np.asarray(apply_hifigan(params, cfg, mel[:1, :15]))
    np.testing.assert_allclose(out[0, : 15 * hop], exact[0], atol=2e-5)


def test_folded_preserves_dtype():
    cfg = tiny_v1()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_hifigan(jax.random.PRNGKey(0), cfg)
    )
    folded = fold_hifigan(params, cfg)
    assert folded["conv_pre"].wf.dtype == jnp.bfloat16
    # and the folded tree jits as a pytree argument (pads are static aux)
    out = jax.jit(lambda f, m: apply_hifigan_folded(f, cfg, m))(
        folded, jnp.zeros((1, 8, cfg.num_mels), jnp.bfloat16)
    )
    assert out.shape == (1, 8 * cfg.hop_recovery)
