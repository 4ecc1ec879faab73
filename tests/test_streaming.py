"""Streaming vocoder: chunked synthesis must be sample-exact vs the full
pass when the context covers the receptive field; clause splitting and
incremental text synthesis."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator, apply_hifigan, init_hifigan
from spev_tpu.infer.streaming import receptive_field_frames, split_clauses, stream_vocode


@pytest.fixture(scope="module")
def gen():
    cfg = HiFiGANConfig(
        resblock="2",
        upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
        num_mels=8,
    )
    return HiFiGANGenerator(cfg, init_hifigan(jax.random.PRNGKey(0), cfg))


def test_receptive_field_reasonable(gen):
    rf = receptive_field_frames(gen.cfg)
    assert 4 <= rf <= 64


def test_stream_matches_full_pass(gen):
    rng = np.random.default_rng(0)
    T = 70
    mel = jnp.asarray(rng.standard_normal((T, 8)).astype(np.float32) - 4)
    full = np.asarray(apply_hifigan(gen.params, gen.cfg, mel[None])[0])
    chunks = list(stream_vocode(gen, mel, chunk_frames=16))
    streamed = np.concatenate(chunks)
    hop = gen.cfg.hop_recovery
    assert streamed.shape[0] == T * hop
    # interior chunks must be sample-exact; the very first samples see the
    # floor padding instead of nothing (both ≈ silence) — compare beyond
    # one receptive field
    rf = receptive_field_frames(gen.cfg) * hop
    np.testing.assert_allclose(streamed[rf:], full[rf : T * hop], atol=1e-4)


def test_chunk_latency_shape(gen):
    mel = jnp.zeros((33, 8)) - 4.0
    chunks = list(stream_vocode(gen, mel, chunk_frames=16))
    hop = gen.cfg.hop_recovery
    assert [len(c) for c in chunks] == [16 * hop, 16 * hop, 1 * hop]


def test_stream_bf16_params_f32_mel(gen):
    """bf16 serving params + f32 mel must not fail the conv dtype check
    (both vocoder paths cast the input to the params' dtype), and repeat
    streams must reuse ONE cached jitted graph."""
    gen16 = HiFiGANGenerator(gen.cfg, jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), gen.params))
    mel = jnp.zeros((20, 8), jnp.float32) - 4.0
    out1 = np.concatenate(list(stream_vocode(gen16, mel, chunk_frames=16)))
    assert out1.shape[0] == 20 * gen.cfg.hop_recovery
    assert np.all(np.isfinite(out1))
    # folded path too (explicitly, regardless of platform)
    run_f, vparams_f = gen16.jitted_runtime(prefer_folded=True)
    wav = run_f(vparams_f, mel[None])
    assert np.all(np.isfinite(np.asarray(wav, np.float32)))
    # the cached jit wrapper is stable across calls (no per-stream re-jit)
    run_a, _ = gen16.jitted_runtime()
    run_b, _ = gen16.jitted_runtime()
    assert run_a is run_b


def test_split_clauses():
    cs = split_clauses("Hello there, my friend. How are you today? Good.")
    assert len(cs) >= 2
    assert "Hello there," in cs[0]
    assert split_clauses("short") == ["short"]
    # everything is preserved
    joined = " ".join(cs).replace("  ", " ")
    for word in ("Hello", "friend", "today", "Good"):
        assert word in joined
