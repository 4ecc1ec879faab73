"""Trainer: sharded train step on a multi-device CPU mesh, NaN-skip masked
updates, warmup LR schedule, checkpoint round-trip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spev_tpu.config import SpevConfig, ModelConfig, TrainConfig
from spev_tpu.parallel.mesh import make_mesh, shard_batch
from spev_tpu.train.trainer import (
    TrainState,
    init_train_state,
    make_train_step,
    make_eval_step,
)
from spev_tpu.train.checkpoint import save_checkpoint, load_checkpoint_into

P, M, H, V, NMEL = 16, 64, 32, 23, 8


def tiny_cfg(**train_kw):
    return SpevConfig(
        model=ModelConfig(
            vocab_size=V, embed_dim=H, hidden_dim=H, n_mels=NMEL,
            max_phonemes=P, max_frames=M,
        ),
        train=TrainConfig(batch_size=8, warmup_steps=10, **train_kw),
    )


def synth_batch(rng, B=8, n_ph=10):
    ids = np.zeros((B, P), np.int32)
    ids[:, :n_ph] = rng.integers(1, V, size=(B, n_ph))
    durs = np.zeros((B, P), np.float32)
    durs[:, :n_ph] = rng.integers(1, 5, size=(B, n_ph))
    mel_lens = durs.sum(axis=1).astype(np.int32)
    mel = np.zeros((B, M, NMEL), np.float32)
    for b in range(B):
        mel[b, : mel_lens[b]] = rng.standard_normal((mel_lens[b], NMEL)) - 4.0
    feat = lambda lo, hi: np.where(
        durs > 0, rng.uniform(lo, hi, (B, P)).astype(np.float32), 0.0
    )
    return {
        "ids": ids,
        "lens": np.full((B,), n_ph, np.int32),
        "durs": durs,
        "mel": np.clip(mel, -10, 2),
        "mel_lens": mel_lens,
        "log_durs": np.log(np.maximum(durs, 1) + 1) * (durs > 0),
        "pitch": feat(-1, 1),
        "energy": feat(-1, 1),
        "breath": feat(0, 0.8),
        "rough": feat(0, 1.5),
        "bright": feat(-1, 1),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    mesh = make_mesh((4, 2), ("data", "model"))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, mesh, state.params, use_dropout=False)
    return cfg, mesh, state, step


@pytest.mark.slow
def test_loss_decreases_on_fixed_batch(setup):
    cfg, mesh, state, step = setup
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, synth_batch(rng))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
        assert float(metrics["skipped"]) == 0.0
    assert int(state.step) == 8
    assert losses[-1] < losses[0]


def test_warmup_lr_schedule(setup):
    cfg, mesh, _, step = setup
    state = init_train_state(jax.random.PRNGKey(2), cfg)
    batch = shard_batch(mesh, synth_batch(np.random.default_rng(1)))
    key = jax.random.PRNGKey(0)
    state, m1 = step(state, batch, key)
    # first applied update: lr = base * 1/warmup_steps
    assert float(m1["lr"]) == pytest.approx(cfg.train.learning_rate / cfg.train.warmup_steps)


def test_nan_batch_skipped_params_unchanged(setup):
    cfg, mesh, _, step = setup
    state = init_train_state(jax.random.PRNGKey(3), cfg)
    batch = synth_batch(np.random.default_rng(2))
    batch["mel"][0, 0, 0] = np.nan
    batch = shard_batch(mesh, batch)
    before = jax.tree.map(np.asarray, state.params)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    assert int(state.step) == 0
    after = jax.tree.map(np.asarray, state.params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_duration_only_warmup_phase(setup):
    cfg, mesh, _, _ = setup
    state = init_train_state(jax.random.PRNGKey(4), cfg)
    step0 = make_train_step(cfg, mesh, state.params, variance_weight=0.0, use_dropout=False)
    batch = shard_batch(mesh, synth_batch(np.random.default_rng(3)))
    _, metrics = step0(state, batch, jax.random.PRNGKey(0))
    expected = cfg.train.w_mel * float(metrics["l_mel"]) + cfg.train.w_duration * float(
        metrics["l_dur"]
    )
    assert float(metrics["loss"]) == pytest.approx(expected, rel=1e-5)


def test_eval_step(setup):
    cfg, mesh, _, _ = setup
    # fresh state: the shared fixture state was donated by the train step
    state = init_train_state(jax.random.PRNGKey(7), cfg)
    ev = make_eval_step(cfg, mesh, state.params)
    batch = shard_batch(mesh, synth_batch(np.random.default_rng(4)))
    m = ev(state.params, batch)
    assert np.isfinite(float(m["val_mel"])) and np.isfinite(float(m["val_aux"]))


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, mesh, _, step = setup
    state = init_train_state(jax.random.PRNGKey(8), cfg)
    batch = shard_batch(mesh, synth_batch(np.random.default_rng(5)))
    state, _ = step(state, batch, jax.random.PRNGKey(9))
    path = str(tmp_path / "ck.spev")
    save_checkpoint(
        path, state.params, state.opt_state, step=int(state.step), epoch=3,
        vocab=["<PAD>", "a"], stats={"p_mean": 5.0},
    )
    fresh = init_train_state(jax.random.PRNGKey(42), cfg)
    restored, epoch = load_checkpoint_into(path, fresh)
    assert epoch == 3
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_grad_accumulation_matches_full_batch():
    """accum=2 over a batch must produce the SAME parameter update as
    accum=1 on the same data (deterministic, no dropout).

    Exact equivalence requires the loss denominators to match across micro
    batches: equal phoneme counts (masked-MSE denominators) and equal
    ``mel_lens`` (the reference's unmasked mel mean over the batch max) —
    reference accumulation semantics, spev_real_metrics.py:541-585."""
    cfg1 = tiny_cfg()
    import dataclasses
    cfg2 = dataclasses.replace(cfg1, train=dataclasses.replace(cfg1.train, grad_accum=2))
    mesh = make_mesh((1,), ("data",))
    rng = np.random.default_rng(7)
    batch = synth_batch(rng)
    # denominator-match the micro batches: every sample gets the same
    # duration total (same mel_lens) — synth_batch already uses equal n_ph
    B = batch["ids"].shape[0]
    durs = np.zeros_like(batch["durs"])
    durs[:, :10] = 3.0
    mel_lens = durs.sum(axis=1).astype(np.int32)
    mel = np.zeros_like(batch["mel"])
    for b in range(B):
        mel[b, : mel_lens[b]] = rng.standard_normal((mel_lens[b], NMEL)) - 4.0
    batch.update(
        durs=durs, mel_lens=mel_lens, mel=np.clip(mel, -10, 2),
        log_durs=(np.log(durs + 1) * (durs > 0)).astype(np.float32),
    )

    s1 = init_train_state(jax.random.PRNGKey(11), cfg1)
    s2 = init_train_state(jax.random.PRNGKey(11), cfg2)
    step1 = make_train_step(cfg1, mesh, s1.params, use_dropout=False)
    step2 = make_train_step(cfg2, mesh, s2.params, use_dropout=False)
    key = jax.random.PRNGKey(0)
    s1, m1 = step1(s1, shard_batch(mesh, batch), key)
    s2, m2 = step2(s2, shard_batch(mesh, batch), key)
    assert float(m1["skipped"]) == float(m2["skipped"]) == 0.0
    assert int(s1.step) == int(s2.step) == 1
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(s1.params)
    flat2 = jax.tree.leaves(s2.params)
    assert len(flat1) == len(flat2)
    # atol: Adam normalizes the first-step update to ±lr (1e-4); summation-
    # order fp noise in near-zero grads shows up as ≤5e-6 there.  A real
    # denominator bug (e.g. missing /accum) would shift updates by ~5e-5.
    for (path, a), b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=5e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )


def test_grad_accumulation_skips_nan_micro_batch():
    import dataclasses
    cfg = tiny_cfg()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, grad_accum=2))
    mesh = make_mesh((1,), ("data",))
    batch = synth_batch(np.random.default_rng(8))
    batch["mel"][0, 0, 0] = np.nan  # poisons only the first micro batch
    state = init_train_state(jax.random.PRNGKey(12), cfg)
    step = make_train_step(cfg, mesh, state.params, use_dropout=False)
    state, metrics = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(0))
    # window still applies (second micro batch was finite)
    assert float(metrics["skipped"]) == 0.0
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_tensor_parallel_weights_actually_sharded():
    """On a (data, model) mesh the FFN weights must be physically sharded
    over the model axis (Megatron layout), not replicated."""
    from spev_tpu.parallel.mesh import param_shardings
    cfg = tiny_cfg()
    mesh = make_mesh((4, 2), ("data", "model"))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    shardings = param_shardings(mesh, state.params)
    blk = shardings["encoder_blocks"][0]
    # conv1 column-parallel: dim 0 sharded over model
    assert blk["conv1"]["weight"].spec == jax.sharding.PartitionSpec("model")
    # conv2 row-parallel: dim 1 sharded over model
    assert blk["conv2"]["weight"].spec == jax.sharding.PartitionSpec(None, "model")
    # place a param and check device shards are halves
    w = jax.device_put(state.params["encoder_blocks"][0]["conv1"]["weight"],
                       blk["conv1"]["weight"])
    shard_rows = {s.data.shape[0] for s in w.addressable_shards}
    assert shard_rows == {w.shape[0] // 2}
    # attention in_proj (3, H, H): dim 1 sharded → each shard holds whole
    # heads of q, k AND v (head-aligned Megatron layout, not a mid-k cut)
    assert blk["attention"]["in_proj_weight"].spec == jax.sharding.PartitionSpec(None, "model")
    wq = jax.device_put(state.params["encoder_blocks"][0]["attention"]["in_proj_weight"],
                        blk["attention"]["in_proj_weight"])
    d_head = H // 2  # tiny_cfg: n_heads=2, model axis=2 → one head per shard
    for s in wq.addressable_shards:
        assert s.data.shape == (3, d_head, H)


def test_tensor_parallel_block_collectives_are_megatron():
    """Compiled HLO of one sharded FFT block must show the Megatron
    signature: exactly 2 all-reduces (attention out_proj + FFN conv2) and
    NO resharding collectives (all-gather / collective-permute /
    all-to-all) — i.e. the head-aligned in_proj layout never forces XLA to
    regather q/k/v (SURVEY §2.4)."""
    import re
    from jax.sharding import NamedSharding, PartitionSpec
    from spev_tpu.models.fastspeech2 import _fft_block
    from spev_tpu.parallel.mesh import param_shardings

    cfg = tiny_cfg().model
    mesh = make_mesh((1, 2), ("data", "model"))
    params = init_train_state(jax.random.PRNGKey(0), tiny_cfg()).params
    blk = params["encoder_blocks"][0]
    blk_sh = param_shardings(mesh, {"encoder_blocks": [blk]})["encoder_blocks"][0]
    blk = jax.device_put(blk, blk_sh)
    x = jax.device_put(jnp.zeros((4, P, H)), NamedSharding(mesh, PartitionSpec("data")))
    mask = jax.device_put(jnp.zeros((4, P), bool), NamedSharding(mesh, PartitionSpec("data")))

    fn = jax.jit(lambda p, x, m: _fft_block(p, x, cfg, m, None, True))
    txt = fn.lower(blk, x, mask).compile().as_text()

    def count(op):
        return len(re.findall(rf"{op}\(", txt)) + len(re.findall(rf"{op}-start", txt))

    assert count("all-reduce") == 2, txt[:2000]
    for op in ("all-gather", "collective-permute", "all-to-all", "reduce-scatter"):
        assert count(op) == 0, op


@pytest.mark.slow
def test_remat_train_step_matches_plain():
    """remat=True (both granularities) must change memory, not math: one
    train step from the same init on the same batch yields the same loss
    and allclose params vs the no-remat step."""
    import dataclasses

    cfg = tiny_cfg()
    variants = [cfg] + [
        dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat=True, remat_policy=p)
        )
        for p in ("full", "dots")
    ]
    mesh = make_mesh((1, 1), ("data", "model"))
    batch = shard_batch(mesh, synth_batch(np.random.default_rng(7)))
    outs = []
    for c in variants:
        state = init_train_state(jax.random.PRNGKey(5), c)
        step = make_train_step(c, mesh, state.params, use_dropout=False)
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        outs.append((float(metrics["loss"]), state.params))
    for loss_r, params_r in outs[1:]:
        assert outs[0][0] == pytest.approx(loss_r, rel=1e-6)
        for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(params_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_mixed_precision_forward_matches_high_and_grads_close():
    """'mixed' matmul precision must keep the forward (loss) bitwise equal
    to 'high' — the custom-VJP wrappers change only cotangent matmuls — and
    its one-step parameter update must stay close to the 'high' step (on
    CPU all precision strings lower identically, so this also pins that the
    custom VJPs compute the *correct* gradients, not just fast ones)."""
    import dataclasses

    mesh = make_mesh((1, 1), ("data", "model"))
    batch = shard_batch(mesh, synth_batch(np.random.default_rng(11)))
    outs = {}
    for prec in ("high", "mixed"):
        cfg = tiny_cfg(matmul_precision=prec)
        state = init_train_state(jax.random.PRNGKey(5), cfg)
        step = make_train_step(cfg, mesh, state.params, use_dropout=False)
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        outs[prec] = (float(metrics["loss"]), state.params)
    assert outs["high"][0] == pytest.approx(outs["mixed"][0], rel=1e-6)
    for a, b in zip(jax.tree.leaves(outs["high"][1]), jax.tree.leaves(outs["mixed"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_mixed_precision_dropout_and_vmap_paths():
    """The custom-VJP primitives must compose with vmap (fused predictors)
    and dropout rngs: a dropout-on mixed step runs and applies an update."""
    cfg = tiny_cfg(matmul_precision="mixed")
    mesh = make_mesh((1, 1), ("data", "model"))
    batch = shard_batch(mesh, synth_batch(np.random.default_rng(3)))
    state = init_train_state(jax.random.PRNGKey(2), cfg)
    step = make_train_step(cfg, mesh, state.params, use_dropout=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped"]) == 0.0
    assert int(new_state.step) == 1


def test_dropout_rng_impl_rbg_runs_and_auto_is_threefry_on_cpu():
    """TrainConfig.dropout_rng_impl='rbg' (the TPU-default fast path for
    dropout mask bits) must run through both the direct and grad-accum
    step paths; 'auto' must resolve to threefry off-TPU so CPU-calibrated
    trajectories (docs/QUALITY.md) are unaffected."""
    from spev_tpu.train.trainer import _resolve_dropout_impl

    mesh = make_mesh((1, 1), ("data", "model"))
    batch = shard_batch(mesh, synth_batch(np.random.default_rng(5)))
    key = jax.random.PRNGKey(7)

    losses = {}
    for impl, accum in [("threefry", 1), ("auto", 1), ("rbg", 1), ("rbg", 2)]:
        cfg = tiny_cfg(dropout_rng_impl=impl, grad_accum=accum)
        state = init_train_state(jax.random.PRNGKey(2), cfg)
        step = make_train_step(cfg, mesh, state.params, use_dropout=True)
        _, metrics = step(state, batch, key)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), (impl, accum)
        losses[(impl, accum)] = loss

    assert _resolve_dropout_impl(tiny_cfg(dropout_rng_impl="auto")) == "threefry"
    # same masks -> identical loss for auto vs explicit threefry on CPU
    assert losses[("auto", 1)] == losses[("threefry", 1)]
    # rbg draws a different mask stream but stays in the same ballpark
    assert abs(losses[("rbg", 1)] - losses[("threefry", 1)]) < 0.5
