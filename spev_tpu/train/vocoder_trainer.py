"""HiFi-GAN adversarial training (the vocoder the reference could only
download, now trainable/fine-tunable in-framework).

Losses per the HiFi-GAN paper (PAPERS.md):

    L_D = Σ_k (1 − D_k(y))² + D_k(ŷ)²                       (LSGAN)
    L_G = Σ_k (1 − D_k(ŷ))² + 2·L_FM + 45·L_mel
    L_FM = Σ_k Σ_l ‖f_l(y) − f_l(ŷ)‖₁ (mean)
    L_mel = ‖mel(y) − mel(ŷ)‖₁        (framework log-mel kernels)

Optimizers: AdamW(2e-4, β=(0.8, 0.99)) with 0.999 exponential LR decay per
epoch — the upstream recipe.  Fine-tuning mode (the ``LJ_FT`` workflow)
simply initializes the generator from an imported checkpoint and trains on
(acoustic-model mel, ground-truth audio) pairs.

Both update steps are single jitted graphs with the same masked NaN-skip
policy as the acoustic trainer; data parallelism comes from the same mesh
shardings.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from spev_tpu.config import AudioConfig
from spev_tpu.models.hifigan import HiFiGANConfig, apply_hifigan, init_hifigan
from spev_tpu.models.hifigan_disc import apply_discriminators, init_discriminators
from spev_tpu.ops.stft import log_mel_spectrogram


class VocoderTrainState(NamedTuple):
    gen_params: Any
    disc_params: Any
    gen_opt: Any
    disc_opt: Any
    step: jnp.ndarray


def make_vocoder_optimizer(lr: float = 2e-4, decay: float = 0.999, decay_every: int = 1000):
    sched = optax.exponential_decay(lr, transition_steps=decay_every, decay_rate=decay)
    return optax.adamw(sched, b1=0.8, b2=0.99, weight_decay=0.01)


def init_vocoder_train_state(
    key, cfg: HiFiGANConfig, gen_params=None, periods=None, n_scales: int = 3,
    lr: float = 2e-4,
) -> VocoderTrainState:
    """gen_params: pass imported upstream params to fine-tune (the LJ_FT
    workflow); None trains from scratch."""
    from spev_tpu.models.hifigan_disc import MPD_PERIODS

    kg, kd = jax.random.split(key)
    gen = gen_params if gen_params is not None else init_hifigan(kg, cfg)
    disc = init_discriminators(kd, periods=periods or MPD_PERIODS, n_scales=n_scales)
    return VocoderTrainState(
        gen_params=gen,
        disc_params=disc,
        gen_opt=make_vocoder_optimizer(lr).init(gen),
        disc_opt=make_vocoder_optimizer(lr).init(disc),
        step=jnp.zeros((), jnp.int32),
    )


def _mel_l1(a: jnp.ndarray, b: jnp.ndarray, audio: AudioConfig) -> jnp.ndarray:
    f = lambda y: log_mel_spectrogram(
        y, sr=audio.sample_rate, n_fft=audio.n_fft, hop_length=audio.hop_length,
        n_mels=audio.n_mels, fmin=0.0, fmax=audio.sample_rate / 2,
    )
    ma = jax.vmap(f)(a)
    mb = jax.vmap(f)(b)
    return jnp.mean(jnp.abs(ma - mb))


def make_vocoder_train_step(
    cfg: HiFiGANConfig,
    audio: AudioConfig = AudioConfig(),
    fm_weight: float = 2.0,
    mel_weight: float = 45.0,
    periods=None,
    lr: float = 2e-4,
    mesh=None,
    folded: bool = False,
    fused: bool = False,
    disc_dtype: str | None = None,
) -> Callable:
    """step(state, mel (B,T,M), wav (B,T·hop)) → (state, metrics).

    By default D and G updates are SEPARATE jitted graphs (upstream order
    preserved: D on the detached fake first, then G against the updated D).
    ``lr`` must match the one the state was initialized with (the schedule
    lives in the optimizer closure, the position in the opt state).

    ``folded=True`` runs the generator's training forward/backward through
    the polyphase-folded graph (`models/hifigan_folded.py`) with a TRACED
    differentiable weight fold: the same arithmetic at MXU-shaped channel
    widths, gradients flowing back to the canonical torch-layout params
    (so checkpoints/export are unchanged).  Float-rounding-level output
    differences vs the unfolded graph (contraction order); the loss
    trajectory is equivalent (tests/test_vocoder_training.py).

    ``fused=True`` replaces the two-dispatch step with ONE jitted graph
    that computes the generator forward ONCE per step via `jax.vjp`
    (upstream torch semantics exactly: y_g_hat is computed once, D updates
    on its detached value, G's loss runs against the UPDATED D through the
    same forward's saved residuals).  The split path pays a full extra
    generator forward inside d_step every step.

    With ``mesh`` (a Mesh with a 'data' axis), the crop batch is sharded
    over 'data' and the GAN state is replicated — XLA emits the gradient
    all-reduce over ICI from the shardings alone, exactly like the
    acoustic trainer (parallel/mesh.py).  Batch size must divide the data
    axis.  The GAN is all convolutions at tiny channel counts, so data
    parallelism is the only axis that pays here.
    """
    opt = make_vocoder_optimizer(lr)
    # bf16 discriminator mode (docs/BENCH.md): the D stacks are
    # bandwidth-bound narrow-channel convs, so halving activation/weight
    # bytes buys real wall time; losses still accumulate in f32 below and
    # the master params/optimizer stay f32 throughout.
    d_dt = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16}.get(disc_dtype or "")
    f32 = lambda x: x.astype(jnp.float32)

    if folded:
        from spev_tpu.models.hifigan_folded import (apply_hifigan_folded,
                                                    fold_hifigan)

        def gen_fwd(gp, mel):
            return apply_hifigan_folded(
                fold_hifigan(gp, cfg, traced=True), cfg, mel)
    else:
        def gen_fwd(gp, mel):
            return apply_hifigan(gp, cfg, mel)

    d_jit: dict = {}
    g_jit: dict = {}
    f_jit: dict = {}
    if mesh is not None:
        from spev_tpu.parallel.mesh import batch_sharding, replicated

        rep, b_sh = replicated(mesh), batch_sharding(mesh)
        # prefix pytrees: one sharding covers the whole state / aux subtree
        d_jit = dict(in_shardings=(rep, b_sh, b_sh),
                     out_shardings=(rep, rep, rep))
        g_jit = dict(in_shardings=(rep, b_sh, b_sh),
                     out_shardings=(rep, rep, rep, rep))
        f_jit = dict(in_shardings=(rep, b_sh, b_sh),
                     out_shardings=(rep, rep))

    def d_loss_fn(disc_params, real, fake):
        # D loss: every sub-discriminator runs ONCE on concat([real, fake]).
        # The discs are plain convs (no normalization mixing samples), so
        # this is mathematically identical to two separate passes but
        # halves the conv dispatches and doubles the rows each conv tiles
        # onto the MXU.  The backward here is w.r.t. disc WEIGHTS, which
        # both halves feed anyway — batching adds no extra grad work.
        B = real.shape[0]
        outs = apply_discriminators(
            disc_params, jnp.concatenate([real, fake], axis=0), periods=periods,
            dtype=d_dt,
        )
        loss = 0.0
        for l, _ in outs:
            l = f32(l)
            loss = loss + jnp.mean((1.0 - l[:B]) ** 2) + jnp.mean(l[B:] ** 2)
        return loss

    def g_loss_from_fake(fake, disc_params, real):
        # G loss terms given an already-computed fake: real and fake
        # disc passes stay SEPARATE (the real pass carries no gradient,
        # so JAX builds no backward for it; a concat would drag the real
        # half through every disc conv-transpose).
        outs_r = apply_discriminators(disc_params, real, periods=periods,
                                      dtype=d_dt)
        outs_f = apply_discriminators(disc_params, fake, periods=periods,
                                      dtype=d_dt)
        adv = 0.0
        fm = 0.0
        for (_, fr), (lf, ff) in zip(outs_r, outs_f):
            adv = adv + jnp.mean((1.0 - f32(lf)) ** 2)
            for a, b in zip(fr, ff):
                # subtract at the compute dtype, accumulate the L1 in f32
                fm = fm + jnp.mean(f32(jnp.abs(a - b)))
        mel_l1 = _mel_l1(real, fake, audio)
        total = adv + fm_weight * fm + mel_weight * mel_l1
        return total, {"g_adv": adv, "g_fm": fm, "g_mel": mel_l1}

    def g_loss_fn(gen_params, disc_params, mel, real):
        fake = gen_fwd(gen_params, mel)
        return g_loss_from_fake(fake, disc_params, real)

    # donate the state: params + both optimizer states are ~1.7 GB of HBM
    # round-tripped per update — in-place reuse removes the copy and the
    # double-capacity allocation (harmless no-op on CPU)
    @functools.partial(jax.jit, donate_argnums=(0,), **d_jit)
    def d_step(state: VocoderTrainState, mel, wav):
        fake = jax.lax.stop_gradient(gen_fwd(state.gen_params, mel))
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params, wav, fake)
        ok = jnp.isfinite(d_loss)
        d_grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), d_grads)
        d_updates, d_opt = opt.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        keep = lambda old, new: jax.tree.map(lambda o, n: jnp.where(ok, n, o), old, new)
        return state._replace(
            disc_params=keep(state.disc_params, disc_params),
            disc_opt=keep(state.disc_opt, d_opt),
        ), d_loss, ok

    @functools.partial(jax.jit, donate_argnums=(0,), **g_jit)
    def g_step(state: VocoderTrainState, mel, wav):
        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params, state.disc_params, mel, wav
        )
        ok = jnp.isfinite(g_loss)
        g_grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), g_grads)
        g_updates, g_opt = opt.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        keep = lambda old, new: jax.tree.map(lambda o, n: jnp.where(ok, n, o), old, new)
        return state._replace(
            gen_params=keep(state.gen_params, gen_params),
            gen_opt=keep(state.gen_opt, g_opt),
        ), g_loss, aux, ok

    @functools.partial(jax.jit, donate_argnums=(0,), **f_jit)
    def dg_step(state: VocoderTrainState, mel, wav):
        # ONE generator forward per step (upstream torch semantics): the
        # vjp saves the forward's residuals, D updates on the detached
        # fake, and G's backward reuses the residuals against the UPDATED
        # discriminators — the split path pays a second full generator
        # forward inside d_step instead.
        fake, gen_vjp = jax.vjp(lambda gp: gen_fwd(gp, mel), state.gen_params)
        keep = lambda ok: (
            lambda old, new: jax.tree.map(lambda o, n: jnp.where(ok, n, o), old, new))

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.disc_params, wav, jax.lax.stop_gradient(fake))
        d_ok = jnp.isfinite(d_loss)
        d_grads = jax.tree.map(lambda g: jnp.where(d_ok, g, jnp.zeros_like(g)), d_grads)
        d_updates, d_opt = opt.update(d_grads, state.disc_opt, state.disc_params)
        disc_params = keep(d_ok)(
            state.disc_params, optax.apply_updates(state.disc_params, d_updates))
        disc_opt = keep(d_ok)(state.disc_opt, d_opt)

        (g_loss, aux), fake_ct = jax.value_and_grad(
            g_loss_from_fake, has_aux=True)(fake, disc_params, wav)
        (g_grads,) = gen_vjp(fake_ct)
        g_ok = jnp.isfinite(g_loss)
        g_grads = jax.tree.map(lambda g: jnp.where(g_ok, g, jnp.zeros_like(g)), g_grads)
        g_updates, g_opt = opt.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = keep(g_ok)(
            state.gen_params, optax.apply_updates(state.gen_params, g_updates))
        gen_opt = keep(g_ok)(state.gen_opt, g_opt)

        ok = d_ok & g_ok
        metrics = {"d_loss": d_loss, "g_loss": g_loss,
                   "skipped": 1.0 - ok.astype(jnp.float32), **aux}
        return VocoderTrainState(
            gen_params=gen_params, disc_params=disc_params,
            gen_opt=gen_opt, disc_opt=disc_opt,
            step=state.step + ok.astype(jnp.int32),
        ), metrics

    if fused:
        def step(state: VocoderTrainState, mel, wav):
            return dg_step(state, mel, wav)
    else:
        def step(state: VocoderTrainState, mel, wav):
            state, d_loss, d_ok = d_step(state, mel, wav)
            state, g_loss, aux, g_ok = g_step(state, mel, wav)
            ok = d_ok & g_ok
            state = state._replace(step=state.step + ok.astype(jnp.int32))
            metrics = {"d_loss": d_loss, "g_loss": g_loss,
                       "skipped": 1.0 - ok.astype(jnp.float32), **aux}
            return state, metrics

    # expose the jitted graphs for profiling/MFU accounting and the
    # discriminator-warmup path (tools/tpu_vocoder_profile.py reads
    # compiled cost_analysis off them)
    step.d_step = d_step
    step.g_step = g_step
    step.dg_step = dg_step
    return step


def save_generator(path: str, state: VocoderTrainState, cfg: HiFiGANConfig) -> None:
    """Export the trained generator in the upstream {'generator': sd}
    layout so the reference (and our Vocoder) can load it."""
    from spev_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(path, state.gen_params, step=int(state.step),
                    model_config={"hifigan": True, "resblock": cfg.resblock,
                                  "upsample_rates": list(cfg.upsample_rates)})


def save_state(path: str, state: VocoderTrainState) -> None:
    """Full GAN train-state checkpoint: generator + discriminators + both
    optimizer states + step.  Upstream HiFi-GAN resumes its ``do_*``
    discriminator/optimizer checkpoints alongside ``g_*``; resuming from a
    generator-only ``gen_*.spev`` restarts the discriminators and loses
    the adversarial equilibrium (and the LR-schedule position)."""
    import os

    from flax import serialization

    payload = serialization.to_state_dict(
        jax.tree.map(np.asarray, dict(state._asdict())))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_state(path: str, template: VocoderTrainState) -> VocoderTrainState:
    """Restore a `save_state` checkpoint into ``template``'s structure
    (build the template with the SAME --config/--periods/--scales; a
    structure mismatch raises with the differing paths)."""
    from flax import serialization

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    restored = serialization.from_state_dict(dict(template._asdict()), raw)
    return VocoderTrainState(**restored)
