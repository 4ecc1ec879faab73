"""Decompose train-step wall time on a LIVE TPU chip.

Times nested subsets of the full train step (B=16, P=128, M=768,
parity-grade 'high' precision unless overridden) so the MFU work
(VERDICT r2 #6) targets the actual cost centers instead of guesses:

  fwd            — loss_fn forward, deterministic
  fwd_dropout    — loss_fn forward with dropout rngs (threefry cost)
  grad           — value_and_grad (fwd + bwd), with dropout
  grad_nodrop    — value_and_grad, deterministic
  step           — full train step (grad + clip + AdamW + masked update)
  step_xla_lr    — full step with the Pallas LR kernel disabled
  step_seq_vp    — full step with fused_predictors=False

Each row reports wall ms and compiled-FLOPs MFU.  Usage:
  timeout 1800 python tools/tpu_step_anatomy.py [--precision high|default]
Appends JSON lines to docs/train_profile.jsonl (variant key "anatomy/*").
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import probe_backend, _peak_flops, _compiled_flops  # noqa: E402
from tools.tpu_train_profile import make_batch  # noqa: E402


def time_it(fn, *args, n_iter=30, fetch):
    import jax

    for _ in range(3):
        out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precision", default="high")
    ap.add_argument("--n_iter", type=int, default=30)
    args = ap.parse_args()

    info = probe_backend(probe_deadline=time.monotonic() + 120)
    if not info.get("ok"):
        print(json.dumps({"error": "tpu_unavailable", **info}), flush=True)
        return 1

    import jax
    import jax.numpy as jnp
    from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
    from spev_tpu.parallel.mesh import make_mesh, shard_batch
    from spev_tpu.train.trainer import (
        _loss_fn, init_train_state, make_train_step,
    )
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, P, M = 16, 128, 768
    peak = _peak_flops()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "docs", "train_profile.jsonl")

    def emit(name, dt, flops):
        rec = {
            "variant": f"anatomy/{name}", "B": B, "precision": args.precision,
            "step_ms": round(dt * 1000, 2),
            "mfu": round(flops / dt / peak, 4) if (flops and peak) else None,
        }
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def build_cfg(**model_kw):
        return SpevConfig(
            model=ModelConfig(vocab_size=128, max_phonemes=P, max_frames=M, **model_kw),
            train=TrainConfig(batch_size=B, matmul_precision=args.precision),
        )

    cfg = build_cfg()
    mesh = make_mesh((1,), ("data",))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    batch = shard_batch(mesh, make_batch(B, P, M, rng))

    from spev_tpu.models import modules as nn_mod

    nn_mod.set_matmul_precision(args.precision)

    # --- forward only -----------------------------------------------------
    fwd = jax.jit(lambda p, b: _loss_fn(p, cfg, b, None, 1.0)[0])
    dt = time_it(fwd, state.params, batch, n_iter=args.n_iter, fetch=float)
    emit("fwd", dt, _compiled_flops(fwd, state.params, batch))

    fwd_d = jax.jit(lambda p, b, r: _loss_fn(p, cfg, b, r, 1.0)[0])
    dt = time_it(fwd_d, state.params, batch, key, n_iter=args.n_iter, fetch=float)
    emit("fwd_dropout", dt, _compiled_flops(fwd_d, state.params, batch, key))

    # --- grad only --------------------------------------------------------
    def g_fn(p, b, r):
        (l, _), g = jax.value_and_grad(
            lambda pp: _loss_fn(pp, cfg, b, r, 1.0), has_aux=True)(p)
        return l, g

    grad_j = jax.jit(g_fn)

    def fetch_lg(out):
        l, g = out
        float(l)
        float(jnp.asarray(jax.tree.leaves(g)[0]).sum())

    dt = time_it(grad_j, state.params, batch, key, n_iter=args.n_iter, fetch=fetch_lg)
    emit("grad", dt, _compiled_flops(grad_j, state.params, batch, key))

    grad_nd = jax.jit(lambda p, b: g_fn(p, b, None))
    dt = time_it(grad_nd, state.params, batch, n_iter=args.n_iter, fetch=fetch_lg)
    emit("grad_nodrop", dt, _compiled_flops(grad_nd, state.params, batch))

    # --- full steps (fresh state per variant: donation consumes buffers) --
    def run_step(name, cfg_v):
        st = init_train_state(jax.random.PRNGKey(0), cfg_v)
        step = make_train_step(cfg_v, mesh, st.params, use_dropout=True)
        flops = _compiled_flops(step, st, batch, key)

        def fetch(out):
            st2, m = out
            float(m["loss"])
            float(jnp.asarray(jax.tree.leaves(st2.params)[0]).sum())

        # donation: keep a fresh state flowing
        for _ in range(3):
            st, m = step(st, batch, key)
        fetch((st, m))
        t0 = time.perf_counter()
        for _ in range(args.n_iter):
            st, m = step(st, batch, key)
        fetch((st, m))
        emit(name, (time.perf_counter() - t0) / args.n_iter, flops)

    run_step("step", cfg)
    run_step("step_xla_lr", build_cfg(use_pallas_lr=False))
    run_step("step_seq_vp", build_cfg(fused_predictors=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
