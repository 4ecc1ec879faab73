"""Train-step MFU experiment matrix — run on a LIVE TPU chip.

VERDICT r2 #6: parity-grade training MFU was 22% vs 52% serving; this
script measures the candidate levers one at a time so the winning
combination can be promoted to defaults / documented in docs/BENCH.md:

- matmul precision: 'high' (bf16x3 parity-grade) vs 'default' (pure bf16)
- remat off vs remat='dots' (save matmul outputs) vs remat='full'
- batch size 16 (reference default) vs 48 (HBM-filling)
- host-loop pipelining: direct step loop vs Trainer.train_epoch (lag-1
  metrics fetch) — quantifies the per-step host-sync cost.

Usage (from /root/repo, relay healthy):  timeout 1800 python tools/tpu_train_profile.py
Writes one JSON line per variant to stdout and docs/train_profile.jsonl.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import probe_backend, _peak_flops, _compiled_flops  # noqa: E402


def make_batch(B, P, M, rng):
    durs = np.full((B, P), M / P, np.float32)
    feat = lambda lo, hi: rng.uniform(lo, hi, (B, P)).astype(np.float32)
    return {
        "ids": rng.integers(1, 128, size=(B, P)).astype(np.int32),
        "lens": np.full((B,), P, np.int32),
        "durs": durs,
        "mel": np.clip(rng.standard_normal((B, M, 80)).astype(np.float32) - 4.0, -10, 2),
        "mel_lens": np.full((B,), M, np.int32),
        "log_durs": np.log(durs + 1).astype(np.float32),
        "pitch": feat(-1, 1),
        "energy": feat(-1, 1),
        "breath": feat(0, 0.8),
        "rough": feat(0, 1.5),
        "bright": feat(-1, 1),
    }


def run_variant(name, B=16, precision="high", remat=False, remat_policy="full",
                n_iter=30, via_trainer=False):
    import jax
    import jax.numpy as jnp
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
    from spev_tpu.parallel.mesh import make_mesh, shard_batch
    from spev_tpu.train.trainer import Trainer, init_train_state, make_train_step

    P, M = 128, 768
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=128, max_phonemes=P, max_frames=M,
                          remat=remat, remat_policy=remat_policy),
        train=TrainConfig(batch_size=B, matmul_precision=precision),
    )
    mesh = make_mesh((1,), ("data",))
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, make_batch(B, P, M, rng))
    key = jax.random.PRNGKey(1)

    if via_trainer:
        # measure through the real host loop (lag-1 pipelined metrics fetch)
        tr = Trainer(cfg, vocab=None, stats={}, ckpt_dir="/tmp/_prof_ck",
                     log_dir="/tmp/_prof_lg", mesh=mesh)
        tr.epoch = cfg.train.warmup_epochs  # full-loss phase
        host_batch = make_batch(B, P, M, rng)
        tr.train_epoch([host_batch] * 3)  # compile + warm
        t0 = time.perf_counter()
        tr.train_epoch([host_batch] * n_iter)
        import jax.numpy as jnp
        float(jnp.asarray(jax.tree.leaves(tr.state.params)[0]).sum())
        dt = (time.perf_counter() - t0) / n_iter
        flops = None
    else:
        state = init_train_state(jax.random.PRNGKey(0), cfg)
        step = make_train_step(cfg, mesh, state.params, use_dropout=True)
        flops = _compiled_flops(step, state, batch, key)
        for _ in range(3):
            state, metrics = step(state, batch, key)
        float(metrics["loss"])
        float(jnp.asarray(jax.tree.leaves(state.params)[0]).sum())
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, metrics = step(state, batch, key)
        float(metrics["loss"])
        float(jnp.asarray(jax.tree.leaves(state.params)[0]).sum())
        dt = (time.perf_counter() - t0) / n_iter

    peak = _peak_flops()
    rec = {
        "variant": name, "B": B, "precision": precision,
        "remat": (remat_policy if remat else "off"),
        "via_trainer": via_trainer,
        "step_ms": round(dt * 1000, 2),
        "steps_per_sec": round(1.0 / dt, 3),
        "utt_per_sec": round(B / dt, 1),
        "hours_100_lj_epochs": round(100 * np.ceil(13100 / B) * dt / 3600.0, 3),
        "mfu": round(flops / dt / peak, 4) if (flops and peak) else None,
    }
    print(json.dumps(rec), flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "docs", "train_profile.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


def main():
    info = probe_backend(probe_deadline=time.monotonic() + 120)
    if not info.get("ok"):
        print(json.dumps({"error": "tpu_unavailable", **info}), flush=True)
        return 1
    variants = [
        ("parity_b16", dict(B=16, precision="high")),
        ("parity_b48", dict(B=48, precision="high")),
        ("bf16_b16", dict(B=16, precision="default")),
        ("bf16_b48", dict(B=48, precision="default")),
        ("parity_b48_remat_dots", dict(B=48, precision="high", remat=True, remat_policy="dots")),
        ("parity_b48_remat_full", dict(B=48, precision="high", remat=True, remat_policy="full")),
        ("parity_b16_trainer_loop", dict(B=16, precision="high", via_trainer=True)),
        # 'mixed': forward at 'high' (loss bitwise-equal to parity), backward
        # cotangent matmuls single-pass bf16 — lifts the bf16x3 MFU ceiling
        ("mixed_b16", dict(B=16, precision="mixed")),
        ("mixed_b48", dict(B=48, precision="mixed")),
        ("mixed_b16_trainer_loop", dict(B=16, precision="mixed", via_trainer=True)),
    ]
    for name, kw in variants:
        try:
            run_variant(name, **kw)
        except Exception as e:  # keep the matrix going; record the failure
            print(json.dumps({"variant": name, "error": repr(e)[:300]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
