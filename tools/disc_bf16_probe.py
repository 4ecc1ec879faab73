"""Loss-trajectory equivalence probe for the bf16-discriminator mode
(VERDICT r4 #4 done-criterion: "loss-trajectory equivalence over a
200-step probe").

Runs the fused+folded GAN step twice from the SAME init on the SAME
synthetic batch stream — once with f32 discriminators, once with
--disc_dtype bf16 — and reports d_loss / g_loss / g_mel at checkpoints
along the way plus the wall-clock ratio.  bf16-D changes only the
discriminator compute dtype (f32 masters, f32 loss accumulation), so the
trajectories must track each other to bf16 rounding noise while the step
gets faster.

Usage: timeout 1800 python tools/disc_bf16_probe.py [--steps 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import probe_backend  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--segment_frames", type=int, default=32)
    ap.add_argument("--precision", default="default")
    args = ap.parse_args()

    info = probe_backend(probe_deadline=time.monotonic() + 120)
    if not info.get("ok"):
        print(json.dumps({"error": "tpu_unavailable", **info}), flush=True)
        return 1

    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from spev_tpu.config import AudioConfig
    from spev_tpu.models import modules
    from spev_tpu.models.hifigan import HiFiGANConfig
    from spev_tpu.train.vocoder_trainer import (
        init_vocoder_train_state,
        make_vocoder_train_step,
    )

    modules.set_matmul_precision(args.precision)
    audio = AudioConfig()
    cfg = HiFiGANConfig.v3()
    B, T = args.batch_size, args.segment_frames
    rng = np.random.default_rng(0)
    # a small pool of synthetic (mel, wav) batches cycled deterministically
    pool = [
        (jnp.asarray(rng.normal(-4, 2, (B, T, audio.n_mels)), jnp.float32),
         jnp.asarray(0.2 * np.sin(
             2 * np.pi * (120 + 40 * k) / audio.sample_rate
             * np.arange(B * T * audio.hop_length).reshape(B, -1))
             + 0.02 * rng.normal(0, 1, (B, T * audio.hop_length)),
             jnp.float32))
        for k in range(4)
    ]
    checkpoints = sorted({1, args.steps // 4, args.steps // 2, args.steps})

    results = {}
    for mode in ("f32", "bf16"):
        step = make_vocoder_train_step(
            cfg, audio, folded=True, fused=True,
            disc_dtype=None if mode == "f32" else "bf16")
        state = init_vocoder_train_state(jax.random.PRNGKey(0), cfg)
        traj = {}
        # warm/compile outside the timed window
        state, m = step(state, *pool[0])
        float(m["g_loss"])
        state = init_vocoder_train_state(jax.random.PRNGKey(0), cfg)
        t0 = time.perf_counter()
        for i in range(1, args.steps + 1):
            state, m = step(state, *pool[i % len(pool)])
            if i in checkpoints:
                traj[i] = {k: round(float(m[k]), 4)
                           for k in ("d_loss", "g_loss", "g_mel")}
        float(m["g_loss"])
        wall = time.perf_counter() - t0
        results[mode] = {"traj": traj,
                         "steps_per_s": round(args.steps / wall, 2),
                         "skipped_last": float(m["skipped"])}
        print(json.dumps({mode: results[mode]}), flush=True)

    summary = {
        "variant": "vocoder/v3/disc_bf16_probe",
        "steps": args.steps,
        "speedup": round(results["bf16"]["steps_per_s"]
                         / results["f32"]["steps_per_s"], 3),
        "final_g_mel_f32": results["f32"]["traj"][args.steps]["g_mel"],
        "final_g_mel_bf16": results["bf16"]["traj"][args.steps]["g_mel"],
        "final_d_loss_f32": results["f32"]["traj"][args.steps]["d_loss"],
        "final_d_loss_bf16": results["bf16"]["traj"][args.steps]["d_loss"],
        "steps_per_s_f32": results["f32"]["steps_per_s"],
        "steps_per_s_bf16": results["bf16"]["steps_per_s"],
        "device": info.get("device_kind"),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(summary), flush=True)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "train_profile.jsonl")
    with open(out_path, "a") as f:
        f.write(json.dumps(summary) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
