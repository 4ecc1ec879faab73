"""Profile the GAN vocoder train step on a LIVE TPU chip.

The vocoder is the framework's most expensive training workload (the
round-3 from-scratch V3 proof ran ~1.1 s/step at parity precision through
the relay).  This tool measures the D-update and G-update graphs
separately (wall ms + compiled-FLOPs MFU) across matmul-precision modes so
the GAN trainer's speed work targets real cost centers:

  high     — bf16x3 matmuls/convs (the module default; parity-grade)
  default  — single-pass bf16 (upstream HiFi-GAN trains under fp16 AMP,
             so GAN training tolerates this; f32 params/optimizer stay)

Usage:
  timeout 1800 python tools/tpu_vocoder_profile.py [--config v3] \
      [--batch_size 16] [--segment_frames 32] [--n_iter 20]

Appends JSON lines (variant key "vocoder/<config>/<precision>") to
docs/train_profile.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import probe_backend, _peak_flops, _compiled_flops  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="v3", choices=["v1", "v3"])
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--segment_frames", type=int, default=32)
    ap.add_argument("--n_iter", type=int, default=20)
    ap.add_argument("--precisions", default="high,default")
    ap.add_argument("--disc_dtype", default=None, choices=["bf16"],
                    help="profile the bf16-discriminator trainer mode "
                         "(--disc_dtype bf16 on the CLI); MFU numerator "
                         "stays the intrinsic f32 FLOP count so rows stay "
                         "comparable")
    ap.add_argument("--impls", default="split_unfolded,fused_folded",
                    help="comma list of step implementations to profile: "
                         "split_unfolded (two dispatches, canonical graph), "
                         "fused_folded (one dispatch, generator forward "
                         "computed once through the polyphase-folded graph), "
                         "fused (one dispatch, unfolded), folded (two "
                         "dispatches, folded)")
    args = ap.parse_args()

    info = probe_backend(probe_deadline=time.monotonic() + 120)
    if not info.get("ok"):
        print(json.dumps({"error": "tpu_unavailable", **info}), flush=True)
        return 1

    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # reruns must not repay the GAN-graph compiles

    import jax
    import jax.numpy as jnp

    from spev_tpu.config import AudioConfig
    from spev_tpu.models import modules
    from spev_tpu.models.hifigan import HiFiGANConfig
    from spev_tpu.train.vocoder_trainer import (
        init_vocoder_train_state,
        make_vocoder_train_step,
    )

    audio = AudioConfig()
    hop = audio.hop_length
    B, T = args.batch_size, args.segment_frames
    cfg = HiFiGANConfig() if args.config == "v1" else HiFiGANConfig.v3()

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(-4, 2, (B, T, audio.n_mels)), jnp.float32)
    wav = jnp.asarray(rng.normal(0, 0.1, (B, T * hop)), jnp.float32)

    peak = _peak_flops()
    impls = {
        "split_unfolded": dict(folded=False, fused=False),
        "fused_folded": dict(folded=True, fused=True),
        "fused": dict(folded=False, fused=True),
        "folded": dict(folded=True, fused=False),
    }
    rows = []
    for prec in (s.strip() for s in args.precisions.split(",") if s.strip()):
        for impl in (s.strip() for s in args.impls.split(",") if s.strip()):
            kw = impls[impl]
            modules.set_matmul_precision(prec)
            state = init_vocoder_train_state(jax.random.PRNGKey(0), cfg)
            step = make_vocoder_train_step(cfg, audio,
                                           disc_dtype=args.disc_dtype, **kw)

            # FLOP counts first: the steps donate their state, so lower()
            # must see it before any execution consumes its buffers.  The
            # intrinsic (unfolded, per-update) FLOPs are the MFU numerator
            # for every impl — the folded graph may execute slightly
            # different FLOPs for the same arithmetic, and MFU must stay
            # comparable across impls.
            base = make_vocoder_train_step(cfg, audio)
            d_fl = _compiled_flops(base.d_step, state, mel, wav)
            g_fl = _compiled_flops(base.g_step, state, mel, wav)

            # warm the graph(s), force a real fetch through the relay
            for _ in range(3):
                state, metrics = step(state, mel, wav)
            float(metrics["g_loss"])

            t0 = time.perf_counter()
            s = state
            for _ in range(args.n_iter):
                s, metrics = step(s, mel, wav)
            float(metrics["g_loss"])
            full_ms = (time.perf_counter() - t0) / args.n_iter * 1e3
            mfu = None
            if peak and d_fl and g_fl:
                mfu = (d_fl + g_fl) / (full_ms / 1e3) / peak
            row = {
                "variant": (f"vocoder/{args.config}/{prec}/{impl}"
                            + (f"+d_{args.disc_dtype}" if args.disc_dtype
                               else "")),
                "batch": B, "segment_frames": T,
                "full_ms": round(full_ms, 2),
                "steps_per_s": round(1e3 / full_ms, 2),
                "mfu": round(mfu, 4) if mfu else None,
                "flops_d": d_fl, "flops_g": g_fl,
                "device": info.get("device_kind"),
                "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "train_profile.jsonl")
    with open(out_path, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
