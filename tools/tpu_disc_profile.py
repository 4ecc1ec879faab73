"""Per-sub-discriminator cost profile on a LIVE TPU chip.

The GAN vocoder step is discriminator-dominated (compiled D FLOPs ≈ 2× G
at V3), so trainer speed work needs to know WHICH sub-discriminator —
each MPD period and MSD scale — actually burns the wall time, separately
for forward and forward+backward, at training precision.

Usage:
  timeout 1200 python tools/tpu_disc_profile.py [--batch_size 16]
      [--segment 8192] [--n_iter 30] [--precision default]

Prints one JSON line per sub-disc plus totals.
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
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--segment", type=int, default=8192)
    ap.add_argument("--n_iter", type=int, default=30)
    ap.add_argument("--precision", default="default")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                    help="bf16 casts wav + disc params (the --disc_dtype "
                         "trainer mode) to halve HBM bytes")
    args = ap.parse_args()

    info = probe_backend(probe_deadline=time.monotonic() + 120)
    if not info.get("ok"):
        print(json.dumps({"error": "tpu_unavailable", **info}), flush=True)
        return 1

    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from spev_tpu.models import modules
    from spev_tpu.models.hifigan_disc import (
        MPD_PERIODS,
        _avg_pool,
        apply_period_disc,
        apply_scale_disc,
        init_period_disc,
        init_scale_disc,
    )

    modules.set_matmul_precision(args.precision)
    B, T = args.batch_size, args.segment
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    wav = jnp.asarray(rng.normal(0, 0.1, (B, T)), jnp.float32)

    def cast(tree):
        return jax.tree.map(lambda x: x.astype(dt), tree)
    wav = wav.astype(dt)

    def bench(fn, *xs):
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.n_iter):
            out = f(*xs)
        jax.block_until_ready(out)
        # force a host fetch through the relay (donation-safe timing)
        np.asarray(jax.tree.leaves(out)[0]).sum()
        return (time.perf_counter() - t0) / args.n_iter * 1e3

    rows = []
    key = jax.random.PRNGKey(0)
    for i, p in enumerate(MPD_PERIODS):
        params = cast(init_period_disc(jax.random.fold_in(key, i), p))

        def fwd(prm, w, _p=p):
            logits, feats = apply_period_disc(prm, w, period=_p)
            return (jnp.mean(logits.astype(jnp.float32) ** 2)
                    + sum(jnp.mean(jnp.abs(f).astype(jnp.float32)) for f in feats))

        f_ms = bench(fwd, params, wav)
        fb_ms = bench(jax.grad(fwd), params, wav)
        rows.append({"disc": f"mpd_p{p}", "fwd_ms": round(f_ms, 2),
                     "fwd_bwd_ms": round(fb_ms, 2)})
        print(json.dumps(rows[-1]), flush=True)

    x = wav
    for s in range(3):
        if s > 0:
            x = _avg_pool(x, 4)
        params = cast(init_scale_disc(jax.random.fold_in(key, 100 + s)))

        def fwd(prm, w):
            logits, feats = apply_scale_disc(prm, w)
            return (jnp.mean(logits.astype(jnp.float32) ** 2)
                    + sum(jnp.mean(jnp.abs(f).astype(jnp.float32)) for f in feats))

        f_ms = bench(fwd, params, x)
        fb_ms = bench(jax.grad(fwd), params, x)
        rows.append({"disc": f"msd_s{s}", "fwd_ms": round(f_ms, 2),
                     "fwd_bwd_ms": round(fb_ms, 2)})
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({
        "total_fwd_ms": round(sum(r["fwd_ms"] for r in rows), 2),
        "total_fwd_bwd_ms": round(sum(r["fwd_bwd_ms"] for r in rows), 2),
        "batch": B, "segment": T, "precision": args.precision,
        "dtype": args.dtype,
        "device": info.get("device_kind"),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
