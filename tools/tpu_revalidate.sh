#!/usr/bin/env bash
# Post-change TPU revalidation (run when the axon tunnel is healthy).
# Covers: driver bench (incl. new latency fields), graft entry, one CLI
# synthesis drive, and the streaming first-chunk latency probe.
set -u
cd "$(dirname "$0")/.."

echo "== 1/4 bench.py"
timeout 900 python bench.py || exit 1
echo "== 2/4 graft entry"
timeout 300 python __graft_entry__.py || exit 1
echo "== 3/4 CLI drive (infer on a fresh tiny checkpoint)"
T=$(mktemp -d)
python - <<EOF
import numpy as np, os, sys
sys.path.insert(0, os.getcwd())
from spev_tpu.utils.wavio import write_wav
os.makedirs("$T/corpus", exist_ok=True)
for i, t in enumerate(["hello world", "quick check", "third sample"]):
    y = 0.3*np.sin(2*np.pi*(200+30*i)*np.arange(22050)/22050).astype(np.float32)
    write_wav(f"$T/corpus/u{i}.wav", y, 22050)
    open(f"$T/corpus/u{i}.txt","w").write(t)
EOF
(cd "$T" && PYTHONPATH=$OLDPWD timeout 580 python -m spev_tpu.cli.real_metrics \
    --mode train --data_dir corpus --name rv --epochs 1 --batch_size 3 \
 && PYTHONPATH=$OLDPWD timeout 300 python -m spev_tpu.cli.real_metrics \
    --mode infer --checkpoint checkpoints/rv/best.spev --text "revalidate" \
    --output rv.wav) || exit 1
echo "== 4/4 streaming latency"
timeout 580 python - <<'EOF'
import time, numpy as np, jax, jax.numpy as jnp
from spev_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator, init_hifigan
from spev_tpu.infer.streaming import stream_vocode
cfg = HiFiGANConfig()
gen = HiFiGANGenerator(cfg, jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                         init_hifigan(jax.random.PRNGKey(1), cfg)))
mel = jnp.asarray(np.random.default_rng(0).standard_normal((768, 80)), jnp.float32) - 4.0
for c in stream_vocode(gen, mel, chunk_frames=64):
    pass  # warm: compiles the cached chunk graph once
t0 = time.perf_counter()
it = stream_vocode(gen, mel, chunk_frames=64)
np.asarray(next(it)).sum()
print(f"first chunk (warm): {(time.perf_counter()-t0)*1000:.1f} ms")
ts = []
for c in it:
    t1 = time.perf_counter()
    np.asarray(c).sum()
    ts.append((time.perf_counter() - t1) * 1000)
print(f"steady chunks: {np.mean(ts):.1f}±{np.std(ts):.1f} ms "
      f"({64*256/22050*1000:.0f} ms audio each)")
EOF
rm -rf "$T"
echo "ALL REVALIDATED"
