import time, numpy as np, jax, jax.numpy as jnp
from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
from spev_tpu.parallel.mesh import make_mesh, shard_batch
from spev_tpu.train.trainer import init_train_state, make_train_step

def run(use_pallas_lr, precision):
    P, M, B = 128, 768, 16
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=128, max_phonemes=P, max_frames=M, use_pallas_lr=use_pallas_lr),
        train=TrainConfig(batch_size=B, matmul_precision=precision),
    )
    mesh = make_mesh((1,), ("data",))
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, mesh, state.params, use_dropout=True)
    rng = np.random.default_rng(0)
    durs = np.full((B, P), 6.0, np.float32)
    feat = lambda lo, hi: rng.uniform(lo, hi, (B, P)).astype(np.float32)
    batch = {
        "ids": rng.integers(1, 128, size=(B, P)).astype(np.int32),
        "lens": np.full((B,), P, np.int32), "durs": durs,
        "mel": np.clip(rng.standard_normal((B, M, 80)).astype(np.float32) - 4.0, -10, 2),
        "mel_lens": np.full((B,), M, np.int32),
        "log_durs": np.log(durs + 1).astype(np.float32),
        "pitch": feat(-1, 1), "energy": feat(-1, 1), "breath": feat(0, 0.8),
        "rough": feat(0, 1.5), "bright": feat(-1, 1),
    }
    batch = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        state, metrics = step(state, batch, key)
    float(metrics["loss"]); float(jnp.asarray(jax.tree.leaves(state.params)[0]).sum())
    t0 = time.perf_counter()
    for _ in range(30):
        state, metrics = step(state, batch, key)
    loss = float(metrics["loss"]); float(jnp.asarray(jax.tree.leaves(state.params)[0]).sum())
    dt = (time.perf_counter() - t0) / 30
    print(f"pallas_lr={use_pallas_lr} prec={precision}: {1/dt:.1f} steps/s loss={loss:.4f}", flush=True)

run(False, "high")
run(True, "high")
run(False, "default")
run(True, "default")
