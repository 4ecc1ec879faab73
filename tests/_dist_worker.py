"""Worker process for the two-process jax.distributed smoke test.

Usage: python tests/_dist_worker.py <coordinator> <num_procs> <proc_id>
Each process gets 4 virtual CPU devices (XLA_FLAGS set by the parent);
together they form an 8-device global 'data' mesh.  Runs initialize() +
make_global_batch() + one sharded train step and prints the loss, which
must agree across processes (same global batch, same init).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from spev_tpu.parallel.distributed import initialize, make_global_batch

    active = initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
    )
    assert active, "distributed initialize() did not activate"
    assert jax.process_count() == num_procs
    n_global = jax.device_count()
    n_local = len(jax.local_devices())
    assert n_global == num_procs * n_local

    from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
    from spev_tpu.parallel.mesh import make_mesh
    from spev_tpu.train.trainer import init_train_state, make_train_step

    P, M, H, V, NMEL = 16, 64, 32, 23, 8
    B = n_global  # one sample per global device
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=V, embed_dim=H, hidden_dim=H, n_mels=NMEL,
                          max_phonemes=P, max_frames=M),
        train=TrainConfig(batch_size=B, warmup_steps=10),
    )
    mesh = make_mesh((n_global,), ("data",))

    # identical global batch on every process; each feeds its local slice
    rng = np.random.default_rng(0)
    n_ph = 8
    ids = np.zeros((B, P), np.int32)
    ids[:, :n_ph] = rng.integers(1, V, size=(B, n_ph))
    durs = np.zeros((B, P), np.float32)
    durs[:, :n_ph] = 4
    feat = lambda lo, hi: np.where(durs > 0, rng.uniform(lo, hi, (B, P)), 0.0).astype(np.float32)
    global_batch = {
        "ids": ids,
        "lens": np.full((B,), n_ph, np.int32),
        "durs": durs,
        "mel": np.clip(rng.standard_normal((B, M, NMEL)).astype(np.float32) - 4.0, -10, 2),
        "mel_lens": durs.sum(axis=1).astype(np.int32),
        "log_durs": (np.log(np.maximum(durs, 1) + 1) * (durs > 0)).astype(np.float32),
        "pitch": feat(-1, 1),
        "energy": feat(-1, 1),
        "breath": feat(0, 0.8),
        "rough": feat(0, 1.5),
        "bright": feat(-1, 1),
    }
    lo = proc_id * (B // num_procs)
    hi = lo + B // num_procs
    local = {k: v[lo:hi] for k, v in global_batch.items()}
    batch = make_global_batch(mesh, local)
    assert batch["ids"].shape == (B, P)

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, mesh, state.params, use_dropout=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"DIST_OK proc={proc_id} loss={loss:.6f} devices={n_global}")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
