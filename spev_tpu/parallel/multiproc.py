"""Multi-process (DCN-style) dry run: 2 processes × N virtual devices.

`__graft_entry__.dryrun_multichip` proves the sharded step compiles and
runs on an n-device mesh inside ONE process (single-controller).  Real
pod/multi-slice scale-out adds a second regime: several processes, each
owning a subset of the devices, coordinated by ``jax.distributed`` — the
global mesh spans all processes, collectives cross the process boundary
(DCN in production, gRPC-over-localhost here), and each process feeds
ONLY its addressable shard of the batch.

This module runs that regime offline: `dryrun_multiprocess(2, 4)` spawns
two CPU subprocesses (4 virtual devices each, the tests/conftest.py
recipe), initializes `jax.distributed` against a localhost coordinator,
builds one global 2×4 data×model mesh, jits the FULL acoustic train step
over it with the production shardings, feeds per-process batch shards via
``jax.make_array_from_callback`` (each process materializes only its
rows), executes one step, and cross-checks the replicated loss across
processes.  Process 0 writes a MULTICHIP-style JSON artifact.

SURVEY §2.4 "jax.distributed init + DCN for multi-slice (stretch)";
the single-process path stays `parallel/distributed.py:initialize`.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
from typing import Optional

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def dryrun_worker(process_id: int, num_processes: int, coordinator: str) -> dict:
    """One process's leg of the dry run.  Caller must have set
    JAX_PLATFORMS=cpu + xla_force_host_platform_device_count BEFORE jax
    backend init (the launcher does).  Returns the result dict."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spev_tpu.config import ModelConfig, SpevConfig, TrainConfig
    from spev_tpu.parallel.mesh import make_mesh
    from spev_tpu.train.trainer import init_train_state, make_train_step

    n_devices = jax.device_count()  # GLOBAL
    local = jax.local_device_count()
    assert n_devices == num_processes * local, (n_devices, num_processes, local)

    # data axis spans processes (each process owns data rows), model axis
    # stays inside a process (TP over ICI; DP gradient reduce over "DCN")
    assert local % 2 == 0, (
        f"devices_per_proc must be even (got {local}): the 2-wide model axis "
        f"must divide each process's local device count")
    shape, axes = (num_processes * 2, local // 2), ("data", "model")
    mesh = make_mesh(shape, axes)

    Pn, M, H, V, NMEL = 16, 64, 32, 31, 16
    B = 2 * shape[0]
    cfg = SpevConfig(
        model=ModelConfig(vocab_size=V, embed_dim=H, hidden_dim=H, n_mels=NMEL,
                          max_phonemes=Pn, max_frames=M),
        train=TrainConfig(batch_size=B, warmup_steps=10,
                          mesh_shape=shape, mesh_axes=axes),
    )
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, mesh, state.params, use_dropout=True)

    # deterministic GLOBAL batch; each process materializes ONLY the rows
    # its local devices own (make_array_from_callback slices on demand —
    # the per-process data-feeding contract of a real multi-host input
    # pipeline)
    rng = np.random.default_rng(0)
    n_ph = 8
    ids = np.zeros((B, Pn), np.int32)
    ids[:, :n_ph] = rng.integers(1, V, size=(B, n_ph))
    durs = np.zeros((B, Pn), np.float32)
    durs[:, :n_ph] = 4
    feat = lambda lo, hi: np.where(durs > 0, rng.uniform(lo, hi, (B, Pn)), 0.0).astype(np.float32)
    host_batch = {
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
    sh = NamedSharding(mesh, P("data"))
    batch = jax.tree.map(
        lambda x: jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx]),
        host_batch,
    )

    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])  # replicated → addressable everywhere
    assert np.isfinite(loss), f"multiproc dryrun loss not finite: {loss}"

    # the replicated loss must agree bit-for-bit across processes — the
    # cheapest cross-process consistency check there is
    from jax.experimental import multihost_utils

    losses = np.asarray(multihost_utils.process_allgather(jnp.float32(loss)))
    assert losses.shape == (num_processes,)
    assert np.all(losses == losses[0]), losses

    result = {
        "ok": True,
        "n_processes": num_processes,
        "devices_per_process": local,
        "mesh": {a: int(s) for a, s in zip(axes, shape)},
        "loss": loss,
        "step": int(state.step),
    }
    jax.distributed.shutdown()
    return result


def dryrun_multiprocess(
    n_processes: int = 2,
    devices_per_proc: int = 4,
    out_json: Optional[str] = None,
    timeout_s: float = 600.0,
) -> dict:
    """Spawn the workers, wait, collect process 0's result.

    Each child gets a fresh CPU platform with ``devices_per_proc`` virtual
    devices and a distinct ``process_id`` against a localhost coordinator
    (the DCN stand-in).  Raises on any child failure."""
    import re

    if devices_per_proc % 2 != 0:
        raise ValueError(
            f"devices_per_proc must be even (got {devices_per_proc}): the "
            f"2-wide model axis must divide each process's local devices — "
            f"an odd value fails deep inside the worker's make_mesh instead")
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env_base = dict(os.environ)
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env_base.get("XLA_FLAGS", ""))
    env_base["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    env_base["JAX_PLATFORMS"] = "cpu"

    procs = []
    for pid in range(n_processes):
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"import sys, json; sys.path.insert(0, {REPO!r}); "
            "from spev_tpu.parallel.multiproc import dryrun_worker; "
            f"r = dryrun_worker({pid}, {n_processes}, {coordinator!r}); "
            "print('MULTIPROC_RESULT ' + json.dumps(r))"
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=dict(env_base),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))

    deadline = time.monotonic() + timeout_s
    outs = []
    for i, pr in enumerate(procs):
        remaining = max(5.0, deadline - time.monotonic())
        try:
            out, err = pr.communicate(timeout=remaining)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            raise RuntimeError(f"multiproc dryrun timed out (process {i})")
        if pr.returncode != 0:
            raise RuntimeError(
                f"multiproc dryrun process {i} failed (rc={pr.returncode}):\n"
                f"{err[-2000:]}"
            )
        outs.append(out)

    result = None
    for line in outs[0].splitlines():
        if line.startswith("MULTIPROC_RESULT "):
            result = json.loads(line[len("MULTIPROC_RESULT "):])
    if result is None:
        raise RuntimeError(f"no result line from process 0:\n{outs[0][-2000:]}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    res = dryrun_multiprocess(
        int(sys.argv[1]) if len(sys.argv) > 1 else 2,
        int(sys.argv[2]) if len(sys.argv) > 2 else 4,
        out_json=sys.argv[3] if len(sys.argv) > 3 else None,
    )
    print(json.dumps(res))
