"""Multi-process / multi-slice initialization (DCN scale-out).

The single-controller JAX runtime covers one host; spanning hosts/slices
(TPU pods, multislice over DCN) requires ``jax.distributed.initialize``
before any backend use.  This wraps it with environment-variable
autodetection (the SURVEY §5.8 stretch path: ICI collectives within a
slice, DCN across slices — all still emitted by XLA from the same
shardings; nothing else in the framework changes).

Usage (per process, before other spev_tpu/jax calls):

    from spev_tpu.parallel.distributed import initialize
    initialize()                      # env-driven (TPU pods autodetect)
    mesh = make_mesh((jax.device_count(),), ("data",))

On Cloud TPU pods a bare ``initialize()`` autodetects everything; elsewhere
pass coordinator_address/num_processes/process_id or set
SPEV_COORDINATOR / SPEV_NUM_PROCESSES / SPEV_PROCESS_ID.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Idempotent jax.distributed.initialize with env fallbacks.  Returns
    True if distributed mode is active, False for single-process runs."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("SPEV_COORDINATOR")
    if num_processes is None and os.environ.get("SPEV_NUM_PROCESSES"):
        num_processes = int(os.environ["SPEV_NUM_PROCESSES"])
    if process_id is None and os.environ.get("SPEV_PROCESS_ID"):
        process_id = int(os.environ["SPEV_PROCESS_ID"])

    already = getattr(jax._src.distributed.global_state, "client", None) is not None
    if already:
        return True
    # TPU pod slices autodetect with no arguments; otherwise require explicit
    # coordination info and stay single-process when absent.
    try:
        if coordinator_address or num_processes or _on_tpu_pod():
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            return True
    except Exception as e:  # stay usable single-process
        print(f"[spev_tpu.distributed] initialize failed ({e}); single-process mode")
    return False


def _on_tpu_pod() -> bool:
    return bool(os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",")) or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )


def global_batch_sharding(mesh):
    """Sharding for per-process batch shards under multi-process data
    loading: each process feeds its local slice of the global batch via
    ``jax.make_array_from_process_local_data``."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data"))


def make_global_batch(mesh, local_batch: dict):
    """Assemble a globally-sharded batch from per-process local shards."""
    import jax

    sh = global_batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, x), local_batch
    )
