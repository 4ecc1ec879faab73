"""spev_tpu.parallel — device mesh, sharding rules, collective plumbing.

The reference has no distributed support at all (SURVEY.md §2.4); here the
trainer is mesh-native from day one: a 1×1 mesh degenerates to single-chip,
a ('data',) mesh gives pure data parallelism with XLA-emitted gradient
all-reduces over ICI, and a ('data', 'model') mesh additionally shards the
FFN/attention weights (tensor parallelism) as a config change.
"""

from spev_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "shard_batch",
]
