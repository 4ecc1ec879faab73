"""Device mesh construction and sharding rules.

Strategy (SURVEY.md §2.4, §5.8):

- **Data parallelism** is the reference-parity scale-out story: the batch
  axis is sharded over the ``data`` mesh axis; XLA inserts the gradient
  all-reduce over ICI from the shardings alone.
- **Tensor parallelism** is plumbed but optional: with a ``model`` axis of
  size > 1, the FFT-block FFN weights (4× expansion) are sharded column-/
  row-wise (Megatron layout: conv1 out-channels and conv2 in-channels on
  ``model``), and attention projections shard over heads.  XLA emits the
  matching all-reduces.  The acoustic model is ~30 M params so TP is never
  required for memory — the axis exists so larger models are a config
  change, and so multi-chip compilation is exercised in CI.

Everything uses `jax.sharding.NamedSharding`; `jax.jit` consumes these
directly (pjit is jit in modern JAX).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = (1,), axes: Sequence[str] = ("data",), devices=None) -> Mesh:
    """Build a Mesh of the given logical shape over available devices."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def _spec_for_param(path: str, has_model_axis: bool) -> P:
    """Partition spec for one parameter, keyed by its tree path.

    Megatron-style TP for the FFT block (one all-reduce per sublayer):
      conv1.weight (O, I, K)     → shard O on 'model'      (column parallel)
      conv1.bias (O,)            → shard O on 'model'
      conv2.weight (O, I, K)     → shard I on 'model'      (row parallel)
      in_proj_weight (3, H, H)   → shard dim 1 on 'model'  — head-aligned:
        each shard holds whole heads of q, k AND v (the packed (3H, H)
        torch layout would cut mid-k at 3H/S; see models/modules.py:init_mha)
      in_proj_bias (3, H)        → shard dim 1 on 'model'
      out_proj.weight (H, H)     → shard columns on 'model' (row parallel)
    Everything else is replicated.
    """
    if not has_model_axis:
        return P()
    if "conv1" in path:
        return P("model")
    if "conv2" in path and path.endswith("weight"):
        return P(None, "model")
    if "in_proj_weight" in path or "in_proj_bias" in path:
        return P(None, "model")
    if "out_proj" in path and path.endswith("weight"):
        return P(None, "model")
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding tree matching the param pytree."""
    has_model = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1

    def leaf_sharding(path, leaf):
        return NamedSharding(mesh, _spec_for_param(_path_str(path), has_model))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the leading axis sharded on 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
