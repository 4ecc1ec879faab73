"""Checkpoint save/load with the reference's logical schema.

The reference persists ``{'model', 'optimizer', 'vocab', 'stats',
'step_num', 'epoch'}`` via torch.save (``spev_real_metrics.py:605-617``) so
inference is self-contained (vocab + normalization stats ride along).  Here
the native format is a single msgpack file (flax.serialization) plus the
same logical content; interop helpers convert to/from the reference ``.pt``
schema (import works without torch via
`spev_tpu.utils.torch_loader.read_torch_pickle`).
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization


def save_checkpoint(path, params, opt_state=None, step=0, epoch=0, vocab=None, stats=None,
                    model_config=None):
    """model_config: dict of ModelConfig fields (architecture + behavior
    switches like vp_output_norm) so consumers reconstruct the right graph
    without out-of-band knowledge."""
    payload = {
        "model": serialization.to_state_dict(jax.tree.map(np.asarray, params)),
        "optimizer": (
            serialization.to_state_dict(jax.tree.map(np.asarray, opt_state))
            if opt_state is not None
            else None
        ),
        "meta": {
            "step_num": int(step),
            "epoch": int(epoch),
            "vocab": list(vocab) if vocab is not None else [],
            "stats": {k: float(v) for k, v in (stats or {}).items()},
            "model_config": dict(model_config) if model_config else None,
        },
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _relistify(tree):
    """Invert flax to_state_dict's list→{'0': ...} conversion so loaded
    params have the same pytree structure as freshly initialized ones."""
    if isinstance(tree, dict):
        conv = {k: _relistify(v) for k, v in tree.items()}
        if conv and all(k.isdigit() for k in conv):
            return [conv[str(i)] for i in range(len(conv))]
        return conv
    return tree


def load_checkpoint(path) -> dict:
    """Load the raw checkpoint payload (model/optimizer in state-dict form,
    i.e. lists appear as {'0': ...} dicts).  Use ``load_params`` for a
    ready-to-apply param pytree."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_params(path) -> Tuple[Any, list, dict]:
    """(params pytree, vocab, stats) with canonical list structure."""
    ckpt = load_checkpoint(path)
    meta = ckpt["meta"]
    return _relistify(ckpt["model"]), list(meta["vocab"]), dict(meta["stats"])


def load_model_config(path) -> dict:
    """Stored ModelConfig field dict ({} for older/reference checkpoints)."""
    if not path.endswith(".spev"):
        return {}
    meta = load_checkpoint(path)["meta"]
    return dict(meta.get("model_config") or {})


def model_config_dict(model_cfg) -> dict:
    """Serializable subset of ModelConfig (drops the nested clamp contract,
    which is constant, and the bucket fields, which are serving-time)."""
    import dataclasses

    d = dataclasses.asdict(model_cfg)
    for k in ("clamps", "max_phonemes", "max_frames"):
        d.pop(k, None)
    return d


def load_checkpoint_into(path, state) -> Tuple[Any, int]:
    """Restore a TrainState-shaped object (params/opt_state/step), returning
    (new_state, epoch).  Resume semantics match the reference ``--resume``
    (``spev_real_metrics.py:502-507``): model always, optimizer and step if
    present."""
    ckpt = load_checkpoint(path)
    params = serialization.from_state_dict(state.params, ckpt["model"])
    opt_state = state.opt_state
    if ckpt.get("optimizer") is not None:
        opt_state = serialization.from_state_dict(state.opt_state, ckpt["optimizer"])
    step = jnp.asarray(ckpt["meta"]["step_num"], jnp.int32)
    new_state = state._replace(params=params, opt_state=opt_state, step=step)
    return new_state, int(ckpt["meta"]["epoch"])


# ---------------------------------------------------------------------------
# reference .pt interop
# ---------------------------------------------------------------------------


def import_reference_checkpoint(path: str):
    """Load a reference SPEV ``.pt`` checkpoint (torch zip) → (params pytree,
    vocab list, stats dict, step, epoch).  No torch required."""
    from spev_tpu.utils.torch_loader import fastspeech2_params_from_state_dict, load_checkpoint as load_pt

    ckpt = load_pt(path)
    params = fastspeech2_params_from_state_dict(ckpt["model"])
    vocab = [str(v) for v in ckpt.get("vocab", [])]
    stats = {k: float(v) for k, v in ckpt.get("stats", {}).items()}
    return params, vocab, stats, int(ckpt.get("step_num", 0)), int(ckpt.get("epoch", 0))


def export_reference_checkpoint(path: str, params, vocab, stats, step=0, epoch=0):
    """Write a reference-schema ``.pt`` checkpoint (requires torch on the
    host — export is a tooling path, not a TPU-serving path)."""
    import torch

    from spev_tpu.utils.torch_loader import fastspeech2_params_to_state_dict

    sd = {
        # copy=True: msgpack-restored arrays are read-only and torch warns
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in fastspeech2_params_to_state_dict(jax.tree.map(np.asarray, params)).items()
    }
    torch.save(
        {"model": sd, "vocab": list(vocab), "stats": dict(stats), "step_num": int(step), "epoch": int(epoch)},
        path,
    )
