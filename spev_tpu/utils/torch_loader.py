"""PyTorch checkpoint interop without a hard torch dependency.

The reference ships checkpoints as ``torch.save`` dicts
(``{'model': state_dict, 'optimizer': ..., 'vocab': [...], 'stats': {...},
'step_num': int, 'epoch': int}``, ``spev_real_metrics.py:605-617``) and
consumes external HiFi-GAN ``g_*`` checkpoints (``:715-722``).  This module
provides:

- ``read_torch_pickle(path)`` — a numpy-only reader for the torch zip
  serialization format (pickle + raw storages), so TPU hosts never import
  torch (SURVEY.md §7 hard part #5).  Falls back to ``torch.load`` when
  torch happens to be importable and the numpy path hits an exotic object.
- ``fastspeech2_params_from_state_dict`` / ``..._to_state_dict`` —
  loss-free conversion between the reference model's state_dict naming and
  the spev_tpu param pytree.  Weight *layouts* are already torch-identical
  by design (see `spev_tpu.models.modules`), so conversion is pure
  renaming/regrouping.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any

import numpy as np
from spev_tpu.errors import UserError

_DTYPE_BY_STORAGE = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially
}


class _LazyStorage:
    def __init__(self, zf: zipfile.ZipFile, prefix: str, key: str, dtype_name: str, numel: int):
        self._zf = zf
        self._prefix = prefix
        self._key = key
        self.dtype_name = dtype_name
        self.numel = numel

    def read(self) -> np.ndarray:
        raw = self._zf.read(f"{self._prefix}/data/{self._key}")
        if self.dtype_name == "BFloat16Storage":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            return (u16.astype(np.uint32) << 16).view(np.float32)
        dtype = _DTYPE_BY_STORAGE[self.dtype_name]
        return np.frombuffer(raw, dtype=dtype)


class _Shell:
    """Permissive stand-in for torch classes referenced by pickles."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        self.state = state


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad, backward_hooks, *a):
    flat = storage.read()
    if not size:
        return np.ascontiguousarray(flat[storage_offset : storage_offset + 1].reshape(()))
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * flat.dtype.itemsize for s in stride),
    )
    return np.ascontiguousarray(arr)


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def persistent_load(self, pid):
        kind, storage_type, key, location, numel = pid
        assert kind == "storage"
        name = getattr(storage_type, "__name__", str(storage_type))
        return _LazyStorage(self._zf, self._prefix, key, name, numel)

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module.startswith("torch"):
            # storage types and any other torch class: permissive shells
            return type(name, (_Shell,), {"__name__": name})
        return super().find_class(module, name)


def read_torch_pickle(path: str) -> Any:
    """Load a ``torch.save`` zip archive into plain numpy/dict/list objects
    without importing torch."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise UserError(f"{path} is not a torch zip checkpoint")
        prefix = pkl_names[0][: -len("/data.pkl")]
        with zf.open(pkl_names[0]) as f:
            return _TorchUnpickler(io.BytesIO(f.read()), zf, prefix).load()


def load_checkpoint(path: str) -> Any:
    """Robust checkpoint load: numpy-only reader first, torch fallback."""
    try:
        return read_torch_pickle(path)
    except Exception:
        import torch  # optional, host-side only

        obj = torch.load(path, map_location="cpu", weights_only=False)

        def to_np(x):
            if isinstance(x, torch.Tensor):
                return x.detach().cpu().numpy()
            if isinstance(x, dict):
                return {k: to_np(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return type(x)(to_np(v) for v in x)
            return x

        return to_np(obj)


# ---------------------------------------------------------------------------
# FastSpeech2 state_dict <-> pytree
# ---------------------------------------------------------------------------

_VARIANCES = ("duration", "pitch", "energy", "breath", "rough", "bright")


def _vp_from_sd(sd: dict, prefix: str, n_layers: int = 2) -> dict:
    convs, norms = [], []
    for i in range(n_layers):
        convs.append(
            {"weight": sd[f"{prefix}.layers.{4 * i}.weight"], "bias": sd[f"{prefix}.layers.{4 * i}.bias"]}
        )
        norms.append(
            {
                "weight": sd[f"{prefix}.layers.{4 * i + 2}.weight"],
                "bias": sd[f"{prefix}.layers.{4 * i + 2}.bias"],
            }
        )
    return {
        "convs": convs,
        "norms": norms,
        "proj": {"weight": sd[f"{prefix}.proj.weight"], "bias": sd[f"{prefix}.proj.bias"]},
        "output_norm": {
            "weight": sd[f"{prefix}.output_norm.weight"],
            "bias": sd[f"{prefix}.output_norm.bias"],
        },
    }


def _block_from_sd(sd: dict, prefix: str) -> dict:
    # torch packs q/k/v as (3H, H)/(3H,); spev_tpu stores (3, H, H)/(3, H)
    # so TP shards land on head boundaries (models/modules.py:init_mha)
    w = sd[f"{prefix}.attention.in_proj_weight"]
    b = sd[f"{prefix}.attention.in_proj_bias"]
    return {
        "attention": {
            "in_proj_weight": w.reshape(3, w.shape[0] // 3, w.shape[1]),
            "in_proj_bias": b.reshape(3, b.shape[0] // 3),
            "out_proj": {
                "weight": sd[f"{prefix}.attention.out_proj.weight"],
                "bias": sd[f"{prefix}.attention.out_proj.bias"],
            },
        },
        "norm1": {"weight": sd[f"{prefix}.norm1.weight"], "bias": sd[f"{prefix}.norm1.bias"]},
        "conv1": {"weight": sd[f"{prefix}.conv1.weight"], "bias": sd[f"{prefix}.conv1.bias"]},
        "conv2": {"weight": sd[f"{prefix}.conv2.weight"], "bias": sd[f"{prefix}.conv2.bias"]},
        "norm2": {"weight": sd[f"{prefix}.norm2.weight"], "bias": sd[f"{prefix}.norm2.bias"]},
    }


def fastspeech2_params_from_state_dict(
    sd: dict, n_encoder_layers: int = 4, n_decoder_layers: int = 4
) -> dict:
    """Reference ``RealMetricsFastSpeech2.state_dict()`` → spev_tpu pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {
        "embedding": {"weight": sd["embedding.weight"]},
        "encoder_blocks": [
            _block_from_sd(sd, f"encoder_blocks.{i}") for i in range(n_encoder_layers)
        ],
        "decoder_blocks": [
            _block_from_sd(sd, f"decoder_blocks.{i}") for i in range(n_decoder_layers)
        ],
        "mel_linear": {"weight": sd["mel_linear.weight"], "bias": sd["mel_linear.bias"]},
    }
    for name in _VARIANCES:
        params[f"{name}_predictor"] = _vp_from_sd(sd, f"{name}_predictor")
    for name in ("pitch", "energy", "breath", "rough", "bright"):
        params[f"{name}_embedding"] = {
            "weight": sd[f"{name}_embedding.weight"],
            "bias": sd[f"{name}_embedding.bias"],
        }
    return params


def fastspeech2_params_to_state_dict(params: dict) -> dict:
    """spev_tpu pytree → reference state_dict naming (for torch export)."""
    sd = {}

    def put(name, arr):
        sd[name] = np.asarray(arr)

    put("embedding.weight", params["embedding"]["weight"])
    for kind in ("encoder", "decoder"):
        for i, blk in enumerate(params[f"{kind}_blocks"]):
            pre = f"{kind}_blocks.{i}"
            w3 = np.asarray(blk["attention"]["in_proj_weight"])
            b3 = np.asarray(blk["attention"]["in_proj_bias"])
            put(f"{pre}.attention.in_proj_weight", w3.reshape(-1, w3.shape[-1]))
            put(f"{pre}.attention.in_proj_bias", b3.reshape(-1))
            put(f"{pre}.attention.out_proj.weight", blk["attention"]["out_proj"]["weight"])
            put(f"{pre}.attention.out_proj.bias", blk["attention"]["out_proj"]["bias"])
            for nm in ("norm1", "conv1", "conv2", "norm2"):
                put(f"{pre}.{nm}.weight", blk[nm]["weight"])
                put(f"{pre}.{nm}.bias", blk[nm]["bias"])
    for name in _VARIANCES:
        vp = params[f"{name}_predictor"]
        pre = f"{name}_predictor"
        for i, (c, n) in enumerate(zip(vp["convs"], vp["norms"])):
            put(f"{pre}.layers.{4 * i}.weight", c["weight"])
            put(f"{pre}.layers.{4 * i}.bias", c["bias"])
            put(f"{pre}.layers.{4 * i + 2}.weight", n["weight"])
            put(f"{pre}.layers.{4 * i + 2}.bias", n["bias"])
        put(f"{pre}.proj.weight", vp["proj"]["weight"])
        put(f"{pre}.proj.bias", vp["proj"]["bias"])
        put(f"{pre}.output_norm.weight", vp["output_norm"]["weight"])
        put(f"{pre}.output_norm.bias", vp["output_norm"]["bias"])
    for name in ("pitch", "energy", "breath", "rough", "bright"):
        put(f"{name}_embedding.weight", params[f"{name}_embedding"]["weight"])
        put(f"{name}_embedding.bias", params[f"{name}_embedding"]["bias"])
    put("mel_linear.weight", params["mel_linear"]["weight"])
    put("mel_linear.bias", params["mel_linear"]["bias"])
    return sd
