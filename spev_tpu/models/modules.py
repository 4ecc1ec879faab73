"""Functional neural-net primitives with PyTorch-compatible semantics.

The acoustic model must load reference PyTorch checkpoints and match their
outputs to ≤1e-3 MAE (BASELINE.md), so these primitives reproduce torch layer
semantics exactly where it matters:

- ``layer_norm``: eps=1e-5, biased variance (torch default).  Note that a
  LayerNorm over a single feature (normalized_shape=(1,)) therefore outputs
  exactly its bias — the reference's variance predictors end in such a norm
  (``spev_real_metrics.py:107,119``) and collapse to learned constants; we
  reproduce that faithfully.
- ``multi_head_attention``: torch ``nn.MultiheadAttention`` layout (packed
  in_proj of shape (3H, H)), scaled dot-product, key-padding mask.  Fully
  masked query rows produce NaN in torch, which the reference immediately
  zeroes via its per-block NaN guard (``spev_real_metrics.py:194-196``); we
  produce zeros directly (identical observable behavior, no NaNs in-graph).
- ``conv1d``: 'same' zero padding, torch (out, in, k) weight layout.
- torch-default initializers (kaiming-uniform fan_in for linear/conv,
  xavier-uniform for attention in_proj, N(0,1) for embeddings) so
  training-from-scratch matches the reference's initialization statistics.

Everything is expressed on (B, T, C) activations; convs run through
``lax.conv_general_dilated`` with NHC/HIO dimension numbers, which XLA maps
onto the MXU.  Matmul precision is configurable: 'highest' (float32 MXU
passes) for parity runs, 'default' (bf16 MXU) for throughput serving.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

# Global matmul precision for model layers.
#   "high"    — bf16x3 MXU passes, ~float32-accurate (rel err ~1e-7): the
#               default.  Meets the ≤1e-3 MAE parity target with sane TPU
#               compile times.
#   "highest" — true float32 (6-pass) emulation: bit-closest to the torch
#               reference, but compile time explodes for large graphs on
#               TPU (observed >9 min for the 2048-frame decoder vs 18 s at
#               "high"); use for small-shape numerics studies only.
#   "default" — single-pass bf16: maximum throughput serving.
#   "mixed"   — forward matmuls/convs at "high" (bitwise-identical loss and
#               outputs to the "high" mode), backward cotangent matmuls at
#               single-pass bf16 via custom VJPs.  Training-only: lifts the
#               bf16x3 intrinsic-MFU ceiling (1/3 executed:intrinsic → 3/5)
#               while gradients keep f32 accumulation outside the MXU —
#               the standard mixed-precision training recipe.
_PRECISION = "high"


def set_matmul_precision(p: str) -> None:
    global _PRECISION
    assert p in ("highest", "high", "default", "mixed")
    _PRECISION = p


def get_matmul_precision() -> str:
    """Session precision as a lax-valid string for direct matmul/conv call
    sites outside this module.  'mixed' is not a lax precision — it means
    forward at 'high' with custom-VJP bf16 backwards, so consumers that
    don't route through _mm/conv1d get the (conservative) forward value."""
    return "high" if _PRECISION == "mixed" else _PRECISION


# ---------------------------------------------------------------------------
# initializers (torch-default distributions)
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in):
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def _xavier_uniform(key, shape, fan_in, fan_out):
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# mixed fwd/bwd precision primitives
#
# The backward of a matmul/conv is itself a matmul/conv of the cotangent and
# does not need the forward's 3-pass accuracy — gradients are averaged over
# batches and consumed by Adam's scale-invariant update.  The custom VJPs
# below run the forward at "high" and derive the backward from the same op
# at "default" (single-pass bf16); the rematerialized default-precision
# forward inside jax.vjp is dead code (linear ops need only inputs for
# their cotangents) and XLA eliminates it.
# ---------------------------------------------------------------------------

import functools as _functools


def _conv_raw(x, w_kio, pad: tuple, precision: str):
    return jax.lax.conv_general_dilated(
        x, w_kio, window_strides=(1,), padding=[pad],
        dimension_numbers=("NHC", "HIO", "NHC"), precision=precision,
    )


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_mixed(x, w_kio, pad: tuple):
    return _conv_raw(x, w_kio, pad, "high")


def _conv_mixed_fwd(x, w_kio, pad: tuple):
    return _conv_raw(x, w_kio, pad, "high"), (x, w_kio)


def _conv_mixed_bwd(pad: tuple, res, g):
    x, w_kio = res
    _, vjp = jax.vjp(lambda a, b: _conv_raw(a, b, pad, "default"), x, w_kio)
    return vjp(g)


_conv_mixed.defvjp(_conv_mixed_fwd, _conv_mixed_bwd)


@jax.custom_vjp
def _dot_mixed(x, w):
    return jnp.matmul(x, w, precision="high")


def _dot_mixed_fwd(x, w):
    return jnp.matmul(x, w, precision="high"), (x, w)


def _dot_mixed_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(lambda a, b: jnp.matmul(a, b, precision="default"), x, w)
    return vjp(g)


_dot_mixed.defvjp(_dot_mixed_fwd, _dot_mixed_bwd)


def _mm(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Matmul at the session precision ('mixed' → high fwd / bf16 bwd)."""
    if _PRECISION == "mixed":
        return _dot_mixed(x, w)
    return jnp.matmul(x, w, precision=_PRECISION)


def init_linear(key, in_dim: int, out_dim: int) -> dict:
    """torch nn.Linear init: weight (out, in) kaiming-uniform(a=√5) ≡
    U(±1/√fan_in); bias U(±1/√fan_in)."""
    kw, kb = jax.random.split(key)
    return {
        "weight": _kaiming_uniform(kw, (out_dim, in_dim), in_dim),
        "bias": _kaiming_uniform(kb, (out_dim,), in_dim),
    }


def linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return _mm(x, params["weight"].T) + params["bias"]


def init_conv1d(key, in_ch: int, out_ch: int, kernel: int) -> dict:
    """torch nn.Conv1d init; weight kept in torch (out, in, k) layout."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel
    return {
        "weight": _kaiming_uniform(kw, (out_ch, in_ch, kernel), fan_in),
        "bias": _kaiming_uniform(kb, (out_ch,), fan_in),
    }


def conv1d(params: dict, x: jnp.ndarray, padding: str | int = "same") -> jnp.ndarray:
    """1-D convolution on (B, T, C) activations with torch-layout weights.

    padding='same' reproduces torch's ``padding=k//2`` for odd k."""
    w = params["weight"]  # (O, I, K)
    k = w.shape[-1]
    if padding == "same":
        pad = (k // 2, k // 2)
    elif padding == "valid":
        pad = (0, 0)
    else:
        pad = (int(padding), int(padding))
    w_kio = jnp.transpose(w, (2, 1, 0))  # (K, I, O)
    if _PRECISION == "mixed":
        out = _conv_mixed(x, w_kio, pad)
    else:
        out = _conv_raw(x, w_kio, pad, _PRECISION)
    return out + params["bias"]


def init_layer_norm(dim: int) -> dict:
    return {"weight": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch nn.LayerNorm over the last axis: biased variance, eps inside
    the sqrt.  For a last axis of size 1 this returns exactly ``bias``."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    normed = (x - mean) / jnp.sqrt(var + eps)
    return normed * params["weight"] + params["bias"]


def init_embedding(key, vocab_size: int, dim: int, padding_idx: Optional[int] = 0) -> dict:
    """torch nn.Embedding init: N(0,1); the padding row zeroed."""
    table = jax.random.normal(key, (vocab_size, dim), jnp.float32)
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return {"weight": table}


def embedding(params: dict, ids: jnp.ndarray, padding_idx: Optional[int] = 0) -> jnp.ndarray:
    """Embedding lookup with torch padding_idx semantics: the padding row is
    pinned to zero at apply time (torch keeps it zero via zero-grad; pinning
    is equivalent for both converted checkpoints and fresh training, and it
    also zeroes the gradient of that row)."""
    table = params["weight"]
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return jnp.take(table, ids, axis=0)


def init_mha(key, dim: int, n_heads: int) -> dict:
    """torch nn.MultiheadAttention params (xavier-uniform in_proj, zero
    biases, Linear-default out_proj weight), stored as ``(3, H, H)`` /
    ``(3, H)`` instead of torch's packed ``(3H, H)``: sharding dim 1 with
    ``P(None, 'model')`` then splits each of q/k/v on head boundaries
    (Megatron column-parallel attention) instead of cutting mid-k at 3H/S.
    Torch interop reshapes to/from the packed layout
    (utils/torch_loader.py)."""
    k1, k2 = jax.random.split(key)
    return {
        "in_proj_weight": _xavier_uniform(k1, (3 * dim, dim), dim, dim).reshape(3, dim, dim),
        "in_proj_bias": jnp.zeros((3, dim), jnp.float32),
        "out_proj": {
            "weight": _kaiming_uniform(k2, (dim, dim), dim),
            "bias": jnp.zeros((dim,), jnp.float32),
        },
    }


def multi_head_attention(
    params: dict,
    x: jnp.ndarray,
    n_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Self-attention matching torch nn.MultiheadAttention(batch_first=True)
    in inference mode (attention dropout omitted — the reference only runs
    the model in eval() for inference and its training-time attn dropout is
    reproduced by the trainer's dropout rng plumbing if enabled).

    Args:
      x: (B, T, H).
      key_padding_mask: (B, T) bool, True = padded (torch convention).
    """
    B, T, H = x.shape
    d = H // n_heads
    w = params["in_proj_weight"]  # (3, H, H): [q, k, v], rows = out features
    b = params["in_proj_bias"]  # (3, H)
    q = _mm(x, w[0].T) + b[0]
    k = _mm(x, w[1].T) + b[1]
    v = _mm(x, w[2].T) + b[2]

    def heads(t):  # (B, T, H) -> (B, nh, T, d)
        return t.reshape(B, T, n_heads, d).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = _mm(q, k.transpose(0, 1, 3, 2)) / np.sqrt(d)

    if key_padding_mask is not None:
        neg = jnp.finfo(scores.dtype).min
        scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)

    attn = jax.nn.softmax(scores, axis=-1)
    if key_padding_mask is not None:
        # fully-masked query rows (padded positions): torch yields NaN which
        # the reference zeroes; emit zeros directly.
        attn = jnp.where(key_padding_mask[:, None, :, None], 0.0, attn)

    out = _mm(attn, v)  # (B, nh, T, d)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H)
    return linear(params["out_proj"], out)


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array], deterministic: bool) -> jnp.ndarray:
    if deterministic or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
