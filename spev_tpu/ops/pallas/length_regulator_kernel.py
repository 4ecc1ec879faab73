"""Pallas length-regulation kernel: expansion as a one-hot matmul.

The XLA path (`spev_tpu.ops.length_regulator`) lowers to a gather; gathers
run on the TPU's scalar/vector units.  This kernel reformulates length
regulation for the MXU:

    frame_to_ph[j] = #{t : ends[t] <= j}          (compare + row-sum, VPU)
    onehot[j, t]   = (frame_to_ph[j] == t) · (j < total)
    expanded       = onehot @ x                    (MXU matmul)

and fuses the hidden-state expansion with all five variance-track
expansions (`pitch/energy/breath/rough/bright`) in a single VMEM pass per
batch element — the reference needs six separate host-loop regulator calls
(``spev_real_metrics.py:226-236``).

Semantics are identical to `length_regulate` (duration guard handled by
the caller's `sanitize_durations`; zero-duration skipping via duplicate
cumulative ends; all-zero rows produce one zero frame; right zero padding).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spev_tpu.ops.length_regulator import sanitize_durations

N_TRACKS = 8  # 5 variance tracks padded to 8 lanes


def _lr_kernel(ends_ref, x_ref, feats_ref, xout_ref, fout_ref, *, M: int, T: int):
    ends = ends_ref[0, 0]  # (T,) int32
    total = ends[T - 1]
    frame_idx = jax.lax.broadcasted_iota(jnp.int32, (M, T), 0)
    ph_idx = jax.lax.broadcasted_iota(jnp.int32, (M, T), 1)
    # searchsorted(ends, j, 'right') == #{t : ends[t] <= j}
    counts = jnp.sum((ends[None, :] <= frame_idx).astype(jnp.int32), axis=1, keepdims=True)
    counts = jnp.minimum(counts, T - 1)  # clamp padded tail
    valid = frame_idx[:, :1] < total  # (M, 1)
    onehot = ((ph_idx == counts) & valid).astype(jnp.float32)  # (M, T)
    # selection matmul must be exact: f32 MXU passes, not bf16 (a one-hot
    # gather through bf16 would truncate the gathered values' mantissas)
    xout_ref[0] = jnp.dot(onehot, x_ref[0], preferred_element_type=jnp.float32,
                          precision="highest")
    fout_ref[0] = jnp.dot(onehot, feats_ref[0], preferred_element_type=jnp.float32,
                          precision="highest")


def _lr_bwd_kernel(ends_ref, gx_ref, gf_ref, gxout_ref, gfout_ref, *, M: int, T: int):
    """Transpose of `_lr_kernel`: grads w.r.t. x and features are
    ``onehotᵀ @ g`` — the same selection matmul with the (T, M)-oriented
    one-hot, i.e. a segment-sum of frame cotangents per phoneme."""
    ends = ends_ref[0, 0]  # (T,) int32
    total = ends[T - 1]
    frame_idx = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)  # j along lanes
    ph_idx = jax.lax.broadcasted_iota(jnp.int32, (T, M), 0)     # t along sublanes
    counts = jnp.sum((ends[:, None] <= frame_idx).astype(jnp.int32), axis=0, keepdims=True)
    counts = jnp.minimum(counts, T - 1)  # (1, M)
    valid = frame_idx[:1, :] < total  # (1, M)
    onehot_t = ((ph_idx == counts) & valid).astype(jnp.float32)  # (T, M)
    gxout_ref[0] = jnp.dot(onehot_t, gx_ref[0], preferred_element_type=jnp.float32,
                           precision="highest")
    gfout_ref[0] = jnp.dot(onehot_t, gf_ref[0], preferred_element_type=jnp.float32,
                           precision="highest")


def _lr_fused_call(x, fpad, ends, max_frames: int, interpret: bool):
    """The forward pallas_call on pre-padded f32 inputs."""
    B, T, H = x.shape
    kernel = functools.partial(_lr_kernel, M=max_frames, T=T)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            # ends carried as (B, 1, T) so the block's last two dims satisfy
            # Mosaic's tiling constraint ((1, T) of a (B, T) array does not)
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N_TRACKS), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, max_frames, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_frames, N_TRACKS), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, max_frames, H), jnp.float32),
            jax.ShapeDtypeStruct((B, max_frames, N_TRACKS), jnp.float32),
        ),
        interpret=interpret,
    )(ends[:, None, :], x, fpad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _lr_fused(x, fpad, ends, max_frames: int, interpret: bool):
    return _lr_fused_call(x, fpad, ends, max_frames, interpret)


def _lr_fused_fwd(x, fpad, ends, max_frames: int, interpret: bool):
    out = _lr_fused_call(x, fpad, ends, max_frames, interpret)
    return out, (ends, x.shape)


def _lr_fused_bwd(max_frames: int, interpret: bool, res, cotangents):
    ends, (B, T, H) = res
    gx, gf = cotangents
    kernel = functools.partial(_lr_bwd_kernel, M=max_frames, T=T)
    gx_ph, gf_ph = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_frames, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max_frames, N_TRACKS), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, H), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, N_TRACKS), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, H), jnp.float32),
            jax.ShapeDtypeStruct((B, T, N_TRACKS), jnp.float32),
        ),
        interpret=interpret,
    )(ends[:, None, :], gx.astype(jnp.float32), gf.astype(jnp.float32))
    # integer `ends` carries a symbolic-zero (float0) cotangent
    g_ends = np.zeros(ends.shape, dtype=jax.dtypes.float0)
    return gx_ph, gf_ph, g_ends


_lr_fused.defvjp(_lr_fused_fwd, _lr_fused_bwd)


def length_regulate_fused(
    x: jnp.ndarray,
    features: jnp.ndarray,
    durations: jnp.ndarray,
    max_frames: int,
    guard_max: float = 1000.0,
    interpret: bool = False,
):
    """Fused expansion of hidden states and variance tracks.

    Differentiable w.r.t. ``x`` and ``features`` via a custom VJP whose
    backward pass is the transposed selection matmul (`_lr_bwd_kernel`) —
    the exact cotangent of the gather path (segment-sum per phoneme), so
    training graphs can use the fused kernel too.  ``durations`` is
    non-differentiable (integer frame counts), matching the gather path.

    Args:
      x: (B, T, H) phoneme-level hidden states.
      features: (B, T, F) stacked per-phoneme variance tracks (F ≤ 8).
      durations: (B, T) frames per phoneme (any numeric dtype).
      max_frames: static output bucket M.

    Returns (x_expanded (B, M, H), features_expanded (B, M, F),
    mel_len (B,) int32) with `length_regulate` semantics.
    """
    B, T, H = x.shape
    F = features.shape[-1]
    d = sanitize_durations(durations, guard_max)
    ends = jnp.cumsum(d, axis=-1).astype(jnp.int32)  # (B, T)
    fpad = jnp.pad(features.astype(jnp.float32), ((0, 0), (0, 0), (0, N_TRACKS - F)))
    x_out, f_out = _lr_fused(x.astype(jnp.float32), fpad, ends, max_frames, interpret)
    # mel_len is a trivial reduction — computed outside the kernel
    mel_len = jnp.maximum(jnp.minimum(ends[:, -1], max_frames), 1).astype(jnp.int32)
    return x_out, f_out[..., :F], mel_len
