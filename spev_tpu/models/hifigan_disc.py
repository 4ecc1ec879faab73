"""HiFi-GAN discriminators — multi-period (MPD) and multi-scale (MSD).

The reference consumes only a *pretrained, fine-tuned* generator
(``LJ_FT_T2_V3`` — fine-tuned on acoustic-model outputs,
``PRODUCTION_SYSTEM_SUMMARY.md:214-218``) and has no way to produce one.
This module + `spev_tpu.train.vocoder_trainer` close that gap: the full
adversarial training stack from the HiFi-GAN paper (PAPERS.md), built
clean-room in JAX.

- **MPD**: one sub-discriminator per period p ∈ {2,3,5,7,11}; the waveform
  is folded to (T/p, p) and processed by 2-D convs with (5,1) kernels and
  (3,1) strides over channels 32→128→512→1024→1024.
- **MSD**: three sub-discriminators over the raw, 2×- and 4×-average-pooled
  waveform; 1-D conv stacks with large kernels (15/41) and grouped convs.

Each sub-discriminator returns its logits and the intermediate feature
maps (for the feature-matching loss).  Weight normalization is omitted
(plain convs with torch-style init); it stabilizes very long GAN runs but
is not load-bearing for correctness, and generators trained here still
export to the upstream format.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from spev_tpu.models import modules as nn

LRELU = 0.1
MPD_PERIODS = (2, 3, 5, 7, 11)


def _init_conv2d(key, in_ch, out_ch, kh, kw):
    fan_in = in_ch * kh * kw
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "weight": jax.random.uniform(k1, (out_ch, in_ch, kh, kw), minval=-bound, maxval=bound),
        "bias": jax.random.uniform(k2, (out_ch,), minval=-bound, maxval=bound),
    }


def _conv2d(p, x, stride=(1, 1), padding=(0, 0)):
    """x: (B, H, W, C); torch-layout weight (O, I, KH, KW)."""
    out = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(p["weight"], (2, 3, 1, 0)),  # (KH, KW, I, O)
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=nn.get_matmul_precision(),
    )
    return out + p["bias"]


def _init_conv1d_grouped(key, in_ch, out_ch, k, groups=1):
    fan_in = (in_ch // groups) * k
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "weight": jax.random.uniform(
            k1, (out_ch, in_ch // groups, k), minval=-bound, maxval=bound
        ),
        "bias": jax.random.uniform(k2, (out_ch,), minval=-bound, maxval=bound),
    }


def _conv1d_g(p, x, stride=1, padding=0, groups=1):
    out = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(p["weight"], (2, 1, 0)),
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        precision=nn.get_matmul_precision(),
    )
    return out + p["bias"]


# ---------------------------------------------------------------------------
# MPD
# ---------------------------------------------------------------------------

_MPD_CHANNELS = (32, 128, 512, 1024)


def init_period_disc(key, period: int) -> dict:
    keys = jax.random.split(key, 6)
    convs = []
    in_ch = 1
    for i, ch in enumerate(_MPD_CHANNELS):
        convs.append(_init_conv2d(keys[i], in_ch, ch, 5, 1))
        in_ch = ch
    return {
        "convs": convs,
        "conv_post1": _init_conv2d(keys[4], in_ch, 1024, 5, 1),
        "conv_post2": _init_conv2d(keys[5], 1024, 1, 3, 1),
    }


def apply_period_disc(p: dict, wav: jnp.ndarray, period: int = 2) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """wav (B, T) → (logits (B, n), feature maps)."""
    B, T = wav.shape
    pad = (-T) % period
    x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect" if T >= pad > 0 else "constant")
    x = x.reshape(B, -1, period, 1)  # (B, T/p, p, 1) NHWC
    feats = []
    for c in p["convs"]:
        x = _conv2d(c, x, stride=(3, 1), padding=(2, 0))
        x = jax.nn.leaky_relu(x, LRELU)
        feats.append(x)
    x = _conv2d(p["conv_post1"], x, stride=(1, 1), padding=(2, 0))
    x = jax.nn.leaky_relu(x, LRELU)
    feats.append(x)
    x = _conv2d(p["conv_post2"], x, stride=(1, 1), padding=(1, 0))
    feats.append(x)
    return x.reshape(B, -1), feats


# ---------------------------------------------------------------------------
# MSD
# ---------------------------------------------------------------------------


# (in, out, kernel, stride, groups, pad) — static architecture spec
_MSD_SPEC = (
    (1, 128, 15, 1, 1, 7),
    (128, 128, 41, 2, 4, 20),
    (128, 256, 41, 2, 16, 20),
    (256, 512, 41, 4, 16, 20),
    (512, 1024, 41, 4, 16, 20),
    (1024, 1024, 41, 1, 16, 20),
    (1024, 1024, 5, 1, 1, 2),
)


def init_scale_disc(key) -> dict:
    keys = jax.random.split(key, 8)
    convs = [
        _init_conv1d_grouped(keys[i], i_c, o_c, k, g)
        for i, (i_c, o_c, k, s, g, pd) in enumerate(_MSD_SPEC)
    ]
    return {"convs": convs, "conv_post": _init_conv1d_grouped(keys[7], 1024, 1, 3, 1)}


def apply_scale_disc(p: dict, wav: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    x = wav[..., None]  # (B, T, 1)
    feats = []
    for c, (_, _, _, stride, groups, pad) in zip(p["convs"], _MSD_SPEC):
        x = _conv1d_g(c, x, stride=stride, padding=pad, groups=groups)
        x = jax.nn.leaky_relu(x, LRELU)
        feats.append(x)
    x = _conv1d_g(p["conv_post"], x, stride=1, padding=1)
    feats.append(x)
    return x.reshape(x.shape[0], -1), feats


def _avg_pool(wav: jnp.ndarray, k: int) -> jnp.ndarray:
    """torch AvgPool1d(kernel=4, stride=2, padding=2) per downscale step."""
    x = jnp.pad(wav, ((0, 0), (2, 2)))
    n = (x.shape[1] - 4) // 2 + 1
    idx = jnp.arange(n)[:, None] * 2 + jnp.arange(4)[None, :]
    return x[:, idx].mean(axis=-1)


# ---------------------------------------------------------------------------
# combined
# ---------------------------------------------------------------------------


def init_discriminators(key, periods: Sequence[int] = MPD_PERIODS, n_scales: int = 3) -> dict:
    """Weights-only pytree (periods stay static: the MPD sub-discs are
    ordered by MPD_PERIODS; pass a matching `periods` to apply when using
    a truncated set)."""
    keys = jax.random.split(key, len(periods) + n_scales)
    return {
        "mpd": [init_period_disc(keys[i], p) for i, p in enumerate(periods)],
        "msd": [init_scale_disc(keys[len(periods) + i]) for i in range(n_scales)],
    }


def apply_discriminators(params: dict, wav: jnp.ndarray, periods: Sequence[int] = None,
                         dtype=None):
    """wav (B, T) → list of (logits, features) over all sub-discriminators.

    ``dtype=jnp.bfloat16`` runs every sub-discriminator with bf16 weights
    AND activations — half the HBM bytes on the narrow-channel conv stacks
    that dominate the GAN step (docs/BENCH.md roofline) — with logits and
    feature maps returned in bf16; callers accumulate losses in f32.  The
    master params stay f32 (the cast is traced, so gradients flow back to
    the f32 leaves).  Default None preserves the f32 parity path."""
    periods = periods if periods is not None else MPD_PERIODS[: len(params["mpd"])]
    if dtype is not None:
        params = jax.tree.map(lambda x: x.astype(dtype), params)
        wav = wav.astype(dtype)
    outs = []
    for p, period in zip(params["mpd"], periods):
        outs.append(apply_period_disc(p, wav, period=period))
    x = wav
    for i, p in enumerate(params["msd"]):
        if i > 0:
            x = _avg_pool(x, 4)
        outs.append(apply_scale_disc(p, x))
    return outs
