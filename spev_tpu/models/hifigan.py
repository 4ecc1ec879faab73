"""HiFi-GAN generator in JAX — the neural vocoder (inference path).

The reference loads the upstream PyTorch HiFi-GAN repo at runtime
(``spev_real_metrics.py:40-49,709-736``): mel (80) → conv pre-net → N
transposed-conv upsample stages, each followed by a multi-receptive-field
fusion (ResBlocks averaged over kernel sizes) → leaky-ReLU → conv post-net →
tanh waveform.  Per SURVEY.md §2.5 this framework must provide a JAX/Pallas
generator plus a loader for upstream ``g_*`` checkpoints (weight-norm form).

Design notes (TPU):

- Transposed convs are expressed as input-dilated regular convolutions
  (``lax.conv_general_dilated`` with ``lhs_dilation=stride``), which XLA
  lowers onto the MXU; activations are NHC.
- Weight norm is folded at load time (w = g·v/‖v‖, computed over all axes
  except dim 0 — torch's default), matching the reference's
  ``remove_weight_norm()`` at load (``spev_real_metrics.py:722``).
- Both ResBlock variants ('1' with paired dilated/unit convs, '2' with
  single dilated convs) and arbitrary upsample-rate stacks are supported so
  any upstream config.json (V1/V2/V3, incl. LJ_FT_T2_V3) loads.

Supports batched synthesis: mel (B, T, 80) → wav (B, T·prod(rates)).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from spev_tpu.models import modules as nn

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class HiFiGANConfig:
    """Mirror of the upstream config.json fields the generator needs."""

    resblock: str = "1"
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80

    @staticmethod
    def from_json(path: str) -> "HiFiGANConfig":
        with open(path) as f:
            h = json.load(f)
        return HiFiGANConfig(
            resblock=str(h["resblock"]),
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=int(h["upsample_initial_channel"]),
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in h["resblock_dilation_sizes"]),
            num_mels=int(h.get("num_mels", 80)),
        )

    # V3 config used by the reference's LJ_FT_T2_V3 checkpoint
    @staticmethod
    def v3() -> "HiFiGANConfig":
        return HiFiGANConfig(
            resblock="2",
            upsample_rates=(8, 8, 4),
            upsample_kernel_sizes=(16, 16, 8),
            upsample_initial_channel=256,
            resblock_kernel_sizes=(3, 5, 7),
            resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
        )

    @property
    def hop_recovery(self) -> int:
        return int(np.prod(self.upsample_rates))


# ---------------------------------------------------------------------------
# functional pieces
# ---------------------------------------------------------------------------


def _dilated_conv1d(p: dict, x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """'same'-padded dilated conv on (B, T, C), torch (O, I, K) weights,
    padding = (k-1)*d//2 (upstream ``get_padding``)."""
    w = p["weight"]
    k = w.shape[-1]
    pad = (k - 1) * dilation // 2
    out = jax.lax.conv_general_dilated(
        x,
        jnp.transpose(w, (2, 1, 0)),
        window_strides=(1,),
        padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=nn.get_matmul_precision(),
    )
    return out + p["bias"]


def conv_transpose1d(p: dict, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """torch ConvTranspose1d(k, stride=u, padding=(k-u)//2) on (B, T, C).

    Implemented as an input-dilated convolution: dilate the input by the
    stride, convolve with the time-flipped kernel, pad by (k-1-p) per side.
    Weight layout is torch's (in, out, k).
    """
    w = p["weight"]  # (I, O, K)
    k = w.shape[-1]
    pad = (k - stride) // 2
    kernel = jnp.flip(jnp.transpose(w, (2, 0, 1)), axis=0)  # (K, I, O), time-flipped
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(k - 1 - pad, k - 1 - pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=nn.get_matmul_precision(),
    )
    return out + p["bias"]


def _mask_valid(x: jnp.ndarray, valid_len) -> jnp.ndarray:
    """Zero positions ≥ valid_len along the time axis of (B, T, C).

    Under static frame bucketing this makes every conv see exactly the
    implicit zero padding the reference's exact-length tensors get from
    torch 'same' padding — bit-exact boundary behavior (see Synthesizer)."""
    if valid_len is None:
        return x
    t = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :, None]
    return jnp.where(t < jnp.reshape(valid_len, (-1, 1, 1)), x, 0.0)


def _resblock1(p: dict, x: jnp.ndarray, dilations: Sequence[int], valid) -> jnp.ndarray:
    for i, d in enumerate(dilations):
        h = jax.nn.leaky_relu(x, LRELU_SLOPE)
        h = _mask_valid(h, valid)
        h = _dilated_conv1d(p["convs1"][i], h, d)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        h = _mask_valid(h, valid)
        h = _dilated_conv1d(p["convs2"][i], h, 1)
        x = _mask_valid(x + h, valid)
    return x


def _resblock2(p: dict, x: jnp.ndarray, dilations: Sequence[int], valid) -> jnp.ndarray:
    for i, d in enumerate(dilations):
        h = jax.nn.leaky_relu(x, LRELU_SLOPE)
        h = _mask_valid(h, valid)
        h = _dilated_conv1d(p["convs"][i], h, d)
        x = _mask_valid(x + h, valid)
    return x


def apply_hifigan(
    params: dict, cfg: HiFiGANConfig, mel: jnp.ndarray, mel_len=None
) -> jnp.ndarray:
    """mel (B, T, num_mels) → waveform (B, T·hop_recovery).

    mel_len: optional (B,) valid frame counts.  When given, activations are
    masked at each stage so bucket-padded inputs produce bit-identical
    waveforms (up to sample ``mel_len·hop``) to an exact-length run — the
    parity mode used by the Synthesizer.  When None (fully valid buckets,
    e.g. streaming batches), masking is skipped entirely.
    """
    valid = mel_len
    # compute in the params' dtype (bf16 serving params + f32 mel callers
    # must not fail on the conv dtype check)
    x = _mask_valid(mel.astype(params["conv_pre"]["weight"].dtype), valid)
    x = _dilated_conv1d(params["conv_pre"], x, 1)
    n_kernels = len(cfg.resblock_kernel_sizes)
    for i, u in enumerate(cfg.upsample_rates):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = _mask_valid(x, valid)
        x = conv_transpose1d(params["ups"][i], x, u)
        valid = None if valid is None else valid * u
        x = _mask_valid(x, valid)
        acc = None
        for j in range(n_kernels):
            rb = params["resblocks"][i * n_kernels + j]
            dil = cfg.resblock_dilation_sizes[j]
            out = (
                _resblock1(rb, x, dil, valid)
                if cfg.resblock == "1"
                else _resblock2(rb, x, dil, valid)
            )
            acc = out if acc is None else acc + out
        x = acc / n_kernels
    # upstream uses F.leaky_relu's default slope (0.01) before conv_post,
    # unlike the 0.1 slope used everywhere else
    x = jax.nn.leaky_relu(x, 0.01)
    x = _mask_valid(x, valid)
    x = _dilated_conv1d(params["conv_post"], x, 1)
    return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# init (HiFi-GAN upstream: normal(0, 0.01))
# ---------------------------------------------------------------------------


def _init_conv(key, in_ch, out_ch, k) -> dict:
    return {
        "weight": 0.01 * jax.random.normal(key, (out_ch, in_ch, k), jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
    }


def _init_convt(key, in_ch, out_ch, k) -> dict:
    return {
        "weight": 0.01 * jax.random.normal(key, (in_ch, out_ch, k), jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
    }


def init_hifigan(key, cfg: HiFiGANConfig) -> dict:
    keys = iter(jax.random.split(key, 256))
    ch0 = cfg.upsample_initial_channel
    params = {"conv_pre": _init_conv(next(keys), cfg.num_mels, ch0, 7)}
    ups, resblocks = [], []
    ch = ch0
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ups.append(_init_convt(next(keys), ch, ch // 2, k))
        ch //= 2
        for kr, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            if cfg.resblock == "1":
                resblocks.append(
                    {
                        "convs1": [_init_conv(next(keys), ch, ch, kr) for _ in dil],
                        "convs2": [_init_conv(next(keys), ch, ch, kr) for _ in dil],
                    }
                )
            else:
                resblocks.append({"convs": [_init_conv(next(keys), ch, ch, kr) for _ in dil]})
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["conv_post"] = _init_conv(next(keys), ch, 1, 7)
    return params


# ---------------------------------------------------------------------------
# upstream checkpoint loading
# ---------------------------------------------------------------------------


def fold_weight_norm(sd: dict) -> dict:
    """Fold weight_g/weight_v pairs into plain weights (torch
    ``remove_weight_norm`` equivalent; norm over all axes except dim 0)."""
    out = {}
    for k, v in sd.items():
        if k.endswith("weight_v"):
            base = k[: -len("_v")]
            g = np.asarray(sd[base + "_g"])
            vv = np.asarray(v)
            axes = tuple(range(1, vv.ndim))
            norm = np.sqrt(np.sum(vv * vv, axis=axes, keepdims=True))
            out[base] = (g * vv / np.maximum(norm, 1e-12)).astype(np.float32)
        elif k.endswith("weight_g"):
            continue
        else:
            out[k] = np.asarray(v)
    return out


def hifigan_params_from_state_dict(sd: dict, cfg: HiFiGANConfig) -> dict:
    """Upstream generator state_dict (weight-normed or folded) → pytree."""
    sd = fold_weight_norm(sd)
    n_kernels = len(cfg.resblock_kernel_sizes)
    params = {
        "conv_pre": {"weight": sd["conv_pre.weight"], "bias": sd["conv_pre.bias"]},
        "conv_post": {"weight": sd["conv_post.weight"], "bias": sd["conv_post.bias"]},
        "ups": [
            {"weight": sd[f"ups.{i}.weight"], "bias": sd[f"ups.{i}.bias"]}
            for i in range(len(cfg.upsample_rates))
        ],
        "resblocks": [],
    }
    for r in range(len(cfg.upsample_rates) * n_kernels):
        dil = cfg.resblock_dilation_sizes[r % n_kernels]
        if cfg.resblock == "1":
            params["resblocks"].append(
                {
                    "convs1": [
                        {
                            "weight": sd[f"resblocks.{r}.convs1.{i}.weight"],
                            "bias": sd[f"resblocks.{r}.convs1.{i}.bias"],
                        }
                        for i in range(len(dil))
                    ],
                    "convs2": [
                        {
                            "weight": sd[f"resblocks.{r}.convs2.{i}.weight"],
                            "bias": sd[f"resblocks.{r}.convs2.{i}.bias"],
                        }
                        for i in range(len(dil))
                    ],
                }
            )
        else:
            params["resblocks"].append(
                {
                    "convs": [
                        {
                            "weight": sd[f"resblocks.{r}.convs.{i}.weight"],
                            "bias": sd[f"resblocks.{r}.convs.{i}.bias"],
                        }
                        for i in range(len(dil))
                    ]
                }
            )
    return params


class HiFiGANGenerator:
    """Bundled config + params with upstream-checkpoint loading.

    ``HiFiGANGenerator.from_pretrained(dir)`` mirrors the reference Vocoder's
    directory convention (``spev_real_metrics.py:714-717``): ``config.json``
    plus the newest ``g_*`` checkpoint in the directory.
    """

    def __init__(self, cfg: HiFiGANConfig, params: dict):
        self.cfg = cfg
        self.params = params
        self._folded = None
        self._jitted = {}

    @property
    def folded(self) -> dict:
        """Lazily-built polyphase-folded weights (see hifigan_folded.py)."""
        if self._folded is None:
            from spev_tpu.models.hifigan_folded import fold_hifigan

            self._folded = fold_hifigan(self.params, self.cfg)
        return self._folded

    def runtime(self, prefer_folded: "bool | None" = None):
        """(apply_fn, params) for serving graphs: the polyphase-folded
        execution on TPU (exact output, ~1.7× on V1 — docs/BENCH.md), the
        standard path elsewhere.  apply_fn(params, mel, mel_len=None)."""
        from spev_tpu.utils.platform import on_tpu

        use_folded = on_tpu() if prefer_folded is None else bool(prefer_folded)
        if use_folded:
            from spev_tpu.models.hifigan_folded import apply_hifigan_folded

            cfg = self.cfg
            return (
                lambda p, mel, mel_len=None: apply_hifigan_folded(p, cfg, mel, mel_len),
                self.folded,
            )
        cfg = self.cfg
        return (
            lambda p, mel, mel_len=None: apply_hifigan(p, cfg, mel, mel_len=mel_len),
            self.params,
        )

    def jitted_runtime(self, prefer_folded: "bool | None" = None):
        """Like `runtime`, but the apply_fn is a cached ``jax.jit`` wrapper.

        Callers that build a fresh jit per invocation (e.g. one stream =
        one `stream_vocode` call) would otherwise re-trace every time —
        measured 4.4 s per stream start vs ~40 ms with the cache."""
        from spev_tpu.utils.platform import on_tpu

        key = on_tpu() if prefer_folded is None else bool(prefer_folded)
        if key not in self._jitted:
            apply_fn, params = self.runtime(prefer_folded=key)
            self._jitted[key] = (jax.jit(apply_fn), params)
        return self._jitted[key]

    @staticmethod
    def from_pretrained(directory: str) -> "HiFiGANGenerator":
        import glob as _glob

        from spev_tpu.utils.torch_loader import load_checkpoint

        cfg = HiFiGANConfig.from_json(os.path.join(directory, "config.json"))
        ckpts = sorted(_glob.glob(os.path.join(directory, "g_*")))
        if not ckpts:
            raise FileNotFoundError(f"no g_* checkpoint in {directory}")
        raw = load_checkpoint(ckpts[-1])
        sd = raw["generator"] if "generator" in raw else raw
        params = jax.tree.map(jnp.asarray, hifigan_params_from_state_dict(sd, cfg))
        return HiFiGANGenerator(cfg, params)

    @staticmethod
    def random_init(key, cfg: HiFiGANConfig | None = None) -> "HiFiGANGenerator":
        cfg = cfg or HiFiGANConfig()
        return HiFiGANGenerator(cfg, init_hifigan(key, cfg))

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        return apply_hifigan(self.params, self.cfg, mel)
