"""Advanced acoustic model: the reconstructed spev_advanced surface.

The documented-but-absent ``spev_advanced.py`` (SURVEY.md §2.9) adds, on top
of the base FastSpeech 2:

- **VAD emotion embedding**: a 3-D valence/arousal/dominance vector embedded
  into hidden space and added to the encoder representations
  (``PRODUCTION_SYSTEM_SUMMARY.md:71-82``);
- **speaker embedding** (multi-speaker stretch, ``:286-292``);
- **age**: pitch formula ``pitch_scale *= 1.0 + (25 − age) · 0.008``
  (``:83-89``);
- **lung capacity**: breath-need → duration extension and added
  breathiness (``:91-94``);
- **word emphasis**: per-word scalars mapped to phoneme-level duration/
  pitch/energy scaling (``:95-99``);
- **nasality** and mel-domain voice-quality DSP (see
  `spev_tpu.ops.mel_dsp`).

Design: the learned parts (VAD + speaker tables) are additive conditioning
through `apply_fastspeech2`'s ``encoder_bias`` hook, so an advanced
checkpoint strictly extends a base checkpoint (base params load unchanged,
advanced params are extra keys).  The physiological rules (age, lung
capacity) and word emphasis are deterministic control-plane transforms
computed here and fed through the standard control inputs — they compile
into the same graph as traced scalars/vectors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from spev_tpu.config import ModelConfig
from spev_tpu.models import modules as nn
from spev_tpu.models.fastspeech2 import apply_fastspeech2, init_fastspeech2


def init_advanced_extras(key, cfg: ModelConfig) -> dict:
    """Extra parameter groups for the advanced model."""
    k1, k2 = jax.random.split(key)
    extras = {
        # 3-D VAD vector → hidden bias; zero-init so an untrained VAD head
        # is exactly a no-op on base-model numerics
        "vad_proj": {
            "weight": jnp.zeros((cfg.hidden_dim, 3), jnp.float32),
            "bias": jnp.zeros((cfg.hidden_dim,), jnp.float32),
        }
    }
    if cfg.n_speakers > 1:
        extras["speaker_embedding"] = nn.init_embedding(
            k2, cfg.n_speakers, cfg.hidden_dim, padding_idx=None
        )
        extras["speaker_embedding"]["weight"] = extras["speaker_embedding"]["weight"] * 0.01
    return extras


def init_advanced(key, cfg: ModelConfig) -> dict:
    k1, k2 = jax.random.split(key)
    params = init_fastspeech2(k1, cfg)
    params["advanced"] = init_advanced_extras(k2, cfg)
    return params


# ---------------------------------------------------------------------------
# physiological / expressive control rules (host- or trace-side, pure)
# ---------------------------------------------------------------------------


def age_pitch_scale(age: float, base_scale: float = 1.0) -> float:
    """Documented age→pitch rule: ``pitch *= 1.0 + (25 − age)·0.008``
    (``PRODUCTION_SYSTEM_SUMMARY.md:83-89``)."""
    return float(base_scale * (1.0 + (25.0 - float(age)) * 0.008))


@dataclass(frozen=True)
class LungEffect:
    breath_boost: float
    duration_scale: float


def lung_capacity_effect(lung_capacity: float) -> LungEffect:
    """Breath-need rule: low lung capacity → more audible breath and slower,
    stretched phrasing (duration extension, ``:91-94``).  lung_capacity in
    (0, 1], 1.0 = full capacity = no effect."""
    lc = float(np.clip(lung_capacity, 0.05, 1.0))
    need = 1.0 - lc
    return LungEffect(breath_boost=0.4 * need, duration_scale=1.0 + 0.2 * need)


def apply_advanced(
    params: dict,
    cfg: ModelConfig,
    phoneme_ids: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    vad: Optional[jnp.ndarray] = None,  # (B, 3) valence/arousal/dominance
    speaker_ids: Optional[jnp.ndarray] = None,  # (B,)
    emphasis: Optional[jnp.ndarray] = None,  # (B, P) per-phoneme word emphasis
    target_breath: Optional[jnp.ndarray] = None,
    target_rough: Optional[jnp.ndarray] = None,
    target_bright: Optional[jnp.ndarray] = None,
    d_control=1.0,
    p_control=1.0,
    e_control=1.0,
    **kw,
) -> dict:
    """Advanced forward: base forward + VAD/speaker conditioning + emphasis.

    Word emphasis multiplies the per-phoneme duration (pre-round, via the
    length-regulator's duration input) and scales the pitch/energy
    predictions — implemented by folding the emphasis vector into the
    control plane before the base forward (documented semantics: emphasized
    words get proportionally more duration/pitch/energy).
    """
    extras = params.get("advanced", {})
    bias = None
    if vad is not None and "vad_proj" in extras:
        w = extras["vad_proj"]
        b = jnp.matmul(vad, w["weight"].T, precision=nn.get_matmul_precision()) + w["bias"]
        bias = b[:, None, :]  # broadcast over phonemes
    if speaker_ids is not None and "speaker_embedding" in extras:
        spk = nn.embedding(extras["speaker_embedding"], speaker_ids, padding_idx=None)
        bias = spk[:, None, :] if bias is None else bias + spk[:, None, :]

    if emphasis is not None:
        # emphasis scales pitch/energy multiplicatively via the scalar
        # control plane per phoneme: fold into d_control-style per-phoneme
        # duration scaling by pre-scaling through the duration decode.
        # Duration is emphasized by scaling the decoded durations; pitch /
        # energy by scaling the predicted z-scores.
        d_control = d_control * emphasis
        p_control = p_control * emphasis
        e_control = e_control * emphasis

    out = apply_fastspeech2(
        params,
        cfg,
        phoneme_ids,
        lengths,
        target_breath=target_breath,
        target_rough=target_rough,
        target_bright=target_bright,
        d_control=d_control,
        p_control=p_control,
        e_control=e_control,
        encoder_bias=bias,
        **kw,
    )
    return out
