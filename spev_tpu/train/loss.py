"""Masked multi-term training loss with the reference's exact semantics.

Reference loss (``spev_real_metrics.py:548-561``):

    loss = 1.0·L1(mel) + 0.5·MSE(log_dur) + 0.1·MSE(pitch) + 0.1·MSE(energy)
         + 0.05·(MSE(breath) + MSE(rough) + MSE(bright))

with two denominator subtleties that must be reproduced under static-shape
bucketing:

- The mel L1 is **unmasked** over the batch-max frame count (the reference
  slices both tensors to ``min(pred_len, target_len)`` — equal under
  teacher forcing — and takes a plain mean, so zero-padded frames *inside*
  the batch max contribute).  We reproduce this with a ``t < batch_max``
  mask and a ``B · batch_max · n_mels`` denominator, where batch_max is a
  traced scalar (no recompilation across batches).
- The predictor MSEs are masked by the source (phoneme-validity) mask and
  normalized by the number of valid positions — reference boolean indexing.

The two-phase schedule from the documented ``spev_tts`` surface
(``README.md:154-156``: warmup epochs train duration only) enters as the
``variance_weight`` multiplier on the pitch/energy/aux terms.
"""

from __future__ import annotations

import jax.numpy as jnp

from spev_tpu.config import TrainConfig


def _masked_mse(pred, target, mask):
    err = jnp.square(pred - target) * mask
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)


def compute_losses(
    outputs: dict,
    batch: dict,
    cfg: TrainConfig,
    variance_weight: float = 1.0,
) -> tuple[jnp.ndarray, dict]:
    """Args:
      outputs: `apply_fastspeech2` output dict (teacher-forced path).
      batch: dict with 'mel' (B, M, n_mels), 'log_durs', 'pitch', 'energy',
        'breath', 'rough', 'bright' (B, P), 'mel_lens' (B,) target frame
        counts — all padded to static buckets.
      variance_weight: 0.0 during duration-only warmup epochs, else 1.0.

    Returns (total_loss, metrics dict).
    """
    src_valid = (~outputs["src_mask"]).astype(jnp.float32)  # (B, P)

    mel_pred = outputs["mel_pred"]  # (B, M, n_mels)
    mel_tgt = batch["mel"]
    B, M, n_mels = mel_pred.shape
    batch_max = jnp.max(batch["mel_lens"]).astype(jnp.float32)
    frame_in_batchmax = (
        jnp.arange(M, dtype=jnp.float32)[None, :] < batch_max
    ).astype(jnp.float32)  # (1, M)

    l_mel = jnp.sum(jnp.abs(mel_pred - mel_tgt) * frame_in_batchmax[..., None]) / (
        B * batch_max * n_mels
    )

    l_dur = _masked_mse(outputs["log_duration_pred"], batch["log_durs"], src_valid)
    l_pitch = _masked_mse(outputs["pitch_pred"], batch["pitch"], src_valid)
    l_energy = _masked_mse(outputs["energy_pred"], batch["energy"], src_valid)
    l_aux = (
        _masked_mse(outputs["breath_pred"], batch["breath"], src_valid)
        + _masked_mse(outputs["rough_pred"], batch["rough"], src_valid)
        + _masked_mse(outputs["bright_pred"], batch["bright"], src_valid)
    )

    total = (
        cfg.w_mel * l_mel
        + cfg.w_duration * l_dur
        + variance_weight * (cfg.w_pitch * l_pitch + cfg.w_energy * l_energy + cfg.w_aux * l_aux)
    )
    metrics = {
        "loss": total,
        "l_mel": l_mel,
        "l_dur": l_dur,
        "l_pitch": l_pitch,
        "l_energy": l_energy,
        "l_aux": l_aux,
    }
    if "nasal_pred" in outputs and "nasal" in batch:
        # documented advanced loss term ``0.1·L_nasal``
        # (PRODUCTION_SYSTEM_SUMMARY.md:133), gated by cfg.model.use_nasality
        l_nasal = _masked_mse(outputs["nasal_pred"], batch["nasal"], src_valid)
        total = total + variance_weight * cfg.w_nasal * l_nasal
        metrics["loss"] = total
        metrics["l_nasal"] = l_nasal
    return total, metrics
