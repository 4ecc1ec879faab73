"""Inference-time mel-domain voice-quality DSP (spev_advanced mechanisms).

The documented spev_advanced module applies voice-quality effects directly
in the mel domain (``PRODUCTION_SYSTEM_SUMMARY.md:55-69``):

- **breathiness**: Gaussian noise injected into mel bins 40-80;
- **roughness**: sinusoidal amplitude modulation of the low mel bins;
- **nasality**: mid-frequency boost + high-frequency attenuation.

These operate on log-mel (B, T, n_mels) inside the jitted serving graph and
compose with the *learned* breath/rough/bright controls of the acoustic
model (the reference has both mechanisms; SURVEY.md §2.9 requires the
union).  All effects are no-ops at strength 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_breathiness_noise(
    mel: jnp.ndarray, strength, rng: jax.Array, lo: int = 40, hi: int = 80
) -> jnp.ndarray:
    """Inject Gaussian noise into the high mel bins (aspiration energy)."""
    n_mels = mel.shape[-1]
    hi = min(hi, n_mels)
    band = (jnp.arange(n_mels) >= lo) & (jnp.arange(n_mels) < hi)
    noise = jax.random.normal(rng, mel.shape, mel.dtype)
    return mel + strength * 0.5 * noise * band.astype(mel.dtype)


def add_roughness_modulation(
    mel: jnp.ndarray, strength, mod_freq_frames: float = 0.15, lo_bins: int = 20
) -> jnp.ndarray:
    """Sinusoidal amplitude modulation of the low mel bins (vocal fry /
    growl proxy).  mod_freq_frames ≈ cycles per frame (~13 Hz at hop 256)."""
    T = mel.shape[-2]
    n_mels = mel.shape[-1]
    t = jnp.arange(T, dtype=mel.dtype)
    mod = jnp.sin(2.0 * jnp.pi * mod_freq_frames * t)[:, None]  # (T, 1)
    band = (jnp.arange(n_mels) < lo_bins).astype(mel.dtype)
    return mel + strength * 0.8 * mod * band


def apply_nasality(
    mel: jnp.ndarray, strength, mid_lo: int = 20, mid_hi: int = 45, high_lo: int = 60
) -> jnp.ndarray:
    """Mid-frequency boost + high-frequency attenuation (nasal resonance)."""
    n_mels = mel.shape[-1]
    bins = jnp.arange(n_mels)
    mid = ((bins >= mid_lo) & (bins < mid_hi)).astype(mel.dtype)
    high = (bins >= high_lo).astype(mel.dtype)
    return mel + strength * (0.6 * mid - 0.8 * high)


def apply_voice_quality(
    mel: jnp.ndarray,
    rng: jax.Array,
    breathiness=0.0,
    roughness=0.0,
    nasality=0.0,
    clip_min: float = -10.0,
    clip_max: float = 2.0,
) -> jnp.ndarray:
    """Compose the three documented effects and re-clip to the mel range."""
    mel = add_breathiness_noise(mel, breathiness, rng)
    mel = add_roughness_modulation(mel, roughness)
    mel = apply_nasality(mel, nasality)
    return jnp.clip(mel, clip_min, clip_max)
