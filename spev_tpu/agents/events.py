"""Procedural non-verbal vocal events (no model, pure DSP).

Reference behavior (``spev_embodied_core.py:41-113``):

- **sigh** (1.2 s): lowpassed noise source, attack→sustain→slow-decay
  envelope, 800-4000 Hz bandpass, ×intensity×0.15;
- **breath-in** (0.4 s): white noise, quadratic-rise envelope,
  1500-6000 Hz bandpass, ×intensity×0.1;
- **grunt** (0.2 s): 60 Hz impulse train (sin > 0.95 gate) + jitter,
  Gaussian bell envelope, ×intensity×0.2;
- dispatch by substring of the event name; unknown events → 100 zeros.

Filters are designed on host (scipy) and applied with the framework's
`lax.scan` IIR kernels so event audio is generated on-device and can be
fused with the synthesis stream.  The simplified decaying-noise event of
the temporal agent (``spev_temporal_policy.py:193-199``) is also provided.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from spev_tpu.ops.filters import butter_ba, butter_sos, lfilter, sosfilt


class VocalEventSynth:
    def __init__(self, sr: int = 22050, seed: int = 0):
        self.sr = sr
        self._key = jax.random.PRNGKey(seed)
        # host-side constant filter designs (reference coefficients)
        self._lp_b, self._lp_a = butter_ba(1, 0.2)
        self._sigh_sos = butter_sos(2, [800, 4000], btype="bandpass", fs=sr)
        self._breath_sos = butter_sos(2, [1500, 6000], btype="bandpass", fs=sr)

    def _noise(self, n: int) -> jnp.ndarray:
        self._key, sub = jax.random.split(self._key)
        return jax.random.normal(sub, (n,), jnp.float32)

    def generate_sigh(self, duration: float = 1.2, intensity: float = 0.8) -> np.ndarray:
        n = int(self.sr * duration)
        noise = lfilter(self._lp_b, self._lp_a, self._noise(n))
        env = np.concatenate(
            [
                np.linspace(0, 1, int(0.2 * self.sr)),
                np.linspace(1, 0.6, int(0.3 * self.sr)),
                np.linspace(0.6, 0, int((duration - 0.5) * self.sr)),
            ]
        )
        env = np.pad(env, (0, max(0, n - len(env))))[:n].astype(np.float32)
        filtered = sosfilt(self._sigh_sos, noise)
        return np.asarray(filtered * jnp.asarray(env) * intensity * 0.15)

    def generate_breath_in(self, duration: float = 0.4, intensity: float = 0.6) -> np.ndarray:
        n = int(self.sr * duration)
        noise = self._noise(n)
        env = (np.linspace(0, 1, n) ** 2).astype(np.float32)
        filtered = sosfilt(self._breath_sos, noise)
        return np.asarray(filtered * jnp.asarray(env) * intensity * 0.1)

    def generate_grunt(self, duration: float = 0.2, intensity: float = 0.5) -> np.ndarray:
        n = int(self.sr * duration)
        t = np.linspace(0, duration, n).astype(np.float32)
        pulses = (np.sin(2 * np.pi * 60.0 * t) > 0.95).astype(np.float32)
        jitter = np.asarray(self._noise(n)) * 0.1
        env = np.exp(-((t - duration / 2) ** 2) / 0.005).astype(np.float32)
        return (pulses + jitter) * env * intensity * 0.2

    def generate_simple(self, event_name: str) -> np.ndarray:
        """Temporal agent's simplified event: decaying noise
        (``spev_temporal_policy.py:193-199``)."""
        duration = 1.0 if "sigh" in event_name else 0.5
        n = int(self.sr * duration)
        t = np.linspace(0, duration, n).astype(np.float32)
        return np.asarray(self._noise(n)) * np.exp(-3 * t) * 0.1

    def get_event(self, event_name: str) -> np.ndarray:
        name = event_name.lower()
        if "sigh" in name:
            return self.generate_sigh()
        if "breath" in name:
            return self.generate_breath_in()
        if "grunt" in name:
            return self.generate_grunt()
        return np.zeros(100, np.float32)
