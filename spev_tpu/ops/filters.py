"""IIR filtering for procedural vocal-event synthesis.

The reference's event synth runs scipy Butterworth filters on the host
(``spev_embodied_core.py:56,73,87``: ``butter`` + ``lfilter``/``sosfilt``).
Filter *design* stays on the host (scipy, tiny constant-size math); filter
*application* becomes a `lax.scan` over a transposed-direct-form-II biquad
cascade so event audio can be generated on-device and fused with synthesis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

try:  # host-side design only
    from scipy import signal as _scipy_signal
except ImportError:  # pragma: no cover
    _scipy_signal = None


def butter_sos(order: int, cutoff, btype: str = "lowpass", fs: float | None = None) -> np.ndarray:
    """Design a Butterworth filter as second-order sections (host-side)."""
    if _scipy_signal is None:  # pragma: no cover
        raise RuntimeError("scipy is required for filter design")
    return _scipy_signal.butter(order, cutoff, btype=btype, fs=fs, output="sos").astype(np.float32)


def butter_ba(order: int, cutoff, btype: str = "lowpass", fs: float | None = None):
    if _scipy_signal is None:  # pragma: no cover
        raise RuntimeError("scipy is required for filter design")
    b, a = _scipy_signal.butter(order, cutoff, btype=btype, fs=fs)
    return b.astype(np.float32), a.astype(np.float32)


def biquad(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Single biquad section (transposed direct form II) via `lax.scan`.

    b = (b0, b1, b2), a = (a0, a1, a2) with a0 == 1.
    """
    b0, b1, b2 = b[0], b[1], b[2]
    a1, a2 = a[1], a[2]

    def step(carry, xn):
        z1, z2 = carry
        yn = b0 * xn + z1
        z1_new = b1 * xn - a1 * yn + z2
        z2_new = b2 * xn - a2 * yn
        return (z1_new, z2_new), yn

    (_, _), y = jax.lax.scan(step, (jnp.zeros(()), jnp.zeros(())), x)
    return y


def sosfilt(sos: np.ndarray | jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Cascade of biquad sections (scipy ``sosfilt`` equivalent, zero
    initial conditions)."""
    sos = jnp.asarray(sos)
    n_sections = sos.shape[0]

    def apply_section(i, sig):
        coeffs = sos[i]
        return biquad(sig, coeffs[:3], coeffs[3:])

    y = x
    for i in range(int(n_sections)):  # static unroll — n_sections is tiny
        y = apply_section(i, y)
    return y


def lfilter(b: np.ndarray, a: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Direct-form IIR filter (scipy ``lfilter`` equivalent) for low orders,
    via `lax.scan` over the recurrence."""
    b = jnp.asarray(b, dtype=x.dtype)
    a = jnp.asarray(a, dtype=x.dtype)
    b = b / a[0]
    a = a / a[0]
    nb, na = b.shape[0], a.shape[0]
    order = max(nb, na) - 1
    bp = jnp.pad(b, (0, order + 1 - nb))
    ap = jnp.pad(a, (0, order + 1 - na))

    def step(z, xn):
        yn = bp[0] * xn + z[0]
        # transposed direct form II state update
        z_new = jnp.roll(z, -1).at[-1].set(0.0)
        z_new = z_new + bp[1:] * xn - ap[1:] * yn
        return z_new, yn

    _, y = jax.lax.scan(step, jnp.zeros((order,), x.dtype), x)
    return y
