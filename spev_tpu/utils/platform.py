"""Platform detection helpers shared by 'auto' kernel-selection knobs."""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (axon plugin reports
    platform 'tpu'). Used to resolve ``use_pallas*='auto'`` flags."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
