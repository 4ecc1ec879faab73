"""Platform detection helpers shared by 'auto' kernel-selection knobs."""

from __future__ import annotations

import jax
import numpy as np


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (axon plugin reports
    platform 'tpu'). Used to resolve ``use_pallas*='auto'`` flags."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def fetch_overlapped(*arrays):
    """Materialize device arrays on host with OVERLAPPED copies.

    Each bare ``np.asarray(device_array)`` is a blocking round trip; on
    remote/tunneled devices (axon relay: ~45 ms RTT) fetching N results
    sequentially costs N round trips.  Starting every copy first
    (``copy_to_host_async``) overlaps them.  Returns a list of np.ndarray.
    """
    for a in arrays:
        if hasattr(a, "copy_to_host_async"):
            a.copy_to_host_async()
    return [np.asarray(a) for a in arrays]
