"""Persistent XLA compilation cache.

TPU compiles of the full serving graphs take tens of seconds (remote
compile service); caching compiled executables on disk makes every CLI
invocation after the first start in milliseconds.  Called by all CLI entry
points and bench.py; controlled by SPEV_COMPILATION_CACHE (set to '0' to
disable, or to a directory path to relocate).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/spev_tpu/xla")


def enable_compilation_cache() -> None:
    import jax

    setting = os.environ.get("SPEV_COMPILATION_CACHE", "1")
    if setting == "0":
        return
    cache_dir = setting if setting not in ("1", "") else _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these options
