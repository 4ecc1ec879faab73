"""spev_tpu.models — acoustic models and vocoder as pure-functional JAX graphs.

Parameters are plain nested dicts of jnp arrays (pytrees); every model is an
``init(key, cfg) -> params`` plus an ``apply(params, ...) -> outputs`` pair so
the whole forward runs as one jitted XLA graph and shards transparently under
pjit.  Weight layouts are chosen so PyTorch reference checkpoints convert
losslessly (see `spev_tpu.utils.torch_loader`).
"""

from spev_tpu.models import modules
from spev_tpu.models.fastspeech2 import FastSpeech2, init_fastspeech2
from spev_tpu.models.hifigan import HiFiGANGenerator, HiFiGANConfig

__all__ = [
    "modules",
    "FastSpeech2",
    "init_fastspeech2",
    "HiFiGANGenerator",
    "HiFiGANConfig",
]
