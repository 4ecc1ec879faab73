"""spev_tpu.diag — profiling, metrics logging, mel-plot artifacts.

The reference has no tracing/profiling at all (SURVEY.md §5.1); its
observability is print statements and per-epoch mel PNGs — which remain the
project's main debugging tool, so they are kept — plus this module adds
first-class TPU profiling (`jax.profiler` traces and blocked step timing).
"""

from spev_tpu.diag.metrics import log_metrics, read_metrics
from spev_tpu.diag.plots import save_mel_plot, save_comparison_plot
from spev_tpu.diag.profiling import trace, timed_steps, StepTimer
from spev_tpu.diag.probes import test_inference_probe, mel_statistics

__all__ = [
    "log_metrics",
    "read_metrics",
    "save_mel_plot",
    "save_comparison_plot",
    "trace",
    "timed_steps",
    "StepTimer",
    "test_inference_probe",
    "mel_statistics",
]
