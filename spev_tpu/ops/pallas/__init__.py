"""spev_tpu.ops.pallas — hand-written TPU kernels for the hot DSP ops.

These kernels fuse whole DSP pipelines into single VMEM-resident passes
(the XLA versions in `spev_tpu.ops` remain the portable/default path and
the numerical ground truth the kernels are tested against):

- `fused_log_mel`: framing → window → matmul-rDFT (MXU) → power → mel
  filterbank (MXU) → log/clip in ONE kernel: the signal is streamed
  HBM→VMEM once per frame block and never materialized as a frame matrix
  in HBM (the XLA path's gather-framing writes ~4× the signal).
- `overlap_add`: windowed ISTFT overlap-add as per-block accumulation of
  the ≤ n_fft/hop shifted frame slices — replaces the XLA scatter-add.

- `length_regulate_fused`: length regulation as a one-hot matmul on the
  MXU, expanding the hidden states and all variance tracks in one VMEM
  pass (the XLA path is a gather on the scalar/vector units; the
  reference needed six host loops).  Differentiable: a custom VJP runs
  the transposed selection matmul as a second kernel, so training graphs
  use it too.
"""

from spev_tpu.ops.pallas.kernels import fused_log_mel, overlap_add
from spev_tpu.ops.pallas.length_regulator_kernel import length_regulate_fused

__all__ = ["fused_log_mel", "overlap_add", "length_regulate_fused"]
