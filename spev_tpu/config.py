"""Configuration tree for the spev_tpu framework.

One dataclass tree replaces the reference's scattered module-level ``CONFIG``
dict, argparse defaults and in-code constants (reference:
``spev_real_metrics.py:60-67`` audio dict, ``:790-809`` CLI defaults).  The
values below ARE the reference numerics contract — changing them breaks
checkpoint/output parity (see SURVEY.md §2.1).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class AudioConfig:
    """Audio/DSP constants (reference ``spev_real_metrics.py:60-67``)."""

    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float = 8000.0
    # log-mel dynamic range clip (reference ``:363-366``): log(clip(mel,1e-5))
    # then clip to [-10, 2].
    mel_floor: float = 1e-5
    mel_clip_min: float = -10.0
    mel_clip_max: float = 2.0
    # F0 extraction range (reference ``:311`` pyin fmin=60 fmax=500).
    f0_min: float = 60.0
    f0_max: float = 500.0
    # F0 tracker for target extraction: 'pyin' = full candidate-lattice HMM
    # (librosa.pyin semantics, the reference's extractor); 'yin_lite' = the
    # fast best-trough path (identical voiced_prob, per-frame F0).
    f0_method: str = "pyin"

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


@dataclass(frozen=True)
class ClampConfig:
    """Predictor/feature clamp ranges — the model contract
    (reference ``spev_real_metrics.py:199-204,215,239-243,269``)."""

    log_dur: Tuple[float, float] = (-4.0, 4.0)
    pitch: Tuple[float, float] = (-2.5, 2.5)
    energy: Tuple[float, float] = (-2.5, 2.5)
    bright: Tuple[float, float] = (-2.5, 2.5)
    breath: Tuple[float, float] = (0.0, 0.8)
    rough: Tuple[float, float] = (0.0, 1.5)
    # post-length-regulation clamps (``:239-243``)
    pitch_expanded: Tuple[float, float] = (-3.0, 3.0)
    energy_expanded: Tuple[float, float] = (-3.0, 3.0)
    bright_expanded: Tuple[float, float] = (-3.0, 3.0)
    breath_expanded: Tuple[float, float] = (0.0, 1.0)
    rough_expanded: Tuple[float, float] = (0.0, 2.0)
    # duration decode: round(clamp((exp(log_dur)-1)*d_control, 0, 500)) (``:215``)
    duration_max: float = 500.0
    # length-regulator per-duration guard (``:131``)
    duration_guard_max: float = 1000.0
    # mel output clamp (``:269``)
    mel: Tuple[float, float] = (-10.0, 2.0)


@dataclass(frozen=True)
class ModelConfig:
    """FastSpeech2 acoustic-model hyperparameters
    (reference ``spev_real_metrics.py:72-181``)."""

    vocab_size: int = 256
    embed_dim: int = 256
    hidden_dim: int = 256
    n_mels: int = 80
    n_heads: int = 2
    n_encoder_layers: int = 4
    n_decoder_layers: int = 4
    ffn_kernel_size: int = 9
    ffn_expansion: int = 4
    dropout: float = 0.1
    vp_layers: int = 2
    vp_kernel_size: int = 3
    vp_dropout: float = 0.1
    # Reference quirk, preserved for parity: the variance predictors end in
    # LayerNorm over a single feature (``nn.LayerNorm(1)``,
    # ``spev_real_metrics.py:107,119``), which normalizes each scalar to 0 and
    # outputs exactly the LN bias — i.e. a learned constant.  Checkpoint parity
    # requires reproducing this.  Set False for a "fixed" predictor.
    vp_output_norm: bool = True
    clamps: ClampConfig = field(default_factory=ClampConfig)

    # ---- advanced-model surface (reconstructed spev_advanced, SURVEY §2.9) ----
    # VAD (valence/arousal/dominance) 3-D emotion vector embedded into hidden
    # space and added to encoder output.
    use_vad: bool = False
    # speaker embedding table (multi-speaker stretch config)
    n_speakers: int = 1
    # nasality control channel (documented spev_advanced surface)
    use_nasality: bool = False

    # use the Pallas fused length-regulation kernel (one-hot matmul on the
    # MXU, hidden + all variance tracks in one pass) instead of the XLA
    # gather path.  Bit-exact, differentiable (custom VJP = the transposed
    # selection matmul); TPU only.  'auto' (default) enables it for every
    # graph on TPU — serving (1.9x over the gather) and training (+17%
    # steps/s in bf16 mode).
    use_pallas_lr: "bool | str" = "auto"

    # run the six/seven variance predictors as one vmapped pass over
    # stacked params (K-batched matmuls fill the MXU; bitwise-equal to the
    # sequential path including dropout keys).  False = sequential.
    fused_predictors: bool = True

    # rematerialize FFT blocks in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for not keeping the decoder's 2048-frame
    # attention activations live — enables long-sequence/batch training
    remat: bool = False

    # remat granularity when remat=True: 'full' recomputes the whole block
    # (max memory savings); 'dots' saves matmul outputs and recomputes only
    # elementwise/norm ops (jax.checkpoint_policies.dots_saveable) — the
    # usual MFU-optimal point on TPU, where recomputing MXU work is the
    # expensive part and HBM pressure comes from the elementwise chain
    remat_policy: str = "full"

    # static-shape buckets (TPU compilation contract; not part of reference
    # numerics — padding is masked out everywhere)
    max_phonemes: int = 256
    max_frames: int = 2048


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer/trainer hyperparameters (reference
    ``spev_real_metrics.py:493-496,509-514,527-528,560-563,578``)."""

    learning_rate: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-9
    weight_decay: float = 0.01
    warmup_steps: int = 4000
    grad_clip_norm: float = 1.0
    batch_size: int = 16
    grad_accum: int = 1
    epochs: int = 100
    val_fraction: float = 0.05
    max_nan_batches: int = 10
    # loss weights (``:560-561``)
    w_mel: float = 1.0
    w_duration: float = 0.5
    w_pitch: float = 0.1
    w_energy: float = 0.1
    w_aux: float = 0.05
    # learned nasality channel weight (documented advanced loss
    # ``+0.1·L_nasal``, PRODUCTION_SYSTEM_SUMMARY.md:133); active only when
    # model.use_nasality provides a nasal head
    w_nasal: float = 0.1
    # matmul precision for train/eval steps: 'mixed' (the default —
    # forward/loss at 'high' bf16x3, BITWISE-identical to 'high', with
    # single-pass bf16 backward matmuls via custom VJPs: +48% steps/s,
    # one-step updates within 2e-4 relative, convergence dashboard
    # recalibrated under it in docs/QUALITY.md), 'high' (bf16x3 both
    # directions — the parity-grade mode for trajectory-exact comparisons
    # against f32 oracles), or 'default' (pure bf16 matmuls with f32
    # master weights/accumulation elsewhere — ~2.6x faster than 'high',
    # loss trajectory identical to ~1e-4 over tens of steps;
    # docs/BENCH.md)
    matmul_precision: str = "mixed"
    # PRNG implementation for dropout masks: 'auto' resolves to 'rbg' (the
    # TPU's hardware RngBitGenerator — measured 2.1x cheaper than threefry
    # for the step's 18 mask sites, docs/BENCH.md) on TPU and 'threefry'
    # elsewhere, so CPU-calibrated trajectories (tests/test_convergence.py)
    # are unaffected.  Dropout only — init/split stay threefry everywhere.
    dropout_rng_impl: str = "auto"
    # two-phase schedule from the documented spev_tts surface (SURVEY §2.9):
    # the first `warmup_epochs` train only mel+duration; variance-predictor
    # losses are enabled afterwards.  0 = single-phase (spev_real_metrics).
    warmup_epochs: int = 0
    # batches staged ahead of the device by a background thread (npz loads
    # + collate overlap compute — data/prefetch.py); 0 disables
    prefetch_batches: int = 2
    # steps between host fetches of train metrics: the loop consumes step
    # metrics in windows of this size with ONE coalesced device_get per
    # window, because on remote/tunneled devices every separate host fetch
    # costs a full round trip (~30 ms measured) that would dominate a
    # 20-40 ms step.  The NaN abort budget is therefore checked at window
    # granularity (at most `metrics_window-1` extra steps run after the
    # budget is exhausted — the reference's per-batch abort semantics
    # otherwise preserved).  1 = fetch every step.
    metrics_window: int = 8
    seed: int = 0
    # mesh axes; data-parallel is the reference-parity strategy, the model
    # axis is plumbed so tensor parallelism is a config change (SURVEY §2.4)
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)


@dataclass(frozen=True)
class SpevConfig:
    audio: AudioConfig = field(default_factory=AudioConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def replace(self, **kw) -> "SpevConfig":
        return dataclasses.replace(self, **kw)


def default_config() -> SpevConfig:
    return SpevConfig()
