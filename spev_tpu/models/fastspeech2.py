"""FastSpeech 2 acoustic model with six variance predictors — one XLA graph.

Functional rebuild of the reference model (``spev_real_metrics.py:72-277``):
phoneme embedding → 4 encoder FFT blocks → duration/pitch/energy/breath/
rough/bright variance predictors (with the reference's clamp contract) →
static-shape length regulation of the hidden states and each variance →
5 variance-embedding convs added to the decoder input → 4 decoder FFT blocks
→ linear mel head clamped to [-10, 2].

TPU-first changes vs the reference (behavior-preserving for valid positions):

- Length regulation is the fixed-shape gather from
  `spev_tpu.ops.length_regulator`; the output frame axis is the static
  bucket ``cfg.max_frames`` with an explicit ``mel_len`` and mask.  No host
  round-trips (the reference syncs per phoneme, ``:129``).
- Padded positions are zeroed after each FFT block.  The reference reaches
  the same state through NaN propagation + ``nan_to_num`` (``:194-196,
  262-265``); for unpadded inputs (all reference inference is B=1 unpadded)
  the two are bit-identical.  (The reference's NaN path additionally
  contaminates up to 8 valid boundary frames per block in *padded training
  batches* before zeroing them; we do not reproduce that defect.)
- Teacher forcing vs inference vs control-override are trace-time branches,
  so each serving mode is one compiled graph with no data-dependent Python.

Advanced conditioning (VAD emotion embedding, speaker embedding, age pitch
formula, lung-capacity breath extension, word emphasis — the reconstructed
``spev_advanced`` surface, SURVEY.md §2.9) lives in
`spev_tpu.models.advanced` and wraps this module.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from spev_tpu.config import ModelConfig
from spev_tpu.models import modules as nn
from spev_tpu.ops.length_regulator import length_regulate, length_regulate_feature


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_fft_block(key, cfg: ModelConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    h = cfg.hidden_dim
    return {
        "attention": nn.init_mha(k1, h, cfg.n_heads),
        "norm1": nn.init_layer_norm(h),
        "conv1": nn.init_conv1d(k2, h, h * cfg.ffn_expansion, cfg.ffn_kernel_size),
        "conv2": nn.init_conv1d(k3, h * cfg.ffn_expansion, h, cfg.ffn_kernel_size),
        "norm2": nn.init_layer_norm(h),
    }


def _init_variance_predictor(key, cfg: ModelConfig) -> dict:
    h = cfg.hidden_dim
    keys = jax.random.split(key, cfg.vp_layers + 1)
    convs = [nn.init_conv1d(keys[i], h, h, cfg.vp_kernel_size) for i in range(cfg.vp_layers)]
    norms = [nn.init_layer_norm(h) for _ in range(cfg.vp_layers)]
    return {
        "convs": convs,
        "norms": norms,
        "proj": nn.init_linear(keys[-1], h, 1),
        "output_norm": nn.init_layer_norm(1),
    }


def _init_small_conv(key, out_ch: int, kernel: int = 3) -> dict:
    """Variance-embedding conv with the reference's N(0, 0.01²) init and zero
    bias (``spev_real_metrics.py:170-173``)."""
    p = nn.init_conv1d(key, 1, out_ch, kernel)
    return {
        "weight": 0.01 * jax.random.normal(key, p["weight"].shape, jnp.float32),
        "bias": jnp.zeros_like(p["bias"]),
    }


VARIANCES = ("duration", "pitch", "energy", "breath", "rough", "bright")


def init_fastspeech2(key, cfg: ModelConfig) -> dict:
    keys = iter(jax.random.split(key, 32))
    params = {
        "embedding": nn.init_embedding(next(keys), cfg.vocab_size, cfg.embed_dim, padding_idx=0),
        "encoder_blocks": [_init_fft_block(next(keys), cfg) for _ in range(cfg.n_encoder_layers)],
        "decoder_blocks": [_init_fft_block(next(keys), cfg) for _ in range(cfg.n_decoder_layers)],
    }
    for name in VARIANCES:
        params[f"{name}_predictor"] = _init_variance_predictor(next(keys), cfg)
    for name in ("pitch", "energy", "breath", "rough", "bright"):
        params[f"{name}_embedding"] = _init_small_conv(next(keys), cfg.hidden_dim)
    if cfg.use_nasality:
        # learned nasality channel (documented advanced loss term
        # ``0.1·L_nasal``, PRODUCTION_SYSTEM_SUMMARY.md:55-69,133): a 7th
        # variance predictor + embedding conv.  Zero-input → zero-bias conv
        # output, so an advanced checkpoint remains a strict extension.
        params["nasal_predictor"] = _init_variance_predictor(next(keys), cfg)
        params["nasal_embedding"] = _init_small_conv(next(keys), cfg.hidden_dim)
    # mel head: N(0, 0.01²) weights, zero bias (``:179-181``)
    k = next(keys)
    params["mel_linear"] = {
        "weight": 0.01 * jax.random.normal(k, (cfg.n_mels, cfg.hidden_dim), jnp.float32),
        "bias": jnp.zeros((cfg.n_mels,), jnp.float32),
    }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fft_block(
    p: dict,
    x: jnp.ndarray,
    cfg: ModelConfig,
    pad_mask: jnp.ndarray,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jnp.ndarray:
    """Transformer FFT block (``spev_real_metrics.py:83-90``): self-attn +
    residual LN, conv FFN (k=9, 4× expansion, ReLU) + residual LN.  Padded
    positions are zeroed on exit (see module docstring)."""
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    attn = nn.multi_head_attention(p["attention"], x, cfg.n_heads, key_padding_mask=pad_mask)
    attn = nn.dropout(attn, cfg.dropout, r1, deterministic)
    x = nn.layer_norm(p["norm1"], x + attn)
    # zero padded positions before every conv so each conv sees the same
    # implicit zero padding at the true sequence end as the reference's
    # unpadded tensors do (torch 'same' padding)
    x = jnp.where(pad_mask[..., None], 0.0, x)
    h = nn.conv1d(p["conv1"], x)
    h = jax.nn.relu(h)
    h = jnp.where(pad_mask[..., None], 0.0, h)
    h = nn.conv1d(p["conv2"], h)
    h = nn.dropout(h, cfg.dropout, r2, deterministic)
    x = nn.layer_norm(p["norm2"], x + h)
    return jnp.where(pad_mask[..., None], 0.0, x)


def _variance_predictor(
    p: dict,
    x: jnp.ndarray,
    cfg: ModelConfig,
    pad_mask: jnp.ndarray,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jnp.ndarray:
    """2× [conv(k=3) → ReLU → LN → dropout] → Linear(→1) → LayerNorm(1)
    (``spev_real_metrics.py:92-120``).  The trailing LayerNorm over one
    feature makes the output a learned constant (= its bias); preserved for
    checkpoint parity, switchable via cfg.vp_output_norm.  Padded positions
    are zeroed between layers so the convs see the reference's implicit
    zero padding at the sequence end."""
    h = x
    for i in range(cfg.vp_layers):
        r = None
        if rng is not None:
            rng, r = jax.random.split(rng)
        h = nn.conv1d(p["convs"][i], h)
        h = jax.nn.relu(h)
        h = nn.layer_norm(p["norms"][i], h)
        h = jnp.where(pad_mask[..., None], 0.0, h)
        h = nn.dropout(h, cfg.vp_dropout, r, deterministic)
    out = nn.linear(p["proj"], h)  # (B, T, 1)
    if cfg.vp_output_norm:
        out = nn.layer_norm(p["output_norm"], out)
    return out[..., 0]


def _variance_predictors_fused(
    params: dict,
    names: list,
    x: jnp.ndarray,
    cfg: ModelConfig,
    pad_mask: jnp.ndarray,
    rngs: Optional[jnp.ndarray],
    deterministic: bool,
) -> jnp.ndarray:
    """All K variance predictors in one vmapped pass over stacked params.

    The predictors share one architecture and one input, so stacking their
    parameter trees turns K small conv/matmul dispatches per layer into one
    K-batched matmul — better MXU occupancy on TPU, identical math
    (verified bitwise-equal to the sequential path in
    ``tests/test_parity_torch.py::test_fused_predictors_match_sequential``).
    ``rngs``: (K, key) stacked dropout keys in the same per-predictor order
    the sequential path consumes, so dropout masks are identical too.
    Returns (K, B, T) raw predictor outputs (clamps applied by the caller).
    """
    stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves), *[params[n] for n in names])
    if rngs is not None:
        return jax.vmap(
            lambda p, r: _variance_predictor(p, x, cfg, pad_mask, r, deterministic)
        )(stacked, rngs)
    return jax.vmap(
        lambda p: _variance_predictor(p, x, cfg, pad_mask, None, deterministic)
    )(stacked)


def apply_fastspeech2(
    params: dict,
    cfg: ModelConfig,
    phoneme_ids: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    target_durations: Optional[jnp.ndarray] = None,
    target_pitch: Optional[jnp.ndarray] = None,
    target_energy: Optional[jnp.ndarray] = None,
    target_breath: Optional[jnp.ndarray] = None,
    target_rough: Optional[jnp.ndarray] = None,
    target_bright: Optional[jnp.ndarray] = None,
    target_nasal: Optional[jnp.ndarray] = None,
    d_control=1.0,
    p_control=1.0,
    e_control=1.0,
    encoder_bias: Optional[jnp.ndarray] = None,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> dict:
    """Forward pass (reference ``spev_real_metrics.py:183-277``).

    Args:
      phoneme_ids: (B, P) int32, zero-padded to the static phoneme bucket.
      lengths: (B,) int32 valid phoneme counts.
      target_*: teacher-forcing targets (B, P); passing target_durations
        selects the training path.  target_breath/rough/bright alone act as
        inference-time control overrides (``:222-224``).  target_nasal is
        the learned nasality channel's override/target (cfg.use_nasality;
        documented advanced surface, PRODUCTION_SYSTEM_SUMMARY.md:55-69).
      d/p/e_control: scalar controls (duration multiplier pre-round, pitch &
        energy z-score multipliers, ``:215-217``).
      encoder_bias: optional (B, P, H) additive conditioning applied after
        the encoder stack — the hook used by the advanced model for VAD /
        speaker embeddings (SURVEY.md §2.9) without altering base numerics
        when absent.

    Returns a dict matching the reference output keys plus ``frame_mask``.
    """
    clamps = cfg.clamps
    B, P = phoneme_ids.shape

    x = nn.embedding(params["embedding"], phoneme_ids, padding_idx=0)
    src_mask = jnp.arange(P, dtype=jnp.int32)[None, :] >= lengths[:, None]  # True = pad

    rngs = iter(jax.random.split(dropout_rng, 64)) if dropout_rng is not None else None

    def next_rng():
        return next(rngs) if rngs is not None else None

    block_fn = _fft_block
    if cfg.remat:
        policy = (jax.checkpoint_policies.dots_saveable
                  if cfg.remat_policy == "dots" else None)
        block_fn = jax.checkpoint(_fft_block, static_argnums=(2, 5), policy=policy)

    for block in params["encoder_blocks"]:
        x = block_fn(block, x, cfg, src_mask, next_rng(), deterministic)

    if encoder_bias is not None:
        x = jnp.where(src_mask[..., None], 0.0, x + encoder_bias)

    # predictors with the strict clamp contract (``:199-204``).  The six
    # (seven with nasality) identical predictor stacks run as ONE vmapped
    # pass over stacked params — K-batched matmuls instead of K small
    # dispatches (cfg.fused_predictors; bitwise-equal to sequential).
    has_nasal = cfg.use_nasality and "nasal_predictor" in params
    pred_names = ["duration_predictor", "pitch_predictor", "energy_predictor",
                  "bright_predictor", "breath_predictor", "rough_predictor"]
    if has_nasal:
        pred_names.append("nasal_predictor")
    if getattr(cfg, "fused_predictors", True):
        pred_rngs = (
            jnp.stack([next_rng() for _ in pred_names]) if rngs is not None else None
        )
        raw = _variance_predictors_fused(
            params, pred_names, x, cfg, src_mask, pred_rngs, deterministic
        )
    else:
        raw = jnp.stack([
            _variance_predictor(params[n], x, cfg, src_mask, next_rng(), deterministic)
            for n in pred_names
        ])
    log_dur_pred = jnp.clip(raw[0], *clamps.log_dur)
    pitch_pred = jnp.clip(raw[1], *clamps.pitch)
    energy_pred = jnp.clip(raw[2], *clamps.energy)
    bright_pred = jnp.clip(raw[3], *clamps.bright)
    breath_pred = jnp.clip(raw[4], *clamps.breath)
    rough_pred = jnp.clip(raw[5], *clamps.rough)
    nasal_pred = None
    if has_nasal:
        # learned nasality channel (PRODUCTION_SYSTEM_SUMMARY.md:55-69):
        # documented control range 0-1
        nasal_pred = jnp.clip(raw[6], 0.0, 1.0)

    teacher_forced = target_durations is not None
    if teacher_forced:
        durations = target_durations
        pitch, energy = target_pitch, target_energy
        breath, rough, bright = target_breath, target_rough, target_bright
    else:
        # duration decode (``:215``): round(clamp((exp(ld)-1)*d_control, 0, 500));
        # both torch.round and jnp.round are round-half-to-even.
        durations = jnp.round(
            jnp.clip((jnp.exp(log_dur_pred) - 1.0) * d_control, 0.0, clamps.duration_max)
        )
        # padded phoneme positions must not emit frames (the reference never
        # runs padded inference batches; this is the faithful generalization)
        durations = jnp.where(src_mask, 0.0, durations)
        pitch = pitch_pred * p_control
        energy = energy_pred * e_control
        breath = breath_pred
        rough = rough_pred
        bright = bright_pred
        if target_breath is not None:
            breath = target_breath
        if target_rough is not None:
            rough = target_rough
        if target_bright is not None:
            bright = target_bright

    nasal = None
    if nasal_pred is not None:
        nasal = target_nasal if target_nasal is not None else nasal_pred

    M = cfg.max_frames
    guard = clamps.duration_guard_max
    if cfg.use_pallas_lr == "auto":
        # all TPU graphs: the fused kernel carries a custom VJP (transposed
        # selection matmul) so gradient contexts are safe — measured
        # +17% train steps/s in bf16 mode, +4% in bf16x3 parity mode, and
        # 1.9x on the serving forward vs the XLA gather.
        from spev_tpu.utils.platform import on_tpu

        use_pallas_lr = on_tpu()
    else:
        use_pallas_lr = bool(cfg.use_pallas_lr)
    nasal_f = None
    if use_pallas_lr:
        # fused Pallas path: hidden + all variance tracks in one kernel
        from spev_tpu.ops.pallas.length_regulator_kernel import length_regulate_fused

        tracks = [pitch, energy, breath, rough, bright]
        if nasal is not None:
            tracks.append(nasal)
        feats = jnp.stack(tracks, axis=-1)
        x_expanded, feats_f, mel_len = length_regulate_fused(
            x, feats, durations, M, guard
        )
        pitch_f, energy_f, breath_f, rough_f, bright_f = (
            feats_f[..., 0], feats_f[..., 1], feats_f[..., 2],
            feats_f[..., 3], feats_f[..., 4],
        )
        if nasal is not None:
            nasal_f = feats_f[..., 5]
    else:
        x_expanded, mel_len = length_regulate(x, durations, M, guard)
        pitch_f = length_regulate_feature(pitch, durations, M, guard)
        energy_f = length_regulate_feature(energy, durations, M, guard)
        breath_f = length_regulate_feature(breath, durations, M, guard)
        rough_f = length_regulate_feature(rough, durations, M, guard)
        bright_f = length_regulate_feature(bright, durations, M, guard)

    # post-expansion clamps (``:239-243``)
    pitch_f = jnp.clip(pitch_f, *clamps.pitch_expanded)
    energy_f = jnp.clip(energy_f, *clamps.energy_expanded)
    breath_f = jnp.clip(breath_f, *clamps.breath_expanded)
    rough_f = jnp.clip(rough_f, *clamps.rough_expanded)
    bright_f = jnp.clip(bright_f, *clamps.bright_expanded)

    frame_mask = jnp.arange(M, dtype=jnp.int32)[None, :] >= mel_len[:, None]  # True = pad
    # NOTE: post-expansion clamps map padded zeros of breath outside [0,1]?
    # no — zero is inside every expanded range, so padding stays zero.

    dec = (
        x_expanded
        + nn.conv1d(params["pitch_embedding"], pitch_f[..., None])
        + nn.conv1d(params["energy_embedding"], energy_f[..., None])
        + nn.conv1d(params["breath_embedding"], breath_f[..., None])
        + nn.conv1d(params["rough_embedding"], rough_f[..., None])
        + nn.conv1d(params["bright_embedding"], bright_f[..., None])
    )
    if nasal is not None:
        if nasal_f is None:  # gather path: 6th track expanded separately
            nasal_f = length_regulate_feature(nasal, durations, M, guard)
        nasal_f = jnp.clip(nasal_f, 0.0, 1.0)
        dec = dec + nn.conv1d(params["nasal_embedding"], nasal_f[..., None])

    for block in params["decoder_blocks"]:
        dec = block_fn(block, dec, cfg, frame_mask, next_rng(), deterministic)

    mel = nn.linear(params["mel_linear"], dec)
    mel = jnp.clip(mel, *clamps.mel)  # (``:269``)

    return {
        "mel_pred": mel,
        "log_duration_pred": log_dur_pred,
        "pitch_pred": pitch_pred,
        "energy_pred": energy_pred,
        "breath_pred": breath_pred,
        "rough_pred": rough_pred,
        "bright_pred": bright_pred,
        **({"nasal_pred": nasal_pred} if nasal_pred is not None else {}),
        "src_mask": src_mask,
        "mel_len": mel_len,
        "frame_mask": frame_mask,
        "durations": durations,
    }


class FastSpeech2:
    """Thin OO wrapper bundling config + init/apply for ergonomic use."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg

    def init(self, key) -> dict:
        return init_fastspeech2(key, self.cfg)

    def apply(self, params: dict, phoneme_ids, lengths, **kw) -> dict:
        return apply_fastspeech2(params, self.cfg, phoneme_ids, lengths, **kw)
