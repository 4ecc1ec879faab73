"""Benchmark: batched text→waveform synthesis RTF on one TPU chip.

Measures the flagship serving graph — full-size FastSpeech2 (hidden 256,
4+4 FFT blocks, 6 variance predictors) fused with a full-size HiFi-GAN V1
generator (512→32 channels, 8·8·2·2 upsampling) in a single jit — in two
configurations:

- **serving** (headline): bf16 vocoder weights/activations, batch 16 —
  the production-throughput mode;
- **parity-grade**: float32 weights with bf16x3 matmuls (the numerics mode
  that meets the ≤1e-3 MAE reference-parity budget), batch 8.

Baseline: the reference's documented 20× real-time on an RTX 3090
(PRODUCTION_SYSTEM_SUMMARY.md:174; BASELINE.md).  ``vs_baseline`` =
serving RTF / 20.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

SR, HOP = 22050, 256


def build(bf16_vocoder: bool):
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from spev_tpu.config import ModelConfig
    from spev_tpu.models import modules as nn_mod
    from spev_tpu.models.fastspeech2 import apply_fastspeech2, init_fastspeech2
    from spev_tpu.models.hifigan import HiFiGANConfig, apply_hifigan, init_hifigan

    nn_mod.set_matmul_precision("default" if bf16_vocoder else "high")

    cfg = ModelConfig(vocab_size=128, max_phonemes=128, max_frames=768)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    # fix duration decode at 6 frames/phoneme: round((e^b - 1)) = 6
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray(
        [np.log(7.0)], jnp.float32
    )
    vcfg = HiFiGANConfig()  # V1: 512 channels, 256x hop recovery
    vparams = init_hifigan(jax.random.PRNGKey(1), vcfg)
    if bf16_vocoder:
        vparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vparams)

    def run(params, vparams, ids, lengths, breath):
        out = apply_fastspeech2(
            params, cfg, ids, lengths,
            target_breath=breath, d_control=1.0, p_control=1.0, e_control=1.0,
        )
        mel = jnp.clip(jnp.nan_to_num(out["mel_pred"], nan=-5.0), -10.0, 2.0)
        if bf16_vocoder:
            mel = mel.astype(jnp.bfloat16)
        wav = apply_hifigan(vparams, vcfg, mel)  # full buckets: no masking
        return wav.astype(jnp.float32), out["mel_len"]

    return cfg, params, vparams, jax.jit(run)


def measure(bf16_vocoder: bool, B: int, n_iter: int = 10):
    cfg, params, vparams, run = build(bf16_vocoder)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        rng.integers(1, cfg.vocab_size, size=(B, cfg.max_phonemes)).astype(np.int32)
    )
    lengths = jnp.full((B,), cfg.max_phonemes, jnp.int32)
    breath = jnp.full((B, cfg.max_phonemes), 0.2, jnp.float32)

    wav, mel_len = run(params, vparams, ids, lengths, breath)
    jax.block_until_ready(wav)
    assert int(np.asarray(mel_len).sum()) == B * cfg.max_frames

    t0 = time.perf_counter()
    for _ in range(n_iter):
        wav, mel_len = run(params, vparams, ids, lengths, breath)
    jax.block_until_ready(wav)
    dt = time.perf_counter() - t0
    audio_sec = n_iter * B * cfg.max_frames * HOP / SR
    return audio_sec / dt, dt / n_iter, cfg


def main():
    serving_rtf, serving_wall, cfg = measure(bf16_vocoder=True, B=16)
    parity_rtf, _, _ = measure(bf16_vocoder=False, B=8)
    B = 16
    print(
        json.dumps(
            {
                "metric": "synthesis_rtf_x_realtime",
                "value": round(serving_rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(serving_rtf / 20.0, 2),
                "parity_grade_rtf": round(parity_rtf, 2),
                "mel_frames_per_sec": round(B * cfg.max_frames / serving_wall),
                "vocoder_samples_per_sec": round(B * cfg.max_frames * HOP / serving_wall),
                "batch": B,
                "wall_sec_per_batch": round(serving_wall, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
