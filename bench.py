"""Benchmark: batched text→waveform synthesis RTF on one TPU chip.

Measures the flagship serving graph — full-size FastSpeech2 (hidden 256,
4+4 FFT blocks, 6 variance predictors) fused with a full-size HiFi-GAN V1
generator (512→32 channels, 8·8·2·2 upsampling) in a single jit — and
reports real-time factor (seconds of audio produced per wall second),
mel frames/sec and vocoder samples/sec.

Baseline: the reference's documented 20× real-time on an RTX 3090
(PRODUCTION_SYSTEM_SUMMARY.md:174; BASELINE.md).  ``vs_baseline`` is
ours / 20.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def build_graph():
    from spev_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from spev_tpu.config import ModelConfig
    from spev_tpu.models import modules as nn_mod
    from spev_tpu.models.fastspeech2 import apply_fastspeech2, init_fastspeech2
    from spev_tpu.models.hifigan import HiFiGANConfig, apply_hifigan, init_hifigan

    # serving precision: bf16 MXU passes (parity-grade runs use 'high')
    nn_mod.set_matmul_precision("default")

    cfg = ModelConfig(vocab_size=128, max_phonemes=128, max_frames=768)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    # fix duration decode at 6 frames/phoneme: round((e^b - 1)) = 6
    params["duration_predictor"]["output_norm"]["bias"] = jnp.asarray(
        [np.log(7.0)], jnp.float32
    )
    vcfg = HiFiGANConfig()  # V1: 512 channels, 256x hop recovery
    vparams = init_hifigan(jax.random.PRNGKey(1), vcfg)

    def run(params, vparams, ids, lengths, breath):
        out = apply_fastspeech2(
            params, cfg, ids, lengths,
            target_breath=breath, d_control=1.0, p_control=1.0, e_control=1.0,
        )
        mel = jnp.clip(jnp.nan_to_num(out["mel_pred"], nan=-5.0), -10.0, 2.0)
        wav = apply_hifigan(vparams, vcfg, mel)  # full buckets: no masking needed
        return wav, out["mel_len"]

    return cfg, params, vcfg, vparams, jax.jit(run)


def main():
    cfg, params, vcfg, vparams, run = build_graph()
    sr, hop = 22050, 256
    B, P = 8, cfg.max_phonemes

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(B, P)).astype(np.int32)
    lengths = np.full((B,), P, np.int32)
    breath = np.full((B, P), 0.2, np.float32)
    args = (params, vparams, jnp.asarray(ids), jnp.asarray(lengths), jnp.asarray(breath))

    # compile + warm up
    wav, mel_len = run(*args)
    jax.block_until_ready(wav)
    frames = int(np.asarray(mel_len).sum())
    assert frames == B * cfg.max_frames, f"expected full buckets, got {frames}"

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        wav, mel_len = run(*args)
    jax.block_until_ready(wav)
    dt = time.perf_counter() - t0

    audio_sec = n_iter * B * cfg.max_frames * hop / sr
    rtf_x = audio_sec / dt
    mel_fps = n_iter * B * cfg.max_frames / dt
    samples_ps = n_iter * B * cfg.max_frames * hop / dt

    print(
        json.dumps(
            {
                "metric": "synthesis_rtf_x_realtime",
                "value": round(rtf_x, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf_x / 20.0, 2),
                "mel_frames_per_sec": round(mel_fps),
                "vocoder_samples_per_sec": round(samples_ps),
                "batch": B,
                "wall_sec_per_batch": round(dt / n_iter, 4),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
