"""Vocoder wrapper: HiFi-GAN when a checkpoint directory is available,
Griffin-Lim fallback otherwise (reference ``spev_real_metrics.py:709-736``).

Both paths run on-device; the Griffin-Lim fallback feeds ``exp(log_mel)``
into the NNLS + Griffin-Lim pipeline with the reference CONFIG's fmin/fmax
(``:730-733``)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spev_tpu.config import AudioConfig
from spev_tpu.models.hifigan import HiFiGANGenerator
from spev_tpu.ops.griffin_lim import mel_to_audio


class Vocoder:
    """mel (T, n_mels) log-domain → waveform.

    Args:
      hifigan_dir: directory with config.json + g_* checkpoint; when absent
        (or None) Griffin-Lim is used, mirroring the reference fallback.
    """

    def __init__(
        self,
        hifigan_dir: Optional[str] = None,
        audio: AudioConfig = AudioConfig(),
        generator: Optional[HiFiGANGenerator] = None,
        frame_buckets: tuple = (256, 512, 1024, 2048),
    ):
        self.audio = audio
        self.generator = generator
        self.frame_buckets = tuple(sorted(frame_buckets))
        if generator is None and hifigan_dir and os.path.exists(
            os.path.join(hifigan_dir, "config.json")
        ):
            try:
                self.generator = HiFiGANGenerator.from_pretrained(hifigan_dir)
            except FileNotFoundError:
                self.generator = None
        self._jit_gl = None

    @property
    def is_neural(self) -> bool:
        return self.generator is not None

    def infer(self, log_mel: jnp.ndarray) -> np.ndarray:
        """log_mel (T, n_mels) → waveform np.float32 (T·hop,)-ish.

        The HiFi-GAN path pads T to a frame bucket and runs the masked
        generator (bit-exact on the valid prefix), so a long-running
        server compiles one graph per bucket instead of one per distinct
        utterance length."""
        if self.generator is not None:
            # the generator's cached jitted runtime is shared with the
            # streaming path — one jit wrapper per (generator, path)
            run, vparams = self.generator.jitted_runtime()
            T = int(log_mel.shape[0])
            top = self.frame_buckets[-1]
            # beyond the top bucket: round up to a multiple of it so long
            # inputs still hit a bounded set of compiled graphs
            bucket = next((b for b in self.frame_buckets if T <= b),
                          -(-T // top) * top)
            mel = jnp.asarray(log_mel)
            if bucket > T:
                mel = jnp.pad(mel, ((0, bucket - T), (0, 0)),
                              constant_values=-10.0)
            hop = self.generator.cfg.hop_recovery
            wav = run(vparams, mel[None], jnp.asarray([T], jnp.int32))[0]
            return np.asarray(wav[: T * hop])
        if self._jit_gl is None:
            a = self.audio

            def run(mel):
                return mel_to_audio(
                    jnp.exp(mel).T,
                    sr=a.sample_rate,
                    n_fft=a.n_fft,
                    hop_length=a.hop_length,
                    fmin=a.fmin,
                    fmax=a.fmax,
                )

            self._jit_gl = jax.jit(run)
        return np.asarray(self._jit_gl(jnp.asarray(log_mel)))
