"""spev_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-synthesis framework.

A ground-up rebuild of the capabilities of the SPEV-TTS reference system
(FastSpeech 2 acoustic model with six variance predictors, learned voice-quality
controls, VAD emotion conditioning, physiological constraints, procedural vocal
events, embodied-agent coordination, HiFi-GAN vocoding with Griffin-Lim
fallback, and the full data/training/inference pipeline), re-designed for TPU:

- every compute-path op is a jitted XLA graph or a Pallas kernel,
- length regulation is a static-shape gather (zero host round-trips),
- training runs under `pjit` over a `jax.sharding.Mesh` from day one,
- DSP (STFT, mel, F0, Griffin-Lim) is implemented natively as MXU-friendly
  matmul kernels rather than delegated to librosa.

Layering (bottom-up): `ops` -> `text`/`data` -> `models` -> `train`/`infer`
-> `agents` -> `cli`.  See SURVEY.md at the repo root for the reference
blueprint this framework is built to.
"""

__version__ = "0.3.0"

from spev_tpu.config import AudioConfig, ModelConfig, TrainConfig, SpevConfig

__all__ = [
    "AudioConfig",
    "ModelConfig",
    "TrainConfig",
    "SpevConfig",
    "Synthesizer",
    "EmbodiedAgent",
    "Trainer",
    "infer_tts",
    "__version__",
]


def __getattr__(name):  # lazy top-level API (avoids importing jax at pkg import)
    if name == "Synthesizer":
        from spev_tpu.infer.synthesis import Synthesizer

        return Synthesizer
    if name == "infer_tts":
        from spev_tpu.infer.synthesis import infer_tts

        return infer_tts
    if name == "EmbodiedAgent":
        from spev_tpu.agents.embodied import EmbodiedAgent

        return EmbodiedAgent
    if name == "Trainer":
        from spev_tpu.train.trainer import Trainer

        return Trainer
    raise AttributeError(name)
