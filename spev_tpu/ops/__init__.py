"""spev_tpu.ops — TPU-native DSP and model primitives.

This layer replaces the reference's librosa/scipy native-code substrate
(SURVEY.md §2.8) with XLA graphs and Pallas kernels:

- `stft`: framed STFT as a matmul-DFT (MXU), slaney mel filterbank, log-mel.
- `features`: RMS energy, spectral centroid, YIN/pyin-style F0 + voicing.
- `griffin_lim`: on-device Griffin-Lim vocoder fallback (`lax.scan`).
- `length_regulator`: static-shape gather length regulation (no host sync).
- `filters`: IIR biquad/SOS filtering via `lax.scan` (vocal-event DSP).
"""

from spev_tpu.ops.stft import (
    stft_power,
    stft_complex,
    istft,
    mel_filterbank,
    mel_spectrogram,
    log_mel_spectrogram,
    hann_window,
)
from spev_tpu.ops.length_regulator import length_regulate, regulate_lengths
from spev_tpu.ops.features import pyin_f0, rms_energy, spectral_centroid, yin_f0
from spev_tpu.ops.griffin_lim import griffin_lim, mel_to_audio

__all__ = [
    "stft_power",
    "stft_complex",
    "istft",
    "mel_filterbank",
    "mel_spectrogram",
    "log_mel_spectrogram",
    "hann_window",
    "length_regulate",
    "regulate_lengths",
    "rms_energy",
    "spectral_centroid",
    "pyin_f0",
    "yin_f0",
    "griffin_lim",
    "mel_to_audio",
]
