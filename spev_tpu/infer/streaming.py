"""Streaming synthesis — chunked low-latency vocoding.

The reference lists streaming as an unimplemented upgrade path
(``PRODUCTION_SYSTEM_SUMMARY.md:286-297``); here it is a first-class
serving mode:

- `stream_vocode`: chunk a long mel into fixed windows with a left context
  covering the generator's receptive field; each chunk is one compiled
  HiFi-GAN call (a single (context+chunk)-frame graph reused for every
  chunk), and only the non-context samples are emitted.  With context ≥
  the receptive field the emitted audio is sample-exact vs a full pass.
- `stream_text`: sentence/clause-level incremental synthesis — yields
  audio as each segment's mel is ready instead of waiting for the full
  utterance.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp


def receptive_field_frames(cfg) -> int:
    """Upper bound of the generator's receptive field in INPUT (mel) frames.

    Per upsampling stage the field grows by the transposed-conv kernel plus
    the resblock dilations; mapped back to input resolution."""
    total = 1.0
    up = 1
    for k_up, u, in zip(cfg.upsample_kernel_sizes, cfg.upsample_rates):
        up *= u
        total += k_up / up
        for kr, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            span = sum((kr - 1) * d for d in dils) * (2 if cfg.resblock == "1" else 1)
            total += span / up
    total += 7  # conv_pre (k=7) at input resolution + conv_post margin
    return int(np.ceil(total)) + 1


def stream_vocode(
    generator,
    mel: jnp.ndarray,
    chunk_frames: int = 64,
    context_frames: Optional[int] = None,
) -> Iterator[np.ndarray]:
    """Yield waveform chunks for a (T, n_mels) log-mel.

    Each yielded array covers chunk_frames·hop samples (the last chunk may
    be shorter).  One compiled graph of (context+chunk) frames serves all
    chunks.
    """
    cfg = generator.cfg
    hop = cfg.hop_recovery
    ctx = context_frames if context_frames is not None else receptive_field_frames(cfg)
    T = mel.shape[0]
    n_mels = mel.shape[1]
    win = ctx + chunk_frames

    # cached jit: repeat streams reuse the compiled (ctx+chunk) graph
    run, vparams = generator.jitted_runtime()

    # left-pad with the mel floor so the first chunk has full context
    mel_pad = jnp.concatenate(
        [jnp.full((ctx, n_mels), -10.0, mel.dtype), jnp.asarray(mel)], axis=0
    )
    for start in range(0, T, chunk_frames):
        seg = jax.lax.dynamic_slice(
            jnp.pad(mel_pad, ((0, max(0, start + win - mel_pad.shape[0])), (0, 0)),
                    constant_values=-10.0),
            (start, 0),
            (win, n_mels),
        )
        wav = np.asarray(run(vparams, seg[None])[0])
        emit = wav[ctx * hop :]
        valid = min(chunk_frames, T - start) * hop
        yield emit[:valid]


_SENTENCE_RE = re.compile(r"([.!?;:,]+\s*)")


def split_clauses(text: str, min_chars: int = 12) -> list:
    """Split text at punctuation into clauses, merging short ones forward."""
    pieces = _SENTENCE_RE.split(text)
    clauses, buf = [], ""
    for i in range(0, len(pieces), 2):
        clause = pieces[i] + (pieces[i + 1] if i + 1 < len(pieces) else "")
        buf += clause
        if len(buf.strip()) >= min_chars:
            clauses.append(buf.strip())
            buf = ""
    if buf.strip():
        if clauses:
            clauses[-1] = clauses[-1] + " " + buf.strip()
        else:
            clauses.append(buf.strip())
    return clauses or [text.strip()]


def stream_text(synthesizer, text: str, min_chars: int = 12, **controls) -> Iterator[np.ndarray]:
    """Incremental text→audio: split on punctuation into clauses (merged up
    to min_chars) and yield each clause's waveform as it is synthesized —
    first audio after the first clause instead of the full utterance."""
    for seg in split_clauses(text, min_chars):
        wav, _ = synthesizer.synthesize(seg, **controls)
        yield wav
