"""Pallas TPU kernels for the spectral front end.

Layout trick used by both kernels: with hop dividing n_fft
(k = n_fft/hop), a hop-aligned reshape of the signal to (rows, hop) turns
*overlapping* frames into k *consecutive* row slices — so a frame block is
assembled from static slices of one DMA'd row range instead of a gather:

    frames[i] = concat(rows[i], rows[i+1], ..., rows[i+k-1])

Each grid step DMAs its row range HBM→VMEM, builds the frame block, and
runs the whole frame→log-mel (or frame→overlap-add) pipeline in VMEM with
the matmuls on the MXU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spev_tpu.ops.stft import _dft_bases, hann_window, mel_filterbank

FRAME_BLOCK = 128


def _mel_kernel(sig_ref, cos_ref, sin_ref, fb_ref, win_ref, out_ref, frames, sem,
                *, k: int, hop: int, floor: float, clip_min: float, clip_max: float,
                precision: str = "highest"):
    i = pl.program_id(0)
    block = out_ref.shape[0]
    # assemble the (block, n_fft) frame matrix with k DMAs from the host's
    # polyphase stack: phase d holds the signal pre-shifted by d·hop, so
    # every DMA row start is block-aligned (Mosaic requires sublane-tiled
    # offsets) and lands at lane offset d·hop with all vector ops at
    # offset 0 (Mosaic cannot concat shifted vectors)
    copies = [
        pltpu.make_async_copy(
            sig_ref.at[d, pl.ds(i * block, block)],
            frames.at[:, d * hop : (d + 1) * hop],
            sem.at[d],
        )
        for d in range(k)
    ]
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()
    f = frames[:] * win_ref[:]
    re = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32, precision=precision)
    im = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32, precision=precision)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32, precision=precision)
    out_ref[:] = jnp.clip(jnp.log(jnp.maximum(mel, floor)), clip_min, clip_max)


def fused_log_mel(
    y: jnp.ndarray,
    sr: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    floor: float = 1e-5,
    clip_min: float = -10.0,
    clip_max: float = 2.0,
    center: bool = True,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Single-kernel log-mel spectrogram, numerically equivalent to
    `spev_tpu.ops.stft.log_mel_spectrogram` (precision='highest' gives
    float32 MXU passes for feature-extraction parity; 'default' gives bf16
    throughput).  Returns (n_mels, n_frames).
    """
    assert n_fft % hop_length == 0, "kernel requires hop | n_fft"
    k = n_fft // hop_length
    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop_length
    blocks = -(-n_frames // FRAME_BLOCK)
    padded_frames = blocks * FRAME_BLOCK
    rows_needed = padded_frames + k - 1
    total = rows_needed * hop_length
    y = jnp.pad(y, (0, max(0, total - y.shape[0])))[:total]
    # polyphase stack: phase d = signal shifted by d·hop, (k, rows, hop)
    sig = jnp.stack(
        [
            jnp.pad(y[d * hop_length :], (0, d * hop_length)).reshape(
                rows_needed, hop_length
            )
            for d in range(k)
        ]
    )

    cos_b, sin_b = _dft_bases(n_fft)
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T  # (F, M)
    win = hann_window(n_fft)[None, :]

    kernel = functools.partial(
        _mel_kernel, k=k, hop=hop_length,
        floor=floor, clip_min=clip_min, clip_max=clip_max, precision=precision,
    )
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # signal rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FRAME_BLOCK, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded_frames, n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((FRAME_BLOCK, n_fft), jnp.float32),
            pltpu.SemaphoreType.DMA((k,)),
        ],
        interpret=interpret,
    )(sig, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(fb), jnp.asarray(win))
    return out[:n_frames].T


def _ola_kernel(frames_ref, wsq_ref, out_ref, chunks, sem, *, k: int, hop: int):
    """out_row r = Σ_d fpad[r - d + (k-1), d·hop:(d+1)·hop].

    The frame matrix is zero-padded by (k-1) rows at both ends on the host,
    so every contribution is a plain shifted row range and out-of-range
    frames contribute exactly zero — no masking needed.  Each shifted
    (block, hop) chunk is DMA'd to sublane offset 0 separately (Mosaic
    cannot add vectors at mismatched offsets)."""
    i = pl.program_id(0)
    block = out_ref.shape[0]
    copies = [
        pltpu.make_async_copy(
            frames_ref.at[d, pl.ds(i * block, block)],
            chunks.at[d],
            sem.at[d],
        )
        for d in range(k)
    ]
    for cp in copies:
        cp.start()
    acc = jnp.zeros((block, hop), jnp.float32)
    for d in range(k):
        copies[d].wait()
        acc = acc + chunks[d]
    out_ref[:] = acc / jnp.maximum(wsq_ref[:], 1e-8)


def overlap_add(
    frames: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed-frame overlap-add with COLA normalization.

    frames: (T, n_fft) already windowed (synthesis window applied).
    Returns the length-(n_fft + hop·(T-1)) signal, matching the scatter-add
    in `spev_tpu.ops.stft.istft`.
    """
    assert n_fft % hop_length == 0
    k = n_fft // hop_length
    T = frames.shape[0]
    out_rows = T + k - 1  # output samples = out_rows * hop
    block = min(FRAME_BLOCK, int(2 ** np.ceil(np.log2(max(out_rows, 1)))))
    blocks = -(-out_rows // block)
    padded_rows = blocks * block

    # zero-pad, then build the polyphase chunk stack on host: phase d holds
    # the (k-1-d)-shifted rows' d-th hop slice, so every kernel DMA is
    # block-aligned (see _mel_kernel)
    fpad = jnp.pad(frames, ((k - 1, padded_rows - T + k - 1), (0, 0)))
    fstack = jnp.stack(
        [
            fpad[(k - 1 - d) : (k - 1 - d) + padded_rows, d * hop_length : (d + 1) * hop_length]
            for d in range(k)
        ]
    )

    # COLA window-square normalization per output row (host constant)
    win = hann_window(n_fft)
    wsq_full = np.zeros(out_rows * hop_length, np.float32)
    idx = np.arange(T)[:, None] * hop_length + np.arange(n_fft)[None, :]
    np.add.at(wsq_full, idx.reshape(-1), np.tile(win * win, (T, 1)).reshape(-1))
    wsq = np.pad(wsq_full, (0, padded_rows * hop_length - len(wsq_full))).reshape(
        padded_rows, hop_length
    )

    kernel = functools.partial(_ola_kernel, k=k, hop=hop_length)
    out = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((block, hop_length), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, hop_length), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded_rows, hop_length), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((k, block, hop_length), jnp.float32),
            pltpu.SemaphoreType.DMA((k,)),
        ],
        interpret=interpret,
    )(fstack, jnp.asarray(wsq))
    return out.reshape(-1)[: out_rows * hop_length]
