"""Static-shape length regulation — the core TPU redesign.

The reference length regulator (``spev_real_metrics.py:122-146``) loops over
every (batch, phoneme) pair on the host, calling ``.item()`` per element — a
device→host sync per phoneme and dynamic output shapes.  On TPU this becomes
a single fixed-shape gather:

    ends   = cumsum(durations, axis=-1)              # (B, T)
    frame2ph[j] = searchsorted(ends, j, 'right')     # (B, M)
    out    = take_along_axis(x, frame2ph)            # (B, M, H)

Zero-duration phonemes are skipped naturally (their [start, end) interval is
empty so no output frame maps to them), reproducing the reference's
``if n > 0`` behavior.  The reference's edge cases are preserved exactly:

- per-duration guard: non-finite or outside [0, 1000] → 0
  (``spev_real_metrics.py:131``);
- an all-zero duration row yields ONE zero frame with mel_len == 1
  (``:138-139``);
- output right-padded with zeros (``:145``), here to the static bucket M.

Everything runs inside jit with static shapes; `mel_len` is returned as a
traced array, never synced to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sanitize_durations(durations: jnp.ndarray, guard_max: float = 1000.0) -> jnp.ndarray:
    """Reference duration validation (``spev_real_metrics.py:131``):
    non-finite, negative, or > guard_max → 0.  Returns int32 durations."""
    d = durations.astype(jnp.float32)
    ok = jnp.isfinite(d) & (d >= 0) & (d <= guard_max)
    d = jnp.where(ok, d, 0.0)
    return d.astype(jnp.int32)


def regulate_lengths(durations: jnp.ndarray, guard_max: float = 1000.0):
    """Compute the frame→phoneme index map and output lengths.

    Args:
      durations: (B, T) int/float durations (frames per phoneme).
    Returns:
      frame_to_ph: (B, M) int32 indices into the phoneme axis — caller
        supplies M implicitly by slicing; here M is taken as the static
        frame bucket passed via `max_frames` in `length_regulate`.
      Used internally; exported for tests.
    """
    d = sanitize_durations(durations, guard_max)
    ends = jnp.cumsum(d, axis=-1)  # (B, T)
    total = ends[..., -1]  # (B,)
    return ends, total


def length_regulate(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_frames: int,
    guard_max: float = 1000.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand phoneme-level features to frame level.

    Args:
      x: (B, T, H) phoneme-level features.
      durations: (B, T) number of frames per phoneme (any numeric dtype).
      max_frames: static output frame bucket M.
      guard_max: per-duration validity ceiling (reference: 1000).

    Returns:
      expanded: (B, M, H) frame-level features, zero right-padded.
      mel_len:  (B,) int32 valid frame counts, ``max(sum(durs), 1)`` —
        the reference emits one zero frame when every duration is 0.
    """
    B, T, H = x.shape
    ends, total = regulate_lengths(durations, guard_max)

    frame_idx = jnp.arange(max_frames, dtype=jnp.int32)  # (M,)
    # frame j belongs to the first phoneme whose cumulative end exceeds j:
    # searchsorted(ends, j, 'right') == #{t : ends[t] <= j}.  Duplicate ends
    # (zero-duration phonemes) are skipped automatically.
    frame_to_ph = jax.vmap(lambda e: jnp.searchsorted(e, frame_idx, side="right"))(ends)
    frame_to_ph = jnp.minimum(frame_to_ph, T - 1).astype(jnp.int32)  # clamp padded tail

    expanded = jnp.take_along_axis(x, frame_to_ph[..., None], axis=1)  # (B, M, H)
    valid = frame_idx[None, :] < jnp.minimum(total, max_frames)[:, None]  # (B, M)
    expanded = jnp.where(valid[..., None], expanded, 0.0)

    mel_len = jnp.maximum(jnp.minimum(total, max_frames), 1).astype(jnp.int32)
    return expanded, mel_len


def length_regulate_feature(
    f: jnp.ndarray,
    durations: jnp.ndarray,
    max_frames: int,
    guard_max: float = 1000.0,
) -> jnp.ndarray:
    """Expand a scalar per-phoneme feature (B, T) to (B, M) frame level.

    Mirrors the reference's ``expand_feat`` helper
    (``spev_real_metrics.py:228-230``) without materializing a trailing
    singleton channel."""
    expanded, _ = length_regulate(f[..., None], durations, max_frames, guard_max)
    return expanded[..., 0]
