"""The static-shape length regulator must reproduce the reference's
host-loop semantics exactly (``spev_real_metrics.py:122-146``; SURVEY.md §7
hard part #1), including the duration guard, zero-duration skipping, the
all-zero → one-zero-frame rule, and right padding."""

import numpy as np
import jax.numpy as jnp

from spev_tpu.ops.length_regulator import length_regulate, length_regulate_feature


def reference_length_regulate(x: np.ndarray, durations: np.ndarray):
    """Direct reimplementation of the reference semantics as a host loop."""
    B, T, H = x.shape
    outs, lens = [], []
    for b in range(B):
        rows = []
        for t in range(T):
            d = float(durations[b, t])
            if not np.isfinite(d) or d < 0 or d > 1000:
                d = 0
            n = int(d)
            if n > 0:
                rows.append(np.repeat(x[b, t : t + 1], n, axis=0))
        if not rows:
            outs.append(np.zeros((1, H), x.dtype))
            lens.append(1)
        else:
            cat = np.concatenate(rows, axis=0)
            outs.append(cat)
            lens.append(len(cat))
    max_len = max(lens)
    stacked = np.stack(
        [np.pad(o, ((0, max_len - len(o)), (0, 0))) for o in outs]
    )
    return stacked, np.array(lens)


def test_matches_reference_loop():
    rng = np.random.default_rng(0)
    B, T, H = 3, 7, 4
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    durs = rng.integers(0, 5, size=(B, T)).astype(np.float32)
    durs[1, 3] = 0  # explicit zero-duration phoneme

    ref, ref_lens = reference_length_regulate(x, durs)
    M = 64
    ours, lens = length_regulate(jnp.asarray(x), jnp.asarray(durs), max_frames=M)
    ours = np.asarray(ours)
    np.testing.assert_array_equal(np.asarray(lens), ref_lens)
    np.testing.assert_allclose(ours[:, : ref.shape[1]], ref, atol=0)
    assert np.all(ours[:, ref.shape[1] :] == 0)


def test_guard_and_nan_durations():
    x = np.ones((1, 4, 2), np.float32)
    durs = np.array([[2.0, np.nan, 2000.0, 3.0]], np.float32)
    ref, ref_lens = reference_length_regulate(x, durs)
    ours, lens = length_regulate(jnp.asarray(x), jnp.asarray(durs), max_frames=16)
    np.testing.assert_array_equal(np.asarray(lens), ref_lens)  # 2 + 3 = 5
    np.testing.assert_allclose(np.asarray(ours)[:, :5], ref)


def test_all_zero_row_yields_one_zero_frame():
    x = np.ones((2, 3, 2), np.float32)
    durs = np.array([[0, 0, 0], [1, 2, 0]], np.float32)
    ours, lens = length_regulate(jnp.asarray(x), jnp.asarray(durs), max_frames=8)
    assert int(lens[0]) == 1
    assert int(lens[1]) == 3
    assert np.all(np.asarray(ours)[0] == 0)


def test_feature_expansion_matches():
    rng = np.random.default_rng(1)
    f = rng.standard_normal((2, 5)).astype(np.float32)
    durs = rng.integers(1, 4, size=(2, 5)).astype(np.float32)
    ref, _ = reference_length_regulate(f[..., None], durs)
    ours = np.asarray(length_regulate_feature(jnp.asarray(f), jnp.asarray(durs), max_frames=32))
    np.testing.assert_allclose(ours[:, : ref.shape[1]], ref[..., 0])


def test_truncation_at_bucket_boundary():
    # totals beyond the bucket must clip mel_len to the bucket
    x = np.ones((1, 2, 2), np.float32)
    durs = np.array([[6, 6]], np.float32)
    ours, lens = length_regulate(jnp.asarray(x), jnp.asarray(durs), max_frames=8)
    assert int(lens[0]) == 8
    assert np.all(np.asarray(ours) == 1)
