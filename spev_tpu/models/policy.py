"""Learned acoustic-policy model (the future replacement for the rule-based
prosody tables).

Reference architecture (defined but untrained, "architecture ready" —
``spev_temporal_policy.py:72-100``): Embedding(128) → 2-layer bidirectional
LSTM → three heads: sigmoid breath, sigmoid rough, tanh×2 bright.

JAX rebuild: the LSTM is a `lax.scan` over time per direction; params are
torch-layout (weight_ih (4H, in), weight_hh (4H, H), gate order i,f,g,o) so
a torch-trained policy checkpoint converts by renaming.  Trainable with the
same optimizer stack as the acoustic model.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from spev_tpu.models import modules as nn


def _init_lstm_layer(key, in_dim: int, hidden: int) -> dict:
    k = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden)
    u = lambda kk, shape: jax.random.uniform(kk, shape, minval=-bound, maxval=bound)
    return {
        "weight_ih": u(k[0], (4 * hidden, in_dim)),
        "weight_hh": u(k[1], (4 * hidden, hidden)),
        "bias_ih": u(k[2], (4 * hidden,)),
        "bias_hh": u(k[3], (4 * hidden,)),
    }


def _lstm_scan(p: dict, x: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """(B, T, in) → (B, T, H) one direction (torch gate order i,f,g,o)."""
    B, T, _ = x.shape
    H = p["weight_hh"].shape[1]

    def step(carry, xt):
        h, c = carry
        gates = (
            jnp.matmul(xt, p["weight_ih"].T, precision=nn.get_matmul_precision())
            + p["bias_ih"]
            + jnp.matmul(h, p["weight_hh"].T, precision=nn.get_matmul_precision())
            + p["bias_hh"]
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(x, 0, 1)  # (T, B, in)
    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def init_policy_model(key, vocab_size: int, hidden: int = 128) -> dict:
    keys = jax.random.split(key, 8)
    return {
        "embedding": nn.init_embedding(keys[0], vocab_size, hidden, padding_idx=None),
        "lstm": [
            # layer 0: input = hidden; layer 1: input = 2*hidden (bi concat)
            {"fwd": _init_lstm_layer(keys[1], hidden, hidden),
             "bwd": _init_lstm_layer(keys[2], hidden, hidden)},
            {"fwd": _init_lstm_layer(keys[3], 2 * hidden, hidden),
             "bwd": _init_lstm_layer(keys[4], 2 * hidden, hidden)},
        ],
        "head_breath": nn.init_linear(keys[5], 2 * hidden, 1),
        "head_rough": nn.init_linear(keys[6], 2 * hidden, 1),
        "head_bright": nn.init_linear(keys[7], 2 * hidden, 1),
    }


def apply_policy_model(
    params: dict, ids: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ids (B, T) → (breath, rough, bright) each (B, T), with the
    reference's output ranges: sigmoid, sigmoid, 2·tanh."""
    x = nn.embedding(params["embedding"], ids, padding_idx=None)
    for layer in params["lstm"]:
        fwd = _lstm_scan(layer["fwd"], x)
        bwd = _lstm_scan(layer["bwd"], x, reverse=True)
        x = jnp.concatenate([fwd, bwd], axis=-1)
    breath = jax.nn.sigmoid(nn.linear(params["head_breath"], x))[..., 0]
    rough = jax.nn.sigmoid(nn.linear(params["head_rough"], x))[..., 0]
    bright = jnp.tanh(nn.linear(params["head_bright"], x))[..., 0] * 2.0
    return breath, rough, bright
