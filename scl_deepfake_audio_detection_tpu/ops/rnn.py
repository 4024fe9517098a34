"""Recurrent layers (GRU) as ``lax.scan`` loops.

Capability match for the BTSE bio encoders' torch ``nn.GRU``
(``model/wav2vec2_btse/model.py:92,127`` — single layer, batch_first).
Torch gate math exactly: r/z/n gates with the reset gate applied to the
hidden projection of n.  The scan body is one fused [3H] matmul pair per
step — small H (the bio encoders use 32-64), so this is VPU-bound and cheap;
sequence lengths are static per the framework's fixed-shape design.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def init_gru(key, in_dim: int, hidden: int, dtype=jnp.float32) -> Params:
    """Torch nn.GRU init: all weights/biases U(-1/sqrt(H), 1/sqrt(H));
    weight_ih [3H, in], weight_hh [3H, H] stored transposed for right-matmul."""
    k = 1.0 / math.sqrt(hidden)
    ks = jax.random.split(key, 4)
    u = lambda kk, shape: jax.random.uniform(kk, shape, dtype, -k, k)
    return {
        "w_ih": u(ks[0], (in_dim, 3 * hidden)),
        "w_hh": u(ks[1], (hidden, 3 * hidden)),
        "b_ih": u(ks[2], (3 * hidden,)),
        "b_hh": u(ks[3], (3 * hidden,)),
    }


def gru(
    p: Params,
    x: jnp.ndarray,
    h0: Optional[jnp.ndarray] = None,
    lengths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x [B, T, D] -> (outputs [B, T, H], last hidden [B, H]).

    ``lengths`` [B] freezes the hidden state past each sequence's end, so the
    returned last hidden equals torch's packed-sequence final hidden.
    """
    b, t, _ = x.shape
    h = h0 if h0 is not None else jnp.zeros((b, p["w_hh"].shape[0]), x.dtype)
    hdim = h.shape[-1]

    gates_x = jnp.einsum("btd,dg->btg", x, p["w_ih"]) + p["b_ih"]  # [B,T,3H]

    def step(h, inp):
        gx, step_idx = inp
        gh = h @ p["w_hh"] + p["b_hh"]
        xr, xz, xn = jnp.split(gx, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        if lengths is not None:
            alive = (step_idx < lengths)[:, None]
            h_new = jnp.where(alive, h_new, h)
        return h_new, h_new

    steps = jnp.arange(t)
    h_last, outs = jax.lax.scan(
        step, h, (jnp.swapaxes(gates_x, 0, 1), steps)
    )
    return jnp.swapaxes(outs, 0, 1), h_last
