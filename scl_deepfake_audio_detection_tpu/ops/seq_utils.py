"""Sequence utilities — the VITS ``commons.py`` helper belt, rebuilt TPU-first.

The reference vendors ``model/wav2vec2_btse/commons.py`` (timing signals,
segment slicing, monotonic-alignment path expansion, Gaussian KL, value
gradient clipping) as part of the BTSE package surface. This module matches
those capabilities for the [B, T, C] layout this framework uses.

TPU-first redesign notes:
- layout is [B, T, C] (time-major-in-the-middle, like the rest of ``ops``)
  rather than torch's [B, C, T]; masks carry explicit shapes;
- ``slice_segments`` is a vmapped ``lax.dynamic_slice`` — one gather per
  batch row instead of the reference's python loop over the batch
  (``commons.py:48-54``), so it compiles to a single fused program;
- ``sequence_mask``/``subsequent_mask`` take *static* lengths under jit
  (XLA needs static shapes); ``sequence_mask``'s per-row lengths stay traced;
- ``generate_path`` is the cumsum-threshold-difference formulation
  (``commons.py:128-143``) with no flatten/reshape round-trip;
- ``clip_grad_value`` is a pure pytree transform returning the clipped
  grads *and* the pre-clip total norm (the torch original mutates ``.grad``
  in place, ``commons.py:146-161``); per-leaf norms are accumulated in fp32.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def gaussian_kl(
    m_p: jnp.ndarray, logs_p: jnp.ndarray, m_q: jnp.ndarray, logs_q: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise KL(P||Q) between diagonal Gaussians given means and
    log-stddevs (``commons.py:30-34``)."""
    kl = (logs_q - logs_p) - 0.5
    kl += 0.5 * (jnp.exp(2.0 * logs_p) + (m_p - m_q) ** 2) * jnp.exp(-2.0 * logs_q)
    return kl


def rand_gumbel(key, shape) -> jnp.ndarray:
    """Gumbel samples with the reference's overflow guard: uniforms squeezed
    into [1e-5, 0.99999] before the double log (``commons.py:37-40``)."""
    u = jax.random.uniform(key, shape) * 0.99998 + 0.00001
    return -jnp.log(-jnp.log(u))


def sequence_mask(length: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[B, max_length] bool mask of valid positions (``commons.py:121-125``).
    ``max_length`` must be static under jit (it sets the output shape)."""
    x = jnp.arange(max_length, dtype=length.dtype)
    return x[None, :] < length[:, None]


def subsequent_mask(length: int) -> jnp.ndarray:
    """[1, 1, T, T] causal (lower-triangular) mask (``commons.py:95-97``)."""
    return jnp.tril(jnp.ones((length, length), jnp.float32))[None, None]


def slice_segments(
    x: jnp.ndarray, ids_str: jnp.ndarray, segment_size: int = 4
) -> jnp.ndarray:
    """Per-row fixed-size time slices: ``out[b] = x[b, ids_str[b]:+S]``
    (``commons.py:48-54``). x is [B, T, C]; one dynamic_slice per row."""

    def one(row, start):
        return jax.lax.dynamic_slice_in_dim(row, start, segment_size, axis=0)

    return jax.vmap(one)(x, ids_str)


def rand_slice_segments(
    key,
    x: jnp.ndarray,
    x_lengths: Optional[jnp.ndarray] = None,
    segment_size: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random per-row slices; start ~ floor(U(0,1) * (len - S + 1))
    (``commons.py:57-64``). Returns (segments, start indices)."""
    b, t, _ = x.shape
    if x_lengths is None:
        x_lengths = jnp.full((b,), t, jnp.int32)
    ids_str_max = x_lengths - segment_size + 1
    ids_str = (jax.random.uniform(key, (b,)) * ids_str_max).astype(jnp.int32)
    return slice_segments(x, ids_str, segment_size), ids_str


def get_timing_signal_1d(
    length: int,
    channels: int,
    min_timescale: float = 1.0,
    max_timescale: float = 1.0e4,
) -> jnp.ndarray:
    """[1, T, C] transformer sinusoid table (``commons.py:67-80``): first
    C//2 channels sin, next C//2 cos, odd C zero-padded."""
    position = jnp.arange(length, dtype=jnp.float32)
    num_timescales = channels // 2
    log_inc = math.log(float(max_timescale) / float(min_timescale)) / (
        num_timescales - 1
    )
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32) * -log_inc
    )
    scaled = position[:, None] * inv_timescales[None, :]  # [T, C//2]
    signal = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
    if channels % 2:
        signal = jnp.pad(signal, ((0, 0), (0, 1)))
    return signal[None]


def add_timing_signal_1d(
    x: jnp.ndarray, min_timescale: float = 1.0, max_timescale: float = 1.0e4
) -> jnp.ndarray:
    """x + sinusoid table, broadcast over batch (``commons.py:83-86``)."""
    _, t, c = x.shape
    return x + get_timing_signal_1d(t, c, min_timescale, max_timescale).astype(x.dtype)


def cat_timing_signal_1d(
    x: jnp.ndarray,
    min_timescale: float = 1.0,
    max_timescale: float = 1.0e4,
    axis: int = -1,
) -> jnp.ndarray:
    """Concat the sinusoid table onto x (``commons.py:89-92``)."""
    b, t, c = x.shape
    sig = get_timing_signal_1d(t, c, min_timescale, max_timescale).astype(x.dtype)
    return jnp.concatenate([x, jnp.broadcast_to(sig, (b, t, c))], axis=axis)


def shift_1d(x: jnp.ndarray) -> jnp.ndarray:
    """Shift right by one step along time, zero-filled (``commons.py:116-118``).
    x is [B, T, C]."""
    return jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Monotonic-alignment path from integer durations (``commons.py:128-143``).

    duration: [B, T_x] (per-input-token durations)
    mask:     [B, T_y, T_x] attention-domain mask
    returns:  [B, T_y, T_x] one-hot path, path[b, y, j] = 1 iff output frame
    y is attributed to input token j (cumsum threshold difference).
    """
    t_y = mask.shape[1]
    cum = jnp.cumsum(duration, axis=-1)  # [B, T_x]
    frames = jnp.arange(t_y, dtype=cum.dtype)  # [T_y]
    # reached[b, y, j] = (y < cum[b, j])
    reached = (frames[None, :, None] < cum[:, None, :]).astype(mask.dtype)
    prev = jnp.pad(reached, ((0, 0), (0, 0), (1, 0)))[..., :-1]
    return (reached - prev) * mask


def clip_grad_value(grads, clip_value: Optional[float], norm_type: float = 2.0):
    """Value-clip a gradient pytree, returning (clipped, total_norm) where
    total_norm is ``(sum_leaf ||g_leaf||_p^p)^(1/p)`` of the *unclipped*
    grads — the torch semantics (``commons.py:146-161``). ``clip_value
    None`` computes the norm only. Distinct from the optimizer's
    global-norm clipping (`train/optim.make_optimizer`)."""
    leaves = jax.tree.leaves(grads)
    p = float(norm_type)
    total = sum(
        jnp.sum(jnp.abs(g.astype(jnp.float32)) ** p) for g in leaves
    ) ** (1.0 / p)
    if clip_value is None:
        return grads, total
    c = float(clip_value)
    return jax.tree.map(lambda g: jnp.clip(g, -c, c), grads), total


def intersperse(lst: list, item) -> list:
    """[a, b] -> [item, a, item, b, item] (``commons.py:24-27``; host-side
    token-list helper)."""
    result = [item] * (len(lst) * 2 + 1)
    result[1::2] = lst
    return result
