"""Post-norm transformer encoder with windowed relative-position attention.

Functional JAX equivalent of the BTSE bio encoder's transformer
(``model/wav2vec2_btse/transformer.py``: ``Encoder`` :17-52,
``MultiHeadAttention`` with ``window_size`` rel-pos :105-246, ``FFN`` k=1
:283-310) — the VITS-style encoder with shared-across-heads relative key and
value embeddings of window 4.

TPU-first notes:
- the reference's 1x1 convs for q/k/v/o are plain linears here (identical
  math, one dot each — MXU-friendly);
- the relative->absolute index shuffles are the standard static pad/reshape
  tricks (no gathers, no dynamic shapes);
- masks are float multiplies + additive -1e4 fill exactly like the reference
  (NOT -inf: parity with the reference's masked_fill value matters because
  fully-masked rows would otherwise NaN);
- layer norm always fp32 (framework convention).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.ops.layers import (
    dropout,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)

Params = Dict[str, Any]


def _rel_to_abs(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, 2L-1] relative logits -> [B, H, L, L] absolute."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1 :]


def _abs_to_rel(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, L, L] absolute weights -> [B, H, L, 2L-1] relative."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def _window_embeddings(rel: jnp.ndarray, length: int, window: int) -> jnp.ndarray:
    """Expand [1, 2w+1, d] window embeddings to [1, 2L-1, d] (zero-padded
    outside the window, clipped when L <= w — reference
    ``_get_relative_embeddings`` :219-233)."""
    pad = max(length - (window + 1), 0)
    start = max(window + 1 - length, 0)
    padded = jnp.pad(rel, ((0, 0), (pad, pad), (0, 0)))
    return jax.lax.dynamic_slice_in_dim(padded, start, 2 * length - 1, axis=1)


def init_relpos_encoder(
    key,
    dim: int,
    ffn_dim: int,
    num_heads: int,
    num_layers: int,
    window: int = 4,
) -> Params:
    head_dim = dim // num_heads
    std = head_dim**-0.5
    layers = []
    ks = jax.random.split(key, num_layers)
    for lk in ks:
        sub = jax.random.split(lk, 8)
        layers.append(
            {
                "q": init_linear(sub[0], dim, dim),
                "k": init_linear(sub[1], dim, dim),
                "v": init_linear(sub[2], dim, dim),
                "o": init_linear(sub[3], dim, dim),
                # heads-share rel embeddings (reference heads_share=True)
                "rel_k": std * jax.random.normal(sub[4], (1, 2 * window + 1, head_dim)),
                "rel_v": std * jax.random.normal(sub[5], (1, 2 * window + 1, head_dim)),
                "ln1": init_layer_norm(dim),
                "fc1": init_linear(sub[6], dim, ffn_dim),
                "fc2": init_linear(sub[7], ffn_dim, dim),
                "ln2": init_layer_norm(dim),
            }
        )
    return {"layers": layers}


def _rel_attention(
    lp: Params,
    x: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray],
    num_heads: int,
    window: int,
    p_dropout: float,
    rng,
    train: bool,
) -> jnp.ndarray:
    b, t, d = x.shape
    hd = d // num_heads
    q = linear(lp["q"], x).reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    k = linear(lp["k"], x).reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)
    v = linear(lp["v"], x).reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    scale = 1.0 / math.sqrt(hd)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    rel_k = _window_embeddings(lp["rel_k"], t, window)  # [1, 2T-1, hd]
    rel_logits = jnp.einsum("bhqd,rmd->bhqm", q * scale, rel_k)
    scores = scores + _rel_to_abs(rel_logits)

    if attn_mask is not None:
        scores = jnp.where(attn_mask == 0, -1e4, scores)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    p = dropout(rng, p, p_dropout, deterministic=not train)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    rel_v = _window_embeddings(lp["rel_v"], t, window)
    out = out + jnp.einsum("bhqm,rmd->bhqd", _abs_to_rel(p).astype(v.dtype), rel_v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return linear(lp["o"], out)


def relpos_encoder(
    params: Params,
    x: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
    num_heads: int = 4,
    window: int = 4,
    p_dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """x [B, T, D], x_mask [B, T] (1 = valid) -> [B, T, D].

    Post-norm residual blocks: x = LN(x + drop(attn)); x = LN(x + drop(ffn)),
    inputs/outputs multiplied by the mask (reference Encoder.forward :40-51).
    """
    mask = None if x_mask is None else x_mask.astype(x.dtype)[..., None]
    attn_mask = (
        None
        if x_mask is None
        else (x_mask[:, None, :, None] * x_mask[:, None, None, :])
    )
    if mask is not None:
        x = x * mask
    for i, lp in enumerate(params["layers"]):
        rs = (
            jax.random.split(jax.random.fold_in(rng, i), 4)
            if rng is not None
            else [None] * 4
        )
        y = _rel_attention(lp, x, attn_mask, num_heads, window, p_dropout, rs[0], train)
        y = dropout(rs[1], y, p_dropout, deterministic=not train)
        x = layer_norm(lp["ln1"], x + y)
        y = x if mask is None else x * mask
        y = jax.nn.relu(linear(lp["fc1"], y))
        y = dropout(rs[2], y, p_dropout, deterministic=not train)
        y = linear(lp["fc2"], y)
        if mask is not None:
            y = y * mask
        y = dropout(rs[3], y, p_dropout, deterministic=not train)
        x = layer_norm(lp["ln2"], x + y)
    return x if mask is None else x * mask
