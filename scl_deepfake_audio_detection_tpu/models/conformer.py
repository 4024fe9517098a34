"""Conformer encoder blocks.

Capability match for ``model/conformer.py`` (lucidrains-style ConformerBlock
:180-214 / Conformer :217-253 — present in the reference but imported nowhere;
kept for surface parity as a standalone encoder utility).

Block = half-scale macaron FF -> pre-norm MHSA with clamped relative-position
bias (learned embedding over clipped key-query offsets, :87-112) -> conv
module (pointwise GLU -> depthwise conv k=31 'same' -> BN -> Swish ->
pointwise, :148-177) -> half-scale FF -> final LayerNorm.

TPU-first: NWC layouts, einsum attention with the rel-pos bias as one extra
einsum over a [T, T, head_dim] table built from a static clipped-distance
index (no gathers at runtime — the index matrix is a compile-time constant),
BN buffers threaded per framework convention.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scl_deepfake_audio_detection_tpu.ops.layers import (
    batch_norm,
    conv1d,
    dropout,
    init_batch_norm,
    init_bn_buffers,
    init_conv1d,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)

Params = Dict[str, Any]


def swish(x):
    return x * jax.nn.sigmoid(x)


@dataclass(frozen=True)
class ConformerConfig:
    dim: int = 64
    depth: int = 2
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    conv_expansion: int = 2
    conv_kernel: int = 31
    max_pos_emb: int = 512
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0


def init_conformer_block(key, cfg: ConformerConfig) -> Tuple[Params, Params]:
    d, inner = cfg.dim, cfg.dim_head * cfg.heads
    conv_inner = cfg.dim * cfg.conv_expansion
    ks = iter(jax.random.split(key, 12))
    p = {
        "ff1": {
            "ln": init_layer_norm(d),
            "fc1": init_linear(next(ks), d, d * cfg.ff_mult),
            "fc2": init_linear(next(ks), d * cfg.ff_mult, d),
        },
        "attn": {
            "ln": init_layer_norm(d),
            "q": init_linear(next(ks), d, inner),
            "kv": init_linear(next(ks), d, inner * 2),
            "o": init_linear(next(ks), inner, d),
            "rel_pos": init_embedding(next(ks), 2 * cfg.max_pos_emb + 1, cfg.dim_head),
        },
        "conv": {
            "ln": init_layer_norm(d),
            "pw1": init_conv1d(next(ks), d, conv_inner * 2, 1),
            "dw": init_conv1d(next(ks), conv_inner, conv_inner, cfg.conv_kernel,
                              groups=conv_inner),
            "bn": init_batch_norm(conv_inner),
            "pw2": init_conv1d(next(ks), conv_inner, d, 1),
        },
        "ff2": {
            "ln": init_layer_norm(d),
            "fc1": init_linear(next(ks), d, d * cfg.ff_mult),
            "fc2": init_linear(next(ks), d * cfg.ff_mult, d),
        },
        "post_ln": init_layer_norm(d),
    }
    return p, {"conv": {"bn": init_bn_buffers(conv_inner)}}


def _split_site(rng, i):
    """Independent key per dropout site (reusing one key would correlate
    the masks; same hazard documented at flows.conv_relu_norm)."""
    return None if rng is None else jax.random.fold_in(rng, i)


def _ff(p, x, mult_drop, rng, train):
    y = layer_norm(p["ln"], x)
    y = swish(linear(p["fc1"], y))
    y = dropout(_split_site(rng, 0), y, mult_drop, deterministic=not train)
    y = linear(p["fc2"], y)
    return dropout(_split_site(rng, 1), y, mult_drop, deterministic=not train)


def _rel_pos_bias(p, q, cfg: ConformerConfig):
    """Clamped-distance relative position attention bias (reference :104-112).
    The clipped index matrix is static, so the [T, T, hd] table is gathered
    once at trace time."""
    t = q.shape[2]
    idx = np.clip(
        np.arange(t)[:, None] - np.arange(t)[None, :],
        -cfg.max_pos_emb, cfg.max_pos_emb,
    ) + cfg.max_pos_emb
    table = p["rel_pos"]["w"][jnp.asarray(idx)]  # [T, T, hd]
    return jnp.einsum("bhnd,nrd->bhnr", q, table)


def _attention(p, x, cfg: ConformerConfig, rng, train):
    b, t, _ = x.shape
    h, hd = cfg.heads, cfg.dim_head
    y = layer_norm(p["ln"], x)
    q = linear(p["q"], y).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    kv = linear(p["kv"], y)
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    scale = hd**-0.5
    dots = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    dots = (dots + _rel_pos_bias(p, q, cfg)) * scale
    attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1)
    attn = dropout(_split_site(rng, 0), attn, cfg.attn_dropout,
                   deterministic=not train)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, h * hd)
    out = linear(p["o"], out)
    return dropout(_split_site(rng, 1), out, cfg.attn_dropout,
                   deterministic=not train)


def _conv_module(p, buf, x, cfg: ConformerConfig, rng, train):
    y = layer_norm(p["ln"], x)
    y = conv1d(p["pw1"], y)  # [B, T, 2*inner]
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)  # GLU
    pad = (cfg.conv_kernel - 1) // 2
    y = conv1d(p["dw"], y, padding=[(pad, cfg.conv_kernel - 1 - pad)],
               groups=y.shape[-1])
    y, nb = batch_norm(p["bn"], buf["bn"], y, train)
    y = swish(y)
    y = conv1d(p["pw2"], y)
    return dropout(rng, y, cfg.conv_dropout, deterministic=not train), {"bn": nb}


def conformer_block(
    p: Params, buf: Params, x: jnp.ndarray, cfg: ConformerConfig,
    rng: Optional[jax.Array] = None, train: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    rs = iter(jax.random.split(rng, 4)) if rng is not None else iter([None] * 4)
    x = x + 0.5 * _ff(p["ff1"], x, cfg.ff_dropout, next(rs), train)
    x = x + _attention(p["attn"], x, cfg, next(rs), train)
    y, nb = _conv_module(p["conv"], buf["conv"], x, cfg, next(rs), train)
    x = x + y
    x = x + 0.5 * _ff(p["ff2"], x, cfg.ff_dropout, next(rs), train)
    return layer_norm(p["post_ln"], x), {"conv": nb}


def init_conformer(key, cfg: ConformerConfig) -> Tuple[Params, Params]:
    pairs = [init_conformer_block(k, cfg) for k in jax.random.split(key, cfg.depth)]
    return {"blocks": [p for p, _ in pairs]}, {"blocks": [b for _, b in pairs]}


def conformer(
    params: Params, buffers: Params, x: jnp.ndarray, cfg: ConformerConfig,
    rng: Optional[jax.Array] = None, train: bool = False,
) -> Tuple[jnp.ndarray, Params]:
    """[B, T, dim] -> [B, T, dim] through ``cfg.depth`` blocks."""
    nbs = []
    for i, (p, b) in enumerate(zip(params["blocks"], buffers["blocks"])):
        r = jax.random.fold_in(rng, i) if rng is not None else None
        x, nb = conformer_block(p, b, x, cfg, r, train)
        nbs.append(nb)
    return x, {"blocks": nbs}
