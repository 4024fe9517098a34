"""Functional layer primitives over explicit parameter pytrees.

No module framework: every layer is an ``init_*`` returning a param dict and
an ``apply``-style pure function.  This keeps checkpoint conversion a plain
key-mapping exercise, makes sharding rules a path->PartitionSpec table, and
leaves XLA free to fuse.

Numerics conventions (TPU-first, parity-preserving):
- matmuls may run in a lower compute dtype (bfloat16) with fp32 accumulation
  via ``preferred_element_type``;
- layer norm and softmax always run in fp32;
- GELU is the exact erf form (torch ``nn.GELU()``/HF ``gelu`` default), not
  the tanh approximation that is ``jax.nn.gelu``'s default.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU."""
    return jax.nn.gelu(x, approximate=False)


def init_linear(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    """Torch-style uniform init (matches nn.Linear defaults for comparable
    starting loss): W, b ~ U(-1/sqrt(in), 1/sqrt(in)); W stored [in, out]."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


# Always request HIGHEST precision: for bf16 operands this is the native
# single-pass MXU mode (bf16 multiply, fp32 accumulate); for fp32 operands it
# prevents XLA from silently demoting to bf16 passes (TPU) or reduced-precision
# oneDNN paths (CPU).  Precision policy therefore lives entirely in the
# operand dtype (compute_dtype), never in hidden backend defaults.
PRECISION = jax.lax.Precision.HIGHEST


def linear(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32, precision=PRECISION)
    return y + b.astype(y.dtype)


def init_layer_norm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Always-fp32 layer norm over the last axis; returns x's dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def init_conv1d(
    key, in_dim: int, out_dim: int, kernel: int, bias: bool = True, groups: int = 1,
    dtype=jnp.float32,
) -> Params:
    """Kernel stored [K, in/groups, out] (lax 'WIO' layout). Torch-style
    uniform fan-in init."""
    kw, kb = jax.random.split(key)
    fan_in = (in_dim // groups) * kernel
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(kw, (kernel, in_dim // groups, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return p


def conv1d(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    padding="VALID",
    groups: int = 1,
    compute_dtype=None,
) -> jnp.ndarray:
    """x: [B, T, C_in] -> [B, T', C_out]. ``padding`` is 'VALID'/'SAME' or
    [(lo, hi)]."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    pad = padding if isinstance(padding, str) else [tuple(padding[0])]
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=PRECISION,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def dropout(
    key: Optional[jax.Array], x: jnp.ndarray, rate: float, deterministic: bool
) -> jnp.ndarray:
    if deterministic or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
