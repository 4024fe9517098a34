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


def dewire_pcm16(x: jnp.ndarray) -> jnp.ndarray:
    """On-device inverse of the host wire format (utils.audio_io.pcm16_encode):
    int16 PCM rescales to float32; anything else passes through.  Used by the
    score step, the emb step and the device-aug composer so every jit entry
    accepts either wire dtype."""
    return x.astype(jnp.float32) / 32768.0 if x.dtype == jnp.int16 else x


def gelu(x: jnp.ndarray, approximate: bool = False) -> jnp.ndarray:
    """GELU. Exact (erf) by default for fp32 parity with the reference.

    ``approximate=True`` selects the tanh form: on TPU, tanh runs on the
    hardware transcendental unit while erf lowers to a long polynomial —
    measured on v5e over [24, 12919, 512] bf16, exact GELU costs +1.5ms over
    a pure copy and tanh GELU +0.0ms.  The forms differ by <= 3e-4 absolute,
    below bf16 resolution, so bf16 compute auto-selects tanh (see
    ``XLSRConfig.gelu_impl``)."""
    return jax.nn.gelu(x, approximate=approximate)


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


def linear(p: Params, x: jnp.ndarray, compute_dtype=None,
           fast_bwd: bool = False) -> jnp.ndarray:
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    mm = _matmul_fast_bwd if fast_bwd else _matmul
    y = mm(x, w)
    return y + b.astype(y.dtype)


def _matmul(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32, precision=PRECISION)


@jax.custom_vjp
def _matmul_fast_bwd(x, w):
    """Same forward as ``_matmul``; the backward casts the incoming
    cotangent to the OPERAND dtype before the two transpose GEMMs.

    Why: the forward accumulates into fp32 (``preferred_element_type``), so
    the cotangent dy arrives fp32 — and the standard transpose rule then
    computes dX = dy·W^T and dW = X^T·dy as fp32-operand GEMMs, which run
    the MXU in multi-pass fp32 mode (~3-8x below its bf16 rate).  Under
    bf16 compute the dW result is rounded to bf16 *anyway* (the weight
    cast's transpose), so rounding dy once beforehand adds one bf16
    rounding of the activation gradient in exchange for bf16-rate transpose
    GEMMs.  No effect with fp32 operands (the cast is a no-op)."""
    return _matmul(x, w)


def _matmul_fast_bwd_fwd(x, w):
    return _matmul(x, w), (x, w)


def _matmul_fast_bwd_bwd(res, g):
    x, w = res
    g = g.astype(w.dtype)
    dx = jnp.dot(g, w.T, preferred_element_type=jnp.float32,
                 precision=PRECISION).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    dw = jnp.dot(x2.T, g2, preferred_element_type=jnp.float32,
                 precision=PRECISION).astype(w.dtype)
    return dx, dw


_matmul_fast_bwd.defvjp(_matmul_fast_bwd_fwd, _matmul_fast_bwd_bwd)


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
    dilation: int = 1,
    compute_dtype=None,
) -> jnp.ndarray:
    """x: [B, T, C_in] -> [B, T', C_out]. ``padding`` is 'VALID'/'SAME' or
    [(lo, hi)]."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    pad = padding if isinstance(padding, str) else [tuple(padding[0])]
    # output dtype == operand dtype: the MXU accumulates in fp32 internally
    # regardless, and the AD transpose then sees matching conv dtypes (an
    # fp32 cotangent against bf16 operands is a lax.conv type error)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        rhs_dilation=(dilation,),
        preferred_element_type=x.dtype,
        precision=PRECISION,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def init_conv2d(
    key,
    in_dim: int,
    out_dim: int,
    kernel,
    bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """2-D conv kernel stored [KH, KW, in, out] ('HWIO'). Torch-style uniform
    fan-in init (matches nn.Conv2d defaults for comparable starting loss)."""
    kh, kw = (kernel, kernel) if isinstance(kernel, int) else tuple(kernel)
    kw_key, kb_key = jax.random.split(key)
    fan_in = in_dim * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(kw_key, (kh, kw, in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb_key, (out_dim,), dtype, -bound, bound)
    return p


def conv2d(
    p: Params,
    x: jnp.ndarray,
    stride=(1, 1),
    padding="VALID",
    compute_dtype=None,
) -> jnp.ndarray:
    """x: [B, H, W, C_in] -> [B, H', W', C_out]. NHWC layout (TPU-native —
    channels on the minor/lane axis so XLA tiles convs onto the MXU).
    ``padding`` is 'VALID'/'SAME' or [(lo,hi),(lo,hi)]."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    stride = (stride, stride) if isinstance(stride, int) else tuple(stride)
    pad = padding if isinstance(padding, str) else [tuple(q) for q in padding]
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,  # see conv1d: AD transpose dtypes
        precision=PRECISION,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def max_pool2d(x: jnp.ndarray, window, stride=None) -> jnp.ndarray:
    """Torch-style max pool over [B, H, W, C]: floor-division output size
    (VALID padding), stride defaults to the window."""
    wh, ww = (window, window) if isinstance(window, int) else tuple(window)
    sh, sw = (wh, ww) if stride is None else (
        (stride, stride) if isinstance(stride, int) else tuple(stride)
    )
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, wh, ww, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )


def selu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.selu(x)


def leaky_relu(x: jnp.ndarray, slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def init_batch_norm(dim: int, dtype=jnp.float32) -> Params:
    """Affine batch-norm params; running stats live in a separate buffers
    pytree (see ``batch_norm``) so the optimizer never touches them."""
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_bn_buffers(dim: int) -> Params:
    return {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)}


def batch_norm(
    p: Params,
    buf: Params,
    x: jnp.ndarray,
    train: bool,
    eps: float = 1e-5,
    momentum: float = 0.1,
):
    """Channel-last batch norm over all leading axes.

    Train mode normalizes with the current batch's statistics and returns
    EMA-updated running stats (torch convention: ``new = (1-m)*old + m*batch``,
    running var uses the unbiased batch variance); eval mode uses the running
    stats.  Returns ``(y, new_buf)`` — callers thread ``new_buf`` through the
    training loop.  fp32 statistics regardless of compute dtype.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x32, axis=axes)
        var = jnp.var(x32, axis=axes)
        n = x32.size // x32.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_buf = {
            "mean": (1 - momentum) * buf["mean"] + momentum * mean,
            "var": (1 - momentum) * buf["var"] + momentum * unbiased,
        }
    else:
        mean, var = buf["mean"], buf["var"]
        new_buf = buf
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype), new_buf


def init_embedding(key, num: int, dim: int, std: Optional[float] = None, dtype=jnp.float32) -> Params:
    """Token embedding table [num, dim], N(0, std) init (std defaults to 1
    like torch nn.Embedding)."""
    std = 1.0 if std is None else std
    return {"w": std * jax.random.normal(key, (num, dim), dtype)}


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


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


def param_table(params) -> str:
    """Per-leaf parameter table: path, count, share, shape — the
    reference's model-parameter inspector capability
    (``core_scripts/other_tools/script_model_para.py:26-43``). Works on
    real arrays and on ``jax.eval_shape`` abstract pytrees alike."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    total = sum(int(v.size) for _, v in leaves)
    lines = [f"Parameter number: {total:d}"]
    for path, v in leaves:
        name = jax.tree_util.keystr(path)
        lines.append(
            f"Layer: {name}\tPara. num: {int(v.size):<10d} "
            f"({100.0 * v.size / max(total, 1):04.1f}%)\tShape: {tuple(v.shape)}"
        )
    return "\n".join(lines)
