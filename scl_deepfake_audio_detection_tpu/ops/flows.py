"""Normalizing-flow primitives — the VITS leftovers in the reference's BTSE
package, rebuilt TPU-first.

The reference vendors ``model/wav2vec2_btse/modules.py`` (WN gated-conv
stack, DDSConv, ElementwiseAffine/Log/Flip flows, ResidualCouplingLayer,
ConvFlow) and ``model/wav2vec2_btse/transforms.py`` (piecewise
rational-quadratic splines) — VITS remnants unused by its BTSE model but
part of the repo surface (SURVEY §2 "dead code elsewhere"). This module
matches those capabilities.

TPU-first redesign notes:
- layout is [B, T, C] (lax NWC) rather than torch's [B, C, T]; masks are
  [B, T, 1];
- the unconstrained spline is fully vectorized: the torch original routes
  in-interval elements through boolean fancy-indexing
  (``transforms.py:66-95``) — dynamic shapes XLA cannot compile. Here every
  element runs the spline on inputs clamped into the interval and a
  ``jnp.where`` selects identity for the tails; ``searchsorted`` is the
  mask-sum form (``transforms.py:47-52``) which is a single vectorized
  reduce;
- WN's per-layer torch weight-norm is folded into plain kernels (it is a
  reparametrization, not a runtime op; conversion folds g·v/|v|);
- flows follow the reference's calling convention: forward returns
  ``(y, logdet)``, ``reverse=True`` returns the inverse alone
  (``modules.py:266-396``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.ops.layers import (
    conv1d,
    init_conv1d,
    init_layer_norm,
    layer_norm,
)

Params = Dict[str, Any]

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


# ---------------------------------------------------------------------------
# rational-quadratic splines (transforms.py:12-192)
# ---------------------------------------------------------------------------


def _searchsorted(bin_locations: jnp.ndarray, x: jnp.ndarray, eps: float = 1e-6):
    """Per-element bin index: #(x >= boundary) - 1 over the last axis
    (``transforms.py:47-52``), clipped into the valid bin range."""
    locs = bin_locations.at[..., -1].add(eps)
    idx = jnp.sum(x[..., None] >= locs, axis=-1) - 1
    return jnp.clip(idx, 0, bin_locations.shape[-1] - 2)


def _take(v: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take_along_axis(v, idx[..., None], axis=-1)[..., 0]


def rational_quadratic_spline(
    x: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    left: float = 0.0,
    right: float = 1.0,
    bottom: float = 0.0,
    top: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
):
    """Monotonic rational-quadratic spline (Durkan et al.; the math of
    ``transforms.py:96-192``). ``x`` [...], knot parameters [..., K] (the
    derivative tensor [..., K+1]). Returns ``(y, logabsdet)`` elementwise.

    Unlike the torch original this does not raise on out-of-domain inputs —
    callers clamp (the unconstrained wrapper handles tails); inputs are
    assumed inside [left, right] (forward) / [bottom, top] (inverse).
    """
    num_bins = unnormalized_widths.shape[-1]
    if min_bin_width * num_bins > 1.0:
        raise ValueError("minimal bin width too large for the number of bins")
    if min_bin_height * num_bins > 1.0:
        raise ValueError("minimal bin height too large for the number of bins")

    widths = jax.nn.softmax(unnormalized_widths, axis=-1)
    widths = min_bin_width + (1 - min_bin_width * num_bins) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, [(0, 0)] * (cumwidths.ndim - 1) + [(1, 0)])
    cumwidths = (right - left) * cumwidths + left
    cumwidths = cumwidths.at[..., 0].set(left).at[..., -1].set(right)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    heights = jax.nn.softmax(unnormalized_heights, axis=-1)
    heights = min_bin_height + (1 - min_bin_height * num_bins) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, [(0, 0)] * (cumheights.ndim - 1) + [(1, 0)])
    cumheights = (top - bottom) * cumheights + bottom
    cumheights = cumheights.at[..., 0].set(bottom).at[..., -1].set(top)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    bin_idx = _searchsorted(cumheights if inverse else cumwidths, x)

    in_cumwidths = _take(cumwidths, bin_idx)
    in_bin_widths = _take(widths, bin_idx)
    in_cumheights = _take(cumheights, bin_idx)
    delta = heights / widths
    in_delta = _take(delta, bin_idx)
    in_deriv = _take(derivatives, bin_idx)
    in_deriv_p1 = _take(derivatives[..., 1:], bin_idx)
    in_heights = _take(heights, bin_idx)

    if inverse:
        a = (x - in_cumheights) * (in_deriv + in_deriv_p1 - 2 * in_delta) + (
            in_heights * (in_delta - in_deriv)
        )
        b = in_heights * in_deriv - (x - in_cumheights) * (
            in_deriv + in_deriv_p1 - 2 * in_delta
        )
        c = -in_delta * (x - in_cumheights)
        discriminant = jnp.maximum(b**2 - 4 * a * c, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        y = root * in_bin_widths + in_cumwidths
        theta_1mt = root * (1 - root)
        denominator = in_delta + (in_deriv + in_deriv_p1 - 2 * in_delta) * theta_1mt
        deriv_numerator = in_delta**2 * (
            in_deriv_p1 * root**2 + 2 * in_delta * theta_1mt + in_deriv * (1 - root) ** 2
        )
        logabsdet = jnp.log(deriv_numerator) - 2 * jnp.log(denominator)
        return y, -logabsdet
    theta = (x - in_cumwidths) / in_bin_widths
    theta_1mt = theta * (1 - theta)
    numerator = in_heights * (in_delta * theta**2 + in_deriv * theta_1mt)
    denominator = in_delta + (in_deriv + in_deriv_p1 - 2 * in_delta) * theta_1mt
    y = in_cumheights + numerator / denominator
    deriv_numerator = in_delta**2 * (
        in_deriv_p1 * theta**2 + 2 * in_delta * theta_1mt + in_deriv * (1 - theta) ** 2
    )
    logabsdet = jnp.log(deriv_numerator) - 2 * jnp.log(denominator)
    return y, logabsdet


def piecewise_rational_quadratic_transform(
    x: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tails: Optional[str] = "linear",
    tail_bound: float = 1.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
):
    """Spline with linear tails outside [-tail_bound, tail_bound]
    (``transforms.py:12-93``): out-of-interval elements map to identity with
    zero logdet. Vectorized tail handling: clamp-in, spline, select."""
    if tails is None:
        return rational_quadratic_spline(
            x, unnormalized_widths, unnormalized_heights, unnormalized_derivatives,
            inverse=inverse, min_bin_width=min_bin_width,
            min_bin_height=min_bin_height, min_derivative=min_derivative,
        )
    if tails != "linear":
        raise NotImplementedError(f"{tails} tails are not implemented")
    inside = (x >= -tail_bound) & (x <= tail_bound)
    # boundary derivative = 1 after softplus: softplus(c) + min_d == 1
    constant = math.log(math.exp(1 - min_derivative) - 1)
    pads = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    ud = jnp.pad(unnormalized_derivatives, pads, constant_values=constant)
    x_in = jnp.clip(x, -tail_bound, tail_bound)
    y_spline, ld_spline = rational_quadratic_spline(
        x_in, unnormalized_widths, unnormalized_heights, ud,
        inverse=inverse,
        left=-tail_bound, right=tail_bound, bottom=-tail_bound, top=tail_bound,
        min_bin_width=min_bin_width, min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    y = jnp.where(inside, y_spline, x)
    logabsdet = jnp.where(inside, ld_spline, 0.0)
    return y, logabsdet


# ---------------------------------------------------------------------------
# simple flows (modules.py:266-303)
# ---------------------------------------------------------------------------


def log_flow(x: jnp.ndarray, mask: jnp.ndarray, reverse: bool = False):
    """y = log(max(x, 1e-5)); logdet = sum(-y) (``modules.py:266-274``)."""
    if reverse:
        return jnp.exp(x) * mask
    y = jnp.log(jnp.maximum(x, 1e-5)) * mask
    return y, jnp.sum(-y, axis=(1, 2))


def flip_flow(x: jnp.ndarray, reverse: bool = False):
    """Channel-axis flip (``modules.py:277-284``; torch flips dim 1 = C,
    which is the last axis in this layout)."""
    y = jnp.flip(x, axis=-1)
    if reverse:
        return y
    return y, jnp.zeros(x.shape[0], x.dtype)


def init_elementwise_affine(channels: int) -> Params:
    return {"m": jnp.zeros(channels), "logs": jnp.zeros(channels)}


def elementwise_affine(p: Params, x: jnp.ndarray, mask: jnp.ndarray,
                       reverse: bool = False):
    """y = (m + exp(logs) * x) * mask (``modules.py:287-302``)."""
    if reverse:
        return (x - p["m"]) * jnp.exp(-p["logs"]) * mask
    y = (p["m"] + jnp.exp(p["logs"]) * x) * mask
    logdet = jnp.sum(p["logs"] * mask, axis=(1, 2))
    return y, logdet


# ---------------------------------------------------------------------------
# WN gated-conv stack (modules.py:118-191)
# ---------------------------------------------------------------------------


def init_wn(
    key,
    hidden: int,
    kernel: int,
    n_layers: int,
    gin: int = 0,
) -> Params:
    """WaveNet-style stack: per layer a dilated conv to 2*hidden (gate),
    then a 1x1 res+skip conv (2*hidden except the last layer: hidden).

    Dilation does not change weight shapes, so it is an APPLY-time knob
    (``wn(..., dilation_rate=)``) and deliberately not an init argument —
    a stored-but-ignored copy would invite silent mismatches."""
    if kernel % 2 != 1:
        raise ValueError("WN kernel must be odd")
    ks = jax.random.split(key, 2 * n_layers + 1)
    p: Params = {"in_layers": [], "res_skip_layers": []}
    for i in range(n_layers):
        p["in_layers"].append(init_conv1d(ks[2 * i], hidden, 2 * hidden, kernel))
        out = 2 * hidden if i < n_layers - 1 else hidden
        p["res_skip_layers"].append(init_conv1d(ks[2 * i + 1], hidden, out, 1))
    if gin:
        p["cond"] = init_conv1d(ks[-1], gin, 2 * hidden * n_layers, 1)
    return p


def _gated(x_in: jnp.ndarray, g_l: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """fused tanh-sigmoid gate (``commons.fused_add_tanh_sigmoid_multiply``)."""
    acts = x_in + g_l
    return jnp.tanh(acts[..., :hidden]) * jax.nn.sigmoid(acts[..., hidden:])


def wn(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    g: Optional[jnp.ndarray] = None,
    dilation_rate: int = 1,
    kernel: Optional[int] = None,
) -> jnp.ndarray:
    """x [B, T, H] -> skip-sum [B, T, H] (``WN.forward``,
    ``modules.py:156-186``)."""
    hidden = x.shape[-1]
    n_layers = len(p["in_layers"])
    if g is not None and "cond" not in p:
        # the torch WN has no cond_layer unless gin_channels was set and
        # crashes on g; silently dropping the conditioning would train an
        # unconditional flow that merely looks conditional
        raise ValueError("wn() got conditioning g but params were "
                         "initialized with gin=0 (no cond layer)")
    cond = conv1d(p["cond"], g) if g is not None else None
    output = jnp.zeros_like(x)
    for i in range(n_layers):
        k = kernel if kernel is not None else p["in_layers"][i]["w"].shape[0]
        dilation = dilation_rate**i
        pad = (k * dilation - dilation) // 2
        x_in = conv1d(p["in_layers"][i], x, padding=[(pad, pad)], dilation=dilation)
        if cond is not None:
            g_l = cond[..., i * 2 * hidden : (i + 1) * 2 * hidden]
        else:
            g_l = jnp.zeros_like(x_in)
        acts = _gated(x_in, g_l, hidden)
        res_skip = conv1d(p["res_skip_layers"][i], acts)
        if i < n_layers - 1:
            x = (x + res_skip[..., :hidden]) * mask
            output = output + res_skip[..., hidden:]
        else:
            output = output + res_skip
    return output * mask


# ---------------------------------------------------------------------------
# DDSConv (modules.py:77-115)
# ---------------------------------------------------------------------------


def init_dds_conv(key, channels: int, kernel: int, n_layers: int) -> Params:
    ks = jax.random.split(key, 2 * n_layers)
    p: Params = {"sep": [], "pw": [], "ln1": [], "ln2": []}
    for i in range(n_layers):
        p["sep"].append(
            init_conv1d(ks[2 * i], channels, channels, kernel, groups=channels)
        )
        p["pw"].append(init_conv1d(ks[2 * i + 1], channels, channels, 1))
        p["ln1"].append(init_layer_norm(channels))
        p["ln2"].append(init_layer_norm(channels))
    return p


def dds_conv(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    g: Optional[jnp.ndarray] = None,
    kernel: Optional[int] = None,
) -> jnp.ndarray:
    """Dilated depthwise-separable residual stack: dilation = kernel**i
    (``DDSConv.forward``, ``modules.py:104-115``)."""
    if g is not None:
        x = x + g
    channels = x.shape[-1]
    for i in range(len(p["sep"])):
        k = kernel if kernel is not None else p["sep"][i]["w"].shape[0]
        dilation = k**i
        pad = (k * dilation - dilation) // 2
        y = conv1d(
            p["sep"][i], x * mask, padding=[(pad, pad)], groups=channels,
            dilation=dilation,
        )
        y = jax.nn.gelu(layer_norm(p["ln1"][i], y))
        y = conv1d(p["pw"][i], y)
        y = jax.nn.gelu(layer_norm(p["ln2"][i], y))
        x = x + y
    return x * mask


# ---------------------------------------------------------------------------
# ConvReluNorm + HiFiGAN ResBlocks (modules.py:42-74, 194-263)
# ---------------------------------------------------------------------------

LRELU_SLOPE = 0.1  # modules.py LRELU_SLOPE


def init_conv_relu_norm(
    key, in_ch: int, hidden: int, out_ch: int, kernel: int, n_layers: int
) -> Params:
    if n_layers <= 1:
        raise ValueError("n_layers should be larger than 1")
    ks = jax.random.split(key, n_layers + 1)
    convs = [init_conv1d(ks[0], in_ch, hidden, kernel)]
    convs += [init_conv1d(ks[i], hidden, hidden, kernel) for i in range(1, n_layers)]
    return {
        "convs": convs,
        "norms": [init_layer_norm(hidden) for _ in range(n_layers)],
        "proj": _zero_conv(init_conv1d(ks[-1], hidden, out_ch, 1)),
    }


def conv_relu_norm(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    dropout_rate: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """Residual conv->LN->ReLU stack with a zero-init projection
    (``ConvReluNorm``, ``modules.py:42-74``); identity at init."""
    x_org = x
    for i, (conv, norm) in enumerate(zip(p["convs"], p["norms"])):
        k = conv["w"].shape[0]
        x = conv1d(conv, x * mask, padding=[(k // 2, k // 2)])
        x = jax.nn.relu(layer_norm(norm, x))
        if dropout_rate > 0.0 and rng is not None:
            # independent mask per depth (reference uses a fresh nn.Dropout
            # draw each layer; reusing one key would correlate all layers)
            layer_rng = jax.random.fold_in(rng, i)
            keep = jax.random.bernoulli(layer_rng, 1.0 - dropout_rate, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    return (x_org + conv1d(p["proj"], x)) * mask


def init_res_block1(key, channels: int, kernel: int = 3,
                    dilation: Sequence[int] = (1, 3, 5)) -> Params:
    ks = jax.random.split(key, 2 * len(dilation))
    return {
        "convs1": [init_conv1d(ks[2 * i], channels, channels, kernel)
                   for i in range(len(dilation))],
        "convs2": [init_conv1d(ks[2 * i + 1], channels, channels, kernel)
                   for i in range(len(dilation))],
    }


def res_block1(p: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
               dilation: Sequence[int] = (1, 3, 5)) -> jnp.ndarray:
    """HiFiGAN ResBlock1 (``modules.py:194-231``): per stage, leaky-relu ->
    dilated conv -> leaky-relu -> undilated conv, residual add."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilation):
        k = c1["w"].shape[0]
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        if mask is not None:
            xt = xt * mask
        pad = (k * d - d) // 2
        xt = conv1d(c1, xt, padding=[(pad, pad)], dilation=d)
        xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
        if mask is not None:
            xt = xt * mask
        xt = conv1d(c2, xt, padding=[(k // 2, k // 2)])
        x = xt + x
    return x * mask if mask is not None else x


def init_res_block2(key, channels: int, kernel: int = 3,
                    dilation: Sequence[int] = (1, 3)) -> Params:
    ks = jax.random.split(key, len(dilation))
    return {
        "convs": [init_conv1d(ks[i], channels, channels, kernel)
                  for i in range(len(dilation))],
    }


def res_block2(p: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
               dilation: Sequence[int] = (1, 3)) -> jnp.ndarray:
    """HiFiGAN ResBlock2 (``modules.py:239-263``)."""
    for c, d in zip(p["convs"], dilation):
        k = c["w"].shape[0]
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        if mask is not None:
            xt = xt * mask
        pad = (k * d - d) // 2
        xt = conv1d(c, xt, padding=[(pad, pad)], dilation=d)
        x = xt + x
    return x * mask if mask is not None else x


# ---------------------------------------------------------------------------
# coupling flows (modules.py:305-396)
# ---------------------------------------------------------------------------


def _zero_conv(p: Params) -> Params:
    """Zero-init a conv param dict — coupling layers start as identity
    (``modules.py:328-329,366-367``)."""
    out = {"w": jnp.zeros_like(p["w"])}
    if "b" in p:
        out["b"] = jnp.zeros_like(p["b"])
    return out


def init_residual_coupling(
    key,
    channels: int,
    hidden: int,
    kernel: int,
    n_layers: int,
    gin: int = 0,
    mean_only: bool = False,
) -> Params:
    """Dilation is an apply-time knob (see ``init_wn``)."""
    if channels % 2 != 0:
        raise ValueError("channels should be divisible by 2")
    half = channels // 2
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "pre": init_conv1d(k1, half, hidden, 1),
        "enc": init_wn(k2, hidden, kernel, n_layers, gin=gin),
        "post": _zero_conv(init_conv1d(k3, hidden, half * (2 - int(mean_only)), 1)),
    }


def residual_coupling(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    g: Optional[jnp.ndarray] = None,
    dilation_rate: int = 1,
    mean_only: bool = False,
    reverse: bool = False,
):
    """Affine coupling with a WN conditioner (``ResidualCouplingLayer``,
    ``modules.py:305-350``). x [B, T, C]; first half conditions the second."""
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]
    h = conv1d(p["pre"], x0) * mask
    h = wn(p["enc"], h, mask, g=g, dilation_rate=dilation_rate)
    stats = conv1d(p["post"], h) * mask
    if mean_only:
        m, logs = stats, jnp.zeros_like(stats)
    else:
        m, logs = stats[..., :half], stats[..., half:]
    if reverse:
        x1 = (x1 - m) * jnp.exp(-logs) * mask
        return jnp.concatenate([x0, x1], axis=-1)
    x1 = m + x1 * jnp.exp(logs) * mask
    y = jnp.concatenate([x0, x1], axis=-1)
    return y, jnp.sum(logs, axis=(1, 2))


def init_conv_flow(
    key,
    in_channels: int,
    filter_channels: int,
    kernel: int,
    n_layers: int,
    num_bins: int = 10,
) -> Params:
    half = in_channels // 2
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "pre": init_conv1d(k1, half, filter_channels, 1),
        "convs": init_dds_conv(k2, filter_channels, kernel, n_layers),
        "proj": _zero_conv(
            init_conv1d(k3, filter_channels, half * (num_bins * 3 - 1), 1)
        ),
    }


def conv_flow(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    g: Optional[jnp.ndarray] = None,
    num_bins: int = 10,
    tail_bound: float = 5.0,
    reverse: bool = False,
):
    """Spline coupling (``ConvFlow``, ``modules.py:353-396``): a DDSConv
    conditioner predicts per-element spline knots for the second half."""
    half = x.shape[-1] // 2
    filter_channels = p["pre"]["w"].shape[-1]
    x0, x1 = x[..., :half], x[..., half:]
    h = conv1d(p["pre"], x0)
    h = dds_conv(p["convs"], h, mask, g=g)
    h = conv1d(p["proj"], h) * mask  # [B, T, half*(3K-1)]
    b, t = x0.shape[:2]
    h = h.reshape(b, t, half, num_bins * 3 - 1)
    scale = math.sqrt(filter_channels)
    uw = h[..., :num_bins] / scale
    uh = h[..., num_bins : 2 * num_bins] / scale
    ud = h[..., 2 * num_bins :]
    x1_new, logabsdet = piecewise_rational_quadratic_transform(
        x1, uw, uh, ud, inverse=reverse, tails="linear", tail_bound=tail_bound
    )
    y = jnp.concatenate([x0, x1_new], axis=-1) * mask
    if reverse:
        return y
    return y, jnp.sum(logabsdet * mask, axis=(1, 2))
