"""Per-chip HBM estimation for XLS-R training layouts.

The 1B/2B presets (``models/xlsr.py:130-150``) exist because one v5e chip
(16 GB HBM) cannot train them unsharded; this module turns "is the intended
layout real" into a number.  The analytic sum is a LOWER BOUND — XLA's
buffer assignment adds fusion temps, double-buffered scan stacks and
fragmentation on top — so estimates carry a calibrated ``xla_factor``
(default 1.7): the one hard data point from round-1 hardware runs is the
300M no-remat OOM whose reported demand was 17.1 GB against a 9.9 GB
analytic sum (ratio 1.72), and with the factor applied the fitting
attn_ffn-remat run (<= 15.75 GB usable) stays fitting.  Pinned in
``tests/test_memory_estimate.py``.

What's counted (training step, AdamW):

- master params, fp32, replicated over 'data', attn/ffn matmuls sharded 1/tp
- gradients, fp32, same sharding (live simultaneously with the update)
- AdamW moments, 2x params, divided by the ZeRO-1 shard width
- scan-stacked layer activations saved for the backward:
    full remat      -> layer inputs only           [L, N, T, d]
    attn / attn_ffn -> + the named saves           (+[L,N,T,d] / +[L,N,T,f])
    none            -> every matmul operand/output (~attn 4d + ffn 2f + scores)
- transient working set of one layer's recompute (scores [N,H,T,T] fp32 for
  the einsum path, ffn activation [N,T,f])
- the conv feature-extractor activations (dominated by the first layers at
  waveform length)

Activations are ``compute_dtype`` bytes; softmax/LN statistics fp32.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class HBMEstimate:
    params_gb: float
    grads_gb: float
    opt_gb: float
    saved_acts_gb: float
    transient_gb: float
    conv_acts_gb: float
    xla_factor: float = 1.7  # measured demand / analytic sum on v5e (see
    # module docstring); applied to the activation/transient share AND the
    # param-side share uniformly — coarse, but it reproduces the one OOM
    # data point and keeps every estimate honest-side-up

    @property
    def analytic_gb(self) -> float:
        return (self.params_gb + self.grads_gb + self.opt_gb
                + self.saved_acts_gb + self.transient_gb + self.conv_acts_gb)

    @property
    def total_gb(self) -> float:
        return self.analytic_gb * self.xla_factor

    def __str__(self) -> str:
        return (
            f"~{self.total_gb:.2f} GB/chip demand "
            f"(analytic {self.analytic_gb:.2f} x {self.xla_factor} XLA "
            f"factor; params {self.params_gb:.2f} + grads "
            f"{self.grads_gb:.2f} + opt {self.opt_gb:.2f} + saved acts "
            f"{self.saved_acts_gb:.2f} + transient {self.transient_gb:.2f} "
            f"+ conv {self.conv_acts_gb:.2f})"
        )


def param_count(cfg) -> int:
    """Exact parameter count from the config via jax.eval_shape (no
    allocation)."""
    import jax

    from scl_deepfake_audio_detection_tpu.models import xlsr as X

    shapes = jax.eval_shape(
        lambda k: X.init_xlsr(k, cfg), jax.ShapeDtypeStruct((2,), "uint32")
    )
    return sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(shapes)
    )


def estimate_train_hbm(
    cfg,
    batch: int,
    num_samples: int,
    dp: int = 1,
    tp: int = 1,
    zero1: bool = False,
    head_params: int = 0,
) -> HBMEstimate:
    """Per-chip HBM for one train step of XLS-R + a small head.

    ``batch``: views on THIS chip (G*V after data sharding).  ``dp``/``tp``:
    mesh widths; ZeRO-1 divides the moments by dp.  The tp factor applies to
    the attn/ffn matmul weights (the sharding rules in ``parallel/mesh.py``)
    — LN/conv/pos-conv stay replicated.
    """
    gb = 1 / (1 << 30)
    L, d, f, h = (cfg.encoder_layers, cfg.encoder_dim, cfg.ffn_dim,
                  cfg.num_heads)
    t = cfg.num_frames(num_samples)
    n = batch
    act = 2 if cfg.compute_dtype == "bfloat16" else 4

    total_p = param_count(cfg) + head_params
    # tp shards the per-layer attn (4 d^2) + ffn (2 d f) weights
    sharded_p = L * (4 * d * d + 2 * d * f)
    local_p = total_p - sharded_p + sharded_p // tp

    params_b = 4 * local_p
    grads_b = 4 * local_p
    opt_b = 2 * 4 * local_p // (dp if zero1 else 1)

    # backward saves across the stacked scan
    layer_in = L * n * t * d * act
    if not cfg.remat:
        # every matmul in/out lives to the backward: qkv+o (4d) + scores
        # (h t^2 fp32) + probs + ffn in/out (f + d) + gelu act (f)
        saved = L * n * t * (4 * d + 2 * f + 2 * d) * act + L * n * h * t * t * 4
    elif cfg.remat_policy == "attn_ffn":
        saved = layer_in + L * n * t * (d + f) * act
    elif cfg.remat_policy == "attn":
        saved = layer_in + L * n * t * d * act
    else:  # full
        saved = layer_in

    # one layer's recompute working set (einsum attention path)
    transient = n * h * t * t * 4 + n * t * f * act + 4 * n * t * d * act

    # conv feature extractor: activations at each conv output length
    conv_b = 0
    length = num_samples
    for ch, k, s in cfg.conv_layers:
        length = (length - k) // s + 1
        conv_b += n * length * ch * act
    conv_b *= 2  # fwd saves for bwd

    return HBMEstimate(
        params_gb=params_b * gb,
        grads_gb=grads_b * gb,
        opt_gb=opt_b * gb,
        saved_acts_gb=saved * gb,
        transient_gb=transient * gb,
        conv_acts_gb=conv_b * gb,
    )
