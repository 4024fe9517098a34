"""utils/flops.py — analytic matmul-FLOP counts behind bench.py's MFU.

Falsifiability: the big cross-check compiles a real (small but matmul-
dominated) LinearNLL forward and compares the analytic count against XLA's
own cost analysis — a wrong term in any of the per-component formulas lands
outside the band.
"""

import jax
import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
from scl_deepfake_audio_detection_tpu.utils import flops as F


def test_conv_encoder_flops_hand_example():
    # one conv layer: 100 samples, k=10, s=5 -> t_out = 19; 2*19*8*1*10
    cfg = XLSRConfig.tiny()
    cfg = cfg.__class__(**{**cfg.__dict__, "conv_layers": ((8, 10, 5),)})
    assert F.conv_encoder_flops(cfg, 100) == 2 * 19 * 8 * 1 * 10


def test_encoder_flops_single_layer_formula():
    cfg = XLSRConfig.tiny()
    t, d, f = 7, cfg.encoder_dim, cfg.ffn_dim
    per_layer = 8 * t * d * d + 4 * t * t * d + 4 * t * d * f
    pos = 2 * t * d * (d // cfg.pos_conv_groups) * cfg.pos_conv_kernel
    proj = 2 * t * cfg.conv_layers[-1][0] * d
    assert F.encoder_flops(cfg, t) == cfg.encoder_layers * per_layer + pos + proj


def test_train_is_three_forwards():
    cfg = XLSRConfig.tiny()
    assert F.train_step_flops(cfg, 3200, 4) == 3 * F.forward_flops(cfg, 3200, 4)


def test_mfu_arithmetic():
    # explicit peak: 128e12 FLOPs in 1 s on a 256e12 peak = 50 %
    assert F.mfu(128e12, 1.0, peak=256e12) == pytest.approx(0.5)
    # default denominator is the PUBLISHED v5e bf16 peak (197 TFLOP/s)
    assert F.mfu(F.PUBLISHED_V5E_BF16_PEAK_FLOPS / 2, 1.0) == pytest.approx(0.5)


def test_forward_flops_match_xla_cost_analysis():
    """Analytic count vs XLA's compiled cost analysis on a matmul-dominated
    shape: analytic counts GEMMs only, so it must be <= XLA's total and
    within 25 % of it (elementwise/softmax are the small remainder).

    encoder_layers=1 because XLA's cost analysis counts a lax.scan body
    ONCE regardless of trip count (probed on this backend: a 3-layer scan
    reports ~1 layer of FLOPs) — with one layer the scan trip count is 1
    and every formula term is still exercised."""
    cfg = XLSRConfig(
        conv_layers=((128, 10, 5), (128, 3, 2), (128, 2, 2)),
        encoder_dim=256,
        encoder_layers=1,
        ffn_dim=1024,
        num_heads=4,
        pos_conv_kernel=16,
        pos_conv_groups=4,
    )
    model = LinearNLL(ssl=cfg)
    params = model.init(jax.random.key(0))
    wav = np.zeros((2, 8000), np.float32)

    def fwd(p, w):
        return model.apply(p, w).logits

    cost = jax.jit(fwd).lower(params, wav).compile().cost_analysis()
    xla_flops = float(cost["flops"])
    analytic = F.forward_flops(cfg, 8000, batch=2)
    assert analytic <= xla_flops * 1.02  # tiny slack: XLA may fold a GEMM
    assert analytic >= 0.75 * xla_flops
