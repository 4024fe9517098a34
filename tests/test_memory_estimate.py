"""HBM estimator calibration + the 1B-preset training layout proof.

VERDICT round-1 item 6: nothing demonstrated a 1B-shaped model actually
training under tp x ZeRO-1 + remat, and the presets' "is the intended
layout" claim had no numbers.  Here: (a) the estimator reproduces the
round-1 measured OOM point, (b) the recommended 1B/2B layouts fit v5e HBM
by the calibrated estimate, (c) a 48-layer 1B-STRUCTURE model (scaled dims,
same depth/topology) runs a real train step under dp=4 x tp=2 + ZeRO-1 +
attn_ffn remat on the virtual 8-device mesh."""

import numpy as np

import jax

from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
from scl_deepfake_audio_detection_tpu.parallel.memory import (
    estimate_train_hbm,
    param_count,
)

V5E_HBM_GB = 16.0
V5E_USABLE_GB = 15.75  # round-1 OOM message's reported capacity


def test_param_counts_match_reference_scale():
    # the reference prints ~315M for XLSR-300M + head (main.py:334-336)
    assert abs(param_count(XLSRConfig.xlsr_300m()) / 1e6 - 315.4) < 1.0
    assert abs(param_count(XLSRConfig.xlsr_1b()) / 1e6 - 962) < 10
    assert abs(param_count(XLSRConfig.xlsr_2b()) / 1e6 - 2159) < 20


def test_estimator_reproduces_measured_300m_points():
    """Round-1 hardware measurements (ROADMAP perf log): no-remat at
    2x11x64000 OOMs demanding 17.1 GB; attn_ffn remat fits 15.75 GB."""
    no_remat = XLSRConfig.xlsr_300m(compute_dtype="bfloat16", remat=False)
    e = estimate_train_hbm(no_remat, batch=22, num_samples=64000)
    assert 15.0 < e.total_gb < 20.0, str(e)  # measured 17.1

    fits = XLSRConfig.xlsr_300m(
        compute_dtype="bfloat16", remat=True, remat_policy="attn_ffn"
    )
    e2 = estimate_train_hbm(fits, batch=22, num_samples=64000)
    assert e2.total_gb < V5E_USABLE_GB, str(e2)


def test_1b_and_2b_recommended_layouts_fit():
    """The presets' docstring claim, with numbers: unsharded 1B does NOT fit
    one v5e chip; dp x tp + ZeRO-1 + attn_ffn remat does, for 1B and 2B."""
    c1b = XLSRConfig.xlsr_1b(
        compute_dtype="bfloat16", remat=True, remat_policy="attn_ffn"
    )
    alone = estimate_train_hbm(c1b, batch=11, num_samples=64000)
    assert alone.total_gb > V5E_HBM_GB, str(alone)  # needs sharding

    for dp, tp in [(4, 2), (2, 4)]:
        e = estimate_train_hbm(
            c1b, batch=11, num_samples=64000, dp=dp, tp=tp, zero1=True
        )
        assert e.total_gb < V5E_USABLE_GB, f"1b dp={dp} tp={tp}: {e}"

    c2b = XLSRConfig.xlsr_2b(
        compute_dtype="bfloat16", remat=True, remat_policy="attn_ffn"
    )
    e2b = estimate_train_hbm(
        c2b, batch=11, num_samples=64000, dp=2, tp=4, zero1=True
    )
    assert e2b.total_gb < V5E_USABLE_GB, f"2b dp=2 tp=4: {e2b}"


def test_1b_structure_trains_under_tp_zero1_remat():
    """A 48-layer 1B-structure model (scaled dims, same depth/layer topology/
    remat policy) runs one real train step under dp=4 x tp=2 + ZeRO-1 on the
    8-device mesh — the layout the full-size estimate above certifies."""
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.parallel import make_mesh
    from scl_deepfake_audio_detection_tpu.train.engine import Engine
    from scl_deepfake_audio_detection_tpu.train.optim import set_learning_rate
    from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig

    ssl = XLSRConfig.xlsr_1b(
        # scale dims, keep structure: 48 layers, ffn = 4d, attn_ffn remat
        encoder_dim=64, ffn_dim=256, num_heads=8,
        conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
        pos_conv_kernel=16, pos_conv_groups=4,
        remat=True, remat_policy="attn_ffn",
    )
    assert ssl.encoder_layers == 48  # the preset's depth is the point
    model = LinearNLL(ssl=ssl, emb_dim=16)
    mesh = make_mesh((4, 2), devices=jax.devices()[:8])
    engine = Engine(
        model,
        TrainConfig(max_lr=1e-4, zero1=True, zero1_min_size=256),
        mesh=mesh,
    )
    params, buffers, opt_state = engine.init_state(jax.random.key(0))
    opt_state = set_learning_rate(opt_state, 1e-4)
    rng = np.random.default_rng(0)
    batch = {
        "wav": rng.normal(size=(4, 4, 3200)).astype(np.float32),
        "labels": np.tile(np.array([1, 1, 0, 0], np.float32), (4, 1)),
    }
    params, buffers, opt_state, metrics = engine.train_step(
        params, buffers, opt_state, engine.place_batch(batch), jax.random.key(1)
    )
    jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics["loss"])), metrics
