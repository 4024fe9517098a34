"""XLS-R encoder numerics: parity vs. HuggingFace Wav2Vec2 (torch CPU).

The reference's SSL frontend is fairseq's wav2vec2 XLSR-300M
(``model/xlsr.py:14-21``). fairseq is not installable here, but HF's
``Wav2Vec2Model`` with ``do_stable_layer_norm=True, feat_extract_norm='layer'``
is the same architecture, so converting a tiny random HF model through
``models/convert.from_hf_state_dict`` and comparing outputs validates every
op in our graph (conv encoder, LNs, pos-conv weight-norm contraction,
pre-norm attention/FFN stack).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.models import xlsr as X
from scl_deepfake_audio_detection_tpu.models.convert import (
    config_from_hf,
    from_hf_state_dict,
)


def _tiny_hf_model(seed=0):
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(seed)
    hf_cfg = Wav2Vec2Config(
        vocab_size=16,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16, 16),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        conv_bias=True,
        hidden_act="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    model = Wav2Vec2Model(hf_cfg).eval()
    return model, hf_cfg


@pytest.fixture(scope="module")
def tiny_pair():
    model, hf_cfg = _tiny_hf_model()
    cfg = config_from_hf(hf_cfg)
    params = from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_config_from_hf(tiny_pair):
    _, cfg, _ = tiny_pair
    assert cfg.conv_layers == ((16, 10, 5), (16, 3, 2), (16, 3, 2))
    assert cfg.encoder_dim == 32 and cfg.encoder_layers == 2 and cfg.num_heads == 4


def test_frame_count_matches_reference_shapes():
    cfg = X.XLSRConfig.xlsr_300m()
    # reference model/xlsr.py:41 -> [B, 201, 1024] for 64600 samples
    assert cfg.num_frames(64600) == 201
    assert cfg.num_frames(64000) == 199


def test_forward_matches_hf(tiny_pair):
    import torch

    model, cfg, params = tiny_pair
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 3200)).astype(np.float32) * 0.1

    with torch.no_grad():
        ref = model(torch.from_numpy(wav)).last_hidden_state.numpy()

    out = X.extract_features(params, cfg, jnp.asarray(wav))
    out = np.asarray(out)

    assert out.shape == ref.shape
    err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 2e-4, f"relative max err {err}"


def test_feature_encoder_matches_hf(tiny_pair):
    import torch

    model, cfg, params = tiny_pair
    rng = np.random.default_rng(1)
    wav = rng.normal(size=(1, 1600)).astype(np.float32)

    with torch.no_grad():
        ref = model.feature_extractor(torch.from_numpy(wav)).transpose(1, 2).numpy()

    out = np.asarray(X.feature_encoder(params, cfg, jnp.asarray(wav)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_scan_equals_unrolled(tiny_pair):
    """lax.scan over stacked layers == sequential layer application."""
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 7, cfg.encoder_dim)).astype(np.float32))

    out_scan = X.transformer_encoder(params, cfg, x)

    stacked = params["encoder"]["layers"]
    y = x + X._pos_conv_embed(params, cfg, x)
    for i in range(cfg.encoder_layers):
        layer = jax.tree.map(lambda p: p[i], stacked)
        y = X._encoder_layer(layer, cfg, y, None, None, True)
    from scl_deepfake_audio_detection_tpu.ops.layers import layer_norm

    out_seq = layer_norm(params["encoder"]["final_ln"], y, cfg.layer_norm_eps)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_seq), rtol=1e-5, atol=1e-6)


def test_remat_matches_no_remat(tiny_pair):
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.normal(size=(1, 1600)).astype(np.float32))
    a = X.extract_features(params, cfg, wav)
    b = X.extract_features(params, cfg.with_(remat=True), wav)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_grad_flows_and_is_finite(tiny_pair):
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(4)
    wav = jnp.asarray(rng.normal(size=(1, 1600)).astype(np.float32))

    def loss_fn(p):
        return jnp.sum(X.extract_features(p, cfg.with_(remat=True), wav) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_tiny_init_shapes():
    cfg = X.XLSRConfig.tiny()
    params = X.init_xlsr(jax.random.key(0), cfg)
    wav = jnp.zeros((2, 3200))
    out = X.extract_features(params, cfg, wav)
    assert out.shape == (2, cfg.num_frames(3200), cfg.encoder_dim)


def test_bf16_compute_close_to_fp32(tiny_pair):
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.normal(size=(1, 3200)).astype(np.float32))
    a = np.asarray(X.extract_features(params, cfg, wav))
    b = np.asarray(
        X.extract_features(params, cfg.with_(compute_dtype="bfloat16"), wav)
    ).astype(np.float32)
    # bf16 matmuls with fp32 LN/softmax should track fp32 to ~1e-2 relative
    rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
    assert rel < 5e-2, rel


def test_conv_impl_gemm_matches_conv(rng):
    """The patch+GEMM feature encoder equals the lax.conv lowering for every
    kernel/stride combination the XLS-R stack uses (10/5, 3/2, 2/2)."""
    import jax.numpy as jnp

    from scl_deepfake_audio_detection_tpu.models import xlsr as X

    cfg_g = X.XLSRConfig.tiny(conv_impl="gemm")
    cfg_c = cfg_g.with_(conv_impl="conv")
    params = X.init_xlsr(jax.random.key(0), cfg_g)
    wav = jnp.asarray(rng.normal(size=(2, 3201)).astype(np.float32))
    a = np.asarray(X.feature_encoder(params, cfg_g, wav))
    b = np.asarray(X.feature_encoder(params, cfg_c, wav))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_conv_impl_phase_matches_conv(rng):
    """The stride-phase GEMM decomposition equals the lax.conv lowering,
    including a k > s overlap case (10/5) with cin > 1."""
    cfg_p = X.XLSRConfig.tiny(
        conv_layers=((6, 10, 5), (8, 5, 3), (8, 3, 2), (8, 2, 2)),
        conv_impl="phase",
    )
    cfg_c = cfg_p.with_(conv_impl="conv")
    params = X.init_xlsr(jax.random.key(0), cfg_p)
    wav = jnp.asarray(rng.normal(size=(2, 3201)).astype(np.float32))
    a = np.asarray(X.feature_encoder(params, cfg_p, wav))
    b = np.asarray(X.feature_encoder(params, cfg_c, wav))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_gelu_impl_dispatch_and_drift(tiny_pair):
    """'auto' keeps exact erf GELU under fp32 (reference parity) and selects
    the tanh form under bf16, where the approximation error (<= 3e-4) is
    below bf16 rounding; an explicit override wins either way."""
    _, cfg, params = tiny_pair
    assert not cfg.approx_gelu  # fp32 auto -> exact
    assert cfg.with_(compute_dtype="bfloat16").approx_gelu
    assert cfg.with_(gelu_impl="tanh").approx_gelu
    assert not cfg.with_(compute_dtype="bfloat16", gelu_impl="exact").approx_gelu

    rng = np.random.default_rng(6)
    wav = jnp.asarray(rng.normal(size=(1, 3200)).astype(np.float32))
    exact = np.asarray(X.extract_features(params, cfg, wav))
    tanh = np.asarray(X.extract_features(params, cfg.with_(gelu_impl="tanh"), wav))
    rel = np.max(np.abs(exact - tanh)) / (np.max(np.abs(exact)) + 1e-9)
    assert 0 < rel < 5e-3, rel  # differs, but far inside bf16 noise

    bf_exact = np.asarray(
        X.extract_features(
            params, cfg.with_(compute_dtype="bfloat16", gelu_impl="exact"), wav
        )
    ).astype(np.float32)
    bf_auto = np.asarray(
        X.extract_features(params, cfg.with_(compute_dtype="bfloat16"), wav)
    ).astype(np.float32)
    # under bf16 the two forms are within the bf16-vs-fp32 drift band
    rel_bf = np.max(np.abs(bf_exact - bf_auto)) / (np.max(np.abs(bf_exact)) + 1e-9)
    assert rel_bf < 5e-2, rel_bf


def test_remat_policy_dots_matches(tiny_pair):
    """'dots' checkpoint policy must not change forward values or break
    gradients (it only changes what the backward saves vs recomputes)."""
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(7)
    wav = jnp.asarray(rng.normal(size=(1, 1600)).astype(np.float32))
    cfg_d = cfg.with_(remat=True, remat_policy="dots")
    a = X.extract_features(params, cfg, wav)
    b = X.extract_features(params, cfg_d, wav)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    g = jax.grad(lambda p: jnp.sum(X.extract_features(p, cfg_d, wav) ** 2))(params)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


def test_xlsr_family_presets():
    """XLS-R 1B/2B presets (facebook/wav2vec2-xls-r-{1b,2b} dims): same conv
    stack, scaled encoder; head_dim stays integral and frame math is
    unchanged (stride-320 conv stack)."""
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig

    for cfg, d, l, f in (
        (XLSRConfig.xlsr_300m(), 1024, 24, 4096),
        (XLSRConfig.xlsr_1b(), 1280, 48, 5120),
        (XLSRConfig.xlsr_2b(), 1920, 48, 7680),
        (XLSRConfig.student_base(), 768, 12, 3072),
    ):
        assert (cfg.encoder_dim, cfg.encoder_layers, cfg.ffn_dim) == (d, l, f)
        assert cfg.encoder_dim % cfg.num_heads == 0
        assert cfg.num_frames(64600) == 201  # conv stack unchanged
    # params instantiate at a scaled-down 1b-shape (smoke: init only)
    tiny_1b = XLSRConfig.xlsr_1b(
        encoder_dim=64, encoder_layers=4, ffn_dim=128, num_heads=8,
        conv_layers=((16, 10, 5), (16, 3, 2)), pos_conv_kernel=16,
        pos_conv_groups=4,
    )
    from scl_deepfake_audio_detection_tpu.models.xlsr import init_xlsr
    import jax

    params = init_xlsr(jax.random.key(0), tiny_1b)
    assert params["encoder"]["layers"]["fc1"]["w"].shape == (4, 64, 128)

    # every CLI --ssl_preset choice resolves to a working classmethod and
    # instantiates shapes (eval_shape: no device memory for the 1B/2B)
    from scl_deepfake_audio_detection_tpu.cli import build_parser

    choices = next(
        a.choices for a in build_parser()._actions if a.dest == "ssl_preset"
    )
    for name in choices:
        cfg = getattr(XLSRConfig, name)()
        shapes = jax.eval_shape(
            lambda k, c=cfg: init_xlsr(k, c), jax.random.key(0)
        )
        n_layers = shapes["encoder"]["layers"]["fc1"]["w"].shape[0]
        assert n_layers == cfg.encoder_layers


def test_bf16_grad_stacks_identical_under_bf16_compute(rng):
    """grad_stack_dtype='bfloat16' must be numerically IDENTICAL to the
    default under bf16 compute: the per-call weight cast inside ``linear``
    already rounds dW through bf16, so the flag only moves the fp32
    upconvert outside the scan (and halves the stack-write bytes)."""
    import jax
    import jax.numpy as jnp

    # force fp32 stacks on one side (None = auto = bf16 under bf16 compute)
    cfg = X.XLSRConfig.tiny(compute_dtype="bfloat16", remat=True,
                            grad_stack_dtype="float32")
    cfg16 = cfg.with_(grad_stack_dtype="bfloat16")
    p = X.init_xlsr(jax.random.key(0), cfg)
    wav = jnp.asarray(rng.normal(size=(2, 3200)).astype(np.float32) * 0.1)

    def loss(p, c):
        return jnp.sum(X.extract_features(p, c, wav).astype(jnp.float32) ** 2)

    g32 = jax.grad(lambda p_: loss(p_, cfg))(p)
    g16 = jax.grad(lambda p_: loss(p_, cfg16))(p)
    assert all(x.dtype == jnp.float32 for x in jax.tree.leaves(g16))
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_qkv_respects_fast_bwd(rng):
    """The fused-QKV GEMM must go through the same fast-backward
    (bf16-cotangent) matmul as the unfused q/k/v path.

    Two pins: (a) flipping fast_bwd_matmuls changes the fused path's grads
    (before the round-2 fix the fused dot ignored the knob entirely, so
    grads were bitwise-identical either way); (b) fused and unfused grads
    agree to bf16 tolerance under the same fast_bwd setting."""
    import jax
    import jax.numpy as jnp

    base = X.XLSRConfig.tiny(compute_dtype="bfloat16")
    fused_fast = base.with_(fuse_qkv=True, fast_bwd_matmuls=True)
    fused_slow = base.with_(fuse_qkv=True, fast_bwd_matmuls=False)
    unfused_fast = base.with_(fuse_qkv=False, fast_bwd_matmuls=True)

    p = X.init_xlsr(jax.random.key(0), base)
    wav = jnp.asarray(rng.normal(size=(2, 3200)).astype(np.float32) * 0.1)

    def grads(cfg):
        def loss(p_):
            return jnp.sum(
                X.extract_features(p_, cfg, wav).astype(jnp.float32) ** 2
            )

        return jax.grad(loss)(p)

    g_fast, g_slow = grads(fused_fast), grads(fused_slow)
    # (a) the knob reaches the fused GEMM: some leaf must differ
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_slow))
    ]
    assert max(diffs) > 0.0, "fast_bwd had no effect on the fused-QKV path"
    # (b) fused vs unfused parity at the same fast_bwd setting
    g_ref = grads(unfused_fast)
    for a, b in zip(jax.tree.leaves(g_fast), jax.tree.leaves(g_ref)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # rel tolerance on meaningfully-sized leaves + abs floor for leaves
        # whose grads are ~0 (fp32 accumulation-order noise dominates there)
        assert np.abs(a - b).max() < 2e-2 * np.abs(b).max() + 1e-4
