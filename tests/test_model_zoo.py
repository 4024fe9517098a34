"""ResNet + AASIST model heads: forward contract, loss terms, registry
resolution, BN buffer semantics, torch parity for the conv/BN primitives."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.models.aasist import XLSRAasist
from scl_deepfake_audio_detection_tpu.models.base import eval_scores, model_buffers
from scl_deepfake_audio_detection_tpu.models.resnet import (
    RESNET_CONFIGS,
    XLSRResNet,
    init_resnet,
    resnet_forward,
)
from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
from scl_deepfake_audio_detection_tpu.utils.registry import MODELS

TINY = XLSRConfig.tiny()


@pytest.fixture(scope="module")
def wav():
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 3200)).astype(np.float32) * 0.1
    )


@pytest.fixture(scope="module")
def labels():
    return jnp.asarray(np.array([1, 1, 0, 0], np.int32))


# ---------------------------------------------------------------- primitives


def test_conv2d_matches_torch(rng):
    import torch

    from scl_deepfake_audio_detection_tpu.ops.layers import conv2d, init_conv2d

    p = init_conv2d(jax.random.key(0), 3, 5, (2, 3))
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)

    got = np.asarray(conv2d(p, jnp.asarray(x), padding=[(1, 1), (1, 1)]))

    tconv = torch.nn.Conv2d(3, 5, (2, 3), padding=(1, 1))
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))))
        tconv.bias.copy_(torch.tensor(np.asarray(p["b"])))
        want = tconv(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(got, np.transpose(want.numpy(), (0, 2, 3, 1)), atol=1e-4)


def test_batch_norm_matches_torch(rng):
    import torch

    from scl_deepfake_audio_detection_tpu.ops.layers import (
        batch_norm,
        init_batch_norm,
        init_bn_buffers,
    )

    x = rng.normal(size=(4, 5, 6, 3)).astype(np.float32) * 2 + 1
    p, buf = init_batch_norm(3), init_bn_buffers(3)

    tbn = torch.nn.BatchNorm2d(3)
    tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    tbn.train()
    want = tbn(tx).detach().numpy()

    got, nb = batch_norm(p, buf, jnp.asarray(x), train=True)
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want, (0, 2, 3, 1)), atol=1e-4
    )
    # running stats match torch's EMA (momentum 0.1, unbiased var)
    np.testing.assert_allclose(
        np.asarray(nb["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(nb["var"]), tbn.running_var.numpy(), atol=1e-4)

    # eval mode uses running stats
    tbn.eval()
    want_eval = tbn(tx).detach().numpy()
    got_eval, _ = batch_norm(p, nb, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(got_eval), np.transpose(want_eval, (0, 2, 3, 1)), atol=1e-4
    )


def test_max_pool2d_matches_torch(rng):
    import torch

    from scl_deepfake_audio_detection_tpu.ops.layers import max_pool2d

    x = rng.normal(size=(2, 13, 10, 4)).astype(np.float32)
    got = np.asarray(max_pool2d(jnp.asarray(x), (3, 3)))
    want = torch.nn.functional.max_pool2d(
        torch.tensor(np.transpose(x, (0, 3, 1, 2))), (3, 3)
    ).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), atol=1e-6)


# ------------------------------------------------------------------- ResNet


@pytest.mark.parametrize("rtype", ["18", "50"])
def test_resnet_backbone_shapes(rng, rtype):
    params, buffers = init_resnet(jax.random.key(0), rtype)
    # H must survive stem stride 3, three stride-2 stages and the (3,3) conv5
    # (the real model sees ~199 SSL frames); 63 -> 19 -> 19,10,5,3 -> 1
    x = jnp.asarray(rng.normal(size=(2, 63, 32, 1)).astype(np.float32))
    logits, emb, nb = resnet_forward(
        params, buffers, x, rtype, num_nodes=3, train=True, cdtype=jnp.float32
    )
    assert logits.shape == (2, 2) and emb.shape == (2, 256)
    assert np.isfinite(np.asarray(logits)).all()
    assert jax.tree.structure(nb) == jax.tree.structure(buffers)


def test_resnet_configs_cover_reference():
    assert set(RESNET_CONFIGS) == {"18", "28", "34", "50", "101"}


def test_xlsr_resnet_contract(wav, labels):
    model = XLSRResNet(ssl=TINY)
    params = model.init(jax.random.key(0))
    buffers = model_buffers(model)
    out, nb = model.apply(params, wav, train=True, rng=jax.random.key(1),
                          buffers=buffers, mutable=True)
    assert out.log_probs.shape == (4, 2)
    assert out.logits.shape == (4, 2)
    assert out.emb.shape == (4, 256)
    assert out.feats.shape[0] == 4 and out.feats.shape[2] == 128
    # raw logits are what goes in score files
    np.testing.assert_array_equal(
        np.asarray(eval_scores(model, out)), np.asarray(out.logits)
    )
    terms = model.loss(out, labels)
    assert set(terms) == {"L_CE", "L_CF1", "L_CF2"}
    assert all(np.isfinite(float(v)) for v in terms.values())


def test_xlsr_resnet_eval_uses_running_stats(wav):
    """Eval output must depend on the buffers passed in (BN running stats)."""
    model = XLSRResNet(ssl=TINY)
    params = model.init(jax.random.key(0))
    b0 = model_buffers(model)
    _, b1 = model.apply(params, wav, train=True, rng=jax.random.key(1),
                        buffers=b0, mutable=True)
    out0 = model.apply(params, wav, train=False, buffers=b0)
    out1 = model.apply(params, wav, train=False, buffers=b1)
    assert not np.allclose(np.asarray(out0.log_probs), np.asarray(out1.log_probs))


# ------------------------------------------------------------------- AASIST


def test_xlsr_aasist_contract(wav, labels):
    model = XLSRAasist(ssl=TINY)
    params = model.init(jax.random.key(0))
    buffers = model_buffers(model)
    out, nb = model.apply(params, wav, train=True, rng=jax.random.key(1),
                          buffers=buffers, mutable=True)
    gat1 = model.gat_dims[1]
    assert out.log_probs.shape == (4, 2)
    assert out.emb.shape == (4, 5 * gat1)
    assert out.feats.shape == (4, 1, 5 * gat1)
    assert np.isfinite(np.asarray(out.logits)).all()
    terms = model.loss(out, labels)
    assert set(terms) == {"L_CE", "L_CF1", "L_CF2"}
    assert all(np.isfinite(float(v)) for v in terms.values())
    # buffers updated in train mode
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(buffers), jax.tree.leaves(nb))
    )
    assert changed


def test_xlsr_aasist_eval_deterministic(wav):
    model = XLSRAasist(ssl=TINY)
    params = model.init(jax.random.key(0))
    buffers = model_buffers(model)
    a = model.apply(params, wav, train=False, buffers=buffers)
    b = model.apply(params, wav, train=False, buffers=buffers)
    np.testing.assert_array_equal(np.asarray(a.log_probs), np.asarray(b.log_probs))


def test_xlsr_aasist_grad_flows(wav, labels):
    model = XLSRAasist(ssl=TINY)
    params = model.init(jax.random.key(0))
    buffers = model_buffers(model)

    def loss_fn(p):
        out, _ = model.apply(p, wav, train=True, rng=jax.random.key(2),
                             buffers=buffers, mutable=True)
        return sum(model.loss(out, labels).values())

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # graph-attention weights receive gradient
    assert np.abs(np.asarray(g["gat_S"]["att_weight"])).max() > 0


def test_registry_resolves_reference_names():
    assert MODELS.get("wav2vec2_aasist") is XLSRAasist
    assert MODELS.get("wav2vec2_resnet") is XLSRResNet
    assert MODELS.get("wav2vec2_resnet_nll") is XLSRResNet
    assert MODELS.get("xlsr_aasist") is XLSRAasist


def test_aasist_loss_scaled_by_batch(wav, labels):
    """AASIST scales every term by 1/N (reference wav2vec2_aasist.py:619-627),
    unlike the resnet wrappers which don't scale."""
    model = XLSRAasist(ssl=TINY)
    params = model.init(jax.random.key(0))
    out = model.apply(params, wav, train=False, buffers=model_buffers(model))
    from scl_deepfake_audio_detection_tpu.ops.losses import cross_entropy

    want = float(cross_entropy(out.logits, labels)) / 4
    got = float(model.loss(out, labels)["L_CE"])
    assert got == pytest.approx(want, rel=1e-6)


def test_cast_matmul_params_is_numerically_free():
    """Pre-casting matmul weights to the compute dtype must be a numeric
    no-op for inference (the ops cast weights to the compute dtype inside the
    program anyway) and must leave LN/bias leaves fp32."""
    import jax

    from scl_deepfake_audio_detection_tpu.models.base import cast_matmul_params
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig

    model = LinearNLL(ssl=XLSRConfig.tiny(compute_dtype="bfloat16"))
    params = model.init(jax.random.key(0))
    cast = cast_matmul_params(params, "bfloat16")

    flat = jax.tree_util.tree_leaves_with_path(cast)
    assert any(l.dtype == jnp.bfloat16 for _, l in flat)
    for path, leaf in flat:
        key = getattr(path[-1], "key", None)
        if key in ("scale", "bias", "b"):
            assert leaf.dtype == jnp.float32, (path, leaf.dtype)

    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3210)), jnp.float32)
    a = model.apply(params, wav, train=False).log_probs
    b = model.apply(cast, wav, train=False).log_probs
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
