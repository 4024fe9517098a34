"""Flagship model (xlsr_linear_nll): contract, shapes, loss wiring, freezing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
from scl_deepfake_audio_detection_tpu.models.base import scores_from_log_probs
from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
from scl_deepfake_audio_detection_tpu.utils.registry import MODELS


@pytest.fixture(scope="module")
def tiny_model():
    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    params = model.init(jax.random.key(0))
    return model, params


def test_registered_under_both_names():
    assert MODELS.get("xlsr_linear_nll") is LinearNLL
    assert MODELS.get("wav2vec2_linear_nll") is LinearNLL


def test_forward_contract(tiny_model):
    model, params = tiny_model
    wav = jnp.zeros((11, 3200))  # conf-3 view-batch: 11 views
    out = model.apply(params, wav, train=True, rng=jax.random.key(1))
    t = model.ssl.num_frames(3200)
    assert out.log_probs.shape == (11, 2)
    assert out.feats.shape == (11, t, model.emb_dim)
    assert out.emb.shape == (11, model.emb_dim)
    # log-softmax outputs: rows sum to 1 in prob space
    np.testing.assert_allclose(
        np.exp(np.asarray(out.log_probs)).sum(-1), 1.0, rtol=1e-5
    )
    assert scores_from_log_probs(out.log_probs).shape == (11,)


@pytest.mark.parametrize(
    "loss_type,keys",
    [
        (1, {"L_CE", "L_CF1", "L_CF2"}),
        (2, {"L_CE", "L_CF1"}),
        (3, {"L_CE", "L_CF2"}),
        (4, {"L_CE"}),
        (5, {"L_CF1", "L_CF2"}),
    ],
)
def test_loss_type_selects_terms(tiny_model, loss_type, keys):
    model, params = tiny_model
    from dataclasses import replace

    model = replace(model, loss_type=loss_type)
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(6, 3200)), jnp.float32)
    labels = jnp.asarray([1, 1, 1, 0, 0, 0])
    out = model.apply(params, wav, train=True, rng=jax.random.key(2))
    terms = model.loss(out, labels)
    assert set(terms) == keys
    for v in terms.values():
        assert np.isfinite(float(v))


def test_eval_is_deterministic(tiny_model):
    model, params = tiny_model
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3200)), jnp.float32)
    a = model.apply(params, wav, train=False)
    b = model.apply(params, wav, train=False)
    np.testing.assert_array_equal(np.asarray(a.log_probs), np.asarray(b.log_probs))


def test_train_dropout_changes_output(tiny_model):
    model, params = tiny_model
    wav = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3200)), jnp.float32)
    a = model.apply(params, wav, train=True, rng=jax.random.key(1))
    b = model.apply(params, wav, train=True, rng=jax.random.key(2))
    assert not np.allclose(np.asarray(a.log_probs), np.asarray(b.log_probs))


def test_fix_ssl_stops_gradients(tiny_model):
    from dataclasses import replace

    model, params = tiny_model
    frozen = replace(model, flag_fix_ssl=True)
    wav = jnp.asarray(np.random.default_rng(3).normal(size=(4, 3200)), jnp.float32)
    labels = jnp.asarray([1, 1, 0, 0])

    def total(p, m):
        out = m.apply(p, wav, train=True, rng=jax.random.key(0))
        return sum(m.loss(out, labels).values())

    g_frozen = jax.grad(total)(params, frozen)
    ssl_norm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g_frozen["ssl"]))
    head_norm = sum(
        float(jnp.sum(jnp.abs(l)))
        for l in jax.tree.leaves({"ll": g_frozen["ll"], "backend": g_frozen["backend"]})
    )
    assert ssl_norm == 0.0
    assert head_norm > 0.0


def test_loss_decreases_with_sgd_steps(tiny_model):
    """One anchor-group batch, a few full-graph SGD steps: total loss drops."""
    model, params = tiny_model
    rng = np.random.default_rng(4)
    wav = jnp.asarray(rng.normal(size=(6, 3200)), jnp.float32)
    labels = jnp.asarray([1, 1, 1, 0, 0, 0])

    def total(p):
        out = model.apply(p, wav, train=False)
        return sum(model.loss(out, labels).values())

    val_grad = jax.jit(jax.value_and_grad(total))
    p = params
    first, _ = val_grad(p)
    for _ in range(5):
        v, g = val_grad(p)
        p = jax.tree.map(lambda a, b: a - 5e-3 * b, p, g)
    last, _ = val_grad(p)
    assert float(last) < float(first)
