"""Graph-attention ops (ops/graph.py): shapes, normalization semantics,
top-k pooling behavior, buffer threading."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.ops.graph import (
    gat,
    graph_pool,
    htrg_gat,
    init_gat,
    init_graph_pool,
    init_htrg_gat,
    pooled_nodes,
)


def test_gat_shapes_and_buffer_update(rng):
    p, buf = init_gat(jax.random.key(0), in_dim=8, out_dim=6)
    x = jnp.asarray(rng.normal(size=(3, 10, 8)).astype(np.float32))
    y, nb = gat(p, buf, x, train=True, rng=jax.random.key(1))
    assert y.shape == (3, 10, 6)
    assert np.isfinite(np.asarray(y)).all()
    # train mode updates running stats
    assert not np.allclose(np.asarray(nb["bn"]["mean"]), np.asarray(buf["bn"]["mean"]))
    # eval mode leaves them alone
    _, nb_eval = gat(p, buf, x, train=False, rng=None)
    np.testing.assert_array_equal(
        np.asarray(nb_eval["bn"]["mean"]), np.asarray(buf["bn"]["mean"])
    )


def test_gat_attention_normalized_over_output_axis(rng, monkeypatch):
    """The reference softmaxes over dim=-2 (the *output* node index) —
    column-stochastic attention. Verify our weights sum to 1 over axis 1."""
    from scl_deepfake_audio_detection_tpu.ops import graph as G

    scores = jnp.asarray(rng.normal(size=(2, 5, 5)).astype(np.float32))
    att = G._att_softmax(scores, temp=2.0)
    np.testing.assert_allclose(np.asarray(att.sum(axis=1)), 1.0, rtol=1e-5)


def test_htrg_gat_shapes_and_master(rng):
    p, buf = init_htrg_gat(jax.random.key(0), in_dim=8, out_dim=6)
    x1 = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, 7, 8)).astype(np.float32))
    master = jnp.asarray(rng.normal(size=(1, 1, 8)).astype(np.float32))
    y1, y2, m, nb = htrg_gat(p, buf, x1, x2, master, train=False, rng=None)
    assert y1.shape == (2, 4, 6) and y2.shape == (2, 7, 6)
    assert m.shape == (2, 1, 6)
    # master=None falls back to the node mean
    y1b, y2b, mb, _ = htrg_gat(p, buf, x1, x2, None, train=False, rng=None)
    assert mb.shape == (2, 1, 6)
    assert not np.allclose(np.asarray(m), np.asarray(mb))


def test_graph_pool_keeps_topk_scaled(rng):
    """Pool keeps the ceil(N*k) highest-scoring nodes, scaled by their score,
    in score-descending order (reference GraphPool.top_k_graph :352-372)."""
    p = init_graph_pool(jax.random.key(0), in_dim=4)
    h = jnp.asarray(rng.normal(size=(2, 6, 4)).astype(np.float32))
    out = graph_pool(p, h, k=0.5, train=False, rng=None)
    assert out.shape == (2, pooled_nodes(6, 0.5), 4)

    # manual check
    scores = jax.nn.sigmoid(h @ p["proj"]["w"] + p["proj"]["b"])[..., 0]
    for b in range(2):
        order = np.argsort(-np.asarray(scores[b]))[:3]
        want = np.asarray(h[b])[order] * np.asarray(scores[b])[order, None]
        np.testing.assert_allclose(np.asarray(out[b]), want, rtol=1e-5)


def test_pooled_nodes_floor_min1():
    assert pooled_nodes(6, 0.5) == 3
    assert pooled_nodes(7, 0.5) == 3  # int() floors like the reference
    assert pooled_nodes(1, 0.1) == 1  # never below 1


def test_gat_jit_grad(rng):
    """Graph layer is differentiable and jit-compiles with static shapes."""
    p, buf = init_gat(jax.random.key(0), in_dim=4, out_dim=4)
    x = jnp.asarray(rng.normal(size=(2, 5, 4)).astype(np.float32))

    @jax.jit
    def loss(p):
        y, _ = gat(p, buf, x, train=False, rng=None)
        return jnp.sum(y**2)

    g = jax.grad(loss)(p)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
