"""Normalizing-flow primitives (ops/flows.py) — the VITS leftovers vendored
in the reference BTSE package (model/wav2vec2_btse/modules.py + transforms.py,
dead code there, part of the repo surface).

Pins: spline invertibility + exact logdet (checked against jax.grad), linear
tails, identity-at-init for the zero-initialized coupling layers, round-trip
inversion of every flow, and WN/DDSConv mask/conditioning behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.ops import flows


def _spline_params(key, shape, num_bins):
    k1, k2, k3 = jax.random.split(key, 3)
    uw = jax.random.normal(k1, shape + (num_bins,))
    uh = jax.random.normal(k2, shape + (num_bins,))
    ud = jax.random.normal(k3, shape + (num_bins - 1,))
    return uw, uh, ud


def test_spline_roundtrip_and_logdet_negation():
    num_bins = 8
    x = jnp.asarray(np.random.default_rng(0).uniform(-4.5, 4.5, size=(64,)), jnp.float32)
    uw, uh, ud = _spline_params(jax.random.key(1), (64,), num_bins)
    y, ld = flows.piecewise_rational_quadratic_transform(
        x, uw, uh, ud, tails="linear", tail_bound=5.0
    )
    x_back, ld_inv = flows.piecewise_rational_quadratic_transform(
        y, uw, uh, ud, inverse=True, tails="linear", tail_bound=5.0
    )
    # fp32 noise near bin boundaries dominates the error
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=5e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=5e-4)


def test_spline_logdet_matches_autodiff_derivative():
    """logabsdet must equal log|dy/dx| elementwise — checked with jax.grad
    of the scalar forward map."""
    num_bins = 6
    uw, uh, ud = _spline_params(jax.random.key(2), (), num_bins)

    def fwd(x):
        y, _ = flows.piecewise_rational_quadratic_transform(
            x, uw, uh, ud, tails="linear", tail_bound=2.0
        )
        return y

    for xv in (-1.7, -0.3, 0.0, 0.9, 1.99):
        x = jnp.float32(xv)
        _, ld = flows.piecewise_rational_quadratic_transform(
            x, uw, uh, ud, tails="linear", tail_bound=2.0
        )
        dydx = jax.grad(fwd)(x)
        np.testing.assert_allclose(float(ld), float(jnp.log(jnp.abs(dydx))), atol=1e-4)


def test_spline_linear_tails_are_identity():
    num_bins = 5
    uw, uh, ud = _spline_params(jax.random.key(3), (4,), num_bins)
    x = jnp.asarray([-9.0, -3.1, 3.5, 20.0], jnp.float32)
    y, ld = flows.piecewise_rational_quadratic_transform(
        x, uw, uh, ud, tails="linear", tail_bound=3.0
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(ld), 0.0)


def test_spline_is_monotonic():
    num_bins = 10
    uw, uh, ud = _spline_params(jax.random.key(4), (), num_bins)
    xs = jnp.linspace(-0.99, 0.99, 257)
    ys, _ = flows.piecewise_rational_quadratic_transform(
        xs, jnp.tile(uw, (257, 1)), jnp.tile(uh, (257, 1)), jnp.tile(ud, (257, 1)),
        tails="linear", tail_bound=1.0,
    )
    assert np.all(np.diff(np.asarray(ys)) > 0)


# --------------------------------------------------------------- simple flows


def test_log_flow_roundtrip():
    x = jnp.asarray(np.random.default_rng(1).uniform(0.1, 3.0, (2, 5, 3)), jnp.float32)
    mask = jnp.ones((2, 5, 1), jnp.float32)
    y, ld = flows.log_flow(x, mask)
    np.testing.assert_allclose(np.asarray(y), np.log(np.asarray(x)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(y).sum((1, 2)), rtol=1e-5)
    back = flows.log_flow(y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-5)


def test_flip_flow_roundtrip():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 6)), jnp.float32)
    y, ld = flows.flip_flow(x)
    np.testing.assert_array_equal(np.asarray(ld), 0.0)
    np.testing.assert_array_equal(np.asarray(flows.flip_flow(y, reverse=True)), np.asarray(x))


def test_elementwise_affine_roundtrip_and_logdet():
    p = flows.init_elementwise_affine(3)
    p = {"m": jnp.asarray([0.5, -1.0, 0.0]), "logs": jnp.asarray([0.2, -0.3, 0.4])}
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 7, 3)), jnp.float32)
    mask = jnp.ones((2, 7, 1), jnp.float32)
    y, ld = flows.elementwise_affine(p, x, mask)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(p["m"] + jnp.exp(p["logs"]) * x), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(ld), 7 * float(jnp.sum(p["logs"])), rtol=1e-5)
    back = flows.elementwise_affine(p, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


# ------------------------------------------------------------------ WN / DDS


def test_wn_shapes_mask_and_conditioning():
    p = flows.init_wn(jax.random.key(0), hidden=8, kernel=3,
                      n_layers=3, gin=4)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 10, 8)), jnp.float32)
    g = jnp.asarray(np.random.default_rng(5).normal(size=(2, 10, 4)), jnp.float32)
    mask = jnp.ones((2, 10, 1), jnp.float32).at[:, 7:].set(0.0)
    y = flows.wn(p, x, mask, g=g, dilation_rate=2)
    assert y.shape == (2, 10, 8)
    # masked positions are zeroed
    np.testing.assert_array_equal(np.asarray(y[:, 7:]), 0.0)
    # conditioning actually changes the output
    y0 = flows.wn(p, x, mask, g=None, dilation_rate=2)
    assert float(jnp.max(jnp.abs(y - y0))) > 1e-4


def test_dds_conv_preserves_length_and_masks():
    p = flows.init_dds_conv(jax.random.key(1), channels=6, kernel=3, n_layers=3)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 12, 6)), jnp.float32)
    mask = jnp.ones((2, 12, 1), jnp.float32).at[:, 9:].set(0.0)
    y = flows.dds_conv(p, x, mask)
    assert y.shape == x.shape
    np.testing.assert_array_equal(np.asarray(y[:, 9:]), 0.0)
    assert np.all(np.isfinite(np.asarray(y)))


def test_conv_relu_norm_identity_at_init():
    p = flows.init_conv_relu_norm(jax.random.key(2), in_ch=6, hidden=8,
                                  out_ch=6, kernel=3, n_layers=2)
    x = jnp.asarray(np.random.default_rng(11).normal(size=(2, 9, 6)), jnp.float32)
    mask = jnp.ones((2, 9, 1), jnp.float32)
    # zero-init proj -> residual identity (modules.py:64-65)
    np.testing.assert_allclose(
        np.asarray(flows.conv_relu_norm(p, x, mask)), np.asarray(x), atol=1e-6
    )


def test_res_blocks_shapes_and_residual_growth():
    x = jnp.asarray(np.random.default_rng(12).normal(size=(2, 16, 4)), jnp.float32)
    mask = jnp.ones((2, 16, 1), jnp.float32).at[:, 12:].set(0.0)
    p1 = flows.init_res_block1(jax.random.key(3), channels=4)
    y1 = flows.res_block1(p1, x, mask)
    p2 = flows.init_res_block2(jax.random.key(4), channels=4)
    y2 = flows.res_block2(p2, x, mask)
    for y in (y1, y2):
        assert y.shape == x.shape
        np.testing.assert_array_equal(np.asarray(y[:, 12:]), 0.0)
        assert np.all(np.isfinite(np.asarray(y)))
        assert float(jnp.max(jnp.abs(y - x * mask))) > 1e-4  # convs contribute


# ----------------------------------------------------------- coupling layers


def test_residual_coupling_identity_at_init_then_roundtrip():
    key = jax.random.key(7)
    p = flows.init_residual_coupling(key, channels=8, hidden=16, kernel=3,
                                     n_layers=2)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 6, 8)), jnp.float32)
    mask = jnp.ones((2, 6, 1), jnp.float32)
    # zero-init post conv -> identity with zero logdet (modules.py:328-329)
    y, ld = flows.residual_coupling(p, x, mask)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ld), 0.0)
    # perturb the post conv -> nontrivial flow, still exactly invertible
    p["post"]["w"] = 0.1 * jax.random.normal(key, p["post"]["w"].shape)
    y, ld = flows.residual_coupling(p, x, mask)
    assert float(jnp.max(jnp.abs(y - x))) > 1e-3
    back = flows.residual_coupling(p, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_residual_coupling_mean_only():
    key = jax.random.key(8)
    p = flows.init_residual_coupling(key, channels=4, hidden=8, kernel=3,
                                     n_layers=2, mean_only=True)
    p["post"]["w"] = 0.1 * jax.random.normal(key, p["post"]["w"].shape)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(1, 5, 4)), jnp.float32)
    mask = jnp.ones((1, 5, 1), jnp.float32)
    y, ld = flows.residual_coupling(p, x, mask, mean_only=True)
    np.testing.assert_array_equal(np.asarray(ld), 0.0)  # pure shift: |det|=1
    back = flows.residual_coupling(p, y, mask, mean_only=True, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_conv_flow_roundtrip_at_init_and_perturbed():
    """Zero-init proj gives uniform knots (NOT exact identity — interior
    derivatives are softplus(0)+eps, same as the torch original at init);
    the contract is invertibility, pinned at init and with real knots."""
    key = jax.random.key(9)
    num_bins = 6
    p = flows.init_conv_flow(key, in_channels=4, filter_channels=8, kernel=3,
                             n_layers=2, num_bins=num_bins)
    x = jnp.asarray(
        np.random.default_rng(9).uniform(-4.0, 4.0, size=(2, 5, 4)), jnp.float32
    )
    mask = jnp.ones((2, 5, 1), jnp.float32)
    y, ld = flows.conv_flow(p, x, mask, num_bins=num_bins)
    # x0 half passes through untouched; x1 half stays inside the tail box
    np.testing.assert_array_equal(np.asarray(y[..., :2]), np.asarray(x[..., :2]))
    assert np.all(np.abs(np.asarray(y[..., 2:])) <= 5.0 + 1e-6)
    back = flows.conv_flow(p, y, mask, num_bins=num_bins, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
    # perturbed knots: a real spline, still invertible
    p["proj"]["w"] = 0.5 * jax.random.normal(key, p["proj"]["w"].shape)
    y, ld = flows.conv_flow(p, x, mask, num_bins=num_bins)
    assert float(jnp.max(jnp.abs(y - x))) > 1e-3
    back = flows.conv_flow(p, y, mask, num_bins=num_bins, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_conv_flow_jits_and_differentiates():
    """The whole point of the vectorized tails: the flow compiles under jit
    and has finite gradients (the torch boolean-indexing form cannot trace)."""
    num_bins = 4
    p = flows.init_conv_flow(jax.random.key(10), 4, 8, 3, 2, num_bins=num_bins)
    p["proj"]["w"] = 0.3 * jax.random.normal(jax.random.key(11), p["proj"]["w"].shape)
    x = jnp.asarray(np.random.default_rng(10).normal(size=(2, 5, 4)), jnp.float32)
    mask = jnp.ones((2, 5, 1), jnp.float32)

    @jax.jit
    def nll(params, x):
        y, ld = flows.conv_flow(params, x, mask, num_bins=num_bins)
        return jnp.mean(0.5 * y**2) - jnp.mean(ld)

    g = jax.grad(nll)(p, x)
    flat = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in flat)


def test_wn_rejects_conditioning_without_cond_layer():
    """g passed to a gin=0 stack must error, not silently train
    unconditionally (the torch WN crashes: no cond_layer exists)."""
    p = flows.init_wn(jax.random.key(1), hidden=4, kernel=3, n_layers=2)
    x = jnp.ones((1, 6, 4), jnp.float32)
    mask = jnp.ones((1, 6, 1), jnp.float32)
    with pytest.raises(ValueError, match="gin=0"):
        flows.wn(p, x, mask, g=jnp.ones((1, 6, 3), jnp.float32))


def test_conv_relu_norm_dropout_masks_differ_per_layer():
    p = flows.init_conv_relu_norm(jax.random.key(3), in_ch=4, hidden=4,
                                  out_ch=4, kernel=3, n_layers=3)
    # the projection is zero-init (identity module) — perturb it so the
    # dropout-carrying hidden path reaches the output
    p["proj"]["w"] = 0.5 * jax.random.normal(jax.random.key(4),
                                             p["proj"]["w"].shape)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 4)), jnp.float32)
    mask = jnp.ones((1, 8, 1), jnp.float32)
    y1 = flows.conv_relu_norm(p, x, mask, dropout_rate=0.5, rng=jax.random.key(0))
    y2 = flows.conv_relu_norm(p, x, mask, dropout_rate=0.5, rng=jax.random.key(0))
    y3 = flows.conv_relu_norm(p, x, mask, dropout_rate=0.5, rng=jax.random.key(9))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))  # keyed
    assert float(jnp.max(jnp.abs(y1 - y3))) > 0.0  # key-dependent
    # pin the IMPLEMENTATION's per-layer masks: recompute the stack manually
    # with fold_in(rng, i) per depth and require exact equality — a version
    # that hoisted one shared mask out of the loop would diverge here
    from scl_deepfake_audio_detection_tpu.ops.layers import conv1d, layer_norm

    rngk = jax.random.key(0)
    y_ref = x
    for i, (conv, norm) in enumerate(zip(p["convs"], p["norms"])):
        kk = conv["w"].shape[0]
        y_ref = conv1d(conv, y_ref * mask, padding=[(kk // 2, kk // 2)])
        y_ref = jax.nn.relu(flows.layer_norm(norm, y_ref)) if hasattr(
            flows, "layer_norm") else jax.nn.relu(layer_norm(norm, y_ref))
        keep = jax.random.bernoulli(jax.random.fold_in(rngk, i), 0.5,
                                    y_ref.shape)
        y_ref = jnp.where(keep, y_ref / 0.5, 0.0)
    y_ref = (x + conv1d(p["proj"], y_ref)) * mask
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y_ref), atol=1e-6)
