"""Tests for ops/seq_utils.py — the VITS commons.py helper belt
(reference model/wav2vec2_btse/commons.py), numpy/torch-derived parity."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.ops import seq_utils as su


def test_gaussian_kl_matches_closed_form_and_zero_at_equal():
    rng = np.random.default_rng(0)
    m_p, m_q = rng.normal(size=(3, 5)), rng.normal(size=(3, 5))
    logs_p, logs_q = rng.normal(size=(3, 5)) * 0.3, rng.normal(size=(3, 5)) * 0.3
    kl = np.asarray(su.gaussian_kl(*map(jnp.asarray, (m_p, logs_p, m_q, logs_q))))
    # closed form KL(N(m_p, s_p^2) || N(m_q, s_q^2)) with s = exp(logs)
    sp2, sq2 = np.exp(2 * logs_p), np.exp(2 * logs_q)
    expect = np.log(np.sqrt(sq2) / np.sqrt(sp2)) + (sp2 + (m_p - m_q) ** 2) / (
        2 * sq2
    ) - 0.5
    np.testing.assert_allclose(kl, expect, rtol=1e-5)
    z = np.asarray(su.gaussian_kl(*map(jnp.asarray, (m_p, logs_p, m_p, logs_p))))
    np.testing.assert_allclose(z, 0.0, atol=1e-6)


def test_rand_gumbel_finite_and_distribution():
    g = np.asarray(su.rand_gumbel(jax.random.key(0), (20000,)))
    assert np.all(np.isfinite(g))
    # Gumbel(0,1) mean is the Euler-Mascheroni constant ~0.5772
    assert abs(g.mean() - 0.5772) < 0.05


def test_sequence_mask():
    m = np.asarray(su.sequence_mask(jnp.asarray([0, 2, 5]), 5))
    expect = np.array(
        [[0, 0, 0, 0, 0], [1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], bool
    )
    np.testing.assert_array_equal(m, expect)


def test_subsequent_mask_is_causal():
    m = np.asarray(su.subsequent_mask(4))
    assert m.shape == (1, 1, 4, 4)
    np.testing.assert_array_equal(m[0, 0], np.tril(np.ones((4, 4))))


def test_slice_segments_matches_direct_indexing_and_jits():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 10, 4)), jnp.float32)
    ids = jnp.asarray([0, 3, 6])
    out = jax.jit(su.slice_segments, static_argnums=2)(x, ids, 4)
    for b, s in enumerate([0, 3, 6]):
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(x[b, s : s + 4]))


def test_rand_slice_segments_bounds():
    x = jnp.zeros((8, 12, 2))
    lengths = jnp.asarray([12, 6, 12, 8, 12, 12, 5, 12])
    seg, ids = su.rand_slice_segments(jax.random.key(3), x, lengths, segment_size=4)
    assert seg.shape == (8, 4, 2)
    ids = np.asarray(ids)
    assert np.all(ids >= 0) and np.all(ids + 4 <= np.asarray(lengths))


def _timing_signal_numpy(length, channels, min_ts=1.0, max_ts=1.0e4):
    # direct numpy transcription of the torch math (commons.py:67-80),
    # transposed to [T, C]
    position = np.arange(length, dtype=np.float32)
    num = channels // 2
    log_inc = math.log(max_ts / min_ts) / (num - 1)
    inv = min_ts * np.exp(np.arange(num, dtype=np.float32) * -log_inc)
    scaled = position[:, None] * inv[None, :]
    sig = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)
    if channels % 2:
        sig = np.pad(sig, ((0, 0), (0, 1)))
    return sig


@pytest.mark.parametrize("channels", [8, 7])
def test_timing_signal_parity(channels):
    got = np.asarray(su.get_timing_signal_1d(11, channels))[0]
    np.testing.assert_allclose(got, _timing_signal_numpy(11, channels), atol=1e-6)
    x = jnp.ones((2, 11, channels), jnp.float32)
    add = np.asarray(su.add_timing_signal_1d(x))
    expect = 1.0 + _timing_signal_numpy(11, channels)
    for b in range(2):
        np.testing.assert_allclose(add[b], expect, atol=1e-6)
    cat = su.cat_timing_signal_1d(x)
    assert cat.shape == (2, 11, 2 * channels)


def test_shift_1d():
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 6, 1))
    y = np.asarray(su.shift_1d(x))[0, :, 0]
    np.testing.assert_array_equal(y, [0, 0, 1, 2, 3, 4])


def test_generate_path_matches_loop_construction():
    rng = np.random.default_rng(2)
    B, TX, TY = 3, 4, 9
    dur = rng.integers(0, 4, size=(B, TX)).astype(np.float32)
    ty_valid = np.minimum(dur.sum(-1).astype(int), TY)
    mask = np.zeros((B, TY, TX), np.float32)
    for b in range(B):
        mask[b, : ty_valid[b], :] = 1.0
    path = np.asarray(su.generate_path(jnp.asarray(dur), jnp.asarray(mask)))
    # loop construction: token j owns frames [cum[j-1], cum[j])
    expect = np.zeros_like(mask)
    for b in range(B):
        cum = np.cumsum(dur[b]).astype(int)
        prev = 0
        for j, c in enumerate(cum):
            expect[b, prev:c, j] = 1.0
            prev = c
    expect *= mask
    np.testing.assert_array_equal(path, expect)
    # each valid frame attributed to exactly one token
    np.testing.assert_array_equal(path.sum(-1), mask[:, :, 0])


def test_clip_grad_value_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    gs = [
        np.array([[3.0, -4.0]], np.float32),
        np.array([1.0, -2.0, 2.0], np.float32),
    ]
    tparams = [torch.nn.Parameter(torch.zeros(g.shape)) for g in gs]
    for p, g in zip(tparams, gs):
        p.grad = torch.tensor(g)
    # torch original semantics (commons.py:146-161)
    total_t = 0.0
    for p in tparams:
        total_t += float(p.grad.data.norm(2.0)) ** 2
        p.grad.data.clamp_(min=-1.5, max=1.5)
    total_t = total_t ** 0.5

    tree = {"a": jnp.asarray(gs[0]), "b": jnp.asarray(gs[1])}
    clipped, total = su.clip_grad_value(tree, 1.5)
    assert abs(float(total) - total_t) < 1e-5
    np.testing.assert_allclose(np.asarray(clipped["a"]), tparams[0].grad.numpy())
    np.testing.assert_allclose(np.asarray(clipped["b"]), tparams[1].grad.numpy())
    # norm-only mode leaves grads untouched
    same, total2 = su.clip_grad_value(tree, None)
    assert float(total2) == pytest.approx(float(total))
    np.testing.assert_array_equal(np.asarray(same["a"]), gs[0])


def test_intersperse():
    assert su.intersperse([1, 2, 3], 0) == [0, 1, 0, 2, 0, 3, 0]
