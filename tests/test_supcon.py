"""SupCon loss: verified against an independent loop-based numpy derivation
of the reference algorithm (``model/loss_metrics.py:87-209``) and against
torch for the shared primitives."""

import numpy as np
import pytest

import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.ops.supcon import (
    flat_similarity,
    seq_similarity,
    supcon_loss,
)

pytestmark = pytest.mark.smoke  # compile-light fast tier (scripts/check.sh gate)


def supcon_numpy(feat, labels, t=0.07, mode="all"):
    """Slow, explicit re-derivation: loops over anchors/contrasts."""
    feat = np.asarray(feat, dtype=np.float64)
    bs, nv = feat.shape[:2]
    # similarity of two items: mean over time of frame dot products
    def sim(a, b):
        ts = a.shape[0]
        return sum(float(a[i] @ b[i]) for i in range(ts)) / ts

    contrast = [feat[i, v] for v in range(nv) for i in range(bs)]  # view-major
    anchors = [feat[i, 0] for i in range(bs)] if mode == "one" else contrast
    na, nc = len(anchors), len(contrast)

    logits = np.array([[sim(a, c) / t for c in contrast] for a in anchors])
    same = np.array(
        [
            [labels[i % bs] == labels[j % bs] for j in range(nc)]
            for i in range(na)
        ],
        dtype=np.float64,
    )
    self_mask = np.ones((na, nc))
    for i in range(na):
        self_mask[i, i] = 0.0
    pos = same * self_mask

    mx = (logits * self_mask).max(axis=1, keepdims=True)
    shifted = logits - mx
    expl = np.exp(shifted * self_mask) * self_mask
    logprob = shifted - np.log(expl.sum(axis=1, keepdims=True))
    mean_pos = (pos * logprob).sum(axis=1) / pos.sum(axis=1)
    return float(-mean_pos.mean())


@pytest.mark.parametrize("mode", ["all", "one"])
@pytest.mark.parametrize("nv", [1, 2])
def test_matches_numpy_derivation(rng, mode, nv):
    feat = rng.normal(size=(5, nv, 7, 4)).astype(np.float32)
    labels = np.array([1, 1, 0, 0, 1])
    got = float(
        supcon_loss(jnp.asarray(feat), labels=jnp.asarray(labels), contra_mode=mode)
    )
    want = supcon_numpy(feat, labels, mode=mode)
    assert got == pytest.approx(want, rel=1e-5)


def test_emb_shape_convention(rng):
    """The reference feeds embeddings as [N, 1, D, 1] through the seq metric
    (``wav2vec2_linear_nll.py:177-180``)."""
    emb = rng.normal(size=(6, 128)).astype(np.float32)
    labels = np.array([1, 0, 1, 0, 1, 0])
    feat = emb[:, None, :, None]
    got = float(supcon_loss(jnp.asarray(feat), labels=jnp.asarray(labels)))
    want = supcon_numpy(feat, labels)
    assert got == pytest.approx(want, rel=1e-5)


def test_scl_batch_layout(rng):
    """conf-3 layout: 11 views = 5 bonafide(1) + 6 spoof(0)."""
    feat = rng.normal(size=(11, 1, 9, 16)).astype(np.float32)
    labels = np.array([1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0])
    got = float(supcon_loss(jnp.asarray(feat), labels=jnp.asarray(labels)))
    want = supcon_numpy(feat, labels)
    assert got == pytest.approx(want, rel=1e-5)
    assert np.isfinite(got) and got > 0


def test_mask_and_labels_mutually_exclusive(rng):
    feat = jnp.asarray(rng.normal(size=(3, 1, 2, 2)).astype(np.float32))
    with pytest.raises(ValueError):
        supcon_loss(feat, labels=jnp.zeros(3, int), mask=jnp.eye(3))


def test_unknown_mode_raises(rng):
    feat = jnp.asarray(rng.normal(size=(3, 1, 2, 2)).astype(np.float32))
    with pytest.raises(ValueError):
        supcon_loss(feat, labels=jnp.zeros(3, int), contra_mode="bogus")


def test_length_norm_bounds_similarity(rng):
    feat = rng.normal(size=(4, 2, 100)).astype(np.float32) * 50
    feat = feat[:, :, :, None]  # [bs, nv, T, 1]
    labels = jnp.asarray([0, 0, 1, 1])
    loss = supcon_loss(jnp.asarray(feat), labels=labels, length_norm=True)
    assert np.isfinite(float(loss))


def test_seq_similarity_equals_torch_bmm(rng):
    import torch

    a = rng.normal(size=(3, 5, 4)).astype(np.float32)
    c = rng.normal(size=(7, 5, 4)).astype(np.float32)
    want = (
        torch.bmm(
            torch.from_numpy(a).permute(1, 0, 2), torch.from_numpy(c).permute(1, 2, 0)
        )
        .mean(0)
        .numpy()
    )
    got = np.asarray(seq_similarity(jnp.asarray(a), jnp.asarray(c)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_flat_similarity(rng):
    a = rng.normal(size=(3, 4)).astype(np.float32)
    got = np.asarray(flat_similarity(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(got, a @ a.T, rtol=1e-5, atol=1e-6)


def test_supcon_zero_positive_anchor_is_finite():
    """An anchor that is the only member of its class has no positives;
    the torch reference yields 0/0 = NaN there — this implementation must
    return a finite loss (the degenerate row contributes 0)."""
    feats = jnp.asarray(  # [bs, views, T, D] for the default bmm seq metric
        np.random.default_rng(0).normal(size=(3, 1, 5, 8)), jnp.float32
    )
    labels = jnp.asarray([0.0, 0.0, 1.0])  # label-1 sample has no positive
    loss = supcon_loss(feats, labels=labels)
    assert np.isfinite(float(loss))
