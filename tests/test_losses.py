"""Loss library parity vs torch primitives and reference docstring examples."""

import numpy as np
import pytest

import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.ops import losses as L


def test_nll_on_log_probs_is_double_softmax(rng):
    """Reproduces CrossEntropyLoss applied to log-softmax outputs
    (the quirk at reference ``wav2vec2_linear_nll.py:134,162``)."""
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(8, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 8)
    log_probs = F.log_softmax(torch.from_numpy(logits), dim=1)
    want = torch.nn.CrossEntropyLoss()(log_probs, torch.from_numpy(labels)).item()
    got = float(
        L.nll_on_log_probs(
            jnp.asarray(np.asarray(log_probs)), jnp.asarray(labels.astype(np.int32))
        )
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_entropy_matches_torch(rng):
    import torch

    logits = rng.normal(size=(10, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 10)
    want = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels.astype(np.int32))))
    assert got == pytest.approx(want, rel=1e-5)


def test_neg_energy_matches_torch(rng):
    import torch

    logits = rng.normal(size=(6, 2)).astype(np.float32)
    want = (-2.0 * torch.logsumexp(torch.from_numpy(logits) / 2.0, dim=1)).numpy()
    got = np.asarray(L.neg_energy(jnp.asarray(logits), temperature=2.0))
    np.testing.assert_allclose(got, want, rtol=3e-4)  # fp32 exp differs across backends


def test_neg_energy_reg_loss():
    e = jnp.asarray([0.5, 1.5, 2.5])
    assert float(L.neg_energy_reg_loss(e, 1.0, 2.0, True)) == pytest.approx(
        np.mean([0.0, 0.25, 2.25])
    )
    assert float(L.neg_energy_reg_loss(e, 1.0, 2.0, False)) == pytest.approx(
        np.mean([2.25, 0.25, 0.0])
    )


def test_mixup_ce_matches_torch(rng):
    import torch

    logits = rng.normal(size=(5, 3)).astype(np.float32)
    y1 = rng.integers(0, 3, 5)
    y2 = rng.integers(0, 3, 5)
    g = rng.uniform(size=5).astype(np.float32)
    ce = torch.nn.CrossEntropyLoss(reduction="none")
    tl = torch.from_numpy(logits)
    want = (
        (torch.from_numpy(g) * ce(tl, torch.from_numpy(y1))
         + (1 - torch.from_numpy(g)) * ce(tl, torch.from_numpy(y2)))
        .mean()
        .item()
    )
    got = float(
        L.mixup_ce(
            jnp.asarray(logits),
            jnp.asarray(y1.astype(np.int32)),
            jnp.asarray(y2.astype(np.int32)),
            jnp.asarray(g),
        )
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_kld_distill_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    s = rng.normal(size=(4, 6)).astype(np.float32)
    t = rng.normal(size=(4, 6)).astype(np.float32)
    want = (
        F.kl_div(
            F.log_softmax(torch.from_numpy(s) / 20.0, dim=-1),
            F.log_softmax(torch.from_numpy(t) / 20.0, dim=-1),
            reduction="batchmean",
            log_target=True,
        )
        * 400.0
    ).item()
    got = float(L.kld_distill(jnp.asarray(s), jnp.asarray(t), temp=20.0))
    assert got == pytest.approx(want, rel=1e-3)  # T^2=400 amplifies fp32 rounding


def test_rank_consistency_docstring_example(rng):
    """Reference ``loss_metrics.py:310-317``: colinear diffs -> -1 cosine."""
    x = rng.normal(size=(4, 10)).astype(np.float32)
    x[1] = x[0] + 1.0
    x[2] = x[0] + 2.0
    x[3] = x[0] + 3.0
    got = float(L.rank_consistency(jnp.asarray(x)))
    assert got == pytest.approx(-1.0, abs=1e-5)


def test_rank_consistency_small_batch_is_zero(rng):
    x = jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))
    assert float(L.rank_consistency(x)) == 0.0
    assert float(L.rank_consistency_v2(x)) == 0.0


def test_rank_consistency_v2_v3_ordered_inputs(rng):
    """Reference ``loss_metrics.py:387-396,459-468``: evenly spaced rows ->
    margin ranking loss 0."""
    x = rng.normal(size=(4, 10)).astype(np.float32)
    x[1] = x[0] + 1.0
    x[2] = x[0] + 2.0
    x[3] = x[0] + 3.0
    assert float(L.rank_consistency_v2(jnp.asarray(x))) == pytest.approx(0.0, abs=1e-6)
    assert float(L.rank_consistency_v3(jnp.asarray(x))) == pytest.approx(0.0, abs=1e-6)


def test_rank_consistency_v3_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.normal(size=(5, 7)).astype(np.float32)
    tx = torch.from_numpy(x)
    vals = []
    for i in range(1, 5):
        for j in range(i):
            vals.append(
                F.margin_ranking_loss(tx[i], tx[j], torch.ones_like(tx[i]), margin=0.1)
            )
    want = torch.stack(vals).mean().item()
    got = float(L.rank_consistency_v3(jnp.asarray(x)))
    assert got == pytest.approx(want, rel=1e-5)


def test_mixup_ce_rejects_partial_mixup_args():
    import pytest as _pytest

    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2)), jnp.float32)
    y1 = jnp.asarray([0, 1, 0, 1])
    with _pytest.raises(ValueError, match="together"):
        L.mixup_ce(logits, y1, y2=y1)
    with _pytest.raises(ValueError, match="together"):
        L.mixup_ce(logits, y1, gammas=jnp.full((4,), 0.5))
