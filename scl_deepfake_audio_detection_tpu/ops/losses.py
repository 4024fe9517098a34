"""Loss library.

JAX equivalents of everything in the reference's ``model/loss_metrics.py``
(SupCon lives in ``ops/supcon.py``): negative-energy OOD scores, mixup CE,
KLD distillation, and the rank-consistency family.  Python loops in the
reference (pairwise metric accumulation) are replaced with masked vectorized
forms — same values, one kernel.

Also hosts the reference's training-loss quirks that score parity depends on:
``nll_on_log_probs`` reproduces ``CrossEntropyLoss`` applied to already
log-softmaxed outputs (``model/wav2vec2_linear_nll.py:134,162,169`` — a
double-softmax; intentional here, guarded by tests).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over the batch; logits [N, C], labels [N] int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0])


def nll_on_log_probs(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """torch ``CrossEntropyLoss()(log_probs, labels)`` — i.e. a second
    log-softmax over inputs that are already log-probabilities."""
    return cross_entropy(log_probs, labels)


def neg_energy(logits: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    """Negative free energy -T*logsumexp(logits/T) per row
    (reference ``loss_metrics.py:39-56``; Liu et al., NeurIPS 2020)."""
    return -temperature * jax.scipy.special.logsumexp(logits / temperature, axis=1)


def neg_energy_reg_loss(
    energy: jnp.ndarray, margin_in: float, margin_out: float, flag_in: bool
) -> jnp.ndarray:
    """Energy regularizer (reference ``loss_metrics.py:59-79``)."""
    if flag_in:
        return jnp.mean(jax.nn.relu(energy - margin_in) ** 2)
    return jnp.mean(jax.nn.relu(margin_out - energy) ** 2)


def mixup_ce(
    logits: jnp.ndarray,
    y1: jnp.ndarray,
    y2: Optional[jnp.ndarray] = None,
    gammas: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mixup cross-entropy (reference ``loss_metrics.py:216-250``):
    gamma*CE(logits,y1) + (1-gamma)*CE(logits,y2), mean over batch."""
    if (y2 is None) != (gammas is None):
        raise ValueError("mixup_ce needs y2 and gammas together (or neither "
                         "for plain CE)")
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll1 = -jnp.take_along_axis(logp, y1[:, None], axis=1)[:, 0]
    if y2 is None:
        return jnp.mean(nll1)
    nll2 = -jnp.take_along_axis(logp, y2[:, None], axis=1)[:, 0]
    return jnp.mean(gammas * nll1 + (1.0 - gammas) * nll2)


def kld_distill(
    logits_s: jnp.ndarray, logits_t: jnp.ndarray, temp: float = 20.0
) -> jnp.ndarray:
    """Distillation KLD with temperature (reference ``loss_metrics.py:258-279``):
    KL(teacher || student) * T^2, batchmean reduction."""
    logp_s = jax.nn.log_softmax(logits_s / temp, axis=-1)
    logp_t = jax.nn.log_softmax(logits_t / temp, axis=-1)
    kl = jnp.sum(jnp.exp(logp_t) * (logp_t - logp_s), axis=-1)
    batch = logits_s.shape[0]
    return jnp.sum(kl) / batch * temp * temp


def _neg_cosine(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    x1 = x1.reshape(-1)
    x2 = x2.reshape(-1)
    denom = jnp.maximum(jnp.linalg.norm(x1) * jnp.linalg.norm(x2), 1e-8)
    return -jnp.dot(x1, x2) / denom


def _margin_ranking(x1: jnp.ndarray, x2: jnp.ndarray, margin: float = 0.1) -> jnp.ndarray:
    """torch margin_ranking_loss with target=+1: mean(relu(-(x1-x2)+margin))."""
    return jnp.mean(jax.nn.relu(-(x1 - x2) + margin))


def rank_consistency(
    x: jnp.ndarray,
    metric: Optional[Callable] = None,
    anchor: Optional[jnp.ndarray] = None,
    diff_mat: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Anchored rank consistency (reference ``loss_metrics.py:284-363``).

    Compares every strict-lower-triangle difference vector
    ``diff[i,j] = x[j] - x[i]`` (i > j) against an anchor (default
    ``diff[1,0]``) under ``metric`` (default negative cosine), skipping the
    anchor cell itself. Vectorized over the pair axis via vmap + mask.
    """
    if diff_mat is None:
        diff_mat = x[None, :] - x[:, None]  # diff_mat[i, j] = x[j] - x[i]
    bs = diff_mat.shape[0]
    if bs < 3:
        return jnp.asarray(0.0)
    metric = metric or _neg_cosine

    if anchor is None:
        anchor = diff_mat[1, 0]
        skip_r, skip_c = 1, 0
    else:
        skip_r = skip_c = -1

    rows, cols = jnp.tril_indices(bs, k=-1)
    keep = ~((rows == skip_r) & (cols == skip_c))
    vals = jax.vmap(lambda r, c: metric(anchor, diff_mat[r, c]))(rows, cols)
    keep_f = keep.astype(vals.dtype)
    return jnp.sum(vals * keep_f) / jnp.sum(keep_f)


def rank_consistency_v2(
    x: jnp.ndarray, metric: Optional[Callable] = None, diff_mat: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Neighbor-difference rank consistency (reference ``loss_metrics.py:366-438``)."""
    if diff_mat is None:
        diff_mat = x[None, :] - x[:, None]
    bs = diff_mat.shape[0]
    if bs < 3:
        return jnp.asarray(0.0)
    metric = metric or _margin_ranking

    vals = []
    for col in range(bs - 2):
        for row in range(col + 2, bs):
            vals.append(metric(diff_mat[row - 1, col], diff_mat[row, col]))
    for row in range(2, bs):
        for col in range(1, row):
            vals.append(metric(diff_mat[row, col], diff_mat[row, col - 1]))
    return jnp.mean(jnp.stack(vals))


def rank_consistency_v3(x: jnp.ndarray, metric: Optional[Callable] = None) -> jnp.ndarray:
    """All-pairs ranking loss (reference ``loss_metrics.py:441-496``):
    every x[i] should rank above every x[j] for i > j."""
    bs = x.shape[0]
    if bs < 2:
        return jnp.asarray(0.0)
    metric = metric or _margin_ranking
    rows, cols = jnp.tril_indices(bs, k=-1)
    vals = jax.vmap(lambda r, c: metric(x[r], x[c]))(rows, cols)
    return jnp.mean(vals)
