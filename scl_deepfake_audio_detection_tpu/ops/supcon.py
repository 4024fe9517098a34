"""Supervised contrastive loss (SupCon), the core training objective.

Khosla-style SupCon generalized with a pluggable similarity metric, as in the
reference's ``supcon_loss`` (``model/loss_metrics.py:87-209``, based on
HobbitLong/SupContrast).  The default metric is the sequence similarity the
SCL models use (``model/wav2vec2_linear_nll.py:116-117``): per-frame dot
products averaged over time.

Numerics quirks of the reference are reproduced exactly (they shape the
trained optimum, so score parity depends on them):
- the LogSumExp max is taken over ``logits * self_mask`` (the diagonal is
  zeroed *before* the max, not excluded);
- the exponent is ``exp((logits - max) * self_mask) * self_mask``;
- the positive mask tiles the label mask ``(anchor_count, n_views)`` and
  removes the diagonal.

Everything is one fused einsum + masked reductions — no gathers, static
shapes, runs fully on device under jit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Similarity = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def seq_similarity(a: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Mean-over-time frame similarity: [A, T, D] x [C, T, D] -> [A, C].

    Equals the reference's ``torch.bmm(m1.permute(1,0,2),
    m2.permute(1,2,0)).mean(0)`` without the permutes or the T-sized batch of
    small matmuls — a single contraction the MXU tiles natively.
    """
    s = jnp.einsum(
        "atd,ctd->ac",
        a.astype(jnp.float32),
        c.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return s / a.shape[1]


def flat_similarity(a: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Plain dot-product similarity on flat feature vectors [N, D]."""
    return jnp.einsum(
        "ad,cd->ac",
        a.astype(jnp.float32),
        c.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )


def supcon_loss(
    feat: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    sim_metric: Optional[Similarity] = seq_similarity,
    temperature: float = 0.07,
    contra_mode: str = "all",
    length_norm: bool = False,
) -> jnp.ndarray:
    """SupCon loss over multi-view features.

    feat: [bs, n_views, ...] — trailing dims are fed to ``sim_metric`` (or
        flattened for the default dot product when ``sim_metric`` is None).
    labels: [bs] int — same-label pairs are positives. Mutually exclusive
        with ``mask`` [bs, bs].
    contra_mode: 'all' (every view anchors) or 'one' (first view anchors).
    """
    if labels is not None and mask is not None:
        raise ValueError("cannot define both labels and mask")
    if contra_mode not in ("all", "one"):
        raise ValueError(f"unknown contra_mode: {contra_mode!r}")

    if length_norm:
        feat = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-12)

    bs, nv = feat.shape[0], feat.shape[1]
    if mask is None and labels is None:
        mask = jnp.eye(bs, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1)
        mask = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    # view-major concat: [nv * bs, ...] (view 0 of every item first)
    contrast = jnp.concatenate([feat[:, v] for v in range(nv)], axis=0)
    if contra_mode == "one":
        anchor, anchor_count = feat[:, 0], 1
    else:
        anchor, anchor_count = contrast, nv

    if sim_metric is None:
        logits = flat_similarity(
            anchor.reshape(anchor.shape[0], -1), contrast.reshape(contrast.shape[0], -1)
        )
    else:
        logits = sim_metric(anchor, contrast)
    logits = logits / temperature

    n_anchor = bs * anchor_count
    n_contrast = bs * nv
    # self-similarity removed on the leading diagonal
    row = jnp.arange(n_anchor)[:, None]
    col = jnp.arange(n_contrast)[None, :]
    self_mask = (row != col).astype(jnp.float32)
    pos_mask = jnp.tile(mask, (anchor_count, nv)) * self_mask

    # reference-faithful LogSumExp stabilization (see module docstring)
    logits_max = jax.lax.stop_gradient(
        jnp.max(logits * self_mask, axis=1, keepdims=True)
    )
    shifted = logits - logits_max
    exp_logits = jnp.exp(shifted * self_mask) * self_mask
    log_prob = shifted - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))

    # an anchor with ZERO positives (only member of its class in the batch)
    # is 0/0 = NaN in the torch reference and poisons the whole loss; such
    # rows contribute 0 here instead.  SCL view batches always carry
    # positives, so this never changes a parity value — it only turns a
    # silent training collapse on degenerate batches into a well-defined 0.
    n_pos = jnp.sum(pos_mask, axis=1)
    mean_log_prob_pos = jnp.where(
        n_pos > 0, jnp.sum(pos_mask * log_prob, axis=1) / jnp.maximum(n_pos, 1.0), 0.0
    )
    return -jnp.mean(mean_log_prob_pos.reshape(anchor_count, bs))
