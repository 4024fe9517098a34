"""Detection metrics (EER / DET curve / confusion counts).

In-framework port of the capability the reference keeps offline in
``evaluate_metrics.py:3-41`` + ``Result.ipynb``: the classic sort-based DET
curve with EER taken at the operating point minimizing |FRR - FAR|.  Pure
numpy, deliberately kept off-device — score vectors are tiny and this runs
once per eval.

The numerical convention matches the reference exactly (stable mergesort,
threshold vector prepended with ``min_score - 0.001``) so EERs computed here
are bit-identical to the reference pipeline given the same scores.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def det_curve(
    target_scores: np.ndarray, nontarget_scores: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (frr, far, thresholds) over all score thresholds.

    ``target_scores`` are bonafide trial scores, ``nontarget_scores`` spoof.
    Same operating points as reference ``evaluate_metrics.py:3-21``.
    """
    target_scores = np.asarray(target_scores, dtype=np.float64).ravel()
    nontarget_scores = np.asarray(nontarget_scores, dtype=np.float64).ravel()
    n_tar, n_non = target_scores.size, nontarget_scores.size
    if n_tar == 0 or n_non == 0:
        raise ValueError("both target and nontarget scores must be non-empty")

    scores = np.concatenate([target_scores, nontarget_scores])
    is_target = np.concatenate([np.ones(n_tar), np.zeros(n_non)])

    # stable sort so ties resolve identically to the reference
    order = np.argsort(scores, kind="mergesort")
    is_target = is_target[order]

    tar_below = np.cumsum(is_target)  # targets at or below each threshold
    non_above = n_non - (np.arange(1, n_tar + n_non + 1) - tar_below)

    frr = np.concatenate([[0.0], tar_below / n_tar])
    far = np.concatenate([[1.0], non_above / n_non])
    thresholds = np.concatenate([[scores[order[0]] - 0.001], scores[order]])
    return frr, far, thresholds


def compute_eer(
    target_scores: np.ndarray, nontarget_scores: np.ndarray
) -> Tuple[float, float]:
    """Equal error rate and its threshold (reference ``evaluate_metrics.py:35-41``)."""
    frr, far, thresholds = det_curve(target_scores, nontarget_scores)
    idx = int(np.argmin(np.abs(frr - far)))
    eer = float((frr[idx] + far[idx]) / 2.0)
    return eer, float(thresholds[idx])


def confusion_counts(
    target_scores: np.ndarray, nontarget_scores: np.ndarray, threshold: float
) -> Tuple[int, int, int, int]:
    """(tp, tn, fp, fn) at a threshold (reference ``evaluate_metrics.py:23-33``).

    A trial counts as positive (bonafide) when its score is strictly above
    the threshold.
    """
    target_scores = np.asarray(target_scores)
    nontarget_scores = np.asarray(nontarget_scores)
    tp = int(np.sum(target_scores > threshold))
    tn = int(np.sum(nontarget_scores <= threshold))
    fn = int(np.sum(target_scores <= threshold))
    fp = int(np.sum(nontarget_scores > threshold))
    return tp, tn, fp, fn


def accuracy_from_log_probs(log_probs: np.ndarray, labels: np.ndarray) -> float:
    """Fraction of argmax predictions matching labels (reference ``main.py:67``)."""
    pred = np.argmax(np.asarray(log_probs), axis=-1)
    labels = np.asarray(labels).reshape(-1)
    return float((pred == labels).mean())
