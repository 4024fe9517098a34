"""Weights-day parity harness.

The three published EERs (BASELINE.md) were produced by the reference's
conf-3 checkpoint scoring the LA19 eval set (``Result.ipynb`` cell 4;
committed rows in ``docs/asvspoof2019_conf-3.txt``).  This module is the
single-command check for the moment real weights/data become available:

    python -m scl_deepfake_audio_detection_tpu.cli \
        --config configs/conf-3-linear.yaml \
        --model_path out/epoch_80.pth \
        --database_path DATA/asvspoof_2019_supcon/ \
        --parity_check /root/reference/docs/asvspoof2019_conf-3.txt

It converts the reference checkpoint (``models/convert.
from_reference_model_checkpoint``), scores the subset of reference-scored
utterances that exist on disk through the SAME code path as ``--eval``
(EvalDataset -> EvalLoader -> engine.score_step), and diffs the bonafide
scores row-by-row against the committed file with a pass/fail tolerance.

The harness itself is proven asset-free by ``tests/test_parity_harness.py``:
a synthetic golden mini-checkpoint drives convert -> score -> compare
end-to-end on CPU and asserts both the pass and the detect-a-mismatch
directions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from scl_deepfake_audio_detection_tpu.train.analysis import load_scores


@dataclass
class ParityReport:
    n_reference: int  # rows in the reference score file
    n_scored: int  # rows we could score (audio present on disk)
    max_abs: float
    mean_abs: float
    n_over_tol: int
    tol: float
    worst: List[str] = field(default_factory=list)  # "utt ours ref diff" rows

    @property
    def ok(self) -> bool:
        return self.n_scored > 0 and self.n_over_tol == 0

    def __str__(self) -> str:
        head = (
            f"parity: {self.n_scored}/{self.n_reference} reference rows scored; "
            f"max|d|={self.max_abs:.6f} mean|d|={self.mean_abs:.6f} "
            f"({self.n_over_tol} rows over tol {self.tol:g}) -> "
            f"{'PASS' if self.ok else 'FAIL'}"
        )
        if self.worst and not self.ok:
            head += "\n  worst rows (utt ours ref diff):\n    " + "\n    ".join(
                self.worst
            )
        return head


def run_parity_check(
    engine,
    params,
    buffers,
    reference_scores: str,
    database_path: str,
    *,
    use_eval_subdir: bool = True,
    padding_type: str = "zero",
    fmt: str = "auto",
    n: int = 200,
    tol: float = 1e-2,
    batch_size: int = 8,
    num_workers: int = 2,
    compute_dtype: str = "float32",
    score_fn=None,
) -> ParityReport:
    """Score up to ``n`` utts from ``reference_scores`` that exist under
    ``database_path`` and diff our bonafide score against the reference's.

    ``score_fn``: optional override ``wav [B,T] -> log_probs [B,2]``; default
    builds the same pre-cast + sharded ``engine.score_step`` closure the CLI
    eval mode uses.  The reference score compared against is column 1 for
    pred-format files (the ``docs/*.txt`` convention: bonafide logit) and
    column 2 (``cm1``) for eval-format files — ``analysis.load_scores``
    handles both.
    """
    from scl_deepfake_audio_detection_tpu.data.datasets import EvalDataset
    from scl_deepfake_audio_detection_tpu.data.loader import EvalLoader
    from scl_deepfake_audio_detection_tpu.models.base import cast_matmul_params

    ref = load_scores(reference_scores, fmt=fmt)
    base = (
        os.path.join(database_path, "eval") if use_eval_subdir else database_path
    )
    present = [u for u in ref if os.path.exists(os.path.join(base, u))]
    subset = present[: max(n, 1)] if n else present
    if not subset:
        return ParityReport(
            n_reference=len(ref), n_scored=0, max_abs=float("nan"),
            mean_abs=float("nan"), n_over_tol=0, tol=tol,
            worst=[f"no scored utterances found under {base}"],
        )

    ds = EvalDataset(
        subset, database_path, padding_type=padding_type,
        use_eval_subdir=use_eval_subdir,
    )
    loader = EvalLoader(ds, batch_size=batch_size, num_workers=num_workers)

    if score_fn is None:
        cast = cast_matmul_params(params, compute_dtype)

        def score_fn(wav):  # the CLI eval-mode closure, verbatim
            wav = engine.place_batch({"wav": wav})["wav"]
            return engine.score_step(cast, buffers, wav)

    ours: Dict[str, float] = {}
    for wav, utt_ids in loader:  # final batch padded up; zip drops pad rows
        lp = np.asarray(score_fn(wav))
        for u, row in zip(utt_ids, lp):
            ours[u] = float(row[1])  # bonafide log-prob = the reference score

    diffs = np.array([ours[u] - ref[u] for u in subset])
    order = np.argsort(-np.abs(diffs))
    worst = [
        f"{subset[i]} {ours[subset[i]]:+.6f} {ref[subset[i]]:+.6f} "
        f"{diffs[i]:+.6f}"
        for i in order[:5]
    ]
    return ParityReport(
        n_reference=len(ref),
        n_scored=len(subset),
        max_abs=float(np.abs(diffs).max()),
        mean_abs=float(np.abs(diffs).mean()),
        n_over_tol=int((np.abs(diffs) > tol).sum()),
        tol=tol,
        worst=worst,
    )
