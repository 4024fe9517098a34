"""EER / DET metrics tests, anchored to the reference's published numbers.

The reference has no test suite; its de-facto regression fixtures are the
committed score files in ``docs/`` whose EERs appear in ``Result.ipynb`` cell
outputs (2.8837% LA19, 4.5098% ITW conf-3).  We reproduce those exactly.
"""

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.train.analysis import load_scores, score_report
from scl_deepfake_audio_detection_tpu.train.metrics import (
    compute_eer,
    confusion_counts,
    det_curve,
)

from conftest import REFERENCE, requires_reference


def test_eer_perfect_separation():
    eer, thr = compute_eer(np.array([1.0, 2.0, 3.0]), np.array([-3.0, -2.0, -1.0]))
    assert eer == 0.0
    assert -1.0 <= thr < 1.0


def test_eer_total_overlap():
    rng = np.random.default_rng(0)
    s = rng.normal(size=4000)
    eer, _ = compute_eer(s[:2000], s[2000:])
    assert abs(eer - 0.5) < 0.05


def test_eer_symmetry_under_score_shift():
    rng = np.random.default_rng(1)
    tar = rng.normal(1.0, 1.0, 500)
    non = rng.normal(-1.0, 1.0, 500)
    e1, t1 = compute_eer(tar, non)
    e2, t2 = compute_eer(tar + 10.0, non + 10.0)
    assert e1 == pytest.approx(e2)
    assert t2 == pytest.approx(t1 + 10.0)


def test_det_curve_monotone():
    rng = np.random.default_rng(2)
    frr, far, thr = det_curve(rng.normal(1, 1, 300), rng.normal(-1, 1, 300))
    assert np.all(np.diff(frr) >= 0)
    assert np.all(np.diff(far) <= 0)
    assert len(frr) == len(far) == len(thr) == 601


def test_confusion_counts():
    tar = np.array([0.5, 1.5, -0.5])
    non = np.array([-1.0, 0.2])
    tp, tn, fp, fn = confusion_counts(tar, non, 0.0)
    assert (tp, tn, fp, fn) == (2, 1, 1, 1)


@requires_reference
def test_eer_asvspoof2019_conf3_matches_published():
    """docs/asvspoof2019_conf-3.txt -> EER 2.8837% (Result.ipynb cell 4)."""
    rep = score_report(
        f"{REFERENCE}/docs/asvspoof2019_conf-3.txt",
        f"{REFERENCE}/DATA/asvspoof_2019_supcon/protocol.txt",
        fmt="pred",
    )
    assert rep.eer * 100 == pytest.approx(2.8837, abs=1e-3)
    assert rep.threshold == pytest.approx(-0.0017, abs=1e-3)


@requires_reference
@pytest.mark.parametrize(
    "fname,expected",
    [("inwild_conf-1.txt", 9.7769), ("inwild_conf-2.txt", 5.2394), ("inwild_conf-3.txt", 4.5098)],
)
def test_eer_in_the_wild_matches_published(fname, expected):
    rep = score_report(
        f"{REFERENCE}/docs/{fname}",
        f"{REFERENCE}/DATA/in_the_wild/protocol.txt",
    )
    assert rep.eer * 100 == pytest.approx(expected, abs=1e-3)


@requires_reference
def test_load_scores_auto_detects_format():
    scores = load_scores(f"{REFERENCE}/docs/asvspoof2019_conf-3.txt", fmt="auto")
    assert scores["LA_E_1000147.flac"] == pytest.approx(-0.08371932059526443)
