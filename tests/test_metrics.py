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

pytestmark = pytest.mark.smoke  # compile-light fast tier (scripts/check.sh gate)


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


# ---------------------------------------------------------------------------
# min t-DCF (official ASVspoof ranking metric; absent from the reference)
# ---------------------------------------------------------------------------

from scl_deepfake_audio_detection_tpu.train.metrics import (  # noqa: E402

    TDCF_COSTS_ASVSPOOF19,
    asv_error_rates,
    min_tdcf,
    tdcf_curve,
)


def _tdcf_bruteforce(bona, spoof, pfa_asv, pmiss_asv, pfa_spoof, version):
    """Independent O(n^2) t-DCF minimum: literal Kinnunen et al. coefficient
    formulas + direct counting at every DET operating point (valid for the
    distinct-score inputs these tests use)."""
    if version == "legacy":
        c0 = 0.0
        c1 = 0.9405 * (1.0 - 1.0 * pmiss_asv) - 0.0095 * 10.0 * pfa_asv
        c2 = 10.0 * 0.05 * pfa_spoof
    else:  # revised (ASVspoof 2021)
        c0 = 0.9405 * 1.0 * pmiss_asv + 0.0095 * 10.0 * pfa_asv
        c1 = 0.9405 * 1.0 - c0
        c2 = 10.0 * 0.05 * pfa_spoof
    all_scores = np.concatenate([bona, spoof])
    thresholds = np.concatenate([[all_scores.min() - 0.001], np.sort(all_scores)])
    best = np.inf
    for t in thresholds:
        pmiss_cm = float(np.mean(bona <= t))
        pfa_cm = float(np.mean(spoof > t))
        val = (c0 + c1 * pmiss_cm + c2 * pfa_cm) / (c0 + min(c1, c2))
        best = min(best, val)
    return best


@pytest.mark.parametrize("version", ["legacy", "revised"])
def test_min_tdcf_matches_bruteforce(version):
    rng = np.random.default_rng(7)
    # distinct scores so the at-or-below threshold convention is unambiguous
    bona = np.sort(rng.normal(1.0, 1.0, 400))
    spoof = np.sort(rng.normal(-1.0, 1.0, 600)) + 1e-9
    tar_asv = rng.normal(2.0, 1.0, 500)
    non_asv = rng.normal(-2.0, 1.0, 500)
    spoof_asv = rng.normal(0.5, 1.0, 500)

    pfa, pmiss, pmiss_spoof, pfa_spoof = asv_error_rates(tar_asv, non_asv, spoof_asv)
    # (the pfa_spoof == 1 - pmiss_spoof identity is the function's own
    # return expression — the explicit-threshold test pins real values)

    want = _tdcf_bruteforce(bona, spoof, pfa, pmiss, pfa_spoof, version)
    got, thr = min_tdcf(bona, spoof, tar_asv, non_asv, spoof_asv, version=version)
    assert got == pytest.approx(want, abs=1e-12)
    assert 0.0 <= got <= 1.0
    # the returned threshold actually achieves the minimum
    curve, thresholds = tdcf_curve(
        bona, spoof, pfa, pmiss, pfa_spoof, version=version
    )
    assert curve.min() == pytest.approx(got)
    assert thr in thresholds


def test_min_tdcf_perfect_cm():
    """A perfect CM zeroes both CM error terms: legacy t-DCF -> 0 exactly,
    revised -> its constant floor C0/(C0 + min(C1, C2)) > 0."""
    rng = np.random.default_rng(1)
    bona = rng.normal(5.0, 0.1, 100)
    spoof = rng.normal(-5.0, 0.1, 100)
    tar_asv = rng.normal(2.0, 1.0, 300)
    non_asv = rng.normal(-2.0, 1.0, 300)
    spoof_asv = rng.normal(0.0, 1.0, 300)

    legacy, _ = min_tdcf(bona, spoof, tar_asv, non_asv, spoof_asv, version="legacy")
    assert legacy == pytest.approx(0.0, abs=1e-12)

    revised, _ = min_tdcf(bona, spoof, tar_asv, non_asv, spoof_asv, version="revised")
    pfa, pmiss, _, pfa_spoof = asv_error_rates(tar_asv, non_asv, spoof_asv)
    c0 = 0.9405 * pmiss + 0.0095 * 10.0 * pfa
    c1 = 0.9405 - c0
    c2 = 0.5 * pfa_spoof
    assert revised == pytest.approx(c0 / (c0 + min(c1, c2)), abs=1e-12)
    assert revised > 0.0


def test_asv_error_rates_explicit_threshold():
    tar = np.array([1.0, 2.0, -1.0])      # 1 below thr 0 -> Pmiss 1/3
    non = np.array([0.5, -0.5, -1.5, -2.0])  # 1 at/above -> Pfa 1/4
    spoof = np.array([0.5, -0.5])          # 1 rejected -> Pmiss_spoof 1/2
    pfa, pmiss, pmiss_spoof, pfa_spoof = asv_error_rates(tar, non, spoof, threshold=0.0)
    assert (pfa, pmiss, pmiss_spoof, pfa_spoof) == (0.25, 1 / 3, 0.5, 0.5)


def test_tdcf_rejects_bad_version_and_chance_asv():
    bona, spoof = np.array([1.0, 2.0]), np.array([-1.0, -2.0])
    ok_tar, ok_non = np.array([3.0, 4.0]), np.array([-3.0, -4.0])
    spoof_asv = np.array([0.0, 0.1])
    with pytest.raises(ValueError, match="version"):
        min_tdcf(bona, spoof, ok_tar, ok_non, spoof_asv, version="v3")
    # an ASV operating point that misses every target makes C1 <= 0 -> error
    # (threshold pinned: the discrete EER point of a tiny score set lands on
    # an interior operating point where C1 can stay positive)
    with pytest.raises(ValueError, match="coefficients"):
        min_tdcf(bona, spoof, ok_tar, ok_non, spoof_asv, version="legacy",
                 asv_threshold=10.0)
    # and a never-accepted spoof set makes C2 = 0 -> error, not div-by-zero
    with pytest.raises(ValueError, match="coefficients"):
        min_tdcf(bona, spoof, ok_tar, ok_non, np.array([-99.0, -98.0]),
                 version="legacy")
    # NO spoof ASV trials at all -> explicit error, not a silent NaN
    # (np.mean([]) is NaN and NaN passes every <= guard)
    with pytest.raises(ValueError, match="spoof-trial"):
        min_tdcf(bona, spoof, ok_tar, ok_non, np.array([]), version="legacy")


def test_tdcf_cost_override_changes_result():
    rng = np.random.default_rng(3)
    bona = rng.normal(1.0, 1.0, 200)
    spoof = rng.normal(-1.0, 1.0, 200)
    tar_asv, non_asv = rng.normal(2, 1, 200), rng.normal(-2, 1, 200)
    spoof_asv = rng.normal(0.5, 1.0, 200)
    base, _ = min_tdcf(bona, spoof, tar_asv, non_asv, spoof_asv)
    heavy, _ = min_tdcf(bona, spoof, tar_asv, non_asv, spoof_asv,
                        costs={"Cfa_cm": 100.0})
    assert heavy != base
    assert set(TDCF_COSTS_ASVSPOOF19) == {
        "Pspoof", "Ptar", "Pnon", "Cmiss_asv", "Cfa_asv", "Cmiss_cm", "Cfa_cm"
    }


def test_eer_bootstrap_ci_brackets_point_estimate():
    rng = np.random.default_rng(5)
    tar = rng.normal(1.0, 1.0, 400)
    non = rng.normal(-1.0, 1.0, 600)
    from scl_deepfake_audio_detection_tpu.train.metrics import eer_bootstrap_ci

    eer, _ = compute_eer(tar, non)
    lo, hi = eer_bootstrap_ci(tar, non, n_boot=200, seed=1)
    assert 0.0 <= lo <= eer <= hi <= 1.0
    assert hi - lo < 0.15  # sane width at n=1000 trials
    # deterministic given the seed
    assert (lo, hi) == eer_bootstrap_ci(tar, non, n_boot=200, seed=1)
    assert (lo, hi) != eer_bootstrap_ci(tar, non, n_boot=200, seed=2)
    with pytest.raises(ValueError, match="n_boot"):
        eer_bootstrap_ci(tar, non, n_boot=1)


def test_eer_diff_bootstrap_paired():
    from scl_deepfake_audio_detection_tpu.train.metrics import (
        eer_diff_bootstrap,
    )

    rng = np.random.default_rng(3)
    # system A and B score the SAME trials; B is strictly better
    base_t, base_n = rng.normal(1.0, 1.0, 500), rng.normal(-1.0, 1.0, 700)
    ta, na = base_t + rng.normal(0, 0.8, 500), base_n + rng.normal(0, 0.8, 700)
    tb, nb_ = base_t * 1.5, base_n * 1.5  # wider margin, same trials
    d, lo, hi, p = eer_diff_bootstrap(ta, na, tb, nb_, n_boot=200, seed=1)
    assert d > 0 and lo > 0  # A worse, significantly
    assert p < 0.05
    # identical systems: delta 0, CI straddles 0, p high
    d0, lo0, hi0, p0 = eer_diff_bootstrap(ta, na, ta, na, n_boot=200, seed=1)
    assert d0 == 0.0 and lo0 <= 0.0 <= hi0 and p0 > 0.5
    # deterministic given the seed
    assert (d, lo, hi, p) == eer_diff_bootstrap(ta, na, tb, nb_, n_boot=200, seed=1)
    with pytest.raises(ValueError, match="aligned"):
        eer_diff_bootstrap(ta, na, tb[:-1], nb_)
