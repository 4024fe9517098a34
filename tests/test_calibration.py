"""Score calibration: affine LLR fit, Cllr/minCllr (PAV), actual DCF."""

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.train.calibration import (
    act_dcf,
    apply_calibration,
    cllr,
    logistic_calibration,
    min_cllr,
    pav,
)


def _synthetic_llrs(rng, m=2.0, n=4000):
    """Self-consistent LLRs: llr|target ~ N(m, 2m), llr|nontarget ~ N(-m, 2m)
    are exactly the LLRs of their own generative model."""
    sd = np.sqrt(2.0 * m)
    return rng.normal(m, sd, n), rng.normal(-m, sd, n)


def test_logistic_calibration_recovers_affine_map(rng):
    """Scores generated as llr/a - b/a must calibrate back to (a, b)."""
    tar_llr, non_llr = _synthetic_llrs(rng, m=2.0, n=8000)
    a_true, b_true = 2.5, -1.0
    tar_s = (tar_llr - b_true) / a_true
    non_s = (non_llr - b_true) / a_true
    a, b = logistic_calibration(tar_s, non_s)
    assert a == pytest.approx(a_true, rel=0.1)
    assert b == pytest.approx(b_true, abs=0.25)
    # calibration reduces Cllr of the raw (mis-scaled) scores to ~minCllr
    raw = cllr(tar_s, non_s)
    cal = cllr(apply_calibration(tar_s, a, b), apply_calibration(non_s, a, b))
    floor = min_cllr(tar_s, non_s)
    assert cal < raw
    assert cal == pytest.approx(floor, abs=0.02)


def test_cllr_reference_points(rng):
    # the useless system (llr == 0 everywhere) costs exactly 1 bit
    z = np.zeros(100)
    assert cllr(z, z) == pytest.approx(1.0, abs=1e-12)
    # perfect, confident LLRs cost ~0
    assert cllr(np.full(50, 40.0), np.full(50, -40.0)) == pytest.approx(
        0.0, abs=1e-9)
    # well-calibrated synthetic LLRs: Cllr ~= minCllr
    tar, non = _synthetic_llrs(rng, m=2.0, n=6000)
    assert cllr(tar, non) == pytest.approx(min_cllr(tar, non), abs=0.02)


def test_min_cllr_monotone_invariant(rng):
    tar = rng.normal(1.0, 1.0, 500)
    non = rng.normal(-1.0, 1.0, 700)
    base = min_cllr(tar, non)
    assert base <= cllr(tar, non) + 1e-9
    assert min_cllr(3.0 * tar + 7.0, 3.0 * non + 7.0) == pytest.approx(
        base, abs=1e-9)
    assert min_cllr(np.exp(tar / 2), np.exp(non / 2)) == pytest.approx(
        base, abs=1e-9)
    assert 0.0 <= base <= 1.0 + 1e-9


def test_pav_small_cases():
    np.testing.assert_allclose(pav(np.array([3.0, 1.0, 2.0])), [2.0, 2.0, 2.0])
    np.testing.assert_allclose(pav(np.array([1.0, 3.0, 2.0])), [1.0, 2.5, 2.5])
    out = pav(np.array([5.0, 4.0, 3.0, 2.0, 1.0]))
    np.testing.assert_allclose(out, np.full(5, 3.0))
    # weighted: heavier later block pulls the pool toward it
    w = np.array([1.0, 3.0])
    np.testing.assert_allclose(pav(np.array([2.0, 1.0]), w), [1.25, 1.25])
    # already monotone input is untouched
    y = np.array([1.0, 1.5, 2.0])
    np.testing.assert_allclose(pav(y), y)


def test_act_dcf_calibration_gap(rng):
    tar, non = _synthetic_llrs(rng, m=3.0, n=6000)
    act, mn = act_dcf(tar, non, p_target=0.05)
    assert mn <= act <= mn + 0.05  # calibrated: Bayes threshold ~ optimal
    # grossly mis-scaled scores: actual blows up, minimum is unchanged
    act_bad, mn_bad = act_dcf(tar * 10, non * 10, p_target=0.05)
    assert mn_bad == pytest.approx(mn, abs=1e-9)
    assert act_bad > act
    with pytest.raises(ValueError, match="p_target"):
        act_dcf(tar, non, p_target=1.5)


def test_cllr_cli_flag(tmp_path, capsys):
    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(2)
    proto, scores = tmp_path / "p.txt", tmp_path / "s.txt"
    plines, slines = [], []
    for i in range(40):
        label = "bonafide" if i % 2 == 0 else "spoof"
        plines.append(f"spk u{i} - none {label}")
        s = (1.0 if label == "bonafide" else -1.0) + rng.normal() * 0.7
        slines.append(f"u{i} {-abs(s):.4f} {s:.4f}")
    proto.write_text("\n".join(plines) + "\n")
    scores.write_text("\n".join(slines) + "\n")
    rc = main(["--analyze", str(scores), "--protocol", str(proto),
               "--score_format", "eval", "--cllr"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Cllr:" in out and "minCllr:" in out


def test_fit_calibration_cli(tmp_path, capsys):
    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(4)
    proto, scores = tmp_path / "p.txt", tmp_path / "s.txt"
    plines, slines = [], []
    for i in range(80):
        label = "bonafide" if i % 2 == 0 else "spoof"
        plines.append(f"spk u{i} - none {label}")
        s = (1.5 if label == "bonafide" else -1.5) + rng.normal()
        slines.append(f"u{i} {-abs(s):.4f} {s:.4f}")
    proto.write_text("\n".join(plines) + "\n")
    scores.write_text("\n".join(slines) + "\n")
    rc = main(["--fit_calibration", str(scores), "--protocol", str(proto),
               "--score_format", "eval"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "a=" in out and "b=" in out and "Cllr" in out
    # the printed Cllr must improve (or match) after calibration
    import re

    m = re.search(r"Cllr (\d+\.\d+) -> (\d+\.\d+)", out)
    assert float(m.group(2)) <= float(m.group(1)) + 1e-6


def test_logistic_fusion_beats_single_systems(rng):
    """Two noisy views of the same underlying LLR: fusion must outperform
    each system alone (lower Cllr, lower or equal EER)."""
    from scl_deepfake_audio_detection_tpu.train.calibration import (
        fuse_scores,
        logistic_fusion,
    )
    from scl_deepfake_audio_detection_tpu.train.metrics import compute_eer

    tar_llr, non_llr = _synthetic_llrs(rng, m=1.5, n=5000)
    # system k observes llr/ak - noise (independent noise per system)
    t1, n1 = tar_llr + rng.normal(0, 2.0, tar_llr.size), non_llr + rng.normal(0, 2.0, non_llr.size)
    t2, n2 = tar_llr + rng.normal(0, 2.0, tar_llr.size), non_llr + rng.normal(0, 2.0, non_llr.size)
    w, b = logistic_fusion(np.stack([t1, t2], 1), np.stack([n1, n2], 1))
    ft = fuse_scores(np.stack([t1, t2], 1), w, b)
    fn = fuse_scores(np.stack([n1, n2], 1), w, b)
    eer_f, _ = compute_eer(ft, fn)
    eer_1, _ = compute_eer(t1, n1)
    eer_2, _ = compute_eer(t2, n2)
    assert eer_f < min(eer_1, eer_2)
    assert cllr(ft, fn) < min(cllr(t1, n1), cllr(t2, n2)) + 1e-6
    with pytest.raises(ValueError, match="matching K"):
        logistic_fusion(np.zeros((4, 2)), np.zeros((4, 3)))


def test_fusion_cli_end_to_end(tmp_path, capsys):
    """--fuse fits on dev, --fuse_eval/--fuse_out writes fused eval scores
    that --analyze then reads (pred format)."""
    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(9)

    def make_set(prefix, n):
        plines, s1, s2 = [], [], []
        for i in range(n):
            label = "bonafide" if i % 2 == 0 else "spoof"
            plines.append(f"spk {prefix}{i} - none {label}")
            base = 1.0 if label == "bonafide" else -1.0
            s1.append(f"{prefix}{i} 0.0 {base + rng.normal()*0.8:.4f}")
            s2.append(f"{prefix}{i} 0.0 {base + rng.normal()*0.8:.4f}")
        return plines, s1, s2

    dp, d1, d2 = make_set("d", 80)
    ep, e1, e2 = make_set("e", 40)
    (tmp_path / "dev_proto.txt").write_text("\n".join(dp) + "\n")
    (tmp_path / "dev1.txt").write_text("\n".join(d1) + "\n")
    (tmp_path / "dev2.txt").write_text("\n".join(d2) + "\n")
    (tmp_path / "eval_proto.txt").write_text("\n".join(ep) + "\n")
    (tmp_path / "eval1.txt").write_text("\n".join(e1) + "\n")
    (tmp_path / "eval2.txt").write_text("\n".join(e2) + "\n")

    rc = main(["--fuse", f"{tmp_path}/dev1.txt,{tmp_path}/dev2.txt",
               "--protocol", str(tmp_path / "dev_proto.txt"),
               "--score_format", "eval",
               "--fuse_eval", f"{tmp_path}/eval1.txt,{tmp_path}/eval2.txt",
               "--fuse_out", str(tmp_path / "fused.txt")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "fused (" in out and "weights=" in out
    # fused output is analyzable
    rc = main(["--analyze", str(tmp_path / "fused.txt"),
               "--protocol", str(tmp_path / "eval_proto.txt"),
               "--score_format", "pred"])
    assert rc == 0
