"""Online stats, significance tests, per-attack EER breakdown, config pack."""

import glob

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.utils.stats import (
    OnlineStats,
    bonferroni,
    holm,
    paired_t_pvalue,
)

from tests.conftest import requires_reference


def test_online_stats_matches_numpy(rng):
    data = rng.normal(size=(1000, 5)) * 3 + 1
    st = OnlineStats(5, track_cov=True)
    for chunk in np.array_split(data, 7):  # uneven batch sizes
        st.update(chunk)
    np.testing.assert_allclose(st.mean, data.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(st.var, data.var(axis=0, ddof=1), atol=1e-8)
    np.testing.assert_allclose(st.cov, np.cov(data.T), atol=1e-8)
    # state round trip
    st2 = OnlineStats.from_state_dict(st.state_dict())
    np.testing.assert_allclose(st2.std, st.std)


def test_paired_t_matches_scipy(rng):
    scipy_stats = pytest.importorskip("scipy.stats")
    a = rng.normal(size=50)
    b = a + 0.3 + 0.1 * rng.normal(size=50)
    want = scipy_stats.ttest_rel(a, b).pvalue
    got = paired_t_pvalue(a, b)
    assert got == pytest.approx(want, rel=1e-6)


def test_bonferroni_and_holm():
    ps = [0.001, 0.01, 0.03, 0.2]
    assert bonferroni(ps, alpha=0.05) == [True, True, False, False]
    # Holm is uniformly at least as powerful
    h = holm(ps, alpha=0.05)
    b = bonferroni(ps, alpha=0.05)
    assert all(hb or not bb for hb, bb in zip(h, b))
    assert h == [True, True, False, False]


@requires_reference
def test_per_attack_breakdown_on_reference_scores():
    from scl_deepfake_audio_detection_tpu.train.analysis import score_report

    rep = score_report(
        "/root/reference/docs/asvspoof2019_conf-3.txt",
        "/root/reference/DATA/asvspoof_2019_supcon/protocol.txt",
        per_attack=True,
    )
    assert rep.eer * 100 == pytest.approx(2.8837, abs=1e-3)
    assert rep.per_attack is not None and len(rep.per_attack) >= 10
    # LA19 eval attacks are A07..A19; every per-attack EER is a valid rate
    for atk, (eer, n) in rep.per_attack.items():
        assert 0.0 <= eer <= 1.0 and n > 0
    assert "A17" in rep.per_attack  # the canonical hardest LA19 attack
    assert "per-attack" in str(rep)


def test_all_shipped_configs_resolve():
    from scl_deepfake_audio_detection_tpu.utils.config import load_config
    from scl_deepfake_audio_detection_tpu.utils.registry import DATASETS, MODELS

    paths = sorted(glob.glob("configs/*.yaml"))
    assert len(paths) >= 7
    for p in paths:
        cfg = load_config(p)
        assert MODELS.get(cfg.model.name)
        assert DATASETS.get(cfg.data.name)


@requires_reference
def test_score_distribution_plot(tmp_path):
    from scl_deepfake_audio_detection_tpu.train.analysis import (
        matched_scores,
        plot_score_distributions,
    )

    tar, non = matched_scores(
        "/root/reference/docs/inwild_conf-3.txt",
        "/root/reference/DATA/in_the_wild/protocol.txt",
    )
    assert len(tar) > 1000 and len(non) > 1000
    out = plot_score_distributions(tar, non, str(tmp_path / "dist.png"),
                                   threshold=-2.0041)
    import os

    assert os.path.getsize(out) > 10_000  # a real rendered figure


def test_analyze_accepts_score_shard_glob(tmp_path):
    """--multihost eval writes <out>.part<k> per host; --analyze with a glob
    merges them before reporting."""
    from scl_deepfake_audio_detection_tpu.cli import main

    proto = tmp_path / "protocol.txt"
    lines, scores = [], []
    rng = np.random.default_rng(0)
    for i in range(20):
        label = "bonafide" if i % 2 == 0 else "spoof"
        lines.append(f"spk u{i} - none {label}")
        s = (1.0 if label == "bonafide" else -1.0) + rng.normal() * 0.1
        scores.append(f"u{i} {-abs(s):.4f} {s:.4f}")
    proto.write_text("\n".join(lines) + "\n")
    # shard the score lines over two "hosts"
    (tmp_path / "scores.txt.part0").write_text("\n".join(scores[0::2]) + "\n")
    (tmp_path / "scores.txt.part1").write_text("\n".join(scores[1::2]) + "\n")

    rc = main(["--analyze", str(tmp_path / "scores.txt.part*"),
               "--protocol", str(proto), "--score_format", "eval"])
    assert rc == 0


def test_tdcf_report_end_to_end(tmp_path, capsys):
    """--analyze --asv_scores prints a min t-DCF line for both cost models,
    and the number matches metrics.min_tdcf on the same parsed arrays."""
    from scl_deepfake_audio_detection_tpu.cli import main
    from scl_deepfake_audio_detection_tpu.train.analysis import (
        load_asv_scores,
        matched_scores,
    )
    from scl_deepfake_audio_detection_tpu.train.metrics import min_tdcf

    rng = np.random.default_rng(11)
    proto, scores, asv = (tmp_path / n for n in
                          ("protocol.txt", "scores.txt", "asv.txt"))
    plines, slines = [], []
    for i in range(60):
        if i % 2 == 0:
            label, atk, mu = "bonafide", "-", 1.0
        elif i % 4 == 1:
            label, atk, mu = "spoof", "A01", -3.0   # easy attack
        else:
            label, atk, mu = "spoof", "A02", 0.8    # hard: overlaps bonafide
        plines.append(f"spk u{i} - {atk} {label}")
        s = mu + rng.normal() * 0.5
        slines.append(f"u{i} {-abs(s):.4f} {s:.4f}")
    proto.write_text("\n".join(plines) + "\n")
    scores.write_text("\n".join(slines) + "\n")
    alines = [f"a{i:03d} target {rng.normal(2.0):.4f}" for i in range(50)]
    alines += [f"a{i:03d} nontarget {rng.normal(-2.0):.4f}" for i in range(50)]
    alines += [f"a{i:03d} spoof {rng.normal(0.5):.4f}" for i in range(50)]
    asv.write_text("\n".join(alines) + "\n")

    for version in ("legacy", "revised"):
        rc = main(["--analyze", str(scores), "--protocol", str(proto),
                   "--score_format", "eval", "--asv_scores", str(asv),
                   "--tdcf_version", version, "--per_attack"])
        assert rc == 0
        out = capsys.readouterr().out
        assert f"min t-DCF ({version}):" in out
        assert "per-attack min t-DCF" in out
        atk_vals = {}
        for l in out.splitlines():
            if l.startswith("  ") and "(n=" in l and "%" not in l:
                name, rest = l.strip().split(":")
                atk_vals[name] = float(rest.split("(")[0])
        assert set(atk_vals) == {"A01", "A02"}
        # discriminating pins: the hard overlapping attack must cost far
        # more than the easy one, and the worst attack must be at least the
        # pooled value (pooled mixes easy+hard spoofs)
        assert atk_vals["A02"] > 5 * max(atk_vals["A01"], 1e-4)
        pooled = float(next(l for l in out.splitlines()
                            if l.startswith(f"min t-DCF ({version})"))
                       .split(":")[1].split("(")[0])
        assert max(atk_vals.values()) >= pooled - 1e-9
        assert all(0.0 <= v <= 1.0 for v in atk_vals.values())

        bona, spoof = matched_scores(str(scores), str(proto), fmt="eval")
        tar_a, non_a, spoof_a = load_asv_scores(str(asv))
        want, _ = min_tdcf(bona, spoof, tar_a, non_a, spoof_a, version=version)
        line = next(l for l in out.splitlines() if "min t-DCF" in l)
        assert float(line.split(":")[1].split("(")[0]) == pytest.approx(
            want, abs=5e-5)


def test_load_asv_scores_rejects_empty(tmp_path):
    bad = tmp_path / "asv.txt"
    bad.write_text("utt spoof 0.5\nnot-a-trial\n")
    from scl_deepfake_audio_detection_tpu.train.analysis import load_asv_scores

    with pytest.raises(ValueError, match="target/nontarget"):
        load_asv_scores(str(bad))


def test_analyze_json_and_bootstrap_ci(tmp_path, capsys):
    """--json emits one machine-readable object; --bootstrap_ci adds a CI
    that brackets the point EER."""
    import json

    from scl_deepfake_audio_detection_tpu.cli import main

    proto, scores = tmp_path / "p.txt", tmp_path / "s.txt"
    rng = np.random.default_rng(5)
    plines, slines = [], []
    for i in range(60):
        label = "bonafide" if i % 2 == 0 else "spoof"
        plines.append(f"spk u{i} - none {label}")
        s = (1.0 if label == "bonafide" else -1.0) + rng.normal() * 0.8
        slines.append(f"u{i} {-abs(s):.4f} {s:.4f}")
    proto.write_text("\n".join(plines) + "\n")
    scores.write_text("\n".join(slines) + "\n")

    rc = main(["--analyze", str(scores), "--protocol", str(proto),
               "--score_format", "eval", "--json", "--bootstrap_ci", "100",
               "--per_attack"])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    rep = json.loads(out)  # exactly one JSON object, nothing else printed
    lo, hi = rep["eer_ci95"]
    assert lo <= rep["eer"] <= hi
    assert rep["confusion"]["tp"] + rep["confusion"]["fn"] == rep["n_bonafide"]
    assert "per_attack" in rep


def test_det_curve_plot(tmp_path):
    from scl_deepfake_audio_detection_tpu.train.analysis import plot_det_curve

    rng = np.random.default_rng(6)
    tar, non = rng.normal(1, 1, 400), rng.normal(-1, 1, 600)
    out = plot_det_curve(tar, non, str(tmp_path / "det.png"))
    import os

    assert os.path.getsize(out) > 10_000  # a real rendered figure
    # the score data must actually drive the figure: rendering a much worse
    # system (overlapping classes) must change the output bytes, and the
    # same inputs must render identically (deterministic Agg backend)
    same = plot_det_curve(tar, non, str(tmp_path / "det_same.png"))
    worse = plot_det_curve(rng.normal(0.1, 1, 400), rng.normal(0, 1, 600),
                           str(tmp_path / "det_worse.png"))
    read = lambda f: open(f, "rb").read()
    assert read(out) == read(same)
    assert read(out) != read(worse)


def test_analyze_json_is_one_object_with_all_extras(tmp_path, capsys):
    """--json with --cllr/--asv_scores/--plot_det emits exactly ONE JSON
    object carrying every requested extra (no loose text lines)."""
    import json

    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(13)
    proto, scores, asv = (tmp_path / n for n in ("p.txt", "s.txt", "a.txt"))
    plines, slines = [], []
    for i in range(40):
        label = "bonafide" if i % 2 == 0 else "spoof"
        plines.append(f"spk u{i} - none {label}")
        s = (1.0 if label == "bonafide" else -1.0) + rng.normal() * 0.6
        slines.append(f"u{i} {-abs(s):.4f} {s:.4f}")
    proto.write_text("\n".join(plines) + "\n")
    scores.write_text("\n".join(slines) + "\n")
    alines = [f"a{i} target {rng.normal(2.0):.4f}" for i in range(40)]
    alines += [f"a{i} nontarget {rng.normal(-2.0):.4f}" for i in range(40)]
    alines += [f"a{i} spoof {rng.normal(0.5):.4f}" for i in range(40)]
    asv.write_text("\n".join(alines) + "\n")

    rc = main(["--analyze", str(scores), "--protocol", str(proto),
               "--score_format", "eval", "--json", "--cllr",
               "--asv_scores", str(asv),
               "--plot_det", str(tmp_path / "det.png")])
    assert rc == 0
    out = capsys.readouterr().out.strip()
    obj = json.loads(out)  # a single object, nothing else on stdout
    for key in ("eer", "cllr", "min_cllr", "min_tdcf", "det_plot"):
        assert key in obj, key
    assert obj["min_tdcf"]["version"] == "legacy"


def test_compare_cli_paired_bootstrap(tmp_path, capsys):
    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(21)
    proto = tmp_path / "p.txt"
    plines, a_lines, b_lines = [], [], []
    for i in range(120):
        label = "bonafide" if i % 2 == 0 else "spoof"
        plines.append(f"spk u{i} - none {label}")
        base = 1.0 if label == "bonafide" else -1.0
        noisy = base + rng.normal() * 1.2       # weak system
        clean = base * 2 + rng.normal() * 0.4   # strong system, same trials
        a_lines.append(f"u{i} 0.0 {noisy:.4f}")
        b_lines.append(f"u{i} 0.0 {clean:.4f}")
    proto.write_text("\n".join(plines) + "\n")
    (tmp_path / "a.txt").write_text("\n".join(a_lines) + "\n")
    (tmp_path / "b.txt").write_text("\n".join(b_lines) + "\n")
    rc = main(["--compare", f"{tmp_path}/a.txt,{tmp_path}/b.txt",
               "--protocol", str(proto), "--score_format", "eval",
               "--bootstrap_ci", "200"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "paired EER difference" in out and "B better" in out
