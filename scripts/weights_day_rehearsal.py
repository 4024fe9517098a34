#!/usr/bin/env python
"""End-to-end dress rehearsal of scripts/weights_day.sh on synthetic assets.

Weights day (real pretrained + trained checkpoints landing on a networked
machine) must be ONE command that works the first time.  This harness proves
the full chain mechanically, asset-free: it builds a golden mini-setup — a
tiny reference-layout ``epoch_N.pth`` (the exact key scheme of the published
``conf-3-linear.pth``, tests/test_parity_harness.py), a mini eval database
(wavs + scp/test.lst + SCL-format protocol), and a "committed score file"
produced by the same eval path — then runs the UNMODIFIED weights_day.sh
against them and asserts:

  1. PASS: row parity + full-eval EER both reproduce -> exit 0;
  2. FAIL is detectable: shifting EXPECTED_EER by 5 points flips the exit
     code (the EER stage is live, not vacuous).

CI entry: tests/test_weights_day_rehearsal.py runs this file.  Everything
is forced onto the CPU backend via SCL_PLATFORM (the subprocess CLI knob).
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_golden(root: str):
    """Mini eval db + golden reference-layout .pth + tiny config yaml."""
    import torch

    from test_parity_harness import _reference_pth_dict  # the golden layout
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

    rng = np.random.default_rng(11)
    utts = [f"r{i}.wav" for i in range(16)]
    os.makedirs(os.path.join(root, "eval"))
    os.makedirs(os.path.join(root, "scp"))
    for u in utts:
        n = int(rng.integers(4000, 9000))
        save_wav(os.path.join(root, "eval", u),
                 rng.normal(size=n).astype(np.float32) * 0.2, 16000)
    with open(os.path.join(root, "scp", "test.lst"), "w") as f:
        f.write("\n".join(utts) + "\n")
    # SCL 5-column protocol (speaker utt - method label); labels arbitrary —
    # the rehearsal pins whatever EER the golden model produces on them
    with open(os.path.join(root, "protocol.txt"), "w") as f:
        for i, u in enumerate(utts):
            label = "bonafide" if i % 2 == 0 else "spoof"
            f.write(f"LA_0001 {u} - - {label}\n")

    sd = _reference_pth_dict(XLSRConfig.tiny(), np.random.default_rng(12))
    pth = os.path.join(root, "epoch_golden.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pth)

    yaml = os.path.join(root, "tiny.yaml")
    with open(yaml, "w") as f:
        f.write(
            "model:\n  name: wav2vec2_linear_nll\n  flag_fix_ssl: false\n"
            "  contra_mode: 'all'\n  loss_type: 1\n"
            "data:\n  name: 'asvspoof_2019_augall_3'\n"
            "  kwargs:\n    vocoders: ['hifigan']\n"
            "    augmentation_methods: ['RawBoost12']\n"
            "    num_additional_real: 1\n    trim_length: 4000\n"
            "    wav_samp_rate: 16000\n    online_aug: true\n"
        )
    return utts, pth, yaml


def run_cli(args, env):
    return subprocess.run(
        [sys.executable, "-m", "scl_deepfake_audio_detection_tpu.cli"] + args,
        cwd=REPO, env=env, capture_output=True, text=True,
    )


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="weights_day_rehearsal_")
    utts, pth, yaml = build_golden(tmp)

    env = dict(os.environ)
    env["SCL_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    extra = ["--ssl_preset", "tiny", "--batch_size", "4",
             "--num_workers", "1"]

    # golden "committed" scores: the same eval path weights day re-runs
    ref_scores = os.path.join(tmp, "golden_scores.txt")
    r = run_cli(["--config", yaml, "--database_path", tmp + "/",
                 "--eval", "--model_path", pth, "--eval_output", ref_scores]
                + extra, env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(open(ref_scores).read().strip().splitlines()) == len(utts)

    # its EER under our analyze = the rehearsal's EXPECTED_EER
    r = run_cli(["--analyze", ref_scores,
                 "--protocol", os.path.join(tmp, "protocol.txt"), "--json"],
                env)
    assert r.returncode == 0, r.stderr[-2000:]
    # analysis.json stores EER as a fraction; weights_day.sh compares percent.
    expected_eer = json.loads(r.stdout.splitlines()[-1])["eer"] * 100.0

    sh_env = dict(env)
    sh_env.update({
        "SKIP_DOWNLOAD": "1",
        "CONFIG": yaml,
        "CKPT": pth,
        "REF_SCORES": ref_scores,
        "PROTOCOL": os.path.join(tmp, "protocol.txt"),
        "EXPECTED_EER": f"{expected_eer:.4f}",
        "EER_TOL": "0.02",
        "EXTRA_ARGS": " ".join(extra),
        "OUT_DIR": os.path.join(tmp, "out"),
    })

    def run_sh():
        return subprocess.run(
            ["bash", "scripts/weights_day.sh", tmp + "/", "0", "1e-4"],
            cwd=REPO, env=sh_env, capture_output=True, text=True,
        )

    r = run_sh()
    print(r.stdout[-1500:])
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        print("REHEARSAL FAIL: the PASS direction did not pass")
        return 1

    # falsifiability: a wrong expected EER must flip the exit code
    sh_env["EXPECTED_EER"] = f"{expected_eer + 5.0:.4f}"
    r = run_sh()
    if r.returncode == 0:
        print("REHEARSAL FAIL: a 5-point EER shift was not detected")
        return 1

    print("weights-day rehearsal: PASS (chain reproduces; EER stage is live)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
