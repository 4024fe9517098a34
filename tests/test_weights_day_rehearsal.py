"""CI entry for the weights-day dress rehearsal (VERDICT r3 next #8).

Runs scripts/weights_day_rehearsal.py, which builds a synthetic golden
setup (reference-layout .pth + mini eval db + committed-score stand-in)
and drives the UNMODIFIED scripts/weights_day.sh end-to-end: convert ->
row parity -> full eval scoring -> EER diff -> exit code, asserting both
the PASS direction and that a shifted expected EER flips the exit code.
"""

import os
import subprocess
import sys

import pytest

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_weights_day_rehearsal_end_to_end():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "weights_day_rehearsal.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
    assert "weights-day rehearsal: PASS" in r.stdout
