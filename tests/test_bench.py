"""bench.py's measurement helpers must work on the CPU fallback path (the
tunnel-outage story: the driver's round-end bench must never hard-fail).
The TPU numbers themselves are pinned by the driver's BENCH_r*.json runs."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_train_ms_per_step_cpu_smoke():
    import bench

    ms = bench._train_ms_per_step(on_tpu=False)
    assert np.isfinite(ms) and ms > 0, ms


def test_baseline_denominator_present():
    import bench

    b = bench._baseline_utt_per_sec()
    assert b is not None and 0 < b < 10  # the measured torch-CPU proxy
