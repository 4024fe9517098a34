"""bench.py's measurement helpers must work on the CPU fallback path (the
tunnel-outage story: the driver's round-end bench must never hard-fail).
The TPU numbers themselves are pinned by the driver's BENCH_r*.json runs."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_train_ms_per_step_cpu_smoke():
    import bench

    ms = bench._train_ms_per_step(on_tpu=False)
    assert np.isfinite(ms) and ms > 0, ms


def test_eval_utt_per_sec_cpu_smoke():
    """The extracted eval measurement (now run time-boxed in a subprocess on
    the TPU path) works in-process on the CPU smoke config."""
    import bench

    v = bench._eval_utt_per_sec(on_tpu=False)
    assert np.isfinite(v) and v > 0, v


def test_baseline_denominator_present():
    import bench

    b = bench._baseline_utt_per_sec()
    assert b is not None and 0 < b < 10  # the measured torch-CPU proxy


def test_train_ms_probe_subprocess_cpu():
    """The time-boxed probe path end-to-end: subprocess run, TRAIN_MS parse,
    plausibility bounds."""
    import bench

    ms = bench._train_ms_probe(on_tpu=False, timeout_s=600)
    assert ms is not None and 0 < ms < 10000, ms


def test_eval_and_train_helpers_shared():
    """bench, measure_train_step and measure_1b_eval must all route through
    utils.measure — one copy of the methodology (review r3 finding)."""
    for path in ("bench.py", "scripts/measure_train_step.py",
                 "scripts/measure_1b_eval.py", "scripts/measure_zoo_eval.py"):
        src = open(os.path.join(REPO, path)).read()
        assert "utils.measure import" in src, path
        assert "perf_counter" not in src, f"{path} re-implements timing"


def test_measure_zoo_eval_cpu_smoke():
    """The zoo sweep script's build/measure loop runs on CPU with the tiny
    preset (one head family is enough — the others share the loop; their
    forwards are covered by test_model_zoo)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "measure_zoo_eval", os.path.join(REPO, "scripts/measure_zoo_eval.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["measure_zoo_eval", "--preset", "tiny", "--batch", "2",
                "--iters", "2", "--samples", "3200", "--models", "xlsr_aasist"]
    try:
        mod.main()
    finally:
        sys.argv = old
