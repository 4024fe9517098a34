"""Cross-round numerics-drift net for the integrated eval pipeline.

The unit parity tests pin each op against torch/numpy; this pins the
COMPOSITION — deterministic synthetic audio -> EvalDataset pad ->
checkpoint load -> jitted score step -> eval-format writer — against a
COMMITTED golden checkpoint (``tests/golden/mini_linear_nll.ckpt``) and a
committed score file.  Any unintended change to the padding default, dtype
policy, score-step plumbing, or writer formatting shows up as a diff here
even when every unit test still passes.

Regenerate the expectations ONLY for a deliberate, understood numerics
change: ``python tests/test_golden_pipeline.py`` rewrites
``tests/golden/expected_scores.txt``; commit it together with the change
that justified it.
"""

import os

import numpy as np
import pytest

import jax

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CKPT = os.path.join(GOLDEN_DIR, "mini_linear_nll.ckpt")
EXPECTED = os.path.join(GOLDEN_DIR, "expected_scores.txt")

#: CPU fp32 with fast-math disabled (conftest) is stable across XLA builds
#: at ~1e-6; the slack covers op-reassociation in future compiler versions.
ATOL = 1e-4


def _golden_wavs(n=4, t=16000):
    """Deterministic synthetic utterances: tones, noise, chirp, short one
    (exercises the repeat-pad branch)."""
    rng = np.random.default_rng(20240817)
    tt = np.arange(t) / 16000.0
    wavs = [
        (0.3 * np.sin(2 * np.pi * 440.0 * tt)).astype(np.float32),
        (0.2 * rng.normal(size=t)).astype(np.float32),
        (0.3 * np.sin(2 * np.pi * (200 + 800 * tt) * tt)).astype(np.float32),
        (0.25 * np.sin(2 * np.pi * 333.0 * tt[: t // 3])).astype(np.float32),
    ]
    return wavs[:n]


def _score_lines(tmp_dir: str) -> list:
    """Run the full eval path (dataset pad -> loader -> jitted score step ->
    writer) on the golden checkpoint; return the score-file lines."""
    from scl_deepfake_audio_detection_tpu.data.datasets import EvalDataset
    from scl_deepfake_audio_detection_tpu.data.loader import EvalLoader
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
    from scl_deepfake_audio_detection_tpu.train import scoring
    from scl_deepfake_audio_detection_tpu.train.engine import Engine
    from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav
    from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig

    eval_dir = os.path.join(tmp_dir, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    utts = []
    for i, w in enumerate(_golden_wavs()):
        name = f"g{i}.wav"
        save_wav(os.path.join(eval_dir, name), w, 16000)
        utts.append(name)

    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    tree, _ = ckpt.load(CKPT)
    engine = Engine(model, TrainConfig())
    params, buffers, _ = engine.init_state(jax.random.key(0),
                                           params=tree["params"])
    ds = EvalDataset(utts, tmp_dir, padding_type="repeat", cut=16000)
    loader = EvalLoader(ds, batch_size=2, num_workers=1)
    out = os.path.join(tmp_dir, "scores.txt")
    scoring.produce_evaluation_file(
        loader, lambda wav: engine.score_step(params, buffers, wav), out
    )
    with open(out) as f:
        return [ln.rstrip("\n") for ln in f]


def test_golden_eval_pipeline_matches_committed_scores(tmp_path):
    assert os.path.exists(EXPECTED), (
        "golden expectations missing — run `python tests/test_golden_pipeline.py`"
    )
    got = _score_lines(str(tmp_path))
    want = [ln.rstrip("\n") for ln in open(EXPECTED)]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        gu, g0, g1 = g.split()
        wu, w0, w1 = w.split()
        assert gu == wu
        assert float(g0) == pytest.approx(float(w0), abs=ATOL), (g, w)
        assert float(g1) == pytest.approx(float(w1), abs=ATOL), (g, w)


if __name__ == "__main__":  # regenerate the committed expectations
    import tempfile

    jax.config.update("jax_platforms", "cpu")
    lines = _score_lines(tempfile.mkdtemp())
    with open(EXPECTED, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {EXPECTED}:")
    print("\n".join(lines))


def test_golden_train_step_loss_is_stable(tmp_path):
    """One jitted train step (SupCon + CE + optimizer) from the committed
    golden checkpoint on deterministic synthetic views: the loss is pinned,
    so unintended numerics drift in losses/grad/optimizer plumbing fails
    even when per-op parity tests still pass.

    Regenerate the pin ONLY for deliberate numerics changes (print the new
    value by running this test with -s after setting _PRINT=True)."""
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
    from scl_deepfake_audio_detection_tpu.train.engine import Engine
    from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig

    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    tree, _ = ckpt.load(CKPT)
    engine = Engine(model, TrainConfig(max_lr=1e-4))
    params, buffers, opt_state = engine.init_state(
        jax.random.key(0), params=tree["params"]
    )
    rng = np.random.default_rng(20240817)
    g, v, t = 2, 4, 8000
    wav = (0.2 * rng.normal(size=(g, v, t))).astype(np.float32)
    labels = np.tile([1.0, 1.0, 0.0, 0.0], (g, 1)).astype(np.float32)
    _, _, _, metrics = engine.run_epoch(
        params, buffers, opt_state,
        [{"wav": wav, "labels": labels}], jax.random.key(7),
    )
    _PRINT = False
    if _PRINT:  # pragma: no cover - regeneration helper
        print({k: f"{v:.10f}" for k, v in metrics.items()})
    assert metrics["loss"] == pytest.approx(0.7708058953, abs=2e-4)
    assert metrics["L_CE"] == pytest.approx(0.1741586030, abs=1e-4)
    assert metrics["L_CF1"] == pytest.approx(0.3219523132, abs=1e-4)
    assert metrics["L_CF2"] == pytest.approx(0.2746949792, abs=1e-4)
    assert metrics["accuracy"] == pytest.approx(0.5, abs=1e-6)
