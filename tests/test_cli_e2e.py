"""CLI end-to-end: train -> checkpoint -> resume -> eval score file -> EER.

Drives ``cli.main`` exactly as the shell wrappers do (``scripts/02_train.sh``
argument flow) on a synthetic mini SCL database with the tiny SSL preset —
the whole user surface in one pass: config load, registries, batch builder,
engine fit, checkpointing, scoring writers, analysis."""

import os

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

SR = 16000


@pytest.fixture(scope="module")
def mini_db(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_db")
    rng = np.random.default_rng(0)
    utts = [f"u{i}.wav" for i in range(6)]
    for d in ("bonafide", "vocoded", "eval", "scp", "musan", "rirs"):
        os.makedirs(root / d, exist_ok=True)
    for u in utts:
        n = int(rng.integers(4000, 9000))
        save_wav(str(root / "bonafide" / u), rng.normal(size=n).astype(np.float32) * 0.2, SR)
        save_wav(str(root / "vocoded" / f"hifigan_{u}"),
                 rng.normal(size=n).astype(np.float32) * 0.2, SR)
        save_wav(str(root / "eval" / u), rng.normal(size=n).astype(np.float32) * 0.2, SR)
    save_wav(str(root / "musan" / "n.wav"), rng.normal(size=SR).astype(np.float32) * 0.1, SR)
    rir = np.zeros(200, np.float32)
    rir[0] = 1.0
    save_wav(str(root / "rirs" / "r.wav"), rir, SR)
    with open(root / "scp" / "train_bonafide.lst", "w") as f:
        f.write("\n".join(utts[:3]) + "\n")
    with open(root / "scp" / "dev_bonafide.lst", "w") as f:
        f.write("\n".join(utts[3:]) + "\n")
    with open(root / "scp" / "test.lst", "w") as f:
        f.write("\n".join(utts) + "\n")
    with open(root / "protocol.txt", "w") as f:
        for i, u in enumerate(utts):
            key = u.rsplit(".", 1)[0]
            label = "bonafide" if i % 2 == 0 else "spoof"
            f.write(f"spk {key} - none {label}\n")
    return root, utts


@pytest.fixture(scope="module")
def mini_config(mini_db, tmp_path_factory):
    root, _ = mini_db
    cfg_dir = tmp_path_factory.mktemp("cfg")
    p = cfg_dir / "tiny.yaml"
    p.write_text(f"""
model:
  name: wav2vec2_linear_nll
  flag_fix_ssl: false
  contra_mode: 'all'
  loss_type: 1
data:
  name: 'asvspoof_2019_augall_3'
  kwargs:
    vocoders: ['hifigan']
    augmentation_methods: ["RawBoost12", "reverb_wrapper"]
    num_additional_real: 2
    trim_length: 4000
    wav_samp_rate: 16000
    online_aug: true
    aug_dir: '/tmp/cli_e2e_aug'
    noise_path: '{root}/musan'
    rir_path: '{root}/rirs'
""")
    return str(p)


def test_cli_train_eval_analyze(mini_db, mini_config, tmp_path):
    from scl_deepfake_audio_detection_tpu.cli import main

    root, utts = mini_db
    out_dir = str(tmp_path / "out")

    # ---- train 2 epochs (tiny SSL; 3 anchors => 3 steps/epoch) -------------
    rc = main([
        "--config", mini_config,
        "--database_path", str(root) + "/",
        "--batch_size", "1",
        "--num_epochs", "2",
        "--seed", "7",
        "--ssl_preset", "tiny",
        "--num_workers", "2",
        "--out_dir", out_dir,
        "--comment", "e2e",
        "--padding_type", "repeat",
    ])
    assert rc == 0
    tag_dirs = os.listdir(out_dir)
    assert len(tag_dirs) == 1
    run_dir = os.path.join(out_dir, tag_dirs[0])
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    ckpts = [f for f in os.listdir(run_dir) if f.endswith(".ckpt")]
    assert "last.ckpt" in ckpts, "every epoch must leave a resumable state"

    # ---- eval with the trained checkpoint -> score file --------------------
    scores = str(tmp_path / "scores.txt")
    rc = main([
        "--config", mini_config,
        "--database_path", str(root) + "/",
        "--batch_size", "2",
        "--eval",
        "--model_path", os.path.join(run_dir, "last.ckpt"),
        "--eval_output", scores,
        "--ssl_preset", "tiny",
        "--num_workers", "2",
    ])
    assert rc == 0
    lines = open(scores).read().strip().splitlines()
    assert len(lines) == len(utts)
    assert all(len(l.split()) == 3 for l in lines)

    # ---- analyze the scores against the protocol ---------------------------
    rc = main([
        "--analyze", scores,
        "--protocol", str(root / "protocol.txt"),
        "--score_format", "eval",
    ])
    assert rc == 0

    # ---- predict mode: utt score pred ---------------------------------------
    preds = str(tmp_path / "preds.txt")
    rc = main([
        "--config", mini_config,
        "--database_path", str(root) + "/",
        "--batch_size", "2",
        "--eval", "--predict",
        "--model_path", os.path.join(run_dir, "last.ckpt"),
        "--eval_output", preds,
        "--ssl_preset", "tiny",
        "--num_workers", "2",
    ])
    assert rc == 0
    plines = open(preds).read().strip().splitlines()
    assert len(plines) == len(utts)
    assert all(l.split()[2] in ("0", "1") for l in plines)

    # ---- emb mode: per-utt .npy + scores.txt --------------------------------
    emb_dir = str(tmp_path / "embs")
    rc = main([
        "--config", mini_config,
        "--database_path", str(root) + "/",
        "--batch_size", "2",
        "--eval", "--emb",
        "--model_path", os.path.join(run_dir, "last.ckpt"),
        "--eval_output", emb_dir,
        "--ssl_preset", "tiny",
        "--num_workers", "2",
    ])
    assert rc == 0
    npys = [f for f in os.listdir(emb_dir) if f.endswith(".npy")]
    assert len(npys) == len(utts)
    assert os.path.exists(os.path.join(emb_dir, "scores.txt"))


def test_cli_train_with_device_aug(mini_db, mini_config, tmp_path):
    """--device_aug: decode-only host loader + on-chip view composition.

    The device composer implements exactly the conf-3 recipe, so this test
    uses a 3-method config (the CLI now REJECTS other method lists instead
    of silently training the wrong distribution)."""
    from scl_deepfake_audio_detection_tpu.cli import main

    root, utts = mini_db
    cfg3 = tmp_path / "conf3_recipe.yaml"
    cfg3.write_text(
        open(mini_config).read().replace(
            'augmentation_methods: ["RawBoost12", "reverb_wrapper"]',
            'augmentation_methods: ["RawBoost12", "background_noise", "reverb"]',
        )
    )
    out_dir = str(tmp_path / "out_dev")
    rc = main([
        "--config", str(cfg3),
        "--database_path", str(root) + "/",
        "--batch_size", "2",
        "--num_epochs", "1",
        "--seed", "9",
        "--ssl_preset", "tiny",
        "--num_workers", "2",
        "--out_dir", out_dir,
        "--comment", "devaug",
        "--device_aug",
    ])
    assert rc == 0
    run_dir = os.path.join(out_dir, os.listdir(out_dir)[0])
    import json

    rec = json.loads(open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()[0])
    assert np.isfinite(rec["train_loss"]) and np.isfinite(rec["val_loss"])


def test_tensorboard_scalar_writer(tmp_path):
    from scl_deepfake_audio_detection_tpu.train.tblog import ScalarWriter

    w = ScalarWriter(str(tmp_path / "tb"))
    w.scalars({"train_loss": 1.5, "val_accuracy": 0.8, "train_L_CE": 0.3,
               "epoch": 0}, step=0)
    w.close()
    files = []
    for dirpath, _, names in os.walk(tmp_path / "tb"):
        files += [n for n in names if "tfevents" in n]
    # writer is a no-op without the tensorboard backend; with it, events exist
    try:
        import torch.utils.tensorboard  # noqa: F401

        assert files
    except Exception:
        assert not files


def test_cli_eval_only_layout(tmp_path):
    """The generic eval layout (In-the-Wild / DF21): protocol lines are
    '<relative path> <subset> <label>' and audio sits at <base>/<path> with
    no eval/ subdir (reference datautils/eval_only.py)."""
    from scl_deepfake_audio_detection_tpu.cli import main

    root = tmp_path / "itw"
    os.makedirs(root / "wav")
    rng = np.random.default_rng(3)
    with open(root / "protocol.txt", "w") as f:
        for i in range(4):
            wav = rng.normal(size=5000).astype(np.float32) * 0.2
            save_wav(str(root / "wav" / f"{i}.wav"), wav, SR)
            label = "bonafide" if i % 2 else "spoof"
            f.write(f"wav/{i}.wav eval {label}\n")

    cfg = tmp_path / "eval_only.yaml"
    cfg.write_text(
        "model:\n  name: wav2vec2_linear_nll\n  flag_fix_ssl: false\n"
        "  contra_mode: 'all'\n  loss_type: 1\n"
        "data:\n  name: 'eval_only'\n  kwargs: {}\n"
    )
    scores = str(tmp_path / "itw_scores.txt")
    rc = main([
        "--config", str(cfg),
        "--database_path", str(root) + "/",
        "--batch_size", "2",
        "--eval",
        "--eval_output", scores,
        "--ssl_preset", "tiny",
        "--num_workers", "2",
    ])
    assert rc == 0
    lines = open(scores).read().strip().splitlines()
    assert len(lines) == 4
    assert lines[0].split()[0] == "wav/0.wav"  # utt ids keep the relative path

    rc = main(["--analyze", scores, "--protocol", str(root / "protocol.txt"),
               "--score_format", "eval"])
    assert rc == 0


def test_cli_resume_eval(tmp_path):
    """--resume_eval: a killed eval run leaves a partial score file (with a
    torn final line); resuming scores only the missing utts and the final
    file is byte-identical to an uninterrupted run."""
    from scl_deepfake_audio_detection_tpu.cli import main

    root = tmp_path / "itw"
    os.makedirs(root / "wav")
    rng = np.random.default_rng(11)
    with open(root / "protocol.txt", "w") as f:
        for i in range(6):
            wav = rng.normal(size=5000).astype(np.float32) * 0.2
            save_wav(str(root / "wav" / f"{i}.wav"), wav, SR)
            f.write(f"wav/{i}.wav eval bonafide\n")
    cfg = tmp_path / "eval_only.yaml"
    cfg.write_text(
        "model:\n  name: wav2vec2_linear_nll\n  flag_fix_ssl: false\n"
        "  contra_mode: 'all'\n  loss_type: 1\n"
        "data:\n  name: 'eval_only'\n  kwargs: {}\n"
    )
    base = ["--config", str(cfg), "--database_path", str(root) + "/",
            "--batch_size", "2", "--eval", "--ssl_preset", "tiny",
            "--num_workers", "2", "--seed", "4"]

    full = str(tmp_path / "full.txt")
    assert main(base + ["--eval_output", full]) == 0
    full_text = open(full).read()
    assert len(full_text.splitlines()) == 6

    # simulate the kill: 3 complete rows + a torn 4th line (no newline)
    part = str(tmp_path / "resumed.txt")
    rows = full_text.splitlines(keepends=True)
    with open(part, "w") as f:
        f.writelines(rows[:3])
        f.write(rows[3][: len(rows[3]) // 2])
    rc = main(base + ["--eval_output", part, "--resume_eval"])
    assert rc == 0
    assert open(part).read() == full_text

    # resuming a COMPLETE file rescans and exits without scoring anything
    rc = main(base + ["--eval_output", part, "--resume_eval"])
    assert rc == 0
    assert open(part).read() == full_text

    # --emb cannot resume (per-utt .npy dir): explicit usage error
    rc = main(base + ["--eval_output", str(tmp_path / "embs"),
                      "--resume_eval", "--emb"])
    assert rc == 2


def test_cli_warm_cache(mini_db, tmp_path):
    """--warm_cache pre-populates the offline aug cache for train+dev and
    exits without building a model."""
    from scl_deepfake_audio_detection_tpu.cli import main

    root, _ = mini_db
    aug_dir = tmp_path / "warm_aug"
    cfg = tmp_path / "offline.yaml"
    cfg.write_text(f"""
model:
  name: wav2vec2_linear_nll
  flag_fix_ssl: false
  contra_mode: 'all'
  loss_type: 1
data:
  name: 'asvspoof_2019_augall_3'
  kwargs:
    vocoders: ['hifigan']
    augmentation_methods: ["RawBoost12", "reverb_wrapper"]
    num_additional_real: 2
    trim_length: 4000
    wav_samp_rate: 16000
    online_aug: false
    aug_dir: '{aug_dir}'
    noise_path: '{root}/musan'
    rir_path: '{root}/rirs'
""")
    rc = main([
        "--config", str(cfg),
        "--database_path", str(root) + "/",
        "--warm_cache",
        "--num_workers", "2",
    ])
    assert rc == 0
    # train 3 + dev 3 bonafide, each through both methods; vocoded x methods[0]
    assert len(os.listdir(aug_dir / "RawBoost12")) == 6 + 6
    assert len(os.listdir(aug_dir / "reverb")) == 6


def test_cli_distill_workflow(mini_db, mini_config, tmp_path):
    """--distill_from: train the configured model as a student of a frozen
    teacher checkpoint, save student_last.ckpt per epoch, then eval the
    student through the normal checkpoint path."""
    import jax

    from scl_deepfake_audio_detection_tpu.cli import main
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt

    root, utts = mini_db
    # a tiny frozen teacher checkpoint (weights only, engine format)
    teacher = LinearNLL(ssl=XLSRConfig.tiny())
    t_params = jax.jit(teacher.init)(jax.random.key(42))
    t_path = str(tmp_path / "teacher.ckpt")
    ckpt.save(t_path, {"params": t_params})

    out_dir = str(tmp_path / "out")
    rc = main([
        "--distill_from", t_path, "--teacher_preset", "tiny",
        "--ssl_preset", "tiny", "--config", mini_config,
        "--database_path", str(root) + "/",
        "--num_epochs", "1", "--batch_size", "1", "--out_dir", out_dir,
        "--seed", "7", "--num_workers", "2",
        "--distill_emb_w", "0.1",  # tiny teacher/student embs both 128-d
    ])
    assert rc == 0
    import glob

    student = glob.glob(out_dir + "/*/student_last.ckpt")
    assert len(student) == 1
    tree, extra = ckpt.load(student[0])
    assert extra["epoch"] == 0
    assert np.isfinite(extra["loss_kld"]) and np.isfinite(extra["loss"])
    assert 0.0 <= extra["teacher_agreement"] <= 1.0

    # the student checkpoint rides the normal eval path
    scores = str(tmp_path / "student_scores.txt")
    rc = main([
        "--eval", "--model_path", student[0], "--ssl_preset", "tiny",
        "--config", mini_config, "--database_path", str(root) + "/",
        "--batch_size", "2", "--eval_output", scores,
    ])
    assert rc == 0
    with open(scores) as f:
        assert len(f.read().splitlines()) == len(utts)


def test_cli_long_audio_eval_and_serve(tmp_path, monkeypatch):
    """--long_audio: long clips score as window-averaged chunks (eval and
    serve agree); short clips keep matching the fixed-window path."""
    import io
    import sys as _sys

    from scl_deepfake_audio_detection_tpu.cli import main

    root = tmp_path / "db"
    os.makedirs(root / "eval")
    os.makedirs(root / "scp")
    rng = np.random.default_rng(3)
    long_wav = (rng.normal(size=100_000) * 0.2).astype(np.float32)  # > 64600
    short_wav = (rng.normal(size=7000) * 0.2).astype(np.float32)
    save_wav(str(root / "eval" / "long.wav"), long_wav, SR)
    save_wav(str(root / "eval" / "short.wav"), short_wav, SR)
    (root / "scp" / "test.lst").write_text("long.wav\nshort.wav\n")

    common = ["--ssl_preset", "tiny", "--config", "configs/conf-3-linear.yaml",
              "--database_path", str(root) + "/", "--batch_size", "1",
              "--padding_type", "repeat"]  # tile-pad == score_long_audio's
    # tail policy, so short utts match across paths
    out_a = str(tmp_path / "fixed.txt")
    out_b = str(tmp_path / "long.txt")
    assert main(["--eval", "--eval_output", out_a] + common) == 0
    assert main(["--eval", "--eval_output", out_b, "--long_audio"]
                + common) == 0

    def rows(p):
        with open(p) as f:
            return {l.split()[0]: [float(x) for x in l.split()[1:]]
                    for l in f}

    a, b = rows(out_a), rows(out_b)
    # short: one tile-padded window either way -> identical rows
    np.testing.assert_allclose(a["short.wav"], b["short.wav"], atol=1e-6)
    # long: truncation vs chunk averaging -> deliberately different
    assert abs(a["long.wav"][1] - b["long.wav"][1]) > 1e-6

    # serve --long_audio replies equal the long-audio eval cm1 column
    lines = [str(root / "eval" / "long.wav"), str(root / "eval" / "short.wav")]
    monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(lines) + "\n"))
    out = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", out)
    assert main(["--serve", "--long_audio"] + common) == 0
    replies = {l.split("\t")[0]: float(l.split("\t")[1])
               for l in out.getvalue().strip().splitlines()}
    assert replies[lines[0]] == pytest.approx(b["long.wav"][1], abs=5e-4)
    assert replies[lines[1]] == pytest.approx(b["short.wav"][1], abs=5e-4)


def test_cli_serve_mode(tmp_path, monkeypatch):
    """--serve: persistent scorer over stdin/stdout (one warm program)."""
    import io

    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(5)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"s{i}.wav")
        save_wav(p, (rng.normal(size=5000) * 0.2).astype(np.float32), SR)
        paths.append(p)

    lines = [paths[0], f"req-1\t{paths[1]}", f"req-2\t{paths[2]}",
             "req-3\t/nonexistent.wav"]
    monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(lines) + "\n"))
    import sys as _sys

    out = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", out)
    rc = main(["--serve", "--ssl_preset", "tiny",
               "--config", "configs/conf-3-linear.yaml"])
    assert rc == 0
    replies = [l.split("\t") for l in out.getvalue().strip().splitlines()]
    assert [r[0] for r in replies] == [paths[0], "req-1", "req-2", "req-3"]
    for r in replies[:3]:
        float(r[1])  # numeric score
    assert replies[3][1].startswith("ERROR")


def test_cli_show_params(capsys):
    """--show_params: per-layer table via eval_shape, no device memory."""
    from scl_deepfake_audio_detection_tpu.cli import main

    rc = main(["--show_params", "--ssl_preset", "tiny",
               "--config", "configs/conf-3-linear.yaml"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith("Parameter number: ")
    total = int(out.splitlines()[0].split(":")[1])
    # per-leaf counts sum to the total
    import re

    counts = [int(m) for m in re.findall(r"Para\. num: (\d+)", out)]
    assert sum(counts) == total and total > 0
    assert "['ssl']" in out and "Shape: (" in out


def test_cli_serve_batch_matches_batch1(tmp_path, monkeypatch):
    """--serve_batch N groups pending requests into one fixed-shape batch;
    scores must match the batch-1 path for the same audio, errors keep
    their per-line replies, and reply order follows request order."""
    import io

    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(8)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"b{i}.wav")
        save_wav(p, (rng.normal(size=5000) * 0.2).astype(np.float32), SR)
        paths.append(p)
    lines = paths[:2] + ["bad\t/nope.wav"] + paths[2:]

    # record every batch shape entering the jitted score step so the test
    # FAILS (not passes vacuously) if batching silently regresses to batch-1
    from scl_deepfake_audio_detection_tpu.train.engine import Engine

    seen_rows = []
    orig_init = Engine.__init__

    def spying_init(self, *a, **kw):
        orig_init(self, *a, **kw)
        inner = self.score_step

        def spy(params, buffers, wav):
            seen_rows.append(int(wav.shape[0]))
            return inner(params, buffers, wav)

        self.score_step = spy

    monkeypatch.setattr(Engine, "__init__", spying_init)

    def run(extra):
        import sys as _sys

        monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(lines) + "\n"))
        out = io.StringIO()
        monkeypatch.setattr(_sys, "stdout", out)
        rc = main(["--serve", "--ssl_preset", "tiny",
                   "--config", "configs/conf-3-linear.yaml"] + extra)
        assert rc == 0
        return [l.split("\t") for l in out.getvalue().strip().splitlines()]

    r1 = run([])
    rows_b1 = list(seen_rows)
    seen_rows.clear()
    r4 = run(["--serve_batch", "4"])
    rows_b4 = list(seen_rows)
    # batch-1 path: one [1, cut] forward per DECODABLE request — the
    # error-only group skips its (all-zero) forward entirely; batched path:
    # all 6 pending requests grouped into ceil(6/4)=2 fixed [4, cut] forwards
    assert rows_b1 == [1] * (len(lines) - 1)
    assert rows_b4 == [4, 4]
    assert [r[0] for r in r1] == [r[0] for r in r4]
    for a, b in zip(r1, r4):
        if a[1].startswith("ERROR"):
            assert b[1].startswith("ERROR")
        else:
            assert float(a[1]) == pytest.approx(float(b[1]), abs=2e-5)


def test_serve_scores_match_eval_writer(tmp_path, monkeypatch):
    """Cross-surface consistency: --serve replies equal the --eval writer's
    cm1 column for the same audio, padding, and checkpoint-free params."""
    import io

    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(12)
    eval_dir = tmp_path / "db" / "eval"
    os.makedirs(eval_dir)
    utts = []
    for i in range(3):
        u = f"x{i}.wav"
        save_wav(str(eval_dir / u),
                 (rng.normal(size=7000) * 0.2).astype(np.float32), SR)
        utts.append(u)
    os.makedirs(tmp_path / "db" / "scp")
    (tmp_path / "db" / "scp" / "test.lst").write_text("\n".join(utts) + "\n")

    common = ["--ssl_preset", "tiny", "--config", "configs/conf-3-linear.yaml",
              "--seed", "77", "--padding_type", "zero"]
    rc = main(["--eval", "--database_path", str(tmp_path / "db"),
               "--eval_output", str(tmp_path / "scores.txt"),
               "--batch_size", "2"] + common)
    assert rc == 0
    eval_scores = {}
    for ln in open(tmp_path / "scores.txt"):
        u, _cm0, cm1 = ln.split()
        eval_scores[u] = float(cm1)

    import sys as _sys

    monkeypatch.setattr("sys.stdin", io.StringIO(
        "\n".join(str(eval_dir / u) for u in utts) + "\n"))
    out = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", out)
    rc = main(["--serve"] + common)
    assert rc == 0
    for ln in out.getvalue().strip().splitlines():
        path, score = ln.split("\t")
        assert float(score) == pytest.approx(
            eval_scores[os.path.basename(path)], abs=2e-5), ln


# ---------------------------------------------------------------------------
# Learning proof: the published recipe must actually learn, measured as EER
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def separable_db(tmp_path_factory):
    """Synthetic conf-3-style database with a genuinely separable signal:
    bonafide = tonal (few low-frequency sines), spoof = broadband noise at
    the SAME RMS (no trivial energy cue).  32 labeled eval utts give EER a
    1/16-per-class resolution."""
    root = tmp_path_factory.mktemp("learn_db")
    rng = np.random.default_rng(42)

    def tonal(n):
        t = np.arange(n) / SR
        x = np.zeros(n)
        for _ in range(3):
            f = rng.uniform(150.0, 700.0)
            x += np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
        x += rng.normal(size=n) * 0.05
        return (0.1 * x / (np.sqrt(np.mean(x**2)) + 1e-9)).astype(np.float32)

    def noisy(n):
        x = rng.normal(size=n)
        return (0.1 * x / np.sqrt(np.mean(x**2))).astype(np.float32)

    for d in ("bonafide", "vocoded", "eval", "scp", "musan", "rirs"):
        os.makedirs(root / d, exist_ok=True)
    save_wav(str(root / "musan" / "n.wav"),
             (np.random.default_rng(1).normal(size=SR) * 0.05).astype(np.float32), SR)
    rir = np.zeros(200, np.float32)
    rir[0] = 1.0
    save_wav(str(root / "rirs" / "r.wav"), rir, SR)

    train_utts = [f"t{i}.wav" for i in range(16)]
    dev_utts = [f"d{i}.wav" for i in range(4)]
    for u in train_utts + dev_utts:
        n = int(rng.integers(6000, 10000))
        save_wav(str(root / "bonafide" / u), tonal(n), SR)
        for voc in ("hifigan", "hn-sinc-nsf-hifi", "waveglow"):
            save_wav(str(root / "vocoded" / f"{voc}_{u}"), noisy(n), SR)
    (root / "scp" / "train_bonafide.lst").write_text("\n".join(train_utts) + "\n")
    (root / "scp" / "dev_bonafide.lst").write_text("\n".join(dev_utts) + "\n")

    eval_utts = [f"e{i}.wav" for i in range(32)]
    with open(root / "protocol.txt", "w") as f:
        for i, u in enumerate(eval_utts):
            n = int(rng.integers(6000, 10000))
            bona = i % 2 == 0
            save_wav(str(root / "eval" / u), tonal(n) if bona else noisy(n), SR)
            f.write(f"spk {u[:-4]} - none {'bonafide' if bona else 'spoof'}\n")
    (root / "scp" / "test.lst").write_text("\n".join(eval_utts) + "\n")
    return root


@pytest.fixture(scope="module")
def separable_config(separable_db, tmp_path_factory):
    """The published conf-3 recipe (loss_type 1 = CE + SupCon over frames and
    embeddings, 11-view composition, all three aug methods) at test scale.

    One divergence from configs/conf-3-linear.yaml: ``flag_fix_ssl: true``.
    The reference always fine-tunes the *pretrained* 300M SSL (absent on this
    image); a from-scratch tiny SSL under loss_type 1 reaches the prior-
    collapse stationary point (all embeddings identical, L_CE exactly the
    class-prior value, EER ~ chance) — measured, not hypothetical.  A frozen
    random SSL is the test-scale stand-in for "informative features at step
    0", which is the property the pretrained checkpoint provides."""
    root = separable_db
    p = tmp_path_factory.mktemp("learn_cfg") / "conf3_tiny.yaml"
    p.write_text(f"""
model:
  name: wav2vec2_linear_nll
  flag_fix_ssl: true
  contra_mode: 'all'
  loss_type: 1
data:
  name: 'asvspoof_2019_augall_3'
  kwargs:
    vocoders: ['hifigan', 'hn-sinc-nsf-hifi', 'waveglow']
    augmentation_methods: ["RawBoost12", "background_noise_wrapper", "reverb_wrapper"]
    num_additional_real: 1
    trim_length: 6000
    wav_samp_rate: 16000
    online_aug: true
    aug_dir: '/tmp/cli_learn_aug'
    noise_path: '{root}/musan'
    rir_path: '{root}/rirs'
""")
    return str(p)


def _cli_eval_eer(root, config, tmp_path, tag, model_path=None):
    """Full user surface: --eval score file -> --analyze --json -> EER."""
    import io as _io
    import json as _json
    from contextlib import redirect_stdout

    from scl_deepfake_audio_detection_tpu.cli import main

    scores = str(tmp_path / f"scores_{tag}.txt")
    args = ["--config", config, "--database_path", str(root) + "/",
            "--ssl_preset", "tiny", "--num_workers", "2", "--seed", "7",
            "--batch_size", "8", "--eval", "--eval_output", scores]
    if model_path:
        args += ["--model_path", model_path]
    assert main(args) == 0
    buf = _io.StringIO()
    with redirect_stdout(buf):
        assert main(["--analyze", scores, "--protocol",
                     str(root / "protocol.txt"), "--score_format", "eval",
                     "--json"]) == 0
    return _json.loads(buf.getvalue())["eer"]


def test_cli_training_learns_to_eer_bound(separable_db, separable_config, tmp_path):
    """Train -> eval -> analyze through ``cli.main`` must PROVE learning:
    the trained model's EER on held-out separable data lands under a pinned
    bound, and the untrained (random-init) model's does NOT — so a
    regression that silently zeroes gradients anywhere in the CLI wiring
    (config -> builder -> engine -> checkpoint -> scorer) fails this test.

    The reference's only train-time check is val accuracy
    (``/root/reference/main.py:400,418-421``) — which is blind to exactly
    this failure class: measured here, val accuracy can sit at the class
    prior for epochs while the score *ranking* is already perfect (argmax
    bias under the 5:6 view imbalance), and a collapsed model still prints
    plausible losses.  EER on held-out data is the bottom-line metric and
    the thing the published numbers are quoted in."""
    from scl_deepfake_audio_detection_tpu.cli import main

    root = separable_db
    # untrained baseline: same eval path, seeded random init (no --model_path)
    eer_untrained = _cli_eval_eer(root, separable_config, tmp_path, "untrained")
    # falsifiability: random features must NOT already pass the trained bound
    assert eer_untrained >= 0.3, (
        f"untrained EER {eer_untrained} — separable_db no longer "
        f"discriminates training from initialization"
    )

    out_dir = str(tmp_path / "out")
    rc = main(["--config", separable_config, "--database_path", str(root) + "/",
               "--batch_size", "2", "--num_epochs", "10", "--seed", "7",
               "--ssl_preset", "tiny", "--num_workers", "2",
               "--out_dir", out_dir, "--comment", "learnproof",
               "--min_lr", "2e-4", "--max_lr", "2e-3",
               "--weight_decay", "0.0"])
    assert rc == 0
    run_dir = os.path.join(out_dir, os.listdir(out_dir)[0])

    eer_trained = _cli_eval_eer(root, separable_config, tmp_path, "trained",
                                os.path.join(run_dir, "last.ckpt"))
    # measured 0.0 (val_acc reaches 1.0 by epoch ~7); 0.125 = two EER
    # resolution steps of slack for cross-platform RNG/layout drift
    assert eer_trained <= 0.125, (
        f"trained EER {eer_trained} (untrained {eer_untrained}): the "
        f"published recipe stopped learning through the CLI"
    )
    assert eer_trained < eer_untrained - 0.2
