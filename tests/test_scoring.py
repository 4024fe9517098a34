"""Score-file writers: format byte-compatibility and padded-tail handling."""

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.train import scoring
from scl_deepfake_audio_detection_tpu.train.analysis import load_scores


def _batches():
    # two batches; second has a padded row (2 wav rows, 1 utt)
    yield np.zeros((2, 10), np.float32), ["a.flac", "b.flac"]
    yield np.zeros((2, 10), np.float32), ["c.flac"]


def _score_fn(wav):
    n = wav.shape[0]
    return np.stack([np.full(n, -1.5), np.linspace(-0.25, -0.75, n)], axis=1)


def test_evaluation_file_format(tmp_path):
    out = tmp_path / "scores.txt"
    scoring.produce_evaluation_file(_batches(), _score_fn, str(out))
    lines = out.read_text().splitlines()
    assert len(lines) == 3  # padded row dropped
    utt, cm0, cm1 = lines[0].split()
    assert utt == "a.flac" and float(cm0) == -1.5 and float(cm1) == -0.25
    # parse back through the analysis loader (eval format -> col 2)
    scores = load_scores(str(out), fmt="eval")
    assert scores["a.flac"] == -0.25


def test_prediction_file_format(tmp_path):
    out = tmp_path / "pred.txt"
    scoring.produce_prediction_file(_batches(), _score_fn, str(out))
    lines = out.read_text().splitlines()
    assert len(lines) == 3
    utt, score, pred = lines[0].split()
    assert float(score) == -0.25 and pred == "1"  # cm1 > cm0 -> bonafide


def test_rerun_truncates_not_appends(tmp_path):
    out = tmp_path / "scores.txt"
    scoring.produce_evaluation_file(_batches(), _score_fn, str(out))
    scoring.produce_evaluation_file(_batches(), _score_fn, str(out))
    assert len(out.read_text().splitlines()) == 3  # reference 'a+' would give 6


def test_read_valid_rows_resume_parsing(tmp_path):
    """--resume_eval's parser: keeps well-formed rows, drops a torn final
    line (killed mid-write), duplicates, wrong token counts, and non-float
    score columns; a missing file is an empty resume."""
    out = tmp_path / "scores.txt"
    assert scoring.read_valid_rows(str(out)) == ([], set())

    out.write_text(
        "a.flac -1.5 -0.25\n"
        "bad_line_two_tokens -1.0\n"
        "b.flac -1.5 notafloat\n"
        "a.flac -9.9 -9.9\n"          # duplicate: first occurrence wins
        "c.flac -1.5 -0.75\n"
        "d.flac -1.5 -0.5"            # torn: no trailing newline
    )
    valid, seen = scoring.read_valid_rows(str(out), n_tokens=3)
    assert seen == {"a.flac", "c.flac"}
    assert valid == ["a.flac -1.5 -0.25\n", "c.flac -1.5 -0.75\n"]


def test_evaluation_file_append_mode(tmp_path):
    """append=True (the --resume_eval writer mode) extends instead of
    truncating, and the combined file equals a fresh full run."""
    out = tmp_path / "scores.txt"
    scoring.produce_evaluation_file(_batches(), _score_fn, str(out))
    full = out.read_text()

    def first_batch():
        yield np.zeros((2, 10), np.float32), ["a.flac", "b.flac"]

    def rest_batch():
        yield np.zeros((2, 10), np.float32), ["c.flac"]

    scoring.produce_evaluation_file(first_batch(), _score_fn, str(out))
    scoring.produce_evaluation_file(rest_batch(), _score_fn, str(out),
                                    append=True)
    assert out.read_text() == full


def test_emb_files(tmp_path):
    def emb_fn(wav):
        n = wav.shape[0]
        return _score_fn(wav), np.ones((n, 4), np.float32)

    scoring.produce_emb_file(_batches(), emb_fn, str(tmp_path))
    assert (tmp_path / "a.npy").exists()
    assert (tmp_path / "c.npy").exists()
    assert len((tmp_path / "scores.txt").read_text().splitlines()) == 3
    np.testing.assert_array_equal(np.load(tmp_path / "a.npy"), np.ones(4, np.float32))


def test_score_long_audio_chunks_and_averages():
    from scl_deepfake_audio_detection_tpu.train.scoring import score_long_audio

    calls = []

    def fake_score(wav):
        calls.append(wav.shape)
        # score = mean of the chunk (distinguishes chunks), two columns
        m = wav.mean(axis=1)
        return np.stack([m, -m], axis=1)

    # long audio: 3 windows at hop=window//2 plus the tail crop
    window = 1000
    wav = np.arange(2600, dtype=np.float32)
    out = score_long_audio(wav, fake_score, window=window, batch=4)
    assert out.shape == (2,)
    assert all(s == (4, window) for s in calls)  # fixed compiled shape
    # chunk starts: 0, 500, 1000, 1500, 1600(tail) -> means average correctly
    starts = [0, 500, 1000, 1500, 1600]
    want = np.mean([np.arange(s, s + window).mean() for s in starts])
    assert out[0] == pytest.approx(want, rel=1e-6)

    # short audio passes through as one window
    calls.clear()
    short = np.ones(300, np.float32)
    out2 = score_long_audio(short, fake_score, window=window, batch=4)
    assert out2[0] == pytest.approx(1.0, rel=1e-6)  # tile-padded, mean stays 1


def test_long_audio_evaluation_file(tmp_path):
    """produce_long_audio_evaluation_file: rows equal score_long_audio's
    window-averaged output per utterance, eval format."""
    from scl_deepfake_audio_detection_tpu.train.scoring import (
        produce_long_audio_evaluation_file,
        score_long_audio,
    )

    def fake_score(wav):
        m = wav.mean(axis=1)
        return np.stack([m, -m], axis=1)

    items = [
        (np.arange(2600, dtype=np.float32), "long.wav"),
        (np.ones(300, np.float32), "short.wav"),
    ]

    class DS:
        def __len__(self):
            return len(items)

        def get_raw(self, i):
            return items[i]

    out = tmp_path / "scores.txt"
    produce_long_audio_evaluation_file(
        DS(), fake_score, str(out), window=1000, batch=4
    )
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    for (wav, utt), line in zip(items, lines):
        got_utt, cm0, cm1 = line.split()
        want = score_long_audio(wav, fake_score, window=1000, batch=4)
        assert got_utt == utt
        assert float(cm0) == pytest.approx(want[0], rel=1e-5)
        assert float(cm1) == pytest.approx(want[1], rel=1e-5)


def test_pipelined_preserves_order(tmp_path):
    """The depth-2 in-flight scoring queue must not reorder or drop batches."""
    from scl_deepfake_audio_detection_tpu.train.scoring import _pipelined

    batches = [(np.full((2, 4), i, np.float32), [f"u{2*i}", f"u{2*i+1}"])
               for i in range(7)]
    launched = []

    def launch(wav):
        launched.append(float(wav[0, 0]))
        return wav[:, :1]

    got = list(_pipelined(iter(batches), launch))
    assert [u for us, _ in got for u in us] == [f"u{i}" for i in range(14)]
    assert launched == [float(i) for i in range(7)]  # all dispatched, in order
    # lag: by the time batch 0 is yielded, batches 0..2 were already launched
    assert len(got) == 7


def test_int16_wire_format_lossless(tmp_path):
    """PCM16 wire format through EvalLoader + engine scoring must equal the
    float32 path bit-for-bit for PCM16-sourced audio."""
    import jax

    from scl_deepfake_audio_detection_tpu.data.datasets import EvalDataset
    from scl_deepfake_audio_detection_tpu.data.loader import EvalLoader
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.train.engine import Engine
    from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

    root = tmp_path / "db"
    (root / "eval").mkdir(parents=True)
    rng = np.random.default_rng(0)
    utts = [f"u{i}.wav" for i in range(5)]
    for u in utts:
        save_wav(str(root / "eval" / u),
                 (rng.normal(size=4000) * 0.2).astype(np.float32), 16000)

    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    eng = Engine(model)
    params, buffers, _ = eng.init_state(jax.random.key(0))

    def run(wire):
        ds = EvalDataset(utts, str(root), cut=3200)
        loader = EvalLoader(ds, batch_size=2, num_workers=1, wire_dtype=wire)
        outs = []
        for wav, us in loader:
            assert wav.dtype == (np.int16 if wire == "int16" else np.float32)
            outs.append(np.asarray(eng.score_step(params, buffers, wav))[: len(us)])
        return np.concatenate(outs)

    np.testing.assert_array_equal(run("float32"), run("int16"))


def test_score_step_routes_per_model_eval_scores():
    """The jitted score step must write each model's REFERENCE score
    columns: log-probs for NLL heads, RAW logits for aasist/resnet (whose
    reference wrappers emit the out_layer output directly — log_softmax
    would re-rank scores relative to the reference pipeline)."""
    import jax

    from scl_deepfake_audio_detection_tpu.models.aasist import XLSRAasist
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.train.engine import Engine
    from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig

    import jax.numpy as jnp

    wav = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3200)) * 0.2, jnp.float32
    )

    aasist = XLSRAasist(ssl=XLSRConfig.tiny())
    p = aasist.init(jax.random.key(0))
    eng = Engine(aasist, TrainConfig())
    params, buffers, _ = eng.init_state(jax.random.key(0), params=p,
                                        with_opt=False)
    scores = np.asarray(eng.score_step(params, buffers, wav))
    out = aasist.apply(params, wav, train=False, buffers=buffers)
    np.testing.assert_allclose(scores, np.asarray(out.logits), atol=1e-5)
    # raw logits do NOT behave like log-probs
    assert not np.allclose(np.exp(scores).sum(-1), 1.0, atol=1e-3)

    lin = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    p = lin.init(jax.random.key(1))
    eng = Engine(lin, TrainConfig())
    params, buffers, _ = eng.init_state(jax.random.key(1), params=p,
                                        with_opt=False)
    scores = np.asarray(eng.score_step(params, buffers, wav))
    np.testing.assert_allclose(np.exp(scores).sum(-1), 1.0, atol=1e-4)
