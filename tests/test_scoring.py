"""Score-file writers: format byte-compatibility and padded-tail handling."""

import numpy as np

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


def test_emb_files(tmp_path):
    def emb_fn(wav):
        n = wav.shape[0]
        return _score_fn(wav), np.ones((n, 4), np.float32)

    scoring.produce_emb_file(_batches(), emb_fn, str(tmp_path))
    assert (tmp_path / "a.npy").exists()
    assert (tmp_path / "c.npy").exists()
    assert len((tmp_path / "scores.txt").read_text().splitlines()) == 3
    np.testing.assert_array_equal(np.load(tmp_path / "a.npy"), np.ones(4, np.float32))
