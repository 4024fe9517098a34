"""Tests for train/logs.py, utils/warehouse.py, and rank_norm — the
reference's log_parser / data_warehouse / mos_norm utility capabilities."""

import json

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.train import logs
from scl_deepfake_audio_detection_tpu.utils.stats import rank_norm
from scl_deepfake_audio_detection_tpu.utils.warehouse import DataWarehouse


def test_read_metrics_jsonl(tmp_path):
    p = tmp_path / "metrics.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"epoch": 0, "lr": 1e-4, "train_loss": 2.0}) + "\n")
        f.write(
            json.dumps(
                {"epoch": 1, "lr": 2e-4, "train_loss": 1.5, "val_loss": 1.7}
            )
            + "\n"
        )
    cols = logs.read_metrics_jsonl(str(p))
    np.testing.assert_array_equal(cols["epoch"], [0, 1])
    np.testing.assert_allclose(cols["train_loss"], [2.0, 1.5])
    assert np.isnan(cols["val_loss"][0]) and cols["val_loss"][1] == 1.7


def test_read_log_err_reference_format(tmp_path):
    p = tmp_path / "log_err"
    with open(p, "w") as f:
        f.write("starting up\n")
        f.write("10753,LJ045-0082,0,9216,0, 22/12100, Time: 0.190877s, "
                "Loss: 85.994621, Loss: 1.25\n")
        f.write("10754,LJ045-0083,0,9216,0, 23/12100, Time: 0.2s, Loss: 84.0\n")
    mat, times = logs.read_log_err(str(p))
    assert mat.shape == (2, 2)
    np.testing.assert_allclose(mat[0], [85.994621, 1.25])
    assert np.isnan(mat[1, 1]) and mat[1, 0] == 84.0
    np.testing.assert_allclose(times, [0.190877, 0.2])


def test_read_log_train_reference_format(tmp_path):
    p = tmp_path / "log_train"
    with open(p, "w") as f:
        f.write("Epoch | Duration | Train | Val | Best\n")
        f.write("----- | -------- | ----- | --- | ----\n")  # non-numeric row
        f.write("1 | 120.5 | 2.0/0.5 | 2.2/0.6 | yes\n")
        f.write("2 | 118.0 | 1.5 0.1/0.4 | 1.9/0.5 | no\n")
    trn, val, secs = logs.read_log_train(str(p))
    # the dashed separator row is skipped entirely (no silent zero rows)
    np.testing.assert_allclose(secs[-2:], [120.5, 118.0])
    np.testing.assert_allclose(trn[-2:], [[2.0, 0.5], [1.6, 0.4]])  # "1.5 0.1" sums
    np.testing.assert_allclose(val[-2:], [[2.2, 0.6], [1.9, 0.5]])


def test_read_log_err_epochs_split_and_merge(tmp_path):
    p = tmp_path / "log_err"
    lines = []
    # 2 epochs: 3 train utts (i/3) then 2 val utts (i/2) each
    for ep in range(2):
        for i in range(3):
            lines.append(f"{i}/3, Time: 0.1s, Loss: {ep + i + 1.0}")
        for i in range(2):
            lines.append(f"{i}/2, Time: 0.1s, Loss: {ep + i + 10.0}")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    trn, val = logs.read_log_err_epochs(str(p))
    assert trn.shape == (6, 1) and val.shape == (4, 1)
    trn_m, val_m = logs.read_log_err_epochs(str(p), merge_epoch=True)
    np.testing.assert_allclose(trn_m[:, 0], [2.0, 3.0])  # mean(1,2,3)=2 ...
    np.testing.assert_allclose(val_m[:, 0], [10.5, 11.5])


def test_data_warehouse_views(tmp_path):
    p = tmp_path / "scores.txt"
    with open(p, "w") as f:
        f.write("sysA A07 0.5\nsysA A08 0.7\nsysB A07 0.1\n"
                "sysB A07 0.3\nbadline\n")

    def value(line):
        parts = line.split()
        return float(parts[2]) if len(parts) == 3 else None

    def tag(i):
        return lambda line: (line.split()[i] if len(line.split()) == 3 else None)

    wh = DataWarehouse(str(p), [value], [[tag(0), tag(1)]])
    assert wh.tags(0) == ["sysA", "sysB"] and wh.tags(1) == ["A07", "A08"]
    assert wh.view([0], ["sysB"]) == [0.1, 0.3]
    assert wh.view([0, 1], ["sysA", "A08"]) == [0.7]

    grid = wh.cross_view(
        [0, 1], [["sysA", "sysB"], ["A07", "A08"]], to_numpy=True,
        statistics=np.mean,
    )
    np.testing.assert_allclose(grid[0], [0.5, 0.7])
    assert grid[1, 0] == 0.2 and np.isnan(grid[1, 1])  # sysB has no A08

    padded = wh.cross_view(
        [0, 1], [["sysA", "sysB"], ["A07", "A08"]], to_numpy=True
    )
    assert padded.shape == (2, 2, 2)
    np.testing.assert_allclose(padded[1, 0], [0.1, 0.3])
    assert np.isnan(padded[0, 0, 1])  # sysA/A07 has one value, padded


def test_rank_norm_reference_example():
    # the worked example in mos_norm.py:77-81
    got = rank_norm([2, 1, 2, 10, 4, 5, 6, 4, 5, 7], [1, 10])
    np.testing.assert_allclose(
        got, [0.15, 0.0, 0.15, 0.9, 0.35, 0.55, 0.7, 0.35, 0.55, 0.8]
    )
    # ties share their mean rank; (mean_rank - 1) / N
    np.testing.assert_allclose(rank_norm([1, 1, 2], [1, 3]), [1 / 6, 1 / 6, 2 / 3])
    assert rank_norm([3, 3], [1, 3]) == [0.25, 0.25]


def test_read_log_train_ragged_and_junk_rows(tmp_path):
    """A later epoch logging MORE loss terms must widen the matrices
    (NaN-padded like read_log_err), and footer/junk rows must be skipped
    rather than kept as silent all-zero curve points."""
    p = tmp_path / "log_train"
    with open(p, "w") as f:
        f.write("Epoch | Duration | Train | Val | Best\n")
        f.write("1 | 11.0 | 1.0 | 2.0 | yes\n")
        f.write("2 | 12.0 | 1.0/2.0/3.0 | 2.0/2.5 | no\n")   # wider row
        f.write("total | ----- | ----- | --- | ----\n")       # footer junk
    trn, val, secs = logs.read_log_train(str(p))
    np.testing.assert_allclose(secs, [11.0, 12.0])
    assert trn.shape == (2, 3) and val.shape == (2, 2)
    np.testing.assert_allclose(trn[0], [1.0, np.nan, np.nan])
    np.testing.assert_allclose(trn[1], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(val[0], [2.0, np.nan])
    # nothing parseable at all -> empty, not a crash
    q = tmp_path / "empty_log"
    q.write_text("Epoch | Duration | Train | Val\n--- | --- | --- | ---\n")
    trn, val, secs = logs.read_log_train(str(q))
    assert trn is None and val is None and secs.size == 0


def test_warehouse_view_rejects_constraint_length_mismatch(tmp_path):
    from scl_deepfake_audio_detection_tpu.utils.warehouse import DataWarehouse

    p = tmp_path / "scores.txt"
    p.write_text("sysA A07 0.5\n")
    value = lambda line: float(line.split()[2])
    tag = lambda i: (lambda line: line.split()[i])
    wh = DataWarehouse(str(p), [value], [[tag(0), tag(1)]])
    with pytest.raises(ValueError, match="tag_values"):
        wh.view([0, 1], ["sysA"])


def test_rank_norm_rejects_out_of_range():
    from scl_deepfake_audio_detection_tpu.utils.stats import rank_norm

    with pytest.raises(ValueError, match="outside data_range"):
        rank_norm([0, 1, 2], [1, 10])
