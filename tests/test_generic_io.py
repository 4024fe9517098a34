"""Tests for the generic dir/ext/dim dataset IO (data/generic_io.py) —
the capability match for the vendored NII generic data pipeline
(reference core_scripts/data_io/{io_tools,default_data_io,
customize_collate_fn,customize_dataset}.py)."""

import os
import struct

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.data.generic_io import (
    ConcatDataset,
    FeatureSpec,
    GenericDataset,
    SeqInfo,
    append_raw_mat,
    collate_varlen,
    htk_num_frames,
    length_mask,
    pad_to_bucket,
    raw_mat_num_elements,
    read_htk,
    read_htk_header,
    read_raw_mat,
    write_htk,
    write_raw_mat,
)


# ---------------------------------------------------------------------------
# raw matrix + HTK IO
# ---------------------------------------------------------------------------


def test_raw_mat_roundtrip_and_bytes(tmp_path, rng):
    data = rng.standard_normal((7, 3)).astype(np.float32)
    p = str(tmp_path / "x.bin")
    write_raw_mat(data, p)
    # byte-level: flat little-endian float32, row-major — the NII wire format
    # (io_tools.f_write_raw_mat:171-205)
    raw = open(p, "rb").read()
    assert raw == struct.pack("<21f", *data.reshape(-1).tolist())
    back = read_raw_mat(p, 3)
    np.testing.assert_array_equal(back, data)
    assert raw_mat_num_elements(p) == 21


def test_raw_mat_col1_returns_1d(tmp_path):
    p = str(tmp_path / "v.bin")
    write_raw_mat(np.arange(5, dtype=np.float32), p)
    back = read_raw_mat(p, 1)
    assert back.ndim == 1
    np.testing.assert_array_equal(back, np.arange(5, dtype=np.float32))


def test_raw_mat_append(tmp_path):
    p = str(tmp_path / "a.bin")
    write_raw_mat(np.ones((2, 4), np.float32), p)
    append_raw_mat(np.zeros((3, 4), np.float32), p)
    back = read_raw_mat(p, 4)
    assert back.shape == (5, 4)
    np.testing.assert_array_equal(back[:2], 1.0)
    np.testing.assert_array_equal(back[2:], 0.0)


def test_raw_mat_big_endian(tmp_path):
    data = np.array([[1.5, -2.0]], np.float32)
    p = str(tmp_path / "be.bin")
    write_raw_mat(data, p, end="b")
    assert open(p, "rb").read() == struct.pack(">2f", 1.5, -2.0)
    np.testing.assert_array_equal(read_raw_mat(p, 2, end="b"), data)


def test_htk_roundtrip_and_header(tmp_path, rng):
    data = rng.standard_normal((11, 13)).astype(np.float32)
    p = str(tmp_path / "f.htk")
    write_htk(data, p, samp_period=50000, parm_kind=9)
    hdr = read_htk_header(p)
    # 12-byte HTK header layout (io_tools.f_write_htk:243-303)
    assert hdr == {
        "n_samples": 11,
        "samp_period": 50000,
        "samp_size": 13 * 4,
        "parm_kind": 9,
    }
    raw = open(p, "rb").read()
    assert raw[:12] == struct.pack("<iihh", 11, 50000, 52, 9)
    np.testing.assert_array_equal(read_htk(p), data)
    assert htk_num_frames(p) == 11


def test_htk_1d_writes_single_column(tmp_path):
    p = str(tmp_path / "one.htk")
    write_htk(np.arange(4, dtype=np.float32), p)
    assert read_htk_header(p)["samp_size"] == 4
    np.testing.assert_array_equal(read_htk(p)[:, 0], np.arange(4))


# ---------------------------------------------------------------------------
# dataset fixtures
# ---------------------------------------------------------------------------


def _make_corpus(root, names_lengths, feat_dim=4, lab_dim=2, reso=1, seed=0):
    """Write a raw-mat corpus: feat/<utt>.fea [L, feat_dim] and
    lab/<utt>.lab [L, lab_dim]."""
    rng = np.random.default_rng(seed)
    fd, ld = os.path.join(root, "feat"), os.path.join(root, "lab")
    os.makedirs(fd, exist_ok=True)
    os.makedirs(ld, exist_ok=True)
    truth = {}
    for name, L in names_lengths:
        x = (rng.standard_normal((L, feat_dim)) * 3 + 1).astype(np.float32)
        y = rng.standard_normal((L, lab_dim)).astype(np.float32)
        write_raw_mat(x, os.path.join(fd, name + ".fea"))
        write_raw_mat(y, os.path.join(ld, name + ".lab"))
        truth[name] = (x, y)
    return (
        FeatureSpec(fd, ".fea", feat_dim, reso),
        FeatureSpec(ld, ".lab", lab_dim, reso),
        truth,
    )


def test_dataset_normalization_and_content(tmp_path):
    fspec, lspec, truth = _make_corpus(
        str(tmp_path), [("u1", 50), ("u2", 80), ("u3", 30)]
    )
    ds = GenericDataset("train", ["u1", "u2", "u3"], [fspec], [lspec])
    assert len(ds) == 3
    # normalized over the whole corpus: global mean ~0, std ~1
    allx = np.concatenate([ds[i][0] for i in range(3)])
    np.testing.assert_allclose(allx.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(allx.std(0, ddof=1), 1.0, atol=1e-3)
    # de-normalizing recovers the file content exactly
    x0, y0, info0 = ds[0]
    np.testing.assert_allclose(
        x0 * ds.in_std + ds.in_mean, truth["u1"][0], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        y0 * ds.out_std + ds.out_mean, truth["u1"][1], rtol=1e-5, atol=1e-5
    )
    assert info0.name == "u1" and info0.length == 50


def test_dataset_truncation_segments(tmp_path):
    fspec, lspec, _ = _make_corpus(str(tmp_path), [("u1", 100), ("u2", 45)])
    ds = GenericDataset(
        "tr", ["u1", "u2"], [fspec], [lspec], truncate_seq=40, compute_norm_stats=False
    )
    # u1: 40+40+20, u2: 40+5 (f_log_seq_info:1011-1051 greedy split)
    segs = [(s.name, s.length, s.start_pos) for s in ds.seq_info]
    assert segs == [
        ("u1", 40, 0),
        ("u1", 40, 40),
        ("u1", 20, 80),
        ("u2", 40, 0),
        ("u2", 5, 40),
    ]
    # segments reassemble to the full (unnormalized) file
    parts = [ds[i][0] for i in range(3)]
    full = np.concatenate(parts)
    whole = fspec.load("u1")
    np.testing.assert_allclose(full, whole, rtol=1e-6)


def test_dataset_min_seq_len_filters_short_segments(tmp_path):
    fspec, _, _ = _make_corpus(str(tmp_path), [("u1", 100), ("u2", 45)])
    ds = GenericDataset(
        "tr",
        ["u1", "u2"],
        [fspec],
        truncate_seq=40,
        min_seq_len=30,
        compute_norm_stats=False,
    )
    # the 20- and 5-tick tails are dropped
    assert [(s.name, s.length) for s in ds.seq_info] == [
        ("u1", 40),
        ("u1", 40),
        ("u2", 40),
    ]


def test_multi_stream_concat_and_reso(tmp_path):
    """Two aligned streams at different rates: a frame feature at reso=5 and
    a sample-rate label; length snaps to the coarse grid and frames repeat
    to the finest rate."""
    root = str(tmp_path)
    fd, ld = os.path.join(root, "frame"), os.path.join(root, "samp")
    os.makedirs(fd)
    os.makedirs(ld)
    frames = np.arange(10, dtype=np.float32).reshape(10, 1)  # 10 frames @ reso 5
    samples = np.arange(52, dtype=np.float32).reshape(52, 1)  # 52 ticks
    write_raw_mat(frames, os.path.join(fd, "u.f"))
    write_raw_mat(samples, os.path.join(ld, "u.s"))
    ds = GenericDataset(
        "mix",
        ["u"],
        [FeatureSpec(fd, ".f", 1, reso=5), FeatureSpec(ld, ".s", 1, reso=1)],
        compute_norm_stats=False,
    )
    x, _, info = ds[0]
    # min(10*5, 52) = 50, already a multiple of single_reso=5
    assert info.length == 50 and x.shape == (50, 2)
    # frame stream repeats each value 5x; sample stream passes through
    np.testing.assert_array_equal(x[:, 0], np.repeat(np.arange(10), 5))
    np.testing.assert_array_equal(x[:, 1], np.arange(50))


def test_stats_cache_roundtrip(tmp_path):
    fspec, lspec, _ = _make_corpus(str(tmp_path), [("u1", 60), ("u2", 40)])
    stats = str(tmp_path / "stats")
    ds1 = GenericDataset("tr", ["u1", "u2"], [fspec], [lspec], stats_dir=stats)
    ds2 = GenericDataset("tr", ["u1", "u2"], [fspec], [lspec], stats_dir=stats)
    np.testing.assert_array_equal(ds1.in_mean, ds2.in_mean)
    np.testing.assert_array_equal(ds1.in_std, ds2.in_std)
    # cached lengths honored
    assert ds1.lengths() == ds2.lengths()
    # stale cache (different file list) is ignored, not misapplied
    ds3 = GenericDataset(
        "tr", ["u1"], [fspec], [lspec], stats_dir=stats, compute_norm_stats=False
    )
    assert ds3.lengths() == [60]


def test_normalize_false_stream_is_identity(tmp_path):
    fspec, _, truth = _make_corpus(str(tmp_path), [("u1", 30)])
    raw_spec = FeatureSpec(fspec.dir, fspec.ext, fspec.dim, normalize=False)
    ds = GenericDataset("tr", ["u1"], [raw_spec])
    x, _, _ = ds[0]
    np.testing.assert_allclose(x, truth["u1"][0], rtol=1e-6)


def test_put_item_denormalizes(tmp_path):
    fspec, lspec, truth = _make_corpus(str(tmp_path), [("u1", 20)])
    ds = GenericDataset("tr", ["u1"], [fspec], [lspec])
    _, y, _ = ds[0]
    out = str(tmp_path / "gen")
    path = ds.put_item(y, out, "u1_gen")
    back = read_raw_mat(path, ds.out_dim)
    np.testing.assert_allclose(back, truth["u1"][1], rtol=1e-4, atol=1e-5)


def test_concat_dataset_global_indexing(tmp_path):
    fa, la, _ = _make_corpus(str(tmp_path / "a"), [("a1", 20), ("a2", 30)], seed=1)
    fb, lb, _ = _make_corpus(str(tmp_path / "b"), [("b1", 25)], seed=2)
    da = GenericDataset("a", ["a1", "a2"], [fa], [la], compute_norm_stats=False)
    db = GenericDataset("b", ["b1"], [fb], [lb], compute_norm_stats=False)
    cat = ConcatDataset([da, db])
    assert len(cat) == 3
    assert cat.seq_names() == ["a1", "a2", "b1"]
    x, _, info = cat[2]
    assert info.name == "b1" and info.idx == 2 and x.shape == (25, 4)
    with pytest.raises(IndexError):
        cat[3]


def test_concat_rejects_dim_mismatch(tmp_path):
    fa, _, _ = _make_corpus(str(tmp_path / "a"), [("a1", 10)], feat_dim=4)
    fb, _, _ = _make_corpus(str(tmp_path / "b"), [("b1", 10)], feat_dim=3)
    da = GenericDataset("a", ["a1"], [fa], compute_norm_stats=False)
    db = GenericDataset("b", ["b1"], [fb], compute_norm_stats=False)
    with pytest.raises(ValueError):
        ConcatDataset([da, db])


def test_seqinfo_str_roundtrip():
    s = SeqInfo(400, "utt7", 2, 800, 13)
    assert SeqInfo.from_str(s.to_str()) == s


# ---------------------------------------------------------------------------
# variable-length collation
# ---------------------------------------------------------------------------


def test_collate_varlen_pads_and_masks(rng):
    items = [rng.standard_normal((L, 3)).astype(np.float32) for L in (5, 9, 2)]
    batch, lengths = collate_varlen(items)
    assert batch.shape == (3, 9, 3)
    np.testing.assert_array_equal(lengths, [5, 9, 2])
    for i, it in enumerate(items):
        np.testing.assert_array_equal(batch[i, : it.shape[0]], it)
        np.testing.assert_array_equal(batch[i, it.shape[0] :], 0.0)
    mask = length_mask(lengths, batch.shape[1])
    np.testing.assert_array_equal(mask.sum(1), lengths)


def test_collate_bucketing_bounds_shape_count(rng):
    # 50 batches of random lengths in [100, 1600): bucketing to 256 must
    # produce at most ceil(1600/256)=7 distinct padded shapes — the XLA
    # compile-count win the fixed-shape design claims (vs ~50 exact-max
    # shapes without bucketing)
    shapes = set()
    exact_shapes = set()
    for i in range(50):
        r = np.random.default_rng(i)
        ls = r.integers(100, 1600, size=4)
        items = [np.zeros((L, 2), np.float32) for L in ls]
        b, _ = collate_varlen(items, bucket_multiple=256)
        assert b.shape[1] % 256 == 0 and b.shape[1] >= ls.max()
        shapes.add(b.shape)
        exact_shapes.add(int(ls.max()))
    assert len(shapes) <= 7
    assert len(exact_shapes) > 2 * len(shapes)  # bucketing actually collapsed


def test_collate_rejects_ragged_trailing_dims():
    with pytest.raises(ValueError):
        collate_varlen([np.zeros((4, 3)), np.zeros((4, 2))])


def test_pad_to_bucket():
    assert pad_to_bucket(1, 256) == 256
    assert pad_to_bucket(256, 256) == 256
    assert pad_to_bucket(257, 256) == 512
    assert pad_to_bucket(100, 1) == 100


def test_truncate_seq_snaps_to_coarsest_reso(tmp_path):
    """truncate_seq not divisible by single_reso floors to a multiple
    (reference f_adjust_len) so coarse streams never slice mid-frame."""
    root = str(tmp_path)
    fd, ld = os.path.join(root, "frame"), os.path.join(root, "samp")
    os.makedirs(fd)
    os.makedirs(ld)
    frames = np.arange(10, dtype=np.float32).reshape(10, 1)  # reso 5
    samples = np.arange(50, dtype=np.float32).reshape(50, 1)
    write_raw_mat(frames, os.path.join(fd, "u.f"))
    write_raw_mat(samples, os.path.join(ld, "u.s"))
    specs = [FeatureSpec(fd, ".f", 1, reso=5), FeatureSpec(ld, ".s", 1, reso=1)]
    ds = GenericDataset("tr", ["u"], specs, truncate_seq=12,
                        compute_norm_stats=False)
    assert ds.truncate_seq == 10  # floored from 12
    # every segment starts on a coarse frame boundary and reassembles exactly
    assert [(s.length, s.start_pos) for s in ds.seq_info] == \
        [(10, 0), (10, 10), (10, 20), (10, 30), (10, 40)]
    full = np.concatenate([ds[i][0] for i in range(len(ds))])
    np.testing.assert_array_equal(full[:, 0], np.repeat(np.arange(10), 5))
    np.testing.assert_array_equal(full[:, 1], np.arange(50))
    with pytest.raises(ValueError, match="coarsest"):
        GenericDataset("tr", ["u"], specs, truncate_seq=3,
                       compute_norm_stats=False)


def test_stale_stats_not_applied_to_changed_file_list(tmp_path):
    """Norm stats persisted for one file list must be recomputed, not
    reapplied, when the list changes (same freshness rule as lengths)."""
    fspec, lspec, _ = _make_corpus(
        str(tmp_path), [("u1", 60), ("u2", 40), ("u3", 50)], seed=3
    )
    stats = str(tmp_path / "stats")
    ds1 = GenericDataset("tr", ["u1", "u2"], [fspec], [lspec], stats_dir=stats)
    ds2 = GenericDataset("tr", ["u1", "u3"], [fspec], [lspec], stats_dir=stats)
    # recomputed over the new corpus -> still globally standardized
    allx = np.concatenate([ds2[i][0] for i in range(len(ds2))])
    np.testing.assert_allclose(allx.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(allx.std(0, ddof=1), 1.0, atol=1e-3)
    assert not np.allclose(ds1.in_mean, ds2.in_mean)
