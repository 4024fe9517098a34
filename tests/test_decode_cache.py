"""Packed eval decode cache (data/decode_cache.py): lossless for PCM16
sources, transparent through EvalDataset/EvalLoader, rebuild-safe."""

import os
import time

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.data.datasets import EvalDataset
from scl_deepfake_audio_detection_tpu.data.decode_cache import DecodeCache
from scl_deepfake_audio_detection_tpu.data.loader import EvalLoader
from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

SR = 16000


@pytest.fixture
def eval_dir(tmp_path, rng):
    d = tmp_path / "db" / "eval"
    os.makedirs(d)
    utts = []
    for i in range(5):
        n = int(rng.integers(3000, 9000))
        wav = (rng.normal(size=n) * 0.2).astype(np.float32)
        save_wav(str(d / f"u{i}.wav"), wav, SR)
        utts.append(f"u{i}.wav")
    return str(tmp_path / "db"), utts


def test_cache_roundtrip_lossless(eval_dir, tmp_path):
    base, utts = eval_dir
    ds = EvalDataset(utts, base, padding_type="zero")
    ref = [ds.get(i) for i in range(len(ds))]

    cache = ds.warm_decode_cache(str(tmp_path / "cache"), num_workers=2)
    assert cache.ready and len(cache) == len(utts)
    assert cache.sample_rate == SR
    got = [ds.get(i) for i in range(len(ds))]
    for (w0, u0), (w1, u1) in zip(ref, got):
        assert u0 == u1
        # PCM16-sourced audio round-trips bit-exactly through the cache
        np.testing.assert_array_equal(w0, w1)


def test_cache_reopen_without_rebuild(eval_dir, tmp_path):
    base, utts = eval_dir
    ds = EvalDataset(utts, base)
    cdir = str(tmp_path / "cache")
    ds.warm_decode_cache(cdir, num_workers=2)
    bin_mtime = os.path.getmtime(os.path.join(cdir, "pcm16.bin"))
    time.sleep(0.01)
    # a second dataset over the same files opens the existing cache
    ds2 = EvalDataset(utts, base)
    ds2.warm_decode_cache(cdir)
    assert os.path.getmtime(os.path.join(cdir, "pcm16.bin")) == bin_mtime
    np.testing.assert_array_equal(ds2.get(3)[0], ds.get(3)[0])


def test_cache_miss_falls_back_to_decode(eval_dir, tmp_path, rng):
    base, utts = eval_dir
    ds = EvalDataset(utts[:3], base)
    ds.warm_decode_cache(str(tmp_path / "cache"))
    # extend the file list past the cache: new utt decodes directly
    new = (rng.normal(size=4000) * 0.2).astype(np.float32)
    save_wav(os.path.join(base, "eval", "new.wav"), new, SR)
    ds.files.append("new.wav")
    wav, utt = ds.get(3)
    assert utt == "new.wav" and wav.shape == (64600,)


def test_eval_loader_through_cache(eval_dir, tmp_path):
    base, utts = eval_dir
    ds = EvalDataset(utts, base)
    ref_batches = [(w.copy(), u) for w, u in EvalLoader(ds, batch_size=2)]
    ds.warm_decode_cache(str(tmp_path / "cache"))
    for (w0, u0), (w1, u1) in zip(ref_batches, EvalLoader(ds, batch_size=2)):
        assert u0 == u1
        np.testing.assert_array_equal(w0, w1)


def test_interrupted_build_leaves_no_cache(eval_dir, tmp_path):
    base, utts = eval_dir
    cdir = str(tmp_path / "cache")

    calls = {"n": 0}

    def flaky_load(utt):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("decode died")
        return np.zeros(1000, np.float32)

    with pytest.raises(RuntimeError):
        DecodeCache.build(cdir, utts, flaky_load, num_workers=1)
    assert not DecodeCache(cdir).ready  # tmp files only, no valid index
    # and a clean rebuild over the wreckage works
    ds = EvalDataset(utts, base)
    cache = ds.warm_decode_cache(cdir)
    assert cache.ready and len(cache) == len(utts)


def test_stale_index_bin_pair_rejected(eval_dir, tmp_path):
    """A kill between the bin and index renames can pair a new bin with a
    stale index; the opener must reject the pair instead of serving wrong
    offsets."""
    base, utts = eval_dir
    cdir = str(tmp_path / "cache")
    EvalDataset(utts, base).warm_decode_cache(cdir)
    # simulate: bin grows (new build committed) but index stayed old
    with open(os.path.join(cdir, "pcm16.bin"), "ab") as f:
        f.write(b"\x00\x00" * 100)
    assert not DecodeCache(cdir).ready


def test_sample_rate_mismatch_triggers_rebuild(eval_dir, tmp_path):
    base, utts = eval_dir
    cdir = str(tmp_path / "cache")
    EvalDataset(utts, base, sample_rate=16000).warm_decode_cache(cdir)
    ds8k = EvalDataset(utts, base, sample_rate=8000, cut=32300)
    cache = ds8k.warm_decode_cache(cdir)
    assert cache.sample_rate == 8000


def test_incremental_rebuild_reuses_old_cache(eval_dir, tmp_path, rng, monkeypatch):
    """One new file must not re-decode the whole set — hits read from the
    old memmap."""
    import scl_deepfake_audio_detection_tpu.data.datasets as D

    base, utts = eval_dir
    cdir = str(tmp_path / "cache")
    EvalDataset(utts, base).warm_decode_cache(cdir)

    new = (rng.normal(size=4000) * 0.2).astype(np.float32)
    save_wav(os.path.join(base, "eval", "extra.wav"), new, SR)

    calls = []
    real_load = D.load_audio
    monkeypatch.setattr(
        D, "load_audio", lambda p, sr: calls.append(p) or real_load(p, sr)
    )
    ds = EvalDataset(utts + ["extra.wav"], base)
    cache = ds.warm_decode_cache(cdir)
    assert len(cache) == len(utts) + 1
    assert len(calls) == 1 and calls[0].endswith("extra.wav")


def test_cache_with_int16_wire(eval_dir, tmp_path):
    """Decode cache + PCM16 wire compose: the cache stores int16, the wire
    re-quantizes losslessly, and batches equal the direct float path."""
    base, utts = eval_dir
    ds = EvalDataset(utts, base, cut=8000)
    ref = [(w.copy(), u) for w, u in EvalLoader(ds, batch_size=2)]
    ds.warm_decode_cache(str(tmp_path / "cache"))
    wired = list(EvalLoader(ds, batch_size=2, wire_dtype="int16"))
    for (w0, u0), (w1, u1) in zip(ref, wired):
        assert u0 == u1 and w1.dtype == np.int16
        np.testing.assert_array_equal(
            w0, w1.astype(np.float32) / 32768.0
        )
