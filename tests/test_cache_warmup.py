"""Offline augmentation cache warm-up (data/cache_warmup.py)."""

import os

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.data.augment_registry import AugmentResources
from scl_deepfake_audio_detection_tpu.data.cache_warmup import (
    enumerate_cache_jobs,
    warm_aug_cache,
)
from scl_deepfake_audio_detection_tpu.data.datasets import (
    SCLBatchSpec,
    SCLViewBatchBuilder,
)
from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

SR = 16000
VOCODERS = ["hifigan", "waveglow"]
METHODS = ["RawBoost12", "background_noise_wrapper", "reverb_wrapper"]


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    root = tmp_path_factory.mktemp("warm_db")
    rng = np.random.default_rng(0)
    utts = [f"utt{i}.wav" for i in range(4)]
    for d in ("bonafide", "vocoded", "spoof"):
        os.makedirs(root / d, exist_ok=True)
    for u in utts:
        n = int(rng.integers(SR // 2, SR))
        save_wav(str(root / "bonafide" / u), rng.normal(size=n).astype(np.float32) * 0.2, SR)
        for v in VOCODERS:
            save_wav(str(root / "vocoded" / f"{v}_{u}"),
                     rng.normal(size=n).astype(np.float32) * 0.2, SR)
        save_wav(str(root / "spoof" / f"sp_{u}"),
                 rng.normal(size=n).astype(np.float32) * 0.2, SR)
    os.makedirs(root / "musan", exist_ok=True)
    os.makedirs(root / "rirs", exist_ok=True)
    save_wav(str(root / "musan" / "n.wav"), rng.normal(size=SR).astype(np.float32) * 0.1, SR)
    rir = np.zeros(200, np.float32)
    rir[0] = 1.0
    save_wav(str(root / "rirs" / "r.wav"), rir, SR)
    return root, utts


def _builder(root, utts, aug_dir, variant="augall_3"):
    spec = SCLBatchSpec(
        variant=variant, vocoders=VOCODERS, augmentation_methods=METHODS,
        num_additional_real=1, num_additional_spoof=1, trim_length=8000,
    )
    res = AugmentResources(
        noise_path=str(root / "musan"), rir_path=str(root / "rirs"),
        aug_dir=str(aug_dir), online=False,
    )
    return SCLViewBatchBuilder(spec, str(root), utts, res, seed=7)


@pytest.mark.parametrize(
    "variant,expected",
    [
        # 4 bonafide x 3 methods + 4 utts x 2 vocoders x methods[:1]
        ("augall_3", 4 * 3 + 4 * 2 * 1),
        ("augall_5", 4 * 3 + 4 * 2 * 1),
        # vocoded views use a random method -> cache all 3
        ("aug_2", 4 * 3 + 4 * 2 * 3),
        ("xinwang", 4 * 3 + 4 * 2 * 3),
        # no vocoders; 4 spoof files x 3 methods
        ("scl_normal", 4 * 3 + 4 * 3),
    ],
)
def test_enumerate_jobs_per_variant(db, tmp_path, variant, expected):
    root, utts = db
    b = _builder(root, utts, tmp_path / "aug", variant)
    assert len(enumerate_cache_jobs(b)) == expected


def test_warm_then_build_reads_cache(db, tmp_path):
    root, utts = db
    aug = tmp_path / "aug"
    b = _builder(root, utts, aug)
    stats = warm_aug_cache(b, num_workers=4)
    assert stats.failed == 0
    assert stats.written == stats.total == len(enumerate_cache_jobs(b))
    # the wrapper's cache dir name can differ from the registry name
    assert sorted(os.listdir(aug)) == ["RawBoost12", "background_noise", "reverb"]
    assert len(os.listdir(aug / "RawBoost12")) == 4 + 4 * 2  # bonafide + vocoded

    # a subsequent build must not add or rewrite any cache file
    before = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(aug) for p in fs
    }
    _, wav, labels = b.build(0)
    after = {
        p: os.path.getmtime(os.path.join(r, p))
        for r, _, fs in os.walk(aug) for p in fs
    }
    assert before == after
    assert np.all(np.isfinite(wav)) and labels.shape[0] == b.spec.num_views


def test_rerun_is_idempotent(db, tmp_path):
    root, utts = db
    b = _builder(root, utts, tmp_path / "aug")
    warm_aug_cache(b, num_workers=2)
    again = warm_aug_cache(b, num_workers=2)
    assert again.written == 0 and again.existing == again.total


def test_lazily_grown_cache_is_reused(db, tmp_path):
    root, utts = db
    b = _builder(root, utts, tmp_path / "aug")
    b.build(0)  # lazy path writes the anchor-group entries
    stats = warm_aug_cache(b, num_workers=2)
    assert stats.existing > 0 and stats.failed == 0
    assert stats.existing + stats.written == stats.total


def test_requires_offline_resources(db, tmp_path):
    root, utts = db
    b = _builder(root, utts, tmp_path / "aug")
    b.res.online = True
    with pytest.raises(ValueError, match="offline"):
        warm_aug_cache(b)


def test_bad_file_counts_as_failed(db, tmp_path):
    root, utts = db
    missing = utts + ["missing.wav"]
    b = _builder(root, missing, tmp_path / "aug")
    stats = warm_aug_cache(b, num_workers=2)
    assert stats.failed == len(METHODS) + len(VOCODERS) * 1  # bona + vocoded jobs
    assert stats.written == stats.total - stats.failed


def test_enumerate_jobs_skips_uncached_methods(db, tmp_path):
    """time_mask/freq_mask have no offline cache: warming them would redo
    the DSP every run and misreport 'written' entries."""
    root, utts = db
    spec = SCLBatchSpec(
        variant="augall_3", vocoders=VOCODERS,
        augmentation_methods=["RawBoost12", "time_mask", "freq_mask"],
        num_additional_real=1, trim_length=8000,
    )
    res = AugmentResources(
        noise_path=str(root / "musan"), rir_path=str(root / "rirs"),
        aug_dir=str(tmp_path / "aug"), online=False,
    )
    b = SCLViewBatchBuilder(spec, str(root), utts, res, seed=7)
    jobs = enumerate_cache_jobs(b)
    assert all(m == "RawBoost12" for _, m in jobs)
    # 4 bonafide + 4x2 vocoded (first method only)
    assert len(jobs) == 4 + 4 * 2
