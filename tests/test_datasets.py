"""SCL view-batch builders + loaders on a synthetic mini-database."""

import os

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.data.augment_registry import AugmentResources
from scl_deepfake_audio_detection_tpu.data.datasets import (
    EvalDataset,
    SCLBatchSpec,
    SCLViewBatchBuilder,
    spec_from_config,
)
from scl_deepfake_audio_detection_tpu.data.loader import EvalLoader, TrainLoader
from scl_deepfake_audio_detection_tpu.utils.audio_io import load_audio, save_wav

SR = 16000
VOCODERS = ["hifigan", "waveglow"]


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    """Mini SCL database: bonafide/, vocoded/, spoof/, eval/ + noise/rir."""
    root = tmp_path_factory.mktemp("scl_db")
    rng = np.random.default_rng(0)
    utts = [f"utt{i}.wav" for i in range(5)]
    for d in ("bonafide", "vocoded", "spoof", "eval"):
        os.makedirs(root / d, exist_ok=True)
    for u in utts:
        n = int(rng.integers(SR // 2, 2 * SR))
        save_wav(str(root / "bonafide" / u), rng.normal(size=n).astype(np.float32) * 0.2, SR)
        for v in VOCODERS:
            save_wav(
                str(root / "vocoded" / f"{v}_{u}"),
                rng.normal(size=n).astype(np.float32) * 0.2,
                SR,
            )
        save_wav(str(root / "spoof" / f"sp_{u}"), rng.normal(size=n).astype(np.float32) * 0.2, SR)
        save_wav(str(root / "eval" / u), rng.normal(size=n).astype(np.float32) * 0.2, SR)
    # noise + rir resources
    os.makedirs(root / "musan", exist_ok=True)
    os.makedirs(root / "rirs", exist_ok=True)
    save_wav(str(root / "musan" / "noise1.wav"), rng.normal(size=SR).astype(np.float32) * 0.1, SR)
    rir = np.zeros(400, np.float32)
    rir[0], rir[200] = 1.0, 0.3
    save_wav(str(root / "rirs" / "rir1.wav"), rir, SR)
    return root, utts


def _resources(root):
    return AugmentResources(
        noise_path=str(root / "musan"), rir_path=str(root / "rirs"), online=True
    )


def test_wav_roundtrip(db):
    root, utts = db
    x = load_audio(str(root / "bonafide" / utts[0]), SR)
    assert x.dtype == np.float32 and x.ndim == 1
    assert np.max(np.abs(x)) <= 1.0


@pytest.mark.parametrize(
    "variant,n_views,n_pos",
    [
        ("augall_3", 1 + 3 + 1 + 2 * 2, 5),  # conf-3 shape: methods=3, real=1
        ("aug_2", 1 + 3 + 2 * 1 + 2 * 2, 6),
        ("augall_5", 1 + 3 + 1 + 2 * 2 + 2, 5),
        ("scl_normal", 1 + 3 + 2 * 1 + 2 * 2, 6),
    ],
)
def test_view_composition(db, variant, n_views, n_pos):
    root, utts = db
    spec = SCLBatchSpec(
        variant=variant,
        vocoders=VOCODERS,
        augmentation_methods=["RawBoost12", "background_noise_wrapper", "reverb_wrapper"],
        num_additional_real=1,
        num_additional_spoof=2,
        trim_length=16000,
    )
    assert spec.num_views == n_views
    b = SCLViewBatchBuilder(spec, str(root), utts, _resources(root))
    utt, wav, labels = b.build(0)
    assert utt == utts[0]
    assert wav.shape == (n_views, 16000)
    assert labels.shape == (n_views,)
    assert int(labels.sum()) == n_pos
    assert np.all(np.isfinite(wav))


def test_conf3_view_count_is_11():
    """conf-3: 3 vocoders, 3 methods, 1 additional real -> 11 views 5 pos/6 neg
    (survey A11)."""
    spec = SCLBatchSpec(
        variant="augall_3",
        vocoders=["hifigan", "hn-sinc-nsf-hifi", "waveglow"],
        augmentation_methods=["RawBoost12", "background_noise_wrapper", "reverb_wrapper"],
        num_additional_real=1,
    )
    assert spec.num_views == 11


def test_xinwang_composition(db):
    root, utts = db
    spec = SCLBatchSpec(
        variant="xinwang",
        vocoders=VOCODERS,
        augmentation_methods=["RawBoost12"],
        trim_length=16000,
        repeat_pad=False,
    )
    b = SCLViewBatchBuilder(spec, str(root), utts, _resources(root))
    _, wav, labels = b.build(1)
    assert wav.shape == (1 + 1 + 2 * 2, 16000)
    assert int(labels.sum()) == 2


def test_builder_deterministic_per_epoch(db):
    root, utts = db
    spec = SCLBatchSpec(
        variant="augall_3", vocoders=VOCODERS, augmentation_methods=["RawBoost12"],
        num_additional_real=1, trim_length=8000,
    )
    b = SCLViewBatchBuilder(spec, str(root), utts, _resources(root), seed=7)
    _, w1, _ = b.build(2, epoch=3)
    _, w2, _ = b.build(2, epoch=3)
    _, w3, _ = b.build(2, epoch=4)
    np.testing.assert_array_equal(w1, w2)
    assert not np.allclose(w1, w3)


def test_offline_aug_cache(db, tmp_path):
    root, utts = db
    res = AugmentResources(aug_dir=str(tmp_path / "aug"), online=False)
    spec = SCLBatchSpec(
        variant="augall_3", vocoders=VOCODERS, augmentation_methods=["RawBoost12"],
        num_additional_real=1, trim_length=8000,
    )
    b = SCLViewBatchBuilder(spec, str(root), utts, res)
    b.build(0)
    cached = os.listdir(tmp_path / "aug" / "RawBoost12")
    assert utts[0] in cached  # anchor cached under its utt id


def test_train_loader_batches(db):
    root, utts = db
    spec = SCLBatchSpec(
        variant="augall_3", vocoders=VOCODERS, augmentation_methods=["RawBoost12"],
        num_additional_real=1, trim_length=8000,
    )
    b = SCLViewBatchBuilder(spec, str(root), utts, _resources(root))
    loader = TrainLoader(b, groups_per_step=2, num_workers=2, seed=5)
    assert len(loader) == 2  # 5 items, drop_last
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[0]["wav"].shape == (2, spec.num_views, 8000)
    assert batches[0]["labels"].shape == (2, spec.num_views)
    # epoch shuffling is seeded: same epoch -> same order
    again = list(loader.epoch(0))
    assert [b["utts"] for b in again] == [b["utts"] for b in batches]


def test_eval_loader_fixed_shapes(db):
    root, utts = db
    ds = EvalDataset(utts, str(root), padding_type="zero", cut=16000)
    loader = EvalLoader(ds, batch_size=2, num_workers=2)
    shapes = []
    seen = []
    for wav, ids in loader:
        shapes.append(wav.shape)
        seen += ids
    assert all(s == (2, 16000) for s in shapes)  # final batch padded up
    assert seen == utts


def test_spec_from_config_reference_yaml():
    from scl_deepfake_audio_detection_tpu.utils.config import load_config

    import conftest

    cfg = load_config(f"{conftest.REFERENCE}/configs/conf-3-linear.yaml")
    spec = spec_from_config(cfg.data.name, cfg.data.kwargs)
    assert spec.variant == "augall_3"
    assert spec.num_views == 11
    assert spec.trim_length == 64000


def test_train_loader_multihost_shards_disjoint(db):
    """Process shards draw disjoint, seed-stable, EQUAL-LENGTH slices of one
    global order.  Equal step counts are load-bearing: an extra step on some
    hosts would desync global-mesh collectives (pod deadlock), so up to
    num_shards-1 tail items are dropped per epoch (the seeded shuffle
    rotates which ones across epochs)."""
    root, utts = db
    spec = spec_from_config("asvspoof_2019_augall_3",
                            dict(vocoders=VOCODERS[:1], augmentation_methods=[],
                                 num_additional_real=1, trim_length=4000))
    b = SCLViewBatchBuilder(spec, str(root) + "/", utts, _resources(root), seed=0)
    loaders = [
        TrainLoader(b, 1, shuffle=True, num_workers=1, seed=3,
                    shard_index=i, num_shards=2, drop_last=False)
        for i in range(2)
    ]
    seen = [
        [batch["utts"][0] for batch in ld.epoch(0)] for ld in loaders
    ]
    assert not (set(seen[0]) & set(seen[1]))  # disjoint
    assert len(seen[0]) == len(seen[1]) == len(utts) // 2  # equal steps
    assert set(seen[0] + seen[1]) <= set(utts)
    # deterministic across re-iteration
    again = [batch["utts"][0] for batch in loaders[0].epoch(0)]
    assert again == seen[0]


def test_additional_reals_work_on_tiny_lists(db):
    """Pools smaller than num_additional_real fall back to with-replacement
    (the reference's replace=False would crash) — a 2-item dev list must
    serve num_additional_real=3 without error, keeping V static."""
    root, utts = db
    spec = spec_from_config("asvspoof_2019_augall_3",
                            dict(vocoders=VOCODERS[:1], augmentation_methods=[],
                                 num_additional_real=3, trim_length=4000))
    b = SCLViewBatchBuilder(spec, str(root) + "/", utts[:2], _resources(root),
                            seed=0)
    utt, wav, labels = b.build(0, epoch=0)
    assert wav.shape[0] == spec.num_views
    raw = b.build_raw(0, epoch=0)
    assert raw["reals"].shape[0] == 3


def test_additional_reals_distinct_and_exclude_anchor(db):
    """Reference sampling semantics (asvspoof_2019_augall_3.py:127-130):
    additional reals are k DISTINCT bonafides with the anchor excluded
    (idxs.remove(idx) + np.random.choice(..., replace=False))."""
    from scl_deepfake_audio_detection_tpu.data.datasets import _sample_distinct

    rng = np.random.default_rng(0)
    for _ in range(50):
        picks = _sample_distinct(rng, 6, 3, exclude=2)
        assert len(picks) == 3
        assert len(set(picks.tolist())) == 3          # distinct
        assert 2 not in picks                          # anchor excluded
    # spoof pools (no anchor) are also distinct
    for _ in range(50):
        picks = _sample_distinct(rng, 4, 4)
        assert sorted(picks.tolist()) == [0, 1, 2, 3]
    # degenerate 1-file list: anchor reused rather than crashing
    picks = _sample_distinct(rng, 1, 2, exclude=0)
    assert picks.tolist() == [0, 0]


def test_offline_cache_miss_and_hit_return_identical_audio(db, tmp_path):
    """Reference offline semantics: the populating epoch re-reads the cache
    file it just wrote, so miss and hit return BIT-identical [-1,1] floats
    (an int16-scale miss return would be ~90 dB louder than later epochs)."""
    from scl_deepfake_audio_detection_tpu.utils.registry import AUGMENTATIONS

    root, utts = db
    res = AugmentResources(
        noise_path=str(root / "musan"), rir_path=str(root / "rirs"),
        aug_dir=str(tmp_path / "aug"), online=False,
    )
    wav = load_audio(str(root / "bonafide" / utts[0]), SR)
    for method in ("background_noise_wrapper", "reverb_wrapper", "RawBoost12"):
        fn = AUGMENTATIONS.get(method)
        miss = fn(wav, np.random.default_rng(0), res, utt_id=utts[0])
        hit = fn(wav, np.random.default_rng(1), res, utt_id=utts[0])
        np.testing.assert_array_equal(miss, hit)
        assert np.max(np.abs(miss)) <= 1.0, method  # stored scale, not int16


def test_offline_cache_quiet_int16_output_not_clipped(db, tmp_path):
    """A very quiet augmented view (int16-scale peak < 8) must round-trip
    through the cache as quiet audio — the old amplitude heuristic wrote it
    unscaled and every sample saturated on the PCM16 write."""
    from scl_deepfake_audio_detection_tpu.utils.registry import AUGMENTATIONS

    root, utts = db
    res = AugmentResources(
        noise_path=str(root / "musan"), rir_path=str(root / "rirs"),
        aug_dir=str(tmp_path / "aug"), online=False,
    )
    quiet = np.full(8000, 1e-4, np.float32)  # int16 peak ~3.3 after volume
    fn = AUGMENTATIONS.get("volume_wrapper")
    out = fn(quiet, np.random.default_rng(0), res, utt_id="quiet.wav")
    assert np.max(np.abs(out)) < 0.01  # still quiet, not full-scale garbage


def test_offline_cache_basename_collision_raises(db, tmp_path):
    from scl_deepfake_audio_detection_tpu.utils.registry import AUGMENTATIONS

    root, utts = db
    res = AugmentResources(
        aug_dir=str(tmp_path / "aug"), online=False,
    )
    wav = np.zeros(4000, np.float32)
    fn = AUGMENTATIONS.get("RawBoost12")
    fn(wav, np.random.default_rng(0), res, utt_id="dirA/X.wav")
    with pytest.raises(ValueError, match="collision"):
        fn(wav, np.random.default_rng(0), res, utt_id="dirB/X.wav")


def test_build_raw_roles_match_variant(db):
    """build_raw must decode exactly the roles the variant's recipe uses:
    a spoof/ dir on disk must NOT leak spoof views into an augall_3 run
    (compose_views concatenates whatever arrives)."""
    spec3 = SCLBatchSpec(
        variant="augall_3", vocoders=VOCODERS, augmentation_methods=["RawBoost12"],
        num_additional_real=1, num_additional_spoof=2, trim_length=8000,
    )
    root, utts = db
    b3 = SCLViewBatchBuilder(spec3, str(root), utts, _resources(root), seed=3)
    raw = b3.build_raw(0, epoch=0)
    assert raw["spoofs"].shape[0] == 0  # augall_3 never uses spoof views
    assert raw["reals"].shape[0] == 1
    assert raw["vocoded"].shape[0] == 2

    spec5 = SCLBatchSpec(
        variant="augall_5", vocoders=VOCODERS, augmentation_methods=["RawBoost12"],
        num_additional_real=1, num_additional_spoof=2, trim_length=8000,
    )
    b5 = SCLViewBatchBuilder(spec5, str(root), utts, _resources(root), seed=3)
    raw5 = b5.build_raw(0, epoch=0)
    assert raw5["spoofs"].shape[0] == 2


def test_train_loader_early_exit_stops_producer(db):
    """Breaking out of the epoch iterator must unblock and terminate the
    producer thread (a plain put() on the full prefetch queue would park it
    forever, leaking the thread and prefetch+1 full batches)."""
    import threading

    spec = SCLBatchSpec(
        variant="augall_3", vocoders=VOCODERS, augmentation_methods=["RawBoost12"],
        num_additional_real=1, trim_length=8000,
    )
    root, utts = db
    b = SCLViewBatchBuilder(spec, str(root), utts, _resources(root))
    before = set(threading.enumerate())
    loader = TrainLoader(b, groups_per_step=1, num_workers=1, seed=5)
    for batch in loader.epoch(0):
        break  # early exit with 4 more steps pending
    leaked = None
    for _ in range(100):  # producer observes stop within ~100 ms
        leaked = [t for t in threading.enumerate()
                  if t not in before and t.is_alive()]
        if not leaked:
            break
        import time

        time.sleep(0.05)
    assert not leaked, leaked


def test_train_loader_batches_invariant_to_worker_count(db):
    """Reproducibility contract: batch contents depend only on (seed, epoch,
    index) — never on how many worker threads built them (pool.map preserves
    order; per-item RNG derives from idx/epoch)."""
    spec = SCLBatchSpec(
        variant="augall_3", vocoders=VOCODERS, augmentation_methods=["RawBoost12"],
        num_additional_real=1, trim_length=8000,
    )
    root, utts = db
    def batches(workers):
        b = SCLViewBatchBuilder(spec, str(root), utts, _resources(root), seed=9)
        loader = TrainLoader(b, groups_per_step=2, num_workers=workers, seed=9)
        return list(loader.epoch(1))

    b1, b4 = batches(1), batches(4)
    assert len(b1) == len(b4)
    for x, y in zip(b1, b4):
        assert x["utts"] == y["utts"]
        np.testing.assert_array_equal(x["wav"], y["wav"])
        np.testing.assert_array_equal(x["labels"], y["labels"])
