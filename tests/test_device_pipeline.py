"""On-device view-batch composition (data/device_pipeline.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.data.device_pipeline import (
    DeviceViewComposer,
    fft_reverb,
    mix_noise_at_snr,
)
from scl_deepfake_audio_detection_tpu.utils.config import RawBoostConfig


def test_mix_noise_snr_is_accurate(rng):
    wav = jnp.asarray(rng.normal(size=(3, 8000)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(3, 8000)).astype(np.float32))
    snr = jnp.asarray([[5.0], [10.0], [15.0]])
    out = mix_noise_at_snr(wav, noise, snr)
    added = np.asarray(out - wav)
    got = 10 * np.log10(np.mean(np.asarray(wav) ** 2, 1) / np.mean(added**2, 1))
    np.testing.assert_allclose(got, [5.0, 10.0, 15.0], atol=0.1)


def test_fft_reverb_identity_rir(rng):
    wav = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32))
    rir = jnp.zeros((2, 300), jnp.float32).at[:, 0].set(1.0)
    out = np.asarray(fft_reverb(wav, rir))
    # delta RIR -> peak-normalized copy of the input
    want = np.asarray(wav) / np.abs(np.asarray(wav)).max(axis=1, keepdims=True)
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_device_composer_conf3_layout(rng):
    g, t, n_real, n_voc = 2, 4000, 1, 3
    composer = DeviceViewComposer(
        RawBoostConfig(),
        noise_bank=rng.normal(size=(4, 8000)).astype(np.float32) * 0.1,
        rir_bank=np.eye(3, 400, dtype=np.float32),  # delta-ish RIRs
        nb=512,
    )
    anchors = rng.normal(size=(g, t)).astype(np.float32) * 0.3
    reals = rng.normal(size=(g, n_real, t)).astype(np.float32) * 0.3
    vocoded = rng.normal(size=(g, n_voc, t)).astype(np.float32) * 0.3

    views, labels = composer(anchors, reals, vocoded, jax.random.key(0))
    views, labels = np.asarray(views), np.asarray(labels)
    assert views.shape == (g, 4 + n_real + 2 * n_voc, t)  # 11 views
    assert labels.shape == (g, 11)
    np.testing.assert_array_equal(labels[0], [1] * 5 + [0] * 6)
    assert np.isfinite(views).all()
    # view 0 is the untouched anchor
    np.testing.assert_allclose(views[:, 0], anchors, atol=1e-6)
    # augmented views actually differ from the anchor
    for v in (1, 2, 3):
        assert not np.allclose(views[:, v], anchors)
    # vocoded negatives pass through; their RawBoost twins differ
    np.testing.assert_allclose(views[:, 5:8], vocoded, atol=1e-6)
    assert not np.allclose(views[:, 8:], vocoded)


def test_device_composer_feeds_train_step(rng):
    """Composed device batches drive the jitted train step directly."""
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.parallel import make_mesh
    from scl_deepfake_audio_detection_tpu.train.engine import Engine
    from scl_deepfake_audio_detection_tpu.train.optim import set_learning_rate
    from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig

    composer = DeviceViewComposer(
        RawBoostConfig(),
        noise_bank=rng.normal(size=(2, 6000)).astype(np.float32) * 0.1,
        rir_bank=np.eye(2, 200, dtype=np.float32),
        nb=512,  # 5 notch filters x <=100 taps convolve to <=~500 taps
    )
    g, t = 2, 3200
    views, labels = composer(
        rng.normal(size=(g, t)).astype(np.float32) * 0.3,
        rng.normal(size=(g, 1, t)).astype(np.float32) * 0.3,
        rng.normal(size=(g, 3, t)).astype(np.float32) * 0.3,
        jax.random.key(1),
    )
    model = LinearNLL(ssl=XLSRConfig.tiny(), emb_dim=16)
    eng = Engine(model, TrainConfig(max_lr=1e-4),
                 mesh=make_mesh((2, 1), devices=jax.devices()[:2]))
    params, buffers, opt = eng.init_state(jax.random.key(0))
    opt = set_learning_rate(opt, 1e-4)
    batch = eng.place_batch({"wav": np.asarray(views), "labels": np.asarray(labels)})
    _, _, _, m = eng.train_step(params, buffers, opt, batch, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


def test_build_raw_feeds_composer(tmp_path, rng):
    """Decode-only builder items -> device composer -> conf-3 view batch."""
    import os

    from scl_deepfake_audio_detection_tpu.data.datasets import (
        SCLViewBatchBuilder,
        spec_from_config,
    )
    from scl_deepfake_audio_detection_tpu.data.augment_registry import (
        AugmentResources,
    )
    from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

    root = tmp_path
    utts = [f"x{i}.wav" for i in range(3)]
    os.makedirs(root / "bonafide"); os.makedirs(root / "vocoded")
    for u in utts:
        n = int(rng.integers(5000, 9000))
        save_wav(str(root / "bonafide" / u), rng.normal(size=n).astype(np.float32) * 0.3, 16000)
        for v in ("hifigan", "waveglow"):
            save_wav(str(root / "vocoded" / f"{v}_{u}"),
                     rng.normal(size=n).astype(np.float32) * 0.3, 16000)

    spec = spec_from_config("asvspoof_2019_augall_3",
                            dict(vocoders=["hifigan", "waveglow"],
                                 augmentation_methods=["RawBoost12"],
                                 num_additional_real=1, trim_length=4000))
    b = SCLViewBatchBuilder(spec, str(root) + "/", utts,
                            AugmentResources(online=True), seed=0)
    items = [b.build_raw(i) for i in range(2)]
    anchors = np.stack([d["anchor"] for d in items])
    reals = np.stack([d["reals"] for d in items])
    voc = np.stack([d["vocoded"] for d in items])
    assert anchors.shape == (2, 4000)
    assert reals.shape == (2, 1, 4000) and voc.shape == (2, 2, 4000)
    assert items[0]["spoofs"].shape == (0, 4000)

    composer = DeviceViewComposer(
        RawBoostConfig(),
        noise_bank=rng.normal(size=(2, 6000)).astype(np.float32) * 0.1,
        rir_bank=np.eye(2, 200, dtype=np.float32),
        nb=512,
    )
    views, labels = composer(anchors, reals, voc, jax.random.key(0))
    assert views.shape == (2, 4 + 1 + 2 * 2, 4000)  # 9 views for 2 vocoders
    np.testing.assert_array_equal(np.asarray(labels)[0], [1] * 5 + [0] * 4)


@pytest.mark.parametrize("variant,n_views,n_pos", [
    ("augall_3", 11, 5),       # 1+3+1 pos, 3+3 neg
    ("augall_5", 12, 5),       # + 1 spoof neg
    ("aug_2", 12, 6),          # 1+3+1+1 pos, 3+3 neg
    ("scl_normal", 8, 6),      # 1+3+1+1 pos, 1+1 neg (no vocoded)
    ("xinwang", 16, 4),        # 1+3 pos, 3+3*3 neg
])
def test_compose_views_variants(rng, variant, n_views, n_pos):
    from scl_deepfake_audio_detection_tpu.data.device_pipeline import compose_views
    from scl_deepfake_audio_detection_tpu.dsp import rawboost_jax as RBJ
    import jax.numpy as jnp

    g, t = 2, 3200
    cfg = RawBoostConfig()
    n_voc = 0 if variant == "scl_normal" else 3
    n_real = 0 if variant == "xinwang" else 1
    n_spoof = 1 if variant in ("augall_5", "scl_normal") else 0
    anchors = rng.normal(size=(g, t)).astype(np.float32) * 0.3
    reals = rng.normal(size=(g, n_real, t)).astype(np.float32) * 0.3
    voc = rng.normal(size=(g, n_voc, t)).astype(np.float32) * 0.3
    spoofs = rng.normal(size=(g, n_spoof, t)).astype(np.float32) * 0.3
    rows = g * (1 + n_voc + n_real + n_spoof)
    chains = jnp.asarray(np.stack([
        RBJ.pack_chains(RBJ.design_lnl_chains(cfg, 16000, rng), 512)
        for _ in range(rows)
    ]).astype(np.float32))
    views, labels = compose_views(
        jnp.asarray(anchors), jnp.asarray(reals), jnp.asarray(voc),
        jnp.asarray(spoofs),
        jnp.asarray(rng.normal(size=(2, 6400)).astype(np.float32) * 0.1),
        jnp.asarray(np.eye(2, 200, dtype=np.float32)),
        chains, jax.random.key(0), cfg, variant,
    )
    assert views.shape == (g, n_views, t), (variant, views.shape)
    labels = np.asarray(labels)
    assert labels.shape == (g, n_views)
    np.testing.assert_array_equal(labels[0, :n_pos], 1)
    np.testing.assert_array_equal(labels[0, n_pos:], 0)
    assert np.isfinite(np.asarray(views)).all()


def test_int16_wire_matches_float_path():
    """Training-side PCM16 wire: the composer rescales on device; for
    int16-representable inputs the composed views are identical to the
    float32 wire."""
    import jax

    from scl_deepfake_audio_detection_tpu.data.device_pipeline import (
        DeviceViewComposer,
    )
    from scl_deepfake_audio_detection_tpu.utils.config import RawBoostConfig

    rng = np.random.default_rng(0)
    g, t = 2, 4000
    q = lambda x: np.clip(np.round(x * 32768), -32768, 32767) / 32768

    anchors = q(rng.normal(size=(g, t)) * 0.2).astype(np.float32)
    reals = q(rng.normal(size=(g, 1, t)) * 0.2).astype(np.float32)
    voc = q(rng.normal(size=(g, 2, t)) * 0.2).astype(np.float32)
    noise = (rng.normal(size=(1, 8000)) * 0.1).astype(np.float32)
    rir = np.zeros((1, 800), np.float32); rir[0, 0] = 1.0

    composer = DeviceViewComposer(RawBoostConfig(), noise, rir, seed=3)
    key = jax.random.key(1)
    v_f, l_f = composer(anchors, reals, voc, key)

    to16 = lambda x: np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    composer2 = DeviceViewComposer(RawBoostConfig(), noise, rir, seed=3)
    v_i, l_i = composer2(to16(anchors), to16(reals), to16(voc), key)

    np.testing.assert_array_equal(np.asarray(l_f), np.asarray(l_i))
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_i), atol=1e-6)


# --- snr_mode='reference': device path == host/reference distribution --------


def test_device_noise_matches_host_reference_semantics():
    """mix_noise_pydub (device) reproduces dsp.augment.background_noise
    (host, itself pinned against the reference pydub formula) sample-for-
    sample given the same signal/noise/SNR draw."""
    from scl_deepfake_audio_detection_tpu.data.device_pipeline import (
        mix_noise_pydub,
    )
    from scl_deepfake_audio_detection_tpu.dsp.augment import background_noise

    rng = np.random.default_rng(7)
    x = np.clip(rng.normal(size=16000) * 0.2, -0.9, 0.9).astype(np.float32)
    noise = np.clip(rng.normal(size=16000) * 0.05, -0.9, 0.9).astype(np.float32)
    for snr in (5, 10, 15):
        host = background_noise(
            x, noise, np.random.default_rng(0), min_snr_db=snr, max_snr_db=snr
        )
        dev = np.asarray(
            mix_noise_pydub(
                jnp.asarray(x)[None], jnp.asarray(noise)[None],
                jnp.asarray([[float(snr)]]),
            )
        )[0]
        # outputs are int16-amplitude; tolerance is a couple of LSB
        # (host computes the gain in f64 on quantized ints, device in f32)
        np.testing.assert_allclose(dev, host, atol=2.0)


def test_device_reverb_matches_host_reference_semantics():
    """Reference-mode device reverb reproduces the host reverb's
    peak-normalized int16-amplitude output (dsp.augment.reverb) over the
    co-cropped region."""
    from scl_deepfake_audio_detection_tpu.dsp.augment import reverb

    rng = np.random.default_rng(3)
    t = 8000
    x = np.clip(rng.normal(size=t) * 0.2, -0.9, 0.9).astype(np.float32)
    rir = (np.exp(-np.arange(400) / 60.0) * rng.normal(size=400) * 0.2).astype(
        np.float32
    )
    rir[0] = 1.0  # direct path dominates -> the peak lands inside [0, t)
    host = reverb(x, rir)[:t]
    dev = np.asarray(
        jnp.trunc(fft_reverb(jnp.asarray(x)[None], jnp.asarray(rir)[None]) * 32768.0)
    )[0]
    # the positive peak sample wraps to -32768 in the host's int16 round trip
    dev = np.where(dev >= 32768.0, dev - 65536.0, dev)
    np.testing.assert_allclose(dev, host, atol=2.0)


def test_compose_views_reference_mode_scales(rng):
    """In the default 'reference' mode the noise/reverb anchor views come out
    at int16 amplitude (the pydub quirk the reference trained with) while the
    anchor and RawBoost views stay at signal scale; 'rms' keeps everything at
    signal scale."""
    g, t = 2, 4000
    anchors = np.clip(rng.normal(size=(g, t)) * 0.2, -0.9, 0.9).astype(np.float32)
    reals = np.clip(rng.normal(size=(g, 1, t)) * 0.2, -0.9, 0.9).astype(np.float32)
    voc = np.clip(rng.normal(size=(g, 3, t)) * 0.2, -0.9, 0.9).astype(np.float32)
    noise = (rng.normal(size=(2, 8000)) * 0.05).astype(np.float32)
    rir = np.eye(2, 400, dtype=np.float32)

    for mode, big in (("reference", True), ("rms", False)):
        composer = DeviceViewComposer(
            RawBoostConfig(), noise, rir, seed=5, snr_mode=mode
        )
        views, _ = composer(anchors, reals, voc, jax.random.key(2))
        views = np.asarray(views)
        # views: [anchor, rawboost, noise, reverb, real, voc*3, rb(voc)*3]
        assert np.abs(views[:, 0]).max() <= 1.0
        rms_noise = np.sqrt(np.mean(views[:, 2] ** 2))
        rms_rev = np.sqrt(np.mean(views[:, 3] ** 2))
        if big:
            assert rms_noise > 1000 and rms_rev > 1000, (rms_noise, rms_rev)
        else:
            assert rms_noise < 10 and rms_rev < 10, (rms_noise, rms_rev)
