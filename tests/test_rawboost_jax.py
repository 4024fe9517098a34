"""On-device batched RawBoost vs the host (numpy) reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.dsp import fir as F
from scl_deepfake_audio_detection_tpu.dsp import rawboost as RB
from scl_deepfake_audio_detection_tpu.dsp import rawboost_jax as RBJ
from scl_deepfake_audio_detection_tpu.utils.config import RawBoostConfig


@pytest.fixture
def cfg():
    return RawBoostConfig()


def test_fft_fir_matches_direct(rng):
    x = rng.normal(size=(3, 4000)).astype(np.float32)
    taps = [rng.normal(size=m) * 0.2 for m in (31, 77, 128)]
    packed = RBJ.pack_chains(taps, 256)
    got = np.asarray(RBJ.fft_fir_centered(jnp.asarray(x), jnp.asarray(packed, jnp.float32)))
    for i, b in enumerate(taps):
        want = F.filter_fir_centered(x[i].astype(np.float64), b)
        np.testing.assert_allclose(got[i], want, atol=2e-4)


def test_pack_chains_alignment(rng):
    """Packing must preserve the centered delay exactly for odd/even tap
    counts in the same buffer."""
    x = rng.normal(size=(2, 1000)).astype(np.float32)
    for m in (9, 10):
        b = rng.normal(size=m)
        packed = RBJ.pack_chains([b], 64)
        got = np.asarray(
            RBJ.fft_fir_centered(jnp.asarray(x), jnp.asarray(packed, jnp.float32))
        )
        want0 = F.filter_fir_centered(x[0].astype(np.float64), b)
        np.testing.assert_allclose(got[0], want0, atol=2e-4)


def test_lnl_matches_host_given_chains(cfg, rng):
    x = (0.4 * rng.normal(size=(2, 8000))).astype(np.float32)
    chains = [RBJ.design_lnl_chains(cfg, 16000, rng) for _ in range(2)]
    packed = np.stack([RBJ.pack_chains(c, 1024) for c in chains])
    got = np.asarray(RBJ.lnl_convolutive_noise(jnp.asarray(x), jnp.asarray(packed)))

    for i in range(2):
        y = np.zeros(8000, np.float64)
        for p, b in enumerate(chains[i]):
            y += F.filter_fir_centered(x[i].astype(np.float64) ** (p + 1), b)
        y -= y.mean()
        if np.abs(y).max() > 1.0:
            y /= np.abs(y).max()
        np.testing.assert_allclose(got[i], y.astype(np.float32), atol=5e-4)


def test_isd_density_and_bounds(cfg):
    wav = jnp.full((4, 20000), 0.1, jnp.float32)
    out = np.asarray(RBJ.isd_additive_noise(wav, jax.random.key(0),
                                            p_max=10.0, g_sd=2.0))
    changed = (out != 0.1).mean(axis=1)
    assert (changed <= 0.12).all()  # beta <= 10% (+binomial wiggle)
    assert np.abs(out).max() <= 1.0 + 1e-6


def test_ssi_snr_in_range(cfg, rng):
    x = jnp.asarray(rng.normal(size=(3, 16000)).astype(np.float32))
    chain = RBJ.pack_chains(
        [F.design_notch_chain(rng, cfg.nBands, cfg.minF, cfg.maxF, cfg.minBW,
                              cfg.maxBW, cfg.minCoeff, cfg.maxCoeff,
                              cfg.minG, cfg.maxG, 16000)], 1024,
    )
    chains = jnp.asarray(np.tile(chain, (3, 1)))
    out = np.asarray(RBJ.ssi_additive_noise(x, jax.random.key(1), chains,
                                            10.0, 40.0))
    added = out - np.asarray(x)
    snr = 10 * np.log10(np.mean(np.asarray(x) ** 2, axis=1) /
                        np.mean(added**2, axis=1))
    assert (snr > 9.0).all() and (snr < 41.5).all()


@pytest.mark.parametrize("algo", [1, 2, 3, 5, 8])
def test_rawboost_batch_algos_jit(cfg, rng, algo):
    wav = jnp.asarray((0.3 * rng.normal(size=(2, 4000))).astype(np.float32))
    lnl = jnp.asarray(np.stack([
        RBJ.pack_chains(RBJ.design_lnl_chains(cfg, 16000, rng), 512)
        for _ in range(2)
    ]))
    ssi = lnl[:, 0, :]
    fn = jax.jit(lambda w, k: RBJ.rawboost_batch(w, k, lnl, ssi, cfg, algo=algo))
    out = np.asarray(fn(wav, jax.random.key(2)))
    assert out.shape == (2, 4000) and np.isfinite(out).all()


def test_make_batch_augmenter_end_to_end(cfg, rng):
    fn = RBJ.make_batch_augmenter(cfg, 16000, batch=2, nb=512)
    wav = (0.3 * rng.normal(size=(2, 4000))).astype(np.float32)
    out = np.asarray(fn(wav, jax.random.key(3)))
    assert out.shape == wav.shape and np.isfinite(out).all()
    assert not np.allclose(out, wav)  # something actually happened
