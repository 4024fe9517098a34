"""Fuzz the device-path augmentations against their host twins.

The fixed-fixture parity tests (``test_device_pipeline.py``,
``test_rawboost_jax.py``) pin one draw each; models trained with
``--device_aug`` see the device implementations across the WHOLE parameter
space, so these tests sweep randomized signals / SNRs / RIRs / RawBoost
chains (single compiled shape per family — contents and parameters vary,
shapes do not, so each family costs one XLA compile).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.data.device_pipeline import (
    fft_reverb,
    mix_noise_pydub,
)
from scl_deepfake_audio_detection_tpu.dsp import fir as F
from scl_deepfake_audio_detection_tpu.dsp import rawboost_jax as RBJ
from scl_deepfake_audio_detection_tpu.dsp.augment import background_noise, reverb
from scl_deepfake_audio_detection_tpu.utils.config import RawBoostConfig

T = 8000


def test_noise_mix_fuzz_device_matches_host():
    """20 random (signal, noise, SNR) draws through one compiled program:
    device pydub-gain mix == host (<= 2 int16 LSB, the f32-vs-f64 gap)."""
    rng = np.random.default_rng(0)
    n_cases = 20
    sigs, noises, snrs = [], [], []
    for _ in range(n_cases):
        amp_s = rng.uniform(1e-3, 0.9)
        amp_n = rng.uniform(1e-3, 0.9)
        sigs.append(np.clip(rng.normal(size=T) * amp_s, -0.95, 0.95))
        noises.append(np.clip(rng.normal(size=T) * amp_n, -0.95, 0.95))
        # integer SNRs: the host/reference path DRAWS integers
        # (rng.integers, background_noise.py:45); fractional values would
        # silently floor on the host side and diverge
        snrs.append(float(rng.integers(1, 31)))
    sigs = np.asarray(sigs, np.float32)
    noises = np.asarray(noises, np.float32)
    snr_col = np.asarray(snrs, np.float32)[:, None]

    dev = np.asarray(
        mix_noise_pydub(jnp.asarray(sigs), jnp.asarray(noises),
                        jnp.asarray(snr_col))
    )
    for i in range(n_cases):
        host = background_noise(
            sigs[i], noises[i], np.random.default_rng(0),
            min_snr_db=snrs[i], max_snr_db=snrs[i],
        )
        np.testing.assert_allclose(
            dev[i], host, atol=2.0,
            err_msg=f"case {i}: snr={snrs[i]:.2f}",
        )


def test_reverb_fuzz_device_matches_host():
    """15 random exponential-decay RIRs (direct path dominating, random decay
    and tail sign structure): device FFT reverb == host np.convolve path."""
    rng = np.random.default_rng(1)
    n_cases, rir_len = 15, 512
    for i in range(n_cases):
        amp = rng.uniform(0.05, 0.6)
        x = np.clip(rng.normal(size=T) * amp, -0.95, 0.95).astype(np.float32)
        decay = rng.uniform(20.0, 150.0)
        rir = (np.exp(-np.arange(rir_len) / decay)
               * rng.normal(size=rir_len) * rng.uniform(0.05, 0.4)).astype(np.float32)
        rir[0] = 1.0  # keep the peak inside the co-cropped region
        host = reverb(x, rir)[:T]
        dev = np.asarray(
            jnp.trunc(fft_reverb(jnp.asarray(x)[None], jnp.asarray(rir)[None])
                      * 32768.0)
        )[0]
        dev = np.where(dev >= 32768.0, dev - 65536.0, dev)  # +peak wraparound
        np.testing.assert_allclose(dev, host, atol=2.0, err_msg=f"case {i}")


@pytest.mark.parametrize("seed", [2, 3, 4, 5])
def test_lnl_chain_fuzz_device_matches_host(seed):
    """Random RawBoost LnL parameter draws (band counts, frequency ranges,
    coefficient counts, gains): packed device FFT chains == host filtering."""
    rng = np.random.default_rng(seed)
    cfg = RawBoostConfig(
        nBands=int(rng.integers(3, 8)),
        minF=int(rng.integers(10, 30)),
        maxF=int(rng.integers(3000, 4000)),
        minBW=int(rng.integers(50, 120)),
        maxBW=int(rng.integers(800, 1100)),
        minCoeff=int(rng.integers(5, 12)),
        maxCoeff=int(rng.integers(60, 100)),
        minG=int(rng.integers(-10, 0)),
        maxG=int(rng.integers(0, 10)),
        N_f=int(rng.integers(2, 6)),
    )
    x = (rng.uniform(0.05, 0.6) * rng.normal(size=(2, T))).astype(np.float32)
    chains = [RBJ.design_lnl_chains(cfg, 16000, rng) for _ in range(2)]
    pad = max(1024, 1 << int(np.ceil(np.log2(max(
        len(b) for c in chains for b in c) + 1))))
    packed = np.stack([RBJ.pack_chains(c, pad) for c in chains])
    got = np.asarray(
        RBJ.lnl_convolutive_noise(jnp.asarray(x), jnp.asarray(packed))
    )
    for i in range(2):
        y = np.zeros(T, np.float64)
        for p, b in enumerate(chains[i]):
            y += F.filter_fir_centered(x[i].astype(np.float64) ** (p + 1), b)
        y -= y.mean()
        if np.abs(y).max() > 1.0:
            y /= np.abs(y).max()
        np.testing.assert_allclose(got[i], y.astype(np.float32), atol=5e-4,
                                   err_msg=f"cfg={cfg}")
