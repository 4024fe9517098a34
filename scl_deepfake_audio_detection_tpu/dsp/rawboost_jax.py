"""Batched on-device RawBoost (jax.numpy FFT convolution).

The host path (``dsp/rawboost.py``) is the semantics-exact scalar
implementation of the reference's per-utterance numpy/scipy DSP
(``datautils/RawBoost.py``).  This module is the TPU-first variant: whole
*batches* of views are augmented in one jit program — notch-chain design
(control-flow-heavy, microseconds) stays on host, while the FIR convolutions
(the FLOPs) run as batched rFFT·multiply·irFFT on device, fused into the
training step's input pipeline.  SURVEY §7 hard part 3: at TPU speeds the
augmentation must not starve the chip.

Randomness uses keyed jax PRNG — distribution parity with the reference's
unseeded np.random, not stream parity (SURVEY §7 hard part 6).  The ISD stage
selects samples by i.i.d. Bernoulli(beta) rather than an exact
``int(T*beta/100)``-sized subset: same expected density, shape-static.

Filter chains of different lengths are packed into one [B, n_f, NB] tensor by
``pack_chains``: each chain is placed at an offset such that its centered
group delay coincides with the padded buffer's, so results match
``fir.filter_fir_centered`` exactly despite the fixed buffer.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from scl_deepfake_audio_detection_tpu.dsp.fir import design_notch_chain
from scl_deepfake_audio_detection_tpu.utils.config import RawBoostConfig


# ---------------------------------------------------------------------------
# host-side chain design + packing
# ---------------------------------------------------------------------------


def design_lnl_chains(
    cfg: RawBoostConfig, fs: int, rng: np.random.Generator
) -> List[np.ndarray]:
    """The reference's per-power notch chains (RawBoost.py:59-66): gains drop
    by the lin/non-lin bias from the second power on."""
    min_g, max_g = float(cfg.minG), float(cfg.maxG)
    chains = []
    for i in range(cfg.N_f):
        if i == 1:
            min_g -= cfg.minBiasLinNonLin
            max_g -= cfg.maxBiasLinNonLin
        chains.append(design_notch_chain(
            rng, cfg.nBands, cfg.minF, cfg.maxF, cfg.minBW, cfg.maxBW,
            cfg.minCoeff, cfg.maxCoeff, min_g, max_g, fs,
        ))
    return chains


def pack_chains(chains: Sequence[np.ndarray], nb: int) -> np.ndarray:
    """Pack variable-length taps into fixed [len(chains), nb] buffers with
    aligned centered group delay: chain b (len m) goes at offset
    (nb+1)//2 - (m+1)//2, so slicing with the buffer's delay reproduces
    ``filter_fir_centered(x, b)``."""
    out = np.zeros((len(chains), nb), np.float64)
    for i, b in enumerate(chains):
        m = len(b)
        if m > nb:
            raise ValueError(f"chain {i} longer ({m}) than buffer ({nb})")
        off = (nb + 1) // 2 - (m + 1) // 2
        out[i, off : off + m] = b
    return out


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------


def fft_fir_centered(x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Centered FIR via FFT. x [..., T], b [..., NB] (broadcastable batch
    dims) -> [..., T]; equals ``fir.filter_fir_centered`` for each row.

    FFT length: measured on v5e, the minimal t+nb length (65024 for the
    64000/1024 training shape) runs 2x faster than rounding up to the next
    power of two (131072) — padding doubles the transform work and the TPU
    FFT handles mixed radixes well. Keep the minimal length.
    """
    t, nb = x.shape[-1], b.shape[-1]
    n = t + nb
    y = jnp.fft.irfft(
        jnp.fft.rfft(x, n, axis=-1) * jnp.fft.rfft(b, n, axis=-1), n, axis=-1
    )
    d = (nb + 1) // 2
    return y[..., d : d + t]


def _cond_peak_norm(y: jnp.ndarray) -> jnp.ndarray:
    peak = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    return jnp.where(peak > 1.0, y / peak, y)


def lnl_convolutive_noise(wav: jnp.ndarray, chains: jnp.ndarray) -> jnp.ndarray:
    """wav [B, T] float32, chains [B, n_f, NB] (from pack_chains) ->
    sum_i fir(wav^(i+1), chains[:, i]) de-meaned, conditionally normalized."""
    n_f = chains.shape[1]
    powers = jnp.stack([wav ** (i + 1) for i in range(n_f)], axis=1)  # [B,nf,T]
    y = jnp.sum(fft_fir_centered(powers.astype(jnp.float32),
                                 chains.astype(jnp.float32)), axis=1)
    y = y - jnp.mean(y, axis=-1, keepdims=True)
    return _cond_peak_norm(y).astype(jnp.float32)


def isd_additive_noise(
    wav: jnp.ndarray, key: jax.Array, p_max: float, g_sd: float
) -> jnp.ndarray:
    """Impulsive signal-dependent noise, batched (RawBoost.py:73-84
    distribution semantics): per-sample Bernoulli(beta) mask, beta~U(0,P)%,
    multiplicative factor U(-1,1)*U(-1,1)."""
    b, t = wav.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    beta = jax.random.uniform(k1, (b, 1)) * p_max / 100.0
    mask = jax.random.uniform(k2, (b, t)) < beta
    f = (2 * jax.random.uniform(k3, (b, t)) - 1) * (
        2 * jax.random.uniform(k4, (b, t)) - 1
    )
    y = wav + jnp.where(mask, g_sd * wav * f, 0.0)
    return _cond_peak_norm(y).astype(jnp.float32)


def ssi_additive_noise(
    wav: jnp.ndarray,
    key: jax.Array,
    chains: jnp.ndarray,
    snr_min: float,
    snr_max: float,
) -> jnp.ndarray:
    """Stationary colored noise at a random SNR (RawBoost.py:89-97): unit
    Gaussian -> notch chain [B, NB] -> peak norm -> scale to snr."""
    b, t = wav.shape
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, (b, t))
    noise = fft_fir_centered(noise.astype(jnp.float32), chains.astype(jnp.float32))
    noise = noise / jnp.max(jnp.abs(noise), axis=-1, keepdims=True)
    snr = jax.random.uniform(k2, (b, 1), minval=snr_min, maxval=snr_max)
    scale = (
        jnp.linalg.norm(wav, axis=-1, keepdims=True)
        / jnp.linalg.norm(noise, axis=-1, keepdims=True)
        / (10.0 ** (0.05 * snr))
    )
    return (wav + noise * scale).astype(jnp.float32)


def rawboost_batch(
    wav: jnp.ndarray,
    key: jax.Array,
    lnl_chains: jnp.ndarray,
    ssi_chains: jnp.ndarray,
    cfg: RawBoostConfig,
    algo: int | None = None,
) -> jnp.ndarray:
    """Batched 8-way dispatch (asvspoof_2019_augall_3.py:377-439). ``algo``
    is static (one compiled program per algorithm)."""
    algo = cfg.algo if algo is None else algo
    k_isd, k_ssi = jax.random.split(key)

    def lnl(x):
        return lnl_convolutive_noise(x, lnl_chains)

    def isd(x):
        return isd_additive_noise(x, k_isd, cfg.P, cfg.g_sd)

    def ssi(x):
        return ssi_additive_noise(x, k_ssi, ssi_chains, cfg.SNRmin, cfg.SNRmax)

    if algo == 1:
        return lnl(wav)
    if algo == 2:
        return isd(wav)
    if algo == 3:
        return ssi(wav)
    if algo == 4:
        return ssi(isd(lnl(wav)))
    if algo == 5:
        return isd(lnl(wav))
    if algo == 6:
        return ssi(lnl(wav))
    if algo == 7:
        return ssi(isd(wav))
    if algo == 8:
        y = lnl(wav) + isd(wav)
        y = y - 0.0  # parallel sum then conditional renorm (reference :434-437)
        return _cond_peak_norm(y).astype(jnp.float32)
    return wav


def make_batch_augmenter(cfg: RawBoostConfig, fs: int, batch: int,
                         nb: int = 1024, seed: int = 0):
    """Convenience: returns a jitted ``fn(wav [B,T], key) -> [B,T]`` with
    freshly designed per-item chains baked per call (host redesign each call
    keeps the reference's every-utterance-new-filters behavior)."""
    host_rng = np.random.default_rng(seed)

    @jax.jit
    def run(wav, key, lnl_chains, ssi_chains):
        return rawboost_batch(wav, key, lnl_chains, ssi_chains, cfg)

    def fn(wav: np.ndarray, key: jax.Array) -> jnp.ndarray:
        lnl_chains = np.stack([
            pack_chains(design_lnl_chains(cfg, fs, host_rng), nb)
            for _ in range(batch)
        ])
        ssi_chains = np.stack([
            pack_chains([design_notch_chain(
                host_rng, cfg.nBands, cfg.minF, cfg.maxF, cfg.minBW, cfg.maxBW,
                cfg.minCoeff, cfg.maxCoeff, cfg.minG, cfg.maxG, fs,
            )], nb)[0]
            for _ in range(batch)
        ])
        return run(jnp.asarray(wav), key, jnp.asarray(lnl_chains),
                   jnp.asarray(ssi_chains))

    return fn
