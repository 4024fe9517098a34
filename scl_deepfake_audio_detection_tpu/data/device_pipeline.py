"""On-device SCL view-batch composition.

The reference builds each 11-view anchor batch on CPU workers: ~11 librosa
loads + FIR chains + noise/RIR convolutions per item behind 8 forked workers
(``datautils/asvspoof_2019_augall_3.py:103-146``; SURVEY §7 hard part 3 warns
the host pipeline will starve a TPU).  This module moves the *compute* of the
conf-3 augmentation list — RawBoost12, background noise at random SNR, RIR
reverb — onto the chip: the host only decodes raw audio (native C reader) and
draws filter designs; everything else is one jit program over the whole
[G, V, T] batch:

  inputs   anchors [G, T], vocoded [G, n_voc, T] (host-decoded, co-cropped),
           additional reals [G, n_real, T], noise bank [N_noise, T_noise],
           RIR bank [N_rir, T_rir]  (banks live in HBM across steps)
  on chip  RawBoost LnL+ISD (batched FFT convolution, dsp/rawboost_jax),
           background-noise mixing at integer SNR in [5, 15] dB over random
           bank crops, FFT reverb with a random RIR, label vector assembly

Noise/reverb semantics (``snr_mode``):
  'reference' (default) reproduces the host/reference distribution exactly:
    the pydub gain formula ``SNR_dB * noise_dBFS / signal_dBFS`` applied to
    the *signal* with the noise overlaid unscaled
    (``audio_augmentor/background_noise.py:45-56``), plus the int16-amplitude
    pydub round-trip quirk (``audio_augmentor/utils.py:20-23``) on the noise
    and reverb views — so ``--device_aug`` trains on the same augmentation
    distribution as the host path (parity pinned in
    ``tests/test_device_pipeline.py``).
  'rms' is the textbook RMS-power SNR mix at signal scale — cleaner, but a
    *different* distribution than the reference recipe.

Views follow the conf-3 recipe (``asvspoof_2019_augall_3.py:103-146``):
anchor, RawBoost(anchor), noise(anchor), reverb(anchor), additional reals,
vocoded negatives, RawBoost(vocoded) — 5 bonafide + 2*n_voc spoof views for
the default n_real=1, n_voc=3 (11 views, labels [1]*5 + [0]*6).

Pitch/speed/telephone stay host-side (resampling and codec round trips are
not fixed-shape friendly); the host path remains the general fallback.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scl_deepfake_audio_detection_tpu.dsp import rawboost_jax as RBJ
from scl_deepfake_audio_detection_tpu.utils.config import RawBoostConfig


_I16 = 32768.0


def mix_noise_at_snr(
    wav: jnp.ndarray, noise: jnp.ndarray, snr_db: jnp.ndarray
) -> jnp.ndarray:
    """wav [..., T] + noise [..., T] at per-row SNR (dB); textbook RMS-power
    scaling (``snr_mode='rms'`` — NOT the reference's formula, see module
    docstring)."""
    pw = jnp.mean(wav**2, axis=-1, keepdims=True)
    pn = jnp.mean(noise**2, axis=-1, keepdims=True) + 1e-12
    gain = jnp.sqrt(pw / (pn * 10.0 ** (snr_db / 10.0)))
    return wav + gain * noise


def mix_noise_pydub(
    wav: jnp.ndarray, noise: jnp.ndarray, snr_db: jnp.ndarray
) -> jnp.ndarray:
    """The reference MUSAN overlay, exactly (``snr_mode='reference'``):
    ``gain_db = SNR_dB * noise_dBFS / signal_dBFS`` applied to the *signal*,
    noise overlaid unscaled, at int16 amplitude with int16 clipping
    (``background_noise.py:45-56`` + the ``librosa_to_pydub`` round-trip
    quirk ``utils.py:20-23``).  Inputs are [-1,1] float; output is
    int16-amplitude float32 like the host path (``dsp/augment.py``
    ``background_noise``)."""
    sig = jnp.trunc(wav * _I16)  # librosa_to_pydub: (x*2**15).astype(int16)
    nse = jnp.trunc(noise * _I16)

    def rms(x):
        return jnp.sqrt(jnp.mean(x**2, axis=-1, keepdims=True))

    def dbfs(x):  # pydub AudioSegment.dBFS: rms relative to int16 full scale
        return 20.0 * jnp.log10(jnp.maximum(rms(x), 1e-6) / _I16)

    gain_db = snr_db * dbfs(nse) / dbfs(sig)
    out = sig * 10.0 ** (gain_db / 20.0) + nse
    # A silent noise row only occurs with the build_banks missing-noise_path
    # fallback; the reference formula would zero the signal (gain -> -inf dB),
    # but the fallback's contract is "near-no-op", so pass the signal through.
    out = jnp.where(rms(nse) > 0.0, out, sig)
    return jnp.clip(out, -_I16, _I16 - 1.0)


def fft_reverb(wav: jnp.ndarray, rir: jnp.ndarray) -> jnp.ndarray:
    """[..., T] x [..., T_rir] FFT convolution, peak-normalized (the
    reference's ``reverb.py:33-46`` / ``wav_reverb`` FFT path), truncated to
    the input length."""
    t = wav.shape[-1]
    n = t + rir.shape[-1]  # minimal linear-conv length (see fft_fir_centered)
    y = jnp.fft.irfft(
        jnp.fft.rfft(wav, n, axis=-1) * jnp.fft.rfft(rir, n, axis=-1), n, axis=-1
    )
    # normalize by the FULL convolution's peak BEFORE truncating — the host
    # path (dsp/augment.reverb:70-73, reference reverb.py:33-46) normalizes
    # over the untruncated result, so a peak in the reverb tail beyond T
    # must still set the scale or this view comes out louder than the
    # host/reference distribution
    peak = jnp.max(jnp.abs(y[..., : t + rir.shape[-1] - 1]),
                   axis=-1, keepdims=True) + 1e-12
    return y[..., :t] / peak


def _random_bank_rows(key, bank: jnp.ndarray, rows: int, length: int):
    """Pick ``rows`` random crops [rows, length] from bank [N, T_bank]."""
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (rows,), 0, bank.shape[0])
    # randint's high bound is exclusive: +1 keeps the LAST valid crop start
    # reachable (bank_len == length then correctly yields only start 0);
    # outer max() guards a bank narrower than the crop (dynamic_slice clamps)
    starts = jax.random.randint(
        k2, (rows,), 0, max(bank.shape[1] - length + 1, 1)
    )
    sel = bank[idx]  # [rows, T_bank]
    return jax.vmap(
        lambda row, s: jax.lax.dynamic_slice_in_dim(row, s, length)
    )(sel, starts)


def _device_augment_all(x, chains, noise_bank, rir_bank, key, cfg,
                        snr_mode="reference"):
    """x [R, T] -> (rawboosted, noisy, reverbed) [R, T] each — the three
    device-able augmentations applied to every row (one batched program).

    In 'reference' mode the noise and reverb views come out at int16
    amplitude (the pydub round-trip quirk) with an integer SNR draw in
    [5, 15] dB — exactly the host/reference distribution; RawBoost stays at
    signal scale in both modes (the reference's RawBoost is plain numpy, no
    pydub round trip)."""
    r, t = x.shape
    k_rb, k_noise, k_snr, k_rir = jax.random.split(key, 4)
    rb = RBJ.isd_additive_noise(
        RBJ.lnl_convolutive_noise(x, chains), k_rb, cfg.P, cfg.g_sd
    )
    noise = _random_bank_rows(k_noise, noise_bank, r, t)
    rirs = _random_bank_rows(k_rir, rir_bank, r, rir_bank.shape[1])
    if snr_mode == "reference":
        # random.randint(5, 15) is inclusive on both ends
        snr = jax.random.randint(k_snr, (r, 1), 5, 16).astype(x.dtype)
        noisy = mix_noise_pydub(x, noise, snr)
        # host reverb: peak-norm then _to_int16 (dsp/augment.py reverb).
        # Peak-norm makes the peak sample exactly +-1.0; at +1.0 the
        # reference's (y*32768).astype(int16) OVERFLOWS to -32768 — a real
        # one-sample-per-utterance quirk of the training distribution,
        # reproduced here (pinned by the host-parity test).
        reverbed = jnp.trunc(fft_reverb(x, rirs) * _I16)
        reverbed = jnp.where(reverbed >= _I16, reverbed - 2.0 * _I16, reverbed)
    elif snr_mode == "rms":
        snr = jax.random.uniform(k_snr, (r, 1), minval=5.0, maxval=15.0)
        noisy = mix_noise_at_snr(x, noise, snr)
        reverbed = fft_reverb(x, rirs)
    else:
        raise ValueError(f"unknown snr_mode {snr_mode!r}")
    return rb, noisy, reverbed


def _device_augment_random(x, chains, noise_bank, rir_bank, key, cfg,
                           snr_mode="reference"):
    """Per-row random choice among the three augmentations (the aug_2 /
    scl_normal 'random method per view' semantics).  All three branches run
    batched and the per-row result is selected — 3x the augment FLOPs, but
    fully vectorized (no per-row control flow)."""
    rb, noisy, reverbed = _device_augment_all(
        x, chains, noise_bank, rir_bank, jax.random.fold_in(key, 0), cfg,
        snr_mode,
    )
    choice = jax.random.randint(jax.random.fold_in(key, 1), (x.shape[0], 1), 0, 3)
    return jnp.where(choice == 0, rb, jnp.where(choice == 1, noisy, reverbed))


@functools.partial(jax.jit, static_argnames=("cfg", "variant", "snr_mode"))
def compose_views(
    anchors: jnp.ndarray,  # [G, T]
    reals: jnp.ndarray,  # [G, n_real, T]
    vocoded: jnp.ndarray,  # [G, n_voc, T]
    spoofs: jnp.ndarray,  # [G, n_spoof, T] (may be 0-width)
    noise_bank: jnp.ndarray,  # [N, T_bank]  (T_bank >= T)
    rir_bank: jnp.ndarray,  # [M, T_rir]
    lnl_chains: jnp.ndarray,  # [G*(1+n_voc+n_real+n_spoof), n_f, NB]
    key: jax.Array,
    cfg: RawBoostConfig,
    variant: str = "augall_3",
    snr_mode: str = "reference",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (views [G, V, T], labels [G, V]) on device, per dataset variant
    (the ``datautils/*`` __getitem__ recipes, SURVEY §2 A11/A12).

    Waveform inputs may arrive as int16 PCM (the training-side wire format —
    half the host->device bytes, lossless for PCM16-decoded audio); they are
    rescaled on device here, mirroring the eval path's ``_score_step``:

    - augall_3 / augall_5: anchor + [rb, noise, reverb](anchor) + reals ||
      voc + rb(voc) + spoofs
    - aug_2: anchor + all3(anchor) + reals + rand(reals) || voc + rand(voc)
    - scl_normal: anchor + all3(anchor) + reals + rand(reals) ||
      spoofs + rand(spoofs)
    - xinwang: anchor + all3(anchor) || voc + all3(voc)
    """
    from scl_deepfake_audio_detection_tpu.ops.layers import dewire_pcm16

    anchors, reals, vocoded, spoofs = map(
        dewire_pcm16, (anchors, reals, vocoded, spoofs)
    )
    g, t = anchors.shape
    n_real = reals.shape[1]
    n_voc = vocoded.shape[1]
    n_spoof = spoofs.shape[1]
    k_a, k_v, k_r, k_s = jax.random.split(key, 4)

    # chain rows per role (host packs them contiguously)
    c_anchor = lnl_chains[:g]
    c_voc = lnl_chains[g : g + g * n_voc]
    c_real = lnl_chains[g + g * n_voc : g + g * n_voc + g * n_real]
    c_spoof = lnl_chains[g + g * n_voc + g * n_real :]

    rb_a, noisy_a, rev_a = _device_augment_all(
        anchors, c_anchor, noise_bank, rir_bank, k_a, cfg, snr_mode
    )
    aug3_anchor = jnp.stack([rb_a, noisy_a, rev_a], axis=1)  # [G, 3, T]

    def flat(x):
        return x.reshape(-1, t)

    if variant in ("augall_3", "augall_5"):
        rb_voc = RBJ.isd_additive_noise(
            RBJ.lnl_convolutive_noise(flat(vocoded), c_voc),
            k_v, cfg.P, cfg.g_sd,
        ).reshape(g, n_voc, t)
        pos = jnp.concatenate([anchors[:, None], aug3_anchor, reals], axis=1)
        neg = jnp.concatenate([vocoded, rb_voc, spoofs], axis=1)
    elif variant == "aug_2":
        rand_real = _device_augment_random(
            flat(reals), c_real, noise_bank, rir_bank, k_r, cfg, snr_mode
        ).reshape(g, n_real, t)
        rand_voc = _device_augment_random(
            flat(vocoded), c_voc, noise_bank, rir_bank, k_v, cfg, snr_mode
        ).reshape(g, n_voc, t)
        pos = jnp.concatenate(
            [anchors[:, None], aug3_anchor, reals, rand_real], axis=1
        )
        neg = jnp.concatenate([vocoded, rand_voc], axis=1)
    elif variant == "scl_normal":
        rand_real = _device_augment_random(
            flat(reals), c_real, noise_bank, rir_bank, k_r, cfg, snr_mode
        ).reshape(g, n_real, t)
        rand_spoof = _device_augment_random(
            flat(spoofs), c_spoof, noise_bank, rir_bank, k_s, cfg, snr_mode
        ).reshape(g, n_spoof, t)
        pos = jnp.concatenate(
            [anchors[:, None], aug3_anchor, reals, rand_real], axis=1
        )
        neg = jnp.concatenate([spoofs, rand_spoof], axis=1)
    elif variant == "xinwang":
        rb_v, noisy_v, rev_v = _device_augment_all(
            flat(vocoded), c_voc, noise_bank, rir_bank, k_v, cfg, snr_mode
        )
        aug3_voc = jnp.stack([rb_v, noisy_v, rev_v], axis=1).reshape(
            g, 3 * n_voc, t
        )
        pos = jnp.concatenate([anchors[:, None], aug3_anchor], axis=1)
        neg = jnp.concatenate([vocoded, aug3_voc], axis=1)
    else:
        raise ValueError(f"unknown variant {variant!r}")

    views = jnp.concatenate([pos, neg], axis=1).astype(jnp.float32)
    labels = jnp.concatenate(
        [jnp.ones((g, pos.shape[1]), jnp.float32),
         jnp.zeros((g, neg.shape[1]), jnp.float32)],
        axis=1,
    )
    return views, labels


class DeviceViewComposer:
    """Host wrapper: owns the on-device noise/RIR banks and a pre-designed
    notch-chain pool; call with raw host arrays, get a composed device batch.

    The chain pool removes per-step host DSP entirely: ``pool_size`` LnL
    chains are designed once (~3 ms each) and device-resident; each step
    samples rows.  Chains are reused across steps but paired with fresh
    random ISD/noise/SNR/RIR draws — distribution-equivalent to per-step
    designs (SURVEY §7 hard part 6: distributions, not streams).
    """

    def __init__(
        self,
        cfg: RawBoostConfig,
        noise_bank: np.ndarray,
        rir_bank: np.ndarray,
        fs: int = 16000,
        nb: int = 1024,
        seed: int = 0,
        pool_size: int = 256,
        snr_mode: str = "reference",
    ):
        self.cfg = cfg
        self.snr_mode = snr_mode
        self.fs = fs
        self.nb = nb
        self.noise_bank = jnp.asarray(noise_bank, jnp.float32)
        self.rir_bank = jnp.asarray(rir_bank, jnp.float32)
        self.host_rng = np.random.default_rng(seed)
        self.chain_pool = jnp.asarray(np.stack([
            RBJ.pack_chains(RBJ.design_lnl_chains(cfg, fs, self.host_rng), nb)
            for _ in range(pool_size)
        ]).astype(np.float32))  # [pool, n_f, NB]

    def __call__(self, anchors, reals, vocoded, key, spoofs=None,
                 variant: str = "augall_3"):
        g = anchors.shape[0]
        if spoofs is None:
            spoofs = np.zeros((g, 0, anchors.shape[1]), np.float32)
        n_rows = g * (1 + vocoded.shape[1] + reals.shape[1] + spoofs.shape[1])
        # chain selection derives from the caller's per-batch KEY, not a
        # stateful host rng: a shared mutable rng made every dev pass see
        # different RawBoost chains (however many train batches had advanced
        # it), so validation metrics rode augmentation noise — the epoch=-1
        # dev key now pins identical dev chains every epoch and across
        # resumes.  host_rng is only used to build the chain pool once.
        idx_key = jax.random.fold_in(key, 0x5C1C)  # distinct from the
        idx = jax.random.randint(                  # split(key, 4) streams
            idx_key, (n_rows,), 0, self.chain_pool.shape[0]
        )
        chains = self.chain_pool[idx]
        return compose_views(
            jnp.asarray(anchors), jnp.asarray(reals), jnp.asarray(vocoded),
            jnp.asarray(spoofs), self.noise_bank, self.rir_bank, chains, key,
            self.cfg, variant, self.snr_mode,
        )


def build_banks(
    noise_path: Optional[str],
    rir_path: Optional[str],
    sr: int = 16000,
    bank_len: int = 128000,
    rir_len: int = 8000,
    max_files: int = 64,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode noise/RIR directories into fixed-shape device banks
    ([N, bank_len] tiled/cropped noise, [M, rir_len] zero-padded RIRs).
    Missing paths yield silent single-row banks (augmentation becomes a
    near-no-op rather than an error)."""
    from scl_deepfake_audio_detection_tpu.data.augment_registry import (
        list_audio_files,
    )
    from scl_deepfake_audio_detection_tpu.utils.audio_io import load_audio

    def rows(path, length, tile, empty_row):
        files = list_audio_files(path)[:max_files] if path else []
        out = []
        for f in files:
            try:
                w = load_audio(f, sr)
            except Exception:
                continue
            if tile and len(w) < length:
                w = np.tile(w, length // max(len(w), 1) + 1)
            row = np.zeros(length, np.float32)
            row[: min(len(w), length)] = w[:length]
            out.append(row)
        if not out:
            out = [empty_row]
        return np.stack(out)

    silent = np.zeros(bank_len, np.float32)
    delta = np.zeros(rir_len, np.float32)
    delta[0] = 1.0  # identity RIR: missing rir_path degrades to a clean copy
    return (
        rows(noise_path, bank_len, True, silent),
        rows(rir_path, rir_len, False, delta),
    )
