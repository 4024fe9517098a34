"""Breathing/Talking/Silence (bio) segmentation of raw waveforms.

The reference's BTSE model conditions on a "bio" token sequence produced by
``Wav2bioCNN.wav2bio`` from ``model.wav2vec2_btse.biosegment`` — a dependency
that is an *empty directory* in the reference snapshot
(``model/wav2vec2_btse/model.py:13-16``; SURVEY §2 A10).  This module defines
the replacement: a deterministic energy-band segmenter built on the same
frame-energy statistic as the framework's VAD (``dsp/vad.py``, itself the
equivalent of ``core_scripts/data_io/wav_tools.py:289-489``).

Spec (documented here because the upstream behavior is unrecoverable):
- frame the waveform at 20 ms windows / 20 ms hop (non-overlapping, so a
  64000-sample/16 kHz utterance -> exactly 200 tokens — fixed length, static
  shapes end-to-end);
- per-frame energy e = 20*log10(std(frame) + eps);
- tokens relative to the utterance's max energy:
    0 = silence    e < max - 55 dB  (the VAD's lower threshold)
    1 = talking    e > max - 30 dB  (the VAD's upper threshold)
    2 = breathing  in between (audible but low-energy — breaths, clicks)

Vectorized jnp; usable on device inside jit (the reference round-trips
through CPU numpy per batch, ``model.py:306-319`` — here the whole
segmentation is a reshape + reductions, so it fuses into the forward pass).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

N_BIOS = 3
SILENCE, TALKING, BREATHING = 0, 1, 2


def num_bio_tokens(num_samples: int, sr: int = 16000, hop_ms: float = 20.0) -> int:
    """Static token count for a fixed-length input."""
    hop = int(sr * hop_ms / 1000.0)
    return num_samples // hop


def wav2bio(
    wav: jnp.ndarray,
    sr: int = 16000,
    hop_ms: float = 20.0,
    upper_db: float = 30.0,
    lower_db: float = 55.0,
) -> jnp.ndarray:
    """[..., T_samples] -> int32 bio tokens [..., T_bio].

    Works batched; trailing samples that don't fill a frame are dropped
    (same convention as the VAD's framing).
    """
    hop = int(sr * hop_ms / 1000.0)
    n = (wav.shape[-1] // hop) * hop
    frames = wav[..., :n].reshape(*wav.shape[:-1], n // hop, hop)
    e = 20.0 * jnp.log10(jnp.std(frames.astype(jnp.float32), axis=-1) + 1e-8)
    peak = jnp.max(e, axis=-1, keepdims=True)
    tokens = jnp.where(
        e > peak - upper_db,
        TALKING,
        jnp.where(e < peak - lower_db, SILENCE, BREATHING),
    )
    return tokens.astype(jnp.int32)


def wav2bio_np(wav: np.ndarray, sr: int = 16000, **kw) -> np.ndarray:
    """Host-side convenience wrapper (numpy in, numpy out)."""
    return np.asarray(wav2bio(jnp.asarray(wav), sr=sr, **kw))
