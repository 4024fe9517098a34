"""Length normalization: eval padding and the multiview co-random-crop.

Matches the two length policies of the reference:
- eval ``pad`` (``datautils/asvspoof_2019_augall_3.py:49-60``): truncate to
  64600, or zero-pad / tile-repeat up;
- train ``batch_pad_for_multiview``
  (``core_scripts/data_io/wav_augmentation.py:209-282``): all views of an
  anchor group are first length-matched to view 0 (tile or zero-pad), then a
  *shared* random 64000-sample crop is taken so every view covers the same
  speech region.

These produce the fixed static shapes the whole TPU design relies on.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def pad_eval(x: np.ndarray, padding_type: str = "zero", max_len: int = 64600) -> np.ndarray:
    """Eval-side fixed-length policy (truncate / zero / tile-repeat)."""
    n = x.shape[0]
    if n >= max_len:
        return x[:max_len]
    if padding_type == "repeat":
        reps = max_len // n + 1
        return np.tile(x, reps)[:max_len]
    if padding_type == "zero":
        out = np.zeros(max_len, dtype=x.dtype)
        out[:n] = x
        return out
    raise ValueError(f"padding_type must be 'zero' or 'repeat', got {padding_type!r}")


def _match_length(x: np.ndarray, length: int, repeat_pad: bool) -> np.ndarray:
    if x.shape[0] >= length:
        return x[:length]
    if repeat_pad:
        reps = length // x.shape[0] + 1
        return np.tile(x, reps)[:length]
    out = np.zeros(length, dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


def rand_sil_trim(
    x: np.ndarray,
    sr: int = 16000,
    random_trim_sil: bool = False,
    rng: Optional[np.random.Generator] = None,
):
    """Trim leading/trailing silence via the energy VAD; optionally keep a
    random fraction of it (capability match for ``wav_rand_sil_trim``,
    ``core_scripts/data_io/wav_augmentation.py:78-140``).

    Returns ``(trimmed, start, end)`` with ``trimmed = x[start:end]``; when the
    trim range is degenerate (or starts at 0, like the reference's guard) the
    input passes through unchanged.
    """
    from scl_deepfake_audio_detection_tpu.dsp.vad import speech_bounds_samples

    start, end = speech_bounds_samples(x, sr)
    if random_trim_sil:
        rng = rng or np.random.default_rng()
        prob = rng.random()
        start = int(start * prob)
        end = int((x.shape[0] - end) * prob) + end
    if 0 < start < end:
        return x[start:end], start, end
    return x, 0, x.shape[0]


def multiview_silence_trim(
    views: Sequence[np.ndarray],
    sr: int = 16000,
    random_trim_sil: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> List[np.ndarray]:
    """Co-trim every view with the silence bounds of view 0 (capability match
    for ``batch_siltrim_for_multiview``, ``wav_augmentation.py:170-206`` —
    bounds from the anchor so all views stay sample-aligned)."""
    _, start, end = rand_sil_trim(views[0], sr, random_trim_sil, rng)
    if 0 < start < end:
        return [v[start:end] for v in views]
    return list(views)


def multiview_pad(
    views: Sequence[np.ndarray],
    length: int,
    repeat_pad: bool = True,
    random_trim: bool = True,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Co-crop a list of 1-D waveforms to [V, length] with a shared offset.

    Reference semantics (``wav_augmentation.py:229-281``): every view is
    length-matched to view 0 first; if that common length exceeds the target
    and ``random_trim``, one random start offset is drawn and applied to all
    views; shorter groups are tiled (repeat_pad) or zero-padded to the target.
    """
    rng = rng or np.random.default_rng()
    base_len = views[0].shape[0]
    matched = [_match_length(v, base_len, repeat_pad) for v in views]

    if base_len < length:
        matched = [_match_length(v, length, repeat_pad) for v in matched]
        start = 0
    elif random_trim and base_len > length:
        start = int(rng.random() * (base_len - length))
    else:
        start = 0
    return np.stack([v[start : start + length] for v in matched], axis=0)
