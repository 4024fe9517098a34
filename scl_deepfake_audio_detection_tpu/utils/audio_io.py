"""Audio IO.

The reference reads audio via ``librosa.load(path, sr=16000, mono=True)``
(``datautils/asvspoof_2019_augall_3.py:96``) and writes PCM16 via soundfile
(``:373``).  Neither librosa, soundfile, pydub nor ffmpeg can be assumed
here, so the built-in backend is a pure-numpy RIFF/WAVE codec (PCM 16/24/32,
float32/64) + polyphase resampling to the target rate; soundfile is used when
importable (adds FLAC — the LA19 eval set ships .flac).

All loads return mono float32 in [-1, 1] at the requested rate, matching
librosa's convention, so downstream DSP behaves identically.
"""

from __future__ import annotations

import math
import os
import wave
from typing import Tuple

import numpy as np

try:
    import soundfile as _sf  # optional
except ImportError:  # pragma: no cover
    _sf = None


def _read_wav_numpy(path: str) -> Tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        vals = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        data = vals.astype(np.float32) / float(1 << 23)
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, sr


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (scipy when present, FFT fallback)."""
    if sr_in == sr_out:
        return x
    try:
        from scipy.signal import resample_poly

        g = math.gcd(sr_in, sr_out)
        return resample_poly(x, sr_out // g, sr_in // g).astype(np.float32)
    except ImportError:  # pragma: no cover
        n_out = int(round(len(x) * sr_out / sr_in))
        spec = np.fft.rfft(x)
        n_keep = min(len(spec), n_out // 2 + 1)
        out = np.zeros(n_out // 2 + 1, dtype=spec.dtype)
        out[:n_keep] = spec[:n_keep]
        return (np.fft.irfft(out, n_out) * (n_out / len(x))).astype(np.float32)


def load_audio(path: str, sr: int = 16000) -> np.ndarray:
    """Mono float32 at ``sr`` (librosa.load-compatible behavior).

    Decode order: native C WAV reader (PCM16/float32, ``native.py``) ->
    native libav* codec module (flac/mp3/ogg/opus/... — the LA19 eval set
    ships .flac) -> soundfile (when installed) -> stdlib wave fallback.
    """
    from scl_deepfake_audio_detection_tpu import native

    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav" and native.available():
        try:
            data, file_sr = native.read_wav(path)
            return resample(data, file_sr, sr)
        except ValueError:
            pass  # exotic subtype: fall through to the generic decoders
    if native.codec_available():
        try:
            data, file_sr = native.read_audio(path)
            return resample(data, file_sr, sr)
        except ValueError:
            pass  # unreadable by libav*: fall through
    if _sf is not None:
        data, file_sr = _sf.read(path, dtype="float32", always_2d=True)
        data = data.mean(axis=1)
    else:
        if ext != ".wav":
            raise RuntimeError(
                f"cannot decode {ext!r}: needs the native codec module "
                f"(libavformat/libavcodec) or soundfile: {path}"
            )
        data, file_sr = _read_wav_numpy(path)
    return resample(np.asarray(data, np.float32), file_sr, sr)


def save_wav(path: str, x: np.ndarray, sr: int = 16000, subtype: str = "PCM_16") -> None:
    """PCM16 WAV writer (matches the reference's offline-aug cache format,
    ``sf.write(..., subtype='PCM_16')``).  Only PCM_16 is implemented;
    anything else raises rather than silently quantizing to 16 bits."""
    if subtype != "PCM_16":
        raise ValueError(f"save_wav writes PCM_16 only, got subtype={subtype!r}")
    x = np.asarray(x, np.float32)
    pcm = pcm16_encode(x).astype("<i2")
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def pcm16_encode(x: np.ndarray) -> np.ndarray:
    """float [-1, 1] -> int16 PCM — THE wire/quantization convention of the
    framework (save_wav, EvalLoader/DeviceAugTrainLoader wire_dtype,
    decode cache).  Lossless round trip for audio that was decoded from
    16-bit sources (load_audio returns int16/32768 exactly)."""
    return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)


def pcm16_decode(x: np.ndarray) -> np.ndarray:
    """int16 PCM -> float32 in [-1, 1) (inverse of pcm16_encode)."""
    return x.astype(np.float32) / 32768.0


def int16_scale(x: np.ndarray) -> np.ndarray:
    """Reproduce the reference's ``pydub_to_librosa`` int16-amplitude quirk
    (``datautils/audio_augmentor/utils.py:20-23``): augmentors that round-trip
    through pydub return samples scaled to int16 range, not [-1, 1]."""
    return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.float32)
