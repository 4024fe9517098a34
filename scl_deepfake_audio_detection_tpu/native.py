"""ctypes bindings for the native host-DSP library (native/scl_host.cpp).

The library is built lazily on first use (g++ -O3 -shared); every entry point
has a pure-numpy fallback in ``dsp/``, so the framework runs identically —
just slower on the host path — when no toolchain is present.  ``available()``
reports which path is active; the data loader consults it per process.

Why native at all: the reference amortizes augmentation DSP over 8 DataLoader
workers (``main.py:379``); serving images here expose a single host core, so
the RawBoost FIR chains and WAV decode run as tight C loops instead
(SURVEY §7 hard part 3: the host pipeline must not starve the chip).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "scl_host.cpp")
_SO = os.path.join(_ROOT, "native", "libscl_host.so")
_SRC_CODEC = os.path.join(_ROOT, "native", "scl_codec.cpp")
_SO_CODEC = os.path.join(_ROOT, "native", "libscl_codec.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_codec_lib: Optional[ctypes.CDLL] = None
_codec_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # a packaged install may ship the .so without the source: missing
        # source means "can't check staleness / can't rebuild", never a raise
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        if lib.scl_abi_version() != 1:
            return None

        c_dp = ctypes.POINTER(ctypes.c_double)
        c_fp = ctypes.POINTER(ctypes.c_float)
        c_lp = ctypes.POINTER(ctypes.c_long)
        lib.scl_wav_read_f32.restype = ctypes.c_long
        lib.scl_wav_read_f32.argtypes = [
            ctypes.c_char_p, c_fp, ctypes.c_long, ctypes.POINTER(ctypes.c_int)
        ]
        lib.scl_fir_centered.argtypes = [c_dp, ctypes.c_long, c_dp,
                                         ctypes.c_long, c_dp]
        lib.scl_lnl_apply.argtypes = [c_fp, ctypes.c_long, c_dp, c_lp,
                                      ctypes.c_int, c_fp]
        lib.scl_isd_apply.argtypes = [c_fp, ctypes.c_long, ctypes.c_double,
                                      ctypes.c_double, ctypes.c_uint64, c_fp]
        lib.scl_ssi_mix.argtypes = [c_fp, c_fp, ctypes.c_long, ctypes.c_double,
                                    c_fp]
        lib.scl_multiview_pad.argtypes = [
            ctypes.POINTER(c_fp), c_lp, ctypes.c_int, ctypes.c_long,
            ctypes.c_long, ctypes.c_int, ctypes.c_long, c_fp,
        ]
        lib.scl_mix_at_snr.argtypes = [c_fp, ctypes.c_long, c_fp,
                                       ctypes.c_long, ctypes.c_double, c_fp]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# codec library (native/scl_codec.cpp — ffmpeg libraries, separate .so so the
# dependency-free DSP library stays usable when libav* is absent)
# ---------------------------------------------------------------------------


def _build_codec() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO_CODEC, _SRC_CODEC,
             "-lavformat", "-lavcodec", "-lavutil"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load_codec() -> Optional[ctypes.CDLL]:
    global _codec_lib, _codec_tried
    with _lock:
        if _codec_lib is not None or _codec_tried:
            return _codec_lib
        _codec_tried = True
        if not os.path.exists(_SO_CODEC) or (
            os.path.exists(_SRC_CODEC)
            and os.path.getmtime(_SO_CODEC) < os.path.getmtime(_SRC_CODEC)
        ):
            if not _build_codec():
                return None
        try:
            lib = ctypes.CDLL(_SO_CODEC)
        except OSError:
            return None
        if lib.scl_codec_abi_version() != 1:
            return None
        c_fp = ctypes.POINTER(ctypes.c_float)
        lib.scl_codec_last_error.restype = ctypes.c_char_p
        lib.scl_codec_encoder_available.argtypes = [ctypes.c_char_p]
        lib.scl_audio_open.restype = ctypes.c_void_p
        lib.scl_audio_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.scl_audio_copy.argtypes = [ctypes.c_void_p, c_fp]
        lib.scl_audio_close.argtypes = [ctypes.c_void_p]
        lib.scl_audio_encode.restype = ctypes.c_int
        lib.scl_audio_encode.argtypes = [
            ctypes.c_char_p, c_fp, ctypes.c_long, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_long,
        ]
        _codec_lib = lib
        return _codec_lib


def codec_available() -> bool:
    """True when the libav*-backed decode/encode module is usable."""
    return _load_codec() is not None


def encoder_available(codec: str) -> bool:
    lib = _load_codec()
    return bool(lib) and lib.scl_codec_encoder_available(codec.encode()) == 1


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Decode ANY audio file (flac/mp3/ogg/opus/wav/...) to mono float32 at
    its native sample rate via libavformat/libavcodec."""
    lib = _load_codec()
    if lib is None:
        raise RuntimeError("native codec library unavailable")
    n = ctypes.c_long(0)
    sr = ctypes.c_int(0)
    handle = lib.scl_audio_open(path.encode(), ctypes.byref(n), ctypes.byref(sr))
    if not handle:
        raise ValueError(
            f"cannot decode {path}: {lib.scl_codec_last_error().decode()}"
        )
    try:
        out = np.empty(n.value, np.float32)
        lib.scl_audio_copy(handle, _fptr(out))
    finally:
        lib.scl_audio_close(handle)
    return out, int(sr.value)


def encode_audio(
    path: str, x: np.ndarray, sr: int, codec: str, bitrate: int = 0
) -> None:
    """Encode mono float32 to ``path`` (container from extension: .mp3, .opus,
    .flac, .wav for alaw/ulaw/g722). bitrate in bits/s, 0 = codec default."""
    lib = _load_codec()
    if lib is None:
        raise RuntimeError("native codec library unavailable")
    xf = np.ascontiguousarray(x, np.float32)
    ret = lib.scl_audio_encode(
        path.encode(), _fptr(xf), len(xf), int(sr), codec.encode(), int(bitrate)
    )
    if ret != 0:
        raise ValueError(
            f"encode to {path} failed ({codec}): "
            f"{lib.scl_codec_last_error().decode()}"
        )


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode a PCM16/float32 WAV to mono float32. Raises on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    sr = ctypes.c_int(0)
    frames = lib.scl_wav_read_f32(path.encode(), None, 0, ctypes.byref(sr))
    if frames < 0:
        raise ValueError(f"cannot decode {path}")
    out = np.empty(frames, np.float32)
    got = lib.scl_wav_read_f32(path.encode(), _fptr(out), frames, ctypes.byref(sr))
    if got != frames:
        raise ValueError(f"short read on {path}")
    return out, int(sr.value)


def fir_centered(x: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x64 = np.ascontiguousarray(x, np.float64)
    b64 = np.ascontiguousarray(b, np.float64)
    y = np.empty_like(x64)
    lib.scl_fir_centered(_dptr(x64), len(x64), _dptr(b64), len(b64), _dptr(y))
    return y


def lnl_apply(x: np.ndarray, chains) -> np.ndarray:
    """sum_i fir(x^(i+1), chains[i]) -> de-mean -> conditional peak norm."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xf = np.ascontiguousarray(x, np.float32)
    coeffs = np.ascontiguousarray(np.concatenate(chains), np.float64)
    offsets = np.zeros(len(chains) + 1, np.int64)
    np.cumsum([len(c) for c in chains], out=offsets[1:])
    out = np.empty_like(xf)
    lib.scl_lnl_apply(
        _fptr(xf), len(xf), _dptr(coeffs),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(chains), _fptr(out),
    )
    return out


def isd_apply(x: np.ndarray, p_max: float, g_sd: float, seed: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xf = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(xf)
    lib.scl_isd_apply(_fptr(xf), len(xf), float(p_max), float(g_sd),
                      ctypes.c_uint64(seed), _fptr(out))
    return out


def ssi_mix(x: np.ndarray, noise: np.ndarray, snr_db: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xf = np.ascontiguousarray(x, np.float32)
    nf = np.ascontiguousarray(noise, np.float32)
    out = np.empty_like(xf)
    lib.scl_ssi_mix(_fptr(xf), _fptr(nf), len(xf), float(snr_db), _fptr(out))
    return out


def multiview_pad(views, length: int, repeat_pad: bool, start: int) -> np.ndarray:
    """Co-crop views (already conceptually matched to views[0]'s length) to
    [V, length] with the shared start offset."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    vs = [np.ascontiguousarray(v, np.float32) for v in views]
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(vs))(*[_fptr(v) for v in vs])
    lens = np.array([len(v) for v in vs], np.int64)
    out = np.empty((len(vs), length), np.float32)
    lib.scl_multiview_pad(
        ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), len(vs),
        int(lens[0]), length, int(bool(repeat_pad)), int(start), _fptr(out),
    )
    return out


def mix_at_snr(x: np.ndarray, noise: np.ndarray, snr_db: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    xf = np.ascontiguousarray(x, np.float32)
    nf = np.ascontiguousarray(noise, np.float32)
    out = np.empty_like(xf)
    lib.scl_mix_at_snr(_fptr(xf), len(xf), _fptr(nf), len(nf), float(snr_db),
                       _fptr(out))
    return out
