"""Native host-DSP library (native/scl_host.cpp via ctypes): exact parity
with the numpy implementations for deterministic ops, distribution-level
checks for the seeded ones.  All tests skip when no g++ toolchain exists."""

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu import native
from scl_deepfake_audio_detection_tpu.dsp import fir as F
from scl_deepfake_audio_detection_tpu.dsp import pad as P
from scl_deepfake_audio_detection_tpu.utils.audio_io import load_audio, save_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_wav_roundtrip(tmp_path, rng):
    x = (0.4 * rng.normal(size=12345)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "t.wav")
    save_wav(p, x, 16000)
    y, sr = native.read_wav(p)
    assert sr == 16000 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_load_audio_uses_native(tmp_path, rng):
    x = (0.2 * rng.normal(size=4000)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "t.wav")
    save_wav(p, x, 16000)
    y = load_audio(p, 16000)
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_fir_centered_matches_numpy(rng):
    x = rng.normal(size=4001).astype(np.float64)
    for ntaps in (11, 100, 257):
        b = rng.normal(size=ntaps)
        want = F.filter_fir_centered(x, b)
        got = native.fir_centered(x, b)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_lnl_apply_matches_numpy(rng):
    x = (0.5 * rng.normal(size=8000)).astype(np.float32)
    chains = [rng.normal(size=rng.integers(20, 90)) * 0.1 for _ in range(4)]
    got = native.lnl_apply(x, chains)

    y = np.zeros(len(x), np.float64)
    xx = x.astype(np.float64)
    for i, b in enumerate(chains):
        y += F.filter_fir_centered(np.power(xx, i + 1), b)
    y -= y.mean()
    peak = np.abs(y).max()
    if peak > 1.0:
        y /= peak
    np.testing.assert_allclose(got, y.astype(np.float32), atol=1e-5)


def test_lnl_through_rawboost_dispatch(rng):
    """rawboost.lnl_convolutive_noise transparently uses the native path."""
    from scl_deepfake_audio_detection_tpu.dsp.rawboost import lnl_convolutive_noise
    from scl_deepfake_audio_detection_tpu.utils.config import RawBoostConfig

    cfg = RawBoostConfig()
    x = (0.3 * rng.normal(size=16000)).astype(np.float32)
    out = lnl_convolutive_noise(x, cfg, 16000, np.random.default_rng(7))
    assert out.shape == x.shape and out.dtype == np.float32
    assert np.isfinite(out).all() and np.abs(out).max() <= 1.0 + 1e-6


def test_isd_distribution(rng):
    # amplitude low enough that |x + g_sd*x*f| <= 0.3 never triggers the
    # conditional peak renormalization (which would rescale every sample)
    x = np.ones(20000, np.float32) * 0.1
    out = native.isd_apply(x, p_max=10.0, g_sd=2.0, seed=42)
    changed = np.sum(out != x)
    # beta ~ U(0,10)% -> at most 10% of samples changed
    assert 0 < changed <= 0.101 * len(x)
    assert np.abs(out).max() <= 1.0 + 1e-6


def test_ssi_mix_matches_numpy(rng):
    x = (0.3 * rng.normal(size=4000)).astype(np.float32)
    noise = rng.normal(size=4000).astype(np.float32)
    snr = 20.0
    got = native.ssi_mix(x, noise, snr)
    want = x + noise / np.linalg.norm(noise) * np.linalg.norm(x) / (10 ** (0.05 * snr))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)


def test_multiview_pad_matches_numpy(rng):
    views = [rng.normal(size=n).astype(np.float32) for n in (7000, 5000, 9000)]
    start = 321
    got = native.multiview_pad(views, length=6400, repeat_pad=True, start=start)
    # numpy reference: match to views[0] length, then shared crop
    matched = [P._match_length(v, 7000, True) for v in views]
    want = np.stack([v[start : start + 6400] for v in matched])
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_multiview_pad_zero_mode(rng):
    views = [rng.normal(size=n).astype(np.float32) for n in (3000, 2000)]
    got = native.multiview_pad(views, length=4000, repeat_pad=False, start=0)
    assert got.shape == (2, 4000)
    np.testing.assert_allclose(got[0, :3000], views[0], atol=1e-7)
    np.testing.assert_allclose(got[0, 3000:], 0.0)
    np.testing.assert_allclose(got[1, 2000:], 0.0)


def test_mix_at_snr_power_ratio(rng):
    x = rng.normal(size=16000).astype(np.float32)
    noise = rng.normal(size=8000).astype(np.float32)
    out = native.mix_at_snr(x, noise, snr_db=10.0)
    added = out - x
    snr = 10 * np.log10(np.mean(x**2) / np.mean(added**2))
    assert snr == pytest.approx(10.0, abs=0.3)


def test_multiview_pad_window_crossing_base_len(rng):
    """Window beyond base_len (short anchor, repeat mode): the C kernel must
    apply the SAME two-stage tiling as dsp/pad.multiview_pad — first each
    view to base_len, then the base-matched view to the target — not tile
    directly mod the raw view length."""
    views = [rng.normal(size=n).astype(np.float32) for n in (5000, 3000)]
    got = native.multiview_pad(views, length=6400, repeat_pad=True, start=0)
    matched = [P._match_length(v, 5000, True) for v in views]       # stage 1
    matched = [P._match_length(v, 6400, True) for v in matched]     # stage 2
    want = np.stack([v[:6400] for v in matched])
    np.testing.assert_allclose(got, want, atol=1e-7)
    # the reviewer's exact counterexample: index 5500 of view 1 is v1[500]
    assert got[1, 5500] == views[1][500 % 3000]
    # zero mode: everything past base_len is zero
    got0 = native.multiview_pad(views, length=6400, repeat_pad=False, start=0)
    np.testing.assert_allclose(got0[:, 5000:], 0.0)


def test_wav_reader_rejects_sub_byte_bits(tmp_path):
    """A fmt chunk declaring bits-per-sample < 8 must return an error (the
    loader falls through to libav), never a divide-by-zero process kill."""
    import struct

    p = tmp_path / "bad.wav"
    data = b"\x00" * 64
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000, 1, 4)  # 4-bit!
    riff = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    p.write_bytes(riff)
    with pytest.raises(ValueError):
        native.read_wav(str(p))
