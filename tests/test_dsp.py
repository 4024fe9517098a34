"""DSP layer: FIR design parity vs scipy, RawBoost semantics, padding, VAD."""

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu.dsp import augment as A
from scl_deepfake_audio_detection_tpu.dsp import fir, pad, rawboost, vad
from scl_deepfake_audio_detection_tpu.utils.config import RawBoostConfig

FS = 16000


# --- FIR design --------------------------------------------------------------


@pytest.mark.parametrize("taps,f1,f2", [(11, 500, 1500), (51, 20, 900), (101, 3000, 7900)])
def test_firwin_matches_scipy(taps, f1, f2):
    from scipy.signal import firwin

    want = firwin(taps, [float(f1), float(f2)], window="hamming", fs=FS)
    got = fir.firwin_bandstop(taps, f1, f2, FS)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_freq_response_max_matches_scipy(rng):
    from scipy.signal import freqz

    b = rng.normal(size=37)
    _, h = freqz(b, 1, fs=FS)
    assert fir.freq_response_max(b) == pytest.approx(np.max(np.abs(h)), rel=1e-10)


def test_filter_fir_centered_matches_reference_recipe(rng):
    """Reference filterFIR (RawBoost.py:51-56): pad N, lfilter, slice N/2."""
    from scipy.signal import lfilter

    x = rng.normal(size=400).astype(np.float64)
    b = rng.normal(size=37)
    n = b.shape[0] + 1
    xpad = np.pad(x, (0, n))
    want = lfilter(b, 1, xpad)[n // 2 : xpad.shape[0] - n // 2]
    got = fir.filter_fir_centered(x, b)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_design_notch_chain_properties(rng):
    b = fir.design_notch_chain(rng, 5, 20, 8000, 100, 1000, 10, 100, 0, 0, FS)
    assert b.ndim == 1 and b.shape[0] % 2 == 1  # odd-tap chain
    # gain G=0 -> peak response exactly 1
    assert fir.freq_response_max(b) == pytest.approx(1.0, rel=1e-9)


# --- RawBoost ---------------------------------------------------------------


def test_norm_wav():
    x = np.array([0.5, -2.0, 1.0])
    np.testing.assert_allclose(rawboost.norm_wav(x), x / 2.0)
    np.testing.assert_allclose(rawboost.norm_wav(np.array([0.5, -0.25]), always=True), [1.0, -0.5])
    np.testing.assert_allclose(rawboost.norm_wav(np.array([0.5, -0.25])), [0.5, -0.25])


@pytest.fixture
def tone(rng):
    t = np.arange(FS // 4) / FS
    return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def test_lnl_convolutive_noise(tone, rng):
    cfg = RawBoostConfig()
    y = rawboost.lnl_convolutive_noise(tone, cfg, FS, rng)
    assert y.shape == tone.shape
    assert np.max(np.abs(y)) <= 1.0 + 1e-6
    assert abs(np.mean(y)) < 1e-3  # mean-subtracted
    assert not np.allclose(y, tone)


def test_isd_additive_noise_touches_subset(tone, rng):
    cfg = RawBoostConfig()
    y = rawboost.isd_additive_noise(tone, cfg, rng)
    assert y.shape == tone.shape
    # a final peak-normalization may rescale everything; undo it before
    # counting the impulse positions
    nz = np.abs(tone) > 1e-3
    scale = np.median(y[nz] / tone[nz])
    changed = np.sum(~np.isclose(y, tone * scale, rtol=1e-4, atol=1e-6))
    assert changed <= int(len(tone) * cfg.P / 100.0) + 1  # at most beta% touched


def test_ssi_additive_noise_snr_range(tone, rng):
    cfg = RawBoostConfig()
    y = rawboost.ssi_additive_noise(tone, cfg, FS, rng)
    noise = y - tone
    snr = 20 * np.log10(np.linalg.norm(tone) / np.linalg.norm(noise))
    assert cfg.SNRmin - 1.0 < snr < cfg.SNRmax + 1.0


@pytest.mark.parametrize("algo", [1, 2, 3, 4, 5, 6, 7, 8, 0])
def test_process_rawboost_all_algos(tone, rng, algo):
    cfg = RawBoostConfig()
    y = rawboost.process_rawboost(tone, FS, cfg, rng, algo=algo)
    assert y.shape == tone.shape
    assert np.all(np.isfinite(y))
    if algo == 0:
        np.testing.assert_array_equal(y, tone)


def test_rawboost_deterministic_given_rng(tone):
    cfg = RawBoostConfig()
    a = rawboost.process_rawboost(tone, FS, cfg, np.random.default_rng(7), algo=5)
    b = rawboost.process_rawboost(tone, FS, cfg, np.random.default_rng(7), algo=5)
    np.testing.assert_array_equal(a, b)


# --- padding ------------------------------------------------------------------


def test_pad_eval_matches_reference_semantics():
    x = np.arange(5, dtype=np.float32)
    # repeat: np.tile(x, (1, reps))[:, :max][0] (reference pad :54-56)
    np.testing.assert_array_equal(
        pad.pad_eval(x, "repeat", 12), np.tile(x, 3)[:12]
    )
    z = pad.pad_eval(x, "zero", 8)
    np.testing.assert_array_equal(z[:5], x)
    assert np.all(z[5:] == 0)
    np.testing.assert_array_equal(pad.pad_eval(x, "zero", 3), x[:3])


def test_multiview_pad_shared_crop(rng):
    base = rng.normal(size=1000).astype(np.float32)
    views = [base, base * 2.0, base[:700]]  # different lengths
    out = pad.multiview_pad(views, 400, repeat_pad=True, random_trim=True, rng=rng)
    assert out.shape == (3, 400)
    # shared offset: view1 == 2 * view0 everywhere
    np.testing.assert_allclose(out[1], 2.0 * out[0], rtol=1e-6)


def test_multiview_pad_short_group_tiles(rng):
    views = [np.ones(100, np.float32) * i for i in (1, 2)]
    out = pad.multiview_pad(views, 250, repeat_pad=True, rng=rng)
    assert out.shape == (2, 250)
    assert np.all(out[0] == 1.0) and np.all(out[1] == 2.0)
    out_z = pad.multiview_pad(views, 250, repeat_pad=False, rng=rng)
    assert np.all(out_z[0][100:] == 0)


# --- VAD ----------------------------------------------------------------------


def test_vad_finds_speech_region(rng):
    sil = np.zeros(FS // 2, np.float32) + 1e-5 * rng.normal(size=FS // 2).astype(np.float32)
    t = np.arange(FS) / FS
    speech = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    x = np.concatenate([sil, speech, sil])
    start, end = vad.speech_bounds_samples(x, FS)
    assert abs(start - len(sil)) < 1600  # within 100 ms
    assert abs(end - (len(sil) + len(speech))) < 3200


def test_vad_split_reconstructs_lengths(rng):
    x = rng.normal(size=FS).astype(np.float32) * 0.3
    speech, silence, tag = vad.split_speech_silence(x, FS)
    assert tag.ndim == 1
    assert speech.ndim == 1 and silence.ndim == 1
    # all-speech signal: silence buffer nearly empty
    assert np.sum(tag) > 0.9 * len(tag)


# --- augmentors ----------------------------------------------------------------


def test_background_noise_int16_scale(tone, rng):
    noise = rng.normal(size=len(tone)).astype(np.float32) * 0.1
    y = A.background_noise(tone, noise, rng)
    assert y.shape == tone.shape
    assert np.max(np.abs(y)) > 100.0  # int16-scale quirk preserved


def test_reverb_peak_normalized(tone, rng):
    rir = np.zeros(200, np.float32)
    rir[0], rir[100] = 1.0, 0.5
    y = A.reverb(tone, rir)
    assert y.shape == (len(tone) + len(rir) - 1,)
    assert np.max(np.abs(y)) <= 1 << 15


def test_reverb_equals_np_convolve(tone):
    rir = np.random.default_rng(3).normal(size=64).astype(np.float32)
    y = A.reverb(tone, rir)
    ref = np.convolve(tone.astype(np.float64), rir)
    ref = ref / np.max(np.abs(ref))
    np.testing.assert_allclose(y / (1 << 15), ref, atol=2e-4)


def test_volume_gain_range(tone, rng):
    y = A.volume(tone, rng)
    ratio = np.max(np.abs(y)) / (np.max(np.abs(tone)) * (1 << 15))
    assert 10 ** (-10 / 20) - 0.01 < ratio < 10 ** (10 / 20) + 0.3


def test_time_stretch_changes_length(tone):
    y = A.time_stretch(tone, 1.25)
    assert abs(len(y) - len(tone) / 1.25) < 512


def test_pitch_shift_moves_tone_frequency(tone, rng):
    class FixedRng:
        def integers(self, lo, hi):
            return 1  # +1 semitone

    y = A.pitch_shift(tone, FixedRng(), sr=FS)
    spec_x = np.abs(np.fft.rfft(tone * np.hanning(len(tone))))
    spec_y = np.abs(np.fft.rfft((y / (1 << 15)) * np.hanning(len(y))))
    fx = np.argmax(spec_x) * FS / len(tone)
    fy = np.argmax(spec_y) * FS / len(y)
    assert fy == pytest.approx(fx * 2 ** (1 / 12), rel=0.05)


def test_time_mask_zeroes_segment(tone, rng):
    y = A.time_mask(tone, rng, sr=FS)
    assert y.shape == tone.shape
    assert np.sum(y == 0) > 0


def test_rand_sil_trim_and_multiview(rng):
    from scl_deepfake_audio_detection_tpu.dsp.pad import (
        multiview_silence_trim,
        rand_sil_trim,
    )

    sr = 16000
    # 0.5s silence + 1s speech + 0.5s silence
    wav = np.zeros(2 * sr, np.float32)
    wav[sr // 2 : 3 * sr // 2] = 0.3 * rng.normal(size=sr).astype(np.float32)
    trimmed, start, end = rand_sil_trim(wav, sr)
    assert 0 < start <= sr // 2 + 400  # VAD smoothing slack
    assert 3 * sr // 2 - 400 <= end <= 2 * sr
    np.testing.assert_array_equal(trimmed, wav[start:end])

    # random silence keep: trims strictly less silence than the full trim
    t2, s2, e2 = rand_sil_trim(wav, sr, random_trim_sil=True,
                               rng=np.random.default_rng(5))
    assert s2 <= start and e2 >= end

    # co-trim: all views share view 0's bounds
    views = [wav, rng.normal(size=2 * sr).astype(np.float32)]
    out = multiview_silence_trim(views, sr)
    assert len(out) == 2
    assert out[0].shape == out[1].shape == (end - start,)
    np.testing.assert_array_equal(out[1], views[1][start:end])

    # all-silence input passes through
    silent = np.zeros(sr, np.float32)
    t3, s3, e3 = rand_sil_trim(silent, sr)
    assert (s3, e3) == (0, sr) or t3.shape[0] == sr


@pytest.mark.parametrize("steps", [-1, 1])
def test_pitch_shift_preserves_duration(tone, steps):
    """The librosa recipe is duration-preserving; stretching at 1/rate would
    tempo-distort by rate^2 and pad/crop ~11% of the utterance."""

    class FixedRng:
        def __init__(self, s):
            self.s = s

        def integers(self, lo, hi):
            return self.s

    y = A.pitch_shift(tone, FixedRng(steps), sr=FS)
    assert len(y) == len(tone)
    # no trailing-silence pad: the last 10% must carry real signal
    tail = y[-len(y) // 10 :] / (1 << 15)
    assert np.sqrt(np.mean(tail**2)) > 0.05 * np.sqrt(np.mean((y / (1 << 15)) ** 2))
