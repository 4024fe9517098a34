"""Codec (G.711), telephone effect, waveform morphing, spectral tools."""

import numpy as np
import pytest

import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.dsp.codec import (
    alaw_decode,
    alaw_encode,
    bandpass_fir,
    g711_roundtrip,
    random_codec,
    telephone_effect,
    ulaw_decode,
    ulaw_encode,
)
from scl_deepfake_audio_detection_tpu.dsp.morph import morph_waveform
from scl_deepfake_audio_detection_tpu.dsp.spectral import (
    griffin_lim,
    lpc_analysis,
    lpc_residual,
    lpc_synthesis,
    mel_filterbank,
    melspec,
    stft_mag,
    warp_frequency,
)


def _tone(f=440.0, sr=16000, n=4000, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


# -------------------------------------------------------------------- G.711


@pytest.mark.parametrize("law", ["alaw", "ulaw"])
def test_g711_roundtrip_low_distortion(law):
    x = _tone()
    y = g711_roundtrip(x, law)
    assert y.shape == x.shape
    snr = 10 * np.log10(np.mean(x**2) / np.mean((x - y) ** 2))
    assert snr > 30  # G.711 delivers ~35-38 dB SNR on speech-level tones


def test_g711_matches_audioop_reference():
    """Bit-exact against CPython's G.711 tables (audioop in stdlib <=3.12)."""
    audioop = pytest.importorskip("audioop")
    x = _tone(n=1000)
    pcm = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)

    want_a = np.frombuffer(audioop.lin2alaw(pcm.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(alaw_encode(x), want_a)
    want_back = np.frombuffer(audioop.alaw2lin(want_a.tobytes(), 2), np.int16)
    np.testing.assert_allclose(
        alaw_decode(want_a), want_back.astype(np.float32) / 32768.0, atol=1e-6
    )

    want_u = np.frombuffer(audioop.lin2ulaw(pcm.tobytes(), 2), np.uint8)
    np.testing.assert_array_equal(ulaw_encode(x), want_u)
    want_back_u = np.frombuffer(audioop.ulaw2lin(want_u.tobytes(), 2), np.int16)
    np.testing.assert_allclose(
        ulaw_decode(want_u), want_back_u.astype(np.float32) / 32768.0, atol=1e-6
    )


def test_bandpass_kills_out_of_band():
    sr = 16000
    lo_tone = _tone(100, sr)  # below 300 Hz
    mid_tone = _tone(1000, sr)  # in band
    hi_tone = _tone(6000, sr)  # above 3400 Hz
    for x, keep in [(lo_tone, False), (mid_tone, True), (hi_tone, False)]:
        y = bandpass_fir(x, sr)
        ratio = np.sqrt(np.mean(y**2) / np.mean(x**2))
        assert (ratio > 0.7) == keep, ratio


def test_telephone_effect_shape_and_band(rng):
    x = rng.normal(size=8000).astype(np.float32) * 0.3
    y = telephone_effect(x)
    assert y.shape == x.shape and np.isfinite(y).all()


def test_random_codec_fallback_runs(rng):
    x = _tone(n=2000)
    y = random_codec(x, rng)
    assert y.shape == x.shape and np.isfinite(y).all()


# ------------------------------------------------------------------ morphing


def test_morph_wav_level_mix():
    a, b = _tone(300), _tone(500)
    out = morph_waveform(a, b, para=0.25, method=1)
    np.testing.assert_allclose(out, 0.25 * a + 0.75 * b, atol=1e-6)


def test_morph_para_one_keeps_wav1_specamp():
    a, b = _tone(300), _tone(500)
    out = morph_waveform(a, b, para=1.0, method=2)
    # para=1 -> amp and phase from wav1 -> ~identity up to STFT edges
    core = slice(640, len(a) - 640)
    err = np.mean((out[core] - a[core]) ** 2) / np.mean(a[core] ** 2)
    assert err < 1e-3


@pytest.mark.parametrize("method", [2, 3, 4])
def test_morph_methods_finite_and_shaped(method):
    a, b = _tone(300), _tone(500, n=4500)  # different lengths
    out = morph_waveform(a, b, para=0.5, method=method)
    assert out.shape == a.shape
    assert np.isfinite(out).all()


# ------------------------------------------------------------------ spectral


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(16000, 1024, 80)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()  # every filter is non-empty


def test_melspec_detects_tone_band():
    x = jnp.asarray(_tone(1000))
    mel = np.asarray(melspec(x, log=False))
    assert mel.ndim == 2 and mel.shape[1] == 80
    fb = mel_filterbank()
    # strongest mel channel should be near 1000 Hz
    centers = np.argmax(fb, axis=1) * (16000 / 1024)
    top = np.argmax(mel.mean(axis=0))
    assert 700 < centers[top] < 1400


def test_stft_mag_batched():
    x = jnp.asarray(np.stack([_tone(300), _tone(600)]))
    m = stft_mag(x)
    assert m.shape[0] == 2 and m.shape[-1] == 513


def test_griffin_lim_reconstructs_tone():
    x = _tone(500, n=8000)
    mag = np.asarray(stft_mag(jnp.asarray(x), n_fft=1024, hop=256))
    y = griffin_lim(mag, n_fft=1024, hop=256, n_iter=16, length=len(x))
    assert y.shape == x.shape
    # reconstruction keeps the dominant frequency
    fy = np.abs(np.fft.rfft(y))
    fx = np.abs(np.fft.rfft(x))
    assert abs(int(np.argmax(fy)) - int(np.argmax(fx))) <= 2


def test_lpc_roundtrip():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(3, 320)).astype(np.float32)
    frames *= np.hanning(320).astype(np.float32)
    a, gain = lpc_analysis(frames, order=12)
    assert a.shape == (3, 13) and (a[:, 0] == 1).all()
    res = lpc_residual(frames, a)
    back = lpc_synthesis(res, a)
    np.testing.assert_allclose(back, frames, atol=1e-3)
    # inverse filtering whitens: residual energy < frame energy
    assert np.mean(res**2) < np.mean(frames**2) * 1.5


def test_warp_frequency_identity_at_alpha0():
    mag = jnp.asarray(np.random.default_rng(0).random((4, 257)).astype(np.float32))
    out = warp_frequency(mag, alpha=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mag), atol=1e-6)


def test_registry_has_new_augmentations():
    import scl_deepfake_audio_detection_tpu.data.augment_registry  # noqa: F401
    from scl_deepfake_audio_detection_tpu.utils.registry import AUGMENTATIONS

    assert AUGMENTATIONS.get("telephone_wrapper")
    assert AUGMENTATIONS.get("codec_wrapper")


def test_parametric_companding_roundtrips():
    """mu/A-law at arbitrary channel counts (wav_tools.py:34-139 capability):
    float-mode compand/expand is exact, int-mode error is bounded by the
    quantization step."""
    import numpy as np

    from scl_deepfake_audio_detection_tpu.dsp.codec import (
        alaw_compand,
        alaw_expand,
        mulaw_compand,
        mulaw_expand,
    )

    rng = np.random.default_rng(0)
    x = np.clip(rng.normal(size=4000) * 0.3, -0.999, 0.999)
    A = 87.6
    for channels in (256, 1024):
        mu = channels - 1.0
        # expansion derivative wrt the companded value, per codec — the
        # quantization error after expand is bounded by step * derivative
        d_mu = lambda ax: (1.0 + mu * ax) * np.log1p(mu) / mu
        d_a = lambda ax: (1 + np.log(A)) * np.maximum(ax, 1.0 / A)
        for enc, dec, deriv in (
            (mulaw_compand, mulaw_expand, d_mu),
            (alaw_compand, alaw_expand, d_a),
        ):
            # float mode: exact inverse
            y = enc(x, channels, scale_to_int=False)
            assert np.all(np.abs(y) <= 1.0 + 1e-9)
            np.testing.assert_allclose(dec(y, channels, input_int=False), x,
                                       atol=1e-9)
            # int mode: error within one step times the local derivative
            codes = enc(x, channels, scale_to_int=True)
            assert codes.dtype == np.int32
            assert codes.min() >= 0 and codes.max() <= channels - 1
            back = dec(codes, channels, input_int=True)
            step = 2.0 / mu
            assert np.all(np.abs(back - x) <= step * deriv(np.abs(x)) + 1e-9)
    # zero maps to mid-code and back to ~0
    assert abs(float(mulaw_expand(mulaw_compand(np.zeros(1)), 256))) < 1e-2
    # monotonicity of the float compander
    xs = np.linspace(-0.99, 0.99, 101)
    assert np.all(np.diff(mulaw_compand(xs, 256, False)) > 0)
    assert np.all(np.diff(alaw_compand(xs, 256, False)) > 0)


def test_save_wav_rejects_unimplemented_subtypes(tmp_path):
    from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

    with pytest.raises(ValueError, match="PCM_16"):
        save_wav(str(tmp_path / "x.wav"), np.zeros(10, np.float32),
                 16000, subtype="FLOAT")
