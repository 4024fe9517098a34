"""Native codec module (native/scl_codec.cpp — libavformat/libavcodec via
ctypes): universal decode (the LA19 eval set ships .flac,
``datautils/asvspoof_2019_augall_3.py:152``) and real lossy round-trips for
the reference's ``wav_codec`` / telephone augmentors
(``core_scripts/data_io/wav_augmentation.py:367-456``,
``datautils/audio_augmentor/telephone.py:23-72``).

All tests skip when the ffmpeg libraries (or g++) are absent; in that case
the framework keeps its previous fallbacks (soundfile / ffmpeg binary /
G.711-only).
"""

import numpy as np
import pytest

from scl_deepfake_audio_detection_tpu import native
from scl_deepfake_audio_detection_tpu.dsp.codec import (
    alaw_decode,
    alaw_encode,
    codec_roundtrip,
    g722_roundtrip,
    random_codec,
    telephone_effect,
    ulaw_decode,
    ulaw_encode,
)
from scl_deepfake_audio_detection_tpu.utils.audio_io import load_audio

pytestmark = pytest.mark.skipif(
    not native.codec_available(), reason="native codec module unavailable"
)

SR = 16000


@pytest.fixture
def wav(rng):
    t = np.arange(SR * 2) / SR
    x = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=SR * 2)
    # int16-representable so lossless codecs round-trip exactly
    return (np.clip(np.round(x * 32768), -32768, 32767) / 32768).astype(
        np.float32
    )


def _corr(a, b):
    n = min(len(a), len(b))
    return float(np.corrcoef(a[:n], b[:n])[0, 1])


def test_flac_roundtrip_lossless(tmp_path, wav):
    """FLAC encode (libavcodec's own encoder) -> our decode: bit-exact."""
    p = str(tmp_path / "t.flac")
    native.encode_audio(p, wav, SR, "flac")
    y, sr = native.read_audio(p)
    assert sr == SR
    np.testing.assert_array_equal(y[: len(wav)], wav)
    # zero-padded final frame only adds trailing silence
    assert np.all(y[len(wav):] == 0)


def test_load_audio_decodes_flac(tmp_path, wav):
    """The eval-loader path: load_audio on .flac (no soundfile installed)."""
    p = str(tmp_path / "t.flac")
    native.encode_audio(p, wav, SR, "flac")
    y = load_audio(p, SR)
    np.testing.assert_array_equal(y[: len(wav)], wav)


def test_load_audio_decodes_mp3_and_resamples(tmp_path, wav):
    p = str(tmp_path / "t.mp3")
    native.encode_audio(p, wav, SR, "mp3", 128_000)
    y = load_audio(p, SR)  # gapless: no codec delay offset
    assert abs(len(y) - len(wav)) <= SR  # padded to codec frame boundary
    assert _corr(wav, y) > 0.98


@pytest.mark.parametrize("codec,bitrate", [("mp3", "64k"), ("opus", "48k")])
def test_lossy_roundtrip_aligned(codec, bitrate, wav):
    if not native.encoder_available(codec):
        pytest.skip(f"no {codec} encoder in these ffmpeg libs")
    y = codec_roundtrip(wav, SR, codec, bitrate)
    assert y.shape == wav.shape and y.dtype == np.float32
    # gapless handling keeps the round trip sample-aligned: correlation at
    # lag 0 must already be high (no residual codec delay)
    assert _corr(wav, y) > 0.95


def test_mp3_bitrate_orders_distortion(wav):
    if not native.encoder_available("mp3"):
        pytest.skip("no mp3 encoder")
    lo = codec_roundtrip(wav, SR, "mp3", "16k")
    hi = codec_roundtrip(wav, SR, "mp3", "256k")
    err_lo = float(np.mean((wav - lo) ** 2))
    err_hi = float(np.mean((wav - hi) ** 2))
    assert err_hi < err_lo


def test_g722_roundtrip(wav):
    if not native.encoder_available("g722"):
        pytest.skip("no g722 codec")
    y = g722_roundtrip(wav, SR)
    assert y.shape == wav.shape
    assert _corr(wav, y) > 0.95  # QMF delay compensated
    assert not np.allclose(y, wav)  # ADPCM quantization really happened


def test_telephone_effect_g722_uses_real_codec(wav):
    if not native.encoder_available("g722"):
        pytest.skip("no g722 codec")
    y = telephone_effect(wav, SR, encoding="g722")
    assert y.shape == wav.shape
    assert np.isfinite(y).all()


def test_ffmpeg_g711_agrees_with_our_tables(tmp_path):
    """Cross-validation against an independent implementation: ffmpeg's
    pcm_alaw/pcm_mulaw round trip vs our vectorized G.711 over the full
    int16 range.  The two differ only in rounding direction at segment-cell
    boundaries (ffmpeg rounds-to-nearest where Sun g711.c — and CPython's
    audioop, which our tables are pinned bit-exact against — truncates), so
    assert near-total agreement with at most one quantization step where
    they disagree."""
    vals = np.arange(-32768, 32768, dtype=np.int32)
    x = (vals / 32768.0).astype(np.float32)
    for law, enc, dec in (
        ("alaw", alaw_encode, alaw_decode),
        ("ulaw", ulaw_encode, ulaw_decode),
    ):
        p = str(tmp_path / f"t_{law}.wav")
        native.encode_audio(p, x, SR, law)
        y, sr = native.read_audio(p)
        assert sr == SR
        ours = dec(enc(x))
        diff = np.abs(y[: len(x)] - ours) * 32768.0
        exact = float(np.mean(diff == 0))
        assert exact > 0.97, f"{law}: only {exact:.3f} bit-identical"
        # top A-law segment quantizes in steps of 1024 int16 units
        assert float(diff.max()) <= 1024.0, f"{law}: {diff.max()}"


def test_random_codec_uses_real_lossy_path(wav, rng):
    if not (native.encoder_available("mp3") and native.encoder_available("opus")):
        pytest.skip("lossy encoders missing")
    y = random_codec(wav, rng, SR)
    assert y.shape == wav.shape
    # a real lossy codec, not the G.711 fallback: G.711 error is bounded by
    # the companding step (~1/32 max), mp3/opus introduce spread-out error
    assert _corr(wav, y) > 0.9


def test_decode_error_reports_path(tmp_path):
    bad = tmp_path / "not_audio.flac"
    bad.write_bytes(b"this is not a flac file")
    with pytest.raises(ValueError, match="not_audio.flac"):
        native.read_audio(str(bad))


def test_native_encode_failure_translates_to_codec_unavailable(wav, monkeypatch, rng):
    """Callers contract on CodecUnavailable for fallback; a native encoder
    that exists but rejects the request (e.g. sample rate) must not leak
    ValueError through codec_roundtrip / random_codec."""
    from scl_deepfake_audio_detection_tpu.dsp import codec as C

    def boom(*a, **kw):
        raise ValueError("encoder rejected input")

    monkeypatch.setattr(native, "encode_audio", boom)
    with pytest.raises(C.CodecUnavailable):
        C.codec_roundtrip(wav, SR, "mp3", "64k")
    y = C.random_codec(wav, rng, SR)  # falls back to G.711, never raises
    assert y.shape == wav.shape
    y2 = C.telephone_effect(wav, SR, encoding="g722")  # falls back to ulaw
    assert y2.shape == wav.shape


def test_decoder_survives_corrupted_files(tmp_path, wav, rng):
    """Truncated / bit-flipped / garbage inputs must raise ValueError (or
    decode a prefix), never crash the process — eval sweeps hit damaged
    files on real disks."""
    p = str(tmp_path / "good.flac")
    native.encode_audio(p, wav, SR, "flac")
    blob = open(p, "rb").read()

    cases = {
        "truncated.flac": blob[: len(blob) // 3],
        "bitflip.flac": bytes(
            b ^ (0xFF if i in range(2000, 2032) else 0)
            for i, b in enumerate(blob)
        ),
        "garbage.flac": bytes(rng.integers(0, 256, 4096, dtype=np.uint8)),
        "empty.flac": b"",
    }
    for name, data in cases.items():
        f = tmp_path / name
        f.write_bytes(data)
        try:
            y, sr = native.read_audio(str(f))
            # partial decode is acceptable; output must be sane
            assert np.isfinite(y).all() and sr > 0
        except ValueError:
            pass  # clean rejection is the other acceptable outcome
