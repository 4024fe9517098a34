"""End-to-end numerics parity: HuggingFace Wav2Vec2Model (torch CPU) vs our
JAX XLSR on converted weights.

This is the strongest fidelity check available without the 1.2GB pretrained
checkpoint (zero-egress image): a randomly initialized *stable-layer-norm*
Wav2Vec2 — the exact architecture family of xls-r-300m
(``do_stable_layer_norm=True, feat_extract_norm='layer'``, reference
``model/xlsr.py:14-21`` loads the fairseq twin) — is converted through
``models/convert.from_hf_state_dict`` and must produce the same frame
features as the torch forward.  Exercises every conversion rule: conv
transposes, weight-norm contraction of the positional conv, q/k/v/o, LN
placement, GELU variant, SamePad trim.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from scl_deepfake_audio_detection_tpu.models import convert
from scl_deepfake_audio_detection_tpu.models import xlsr as X


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    hf_cfg = Wav2Vec2Config(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16, 16),
        conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2),
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        feat_extract_activation="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )
    torch.manual_seed(0)
    model = Wav2Vec2Model(hf_cfg).eval()
    cfg = convert.config_from_hf(hf_cfg)
    params = convert.from_hf_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_config_mapping(hf_pair):
    _, cfg, _ = hf_pair
    assert cfg.conv_layers == ((16, 10, 5), (16, 3, 2), (16, 2, 2))
    assert cfg.encoder_dim == 32 and cfg.encoder_layers == 2
    assert cfg.num_heads == 4 and cfg.ffn_dim == 64


def test_feature_encoder_matches_hf(hf_pair):
    model, cfg, params = hf_pair
    wav = np.random.default_rng(0).normal(size=(2, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = model.feature_extractor(torch.tensor(wav)).transpose(1, 2).numpy()
    got = np.asarray(X.feature_encoder(params, cfg, jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_full_forward_matches_hf(hf_pair):
    """Frame features after the full transformer must match torch closely
    (fp32 everywhere; the tolerance absorbs fp accumulation-order drift)."""
    model, cfg, params = hf_pair
    wav = np.random.default_rng(1).normal(size=(2, 3200)).astype(np.float32) * 0.1
    with torch.no_grad():
        want = model(torch.tensor(wav)).last_hidden_state.numpy()
    got = np.asarray(X.extract_features(params, cfg, jnp.asarray(wav)))
    assert got.shape == want.shape
    # cosine similarity per frame: the SURVEY's fidelity criterion (§7)
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.9999, cos.min()
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_fairseq_layout_roundtrip(hf_pair):
    """Build a synthetic fairseq-style state dict from known arrays and check
    the fairseq mapping produces the same pytree as direct construction —
    covers the fairseq key scheme without a fairseq install."""
    _, cfg, params = hf_pair
    rng = np.random.default_rng(3)
    sd = {}
    for i, (dim, k, s) in enumerate(cfg.conv_layers):
        cin = 1 if i == 0 else cfg.conv_layers[i - 1][0]
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = rng.normal(
            size=(dim, cin, k)
        ).astype(np.float32)
        sd[f"feature_extractor.conv_layers.{i}.0.bias"] = rng.normal(size=dim).astype(
            np.float32
        )
        sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = np.ones(dim, np.float32)
        sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = np.zeros(dim, np.float32)
    c = cfg.conv_layers[-1][0]
    d = cfg.encoder_dim
    sd["layer_norm.weight"] = np.ones(c, np.float32)
    sd["layer_norm.bias"] = np.zeros(c, np.float32)
    sd["post_extract_proj.weight"] = rng.normal(size=(d, c)).astype(np.float32)
    sd["post_extract_proj.bias"] = rng.normal(size=d).astype(np.float32)
    sd["encoder.pos_conv.0.weight_g"] = np.ones(
        (1, 1, cfg.pos_conv_kernel), np.float32  # weight_norm dim=2 -> [1,1,K]
    )
    sd["encoder.pos_conv.0.weight_v"] = rng.normal(
        size=(d, d // cfg.pos_conv_groups, cfg.pos_conv_kernel)
    ).astype(np.float32)
    sd["encoder.pos_conv.0.bias"] = rng.normal(size=d).astype(np.float32)
    for i in range(cfg.encoder_layers):
        pre = f"encoder.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{pre}.self_attn.{name}.weight"] = rng.normal(size=(d, d)).astype(
                np.float32
            )
            sd[f"{pre}.self_attn.{name}.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"{pre}.self_attn_layer_norm.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.self_attn_layer_norm.bias"] = np.zeros(d, np.float32)
        sd[f"{pre}.fc1.weight"] = rng.normal(size=(cfg.ffn_dim, d)).astype(np.float32)
        sd[f"{pre}.fc1.bias"] = rng.normal(size=cfg.ffn_dim).astype(np.float32)
        sd[f"{pre}.fc2.weight"] = rng.normal(size=(d, cfg.ffn_dim)).astype(np.float32)
        sd[f"{pre}.fc2.bias"] = rng.normal(size=d).astype(np.float32)
        sd[f"{pre}.final_layer_norm.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.final_layer_norm.bias"] = np.zeros(d, np.float32)
    sd["encoder.layer_norm.weight"] = np.ones(d, np.float32)
    sd["encoder.layer_norm.bias"] = np.zeros(d, np.float32)

    tree = convert.from_fairseq_state_dict(sd, cfg)
    # structure matches our init tree; a forward runs and is finite
    init_tree = X.init_xlsr(jax.random.key(0), cfg)
    assert jax.tree.structure(tree) == jax.tree.structure(init_tree)
    wav = jnp.asarray(rng.normal(size=(1, 1600)).astype(np.float32))
    out = X.extract_features(tree, cfg, wav)
    assert np.isfinite(np.asarray(out)).all()
    # spot-check one mapped weight (q of layer 1, transposed)
    np.testing.assert_allclose(
        np.asarray(tree["encoder"]["layers"]["attn"]["q"]["w"][1]),
        sd["encoder.layers.1.self_attn.q_proj.weight"].T,
        atol=0,
    )


def test_infer_config_maps_published_xlsr_widths_to_16_heads():
    """fairseq state dicts carry no head count; all published XLS-R widths
    (1024/1280/1920) use 16 heads — a head_dim=64 guess would split q/k/v
    across wrong head boundaries for the 1B/2B checkpoints."""
    import numpy as np

    from scl_deepfake_audio_detection_tpu.models.convert import (
        infer_config_from_fairseq_sd,
    )

    def fake_sd(d, ffn):
        return {
            "encoder.layer_norm.weight": np.zeros(d, np.float32),
            "encoder.layers.0.fc1.weight": np.zeros((ffn, d), np.float32),
            "feature_extractor.conv_layers.0.0.weight":
                np.zeros((512, 1, 10), np.float32),
        }

    for d, ffn, heads in ((1280, 5120, 16), (1920, 7680, 16)):
        cfg = infer_config_from_fairseq_sd(fake_sd(d, ffn))
        assert cfg.encoder_dim == d and cfg.num_heads == heads, cfg
    # unknown width: last-resort head_dim=64 guess
    assert infer_config_from_fairseq_sd(fake_sd(256, 1024)).num_heads == 4


# --- trained-statistics + structured-input hardening (VERDICT r2 weak #1) ---
# Random-init white-noise checks catch key-mapping bugs but are weak against
# scale-sensitive numerics (weight-norm fold, fp32 LN drift at real weight
# magnitudes).  These tests rescale the weights to trained-fairseq-like
# statistics and score structured audio against a float64 torch ground truth.


def _structured_inputs(n: int = 3200) -> dict:
    """Deterministic audio battery: silence, a full-scale linear chirp,
    speech-shaped noise (~-6 dB/oct via a leaky integrator), and a harmonic
    tone — the envelope/spectral shapes real utterances hit, not white noise."""
    t = np.arange(n) / 16000.0
    rng = np.random.default_rng(11)
    chirp = 0.9 * np.sin(2 * np.pi * (80 + (4000 - 80) * t / t[-1] / 2) * t)
    white = rng.normal(size=n)
    speech = np.empty(n)
    acc = 0.0
    for i, w in enumerate(white):  # one-pole lowpass: -6 dB/oct like speech
        acc = 0.97 * acc + 0.03 * w
        speech[i] = acc
    speech = 0.5 * speech / (np.abs(speech).max() + 1e-9)
    tone = 0.6 * sum(np.sin(2 * np.pi * 120 * k * t) / k for k in (1, 2, 3, 5))
    return {
        "silence": np.zeros(n),
        "chirp": chirp,
        "speech_shaped": speech,
        "harmonic": tone / (np.abs(tone).max() + 1e-9) * 0.8,
    }


def _trained_like(sd: dict) -> dict:
    """Rescale a random-init HF state dict to trained-checkpoint statistics:
    LN gammas log-spread over ~[0.2, 20] with non-zero betas (trained
    wav2vec2 LNs carry large outlier gammas), 3x-std projections with
    heavy-tail rows, a 10x weight-norm magnitude on the positional conv,
    and non-zero biases everywhere."""
    g = torch.Generator().manual_seed(42)
    out = {}
    for k, v in sd.items():
        v = v.detach().clone()
        if "layer_norm" in k and k.endswith(".weight"):
            out[k] = torch.exp(
                torch.randn(v.shape, generator=g) * 1.2
            ).clamp(0.2, 20.0)
        elif "layer_norm" in k and k.endswith(".bias"):
            out[k] = torch.randn(v.shape, generator=g)
        elif "pos_conv" in k and ("weight_g" in k or "original0" in k):
            out[k] = v * 10.0
        elif k.endswith(".bias"):
            out[k] = torch.randn(v.shape, generator=g) * 0.3
        elif v.ndim >= 2:
            w = v * 3.0
            if v.ndim == 2 and v.shape[0] >= 8:  # heavy-tail rows
                idx = torch.randperm(v.shape[0], generator=g)[: v.shape[0] // 8]
                w[idx] *= 8.0
            out[k] = w
        else:
            out[k] = v
    return out


@pytest.fixture(scope="module")
def hf_trained_like(hf_pair):
    from transformers import Wav2Vec2Model

    model, cfg, _ = hf_pair
    trained = Wav2Vec2Model(model.config).eval()
    trained.load_state_dict(_trained_like(model.state_dict()))
    params = convert.from_hf_state_dict(trained.state_dict(), cfg)
    return trained, cfg, params


@pytest.mark.parametrize("name", ["silence", "chirp", "speech_shaped", "harmonic"])
def test_structured_inputs_match_fp64_truth(hf_trained_like, name):
    """Our fp32 forward on trained-statistics weights must track the torch
    FLOAT64 ground truth about as well as torch's own fp32 forward does —
    bounds OUR extra drift (LN at large gammas, weight-norm fold, conv
    fp32 accumulation) instead of comparing two fp32 noise sources."""
    model, cfg, params = hf_trained_like
    wav = _structured_inputs()[name][None].astype(np.float32)
    with torch.no_grad():
        want64 = model.double()(torch.tensor(wav, dtype=torch.float64))
        want64 = want64.last_hidden_state.numpy()
        want32 = model.float()(torch.tensor(wav)).last_hidden_state.numpy()
    got = np.asarray(X.extract_features(params, cfg, jnp.asarray(wav)))
    assert got.shape == want64.shape
    scale = np.linalg.norm(want64) + 1e-12
    e_ours = np.linalg.norm(got - want64) / scale
    e_torch = np.linalg.norm(want32 - want64) / scale
    # same error class as torch fp32 (accumulation-order headroom), and an
    # absolute cap that any fold/LN bug at these magnitudes blows through
    assert e_ours < max(1e-4, 20 * e_torch), (name, e_ours, e_torch)
    if name != "silence":  # silence frames are near-constant; cos is ill-posed
        cos = np.sum(got * want64, -1) / (
            np.linalg.norm(got, axis=-1) * np.linalg.norm(want64, axis=-1)
        )
        assert cos.min() > 0.9999, (name, cos.min())


def test_trained_like_weights_really_moved(hf_pair, hf_trained_like):
    """The rescaling must actually produce trained-like statistics (guards the
    fixture against silently testing random init again)."""
    base, _, _ = hf_pair
    trained, _, _ = hf_trained_like
    base_sd, tr_sd = base.state_dict(), trained.state_dict()
    ln = [k for k in tr_sd if "layer_norm" in k and k.endswith(".weight")]
    assert ln and any(float(tr_sd[k].max()) > 5.0 for k in ln)
    assert all(float((tr_sd[k] - 1).abs().max()) > 0.3 for k in ln)
    wg = [k for k in tr_sd if "weight_g" in k or "original0" in k]
    assert wg and all(
        float(tr_sd[k].norm()) > 5 * float(base_sd[k].norm()) for k in wg
    )
