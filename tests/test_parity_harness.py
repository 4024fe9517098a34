"""Weights-day parity harness, proven asset-free (train/parity.py).

A synthetic golden mini-checkpoint in the exact reference ``epoch_N.pth``
layout (full ``wav2vec2_linear_nll`` state dict: embedded fairseq SSL +
LL/backend head, ``main.py:44``) drives convert -> score -> row-diff through
the same CLI path weights day will use, asserting both the PASS direction
and that a perturbed row is detected."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.models import convert
from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

SR = 16000


def _fairseq_sd(cfg: XLSRConfig, rng: np.random.Generator) -> dict:
    """Synthetic fairseq wav2vec2 state dict matching ``cfg`` (the key scheme
    of ``models/convert.from_fairseq_state_dict``)."""
    f32 = lambda a: np.asarray(a, np.float32)
    sd = {}
    for i, (dim, k, _) in enumerate(cfg.conv_layers):
        cin = 1 if i == 0 else cfg.conv_layers[i - 1][0]
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = f32(
            rng.normal(size=(dim, cin, k)) * 0.1
        )
        sd[f"feature_extractor.conv_layers.{i}.0.bias"] = f32(rng.normal(size=dim) * 0.1)
        sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = np.ones(dim, np.float32)
        sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = np.zeros(dim, np.float32)
    c, d = cfg.conv_layers[-1][0], cfg.encoder_dim
    sd["layer_norm.weight"] = np.ones(c, np.float32)
    sd["layer_norm.bias"] = np.zeros(c, np.float32)
    sd["post_extract_proj.weight"] = f32(rng.normal(size=(d, c)) * 0.1)
    sd["post_extract_proj.bias"] = f32(rng.normal(size=d) * 0.1)
    sd["encoder.pos_conv.0.weight_g"] = np.ones((1, 1, cfg.pos_conv_kernel), np.float32)
    sd["encoder.pos_conv.0.weight_v"] = f32(
        rng.normal(size=(d, d // cfg.pos_conv_groups, cfg.pos_conv_kernel)) * 0.1
    )
    sd["encoder.pos_conv.0.bias"] = f32(rng.normal(size=d) * 0.1)
    for i in range(cfg.encoder_layers):
        pre = f"encoder.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{pre}.self_attn.{name}.weight"] = f32(rng.normal(size=(d, d)) * 0.1)
            sd[f"{pre}.self_attn.{name}.bias"] = f32(rng.normal(size=d) * 0.1)
        sd[f"{pre}.self_attn_layer_norm.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.self_attn_layer_norm.bias"] = np.zeros(d, np.float32)
        sd[f"{pre}.fc1.weight"] = f32(rng.normal(size=(cfg.ffn_dim, d)) * 0.1)
        sd[f"{pre}.fc1.bias"] = f32(rng.normal(size=cfg.ffn_dim) * 0.1)
        sd[f"{pre}.fc2.weight"] = f32(rng.normal(size=(d, cfg.ffn_dim)) * 0.1)
        sd[f"{pre}.fc2.bias"] = f32(rng.normal(size=d) * 0.1)
        sd[f"{pre}.final_layer_norm.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.final_layer_norm.bias"] = np.zeros(d, np.float32)
    sd["encoder.layer_norm.weight"] = np.ones(d, np.float32)
    sd["encoder.layer_norm.bias"] = np.zeros(d, np.float32)
    return sd


def _reference_pth_dict(cfg: XLSRConfig, rng: np.random.Generator,
                        emb: int = 128, ncls: int = 2) -> dict:
    """Full reference Model state dict: SSL under ``ssl_model.model.`` plus
    the LL / backend head, including the declared-but-unused BatchNorm
    entries a real ``epoch_N.pth`` carries (``wav2vec2_linear_nll.py:108-110``)."""
    f32 = lambda a: np.asarray(a, np.float32)
    d = cfg.encoder_dim
    sd = {f"ssl_model.model.{k}": v for k, v in _fairseq_sd(cfg, rng).items()}
    sd["LL.weight"] = f32(rng.normal(size=(emb, d)) * 0.1)
    sd["LL.bias"] = f32(rng.normal(size=emb) * 0.1)
    for i in (0, 3, 6):
        sd[f"backend.m_frame_level.{i}.weight"] = f32(rng.normal(size=(emb, emb)) * 0.1)
        sd[f"backend.m_frame_level.{i}.bias"] = f32(rng.normal(size=emb) * 0.1)
    sd["backend.m_utt_level.weight"] = f32(rng.normal(size=(ncls, emb)) * 0.1)
    sd["backend.m_utt_level.bias"] = f32(rng.normal(size=ncls) * 0.1)
    # dead-on-the-forward-path entries present in real checkpoints
    sd["first_bn.weight"] = np.ones(1, np.float32)
    sd["first_bn.bias"] = np.zeros(1, np.float32)
    sd["first_bn.running_mean"] = np.zeros(1, np.float32)
    sd["first_bn.running_var"] = np.ones(1, np.float32)
    sd["first_bn.num_batches_tracked"] = np.asarray(0)
    return sd


def test_reference_checkpoint_conversion_roundtrip():
    """from_reference_model_checkpoint maps every live key; structure matches
    our init tree; weights land transposed; a forward runs finite."""
    cfg = XLSRConfig.tiny()
    rng = np.random.default_rng(0)
    sd = _reference_pth_dict(cfg, rng)
    params, got_cfg = convert.from_reference_model_checkpoint(sd, like=cfg)
    assert got_cfg.encoder_dim == cfg.encoder_dim
    assert got_cfg.encoder_layers == cfg.encoder_layers
    assert got_cfg.conv_layers == cfg.conv_layers  # strides via ``like``

    model = LinearNLL(ssl=cfg)
    init_tree = model.init(jax.random.key(0))
    assert jax.tree.structure(params) == jax.tree.structure(init_tree)
    np.testing.assert_allclose(
        np.asarray(params["ll"]["w"]), sd["LL.weight"].T, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(params["backend"]["out"]["b"]),
        sd["backend.m_utt_level.bias"], atol=0,
    )
    out = model.apply(
        params, jnp.asarray(rng.normal(size=(2, 1600)).astype(np.float32))
    )
    assert np.isfinite(np.asarray(out.log_probs)).all()


def test_reference_checkpoint_requires_ssl_keys():
    with pytest.raises(ValueError, match="ssl_model.model"):
        convert.from_reference_model_checkpoint({"LL.weight": np.zeros((2, 2))})


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    """Mini eval db + golden .pth + config yaml, shared by the CLI tests."""
    torch = pytest.importorskip("torch")
    root = tmp_path_factory.mktemp("parity_db")
    rng = np.random.default_rng(1)
    utts = [f"p{i}.wav" for i in range(5)]
    os.makedirs(root / "eval"); os.makedirs(root / "scp")
    for u in utts:
        n = int(rng.integers(4000, 9000))
        save_wav(str(root / "eval" / u),
                 rng.normal(size=n).astype(np.float32) * 0.2, SR)
    (root / "scp" / "test.lst").write_text("\n".join(utts) + "\n")

    cfg = XLSRConfig.tiny()
    sd = _reference_pth_dict(cfg, np.random.default_rng(2))
    pth = root / "epoch_1.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(pth))

    yaml = root / "tiny.yaml"
    yaml.write_text(
        "model:\n  name: wav2vec2_linear_nll\n  flag_fix_ssl: false\n"
        "  contra_mode: 'all'\n  loss_type: 1\n"
        "data:\n  name: 'asvspoof_2019_augall_3'\n"
        "  kwargs:\n    vocoders: ['hifigan']\n"
        "    augmentation_methods: ['RawBoost12']\n"
        "    num_additional_real: 1\n    trim_length: 4000\n"
        "    wav_samp_rate: 16000\n    online_aug: true\n"
    )
    return root, utts, str(pth), str(yaml)


def test_parity_check_cli_pass_then_detects_mismatch(golden, tmp_path):
    """The weights-day command: eval with the reference .pth produces golden
    scores; --parity_check against them passes (same code path, deterministic)
    and a perturbed row flips the exit code."""
    from scl_deepfake_audio_detection_tpu.cli import main

    root, utts, pth, yaml = golden
    scores = str(tmp_path / "golden_scores.txt")
    rc = main([
        "--config", yaml, "--database_path", str(root) + "/",
        "--batch_size", "2", "--eval", "--model_path", pth,
        "--eval_output", scores, "--ssl_preset", "tiny",
        "--num_workers", "1",
    ])
    assert rc == 0
    assert len(open(scores).read().strip().splitlines()) == len(utts)

    common = [
        "--config", yaml, "--database_path", str(root) + "/",
        "--batch_size", "2", "--model_path", pth, "--ssl_preset", "tiny",
        "--num_workers", "1", "--parity_tol", "1e-4",
    ]
    rc = main(common + ["--parity_check", scores])
    assert rc == 0, "identical pipeline must reproduce its own scores"

    # perturb one row's bonafide score beyond tol -> FAIL
    lines = open(scores).read().strip().splitlines()
    parts = lines[2].split()
    parts[2] = str(float(parts[2]) + 0.5)
    bad = str(tmp_path / "bad_scores.txt")
    open(bad, "w").write("\n".join(lines[:2] + [" ".join(parts)] + lines[3:]) + "\n")
    rc = main(common + ["--parity_check", bad])
    assert rc == 1, "a 0.5 score shift must be detected"


def test_parity_check_skips_missing_audio(golden, tmp_path):
    """Reference rows whose audio is absent are skipped (weights day will
    have score files for utts beyond any partial local mirror)."""
    from scl_deepfake_audio_detection_tpu.cli import main

    root, utts, pth, yaml = golden
    scores = str(tmp_path / "scores_extra.txt")
    rc = main([
        "--config", yaml, "--database_path", str(root) + "/",
        "--batch_size", "2", "--eval", "--model_path", pth,
        "--eval_output", scores, "--ssl_preset", "tiny", "--num_workers", "1",
    ])
    assert rc == 0
    with open(scores, "a") as f:
        f.write("missing_utt.flac -1.0 -0.5\n")
    rc = main([
        "--config", yaml, "--database_path", str(root) + "/",
        "--batch_size", "2", "--model_path", pth, "--ssl_preset", "tiny",
        "--num_workers", "1", "--parity_tol", "1e-4",
        "--parity_check", scores,
    ])
    assert rc == 0


# --- reverse migration: our params -> reference-loadable .pth ----------------


def test_reference_export_roundtrip_from_init():
    """to_reference_model_checkpoint is the exact inverse of the importer:
    exporting a fresh param pytree and re-importing it reproduces every
    weight (pos_conv within one float rounding of the weight-norm split)."""
    pytest.importorskip("torch")
    cfg = XLSRConfig.tiny()
    model = LinearNLL(ssl=cfg)
    params = model.init(jax.random.key(3))
    sd = convert.to_reference_model_checkpoint(params)

    # every key the reference Model declares is present (strict-load shape)
    for k in ("LL.weight", "backend.m_utt_level.bias", "first_bn.running_var",
              "first_bn1.num_batches_tracked",
              "ssl_model.model.encoder.pos_conv.0.weight_g",
              "ssl_model.model.mask_emb",
              "ssl_model.model.quantizer.vars"):
        assert k in sd, k

    p2, cfg2 = convert.from_reference_model_checkpoint(sd, like=cfg)
    assert cfg2.encoder_layers == cfg.encoder_layers
    assert jax.tree.structure(p2) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_reference_export_extras_byte_exact():
    """Round-tripping a reference .pth preserves the unmapped tensors
    (BatchNorm state, fairseq pretraining heads) byte-exactly and reproduces
    the mapped weights; only the weight-norm (g, v) split is re-factorized
    (the product — the effective kernel — survives to float rounding)."""
    torch = pytest.importorskip("torch")
    cfg = XLSRConfig.tiny()
    rng = np.random.default_rng(7)
    sd = _reference_pth_dict(cfg, rng)
    # make the dead BN entries non-default so passthrough is observable
    sd["first_bn.running_mean"] = np.asarray([0.25], np.float32)
    sd["ssl_model.model.mask_emb"] = np.asarray(
        rng.normal(size=cfg.encoder_dim), np.float32
    )
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    params, _, extras = convert.from_reference_model_checkpoint(
        sd, like=cfg, return_extras=True
    )
    assert "first_bn.running_mean" in extras and "ssl_model.model.mask_emb" in extras
    sd2 = convert.to_reference_model_checkpoint(params, extras=extras)

    assert set(sd2) >= set(sd)
    wn = "ssl_model.model.encoder.pos_conv.0.weight_"
    for k, v in sd.items():
        got = sd2[k].float()
        if k.startswith(wn):
            continue  # compared as the contracted product below
        assert torch.equal(got, v.float()), k

    # weight-norm (g, v) is re-factorized canonically (g = ||w||); the
    # effective kernel g*v/||v|| — all the forward ever sees — must match
    def _contract(d):
        g = d[wn + "g"].double().numpy()
        v = d[wn + "v"].double().numpy()
        return g * v / np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))

    np.testing.assert_allclose(_contract(sd2), _contract(sd), atol=1e-6)


def test_cli_export_reference_ckpt(golden, tmp_path):
    """--export_reference_ckpt writes a .pth the importer maps back to the
    identical pytree (reference-stack deployment of a TPU-trained model)."""
    torch = pytest.importorskip("torch")
    from scl_deepfake_audio_detection_tpu.cli import main

    root, utts, pth, yaml = golden
    out = str(tmp_path / "exported.pth")
    rc = main([
        "--config", yaml, "--database_path", str(root) + "/",
        "--model_path", pth, "--ssl_preset", "tiny",
        "--export_reference_ckpt", out,
    ])
    assert rc == 0 and os.path.exists(out)

    orig = torch.load(pth, map_location="cpu", weights_only=False)
    got = torch.load(out, map_location="cpu", weights_only=False)
    assert set(got) >= set(orig)
    p1, _ = convert.from_reference_model_checkpoint(orig, like=XLSRConfig.tiny())
    p2, _ = convert.from_reference_model_checkpoint(got, like=XLSRConfig.tiny())
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # dead-path BN state rides along byte-exactly
    assert torch.equal(got["first_bn.running_mean"].float(),
                       orig["first_bn.running_mean"].float())


def test_cli_export_reference_ckpt_from_own_ckpt(golden, tmp_path):
    """The TPU-training workflow: our own .ckpt (npz) exports to a .pth that
    re-imports to the same weights — no reference .pth ever involved."""
    pytest.importorskip("torch")
    from scl_deepfake_audio_detection_tpu.cli import main
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt

    root, utts, pth, yaml = golden
    cfg = XLSRConfig.tiny()
    model = LinearNLL(ssl=cfg)
    params = model.init(jax.random.key(9))
    own = str(tmp_path / "own.ckpt")
    ckpt.save(own, {"params": params})

    out = str(tmp_path / "from_own.pth")
    rc = main([
        "--config", yaml, "--database_path", str(root) + "/",
        "--model_path", own, "--ssl_preset", "tiny",
        "--export_reference_ckpt", out,
    ])
    assert rc == 0 and os.path.exists(out)
    import torch
    p2, _ = convert.from_reference_model_checkpoint(
        torch.load(out, map_location="cpu", weights_only=False), like=cfg
    )
    assert jax.tree.structure(p2) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_conv_bias_false_keeps_biases_as_extras():
    """With an explicit cfg(conv_bias=False) and a checkpoint that carries
    conv biases, the unmapped biases must land in extras (not vanish), so a
    round-trip export preserves them for a strict reference load (ADVICE r2)."""
    import dataclasses

    cfg = dataclasses.replace(XLSRConfig.tiny(), conv_bias=False)
    rng = np.random.default_rng(3)
    # build the sd against a bias-carrying twin, then import with conv_bias
    # forced off
    sd = _reference_pth_dict(dataclasses.replace(cfg, conv_bias=True), rng)
    params, _, extras = convert.from_reference_model_checkpoint(
        sd, cfg=cfg, return_extras=True
    )
    bias_keys = {
        f"ssl_model.model.feature_extractor.conv_layers.{i}.0.bias"
        for i in range(len(cfg.conv_layers))
    }
    assert bias_keys <= set(extras), sorted(extras)
    assert all("b" not in c["conv"] for c in
               params["ssl"]["feature_extractor"]["convs"])
    # and the round-trip export carries them back byte-exactly
    sd2 = convert.to_reference_model_checkpoint(params, extras=extras)
    for k in bias_keys:
        np.testing.assert_array_equal(np.asarray(sd2[k]), sd[k])


def test_export_warns_on_non_300m_stub_geometry():
    """Pretraining stubs hardcode XLS-R-300m quantizer geometry; exporting a
    non-1024-dim SSL must warn that a strict reference load may reject the
    stub shapes (ADVICE r2) — unless real extras override the stubs."""
    cfg = XLSRConfig.tiny()  # encoder_dim != 1024
    model = LinearNLL(ssl=cfg)
    params = model.init(jax.random.key(0))
    with pytest.warns(UserWarning, match="XLS-R-300m"):
        convert.to_reference_model_checkpoint(params)
    # real captured extras silence it (the stubs are never used then)
    import warnings

    import torch
    extras = {"ssl_model.model.mask_emb": torch.zeros(cfg.encoder_dim)}
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        convert.to_reference_model_checkpoint(params, extras=extras)
