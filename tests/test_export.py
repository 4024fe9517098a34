"""AOT export artifacts (scl_deepfake_audio_detection_tpu/export.py).

The artifact contract: jax.export StableHLO + weights in a directory,
restored and scored with NO framework model code — the deployment analog of
TorchScript/ONNX the reference lacks entirely (its serving path re-imports
the model class from source, ``main.py:333``)."""

import io
import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.export import export_scorer, load_scorer
from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

SR = 16000
CUT = 64600


@pytest.fixture(scope="module")
def tiny_scorer_dir(tmp_path_factory):
    """One tiny-model export shared by the module's tests."""
    model = LinearNLL(ssl=XLSRConfig.tiny())
    params = jax.jit(model.init)(jax.random.key(0))
    out = str(tmp_path_factory.mktemp("export") / "artifact")
    meta = export_scorer(model, params, {}, out, compute_dtype="bfloat16",
                         calibration=(1.5, -0.25), model_tag="tiny_nll")
    return model, params, out, meta


def _direct_scores(model, params, wav):
    """The in-process eval score path the artifact must reproduce."""
    from scl_deepfake_audio_detection_tpu.models.base import (
        cast_matmul_params,
        eval_scores,
    )

    params = cast_matmul_params(params, "bfloat16")
    out = model.apply(params, jnp.asarray(wav), train=False, buffers={})
    return np.asarray(eval_scores(model, out))


def test_export_roundtrip_matches_direct_apply(tiny_scorer_dir):
    model, params, out, _ = tiny_scorer_dir
    scorer = load_scorer(out)
    wav = (np.random.default_rng(0).normal(size=(3, CUT)) * 0.1).astype(
        np.float32
    )
    got = scorer.score(wav)
    want = _direct_scores(model, params, wav)
    assert got.shape == want.shape == (3, 2)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_export_symbolic_batch_dimension(tiny_scorer_dir):
    """One artifact serves any batch size (symbolic 'b' dimension)."""
    model, params, out, _ = tiny_scorer_dir
    scorer = load_scorer(out)
    rng = np.random.default_rng(1)
    for b in (1, 5):
        wav = (rng.normal(size=(b, CUT)) * 0.1).astype(np.float32)
        got = scorer.score(wav)
        assert got.shape == (b, 2)
        np.testing.assert_allclose(
            got, _direct_scores(model, params, wav), atol=5e-4
        )


def test_export_input_validation(tiny_scorer_dir):
    _, _, out, _ = tiny_scorer_dir
    scorer = load_scorer(out)
    with pytest.raises(ValueError, match="64600"):
        scorer.score(np.zeros((2, 1000), np.float32))


def test_export_metadata(tiny_scorer_dir):
    _, _, out, meta = tiny_scorer_dir
    scorer = load_scorer(out)
    assert scorer.meta["model_tag"] == "tiny_nll"
    assert scorer.cut == CUT
    assert scorer.calibration == (1.5, -0.25)
    assert set(scorer.meta["platforms"]) == {"cpu", "tpu"}
    # sidecar json matches the returned meta
    with open(os.path.join(out, "meta.json")) as f:
        assert json.load(f) == meta


def test_export_bf16_weights_round_trip(tiny_scorer_dir):
    """Matmul weights ride the npz as bfloat16 (uint16 view + manifest) and
    come back as bfloat16 — halving artifact weight bytes vs fp32."""
    model, params, out, meta = tiny_scorer_dir
    scorer = load_scorer(out)
    dtypes = {str(a.dtype) for a in scorer._p}
    assert "bfloat16" in dtypes  # cast matmul weights
    assert "float32" in dtypes  # LN scales/biases stay fp32
    fp32_bytes = sum(
        np.asarray(x).size * 4 for x in jax.tree.leaves(params)
    )
    assert meta["param_bytes"] < fp32_bytes


def test_export_loader_needs_no_model_code(tiny_scorer_dir, monkeypatch):
    """The whole point of the artifact: restore + score with the model zoo
    UNIMPORTABLE.  Drop every framework module except the loader's own and
    install an import blocker for the internals; scoring must still work."""
    model, params, out, _ = tiny_scorer_dir
    want = _direct_scores(
        model, params,
        (np.random.default_rng(2).normal(size=(2, CUT)) * 0.1).astype(
            np.float32
        ),
    )

    pkg = "scl_deepfake_audio_detection_tpu"
    blocked_prefixes = tuple(
        f"{pkg}.{sub}" for sub in
        ("models", "ops", "train", "dsp", "data", "parallel", "utils")
    )
    for name in list(sys.modules):
        if name.startswith(blocked_prefixes) or name == f"{pkg}.export":
            monkeypatch.delitem(sys.modules, name)

    class _Blocker:
        def find_spec(self, name, path=None, target=None):
            if name.startswith(blocked_prefixes):
                raise ImportError(
                    f"model code must not be needed to load an export "
                    f"artifact (tried to import {name})"
                )
            return None

    monkeypatch.setattr(sys, "meta_path", [_Blocker()] + sys.meta_path)
    from scl_deepfake_audio_detection_tpu.export import (
        load_scorer as fresh_load,
    )

    scorer = fresh_load(out)
    wav = (np.random.default_rng(2).normal(size=(2, CUT)) * 0.1).astype(
        np.float32
    )
    np.testing.assert_allclose(scorer.score(wav), want, atol=5e-4)


def test_export_weights_pinned_to_device_after_first_score(tiny_scorer_dir):
    """score() must device_put the weight leaves once — numpy args to jit
    re-transfer EVERY call (632 MB/request for the 300M artifact: measured
    2 utt/s through the tunneled v5e before the pin, 135 after)."""
    _, _, out, _ = tiny_scorer_dir
    scorer = load_scorer(out)
    assert all(isinstance(x, np.ndarray) for x in scorer._p)  # lazy load
    scorer.score(np.zeros((1, CUT), np.float32))
    assert all(isinstance(x, jax.Array) for x in scorer._p)
    assert all(isinstance(x, jax.Array) for x in scorer._b)


def test_export_buffer_model_roundtrip(tmp_path):
    """Models with BN running-stat buffers (resnet/aasist) export too: the
    buffer leaves ride the artifact and the restored scorer reproduces the
    in-process eval scores (raw logits for these heads) with those stats."""
    from scl_deepfake_audio_detection_tpu.models.base import (
        eval_scores,
        model_buffers,
    )
    from scl_deepfake_audio_detection_tpu.models.resnet import XLSRResNet

    cut = 6400
    model = XLSRResNet(ssl=XLSRConfig.tiny())
    params = jax.jit(model.init)(jax.random.key(0))
    b0 = model_buffers(model)
    # advance the running stats one train step so the exported buffers are
    # distinguishable from init (the parity below would otherwise pass with
    # buffers silently dropped)
    wav = (np.random.default_rng(3).normal(size=(2, cut)) * 0.1).astype(
        np.float32
    )
    _, b1 = model.apply(params, jnp.asarray(wav), train=True,
                        rng=jax.random.key(1), buffers=b0, mutable=True)

    out = str(tmp_path / "artifact")
    meta = export_scorer(model, params, b1, out, cut=cut,
                         compute_dtype="bfloat16")
    assert meta["num_buffer_leaves"] == len(jax.tree.leaves(b1))

    scorer = load_scorer(out)
    got = scorer.score(wav)
    from scl_deepfake_audio_detection_tpu.models.base import (
        cast_matmul_params,
    )

    p16 = cast_matmul_params(params, "bfloat16")
    want = np.asarray(eval_scores(
        model, model.apply(p16, jnp.asarray(wav), train=False, buffers=b1)
    ))
    np.testing.assert_allclose(got, want, atol=5e-4)
    # and the buffers actually matter: scoring with the INIT stats differs
    other = np.asarray(eval_scores(
        model, model.apply(p16, jnp.asarray(wav), train=False, buffers=b0)
    ))
    assert not np.allclose(got, other, atol=5e-4)


def test_export_rejects_newer_format(tiny_scorer_dir):
    _, _, out, _ = tiny_scorer_dir
    meta_path = os.path.join(out, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    from scl_deepfake_audio_detection_tpu.export import FORMAT_VERSION

    bumped = dict(meta, format_version=FORMAT_VERSION + 1)
    with open(meta_path, "w") as f:
        json.dump(bumped, f)
    try:
        with pytest.raises(ValueError, match="newer"):
            load_scorer(out)
    finally:
        with open(meta_path, "w") as f:
            json.dump(meta, f)


# ---------------------------------------------------------------------------
# CLI surface


def test_cli_export_then_serve_from_export(tmp_path, monkeypatch):
    """--export_model then --serve --from_export: replies match the
    in-process serve path on the same audio (cross-surface consistency)."""
    from scl_deepfake_audio_detection_tpu.cli import main

    rng = np.random.default_rng(7)
    wavs = []
    for i in range(2):
        p = str(tmp_path / f"s{i}.wav")
        save_wav(p, (rng.normal(size=5000) * 0.2).astype(np.float32), SR)
        wavs.append(p)

    art = str(tmp_path / "artifact")
    common = ["--ssl_preset", "tiny", "--config", "configs/conf-3-linear.yaml",
              "--seed", "77"]
    rc = main(["--export_model", art] + common)
    assert rc == 0
    assert os.path.exists(os.path.join(art, "scorer.jaxexp"))

    def serve(extra):
        monkeypatch.setattr(
            "sys.stdin", io.StringIO("\n".join(wavs) + "\n")
        )
        out = io.StringIO()
        monkeypatch.setattr(sys, "stdout", out)
        rc = main(["--serve"] + extra + common)
        assert rc == 0
        return {
            l.split("\t")[0]: float(l.split("\t")[1])
            for l in out.getvalue().strip().splitlines()
        }

    from_export = serve(["--from_export", art])
    in_process = serve([])
    assert set(from_export) == set(in_process) == set(wavs)
    for k in wavs:
        assert abs(from_export[k] - in_process[k]) < 5e-4


def test_cli_eval_from_export_matches_model_eval(tmp_path):
    """--eval --from_export writes the same score file as the in-process
    eval path (modulo bf16-level score jitter)."""
    from scl_deepfake_audio_detection_tpu.cli import main

    root = tmp_path / "db"
    rng = np.random.default_rng(11)
    os.makedirs(root / "eval")
    os.makedirs(root / "scp")
    utts = [f"e{i}.wav" for i in range(3)]
    for u in utts:
        save_wav(str(root / "eval" / u),
                 (rng.normal(size=7000) * 0.2).astype(np.float32), SR)
    (root / "scp" / "test.lst").write_text("\n".join(utts) + "\n")

    art = str(tmp_path / "artifact")
    common = ["--ssl_preset", "tiny", "--config", "configs/conf-3-linear.yaml",
              "--seed", "77", "--database_path", str(root) + "/"]
    assert main(["--export_model", art] + common) == 0

    out_a = str(tmp_path / "scores_model.txt")
    out_b = str(tmp_path / "scores_export.txt")
    assert main(["--eval", "--eval_output", out_a, "--batch_size", "2"]
                + common) == 0
    assert main(["--eval", "--eval_output", out_b, "--batch_size", "2",
                 "--from_export", art] + common) == 0

    def rows(p):
        with open(p) as f:
            return {
                parts[0]: [float(x) for x in parts[1:]]
                for parts in (l.split() for l in f)
            }

    a, b = rows(out_a), rows(out_b)
    assert set(a) == set(b) == set(utts)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=5e-4)


def test_cli_from_export_flag_validation(tmp_path):
    from scl_deepfake_audio_detection_tpu.cli import main

    art = str(tmp_path / "missing")
    # no mode (and --predict alone doesn't count: it rides --eval,
    # reference semantics)
    assert main(["--from_export", art]) == 2
    assert main(["--from_export", art, "--predict"]) == 2
    # emb unsupported
    assert main(["--from_export", art, "--eval", "--emb"]) == 2
    # model_path conflicts
    assert main(["--from_export", art, "--serve",
                 "--model_path", "x.npz"]) == 2
    # export/parity need the model itself
    assert main(["--from_export", art, "--eval",
                 "--export_model", str(tmp_path / "a2")]) == 2
    assert main(["--from_export", art, "--eval",
                 "--parity_check", "ref.txt"]) == 2
    # reverse migration impossible from an artifact (no raw param pytree)
    assert main(["--from_export", art, "--eval",
                 "--export_reference_ckpt", str(tmp_path / "o.pth")]) == 2


def test_cli_from_export_reverse_migration_message(tmp_path, capsys):
    """The --from_export + --export_reference_ckpt rejection must explain the
    real incompatibility (artifacts carry no raw params), not the generic
    'use --config conf-N-linear' hint (ADVICE r2)."""
    from scl_deepfake_audio_detection_tpu.cli import main

    rc = main(["--from_export", str(tmp_path / "missing"), "--eval",
               "--export_reference_ckpt", str(tmp_path / "o.pth")])
    assert rc == 2
    err = capsys.readouterr().err
    assert "cannot reverse-migrate an export artifact" in err
    assert "conf-N-linear" not in err


def test_cli_verify_export(tmp_path):
    """--verify_export: same seed/weights -> OK (rc 0); a different
    checkpoint behind the same flags -> drift detected (rc 1)."""
    import jax

    from scl_deepfake_audio_detection_tpu.cli import main
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt

    art = str(tmp_path / "artifact")
    common = ["--ssl_preset", "tiny", "--config", "configs/conf-3-linear.yaml",
              "--seed", "77"]
    assert main(["--export_model", art] + common) == 0

    # the artifact was exported from the seed-77 random init: verifying
    # against the same init must agree to float tolerance
    assert main(["--verify_export", art] + common) == 0

    # a different model behind the same flags is drift: must FAIL
    other = LinearNLL(ssl=XLSRConfig.tiny())
    p_other = other.init(jax.random.key(123))
    other_ckpt = str(tmp_path / "other.ckpt")
    ckpt.save(other_ckpt, {"params": p_other})
    assert main(["--verify_export", art, "--model_path", other_ckpt]
                + common) == 1

    # an artifact cannot verify itself
    assert main(["--verify_export", art, "--from_export", art, "--eval"]) == 2


# ---------------------------------------------------------------------------
# int8 weight-only quantized storage (format v2)


def test_export_int8_quantized_artifact(tmp_path):
    """quantize='int8' shrinks the stored bytes vs bf16 and the restored
    scorer's drift vs the unquantized artifact is weight rounding only —
    the serialized program is unchanged (same leaf dtypes at run time)."""
    model = LinearNLL(ssl=XLSRConfig.tiny())
    params = jax.jit(model.init)(jax.random.key(0))
    out_fp = str(tmp_path / "fp")
    out_q = str(tmp_path / "q")
    meta_fp = export_scorer(model, params, {}, out_fp,
                            compute_dtype="bfloat16")
    meta_q = export_scorer(model, params, {}, out_q,
                           compute_dtype="bfloat16", quantize="int8")
    assert meta_fp["quantization"] is None
    assert meta_fp["format_version"] == 1  # unquantized stays v1-loadable
    assert meta_q["quantization"] == "int8"
    assert meta_q["format_version"] == 2
    assert meta_q["quantized_leaf_scales"]  # the big matrices quantized
    assert meta_q["stored_bytes"] < meta_fp["stored_bytes"]

    wav = (np.random.default_rng(5).normal(size=(3, CUT)) * 0.1).astype(
        np.float32
    )
    s_fp = load_scorer(out_fp).score(wav)
    s_q = load_scorer(out_q).score(wav)
    assert s_q.shape == s_fp.shape == (3, 2)
    # weight-rounding drift only — and NOT zero (quantization really applied)
    np.testing.assert_allclose(s_q, s_fp, atol=0.2)
    assert not np.array_equal(s_q, s_fp)


def test_export_int8_dequant_restores_dtypes_small_leaves_exact(tmp_path):
    """Dequantized leaves come back in their original (bf16) dtype so the
    serialized program's signature still matches; leaves below the size
    cutoff (biases, LN vectors) and buffers stay byte-exact."""
    model = LinearNLL(ssl=XLSRConfig.tiny())
    params = jax.jit(model.init)(jax.random.key(0))
    out_fp = str(tmp_path / "fp")
    out_q = str(tmp_path / "q")
    export_scorer(model, params, {}, out_fp, compute_dtype="bfloat16")
    meta_q = export_scorer(model, params, {}, out_q,
                           compute_dtype="bfloat16", quantize="int8")
    sc_fp, sc_q = load_scorer(out_fp), load_scorer(out_q)
    quant_keys = set(meta_q["quantized_leaf_scales"])
    n_quant = 0
    for i, (a, b) in enumerate(zip(sc_fp._p, sc_q._p)):
        assert a.dtype == b.dtype and a.shape == b.shape
        if f"p{i:05d}" in quant_keys:
            n_quant += 1
            # per-channel int8: within one scale step of the original
            af = np.asarray(a, np.float32)
            step = np.max(np.abs(af), axis=-2, keepdims=True) / 127.0
            assert np.all(np.abs(af - np.asarray(b, np.float32))
                          <= step + 1e-7)
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b))
    assert n_quant == len(quant_keys) > 0


def test_export_rejects_unknown_quantize(tmp_path):
    model = LinearNLL(ssl=XLSRConfig.tiny())
    params = jax.jit(model.init)(jax.random.key(0))
    with pytest.raises(ValueError, match="quantize"):
        export_scorer(model, params, {}, str(tmp_path / "x"),
                      quantize="int4")


def test_cli_export_quant_then_score(tmp_path):
    """--export_model --export_quant int8 writes a quantized artifact the
    framework-free loader restores and scores."""
    from scl_deepfake_audio_detection_tpu.cli import main

    art = str(tmp_path / "qart")
    rc = main(["--export_model", art, "--export_quant", "int8",
               "--ssl_preset", "tiny",
               "--config", "configs/conf-3-linear.yaml", "--seed", "77"])
    assert rc == 0
    with open(os.path.join(art, "meta.json")) as f:
        meta = json.load(f)
    assert meta["quantization"] == "int8" and meta["quantized_leaf_scales"]
    scorer = load_scorer(art)
    wav = (np.random.default_rng(9).normal(size=(2, CUT)) * 0.1).astype(
        np.float32
    )
    s = scorer.score(wav)
    assert s.shape == (2, 2) and np.isfinite(s).all()
