"""AOT model export: serialized scoring artifacts (StableHLO + weights).

The reference has no deployment story at all — serving means re-running
``main.py --eval`` with the full fairseq/torch stack installed and the model
source importable (``main.py:333`` instantiates the class by name from
``globals()``).  This module is the TPU-native equivalent of a TorchScript /
ONNX export: :func:`export_scorer` lowers the model's scoring function ONCE
through ``jax.export`` (StableHLO with a symbolic batch dimension, lowered
for both ``cpu`` and ``tpu``) and writes a self-contained artifact
directory::

    <dir>/scorer.jaxexp   serialized jax.export.Exported:
                          fn(param_leaves, buffer_leaves, wav[b, cut] f32)
                          -> scores [b, C] f32
    <dir>/weights.npz     the flattened leaves (p00000.., b00000..) in
                          tree-flatten order; non-npz dtypes (bfloat16)
                          ride as uint views with dtypes in the manifest
    <dir>/meta.json       format version, model tag, cut length, padding
                          type, score-column convention, optional affine
                          calibration, jax version

:func:`load_scorer` restores a callable scorer from such a directory using
only jax + numpy — **no model code, no framework internals**: the compute
graph is the serialized StableHLO, so the artifact keeps scoring correctly
even if the model zoo's source changes (or is absent) on the serving host.
Consumed by the CLI via ``--export_model DIR`` / ``--from_export DIR``
(serve and eval modes).

Design notes:
- Weights are exported as *arguments*, never baked as constants: closing
  300M parameters into the HLO would constant-fold 1.2 GB into the program
  (see CLAUDE.md — the remote compile hangs) and make the artifact
  unshardable.
- The batch dimension is symbolic (``jax.export.symbolic_shape``): one
  artifact serves any batch size without re-export; each distinct size still
  pays one XLA compile at run time, as any jit program does.
- Attention is pinned to the fused-einsum XLA path for the export trace:
  Pallas/Mosaic kernels serialize platform-specifically, while the einsum
  path is pure StableHLO and is the measured winner at the production
  T~=201 anyway (ROADMAP perf log).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

FORMAT_VERSION = 2  # v2 adds optional int8 weight-only quantized storage
_EXPORT_FILE = "scorer.jaxexp"
_WEIGHTS_FILE = "weights.npz"
_META_FILE = "meta.json"

# weight-only quantization: leaves smaller than this stay in their original
# dtype (biases/LN vectors — negligible bytes, and they are the numerics-
# sensitive ones)
_QUANT_MIN_SIZE = 4096


# --------------------------------------------------------------------------
# dtype plumbing: npz round-trips native dtypes only; bfloat16 (and other
# ml_dtypes extension types) ride as same-width unsigned-int views with the
# true dtype name recorded in the manifest.
_UINT_OF_WIDTH = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def _to_npz_array(a: np.ndarray) -> Tuple[np.ndarray, str]:
    dt = a.dtype
    if dt.kind in "fiub" and dt.type is not np.void:  # native, round-trips
        return a, dt.name
    return a.view(_UINT_OF_WIDTH[dt.itemsize]), dt.name


def _from_npz_array(a: np.ndarray, dtype_name: str) -> np.ndarray:
    if a.dtype.name == dtype_name:
        return a
    import ml_dtypes  # noqa: F401  (registers bfloat16 & friends)

    return a.view(np.dtype(dtype_name))


def _leaf_key(prefix: str, i: int) -> str:
    return f"{prefix}{i:05d}"


def _is_float_dtype(dt: np.dtype) -> bool:
    # ml_dtypes extension floats (bfloat16) register with kind 'V', not 'f'
    return dt.kind == "f" or dt.name in ("bfloat16", "float8_e4m3fn")


def _quantizable(a: np.ndarray) -> bool:
    return a.ndim >= 2 and a.size >= _QUANT_MIN_SIZE and _is_float_dtype(
        a.dtype
    )


def _quantize_int8(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8: the scale reduces axis -2 (the matmul/conv
    contraction axis in this framework's [.., in, out] kernel layout), so
    every output channel — per stacked layer for scan-stacked leaves — gets
    its own step size."""
    af = np.asarray(a, np.float32)
    amax = np.max(np.abs(af), axis=-2, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(af / scale), -127, 127).astype(np.int8)
    return q, scale


def _dequantize_int8(
    q: np.ndarray, scale: np.ndarray, dtype_name: str
) -> np.ndarray:
    if dtype_name not in ("float64", "float32", "float16"):
        import ml_dtypes  # noqa: F401  (registers bfloat16 & friends)
    return (q.astype(np.float32) * scale).astype(np.dtype(dtype_name))


# --------------------------------------------------------------------------
# export side (imports model machinery lazily — the LOADER must stay free of
# framework internals so artifacts outlive model-code changes)


def _pin_xla_attention(model):
    """Return a copy of ``model`` with its SSL frontend forced onto the XLA
    attention path (see module docstring).  Models without an ``ssl``
    config field pass through unchanged."""
    ssl = getattr(model, "ssl", None)
    if ssl is None or not hasattr(ssl, "attention_impl"):
        return model
    if ssl.attention_impl == "xla":
        return model
    return dataclasses.replace(
        model, ssl=dataclasses.replace(ssl, attention_impl="xla")
    )


def export_scorer(
    model,
    params,
    buffers,
    out_dir: str,
    *,
    cut: int = 64600,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
    compute_dtype: Optional[str] = "bfloat16",
    padding_type: str = "zero",
    calibration: Optional[Tuple[float, float]] = None,
    model_tag: Optional[str] = None,
    quantize: Optional[str] = None,
) -> Dict[str, Any]:
    """Export ``model``'s scoring function + weights to ``out_dir``.

    The exported function is exactly the eval-path score step
    (``train/engine._score_step`` minus the PCM16 dewire): wav ``[b, cut]``
    float32 -> the per-model eval score columns (log-probs for NLL heads,
    raw logits for aasist/resnet — ``models/base.eval_scores``).

    ``compute_dtype``: matmul/conv weights are pre-cast once on the host
    (``models/base.cast_matmul_params``) — numerically a no-op for inference
    (ops cast per call anyway) and it halves the artifact's weight bytes.
    Pass ``None`` to keep weights exactly as given.

    ``quantize="int8"``: weight-only storage quantization — float param
    leaves with ndim >= 2 and >= 4096 elements are stored as symmetric
    per-channel int8 + fp32 scales and dequantized back to their original
    dtype at LOAD time.  The serialized program and the runtime compute
    path are unchanged (it still consumes the original dtypes); only the
    artifact bytes halve again vs bf16.  Biases/LN vectors/buffers stay
    exact.  The score drift is the weight rounding only (tests pin a
    tiny-model bound; use --verify_export for a deployment-time check).

    Returns the metadata dict that was written to ``meta.json``.
    """
    import jax
    from jax import export as jax_export

    from scl_deepfake_audio_detection_tpu.models.base import (
        cast_matmul_params,
        eval_scores,
    )
    from scl_deepfake_audio_detection_tpu.version import __version__

    model = _pin_xla_attention(model)
    if compute_dtype:
        params = cast_matmul_params(params, compute_dtype)
    buffers = buffers or {}

    p_leaves, p_def = jax.tree.flatten(params)
    b_leaves, b_def = jax.tree.flatten(buffers)
    p_leaves = [np.asarray(x) for x in p_leaves]
    b_leaves = [np.asarray(x) for x in b_leaves]

    def score(p_flat, b_flat, wav):
        p = jax.tree.unflatten(p_def, p_flat)
        b = jax.tree.unflatten(b_def, b_flat)
        out = model.apply(p, wav, train=False, buffers=b)
        return eval_scores(model, out)

    (batch,) = jax_export.symbolic_shape("b")
    wav_spec = jax.ShapeDtypeStruct((batch, cut), np.float32)
    leaf_spec = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)  # noqa: E731
    exported = jax_export.export(jax.jit(score), platforms=list(platforms))(
        tuple(leaf_spec(a) for a in p_leaves),
        tuple(leaf_spec(a) for a in b_leaves),
        wav_spec,
    )

    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize={quantize!r} (int8 or None)")

    os.makedirs(out_dir, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, str] = {}
    quant_scales: Dict[str, str] = {}
    for prefix, leaves in (("p", p_leaves), ("b", b_leaves)):
        for i, leaf in enumerate(leaves):
            k = _leaf_key(prefix, i)
            # weight-only: quantize param matrices, never buffers (BN stats)
            if quantize == "int8" and prefix == "p" and _quantizable(leaf):
                q, scale = _quantize_int8(leaf)
                sk = "qs" + k
                arrays[k], arrays[sk] = q, scale
                dtypes[k] = leaf.dtype.name  # ORIGINAL dtype, for dequant
                quant_scales[k] = sk
            else:
                arrays[k], dtypes[k] = _to_npz_array(leaf)

    meta = {
        "format_version": 2 if quant_scales else 1,
        "model_tag": model_tag or type(model).__name__,
        "cut": cut,
        "padding_type": padding_type,
        "num_score_columns": int(exported.out_avals[0].shape[1]),
        "score_convention": (
            "col 1 = bonafide score (log-prob for NLL heads, raw logit for "
            "aasist/resnet — reference score-file convention)"
        ),
        "platforms": list(platforms),
        "compute_dtype": compute_dtype,
        "calibration": list(calibration) if calibration else None,
        "num_param_leaves": len(p_leaves),
        "num_buffer_leaves": len(b_leaves),
        "param_bytes": int(sum(a.nbytes for a in p_leaves)),
        "stored_bytes": int(sum(a.nbytes for a in arrays.values())),
        "quantization": quantize if quant_scales else None,
        "quantized_leaf_scales": quant_scales,
        "leaf_dtypes": dtypes,
        "framework_version": __version__,
        "jax_version": jax.__version__,
    }

    # atomic-ish: weights + meta first, the exported program last (loaders
    # key on scorer.jaxexp existing)
    with open(os.path.join(out_dir, _WEIGHTS_FILE), "wb") as f:
        np.savez(f, **arrays)
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(out_dir, _EXPORT_FILE), "wb") as f:
        f.write(exported.serialize())
    return meta


# --------------------------------------------------------------------------
# load side — deliberately imports NOTHING from the framework beyond this
# module: jax + numpy only (tests pin this with an import-sabotage check)


class ExportedScorer:
    """A scoring function restored from an export directory.

    ``score(wav)`` takes float32 ``[B, cut]`` host audio (already padded —
    use ``meta['padding_type']``/``meta['cut']``) and returns the ``[B, C]``
    eval score columns as numpy.  The call is jitted per batch shape; the
    weights live on the default device after the first call.
    """

    def __init__(self, path: str):
        import jax

        with open(os.path.join(path, _META_FILE)) as f:
            self.meta = json.load(f)
        if self.meta["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"artifact format v{self.meta['format_version']} is newer "
                f"than this loader (v{FORMAT_VERSION})"
            )
        with open(os.path.join(path, _EXPORT_FILE), "rb") as f:
            from jax import export as jax_export

            self._exported = jax_export.deserialize(f.read())
        dtypes = self.meta["leaf_dtypes"]
        qscales = self.meta.get("quantized_leaf_scales") or {}

        def leaf(z, k):
            if k in qscales:  # int8 weight-only storage (format v2)
                return _dequantize_int8(z[k], z[qscales[k]], dtypes[k])
            return _from_npz_array(z[k], dtypes[k])

        with np.load(os.path.join(path, _WEIGHTS_FILE)) as z:
            self._p = tuple(
                leaf(z, k)
                for k in (_leaf_key("p", i)
                          for i in range(self.meta["num_param_leaves"]))
            )
            self._b = tuple(
                leaf(z, k)
                for k in (_leaf_key("b", i)
                          for i in range(self.meta["num_buffer_leaves"]))
            )
        self._fn = jax.jit(
            lambda p, b, w: self._exported.call(p, b, w)
        )
        self._on_device = False

    @property
    def cut(self) -> int:
        return int(self.meta["cut"])

    @property
    def padding_type(self) -> str:
        return self.meta["padding_type"]

    @property
    def calibration(self) -> Optional[Tuple[float, float]]:
        c = self.meta.get("calibration")
        return (float(c[0]), float(c[1])) if c else None

    def score(self, wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if wav.ndim != 2 or wav.shape[1] != self.cut:
            raise ValueError(
                f"expected [B, {self.cut}] float32 audio, got {wav.shape}"
            )
        if not self._on_device:
            # pin the weights to the device ONCE: jit re-transfers numpy
            # arguments on every call, which for the 300M artifact means
            # re-uploading 632 MB per request (measured 2 utt/s through the
            # tunneled v5e vs 820 with resident weights).  Deferred to the
            # first score so load_scorer stays backend-free.
            import jax

            self._p = tuple(jax.device_put(x) for x in self._p)
            self._b = tuple(jax.device_put(x) for x in self._b)
            self._on_device = True
        return np.asarray(self._fn(self._p, self._b, wav))


def load_scorer(path: str) -> ExportedScorer:
    """Restore an :class:`ExportedScorer` from an export directory."""
    return ExportedScorer(path)
