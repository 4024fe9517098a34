"""Artifact / parity CLI modes: AOT export, export verification,
reverse migration to a reference-loadable ``.pth``, and the weights-day
parity check (SURVEY §5 checkpoint-migration story)."""

from __future__ import annotations

import sys

from .common import CliError
from .context import RunContext


def run_export_reference_ckpt(args, ctx: RunContext) -> int:
    """--export_reference_ckpt: write a reference-loadable .pth and exit.

    Dispatched BEFORE ``context.init_state`` — params here are the raw
    loaded pytree (no device sharding, no optimizer moments)."""
    import jax

    from scl_deepfake_audio_detection_tpu.models import convert
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL

    if not isinstance(ctx.model, LinearNLL):
        print("--export_reference_ckpt maps onto the reference "
              "wav2vec2_linear_nll state dict; use --config conf-N-linear",
              file=sys.stderr)
        return 2
    if ctx.params is None or not args.model_path:
        print("--export_reference_ckpt needs --model_path (exporting a "
              "random init is never what you want)", file=sys.stderr)
        return 2
    convert.save_reference_checkpoint(
        ctx.params, args.export_reference_ckpt, extras=ctx.ref_extras
    )
    n = sum(x.size for x in jax.tree.leaves(ctx.params))
    print(f"wrote reference checkpoint {args.export_reference_ckpt} "
          f"({n / 1e6:.1f}M params"
          + (", extras round-tripped" if ctx.ref_extras else "") + ")")
    return 0


def run_parity_check(args, ctx: RunContext) -> int:
    from scl_deepfake_audio_detection_tpu.train.parity import run_parity_check

    report = run_parity_check(
        ctx.engine, ctx.params, ctx.buffers, args.parity_check,
        args.database_path,
        use_eval_subdir=ctx.desc["eval_subdir"],
        padding_type=args.padding_type,
        fmt=args.score_format,
        n=args.parity_n,
        tol=args.parity_tol,
        batch_size=max(args.batch_size, 1),
        num_workers=args.num_workers,
        compute_dtype=args.compute_dtype,
    )
    print(report)
    return 0 if report.ok else 1


def run_verify_export(args, ctx: RunContext) -> int:
    import jax
    import numpy as np

    from scl_deepfake_audio_detection_tpu.export import load_scorer
    from scl_deepfake_audio_detection_tpu.models.base import (
        cast_matmul_params,
    )

    vscorer = load_scorer(args.verify_export)
    if vscorer.meta["model_tag"] != ctx.cfg.model.name:
        print(f"note: artifact model_tag {vscorer.meta['model_tag']!r} "
              f"!= config model {ctx.cfg.model.name!r}", file=sys.stderr)
    rng = np.random.default_rng(args.seed)
    probe = (rng.standard_normal((4, vscorer.cut)) * 0.1).astype(np.float32)
    art = vscorer.score(probe)
    cast = cast_matmul_params(ctx.params, args.compute_dtype)
    ours = np.asarray(
        ctx.engine.score_step(cast, ctx.buffers, jax.numpy.asarray(probe))
    )
    if art.shape != ours.shape:
        print(f"verify_export: FAIL — score shape {art.shape} (artifact) "
              f"!= {ours.shape} (model)", file=sys.stderr)
        return 1
    diff = float(np.max(np.abs(art - ours)))
    ok = diff <= args.parity_tol
    print(f"verify_export: max |artifact - model| = {diff:.3e} over "
          f"{probe.shape[0]} probe utts "
          f"({'OK' if ok else 'FAIL'}, tol {args.parity_tol:g})")
    return 0 if ok else 1


def run_export_model(args, ctx: RunContext) -> int:
    from scl_deepfake_audio_detection_tpu.export import export_scorer

    from .common import parse_calibration

    cal = parse_calibration(args.calibrate)
    meta = export_scorer(
        ctx.model, ctx.params, ctx.buffers, args.export_model,
        compute_dtype=args.compute_dtype,
        padding_type=args.padding_type,
        calibration=cal,
        model_tag=ctx.cfg.model.name,
        quantize=args.export_quant,
    )
    qnote = (f", stored {meta['stored_bytes']/1e6:.1f} MB as "
             f"{meta['quantization']}" if meta.get("quantization") else "")
    print(f"exported {meta['model_tag']} -> {args.export_model} "
          f"({meta['param_bytes']/1e6:.1f} MB weights{qnote}, platforms "
          f"{meta['platforms']}); run it with --from_export")
    return 0
