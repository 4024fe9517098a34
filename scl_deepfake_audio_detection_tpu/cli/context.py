"""Shared runtime state behind every model-bearing CLI mode.

Three phases, in the exact order the modes need them (``main()`` dispatches
between phases so e.g. ``--show_params`` never loads a checkpoint and
``--export_reference_ckpt`` sees params BEFORE optimizer-state allocation):

1. ``build_runtime``   — jax / multihost init, compilation cache, config.
2. ``load_model_state`` — TrainConfig, export-artifact scorer OR model +
   Engine + params (random init / our .ckpt / a reference .pth).
3. ``init_state``      — device placement + optimizer moments (train modes
   only) and exact full-train-state resume.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Any, Optional

from .common import CliError, _build_model, _init_params
from .flags import _rawboost_from_args


@dataclasses.dataclass
class RunContext:
    """Everything the per-mode modules share; filled in by the phases."""

    args: Any
    pidx: int = 0
    pcnt: int = 1
    cfg: Any = None
    train_cfg: Any = None
    scorer: Any = None  # --from_export AOT artifact (replaces model+engine)
    model: Any = None
    mesh: Any = None
    engine: Any = None
    rng_key: Any = None
    params: Any = None
    buffers: Any = None
    opt_state: Any = None
    desc: Optional[dict] = None  # dataset descriptor (registry)
    is_train_mode: bool = False
    ref_extras: Any = None  # unmapped reference-.pth tensors (round-trip)
    resume_opt: Optional[str] = None  # checkpoint path iff full train state
    resume_epoch: Optional[int] = None
    resume_extra: dict = dataclasses.field(default_factory=dict)
    resume_counter: Optional[int] = None
    resume_best: Optional[float] = None


def build_runtime(args) -> RunContext:
    import jax

    if args.multihost:
        # TPU pod: one process per host; coordinator/peers come from the TPU
        # environment (jax.distributed autodetects).  Non-TPU clusters (and
        # the 2-process CPU validation in tests) pass them explicitly via
        # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            # explicit cluster config: a mistake here must be FATAL — a
            # silent single-process fallback would have every host score the
            # full file list / write the same checkpoint paths
            jax.distributed.initialize(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
                # the shutdown barrier must outlast the spread between the
                # fastest and slowest process; uneven eval shards mean the
                # stragglers compile extra (remainder-batch) programs, which
                # on cold caches can exceed jax's 300 s default
                shutdown_timeout_seconds=int(
                    os.environ.get("SCL_SHUTDOWN_TIMEOUT_S", "900")
                ),
            )
        else:
            try:
                jax.distributed.initialize()
            except Exception as e:  # single-host invocation: run unsharded
                print(f"--multihost: no cluster detected ({e}); continuing "
                      "as a single process", file=sys.stderr)
    pidx, pcnt = jax.process_index(), jax.process_count()

    if args.jax_cache:
        jax.config.update("jax_compilation_cache_dir", args.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scl_deepfake_audio_detection_tpu.utils.config import load_config

    cfg = load_config(args.config)
    cfg.rawboost = _rawboost_from_args(args)
    return RunContext(args=args, pidx=pidx, pcnt=pcnt, cfg=cfg)


def load_model_state(ctx: RunContext) -> None:
    import jax

    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
    from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig

    args, cfg = ctx.args, ctx.cfg
    ctx.train_cfg = TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        start_epoch=args.start_epoch,
        min_lr=args.min_lr,
        max_lr=args.max_lr,
        weight_decay=args.weight_decay,
        loss=args.loss,
        grad_clip_norm=args.grad_clip_norm,
        grad_accum_steps=args.grad_accum_steps,
        early_metric=args.early_metric,
        es_patience=args.es_patience,
        es_delta=args.es_delta,
        padding_type=args.padding_type,
        seed=args.seed,
        comment=args.comment,
        compute_dtype=args.compute_dtype,
        mesh_shape=[int(x) for x in args.mesh.split(",")] if args.mesh else None,
        loss_scope=args.loss_scope,
        zero1=args.zero1,
        ckpt_every=args.ckpt_every,
        async_ckpt=not args.sync_ckpt,
    )

    # --- AOT-artifact scoring: skip model construction entirely --------------
    scorer = None
    if args.from_export:
        if not (args.serve or args.serve_http is not None or args.eval):
            # --predict rides --eval (reference semantics: main.py:358-368
            # dispatches the prediction writer inside the --eval branch)
            raise CliError(2, "--from_export works with --serve or --eval "
                              "(--eval --predict for the prediction writer)")
        if args.emb:
            raise CliError(2, "--emb needs the model (export artifacts carry "
                              "the score columns only); run --emb with "
                              "--model_path instead")
        if args.model_path:
            raise CliError(2, "--from_export already contains the weights; "
                              "drop --model_path")
        if args.export_model or args.parity_check or args.verify_export:
            raise CliError(2, "--export_model/--parity_check/--verify_export "
                              "need the model itself, not an artifact; run "
                              "them with --model_path/--config")
        if args.export_reference_ckpt:
            raise CliError(2, "--export_reference_ckpt cannot reverse-migrate "
                              "an export artifact (it carries compiled "
                              "StableHLO + flat weights, no raw param "
                              "pytree); export from the original checkpoint "
                              "with --model_path instead")
        from scl_deepfake_audio_detection_tpu.export import load_scorer

        scorer = load_scorer(args.from_export)
        print(f"loaded export {args.from_export}: {scorer.meta['model_tag']}"
              f", cut {scorer.cut}, platforms {scorer.meta['platforms']}, "
              f"{scorer.meta['param_bytes']/1e6:.1f} MB weights",
              file=sys.stderr)  # stderr: --serve replies own stdout
    ctx.scorer = scorer

    model = None if scorer else _build_model(args, cfg)
    mesh = None
    if args.multihost and args.eval:
        # eval is embarrassingly parallel: each host scores its slice of the
        # file list on its OWN chips (no cross-host collectives to schedule)
        from scl_deepfake_audio_detection_tpu.parallel import make_mesh

        local = jax.local_devices()
        mesh = make_mesh((len(local), 1), devices=local)
    from scl_deepfake_audio_detection_tpu.train.engine import Engine

    ctx.model = model
    ctx.mesh = mesh
    ctx.engine = None if scorer else Engine(model, ctx.train_cfg, mesh=mesh)
    ctx.rng_key = jax.random.key(args.seed)

    # --model_path replaces every parameter wholesale, so skip the random
    # init there — jit(model.init) of the 300M preset is a full compile +
    # device init (minutes over a remote-tunneled chip) paid on every
    # checkpoint eval/serve/parity run otherwise
    ctx.params = (None if (args.model_path or scorer)
                  else _init_params(args, model, ctx.rng_key))
    if args.model_path:
        if args.model_path.endswith(".pth"):
            # a reference epoch_N.pth: full wav2vec2_linear_nll state dict
            # (embedded fairseq SSL + head) -> our param pytree
            from scl_deepfake_audio_detection_tpu.models import convert
            from scl_deepfake_audio_detection_tpu.models.linear_nll import (
                LinearNLL,
            )

            if not isinstance(model, LinearNLL):
                raise CliError(2, "reference .pth loading is implemented for "
                                  "the wav2vec2_linear_nll model (the one "
                                  "behind every published checkpoint); use "
                                  "--config conf-N-linear")
            sd = ckpt.load_reference_head_checkpoint(args.model_path)
            ctx.params, ssl_cfg, ctx.ref_extras = (
                convert.from_reference_model_checkpoint(
                    sd, like=model.ssl, return_extras=True
                )
            )
            if ssl_cfg.encoder_dim != model.ssl.encoder_dim:
                print(f"warning: checkpoint SSL dim {ssl_cfg.encoder_dim} != "
                      f"model config {model.ssl.encoder_dim}", file=sys.stderr)
            print(f"loaded reference checkpoint {args.model_path} "
                  f"({ssl_cfg.encoder_layers}-layer SSL)")
        else:
            tree, extra = ckpt.load(args.model_path)
            ctx.params = tree["params"] if "params" in tree else tree
            ctx.buffers = tree.get("buffers") if isinstance(tree, dict) else None
            if isinstance(tree, dict) and "opt_state_leaves" in tree:
                ctx.resume_opt = args.model_path  # full train state: resume
                ctx.resume_epoch = int(extra.get("epoch", -1)) + 1
                ctx.resume_extra = extra
            print(f"loaded checkpoint {args.model_path} (extra={extra})")


def init_state(ctx: RunContext) -> None:
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
    from scl_deepfake_audio_detection_tpu.utils.registry import DATASETS

    args = ctx.args
    # forward-only modes never read optimizer state: skip allocating AdamW
    # moments (2x param bytes of HBM) and skip the exact-resume re-load
    ctx.is_train_mode = not (
        args.eval or args.predict or args.emb or args.serve
        or args.serve_http is not None
        or args.parity_check or args.export_model
        or args.verify_export
    )
    if ctx.scorer is None:
        # distillation brings its own optimizer (DistillEngine) — don't
        # allocate the Engine's AdamW moments just to discard them
        ctx.params, ctx.buffers, ctx.opt_state = ctx.engine.init_state(
            ctx.rng_key, params=ctx.params, buffers=ctx.buffers,
            with_opt=ctx.is_train_mode and not args.distill_from,
        )
    if ctx.resume_opt is not None and ctx.is_train_mode and not args.distill_from:
        # (--distill_from + a full-train-state --model_path only seeds the
        # student's params above; the Engine's AdamW state isn't allocated)
        from scl_deepfake_audio_detection_tpu.parallel import shard_params

        (ctx.params, b2, ctx.opt_state, _, ctx.rng_key,
         ctx.resume_best) = ckpt.load_train_state(ctx.resume_opt, ctx.opt_state)
        ctx.params = shard_params(ctx.params, ctx.engine.mesh)
        ctx.buffers = (shard_params(b2, ctx.engine.mesh) if b2
                       else ctx.buffers)
        # EarlyStop patience counter at save time (absent in pre-round-3
        # checkpoints: those resume with a fresh counter)
        ctx.resume_counter = int(ctx.resume_extra.get("es_counter", 0))
        saved_metric = str(ctx.resume_extra.get("es_metric", "acc"))
        if saved_metric != args.early_metric:
            # watermark tracks a different metric (acc↑ vs eer↓): reusing it
            # under the new direction is meaningless — start the stopper fresh
            print(f"resume: checkpoint early-stop metric {saved_metric!r} != "
                  f"--early_metric {args.early_metric!r}; starting the "
                  f"EarlyStop watermark fresh")
            ctx.resume_best = None
            ctx.resume_counter = 0
        if args.start_epoch == 0 and ctx.resume_epoch:
            ctx.train_cfg.start_epoch = ctx.resume_epoch
            best_str = ("fresh" if ctx.resume_best is None
                        else f"{ctx.resume_best:.4f}")
            print(f"resuming full train state at epoch {ctx.resume_epoch} "
                  f"(best so far {best_str})")

    ctx.desc = DATASETS.get(ctx.cfg.data.name)
