"""Training CLI modes: the reference ``02_train.sh`` flow (SCL view-batch
training with early stopping and full-state checkpoints), distillation
(--distill_from), plus the train-side utilities --show_params and
--warm_cache."""

from __future__ import annotations

import os
import sys
import time

from .common import _build_model
from .context import RunContext


def run_show_params(args, ctx: RunContext) -> int:
    """--show_params: per-layer parameter table, no device memory touched."""
    import jax

    from scl_deepfake_audio_detection_tpu.ops.layers import param_table

    model = _build_model(args, ctx.cfg)
    shapes = jax.eval_shape(model.init, jax.random.key(args.seed))
    print(param_table(shapes))
    return 0


def run_warm_cache(args, ctx: RunContext) -> int:
    """--warm_cache: pre-populate the offline augmentation cache, then exit."""
    from scl_deepfake_audio_detection_tpu.data import protocols
    from scl_deepfake_audio_detection_tpu.data.cache_warmup import (
        warm_aug_cache,
    )
    from scl_deepfake_audio_detection_tpu.data.datasets import (
        SCLViewBatchBuilder,
        resources_from_config,
        spec_from_config,
    )

    cfg = ctx.cfg
    spec = spec_from_config(cfg.data.name, cfg.data.kwargs)
    if spec is None:
        print("config's dataset is eval-only; nothing to cache",
              file=sys.stderr)
        return 2
    res = resources_from_config(cfg.data.kwargs, cfg.rawboost)
    for subset in ("train", "dev"):
        _, files = protocols.gen_list_scl(args.database_path, subset)
        builder = SCLViewBatchBuilder(
            spec, args.database_path, files, res, seed=args.seed
        )
        stats = warm_aug_cache(builder, num_workers=args.num_workers,
                               verbose=True)
        print(f"{subset}: {stats}")
    return 0


def run(args, ctx: RunContext) -> int:
    """Training (and --distill_from distillation) over the SCL pipeline."""
    import jax

    from scl_deepfake_audio_detection_tpu.data import protocols
    from scl_deepfake_audio_detection_tpu.data.datasets import (
        SCLViewBatchBuilder,
        resources_from_config,
        spec_from_config,
    )
    from scl_deepfake_audio_detection_tpu.data.loader import TrainLoader
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt

    cfg, train_cfg, engine = ctx.cfg, ctx.train_cfg, ctx.engine
    pidx, pcnt = ctx.pidx, ctx.pcnt
    rng_key = ctx.rng_key

    spec = spec_from_config(cfg.data.name, cfg.data.kwargs)
    if spec is None:
        print("config's dataset is eval-only; pass --eval", file=sys.stderr)
        return 2
    # the CLI flag overrides the dataset descriptor's repeat_pad — REFERENCE
    # behavior (main.py:375 passes padding_type into every Dataset_for, so
    # e.g. xinwang's library default only applies to direct library use)
    spec.repeat_pad = args.padding_type == "repeat"
    res = resources_from_config(cfg.data.kwargs, cfg.rawboost)

    _, file_train = protocols.gen_list_scl(args.database_path, "train")
    _, file_dev = protocols.gen_list_scl(args.database_path, "dev")
    print(f"no. of training trials {len(file_train)}")
    print(f"no. of validation trials {len(file_dev)}")

    groups = args.groups_per_step or max(args.batch_size, 1)
    train_builder = SCLViewBatchBuilder(
        spec, args.database_path, file_train, res, seed=args.seed
    )
    dev_builder = SCLViewBatchBuilder(
        spec, args.database_path, file_dev, res, seed=args.seed + 1
    )
    composer = None
    if args.device_aug:
        from scl_deepfake_audio_detection_tpu.data.device_pipeline import (
            DeviceViewComposer,
            build_banks,
        )

        # the device composer implements exactly the conf-3 anchor recipe
        # (RawBoost12 + background_noise + reverb as one jit program);
        # accepting any other method list would SILENTLY train a different
        # augmentation distribution than the config requests
        def _canon(m: str) -> str:
            return m.replace("_wrapper", "")

        want = {"RawBoost12", "background_noise", "reverb"}
        got = {_canon(m) for m in spec.augmentation_methods}
        if got != want:
            print(
                f"--device_aug supports the conf-3 recipe {sorted(want)} "
                f"only; this config requests {sorted(got)} — run without "
                "--device_aug (host augmentation covers every method)",
                file=sys.stderr,
            )
            return 2
        from scl_deepfake_audio_detection_tpu.data.loader import (
            DeviceAugTrainLoader,
        )

        noise_bank, rir_bank = build_banks(
            cfg.data.kwargs.get("noise_path"), cfg.data.kwargs.get("rir_path"),
            sr=spec.wav_samp_rate,
        )
        composer = DeviceViewComposer(
            cfg.rawboost, noise_bank, rir_bank, fs=spec.wav_samp_rate,
            seed=args.seed, snr_mode=args.snr_mode,
        )
        print(f"device augmentation: noise bank {noise_bank.shape}, "
              f"rir bank {rir_bank.shape}")
        train_loader = DeviceAugTrainLoader(train_builder, groups, shuffle=True,
                                            num_workers=args.num_workers,
                                            seed=args.seed,
                                            shard_index=pidx, num_shards=pcnt,
                                            wire_dtype=args.wire_dtype)
        # pods must drop ragged dev remainders: a final batch smaller than
        # the per-process data slice can't place on the global mesh
        dev_loader = DeviceAugTrainLoader(dev_builder, groups, shuffle=False,
                                          drop_last=(pcnt > 1),
                                          num_workers=args.num_workers,
                                          seed=args.seed,
                                          shard_index=pidx, num_shards=pcnt,
                                          wire_dtype=args.wire_dtype)
    else:
        train_loader = TrainLoader(train_builder, groups, shuffle=True,
                                   num_workers=args.num_workers, seed=args.seed,
                                   shard_index=pidx, num_shards=pcnt)
        dev_loader = TrainLoader(dev_builder, groups, shuffle=False,
                                 drop_last=(pcnt > 1),
                                 num_workers=args.num_workers, seed=args.seed,
                                 shard_index=pidx, num_shards=pcnt)

    # every process passes save_dir: checkpoint saves are collectives (ZeRO-1
    # shards all-gather inside ckpt.save) and process 0 alone writes files
    save_dir = os.path.join(args.out_dir, train_cfg.model_tag())
    if pidx == 0:
        os.makedirs(save_dir, exist_ok=True)
    print(f"model tag: {train_cfg.model_tag()}")

    epoch_counter = {"n": train_cfg.start_epoch}

    def _composed(raw_batches, epoch):
        import jax as _jax

        for i, raw in enumerate(raw_batches):
            key = _jax.random.fold_in(  # epoch -1 = dev pass; keep fold_in >= 0
                _jax.random.key(args.seed + 77), (epoch + 1) * 1_000_003 + i
            )
            views, labels = composer(
                raw["anchors"], raw["reals"], raw["vocoded"], key,
                spoofs=raw.get("spoofs"), variant=spec.variant,
            )
            yield {"wav": views, "labels": labels, "utts": raw["utts"]}

    def train_batches():
        e = epoch_counter["n"]
        epoch_counter["n"] += 1
        if composer is not None:
            return _composed(train_loader.epoch(e), e)
        return train_loader.epoch(e)

    # --- distillation training -------------------------------------------------
    if args.distill_from:
        return _run_distill(args, ctx, train_batches, save_dir)

    def log_fn(epoch, record):
        eer = record.get("val_eer")  # present under --early_metric eer;
        # None when a single-class dev shard makes EER undefined
        eer_s = f"val_eer={eer:.2f}% " if isinstance(eer, float) else ""
        print(
            f"epoch {epoch}: lr={record['lr']:.3g} "
            f"train_loss={record.get('train_loss', float('nan')):.4f} "
            f"val_loss={record.get('val_loss', float('nan')):.4f} "
            f"val_acc={record.get('val_accuracy', float('nan')):.4f} "
            f"{eer_s}({record['seconds']:.1f}s)"
        )

    t0 = time.time()
    engine.fit(
        ctx.params,
        ctx.buffers,
        ctx.opt_state,
        train_batches=train_batches,
        dev_batches=(
            (lambda: _composed(dev_loader.epoch(0), -1))
            if composer is not None
            else (lambda: dev_loader.epoch(0))
        ),
        rng_key=rng_key,
        save_dir=save_dir,
        log_fn=log_fn,
        tensorboard_dir=(
            args.tensorboard_dir
            or (os.path.join(save_dir, "logs") if save_dir else None)
        ),
        profile_dir=args.profile_dir,
        resume_best=ctx.resume_best,
        resume_counter=ctx.resume_counter,
    )
    print(f"Total training time: {time.time() - t0}s")
    return 0


def _run_distill(args, ctx: RunContext, train_batches, save_dir) -> int:
    import jax
    import numpy as np

    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
    from scl_deepfake_audio_detection_tpu.train import distill as D

    train_cfg, engine, rng_key = ctx.train_cfg, ctx.engine, ctx.rng_key
    teacher_preset = getattr(XLSRConfig, args.teacher_preset)

    teacher = LinearNLL(ssl=teacher_preset(
        compute_dtype=args.compute_dtype
    ))
    if args.distill_from.endswith(".pth"):
        from scl_deepfake_audio_detection_tpu.models import convert

        sd = ckpt.load_reference_head_checkpoint(args.distill_from)
        t_params, _ = convert.from_reference_model_checkpoint(
            sd, like=teacher.ssl
        )
        t_buffers = {}
    else:
        tree, _ = ckpt.load(args.distill_from)
        t_params = tree["params"] if "params" in tree else tree
        t_buffers = (tree.get("buffers") or {}) if isinstance(tree, dict) \
            else {}
    dcfg = D.DistillConfig(
        temperature=args.distill_temp,
        alpha=args.distill_alpha,
        emb_loss_weight=args.distill_emb_w,
        weight_decay=args.weight_decay,
    )
    try:
        deng = D.DistillEngine(teacher, ctx.model, dcfg, mesh=engine.mesh)
    except ValueError as e:  # BN students need the full Engine
        print(str(e), file=sys.stderr)
        return 2
    s_params, d_opt, t_params, t_buffers = deng.init_state(
        rng_key, t_params, student_params=ctx.params,
        teacher_buffers=t_buffers,
    )
    t0 = time.time()
    for epoch in range(train_cfg.start_epoch,
                       train_cfg.start_epoch + train_cfg.num_epochs):
        te = time.time()
        s_params, d_opt, metrics = deng.run_epoch(
            s_params, d_opt, t_params, train_batches(),
            jax.random.fold_in(rng_key, epoch),
            teacher_buffers=t_buffers,
        )
        print(f"epoch {epoch}: " +
              " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
              + f" ({time.time()-te:.1f}s)")
        if not all(np.isfinite(v) for v in metrics.values()):
            print("non-finite distillation metrics; stopping",
                  file=sys.stderr)
            return 1
        # collective save (every process calls; proc 0 writes)
        ckpt.save(
            os.path.join(save_dir, "student_last.ckpt"),
            {"params": s_params},
            extra={"epoch": epoch,
                   **{k: float(v) for k, v in metrics.items()}},
        )
    print(f"Total distillation time: {time.time() - t0}s; student at "
          f"{os.path.join(save_dir, 'student_last.ckpt')} — eval/serve/"
          f"export it with --model_path + --ssl_preset {args.ssl_preset}")
    return 0
