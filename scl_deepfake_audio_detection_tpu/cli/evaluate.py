"""Eval/scoring CLI modes (--eval / --predict / --emb): the reference's
``03_eval.sh`` flow — score an eval list into the three writer formats
(train/scoring.py), with decode cache, resume, long-audio and multihost
file-list sharding on top."""

from __future__ import annotations

import os
import sys
import time

from .context import RunContext


def run(args, ctx: RunContext) -> int:
    import jax

    from scl_deepfake_audio_detection_tpu.data import protocols
    from scl_deepfake_audio_detection_tpu.data.datasets import EvalDataset
    from scl_deepfake_audio_detection_tpu.data.loader import EvalLoader
    from scl_deepfake_audio_detection_tpu.train import scoring

    engine, params, buffers, scorer, model = (
        ctx.engine, ctx.params, ctx.buffers, ctx.scorer, ctx.model
    )
    pidx, pcnt, desc = ctx.pidx, ctx.pcnt, ctx.desc

    if desc["variant"] is None:
        _, file_eval = protocols.gen_list_eval_only(args.database_path)
    else:
        _, file_eval = protocols.gen_list_scl(args.database_path, "eval")
    if pcnt > 1:  # per-host slice; merge with `cat out.part*` afterwards
        file_eval = file_eval[pidx::pcnt]
    print(f"no. of eval trials {len(file_eval)}")
    out = args.eval_output or "scores.txt"
    if pcnt > 1:
        out = f"{out}.part{pidx}"
    resume_append = False
    if args.resume_eval:
        if args.emb:
            print("--resume_eval supports --eval/--predict score files "
                  "(per-utt .npy embedding dirs don't resume); rerun "
                  "--emb without it", file=sys.stderr)
            return 2
        valid_rows, scored = scoring.read_valid_rows(out, n_tokens=3)
        if scored:
            file_eval = [u for u in file_eval if u not in scored]
            # rewrite exactly the rows we keep: drops a torn final line
            # (killed mid-write) and duplicates before appending resumes
            with open(out, "w") as f:
                f.writelines(valid_rows)
            resume_append = True
            print(f"resume: {len(scored)} utts already scored in {out}, "
                  f"{len(file_eval)} remaining")
            if not file_eval:
                print(f"nothing left to score -> {out}")
                return 0
    ds = EvalDataset(
        file_eval,
        args.database_path,
        padding_type=args.padding_type,
        use_eval_subdir=desc["eval_subdir"],
    )
    if args.decode_cache:
        # first run decodes+packs once; checkpoint sweeps after that read
        # memmap slices and stay chip-bound even for flac inputs.
        # Multi-host: each process caches ITS file-list slice in its own
        # subdir — a shared dir would have all hosts racing the same
        # pcm16.bin on a shared filesystem
        cache_dir = (
            os.path.join(args.decode_cache, f"part{pidx}")
            if pcnt > 1 else args.decode_cache
        )
        ds.warm_decode_cache(cache_dir, num_workers=args.num_workers)
    wire_dtype = args.wire_dtype
    if scorer is not None and wire_dtype != "float32":
        # the exported program's input signature is float32; the PCM16
        # wire belongs to the in-process score step (which dewires)
        print("--from_export scores float32 input; ignoring "
              f"--wire_dtype {wire_dtype}", file=sys.stderr)
        wire_dtype = "float32"
    loader = EvalLoader(ds, batch_size=max(args.batch_size, 1),
                        num_workers=args.num_workers,
                        wire_dtype=wire_dtype)
    t0 = time.time()

    # periodic progress to stderr (score rows go to the file; a 71933-utt
    # sweep otherwise runs silent for its whole duration)
    _total = len(file_eval)
    _last = {"n": 0, "t": t0}

    def _progress(n):
        if n - _last["n"] >= max(200, _total // 50) or n >= _total:
            now = time.time()
            rate = (n - _last["n"]) / max(now - _last["t"], 1e-9)
            print(f"  scored {n}/{_total} ({rate:.1f} utt/s)",
                  file=sys.stderr)
            _last["n"], _last["t"] = n, now

    if scorer is not None:
        import numpy as _np

        def score_fn(wav):
            return scorer.score(_np.asarray(wav))
    else:
        # scoring never updates params: pre-cast matmul weights to the
        # compute dtype once instead of converting the stacked encoder
        # weights every call (models/base.cast_matmul_params)
        from scl_deepfake_audio_detection_tpu.models.base import (
            cast_matmul_params,
        )

        params = cast_matmul_params(params, args.compute_dtype)

        def score_fn(wav):
            # shard the eval batch over the mesh's data axis (replicates
            # when the batch doesn't divide it, e.g. a ragged final batch)
            wav = engine.place_batch({"wav": wav})["wav"]
            return engine.score_step(params, buffers, wav)

    if args.long_audio and not (args.emb or args.predict):
        # chunked full-length scoring (see --long_audio help): per-utt
        # sequential — window counts vary per clip, so there is no single
        # fixed batch of utterances, only the fixed [batch, cut] chunk
        # program score_long_audio feeds
        scoring.produce_long_audio_evaluation_file(
            ds, score_fn, out, batch=max(args.batch_size, 1),
            append=resume_append, progress=_progress,
        )
        dt = time.time() - t0
        print(f"scored {len(file_eval)} utts (long-audio chunked) in "
              f"{dt:.1f}s -> {out}")
        return 0
    if args.long_audio:
        print("--long_audio applies to --eval scoring only; "
              "--predict/--emb use the fixed-window path",
              file=sys.stderr)

    if args.emb:
        @jax.jit
        def _emb_step(p, b, wav):
            from scl_deepfake_audio_detection_tpu.ops.layers import (
                dewire_pcm16,
            )

            o = model.apply(p, dewire_pcm16(wav), train=False, buffers=b)
            return o.log_probs, o.emb

        def emb_fn(wav):
            return _emb_step(params, buffers, wav)

        scoring.produce_emb_file(loader, emb_fn, out, progress=_progress)
    elif args.predict:
        scoring.produce_prediction_file(loader, score_fn, out,
                                        append=resume_append,
                                        progress=_progress)
    else:
        scoring.produce_evaluation_file(loader, score_fn, out,
                                        append=resume_append,
                                        progress=_progress)
    dt = time.time() - t0
    print(f"scored {len(file_eval)} utts in {dt:.1f}s "
          f"({len(file_eval)/dt:.1f} utt/s) -> {out}")
    return 0
