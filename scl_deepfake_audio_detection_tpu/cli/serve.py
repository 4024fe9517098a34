"""Serve CLI modes: persistent scorer behind stdin lines (--serve) or HTTP
(--serve_http) — both front-ends to one warm compiled scoring program
(serving.py holds the HTTP micro-batcher)."""

from __future__ import annotations

import sys

from .context import RunContext


def run(args, ctx: RunContext) -> int:
    from scl_deepfake_audio_detection_tpu.dsp.pad import pad_eval
    from scl_deepfake_audio_detection_tpu.utils.audio_io import load_audio

    if args.serve and args.serve_http is not None:
        print("--serve and --serve_http are two front-ends to one scorer; "
              "pick one", file=sys.stderr)
        return 2

    engine, params, buffers, scorer = (
        ctx.engine, ctx.params, ctx.buffers, ctx.scorer
    )
    if scorer is None:
        from scl_deepfake_audio_detection_tpu.models.base import (
            cast_matmul_params,
        )

        params = cast_matmul_params(params, args.compute_dtype)
        cut = 64600  # the reference eval crop; one compiled program
    else:
        cut = scorer.cut

    from .common import parse_calibration

    cal = parse_calibration(args.calibrate)
    if cal is None and scorer is not None and scorer.calibration is not None:
        cal = scorer.calibration  # baked into the artifact at export
        print(f"serve: applying the artifact's calibration "
              f"a={cal[0]:.6f} b={cal[1]:.6f}", file=sys.stderr)

    import queue as _queue
    import threading as _threading

    import numpy as _np

    sb = max(int(args.serve_batch), 1)

    def batch_score(block):
        if scorer is not None:
            return scorer.score(block)
        # shard the serve batch over the mesh's data axis — same as the
        # eval path (cli/evaluate.py): on a multi-chip host each chip
        # scores its slice instead of replicating the whole forward
        wav = engine.place_batch({"wav": block})["wav"]
        return _np.asarray(engine.score_step(params, buffers, wav))

    if args.serve_http is not None:
        from scl_deepfake_audio_detection_tpu.serving import serve_http

        wire16 = args.wire_dtype == "int16" and scorer is None
        if args.wire_dtype == "int16" and scorer is not None:
            print("serve_http: --wire_dtype int16 needs the in-process "
                  "engine (export artifacts take float32); using float32",
                  file=sys.stderr)

        def batch_score_async(block):
            """HTTP path: return the UN-read device array so the
            MicroBatcher's two-in-flight pipeline can overlap this batch's
            upload+compute with the previous batch's readback (export
            artifacts read back inside scorer.score — they degrade to the
            serial loop).  --wire_dtype int16 ships the batch as PCM16
            (half the host->device bytes; score_step rescales on device —
            measured the serving bottleneck on a tunneled chip)."""
            if scorer is not None:
                return scorer.score(block)
            if wire16:
                from scl_deepfake_audio_detection_tpu.utils.audio_io import (
                    pcm16_encode,
                )

                block = pcm16_encode(block)
            # data-shard over the mesh, same as the sync path above
            wav = engine.place_batch({"wav": block})["wav"]
            return engine.score_step(params, buffers, wav)

        return serve_http(
            batch_score_async,
            cut=cut,
            host=args.serve_host,
            port=args.serve_http,
            batch_size=sb,
            max_wait_ms=args.serve_wait_ms,
            max_queue=args.serve_max_queue or None,
            padding_type=args.padding_type,
            calibration=cal,
            long_audio=args.long_audio,
            model_tag=(scorer.meta["model_tag"] if scorer is not None
                       else ctx.cfg.model.name),
        )

    def score_group(group):
        """Score up to ``sb`` request lines as ONE [sb, cut] batch.

        Pending requests batch together (a batch-1 forward leaves most
        of the chip idle under load); decode failures reply per line
        while their zero row keeps the single compiled shape.  With
        ``--long_audio``, clips longer than the window score as chunked
        crops through the SAME compiled [sb, cut] program
        (score_long_audio with batch=sb) and reply their window-averaged
        score in request order."""
        keys, rows, errs = [], [], []
        long_rows = {}
        for line in group:
            key, _, path = line.rpartition("\t")
            keys.append(key or path)
            try:
                raw_wav = load_audio(path)
                if args.long_audio and raw_wav.shape[0] > cut:
                    from scl_deepfake_audio_detection_tpu.train.scoring import (
                        score_long_audio,
                    )

                    long_rows[len(rows)] = score_long_audio(
                        raw_wav, batch_score, window=cut, batch=sb
                    )
                    rows.append(_np.zeros(cut, _np.float32))  # keep slot
                else:
                    rows.append(pad_eval(raw_wav, args.padding_type, cut))
                errs.append(None)
            except Exception as e:
                rows.append(_np.zeros(cut, _np.float32))
                errs.append(e)
        lp = None
        if any(e is None and i not in long_rows
               for i, e in enumerate(errs)):
            batch = _np.zeros((sb, cut), _np.float32)
            batch[: len(rows)] = _np.stack(rows)
            lp = batch_score(batch)
        for i, key in enumerate(keys):
            if errs[i] is not None:
                print(f"{key}\tERROR {errs[i]}", flush=True)
                continue
            row = long_rows.get(i)
            raw = float(row[1] if row is not None else lp[i, 1])
            # col 1 = bonafide log-prob (reference score column)
            out = cal[0] * raw + cal[1] if cal else raw
            print(f"{key}\t{out:.6f}", flush=True)

    print("serve: one '<wav-path>' or '<id>\\t<wav-path>' per line; "
          "replies '<id-or-path>\\t<score>' (first reply compiles, "
          "~20-40s; warm after)", file=sys.stderr)

    # a reader thread feeds a queue so pending requests group into one
    # batch without platform-specific non-blocking-stdin tricks
    q: "_queue.Queue" = _queue.Queue()

    def _reader():
        for line in sys.stdin:
            q.put(line)
        q.put(None)

    _threading.Thread(target=_reader, daemon=True).start()
    eof = False
    while not eof:
        item = q.get()
        if item is None:
            break
        group = [item.strip()] if item.strip() else []
        while len(group) < sb:
            try:
                nxt = q.get_nowait()
            except _queue.Empty:
                break
            if nxt is None:
                eof = True
                break
            if nxt.strip():
                group.append(nxt.strip())
        if group:
            score_group(group)
    return 0
