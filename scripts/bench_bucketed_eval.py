#!/usr/bin/env python
"""Bucketed vs exact vs fixed-shape eval scoring — the compile-count study.

Quantifies the claim behind the framework's fixed-shape eval design (ROADMAP
"Variable-length eval batching"): under jit, every distinct batch shape costs
a fresh XLA compilation, so per-length batching — free in eager torch, the
reference's implicit policy via ``customize_collate_fn`` — is catastrophic
on TPU, and the fix is either one fixed shape (the parity path, 64600) or
bucketed lengths (``train/scoring.bucketed_batches``) when true-length
scoring is wanted.

Prints one JSON line per policy:
  {"policy": ..., "compiles": N, "compile_s": ..., "steady_s": ...,
   "utt_per_s": ..., "padded_frac": ...}

- compiles: distinct programs traced (== XLA compilations for a jitted fn)
- steady_s / utt_per_s: wall time of a SECOND pass over the same batches
  (all programs warm) — the amortized serving rate
- padded_frac: fraction of scored samples that were padding (wasted FLOPs)

Usage:
  python scripts/bench_bucketed_eval.py                 # tiny model, CPU
  python scripts/bench_bucketed_eval.py --preset real   # full XLSR, TPU
  (flags: --n_utts 256 --batch 16 --bucket 16000 --seed 0)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=("tiny", "real"), default="tiny")
    ap.add_argument("--n_utts", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bucket", type=int, default=16000)
    ap.add_argument("--max_len", type=int, default=160000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.preset == "tiny":
        # CPU study: the compile-count structure is backend-independent
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.train.scoring import bucketed_batches

    if args.preset == "tiny":
        # tiny() keeps a stride-20 conv stack (fine at test lengths); at real
        # 64600-sample inputs that means T~3200 frames and a quadratic
        # attention blow-up on CPU — use the real stride-320 downsampling
        cfg = XLSRConfig.tiny(
            conv_layers=((16, 10, 5), (16, 8, 8), (16, 8, 8)),
        )
    else:
        cfg = XLSRConfig()
    model = LinearNLL(cfg)
    params = jax.jit(model.init)(jax.random.key(0))

    rng = np.random.default_rng(args.seed)
    # ASVspoof-like length distribution: lognormal seconds, 1-10 s @ 16 kHz
    secs = np.clip(rng.lognormal(mean=1.1, sigma=0.55, size=args.n_utts), 1.0, 10.0)
    lengths = (secs * 16000).astype(int)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in lengths]
    utts = [f"U{i:05d}" for i in range(args.n_utts)]

    traces = {"n": 0}

    def fwd(p, x):
        traces["n"] += 1  # runs once per trace == once per XLA compile
        return model.apply(p, x, train=False).log_probs

    def batches_for(policy):
        if policy == "fixed":
            from scl_deepfake_audio_detection_tpu.dsp.pad import pad_eval

            for i in range(0, args.n_utts, args.batch):
                chunk = wavs[i : i + args.batch]
                b = np.stack([pad_eval(w, "repeat", 64600) for w in chunk])
                if b.shape[0] < args.batch:
                    b = np.concatenate([b] * (args.batch // b.shape[0] + 1))[
                        : args.batch
                    ]
                yield b, utts[i : i + args.batch]
        else:
            mult = args.bucket if policy == "bucket" else 0
            yield from bucketed_batches(
                wavs, utts, args.batch, bucket_multiple=mult,
                max_len=args.max_len,
            )

    results = []
    for policy in ("fixed", "bucket", "exact"):
        step = jax.jit(fwd)
        traces["n"] = 0
        cached = list(batches_for(policy))
        n_scored = sum(len(u) for _, u in cached)
        # useful samples = real (non-pad, non-truncated, non-tiled-tail) audio
        n_real = sum(
            min(int(lengths[int(u[1:])]), b.shape[1])
            for b, us in cached
            for u in us
        )
        n_padded = sum(b.size for b, _ in cached) - n_real

        t0 = time.perf_counter()
        acc = 0.0
        for b, _ in cached:
            acc += float(step(params, jnp.asarray(b)).sum())  # host readback
        compile_s = time.perf_counter() - t0
        n_compiles = traces["n"]

        t0 = time.perf_counter()
        for b, _ in cached:
            acc += float(step(params, jnp.asarray(b)).sum())
        steady_s = time.perf_counter() - t0

        row = {
            "policy": policy,
            "compiles": n_compiles,
            "compile_pass_s": round(compile_s, 3),
            "steady_s": round(steady_s, 3),
            "utt_per_s": round(n_scored / steady_s, 2),
            "padded_frac": round(n_padded / sum(b.size for b, _ in cached), 4),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    fixed = next(r for r in results if r["policy"] == "fixed")
    exact = next(r for r in results if r["policy"] == "exact")
    bucket = next(r for r in results if r["policy"] == "bucket")
    print(
        json.dumps(
            {
                "summary": "compile-count win",
                "exact_over_bucket_compiles": round(
                    exact["compiles"] / max(bucket["compiles"], 1), 2
                ),
                "bucket_over_fixed_padding_saved": round(
                    fixed["padded_frac"] - bucket["padded_frac"], 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
