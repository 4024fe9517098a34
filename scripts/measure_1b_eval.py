#!/usr/bin/env python
"""Measure the XLS-R 1B preset's eval-forward throughput on the real chip.

The reference ships only the 300M SSL; the 1B/2B presets are this framework's
TPU-first scale-out story (``parallel/memory.py`` pins that 1B *training*
needs dp x tp + ZeRO-1, but bf16 *inference* fits one v5e comfortably:
~2 GB weights).  This script turns that claim into a measured number with
the exact bench.py methodology (chained jit iterations, host readback ends
timing, per-call weight casts hoisted by cast_matmul_params).

Usage: python scripts/measure_1b_eval.py [--batch N] [--iters K] [--preset P]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from scl_deepfake_audio_detection_tpu.models.base import cast_matmul_params
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig

    argv = list(sys.argv[1:])

    def opt(name, default, cast):
        if name in argv:
            i = argv.index(name)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    batch = opt("--batch", 16, int)
    iters = opt("--iters", 12, int)
    preset = opt("--preset", "xlsr_1b", str)

    ssl = getattr(XLSRConfig, preset)(
        compute_dtype="bfloat16", attention_impl="auto"
    )
    model = LinearNLL(ssl=ssl)
    print(f"{preset}: {ssl.encoder_layers} layers x {ssl.encoder_dim} "
          f"(ffn {ssl.ffn_dim}), batch {batch}, backend "
          f"{jax.default_backend()}", flush=True)
    # init on device (never close over params in jit — CLAUDE.md)
    params = jax.jit(model.init)(jax.random.key(0))
    params = cast_matmul_params(params, ssl.compute_dtype)
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"params: {n/1e6:.1f}M", flush=True)

    from scl_deepfake_audio_detection_tpu.utils.measure import (
        chained_eval_throughput,
    )

    wav = (
        np.random.default_rng(0).normal(size=(batch, 64600)).astype(np.float32)
        * 0.1
    )
    utt_s, ms = chained_eval_throughput(model, params, wav, iters=iters)
    print(f"{preset} eval forward: {utt_s:.1f} utt/s "
          f"({ms:.1f} ms/batch-{batch})")


if __name__ == "__main__":
    main()
