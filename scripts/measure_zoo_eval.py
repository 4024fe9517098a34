#!/usr/bin/env python
"""Measure every model family's eval-forward throughput on the real chip.

PERFORMANCE.md pins hardware numbers for the flagship (linear_nll @ 300M),
the distillation student and the 1B preset; this sweeps the REST of the zoo
(`wav2vec2_aasist`, `wav2vec2_resnet`, `wav2vec2_btse` — reference heads
from `model/wav2vec2_aasist/model.py`, `model/wav2vec2_resnet/model.py`,
`model/wav2vec2_btse/model.py`) with the exact bench.py methodology
(`utils/measure.chained_eval_throughput`: chained jit iterations, host
readback ends timing) so the claim "every family runs TPU-native" carries a
measured utt/s, not just a green CPU test.

Usage: python scripts/measure_zoo_eval.py [--batch N] [--iters K]
                                          [--models a,b,c]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(name: str, ssl):
    from scl_deepfake_audio_detection_tpu.models.aasist import XLSRAasist
    from scl_deepfake_audio_detection_tpu.models.btse import XLSRBtse
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.resnet import XLSRResNet

    return {
        "xlsr_linear_nll": lambda: LinearNLL(ssl=ssl),
        "xlsr_aasist": lambda: XLSRAasist(ssl=ssl),
        "xlsr_resnet": lambda: XLSRResNet(ssl=ssl),  # resnet_type 18 default
        "xlsr_btse": lambda: XLSRBtse(ssl=ssl),  # transformer bio encoder
    }[name]()


def main():
    import jax

    from scl_deepfake_audio_detection_tpu.models.base import cast_matmul_params
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.utils.measure import (
        chained_eval_throughput,
    )

    argv = list(sys.argv[1:])

    def opt(name, default, cast):
        if name in argv:
            i = argv.index(name)
            v = cast(argv[i + 1])
            del argv[i : i + 2]
            return v
        return default

    batch = opt("--batch", 16, int)
    iters = opt("--iters", 25, int)
    samples = opt("--samples", 64600, int)
    preset = opt("--preset", "xlsr_300m", str)  # 'tiny' for a CPU smoke
    names = opt(
        "--models", "xlsr_aasist,xlsr_resnet,xlsr_btse,xlsr_linear_nll", str
    ).split(",")

    if preset == "tiny":
        ssl = XLSRConfig.tiny()
    else:
        ssl = getattr(XLSRConfig, preset)(
            compute_dtype="bfloat16", attention_impl="auto"
        )
    wav = (
        np.random.default_rng(0)
        .normal(size=(batch, samples))
        .astype(np.float32)
        * 0.1
    )
    print(f"backend {jax.default_backend()}, batch {batch}, iters {iters}",
          flush=True)
    for name in names:
        model = build(name, ssl)
        params = jax.jit(model.init)(jax.random.key(0))
        params = cast_matmul_params(params, ssl.compute_dtype)
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        utt_s, ms = chained_eval_throughput(model, params, wav, iters=iters)
        print(f"{name:18s} {n/1e6:7.1f}M params  {utt_s:7.1f} utt/s "
              f"({ms:.1f} ms/batch-{batch})", flush=True)
        del params


if __name__ == "__main__":
    main()
