"""Benchmark: eval scoring throughput of the flagship model (utterances/sec/chip).

The headline capability of the reference is scoring eval sets with
XLSR-300M + linear head at 64600-sample inputs (``03_eval.sh`` flow); the
reference repo publishes no throughput numbers (BASELINE.md), so this is the
framework's north-star metric measured fresh: jit-compiled bf16 forward,
Pallas flash attention, steady-state timing on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        ssl = XLSRConfig.xlsr_300m(compute_dtype="bfloat16", attention_impl="auto")
        # batch 16 measured fastest on v5e (utt/s: 8->695, 12->748, 16->811,
        # 20->727, 24->764, 32->749, 48->560); re-sweep if the model changes
        batch, samples, iters, warmup = 16, 64600, 25, 3
    else:  # CPU smoke fallback so the bench never hard-fails
        ssl = XLSRConfig.tiny()
        batch, samples, iters, warmup = 4, 6460, 3, 1

    from scl_deepfake_audio_detection_tpu.models.base import cast_matmul_params

    model = LinearNLL(ssl=ssl)
    params = model.init(jax.random.key(0))
    # inference-only: one host-side cast instead of per-call weight converts
    params = cast_matmul_params(params, ssl.compute_dtype)

    @jax.jit
    def score(params, wav, feed):
        # ``feed`` chains iterations: each call consumes the previous call's
        # output so repeated identical executions can't be elided or cached
        # anywhere between host and chip; the perturbation is numerically nil.
        out = model.apply(params, wav + feed, train=False).log_probs
        return out, out[0, 0].astype(wav.dtype) * 1e-30

    wav = jax.numpy.asarray(
        np.random.default_rng(0).normal(size=(batch, samples)).astype(np.float32) * 0.1
    )

    feed = jax.numpy.zeros((), wav.dtype)
    for _ in range(warmup):
        out, feed = score(params, wav, feed)
    float(out.sum())  # host readback: unambiguous sync even via device tunnels
    t0 = time.perf_counter()
    for _ in range(iters):
        out, feed = score(params, wav, feed)
    checksum = float(out.sum())  # timed region ends when data reaches host
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

    utt_per_sec = batch * iters / dt
    result = {
        "metric": "eval_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s",
        # the reference publishes no throughput baseline (BASELINE.md:19);
        # vs_baseline tracks the >=10x-single-GPU north star once a GPU
        # measurement exists
        "vs_baseline": None,
        "detail": {
            "backend": jax.default_backend(),
            "batch": batch,
            "samples": samples,
            "model": "xlsr_300m+linear_nll" if on_tpu else "tiny smoke",
            "dtype": ssl.compute_dtype,
            "attention": ssl.attention_impl,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
