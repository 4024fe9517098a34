#!/usr/bin/env python
"""Pin the attainable bf16 GEMM rate of this chip (MFU calibration).

utils/flops.py reports MFU against the PUBLISHED v5e peak (197 TFLOP/s);
this script measures what a plain large bf16 matmul actually achieves, so
the MFU ceiling is known (round-4 pin: 190.2 TFLOP/s = 96.5 % of published
at [16384,4096]x[4096,4096], 1000 chained iterations).

Iteration count matters through the tunnel: the chained-readback timing
carries one fixed ~35-40 ms RTT, so at 50 iterations the small shapes are
RTT-dominated (measured 49-132 TFLOP/s, all wrong-low), and the round-2
"256 TFLOP/s" pin — ABOVE hardware peak — came from under-iterated timing
against an early-returning readback.  Default 1000 iterations keeps the
fixed cost under 4 % on every shape here.

Usage: python scripts/measure_peak_gemm.py [--iters 1000]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gemm_tflops(m, k, n, iters, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(np.random.default_rng(0).normal(size=(m, k)) * 0.1, dtype)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(k, n)) * 0.1, dtype)

    @jax.jit
    def f(a, b, feed):
        out = (a + feed) @ b
        return out, out[0, 0] * 1e-30

    feed = jnp.zeros((), dtype)
    for _ in range(3):
        out, feed = f(a, b, feed)
    float(out.sum().astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out, feed = f(a, b, feed)
    float(out.sum().astype(jnp.float32))  # readback ends the timed region
    dt = time.perf_counter() - t0
    return 2 * m * k * n * iters / dt / 1e12


def main():
    argv = list(sys.argv[1:])
    iters = int(argv[argv.index("--iters") + 1]) if "--iters" in argv else 1000
    import jax

    print(f"backend {jax.default_backend()} {jax.devices()}", flush=True)
    shapes = [
        (8192, 1024, 4096),   # fc1-like (the model's largest GEMM family)
        (8192, 4096, 4096),
        (8192, 4096, 8192),
        (16384, 4096, 4096),  # round-4 best: 190.2 TFLOP/s at 1000 iters
    ]
    best = 0.0
    for m, k, n in shapes:
        t = gemm_tflops(m, k, n, iters)
        best = max(best, t)
        print(f"[{m},{k}]x[{k},{n}] bf16: {t:.1f} TFLOP/s", flush=True)
    print(f"best: {best:.1f} TFLOP/s  (published v5e peak 197; "
          f"utils/flops.MEASURED_ATTAINABLE_BF16_FLOPS = {best:.0f}e12?)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
