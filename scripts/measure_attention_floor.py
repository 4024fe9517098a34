#!/usr/bin/env python
"""Decompose the per-layer attention cost at the production XLS-R shape.

Context (PERFORMANCE.md / ROADMAP perf log): the eval-forward device trace
shows ~268 us/layer of attention vs a ~30 us MXU-only roofline, yet two
flash-kernel attempts (streaming blocks, then tuned 208/256 single-ish
blocks) measured a WASH in-model at T=201.  Those two facts reconcile only
if the gap is NOT score-matrix HBM traffic (which flash removes) but VPU
softmax arithmetic (which flash pays identically).  This script measures
each component alone at the profile shape [B=16, H=16, T=201, D=64] so the
reconciliation rests on numbers, not inference:

  qk        the scores einsum (MXU, fp32 accumulate) + scalar reduce
  exp       jnp.exp on the f32 score-shaped tensor (pure VPU transcendental)
  softmax   full jax.nn.softmax (max-sub + exp + sum + divide)
  attn      attention_reference end-to-end (what the model runs)
  flash1    the Pallas kernel as ONE whole-tile block per (batch*head)
            program (block_q = block_kv = padded T): no online-softmax
            rescale, one S tile VMEM-resident — the third kernel shape
            VERDICT r3 asked for (fwd only, the eval path)
  *_scan24  the same op lax.scan-chained 24x inside ONE jit (like the
            model's layer scan), reported PER LAYER: the single-op rows
            above sit on the tunnel's ~0.5 ms/call dispatch floor
            (PERFORMANCE.md "async dispatch 0.51 ms/call"), so only the
            scanned rows measure the op itself

Each timing chains iterations through the op's own output and ends on a
host readback (utils/measure methodology).  Standalone softmax/exp numbers
include ~82 MB of HBM traffic the in-model fusion does not pay; the printed
analysis subtracts the analytic traffic at the measured GEMM-era HBM rate.

Run strictly alone on the chip (CLAUDE.md).  Usage:
    python scripts/measure_attention_floor.py [--iters 200] [--batch 16]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def opt(argv, name, default, cast):
    if name in argv:
        i = argv.index(name)
        v = cast(argv[i + 1])
        del argv[i : i + 2]
        return v
    return default


def time_op(fn, args, iters, warmup=5):
    """ms/iter for jitted fn(*args, feed)->(out, feed): chained + readback."""
    import jax

    feed = jax.numpy.zeros((), args[0].dtype)
    for _ in range(warmup):
        out, feed = fn(*args, feed)
    float(out.sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out, feed = fn(*args, feed)
    checksum = float(out.sum())
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return dt / iters * 1000


def main():
    argv = list(sys.argv[1:])
    iters = opt(argv, "--iters", 200, int)
    b = opt(argv, "--batch", 16, int)
    cpu = "--cpu" in argv  # smoke mode (sitecustomize would pick the tunnel)
    h, t, d = 16, 201, 64

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from scl_deepfake_audio_detection_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16) * 0.125
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
    s32 = jnp.asarray(rng.normal(size=(b, h, t, t)), jnp.float32)
    print(f"backend {jax.default_backend()}, shape [{b},{h},{t},{d}], "
          f"{iters} chained iters", flush=True)

    @jax.jit
    def f_qk(q, k, feed):
        s = jnp.einsum("bhqd,bhkd->bhqk", q + feed, k,
                       preferred_element_type=jnp.float32)
        out = jnp.sum(s, axis=(2, 3))  # fused reduce: no [T,T] HBM write
        return out, (out[0, 0] * 1e-30).astype(q.dtype)

    @jax.jit
    def f_exp(s, feed):
        out = jnp.exp(s + feed)
        return out, out[0, 0, 0, 0] * 1e-30

    @jax.jit
    def f_softmax(s, feed):
        out = jax.nn.softmax(s + feed, axis=-1)
        return out, out[0, 0, 0, 0] * 1e-30

    @jax.jit
    def f_attn(q, k, v, feed):
        out = A.attention_reference(q + feed, k, v, kv_len=t)
        return out, (out[0, 0, 0, 0] * 1e-30).astype(q.dtype)

    def make_flash1(block):
        @jax.jit
        def f_flash1(q, k, v, feed):
            out, _ = A._flash_forward(q + feed, k, v, kv_len=t,
                                      block_q=block, block_kv=block)
            return out, (out[0, 0, 0, 0] * 1e-30).astype(q.dtype)
        return f_flash1

    # 24x-in-one-jit variants: amortize the per-call dispatch floor away,
    # exactly as the model's layer scan does.  Chained through the carry.
    @jax.jit
    def f_attn_scan(q, k, v, feed):
        def body(c, _):
            out = A.attention_reference(c, k, v, kv_len=t)
            return out.astype(c.dtype), None
        out, _ = jax.lax.scan(body, q + feed, None, length=24)
        return out, (out[0, 0, 0, 0] * 1e-30).astype(q.dtype)

    @jax.jit
    def f_softmax_scan(s, feed):
        def body(c, _):
            return jax.nn.softmax(c, axis=-1) + 1e-9, None
        out, _ = jax.lax.scan(body, s + feed, None, length=24)
        return out, out[0, 0, 0, 0] * 1e-30

    @jax.jit
    def f_qk_scan(q, k, feed):
        def body(c, _):
            s = jnp.einsum("bhqd,bhkd->bhqk", c, k,
                           preferred_element_type=jnp.float32)
            # fold scores back to a q-shaped carry via the AV-shaped einsum
            # so the scan chains GEMM->GEMM like the real layer does
            out = jnp.einsum("bhqk,bhkd->bhqd", s.astype(c.dtype), k)
            return (out * 1e-3).astype(c.dtype), None
        out, _ = jax.lax.scan(body, q + feed, None, length=24)
        return out, (out[0, 0, 0, 0] * 1e-30).astype(q.dtype)

    rows = {}
    rows["qk"] = time_op(f_qk, (q, k), iters)
    rows["exp"] = time_op(f_exp, (s32,), iters)
    rows["softmax"] = time_op(f_softmax, (s32,), iters)
    rows["attn"] = time_op(f_attn, (q, k, v), iters)
    scan_iters = max(iters // 8, 20)
    rows["qk2_scan24/layer"] = time_op(f_qk_scan, (q, k), scan_iters) / 24
    rows["softmax_scan24/layer"] = time_op(f_softmax_scan, (s32,),
                                           scan_iters) / 24
    rows["attn_scan24/layer"] = time_op(f_attn_scan, (q, k, v),
                                        scan_iters) / 24
    for block in (256,):
        try:
            rows[f"flash1_{block}"] = time_op(make_flash1(block), (q, k, v),
                                              iters)
        except Exception as e:  # Mosaic AOT routing flakiness (ROADMAP)
            print(f"flash1_{block} failed to compile/run: {e!r}"[:300],
                  flush=True)

    for name, ms in rows.items():
        print(f"{name:>12}: {ms * 1000:8.1f} us/iter", flush=True)

    # analytic context
    gemm_flops = 2 * b * h * t * t * d  # one of the two attention GEMMs
    hbm = 819e9  # v5e published HBM BW
    s_bytes = b * h * t * t * 4
    print(f"\nanalytic: one GEMM {gemm_flops/1e9:.2f} GFLOP "
          f"({gemm_flops/197e12*1e6:.1f} us at peak; K=64 halves MXU depth "
          f"-> ~{2*gemm_flops/197e12*1e6:.1f} us attainable)", flush=True)
    print(f"analytic: score tensor {s_bytes/1e6:.1f} MB; standalone "
          f"exp/softmax pay ~{2*s_bytes/hbm*1e6:.0f} us HBM in+out that "
          f"in-model fusion does not", flush=True)
    if "attn_scan24/layer" in rows and "qk2_scan24/layer" in rows:
        gap = (rows["attn_scan24/layer"] - rows["qk2_scan24/layer"]) * 1000
        print(f"=> dispatch-free per-layer attention "
              f"{rows['attn_scan24/layer']*1000:.0f} us, of which GEMMs "
              f"{rows['qk2_scan24/layer']*1000:.0f} us -> softmax+mask adds "
              f"~{gap:.0f} us/layer ({gap*24/1000:.2f} ms per 24-layer "
              f"forward)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
