#!/usr/bin/env python
"""Measure the HTTP serving stack's sustained throughput + latency on chip.

The eval-path ceiling is known (bench.py: ~828 utt/s at batch 16 through
the tunnel); this measures what of it the PRODUCTION surface delivers —
``serving.py``'s full request path: HTTP parse -> audio decode -> pad ->
micro-batcher -> one warm [batch, 64600] forward -> JSON reply — under
concurrent load, plus the lone-request latency a lightly-loaded deployment
sees.  The reference has no serving path to compare against (deployment =
rerunning ``main.py --eval``, a full model load per invocation).

Usage: python scripts/measure_serving.py [--preset xlsr_300m|tiny]
           [--batch 16] [--wait_ms 10] [--n 400] [--concurrency 64]
           [--samples 64600] [--files 32]

Methodology notes (CLAUDE.md): weights are device_put ONCE and the jitted
scorer takes them as arguments (numpy args would re-upload per call; a
closed-over pytree would constant-fold into the HLO).  Throughput timing
starts after a warmup request (compile excluded) and ends when the last
JSON reply lands on the client thread — readback through the tunnel is
inside the measured path, as in production.
"""

import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def opt(argv, name, default, cast):
    if name in argv:
        i = argv.index(name)
        v = cast(argv[i + 1])
        del argv[i : i + 2]
        return v
    return default


def main():
    argv = list(sys.argv[1:])
    preset = opt(argv, "--preset", "xlsr_300m", str)
    batch = opt(argv, "--batch", 16, int)
    wait_ms = opt(argv, "--wait_ms", 10.0, float)
    n = opt(argv, "--n", 400, int)
    concurrency = opt(argv, "--concurrency", 64, int)
    samples = opt(argv, "--samples", 64600, int)
    n_files = opt(argv, "--files", 32, int)
    wire = opt(argv, "--wire", "float32", str)  # float32 | int16
    cpu = "--cpu" in argv  # smoke mode: skip the (possibly tunneled) chip

    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from scl_deepfake_audio_detection_tpu.models.base import cast_matmul_params
    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.serving import make_server
    from scl_deepfake_audio_detection_tpu.utils.audio_io import save_wav

    if preset == "tiny":
        ssl = XLSRConfig.tiny()
    else:
        ssl = getattr(XLSRConfig, preset)(
            compute_dtype="bfloat16", attention_impl="auto"
        )
    model = LinearNLL(ssl=ssl)
    params = jax.jit(model.init)(jax.random.key(0))
    params = jax.device_put(cast_matmul_params(params, ssl.compute_dtype))

    @jax.jit
    def _score(params, wav):
        return model.apply(params, wav, train=False).log_probs

    from scl_deepfake_audio_detection_tpu.ops.layers import dewire_pcm16
    from scl_deepfake_audio_detection_tpu.utils.audio_io import pcm16_encode

    @jax.jit
    def _score16(params, wav16):
        return model.apply(
            params, dewire_pcm16(wav16), train=False
        ).log_probs

    def batch_score(block):
        # un-read device array: lets the MicroBatcher pipeline overlap
        # upload+compute with the previous batch's readback
        if wire == "int16":  # PCM16 wire: half the upload bytes
            return _score16(params, jax.numpy.asarray(pcm16_encode(block)))
        return _score(params, jax.numpy.asarray(block))

    print(f"backend {jax.default_backend()}, preset {preset}, "
          f"serve_batch {batch}, wait {wait_ms} ms, wire {wire}, "
          f"{n} requests x {concurrency} client threads", flush=True)

    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_files):
        p = os.path.join(tmp, f"u{i}.wav")
        save_wav(p, (rng.normal(size=samples) * 0.1).astype(np.float32), 16000)
        paths.append(p)

    server = make_server(
        batch_score, cut=samples, port=0, batch_size=batch,
        max_wait_ms=wait_ms, padding_type="zero", model_tag=preset,
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}/score"

    def post(path, timeout=1200):
        req = urllib.request.Request(
            url, data=json.dumps({"path": path}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.loads(r.read())

    t0 = time.perf_counter()
    post(paths[0])  # compile + warm the whole path
    print(f"warmup reply in {time.perf_counter() - t0:.1f} s "
          f"(includes the XLA compile)", flush=True)

    # lone-request latency: sequential, nothing else in flight
    lone = []
    for i in range(10):
        t = time.perf_counter()
        post(paths[i % n_files])
        lone.append((time.perf_counter() - t) * 1e3)
    lone = np.array(lone)

    # sustained load: n requests spread over `concurrency` client threads
    lat = np.zeros(n)
    errs = []
    next_i = [0]
    lock = threading.Lock()

    def client():
        while True:
            with lock:
                i = next_i[0]
                if i >= n:
                    return
                next_i[0] += 1
            t = time.perf_counter()
            try:
                post(paths[i % n_files])
            except Exception as e:  # pragma: no cover - diagnostics only
                errs.append(e)
                return
            lat[i] = (time.perf_counter() - t) * 1e3

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    d0, r0 = server.batcher.dispatch_s, server.batcher.readback_s
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        print(f"FAILED: {len(errs)} request errors, first: {errs[0]!r}")
        return 1

    b = server.batcher
    fill = (b.served - 11) / max(b.batches - 11, 1)  # warm+lone ran batch-1
    print(f"lone-request latency: p50 {np.percentile(lone, 50):.0f} ms, "
          f"p95 {np.percentile(lone, 95):.0f} ms", flush=True)
    print(f"sustained: {n / wall:.1f} utt/s over {wall:.1f} s | "
          f"latency p50 {np.percentile(lat, 50):.0f} ms / "
          f"p95 {np.percentile(lat, 95):.0f} ms | "
          f"mean batch fill {fill:.1f}/{batch} "
          f"({b.batches} device batches, {b.served} served)", flush=True)
    disp, rb = b.dispatch_s - d0, b.readback_s - r0
    print(f"worker decomposition (load phase): dispatch {disp:.2f} s + "
          f"readback {rb:.2f} s of {wall:.1f} s wall -> "
          f"{wall - disp - rb:.2f} s worker-idle/host "
          f"(HTTP/decode/assembly/GIL; in-process clients share this "
          f"1-core host)", flush=True)
    server.shutdown()
    server.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
