"""Shared measurement methodology for every published number.

Two rules (CLAUDE.md "Environment quirks") shape both helpers, because this
chip is reached through a tunnel whose dispatch/readback latency swings:

- end timing on a HOST READBACK (``float(...)``) — ``block_until_ready``
  through the tunnel can return early;
- chain iterations through the jitted function's own output so repeated
  identical executions can't be elided or cached anywhere between host and
  chip (the perturbation is numerically nil: ``out[0,0] * 1e-30``).

``bench.py`` (the driver's round-over-round artifact),
``scripts/measure_train_step.py`` (the sweep tool) and
``scripts/measure_1b_eval.py`` all call these — one copy of the
methodology, so the pinned numbers and the sweep numbers can't drift apart.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Tuple

import numpy as np


def chained_eval_throughput(
    model, params, wav, iters: int, warmup: int = 3
) -> Tuple[float, float]:
    """(utterances/sec, ms/iter) for ``model.apply`` eval forwards on ``wav``
    ([batch, samples], a device or host array), chained + readback-timed."""
    import jax

    @jax.jit
    def score(params, wav, feed):
        out = model.apply(params, wav + feed, train=False).log_probs
        return out, out[0, 0].astype(wav.dtype) * 1e-30

    wav = jax.numpy.asarray(wav)
    feed = jax.numpy.zeros((), wav.dtype)
    for _ in range(max(warmup, 1)):
        out, feed = score(params, wav, feed)
    float(out.sum())  # host readback: unambiguous sync even via tunnels
    t0 = time.perf_counter()
    for _ in range(iters):
        out, feed = score(params, wav, feed)
    checksum = float(out.sum())  # timed region ends when data reaches host
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    batch = wav.shape[0]
    return batch * iters / dt, dt / iters * 1000


def train_ms_per_step(
    model, optimizer, params, opt_state, batch: Dict[str, np.ndarray],
    k1: int = 3, k2: int = 9, loss_scope: str = "group",
) -> float:
    """Differenced-``lax.scan`` train-step timing: jit a k-step chained scan
    for k1 and k2, time each warm (compile excluded, readback-ended), return
    (t[k2]-t[k1])/(k2-k1) — per-dispatch tunnel overhead cancels in the
    difference.  ``batch``: the {wav, labels} group batch to re-feed every
    step."""
    import jax
    import jax.numpy as jnp

    from scl_deepfake_audio_detection_tpu.train.engine import _train_step

    step = functools.partial(
        _train_step, model=model, optimizer=optimizer, loss_scope=loss_scope
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def chained(params, opt_state, k):
        def body(carry, i):
            p, o = carry
            p, _, o, m = step(
                p, {}, o, batch, jax.random.fold_in(jax.random.key(1), i)
            )
            return (p, o), m["loss"]

        (_, _), losses = jax.lax.scan(body, (params, opt_state), jnp.arange(k))
        return losses[-1]

    times = {}
    for k in (k1, k2):
        f = jax.jit(functools.partial(chained, k=k))
        float(f(params, opt_state))  # compile + warm run
        t0 = time.perf_counter()
        loss = float(f(params, opt_state))  # host readback ends timing
        times[k] = time.perf_counter() - t0
        assert np.isfinite(loss)
    return (times[k2] - times[k1]) / (k2 - k1) * 1000
