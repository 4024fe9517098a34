"""Pipeline parallelism for stacked layer params (GPipe-style, SPMD).

The reference has no model parallelism at all (``nn.DataParallel`` only,
``main.py:350-355``); this framework's default multi-chip layout is
data x tensor parallel (`parallel/mesh.py`) — the right choice at the 300M
scale, where every chip fits the whole encoder.  Pipeline parallelism is the
third axis a TPU-native framework needs for stacks that do NOT fit one chip
(or to scale past the TP efficiency knee): stage s holds layers
[s*L/S, (s+1)*L/S), microbatches stream through stages, and activations hop
stage->stage over ICI with ``lax.ppermute``.

Implementation is the SPMD "collective pipelining" formulation (as in the
public scaling-book recipe): one program runs on every stage under
``shard_map``; a ``lax.scan`` over M + S - 1 ticks advances the pipeline,
stage 0 ingesting microbatch t while stage S-1 emits microbatch t-(S-1).
Warmup/drain ticks compute garbage that is masked out of the result — the
standard bubble cost, fraction (S-1)/(M+S-1).

Differentiable end to end: ``ppermute`` has a transpose rule (the reverse
permutation), so ``jax.grad`` through ``pipeline_apply`` yields exactly the
1F1B-style backward schedule for free.

Used via ``pipeline_apply`` (handles the shard_map plumbing) or composed
manually; validated against the sequential ``lax.scan`` execution — values
and gradients — in ``tests/test_pipeline.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Carry = Any


def _stage_slices(stacked, num_stages: int):
    """[L, ...] leaves -> [S, L/S, ...] (leading stage axis to shard)."""

    def reshape(leaf):
        l = leaf.shape[0]
        if l % num_stages:
            raise ValueError(
                f"layer count {l} not divisible by {num_stages} stages"
            )
        return leaf.reshape(num_stages, l // num_stages, *leaf.shape[1:])

    return jax.tree.map(reshape, stacked)


def pipeline_apply(
    layer_fn: Callable[[Carry, Any], Carry],
    stacked,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    microbatches: Optional[int] = None,
    data_axis: Optional[str] = None,
):
    """Run ``x -> layer_fn(...layer_fn(x, L0)..., L_last)`` as a pipeline.

    layer_fn: (activation [mb, ...], one layer's param pytree) -> activation.
    stacked:  layer params with a leading L axis on every leaf (the same
              layout ``lax.scan`` consumes in ``models/xlsr.py``).
    x:        [B, ...] batch; split into ``microbatches`` chunks (default:
              one per stage, the minimum that keeps every stage busy).
    mesh:     must contain ``axis``; stage s = mesh position s along it.
    data_axis: optional second mesh axis to compose DATA parallelism with
              the pipeline (a dp x pp 2D layout): each data shard runs its
              own pipeline over its slice of every microbatch, params stay
              replicated over ``data_axis`` (their gradient psum over data
              falls out of the shard_map transpose), and the two collective
              families never mix — activations hop stages over ``axis``,
              grads reduce over ``data_axis``.

    Returns [B, ...], numerically equal to the sequential scan (same per-
    element op order — pipelining only reorders *which microbatch* a stage
    works on, never the math inside a layer).
    """
    num_stages = mesh.shape[axis]
    if num_stages == 1:  # degenerate: plain scan
        # match the pipelined path's dtype handling: a dtype-changing
        # layer_fn (fp32 wav into a bf16 stream) must not trip lax.scan's
        # carry-type check only when the pipe axis happens to be 1
        probe = jax.eval_shape(
            layer_fn,
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), stacked
            ),
        )
        return jax.lax.scan(
            lambda c, l: (layer_fn(c, l), None), x.astype(probe.dtype), stacked
        )[0]
    m = microbatches or num_stages
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    dsize = mesh.shape[data_axis] if data_axis is not None else 1
    if (b // m) % dsize:
        raise ValueError(
            f"microbatch size {b // m} not divisible by data axis "
            f"'{data_axis}' size {dsize}"
        )
    staged = _stage_slices(stacked, num_stages)
    xs = x.reshape(m, b // m, *x.shape[1:])

    # a layer stack is shape/dtype-stable layer-to-layer by construction, but
    # the *output* dtype may differ from the input's (e.g. fp32 wav into a
    # bf16 residual stream) — probe it so the carry/result buffers match.
    # Probe at the LOCAL microbatch shape (per data shard).
    probe = jax.eval_shape(
        layer_fn,
        jax.ShapeDtypeStruct((b // m // dsize, *x.shape[1:]), x.dtype),
        jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape[1:], a.dtype), stacked
        ),
    )

    # params: stage-sharded on the leading axis, replicated over data_axis;
    # input/output replicated over the pipe axis (each stage needs arbitrary
    # microbatches at warmup; B is small relative to params in the regimes
    # where pipelining matters) but sharded within-microbatch over data_axis
    pspec = jax.tree.map(lambda _: P(axis), staged)
    xspec = P(None, data_axis) if data_axis is not None else P()
    varying = (axis,) if data_axis is None else (axis, data_axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(pspec, xspec),
        out_specs=xspec,
    )
    def run(local_stage, xs):
        # local_stage leaves: [1, L/S, ...] (shard_map keeps the sharded
        # leading axis with size 1) -> drop it
        local_layers = jax.tree.map(lambda a: a[0], local_stage)
        stage = jax.lax.axis_index(axis)

        def stage_compute(act):
            return jax.lax.scan(
                lambda c, l: (layer_fn(c, l), None), act, local_layers
            )[0]

        fwd = [(i, (i + 1) % num_stages) for i in range(num_stages)]

        def tick(carry, t):
            state, ys = carry
            # stage 0 ingests microbatch t (clamped during drain ticks — the
            # extra compute is masked garbage), others take the handoff
            inp = jnp.where(
                stage == 0, xs[jnp.clip(t, 0, m - 1)].astype(state.dtype), state
            )
            out = stage_compute(inp)
            # stage S-1 finished microbatch t-(S-1) at this tick
            w = t - (num_stages - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                ys, out, jnp.clip(w, 0, m - 1), 0
            )
            ys = jnp.where((stage == num_stages - 1) & (w >= 0), upd, ys)
            state = jax.lax.ppermute(out, axis, fwd)
            return (state, ys), None

        # the carry varies per stage (each holds a different microbatch), so
        # mark the uniform zeros as axis-varying for shard_map's type system
        init = jax.lax.pcast(
            (
                jnp.zeros(probe.shape, probe.dtype),
                jnp.zeros((m, *probe.shape), probe.dtype),
            ),
            varying,
            to="varying",
        )
        (_, ys), _ = jax.lax.scan(
            tick, init, jnp.arange(m + num_stages - 1)
        )
        # result lives on the last stage; replicate it (out_specs=P() asserts
        # replication, so make it true with a masked psum)
        return jax.lax.psum(
            jnp.where(stage == num_stages - 1, ys, jnp.zeros_like(ys)), axis
        )

    ys = run(staged, xs)
    return ys.reshape(b, *probe.shape[1:])
