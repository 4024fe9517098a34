"""Device mesh + sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel``
scatter/gather (``main.py:350-355``).  Here parallelism is jit-native: a
``jax.sharding.Mesh`` with axes ``('data', 'model')``:

- **data**: anchor groups shard across devices; each device computes its
  groups' SupCon locally (matching the reference's per-group loss unit) and
  XLA inserts the gradient ``psum`` over ICI from the sharding annotations.
- **model**: optional tensor parallelism inside the XLS-R encoder — attention
  heads and FFN hidden dim sharded, so q/k/v/fc1 are column-parallel and
  o/fc2 row-parallel; XLA's SPMD partitioner places the (two per layer)
  all-reduces on ICI.

Rules are expressed as path-pattern -> PartitionSpec over the param pytree.
Everything composes with ``jax.jit(in_shardings=..., out_shardings=...)`` —
no hand-written collectives on the training path.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on the data axis.

    The data axis is placed on the outer (slower/DCN-crossing) dimension and
    model on the inner so tensor-parallel collectives ride contiguous ICI
    neighbors.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


# --- parameter sharding rules ------------------------------------------------
# Matched against '/'-joined param paths. Encoder layer weights carry a
# leading stacked-layer axis (lax.scan), hence the None prefix on their specs.
_RULES: Tuple[Tuple[str, P], ...] = (
    # attention: q/k/v column-parallel (heads split), o row-parallel
    (r"encoder/layers/attn/(q|k|v)/w$", P(None, None, "model")),
    (r"encoder/layers/attn/(q|k|v)/b$", P(None, "model")),
    (r"encoder/layers/attn/o/w$", P(None, "model", None)),
    (r"encoder/layers/attn/o/b$", P(None)),
    # FFN: fc1 column-parallel, fc2 row-parallel
    (r"encoder/layers/fc1/w$", P(None, None, "model")),
    (r"encoder/layers/fc1/b$", P(None, "model")),
    (r"encoder/layers/fc2/w$", P(None, "model", None)),
    (r"encoder/layers/fc2/b$", P(None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspecs(params) -> "jax.tree_util.PyTreeDef":
    """PartitionSpec pytree for a model param tree (everything not matched by
    a tensor-parallel rule is replicated)."""

    def spec_for(path, leaf):
        s = _path_str(path)
        for pat, spec in _RULES:
            if re.search(pat, s):
                if len(spec) == leaf.ndim:
                    return spec
                # non-stacked variant (e.g. a single unstacked layer)
                trimmed = P(*spec[1:])
                if len(trimmed) == leaf.ndim:
                    return trimmed
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


_cluster_synced = False


def _sync_cluster_once(mesh: Mesh) -> None:
    """Absorb multi-process startup skew before the FIRST cross-process
    placement.

    Between ``jax.distributed.initialize`` and the first collective, every
    process independently imports model code, builds loaders and compiles —
    tens of seconds each, and on busy hosts the spread between the fastest
    and slowest process can exceed the CPU collectives backend's fixed ~30 s
    rendezvous timeout ("Gloo context initialization failed:
    DEADLINE_EXCEEDED", observed on the 4-process cluster test under load).
    A coordination-service barrier has a *configurable* deadline, so meeting
    there once lets the skewed processes re-lockstep before any collective
    rendezvous starts.  No-op on single-process runs and process-local
    meshes (multihost eval shards onto per-host meshes and never crosses
    processes)."""
    global _cluster_synced
    if _cluster_synced or jax.process_count() == 1:
        return
    pidx = jax.process_index()
    if all(d.process_index == pidx for d in mesh.devices.flat):
        return  # process-local mesh: no cross-process rendezvous follows
    _cluster_synced = True
    try:  # private API; best-effort skew absorber, never load-bearing
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            # own knob (falls back to the shutdown-barrier setting, then
            # 900 s): an operator shortening SCL_SHUTDOWN_TIMEOUT_S for
            # fail-fast crash handling must not silently shrink the
            # startup-skew window this barrier exists to widen
            timeout_s = int(os.environ.get(
                "SCL_STARTUP_BARRIER_TIMEOUT_S",
                os.environ.get("SCL_SHUTDOWN_TIMEOUT_S", "900"),
            ))
            client.wait_at_barrier(
                "scl_first_collective", timeout_in_ms=timeout_s * 1000
            )
    except Exception:
        pass


def shard_params(params, mesh: Mesh):
    """Place params on the mesh per the TP rules (no-op layout-wise on a
    1-device mesh, but establishes the shardings jit propagates from)."""
    _sync_cluster_once(mesh)
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_pspec(ndim: int) -> P:
    """Batch arrays shard on the leading (anchor-group) axis."""
    return P("data", *([None] * (ndim - 1)))


# --- ZeRO-1 optimizer-state sharding ----------------------------------------

_ZERO1_MIN_SIZE = 1 << 16  # below this a leaf stays replicated (bias vectors,
# counts, injected hyperparams — sharding them buys nothing and costs layout)


def zero1_pspec(leaf, data_size: int, min_size: int = _ZERO1_MIN_SIZE) -> P:
    """PartitionSpec sharding ``leaf``'s largest divisible free axis over
    'data', composed with any existing sharding.

    ZeRO stage 1: the AdamW first/second-moment pytrees mirror the params,
    which are *replicated* over the data axis — so each chip can own 1/N of
    the moments, do 1/N of the update math, and let XLA all-gather the
    updates once per step (the gather rides ICI and is overlapped with the
    next layer's math by the scheduler).  Cuts optimizer memory from 2x
    params to 2x/N params per chip at the 300M scale.

    Leaves already tensor-parallel over 'model' (moments inherit the param
    sharding from ``optimizer.init``) keep that axis; the 'data' shard goes
    on a *different* axis when one divides, so the two shardings compose.
    """
    prior = (
        tuple(leaf.sharding.spec) + (None,) * (leaf.ndim - len(leaf.sharding.spec))
        if isinstance(getattr(leaf, "sharding", None), NamedSharding)
        else (None,) * getattr(leaf, "ndim", 0)
    )
    if not hasattr(leaf, "ndim") or leaf.ndim == 0 or leaf.size < min_size:
        return P(*prior) if any(a is not None for a in prior) else P()
    axes = list(prior)
    # largest still-unsharded axis divisible by the data-axis size wins
    order = sorted(range(leaf.ndim), key=lambda i: -leaf.shape[i])
    for i in order:
        if axes[i] is None and leaf.shape[i] % data_size == 0:
            axes[i] = "data"
            return P(*axes)
    return P(*axes) if any(a is not None for a in axes) else P()


def shard_opt_state(opt_state, mesh: Mesh, min_size: int = _ZERO1_MIN_SIZE):
    """Place an optax opt-state pytree with ZeRO-1 shardings (moments sharded
    over 'data', scalars/hyperparams replicated).  No-op on a 1-wide data
    axis.  The training trajectory is preserved — AdamW is elementwise, so
    partitioned update math + update all-gather computes the replicated
    result up to fp32 reduction-order rounding in the re-fused backward
    (pinned by tests/test_engine.py's parity test)."""
    data_size = mesh.shape.get("data", 1)
    if data_size == 1:
        # nothing to shard over — keep whatever placement optimizer.init
        # gave the moments (they inherit the params' TP sharding)
        return opt_state
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, zero1_pspec(x, data_size, min_size))
        )
        if hasattr(x, "ndim")
        else x,
        opt_state,
    )


def _local_data_axis_size(mesh: Mesh) -> int:
    """Number of 'data'-axis coordinates owned by this process — the
    divisibility unit for per-process batch slices on a cross-process mesh."""
    if "data" not in mesh.axis_names:
        return 1
    axis = mesh.axis_names.index("data")
    me = jax.process_index()
    return sum(
        1
        for i in range(mesh.devices.shape[axis])
        if any(
            d.process_index == me
            for d in np.take(mesh.devices, i, axis=axis).flat
        )
    )


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, leading axis over 'data'.

    Arrays whose leading dim doesn't divide the data-axis size are
    replicated instead — e.g. the reference's default ``batch_size=1`` on a
    multi-device host trains without data parallelism rather than erroring
    (one group is one loss unit; it can't split).

    Multi-host: when the mesh spans processes (a TPU pod — each process sees
    only its addressable chips), every process passes its *local* shard of
    the batch (disjoint loader streams, ``data/loader.py`` shard_index) and
    the global array is assembled with
    ``jax.make_array_from_process_local_data``.
    """
    _sync_cluster_once(mesh)
    data_size = mesh.shape.get("data", 1)
    # A mesh made only of this process's devices (e.g. the --multihost eval
    # path builds a per-process local mesh, cli.py) behaves exactly like the
    # single-process case: data_size is already the local device count and
    # plain device_put is correct.  Only a mesh that actually spans processes
    # needs the local-slice assembly below.
    spans_processes = any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )

    def place(x):
        if not hasattr(x, "ndim"):  # utt-id lists ride along untouched
            return x
        if spans_processes:
            # local leading dim must divide this process's slice of the data
            # axis — derived from the mesh itself, not process_count(), so
            # unevenly-spread meshes get the right requirement and message;
            # global shape is inferred from the sharding
            local_data = max(1, _local_data_axis_size(mesh))
            if x.ndim > 0 and x.shape[0] % local_data == 0:
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, batch_pspec(x.ndim)), x
                )
            # replication is NOT a safe fallback here: each process holds a
            # different loader shard, so "replicating" would hand every host
            # different data under the same global array -> silent divergence
            raise ValueError(
                f"multi-host batch leading dim {x.shape[:1]} must be a "
                f"multiple of the per-process data-axis slice ({local_data}); "
                "adjust --groups_per_step / batch size"
            )
        divisible = x.ndim > 0 and x.shape[0] % data_size == 0
        spec = batch_pspec(x.ndim) if divisible else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, batch)
