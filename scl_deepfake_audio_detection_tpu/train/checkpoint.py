"""Checkpointing.

The reference saves bare ``state_dict`` files on each new validation best
(``main.py:43-45``) and resumes with prefix-stripping (``main.py:344-349``);
full-state checkpoints (optimizer/monitor/scheduler) exist only in its
vendored-unused NII trainer (``core_scripts/nn_manager/nn_manager.py:483-497``).

Here one checkpointer covers both capabilities: an atomic, dependency-light
format that saves the *full* train state (params, optimizer state, epoch, RNG
key) or params-only.  Arrays go in a single ``.npz`` (fast, mmap-able); tree
structure and scalars in a ``.json`` sidecar keyed by flattened paths, so
checkpoints are portable and diffable.  Also loads reference ``.pth`` files
via the torch pickle reader + ``models/convert.py`` for migration.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SEP = "//"


def _flatten(tree) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = leaf
    return flat


def _set_deep(d: dict, keys, value):
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


def _unflatten_dicts(flat: Dict[str, Any]):
    """Rebuild as nested dicts/lists. Integer path components become list
    indices when contiguous from 0."""
    nested: dict = {}
    for key, v in flat.items():
        _set_deep(nested, key.split(_SEP), v)

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        keys = list(node)
        if keys and all(k.isdigit() for k in keys):
            idx = sorted(int(k) for k in keys)
            if idx == list(range(len(idx))):
                return [node[str(i)] for i in idx]
        return node

    return listify(nested)


def _to_host(v) -> np.ndarray:
    """Device -> host, multi-process-safe.  ZeRO-1 shards the optimizer
    moments across processes on a pod, so a leaf may not be fully
    addressable here; gather it collectively (every process must reach this
    call — ``save`` is a collective in multi-process runs, with only process
    0 touching the filesystem).  Single process: plain np.asarray."""
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        from jax.experimental import multihost_utils

        v = multihost_utils.process_allgather(v, tiled=True)
    return np.asarray(v)


def _gather_flat(tree) -> Dict[str, np.ndarray]:
    """Snapshot a pytree to host numpy (collective for non-addressable
    leaves — every process must call this)."""
    return {k: _to_host(v) for k, v in _flatten(tree).items()}


_META_KEY = "__scl_meta__"


def _write_flat(path: str, flat: Dict[str, np.ndarray],
                extra: Optional[Dict[str, Any]]) -> None:
    """Atomic npz write (process-0 filesystem work only).

    The metadata rides INSIDE the npz (a 0-d unicode array under
    ``_META_KEY``) so arrays+meta commit in ONE os.replace — a crash between
    two file writes can never pair new arrays with a stale epoch/best.  The
    ``.json`` sidecar is still written (afterwards, atomically) as the
    human-readable convenience copy; ``load`` prefers the embedded meta."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    meta = {"keys": sorted(flat), "extra": extra or {}}
    meta_json = json.dumps(meta)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d)
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat, **{_META_KEY: np.asarray(meta_json)})
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    fd, tmp = tempfile.mkstemp(dir=d)
    try:
        with os.fdopen(fd, "w") as f:
            f.write(meta_json)
        os.replace(tmp, path + ".json")
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save(path: str, tree, extra: Optional[Dict[str, Any]] = None) -> None:
    """Atomically save a pytree of arrays (+ JSON-able ``extra`` metadata).

    Multi-process: COLLECTIVE — call from EVERY process (sharded leaves are
    all-gathered via process_allgather); only process 0 writes the files.
    Gating the call to process 0 alone deadlocks the pod: process 0 waits
    in the gather forever while the peers never enter it.  ``Engine.fit``
    and the CLI already call it from all processes."""
    flat = _gather_flat(tree)
    if jax.process_index() != 0:
        return
    _write_flat(path, flat, extra)


def load(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load (tree, extra). Arrays come back as numpy (device placement is the
    caller's concern — e.g. ``parallel.shard_params``)."""
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    extra = {}
    embedded = flat.pop(_META_KEY, None)
    if embedded is not None:
        # embedded meta committed atomically with the arrays — authoritative
        extra = json.loads(str(embedded)).get("extra", {})
    else:  # pre-embed checkpoints: fall back to the sidecar
        meta_path = path + ".json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                extra = json.load(f).get("extra", {})
    return _unflatten_dicts(flat), extra


def average_checkpoints(paths, out_path: Optional[str] = None):
    """Leaf-wise checkpoint averaging (SWA-style final model).

    Averaging the last-K epoch checkpoints is a standard cheap final-model
    trick the reference has no counterpart for (its EarlyStop keeps single
    ``epoch_{n}.pth`` files, ``main.py:43-45``).  Works on this framework's
    ``.ckpt`` files — params-only or full train state; optimizer moments and
    the RNG key are dropped (an averaged Adam state is meaningless), so the
    result is a params(+buffers) checkpoint for ``--model_path`` eval/serve/
    export.

    Float leaves average in float64 and cast back to the first checkpoint's
    dtype (BN running stats average too — the SWA recipe); integer leaves
    (e.g. step counters) take the first checkpoint's value.  Key sets and
    shapes must match across checkpoints.

    Returns ``(flat_arrays, extra)``; with ``out_path`` also writes the
    averaged checkpoint atomically.
    """
    if len(paths) < 2:
        raise ValueError("--average_ckpts needs at least two checkpoints")

    def _keep(k: str) -> bool:
        return k != _META_KEY and k != "rng_key" \
            and not k.startswith("opt_state_leaves")

    flats = []
    for p in paths:
        with np.load(p, allow_pickle=False) as z:
            flats.append({k: z[k] for k in z.files if _keep(k)})
    base = flats[0]
    for p, f in zip(paths[1:], flats[1:]):
        if set(f) != set(base):
            missing = set(base) ^ set(f)
            raise ValueError(
                f"{p} has a different key set than {paths[0]} "
                f"(differs on e.g. {sorted(missing)[:3]})"
            )
        for k in base:
            if f[k].shape != base[k].shape:
                raise ValueError(
                    f"shape mismatch at {k}: {paths[0]} {base[k].shape} "
                    f"vs {p} {f[k].shape}"
                )
    avg: Dict[str, np.ndarray] = {}
    for k in base:
        if np.issubdtype(base[k].dtype, np.floating):
            acc = np.zeros(base[k].shape, np.float64)
            for f in flats:
                acc += np.asarray(f[k], np.float64)
            avg[k] = (acc / len(flats)).astype(base[k].dtype)
        else:
            avg[k] = base[k]
    extra = {"averaged_from": [os.path.abspath(p) for p in paths]}
    if out_path:
        _write_flat(out_path, avg, extra)
    return avg, extra


def pack_opt_leaves(opt_state) -> dict:
    """Positional leaf packing for optimizer state: optax states are nested
    namedtuples whose *structure* the optimizer definition recreates at load
    time, so only the leaf values need saving (restored by zip order in
    ``load_train_state``).  Shared with the GAN trainer's joint checkpoint."""
    return {str(i): l for i, l in enumerate(jax.tree.leaves(opt_state))}


def save_train_state(
    path: str, params, opt_state, epoch: int, rng_key, best: float,
    buffers=None, writer: "Optional[AsyncWriter]" = None,
    es_counter: int = 0, es_metric: str = "acc",
) -> None:
    """Full-state checkpoint: everything needed for exact resume (params,
    optimizer, BN running-stat buffers, epoch, RNG).

    ``es_metric``: which metric the ``best`` watermark tracks ('acc' or
    'eer') — a resume under a different ``--early_metric`` must not reuse
    the watermark (the directions differ), so the loader checks this tag.

    ``es_counter``: the EarlyStop patience counter at save time — persisted
    so a resumed run stops at exactly the epoch an uninterrupted run would
    (reference EarlyStop state, ``main.py:23-45``; without it a resume could
    train up to ``patience`` epochs longer).

    ``writer``: optional ``AsyncWriter`` — the device->host gather still runs
    here synchronously (collective order; donated device buffers), but the
    npz serialization + disk write is handed to its background thread."""
    state = {
        "params": params,
        "opt_state_leaves": pack_opt_leaves(opt_state),
        "rng": jax.random.key_data(rng_key),
    }
    if buffers:
        state["buffers"] = buffers
    extra = {"epoch": epoch, "best": best, "es_counter": int(es_counter),
             "es_metric": str(es_metric)}
    if writer is None:
        save(path, state, extra=extra)
    else:
        writer.submit(path, _gather_flat(state), extra)


class AsyncWriter:
    """Overlaps checkpoint FILE WRITES with the next epoch's compute.

    The caller still gathers leaves to host synchronously (the jitted train
    step donates its input buffers, so the snapshot must complete before the
    next step reuses them; ZeRO-1 all-gathers are collectives that must stay
    in program order across processes).  Serialization + disk IO — the part
    that is pure host work — runs on one background thread; at most one
    write is in flight, and a failed write re-raises on the next submit/wait
    so errors are never silently dropped.  Non-zero processes no-op (only
    process 0 owns the filesystem)."""

    def __init__(self):
        self._thread = None
        self._error: Optional[BaseException] = None

    def submit(self, path: str, flat: Dict[str, np.ndarray],
               extra: Optional[Dict[str, Any]]) -> None:
        if jax.process_index() != 0:
            return
        self.wait()
        import threading

        def run():
            try:
                _write_flat(path, flat, extra)
            except BaseException as e:  # surfaced on next submit/wait
                self._error = e

        self._thread = threading.Thread(
            target=run, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        """Join the in-flight write (call at end of training / before
        reading the file back); re-raises any writer failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def load_train_state(path: str, opt_state_template):
    """Restore (params, buffers, opt_state, epoch, rng_key, best) using a
    freshly initialized opt state as the structure template."""
    tree, extra = load(path)
    leaves_dict = tree["opt_state_leaves"]
    if isinstance(leaves_dict, list):  # contiguous digit keys listify on load
        leaves = leaves_dict
    else:
        leaves = [leaves_dict[str(i)] for i in range(len(leaves_dict))]
    treedef = jax.tree.structure(opt_state_template)
    opt_state = jax.tree.unflatten(treedef, leaves)

    # re-establish the template's device placement: the unflattened leaves
    # are raw host numpy, so a ZeRO-1-sharded template (Engine.init_state)
    # would silently resume with replicated AdamW moments — 2x params per
    # chip instead of 2x/N — and on a multi-process mesh the first step
    # would reject the host-local arrays outright
    def _placed_like(tmpl, loaded):
        # Re-place ONLY mesh-sharded leaves (NamedSharding — what ZeRO-1 /
        # shard_opt_state produce).  Committing every leaf to its template's
        # placement would pin eagerly-created scalars (optax's ``count``) to
        # SingleDeviceSharding(device 0), which then CONFLICTS with the
        # mesh-replicated params at the first resumed train step on any
        # multi-device mesh.  Host numpy stays uncommitted and adapts.
        if isinstance(tmpl, jax.Array) and isinstance(
            getattr(tmpl, "sharding", None), jax.sharding.NamedSharding
        ):
            return jax.device_put(loaded, tmpl.sharding)
        return loaded

    opt_state = jax.tree.map(_placed_like, opt_state_template, opt_state)
    rng = jax.random.wrap_key_data(jnp.asarray(tree["rng"]))
    return (
        tree["params"],
        tree.get("buffers", {}),
        opt_state,
        int(extra["epoch"]),
        rng,
        float(extra["best"]),
    )


def load_pretrained_partially(params, pretrained, subtrees=None):
    """Overlay matching subtrees of a pretrained param pytree onto ``params``
    (capability match for NII ``f_load_pretrained_model_partially``,
    ``core_scripts/nn_manager/nn_manager_tools.py:214``).

    ``subtrees``: top-level keys to take from ``pretrained`` (default: every
    key present in both).  Leaf shapes must match; mismatches raise with the
    offending path.
    """
    import copy

    out = copy.copy(params)
    keys = subtrees if subtrees is not None else [
        k for k in pretrained if k in params
    ]
    for k in keys:
        ref_leaves = jax.tree_util.tree_leaves_with_path(params[k])
        new_leaves = {
            jax.tree_util.keystr(p): l
            for p, l in jax.tree_util.tree_leaves_with_path(pretrained[k])
        }
        for p, leaf in ref_leaves:
            ks = jax.tree_util.keystr(p)
            if ks not in new_leaves:
                raise KeyError(f"pretrained tree missing {k}{ks}")
            if tuple(np.shape(new_leaves[ks])) != tuple(np.shape(leaf)):
                raise ValueError(
                    f"shape mismatch at {k}{ks}: "
                    f"{np.shape(new_leaves[ks])} vs {np.shape(leaf)}"
                )
        out[k] = jax.tree.map(jnp.asarray, pretrained[k])
    return out


def load_reference_head_checkpoint(path: str):
    """Read a reference ``epoch_N.pth`` (torch state_dict) and return it as a
    flat numpy dict with ``module.``/``_orig_mod.`` prefixes stripped, the way
    ``main.py:346-348`` does before loading."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "").replace("_orig_mod.", "")
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out
