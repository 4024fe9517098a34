"""Training/eval engine — one jit-compiled step, sharded over the mesh.

Replaces the reference's per-batch Python loop (``main.py:47-118``): there,
each step moves one ``[1, T, 11]`` view-batch to the GPU, reshapes, runs
forward/backward and `.item()`s every loss.  Here a step takes a super-batch
of G anchor groups ``[G, V, T]`` sharded over the ``data`` mesh axis, runs
one fused forward over all G*V views, computes per-group SupCon (the
reference's loss unit) with ``vmap``, and lets XLA insert the gradient
all-reduce.  Metrics come back as a handful of scalars per step.

The engine drives epochs exactly like the reference (``main.py:402-423``):
per-epoch cyclic LR, dev-accuracy early stopping, checkpoint on new best.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scl_deepfake_audio_detection_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_params,
)
from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
from scl_deepfake_audio_detection_tpu.train.optim import (
    EarlyStop,
    cyclic_exp_lr,
    make_optimizer,
    set_learning_rate,
)
from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig


class MetricMean:
    """Streaming mean of per-step metric dicts.

    Values accumulate as device arrays; ``result()`` is the single
    device->host transfer per epoch (per-step ``float()`` would serialize
    the async dispatch queue — the reference's per-batch ``.item()`` stall,
    ``main.py:71-76``).  Shared by the engine epochs and the GAN trainer.
    """

    def __init__(self) -> None:
        self._agg: Dict[str, Any] = {}
        self._n = 0

    def add(self, metrics: Dict[str, Any]) -> None:
        for k, v in metrics.items():
            self._agg[k] = v if k not in self._agg else self._agg[k] + v
        self._n += 1

    def result(self) -> Dict[str, float]:
        return {k: float(v) / max(self._n, 1) for k, v in self._agg.items()}


def _loss_and_metrics(params, buffers, model, batch, rng, train, loss_scope: str):
    """batch: {'wav': [G, V, T], 'labels': [G, V]} -> (total, (metrics, buf)).

    BN-headed models normalize with statistics of the *global* logical batch
    (sync-BN): the stats reductions see globally-shaped arrays, so under data
    sharding XLA inserts the cross-replica all-reduce automatically.
    """
    wav, labels = batch["wav"], batch["labels"]
    g, v = wav.shape[0], wav.shape[1]
    out, new_buffers = model.apply(
        params, wav.reshape(g * v, -1), train=train, rng=rng,
        buffers=buffers, mutable=True,
    )

    if loss_scope == "global":
        terms = model.loss(out, labels.reshape(-1))
    else:  # per anchor-group (reference semantics at bs=1)
        out_g = jax.tree.map(lambda x: x.reshape(g, v, *x.shape[1:]), out)
        terms_g = jax.vmap(model.loss)(out_g, labels)
        terms = {k: jnp.mean(t) for k, t in terms_g.items()}

    total = sum(terms.values())
    pred = jnp.argmax(out.log_probs, axis=-1)
    acc = jnp.mean((pred == labels.reshape(-1).astype(pred.dtype)).astype(jnp.float32))
    metrics = {"loss": total, "accuracy": acc, **terms}
    return total, (metrics, new_buffers, out)


def _train_step(params, buffers, opt_state, batch, rng, *, model, optimizer, loss_scope):
    # the model output in aux is unused here, so XLA dead-code-eliminates it
    (_, (metrics, buffers, _)), grads = jax.value_and_grad(
        _loss_and_metrics, has_aux=True
    )(params, buffers, model, batch, rng, True, loss_scope)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: (p + u).astype(p.dtype), params, updates)
    return params, buffers, opt_state, metrics


def _eval_step(params, buffers, batch, *, model, loss_scope):
    _, (metrics, _, _) = _loss_and_metrics(
        params, buffers, model, batch, None, False, loss_scope
    )
    return metrics


def _eval_step_scored(params, buffers, batch, *, model, loss_scope):
    """Eval step that additionally returns the per-view bonafide score column
    (``--early_metric eer``): one forward serves both the loss metrics and
    the score material for the per-epoch dev EER."""
    from scl_deepfake_audio_detection_tpu.models.base import eval_scores

    _, (metrics, _, out) = _loss_and_metrics(
        params, buffers, model, batch, None, False, loss_scope
    )
    cols = eval_scores(model, out)
    # score convention matches train/scoring.py: cm[1] = bonafide column
    score = cols[:, 1] if cols.ndim == 2 else cols.reshape(-1)
    return metrics, score.astype(jnp.float32), batch["labels"].reshape(-1)


def _score_step(params, buffers, wav, *, model):
    from scl_deepfake_audio_detection_tpu.models.base import eval_scores
    from scl_deepfake_audio_detection_tpu.ops.layers import dewire_pcm16

    wav = dewire_pcm16(wav)  # PCM16 wire format (EvalLoader wire_dtype)
    out = model.apply(params, wav, train=False, buffers=buffers)
    # per-model score columns: log-probs for NLL heads, RAW logits for the
    # aasist/resnet heads (the reference writes their out_layer output
    # directly — log_softmax here would re-rank scores vs the reference)
    return eval_scores(model, out)


def _dev_eer_pct(scores: np.ndarray, labels: np.ndarray) -> float:
    """Dev EER in percent from per-view bonafide scores (label 1 = bonafide,
    0 = spoof — protocol convention, ``data/protocols.py``).  NaN when either
    class is absent (EER undefined — caller treats that as 'no signal')."""
    from scl_deepfake_audio_detection_tpu.train.metrics import compute_eer

    labels = np.asarray(labels).reshape(-1)
    scores = np.asarray(scores).reshape(-1)
    tgt = scores[labels == 1]
    non = scores[labels == 0]
    if tgt.size == 0 or non.size == 0:
        return float("nan")
    eer, _ = compute_eer(tgt, non)
    return float(eer) * 100.0


def _host_gather(x):
    """Device array -> host numpy, tolerating multi-process shardings (each
    process contributes its addressable dev shard; EER over the union is
    assembled by process_allgather only when the array isn't local)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental.multihost_utils import process_allgather

        return process_allgather(x, tiled=True)
    return np.asarray(x)


class Engine:
    """Owns the jitted steps, optimizer state, mesh placement, epoch loop."""

    def __init__(
        self,
        model,
        train_cfg: Optional[TrainConfig] = None,
        mesh=None,
    ):
        self.model = model
        self.cfg = train_cfg or TrainConfig()
        self.mesh = mesh if mesh is not None else make_mesh(self.cfg.mesh_shape)
        self.optimizer = make_optimizer(
            self.cfg.weight_decay,
            grad_clip_norm=getattr(self.cfg, "grad_clip_norm", None),
            grad_accum_steps=getattr(self.cfg, "grad_accum_steps", 1),
        )

        scope = self.cfg.loss_scope
        self.train_step = jax.jit(
            functools.partial(
                _train_step, model=model, optimizer=self.optimizer, loss_scope=scope
            ),
            donate_argnums=(0, 1, 2),
        )
        self.eval_step = jax.jit(
            functools.partial(_eval_step, model=model, loss_scope=scope)
        )
        # compiled lazily on first use (--early_metric eer only)
        self.eval_step_scored = jax.jit(
            functools.partial(_eval_step_scored, model=model, loss_scope=scope)
        )
        self.score_step = jax.jit(functools.partial(_score_step, model=model))

    # ----------------------------------------------------------- state setup
    def init_state(self, rng_key, params=None, buffers=None, with_opt=True):
        """-> (params, buffers, opt_state). ``buffers`` is the BN running-stat
        pytree ({} for stateless models) — replicated across the mesh.

        ``with_opt=False`` skips optimizer-state creation (opt_state None):
        forward-only modes (eval/serve/parity) would otherwise allocate
        AdamW moments — 2x param bytes of HBM — they never read."""
        from scl_deepfake_audio_detection_tpu.models.base import model_buffers

        # one compiled program for the whole init: eager init dispatches one
        # tiny RNG program per parameter (hundreds of device round trips —
        # minutes over a remote-tunneled chip)
        params = params if params is not None else jax.jit(self.model.init)(rng_key)
        params = shard_params(params, self.mesh)
        buffers = buffers if buffers is not None else model_buffers(self.model)
        buffers = shard_params(buffers, self.mesh)
        if not with_opt:
            return params, buffers, None
        opt_state = self.optimizer.init(params)
        if getattr(self.cfg, "zero1", False):
            from scl_deepfake_audio_detection_tpu.parallel.mesh import (
                _ZERO1_MIN_SIZE,
                shard_opt_state,
            )

            opt_state = shard_opt_state(
                opt_state,
                self.mesh,
                getattr(self.cfg, "zero1_min_size", _ZERO1_MIN_SIZE),
            )
        return params, buffers, opt_state

    def place_batch(self, batch):
        """Device-place the numeric fields; metadata (utt ids) never enters
        the jitted step."""
        numeric = {
            k: v for k, v in batch.items() if isinstance(v, (np.ndarray, jax.Array))
        }
        return shard_batch(numeric, self.mesh)

    # ---------------------------------------------------------------- epochs
    def run_epoch(
        self, params, buffers, opt_state, batches: Iterable[Dict[str, Any]], rng_key
    ) -> Tuple[Any, Any, Any, Dict[str, float]]:
        """One training epoch. ``batches`` yields {'wav': [G,V,T], 'labels':
        [G,V]} numpy arrays.

        Metric scalars accumulate as device arrays and transfer to host once
        per epoch — per-step ``float()`` would serialize the async dispatch
        queue on every batch (the reference's per-batch ``.item()`` calls,
        ``main.py:71-76``, are exactly that stall on GPU).
        """
        agg = MetricMean()
        for i, batch in enumerate(batches):
            step_rng = jax.random.fold_in(rng_key, i)
            params, buffers, opt_state, metrics = self.train_step(
                params, buffers, opt_state, self.place_batch(batch), step_rng
            )
            agg.add(metrics)
            if getattr(self.cfg, "check_numerics", False):
                bad = {k: float(v) for k, v in metrics.items()
                       if not np.isfinite(float(v))}
                if bad:
                    raise FloatingPointError(
                        f"non-finite metrics at step {i}: {bad} "
                        f"(utts={batch.get('utts') if isinstance(batch, dict) else None})"
                    )
        return params, buffers, opt_state, agg.result()

    def run_validation(
        self, params, buffers, batches: Iterable[Dict[str, Any]],
        collect_scores: bool = False,
    ):
        """Dev pass.  With ``collect_scores`` (--early_metric eer) the same
        forward also yields per-view bonafide scores + labels, returned as
        host arrays: ``(metrics, scores, labels)``."""
        agg = MetricMean()
        scores, labels = [], []
        for batch in batches:
            placed = self.place_batch(batch)
            if collect_scores:
                m, s, l = self.eval_step_scored(params, buffers, placed)
                agg.add(m)
                scores.append(s)
                labels.append(l)
            else:
                agg.add(self.eval_step(params, buffers, placed))
        if not collect_scores:
            return agg.result()
        if scores:  # _host_gather returns host numpy on both branches
            s = np.concatenate([_host_gather(x) for x in scores])
            l = np.concatenate([_host_gather(x) for x in labels])
        else:
            s = np.zeros(0, np.float32)
            l = np.zeros(0, np.float32)
        return agg.result(), s, l

    def fit(
        self,
        params,
        buffers,
        opt_state,
        train_batches: Callable[[], Iterable[Dict[str, Any]]],
        dev_batches: Callable[[], Iterable[Dict[str, Any]]],
        rng_key,
        save_dir: Optional[str] = None,
        log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
        tensorboard_dir: Optional[str] = None,
        profile_dir: Optional[str] = None,
        resume_best: Optional[float] = None,
        resume_counter: Optional[int] = None,
    ):
        """Full training run with per-epoch cyclic LR, early stop on dev
        accuracy (or dev EER with ``cfg.early_metric='eer'`` — the metric
        the eval protocol actually scores), best-checkpoint saving, JSONL
        metrics, optional tensorboard scalars and a first-epoch device
        profile (reference flow: ``main.py:397-423`` + tensorboardX scalars
        :407-414; the reference stops on val accuracy only, :400,418-421).
        """
        from scl_deepfake_audio_detection_tpu.train.tblog import (
            ScalarWriter,
            trace_epoch,
        )

        cfg = self.cfg
        es_metric = getattr(cfg, "early_metric", "acc")
        es_kw = dict(
            patience=int(getattr(cfg, "es_patience", 10)),
            delta=float(getattr(cfg, "es_delta", 0.01)),
        )
        if es_metric == "eer":
            # dev EER in percent, lower is better; init 100 means the first
            # measured epoch always sets the watermark
            stopper = EarlyStop(init_best=100.0, mode="min", **es_kw)
        else:
            stopper = EarlyStop(**es_kw)
        if resume_best is not None and stopper.is_better(
            float(resume_best), stopper.best
        ):
            # restore the checkpoint's watermark (direction-aware: an EER
            # watermark restores only if LOWER than the fresh init) so a
            # resumed run doesn't crown spurious 'best' epochs below the
            # real best
            stopper.best = float(resume_best)
        if resume_counter:
            # restore the patience counter too, so the resumed run stops at
            # exactly the epoch an uninterrupted run would (reference
            # EarlyStop state, ``main.py:23-45``); pre-counter checkpoints
            # resume with a fresh counter (None/0)
            stopper.counter = max(int(resume_counter), 0)
            if stopper.counter >= stopper.patience:
                # the interrupted run had ALREADY early-stopped (its last.ckpt
                # was written the same epoch the stop fired): resuming must
                # train zero further epochs, not strike once more first
                stopper.early_stop = True
                print("resume: EarlyStop patience already exhausted at save "
                      "time; nothing to train")
        ckpt_every = max(int(getattr(cfg, "ckpt_every", 1)), 1)
        writer = ckpt.AsyncWriter() if getattr(cfg, "async_ckpt", True) else None
        last_epoch = cfg.start_epoch + cfg.num_epochs - 1
        # checkpoint saves are collectives (sharded leaves all-gather inside
        # ckpt.save), so every process runs them; plain file writes (metrics
        # JSONL, tensorboard) happen on process 0 only
        proc0 = jax.process_index() == 0
        metrics_path = (
            os.path.join(save_dir, "metrics.jsonl") if save_dir and proc0 else None
        )
        if save_dir and proc0:
            os.makedirs(save_dir, exist_ok=True)
        tb = ScalarWriter(tensorboard_dir if proc0 else None)

        for epoch in range(cfg.start_epoch, cfg.start_epoch + cfg.num_epochs):
            if stopper.early_stop:  # pre-exhausted patience (resume path)
                break
            lr = cyclic_exp_lr(epoch, cfg.min_lr, cfg.max_lr)
            opt_state = set_learning_rate(opt_state, lr)
            t0 = time.time()
            epoch_rng = jax.random.fold_in(rng_key, epoch)
            with trace_epoch(profile_dir if epoch == cfg.start_epoch else None):
                params, buffers, opt_state, train_m = self.run_epoch(
                    params, buffers, opt_state, train_batches(), epoch_rng
                )
            val_eer = None
            if es_metric == "eer":
                val_m, dev_scores, dev_labels = self.run_validation(
                    params, buffers, dev_batches(), collect_scores=True
                )
                val_eer = _dev_eer_pct(dev_scores, dev_labels)
            else:
                val_m = self.run_validation(params, buffers, dev_batches())
            record = {
                "epoch": epoch,
                "lr": lr,
                "seconds": time.time() - t0,
                **{f"train_{k}": v for k, v in train_m.items()},
                **{f"val_{k}": v for k, v in val_m.items()},
            }
            if val_eer is not None:
                # a single-class dev shard has no EER; write JSON null, not
                # the bare NaN token (which strict parsers reject)
                record["val_eer"] = (
                    val_eer if np.isfinite(val_eer) else None
                )
            if metrics_path:
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(record) + "\n")
            tb.scalars(record, epoch)
            if log_fn:
                log_fn(epoch, record)

            if es_metric == "eer":
                # no dev trials (or single-class shard): no signal — same
                # never-stop-on-silence rule as the empty-val case below
                is_best = stopper(val_eer) if np.isfinite(val_eer) else False
            elif val_m:
                is_best = stopper(val_m.get("accuracy", 0.0) * 100.0)
            else:
                # no dev batches (e.g. a pod shard trimming a tiny dev list
                # to zero): no signal — never early-stop on silence, and
                # never crown a 'best' from it
                is_best = False
            if save_dir:
                # keep a resumable last state (the reference only saves above
                # its 90%-accuracy bar, main.py:43-45,400, and loses the run
                # otherwise) — on a --ckpt_every cadence, plus always at the
                # final/early-stop epoch; npz+disk writes overlap the next
                # epoch via AsyncWriter unless async_ckpt is off
                due = (
                    (epoch - cfg.start_epoch) % ckpt_every == ckpt_every - 1
                    or epoch == last_epoch
                    or stopper.early_stop
                )
                if due:
                    ckpt.save_train_state(
                        os.path.join(save_dir, "last.ckpt"),
                        params, opt_state, epoch, rng_key, stopper.best,
                        buffers=buffers, writer=writer,
                        es_counter=stopper.counter, es_metric=es_metric,
                    )
                if is_best:
                    ckpt.save_train_state(
                        os.path.join(save_dir, f"epoch_{epoch}.ckpt"),
                        params, opt_state, epoch, rng_key, stopper.best,
                        buffers=buffers, writer=writer,
                        es_counter=stopper.counter, es_metric=es_metric,
                    )
            if stopper.early_stop:
                break
        if writer is not None:
            writer.wait()
        tb.close()
        return params, buffers, opt_state
