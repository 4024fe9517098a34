"""Teacher-student distillation trainer.

Turns the reference's dead-code distillation loss
(``model/loss_metrics.py:258-279``, ported as ``ops/losses.kld_distill``)
into a live training capability: compress the 315M XLSR+head countermeasure
into a small student for serving, where the eval path's throughput scales
inversely with student FLOPs.  The reference ships the loss but no trainer
that uses it; like the GAN/AL managers this is a library capability with no
YAML entry point.

TPU-native shape: ONE jitted donated step computes the frozen teacher
forward (eval mode, ``stop_gradient``), the student forward, and the
CE+KLD(+embedding) update — teacher params are step ARGUMENTS (never closed
over: constant-folding 1.2 GB into the HLO hangs remote compiles, see
CLAUDE.md) so the same compiled program serves any teacher checkpoint.
Under data sharding both forwards ride the mesh; no extra collectives
beyond the grad psum.

Loss: ``alpha * L_CE(student, labels) + (1 - alpha) * KLD(teacher->student)``
(the standard Hinton composition around the reference's KLD form), plus an
optional cosine embedding-matching term when the student's emb width matches
the teacher's.  Models return log-softmax outputs; feeding them to the
temperature KLD is exact because ``log_softmax(log_probs / T) ==
log_softmax(logits / T)`` (a per-row constant shift cancels) — pinned by
test.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scl_deepfake_audio_detection_tpu.ops.losses import kld_distill
from scl_deepfake_audio_detection_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_params,
)
from scl_deepfake_audio_detection_tpu.train.engine import MetricMean
from scl_deepfake_audio_detection_tpu.train.optim import make_optimizer


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    temperature: float = 20.0       # reference kld default (loss_metrics.py:263)
    alpha: float = 0.5              # CE weight; (1 - alpha) weighs the KLD
    emb_loss_weight: float = 0.0    # cosine embedding match (0 = off)
    weight_decay: float = 1e-4
    grad_clip_norm: Optional[float] = None


def _cosine_emb_loss(emb_s: jnp.ndarray, emb_t: jnp.ndarray) -> jnp.ndarray:
    """1 - mean cosine similarity between student/teacher embeddings."""
    s = emb_s / jnp.maximum(jnp.linalg.norm(emb_s, axis=-1, keepdims=True), 1e-8)
    t = emb_t / jnp.maximum(jnp.linalg.norm(emb_t, axis=-1, keepdims=True), 1e-8)
    return 1.0 - jnp.mean(jnp.sum(s * t, axis=-1))


def _distill_loss(
    student_params,
    teacher_params,
    teacher_buffers,
    batch,
    rng,
    *,
    student,
    teacher,
    cfg: DistillConfig,
):
    wav = batch["wav"]
    # labels arrive float32 (engine/datasets convention) — indexable ints here
    labels = batch["labels"].reshape(-1).astype(jnp.int32)
    if wav.ndim == 3:  # [G, V, T] view batches flatten like the engine
        wav = wav.reshape(-1, wav.shape[-1])

    if teacher_buffers:
        t_out = teacher.apply(
            teacher_params, wav, train=False, buffers=teacher_buffers
        )
    else:
        t_out = teacher.apply(teacher_params, wav, train=False)
    t_logp = jax.lax.stop_gradient(t_out.log_probs)
    s_out = student.apply(student_params, wav, train=True, rng=rng)

    ce = -jnp.mean(
        jnp.take_along_axis(s_out.log_probs, labels[:, None], axis=-1)
    )
    kld = kld_distill(s_out.log_probs, t_logp, temp=cfg.temperature)
    total = cfg.alpha * ce + (1.0 - cfg.alpha) * kld
    metrics = {"loss_ce": ce, "loss_kld": kld}
    if cfg.emb_loss_weight > 0.0:
        emb_l = _cosine_emb_loss(s_out.emb, jax.lax.stop_gradient(t_out.emb))
        total = total + cfg.emb_loss_weight * emb_l
        metrics["loss_emb"] = emb_l

    pred = jnp.argmax(s_out.log_probs, axis=-1)
    t_pred = jnp.argmax(t_logp, axis=-1)
    metrics.update(
        loss=total,
        accuracy=jnp.mean((pred == labels.astype(pred.dtype)).astype(jnp.float32)),
        teacher_agreement=jnp.mean((pred == t_pred).astype(jnp.float32)),
    )
    return total, metrics


def _distill_step(
    student_params, opt_state, teacher_params, teacher_buffers, batch, rng,
    *, student, teacher, optimizer, cfg,
):
    (_, metrics), grads = jax.value_and_grad(_distill_loss, has_aux=True)(
        student_params, teacher_params, teacher_buffers, batch, rng,
        student=student, teacher=teacher, cfg=cfg,
    )
    updates, opt_state = optimizer.update(grads, opt_state, student_params)
    student_params = jax.tree.map(
        lambda p, u: (p + u).astype(p.dtype), student_params, updates
    )
    return student_params, opt_state, metrics


class DistillEngine:
    """Owns the jitted distillation step and the epoch loop.

    The student is any registered model (``models/base.py`` contract); the
    teacher is typically the full XLSR+head loaded from a checkpoint via
    ``train.checkpoint`` or converted with ``--parity_check`` tooling.
    """

    def __init__(
        self,
        teacher,
        student,
        cfg: Optional[DistillConfig] = None,
        mesh=None,
    ):
        from scl_deepfake_audio_detection_tpu.models.base import model_buffers

        self.teacher = teacher
        self.student = student
        self.cfg = cfg or DistillConfig()
        if not (0.0 <= self.cfg.alpha <= 1.0):
            raise ValueError(f"alpha must be in [0, 1], got {self.cfg.alpha}")
        if model_buffers(student):
            # a BN student needs mutable running stats threaded through the
            # step (engine semantics) — not wired here; distill to a
            # stateless head (linear_nll / btse) or use Engine for BN heads
            raise ValueError(
                "DistillEngine supports stateless students only; "
                f"{type(student).__name__} carries BN buffers"
            )
        self.mesh = mesh if mesh is not None else make_mesh()
        self.optimizer = make_optimizer(
            self.cfg.weight_decay, grad_clip_norm=self.cfg.grad_clip_norm
        )
        # donate student params/opt (updated in place); teacher params are a
        # read-only argument shared across steps
        self.step = jax.jit(
            functools.partial(
                _distill_step,
                student=student,
                teacher=teacher,
                optimizer=self.optimizer,
                cfg=self.cfg,
            ),
            donate_argnums=(0, 1),
        )

    def init_state(self, rng_key, teacher_params, student_params=None,
                   teacher_buffers=None):
        """-> (student_params, opt_state, teacher_params, teacher_buffers)
        placed on the mesh.  ``teacher_buffers`` carries a BN teacher's
        running stats (read-only at eval); {} for stateless teachers."""
        from scl_deepfake_audio_detection_tpu.models.base import model_buffers

        if student_params is None:
            student_params = jax.jit(self.student.init)(rng_key)
        student_params = shard_params(student_params, self.mesh)
        teacher_params = shard_params(teacher_params, self.mesh)
        if teacher_buffers is None:
            teacher_buffers = model_buffers(self.teacher)
        teacher_buffers = shard_params(teacher_buffers, self.mesh)
        return (student_params, self.optimizer.init(student_params),
                teacher_params, teacher_buffers)

    def run_epoch(
        self,
        student_params,
        opt_state,
        teacher_params,
        batches: Iterable[Dict[str, Any]],
        rng_key,
        teacher_buffers=None,
    ) -> Tuple[Any, Any, Dict[str, float]]:
        """One pass; batches yield {'wav': [N, T] or [G, V, T], 'labels'}."""
        agg = MetricMean()
        if teacher_buffers is None:
            teacher_buffers = {}
        for i, batch in enumerate(batches):
            numeric = {
                k: v for k, v in batch.items()
                if isinstance(v, (np.ndarray, jax.Array))
            }
            placed = shard_batch(numeric, self.mesh)
            student_params, opt_state, metrics = self.step(
                student_params, opt_state, teacher_params, teacher_buffers,
                placed, jax.random.fold_in(rng_key, i),
            )
            agg.add(metrics)
        return student_params, opt_state, agg.result()
