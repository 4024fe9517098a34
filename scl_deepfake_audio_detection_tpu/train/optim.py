"""Optimizer + LR policy.

Matches the reference recipe (``main.py:339-341``): AdamW(lr=max_lr,
weight_decay=1e-4) with torch ``CyclicLR(mode='exp_range', gamma=0.85,
step_size_up=3)`` stepped once per *epoch*.  The schedule is reproduced in
closed form; because it advances per epoch (not per step), the train step
takes the learning rate as a plain scalar input — no retrace when it changes.
"""

from __future__ import annotations

import math
import jax.numpy as jnp
import optax


def cyclic_exp_lr(
    epoch: int,
    base_lr: float = 1e-8,
    max_lr: float = 1e-5,
    step_size: int = 3,
    gamma: float = 0.85,
) -> float:
    """torch.optim.lr_scheduler.CyclicLR 'exp_range' value at ``epoch``.

    lr = base + (max - base) * max(0, 1 - |x|) * gamma^epoch, with the
    standard triangular phase x over a 2*step_size cycle.
    """
    cycle = math.floor(1 + epoch / (2 * step_size))
    x = abs(epoch / step_size - 2 * cycle + 1)
    return base_lr + (max_lr - base_lr) * max(0.0, 1.0 - x) * (gamma**epoch)


def make_optimizer(
    weight_decay: float = 1e-4,
    grad_clip_norm: float | None = None,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with an externally supplied per-step learning rate.

    ``optax.adamw`` is driven through ``inject_hyperparams`` so the host can
    set the epoch's LR without recompiling the train step.  Optional
    global-norm gradient clipping and multi-step accumulation cover the NII
    trainer's --grad-clip-norm / --accumulate capabilities
    (``core_scripts/config_parse/arg_parse.py``).
    """
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, weight_decay=weight_decay
    )
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx


def _find_hyperparams(opt_state):
    """Locate the inject_hyperparams state inside possibly-wrapped opt state
    (clip chain and/or MultiSteps change the pytree nesting)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if hasattr(opt_state, "inner_opt_state"):  # optax.MultiSteps
        return _find_hyperparams(opt_state.inner_opt_state)
    if isinstance(opt_state, (tuple, list)):  # optax.chain
        for sub in opt_state:
            found = _find_hyperparams(sub)
            if found is not None:
                return found
        return None
    return None


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place on the opt state pytree."""
    hp = _find_hyperparams(opt_state)
    if hp is None:
        raise ValueError("no inject_hyperparams state found in optimizer state")
    hp.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


class EarlyStop:
    """Early stopping on a validation metric (reference ``main.py:23-45``):
    patience 10, delta 0.01, initial best 90.0; triggers a save callback on
    each new best.

    ``mode``: ``"max"`` is the reference's accuracy semantics (higher is
    better); ``"min"`` inverts the improvement direction for metrics like
    dev EER where lower is better (``--early_metric eer``), keeping the
    same patience/delta strike rules."""

    def __init__(self, patience: int = 10, delta: float = 0.01,
                 init_best: float = 90.0, mode: str = "max"):
        if mode not in ("max", "min"):
            raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")
        self.patience = patience
        self.delta = delta
        self.best = init_best
        self.mode = mode
        self.counter = 0
        self.early_stop = False

    def is_better(self, score: float, than: float) -> bool:
        """Direction-aware strict improvement beyond delta."""
        if self.mode == "min":
            return score < than - self.delta
        return score > than + self.delta

    def __call__(self, score: float) -> bool:
        """Returns True when ``score`` is a new best (caller should save)."""
        if self.is_better(score, self.best):
            self.best = score
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience:
            self.early_stop = True
        return False
