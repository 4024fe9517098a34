"""Uniform model contract.

Every model in the zoo is a frozen dataclass (hashable -> usable as a jit
static argument) exposing:

  init(key) -> params                         parameter pytree
  apply(params, wav, train, rng) -> ModelOutput
  loss(output, labels) -> dict[str, scalar]   named loss terms

This replaces the reference's implicit contract — ``forward(x) ->
(log_probs, feats, emb)`` in train mode / ``log_probs`` in eval mode plus a
``model.loss(...)`` dict (``model/wav2vec2_linear_nll.py:139-192``,
``main.py:66-68``) — with one explicit, mode-free signature: ``apply`` always
returns the full ``ModelOutput`` and ``train`` only controls dropout/SSL
freezing, never the return type.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def cast_matmul_params(params: Params, dtype) -> Params:
    """Pre-cast matmul/conv weights (leaves keyed ``w``) to ``dtype``.

    Every linear/conv op casts its weight to the compute dtype inside the
    program anyway (``ops/layers.linear``), so for inference this is a pure
    no-op numerically — but done once on the host it removes the per-call
    converts of the stacked encoder weights, which XLA can hoist out of the
    layer scan but not out of the jit call (measured on v5e, XLS-R 300M at
    24x64600 bf16: 2.8 ms/forward just converting the fp32 fc1/fc2/attn
    stacks).  Layer-norm scales/biases and linear biases stay fp32: they
    enter fp32 arithmetic, where a bf16 round trip would lose precision.

    Training must NOT use this — the optimizer needs fp32 master weights.
    """
    dtype = jnp.dtype(dtype)

    def f(path, leaf):
        key = getattr(path[-1], "key", None) if path else None
        if key == "w" and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(f, params)


class ModelOutput(NamedTuple):
    log_probs: jnp.ndarray  # [N, num_classes] log-softmax outputs
    feats: jnp.ndarray  # [N, T, D] frame-level features (pre-activation)
    emb: jnp.ndarray  # [N, D] utterance embedding
    logits: Optional[jnp.ndarray] = None  # [N, num_classes] pre-softmax


def scores_from_log_probs(log_probs: jnp.ndarray) -> jnp.ndarray:
    """Bonafide detection score = log-prob of class 1 (reference
    ``main.py:193``: ``score = cm[1]``)."""
    return log_probs[..., 1]


def model_buffers(model) -> Params:
    """Initial non-trainable state (batch-norm running stats) of a model.

    Models with BN heads set ``has_buffers = True`` and implement
    ``init_buffers()``; ``apply(..., buffers=..., mutable=True)`` then returns
    ``(ModelOutput, new_buffers)``.  Stateless models get an empty pytree —
    jit folds it away, so one engine signature serves both.
    """
    if getattr(model, "has_buffers", False):
        return model.init_buffers()
    return {}


def eval_scores(model, out: ModelOutput) -> jnp.ndarray:
    """The two columns the reference writes to eval score files: log-probs
    for the NLL-head models, raw logits for the resnet/aasist heads (which
    apply no final log_softmax).  Models override via ``eval_scores``."""
    fn = getattr(model, "eval_scores", None)
    if fn is not None:
        return fn(out)
    return out.log_probs
