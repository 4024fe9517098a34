"""Graph-attention ops for the AASIST back-end.

Functional JAX equivalents of the reference's graph modules
(``model/wav2vec2_aasist.py``): plain graph attention over one node set
(``GraphAttentionLayer`` :62-155), heterogeneous two-type graph attention
with a master node (``HtrgGraphAttentionLayer`` :158-333), and score-based
top-k graph pooling (``GraphPool`` :336-372).

TPU-first notes:
- the pairwise node-product attention map is one einsum over a static
  [B, N, N, D] tensor (N <= ~70 after pooling — tiny), so XLA fuses the
  tanh/linear/softmax chain into the surrounding matmuls;
- top-k pooling uses ``jax.lax.top_k`` with *static* k — node counts are
  compile-time constants derived from the fixed input length, so shapes
  stay static through every pooling stage;
- batch norm follows the framework's buffers convention
  (``ops.layers.batch_norm``): flattened over (batch*node, dim), exactly
  the reference's view(-1, D) BN (:148-154).

Faithfully kept quirk: the reference softmax-normalizes attention over
``dim=-2`` — the *output* node index — then contracts over the input index
(:131-141), i.e. column-stochastic weights.  Reproduced bit-for-bit; do not
"fix" to row-stochastic.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.ops.layers import (
    batch_norm,
    dropout,
    init_batch_norm,
    init_bn_buffers,
    init_linear,
    selu,
)

Params = Dict[str, Any]


def _xavier_vec(key, dim: int) -> jnp.ndarray:
    """Xavier-normal [dim, 1] attention weight (reference :151-155)."""
    std = math.sqrt(2.0 / (dim + 1))
    return std * jax.random.normal(key, (dim, 1), jnp.float32)


# ---------------------------------------------------------------------------
# plain graph attention
# ---------------------------------------------------------------------------


def init_gat(key, in_dim: int, out_dim: int) -> Tuple[Params, Params]:
    ks = jax.random.split(key, 4)
    params = {
        "att_proj": init_linear(ks[0], in_dim, out_dim),
        "att_weight": _xavier_vec(ks[1], out_dim),
        "proj_with_att": init_linear(ks[2], in_dim, out_dim),
        "proj_without_att": init_linear(ks[3], in_dim, out_dim),
        "bn": init_batch_norm(out_dim),
    }
    return params, {"bn": init_bn_buffers(out_dim)}


def _pairwise(x: jnp.ndarray) -> jnp.ndarray:
    """x [B, N, D] -> elementwise products x_i * x_j [B, N, N, D]."""
    return x[:, :, None, :] * x[:, None, :, :]


def _att_softmax(scores: jnp.ndarray, temp: float) -> jnp.ndarray:
    """[B, N_out, N_in] scores -> weights normalized over the N_out axis
    (the reference's dim=-2 softmax quirk)."""
    return jax.nn.softmax(scores.astype(jnp.float32) / temp, axis=1)


def gat(
    p: Params,
    buf: Params,
    x: jnp.ndarray,
    train: bool,
    rng: Optional[jax.Array],
    temp: float = 1.0,
    input_drop: float = 0.2,
) -> Tuple[jnp.ndarray, Params]:
    """Graph attention layer over node set x [B, N, D_in] -> [B, N, D_out].

    Pipeline (reference :87-103): input dropout -> pairwise-product
    attention map -> tanh/linear/weight-vector scoring -> softmax(dim=-2) ->
    attended + skip projections -> BN -> SELU.
    """
    x = dropout(rng, x, input_drop, deterministic=not train)
    pair = jnp.tanh(
        jnp.einsum("bijd,de->bije", _pairwise(x), p["att_proj"]["w"])
        + p["att_proj"]["b"]
    )
    scores = jnp.einsum("bije,eo->bij", pair, p["att_weight"])
    att = _att_softmax(scores, temp)
    y = jnp.einsum("bij,bjd->bid", att, x)
    y = (
        jnp.einsum("bid,do->bio", y, p["proj_with_att"]["w"]) + p["proj_with_att"]["b"]
        + jnp.einsum("bid,do->bio", x, p["proj_without_att"]["w"])
        + p["proj_without_att"]["b"]
    )
    y, new_bn = batch_norm(p["bn"], buf["bn"], y, train)
    return selu(y), {"bn": new_bn}


# ---------------------------------------------------------------------------
# heterogeneous graph attention (two node types + master node)
# ---------------------------------------------------------------------------


def init_htrg_gat(key, in_dim: int, out_dim: int) -> Tuple[Params, Params]:
    ks = jax.random.split(key, 12)
    params = {
        "proj_type1": init_linear(ks[0], in_dim, in_dim),
        "proj_type2": init_linear(ks[1], in_dim, in_dim),
        "att_proj": init_linear(ks[2], in_dim, out_dim),
        "att_projM": init_linear(ks[3], in_dim, out_dim),
        "att_weight11": _xavier_vec(ks[4], out_dim),
        "att_weight22": _xavier_vec(ks[5], out_dim),
        "att_weight12": _xavier_vec(ks[6], out_dim),
        "att_weightM": _xavier_vec(ks[7], out_dim),
        "proj_with_att": init_linear(ks[8], in_dim, out_dim),
        "proj_without_att": init_linear(ks[9], in_dim, out_dim),
        "proj_with_attM": init_linear(ks[10], in_dim, out_dim),
        "proj_without_attM": init_linear(ks[11], in_dim, out_dim),
        "bn": init_batch_norm(out_dim),
    }
    return params, {"bn": init_bn_buffers(out_dim)}


def htrg_gat(
    p: Params,
    buf: Params,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    master: Optional[jnp.ndarray],
    train: bool,
    rng: Optional[jax.Array],
    temp: float = 1.0,
    input_drop: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Params]:
    """Heterogeneous graph attention (reference :195-237).

    x1 [B, N1, D], x2 [B, N2, D] are the two node types (temporal/spectral);
    ``master`` [B or 1, 1, D] is the learnable master node (mean of nodes if
    None).  Type-specific input projections, then one joint attention over
    the concatenated N1+N2 node set whose scoring weight vector depends on
    the (type_i, type_j) block (w11/w22/w12 with a symmetric off-diagonal),
    plus a directional master update.  Returns (x1', x2', master', buffers).
    """
    n1 = x1.shape[1]
    x1p = jnp.einsum("bnd,de->bne", x1, p["proj_type1"]["w"]) + p["proj_type1"]["b"]
    x2p = jnp.einsum("bnd,de->bne", x2, p["proj_type2"]["w"]) + p["proj_type2"]["b"]
    x = jnp.concatenate([x1p, x2p], axis=1)  # [B, N, D]
    n = x.shape[1]

    if master is None:
        master = jnp.mean(x, axis=1, keepdims=True)
    master = jnp.broadcast_to(master, (x.shape[0], 1, master.shape[-1]))

    x = dropout(rng, x, input_drop, deterministic=not train)

    # joint attention map with per-type-block weight vectors
    pair = jnp.tanh(
        jnp.einsum("bijd,de->bije", _pairwise(x), p["att_proj"]["w"])
        + p["att_proj"]["b"]
    )
    # block mask selects w11 / w22 / w12 per (i, j) cell — static shapes
    is1 = (jnp.arange(n) < n1).astype(jnp.float32)
    blk11 = is1[:, None] * is1[None, :]
    blk22 = (1 - is1)[:, None] * (1 - is1)[None, :]
    blk12 = 1.0 - blk11 - blk22
    s11 = jnp.einsum("bije,eo->bij", pair, p["att_weight11"])
    s22 = jnp.einsum("bije,eo->bij", pair, p["att_weight22"])
    s12 = jnp.einsum("bije,eo->bij", pair, p["att_weight12"])
    scores = s11 * blk11 + s22 * blk22 + s12 * blk12
    att = _att_softmax(scores, temp)

    # master update (directional edges node -> master, reference :239-245,259-274)
    pairM = jnp.tanh(
        jnp.einsum("bnd,de->bne", x * master, p["att_projM"]["w"]) + p["att_projM"]["b"]
    )
    scoresM = jnp.einsum("bne,eo->bno", pairM, p["att_weightM"])  # [B, N, 1]
    attM = jax.nn.softmax(scoresM.astype(jnp.float32) / temp, axis=1)
    m_att = jnp.einsum("bno,bnd->bod", attM, x)  # [B, 1, D]
    new_master = (
        jnp.einsum("bod,de->boe", m_att, p["proj_with_attM"]["w"])
        + p["proj_with_attM"]["b"]
        + jnp.einsum("bod,de->boe", master, p["proj_without_attM"]["w"])
        + p["proj_without_attM"]["b"]
    )

    y = jnp.einsum("bij,bjd->bid", att, x)
    y = (
        jnp.einsum("bid,do->bio", y, p["proj_with_att"]["w"]) + p["proj_with_att"]["b"]
        + jnp.einsum("bid,do->bio", x, p["proj_without_att"]["w"])
        + p["proj_without_att"]["b"]
    )
    y, new_bn = batch_norm(p["bn"], buf["bn"], y, train)
    y = selu(y)
    return y[:, :n1], y[:, n1:], new_master, {"bn": new_bn}


# ---------------------------------------------------------------------------
# top-k graph pooling
# ---------------------------------------------------------------------------


def init_graph_pool(key, in_dim: int) -> Params:
    return {"proj": init_linear(key, in_dim, 1)}


def pooled_nodes(n_nodes: int, k: float) -> int:
    """Static post-pool node count (reference :362: max(int(N*k), 1))."""
    return max(int(n_nodes * k), 1)


def graph_pool(
    p: Params,
    h: jnp.ndarray,
    k: float,
    train: bool,
    rng: Optional[jax.Array],
    drop: float = 0.3,
) -> jnp.ndarray:
    """Score-based top-k node pooling (reference :343-372): sigmoid-scored
    nodes, keep the max(floor(N*k), 1) highest (score-descending order,
    the reference int() floor — see pooled_nodes), scale kept
    nodes by their score.  k is static -> static output shape."""
    z = dropout(rng, h, drop, deterministic=not train)
    scores = jax.nn.sigmoid(
        jnp.einsum("bnd,do->bno", z, p["proj"]["w"]) + p["proj"]["b"]
    )[..., 0]  # [B, N]
    kk = pooled_nodes(h.shape[1], k)
    _, idx = jax.lax.top_k(scores, kk)  # descending, matches torch.topk
    weighted = h * scores[..., None]
    return jnp.take_along_axis(weighted, idx[..., None], axis=1)
