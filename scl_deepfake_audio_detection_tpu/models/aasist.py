"""AASIST: spectro-temporal graph attention back-end over SSL features.

Capability match for ``model/wav2vec2_aasist.py:436-604`` (Jung et al.,
ICASSP 2022, on top of the XLS-R frontend): SSL frames -> Linear to 128 ->
(3,3) max-pool over (feature, time) -> 6-block RawNet2-style conv encoder ->
learned spectral/temporal attention pooling -> two heterogeneous
graph-attention branches with learnable master nodes -> element-max branch
merge -> [T_max, T_avg, S_max, S_avg, master] readout -> linear classifier.

Graph ops live in ``ops/graph.py``; conv/BN primitives in ``ops/layers.py``
(NHWC, buffers threaded — framework conventions).  All node counts are
compile-time constants derived from the fixed input length, so every
top-k pool keeps static shapes.

Reference quirks preserved or documented:
- ``Residual_block.forward`` computes BN+SELU of its input and then feeds
  the *raw* input to conv1 (reference :414-422: ``out = self.conv1(x)``) —
  the pre-activation is dead code.  We implement the effective dataflow
  (conv1 on the raw input) and omit the dead bn1.
- In train mode the reference returns ``(output, last_hidden)`` — a 2-tuple
  the ``main.py:66`` 3-way unpack would crash on (latent upstream bug).  We
  return the uniform ModelOutput with ``feats = last_hidden[:, None, :]``
  and ``emb = last_hidden``, which is exactly what its own ``loss`` (:607+)
  consumes for both SupCon terms.
- No final log_softmax: score files carry raw logits (``eval_scores``).
- No shipped YAML provides the ``aasist:`` block (SURVEY §2 A8); defaults
  below are the published SSL-AASIST hyperparameters, overridable from
  config.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.models import xlsr as X
from scl_deepfake_audio_detection_tpu.models.base import ModelOutput, Params
from scl_deepfake_audio_detection_tpu.ops.graph import (
    gat,
    graph_pool,
    htrg_gat,
    init_gat,
    init_graph_pool,
    init_htrg_gat,
)
from scl_deepfake_audio_detection_tpu.ops.layers import (
    batch_norm,
    conv2d,
    dropout,
    init_batch_norm,
    init_bn_buffers,
    init_conv2d,
    init_linear,
    linear,
    max_pool2d,
    selu,
)
from scl_deepfake_audio_detection_tpu.ops.losses import cross_entropy
from scl_deepfake_audio_detection_tpu.ops.supcon import seq_similarity, supcon_loss
from scl_deepfake_audio_detection_tpu.utils.registry import MODELS

DEFAULT_FILTS: Tuple = (128, (1, 32), (32, 32), (32, 64), (64, 64))
DEFAULT_GAT_DIMS = (64, 32)
DEFAULT_POOL_RATIOS = (0.5, 0.7, 0.5, 0.5)
DEFAULT_TEMPERATURES = (2.0, 2.0, 100.0, 100.0)


# ---------------------------------------------------------------------------
# RawNet2-style residual conv blocks (reference Residual_block :377-433)
# ---------------------------------------------------------------------------


def _init_res_block(key, in_c: int, out_c: int) -> Tuple[Params, Params]:
    ks = jax.random.split(key, 3)
    p = {
        "conv1": init_conv2d(ks[0], in_c, out_c, (2, 3)),
        "bn2": init_batch_norm(out_c),
        "conv2": init_conv2d(ks[1], out_c, out_c, (2, 3)),
    }
    b = {"bn2": init_bn_buffers(out_c)}
    if in_c != out_c:
        p["downsample"] = init_conv2d(ks[2], in_c, out_c, (1, 3))
    return p, b


def _res_block(p, buf, x, train, cdtype):
    """x [B, H, W, C]: conv1 (2,3) pad (1,1) -> BN+SELU -> conv2 (2,3)
    pad (0,1); (1,3)-conv shortcut on channel change. Net H/W preserved."""
    nb = {}
    out = conv2d(p["conv1"], x, padding=[(1, 1), (1, 1)], compute_dtype=cdtype)
    out, nb["bn2"] = batch_norm(p["bn2"], buf["bn2"], out, train)
    out = conv2d(p["conv2"], selu(out), padding=[(0, 0), (1, 1)], compute_dtype=cdtype)
    identity = (
        conv2d(p["downsample"], x, padding=[(0, 0), (1, 1)], compute_dtype=cdtype)
        if "downsample" in p
        else x
    )
    return out + identity.astype(out.dtype), nb


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


@MODELS.register("xlsr_aasist", aliases=("wav2vec2_aasist",))
@dataclass(frozen=True)
class XLSRAasist:
    ssl: X.XLSRConfig = field(default_factory=X.XLSRConfig.xlsr_300m)
    filts: Tuple = DEFAULT_FILTS
    gat_dims: Tuple[int, int] = DEFAULT_GAT_DIMS
    pool_ratios: Tuple[float, float, float, float] = DEFAULT_POOL_RATIOS
    temperatures: Tuple[float, float, float, float] = DEFAULT_TEMPERATURES
    num_classes: int = 2
    feat_dim: int = 128
    flag_fix_ssl: bool = False
    contra_mode: str = "all"
    loss_type: int = 1
    temperature: float = 0.07

    has_buffers = True

    @classmethod
    def from_config(cls, model_cfg, ssl: Optional[X.XLSRConfig] = None) -> "XLSRAasist":
        aa = dict(getattr(model_cfg, "extra", {}) or {}).get("aasist", {})
        filts = aa.get("filts", DEFAULT_FILTS)
        filts = tuple(tuple(f) if isinstance(f, (list, tuple)) else f for f in filts)
        return cls(
            ssl=ssl or X.XLSRConfig.xlsr_300m(),
            filts=filts,
            gat_dims=tuple(aa.get("gat_dims", DEFAULT_GAT_DIMS)),
            pool_ratios=tuple(aa.get("pool_ratios", DEFAULT_POOL_RATIOS)),
            temperatures=tuple(aa.get("temperatures", DEFAULT_TEMPERATURES)),
            num_classes=int(aa.get("nclasses", 2)),
            flag_fix_ssl=bool(model_cfg.flag_fix_ssl),
            contra_mode=model_cfg.contra_mode,
            loss_type=int(model_cfg.loss_type),
        )

    @property
    def _blocks(self) -> List[Tuple[int, int]]:
        """(in, out) channel pairs of the 6 encoder blocks
        (reference :462-468: filts[1], [2], [3], [4], [4], [4])."""
        f = self.filts
        seq = [tuple(f[1]), tuple(f[2]), tuple(f[3]), tuple(f[4]), tuple(f[4]), tuple(f[4])]
        # repeated filts[4] blocks after the first run at out->out channels
        out: List[Tuple[int, int]] = []
        for i, (ci, co) in enumerate(seq):
            if i >= 4:
                ci = seq[3][1]
            out.append((ci, co))
        return out

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> Params:
        gat0, gat1 = self.gat_dims
        enc_out = self._blocks[-1][1]
        ks = iter(jax.random.split(key, 32))
        blocks = [_init_res_block(next(ks), ci, co) for ci, co in self._blocks]
        params: Params = {
            "ssl": X.init_xlsr(next(ks), self.ssl),
            "ll": init_linear(next(ks), self.ssl.out_dim, self.feat_dim),
            "first_bn": init_batch_norm(1),
            "encoder": [p for p, _ in blocks],
            "first_bn1": init_batch_norm(enc_out),
            "att_conv1": init_conv2d(next(ks), enc_out, 128, 1),
            "att_bn": init_batch_norm(128),
            "att_conv2": init_conv2d(next(ks), 128, enc_out, 1),
            "pos_S": jax.random.normal(next(ks), (1, self.feat_dim // 3, enc_out)),
            "master1": jax.random.normal(next(ks), (1, 1, gat0)),
            "master2": jax.random.normal(next(ks), (1, 1, gat0)),
            "pool_S": init_graph_pool(next(ks), gat0),
            "pool_T": init_graph_pool(next(ks), gat0),
            "pool_hS1": init_graph_pool(next(ks), gat1),
            "pool_hT1": init_graph_pool(next(ks), gat1),
            "pool_hS2": init_graph_pool(next(ks), gat1),
            "pool_hT2": init_graph_pool(next(ks), gat1),
            "out_layer": init_linear(next(ks), 5 * gat1, self.num_classes),
        }
        gat_s, gat_s_buf = init_gat(next(ks), enc_out, gat0)
        gat_t, gat_t_buf = init_gat(next(ks), enc_out, gat0)
        params["gat_S"], params["gat_T"] = gat_s, gat_t
        for name in ("st11", "st12", "st21", "st22"):
            dim_in = gat0 if name.endswith("1") else gat1
            p, _ = init_htrg_gat(next(ks), dim_in, gat1)
            params[f"htrg_{name}"] = p
        return params

    def init_buffers(self) -> Params:
        gat0, gat1 = self.gat_dims
        enc_out = self._blocks[-1][1]
        buf: Params = {
            "first_bn": init_bn_buffers(1),
            # buffer structure only (see _init_res_block's b) — generating
            # and discarding the conv weights here would waste init time
            "encoder": [{"bn2": init_bn_buffers(co)} for _ci, co in self._blocks],
            "first_bn1": init_bn_buffers(enc_out),
            "att_bn": init_bn_buffers(128),
            "gat_S": {"bn": init_bn_buffers(gat0)},
            "gat_T": {"bn": init_bn_buffers(gat0)},
        }
        for name in ("st11", "st12", "st21", "st22"):
            buf[f"htrg_{name}"] = {"bn": init_bn_buffers(gat1)}
        return buf

    # --------------------------------------------------------------- forward
    def apply(
        self,
        params: Params,
        wav: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        buffers: Optional[Params] = None,
        mutable: bool = False,
    ):
        buffers = buffers if buffers is not None else self.init_buffers()
        nb: Params = {}
        r = iter(jax.random.split(rng, 24)) if rng is not None else iter([None] * 24)

        ssl_deterministic = (not train) or self.flag_fix_ssl
        feats_ssl = X.extract_features(
            params["ssl"], self.ssl, wav, rng=next(r), deterministic=ssl_deterministic
        )
        if self.flag_fix_ssl:
            feats_ssl = jax.lax.stop_gradient(feats_ssl)

        cdtype = jnp.dtype(self.ssl.compute_dtype)
        feats = linear(params["ll"], feats_ssl, cdtype)  # [N, T, 128]

        # image [N, H=feat(128), W=time, 1] then (3,3) max pool (reference :516-518)
        x = jnp.swapaxes(feats, 1, 2)[..., None]
        x = max_pool2d(x, (3, 3))
        x, nb["first_bn"] = batch_norm(params["first_bn"], buffers["first_bn"], x, train)
        x = selu(x)

        enc_nb = []
        for bp, bb in zip(params["encoder"], buffers["encoder"]):
            x, one = _res_block(bp, bb, x, train, cdtype)
            enc_nb.append(one)
        nb["encoder"] = enc_nb
        x, nb["first_bn1"] = batch_norm(params["first_bn1"], buffers["first_bn1"], x, train)
        x = selu(x)  # [N, S, T', C]

        # attention map over (S, T') (reference :481-486, :530-547)
        w = conv2d(params["att_conv1"], x, compute_dtype=cdtype)
        w = selu(w)
        w, nb["att_bn"] = batch_norm(params["att_bn"], buffers["att_bn"], w, train)
        w = conv2d(params["att_conv2"], w, compute_dtype=cdtype)  # [N, S, T', C]

        w = w.astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        w1 = jax.nn.softmax(w, axis=2)  # over time
        e_s = jnp.sum(x32 * w1, axis=2) + params["pos_S"]  # [N, S, C] + pos
        w2 = jax.nn.softmax(w, axis=1)  # over spectral nodes
        e_t = jnp.sum(x32 * w2, axis=1)  # [N, T', C]

        t_s, t_t = self.temperatures[0], self.temperatures[1]
        t_h = self.temperatures[2]
        gs, nb["gat_S"] = gat(params["gat_S"], buffers["gat_S"], e_s, train, next(r), t_s)
        out_s = graph_pool(params["pool_S"], gs, self.pool_ratios[0], train, next(r))
        gt, nb["gat_T"] = gat(params["gat_T"], buffers["gat_T"], e_t, train, next(r), t_t)
        out_t = graph_pool(params["pool_T"], gt, self.pool_ratios[1], train, next(r))

        def branch(tag1, tag2, master, pool_s_key, pool_t_key, r):
            t1, s1, m1, b1 = htrg_gat(
                params[f"htrg_{tag1}"], buffers[f"htrg_{tag1}"],
                out_t, out_s, master, train, next(r), t_h,
            )
            s1 = graph_pool(params[pool_s_key], s1, self.pool_ratios[2], train, next(r))
            t1 = graph_pool(params[pool_t_key], t1, self.pool_ratios[2], train, next(r))
            t_aug, s_aug, m_aug, b2 = htrg_gat(
                params[f"htrg_{tag2}"], buffers[f"htrg_{tag2}"],
                t1, s1, m1, train, next(r), t_h,
            )
            return t1 + t_aug, s1 + s_aug, m1 + m_aug, b1, b2

        t1, s1, m1, nb["htrg_st11"], nb["htrg_st12"] = branch(
            "st11", "st12", params["master1"], "pool_hS1", "pool_hT1", r
        )
        t2, s2, m2, nb["htrg_st21"], nb["htrg_st22"] = branch(
            "st21", "st22", params["master2"], "pool_hS2", "pool_hT2", r
        )

        det = not train
        t1 = dropout(next(r), t1, 0.2, det)
        t2 = dropout(next(r), t2, 0.2, det)
        s1 = dropout(next(r), s1, 0.2, det)
        s2 = dropout(next(r), s2, 0.2, det)
        m1 = dropout(next(r), m1, 0.2, det)
        m2 = dropout(next(r), m2, 0.2, det)

        out_t = jnp.maximum(t1, t2)
        out_s = jnp.maximum(s1, s2)
        master = jnp.maximum(m1, m2)

        last_hidden = jnp.concatenate(
            [
                jnp.max(jnp.abs(out_t), axis=1),
                jnp.mean(out_t, axis=1),
                jnp.max(jnp.abs(out_s), axis=1),
                jnp.mean(out_s, axis=1),
                master[:, 0],
            ],
            axis=1,
        )
        last_hidden = dropout(next(r), last_hidden, 0.5, det)
        logits = linear(params["out_layer"], last_hidden, jnp.float32)

        out = ModelOutput(
            log_probs=jax.nn.log_softmax(logits, axis=-1),
            feats=last_hidden[:, None, :],  # 1-frame sequence for SupCon
            emb=last_hidden,
            logits=logits,
        )
        if mutable:
            return out, nb
        return out

    def eval_scores(self, out: ModelOutput) -> jnp.ndarray:
        """Raw logits — the reference writes the out_layer output directly."""
        return out.logits

    # ------------------------------------------------------------------ loss
    def loss(self, out: ModelOutput, labels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """1/N-scaled CE on raw logits + SupCon on last_hidden as both the
        sequence and embedding term (reference loss :607-640)."""
        n = out.logits.shape[0]
        labels = labels.reshape(-1).astype(jnp.int32)
        terms: Dict[str, jnp.ndarray] = {}
        if self.loss_type in (1, 2, 3, 4):
            terms["L_CE"] = cross_entropy(out.logits, labels) / n
        if self.loss_type in (1, 2, 5):
            terms["L_CF1"] = (
                supcon_loss(
                    out.feats[:, None].astype(jnp.float32),
                    labels=labels,
                    sim_metric=seq_similarity,
                    temperature=self.temperature,
                    contra_mode=self.contra_mode,
                )
                / n
            )
        if self.loss_type in (1, 3, 5):
            terms["L_CF2"] = (
                supcon_loss(
                    out.emb[:, None, :, None].astype(jnp.float32),
                    labels=labels,
                    sim_metric=seq_similarity,
                    temperature=self.temperature,
                    contra_mode=self.contra_mode,
                )
                / n
            )
        if not terms:
            raise ValueError(f"unknown loss_type: {self.loss_type}")
        return terms
