"""XLS-R + linear/MLP back-end with SupCon training — the published-best model.

Capability match for ``model/wav2vec2_linear_nll.py`` (the model behind every
conf-N-linear config and all published EERs): SSL frame features -> Linear
1024->128 -> ReLU -> 3-layer frame MLP (LeakyReLU + dropout 0.5) -> mean-pool
-> Linear 128->2 -> log_softmax.  Train-time outputs are the log-probs, the
*pre-ReLU* 128-d frame features, and the 128-d utterance embedding
(``wav2vec2_linear_nll.py:120-136``); the loss combines a (double-softmax)
CE with SupCon over frames and over embeddings (``:158-192``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.models import xlsr as X
from scl_deepfake_audio_detection_tpu.models.base import ModelOutput, Params
from scl_deepfake_audio_detection_tpu.ops.layers import (
    dropout,
    init_linear,
    leaky_relu,
    linear,
)
from scl_deepfake_audio_detection_tpu.ops.losses import nll_on_log_probs
from scl_deepfake_audio_detection_tpu.ops.supcon import seq_similarity, supcon_loss
from scl_deepfake_audio_detection_tpu.utils.registry import MODELS


@MODELS.register("xlsr_linear_nll", aliases=("wav2vec2_linear_nll",))
@dataclass(frozen=True)
class LinearNLL:
    ssl: X.XLSRConfig = field(default_factory=X.XLSRConfig.xlsr_300m)
    emb_dim: int = 128
    num_classes: int = 2
    mlp_layers: int = 3
    dropout: float = 0.5
    leaky_slope: float = 0.01
    flag_fix_ssl: bool = False
    contra_mode: str = "all"
    loss_type: int = 1
    temperature: float = 0.07

    @classmethod
    def from_config(cls, model_cfg, ssl: Optional[X.XLSRConfig] = None) -> "LinearNLL":
        """Build from a ``utils.config.ModelConfig`` (reference YAML schema)."""
        return cls(
            ssl=ssl or X.XLSRConfig.xlsr_300m(),
            flag_fix_ssl=bool(model_cfg.flag_fix_ssl),
            contra_mode=model_cfg.contra_mode,
            loss_type=int(model_cfg.loss_type),
        )

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, 3 + self.mlp_layers)
        frame = [
            init_linear(ks[i], self.emb_dim, self.emb_dim) for i in range(self.mlp_layers)
        ]
        return {
            "ssl": X.init_xlsr(ks[-3], self.ssl),
            "ll": init_linear(ks[-2], self.ssl.out_dim, self.emb_dim),
            "backend": {
                "frame": frame,
                "out": init_linear(ks[-1], self.emb_dim, self.num_classes),
            },
        }

    def init_head_only(self, key: jax.Array, ssl_params: Params) -> Params:
        """Fresh head on top of converted pretrained SSL weights."""
        p = self.init(key)
        p["ssl"] = ssl_params
        return p

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
        """wav [N, T_samples] -> ModelOutput.

        ``flag_fix_ssl`` freezes the SSL frontend: eval-mode (no dropout) and
        no gradient, matching the reference's no_grad branch
        (``wav2vec2_linear_nll.py:122-126``).
        """
        ssl_rng, head_rng = (
            jax.random.split(rng) if rng is not None else (None, None)
        )
        ssl_deterministic = (not train) or self.flag_fix_ssl
        feats_ssl = X.extract_features(
            params["ssl"], self.ssl, wav, rng=ssl_rng, deterministic=ssl_deterministic
        )
        if self.flag_fix_ssl:
            feats_ssl = jax.lax.stop_gradient(feats_ssl)

        cdtype = jnp.dtype(self.ssl.compute_dtype)
        x = linear(params["ll"], feats_ssl, cdtype)  # [N, T, emb]
        feats = x  # pre-ReLU frame features feed SupCon (reference :127-128)
        x = jax.nn.relu(x)

        # frame-level MLP (BackEnd.m_frame_level, reference :49-63)
        for i, lp in enumerate(params["backend"]["frame"]):
            x = linear(lp, x, cdtype)
            x = leaky_relu(x, self.leaky_slope)
            r = jax.random.fold_in(head_rng, i) if head_rng is not None else None
            x = dropout(r, x, self.dropout, deterministic=not train)

        emb = jnp.mean(x, axis=1)  # [N, emb]
        logits = linear(params["backend"]["out"], emb, cdtype).astype(jnp.float32)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        out = ModelOutput(log_probs=log_probs, feats=feats, emb=emb, logits=logits)
        if mutable:
            return out, {}
        return out

    # ------------------------------------------------------------------ loss
    def loss(self, out: ModelOutput, labels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Named loss dict; terms selected by ``loss_type``
        (reference ``wav2vec2_linear_nll.py:158-192``).

        All terms scale by 1/N (N = views in the anchor group).  L_CE feeds
        log-probs back through CE — the reference's double-softmax quirk,
        reproduced for training parity.
        """
        n = out.log_probs.shape[0]
        labels = labels.reshape(-1).astype(jnp.int32)
        terms: Dict[str, jnp.ndarray] = {}

        if self.loss_type in (1, 2, 3, 4):
            terms["L_CE"] = nll_on_log_probs(out.log_probs, labels) / n
        if self.loss_type in (1, 2, 5):
            terms["L_CF1"] = (
                supcon_loss(
                    out.feats[:, None].astype(jnp.float32),  # [N, 1, T, D]
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
                    out.emb[:, None, :, None].astype(jnp.float32),  # [N, 1, D, 1]
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
