"""Pre-activation ResNet back-end over SSL features.

Capability match for the reference's ResNet family: the backbone
(``model/resnet.py:122-190`` with ``RESNET_CONFIGS`` :113-118, ``PreActBlock``
:47-67, ``PreActBottleneck`` :70-94, ``SelfAttention`` pooling :10-45) and the
two SSL wrappers ``model/wav2vec2_resnet.py:56-150`` /
``model/wav2vec2_resnet_nll.py:24-121`` (identical math; the _nll file adds a
``flag_fix_ssl`` frozen-SSL path).

TPU-first design:
- NHWC layout throughout — channels ride the minor (lane) axis so XLA maps
  every 3x3 conv straight onto the MXU; the reference's NCHW is a
  cuDNN-favoring choice with no TPU benefit;
- batch-norm running statistics live in a separate ``buffers`` pytree
  (framework convention, ``ops/layers.batch_norm``) threaded through the
  train step — the functional equivalent of torch BN buffers under
  DataParallel (stats from the local batch, running stats for eval);
- the whole backbone is plain convs/BN with static shapes — no dynamic
  control flow, fully fusible.

Feature geometry (matching the reference wrapper): SSL frames ``[N, T, 1024]``
-> Linear to 128 -> treated as a 1-channel image ``[N, T, 128, 1]`` -> BN+SELU
-> stem conv (9x3, stride (3,1)) -> 4 pre-act stages (widths 64/128/256/512,
strides 1/2/2/2) -> conv5 ((num_nodes)x3) -> BN+SELU -> global average pool ->
256-d embedding -> 2-class logits.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.models import xlsr as X
from scl_deepfake_audio_detection_tpu.models.base import ModelOutput, Params
from scl_deepfake_audio_detection_tpu.ops.layers import (
    batch_norm,
    conv2d,
    init_batch_norm,
    init_bn_buffers,
    init_conv2d,
    init_linear,
    linear,
    selu,
)
from scl_deepfake_audio_detection_tpu.ops.losses import cross_entropy
from scl_deepfake_audio_detection_tpu.ops.supcon import seq_similarity, supcon_loss
from scl_deepfake_audio_detection_tpu.utils.registry import MODELS

# depth -> (blocks per stage, bottleneck?)  (reference RESNET_CONFIGS :113-118;
# '28' is the reference's alias for the [3,4,6,3] basic-block layout)
RESNET_CONFIGS: Dict[str, Tuple[Tuple[int, int, int, int], bool]] = {
    "18": ((2, 2, 2, 2), False),
    "28": ((3, 4, 6, 3), False),
    "34": ((3, 4, 6, 3), False),
    "50": ((3, 4, 6, 3), True),
    "101": ((3, 4, 23, 3), True),
}

STAGE_WIDTHS = (64, 128, 256, 512)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _init_preact_block(key, in_c: int, planes: int, bottleneck: bool) -> Tuple[Params, Params]:
    """One pre-activation block. Basic: BN-ReLU-conv3x3 x2; bottleneck:
    BN-ReLU-conv1x1/conv3x3/conv1x1 with 4x expansion. A 1x1 projection
    shortcut is added when shape changes (reference :58-59, :84-85)."""
    exp = 4 if bottleneck else 1
    out_c = planes * exp
    ks = jax.random.split(key, 4)
    if bottleneck:
        p = {
            "bn1": init_batch_norm(in_c),
            "conv1": init_conv2d(ks[0], in_c, planes, 1, bias=False),
            "bn2": init_batch_norm(planes),
            "conv2": init_conv2d(ks[1], planes, planes, 3, bias=False),
            "bn3": init_batch_norm(planes),
            "conv3": init_conv2d(ks[2], planes, out_c, 1, bias=False),
        }
        b = {
            "bn1": init_bn_buffers(in_c),
            "bn2": init_bn_buffers(planes),
            "bn3": init_bn_buffers(planes),
        }
    else:
        p = {
            "bn1": init_batch_norm(in_c),
            "conv1": init_conv2d(ks[0], in_c, planes, 3, bias=False),
            "bn2": init_batch_norm(planes),
            "conv2": init_conv2d(ks[1], planes, planes, 3, bias=False),
        }
        b = {"bn1": init_bn_buffers(in_c), "bn2": init_bn_buffers(planes)}
    if in_c != out_c:  # stride handled at call site; projection on channel change
        p["shortcut"] = init_conv2d(ks[3], in_c, out_c, 1, bias=False)
    return p, b


def _preact_block(
    p: Params, buf: Params, x: jnp.ndarray, stride: int, bottleneck: bool,
    train: bool, cdtype,
) -> Tuple[jnp.ndarray, Params]:
    nb = {}
    out, nb["bn1"] = batch_norm(p["bn1"], buf["bn1"], x, train)
    out = jax.nn.relu(out)
    shortcut = (
        conv2d(p["shortcut"], out, stride=(stride, stride), padding="VALID",
               compute_dtype=cdtype)
        if "shortcut" in p
        else (x if stride == 1 else x[:, ::stride, ::stride, :])
    )
    if bottleneck:
        out = conv2d(p["conv1"], out, stride=1, padding="VALID", compute_dtype=cdtype)
        out, nb["bn2"] = batch_norm(p["bn2"], buf["bn2"], out, train)
        out = conv2d(p["conv2"], jax.nn.relu(out), stride=(stride, stride),
                     padding=[(1, 1), (1, 1)], compute_dtype=cdtype)
        out, nb["bn3"] = batch_norm(p["bn3"], buf["bn3"], out, train)
        out = conv2d(p["conv3"], jax.nn.relu(out), stride=1, padding="VALID",
                     compute_dtype=cdtype)
    else:
        out = conv2d(p["conv1"], out, stride=(stride, stride),
                     padding=[(1, 1), (1, 1)], compute_dtype=cdtype)
        out, nb["bn2"] = batch_norm(p["bn2"], buf["bn2"], out, train)
        out = conv2d(p["conv2"], jax.nn.relu(out), stride=1,
                     padding=[(1, 1), (1, 1)], compute_dtype=cdtype)
    return out + shortcut.astype(out.dtype), nb


# ---------------------------------------------------------------------------
# backbone
# ---------------------------------------------------------------------------


def resnet_buffers(resnet_type: str = "18", enc_dim: int = 256) -> Params:
    """BN running-stat buffers alone, derived from the static block
    structure — ``init_buffers`` must not pay init_resnet's full random
    conv-weight generation just to discard the params."""
    stages, bottleneck = RESNET_CONFIGS[resnet_type]
    exp = 4 if bottleneck else 1
    buffers: Params = {"bn1": init_bn_buffers(16)}
    in_c = 16
    for si, (planes, blocks) in enumerate(zip(STAGE_WIDTHS, stages)):
        stage_b: List[Params] = []
        for _ in range(blocks):
            b = {"bn1": init_bn_buffers(in_c), "bn2": init_bn_buffers(planes)}
            if bottleneck:
                b["bn3"] = init_bn_buffers(planes)
            stage_b.append(b)
            in_c = planes * exp
        buffers[f"layer{si + 1}"] = stage_b
    buffers["bn5"] = init_bn_buffers(enc_dim)
    return buffers


def init_resnet(key, resnet_type: str = "18", num_nodes: int = 3,
                enc_dim: int = 256, nclasses: int = 2) -> Tuple[Params, Params]:
    """Backbone params/buffers (reference ResNet.__init__ :132-153)."""
    stages, bottleneck = RESNET_CONFIGS[resnet_type]
    exp = 4 if bottleneck else 1
    n_blocks = sum(stages)
    ks = iter(jax.random.split(key, n_blocks + 3))

    params: Params = {
        "conv1": init_conv2d(next(ks), 1, 16, (9, 3), bias=False),
        "bn1": init_batch_norm(16),
    }
    buffers: Params = {"bn1": init_bn_buffers(16)}

    in_c = 16
    for si, (planes, blocks) in enumerate(zip(STAGE_WIDTHS, stages)):
        stage_p: List[Params] = []
        stage_b: List[Params] = []
        for bi in range(blocks):
            p, b = _init_preact_block(next(ks), in_c, planes, bottleneck)
            stage_p.append(p)
            stage_b.append(b)
            in_c = planes * exp
        params[f"layer{si + 1}"] = stage_p
        buffers[f"layer{si + 1}"] = stage_b

    params["conv5"] = init_conv2d(next(ks), in_c, enc_dim, (num_nodes, 3), bias=False)
    params["bn5"] = init_batch_norm(enc_dim)
    buffers["bn5"] = init_bn_buffers(enc_dim)
    params["fc"] = init_linear(next(ks), enc_dim, nclasses)
    return params, buffers


def resnet_forward(
    p: Params, buf: Params, x: jnp.ndarray, resnet_type: str, num_nodes: int,
    train: bool, cdtype,
) -> Tuple[jnp.ndarray, jnp.ndarray, Params]:
    """x [B, H, W, 1] -> (logits [B, C], emb [B, enc_dim], new_buffers).

    Stem conv (9,3)/(3,1)/pad(1,1) -> BN+ReLU -> stages (stride 1,2,2,2) ->
    conv5 ((num_nodes,3), pad (0,1)) -> BN+ReLU -> global avg pool
    (reference forward :169-190).
    """
    stages, bottleneck = RESNET_CONFIGS[resnet_type]
    nb: Params = {}
    x = conv2d(p["conv1"], x, stride=(3, 1), padding=[(1, 1), (1, 1)],
               compute_dtype=cdtype)
    x, nb["bn1"] = batch_norm(p["bn1"], buf["bn1"], x, train)
    x = jax.nn.relu(x)

    for si in range(4):
        stage_nb = []
        for bi in range(stages[si]):
            stride = 1 if (si == 0 or bi > 0) else 2
            x, bnb = _preact_block(
                p[f"layer{si + 1}"][bi], buf[f"layer{si + 1}"][bi], x,
                stride, bottleneck, train, cdtype,
            )
            stage_nb.append(bnb)
        nb[f"layer{si + 1}"] = stage_nb

    x = conv2d(p["conv5"], x, stride=1, padding=[(0, 0), (1, 1)], compute_dtype=cdtype)
    x, nb["bn5"] = batch_norm(p["bn5"], buf["bn5"], x, train)
    x = jax.nn.relu(x)
    emb = jnp.mean(x, axis=(1, 2))  # adaptive avg pool (1,1) + flatten
    logits = linear(p["fc"], emb, cdtype)
    return logits.astype(jnp.float32), emb, nb


# ---------------------------------------------------------------------------
# attentive statistics pooling (reference SelfAttention :10-45)
# ---------------------------------------------------------------------------


def init_self_attention(key, hidden: int) -> Params:
    """Kaiming-uniform [1, hidden] attention vector."""
    bound = (6.0 / hidden) ** 0.5  # gain sqrt(2) * sqrt(3 / fan_in)
    return {"w": jax.random.uniform(key, (hidden,), jnp.float32, -bound, bound)}


def self_attention_pool(
    p: Params, x: jnp.ndarray, mean_only: bool = False,
    noise_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Softmax(tanh(x @ w)) attention over time; returns weighted sum, or
    [sum, std] statistics concat (std over the weighted sequence, with the
    reference's 1e-5 noise when a key is given)."""
    att = jax.nn.softmax(jnp.tanh(jnp.einsum("btd,d->bt", x, p["w"])), axis=1)
    weighted = x * att[..., None]
    avg = jnp.sum(weighted, axis=1)
    if mean_only:
        return avg
    noisy = weighted
    if noise_rng is not None:
        noisy = weighted + 1e-5 * jax.random.normal(noise_rng, weighted.shape)
    std = jnp.std(noisy, axis=1, ddof=1)
    return jnp.concatenate([avg, std], axis=1)


# ---------------------------------------------------------------------------
# SSL wrapper model
# ---------------------------------------------------------------------------


@MODELS.register("xlsr_resnet", aliases=("wav2vec2_resnet", "wav2vec2_resnet_nll"))
@dataclass(frozen=True)
class XLSRResNet:
    """XLS-R frontend + pre-act ResNet classifier (both reference wrappers;
    they share all math — ``flag_fix_ssl`` covers the _nll variant's frozen
    path)."""

    ssl: X.XLSRConfig = field(default_factory=X.XLSRConfig.xlsr_300m)
    resnet_type: str = "18"
    num_nodes: int = 3
    enc_dim: int = 256
    num_classes: int = 2
    feat_dim: int = 128
    flag_fix_ssl: bool = False
    contra_mode: str = "all"
    loss_type: int = 1
    temperature: float = 0.07

    has_buffers = True

    @classmethod
    def from_config(cls, model_cfg, ssl: Optional[X.XLSRConfig] = None) -> "XLSRResNet":
        rn = dict(getattr(model_cfg, "extra", {}) or {}).get("resnet", {})
        return cls(
            ssl=ssl or X.XLSRConfig.xlsr_300m(),
            resnet_type=str(rn.get("resnet_type", "18")),
            num_nodes=int(rn.get("num_nodes", 3)),
            enc_dim=int(rn.get("enc_dim", 256)),
            num_classes=int(rn.get("nclasses", 2)),
            flag_fix_ssl=bool(model_cfg.flag_fix_ssl),
            contra_mode=model_cfg.contra_mode,
            loss_type=int(model_cfg.loss_type),
        )

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, 3)
        rn, _ = init_resnet(ks[0], self.resnet_type, self.num_nodes,
                            self.enc_dim, self.num_classes)
        return {
            "ssl": X.init_xlsr(ks[1], self.ssl),
            "ll": init_linear(ks[2], self.ssl.out_dim, self.feat_dim),
            "first_bn": init_batch_norm(1),
            "resnet": rn,
        }

    def init_buffers(self) -> Params:
        return {"first_bn": init_bn_buffers(1),
                "resnet": resnet_buffers(self.resnet_type, self.enc_dim)}

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
        """wav [N, T_samples] -> ModelOutput (logits are raw — the reference's
        resnet wrappers apply no log_softmax; ``log_probs`` here is
        log_softmax(logits) for the uniform contract, and ``eval_scores``
        returns the raw logits the reference writes to score files)."""
        buffers = buffers if buffers is not None else self.init_buffers()
        ssl_rng = rng
        ssl_deterministic = (not train) or self.flag_fix_ssl
        feats_ssl = X.extract_features(
            params["ssl"], self.ssl, wav, rng=ssl_rng, deterministic=ssl_deterministic
        )
        if self.flag_fix_ssl:
            feats_ssl = jax.lax.stop_gradient(feats_ssl)

        cdtype = jnp.dtype(self.ssl.compute_dtype)
        feats = linear(params["ll"], feats_ssl, cdtype)  # [N, T, 128]
        x = feats[..., None]  # NHWC image [N, T, 128, 1]
        x, fb = batch_norm(params["first_bn"], buffers["first_bn"], x, train)
        x = selu(x)
        logits, emb, rb = resnet_forward(
            params["resnet"], buffers["resnet"], x, self.resnet_type,
            self.num_nodes, train, cdtype,
        )
        out = ModelOutput(
            log_probs=jax.nn.log_softmax(logits, axis=-1),
            feats=feats,
            emb=emb,
            logits=logits,
        )
        if mutable:
            return out, {"first_bn": fb, "resnet": rb}
        return out

    def eval_scores(self, out: ModelOutput) -> jnp.ndarray:
        """Score-file columns: raw logits (reference resnet wrappers return
        the fc output directly)."""
        return out.logits

    # ------------------------------------------------------------------ loss
    def loss(self, out: ModelOutput, labels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """CE on raw logits + SupCon over frames/embedding — NO 1/N scaling,
        matching the resnet wrappers (reference ``wav2vec2_resnet_nll.py:91-121``
        divides by nothing, unlike the linear model)."""
        labels = labels.reshape(-1).astype(jnp.int32)
        terms: Dict[str, jnp.ndarray] = {}
        if self.loss_type in (1, 2, 3, 4):
            terms["L_CE"] = cross_entropy(out.logits, labels)
        if self.loss_type in (1, 2, 5):
            terms["L_CF1"] = supcon_loss(
                out.feats[:, None].astype(jnp.float32),
                labels=labels,
                sim_metric=seq_similarity,
                temperature=self.temperature,
                contra_mode=self.contra_mode,
            )
        if self.loss_type in (1, 3, 5):
            terms["L_CF2"] = supcon_loss(
                out.emb[:, None, :, None].astype(jnp.float32),
                labels=labels,
                sim_metric=seq_similarity,
                temperature=self.temperature,
                contra_mode=self.contra_mode,
            )
        if not terms:
            raise ValueError(f"unknown loss_type: {self.loss_type}")
        return terms
