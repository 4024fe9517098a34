"""Config tree.

One dataclass-based configuration replacing the reference's two-layer system
(argparse hyperparameters merged with a ``model:``/``data:`` YAML, reference
``main.py:217-325``).  The YAML schema is kept drop-in compatible with the
reference configs (``configs/conf-3-linear.yaml``): ``load_config`` accepts
those files unchanged, so a user can point this framework at their existing
experiment configs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


@dataclass(frozen=True)  # hashable -> usable as a jit static argument
class RawBoostConfig:
    """RawBoost DSP knobs.

    Field names and defaults mirror the reference CLI flags
    (``main.py:258-298``) so score-level behavior is comparable.
    """

    algo: int = 5
    # LnL convolutive noise
    nBands: int = 5
    minF: int = 20
    maxF: int = 8000
    minBW: int = 100
    maxBW: int = 1000
    minCoeff: int = 10
    maxCoeff: int = 100
    minG: int = 0
    maxG: int = 0
    minBiasLinNonLin: int = 5
    maxBiasLinNonLin: int = 20
    N_f: int = 5
    # ISD impulsive noise
    P: int = 10
    g_sd: int = 2
    # SSI additive noise
    SNRmin: int = 10
    SNRmax: int = 40


@dataclass
class ModelConfig:
    """``model:`` section. Unknown keys land in ``extra`` (e.g. AASIST/BTSE
    hyperparameters), mirroring how the reference passes the raw dict to the
    model constructor (``main.py:333``)."""

    name: str = "xlsr_linear_nll"
    flag_fix_ssl: bool = False
    contra_mode: str = "all"  # 'one' or 'all'
    loss_type: int = 1  # 1: CE+CF1+CF2, 2: CE+CF1, 3: CE+CF2, 4: CE, 5: CF1+CF2
    extra: Dict[str, Any] = field(default_factory=dict)

    # Reference model names -> this framework's registry names.
    _NAME_MAP = {
        "wav2vec2_linear_nll": "xlsr_linear_nll",
        "wav2vec2_aasist": "xlsr_aasist",
        "wav2vec2_resnet": "xlsr_resnet",
        "wav2vec2_resnet_nll": "xlsr_resnet_nll",
        "wav2vec2_btse": "xlsr_btse",
    }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelConfig":
        d = dict(d)
        known = {f.name for f in dataclasses.fields(cls)} - {"extra"}
        kwargs = {k: d.pop(k) for k in list(d) if k in known}
        name = kwargs.get("name")
        if name in cls._NAME_MAP:
            kwargs["name"] = cls._NAME_MAP[name]
        return cls(extra=d, **kwargs)

    def to_dict(self) -> Dict[str, Any]:
        out = {
            "name": self.name,
            "flag_fix_ssl": self.flag_fix_ssl,
            "contra_mode": self.contra_mode,
            "loss_type": self.loss_type,
        }
        out.update(self.extra)
        return out


@dataclass
class DataConfig:
    """``data:`` section: dataset-module name plus its kwargs
    (``configs/conf-3-linear.yaml:8-19``)."""

    name: str = "asvspoof_2019_augall_3"
    kwargs: Dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DataConfig":
        return cls(name=d.get("name", "eval_only"), kwargs=dict(d.get("kwargs") or {}))


@dataclass
class TrainConfig:
    """Hyperparameters that the reference takes on the CLI
    (``main.py:226-241``, driven by ``02_train.sh:55-62``)."""

    batch_size: int = 1  # anchor groups per step (each group is V views)
    num_epochs: int = 100
    start_epoch: int = 0
    min_lr: float = 1e-8
    max_lr: float = 1e-5
    weight_decay: float = 1e-4
    loss: str = "weighted_CCE"  # only used in the output dir tag
    padding_type: str = "zero"  # 'zero' or 'repeat'
    seed: int = 1234
    comment: Optional[str] = None
    # TPU-specific
    compute_dtype: str = "bfloat16"  # matmul dtype; layernorm/softmax stay fp32
    remat: bool = True  # rematerialize encoder layers in the backward pass
    mesh_shape: Optional[List[int]] = None  # (data, model); None = all-data
    loss_scope: str = "group"  # 'group': per anchor-group SupCon (reference
    # semantics at bs=1); 'global': all-gather embeddings, global-batch SupCon
    grad_clip_norm: Optional[float] = None  # global-norm clip (NII arg_parse
    # --grad-clip-norm capability; reference active path never clips)
    grad_accum_steps: int = 1  # optax.MultiSteps microbatching
    zero1: bool = False  # ZeRO-1: shard AdamW moments over the data axis
    # (parallel.mesh.shard_opt_state); identical numerics, 1/N optimizer
    # memory per chip on an N-wide data axis
    zero1_min_size: int = 1 << 16  # leaves below this stay replicated
    check_numerics: bool = False  # per-step host NaN guard (syncs every step;
    # off by default — epoch-end aggregation catches NaNs once per epoch free)
    ckpt_every: int = 1  # save last.ckpt every N epochs (best saves + the
    # final epoch always write; at 300M a full-state ckpt is ~3.8GB, so
    # long runs on slow links raise this)
    async_ckpt: bool = True  # overlap the checkpoint npz/disk write with the
    # next epoch (device->host gather stays synchronous: the jitted step
    # donates its buffers, and ZeRO-1 gathers are collectives)
    early_metric: str = "acc"  # early-stop / best-checkpoint signal: 'acc'
    # is the reference's val accuracy (main.py:400,418-421); 'eer' stops on
    # per-epoch dev EER instead — the metric the eval protocol actually
    # scores, so best-checkpointing tracks the checkpoint eval would pick
    es_patience: int = 10  # strikes before the stop (reference main.py:26)
    es_delta: float = 0.01  # minimum improvement that resets the counter
    # (reference main.py:27); both apply to either early_metric direction

    def model_tag(self) -> str:
        # Output dir naming scheme: model_{loss}_{epochs}_{bs}_{minlr}[_{comment}]
        # (reference main.py:310-313).
        tag = f"model_{self.loss}_{self.num_epochs}_{self.batch_size}_{self.min_lr}"
        if self.comment:
            tag += f"_{self.comment}"
        return tag


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    rawboost: RawBoostConfig = field(default_factory=RawBoostConfig)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "model": self.model.to_dict(),
            "data": {"name": self.data.name, "kwargs": self.data.kwargs},
            "train": dataclasses.asdict(self.train),
            "rawboost": dataclasses.asdict(self.rawboost),
        }


def load_config(path: str) -> Config:
    """Load a YAML config.

    Accepts both this framework's configs (with optional ``train:`` and
    ``rawboost:`` sections) and reference-format configs that carry only
    ``model:`` and ``data:`` sections.
    """
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    cfg = Config(
        model=ModelConfig.from_dict(raw.get("model") or {}),
        data=DataConfig.from_dict(raw.get("data") or {}),
    )
    # train:/rawboost: are THIS framework's schema (unlike the reference-
    # format model:/data: sections where foreign keys are expected), so an
    # unknown key there can only be a typo — failing loudly beats silently
    # training with the default the user thought they overrode
    def _strict(section: str, cls):
        entries = raw[section] or {}
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = sorted(set(entries) - known)
        if unknown:
            raise ValueError(
                f"unknown {section}: config keys {unknown}; valid keys: "
                f"{sorted(known)}"
            )
        return cls(**entries)

    if "train" in raw:
        cfg.train = _strict("train", TrainConfig)
    if "rawboost" in raw:
        cfg.rawboost = _strict("rawboost", RawBoostConfig)
    return cfg
