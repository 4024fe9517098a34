"""XLS-R (wav2vec 2.0 large) SSL frontend, TPU-native.

Re-implements the compute graph of the frozen-architecture fairseq model the
reference loads via ``fairseq.checkpoint_utils.load_model_ensemble_and_task``
(reference ``model/xlsr.py:14-21``): a 7-layer strided conv feature encoder
(total stride 320) followed by a 24-layer pre-norm transformer (1024-d, 16
heads) with a grouped-conv relative positional embedding.  For 64600-sample
input it yields ``[B, 201, 1024]`` frame features, matching
``SSLModel.extract_feat`` (``model/xlsr.py:41``).

TPU-first design decisions (vs. a torch translation):
- encoder layers are a *stacked* parameter pytree driven by ``lax.scan`` —
  one compiled layer body instead of 24 unrolled blocks (fast compiles,
  optional ``jax.checkpoint`` remat per layer for the backward pass);
- attention runs through ``ops.attention.self_attention`` (length-aware
  dispatch: fused XLA einsum at the ~200-frame eval shapes, the Pallas flash
  kernel for long sequences);
- static shapes everywhere; bf16 matmuls with fp32 layernorm/softmax.

Weights convert from fairseq ``xlsr2_300m.pt`` or HuggingFace
``Wav2Vec2Model`` state dicts via ``models/convert.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Dict, Optional, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from scl_deepfake_audio_detection_tpu.ops.attention import self_attention
from scl_deepfake_audio_detection_tpu.ops.layers import (
    conv1d,
    dropout,
    gelu,
    init_conv1d,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class XLSRConfig:
    """Architecture hyperparameters of XLS-R 300M (wav2vec2 large,
    ``extractor_mode=layer_norm``, ``layer_norm_first=True``)."""

    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )  # (dim, kernel, stride)
    conv_bias: bool = True
    encoder_dim: int = 1024
    encoder_layers: int = 24
    ffn_dim: int = 4096
    num_heads: int = 16
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    layer_norm_eps: float = 1e-5
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    # runtime policy
    compute_dtype: str = "float32"  # 'bfloat16' on TPU for throughput
    attention_impl: str = "auto"  # 'auto' | 'flash' | 'xla'
    conv_impl: str = "conv"  # 'conv': lax.conv lowering | 'gemm': explicit
    # patch+matmul | 'phase': stride-phase decomposition into k accumulated
    # GEMMs with no patch materialization. Measured on v5e (24x64600, bf16):
    # conv 9.4-12.7ms, phase 18.8ms, gemm 20.8-22.6ms — XLA's conv lowering
    # wins (per-layer timing shows convs near roofline; the headroom is in
    # the LN/GELU epilogues, not the convs).
    scan_unroll: int = 1  # lax.scan unroll factor over encoder layers
    gelu_impl: str = "auto"  # 'auto' | 'exact' | 'tanh'. 'auto' = tanh under
    # bf16 compute, exact erf under fp32: the tanh form differs by <= 3e-4
    # (below bf16 resolution) and runs on the TPU transcendental unit, while
    # erf lowers to a long VPU polynomial — measured ~7ms of a 46ms forward
    # at 24x64600 (see ops/layers.gelu)
    fuse_qkv: bool = False  # one [D, 3D] projection instead of three [D, D];
    # measured slower under scan on v5e (51.3 vs 46.9 ms @ 24x64600): the
    # per-step weight concat costs more than the larger GEMM saves
    remat: bool = False  # checkpoint each encoder layer in the bwd pass
    remat_policy: str = "attn"  # 'full': recompute everything per layer |
    # 'dots': save MXU dot outputs, recompute only elementwise/LN/softmax
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable); no-remat
    # OOMs at these shapes (17.1G > 15.75G HBM).
    # 'attn' / 'attn_ffn': save only the named attn-out / +gelu activations
    # (everything else recomputed).  Measured at 2x11x64000 on v5e WITH the
    # bf16-cotangent fast backward (round 2; two runs each): attn
    # 117.6/119.6 ms/step, attn_ffn 119.2/123.3, full 121.0, dots 138.4 —
    # the cheaper recompute flipped the round-1 ordering (then: full 153,
    # attn 152, attn_ffn 146, dots 167), so 'attn' is now the default.
    remat_tail_full: int = 0  # keep the last K layers un-rematted (their
    # internals stay live; backward hits them first).  Measured at
    # 2x11x64000 with attn_ffn: K=4 *regresses* to 153ms (the stored tail
    # internals raise HBM pressure and the split scan compiles to a slower
    # schedule); 0 stays the default — knob kept for shapes with headroom.
    fast_bwd_matmuls: Optional[bool] = None  # backward-cotangent cast for
    # the encoder linears (ops/layers._matmul_fast_bwd): the fwd accumulates
    # fp32, so dy arrives fp32 and the transpose GEMMs (dX = dy W^T,
    # dW = X^T dy) otherwise run the MXU in slow multi-pass fp32 mode;
    # casting dy to the operand dtype first runs them at bf16 rate.
    # MEASURED on v5e at 2x11x64000 attn_ffn remat: 150.3 -> 121.9 ms/step
    # (-19%).  dW numerics unchanged under bf16 compute (it is rounded to
    # bf16 regardless, see grad_stack_dtype note); dX gains one bf16
    # rounding of the activation gradient (<=1.5e-2 rel on the conv/early
    # leaves, tests/test_xlsr.py).  None = auto: ON under bf16 compute,
    # OFF under fp32 (where the cast is pointless and XLA's native
    # transpose is best left alone).
    grad_stack_dtype: Optional[str] = None  # 'bfloat16': cast the stacked
    # encoder matmul weights to bf16 BEFORE the layer scan, so (a) the scan
    # transpose writes the f32[24,4096,1024]-class weight-grad stacks in
    # bf16 — the round-1 profile's dW-GEMM+stack-write fusions were ~31ms
    # of a 146ms step, dominated by the fp32 epilogue writes — and (b) the
    # per-step fp32->bf16 weight converts disappear.  Each layer's dW is
    # still accumulated fp32 on the MXU, then rounded once to bf16; the
    # master params and AdamW stay fp32 (the cast's transpose upconverts
    # the gathered grads outside the scan).  BIT-IDENTICAL to the fp32
    # stacks under bf16 compute (the per-call weight cast already rounds dW
    # through bf16 — pinned in tests/test_xlsr.py), so None = auto: bf16
    # stacks under bf16 compute.  Measured with fast_bwd at 2x11x64000:
    # 121.9 -> 119.2 ms/step.  Under FP32 compute the same cast means the
    # forward itself runs on bf16-rounded weights (the linears upcast bf16
    # storage back to fp32) — a real numerics change, which is why auto
    # only enables this under bf16 compute; forcing it on an fp32 run
    # trades forward precision for grad-stack HBM.

    @property
    def effective_grad_stack_dtype(self) -> Optional[str]:
        if self.grad_stack_dtype is not None:
            return self.grad_stack_dtype
        if jnp.dtype(self.compute_dtype) == jnp.bfloat16:
            return "bfloat16"
        return None

    @property
    def use_fast_bwd(self) -> bool:
        if self.fast_bwd_matmuls is None:
            return jnp.dtype(self.compute_dtype) == jnp.bfloat16
        return self.fast_bwd_matmuls

    @property
    def approx_gelu(self) -> bool:
        if self.gelu_impl == "auto":
            return jnp.dtype(self.compute_dtype) == jnp.bfloat16
        return self.gelu_impl == "tanh"

    @property
    def head_dim(self) -> int:
        return self.encoder_dim // self.num_heads

    @property
    def out_dim(self) -> int:
        return self.encoder_dim

    def with_(self, **kw) -> "XLSRConfig":
        return replace(self, **kw)

    @classmethod
    def xlsr_300m(cls, **kw) -> "XLSRConfig":
        return cls(**kw)

    @classmethod
    def xlsr_1b(cls, **kw) -> "XLSRConfig":
        """XLS-R 1B (wav2vec2 conformer-free 'large' scaled up: 48 layers,
        1280-d, 5120 FFN — facebook/wav2vec2-xls-r-1b).  The reference only
        ships 300M; this preset feeds the same pipeline (the converter reads
        dims from the checkpoint, ``models/convert.py``).  At this scale one
        v5e chip no longer fits training without ZeRO-1 + remat; TP or
        pipeline over the encoder stack is the intended layout."""
        base = dict(encoder_dim=1280, encoder_layers=48, ffn_dim=5120,
                    num_heads=16)
        base.update(kw)
        return cls(**base)

    @classmethod
    def xlsr_2b(cls, **kw) -> "XLSRConfig":
        """XLS-R 2B (48 layers, 1920-d, 7680 FFN —
        facebook/wav2vec2-xls-r-2b)."""
        base = dict(encoder_dim=1920, encoder_layers=48, ffn_dim=7680,
                    num_heads=16)
        base.update(kw)
        return cls(**base)

    @classmethod
    def student_base(cls, **kw) -> "XLSRConfig":
        """12x768 student for ``train/distill.DistillEngine`` serving: the
        wav2vec2-base *geometry* (12 layers, 768-d, 8 heads, 3072 FFN, same
        stride-320 conv stack => same 201-frame grid as the 300M teacher, so
        KLD + frame-feature losses align without resampling).  NOT the
        fairseq GroupNorm 'base' checkpoint layout — this framework (and its
        converter) implements the layer-norm-extractor family the reference
        uses (``model/xlsr.py:15``); this preset is a distillation TARGET,
        initialized from scratch or a teacher, not from facebook/wav2vec2-base."""
        base = dict(encoder_dim=768, encoder_layers=12, ffn_dim=3072,
                    num_heads=8)
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, **kw) -> "XLSRConfig":
        """Small config for CPU tests / multichip dryruns."""
        base = dict(
            conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
            encoder_dim=32,
            encoder_layers=2,
            ffn_dim=64,
            num_heads=4,
            pos_conv_kernel=16,
            pos_conv_groups=4,
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def preset_names(cls) -> tuple:
        """Names accepted by ``--ssl_preset`` / ``--teacher_preset``."""
        return ("xlsr_300m", "xlsr_1b", "xlsr_2b", "student_base", "tiny")

    def num_frames(self, num_samples: int) -> int:
        t = num_samples
        for _, k, s in self.conv_layers:
            t = (t - k) // s + 1
        return t


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_encoder_layer(key, cfg: XLSRConfig) -> Params:
    d, f = cfg.encoder_dim, cfg.ffn_dim
    ks = jax.random.split(key, 6)
    return {
        "ln_attn": init_layer_norm(d),
        "attn": {
            "q": init_linear(ks[0], d, d),
            "k": init_linear(ks[1], d, d),
            "v": init_linear(ks[2], d, d),
            "o": init_linear(ks[3], d, d),
        },
        "ln_ffn": init_layer_norm(d),
        "fc1": init_linear(ks[4], d, f),
        "fc2": init_linear(ks[5], f, d),
    }


def init_xlsr(key, cfg: XLSRConfig) -> Params:
    keys = jax.random.split(key, 4 + len(cfg.conv_layers) + cfg.encoder_layers)
    ki = iter(keys)

    convs = []
    in_dim = 1
    for dim, kernel, _ in cfg.conv_layers:
        convs.append(
            {
                "conv": init_conv1d(next(ki), in_dim, dim, kernel, bias=cfg.conv_bias),
                "ln": init_layer_norm(dim),
            }
        )
        in_dim = dim

    layer_params = [init_encoder_layer(next(ki), cfg) for _ in range(cfg.encoder_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)

    return {
        "feature_extractor": {"convs": convs},
        "post_extract_ln": init_layer_norm(cfg.conv_layers[-1][0]),
        "proj": init_linear(next(ki), cfg.conv_layers[-1][0], cfg.encoder_dim),
        "pos_conv": init_conv1d(
            next(ki),
            cfg.encoder_dim,
            cfg.encoder_dim,
            cfg.pos_conv_kernel,
            bias=True,
            groups=cfg.pos_conv_groups,
        ),
        "encoder": {"layers": stacked, "final_ln": init_layer_norm(cfg.encoder_dim)},
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _strided_conv_gemm(p: Params, x: jnp.ndarray, kernel: int, stride: int,
                       cdtype) -> jnp.ndarray:
    """VALID strided conv1d as patch extraction + one GEMM.

    [B, T, Cin] -> patches [B, T_out, K*Cin] -> @ W [K*Cin, Cout].  The
    feature encoder's convs have tiny kernels and large channel products, so
    an explicit [B*T_out, K*Cin] x [K*Cin, Cout] matmul maps straight onto
    the MXU instead of relying on the conv lowering.
    """
    b, t, cin = x.shape
    t_out = (t - kernel) // stride + 1
    x = x.astype(cdtype)
    if stride == kernel:  # non-overlapping: a pure reshape
        patches = x[:, : t_out * stride].reshape(b, t_out, kernel * cin)
    else:
        # decompose into ceil(k/s) shifted non-overlapping views: patch rows
        # are contiguous strided reads, no gather. Rows only ever read up to
        # index t-1; zero-pad the tail so every shifted view reshapes cleanly.
        offs = list(range(0, kernel, stride))
        need = offs[-1] + t_out * stride
        if need > t:
            x = jnp.pad(x, ((0, 0), (0, need - t), (0, 0)))
        chunks = []
        for off in offs:
            width = min(stride, kernel - off)
            seg = x[:, off : off + t_out * stride]
            seg = seg.reshape(b, t_out, stride, cin)[:, :, :width]
            chunks.append(seg.reshape(b, t_out, width * cin))
        patches = jnp.concatenate(chunks, axis=-1)
    w = p["w"].reshape(kernel * cin, -1).astype(cdtype)  # [K,Cin,Cout] -> [K*Cin,Cout]
    y = jnp.einsum("btk,ko->bto", patches, w,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _strided_conv_phase(p: Params, x: jnp.ndarray, kernel: int, stride: int,
                        cdtype) -> jnp.ndarray:
    """VALID strided conv1d as k accumulated shifted GEMMs.

    y[t] = sum_j x[t*s + j] @ W[j].  Grouping taps by residue j % s turns each
    tap into a contiguous window of a deinterleaved phase view x[r::s], so the
    only data movement is s strided slices — no [B, T, K*Cin] patch tensor
    (the 'gemm' impl's concat traffic is what made it lose to XLA's conv
    lowering).  Each tap is a [B*T_out, Cin] x [Cin, Cout] MXU matmul; XLA
    fuses the adds into the dot epilogues.
    """
    b, t, cin = x.shape
    t_out = (t - kernel) // stride + 1
    if cin == 1:  # degenerate contraction (first layer): patch-GEMM instead
        return _strided_conv_gemm(p, x, kernel, stride, cdtype)
    x = x.astype(cdtype)
    w = p["w"].astype(cdtype)  # [K, Cin, Cout]
    phases = [x[:, r::stride, :] for r in range(stride)]
    y = None
    for j in range(kernel):
        seg = jax.lax.slice_in_dim(phases[j % stride], j // stride,
                                   j // stride + t_out, axis=1)
        term = jnp.einsum("btc,co->bto", seg, w[j],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        y = term if y is None else y + term
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


_CONV_IMPLS = {"conv": None, "gemm": _strided_conv_gemm, "phase": _strided_conv_phase}


def feature_encoder(params: Params, cfg: XLSRConfig, wav: jnp.ndarray) -> jnp.ndarray:
    """[B, T_samples] -> [B, T_frames, C]. Conv -> fp32 LN -> exact GELU per
    block (fairseq 'layer_norm' extractor mode)."""
    cdtype = jnp.dtype(cfg.compute_dtype)
    x = wav[..., None].astype(cdtype)
    for block, (dim, kernel, stride) in zip(
        params["feature_extractor"]["convs"], cfg.conv_layers
    ):
        impl = _CONV_IMPLS[cfg.conv_impl]
        if impl is not None:
            x = impl(block["conv"], x, kernel, stride, cdtype)
        else:
            x = conv1d(block["conv"], x, stride=stride, padding="VALID",
                       compute_dtype=cdtype)
        x = layer_norm(block["ln"], x, cfg.layer_norm_eps).astype(cdtype)
        x = gelu(x, cfg.approx_gelu)
    return x


def _pos_conv_embed(params: Params, cfg: XLSRConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Grouped conv positional embedding. Torch pads k//2 both sides then
    drops the trailing output for even kernels (fairseq SamePad); expressed
    here as asymmetric [(k//2, k//2 - 1)] padding — identical output, one
    conv, no slice."""
    k = cfg.pos_conv_kernel
    pad = [(k // 2, k // 2 - 1 if k % 2 == 0 else k // 2)]
    y = conv1d(
        params["pos_conv"],
        x,
        stride=1,
        padding=pad,
        groups=cfg.pos_conv_groups,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
    )
    return gelu(y, cfg.approx_gelu)


def _encoder_layer(
    layer: Params,
    cfg: XLSRConfig,
    x: jnp.ndarray,
    kv_len: Optional[int],
    rngs: Optional[jax.Array],
    deterministic: bool,
) -> jnp.ndarray:
    """Pre-norm transformer layer (fairseq ``layer_norm_first=True``)."""
    cdtype = jnp.dtype(cfg.compute_dtype)
    b, t, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    if rngs is not None:
        r_attn, r_res1, r_act, r_res2 = jax.random.split(rngs, 4)
    else:
        r_attn = r_res1 = r_act = r_res2 = None

    # self-attention block
    y = layer_norm(layer["ln_attn"], x, cfg.layer_norm_eps)
    if cfg.fuse_qkv:
        # single [D, 3D] GEMM; the weight concat is loop-invariant reads the
        # scheduler overlaps with compute
        a = layer["attn"]
        wqkv = jnp.concatenate(
            [a["q"]["w"], a["k"]["w"], a["v"]["w"]], axis=-1
        )
        bqkv = jnp.concatenate([a["q"]["b"], a["k"]["b"], a["v"]["b"]])
        # through linear() so the fused GEMM gets the same fast-backward
        # (bf16-cotangent transpose) treatment as the unfused q/k/v path
        qkv = linear({"w": wqkv, "b": bqkv}, y, cdtype,
                     fast_bwd=cfg.use_fast_bwd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q * (hd**-0.5)
    else:
        fb = cfg.use_fast_bwd
        q = linear(layer["attn"]["q"], y, cdtype, fast_bwd=fb) * (hd**-0.5)
        k = linear(layer["attn"]["k"], y, cdtype, fast_bwd=fb)
        v = linear(layer["attn"]["v"], y, cdtype, fast_bwd=fb)
    q, k, v = (
        z.reshape(b, t, h, hd).transpose(0, 2, 1, 3).astype(cdtype) for z in (q, k, v)
    )
    # attention-prob dropout is fused away on the flash path; applied only
    # when a rate is configured (XLS-R ships 0.0)
    attn = self_attention(q, k, v, kv_len=kv_len, impl=cfg.attention_impl)
    if cfg.attention_dropout > 0.0:
        attn = dropout(r_attn, attn, cfg.attention_dropout, deterministic)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, t, d)
    attn = linear(layer["attn"]["o"], attn, cdtype,
                  fast_bwd=cfg.use_fast_bwd)
    # named for the selective remat policies ('attn' / 'attn_ffn')
    attn = jax.ad_checkpoint.checkpoint_name(attn, "attn_out")
    x = x + dropout(r_res1, attn, cfg.dropout, deterministic).astype(x.dtype)

    # feed-forward block
    y = layer_norm(layer["ln_ffn"], x, cfg.layer_norm_eps)
    y = gelu(linear(layer["fc1"], y, cdtype, fast_bwd=cfg.use_fast_bwd),
             cfg.approx_gelu)
    y = jax.ad_checkpoint.checkpoint_name(y, "ffn_act")
    y = dropout(r_act, y, cfg.activation_dropout, deterministic)
    y = linear(layer["fc2"], y, cdtype, fast_bwd=cfg.use_fast_bwd)
    x = x + dropout(r_res2, y, cfg.dropout, deterministic).astype(x.dtype)
    return x


def transformer_encoder(
    params: Params,
    cfg: XLSRConfig,
    x: jnp.ndarray,
    kv_len: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Pre-norm stack over stacked layer params via ``lax.scan``."""
    x = x + _pos_conv_embed(params, cfg, x).astype(x.dtype)
    if rng is not None:
        # fold_in domain is uint32; use sentinels far above any layer index
        x = dropout(jax.random.fold_in(rng, 1_000_001), x, cfg.dropout, deterministic)

    stacked = params["encoder"]["layers"]
    if cfg.effective_grad_stack_dtype is not None:
        # cast the stacked matmul weights (3D leaves [L, in, out]) once,
        # outside the scan: the scan transpose then stacks their grads in
        # this dtype and the per-step weight converts vanish; biases and LN
        # params (2D) stay fp32 (see XLSRConfig.grad_stack_dtype)
        gdt = jnp.dtype(cfg.effective_grad_stack_dtype)
        stacked = jax.tree.map(
            lambda a: a.astype(gdt)
            if (a.ndim == 3 and a.dtype == jnp.float32)
            else a,
            stacked,
        )
    num_layers = jax.tree.leaves(stacked)[0].shape[0]
    rngs = (
        jax.random.split(rng, num_layers)
        if (rng is not None and not deterministic)
        else None
    )

    def body(carry, scanned):
        layer = scanned["layer"]
        r = scanned["rng"] if rngs is not None else None
        return _encoder_layer(layer, cfg, carry, kv_len, r, deterministic), None

    rematted = body
    if cfg.remat:
        if cfg.remat_policy == "dots":
            rematted = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif cfg.remat_policy in ("attn", "attn_ffn"):
            names = ("attn_out",) if cfg.remat_policy == "attn" else (
                "attn_out", "ffn_act")
            rematted = jax.checkpoint(
                body,
                policy=jax.checkpoint_policies.save_only_these_names(*names),
            )
        else:
            rematted = jax.checkpoint(body)

    def scan_layers(fn, x, lo, hi):
        scanned = {"layer": jax.tree.map(lambda a: a[lo:hi], stacked)}
        if rngs is not None:
            scanned["rng"] = rngs[lo:hi]
        x, _ = jax.lax.scan(fn, x, scanned, unroll=cfg.scan_unroll)
        return x

    # optionally keep the last remat_tail_full layers un-rematted: their
    # backward starts first, so excluding them trims the recompute forward
    # where HBM headroom allows (each saved layer holds its internals live)
    tail = min(cfg.remat_tail_full, num_layers) if cfg.remat else 0
    x = scan_layers(rematted, x, 0, num_layers - tail)
    if tail:
        x = scan_layers(body, x, num_layers - tail, num_layers)
    return layer_norm(params["encoder"]["final_ln"], x, cfg.layer_norm_eps)


def extract_features(
    params: Params,
    cfg: XLSRConfig,
    wav: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """wav [B, T_samples] -> frame features [B, T_frames, encoder_dim].

    Equivalent of ``SSLModel.extract_feat`` (reference ``model/xlsr.py:23-43``):
    raw waveform in (no input normalization — the reference calls the bare
    Wav2Vec2Model), conv features -> fp32 LN -> projection -> transformer.
    """
    if wav.ndim == 3:  # accept [B, T, 1] like the reference's ndim fixup
        wav = wav[:, :, 0]
    cdtype = jnp.dtype(cfg.compute_dtype)
    x = feature_encoder(params, cfg, wav)
    x = layer_norm(params["post_extract_ln"], x, cfg.layer_norm_eps)
    # keep the residual stream in the compute dtype: linears accumulate in
    # fp32 on the MXU, but carrying fp32 activations between layers doubles
    # HBM traffic for no accuracy benefit (layernorm re-normalizes in fp32)
    x = linear(params["proj"], x, cdtype,
               fast_bwd=cfg.use_fast_bwd).astype(cdtype)
    if rng is not None:
        x = dropout(jax.random.fold_in(rng, 1_000_002), x, cfg.dropout, deterministic)
    return transformer_encoder(params, cfg, x, rng=rng, deterministic=deterministic)
