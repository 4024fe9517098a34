"""Analytic FLOP counts for the flagship scoring/training shapes.

Turns bench.py's measured rates into MFU (model FLOPs utilization) so the
numbers are hardware-interpretable across rounds and chips.  Counts follow
the standard MFU convention (PaLM appendix B): matmul/conv FLOPs only
(2·M·N·K per GEMM), softmax/LN/GELU excluded, and for training the
theoretical fwd+bwd cost (3x the forward's matmul FLOPs) — remat recompute
is NOT counted (that would be HFU, hardware FLOPs utilization).

The denominator is the PUBLISHED v5e bf16 peak (197 TFLOP/s — jax.devices()
reports "TPU v5 lite"), the standard MFU convention, so numbers compare
across chips and papers.  For calibration: a plain big bf16 GEMM measured
190.2 TFLOP/s attainable on this chip ([16384,4096]x[4096,4096], 1000
chained iterations, scripts/measure_peak_gemm.py, round 4) = 96.5 % of
published peak, so MFU here tops out around ~96, not 100.  (The round-2
int8 study's "256 TFLOP/s" exceeded the hardware peak and was a timing
artifact — too few iterations against the tunnel's early-returning
readback; re-pinned round 4 with 600-2000-iteration runs.)
"""

from __future__ import annotations

# Published v5e bf16 peak — the MFU denominator (standard convention).
PUBLISHED_V5E_BF16_PEAK_FLOPS = 197e12
# Measured attainable big-GEMM rate on this chip (96.5 % of published;
# scripts/measure_peak_gemm.py — re-measure on new hardware).
MEASURED_ATTAINABLE_BF16_FLOPS = 190e12


def conv_encoder_flops(cfg, samples: int) -> int:
    """Matmul-equivalent FLOPs of the wav2vec2 conv feature extractor for
    ONE utterance of ``samples`` samples (reference model/xlsr.py:18-20 via
    fairseq ConvFeatureExtractionModel): 2·T_out·C_out·C_in·K per layer."""
    flops = 0
    t, c_in = samples, 1
    for c_out, k, s in cfg.conv_layers:
        t = (t - k) // s + 1
        flops += 2 * t * c_out * c_in * k
        c_in = c_out
    return flops


def encoder_flops(cfg, frames: int) -> int:
    """Matmul FLOPs of the transformer encoder stack for one utterance at
    ``frames`` frames: per layer 4 projections (8·T·D^2), scores + AV
    einsums (4·T^2·D), and the FFN pair (4·T·D·F); plus the grouped
    positional conv and the 512->D feature projection once."""
    d, f = cfg.encoder_dim, cfg.ffn_dim
    t = frames
    per_layer = 8 * t * d * d + 4 * t * t * d + 4 * t * d * f
    pos_conv = 2 * t * d * (d // cfg.pos_conv_groups) * cfg.pos_conv_kernel
    feat_proj = 2 * t * cfg.conv_layers[-1][0] * d
    return cfg.encoder_layers * per_layer + pos_conv + feat_proj


def linear_nll_head_flops(cfg, frames: int,
                          emb_dim: int = 128, mlp_layers: int = 3,
                          num_classes: int = 2) -> int:
    """Matmul FLOPs of the LinearNLL head (models/linear_nll.py) for one
    utterance: LL D->128, 3-layer 128->128 frame MLP, 128->classes out."""
    t = frames
    return (2 * t * cfg.out_dim * emb_dim
            + mlp_layers * 2 * t * emb_dim * emb_dim
            + 2 * emb_dim * num_classes)


def forward_flops(cfg, samples: int, batch: int = 1,
                  include_head: bool = True) -> int:
    """Total matmul FLOPs of one scoring forward at [batch, samples]."""
    frames = cfg.num_frames(samples)
    per_item = conv_encoder_flops(cfg, samples) + encoder_flops(cfg, frames)
    if include_head:
        per_item += linear_nll_head_flops(cfg, frames)
    return batch * per_item


def train_step_flops(cfg, samples: int, views: int) -> int:
    """Theoretical matmul FLOPs of one train step over ``views`` utterances
    (groups x views flattened): 3x the forward under the standard MFU
    convention (bwd = 2x fwd; remat recompute excluded by definition)."""
    return 3 * forward_flops(cfg, samples, batch=views)


def mfu(flops: int, seconds: float,
        peak: float = PUBLISHED_V5E_BF16_PEAK_FLOPS) -> float:
    """Fraction of peak: (analytic FLOPs / measured seconds) / peak."""
    return flops / seconds / peak
