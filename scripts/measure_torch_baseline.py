#!/usr/bin/env python
"""Measure the reference model's eval throughput in torch on this host.

The reference publishes NO throughput numbers (BASELINE.md:19) and no GPU is
available here, so the only measurable baseline is the reference
architecture — HF's stable-layer-norm Wav2Vec2 at XLS-R-300M dims, the same
network fairseq builds from ``xlsr2_300m.pt`` (reference ``model/xlsr.py:15``)
plus the linear-NLL head — run in torch on the CPU this image provides.
That is a *documented proxy*, not a GPU number: its purpose is (a) a
same-silicon software comparison against this framework's CPU backend and
(b) a recorded absolute denominator so ``bench.py`` can emit a non-null
``vs_baseline`` mechanically each round.

Writes ``BASELINE_MEASURED.json`` at the repo root; run once per image.
"""

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def torch_reference_throughput(batch=1, samples=64600, iters=2, warmup=1):
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    cfg = Wav2Vec2Config(  # facebook/wav2vec2-xls-r-300m architecture
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=16,
        intermediate_size=4096,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        conv_bias=True,
    )
    ssl = Wav2Vec2Model(cfg).eval()
    # the reference head: Linear 1024->128 -> ReLU -> 3x(Linear+LeakyReLU)
    # -> mean pool -> Linear 128->2 (wav2vec2_linear_nll.py:49-67,107,114)
    head = torch.nn.Sequential(
        torch.nn.Linear(1024, 128), torch.nn.ReLU(),
        torch.nn.Linear(128, 128), torch.nn.LeakyReLU(),
        torch.nn.Linear(128, 128), torch.nn.LeakyReLU(),
        torch.nn.Linear(128, 128), torch.nn.LeakyReLU(),
    ).eval()
    out_lin = torch.nn.Linear(128, 2).eval()
    wav = torch.from_numpy(
        np.random.default_rng(0).normal(size=(batch, samples)).astype(np.float32)
        * 0.1
    )
    with torch.no_grad():
        for _ in range(warmup):
            feats = ssl(wav).last_hidden_state
            _ = out_lin(head(feats).mean(1))
        t0 = time.perf_counter()
        for _ in range(iters):
            feats = ssl(wav).last_hidden_state
            scores = out_lin(head(feats).mean(1))
        dt = time.perf_counter() - t0
    assert torch.isfinite(scores).all()
    return batch * iters / dt, dt / iters


def main():
    import torch

    utt_s, sec_per = torch_reference_throughput()
    result = {
        "torch_cpu_reference_utt_per_sec": round(utt_s, 4),
        "torch_cpu_seconds_per_utt": round(sec_per, 3),
        "what": "XLS-R-300M (HF stable-LN Wav2Vec2, random init — throughput "
                "is weight-independent) + linear NLL head, batch 1, 64600 "
                "samples, fp32 eval forward",
        "host": f"{os.cpu_count()} CPU core(s), torch {torch.__version__}",
        "caveat": "CPU proxy: the reference ran on an unspecified CUDA GPU "
                  "and published no throughput; this is the only "
                  "same-image measurable denominator (BASELINE.md:19)",
    }
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
