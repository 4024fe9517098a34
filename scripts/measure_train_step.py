#!/usr/bin/env python
"""Train-step timing on real TPU: differenced lax.scan (cancels the tunnel's
per-dispatch overhead — see CLAUDE.md / ROADMAP perf log).

Usage: python scripts/measure_train_step.py [k1] [k2] [--bf16]
       [--fast_bwd | --no_fast_bwd] [--remat POLICY]
Prints ms/step for the conf-3 training shape (2 groups x 11 views x 64000
samples, XLS-R 300M + linear head, bf16 compute).  Remat policy defaults
to the production default (XLSRConfig.remat_policy — 'attn' since the
round-2 fast-backward re-sweep); pass --remat attn_ffn/full/dots to sweep.
k1/k2 are the two scan lengths to difference (default 3 and 9) and may be
given in any position relative to the flags.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from scl_deepfake_audio_detection_tpu.models.linear_nll import LinearNLL
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.train.optim import (
        make_optimizer,
        set_learning_rate,
    )

    argv = list(sys.argv[1:])
    remat_policy = XLSRConfig.remat_policy
    if "--remat" in argv:
        i = argv.index("--remat")
        remat_policy = argv[i + 1]
        del argv[i : i + 2]
    positional = [a for a in argv if not a.startswith("--")]
    k1 = int(positional[0]) if len(positional) > 0 else 3
    k2 = int(positional[1]) if len(positional) > 1 else 9
    bf16_stacks = "--bf16" in argv
    # auto (None) = ON under bf16 compute; --no_fast_bwd forces the old path
    fast_bwd = (True if "--fast_bwd" in argv
                else False if "--no_fast_bwd" in argv else None)

    ssl = XLSRConfig.xlsr_300m(
        compute_dtype="bfloat16", remat=True, remat_policy=remat_policy,
        grad_stack_dtype="bfloat16" if bf16_stacks else None,
        fast_bwd_matmuls=fast_bwd,
    )
    print(f"remat_policy={remat_policy}")
    print(f"grad_stack_dtype={ssl.grad_stack_dtype} "
          f"fast_bwd={ssl.use_fast_bwd}")
    model = LinearNLL(ssl=ssl)
    optimizer = make_optimizer(1e-4)
    params = jax.jit(model.init)(jax.random.key(0))
    opt_state = optimizer.init(params)
    opt_state = set_learning_rate(opt_state, 1e-5)

    g, v, t = 2, 11, 64000
    rng = np.random.default_rng(0)
    batch = {
        "wav": jnp.asarray(rng.normal(size=(g, v, t)).astype(np.float32) * 0.1),
        "labels": jnp.asarray(
            np.tile(np.array([1] * 5 + [0] * 6, np.float32), (g, 1))
        ),
    }

    from scl_deepfake_audio_detection_tpu.utils.measure import (
        train_ms_per_step,
    )

    ms = train_ms_per_step(
        model, optimizer, params, opt_state, batch, k1=k1, k2=k2,
        loss_scope="group",
    )
    print(f"differenced: {ms:.1f} ms/step at {g}x{v}x{t}")


if __name__ == "__main__":
    main()
