"""Shared helpers for the per-mode CLI modules."""

from __future__ import annotations

import os


class CliError(Exception):
    """A mode-dispatch failure: ``main()`` prints ``message`` to stderr and
    exits with ``code`` (2 = usage error, matching argparse's convention)."""

    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code
        self.message = message


def parse_calibration(spec):
    """Parse a ``--calibrate 'a,b'`` spec; usage error (exit 2) on anything
    that isn't exactly two floats."""
    if not spec:
        return None
    try:
        cal = tuple(float(x) for x in spec.split(","))
    except ValueError:
        raise CliError(2, f"--calibrate expects 'a,b' (two floats), got "
                          f"{spec!r}")
    if len(cal) != 2:
        raise CliError(2, f"--calibrate expects 'a,b' (two floats), got "
                          f"{spec!r}")
    return cal


def _build_model(args, cfg):
    from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
    from scl_deepfake_audio_detection_tpu.utils.registry import MODELS

    # remat trades recompute for activation memory in the backward pass —
    # required to fit 300M-param training on one chip; free at eval (fwd only)
    gsd = "bfloat16" if getattr(args, "bf16_grads", False) else None
    preset = getattr(XLSRConfig, args.ssl_preset)
    ssl = preset(compute_dtype=args.compute_dtype, remat=True,
                 grad_stack_dtype=gsd)
    cls = MODELS.get(cfg.model.name)
    model = cls.from_config(cfg.model, ssl=ssl)
    return model


def _init_params(args, model, rng_key):
    import jax

    # one compiled init program: eager init dispatches one tiny RNG program
    # per parameter — hundreds of device round trips, minutes over a
    # remote-tunneled chip (same rationale as Engine.init_state)
    params = jax.jit(model.init)(rng_key)
    if args.ssl_checkpoint:
        from scl_deepfake_audio_detection_tpu.models import convert

        if os.path.isdir(args.ssl_checkpoint):
            ssl_params, _ = convert.load_hf_pretrained(args.ssl_checkpoint)
        else:
            ssl_params, _ = convert.load_fairseq_checkpoint(args.ssl_checkpoint)
        params["ssl"] = ssl_params
        print(f"loaded pretrained SSL from {args.ssl_checkpoint}")
    return params
