"""Command-line interface.

Flag-compatible with the reference ``main.py:216-300`` (same hyperparameter,
eval-mode and RawBoost flags; same output-dir naming) so the shell workflows
in ``02_train.sh``/``03_eval.sh`` port over by swapping the program name —
see ``cli.flags`` for the full surface.

One module per mode family, dispatched here in a fixed order:
  ``cli.analyze``   score analysis (no model, no jax)
  ``cli.train``     training / distillation + --show_params / --warm_cache
  ``cli.export``    AOT export, export verification, reverse migration,
                    weights-day parity check
  ``cli.serve``     persistent stdin / HTTP scoring services
  ``cli.evaluate``  eval-list scoring (--eval / --predict / --emb)
``cli.context`` builds the shared runtime (mesh, model, params) in phases so
each mode pays only for the state it reads.
"""

from __future__ import annotations

import sys

from .flags import build_parser

__all__ = ["build_parser", "main"]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .common import CliError

    try:
        return _dispatch(args)
    except CliError as e:
        if e.message:
            print(e.message, file=sys.stderr)
        return e.code


def _dispatch(args) -> int:
    # analysis family first: these read score/protocol text files only and
    # must never pay a jax import or device init (so the SCL_PLATFORM block
    # below — which imports jax — must come after)
    from . import analyze

    rc = analyze.dispatch(args)
    if rc is not None:
        return rc

    from .common import CliError

    if (args.predict or args.emb) and not args.eval:
        # the reference dispatches --predict/--emb inside --eval
        # (main.py --eval); without the guard this would fall through to
        # training mode with no optimizer state and crash deep in engine.fit
        raise CliError(2, "--predict/--emb select an output format for "
                          "--eval scoring: pass --eval as well")

    # SCL_PLATFORM=cpu|tpu pins the jax backend for subprocess drivers
    # (weights-day rehearsal, CI) where flags can't reach in: the site
    # plugin overrides JAX_PLATFORMS, so only the config knob sticks
    # (CLAUDE.md "Environment quirks").  Unset = jax's own default.
    import os

    plat = os.environ.get("SCL_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    from . import context

    ctx = context.build_runtime(args)

    from . import train as train_mode

    if args.show_params:
        return train_mode.run_show_params(args, ctx)
    if args.warm_cache:
        return train_mode.run_warm_cache(args, ctx)

    context.load_model_state(ctx)

    from . import export as export_mode

    # reverse migration runs on the RAW loaded pytree — before init_state
    # places params on the mesh / allocates optimizer moments
    if args.export_reference_ckpt:
        return export_mode.run_export_reference_ckpt(args, ctx)

    context.init_state(ctx)

    if args.parity_check:
        return export_mode.run_parity_check(args, ctx)
    if args.verify_export:
        return export_mode.run_verify_export(args, ctx)
    if args.export_model:
        return export_mode.run_export_model(args, ctx)

    if args.serve or args.serve_http is not None:
        from . import serve as serve_mode

        return serve_mode.run(args, ctx)

    if args.eval:
        from . import evaluate as eval_mode

        return eval_mode.run(args, ctx)

    return train_mode.run(args, ctx)
