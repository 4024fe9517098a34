"""Score-analysis CLI modes — no model, no device, no jax import.

These replace the reference's ``Result.ipynb`` / ``evaluate_metrics.py``
post-processing (SURVEY §2 A16/A17) as first-class CLI modes; each reads
score/protocol text files and prints a report.
"""

from __future__ import annotations

import os
import sys


def dispatch(args):
    """Run the analysis-family mode selected by ``args``, if any.

    Returns the exit code, or None when no analysis mode was requested
    (the caller then builds the model-bearing runtime).  Order matches the
    original single-function dispatch: average/compare/fuse/calibration
    fits before --analyze.
    """
    if args.average_ckpts:
        return run_average_ckpts(args)
    if args.compare:
        return run_compare(args)
    if args.fuse:
        return run_fuse(args)
    if args.fit_calibration:
        return run_fit_calibration(args)
    if args.analyze:
        return run_analyze(args)
    return None


def run_average_ckpts(args) -> int:
    from scl_deepfake_audio_detection_tpu.train import checkpoint as _ckpt

    paths = [p_.strip() for p_ in args.average_ckpts.split(",")
             if p_.strip()]
    out = args.avg_out or "averaged.ckpt"
    try:
        avg, _ = _ckpt.average_checkpoints(paths, out_path=out)
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 2
    nbytes = sum(a.nbytes for a in avg.values())
    print(f"averaged {len(paths)} checkpoints ({len(avg)} leaves, "
          f"{nbytes/1e6:.1f} MB) -> {out}; eval/serve/export it with "
          f"--model_path {out}")
    return 0


def run_compare(args) -> int:
    from scl_deepfake_audio_detection_tpu.train.analysis import (
        paired_system_scores,
    )
    from scl_deepfake_audio_detection_tpu.train.metrics import (
        compute_eer,
        eer_diff_bootstrap,
    )

    if not args.protocol:
        print("--compare requires --protocol", file=sys.stderr)
        return 2
    pa, pb = (x.strip() for x in args.compare.split(",", 1))
    n_boot = args.bootstrap_ci or 1000
    ta, na, tb, nb_ = paired_system_scores(pa, pb, args.protocol,
                                           fmt=args.score_format,
                                           subset=args.subset)
    ea, _ = compute_eer(ta, na)
    eb, _ = compute_eer(tb, nb_)
    d, lo, hi, pv = eer_diff_bootstrap(ta, na, tb, nb_, n_boot=n_boot)
    verdict = ("A better" if hi < 0 else
               "B better" if lo > 0 else "not significant")
    print(f"A {pa}: EER {100*ea:.4f}%")
    print(f"B {pb}: EER {100*eb:.4f}%")
    print(f"paired EER difference A-B: {100*d:+.4f}% "
          f"(95% CI [{100*lo:+.4f}%, {100*hi:+.4f}%], "
          f"p={pv:.4f}, {n_boot} paired resamples) -> {verdict}")
    return 0


def run_fuse(args) -> int:
    from scl_deepfake_audio_detection_tpu.train.analysis import (
        fit_fusion,
        write_fused_scores,
    )

    if not args.protocol:
        print("--fuse requires --protocol (dev labels)", file=sys.stderr)
        return 2
    paths = [p_.strip() for p_ in args.fuse.split(",") if p_.strip()]
    w, b, rep = fit_fusion(paths, args.protocol, fmt=args.score_format,
                           subset=args.subset)
    for sysr in rep["systems"]:
        print(f"system {sysr['path']}: EER {100*sysr['eer']:.4f}%")
    print(f"fused ({rep['n_matched']} labeled / {rep['n_common']} common "
          f"utts): EER {100*rep['fused']['eer']:.4f}%, "
          f"Cllr {rep['fused']['cllr']:.4f} bits; "
          f"weights={[round(float(x), 6) for x in w]} bias={b:.6f}")
    if args.fuse_eval and args.fuse_out:
        eval_paths = [p_.strip() for p_ in args.fuse_eval.split(",")
                      if p_.strip()]
        if len(eval_paths) != len(paths):
            print("--fuse_eval must list one file per --fuse system",
                  file=sys.stderr)
            return 2
        n = write_fused_scores(eval_paths, w, b, args.fuse_out,
                               fmt=args.score_format)
        print(f"wrote {n} fused scores -> {args.fuse_out}")
    return 0


def run_fit_calibration(args) -> int:
    from scl_deepfake_audio_detection_tpu.train.analysis import (
        matched_scores,
    )
    from scl_deepfake_audio_detection_tpu.train.calibration import (
        apply_calibration,
        cllr,
        logistic_calibration,
    )

    if not args.protocol:
        print("--fit_calibration requires --protocol", file=sys.stderr)
        return 2
    tar, non = matched_scores(args.fit_calibration, args.protocol,
                              fmt=args.score_format, subset=args.subset)
    a, b = logistic_calibration(tar, non)
    before = cllr(tar, non)
    after = cllr(apply_calibration(tar, a, b), apply_calibration(non, a, b))
    print(f"calibration: a={a:.6f} b={b:.6f} "
          f"(Cllr {before:.4f} -> {after:.4f} bits); "
          f"pass --calibrate {a:.6f},{b:.6f} to --serve")
    return 0


def run_analyze(args) -> int:
    from scl_deepfake_audio_detection_tpu.train.analysis import score_report

    if not args.protocol:
        print("--analyze requires --protocol", file=sys.stderr)
        return 2
    score_path = args.analyze
    cleanup_merged = None
    if not os.path.exists(score_path):
        # glob (e.g. 'scores.txt.part*' from --multihost eval): merge the
        # per-host shards into one temp file for analysis
        import glob as _glob
        import tempfile

        parts = sorted(_glob.glob(score_path))
        if not parts:
            print(f"no score file matches {score_path}", file=sys.stderr)
            return 2
        merged = tempfile.NamedTemporaryFile(
            "w", suffix=".scores.txt", delete=False
        )
        with merged as f:
            for p in parts:
                text = open(p).read()
                f.write(text if text.endswith("\n") else text + "\n")
        print(f"merged {len(parts)} score shards")
        score_path = merged.name
        cleanup_merged = merged.name
    try:
        rep = score_report(score_path, args.protocol, fmt=args.score_format,
                           subset=args.subset, per_attack=args.per_attack,
                           bootstrap_ci=args.bootstrap_ci)
        # join ONCE for every extra that needs raw arrays (cllr, t-DCF
        # in json mode, plots) instead of re-parsing per flag
        tar = non = None
        if (args.cllr or args.plot or args.plot_det
                or (args.asv_scores and args.json)):
            from scl_deepfake_audio_detection_tpu.train.analysis import (
                matched_scores,
            )

            tar, non = matched_scores(score_path, args.protocol,
                                      fmt=args.score_format,
                                      subset=args.subset)
        out = rep.to_dict() if args.json else None
        if not args.json:
            print(rep)
        if args.cllr:
            from scl_deepfake_audio_detection_tpu.train.calibration import (
                cllr,
                min_cllr,
            )

            c, mc = cllr(tar, non), min_cllr(tar, non)
            if args.json:
                out["cllr"] = c
                out["min_cllr"] = mc
            else:
                print(f"Cllr: {c:.4f} bits (scores as LLRs); "
                      f"minCllr: {mc:.4f} bits")
        if args.asv_scores:
            if args.json:
                from scl_deepfake_audio_detection_tpu.train.analysis import (
                    _joined_trials,
                    load_asv_scores,
                )
                from scl_deepfake_audio_detection_tpu.train.metrics import (
                    compute_eer,
                    min_tdcf,
                )

                tar_a, non_a, spoof_a = load_asv_scores(args.asv_scores)
                val, thr = min_tdcf(tar, non, tar_a, non_a, spoof_a,
                                    version=args.tdcf_version)
                out["min_tdcf"] = {"version": args.tdcf_version,
                                   "value": val, "cm_threshold": thr}
                if args.per_attack:
                    # same breakdown the text surface prints: each
                    # attack vs all bonafide at the pooled ASV point
                    _, _, by_atk = _joined_trials(
                        score_path, args.protocol,
                        fmt=args.score_format, subset=args.subset)
                    _, asv_thr = compute_eer(tar_a, non_a)
                    out["min_tdcf"]["per_attack"] = {
                        atk: min_tdcf(tar, ss, tar_a, non_a, spoof_a,
                                      version=args.tdcf_version,
                                      asv_threshold=asv_thr)[0]
                        for atk, ss in sorted(by_atk.items())
                    }
            else:
                from scl_deepfake_audio_detection_tpu.train.analysis import (
                    tdcf_report,
                )

                print(tdcf_report(score_path, args.protocol,
                                  args.asv_scores,
                                  version=args.tdcf_version,
                                  fmt=args.score_format,
                                  subset=args.subset,
                                  per_attack=args.per_attack))
        if args.plot_det:
            from scl_deepfake_audio_detection_tpu.train.analysis import (
                plot_det_curve,
            )

            path = plot_det_curve(tar, non, args.plot_det)
            if args.json:
                out["det_plot"] = path
            else:
                print(f"DET curve -> {path}")
        if args.plot:
            from scl_deepfake_audio_detection_tpu.train.analysis import (
                plot_score_distributions,
            )

            path = plot_score_distributions(tar, non, args.plot,
                                            threshold=rep.threshold)
            if args.json:
                out["distribution_plot"] = path
            else:
                print(f"score distribution figure -> {path}")
        if args.json:
            import json as _json

            print(_json.dumps(out))
    finally:
        if cleanup_merged:
            os.unlink(cleanup_merged)
    return 0
