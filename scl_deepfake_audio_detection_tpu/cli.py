"""Command-line interface.

Flag-compatible with the reference ``main.py:216-300`` (same hyperparameter,
eval-mode and RawBoost flags; same output-dir naming) so the shell workflows
in ``02_train.sh``/``03_eval.sh`` port over by swapping the program name.
Additions over the reference:
  --analyze/--protocol   in-framework EER reporting (replaces Result.ipynb)
  --ssl_checkpoint       load pretrained SSL weights (fairseq .pt or HF dir)
  --ssl_preset tiny      small-architecture run for smoke tests / CI
  --groups_per_step      anchor groups per sharded train step (global batch)
  --mesh data,model      device-mesh shape
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time



def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native SCL deepfake-audio detection")
    p.add_argument("--database_path", type=str, default="/your/path/to/data/")
    # hyperparameters (reference main.py:226-241)
    p.add_argument("--batch_size", type=int, default=1,
                   help="eval batch size; alias for --groups_per_step in training")
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--min_lr", type=float, default=1e-8)
    p.add_argument("--max_lr", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--loss", type=str, default="weighted_CCE")
    p.add_argument("--config", type=str, default="configs/conf-3-linear.yaml")
    p.add_argument("--padding_type", type=str, default="zero", choices=["zero", "repeat"])
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--model_path", type=str, default=None, help="checkpoint to load")
    p.add_argument("--comment", type=str, default=None)
    # NII entry-config optimizer knobs (reference
    # core_scripts/config_parse/arg_parse.py:26ff --grad-clip-norm /
    # --accumulate; implemented in train/optim.py::make_optimizer)
    p.add_argument("--grad_clip_norm", type=float, default=None,
                   help="clip gradients to this global norm before the "
                        "optimizer update (default: no clipping)")
    p.add_argument("--grad_accum_steps", type=int, default=1,
                   help="accumulate gradients over N steps before applying "
                        "one optimizer update (optax.MultiSteps)")
    # eval modes (reference main.py:247-254)
    p.add_argument("--eval_output", type=str, default=None)
    p.add_argument("--eval", action="store_true", default=False)
    p.add_argument("--predict", action="store_true", default=False)
    p.add_argument("--emb", action="store_true", default=False)
    # RawBoost knobs (reference main.py:258-298)
    p.add_argument("--algo", type=int, default=5)
    p.add_argument("--nBands", type=int, default=5)
    p.add_argument("--minF", type=int, default=20)
    p.add_argument("--maxF", type=int, default=8000)
    p.add_argument("--minBW", type=int, default=100)
    p.add_argument("--maxBW", type=int, default=1000)
    p.add_argument("--minCoeff", type=int, default=10)
    p.add_argument("--maxCoeff", type=int, default=100)
    p.add_argument("--minG", type=int, default=0)
    p.add_argument("--maxG", type=int, default=0)
    p.add_argument("--minBiasLinNonLin", type=int, default=5)
    p.add_argument("--maxBiasLinNonLin", type=int, default=20)
    p.add_argument("--N_f", type=int, default=5)
    p.add_argument("--P", type=int, default=10)
    p.add_argument("--g_sd", type=int, default=2)
    p.add_argument("--SNRmin", type=int, default=10)
    p.add_argument("--SNRmax", type=int, default=40)
    # TPU-native additions
    p.add_argument("--groups_per_step", type=int, default=None,
                   help="anchor groups per train step (default: batch_size)")
    p.add_argument("--mesh", type=str, default=None, help="mesh shape, e.g. 8,1")
    p.add_argument("--loss_scope", type=str, default="group", choices=["group", "global"])
    p.add_argument("--zero1", action="store_true", default=False,
                   help="shard AdamW moments over the data axis (ZeRO-1)")
    p.add_argument("--decode_cache", type=str, default=None,
                   help="dir for the packed eval decode cache (PCM16 memmap; "
                        "built on first eval run, reused by later sweeps)")
    p.add_argument("--serve", action="store_true", default=False,
                   help="persistent scorer: read wav paths (or 'id\\tpath') "
                        "from stdin, write 'id\\tscore' lines; one warm "
                        "compiled program, no per-request startup cost")
    p.add_argument("--multihost", action="store_true", default=False,
                   help="TPU pod mode: jax.distributed.initialize(); train "
                        "shards loader streams per process over the global "
                        "mesh, eval splits the file list and writes "
                        "<out>.part<k> per host")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--ssl_checkpoint", type=str, default=None,
                   help="pretrained SSL: fairseq xlsr2_300m.pt or HF model dir")
    p.add_argument("--ssl_preset", type=str, default="xlsr_300m",
                   choices=["xlsr_300m", "xlsr_1b", "xlsr_2b",
                            "student_base", "tiny"],
                   help="SSL frontend size: xlsr_300m (reference scale), "
                        "xlsr_1b/2b (need --mesh tp and/or --zero1 — see "
                        "parallel/memory.py for per-chip HBM estimates), "
                        "student_base (12x768 distillation student), tiny "
                        "(CPU smoke tests)")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--out_dir", type=str, default="out")
    p.add_argument("--tensorboard_dir", type=str, default=None,
                   help="tensorboard scalar logs (default: <out>/<tag>/logs)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the first epoch")
    p.add_argument("--device_aug", action="store_true", default=False,
                   help="compose view batches on the accelerator (RawBoost/"
                        "noise/reverb as one jit program; host only decodes)")
    p.add_argument("--snr_mode", type=str, default="reference",
                   choices=["reference", "rms"],
                   help="--device_aug noise/reverb semantics: 'reference' = "
                        "the pydub gain formula + int16-amplitude quirk "
                        "(matches the host/reference training distribution); "
                        "'rms' = textbook RMS-power SNR mix at signal scale")
    p.add_argument("--jax_cache", type=str, default="/tmp/scl_tpu_jax_cache",
                   help="persistent XLA compilation cache dir ('' disables); "
                        "repeat CLI runs skip the ~30s first compile")
    p.add_argument("--wire_dtype", type=str, default="float32",
                   choices=["float32", "int16"],
                   help="host->device wire format for eval batches and "
                        "--device_aug raw stacks; int16 halves PCIe/tunnel "
                        "transfer and is lossless for PCM16 audio")
    p.add_argument("--is_train", type=str, default="True",
                   help="accepted for reference flag compatibility "
                        "(main.py:236 — its type=bool makes any string "
                        "truthy there); here train/eval mode fully "
                        "determines dropout behavior, so this is a no-op")
    p.add_argument("--bf16_grads", action="store_true", default=False,
                   help="force bf16 encoder weight-grad stacks (XLSRConfig."
                        "grad_stack_dtype).  Under bf16 compute this is "
                        "already the default (auto) and is bit-identical "
                        "to fp32 stacks.  Under fp32 compute it shrinks "
                        "grad-stack HBM, but NOTE: the mechanism is casting "
                        "the stacked encoder weights to bf16 before the "
                        "layer scan, so the fp32 forward then runs on "
                        "bf16-rounded weights (train and eval through this "
                        "config) — a numerics change, not a free memory "
                        "knob")
    p.add_argument("--ckpt_every", type=int, default=1,
                   help="save last.ckpt every N epochs (best checkpoints and "
                        "the final epoch always save; a 300M full-state "
                        "checkpoint is ~3.8GB)")
    p.add_argument("--sync_ckpt", action="store_true", default=False,
                   help="disable the async checkpoint writer (npz/disk "
                        "writes then block the epoch loop)")
    p.add_argument("--warm_cache", action="store_true", default=False,
                   help="pre-populate the offline augmentation cache for the "
                        "train+dev lists (needs online_aug: false), then exit")
    # weights-day parity harness (train/parity.py)
    p.add_argument("--parity_check", type=str, default=None,
                   help="reference score file (e.g. docs/asvspoof2019_conf-3"
                        ".txt): convert --model_path / --ssl_checkpoint, "
                        "score the reference-scored utts present under "
                        "--database_path through the eval path, and diff "
                        "row-by-row; exit 0 iff all within --parity_tol")
    p.add_argument("--parity_n", type=int, default=200,
                   help="max utts to score for --parity_check (0 = all)")
    p.add_argument("--parity_tol", type=float, default=1e-2,
                   help="per-row |score diff| tolerance for --parity_check")
    # analysis mode (replaces Result.ipynb)
    p.add_argument("--show_params", action="store_true", default=False,
                   help="print the per-layer parameter table for the "
                        "configured model and exit (reference "
                        "script_model_para.py capability)")
    p.add_argument("--analyze", type=str, default=None, help="score file to analyze")
    p.add_argument("--protocol", type=str, default=None, help="protocol for --analyze")
    p.add_argument("--score_format", type=str, default="auto",
                   choices=["auto", "eval", "pred"])
    p.add_argument("--subset", type=str, default=None)
    p.add_argument("--asv_scores", type=str, default=None,
                   help="organizers' ASV score file (source key score): adds "
                        "the official min t-DCF to the --analyze report")
    p.add_argument("--tdcf_version", type=str, default="legacy",
                   choices=["legacy", "revised"],
                   help="t-DCF form: 'legacy' (ASVspoof 2019) or 'revised' "
                        "(ASVspoof 2021, constant-C0 normalization)")
    p.add_argument("--per_attack", action="store_true", default=False,
                   help="add per-attack EER breakdown to --analyze")
    p.add_argument("--bootstrap_ci", type=int, default=0, metavar="N",
                   help="add a percentile-bootstrap 95%% EER confidence "
                        "interval over N resamples to --analyze")
    p.add_argument("--json", action="store_true", default=False,
                   help="emit the --analyze report as one JSON object "
                        "instead of text")
    p.add_argument("--cllr", action="store_true", default=False,
                   help="add Cllr (scores treated as LLRs) and minCllr "
                        "(PAV discrimination floor) to --analyze")
    p.add_argument("--fit_calibration", type=str, default=None, metavar="SCORES",
                   help="fit affine LLR calibration (llr = a*score + b) on a "
                        "dev score file joined with --protocol; prints a,b "
                        "and the before/after Cllr")
    p.add_argument("--compare", type=str, default=None, metavar="A,B",
                   help="paired-bootstrap comparison of two score files on "
                        "the same --protocol: EER difference, 95%% CI, and "
                        "a two-sided bootstrap p-value")
    p.add_argument("--fuse", type=str, default=None, metavar="S1,S2[,..]",
                   help="fit logistic score fusion over K dev score files "
                        "(labels from --protocol); prints weights and the "
                        "fused EER/Cllr.  With --fuse_eval/--fuse_out, also "
                        "applies the fit to K matching eval score files")
    p.add_argument("--fuse_eval", type=str, default=None, metavar="E1,E2[,..]",
                   help="eval-side score files (same system order as --fuse)")
    p.add_argument("--fuse_out", type=str, default=None,
                   help="output path for fused eval scores (pred format)")
    p.add_argument("--average_ckpts", type=str, default=None,
                   metavar="C1,C2[,..]",
                   help="leaf-wise average K checkpoints (SWA-style final "
                        "model: float leaves incl. BN stats average, "
                        "optimizer/RNG state is dropped) and write the "
                        "result to --avg_out for --model_path use")
    p.add_argument("--avg_out", type=str, default=None,
                   help="output path for --average_ckpts "
                        "(default averaged.ckpt)")
    p.add_argument("--calibrate", type=str, default=None, metavar="A,B",
                   help="apply 'a,b' affine calibration to --serve scores "
                        "(emit calibrated LLRs instead of raw bonafide "
                        "log-probs)")
    p.add_argument("--serve_batch", type=int, default=1,
                   help="--serve: score up to N pending requests as ONE "
                        "fixed-shape batch (the TPU serving lever — batch-1 "
                        "forwards leave most of the chip idle under load); "
                        "latency for a lone request is unchanged")
    p.add_argument("--serve_http", type=int, default=None, metavar="PORT",
                   help="HTTP scoring service on PORT (0 = ephemeral): "
                        "POST /score (audio bytes or JSON {'path': ...}), "
                        "POST /score_batch, GET /healthz; concurrent "
                        "requests micro-batch into --serve_batch-sized "
                        "forwards (serving.py).  Composes with "
                        "--from_export, --calibrate and --long_audio like "
                        "--serve")
    p.add_argument("--serve_host", type=str, default="127.0.0.1",
                   help="--serve_http bind address (default loopback; set "
                        "0.0.0.0 behind a load balancer)")
    p.add_argument("--serve_wait_ms", type=float, default=5.0,
                   help="--serve_http: max time a request waits for "
                        "co-riders before a partial batch runs (the "
                        "latency/throughput knob of micro-batching)")
    p.add_argument("--distill_from", type=str, default=None, metavar="CKPT",
                   help="train the configured model as a DISTILLATION "
                        "student of this frozen teacher checkpoint (our "
                        ".ckpt or a reference .pth; teacher architecture = "
                        "wav2vec2_linear_nll at --teacher_preset).  Typical "
                        "use: --ssl_preset student_base for a ~2.2x-serving "
                        "student (PERFORMANCE.md).  Saves "
                        "<out>/<tag>/student_last.ckpt every epoch; eval/"
                        "serve/export it with --model_path + the student's "
                        "--ssl_preset.  Stateless students only (BN heads "
                        "need the full Engine)")
    p.add_argument("--teacher_preset", type=str, default="xlsr_300m",
                   choices=["xlsr_300m", "xlsr_1b", "xlsr_2b",
                            "student_base", "tiny"],
                   help="SSL size of the --distill_from teacher")
    p.add_argument("--distill_alpha", type=float, default=0.5,
                   help="CE weight; (1 - alpha) weighs the teacher KLD")
    p.add_argument("--distill_temp", type=float, default=20.0,
                   help="KLD temperature (reference kld_distill default)")
    p.add_argument("--distill_emb_w", type=float, default=0.0,
                   help="cosine embedding-matching weight (teacher and "
                        "student emb widths must match; 0 = off)")
    p.add_argument("--resume_eval", action="store_true", default=False,
                   help="--eval/--predict: if the output score file already "
                        "exists, keep its well-formed rows (a torn final "
                        "line from a killed run is dropped), score ONLY the "
                        "missing utterances and append them — restartable "
                        "70k-utt sweeps instead of rescoring from scratch. "
                        "Rows land in file order on a clean prefix; "
                        "downstream tools join on utt id either way")
    p.add_argument("--long_audio", action="store_true", default=False,
                   help="--eval/--serve: score audio LONGER than the 64600-"
                        "sample window as overlapping half-window-hop crops "
                        "with score averaging (train/scoring.score_long_audio)"
                        " instead of the reference's truncation — opt-in: it "
                        "uses evidence the reference discards, so scores for "
                        "long clips deliberately differ from reference parity")
    p.add_argument("--export_model", type=str, default=None, metavar="DIR",
                   help="export the scoring function as a standalone AOT "
                        "artifact (jax.export StableHLO, symbolic batch, "
                        "cpu+tpu lowering, weights as arguments) and exit; "
                        "deploy it with --from_export — no model code needed "
                        "on the serving host")
    p.add_argument("--export_quant", type=str, default=None,
                   choices=["int8"],
                   help="--export_model: store big float weight matrices as "
                        "symmetric per-channel int8 + fp32 scales (half the "
                        "bf16 artifact bytes again; ~4x vs fp32). Dequantized "
                        "to the original dtype at load — the serialized "
                        "program and serving numerics path are unchanged; "
                        "drift is weight rounding only. Check a deployment "
                        "with --verify_export")
    p.add_argument("--verify_export", type=str, default=None, metavar="DIR",
                   help="deployment hygiene: score a deterministic probe "
                        "batch through BOTH the --export_model artifact in "
                        "DIR and the in-process model (--config/--ssl_preset/"
                        "--model_path), print the max score difference, exit "
                        "0 iff within --parity_tol — catches artifact/"
                        "checkpoint drift before it serves traffic")
    p.add_argument("--from_export", type=str, default=None, metavar="DIR",
                   help="--serve/--eval/--predict from an --export_model "
                        "artifact: the serialized program + weights replace "
                        "model construction and checkpoint loading")
    p.add_argument("--export_reference_ckpt", type=str, default=None,
                   metavar="OUT.pth",
                   help="reverse migration: write the loaded wav2vec2_linear_"
                        "nll checkpoint (--model_path, ours or a reference "
                        ".pth) as a reference-loadable torch state dict "
                        "(main.py --model_path in the upstream stack) and "
                        "exit; round-tripping a reference .pth preserves its "
                        "BatchNorm/pretraining-head tensors byte-exactly")
    p.add_argument("--plot", type=str, default=None,
                   help="save the score-distribution figure of --analyze here")
    p.add_argument("--plot_det", type=str, default=None,
                   help="save a DET curve (normal-deviate axes) of --analyze here")
    return p


def _rawboost_from_args(args):
    from scl_deepfake_audio_detection_tpu.utils.config import RawBoostConfig

    fields = {f.name for f in dataclasses.fields(RawBoostConfig)}
    return RawBoostConfig(**{k: getattr(args, k) for k in fields if hasattr(args, k)})


def _build_model(args, cfg):
    import jax

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


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # --- checkpoint averaging (no model needed) -------------------------------
    if args.average_ckpts:
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

    # --- paired system comparison (no model needed) ---------------------------
    if args.compare:
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

    # --- score fusion (no model needed) --------------------------------------
    if args.fuse:
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

    # --- calibration fitting (no model needed) -------------------------------
    if args.fit_calibration:
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

    # --- analysis mode (no model needed) ------------------------------------
    if args.analyze:
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

    import jax

    if args.multihost:
        # TPU pod: one process per host; coordinator/peers come from the TPU
        # environment (jax.distributed autodetects).  Non-TPU clusters (and
        # the 2-process CPU validation in tests) pass them explicitly via
        # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            # explicit cluster config: a mistake here must be FATAL — a
            # silent single-process fallback would have every host score the
            # full file list / write the same checkpoint paths
            jax.distributed.initialize(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        else:
            try:
                jax.distributed.initialize()
            except Exception as e:  # single-host invocation: run unsharded
                print(f"--multihost: no cluster detected ({e}); continuing "
                      "as a single process", file=sys.stderr)
    pidx, pcnt = jax.process_index(), jax.process_count()

    if args.jax_cache:
        jax.config.update("jax_compilation_cache_dir", args.jax_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from scl_deepfake_audio_detection_tpu.data import protocols
    from scl_deepfake_audio_detection_tpu.data.datasets import (
        EvalDataset,
        SCLViewBatchBuilder,
        resources_from_config,
        spec_from_config,
    )
    from scl_deepfake_audio_detection_tpu.data.loader import EvalLoader, TrainLoader
    from scl_deepfake_audio_detection_tpu.train import checkpoint as ckpt
    from scl_deepfake_audio_detection_tpu.train import scoring
    from scl_deepfake_audio_detection_tpu.train.engine import Engine
    from scl_deepfake_audio_detection_tpu.utils.config import TrainConfig, load_config
    from scl_deepfake_audio_detection_tpu.utils.registry import DATASETS

    cfg = load_config(args.config)
    cfg.rawboost = _rawboost_from_args(args)

    # --- parameter inspector (no device memory needed) -----------------------
    if args.show_params:
        from scl_deepfake_audio_detection_tpu.ops.layers import param_table

        model = _build_model(args, cfg)
        shapes = jax.eval_shape(model.init, jax.random.key(args.seed))
        print(param_table(shapes))
        return 0

    # --- cache warm-up mode (no model needed) --------------------------------
    if args.warm_cache:
        from scl_deepfake_audio_detection_tpu.data.cache_warmup import warm_aug_cache

        spec = spec_from_config(cfg.data.name, cfg.data.kwargs)
        if spec is None:
            print("config's dataset is eval-only; nothing to cache", file=sys.stderr)
            return 2
        res = resources_from_config(cfg.data.kwargs, cfg.rawboost)
        for subset in ("train", "dev"):
            _, files = protocols.gen_list_scl(args.database_path, subset)
            builder = SCLViewBatchBuilder(
                spec, args.database_path, files, res, seed=args.seed
            )
            stats = warm_aug_cache(builder, num_workers=args.num_workers,
                                   verbose=True)
            print(f"{subset}: {stats}")
        return 0

    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        start_epoch=args.start_epoch,
        min_lr=args.min_lr,
        max_lr=args.max_lr,
        weight_decay=args.weight_decay,
        loss=args.loss,
        grad_clip_norm=args.grad_clip_norm,
        grad_accum_steps=args.grad_accum_steps,
        padding_type=args.padding_type,
        seed=args.seed,
        comment=args.comment,
        compute_dtype=args.compute_dtype,
        mesh_shape=[int(x) for x in args.mesh.split(",")] if args.mesh else None,
        loss_scope=args.loss_scope,
        zero1=args.zero1,
        ckpt_every=args.ckpt_every,
        async_ckpt=not args.sync_ckpt,
    )

    # --- AOT-artifact scoring: skip model construction entirely --------------
    scorer = None
    if args.from_export:
        if not (args.serve or args.serve_http is not None or args.eval):
            # --predict rides --eval (reference semantics: main.py:358-368
            # dispatches the prediction writer inside the --eval branch)
            print("--from_export works with --serve or --eval "
                  "(--eval --predict for the prediction writer)",
                  file=sys.stderr)
            return 2
        if args.emb:
            print("--emb needs the model (export artifacts carry the score "
                  "columns only); run --emb with --model_path instead",
                  file=sys.stderr)
            return 2
        if args.model_path:
            print("--from_export already contains the weights; drop "
                  "--model_path", file=sys.stderr)
            return 2
        if args.export_model or args.parity_check or args.verify_export:
            print("--export_model/--parity_check/--verify_export need the "
                  "model itself, not an artifact; run them with "
                  "--model_path/--config", file=sys.stderr)
            return 2
        if args.export_reference_ckpt:
            print("--export_reference_ckpt cannot reverse-migrate an export "
                  "artifact (it carries compiled StableHLO + flat weights, "
                  "no raw param pytree); export from the original checkpoint "
                  "with --model_path instead", file=sys.stderr)
            return 2
        from scl_deepfake_audio_detection_tpu.export import load_scorer

        scorer = load_scorer(args.from_export)
        print(f"loaded export {args.from_export}: {scorer.meta['model_tag']}"
              f", cut {scorer.cut}, platforms {scorer.meta['platforms']}, "
              f"{scorer.meta['param_bytes']/1e6:.1f} MB weights",
              file=sys.stderr)  # stderr: --serve replies own stdout

    model = None if scorer else _build_model(args, cfg)
    mesh = None
    if args.multihost and args.eval:
        # eval is embarrassingly parallel: each host scores its slice of the
        # file list on its OWN chips (no cross-host collectives to schedule)
        from scl_deepfake_audio_detection_tpu.parallel import make_mesh

        local = jax.local_devices()
        mesh = make_mesh((len(local), 1), devices=local)
    engine = None if scorer else Engine(model, train_cfg, mesh=mesh)
    rng_key = jax.random.key(args.seed)

    # --model_path replaces every parameter wholesale, so skip the random
    # init there — jit(model.init) of the 300M preset is a full compile +
    # device init (minutes over a remote-tunneled chip) paid on every
    # checkpoint eval/serve/parity run otherwise
    params = (None if (args.model_path or scorer)
              else _init_params(args, model, rng_key))
    buffers = None
    resume_opt = resume_epoch = None
    resume_counter = None
    resume_extra = {}
    ref_extras = None
    if args.model_path:
        if args.model_path.endswith(".pth"):
            # a reference epoch_N.pth: full wav2vec2_linear_nll state dict
            # (embedded fairseq SSL + head) -> our param pytree
            from scl_deepfake_audio_detection_tpu.models import convert
            from scl_deepfake_audio_detection_tpu.models.linear_nll import (
                LinearNLL,
            )

            if not isinstance(model, LinearNLL):
                print("reference .pth loading is implemented for the "
                      "wav2vec2_linear_nll model (the one behind every "
                      "published checkpoint); use --config conf-N-linear",
                      file=sys.stderr)
                return 2
            sd = ckpt.load_reference_head_checkpoint(args.model_path)
            params, ssl_cfg, ref_extras = convert.from_reference_model_checkpoint(
                sd, like=model.ssl, return_extras=True
            )
            if ssl_cfg.encoder_dim != model.ssl.encoder_dim:
                print(f"warning: checkpoint SSL dim {ssl_cfg.encoder_dim} != "
                      f"model config {model.ssl.encoder_dim}", file=sys.stderr)
            print(f"loaded reference checkpoint {args.model_path} "
                  f"({ssl_cfg.encoder_layers}-layer SSL)")
        else:
            tree, extra = ckpt.load(args.model_path)
            params = tree["params"] if "params" in tree else tree
            buffers = tree.get("buffers") if isinstance(tree, dict) else None
            if isinstance(tree, dict) and "opt_state_leaves" in tree:
                resume_opt = args.model_path  # full train state: exact resume
                resume_epoch = int(extra.get("epoch", -1)) + 1
                resume_extra = extra
            print(f"loaded checkpoint {args.model_path} (extra={extra})")
    # --- reverse migration: write a reference-loadable .pth --------------------
    if args.export_reference_ckpt:
        from scl_deepfake_audio_detection_tpu.models import convert
        from scl_deepfake_audio_detection_tpu.models.linear_nll import (
            LinearNLL,
        )

        if not isinstance(model, LinearNLL):
            print("--export_reference_ckpt maps onto the reference "
                  "wav2vec2_linear_nll state dict; use --config conf-N-linear",
                  file=sys.stderr)
            return 2
        if params is None or not args.model_path:
            print("--export_reference_ckpt needs --model_path (exporting a "
                  "random init is never what you want)", file=sys.stderr)
            return 2
        convert.save_reference_checkpoint(
            params, args.export_reference_ckpt, extras=ref_extras
        )
        n = sum(x.size for x in jax.tree.leaves(params))
        print(f"wrote reference checkpoint {args.export_reference_ckpt} "
              f"({n / 1e6:.1f}M params"
              + (", extras round-tripped" if ref_extras else "") + ")")
        return 0

    # forward-only modes never read optimizer state: skip allocating AdamW
    # moments (2x param bytes of HBM) and skip the exact-resume re-load
    is_train_mode = not (args.eval or args.predict or args.emb or args.serve
                         or args.serve_http is not None
                         or args.parity_check or args.export_model
                         or args.verify_export)
    opt_state = None
    if scorer is None:
        # distillation brings its own optimizer (DistillEngine) — don't
        # allocate the Engine's AdamW moments just to discard them
        params, buffers, opt_state = engine.init_state(
            rng_key, params=params, buffers=buffers,
            with_opt=is_train_mode and not args.distill_from,
        )
    resume_best = None
    if resume_opt is not None and is_train_mode and not args.distill_from:
        # (--distill_from + a full-train-state --model_path only seeds the
        # student's params above; the Engine's AdamW state isn't allocated)
        from scl_deepfake_audio_detection_tpu.parallel import shard_params

        params, b2, opt_state, _, rng_key, resume_best = ckpt.load_train_state(
            resume_opt, opt_state
        )
        params = shard_params(params, engine.mesh)
        buffers = shard_params(b2, engine.mesh) if b2 else buffers
        # EarlyStop patience counter at save time (absent in pre-round-3
        # checkpoints: those resume with a fresh counter)
        resume_counter = int(resume_extra.get("es_counter", 0))
        if args.start_epoch == 0 and resume_epoch:
            train_cfg.start_epoch = resume_epoch
            print(f"resuming full train state at epoch {resume_epoch} "
                  f"(best so far {resume_best:.4f})")

    desc = DATASETS.get(cfg.data.name)

    # --- weights-day parity check ---------------------------------------------
    if args.parity_check:
        from scl_deepfake_audio_detection_tpu.train.parity import (
            run_parity_check,
        )

        report = run_parity_check(
            engine, params, buffers, args.parity_check, args.database_path,
            use_eval_subdir=desc["eval_subdir"],
            padding_type=args.padding_type,
            fmt=args.score_format,
            n=args.parity_n,
            tol=args.parity_tol,
            batch_size=max(args.batch_size, 1),
            num_workers=args.num_workers,
            compute_dtype=args.compute_dtype,
        )
        print(report)
        return 0 if report.ok else 1

    # --- export-artifact verification ------------------------------------------
    if args.verify_export:
        import numpy as np

        from scl_deepfake_audio_detection_tpu.export import load_scorer
        from scl_deepfake_audio_detection_tpu.models.base import (
            cast_matmul_params,
        )

        vscorer = load_scorer(args.verify_export)
        if vscorer.meta["model_tag"] != cfg.model.name:
            print(f"note: artifact model_tag {vscorer.meta['model_tag']!r} "
                  f"!= config model {cfg.model.name!r}", file=sys.stderr)
        rng = np.random.default_rng(args.seed)
        probe = (rng.standard_normal((4, vscorer.cut)) * 0.1).astype(np.float32)
        art = vscorer.score(probe)
        cast = cast_matmul_params(params, args.compute_dtype)
        ours = np.asarray(engine.score_step(cast, buffers, jax.numpy.asarray(probe)))
        if art.shape != ours.shape:
            print(f"verify_export: FAIL — score shape {art.shape} (artifact) "
                  f"!= {ours.shape} (model)", file=sys.stderr)
            return 1
        diff = float(np.max(np.abs(art - ours)))
        ok = diff <= args.parity_tol
        print(f"verify_export: max |artifact - model| = {diff:.3e} over "
              f"{probe.shape[0]} probe utts "
              f"({'OK' if ok else 'FAIL'}, tol {args.parity_tol:g})")
        return 0 if ok else 1

    # --- AOT export mode --------------------------------------------------------
    if args.export_model:
        from scl_deepfake_audio_detection_tpu.export import export_scorer

        cal = None
        if args.calibrate:
            cal = tuple(float(x) for x in args.calibrate.split(","))
            if len(cal) != 2:
                print("--calibrate expects 'a,b'", file=sys.stderr)
                return 2
        meta = export_scorer(
            model, params, buffers, args.export_model,
            compute_dtype=args.compute_dtype,
            padding_type=args.padding_type,
            calibration=cal,
            model_tag=cfg.model.name,
            quantize=args.export_quant,
        )
        qnote = (f", stored {meta['stored_bytes']/1e6:.1f} MB as "
                 f"{meta['quantization']}" if meta.get("quantization") else "")
        print(f"exported {meta['model_tag']} -> {args.export_model} "
              f"({meta['param_bytes']/1e6:.1f} MB weights{qnote}, platforms "
              f"{meta['platforms']}); run it with --from_export")
        return 0

    # --- serve modes: persistent scorer behind stdin lines or HTTP -------------
    if args.serve and args.serve_http is not None:
        print("--serve and --serve_http are two front-ends to one scorer; "
              "pick one", file=sys.stderr)
        return 2
    if args.serve or args.serve_http is not None:
        from scl_deepfake_audio_detection_tpu.dsp.pad import pad_eval
        from scl_deepfake_audio_detection_tpu.utils.audio_io import load_audio

        if scorer is None:
            from scl_deepfake_audio_detection_tpu.models.base import (
                cast_matmul_params,
            )

            params = cast_matmul_params(params, args.compute_dtype)
            cut = 64600  # the reference eval crop; one compiled program
        else:
            cut = scorer.cut

        cal = None
        if args.calibrate:
            cal = tuple(float(x) for x in args.calibrate.split(","))
            if len(cal) != 2:
                print("--calibrate expects 'a,b'", file=sys.stderr)
                return 2
        elif scorer is not None and scorer.calibration is not None:
            cal = scorer.calibration  # baked into the artifact at export
            print(f"serve: applying the artifact's calibration "
                  f"a={cal[0]:.6f} b={cal[1]:.6f}", file=sys.stderr)

        import queue as _queue
        import threading as _threading

        import numpy as _np

        sb = max(int(args.serve_batch), 1)

        def batch_score(block):
            if scorer is not None:
                return scorer.score(block)
            return _np.asarray(
                engine.score_step(params, buffers, jax.numpy.asarray(block))
            )

        if args.serve_http is not None:
            from scl_deepfake_audio_detection_tpu.serving import serve_http

            return serve_http(
                batch_score,
                cut=cut,
                host=args.serve_host,
                port=args.serve_http,
                batch_size=sb,
                max_wait_ms=args.serve_wait_ms,
                padding_type=args.padding_type,
                calibration=cal,
                long_audio=args.long_audio,
                model_tag=(scorer.meta["model_tag"] if scorer is not None
                           else cfg.model.name),
            )

        def score_group(group):
            """Score up to ``sb`` request lines as ONE [sb, cut] batch.

            Pending requests batch together (a batch-1 forward leaves most
            of the chip idle under load); decode failures reply per line
            while their zero row keeps the single compiled shape.  With
            ``--long_audio``, clips longer than the window score as chunked
            crops through the SAME compiled [sb, cut] program
            (score_long_audio with batch=sb) and reply their window-averaged
            score in request order."""
            keys, rows, errs = [], [], []
            long_rows = {}
            for line in group:
                key, _, path = line.rpartition("\t")
                keys.append(key or path)
                try:
                    raw_wav = load_audio(path)
                    if args.long_audio and raw_wav.shape[0] > cut:
                        from scl_deepfake_audio_detection_tpu.train.scoring import (
                            score_long_audio,
                        )

                        long_rows[len(rows)] = score_long_audio(
                            raw_wav, batch_score, window=cut, batch=sb
                        )
                        rows.append(_np.zeros(cut, _np.float32))  # keep slot
                    else:
                        rows.append(pad_eval(raw_wav, args.padding_type, cut))
                    errs.append(None)
                except Exception as e:
                    rows.append(_np.zeros(cut, _np.float32))
                    errs.append(e)
            lp = None
            if any(e is None and i not in long_rows
                   for i, e in enumerate(errs)):
                batch = _np.zeros((sb, cut), _np.float32)
                batch[: len(rows)] = _np.stack(rows)
                lp = batch_score(batch)
            for i, key in enumerate(keys):
                if errs[i] is not None:
                    print(f"{key}\tERROR {errs[i]}", flush=True)
                    continue
                row = long_rows.get(i)
                raw = float(row[1] if row is not None else lp[i, 1])
                # col 1 = bonafide log-prob (reference score column)
                out = cal[0] * raw + cal[1] if cal else raw
                print(f"{key}\t{out:.6f}", flush=True)

        print("serve: one '<wav-path>' or '<id>\\t<wav-path>' per line; "
              "replies '<id-or-path>\\t<score>' (first reply compiles, "
              "~20-40s; warm after)", file=sys.stderr)

        # a reader thread feeds a queue so pending requests group into one
        # batch without platform-specific non-blocking-stdin tricks
        q: "_queue.Queue" = _queue.Queue()

        def _reader():
            for line in sys.stdin:
                q.put(line)
            q.put(None)

        _threading.Thread(target=_reader, daemon=True).start()
        eof = False
        while not eof:
            item = q.get()
            if item is None:
                break
            group = [item.strip()] if item.strip() else []
            while len(group) < sb:
                try:
                    nxt = q.get_nowait()
                except _queue.Empty:
                    break
                if nxt is None:
                    eof = True
                    break
                if nxt.strip():
                    group.append(nxt.strip())
            if group:
                score_group(group)
        return 0

    # --- eval/scoring mode ----------------------------------------------------
    if args.eval:
        if desc["variant"] is None:
            _, file_eval = protocols.gen_list_eval_only(args.database_path)
        else:
            _, file_eval = protocols.gen_list_scl(args.database_path, "eval")
        if pcnt > 1:  # per-host slice; merge with `cat out.part*` afterwards
            file_eval = file_eval[pidx::pcnt]
        print(f"no. of eval trials {len(file_eval)}")
        out = args.eval_output or "scores.txt"
        if pcnt > 1:
            out = f"{out}.part{pidx}"
        resume_append = False
        if args.resume_eval:
            if args.emb:
                print("--resume_eval supports --eval/--predict score files "
                      "(per-utt .npy embedding dirs don't resume); rerun "
                      "--emb without it", file=sys.stderr)
                return 2
            valid_rows, scored = scoring.read_valid_rows(out, n_tokens=3)
            if scored:
                file_eval = [u for u in file_eval if u not in scored]
                # rewrite exactly the rows we keep: drops a torn final line
                # (killed mid-write) and duplicates before appending resumes
                with open(out, "w") as f:
                    f.writelines(valid_rows)
                resume_append = True
                print(f"resume: {len(scored)} utts already scored in {out}, "
                      f"{len(file_eval)} remaining")
                if not file_eval:
                    print(f"nothing left to score -> {out}")
                    return 0
        ds = EvalDataset(
            file_eval,
            args.database_path,
            padding_type=args.padding_type,
            use_eval_subdir=desc["eval_subdir"],
        )
        if args.decode_cache:
            # first run decodes+packs once; checkpoint sweeps after that read
            # memmap slices and stay chip-bound even for flac inputs.
            # Multi-host: each process caches ITS file-list slice in its own
            # subdir — a shared dir would have all hosts racing the same
            # pcm16.bin on a shared filesystem
            cache_dir = (
                os.path.join(args.decode_cache, f"part{pidx}")
                if pcnt > 1 else args.decode_cache
            )
            ds.warm_decode_cache(cache_dir, num_workers=args.num_workers)
        wire_dtype = args.wire_dtype
        if scorer is not None and wire_dtype != "float32":
            # the exported program's input signature is float32; the PCM16
            # wire belongs to the in-process score step (which dewires)
            print("--from_export scores float32 input; ignoring "
                  f"--wire_dtype {wire_dtype}", file=sys.stderr)
            wire_dtype = "float32"
        loader = EvalLoader(ds, batch_size=max(args.batch_size, 1),
                            num_workers=args.num_workers,
                            wire_dtype=wire_dtype)
        t0 = time.time()

        # periodic progress to stderr (score rows go to the file; a 71933-utt
        # sweep otherwise runs silent for its whole duration)
        _total = len(file_eval)
        _last = {"n": 0, "t": t0}
        def _progress(n):
            if n - _last["n"] >= max(200, _total // 50) or n >= _total:
                now = time.time()
                rate = (n - _last["n"]) / max(now - _last["t"], 1e-9)
                print(f"  scored {n}/{_total} ({rate:.1f} utt/s)",
                      file=sys.stderr)
                _last["n"], _last["t"] = n, now

        if scorer is not None:
            import numpy as _np

            def score_fn(wav):
                return scorer.score(_np.asarray(wav))
        else:
            # scoring never updates params: pre-cast matmul weights to the
            # compute dtype once instead of converting the stacked encoder
            # weights every call (models/base.cast_matmul_params)
            from scl_deepfake_audio_detection_tpu.models.base import (
                cast_matmul_params,
            )

            params = cast_matmul_params(params, args.compute_dtype)

            def score_fn(wav):
                # shard the eval batch over the mesh's data axis (replicates
                # when the batch doesn't divide it, e.g. a ragged final batch)
                wav = engine.place_batch({"wav": wav})["wav"]
                return engine.score_step(params, buffers, wav)

        if args.long_audio and not (args.emb or args.predict):
            # chunked full-length scoring (see --long_audio help): per-utt
            # sequential — window counts vary per clip, so there is no single
            # fixed batch of utterances, only the fixed [batch, cut] chunk
            # program score_long_audio feeds
            scoring.produce_long_audio_evaluation_file(
                ds, score_fn, out, batch=max(args.batch_size, 1),
                append=resume_append, progress=_progress,
            )
            dt = time.time() - t0
            print(f"scored {len(file_eval)} utts (long-audio chunked) in "
                  f"{dt:.1f}s -> {out}")
            return 0
        if args.long_audio:
            print("--long_audio applies to --eval scoring only; "
                  "--predict/--emb use the fixed-window path",
                  file=sys.stderr)

        if args.emb:
            @jax.jit
            def _emb_step(p, b, wav):
                from scl_deepfake_audio_detection_tpu.ops.layers import (
                    dewire_pcm16,
                )

                o = model.apply(p, dewire_pcm16(wav), train=False, buffers=b)
                return o.log_probs, o.emb

            def emb_fn(wav):
                return _emb_step(params, buffers, wav)

            scoring.produce_emb_file(loader, emb_fn, out, progress=_progress)
        elif args.predict:
            scoring.produce_prediction_file(loader, score_fn, out,
                                            append=resume_append,
                                            progress=_progress)
        else:
            scoring.produce_evaluation_file(loader, score_fn, out,
                                            append=resume_append,
                                            progress=_progress)
        dt = time.time() - t0
        print(f"scored {len(file_eval)} utts in {dt:.1f}s "
              f"({len(file_eval)/dt:.1f} utt/s) -> {out}")
        return 0

    # --- training mode --------------------------------------------------------
    spec = spec_from_config(cfg.data.name, cfg.data.kwargs)
    if spec is None:
        print("config's dataset is eval-only; pass --eval", file=sys.stderr)
        return 2
    # the CLI flag overrides the dataset descriptor's repeat_pad — REFERENCE
    # behavior (main.py:375 passes padding_type into every Dataset_for, so
    # e.g. xinwang's library default only applies to direct library use)
    spec.repeat_pad = args.padding_type == "repeat"
    res = resources_from_config(cfg.data.kwargs, cfg.rawboost)

    _, file_train = protocols.gen_list_scl(args.database_path, "train")
    _, file_dev = protocols.gen_list_scl(args.database_path, "dev")
    print(f"no. of training trials {len(file_train)}")
    print(f"no. of validation trials {len(file_dev)}")

    groups = args.groups_per_step or max(args.batch_size, 1)
    train_builder = SCLViewBatchBuilder(
        spec, args.database_path, file_train, res, seed=args.seed
    )
    dev_builder = SCLViewBatchBuilder(
        spec, args.database_path, file_dev, res, seed=args.seed + 1
    )
    composer = None
    if args.device_aug:
        from scl_deepfake_audio_detection_tpu.data.device_pipeline import (
            DeviceViewComposer,
            build_banks,
        )

        # the device composer implements exactly the conf-3 anchor recipe
        # (RawBoost12 + background_noise + reverb as one jit program);
        # accepting any other method list would SILENTLY train a different
        # augmentation distribution than the config requests
        def _canon(m: str) -> str:
            return m.replace("_wrapper", "")

        want = {"RawBoost12", "background_noise", "reverb"}
        got = {_canon(m) for m in spec.augmentation_methods}
        if got != want:
            print(
                f"--device_aug supports the conf-3 recipe {sorted(want)} "
                f"only; this config requests {sorted(got)} — run without "
                "--device_aug (host augmentation covers every method)",
                file=sys.stderr,
            )
            return 2
        from scl_deepfake_audio_detection_tpu.data.loader import (
            DeviceAugTrainLoader,
        )

        noise_bank, rir_bank = build_banks(
            cfg.data.kwargs.get("noise_path"), cfg.data.kwargs.get("rir_path"),
            sr=spec.wav_samp_rate,
        )
        composer = DeviceViewComposer(
            cfg.rawboost, noise_bank, rir_bank, fs=spec.wav_samp_rate,
            seed=args.seed, snr_mode=args.snr_mode,
        )
        print(f"device augmentation: noise bank {noise_bank.shape}, "
              f"rir bank {rir_bank.shape}")
        train_loader = DeviceAugTrainLoader(train_builder, groups, shuffle=True,
                                            num_workers=args.num_workers,
                                            seed=args.seed,
                                            shard_index=pidx, num_shards=pcnt,
                                            wire_dtype=args.wire_dtype)
        # pods must drop ragged dev remainders: a final batch smaller than
        # the per-process data slice can't place on the global mesh
        dev_loader = DeviceAugTrainLoader(dev_builder, groups, shuffle=False,
                                          drop_last=(pcnt > 1),
                                          num_workers=args.num_workers,
                                          seed=args.seed,
                                          shard_index=pidx, num_shards=pcnt,
                                          wire_dtype=args.wire_dtype)
    else:
        train_loader = TrainLoader(train_builder, groups, shuffle=True,
                                   num_workers=args.num_workers, seed=args.seed,
                                   shard_index=pidx, num_shards=pcnt)
        dev_loader = TrainLoader(dev_builder, groups, shuffle=False,
                                 drop_last=(pcnt > 1),
                                 num_workers=args.num_workers, seed=args.seed,
                                 shard_index=pidx, num_shards=pcnt)

    # every process passes save_dir: checkpoint saves are collectives (ZeRO-1
    # shards all-gather inside ckpt.save) and process 0 alone writes files
    save_dir = os.path.join(args.out_dir, train_cfg.model_tag())
    if pidx == 0:
        os.makedirs(save_dir, exist_ok=True)
    print(f"model tag: {train_cfg.model_tag()}")

    epoch_counter = {"n": train_cfg.start_epoch}

    def _composed(raw_batches, epoch):
        import jax as _jax

        for i, raw in enumerate(raw_batches):
            key = _jax.random.fold_in(  # epoch -1 = dev pass; keep fold_in >= 0
                _jax.random.key(args.seed + 77), (epoch + 1) * 1_000_003 + i
            )
            views, labels = composer(
                raw["anchors"], raw["reals"], raw["vocoded"], key,
                spoofs=raw.get("spoofs"), variant=spec.variant,
            )
            yield {"wav": views, "labels": labels, "utts": raw["utts"]}

    def train_batches():
        e = epoch_counter["n"]
        epoch_counter["n"] += 1
        if composer is not None:
            return _composed(train_loader.epoch(e), e)
        return train_loader.epoch(e)

    # --- distillation training -------------------------------------------------
    if args.distill_from:
        import numpy as np

        from scl_deepfake_audio_detection_tpu.models.linear_nll import (
            LinearNLL,
        )
        from scl_deepfake_audio_detection_tpu.models.xlsr import XLSRConfig
        from scl_deepfake_audio_detection_tpu.train import distill as D

        teacher_preset = getattr(XLSRConfig, args.teacher_preset)

        teacher = LinearNLL(ssl=teacher_preset(
            compute_dtype=args.compute_dtype
        ))
        if args.distill_from.endswith(".pth"):
            from scl_deepfake_audio_detection_tpu.models import convert

            sd = ckpt.load_reference_head_checkpoint(args.distill_from)
            t_params, _ = convert.from_reference_model_checkpoint(
                sd, like=teacher.ssl
            )
            t_buffers = {}
        else:
            tree, _ = ckpt.load(args.distill_from)
            t_params = tree["params"] if "params" in tree else tree
            t_buffers = (tree.get("buffers") or {}) if isinstance(tree, dict) \
                else {}
        dcfg = D.DistillConfig(
            temperature=args.distill_temp,
            alpha=args.distill_alpha,
            emb_loss_weight=args.distill_emb_w,
            weight_decay=args.weight_decay,
        )
        try:
            deng = D.DistillEngine(teacher, model, dcfg, mesh=engine.mesh)
        except ValueError as e:  # BN students need the full Engine
            print(str(e), file=sys.stderr)
            return 2
        s_params, d_opt, t_params, t_buffers = deng.init_state(
            rng_key, t_params, student_params=params,
            teacher_buffers=t_buffers,
        )
        t0 = time.time()
        for epoch in range(train_cfg.start_epoch,
                           train_cfg.start_epoch + train_cfg.num_epochs):
            te = time.time()
            s_params, d_opt, metrics = deng.run_epoch(
                s_params, d_opt, t_params, train_batches(),
                jax.random.fold_in(rng_key, epoch),
                teacher_buffers=t_buffers,
            )
            print(f"epoch {epoch}: " +
                  " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items()))
                  + f" ({time.time()-te:.1f}s)")
            if not all(np.isfinite(v) for v in metrics.values()):
                print("non-finite distillation metrics; stopping",
                      file=sys.stderr)
                return 1
            # collective save (every process calls; proc 0 writes)
            ckpt.save(
                os.path.join(save_dir, "student_last.ckpt"),
                {"params": s_params},
                extra={"epoch": epoch,
                       **{k: float(v) for k, v in metrics.items()}},
            )
        print(f"Total distillation time: {time.time() - t0}s; student at "
              f"{os.path.join(save_dir, 'student_last.ckpt')} — eval/serve/"
              f"export it with --model_path + --ssl_preset {args.ssl_preset}")
        return 0

    def log_fn(epoch, record):
        print(
            f"epoch {epoch}: lr={record['lr']:.3g} "
            f"train_loss={record.get('train_loss', float('nan')):.4f} "
            f"val_loss={record.get('val_loss', float('nan')):.4f} "
            f"val_acc={record.get('val_accuracy', float('nan')):.4f} "
            f"({record['seconds']:.1f}s)"
        )

    t0 = time.time()
    engine.fit(
        params,
        buffers,
        opt_state,
        train_batches=train_batches,
        dev_batches=(
            (lambda: _composed(dev_loader.epoch(0), -1))
            if composer is not None
            else (lambda: dev_loader.epoch(0))
        ),
        rng_key=rng_key,
        save_dir=save_dir,
        log_fn=log_fn,
        tensorboard_dir=(
            args.tensorboard_dir
            or (os.path.join(save_dir, "logs") if save_dir else None)
        ),
        profile_dir=args.profile_dir,
        resume_best=resume_best,
        resume_counter=resume_counter,
    )
    print(f"Total training time: {time.time() - t0}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
