#!/usr/bin/env bash
# Weights day: the single unattended command for the moment network access /
# the published artifacts become available.  Full chain:
#
#   download -> convert -> row-level score parity -> full eval-list scoring
#   -> EER vs the reference's committed bottom line -> exit code
#
# Row parity runs against the reference's committed score file
# (docs/asvspoof2019_conf-3.txt, the EER-2.8837% rows from Result.ipynb
# cell 4); the EER stage re-scores every eval utterance present on disk and
# diffs the computed EER against EXPECTED_EER.  Exit 0 iff BOTH pass.
#
#   bash scripts/weights_day.sh [DATABASE_PATH] [N_ROWS] [TOL]
#
# Environment overrides (defaults = the real weights day; the rehearsal
# harness scripts/weights_day_rehearsal.py re-points all of them at a
# synthetic golden mini-setup and runs this same file end-to-end):
#   CONFIG        model/data yaml        (configs/conf-3-linear.yaml)
#   CKPT          trained checkpoint     (pretrained/conf-3-linear.pth)
#   REF_SCORES    committed score file   (/root/reference/docs/asvspoof2019_conf-3.txt)
#   PROTOCOL      trial protocol         (/root/reference/DATA/asvspoof_2019_supcon/protocol.txt)
#   EXPECTED_EER  reference EER %        (2.8837, Result.ipynb cell 4)
#   EER_TOL       |ours - expected| cap  (0.15 — re-scoring a partial local
#                 mirror shifts the operating point slightly)
#   EXTRA_ARGS    extra cli flags        (rehearsal: --ssl_preset tiny ...)
#   OUT_DIR       scores/report output   (/tmp/weights_day)
#   SKIP_DOWNLOAD=1  skip the fetch steps (rehearsal / pre-staged assets)
#
# Prereqs it checks (and explains) rather than assumes:
#   1. the trained conf-3 checkpoint  pretrained/conf-3-linear.pth
#      (reference README.md:80 publishes it on Google Drive:
#       https://drive.google.com/drive/folders/1F1Wbc_WCdXAOlnly-pgjq1seCtkXgOZP
#       — fetched automatically iff `gdown` is installed)
#   2. LA19 eval audio under DATABASE_PATH (default
#      DATA/asvspoof_2019_supcon/) — the utterances named in the committed
#      score file; any present subset is scored (ASVspoof 2019 LA is
#      distributed under its own license, reference README.md:21)
#
# What it does NOT need: fairseq, torch-GPU, or the reference repo itself.
set -e
cd "$(dirname "$0")/.."

DATABASE_PATH=${1:-DATA/asvspoof_2019_supcon/}
N_ROWS=${2:-200}        # 0 = every row present on disk
TOL=${3:-1e-2}          # |our score - reference score| per row
CONFIG=${CONFIG:-configs/conf-3-linear.yaml}
REF_SCORES=${REF_SCORES:-/root/reference/docs/asvspoof2019_conf-3.txt}
PROTOCOL=${PROTOCOL:-/root/reference/DATA/asvspoof_2019_supcon/protocol.txt}
EXPECTED_EER=${EXPECTED_EER:-2.8837}
EER_TOL=${EER_TOL:-0.15}
CKPT=${CKPT:-pretrained/conf-3-linear.pth}
OUT_DIR=${OUT_DIR:-/tmp/weights_day}
mkdir -p "$OUT_DIR" pretrained

if [ "${SKIP_DOWNLOAD:-0}" != "1" ]; then
    # --- 1. the SSL base (only needed for from-scratch training; fetched for
    #        completeness, failure is non-fatal for the parity check) -------
    bash scripts/01_download_pretrained.sh || true

    # --- 2. the trained conf-3 checkpoint ----------------------------------
    if [ ! -f "$CKPT" ] && command -v gdown > /dev/null 2>&1; then
        echo "fetching conf-3-linear.pth (reference README.md:80) ..."
        gdown --folder 1F1Wbc_WCdXAOlnly-pgjq1seCtkXgOZP -O pretrained/ || true
    fi
fi
if [ ! -f "$CKPT" ]; then
    echo "MISSING $CKPT - download the published conf-3-linear checkpoint:"
    echo "  https://drive.google.com/drive/folders/1F1Wbc_WCdXAOlnly-pgjq1seCtkXgOZP"
    echo "  (reference README.md:80) and place it at $CKPT"
    exit 3
fi

# --- 3. convert + score + row-diff ------------------------------------------
# --parity_check converts the torch .pth (embedded fairseq SSL + head) via
# models/convert.from_reference_model_checkpoint, scores the reference-scored
# utts present on disk through the SAME path as --eval, and row-diffs.
parity_rc=0
# shellcheck disable=SC2086
python -m scl_deepfake_audio_detection_tpu.cli \
    --config "$CONFIG" \
    --database_path "$DATABASE_PATH" \
    --model_path "$CKPT" \
    --parity_check "$REF_SCORES" \
    --parity_n "$N_ROWS" \
    --parity_tol "$TOL" $EXTRA_ARGS || parity_rc=$?
echo "weights-day stage 1 (row parity): \
$([ $parity_rc -eq 0 ] && echo PASS || echo FAIL) (rc=$parity_rc)"

# --- 4. full eval-list scoring (the --eval path, every utt on disk) ---------
SCORES="$OUT_DIR/weights_day_scores.txt"
# shellcheck disable=SC2086
python -m scl_deepfake_audio_detection_tpu.cli \
    --config "$CONFIG" \
    --database_path "$DATABASE_PATH" \
    --model_path "$CKPT" \
    --eval --eval_output "$SCORES" $EXTRA_ARGS

# --- 5. EER vs the committed bottom line -------------------------------------
python -m scl_deepfake_audio_detection_tpu.cli \
    --analyze "$SCORES" --protocol "$PROTOCOL" --json \
    > "$OUT_DIR/analysis.json"
eer_rc=0
python - "$OUT_DIR/analysis.json" "$EXPECTED_EER" "$EER_TOL" <<'EOF' || eer_rc=$?
import json, sys
report = json.load(open(sys.argv[1]))
# analysis.json stores EER as a fraction; EXPECTED_EER / EER_TOL are percent.
eer_pct = report["eer"] * 100.0
expected, tol = float(sys.argv[2]), float(sys.argv[3])
print(f"weights-day stage 2 (EER): computed {eer_pct:.4f}% vs "
      f"expected {expected:.4f}% (tol {tol})")
sys.exit(0 if abs(eer_pct - expected) <= tol else 1)
EOF
echo "weights-day stage 2 (EER diff): \
$([ $eer_rc -eq 0 ] && echo PASS || echo FAIL) (rc=$eer_rc)"

rc=$(( parity_rc == 0 && eer_rc == 0 ? 0 : 1 ))
echo "weights-day: $([ $rc -eq 0 ] && echo PASS || echo FAIL)"
exit $rc
