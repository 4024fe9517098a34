#!/usr/bin/env bash
# Weights day: the single unattended command for the moment network access /
# the published artifacts become available.  Runs download -> convert ->
# row-level score parity against the reference's committed score file
# (docs/asvspoof2019_conf-3.txt, the EER-2.8837% rows from Result.ipynb
# cell 4) and exits 0 iff every scored row matches within tolerance.
#
#   bash scripts/weights_day.sh [DATABASE_PATH] [N_ROWS] [TOL]
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
REF_SCORES=${REF_SCORES:-/root/reference/docs/asvspoof2019_conf-3.txt}
CKPT=pretrained/conf-3-linear.pth

mkdir -p pretrained

# --- 1. the SSL base (only needed for from-scratch training; fetched for
#        completeness, failure is non-fatal for the parity check) -----------
bash scripts/01_download_pretrained.sh || true

# --- 2. the trained conf-3 checkpoint --------------------------------------
if [ ! -f "$CKPT" ]; then
    if command -v gdown > /dev/null 2>&1; then
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

# --- 3. convert + score + row-diff (exit 0 iff parity) ---------------------
# --parity_check converts the torch .pth (embedded fairseq SSL + head) via
# models/convert.from_reference_model_checkpoint, scores the reference-scored
# utts present on disk through the SAME path as --eval, and row-diffs.
rc=0
python -m scl_deepfake_audio_detection_tpu.cli \
    --config configs/conf-3-linear.yaml \
    --database_path "$DATABASE_PATH" \
    --model_path "$CKPT" \
    --parity_check "$REF_SCORES" \
    --parity_n "$N_ROWS" \
    --parity_tol "$TOL" || rc=$?
echo "weights-day parity: $([ $rc -eq 0 ] && echo PASS || echo FAIL) (rc=$rc)"
exit $rc
