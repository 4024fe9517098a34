#!/usr/bin/env bash
# AOT-export a deployment artifact (no reference counterpart — the reference
# needs its full torch/fairseq stack and model source on every serving host;
# this writes a self-contained StableHLO scorer + weights directory that
# 04-style serving loads with NO model code: see export.py / MIGRATION.md).
#
# usage: 05_export.sh <config> <checkpoint> <artifact_dir> [extra flags...]
#   then serve it:  python -m scl_deepfake_audio_detection_tpu.cli \
#                       --serve --from_export <artifact_dir>
#   or batch-score: ... --eval --from_export <artifact_dir> --database_path D
set -e
cd "$(dirname "$0")/.."

CONFIG=${1:?usage: 05_export.sh <config> <checkpoint> <artifact_dir> [extra flags...]}
CKPT=${2:?usage: 05_export.sh <config> <checkpoint> <artifact_dir> [extra flags...]}
OUT=${3:?usage: 05_export.sh <config> <checkpoint> <artifact_dir> [extra flags...]}
shift 3

exec python -m scl_deepfake_audio_detection_tpu.cli \
    --export_model "$OUT" \
    --config "$CONFIG" \
    --model_path "$CKPT" \
    "$@"
