#!/usr/bin/env bash
# Persistent scorer (no reference counterpart — the reference pays a full
# model load per 03_eval.sh run; this keeps one warm compiled program and
# scores wav paths from stdin).
#
# usage: 04_serve.sh <config> <checkpoint> [extra flags...]
#   then: echo "/path/to/utt.wav" | ...      -> "<path>\t<score>"
#         echo -e "id-7\t/path/utt.flac"     -> "id-7\t<score>"
set -e
cd "$(dirname "$0")/.."

CONFIG=${1:?usage: 04_serve.sh <config> <checkpoint> [extra flags...]}
CKPT=${2:?usage: 04_serve.sh <config> <checkpoint> [extra flags...]}
shift 2

exec python -m scl_deepfake_audio_detection_tpu.cli \
    --serve \
    --config "$CONFIG" \
    --model_path "$CKPT" \
    "$@"
