#!/usr/bin/env bash
# Persistent scorer (no reference counterpart — the reference pays a full
# model load per 03_eval.sh run; this keeps one warm compiled program and
# scores wav paths from stdin).
#
# usage: 04_serve.sh <config> <checkpoint> [--http PORT] [extra flags...]
#   then: echo "/path/to/utt.wav" | ...      -> "<path>\t<score>"
#         echo -e "id-7\t/path/utt.flac"     -> "id-7\t<score>"
#   or with --http PORT: POST /score, /score_batch; GET /healthz, /metrics
set -e
cd "$(dirname "$0")/.."

CONFIG=${1:?usage: 04_serve.sh <config> <checkpoint> [--http PORT] [extra flags...]}
CKPT=${2:?usage: 04_serve.sh <config> <checkpoint> [--http PORT] [extra flags...]}
shift 2

MODE=(--serve)
if [ "${1:-}" = "--http" ]; then
    MODE=(--serve_http "${2:?--http needs a port}")
    shift 2
fi

exec python -m scl_deepfake_audio_detection_tpu.cli \
    "${MODE[@]}" \
    --config "$CONFIG" \
    --model_path "$CKPT" \
    "$@"
