#!/usr/bin/env bash
# Score an eval set (argument order mirrors the reference 03_eval.sh:58-65),
# then report EER in-framework (replaces Result.ipynb):
#   python -m scl_deepfake_audio_detection_tpu.cli --analyze <scores> --protocol <protocol>
# usage: 03_eval.sh <config> <database_path> <batch_size> <model_path> <eval_output>
set -e
cd "$(dirname "$0")/.."
CONFIG=${1:?usage: 03_eval.sh <config> <database_path> <batch_size> <model_path> <eval_output>}
DATABASE_PATH=${2:?missing database path}
BATCH_SIZE=${3:?missing batch size}
MODEL_PATH=${4:?missing model path}
EVAL_OUTPUT=${5:?missing eval output}

echo "Evaluation starts"
python -m scl_deepfake_audio_detection_tpu.cli \
    --config "${CONFIG}" \
    --database_path "${DATABASE_PATH}" \
    --batch_size "${BATCH_SIZE}" \
    --eval \
    --model_path "${MODEL_PATH}" \
    --eval_output "${EVAL_OUTPUT}"
echo "Evaluation finished -> ${EVAL_OUTPUT}"
echo "EER: python -m scl_deepfake_audio_detection_tpu.cli --analyze ${EVAL_OUTPUT} --protocol <protocol.txt>"
