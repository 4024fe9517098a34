#!/usr/bin/env bash
# Train (argument order mirrors the reference 02_train.sh:55-62).
# usage: 02_train.sh <seed> <config> <database_path> <comment>
set -e
cd "$(dirname "$0")/.."
SEED=${1:?usage: 02_train.sh <seed> <config> <database_path> <comment>}
CONFIG=${2:?missing config}
DATABASE_PATH=${3:?missing database path}
CMT=${4:-run}

echo "Training starts (model tag: model_weighted_CCE_80_1_1e-08_${CMT})"
python -m scl_deepfake_audio_detection_tpu.cli \
    --seed "${SEED}" \
    --config "${CONFIG}" \
    --database_path "${DATABASE_PATH}" \
    --batch_size 1 \
    --comment "${CMT}" \
    --num_epochs 80 \
    --padding_type repeat \
    --ssl_checkpoint pretrained/xlsr2_300m.pt
echo "Training process finished"
