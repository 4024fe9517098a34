#!/usr/bin/env bash
# Fetch the XLS-R 300M SSL checkpoint (counterpart of the reference's
# 01_download_pretrained.sh:7, which pulls fairseq's xlsr2_300m.pt).
# Either source converts to our param pytree via models/convert.py:
#   fairseq: xlsr2_300m.pt            (load_fairseq_checkpoint)
#   huggingface: facebook/wav2vec2-xls-r-300m (load_hf_pretrained)
set -e
mkdir -p pretrained
if [ -f pretrained/xlsr2_300m.pt ]; then
    echo "pretrained/xlsr2_300m.pt already present"
    exit 0
fi
URL="https://dl.fbaipublicfiles.com/fairseq/wav2vec/xlsr2_300m.pt"
echo "downloading $URL -> pretrained/xlsr2_300m.pt"
wget -q --show-progress -O pretrained/xlsr2_300m.pt "$URL" || {
    echo "download failed (no network?). Alternatively convert the HF model:"
    echo "  python -c 'from scl_deepfake_audio_detection_tpu.models import convert; convert.load_hf_pretrained(\"facebook/wav2vec2-xls-r-300m\")'"
    exit 1
}
