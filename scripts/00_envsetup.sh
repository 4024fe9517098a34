#!/usr/bin/env bash
# Environment check for the TPU-native framework (counterpart of the
# reference's conda/fairseq installer, 00_envsetup.sh:14-22 — here everything
# heavy ships with the image: jax + the package itself; the optional native
# host-DSP library builds on demand with g++).
set -e
cd "$(dirname "$0")/.."

python - <<'PY'
import importlib, sys
missing = [m for m in ("jax", "numpy", "optax", "yaml") if importlib.util.find_spec(m) is None]
if missing:
    sys.exit(f"missing required packages: {missing}")
import jax
print("jax", jax.__version__, "backend:", jax.default_backend(), "devices:", len(jax.devices()))
from scl_deepfake_audio_detection_tpu import native
print("native host-DSP:", "built" if native.available() else "unavailable (numpy fallback)")
print("native codec (flac/mp3/opus/g722):",
      "built" if native.codec_available() else "unavailable (soundfile/G.711 fallbacks)")
PY
echo "environment OK"
