"""TPU-native supervised-contrastive audio deepfake detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``josebeo2016/SCL-Deepfake-audio-detection`` (SupCon training of an XLS-R
wav2vec2 frontend + small classification heads for bonafide/spoof speech
detection).  The reference is single-GPU PyTorch; this framework is built
TPU-first: functional models over parameter pytrees, one jit-compiled train
step sharded over a `jax.sharding.Mesh`, fixed static shapes end-to-end, and
Pallas kernels on the hot attention path.

Top-level layout:
  models/    model zoo (XLS-R frontend, linear/AASIST/ResNet/BTSE heads)
  ops/       compute ops and losses (SupCon, flash attention, conv encoder)
  parallel/  mesh construction + sharding rules (dp/tp over ICI)
  dsp/       waveform DSP and augmentation (RawBoost, noise/RIR mixing, VAD)
  data/      protocols, SCL view-batch builders, host prefetch pipeline
  train/     train/eval engines, metrics (EER), scoring, checkpointing
  utils/     config dataclasses, registries, audio IO
  native/    C++ data-plane helpers (wav decode + DSP), ctypes-loaded
"""

from scl_deepfake_audio_detection_tpu.version import __version__

__all__ = ["__version__"]
