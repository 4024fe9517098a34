from scl_deepfake_audio_detection_tpu.parallel.mesh import (
    batch_pspec,
    make_mesh,
    param_pspecs,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_pspec",
    "make_mesh",
    "param_pspecs",
    "shard_batch",
    "shard_params",
]
