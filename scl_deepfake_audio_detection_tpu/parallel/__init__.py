from scl_deepfake_audio_detection_tpu.parallel.pipeline import pipeline_apply
from scl_deepfake_audio_detection_tpu.parallel.mesh import (
    batch_pspec,
    make_mesh,
    param_pspecs,
    shard_batch,
    shard_opt_state,
    shard_params,
    zero1_pspec,
)

__all__ = [
    "batch_pspec",
    "pipeline_apply",
    "make_mesh",
    "param_pspecs",
    "shard_batch",
    "shard_opt_state",
    "shard_params",
    "zero1_pspec",
]
