from scl_deepfake_audio_detection_tpu.utils.registry import (
    AUGMENTATIONS,
    DATASETS,
    MODELS,
    Registry,
)
from scl_deepfake_audio_detection_tpu.utils.config import (
    Config,
    DataConfig,
    ModelConfig,
    RawBoostConfig,
    TrainConfig,
    load_config,
)

__all__ = [
    "AUGMENTATIONS",
    "DATASETS",
    "MODELS",
    "Registry",
    "Config",
    "DataConfig",
    "ModelConfig",
    "RawBoostConfig",
    "TrainConfig",
    "load_config",
]
