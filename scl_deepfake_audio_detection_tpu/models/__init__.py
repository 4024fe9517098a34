"""Model zoo.

Importing this package registers all models into ``utils.registry.MODELS``
(both this framework's names and the reference's ``wav2vec2_*`` aliases).
"""

from scl_deepfake_audio_detection_tpu.models import xlsr  # noqa: F401

__all__ = ["xlsr"]


def _register_all():
    # heads register themselves on import; keep imports lazy-tolerant so a
    # broken optional head never blocks the core path
    import importlib

    for mod in ("linear_nll", "aasist", "resnet", "btse", "conformer"):
        try:
            importlib.import_module(f"scl_deepfake_audio_detection_tpu.models.{mod}")
        except ImportError:
            pass


_register_all()
