"""Explicit plugin registries.

The reference selects datasets with ``importlib.import_module('datautils.'+name)``
and models/augmentations by ``globals()[name]`` lookups (reference
``main.py:328-333``, ``datautils/asvspoof_2019_augall_3.py:116-122``), which is
fragile: only two of its five models are actually importable from the CLI.
Here every pluggable component self-registers into a typed registry, so config
names resolve uniformly and unknown names fail with the list of valid choices.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional


class Registry:
    """A name -> object registry with a decorator-style ``register``."""

    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, Any] = {}

    def register(self, name: Optional[str] = None, *, aliases: Iterable[str] = ()):
        """Decorator: ``@MODELS.register("xlsr_linear_nll")``."""

        def deco(obj: Any) -> Any:
            key = name or getattr(obj, "__name__", None)
            if key is None:
                raise ValueError(f"cannot infer a registry name for {obj!r}")
            for k in (key, *aliases):
                if k in self._items and self._items[k] is not obj:
                    raise KeyError(f"duplicate {self.kind} registration: {k!r}")
                self._items[k] = obj
            return obj

        return deco

    def get(self, name: str) -> Any:
        if name not in self._items:
            _populate(self.kind)  # lazy: importing the package registers items
        try:
            return self._items[name]
        except KeyError:
            raise KeyError(
                f"unknown {self.kind} {name!r}; available: {sorted(self._items)}"
            ) from None

    def __contains__(self, name: str) -> bool:
        if name not in self._items:
            _populate(self.kind)  # same lazy fill as get(): membership must
        return name in self._items  # not depend on import order

    def names(self):
        _populate(self.kind)
        return sorted(self._items)


MODELS = Registry("model")
DATASETS = Registry("dataset")
AUGMENTATIONS = Registry("augmentation")

_POPULATORS = {
    "model": "scl_deepfake_audio_detection_tpu.models",
    "dataset": "scl_deepfake_audio_detection_tpu.data.datasets",
    "augmentation": "scl_deepfake_audio_detection_tpu.data.augment_registry",
}


def _populate(kind: str) -> None:
    """Import the package whose import side-effect registers ``kind`` items,
    so registry lookups work regardless of import order."""
    import importlib

    mod = _POPULATORS.get(kind)
    if mod:
        # let import errors PROPAGATE: swallowing them turns a broken module
        # into "unknown model ...; available: []" with the real traceback
        # lost.  importlib caches, so repeat calls are cheap no-ops.
        importlib.import_module(mod)


def resolve_augmentation(name: str) -> Callable:
    """Resolve an augmentation-method name from YAML config.

    The reference's ``augmentation_methods`` YAML list holds function names
    looked up in the dataset module's globals (e.g. ``RawBoost12``,
    ``background_noise_wrapper`` — ``configs/conf-3-linear.yaml:12``). We keep
    those public names as registry keys for config compatibility.
    """
    return AUGMENTATIONS.get(name)
