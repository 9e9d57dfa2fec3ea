"""String-keyed registry (reference utils/registry.py:9-45 and
modeling/registry.py:5-14): maps config strings to implementations."""

from typing import Any, Callable, Dict, Optional


class Registry(dict):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)

    def register(self, name: str, module: Optional[Any] = None):
        if module is not None:
            self._do_register(name, module)
            return module

        def deco(fn):
            self._do_register(name, fn)
            return fn

        return deco

    def _do_register(self, name: str, module: Any):
        assert name not in self, f"{name} already registered"
        self[name] = module


# Model-component registries (modeling/registry.py equivalents)
BACKBONES = Registry()
RPN_HEADS = Registry()
ROI_BOX_FEATURE_EXTRACTORS = Registry()
ROI_BOX_PREDICTOR = Registry()
ROI_MASK_FEATURE_EXTRACTORS = Registry()
ROI_MASK_PREDICTOR = Registry()
ROI_KEYPOINT_FEATURE_EXTRACTORS = Registry()
ROI_KEYPOINT_PREDICTOR = Registry()
MMSS_HEADS = Registry()
LANGUAGE_BACKBONES = Registry()
