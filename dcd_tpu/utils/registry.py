"""Name -> factory registry with decorator registration
(reference DGDE/utils/registry.py:9-46)."""

from __future__ import annotations


class Registry(dict):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)

    def register(self, module_name, module=None):
        if module is not None:
            self._register_generic(module_name, module)
            return module

        def register_fn(fn):
            self._register_generic(module_name, fn)
            return fn

        return register_fn

    def _register_generic(self, module_name, module):
        assert module_name not in self, f"{module_name} already registered"
        self[module_name] = module


# framework-level registries (reference model/registry.py:3-5; the
# reference also defines HEADS but never registers into it, so it is not
# carried here). Builders register at import time in models/dla.py and
# models/predictor.py; KeypointDetector dispatches through these by the
# cfg names (MODEL.BACKBONE.CONV_BODY / MODEL.HEAD.PREDICTOR, matching
# reference detector_predictor.py:18,206).
BACKBONES = Registry()
PREDICTOR = Registry()
