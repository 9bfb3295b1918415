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


# framework-level registries (reference model/registry.py:3-5)
BACKBONES = Registry()
HEADS = Registry()
PREDICTOR = Registry()
