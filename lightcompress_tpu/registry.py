"""String-keyed factory registries.

Mirrors the reference's decorator-registry pattern
(llmc/utils/registry_factory.py:1-49) — five registries keyed by class name,
used by the driver to look up models, algorithms, preprocessors, KV caches and
token-reduction modules from YAML config strings.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Register(dict):
    """A dict-backed registry usable as a decorator.

    @MODEL_REGISTRY            -> key = cls.__name__
    @MODEL_REGISTRY.register("Alias") -> explicit key
    """

    def __init__(self, name: str):
        super().__init__()
        self.name = name

    def register(self, key: str) -> Callable:
        def deco(obj: Any) -> Any:
            if key in self:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self[key] = obj
            return obj

        return deco

    def __call__(self, obj: Any) -> Any:
        return self.register(obj.__name__)(obj)

    def __missing__(self, key: str):
        raise KeyError(
            f"{key!r} not found in {self.name}; available: {sorted(self.keys())}"
        )


MODEL_REGISTRY = Register("MODEL_REGISTRY")
ALGO_REGISTRY = Register("ALGO_REGISTRY")
PREPROC_REGISTRY = Register("PREPROC_REGISTRY")
KV_REGISTRY = Register("KV_REGISTRY")
TOKEN_REDUCTION_REGISTRY = Register("TOKEN_REDUCTION_REGISTRY")
SPARSIFY_REGISTRY = Register("SPARSIFY_REGISTRY")
