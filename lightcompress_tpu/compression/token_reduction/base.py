"""Token reduction subsystem (llmc/compression/token_reduction/).

Vision-token pruning/merging composable with quantization
(hooked from set_quant_config via the 'token_reduction' config key,
bbq.py:261-265).  An algorithm installs per-block hooks
``(model, block_idx, x) -> x'`` on the vision model's ``token_hooks`` —
the functional analogue of the reference's monkey-patched encoder layers.

Every hook must keep shapes static under jit: reductions select a FIXED
number of tokens per (block, config), via top-k/gather — no boolean
masking with dynamic sizes.
"""

from __future__ import annotations

from typing import Any, Dict

from ...registry import TOKEN_REDUCTION_REGISTRY


class TokenReductionModule:
    """Base (token_reduction_module.py:5-50): parse config, register hooks."""

    def __init__(self, config: Dict[str, Any], model, blocks=None):
        self.config = config or {}
        self.model = model
        self.special = self.config.get("special", self.config)
        self.add_sparse_config()
        self.register_reduction_modules()

    def add_sparse_config(self):
        pass

    def register_reduction_modules(self):
        raise NotImplementedError
