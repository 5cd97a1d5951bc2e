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


from ...registry import ALGO_REGISTRY
from ..blockwise import BlockwiseOpt


@ALGO_REGISTRY
class TokenReduction(BlockwiseOpt):
    """Standalone token-reduction "algorithm" (reference
    base_blockwise_token_reduction.py:13-31): configs whose only method is
    token reduction (``method: TokenReduction`` with
    ``special.method: <name>``) install the reduction hooks at construction
    and do nothing per block; deploy is a no-op."""

    def __init__(self, model, sparsity_config, input_batches=None,
                 padding_masks=None, config=None):
        super().__init__(model, sparsity_config, input_batches or [],
                         padding_masks, config)
        special = self.compress_config.get("special", {})
        TOKEN_REDUCTION_REGISTRY[special["method"]](
            dict(self.compress_config), model)

    def block_opt(self, block_idx):
        pass

    def deploy(self, deploy_format: str = "fake_quant"):
        pass

    def restore_float(self):
        pass

    def save_model(self, save_dir: str):
        from ..quantization.base import BaseBlockwiseQuantization

        BaseBlockwiseQuantization.save_model(self, save_dir)
