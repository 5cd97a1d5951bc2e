"""ShortGPT — layer removal by Block Influence (llmc shortgpt.py:19-100).

BI(block) = sum over tokens of (1 - cos(input, output)); the
``n_prune_layers`` lowest-BI blocks are deleted at deploy.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseSparsification


@ALGO_REGISTRY
class ShortGPT(BaseBlockwiseSparsification):
    def __init__(self, model, sparsity_config, input_batches,
                 padding_masks=None, config=None):
        super().__init__(model, sparsity_config, input_batches, padding_masks,
                         config)
        self.n_prune_layers = self.sparsity_config.get(
            "n_prune_layers",
            self.sparsity_config.get("weight", {}).get("n_prune_layers", 1),
        )
        self.importances = np.zeros(model.num_blocks)

    def block_opt(self, block_idx: int):
        ins = list(self.input_batches)
        _, outs = self.collect_block_io(block_idx)
        bi = 0.0
        for x, y in zip(ins, outs):
            xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            yf = y.reshape(-1, y.shape[-1]).astype(jnp.float32)
            sim = jnp.sum(xf * yf, axis=-1) / (
                jnp.linalg.norm(xf, axis=-1) * jnp.linalg.norm(yf, axis=-1)
            )
            sim = jnp.nan_to_num(sim, nan=0.5)
            bi += float(jnp.sum(1 - sim))
        self.importances[block_idx] = bi
        self.input_batches = outs

    def block_transform(self, *a, **k):
        pass

    def subset_transform(self, *a, **k):
        pass

    def remove_layers(self, layers_to_remove: Optional[List[int]] = None):
        if not layers_to_remove and self.n_prune_layers:
            layers_to_remove = np.argsort(self.importances)[
                : self.n_prune_layers
            ].tolist()
        for idx in sorted(layers_to_remove, reverse=True):
            del self.model.params["blocks"][idx]
        return layers_to_remove

    def deploy(self, mode: str = "transformed"):
        self.removed = self.remove_layers()
        self.model.deploy_float()
