"""SmoothQuant — activation-scale migration (llmc smoothquant.py:13-79).

scale = x_absmax^alpha / w_absmax^(1-alpha), applied to ln->fcs subsets only;
the classic W8A8 enabling transform.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...models.base import Subset, resolve
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization


@ALGO_REGISTRY
class SmoothQuant(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        self.alpha = self.special_config.get("alpha", 0.5)

    def get_weight_scale(self, bp, layer_names):
        """Column-wise |W| max over all subset layers (smoothquant.py:28-37)."""
        maxes = [
            jnp.max(jnp.abs(resolve(bp, n)["weight"].astype(jnp.float32)),
                    axis=0)
            for n in layer_names
        ]
        return jnp.clip(jnp.max(jnp.stack(maxes), axis=0), 1e-5, None)

    @staticmethod
    def get_act_scale(batches):
        m = None
        for x in batches:
            cur = jnp.max(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0).astype(
                jnp.float32
            )
            m = cur if m is None else jnp.maximum(m, cur)
        return m

    def subset_transform(self, block_idx, bp, subset: Subset, input_feat):
        if subset.prev_type != "norm":  # ln->fcs only (smoothquant.py:21-25)
            return
        w_max = self.get_weight_scale(bp, subset.layers)
        x_max = self.get_act_scale(input_feat[subset.input])
        scale = jnp.clip(
            x_max**self.alpha / w_max ** (1.0 - self.alpha), 1e-5, None
        )
        self.apply_scale(bp, subset, scale)
        if self.act_static:
            self.update_input_feat(input_feat, subset, scale)
