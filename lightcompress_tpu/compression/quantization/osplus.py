"""OS+ (Outlier Suppression+) — channel shift + grid-searched clipping-range
scale migration (llmc osplus.py:30-235).

Per ln->fcs subset: (1) channel shift = (cmax+cmin)/2 folded into biases
(models with bias only); (2) grid search over a symmetric clipping range
[-st, st]; channels exceeding it get scale c/st migrated into the weights;
loss = quantized subset output MSE.  The range grid is a jitted ``lax.map``
(the reference walks it in Python, osplus.py:110-170).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ...models.base import Subset, resolve
from ...quant import fake_quant_act_dynamic, fake_quant_weight_dynamic
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization

Array = jax.Array


@ALGO_REGISTRY
class OsPlus(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        self.n_grid = int(self.special_config.get("n_grid", 100))
        self._search_cache = {}

    def subset_transform(self, block_idx, bp, subset: Subset, input_feat):
        if subset.prev_type != "norm":  # ln->fcs only (osplus.py:36-41)
            return
        x = jnp.concatenate(input_feat[subset.input], axis=0)
        scale, shift = self.search_scale_shift_subset(block_idx, bp, subset, x)
        self.apply_shift(bp, subset, shift)
        self.apply_scale(bp, subset, scale)
        if self.act_static:
            self.update_input_feat(input_feat, subset, scale)

    # ------------------------------------------------------------------
    def search_scale_shift_subset(self, block_idx, bp, subset: Subset,
                                  x: Array):
        model = self.model
        has_bias = self.model.arch.family == "opt"  # LN has bias
        wspec, aspec, w_only = self.wspec, self.aspec, self.w_only
        layer_names = subset.layers
        n_grid = self.n_grid

        def search(bp, x):
            xf = x.astype(jnp.float32)
            flat = xf.reshape(-1, xf.shape[-1])
            if has_bias:
                cmx0 = jnp.max(flat, axis=0)
                cmn0 = jnp.min(flat, axis=0)
                shift = (cmx0 + cmn0) / 2.0
            else:
                shift = jnp.zeros((xf.shape[-1],), jnp.float32)
            x_shift = xf - shift
            flat_s = x_shift.reshape(-1, x_shift.shape[-1])
            cmx = jnp.max(flat_s, axis=0)
            cmn = jnp.min(flat_s, axis=0)
            amx = jnp.maximum(jnp.max(flat_s), 0.0)
            amn = jnp.minimum(jnp.min(flat_s), 0.0)
            bound_hi = jnp.maximum(-amn, amx)
            org_out = model.inspect_forward(block_idx, subset, x, block_params=bp)

            def scale_for(st):
                mx_scale = jnp.where(cmx > st, cmx / st, 1.0)
                mn_scale = jnp.where(cmn < -st, cmn / (-st), 1.0)
                return jnp.maximum(mx_scale, mn_scale)

            def eval_range(st):
                cur_scale = scale_for(st)
                bp_s = _copy_tree(bp)
                for name in layer_names:
                    node = resolve(bp_s, name)
                    w = node["weight"].astype(jnp.float32)
                    if has_bias and "bias" in node and node["bias"] is not None:
                        node["bias"] = (
                            node["bias"].astype(jnp.float32) + w @ shift
                        ).astype(node["bias"].dtype)
                    w = w * cur_scale[None, :]
                    node["weight"] = fake_quant_weight_dynamic(w, wspec).astype(
                        node["weight"].dtype
                    )
                x_q = x_shift / cur_scale[None, :]
                if not w_only and aspec is not None:
                    x_q = fake_quant_act_dynamic(x_q, aspec)
                out = model.inspect_forward(
                    block_idx, subset, x_q.astype(x.dtype), block_params=bp_s
                )
                return jnp.mean(
                    jnp.sum(
                        (org_out.astype(jnp.float32)
                         - out.astype(jnp.float32)) ** 2, axis=-1,
                    )
                )

            # grid from bound_hi down to 1.0 (osplus.py:110-140)
            steps = jnp.arange(n_grid, dtype=jnp.float32)
            sts = jnp.maximum(bound_hi - steps * (bound_hi - 1.0) / n_grid, 1.0)
            losses = jax.lax.map(eval_range, sts)
            best_st = sts[jnp.argmin(losses)]
            return scale_for(best_st), shift

        key = (subset.input, x.shape)
        if key not in self._search_cache:
            self._search_cache[key] = jax.jit(search)
        scale, shift = self._search_cache[key](bp, x)
        return scale, (shift if has_bias else None)


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree
