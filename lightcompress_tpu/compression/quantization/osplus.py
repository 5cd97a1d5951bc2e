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

    @staticmethod
    def _grid(bound_hi: float) -> "jnp.ndarray":
        """The reference's clipping-range grid EXACTLY (osplus.py:104-116):
        num = max(100, int(amx/0.5)) points walked by float64 repeated
        subtraction from bound_hi down to (and including) 1.0 — grid size
        is DATA-dependent, and the fp drift of the subtraction walk is
        part of the reference's semantics, so replicate rather than
        linspace."""
        import math as _math

        num = max(100, int(bound_hi / 0.5)) if _math.isfinite(bound_hi) \
            else 100
        step = (bound_hi - 1.0) / num
        sts, st = [], float(bound_hi)
        if step <= 0:
            return jnp.asarray([1.0], jnp.float32)
        while st >= 1.0:
            sts.append(st)
            st -= step
        return jnp.asarray(sts, jnp.float32)

    # ------------------------------------------------------------------
    def search_scale_shift_subset(self, block_idx, bp, subset: Subset,
                                  x: Array):
        model = self.model
        has_bias = self.model.arch.family == "opt"  # LN has bias
        wspec, aspec, w_only = self.wspec, self.aspec, self.w_only
        layer_names = subset.layers

        # shift/amax are cheap eager reductions; the grid must be built
        # host-side because its LENGTH is data-dependent (reference
        # parity — the jit below is cached per grid length)
        xf_h = x.astype(jnp.float32).reshape(-1, x.shape[-1])
        if has_bias:
            shift_h = (jnp.max(xf_h, axis=0) + jnp.min(xf_h, axis=0)) / 2.0
            xs_h = xf_h - shift_h
        else:
            xs_h = xf_h
        amx_h = float(jnp.maximum(jnp.max(xs_h), 0.0))
        amn_h = float(jnp.minimum(jnp.min(xs_h), 0.0))
        sts_host = self._grid(max(-amn_h, amx_h))

        def search(bp, x, sts):
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

            losses = jax.lax.map(eval_range, sts)
            best_st = sts[jnp.argmin(losses)]
            return scale_for(best_st), shift

        key = (subset.input, x.shape, int(sts_host.shape[0]))
        if key not in self._search_cache:
            self._search_cache[key] = jax.jit(search)
        scale, shift = self._search_cache[key](bp, x, sts_host)
        return scale, (shift if has_bias else None)


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree
