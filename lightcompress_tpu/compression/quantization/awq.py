"""AWQ — activation-aware weight quantization.

Re-design of llmc/compression/quantization/awq.py:28-372.  The 20-point
grid search over the scale ratio (awq.py:196-253) becomes a single jitted
``lax.map`` over the ratio vector — the subset forward, weight fake-quant and
MSE loss are traced once and reused for every ratio and every block (same
shapes), instead of the reference's Python triple loop.

Distributed: per-rank best losses are argmin-merged and the winning rank's
scales broadcast (awq.py:255-273) via parallel.dist helpers (identity in
single-process runs).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ...models.base import Subset, resolve
from ...quant import fake_quant_act_dynamic, fake_quant_weight_dynamic, reshape_tensor
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization

Array = jax.Array


@ALGO_REGISTRY
class Awq(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None, config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        special = self.special_config
        self.trans = special.get("trans", True)
        self.trans_version = special.get("trans_version", "v2")
        self.n_grid = int(special.get("n_grid", 20))
        self._search_cache = {}

    # ------------------------------------------------------------------
    def get_weight_scale(self, bp: Dict, layer_names) -> Array:
        """Mean per-group-normalized |W| over the subset's layers
        (awq.py:48-72); returns (in_features,)."""
        total = None
        for name in layer_names:
            w = resolve(bp, name)["weight"].astype(jnp.float32)
            org_shape = w.shape
            r = reshape_tensor(w, self.wspec)
            scale = jnp.abs(r) / jnp.clip(
                jnp.max(jnp.abs(r), axis=-1, keepdims=True), 1e-12, None
            )
            # mean over all output rows (leading dims incl. stacked experts)
            scale = scale.reshape(-1, org_shape[-1]).mean(axis=0)
            total = scale if total is None else total + scale
        return total / len(layer_names)

    @staticmethod
    def get_act_scale(x: Array) -> Array:
        """Mean |x| per channel over all tokens (awq.py:74-85)."""
        return jnp.mean(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0)

    # ------------------------------------------------------------------
    def search_scale_subset(
        self, block_idx: int, bp: Dict, subset: Subset, x: Array
    ) -> Array:
        """Grid search the per-channel scale minimizing subset-output MSE."""
        model = self.model
        wspec = self.wspec
        aspec = self.aspec
        w_only = self.w_only
        trans_v = self.trans_version
        n_grid = self.n_grid
        layer_names = subset.layers

        def search(bp, x):
            w_max = self.get_weight_scale(bp, layer_names)
            x_mean = self.get_act_scale(x)
            org_out = model.inspect_forward(block_idx, subset, x, block_params=bp)

            def eval_ratio(ratio):
                if trans_v == "v1":
                    scales = jnp.clip(
                        x_mean**ratio / jnp.clip(w_max, 1e-12, None) ** (1.0 - ratio),
                        1e-4,
                        None,
                    )
                else:
                    scales = jnp.clip(x_mean**ratio, 1e-4, None)
                scales = scales / jnp.sqrt(jnp.max(scales) * jnp.min(scales))
                # scaled + fake-quantized subset weights (awq.py:147-163)
                bp_s = _copy_tree(bp)
                for name in layer_names:
                    node = resolve(bp_s, name)
                    w = node["weight"].astype(jnp.float32) * scales[None, :]
                    node["weight"] = fake_quant_weight_dynamic(w, wspec).astype(
                        node["weight"].dtype
                    )
                x_s = x / scales
                if not w_only and aspec is not None:
                    x_s = fake_quant_act_dynamic(x_s, aspec)
                out = model.inspect_forward(block_idx, subset, x_s, block_params=bp_s)
                loss = jnp.mean(
                    (org_out.astype(jnp.float32) - out.astype(jnp.float32)) ** 2
                )
                return loss, scales

            ratios = jnp.arange(n_grid, dtype=jnp.float32) / n_grid
            losses, scales_all = jax.lax.map(eval_ratio, ratios)
            best = jnp.argmin(losses)
            return scales_all[best], losses[best]

        key = (subset.input, x.shape)
        if key not in self._search_cache:
            self._search_cache[key] = jax.jit(search)
        best_scales, best_loss = self._search_cache[key](bp, x)

        # cross-rank argmin-broadcast (awq.py:255-273)
        from ...parallel import dist

        if dist.is_distributed():
            src = dist.argmin_rank(float(best_loss))
            best_scales = dist.broadcast_from(best_scales, src)
        return best_scales

    # ------------------------------------------------------------------
    def subset_transform(self, block_idx, bp, subset: Subset, input_feat):
        if subset.prev_op is None:
            return
        if subset.prev_type == "linear":
            fc1 = resolve(bp, subset.prev_op)
            fc2 = resolve(bp, subset.layers[0])
            if fc1["weight"].ndim == 3 or fc2["weight"].ndim == 3:
                # stacked MoE experts: per-expert up->down scale search
                # (deepseekv3.py per-expert down subsets)
                if self.trans and fc1["weight"].ndim == 3 == fc2["weight"].ndim:
                    self._transform_moe_down(block_idx, bp, subset, input_feat)
                return
            if fc1["weight"].shape[0] != fc2["weight"].shape[1]:
                # GQA o_proj: only with do_gqa_trans (awq.py:344-351)
                if not (self.has_gqa and self.do_gqa_trans):
                    return
        if not self.trans:
            return
        x = jnp.concatenate(input_feat[subset.input], axis=0)
        scales = self.search_scale_subset(block_idx, bp, subset, x)
        self.apply_scale(bp, subset, scales)
        self.update_input_feat(input_feat, subset, scales)
        if self.save_scale:
            for name in subset.layers:
                self.act_scales[f"block.{block_idx}.{name}"] = scales

    def _search_scale_single_linear(self, w: Array, x: Array) -> Array:
        """20-point ratio grid for one 2D linear (one MoE expert)."""
        wspec, aspec, w_only = self.wspec, self.aspec, self.w_only
        trans_v, n_grid = self.trans_version, self.n_grid

        def search(w, x):
            wf = w.astype(jnp.float32)
            r2 = reshape_tensor(wf, wspec)
            w_max = (jnp.abs(r2) / jnp.clip(
                jnp.max(jnp.abs(r2), axis=-1, keepdims=True), 1e-12, None)
            ).reshape(-1, wf.shape[-1]).mean(axis=0)
            x_mean = jnp.mean(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0)
            org = jnp.einsum("...i,oi->...o", x.astype(jnp.float32), wf)

            def eval_ratio(ratio):
                if trans_v == "v1":
                    s = jnp.clip(x_mean**ratio /
                                 jnp.clip(w_max, 1e-12, None)**(1 - ratio),
                                 1e-4, None)
                else:
                    s = jnp.clip(x_mean**ratio, 1e-4, None)
                s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))
                wq = fake_quant_weight_dynamic(wf * s[None, :], wspec)
                xs = x.astype(jnp.float32) / s
                if not w_only and aspec is not None:
                    xs = fake_quant_act_dynamic(xs, aspec)
                out = jnp.einsum("...i,oi->...o", xs, wq)
                return jnp.mean((org - out) ** 2), s

            ratios = jnp.arange(n_grid, dtype=jnp.float32) / n_grid
            losses, ss = jax.lax.map(eval_ratio, ratios)
            return ss[jnp.argmin(losses)]

        key = ("single", w.shape, x.shape)
        if key not in self._search_cache:
            self._search_cache[key] = jax.jit(search)
        return self._search_cache[key](w, x)

    def _transform_moe_down(self, block_idx, bp, subset: Subset, input_feat):
        up = resolve(bp, subset.prev_op)
        down = resolve(bp, subset.layers[0])
        E = down["weight"].shape[0]
        xs = input_feat.get(subset.input)
        if not xs or xs[0].ndim != 4:
            return
        for e in range(E):
            x = jnp.concatenate([f[e] for f in xs], axis=0)
            s = self._search_scale_single_linear(down["weight"][e], x)
            uw = up["weight"]
            up["weight"] = uw.at[e].set(
                (uw[e].astype(jnp.float32) / s[:, None]).astype(uw.dtype)
            )
            dw = down["weight"]
            down["weight"] = dw.at[e].set(
                (dw[e].astype(jnp.float32) * s[None, :]).astype(dw.dtype)
            )
            input_feat[subset.input] = [
                f.at[e].set(f[e] / s) for f in input_feat[subset.input]
            ]

    def block_transform(self, block_idx, input_feat):
        if self.trans:
            super().block_transform(block_idx, input_feat)
        if self.weight_clip:
            bp = self.model.blocks[block_idx]
            n_sample_token = None
            if self.config and "calib" in self.config:
                n_sample_token = self.config.calib.get("seq_len", None)
            self.auto_clipper.run(self, block_idx, bp, input_feat, n_sample_token)
            self.weight_clips = self.auto_clipper.weight_clips


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree
