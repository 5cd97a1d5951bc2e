"""AdaDim — per-layer quantization-dimension selection (llmc adadim.py:11-112).

For every linear, compare reconstruction MSE of per-output-channel vs
per-input-channel quantization on the calib inputs; remember the better dim
and use it at deploy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.base import resolve
from ...quant import fake_quant_weight_dynamic
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization


@ALGO_REGISTRY
class AdaDim(BaseBlockwiseQuantization):
    def block_transform(self, block_idx, input_feat):
        bp = self.model.blocks[block_idx]
        for name in self.model.get_block_linear_names(block_idx):
            if name not in input_feat or self.is_ignored(block_idx, name):
                continue
            node = resolve(bp, name)
            w = node["weight"].astype(jnp.float32)
            x = jnp.concatenate(
                [f.reshape(-1, f.shape[-1]) for f in input_feat[name]], axis=0
            ).astype(jnp.float32)
            org = x @ w.T
            losses = {}
            for dim_ic in (False, True):
                qw = fake_quant_weight_dynamic(w, self.wspec, dim_ic=dim_ic)
                losses[dim_ic] = float(jnp.mean((x @ qw.T - org) ** 2))
            self.state(block_idx, name)["dim_ic"] = losses[True] < losses[False]

    def subset_transform(self, *a, **k):
        pass

    def w_qdq(self, w, block_idx, name):
        st = self.layer_state[block_idx].get(name, {})
        return fake_quant_weight_dynamic(
            w, self.wspec_for(block_idx, name),
            dim_ic=st.get("dim_ic", False),
        )
