"""SpQR — GPTQ-style quantization with sparse fp outliers
(llmc spqr.py:20-398).

The Hessian-compensated column loop is shared with GPTQ
(gptq.gptq_quantize_layer); outlier detection keeps the
``outlier_ratio`` fraction of weights with the largest
sensitivity-weighted quantization error in full precision as a sparse
correction (the reference's per-group leave-one-out criterion,
spqr.py:184-255, approximated by the error*sensitivity score).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...models.base import Subset, resolve
from ...quant import QParams
from ...registry import ALGO_REGISTRY
from .gptq import GPTQ, gptq_quantize_layer

Array = jax.Array


@ALGO_REGISTRY
class SpQR(GPTQ):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        sp = self.special_config
        self.outlier_ratio = sp.get("outlier_ratio", 0.01)

    def subset_transform(self, block_idx, bp, subset: Subset, input_feat):
        gs = self.wspec.group_size if self.wspec.granularity == "per_group" \
            else -1
        for name in subset.layers:
            if self.is_ignored(block_idx, name):
                continue
            node = resolve(bp, name)
            W = node["weight"]
            H = self.compute_hessian(input_feat[name], name)
            W_new, scales, zeros, perm = gptq_quantize_layer(
                W.astype(jnp.float32), H, self.wspec,
                blocksize=min(self.blocksize, W.shape[1]),
                group_size=gs,
                actorder=self.actorder,
                static_groups=self.static_groups,
                percdamp=self.percdamp,
            )
            node["weight"] = W_new.astype(W.dtype)
            st = self.state(block_idx, name)
            st["gptq"] = {
                "scales": scales, "zeros": zeros,
                "perm": perm if self.actorder else None,
                "group_size": gs if gs > 0 else W.shape[1],
            }
            # sensitivity-weighted outliers stay fp (sparse correction)
            q = super().w_qdq(W_new.astype(W.dtype), block_idx, name)
            err = jnp.abs(
                W_new.astype(jnp.float32) - q.astype(jnp.float32)
            ) * jnp.sqrt(jnp.diagonal(H))[None, :]
            k = max(1, int(err.size * self.outlier_ratio))
            thresh = jnp.sort(err.reshape(-1))[-k]
            st["outlier_mask"] = err >= thresh

    def w_qdq(self, w, block_idx, name):
        q = super().w_qdq(w, block_idx, name)
        st = self.layer_state[block_idx].get(name, {})
        mask = st.get("outlier_mask")
        if mask is None:
            return q
        return jnp.where(mask, w, q)
