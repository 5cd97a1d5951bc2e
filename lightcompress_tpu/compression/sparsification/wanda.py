"""Wanda — prune by |W| * ||x||_2 (llmc wanda.py:11-76)."""

from __future__ import annotations

import jax.numpy as jnp

from ...models.base import Subset, resolve
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseSparsification


@ALGO_REGISTRY
class Wanda(BaseBlockwiseSparsification):
    def get_row_scale(self, batches):
        """Per-input-channel squared L2 norm of activations over the calib
        set (wanda.py:16-31)."""
        total = None
        nsamples = 0
        for x in batches:
            nsamples += x.shape[0]
            flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            s = jnp.sum(flat * flat, axis=0)
            total = s if total is None else total + s
        return total / nsamples

    def subset_transform(self, block_idx, bp, subset: Subset, input_feat):
        scaler_row = self.get_row_scale(input_feat[subset.input])
        for name in subset.layers:
            node = resolve(bp, name)
            w = node["weight"]
            metric = jnp.abs(w.astype(jnp.float32)) * jnp.sqrt(scaler_row)[None, :]
            mask = self.make_mask(metric)
            node["weight"] = jnp.where(mask, w, 0).astype(w.dtype)
