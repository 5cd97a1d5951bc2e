"""Magnitude pruning (llmc magnitude.py:10-40): global-per-layer |W|
threshold."""

from __future__ import annotations

import jax.numpy as jnp

from ...models.base import Subset, resolve
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseSparsification


@ALGO_REGISTRY
class Magnitude(BaseBlockwiseSparsification):
    def subset_transform(self, block_idx, bp, subset: Subset, input_feat):
        for name in subset.layers:
            node = resolve(bp, name)
            w = node["weight"]
            metric = jnp.abs(w.astype(jnp.float32))
            if self.nm is not None:
                mask = self.make_mask(metric)
            else:
                flat = jnp.sort(metric.reshape(-1))
                k = int(flat.shape[0] * self.sparsity)
                thresh = flat[k]
                mask = metric > thresh
            node["weight"] = jnp.where(mask, w, 0).astype(w.dtype)
