"""Blockwise sparsification base (llmc base_blockwise_sparsification.py:15-204).

Same block loop as quantization; ``sparsity_out`` re-forwards each block
through the pruned weights so later blocks calibrate on pruned activations.
Supports unstructured sparsity ratios and N:M structured patterns.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import DotDict
from ..blockwise import BlockwiseOpt

Array = jax.Array


def parse_pattern(cfg: Dict) -> Tuple[Optional[float], Optional[Tuple[int, int]]]:
    """Returns (sparsity_ratio, (n, m)) — one of the two set."""
    if "n_out_m" in cfg:
        n, m = cfg["n_out_m"]
        return None, (int(n), int(m))
    pat = cfg.get("pattern", None)
    if isinstance(pat, str) and ":" in pat:
        n, m = pat.split(":")
        return None, (int(n), int(m))
    return float(cfg.get("sparsity", 0.5)), None


def prune_mask_unstructured(metric: Array, sparsity: float) -> Array:
    """True = keep.  Per-row: prune the lowest-metric fraction
    (wanda.py:48-55)."""
    k = int(metric.shape[-1] * sparsity)
    if k == 0:
        return jnp.ones_like(metric, dtype=bool)
    thresh = jnp.sort(metric, axis=-1)[..., k - 1 : k]
    return metric > thresh


def prune_mask_nm(metric: Array, n: int, m: int) -> Array:
    """N:M structured: in every group of m consecutive inputs keep the
    (m - n) largest."""
    rows, cols = metric.shape
    g = metric.reshape(rows, cols // m, m)
    order = jnp.argsort(g, axis=-1)  # ascending
    ranks = jnp.argsort(order, axis=-1)
    keep = ranks >= n  # drop n smallest
    return keep.reshape(rows, cols)


class BaseBlockwiseSparsification(BlockwiseOpt):
    def __init__(self, model, sparsity_config, input_batches,
                 padding_masks=None, config=None):
        super().__init__(model, sparsity_config, input_batches, padding_masks,
                         config)
        self.sparsity_config = sparsity_config or DotDict()
        wcfg = self.sparsity_config.get("weight", self.sparsity_config)
        self.sparsity, self.nm = parse_pattern(wcfg)
        self.sparsity_out = self.sparsity_config.get("sparsity_out", False)
        # sparse KV caches (ShadowKV / Sink, kvsparse.py) configured under
        # the sparsification section's kvcache key
        kvc = self.sparsity_config.get("kvcache", None)
        if kvc:
            from ...registry import KV_REGISTRY

            self.kv_module = KV_REGISTRY[kvc["method"]](
                "sparse", dict(kvc), model.num_blocks
            )
        else:
            self.kv_module = None

    def make_mask(self, metric: Array) -> Array:
        if self.nm is not None:
            return prune_mask_nm(metric, *self.nm)
        return prune_mask_unstructured(metric, self.sparsity)

    def block_opt(self, block_idx: int):
        feats, outs = self.collect_block_io(block_idx)
        if not self.sparsity_out:
            self.input_batches = outs
        self.block_transform(block_idx, feats)
        if self.sparsity_out:
            self.input_batches = self.block_forward_batches(block_idx)

    def block_transform(self, block_idx: int, input_feat):
        bp = self.model.blocks[block_idx]
        for subset in self.model.get_subsets_in_block(block_idx):
            self.subset_transform(block_idx, bp, subset, input_feat)

    def subset_transform(self, block_idx, bp, subset, input_feat):
        raise NotImplementedError

    def deploy(self, mode: str = "transformed"):
        self.model.deploy_float()
        if self.kv_module is not None:
            self.model.kv_hooks = [
                self.kv_module.make_hook(i)
                for i in range(self.model.num_blocks)
            ]

    def restore_float(self):
        self.model.deploy_float()

    def save_model(self, save_dir: str):
        from ...models.hf_loader import save_params

        save_params(self.model, save_dir,
                    hf_config=getattr(self.model, "config", None))
