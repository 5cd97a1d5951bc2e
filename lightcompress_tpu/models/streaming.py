"""Host-offloaded block streaming — quantize/evaluate models larger than HBM.

The reference's headline memory trick (README.md:43,111 — 405B/671B on one
80 GB GPU) via block-granular CPU<->GPU movement
(base_blockwise_quantization.py:397,418 and eval_base.py:173-194
``inference_per_block``).  TPU-native version: block params live in host RAM
as numpy; exactly one block's weights occupy HBM at a time
(``jax.device_put`` on entry, host write-back after transforms).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def tree_to_host(tree):
    """jnp -> numpy leaves (frees device memory once references drop)."""
    if isinstance(tree, dict):
        return {k: tree_to_host(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [tree_to_host(v) for v in tree]
    if isinstance(tree, jax.Array):
        return np.asarray(tree)
    return tree


def tree_to_device(tree):
    if isinstance(tree, dict):
        return {k: tree_to_device(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [tree_to_device(v) for v in tree]
    if isinstance(tree, np.ndarray):
        return jnp.asarray(tree)
    return tree


def offload_blocks_to_host(model) -> None:
    """Move all block params to host RAM; engine/evals stream them back
    one block at a time."""
    model.params["blocks"] = [
        tree_to_host(bp) for bp in model.params["blocks"]
    ]
    model.host_offload = True


def stream_forward(model, input_ids: Array) -> Array:
    """Full forward with one-block-at-a-time HBM residency
    (eval_base.py:186-194 inference_per_block)."""
    from . import arch as A

    arch = model.arch
    x = A.embed_forward(arch, model.params, input_ids)
    T = input_ids.shape[-1]
    cos, sin = model.rope_tables(T)
    mask = A.causal_mask(T, T)
    lfs = model.linear_fns
    hooks = model.kv_hooks
    for idx, bp_host in enumerate(model.params["blocks"]):
        bp = tree_to_device(bp_host)
        lf = lfs[idx] if lfs is not None else None
        x, _, _ = A.block_forward(
            arch, bp, x, cos, sin, mask,
            linear_fn=lf or model.default_linear_fn() or A.default_linear,
            kv_hook=hooks[idx] if hooks else None,
        )
        del bp
    return A.head_forward(arch, model.params, x)


class StreamingBlockContext:
    """Context manager: device-put one block for the blockwise engine, write
    transformed params back to host on exit."""

    def __init__(self, model, block_idx: int):
        self.model = model
        self.idx = block_idx

    def __enter__(self):
        if getattr(self.model, "host_offload", False):
            self._host = self.model.params["blocks"][self.idx]
            self.model.params["blocks"][self.idx] = tree_to_device(self._host)
        return self.model.params["blocks"][self.idx]

    def __exit__(self, *exc):
        if getattr(self.model, "host_offload", False):
            self.model.params["blocks"][self.idx] = tree_to_host(
                self.model.params["blocks"][self.idx]
            )
        return False
