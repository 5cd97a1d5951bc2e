"""Blockwise optimization engine.

Functional analogue of llmc/compression/blockwise_optimization.py: walk the
transformer blocks, collect per-linear input activations for the calib set,
hand them to the algorithm's ``block_transform``, then propagate hidden
states to the next block (optionally through the quantized forward —
``quant_out``, bbq.py:451-461).

Hook-free: ``models.arch.block_forward`` explicitly returns the feats dict,
so "registering hooks" (blockwise_optimization.py:53-61) is just reading the
second return value.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..config import DotDict
from ..models import arch as A
from ..models.base import BaseModel


class BlockwiseOpt:
    def __init__(
        self,
        model: BaseModel,
        compress_config: DotDict,
        input_batches: List[jax.Array],
        padding_masks: Optional[List] = None,
        config: Optional[DotDict] = None,
    ):
        self.model = model
        self.compress_config = compress_config or DotDict()
        self.quant_config = self.compress_config  # reference naming
        self.config = config or DotDict()
        self.input_batches = list(input_batches)
        self.padding_masks = padding_masks
        self.block_idx: int = -1
        self.n_samples = sum(
            int(_split_batch(b)[0].shape[0]) for b in input_batches
        )
        # saved-artifact composability (blockwise_optimization.py:40-51)
        self.act_scales: Dict[str, Any] = {}
        self.act_shifts: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    def run_block_loop(self):
        from ..models.streaming import StreamingBlockContext
        from ..utils.profiling import timer

        method = self.compress_config.get("method", type(self).__name__)
        with timer.phase(f"block_loop/{method}"):
            for idx in range(self.model.num_blocks):
                self.block_idx = idx
                # host-offloaded models stream one block into HBM at a time
                # (bbq.py:397,418 block cuda<->cpu analogue)
                with timer.phase("block"), StreamingBlockContext(self.model,
                                                                 idx):
                    self.block_opt(idx)
        self.save_artifacts()

    def save_artifacts(self):
        special = self.compress_config.get("special", {})
        if special.get("save_scale", False) and self.act_scales:
            path = special["scale_path"]
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "scales.pkl"), "wb") as f:
                pickle.dump(jax.device_get(self.act_scales), f)
        if special.get("save_clip", False) and getattr(self, "weight_clips", None):
            path = special["clip_path"]
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "clips.pkl"), "wb") as f:
                pickle.dump(jax.device_get(self.weight_clips), f)

    # ------------------------------------------------------------------
    def collect_block_io(
        self,
        block_idx: int,
        linear_fn: Optional[A.LinearFn] = None,
    ):
        """Run all calib batches through block ``block_idx``; returns
        (feats: name -> list of arrays, outs: list of arrays)."""
        model = self.model
        bp = model.blocks[block_idx]

        def one(bp, x, extra):
            y, feats, kv = model.block_forward(
                block_idx, x, linear_fn=linear_fn, block_params=bp,
                **({"extra": extra} if extra is not None else {}),
            )
            return y, feats, kv

        run = jax.jit(one, static_argnames=()) if linear_fn is None else one
        feats_acc: Dict[str, List[jax.Array]] = {}
        outs: List = []
        kvs: List = []
        for item in self.input_batches:
            x, extra = _split_batch(item)
            y, feats, kv = one(bp, x, extra) if extra is not None else \
                run(bp, x, None)
            outs.append((y, extra) if extra is not None else y)
            kvs.append(kv)
            for k, v in feats.items():
                feats_acc.setdefault(k, []).append(v)
        self._last_kv_states = kvs
        return feats_acc, outs

    def block_forward_batches(
        self, block_idx: int, linear_fn: Optional[A.LinearFn] = None
    ) -> List[jax.Array]:
        model = self.model
        bp = model.blocks[block_idx]

        def one(bp, x, extra):
            y, _, _ = model.block_forward(
                block_idx, x, linear_fn=linear_fn, block_params=bp,
                **({"extra": extra} if extra is not None else {}),
            )
            return y

        out = []
        for item in self.input_batches:
            x, extra = _split_batch(item)
            y = one(bp, x, extra)
            out.append((y, extra) if extra is not None else y)
        return out

    # ------------------------------------------------------------------
    def block_opt(self, block_idx: int):  # pragma: no cover - abstract
        raise NotImplementedError

    def block_transform(self, block_idx: int, input_feat, *args):
        raise NotImplementedError


def _split_batch(item):
    """Calib batches are either plain arrays or (x, extras) tuples — extras
    carry per-batch conditioning (DiT timestep/context embeddings, the Wan
    per-denoising-step kwargs, wan_t2v.py Catcher)."""
    if isinstance(item, tuple):
        return item[0], item[1]
    return item, None
