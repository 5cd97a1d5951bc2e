"""NormTweaking — train LN gamma/beta per block to minimize quantization
output drift (llmc ntweak.py:21-210)."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ...models import arch as A
from ...quant import fake_quant_act_dynamic, fake_quant_weight_dynamic
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization, _struct_copy
from .train_utils import mse_loss, train_block

Array = jax.Array


@ALGO_REGISTRY
class NormTweaking(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        sp = self.special_config
        self.epochs = sp.get("epochs", 3)
        self.ntweak_lr = sp.get("ntweak_lr", 1e-3)
        self.gamma = sp.get("gamma", 0.0)

    def block_transform(self, block_idx, input_feat):
        model = self.model
        bp = model.blocks[block_idx]
        # float targets
        targets = []
        for x in self.input_batches:
            y, _, _ = model.block_forward(block_idx, x)
            targets.append(y)

        wspec = self.wspec.with_(ste=True)
        aspec = self.aspec.with_(ste=True) if self.aspec is not None else None
        w_only = self.w_only
        arch = model.arch

        def quant_forward(ln_params: Dict, x: Array) -> Array:
            bp_t = _struct_copy(bp)
            bp_t["ln1"] = ln_params["ln1"]
            bp_t["ln2"] = ln_params["ln2"]

            def lf(name, w, b, xx):
                if not w_only and aspec is not None:
                    xx = fake_quant_act_dynamic(xx, aspec)
                wq = fake_quant_weight_dynamic(w, wspec)
                return A.default_linear(name, wq, b, xx)

            T = x.shape[1]
            cos, sin = model.rope_tables(T)
            mask = A.causal_mask(T, T)
            y, _, _ = A.block_forward(arch, bp_t, x, cos, sin, mask,
                                      linear_fn=lf)
            return y

        def loss_fn(params, x, target):
            return mse_loss(quant_forward(params, x), target)

        init = {"ln1": dict(bp["ln1"]), "ln2": dict(bp["ln2"])}
        # per-block lr schedule (ntweak.py:198-202)
        lr = self.ntweak_lr * (
            1 + self.gamma * (block_idx / max(1, model.num_blocks))
        )
        trained, loss = train_block(
            loss_fn, init, self.input_batches, targets, lr, self.epochs
        )
        bp["ln1"] = {k: v.astype(bp["ln1"][k].dtype) for k, v in
                     trained["ln1"].items()}
        bp["ln2"] = {k: v.astype(bp["ln2"][k].dtype) for k, v in
                     trained["ln2"].items()}

    def subset_transform(self, *a, **k):
        pass
