"""OmniQuant — block-wise training of learnable clipping (LWC) and learnable
equivalent transforms (LET) (llmc omniq.py:27-697).

Per block: AdamW minimizes MSE between the float block output and the
quantized forward, where
- LWC: per-layer sigmoid clip factors feed the quantizer's 'learnable' range
  (quant.py:205-219); stored in layer_state for deploy.
- LET: per ln->fcs subset channel scale/shift applied softly during training
  ((x - d)/s into fcs with w*s, b + w@d) and merged into the params via
  apply_scale/apply_shift afterwards (omniq merge, apply_scale path).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ...models import arch as A
from ...models.base import Subset, resolve
from ...quant import (
    fake_quant_act_dynamic,
    qparams_from_range,
    quant_dequant,
    reshape_tensor,
    restore_tensor,
)
from ...quant.quantizer import learnable_range, minmax_range
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization, _struct_copy
from .train_utils import mse_loss, train_block

Array = jax.Array


@ALGO_REGISTRY
class OmniQuant(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        sp = self.special_config
        self.epochs = sp.get("epochs", 5)
        self.lwc = sp.get("lwc", True)
        self.let = sp.get("let", False)
        self.lwc_lr = sp.get("lwc_lr", 1e-2)
        self.let_lr = sp.get("let_lr", 1e-3)
        self.wd = sp.get("wd", 0.0)
        self.ste_wspec = self.wspec.with_(ste=True, calib_algo="learnable")
        self.ste_aspec = (
            self.aspec.with_(ste=True) if self.aspec is not None else None
        )

    # ------------------------------------------------------------------
    def _lwc_init(self, bp, names, init_value=4.0):
        out = {}
        for name in names:
            w = resolve(bp, name)["weight"]
            mn, mx = minmax_range(
                reshape_tensor(w.astype(jnp.float32), self.wspec), self.wspec
            )
            out[name] = {
                "up": jnp.full_like(mx, init_value),
                "low": jnp.full_like(mn, init_value),
            }
        return out

    def _let_subsets(self, block_idx) -> List[Subset]:
        return [
            s for s in self.model.get_subsets_in_block(block_idx)
            if s.prev_type == "norm"
        ]

    # ------------------------------------------------------------------
    def _quant_w(self, w, factors):
        wf = w.astype(jnp.float32)
        t2 = reshape_tensor(wf, self.ste_wspec)
        rng = learnable_range(
            t2, self.ste_wspec,
            lowbound_factor=None if factors is None else factors["low"],
            upbound_factor=None if factors is None else factors["up"],
        )
        qp = qparams_from_range(rng, self.ste_wspec)
        q = quant_dequant(t2, qp, self.ste_wspec)
        return restore_tensor(q, wf.shape, self.ste_wspec).astype(w.dtype)

    def block_transform(self, block_idx, input_feat):
        if self.epochs <= 0 or not (self.lwc or self.let):
            return
        model = self.model
        bp = model.blocks[block_idx]
        arch = model.arch
        names = model.get_block_linear_names(block_idx)

        targets = []
        for x in self.input_batches:
            y, _, _ = model.block_forward(block_idx, x)
            targets.append(y)

        let_subsets = self._let_subsets(block_idx)
        name_to_let = {}
        for i, s in enumerate(let_subsets):
            for n in s.layers:
                name_to_let[n] = i

        trainables: Dict = {}
        if self.lwc:
            trainables["lwc"] = self._lwc_init(bp, names)
        # LET shift folds into the LN bias — only for biased-norm families
        # (reference shift_ln_fcs requires ln.bias; llama RMSNorm has none)
        self.let_shift = self.let and arch.family != "llama"
        if self.let:
            h = arch.hidden_size
            trainables["let"] = [
                {"scale": jnp.ones((h,), jnp.float32),
                 "shift": jnp.zeros((h,), jnp.float32)}
                for _ in let_subsets
            ]

        w_only = self.w_only
        aspec = self.ste_aspec

        def quant_forward(params, x):
            def lf(name, w, b, xx):
                if self.let and name in name_to_let:
                    p = params["let"][name_to_let[name]]
                    s = p["scale"]
                    d = p["shift"] if self.let_shift else 0.0
                    xx = (xx - d) / s
                    wf = w.astype(jnp.float32) * s[None, :]
                    if self.let_shift:
                        delta = w.astype(jnp.float32) @ p["shift"]
                        b = delta if b is None else b + delta
                    w = wf.astype(w.dtype)
                factors = params["lwc"][name] if self.lwc else None
                wq = self._quant_w(w, factors)
                if not w_only and aspec is not None:
                    xx = fake_quant_act_dynamic(xx, aspec)
                return A.default_linear(name, wq, b, xx)

            T = x.shape[1]
            cos, sin = model.rope_tables(T)
            mask = A.causal_mask(T, T)
            y, _, _ = A.block_forward(arch, bp, x, cos, sin, mask,
                                      linear_fn=lf)
            return y

        def loss_fn(params, x, target):
            return mse_loss(quant_forward(params, x), target)

        lr = self.lwc_lr if self.lwc else self.let_lr
        trained, loss = train_block(
            loss_fn, trainables, self.input_batches, targets, lr, self.epochs,
            weight_decay=self.wd,
        )

        # merge LET into params (omniq apply_scale merge)
        if self.let:
            for i, subset in enumerate(let_subsets):
                p = trained["let"][i]
                if self.let_shift:
                    self.apply_shift(bp, subset, p["shift"])
                self.apply_scale(bp, subset, p["scale"])
                self.update_input_feat(input_feat, subset, p["scale"])
        # store LWC factors for deploy (learnable w_qdq path)
        if self.lwc:
            for name in names:
                st = self.state(block_idx, name)
                st["upbound_factor"] = trained["lwc"][name]["up"]
                st["lowbound_factor"] = trained["lwc"][name]["low"]

    def subset_transform(self, *a, **k):
        pass
