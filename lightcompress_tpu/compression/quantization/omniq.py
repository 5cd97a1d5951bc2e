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
        # omniq.py:69-74,100-116 knobs
        self.alpha = sp.get("alpha", 0.5)
        self.aug_loss = sp.get("aug_loss", False)
        # deactive_amp selects f32-vs-f16 training in the reference; our
        # optax training is always f32, so True is the only behavior
        self.deactive_amp = sp.get("deactive_amp", True)
        self.use_shift_cfg = sp.get("use_shift", False)
        self.search_scale_init = sp.get("search_scale_init", False)
        self.loaded_scales = None
        if self.search_scale_init and sp.get("scale_path"):
            import os
            import pickle

            with open(os.path.join(sp["scale_path"], "scales.pkl"),
                      "rb") as f:
                self.loaded_scales = pickle.load(f)
        # omniq.py:84-85,371: init LWC factors from a saved AutoClipper v2
        # run (clips.pkl written by save_clip)
        self.loaded_clips = None
        if sp.get("load_clip", False) and sp.get("clip_path"):
            import os
            import pickle

            with open(os.path.join(sp["clip_path"], "clips.pkl"), "rb") as f:
                self.loaded_clips = pickle.load(f)
        self._fp_inputs = None  # FP-chained teacher stream (get_original_out)
        self.ste_wspec = self.wspec.with_(ste=True, calib_algo="learnable")
        self.ste_aspec = (
            self.aspec.with_(ste=True) if self.aspec is not None else None
        )

    # ------------------------------------------------------------------
    def _lwc_init(self, bp, names, init_value=4.0, block_idx=None):
        out = {}
        clips = {}
        if self.loaded_clips is not None and block_idx is not None:
            clips = self.loaded_clips.get(block_idx, {})
        for name in names:
            w = resolve(bp, name)["weight"]
            mn, mx = minmax_range(
                reshape_tensor(w.astype(jnp.float32), self.wspec), self.wspec
            )
            up_key = f"{name}.upbound_factor"
            if up_key in clips and clips[up_key] is not None:
                up = jnp.asarray(clips[up_key], jnp.float32).reshape(mx.shape)
                low_v = clips.get(f"{name}.lowbound_factor")
                low = (jnp.asarray(low_v, jnp.float32).reshape(mn.shape)
                       if low_v is not None
                       else jnp.full_like(mn, init_value))
            else:
                up = jnp.full_like(mx, init_value)
                low = jnp.full_like(mn, init_value)
            out[name] = {"up": up, "low": low}
        return out

    def _let_subsets(self, block_idx) -> List[Subset]:
        return [
            s for s in self.model.get_subsets_in_block(block_idx)
            if s.prev_type == "norm"
        ]

    def _let_init(self, block_idx, bp, subset: Subset, input_feat):
        """LET scale init (omniq.py:104-116,424-432): SmoothQuant-style
        x_max^alpha / w_max^(1-alpha) from calib act stats (or saved
        scales.pkl when search_scale_init); shift init = channel midpoint
        (act_max+act_min)/2 when use_shift."""
        name0 = subset.layers[0]
        h = resolve(bp, name0)["weight"].shape[-1]
        scale = None
        if self.loaded_scales is not None:
            key = f"block.{block_idx}.{name0}"
            if key in self.loaded_scales:
                scale = jnp.asarray(self.loaded_scales[key], jnp.float32)
        feats = input_feat.get(name0)
        if scale is None and feats:
            x = jnp.concatenate(
                [f.reshape(-1, f.shape[-1]) for f in feats], axis=0
            ).astype(jnp.float32)
            x_absmax = jnp.clip(jnp.max(jnp.abs(x), axis=0), 1e-5, None)
            ws = [jnp.abs(resolve(bp, n)["weight"].astype(jnp.float32))
                  for n in subset.layers]
            w_absmax = jnp.clip(
                jnp.max(jnp.concatenate(
                    [w.reshape(-1, w.shape[-1]) for w in ws], axis=0),
                    axis=0),
                1e-5, None)
            scale = jnp.clip(
                x_absmax ** self.alpha / w_absmax ** (1.0 - self.alpha),
                1e-5, 1e4)
        if scale is None:
            scale = jnp.ones((h,), jnp.float32)
        shift = jnp.zeros((h,), jnp.float32)
        if self.let_shift and feats:
            x = jnp.concatenate(
                [f.reshape(-1, f.shape[-1]) for f in feats], axis=0
            ).astype(jnp.float32)
            shift = (jnp.max(x, axis=0) + jnp.min(x, axis=0)) / 2.0
        return {"scale": scale, "shift": shift}

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

        # FP-chained teacher (get_original_out, omniq.py:145-153): ori_out
        # chains float outputs from block 0 regardless of how the engine
        # propagates inputs; aug_loss adds a second teacher computed from
        # the current (possibly quant-propagated) input stream
        if self._fp_inputs is None:
            self._fp_inputs = list(self.input_batches)
        targets = []
        for x in self._fp_inputs:
            y, _, _ = model.block_forward(block_idx, x)
            targets.append(y)
        targets2 = None
        if self.aug_loss:
            targets2 = []
            for x in self.input_batches:
                y, _, _ = model.block_forward(block_idx, x)
                targets2.append(y)
        self._fp_inputs = targets

        let_subsets = self._let_subsets(block_idx)
        name_to_let = {}
        for i, s in enumerate(let_subsets):
            for n in s.layers:
                name_to_let[n] = i

        trainables: Dict = {}
        if self.lwc:
            trainables["lwc"] = self._lwc_init(bp, names,
                                               block_idx=block_idx)
        # LET shift folds into the LN bias — only for biased-norm families
        # use_shift (omniq.py:100-103): shift requires a biased norm to fold
        # into (reference raises on no-bias models; llama RMSNorm has none)
        self.let_shift = (self.let and self.use_shift_cfg
                          and arch.family != "llama")
        if self.let:
            trainables["let"] = [
                self._let_init(block_idx, bp, s, input_feat)
                for s in let_subsets
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
            y = quant_forward(params, x)
            if isinstance(target, tuple):  # aug_loss (omniq.py:214-215)
                return mse_loss(y, target[0]) + mse_loss(y, target[1])
            return mse_loss(y, target)

        lr = self.lwc_lr if self.lwc else self.let_lr
        train_targets = (list(zip(targets, targets2)) if targets2 is not None
                         else targets)
        trained, loss = train_block(
            loss_fn, trainables, self.input_batches, train_targets, lr,
            self.epochs, weight_decay=self.wd,
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
