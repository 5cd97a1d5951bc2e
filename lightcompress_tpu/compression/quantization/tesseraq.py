"""TesseraQ — progressive rounding-mask optimization (llmc tesseraq.py:25-495).

Per block: static per-group qparams are frozen from the current weights;
a rounding variable R (rectified-sigmoid parameterized) is trained to
minimize block-output MSE; a threshold schedule progressively hardens the
most-decided entries (sigma(R) far from 0.5 -> +-inf) until all rounding
decisions are binary.  The final mask feeds the quantizer's ``rounding``
override at deploy (quant.py:797-799 path).  Optional per-layer output scale
factor (2*sigma(s)) and AWQ-scale preload (``load_transform``/scale_path)
are supported.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List

import jax
import jax.numpy as jnp

from ...models import arch as A
from ...models.base import resolve
from ...quant import (
    QParams,
    fake_quant_act_dynamic,
    qparams_from_range,
    reshape_tensor,
    restore_tensor,
)
from ...quant.quantizer import minmax_range
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization
from .train_utils import RectifiedSigmoid, mse_loss, train_block

Array = jax.Array

BIG = 100.0  # hardened logit (tesseraq.py:287 uses 100 * sign)


@ALGO_REGISTRY.register("GPTBRECQ")  # pre-rename alias still used by
@ALGO_REGISTRY                       # reference configs (tesseraq_w4a16.yml)
class TesseraQ(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        sp = self.special_config
        self.thresholds = sp.get(
            "thresholds", [0.75, 0.5, 0.25, 0.1, 0.05, 0.0]
        )
        self.epochs_per_round = sp.get("epochs_per_round", 1)
        self.lr = sp.get("lr", 1e-2)
        self.optimize_scale = sp.get("optimize_scale", False)
        # per-group lr for the output-scale factors (tesseraq.py:239)
        self.scale_lr = sp.get("scale_lr", None)
        self.scale_path = sp.get("scale_path", None)
        self.sigmoid = RectifiedSigmoid(-0.1, 1.1)
        self.loaded_scales = None
        if sp.get("load_transform", False) and self.scale_path:
            with open(os.path.join(self.scale_path, "scales.pkl"), "rb") as f:
                self.loaded_scales = pickle.load(f)

    # ------------------------------------------------------------------
    def _load_transform(self, block_idx, bp, input_feat):
        """Apply saved AWQ scales before rounding opt (tesseraq.py:305-327)."""
        if self.loaded_scales is None:
            return
        for subset in self.model.get_subsets_in_block(block_idx):
            key = f"block.{block_idx}.{subset.layers[0]}"
            if key in self.loaded_scales:
                scales = jnp.asarray(self.loaded_scales[key])
                self.apply_scale(bp, subset, scales)
                self.update_input_feat(input_feat, subset, scales)

    # ------------------------------------------------------------------
    def block_transform(self, block_idx, input_feat):
        model = self.model
        bp = model.blocks[block_idx]
        arch = model.arch
        names = model.get_block_linear_names(block_idx)
        self._load_transform(block_idx, bp, input_feat)

        targets = []
        for x in self.input_batches:
            y, _, _ = model.block_forward(block_idx, x)
            targets.append(y)

        # frozen static qparams + initial rounding logits (tesseraq.py:388-401)
        qps: Dict[str, QParams] = {}
        R0: Dict[str, Array] = {}
        for name in names:
            w = resolve(bp, name)["weight"].astype(jnp.float32)
            t2 = reshape_tensor(w, self.wspec)
            qp = qparams_from_range(minmax_range(t2, self.wspec), self.wspec)
            qps[name] = qp
            frac = t2 / qp.scales - jnp.floor(t2 / qp.scales)
            R0[name] = self.sigmoid.inverse(frac)

        trainables: Dict = {"R": R0}
        if self.optimize_scale:
            trainables["osf"] = {
                n: jnp.zeros_like(qps[n].scales) for n in names
            }

        w_only = self.w_only
        aspec = self.aspec.with_(ste=True) if self.aspec is not None else None
        sig = self.sigmoid

        def quant_forward(params, x):
            def lf(name, w, b, xx):
                qp = qps[name]
                wf = w.astype(jnp.float32)
                t2 = reshape_tensor(wf, self.wspec)
                soft = jnp.floor(t2 / qp.scales) + sig(params["R"][name])
                q = jnp.clip(soft + qp.zeros, self.wspec.qmin, self.wspec.qmax)
                osf = 1.0
                if self.optimize_scale:
                    osf = 2.0 * jax.nn.sigmoid(params["osf"][name])
                dq = (q - qp.zeros) * (qp.scales * osf)
                wq = restore_tensor(dq, wf.shape, self.wspec).astype(w.dtype)
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

        # progressive hardening rounds (tesseraq.py:228-287)
        for thr in self.thresholds:
            R = trainables["R"]
            hardened = {}
            for name, r in R.items():
                score = jnp.abs(sig(r) - 0.5)
                val = jnp.quantile(score.reshape(-1), thr)
                r = jnp.where(sig(r) > val + 0.5, BIG, r)
                r = jnp.where(sig(r) < 0.5 - val, -BIG, r)
                hardened[name] = r
            trainables["R"] = hardened
            if thr > 0.0:
                trainables, _ = train_block(
                    loss_fn, trainables, self.input_batches, targets,
                    self.lr, self.epochs_per_round,
                    lr_overrides=({"osf": self.scale_lr}
                                  if self.scale_lr else None),
                )

        # finalize: binary mask + static qparams for deploy
        for name in names:
            st = self.state(block_idx, name)
            mask = (sig(trainables["R"][name]) > 0.5).astype(jnp.float32)
            st["qparams"] = qps[name]
            st["rounding"] = mask
            if self.optimize_scale:
                st["output_scale_factor"] = 2.0 * jax.nn.sigmoid(
                    trainables["osf"][name]
                )

    def subset_transform(self, *a, **k):
        pass

    # ------------------------------------------------------------------
    def w_qdq(self, w, block_idx, name):
        st = self.layer_state[block_idx].get(name, {})
        if "rounding" not in st:
            return super().w_qdq(w, block_idx, name)
        qp = st["qparams"]
        wf = w.astype(jnp.float32)
        t2 = reshape_tensor(wf, self.wspec)
        q = jnp.clip(
            jnp.floor(t2 / qp.scales) + st["rounding"] + qp.zeros,
            self.wspec.qmin, self.wspec.qmax,
        )
        osf = st.get("output_scale_factor", 1.0)
        dq = (q - qp.zeros) * (qp.scales * osf)
        return restore_tensor(dq, wf.shape, self.wspec).astype(w.dtype)
