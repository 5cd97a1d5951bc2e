"""QuaRot — global orthogonal/Hadamard rotation (llmc quarot.py:17-155).

Preprocess (quarot.py:25-77): untie embeddings, remove embedding mean,
generate Q (randomized Hadamard or QR orthogonal), rotate embeddings and
head, fuse the pre-head norm into the head.

Per block (quarot.py:98-144): fuse LN weights into the following linears and
rotate their input dims by Q; rotate o/down output dims by Q^T; with
``online_rotate``, bake the exact Hadamard into v_proj outputs / down_proj
inputs and install online FWHT rotations (full-had for down_proj, per-head
partial-had for o_proj) via the model's rotate_cfg — the functional
RotateLinear (module_utils.py:553-676).

The transform is an equivalence: the float forward is unchanged (up to
numerics); quantization afterwards sees outlier-free rotated activations.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from ...models.base import Subset, resolve
from ...ops.hadamard import (
    apply_exact_had_to_linear,
    random_hadamard_matrix,
    random_orthogonal_matrix,
)
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization

Array = jax.Array


@ALGO_REGISTRY
class Quarot(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        self.rotate_mode = self.special_config.get("rotate_mode", "hadamard")
        self.fp32_had = self.special_config.get("fp32_had", False)
        seed = (config or {}).get("base", {}).get("seed", 0) if config else 0
        self.key = jax.random.PRNGKey(seed)
        self.preprocess()

    # ------------------------------------------------------------------
    def preprocess(self):
        model = self.model
        params = model.params
        arch = model.arch

        # untie embeddings (quarot.py:26-33)
        if arch.tie_word_embeddings:
            params["lm_head"] = {"weight": params["embed"]["weight"]}
            model.arch = dataclasses.replace(arch, tie_word_embeddings=False)
            arch = model.arch

        # remove per-token mean from embeddings (bbq.py:852-858)
        W = params["embed"]["weight"].astype(jnp.float32)
        params["embed"]["weight"] = (
            W - W.mean(axis=-1, keepdims=True)
        ).astype(params["embed"]["weight"].dtype)

        # orthogonal Q
        n = arch.hidden_size
        if self.rotate_mode == "hadamard":
            self.Q = random_hadamard_matrix(n, self.key)
        elif self.rotate_mode == "random":
            self.Q = random_orthogonal_matrix(n, self.key)
        else:
            raise ValueError(self.rotate_mode)
        self.Q = self.Q.astype(jnp.float32)

        # rotate embeddings: W @ Q (bbq.py:840-845)
        W = params["embed"]["weight"].astype(jnp.float32)
        params["embed"]["weight"] = (W @ self.Q).astype(
            params["embed"]["weight"].dtype
        )

        # fuse pre-head norm into head, replace with weightless norm
        self._fuse_norm_into(params["norm"], [params["lm_head"]])
        # rotate head: W @ Q (bbq.py:847-851)
        Wh = params["lm_head"]["weight"].astype(jnp.float32)
        params["lm_head"]["weight"] = (Wh @ self.Q).astype(
            params["lm_head"]["weight"].dtype
        )

        if arch.family != "llama":
            model.arch = dataclasses.replace(model.arch, norm_type="rmsnorm")

    # ------------------------------------------------------------------
    def _fuse_norm_into(self, ln: dict, fcs: List[dict]):
        """fold LN gamma (and beta) into following fcs (bbq.py:817-838)."""
        lw = ln["weight"].astype(jnp.float32)
        lb = ln.get("bias")
        for fc in fcs:
            W = fc["weight"].astype(jnp.float32)
            fc["weight"] = (W * lw[None, :]).astype(fc["weight"].dtype)
            if lb is not None:
                delta = W @ lb.astype(jnp.float32)
                if "bias" in fc and fc["bias"] is not None:
                    fc["bias"] = (
                        fc["bias"].astype(jnp.float32) + delta
                    ).astype(fc["bias"].dtype)
                else:
                    fc["bias"] = delta.astype(fc["weight"].dtype)
        ln["weight"] = jnp.ones_like(ln["weight"])
        if lb is not None:
            ln["bias"] = jnp.zeros_like(ln["bias"])

    def _bake_mean_into_fc(self, fc: dict):
        """LayerNorm mean-subtraction folded into fc (bbq.py:860-870)."""
        W = fc["weight"].astype(jnp.float32)
        fc["weight"] = (W - W.mean(axis=-2, keepdims=True)).astype(
            fc["weight"].dtype
        )
        if "bias" in fc and fc["bias"] is not None:
            b = fc["bias"].astype(jnp.float32)
            fc["bias"] = (b - b.mean()).astype(fc["bias"].dtype)

    # ------------------------------------------------------------------
    def block_transform(self, block_idx, input_feat):
        bp = self.model.blocks[block_idx]
        arch = self.model.arch
        for subset in self.model.get_subsets_in_block(block_idx):
            if subset.skip_rotate:
                continue
            layers = [resolve(bp, n) for n in subset.layers]
            if subset.prev_type == "norm":
                self._fuse_norm_into(resolve(bp, subset.prev_op), layers)
                for fc in layers:  # rotate input dim: W @ Q
                    W = fc["weight"].astype(jnp.float32)
                    fc["weight"] = (W @ self.Q).astype(fc["weight"].dtype)
            else:
                if arch.family == "opt":
                    self._bake_mean_into_fc(layers[0])
                # rotate output dim: Q^T @ W (and bias)
                for fc in layers:
                    W = fc["weight"].astype(jnp.float32)
                    fc["weight"] = (self.Q.T @ W).astype(fc["weight"].dtype)
                    if "bias" in fc and fc["bias"] is not None:
                        b = fc["bias"].astype(jnp.float32)
                        fc["bias"] = (self.Q.T @ b).astype(fc["bias"].dtype)
                if self.online_rotate:
                    name = subset.layers[0]
                    if subset.is_mlp:
                        # down_proj: bake exact had into input dim + online
                        # full-had on activations (quarot.py:135-137)
                        fc = layers[0]
                        fc["weight"] = apply_exact_had_to_linear(
                            fc["weight"], had_dim=-1, output=False
                        )
                        self.model.rotate_cfg[name] = ("full", 0)
                    else:
                        # o_proj: per-head had baked into v output + online
                        # partial-had on o input (quarot.py:139-144)
                        vp = resolve(bp, subset.prev_op)
                        vp["weight"] = apply_exact_had_to_linear(
                            vp["weight"], had_dim=arch.head_dim, output=True
                        )
                        if "bias" in vp and vp["bias"] is not None:
                            from ...ops.hadamard import fwht

                            b = vp["bias"].astype(jnp.float32)
                            br = b.reshape(-1, arch.head_dim)
                            br = fwht(br) * (arch.head_dim**-0.5)
                            vp["bias"] = br.reshape(-1).astype(vp["bias"].dtype)
                        self.model.rotate_cfg[name] = ("head", arch.head_dim)

    def subset_transform(self, *a, **k):
        pass
