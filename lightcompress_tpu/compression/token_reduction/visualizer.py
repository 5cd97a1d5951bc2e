"""Visualizer — a token-reduction module that draws instead of pruning.

Reference: llmc/compression/token_reduction/visualizer.py (registered as
'Visualizer' in TOKEN_REDUCTION_REGISTRY): it captures the attention map of
one vision block, the input image, and any keep-indices a co-running
reduction recorded, then writes per-head maps / token-attention overlays /
kept-patch overlays via llmc/utils/visualizer.py.

TPU-native form: hooks are pure functions on the vision tower's
``token_hooks`` chain; attention is recomputed from the block's q/k params
(there are no output_attentions flags in a functional forward).  Results
land as PNGs under ``save_dir``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ...models import arch as A
from ...registry import TOKEN_REDUCTION_REGISTRY
from .base import TokenReductionModule


@TOKEN_REDUCTION_REGISTRY.register("Visualizer")
class Visualizer(TokenReductionModule):
    def add_sparse_config(self):
        self.vis_layer = self.special.get("vis_layer", 5)
        self.save_dir = self.special.get("save_dir", "./vis_out")
        self.token_idx = self.special.get("token_idx", 300)
        self.n_heads_shown = self.special.get("n_heads", 6)
        self.grid_size = self.special.get("grid_size", 24)
        self.collected = {}

    def register_reduction_modules(self):
        vis = self

        def hook(model, idx, x):
            arch = model.arch
            bp = model.blocks[idx]
            B, T, H = x.shape
            h1 = A.apply_norm(x, bp["ln1"], arch)
            ap = bp["attn"]
            q = A.default_linear("q", ap["q"]["weight"], ap["q"].get("bias"),
                                 h1)
            k = A.default_linear("k", ap["k"]["weight"], ap["k"].get("bias"),
                                 h1)
            nh, hd = arch.num_heads, arch.head_dim
            qq = q.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
            kk = k.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", qq.astype(jnp.float32),
                kk.astype(jnp.float32)) * hd**-0.5
            attn = jax.nn.softmax(scores, axis=-1)
            vis.collected["attn"] = np.asarray(attn)
            if getattr(model, "last_images", None) is not None:
                vis.collected["image"] = np.asarray(model.last_images[0])
            return x  # pass-through: visualization never changes tokens

        self.model.token_hooks[self.vis_layer] = hook

    def save(self, image=None, keep_idx=None):
        """Write the figures; called after a calibration/eval forward."""
        from ...utils.visualizer import (visualize_grid_to_grid,
                                         visualize_heads,
                                         visualize_kept_patches)

        os.makedirs(self.save_dir, exist_ok=True)
        out = []
        attn = self.collected.get("attn")
        img = image if image is not None else self.collected.get("image")
        if attn is not None:
            out.append(visualize_heads(
                attn[:, : self.n_heads_shown],
                save_path=os.path.join(self.save_dir, "heads.png")))
            if img is not None:
                tok = min(self.token_idx, attn.shape[-1] - 1)
                out.append(visualize_grid_to_grid(
                    attn[0].mean(0), tok, img, grid_size=self.grid_size,
                    save_path=os.path.join(self.save_dir, "grid.png")))
        if img is not None and keep_idx is not None:
            out.append(visualize_kept_patches(
                img, keep_idx, grid_size=self.grid_size,
                save_path=os.path.join(self.save_dir, "kept.png")))
        return out
