"""PyramidDrop, VisPruner, DART — further vision-token reduction algorithms
(llmc token_reduction/{pyramiddrop,vispruner,dart}.py).

All static-shape: each stage keeps a FIXED token count via top-k/gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models import arch as A
from ...registry import TOKEN_REDUCTION_REGISTRY
from .base import TokenReductionModule
from .fastv import FastV

Array = jax.Array


def _cls_attention_scores(model, idx: int, x: Array) -> Array:
    """Mean-over-heads cls->patch attention from block idx's q/k."""
    arch = model.arch
    bp = model.blocks[idx]
    B, T, H = x.shape
    h1 = A.apply_norm(x, bp["ln1"], arch)
    ap = bp["attn"]
    q = A.default_linear("q", ap["q"]["weight"], ap["q"].get("bias"), h1)
    k = A.default_linear("k", ap["k"]["weight"], ap["k"].get("bias"), h1)
    nh, hd = arch.num_heads, arch.head_dim
    qc = q[:, 0].reshape(B, nh, hd)
    kk = k.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhd,bhtd->bht", qc.astype(jnp.float32),
                        kk.astype(jnp.float32)) * hd**-0.5
    return jax.nn.softmax(scores, axis=-1).mean(axis=1)  # (B, T)


@TOKEN_REDUCTION_REGISTRY.register("PyramidDrop")
class PyramidDrop(TokenReductionModule):
    """Progressive multi-stage dropping: at each listed layer keep
    ``ratio`` of the current vision tokens (pyramiddrop.py semantics)."""

    def add_sparse_config(self):
        self.layers = self.special.get("layers", [1])
        self.ratio = self.special.get("ratio", 0.5)

    def register_reduction_modules(self):
        ratio = self.ratio

        def hook(model, idx, x):
            B, T, H = x.shape
            n_keep = max(1, int((T - 1) * ratio))
            att = _cls_attention_scores(model, idx, x)[:, 1:]
            top = jnp.sort(jax.lax.top_k(att, n_keep)[1], axis=-1) + 1
            bi = jnp.arange(B)[:, None]
            return jnp.concatenate([x[:, :1], x[bi, top]], axis=1)

        for idx in self.layers:
            self.model.token_hooks[idx] = hook


@TOKEN_REDUCTION_REGISTRY.register("VisPruner")
class VisPruner(TokenReductionModule):
    """Keep the most cls-attended tokens plus a diverse complement chosen by
    farthest-point sampling on normalized features (vispruner.py)."""

    def add_sparse_config(self):
        self.filter_layer = self.special.get("filter_layer", 0)
        self.rate = self.special.get("rate", 0.5)
        self.important_frac = self.special.get("important_frac", 0.5)

    def register_reduction_modules(self):
        rate, frac = self.rate, self.important_frac

        def hook(model, idx, x):
            B, T, H = x.shape
            n_keep = max(1, int((T - 1) * (1.0 - rate)))
            n_imp = max(1, int(n_keep * frac))
            n_div = n_keep - n_imp
            att = _cls_attention_scores(model, idx, x)[:, 1:]  # (B, T-1)
            imp = jax.lax.top_k(att, n_imp)[1]  # (B, n_imp)
            feats = x[:, 1:].astype(jnp.float32)
            feats = feats / jnp.clip(
                jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-6, None
            )

            def fps(carry, _):
                chosen_mask, min_dist = carry
                nxt = jnp.argmax(jnp.where(chosen_mask, -jnp.inf, min_dist),
                                 axis=-1)  # (B,)
                bi = jnp.arange(B)
                chosen_mask = chosen_mask.at[bi, nxt].set(True)
                sim = jnp.einsum("btd,bd->bt", feats, feats[bi, nxt])
                min_dist = jnp.minimum(min_dist, 1.0 - sim)
                return (chosen_mask, min_dist), nxt

            chosen = jnp.zeros((B, T - 1), bool)
            bi2 = jnp.arange(B)[:, None]
            chosen = chosen.at[bi2, imp].set(True)
            # distance to the nearest already-chosen (important) token
            sim_imp = jnp.einsum("btd,bkd->btk", feats,
                                 feats[bi2, imp])
            min_dist = 1.0 - jnp.max(sim_imp, axis=-1)
            if n_div > 0:
                (chosen, _), div_idx = jax.lax.scan(
                    fps, (chosen, min_dist), None, length=n_div
                )
                div_idx = div_idx.T  # (B, n_div)
                keep = jnp.concatenate([imp, div_idx], axis=1)
            else:
                keep = imp
            keep = jnp.sort(keep, axis=-1) + 1
            return jnp.concatenate([x[:, :1], x[bi2, keep]], axis=1)

        self.model.token_hooks[self.filter_layer] = hook


@TOKEN_REDUCTION_REGISTRY.register("DART")
class DART(TokenReductionModule):
    """Duplication-aware reduction: drop tokens most similar to a small set
    of retained pivot tokens (dart.py)."""

    def add_sparse_config(self):
        self.filter_layer = self.special.get("filter_layer", 0)
        self.rate = self.special.get("rate", 0.5)
        self.n_pivots = self.special.get("n_pivots", 4)

    def register_reduction_modules(self):
        rate, n_piv = self.rate, self.n_pivots

        def hook(model, idx, x):
            B, T, H = x.shape
            n_keep = max(1, int((T - 1) * (1.0 - rate)))
            feats = x[:, 1:].astype(jnp.float32)
            feats = feats / jnp.clip(
                jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-6, None
            )
            # pivots: evenly strided tokens
            stride = max(1, (T - 1) // n_piv)
            piv = feats[:, ::stride][:, :n_piv]
            dup = jnp.max(jnp.einsum("btd,bkd->btk", feats, piv), axis=-1)
            # keep the LEAST duplicated tokens
            keep = jax.lax.top_k(-dup, n_keep)[1]
            keep = jnp.sort(keep, axis=-1) + 1
            bi = jnp.arange(B)[:, None]
            return jnp.concatenate([x[:, :1], x[bi, keep]], axis=1)

        self.model.token_hooks[self.filter_layer] = hook
