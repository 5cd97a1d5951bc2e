"""FastV — drop low-attention vision tokens after layer K (llmc fastv.py).

At block ``filter_layer``, rank tokens by the cls token's attention score
(computed from that block's q/k projections) and keep the top
``1 - rate`` fraction (static count).  The cls token is always kept.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models import arch as A
from ...registry import TOKEN_REDUCTION_REGISTRY
from .base import TokenReductionModule

Array = jax.Array


@TOKEN_REDUCTION_REGISTRY.register("FastV")
class FastV(TokenReductionModule):
    def add_sparse_config(self):
        self.filter_layer = self.special.get("filter_layer", 2)
        self.rate = self.special.get("rate", 0.5)

    def register_reduction_modules(self):
        rate = self.rate

        def hook(model, idx, x):
            arch = model.arch
            bp = model.blocks[idx]
            B, T, H = x.shape
            n_keep = max(1, int((T - 1) * (1.0 - rate)))
            h1 = A.apply_norm(x, bp["ln1"], arch)
            ap = bp["attn"]
            q = A.default_linear("q", ap["q"]["weight"], ap["q"].get("bias"),
                                 h1)
            k = A.default_linear("k", ap["k"]["weight"], ap["k"].get("bias"),
                                 h1)
            nh, hd = arch.num_heads, arch.head_dim
            qc = q[:, 0].reshape(B, nh, hd)  # cls query
            kk = k.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
            scores = jnp.einsum("bhd,bhtd->bht", qc.astype(jnp.float32),
                                kk.astype(jnp.float32)) * hd**-0.5
            att = jax.nn.softmax(scores, axis=-1).mean(axis=1)  # (B, T)
            tok_scores = att[:, 1:]  # exclude cls
            top = jax.lax.top_k(tok_scores, n_keep)[1]  # (B, n_keep)
            top = jnp.sort(top, axis=-1) + 1  # keep original order
            bi = jnp.arange(B)[:, None]
            kept = x[bi, top]
            return jnp.concatenate([x[:, :1], kept], axis=1)

        self.model.token_hooks[self.filter_layer] = hook


@TOKEN_REDUCTION_REGISTRY.register("RandomPrune")
class RandomPrune(TokenReductionModule):
    """Random token dropping baseline (llmc random_prune)."""

    def add_sparse_config(self):
        self.filter_layer = self.special.get("filter_layer", 0)
        self.rate = self.special.get("rate", 0.5)
        self.seed = self.special.get("seed", 0)

    def register_reduction_modules(self):
        rate, seed = self.rate, self.seed

        def hook(model, idx, x):
            B, T, H = x.shape
            n_keep = max(1, int((T - 1) * (1.0 - rate)))
            key = jax.random.PRNGKey(seed + idx)
            scores = jax.random.uniform(key, (B, T - 1))
            top = jnp.sort(jax.lax.top_k(scores, n_keep)[1], axis=-1) + 1
            bi = jnp.arange(B)[:, None]
            return jnp.concatenate([x[:, :1], x[bi, top]], axis=1)

        self.model.token_hooks[self.filter_layer] = hook
