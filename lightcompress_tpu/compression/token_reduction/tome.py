"""ToMe — token merging via bipartite soft matching (llmc tome.py:57-137).

At each configured block, tokens are split into alternating A/B sets; each A
token is matched to its most similar B token; the ``r`` highest-similarity
pairs are merged (mean) into the B token.  Static shapes: exactly r tokens
are removed per hooked block (r fixed by config).  The cls token never
merges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import TOKEN_REDUCTION_REGISTRY
from .base import TokenReductionModule

Array = jax.Array


def bipartite_soft_matching_merge(x: Array, r: int, protect_first: bool = True):
    """Merge r tokens; x (B, T, D) -> (B, T-r, D)."""
    B, T, D = x.shape
    metric = x / jnp.clip(
        jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True), 1e-6,
        None,
    )
    a, b = metric[:, ::2], metric[:, 1::2]
    xa, xb = x[:, ::2], x[:, 1::2]
    Ta, Tb = a.shape[1], b.shape[1]
    scores = jnp.einsum("bad,bnd->ban", a, b)  # (B, Ta, Tb)
    if protect_first:
        # token 0 of the A set is cls — never merge it
        scores = scores.at[:, 0, :].set(-jnp.inf)
    best_b = jnp.argmax(scores, axis=-1)  # (B, Ta)
    best_s = jnp.max(scores, axis=-1)
    order = jnp.argsort(-best_s, axis=-1)  # A tokens by similarity desc
    merge_idx = order[:, :r]  # A tokens to merge away
    keep_idx = order[:, r:]  # A tokens kept

    bi = jnp.arange(B)[:, None]
    # scatter-mean merged A tokens into their B matches
    dst = best_b[bi, merge_idx]  # (B, r) target B slots
    xb_new = xb
    counts = jnp.ones((B, Tb), x.dtype)
    xb_new = xb_new.at[bi, dst].add(xa[bi, merge_idx])
    counts = counts.at[bi, dst].add(1.0)
    xb_new = xb_new / counts[..., None]

    xa_keep = xa[bi, keep_idx]  # (B, Ta - r, D)
    return jnp.concatenate([xa_keep, xb_new], axis=1)


@TOKEN_REDUCTION_REGISTRY.register("ToMe")
class ToMe(TokenReductionModule):
    def add_sparse_config(self):
        self.r = self.special.get("r", 2)
        self.block_ids = self.special.get(
            "block_ids", list(range(self.model.num_blocks))
        )

    def register_reduction_modules(self):
        r = self.r

        def hook(model, idx, x):
            return bipartite_soft_matching_merge(x, r)

        for idx in self.block_ids:
            self.model.token_hooks[idx] = hook
