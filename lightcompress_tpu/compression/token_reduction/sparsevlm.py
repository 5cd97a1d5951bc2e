"""SparseVLM — text-guided progressive vision-token sparsification inside
the language model (reference llmc/compression/token_reduction/sparsevlm.py,
728 LoC).

Mechanism (sparsevlm.py:208-305): at each ``pruning_loc`` decoder layer,
the attention logits of text "rater" tokens onto vision tokens rank the
vision tokens; a scheduled number is retained, and a cluster of the pruned
tokens is merged ("recycled") back into one token.

TPU-native re-design: runs as ``Llava.lang_token_hooks`` — pure functions
``(model, idx, x, vis_start, n_vis) -> (x', vis_start, n_vis')`` with
STATIC keep counts from a per-stage schedule (the reference's
``sparse_token_list_*`` tables), per-row gather instead of boolean
masking.  Rater selection (relation of text to vision) uses masked mean
attention over post-image text positions rather than data-dependent rater
top-k, keeping shapes static.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ...models import arch as A
from ...registry import TOKEN_REDUCTION_REGISTRY
from .base import TokenReductionModule

Array = jax.Array


def text_to_vision_scores(lang, idx: int, x: Array, vis_start: Array,
                          n_vis: int, query: str = "mean") -> Array:
    """Attention from text tokens to each vision token at decoder block
    ``idx``, mean over heads.  ``query="mean"`` averages over the
    post-image text queries (sparsevlm.py relation_vis_text);
    ``query="last"`` uses only the LAST sequence position's attention row
    (the FastV/HoliTom criterion — holitom.py qwen_forward
    last_layer_attention_avg[-1]).

    Returns (B, n_vis) float32 scores.
    """
    arch = lang.arch
    bp = lang.params["blocks"][idx]
    B, T, H = x.shape
    h1 = A.apply_norm(x, bp["ln1"], arch)
    ap = bp["attn"]
    q = A.default_linear("attn.q", ap["q"]["weight"], ap["q"].get("bias"), h1)
    k = A.default_linear("attn.k", ap["k"]["weight"], ap["k"].get("bias"), h1)
    nh, nkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
    q = q.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, nkv, hd).transpose(0, 2, 1, 3)
    if arch.qk_norm:
        q = A.rmsnorm(q, ap["q_norm"]["weight"], arch.rms_eps)
        k = A.rmsnorm(k, ap["k_norm"]["weight"], arch.rms_eps)
    cos, sin = lang.rope_tables(T)
    if cos is not None:
        q, k = A.apply_rope(q, k, cos, sin)
    if nh != nkv:
        k = jnp.repeat(k, nh // nkv, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * hd**-0.5
    jj = jnp.arange(T)
    causal = jj[None, :] <= jj[:, None]
    logits = jnp.where(causal[None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)  # (B, nh, T, T)
    s = vis_start[:, None]
    if query == "last":
        # last position's attention row, mean over heads
        key_scores = jnp.mean(probs[:, :, -1, :], axis=1)  # (B, T)
    else:
        is_text_after = (jj[None, :] >= s + n_vis).astype(
            jnp.float32)  # (B, T)
        denom = jnp.clip(is_text_after.sum(-1), 1.0, None)
        # mean over heads and post-image text queries -> per-key score
        key_scores = jnp.einsum("bhqk,bq->bk", probs, is_text_after) / (
            nh * denom[:, None]
        )  # (B, T)
    # gather the vision columns [s, s+n_vis)
    bi = jnp.arange(B)[:, None]
    vis_cols = s + jnp.arange(n_vis)[None, :]
    return key_scores[bi, vis_cols]


def prune_vision_span(x: Array, vis_start: Array, n_vis: int,
                      keep_off: Array, merged: Array = None):
    """Rebuild the sequence keeping ``keep_off`` (B, n_keep sorted offsets)
    of the vision span; optionally substitute the last kept slot's
    neighbour with a merged recycle token appended at span end."""
    B, T, H = x.shape
    n_keep = keep_off.shape[1]
    extra = 1 if merged is not None else 0
    new_T = T - n_vis + n_keep + extra
    j = jnp.arange(new_T)[None, :]
    s = vis_start[:, None]
    bi = jnp.arange(B)[:, None]
    before = j < s
    in_vis = (j >= s) & (j < s + n_keep)
    off = jnp.clip(j - s, 0, n_keep - 1)
    kept_idx = s + keep_off[bi, off]
    idx = jnp.where(before, j,
                    jnp.where(in_vis, kept_idx, j + n_vis - n_keep - extra))
    idx = jnp.clip(idx, 0, T - 1)
    out = x[bi, idx]
    if merged is not None:
        # merged token sits right after the kept vision tokens (per row)
        is_merge_slot = j == (s + n_keep)
        out = jnp.where(is_merge_slot[..., None], merged[:, None, :], out)
    return out


@TOKEN_REDUCTION_REGISTRY.register("SparseVLM")
class SparseVLM(TokenReductionModule):
    def add_sparse_config(self):
        self.pruning_loc: List[int] = self.special.get("pruning_loc",
                                                       [2, 6, 15])
        # fraction of ORIGINAL vision tokens retained after each stage
        # (the reference's sparse_token_list tables, sparsevlm.py:17-27)
        self.keep_schedule: List[float] = self.special.get(
            "keep_schedule", [0.5, 0.25, 0.125]
        )
        self.merge = self.special.get("merge", True)

    def register_reduction_modules(self):
        model = self.model
        merge = self.merge

        for stage, layer in enumerate(self.pruning_loc):
            frac = self.keep_schedule[min(stage, len(self.keep_schedule) - 1)]

            def hook(mdl, idx, x, vis_start, n_vis, _frac=frac):
                if n_vis <= 1:
                    return x, vis_start, n_vis
                n0 = mdl.pruning_config["image_token_length"]
                n_keep = max(1, min(n_vis - 1, round(n0 * _frac)))
                scores = text_to_vision_scores(mdl.language, idx, x,
                                               vis_start, n_vis)
                keep_off = jnp.sort(
                    jax.lax.top_k(scores, n_keep)[1], axis=-1
                )
                merged = None
                extra = 0
                if merge:
                    # recycle: score-weighted mean of the pruned tokens
                    B = x.shape[0]
                    bi = jnp.arange(B)[:, None]
                    vis = x[bi, vis_start[:, None] + jnp.arange(n_vis)[None]]
                    is_kept = jnp.zeros((B, n_vis), bool)
                    is_kept = is_kept.at[bi, keep_off].set(True)
                    w = jnp.where(is_kept, 0.0, scores)
                    w = w / jnp.clip(w.sum(-1, keepdims=True), 1e-9, None)
                    merged = jnp.einsum(
                        "bt,bth->bh", w, vis.astype(jnp.float32)
                    ).astype(x.dtype)
                    extra = 1
                x2 = prune_vision_span(x, vis_start, n_vis, keep_off, merged)
                return x2, vis_start, n_keep + extra

            model.lang_token_hooks[layer] = hook
