"""VisionZip, FasterVLM, DivPrune, MustDrop — VLM vision-token reduction
(reference llmc/compression/token_reduction/{visionzip,fastervlm,divprune,
mustdrop}.py).

All re-designed for static shapes under jit: every stage keeps a FIXED
token count chosen from config at trace time; "filtering" is expressed as
masked one-hot assignment / argsort-permutation instead of boolean
``masked_select``.

These algorithms act on the VLM's *projected image features* via
``Llava.feature_hooks`` (the reference's projector / multimodal-prep hook
stage), with an optional probe on the vision tower stashing cls-attention
and key metrics (the reference's ``store_attention_hook`` /
``visionzip_hook`` on the CLIP encoder, visionzip.py:286-419,
fastervlm.py:33-87).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models import arch as A
from ...registry import TOKEN_REDUCTION_REGISTRY
from .base import TokenReductionModule

Array = jax.Array


def _normalize(x: Array, eps: float = 1e-6) -> Array:
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), eps, None)


def _cls_attn_and_keys(vit, idx: int, x: Array):
    """cls->patch attention (summed over heads) and per-patch keys of vision
    block ``idx`` given its input ``x`` (the reference reads these out of
    ``output_attentions=True`` forwards, visionzip.py:306-313)."""
    arch = vit.arch
    bp = vit.blocks[idx]
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
    att = jax.nn.softmax(scores, axis=-1).sum(axis=1)  # (B, T)
    return att[:, 1:], k[:, 1:]  # patches only


def _install_probe(model, layer: int, stash_key: str):
    """Vision-tower token hook at ``layer`` that records (cls_attn, keys)
    for the feature-stage hook running later in the same trace."""
    if not hasattr(model, "_tr_stash"):
        model._tr_stash = {}
    prior = model.vision.token_hooks.get(layer)

    def probe(vit, idx, x):
        if prior is not None:
            x = prior(vit, idx, x)
        model._tr_stash[stash_key] = _cls_attn_and_keys(vit, idx, x)
        return x

    model.vision.token_hooks[layer] = probe


def _gather(x: Array, idx: Array) -> Array:
    """x (B,T,H), idx (B,K) -> (B,K,H)."""
    return x[jnp.arange(x.shape[0])[:, None], idx]


@TOKEN_REDUCTION_REGISTRY.register("VisionZip")
class VisionZip(TokenReductionModule):
    """Dominant + contextual token compression (visionzip.py:283-419):
    keep the ``dominant`` patches most attended by cls, then merge the rest
    into ``contextual`` tokens by nearest-key one-hot assignment to
    stride-selected centers."""

    def add_sparse_config(self):
        self.dominant = self.special.get("dominant", 16)
        self.contextual = self.special.get("contextual", 4)
        self.prune_only = self.special.get("prune_only", False)
        self.merge_only = self.special.get("merge_only", False)
        assert not (self.prune_only and self.merge_only)
        self.select_layer = self.special.get(
            "select_layer", self.model.vision.arch.num_layers - 1
        )

    def register_reduction_modules(self):
        model = self.model
        D, C = self.dominant, self.contextual
        _install_probe(model, self.select_layer, "visionzip")

        def hook(mdl, feats):  # feats (B, Tv, H)
            att, keys = mdl._tr_stash["visionzip"]
            B, Tv, H = feats.shape
            att = att[:, :Tv]
            dom_idx = jnp.sort(jax.lax.top_k(att, D)[1], axis=-1)  # (B, D)
            dominant = _gather(feats, dom_idx)
            if self.prune_only:
                return dominant
            # kept-first permutation: non-dominant tokens in original order
            is_dom = jnp.zeros((B, Tv), bool)
            is_dom = is_dom.at[jnp.arange(B)[:, None], dom_idx].set(True)
            order = jnp.argsort(jnp.arange(Tv)[None, :]
                                + is_dom.astype(jnp.int32) * Tv, axis=-1)
            rest_idx = order[:, : Tv - D]  # (B, Tv-D) original indices
            metric = _normalize(keys[:, :Tv].astype(jnp.float32))
            rest_metric = _gather(metric, rest_idx)
            rest_feats = _gather(feats, rest_idx)
            # stride-selected contextual centers (visionzip.py:363-367)
            step = max(1, (Tv - D) // C)
            tgt = jnp.arange(0, Tv - D, step)[:C]
            centers = rest_metric[:, tgt]  # (B, C, kd)
            sim = jnp.einsum("btd,bcd->btc", rest_metric, centers)
            assign = jax.nn.one_hot(jnp.argmax(sim, axis=-1), C,
                                    dtype=jnp.float32)
            # targets must not merge into themselves twice
            assign = assign.at[:, tgt, :].set(0.0)
            counts = assign.sum(axis=1) + 1.0  # (B, C) incl. the center
            merged = (jnp.einsum("btc,bth->bch",
                                 assign, rest_feats.astype(jnp.float32))
                      + rest_feats[:, tgt].astype(jnp.float32))
            contextual = (merged / counts[..., None]).astype(feats.dtype)
            if self.merge_only:
                return contextual
            return jnp.concatenate([dominant, contextual], axis=1)

        model.feature_hooks.append(hook)


@TOKEN_REDUCTION_REGISTRY.register("FasterVLM")
class FasterVLM(TokenReductionModule):
    """[CLS]-attention re-ranking before the projector (fastervlm.py:57-87):
    keep the round(N * (1-rate)) patches with the highest cls attention."""

    def add_sparse_config(self):
        self.rate = self.special.get("rate", 0.5)
        pc = getattr(self.model, "pruning_config", {})
        self.select_layer = self.special.get(
            "select_layer",
            pc.get("select_layer", self.model.vision.arch.num_layers - 1),
        )

    def register_reduction_modules(self):
        model = self.model
        rate = self.rate
        _install_probe(model, self.select_layer, "fastervlm")

        def hook(mdl, feats):
            att, _ = mdl._tr_stash["fastervlm"]
            B, Tv, H = feats.shape
            n_keep = max(1, round(Tv * (1.0 - rate)))
            idx = jnp.sort(jax.lax.top_k(att[:, :Tv], n_keep)[1], axis=-1)
            return _gather(feats, idx)

        model.feature_hooks.append(hook)


@TOKEN_REDUCTION_REGISTRY.register("DivPrune")
class DivPrune(TokenReductionModule):
    """Diversity-maximal token subset by farthest-point selection on cosine
    distance (divprune.py:20-54), applied to projected image features."""

    def add_sparse_config(self):
        self.rate = self.special.get("reduction_ratio",
                                     self.special.get("rate", 0.5))

    def register_reduction_modules(self):
        model = self.model
        rate = self.rate

        def hook(mdl, feats):
            B, Tv, H = feats.shape
            n_keep = max(1, round(Tv * (1.0 - rate)))
            f = _normalize(feats.astype(jnp.float32))
            dist = 1.0 - jnp.einsum("bid,bjd->bij", f, f)  # (B,Tv,Tv)
            # first pick: max of second-smallest pairwise distance
            # (divprune.py:44-47)
            second_smallest = -jax.lax.top_k(-dist, 2)[0][..., 1]
            first = jnp.argmax(second_smallest, axis=-1)  # (B,)
            bi = jnp.arange(B)

            def fps(carry, _):
                chosen_mask, min_dist = carry
                nxt = jnp.argmax(jnp.where(chosen_mask, -jnp.inf, min_dist),
                                 axis=-1)
                chosen_mask = chosen_mask.at[bi, nxt].set(True)
                min_dist = jnp.minimum(min_dist, dist[bi, nxt])
                return (chosen_mask, min_dist), nxt

            chosen = jnp.zeros((B, Tv), bool).at[bi, first].set(True)
            (chosen, _), picks = jax.lax.scan(
                fps, (chosen, dist[bi, first]), None, length=n_keep - 1
            )
            idx = jnp.concatenate([first[None], picks], axis=0).T  # (B,n_keep)
            return _gather(feats, jnp.sort(idx, axis=-1))

        model.feature_hooks.append(hook)


@TOKEN_REDUCTION_REGISTRY.register("MustDrop")
class MustDrop(TokenReductionModule):
    """Multi-stage vision-token dropping (mustdrop.py:17-235): (1) spatial
    2x2 similarity-weighted window merging in the vision tower ("conditional
    pooling", mustdrop.py:29-194 — here every window merges, weighted by
    within-window agreement, to stay static-shape), (2) cls-attention drop
    of the least important merged tokens at the projector stage."""

    def add_sparse_config(self):
        self.merge_layer = self.special.get("merge_layer", 1)
        self.rate = self.special.get("rate", 0.3)
        self.tau = self.special.get("tau", 0.1)

    def register_reduction_modules(self):
        model = self.model
        tau = self.tau
        vit = model.vision
        n_layers = vit.arch.num_layers

        def spatial_merge(v, idx, x):  # x (B, 1+Tp, H)
            cls, patches = x[:, :1], x[:, 1:]
            B, Tp, H = patches.shape
            g = int(Tp**0.5)
            if g * g != Tp or g % 2:
                return x  # non-square grids: skip spatial stage
            w = patches.reshape(B, g // 2, 2, g // 2, 2, H)
            w = w.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, 4, H)
            f = _normalize(w.astype(jnp.float32))
            mean = f.mean(axis=2, keepdims=True)
            sim = jnp.einsum("bwkd,bwjd->bwk", f, mean)  # (B, W, 4)
            wgt = jax.nn.softmax(sim / tau, axis=-1)[..., None]
            merged = (w.astype(jnp.float32) * wgt).sum(axis=2)
            return jnp.concatenate([cls, merged.astype(x.dtype)], axis=1)

        vit.token_hooks[self.merge_layer] = spatial_merge
        _install_probe(model, n_layers - 1, "mustdrop")  # composes w/ merge

        rate = self.rate

        def drop_hook(mdl, feats):
            att, _ = mdl._tr_stash["mustdrop"]
            B, Tv, H = feats.shape
            n_keep = max(1, round(Tv * (1.0 - rate)))
            idx = jnp.sort(jax.lax.top_k(att[:, :Tv], n_keep)[1], axis=-1)
            return _gather(feats, idx)

        model.feature_hooks.append(drop_hook)
