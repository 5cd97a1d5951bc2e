"""Video token reduction — DyCoke, PruneVid, FastVID, HoliTom
(reference llmc/compression/token_reduction/{dycoke,prunevid,fastvid,
holitom}.py).

Video VLMs encode F frames to F x Tp vision tokens; these algorithms
exploit temporal redundancy.  All are re-designed static-shape for XLA:

- frame counts, segment counts, cluster counts and keep counts are fixed
  by config at trace time;
- "segments" of variable length are expressed as a per-frame segment-id
  vector + masked means (no Python loops over data-dependent boundaries);
- DPC-KNN clustering (prunevid.py:45-112, holitom.py:164-243) keeps its
  exact density-peak math but with a fixed cluster count.

Hooks run at the ``Llava.feature_hooks`` stage on per-frame projected
features shaped (F, Tp, H) (video batch = 1, as in the reference), and
return (1, T', H) ready for multimodal splicing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...registry import TOKEN_REDUCTION_REGISTRY
from .base import TokenReductionModule

Array = jax.Array


def _normalize(x: Array, eps: float = 1e-6) -> Array:
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), eps, None)


def adjacent_frame_similarity(frames: Array) -> Array:
    """frames (F, Tp, H) -> (F-1,) mean token-wise cosine similarity of
    consecutive frames (fastvid.py:268-271, dycoke.py:37-44)."""
    f = _normalize(frames.astype(jnp.float32))
    return jnp.einsum("ftd,ftd->f", f[:-1], f[1:]) / frames.shape[1]


def segment_ids_from_cuts(sims: Array, n_segments: int) -> Array:
    """Place the segment boundaries at the ``n_segments - 1`` LOWEST
    adjacent-frame similarities (FastVID DySeg with a static segment
    count, fastvid.py:272-285).  Returns (F,) int32 segment id per frame."""
    F = sims.shape[0] + 1
    if n_segments <= 1:
        return jnp.zeros((F,), jnp.int32)
    cuts = jax.lax.top_k(-sims, n_segments - 1)[1]  # boundaries after frame i
    is_cut = jnp.zeros((F,), jnp.int32).at[cuts + 1].set(1)
    return jnp.cumsum(is_cut)


def segment_mean(frames: Array, seg_id: Array, n_segments: int) -> Array:
    """Masked per-segment temporal mean: (F, Tp, H) -> (S, Tp, H)."""
    one_hot = jax.nn.one_hot(seg_id, n_segments, dtype=jnp.float32)  # (F, S)
    counts = jnp.clip(one_hot.sum(0), 1.0, None)  # (S,)
    merged = jnp.einsum("fs,fth->sth", one_hot, frames.astype(jnp.float32))
    return merged / counts[:, None, None]


def cluster_dpc_knn(feats: Array, n_clusters: int, k: int = 5):
    """Density-peak clustering with k-NN density (prunevid.py:45-112).

    feats (N, H) -> (assign (N,) int cluster ids, center_idx (C,)).
    """
    N = feats.shape[0]
    f = feats.astype(jnp.float32)
    dist = jnp.sum((f[:, None] - f[None, :]) ** 2, axis=-1)  # (N, N)
    knn_d = -jax.lax.top_k(-dist, min(k, N))[0]  # (N, k) smallest dists
    density = jnp.exp(-knn_d.mean(axis=-1))
    density = density + jax.random.uniform(
        jax.random.PRNGKey(0), (N,), jnp.float32, 0, 1e-6
    )  # tie-break, prunevid.py:80-84
    higher = density[None, :] > density[:, None]
    d_to_higher = jnp.where(higher, dist, jnp.inf).min(axis=-1)
    d_to_higher = jnp.where(jnp.isinf(d_to_higher), dist.max(), d_to_higher)
    score = density * d_to_higher
    center_idx = jax.lax.top_k(score, n_clusters)[1]  # (C,)
    assign = jnp.argmin(dist[:, center_idx], axis=-1)  # (N,)
    # centers always belong to their own cluster (prunevid.py:106-111)
    assign = assign.at[center_idx].set(jnp.arange(n_clusters))
    return assign, center_idx


def merge_by_cluster(feats: Array, assign: Array, n_clusters: int) -> Array:
    one_hot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)
    counts = jnp.clip(one_hot.sum(0), 1.0, None)
    return (jnp.einsum("nc,nh->ch", one_hot, feats.astype(jnp.float32))
            / counts[:, None])


def _frames(model, feats: Array):
    F = max(1, int(getattr(model, "num_frames", 1)))
    if feats.shape[0] == F and F > 1:
        return feats, F  # (F, Tp, H)
    return feats, 1


@TOKEN_REDUCTION_REGISTRY.register("DyCoke")
class DyCoke(TokenReductionModule):
    """Temporal token merging (dycoke.py:20-104 ``dycole_ttm``): keep even
    frames whole; in each odd frame keep only the tokens least similar to
    the previous frame (most-changed content).  The reference's second
    4-stride pass refreshes alternate even frames the same way."""

    def add_sparse_config(self):
        self.merging_ratio = self.special.get("merging_ratio", 0.7)

    def register_reduction_modules(self):
        keep_frac = 1.0 - self.merging_ratio

        def hook(model, feats):
            frames, F = _frames(model, feats)
            if F <= 1:
                return feats
            Tp = frames.shape[1]
            n_keep = max(1, int(keep_frac * Tp))
            f = _normalize(frames.astype(jnp.float32))
            out = []
            for i in range(F):
                if i % 2 == 0:
                    out.append(frames[i])
                else:
                    sim = jnp.einsum("td,td->t", f[i - 1], f[i])
                    idx = jnp.sort(jax.lax.top_k(-sim, n_keep)[1])
                    out.append(frames[i][idx])
            return jnp.concatenate(out, axis=0)[None]  # (1, T', H)

        self.model.feature_hooks.append(hook)


@TOKEN_REDUCTION_REGISTRY.register("PruneVid")
class PruneVid(TokenReductionModule):
    """Temporal segment merging + spatial DPC-KNN clustering
    (prunevid.py): consecutive similar frames merge into S segments
    (static-region pooling); each merged segment's tokens cluster to C
    density-peak centers."""

    def add_sparse_config(self):
        self.n_segments = self.special.get("n_segments", 4)
        self.cluster_ratio = self.special.get("cluster_ratio", 0.5)
        self.knn_k = self.special.get("k", 5)

    def register_reduction_modules(self):
        S, ratio, k = self.n_segments, self.cluster_ratio, self.knn_k

        def hook(model, feats):
            frames, F = _frames(model, feats)
            if F <= 1:
                return feats
            Tp = frames.shape[1]
            n_seg = min(S, F)
            sims = adjacent_frame_similarity(frames)
            seg_id = segment_ids_from_cuts(sims, n_seg)
            pooled = segment_mean(frames, seg_id, n_seg)  # (S, Tp, H)
            C = max(1, int(Tp * ratio))
            out = []
            for s in range(n_seg):
                assign, _ = cluster_dpc_knn(pooled[s], C, k)
                out.append(merge_by_cluster(pooled[s], assign, C))
            return jnp.concatenate(out, axis=0)[None].astype(feats.dtype)

        self.model.feature_hooks.append(hook)


@TOKEN_REDUCTION_REGISTRY.register("FastVID")
class FastVID(TokenReductionModule):
    """DySeg + STPrune (fastvid.py:225-520): partition frames into segments
    at the lowest adjacent similarities; each segment keeps its anchor
    (first) frame's salient tokens plus density-merged context, and every
    other frame keeps only its most-changed residual tokens."""

    def add_sparse_config(self):
        self.n_segments = self.special.get("DySeg_c", 4)
        self.salient_frac = self.special.get("salient_frac", 0.25)
        self.context_frac = self.special.get("context_frac", 0.25)
        self.residual_frac = self.special.get("residual_frac", 0.1)
        self.knn_k = self.special.get("k", 5)

    def register_reduction_modules(self):
        cfg = self

        def hook(model, feats):
            frames, F = _frames(model, feats)
            if F <= 1:
                return feats
            Tp = frames.shape[1]
            n_seg = min(cfg.n_segments, F)
            n_sal = max(1, int(Tp * cfg.salient_frac))
            n_ctx = max(1, int(Tp * cfg.context_frac))
            n_res = max(1, int(Tp * cfg.residual_frac))
            sims = adjacent_frame_similarity(frames)
            seg_id = segment_ids_from_cuts(sims, n_seg)
            is_anchor = jnp.concatenate(
                [jnp.ones((1,), bool), seg_id[1:] != seg_id[:-1]]
            )  # (F,)
            f = _normalize(frames.astype(jnp.float32))
            # token saliency: distance from the frame's mean token
            # (cls-attention stand-in at the feature stage)
            centered = f - f.mean(axis=1, keepdims=True)
            saliency = jnp.linalg.norm(centered, axis=-1)  # (F, Tp)
            # anchor membership is data-dependent (traced), so every frame
            # computes both roles and selects with `where`:
            #   anchor role: salient top-k + DPC-merged context
            #   residual role: top-k least similar to previous frame
            out = []
            for i in range(F):
                sal_idx = jnp.sort(jax.lax.top_k(saliency[i], n_sal)[1])
                sal = frames[i][sal_idx]
                assign, _ = cluster_dpc_knn(frames[i], n_ctx, cfg.knn_k)
                ctx = merge_by_cluster(frames[i], assign, n_ctx
                                       ).astype(frames.dtype)
                if i == 0:
                    out.append(jnp.concatenate([sal, ctx], axis=0))
                    continue
                res_sim = jnp.einsum("td,td->t", f[i - 1], f[i])
                res_idx = jnp.sort(jax.lax.top_k(-res_sim, n_res)[1])
                res = frames[i][res_idx]
                anchor_tokens = jnp.concatenate([sal, ctx], axis=0)
                n_anchor_tok = anchor_tokens.shape[0]
                pad = jnp.zeros((max(0, n_anchor_tok - n_res),
                                 frames.shape[-1]), frames.dtype)
                res_padded = jnp.concatenate([res, pad], axis=0)
                keep = jnp.where(is_anchor[i], anchor_tokens[: n_anchor_tok],
                                 res_padded[: n_anchor_tok])
                out.append(keep)
            return jnp.concatenate(out, axis=0)[None]

        self.model.feature_hooks.append(hook)


@TOKEN_REDUCTION_REGISTRY.register("HoliTom")
class HoliTom(TokenReductionModule):
    """Holistic outer temporal merge + inner-LLM pruning (holitom.py):
    (1) outer: static temporal windows merge per-position, then DPC-KNN
    merges the pooled static region while per-frame top-k keeps dynamic
    tokens (holitom.py:428-520); (2) inner: at LLM layer ``holitom_k``,
    vision tokens are pruned by text-to-vision attention with the pruned
    tokens recycled into a merged token (holitom.py inner-LLM merge)."""

    def add_sparse_config(self):
        self.n_segments = self.special.get("n_segments", 4)
        self.static_ratio = self.special.get("static_ratio", 0.3)
        self.dynamic_frac = self.special.get("dynamic_frac", 0.1)
        self.knn_k = self.special.get("k", 5)
        self.holitom_k = self.special.get("holitom_k", None)
        self.holitom_r = self.special.get("holitom_r", 0.5)

    def register_reduction_modules(self):
        cfg = self

        def hook(model, feats):
            frames, F = _frames(model, feats)
            if F <= 1:
                return feats
            Tp = frames.shape[1]
            n_seg = min(cfg.n_segments, F)
            sims = adjacent_frame_similarity(frames)
            seg_id = segment_ids_from_cuts(sims, n_seg)
            pooled = segment_mean(frames, seg_id, n_seg)  # static regions
            C = max(1, int(Tp * cfg.static_ratio))
            static_parts = []
            for s in range(n_seg):
                assign, _ = cluster_dpc_knn(pooled[s], C, cfg.knn_k)
                static_parts.append(
                    merge_by_cluster(pooled[s], assign, C)
                )
            static_tokens = jnp.concatenate(static_parts, 0)  # (S*C, H)
            # dynamic: per frame, tokens farthest from their segment mean
            n_dyn = max(1, int(Tp * cfg.dynamic_frac))
            seg_mean_per_frame = pooled[seg_id]  # (F, Tp, H)
            f = _normalize(frames.astype(jnp.float32))
            m = _normalize(seg_mean_per_frame)
            change = 1.0 - jnp.einsum("ftd,ftd->ft", f, m)  # (F, Tp)
            dyn = []
            for i in range(F):
                idx = jnp.sort(jax.lax.top_k(change[i], n_dyn)[1])
                dyn.append(frames[i][idx])
            tokens = jnp.concatenate(
                [static_tokens.astype(feats.dtype)] + dyn, axis=0
            )
            return tokens[None]

        self.model.feature_hooks.append(hook)

        if self.holitom_k is not None:
            from .sparsevlm import prune_vision_span, text_to_vision_scores

            r = self.holitom_r

            def lang_hook(mdl, idx, x, vis_start, n_vis):
                if n_vis <= 1:
                    return x, vis_start, n_vis
                n_keep = max(1, int(n_vis * (1.0 - r)))
                scores = text_to_vision_scores(mdl.language, idx, x,
                                               vis_start, n_vis)
                keep_off = jnp.sort(jax.lax.top_k(scores, n_keep)[1], -1)
                B = x.shape[0]
                bi = jnp.arange(B)[:, None]
                vis = x[bi, vis_start[:, None] + jnp.arange(n_vis)[None]]
                is_kept = jnp.zeros((B, n_vis), bool).at[bi, keep_off].set(
                    True)
                w = jnp.where(is_kept, 0.0, scores)
                w = w / jnp.clip(w.sum(-1, keepdims=True), 1e-9, None)
                merged = jnp.einsum("bt,bth->bh", w, vis.astype(jnp.float32)
                                    ).astype(x.dtype)
                x2 = prune_vision_span(x, vis_start, n_vis, keep_off, merged)
                return x2, vis_start, n_keep + 1

            self.model.lang_token_hooks[self.holitom_k] = lang_hook
