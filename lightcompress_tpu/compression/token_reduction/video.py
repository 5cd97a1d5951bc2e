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


def fastvid_dyseg_cuts(frame_global: Array, c: int, tau: float):
    """DySeg cut detection, exact reference math (fastvid.py:262-283):
    cuts = topk(c-1) LOWEST adjacent global-feature similarities UNION
    similarities below ``tau``.  frame_global (F, H) -> (is_cut (F-1,)
    bool: cut AFTER frame i, sims (F-1,))."""
    g = _normalize(frame_global.astype(jnp.float32))
    sim = jnp.sum(g[:-1] * g[1:], axis=-1)
    n = min(max(c - 1, 0), sim.shape[0])
    is_cut = jnp.zeros(sim.shape, bool)
    if n:
        is_cut = is_cut.at[jax.lax.top_k(-sim, n)[1]].set(True)
    return is_cut | (sim < tau), sim


def fastvid_density_score(feats: Array, k: int = 4) -> Array:
    """Parallel density-peak score, exact reference math
    (fastvid.py:357-389): per frame, dist = cdist/sqrt(H); density =
    exp(-mean_k(d^2)) over the k nearest (incl. self); parent distance =
    min distance to any higher-density token (dist_max fallback);
    score = parent_dist * density.  feats (F, N, H) -> (F, N)."""
    Fb, N, H = feats.shape
    f = feats.astype(jnp.float32)
    d2 = jnp.sum((f[:, :, None] - f[:, None, :]) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.clip(d2, 0, None)) / (H ** 0.5)
    near = -jax.lax.top_k(-dist, min(k, N))[0]            # (F, N, k)
    density = jnp.exp(-jnp.mean(near ** 2, axis=-1))
    higher = density[:, None, :] > density[:, :, None]
    dist_max = dist.reshape(Fb, -1).max(axis=-1)[:, None, None]
    dist0 = jnp.min(jnp.where(higher, dist, dist_max), axis=-1)
    return dist0 * density


def fastvid_dtm_merge(filtered: Array, context_idx: Array,
                      alpha: float) -> Array:
    """Density-guided token merging, exact reference math
    (fastvid.py:400-431): every filtered token assigns to its
    most-cosine-similar context token; each context token becomes
    w*itself + (1-w)*mean(assigned), w = clamp(1/(n_assigned+1), alpha).
    filtered (F, M, H), context_idx (F, C) -> merged (F, C, H)."""
    Fb, M, H = filtered.shape
    C = context_idx.shape[1]
    tb = _normalize(filtered.astype(jnp.float32))
    bi = jnp.arange(Fb)[:, None]
    ctx = filtered.astype(jnp.float32)[bi, context_idx]   # (F, C, H)
    tgt = tb[bi, context_idx]
    sim = jnp.einsum("fmh,fch->fmc", tb, tgt)
    assign = jnp.argmax(sim, axis=-1)                     # (F, M)
    one_hot = jax.nn.one_hot(assign, C, dtype=jnp.float32)
    counts = one_hot.sum(axis=1)                          # (F, C)
    w = jnp.clip(1.0 / (counts + 1.0), alpha, None)[..., None]
    agg = jnp.einsum("fmc,fmh->fch", one_hot,
                     filtered.astype(jnp.float32)) / \
        jnp.clip(counts, 1.0, None)[..., None]
    return w * ctx + (1.0 - w) * agg


def _frames(model, feats: Array):
    F = max(1, int(getattr(model, "num_frames", 1)))
    if feats.shape[0] == F and F > 1:
        return feats, F  # (F, Tp, H)
    return feats, 1


def dycoke_ttm(frames: Array, merging_ratio: float) -> Array:
    """Exact ``dycole_ttm`` (dycoke.py:20-104) on (F, Tp, H) frames.

    Pass 1 over pairs (2j, 2j+1): the even frame is kept whole, the odd
    frame keeps the ``(1 - merging_ratio) * Tp`` tokens LEAST similar to
    the even frame (ascending-similarity order, matching
    ``topk(largest=False)``'s gather order).  Pass 2 over strides of 4
    (i = 0, 4, ... while i < F - 4): frame i+2 is re-pruned against frame
    i the same way.  A trailing unpaired frame is dropped, as in the
    reference's pair loop."""
    F, Tp, _ = frames.shape
    n_keep = max(1, int((1.0 - merging_ratio) * Tp))
    f = _normalize(frames.astype(jnp.float32))

    def least_similar(a: int, b: int) -> Array:
        sim = jnp.einsum("td,td->t", f[a], f[b])
        # ascending similarity order == torch.topk(largest=False) order
        return frames[b][jax.lax.top_k(-sim, n_keep)[1]]

    out = []
    for i in range(0, F - 1, 2):
        out.append(frames[i])
        out.append(least_similar(i, i + 1))
    for i in range(0, F - 4, 4):
        # list slot i+2 holds frame i+2 (slot 2j <-> frame 2j)
        out[i + 2] = least_similar(i, i + 2)
    return jnp.concatenate(out, axis=0)


@TOKEN_REDUCTION_REGISTRY.register("DyCoke")
class DyCoke(TokenReductionModule):
    """Temporal token merging — exact reference selection (dycoke.py:20-104
    ``dycole_ttm``; parity-tested against a NumPy port in
    tests/test_video_parity.py)."""

    def add_sparse_config(self):
        self.merging_ratio = self.special.get("merging_ratio", 0.7)

    def register_reduction_modules(self):
        ratio = self.merging_ratio

        def hook(model, feats):
            frames, F = _frames(model, feats)
            if F <= 1:
                return feats
            return dycoke_ttm(frames, ratio)[None]  # (1, T', H)

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
        self.tau = self.special.get("DySeg_tau", 0.85)
        self.alpha = self.special.get("DTM_alpha", 0.3)
        self.salient_frac = self.special.get("salient_frac", 0.25)
        self.context_frac = self.special.get("context_frac", 0.25)
        self.residual_frac = self.special.get("residual_frac", 0.1)

    def register_reduction_modules(self):
        cfg = self

        def hook(model, feats):
            frames, F = _frames(model, feats)
            if F <= 1:
                return feats
            Tp = frames.shape[1]
            n_sal = max(1, int(Tp * cfg.salient_frac))
            n_ctx = max(1, int(Tp * cfg.context_frac))
            n_res = max(1, int(Tp * cfg.residual_frac))
            # DySeg: topk + tau-threshold cuts on frame GLOBAL features
            # (mean token = the SigLip pooled stand-in)
            is_cut, _ = fastvid_dyseg_cuts(
                frames.mean(axis=1), cfg.n_segments, cfg.tau)
            is_anchor = jnp.concatenate(
                [jnp.ones((1,), bool), is_cut])            # (F,)
            f = _normalize(frames.astype(jnp.float32))
            # ATS saliency: vision-tower cls/pool attention when the model
            # provides it, else distance-from-frame-mean stand-in
            attnw = getattr(model, "frame_attn_weights", None)
            if attnw is not None:
                saliency = jnp.asarray(attnw, jnp.float32)
            else:
                centered = f - f.mean(axis=1, keepdims=True)
                saliency = jnp.linalg.norm(centered, axis=-1)  # (F, Tp)
            sal_idx = jax.lax.top_k(saliency, n_sal)[1]        # (F, n_sal)
            is_sal = jnp.zeros((F, Tp), bool)
            is_sal = is_sal.at[jnp.arange(F)[:, None], sal_idx].set(True)
            # context: density-peak score (exact fastvid math) over
            # non-salient tokens, then DTM merge into the context tokens
            density = fastvid_density_score(frames)
            ctx_idx = jax.lax.top_k(
                jnp.where(is_sal, -jnp.inf, density), n_ctx)[1]  # (F, n_ctx)
            merged_ctx = fastvid_dtm_merge(frames, ctx_idx, cfg.alpha
                                           ).astype(frames.dtype)
            out = []
            for i in range(F):
                sal = frames[i][jnp.sort(sal_idx[i])]
                anchor_tokens = jnp.concatenate([sal, merged_ctx[i]], 0)
                if i == 0:
                    out.append(anchor_tokens)
                    continue
                res_sim = jnp.einsum("td,td->t", f[i - 1], f[i])
                res_idx = jnp.sort(jax.lax.top_k(-res_sim, n_res)[1])
                res = frames[i][res_idx]
                n_anchor_tok = anchor_tokens.shape[0]
                pad = jnp.zeros((max(0, n_anchor_tok - n_res),
                                 frames.shape[-1]), frames.dtype)
                res_padded = jnp.concatenate([res, pad], axis=0)
                keep = jnp.where(is_anchor[i], anchor_tokens[: n_anchor_tok],
                                 res_padded[: n_anchor_tok])
                out.append(keep)
            return jnp.concatenate(out, axis=0)[None]

        self.model.feature_hooks.append(hook)


def holitom_merge(x: Array, vis_start: Array, n_vis: int,
                  keep_off: Array) -> Array:
    """HoliTom inner-LLM merge, exact reference semantics
    (holitom.py:1374-1421): every NON-kept vision token folds into its
    most-cosine-similar kept token as a SEQUENTIAL running average
    (h[tgt] = (h[tgt] + h[i]) / 2, applied in ascending non-kept index
    order — later merges see earlier results).  Similarities are computed
    from the ORIGINAL hidden states.  Returns x with the kept vision
    positions updated in place; the caller gathers the kept set."""
    B, T, H = x.shape
    n_keep = keep_off.shape[1]
    n_non = n_vis - n_keep
    bi = jnp.arange(B)[:, None]
    vis = x[bi, vis_start[:, None] + jnp.arange(n_vis)[None]]  # (B,n_vis,H)
    is_kept = jnp.zeros((B, n_vis), bool).at[bi, keep_off].set(True)
    # ascending non-kept offsets, static count (sentinel-sort)
    off = jnp.arange(n_vis)[None, :]
    non_off = jnp.sort(jnp.where(is_kept, n_vis, off), -1)[:, :n_non]
    non = vis[bi, non_off].astype(jnp.float32)                 # (B,n_non,H)
    topk = vis[bi, keep_off].astype(jnp.float32)               # (B,n_keep,H)
    nn_ = non / jnp.clip(jnp.linalg.norm(non, axis=-1, keepdims=True),
                         1e-6, None)
    tk = topk / jnp.clip(jnp.linalg.norm(topk, axis=-1, keepdims=True),
                         1e-6, None)
    tgt = jnp.argmax(jnp.einsum("bnh,bkh->bnk", nn_, tk), -1)  # (B, n_non)
    rows = jnp.arange(B)

    def body(i, tk_states):
        t = tgt[:, i]
        cur = tk_states[rows, t]
        return tk_states.at[rows, t].set((cur + non[:, i]) / 2.0)

    merged = jax.lax.fori_loop(0, n_non, body, topk)
    return x.at[bi, vis_start[:, None] + keep_off].set(
        merged.astype(x.dtype))


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
                n_keep = max(1, round(n_vis * (1.0 - r)))
                scores = text_to_vision_scores(mdl.language, idx, x,
                                               vis_start, n_vis,
                                               query="last")
                keep_off = jax.lax.top_k(scores, n_keep)[1]  # topk order
                x2 = holitom_merge(x, vis_start, n_vis, keep_off)
                x3 = prune_vision_span(x2, vis_start, n_vis,
                                       jnp.sort(keep_off, -1))
                return x3, vis_start, n_keep

            self.model.lang_token_hooks[self.holitom_k] = lang_hook
