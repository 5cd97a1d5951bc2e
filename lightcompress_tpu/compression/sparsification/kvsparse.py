"""Sparse KV caches for long-context inference (llmc kvsparse.py, 653 LoC).

- ``SinkKVCache`` (kvsparse.py:508+): attention-sink streaming — each query
  attends only to the first ``num_sink`` tokens plus a trailing
  ``window_size`` window.  Under jit this is an attention-mask transform
  (static shapes), returned as the hook's third output.
- ``ShadowKVCache`` (kvsparse.py:35-507): rank-r SVD approximation of the
  PRE-rope K plus per-query landmark retrieval with exact V.  The reference
  class is explicitly "only for accuracy measurement" (kvsparse.py:36-38);
  this is the same semantics in jit-friendly form:

    prefill: SVD over the flattened pre-rope K (B, T, H*D) -> U, SV
             (get_svd, kvsparse.py:177-219); chunk-mean landmarks of the
             POST-rope K; chunks whose min in-chunk cosine similarity to
             their landmark is lowest become ``outlier_chunk`` outliers
             kept EXACT (prefill_kv_cache, kvsparse.py:245-375); the last
             ``local_chunk*cs + remainder`` tokens stay exact.
    decode:  the LIVE query scores the landmarks
             (softmax(q.landmark/sqrt(D)), sum over the query window, max
             over GQA groups), top ``sparse_budget/cs`` chunks are
             retrieved (get_retrieval_position_ids, kvsparse.py:378-423);
             retrieved K is the rank-r reconstruction re-roped at its
             positions (get_key_cache, kvsparse.py:444-476), V is EXACT at
             retrieved positions (get_value_cache, kvsparse.py:425-442);
             everything else in the prompt is invisible.

  TPU-first expression: instead of gather/copy buffers (a CUDA memory
  trick), the reconstruction is blended into K once at prefill ("shadow
  K": reconstructed everywhere except outlier/local chunks — exact where
  the reference is exact, reconstructed where the reference reconstructs)
  and retrieval becomes a per-query attention-mask transform: identical
  scores/softmax support as the reference buffer scheme, static shapes,
  no data-dependent control flow.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...registry import KV_REGISTRY

Array = jax.Array

NEG = float(jnp.finfo(jnp.float32).min)


@KV_REGISTRY.register("SinkKV")
@KV_REGISTRY.register("Sink")
class SinkKVCache:
    """StreamingLLM-style sink + sliding window."""

    def __init__(self, quant_type: str = "", cfg: Optional[Dict] = None,
                 num_layers: int = 0, **kw):
        cfg = cfg or {}
        self.num_sink = cfg.get("num_sink", 4)
        self.window_size = cfg.get("window_size", 128)

    def make_hook(self, layer_idx: int):
        ns, w = self.num_sink, self.window_size

        def hook(k: Array, v: Array):
            T = k.shape[2]
            if T <= ns + w:
                return k, v, None
            j = jnp.arange(T)[None, :]
            q = jnp.arange(T)[:, None]
            keep = (j < ns) | (q - j < w)
            extra = jnp.where(keep, 0.0, NEG)[None, None, :, :]
            return k, v, extra

        return hook


# ---------------------------------------------------------------------------
# ShadowKV building blocks (shared by the calibration hook and the serving
# engine's sparse_kv mode)
# ---------------------------------------------------------------------------

def shadowkv_layout(T: int, chunk_size: int, local_chunk: int
                    ) -> Tuple[int, int]:
    """(chunks, Tc): retrievable chunk count and its token extent; the last
    T - Tc tokens (local chunks + alignment remainder) stay exact
    (prefill_kv_cache, kvsparse.py:259-276 prefill_local)."""
    chunks = T // chunk_size - local_chunk
    return chunks, chunks * chunk_size


def shadowkv_svd_recon(k_pre: Array, rank: int) -> Array:
    """Rank-r reconstruction of the PRE-rope K, SVD over the head-flattened
    (B, T, H*D) matrix exactly like get_svd (kvsparse.py:195-219) — the
    low-rank structure lives across heads, pre-rope."""
    B, H, T, D = k_pre.shape
    kf = k_pre.transpose(0, 2, 1, 3).reshape(B, T, H * D).astype(jnp.float32)
    u, s, vt = jnp.linalg.svd(kf, full_matrices=False)
    r = min(rank, s.shape[-1])
    recon = (u[..., :r] * s[..., None, :r]) @ vt[..., :r, :]
    return recon.reshape(B, T, H, D).transpose(0, 2, 1, 3)


def shadowkv_landmarks(k_roped: Array, chunks: int, chunk_size: int,
                       n_outlier: int) -> Tuple[Array, Array]:
    """Chunk-mean landmarks of the post-rope K + outlier-chunk mask.

    Outliers = the ``n_outlier`` chunks with the LOWEST min in-chunk cosine
    similarity to their own landmark (badly summarized by their mean —
    kvsparse.py:283-297); they are kept exact and excluded from retrieval.
    Returns (landmarks (B, H, C, D), outlier (B, H, C) bool)."""
    B, H, _, D = k_roped.shape
    kc = k_roped[:, :, :chunks * chunk_size].astype(jnp.float32).reshape(
        B, H, chunks, chunk_size, D)
    landmarks = kc.mean(axis=3)                            # (B, H, C, D)
    ln = landmarks / jnp.clip(
        jnp.linalg.norm(landmarks, axis=-1, keepdims=True), 1e-6, None)
    kn = kc / jnp.clip(jnp.linalg.norm(kc, axis=-1, keepdims=True), 1e-6,
                       None)
    cos_sim = jnp.einsum("bhcd,bhcsd->bhcs", ln, kn)       # (B, H, C, S)
    worst = jnp.min(cos_sim, axis=-1)                      # (B, H, C)
    n_out = min(n_outlier, chunks)
    out_idx = jax.lax.top_k(-worst, n_out)[1]              # (B, H, n_out)
    outlier = jnp.zeros((B, H, chunks), bool)
    outlier = outlier.at[
        jnp.arange(B)[:, None, None], jnp.arange(H)[None, :, None], out_idx
    ].set(True)
    return landmarks, outlier


def shadowkv_chunk_scores(q: Array, landmarks: Array, selectable: Array,
                          scale: float) -> Array:
    """Per-query landmark scores (get_retrieval_position_ids,
    kvsparse.py:378-405): softmax over chunks of q.landmark/sqrt(D), max
    over the GQA group.  q (B, H, G, Tq, D) -> (B, H, Tq, C) f32, with
    non-selectable chunks at -inf AFTER the softmax ranking (the reference
    registers only selectable landmarks, so its softmax never sees the
    outliers — mask before softmax to match)."""
    sc = jnp.einsum("bhgqd,bhcd->bhgqc", q.astype(jnp.float32),
                    landmarks.astype(jnp.float32)) * scale
    sc = jnp.where(selectable[:, :, None, None, :], sc, -jnp.inf)
    attn = jax.nn.softmax(sc, axis=-1)
    return jnp.max(attn, axis=2)                           # (B, H, Tq, C)


def shadowkv_keep_mask(scores: Array, selectable: Array,
                       select_sets: int) -> Array:
    """Top-``select_sets`` retrieved chunks per query -> keep (B,H,Tq,C)."""
    B, H, Tq, C = scores.shape
    k = min(select_sets, C)
    idx = jax.lax.top_k(scores, k)[1]                      # (B, H, Tq, k)
    keep = jnp.zeros((B, H, Tq, C), bool)
    keep = keep.at[
        jnp.arange(B)[:, None, None, None],
        jnp.arange(H)[None, :, None, None],
        jnp.arange(Tq)[None, None, :, None], idx
    ].set(True)
    return keep & selectable[:, :, None, :]


@KV_REGISTRY.register("ShadowKV")
class ShadowKVCache:
    """SVD low-rank K + per-query landmark retrieval with exact V.

    Reference defaults (kvsparse.py:40-51): sparse_budget=1024 tokens,
    chunk_size=8, rank=160, outlier_chunk=48, local_chunk=4."""

    needs_query = True

    def __init__(self, quant_type: str = "", cfg: Optional[Dict] = None,
                 num_layers: int = 0, **kw):
        cfg = cfg or {}
        self.rank = cfg.get("rank", 160)
        self.chunk_size = cfg.get("chunk_size", 8)
        # token budget (reference semantics); older configs passed chunks
        self.sparse_budget = cfg.get("sparse_budget", 1024)
        self.outlier_chunk = cfg.get("outlier_chunk", 48)
        self.local_chunk = cfg.get("local_chunk", 4)

    def make_hook(self, layer_idx: int):
        cs = self.chunk_size

        def hook(k: Array, v: Array, q: Optional[Array] = None,
                 k_pre: Optional[Array] = None, cos=None, sin=None):
            B, H, T, D = k.shape
            select_sets = max(self.sparse_budget // cs, 1)
            chunks, Tc = shadowkv_layout(T, cs, self.local_chunk)
            if chunks <= select_sets + self.outlier_chunk or q is None:
                return k, v, None  # short context: everything exact
            # shadow K: rank-r reconstruction re-roped at its positions,
            # exact at outlier + local/tail tokens
            if k_pre is not None and cos is not None:
                recon = shadowkv_svd_recon(k_pre, self.rank)
                recon, _ = _rope_pair(recon.astype(k.dtype), cos, sin)
            else:  # no pre-rope view available: reconstruct post-rope K
                recon = shadowkv_svd_recon(k, self.rank).astype(k.dtype)
            landmarks, outlier = shadowkv_landmarks(
                k, chunks, cs, self.outlier_chunk)
            exact_tok = jnp.concatenate([
                jnp.repeat(outlier, cs, axis=2),
                jnp.ones((B, H, T - Tc), bool)], axis=2)   # (B, H, T)
            k_eff = jnp.where(exact_tok[..., None], k,
                              recon.astype(k.dtype))
            # per-query retrieval over non-outlier landmarks
            G = q.shape[1] // H
            qg = q.reshape(B, H, G, T, D)
            selectable = ~outlier
            scores = shadowkv_chunk_scores(qg, landmarks, selectable,
                                           D ** -0.5)
            keep = shadowkv_keep_mask(scores, selectable, select_sets)
            tok_keep = jnp.concatenate([
                jnp.repeat(keep | outlier[:, :, None, :], cs, axis=3),
                jnp.ones((B, H, T, T - Tc), bool)], axis=3)  # (B,H,Tq,T)
            extra = jnp.where(tok_keep, 0.0, NEG)
            return k_eff, v, extra

        hook.needs_query = True
        return hook


def _rope_pair(x: Array, cos, sin):
    """Apply HF rotate-half rope to one tensor (B, H, T, D)."""
    from ...models.arch import apply_rope

    return apply_rope(x, x, cos, sin)
