"""Sparse KV caches for long-context inference (llmc kvsparse.py, 653 LoC).

- ``SinkKVCache`` (kvsparse.py:508+): attention-sink streaming — each query
  attends only to the first ``num_sink`` tokens plus a trailing
  ``window_size`` window.  Under jit this is an attention-mask transform
  (static shapes), returned as the hook's third output.
- ``ShadowKVCache`` (kvsparse.py:35-507): rank-r SVD approximation of K plus
  landmark (chunk-mean) retrieval — per query, only the top
  ``sparse_budget`` chunks contribute exact V; K is replaced by its low-rank
  reconstruction.  Here expressed as a pure transform on (k, v, mask):
  chunk scores come from the mean query against landmarks; non-retrieved
  chunks are masked out.
"""

from __future__ import annotations

from typing import Dict, Optional

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


@KV_REGISTRY.register("ShadowKV")
class ShadowKVCache:
    """SVD low-rank K + landmark chunk retrieval with exact sparse V."""

    def __init__(self, quant_type: str = "", cfg: Optional[Dict] = None,
                 num_layers: int = 0, **kw):
        cfg = cfg or {}
        self.rank = cfg.get("rank", 8)
        self.chunk_size = cfg.get("chunk_size", 8)
        self.sparse_budget = cfg.get("sparse_budget", 4)  # chunks kept
        self.num_sink = cfg.get("num_sink", 1)
        self.local_chunks = cfg.get("local_chunks", 1)

    def _lowrank(self, k: Array) -> Array:
        """Rank-r approximation of K per (batch, head)."""
        kf = k.astype(jnp.float32)
        u, s, vt = jnp.linalg.svd(kf, full_matrices=False)
        r = min(self.rank, s.shape[-1])
        return (
            u[..., :, :r] * s[..., None, :r]
        ) @ vt[..., :r, :]

    def make_hook(self, layer_idx: int):
        cs = self.chunk_size

        def hook(k: Array, v: Array):
            B, H, T, D = k.shape
            if T < cs * (self.sparse_budget + self.local_chunks + 1):
                return k, v, None
            n_chunks = T // cs
            Tc = n_chunks * cs
            k_lr = self._lowrank(k[:, :, :Tc]).astype(k.dtype)
            if Tc < T:
                k_lr = jnp.concatenate([k_lr, k[:, :, Tc:]], axis=2)
            # landmarks: chunk-mean keys
            landmarks = jnp.mean(
                k[:, :, :Tc].astype(jnp.float32).reshape(B, H, n_chunks, cs, D),
                axis=3,
            )  # (B, H, C, D)
            # retrieval score: mean |landmark| salience proxy against the
            # average key direction (query-free; decode-time retrieval uses
            # the live query in the serving engine)
            probe = jnp.mean(k.astype(jnp.float32), axis=2)  # (B, H, D)
            scores = jnp.einsum("bhcd,bhd->bhc", landmarks, probe)
            topk = jax.lax.top_k(scores, self.sparse_budget)[1]  # (B,H,kc)
            chunk_keep = jnp.zeros((B, H, n_chunks), bool)
            chunk_keep = chunk_keep.at[
                jnp.arange(B)[:, None, None],
                jnp.arange(H)[None, :, None],
                topk,
            ].set(True)
            # sinks + local chunks always kept
            cid = jnp.arange(n_chunks)
            always = (cid < self.num_sink) | (
                cid >= n_chunks - self.local_chunks
            )
            chunk_keep = chunk_keep | always[None, None, :]
            tok_keep = jnp.repeat(chunk_keep, cs, axis=2)  # (B,H,Tc)
            if Tc < T:
                tok_keep = jnp.concatenate(
                    [tok_keep, jnp.ones((B, H, T - Tc), bool)], axis=2
                )
            extra = jnp.where(tok_keep, 0.0, NEG)[:, :, None, :]
            return k_lr, v, extra

        return hook
