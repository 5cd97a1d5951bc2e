"""Quantized KV cache for serving.

Slot-based preallocated cache: (L, S, H_kv, T_max, D) with int8 per
(head, token) quantization (scale = amax/127) or bf16 passthrough.
Appends are vmapped dynamic_update_slice at each slot's current length;
attention dequantizes rows on the fly (int8 halves the decode-dominant KV
HBM traffic vs bf16).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    k: Array  # (L, S, H, T, D) int8|bf16
    v: Array
    k_scale: Optional[Array]  # (L, S, H, T) f32 (int8 only)
    v_scale: Optional[Array]
    bits: int = dataclasses.field(metadata=dict(static=True), default=8)

    @staticmethod
    def create(n_layers: int, n_slots: int, n_kv_heads: int, max_len: int,
               head_dim: int, bits: int = 8) -> "KVCache":
        shape = (n_layers, n_slots, n_kv_heads, max_len, head_dim)
        if bits == 8:
            return KVCache(
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape[:-1], jnp.float32),
                jnp.zeros(shape[:-1], jnp.float32),
                8,
            )
        return KVCache(
            jnp.zeros(shape, jnp.bfloat16),
            jnp.zeros(shape, jnp.bfloat16),
            None,
            None,
            16,
        )


def quantize_kv(x: Array):
    """Per-(...,token) int8 over head_dim: x (..., T, D)."""
    amax = jnp.clip(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-6,
                    None)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(x / scale[..., None]), -128, 127).astype(jnp.int8)
    return q, scale


def append_kv(
    cache: KVCache, layer: int, k_new: Array, v_new: Array, lengths: Array
) -> KVCache:
    """Append per-slot new K/V at each slot's position.

    k_new/v_new: (S, H, T_new, D); lengths: (S,) current lengths."""

    def upd_slot(buf_s, new_s, pos):
        return jax.lax.dynamic_update_slice(
            buf_s, new_s.astype(buf_s.dtype), (0, pos, 0)
        )

    def upd_scale_slot(buf_s, new_s, pos):
        return jax.lax.dynamic_update_slice(buf_s, new_s, (0, pos))

    if cache.bits == 8:
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        k = cache.k.at[layer].set(
            jax.vmap(upd_slot)(cache.k[layer], kq, lengths)
        )
        v = cache.v.at[layer].set(
            jax.vmap(upd_slot)(cache.v[layer], vq, lengths)
        )
        k_scale = cache.k_scale.at[layer].set(
            jax.vmap(upd_scale_slot)(cache.k_scale[layer], ks, lengths)
        )
        v_scale = cache.v_scale.at[layer].set(
            jax.vmap(upd_scale_slot)(cache.v_scale[layer], vs, lengths)
        )
        return KVCache(k, v, k_scale, v_scale, 8)
    k = cache.k.at[layer].set(
        jax.vmap(upd_slot)(cache.k[layer], k_new, lengths)
    )
    v = cache.v.at[layer].set(
        jax.vmap(upd_slot)(cache.v[layer], v_new, lengths)
    )
    return KVCache(k, v, None, None, 16)


def read_kv(cache: KVCache, layer: int) -> Tuple[Array, Array]:
    """Dequantized (S, H, T, D) bf16 views of one layer."""
    if cache.bits == 8:
        k = cache.k[layer].astype(jnp.float32) * cache.k_scale[layer][..., None]
        v = cache.v[layer].astype(jnp.float32) * cache.v_scale[layer][..., None]
        return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    return cache.k[layer], cache.v[layer]
