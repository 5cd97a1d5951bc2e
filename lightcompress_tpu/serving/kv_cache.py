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
    k: Array  # (L, S, H, T, D) int8|bf16; bd layout: (L, S, H*D, T)
    v: Array  # bd layout: (L, S, T, H*D)
    k_scale: Optional[Array]  # (L, S, H, T) f32 (int8 only)
    v_scale: Optional[Array]
    bits: int = dataclasses.field(metadata=dict(static=True), default=8)
    # "hhd" = (H, T, D) per slot; "bd" = feature-major K / time-major V
    # slabs for ops.pallas_attention.decode_attention_bd; "mla" = the
    # DeepSeek compressed-latent cache: k holds the rmsnorm'd c_kv latent
    # (L, S, T, kv_lora_rank), v holds the shared post-rope k_rot
    # (L, S, T, qk_rope_head_dim) — per token only r + rope_d values
    # instead of nh * (nope + v_dim), the MLA memory win
    # (/root/reference/llmc/models/deepseekv3.py:69-192 topology; decode
    # consumes it via the absorbed-matmul form, serving/engine.py)
    layout: str = dataclasses.field(metadata=dict(static=True),
                                    default="hhd")
    # optional per-layer auxiliary state riding the cache pytree through
    # every jit (e.g. ShadowKV landmarks/selectable masks — engine
    # sparse_kv mode); None for plain caches
    extra: Optional[Dict[str, Array]] = None

    @staticmethod
    def create_mla(n_layers: int, n_slots: int, max_len: int,
                   kv_lora_rank: int, rope_dim: int,
                   bits: int = 8) -> "KVCache":
        cshape = (n_layers, n_slots, max_len, kv_lora_rank)
        rshape = (n_layers, n_slots, max_len, rope_dim)
        if bits == 8:
            return KVCache(
                jnp.zeros(cshape, jnp.int8), jnp.zeros(rshape, jnp.int8),
                jnp.zeros(cshape[:-1], jnp.bfloat16),
                jnp.zeros(rshape[:-1], jnp.bfloat16), 8, "mla",
            )
        assert bits == 16, "mla cache supports int8 or bf16"
        return KVCache(
            jnp.zeros(cshape, jnp.bfloat16), jnp.zeros(rshape, jnp.bfloat16),
            None, None, 16, "mla",
        )

    @staticmethod
    def create(n_layers: int, n_slots: int, n_kv_heads: int, max_len: int,
               head_dim: int, bits: int = 8,
               layout: str = "hhd") -> "KVCache":
        if layout == "bd":
            assert bits == 8, "bd layout serves the int8 attention kernel"
            kshape = (n_layers, n_slots, n_kv_heads * head_dim, max_len)
            vshape = (n_layers, n_slots, max_len, n_kv_heads * head_dim)
            sshape = (n_layers, n_slots, n_kv_heads, max_len)
            return KVCache(
                jnp.zeros(kshape, jnp.int8), jnp.zeros(vshape, jnp.int8),
                jnp.zeros(sshape, jnp.bfloat16),
                jnp.zeros(sshape, jnp.bfloat16), 8, "bd",
            )
        if layout == "bd4":
            # nibble-packed slabs for ops.pallas_attention.bd4: K
            # feature-major (H*D/2, T) — packed row h*D/2+d = feature
            # h*D+d low nibble / h*D+d+D/2 high — V time-major (T, H*D/2)
            assert bits == 4 and head_dim % 2 == 0
            hd2 = n_kv_heads * head_dim // 2
            kshape = (n_layers, n_slots, hd2, max_len)
            vshape = (n_layers, n_slots, max_len, hd2)
            sshape = (n_layers, n_slots, n_kv_heads, max_len)
            return KVCache(
                jnp.zeros(kshape, jnp.int8), jnp.zeros(vshape, jnp.int8),
                jnp.zeros(sshape, jnp.bfloat16),
                jnp.zeros(sshape, jnp.bfloat16), 4, "bd4",
            )
        shape = (n_layers, n_slots, n_kv_heads, max_len, head_dim)
        if bits == 4:
            # KIVI-class 4-bit KV (kvquant.py parity at serving time):
            # two codes per byte along head_dim, per-(head, token) scale
            assert head_dim % 2 == 0
            p4 = shape[:-1] + (head_dim // 2,)
            return KVCache(
                jnp.zeros(p4, jnp.int8), jnp.zeros(p4, jnp.int8),
                jnp.zeros(shape[:-1], jnp.bfloat16),
                jnp.zeros(shape[:-1], jnp.bfloat16),
                4,
            )
        if bits == 8:
            return KVCache(
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape[:-1], jnp.bfloat16),
                jnp.zeros(shape[:-1], jnp.bfloat16),
                8,
            )
        return KVCache(
            jnp.zeros(shape, jnp.bfloat16),
            jnp.zeros(shape, jnp.bfloat16),
            None,
            None,
            16,
        )


def _append_loop() -> bool:
    import os

    return os.environ.get("LCTPU_APPEND_LOOP", "1") != "0"


def _dus_slots(buf: Array, new: Array, layer: int, lengths: Array,
               pos_axis: int) -> Array:
    """Per-slot loop of dynamic_update_slice on the FULL stacked buffer.

    buf: (L, S, *rest); new: (S, *upd) with ``upd`` rank == ``rest`` rank;
    ``pos_axis`` indexes into ``rest`` at the dimension offset by the
    slot's current length.  The loop form aliases the carried buffer in
    place, while ``.at[layer].set(vmap(dus))`` on stacked (L, S, ...)
    buffers measured 9.8 ms/step of copy traffic at 32 slots x 1024 ctx
    (engine_ablate_append probe, REPORT r3) — the fix was worth +61%
    engine decode.  LCTPU_APPEND_LOOP=0 restores the vmapped form."""
    S = new.shape[0]
    for s in range(S):
        starts = [layer, s] + [0] * (buf.ndim - 2)
        starts[2 + pos_axis] = lengths[s]
        buf = jax.lax.dynamic_update_slice(
            buf, new[s][None, None].astype(buf.dtype), tuple(starts))
    return buf


def quantize_kv(x: Array, scale_dtype=jnp.bfloat16):
    """Per-(...,token) int8 over head_dim: x (..., T, D).

    bf16 scales halve the decode-dominant scale stream (scales are ~11% of
    int8 KV bytes); quantization divides by the ROUNDED scale so the int8
    codes stay consistent with the stored scale."""
    amax = jnp.clip(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-6,
                    None)
    scale = (amax / 127.0).astype(scale_dtype)
    q = jnp.clip(jnp.round(x / scale[..., None].astype(jnp.float32)),
                 -128, 127).astype(jnp.int8)
    return q, scale


def quantize_kv4(x: Array, scale_dtype=jnp.bfloat16):
    """Per-(..., token) symmetric int4 over head_dim, HALF-PLANE packed:
    x (..., T, D) -> codes (..., T, D/2) int8 + scale.  amax/7 scaling,
    codes in [-8, 7]; low nibble = feature d (d < D/2), high nibble =
    feature d + D/2.  The plane layout lets attention run as TWO einsums
    whose operands carry the nibble math elementwise (XLA fuses it into
    the dot read) — an interleaved layout forces a materialized unpacked
    copy (measured pathological, like s4 weight storage)."""
    amax = jnp.clip(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-6,
                    None)
    scale = (amax / 7.0).astype(scale_dtype)
    q = jnp.clip(jnp.round(x.astype(jnp.float32)
                           / scale[..., None].astype(jnp.float32)),
                 -8, 7).astype(jnp.int32)
    half = q.shape[-1] // 2
    lo = q[..., :half] & 0xF
    hi = q[..., half:] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8), scale


def kv4_planes(packed: Array):
    """(..., D/2) int8 nibble pairs -> (lo, hi) f32 code planes, each
    (..., D/2): elementwise only, fuses into downstream dots."""
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) ^ 0x8) - 8          # sign-extend low nibble
    hi = (((p >> 4) & 0xF) ^ 0x8) - 8
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def unpack_kv4(packed: Array) -> Array:
    """(..., D/2) int8 nibble pairs -> (..., D) f32 codes (half-plane
    order: [lo_plane | hi_plane])."""
    lo, hi = kv4_planes(packed)
    return jnp.concatenate([lo, hi], axis=-1)


def append_kv(
    cache: KVCache, layer: int, k_new: Array, v_new: Array, lengths: Array
) -> KVCache:
    """Append per-slot new K/V at each slot's position.

    k_new/v_new: (S, H, T_new, D); lengths: (S,) current lengths.

    All bit-widths run the per-slot-loop dus on the full stacked buffer
    (_dus_slots — aliases in place); LCTPU_APPEND_LOOP=0 restores the
    vmapped ``.at[layer].set`` form that measured 9.8 ms/step of copies."""

    def upd_slot(buf_s, new_s, pos):
        return jax.lax.dynamic_update_slice(
            buf_s, new_s.astype(buf_s.dtype), (0, pos, 0)
        )

    def upd_scale_slot(buf_s, new_s, pos):
        return jax.lax.dynamic_update_slice(buf_s, new_s, (0, pos))

    if cache.bits == 4:
        kq, ks = quantize_kv4(k_new)
        vq, vs = quantize_kv4(v_new)
    elif cache.bits == 8:
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
    else:
        kq, vq, ks, vs = k_new, v_new, None, None
    if _append_loop():
        k = _dus_slots(cache.k, kq, layer, lengths, pos_axis=1)
        v = _dus_slots(cache.v, vq, layer, lengths, pos_axis=1)
        if ks is None:
            return dataclasses.replace(cache, k=k, v=v)
        k_scale = _dus_slots(cache.k_scale, ks, layer, lengths, pos_axis=1)
        v_scale = _dus_slots(cache.v_scale, vs, layer, lengths, pos_axis=1)
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)
    k = cache.k.at[layer].set(
        jax.vmap(upd_slot)(cache.k[layer], kq, lengths))
    v = cache.v.at[layer].set(
        jax.vmap(upd_slot)(cache.v[layer], vq, lengths))
    if ks is None:
        return dataclasses.replace(cache, k=k, v=v)
    k_scale = cache.k_scale.at[layer].set(
        jax.vmap(upd_scale_slot)(cache.k_scale[layer], ks, lengths))
    v_scale = cache.v_scale.at[layer].set(
        jax.vmap(upd_scale_slot)(cache.v_scale[layer], vs, lengths))
    return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                               v_scale=v_scale)


def append_mla(cache: KVCache, layer: int, c_new: Array, r_new: Array,
               lengths: Array) -> KVCache:
    """Append per-slot MLA latents at each slot's position.

    c_new: (S, T_new, kv_lora_rank) rmsnorm'd compressed latent;
    r_new: (S, T_new, rope_dim) post-rope shared k_rot; lengths (S,)."""

    def upd(buf_s, new_s, pos):
        return jax.lax.dynamic_update_slice(
            buf_s, new_s.astype(buf_s.dtype), (pos, 0))

    def upd_scale(buf_s, new_s, pos):
        return jax.lax.dynamic_update_slice(buf_s, new_s, (pos,))

    if cache.bits == 8:
        cq, cs = quantize_kv(c_new)   # per-token over the latent dim
        rq, rs = quantize_kv(r_new)
    else:
        cq, rq, cs, rs = c_new, r_new, None, None
    if _append_loop():
        k = _dus_slots(cache.k, cq, layer, lengths, pos_axis=0)
        v = _dus_slots(cache.v, rq, layer, lengths, pos_axis=0)
        if cs is None:
            return dataclasses.replace(cache, k=k, v=v)
        k_scale = _dus_slots(cache.k_scale, cs, layer, lengths, pos_axis=0)
        v_scale = _dus_slots(cache.v_scale, rs, layer, lengths, pos_axis=0)
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)
    k = cache.k.at[layer].set(jax.vmap(upd)(cache.k[layer], cq, lengths))
    v = cache.v.at[layer].set(jax.vmap(upd)(cache.v[layer], rq, lengths))
    if cs is None:
        return dataclasses.replace(cache, k=k, v=v)
    k_scale = cache.k_scale.at[layer].set(
        jax.vmap(upd_scale)(cache.k_scale[layer], cs, lengths))
    v_scale = cache.v_scale.at[layer].set(
        jax.vmap(upd_scale)(cache.v_scale[layer], rs, lengths))
    return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                               v_scale=v_scale)


def append_mla_quantized(cache: KVCache, layer: int, cq: Array, cs: Array,
                         rq: Array, rs: Array, lengths: Array) -> KVCache:
    """append_mla for ALREADY-quantized fresh latents (the append-first
    MLA decode path quantizes once and reuses the codes for the cache
    write AND the attention read — engine._block_apply_mla_decode_a).

    cq: (S, T_new, r) int8 latent codes; cs: (S, T_new) scales;
    rq/rs: same for the shared post-rope k_rot."""
    assert cache.bits == 8 and cache.layout == "mla"
    k = _dus_slots(cache.k, cq, layer, lengths, pos_axis=0)
    v = _dus_slots(cache.v, rq, layer, lengths, pos_axis=0)
    k_scale = _dus_slots(cache.k_scale, cs, layer, lengths, pos_axis=0)
    v_scale = _dus_slots(cache.v_scale, rs, layer, lengths, pos_axis=0)
    return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                               v_scale=v_scale)


def read_mla(cache: KVCache, layer: int) -> Tuple[Array, Array]:
    """Dequantized (S, T, r) latent + (S, T, rope_d) k_rot bf16 views."""
    if cache.bits == 8:
        c = cache.k[layer].astype(jnp.float32) * \
            cache.k_scale[layer][..., None].astype(jnp.float32)
        r = cache.v[layer].astype(jnp.float32) * \
            cache.v_scale[layer][..., None].astype(jnp.float32)
        return c.astype(jnp.bfloat16), r.astype(jnp.bfloat16)
    return cache.k[layer], cache.v[layer]


def read_kv_slot(cache: KVCache, layer: int, slot) -> Tuple[Array, Array]:
    """Dequantized (1, H, T, D) bf16 views of ONE slot of one layer.

    Chunked prefill attends only over its own slot's history;
    dequantizing the whole (S, ...) layer first (read_kv) materializes
    S× the needed bf16 rows per layer and blows the prefill-chunk
    program's HBM reservation at long contexts (r5 on-chip: kv4 32x4096
    PC=1024 failed AOT with "program 10.33G" — per-layer full-cache
    dequant transients)."""
    idx = jax.lax.dynamic_index_in_dim
    ks = idx(cache.k[layer], slot, 0, keepdims=True)
    vs = idx(cache.v[layer], slot, 0, keepdims=True)
    if cache.bits == 4:
        k = unpack_kv4(ks) * idx(cache.k_scale[layer], slot, 0,
                                 keepdims=True)[..., None]
        v = unpack_kv4(vs) * idx(cache.v_scale[layer], slot, 0,
                                 keepdims=True)[..., None]
        return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    if cache.bits == 8:
        k = ks.astype(jnp.float32) * idx(cache.k_scale[layer], slot, 0,
                                         keepdims=True)[..., None]
        v = vs.astype(jnp.float32) * idx(cache.v_scale[layer], slot, 0,
                                         keepdims=True)[..., None]
        return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    return ks, vs


def read_kv(cache: KVCache, layer: int) -> Tuple[Array, Array]:
    """Dequantized (S, H, T, D) bf16 views of one layer."""
    if cache.bits == 4:
        k = unpack_kv4(cache.k[layer]) * cache.k_scale[layer][..., None]
        v = unpack_kv4(cache.v[layer]) * cache.v_scale[layer][..., None]
        return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    if cache.bits == 8:
        k = cache.k[layer].astype(jnp.float32) * cache.k_scale[layer][..., None]
        v = cache.v[layer].astype(jnp.float32) * cache.v_scale[layer][..., None]
        return k.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
    return cache.k[layer], cache.v[layer]


# ---------------------------------------------------------------------------
# Paged KV cache (vLLM-style block tables, TPU-first layout)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Block-paged quantized KV pool.

    Layout (L, n_blocks, H, P, D): whole (H, P, D) pages move per DMA —
    page gathers stay large and contiguous on TPU.  A per-slot block table
    (S, max_blocks) int32 maps logical token position t -> physical page
    table[s, t // P]; the free-list allocator lives on the host (engine),
    the table rides into jit as a traced array.
    """

    k: Array  # (L, N_blk, H, P, D) int8|bf16
    v: Array
    k_scale: Optional[Array]  # (L, N_blk, H, P) f32
    v_scale: Optional[Array]
    block_table: Array  # (S, max_blocks) int32, -1 = unmapped
    bits: int = dataclasses.field(metadata=dict(static=True), default=8)
    page: int = dataclasses.field(metadata=dict(static=True), default=16)

    @staticmethod
    def create(n_layers: int, n_blocks: int, n_slots: int, max_blocks: int,
               n_kv_heads: int, page: int, head_dim: int,
               bits: int = 8) -> "PagedKVCache":
        shape = (n_layers, n_blocks, n_kv_heads, page, head_dim)
        table = jnp.full((n_slots, max_blocks), -1, jnp.int32)
        if bits not in (8, 16):
            # kv4 has no paged layout — failing loudly beats silently
            # allocating a bf16 cache under a kv_bits=4 request (ADVICE r2)
            raise ValueError(
                f"PagedKVCache supports bits 8/16, got {bits}; "
                "use the slot cache (paged=False) for kv4")
        if bits == 8:
            return PagedKVCache(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape[:-1], jnp.bfloat16),
                jnp.zeros(shape[:-1], jnp.bfloat16),
                table, 8, page,
            )
        return PagedKVCache(
            jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16),
            None, None, table, 16, page,
        )

    @property
    def max_tokens(self) -> int:
        return self.block_table.shape[1] * self.page


def paged_append_decode(cache: PagedKVCache, layer: int, k_new: Array,
                        v_new: Array, lengths: Array) -> PagedKVCache:
    """Append ONE token per slot: k_new/v_new (S, H, 1, D)."""
    P = cache.page
    S = k_new.shape[0]
    blk = cache.block_table[jnp.arange(S), lengths // P]  # (S,)
    blk = jnp.maximum(blk, 0)  # unmapped slots write page 0 harmlessly
    off = lengths % P
    si = jnp.arange(S)
    if cache.bits == 8:
        kq, ks = quantize_kv(k_new)  # (S,H,1,D), (S,H,1)
        vq, vs = quantize_kv(v_new)
        k = cache.k.at[layer, blk, :, off].set(kq[:, :, 0])
        v = cache.v.at[layer, blk, :, off].set(vq[:, :, 0])
        k_scale = cache.k_scale.at[layer, blk, :, off].set(ks[:, :, 0])
        v_scale = cache.v_scale.at[layer, blk, :, off].set(vs[:, :, 0])
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)
    k = cache.k.at[layer, blk, :, off].set(
        k_new[:, :, 0].astype(cache.k.dtype))
    v = cache.v.at[layer, blk, :, off].set(
        v_new[:, :, 0].astype(cache.v.dtype))
    return dataclasses.replace(cache, k=k, v=v)


def paged_append_prefill(cache: PagedKVCache, layer: int, slot,
                         k_new: Array, v_new: Array) -> PagedKVCache:
    """Write a whole padded prompt's KV (1, H, T, D) into slot's pages
    (T must be a multiple of page; prefill buckets guarantee it)."""
    P = cache.page
    _, H, T, D = k_new.shape
    nb = T // P
    blks = jnp.maximum(cache.block_table[slot, :nb], 0)  # (nb,)

    def paged_view(x):  # (1,H,T,D) -> (nb,H,P,D)
        return x[0].reshape(H, nb, P, D).transpose(1, 0, 2, 3)

    if cache.bits == 8:
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        k = cache.k.at[layer, blks].set(paged_view(kq))
        v = cache.v.at[layer, blks].set(paged_view(vq))
        k_scale = cache.k_scale.at[layer, blks].set(
            ks[0].reshape(H, nb, P).transpose(1, 0, 2))
        v_scale = cache.v_scale.at[layer, blks].set(
            vs[0].reshape(H, nb, P).transpose(1, 0, 2))
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)
    k = cache.k.at[layer, blks].set(paged_view(k_new).astype(cache.k.dtype))
    v = cache.v.at[layer, blks].set(paged_view(v_new).astype(cache.v.dtype))
    return dataclasses.replace(cache, k=k, v=v)


def paged_read(cache: PagedKVCache, layer: int) -> Tuple[Array, Array]:
    """Gather every slot's pages: -> (S, H, max_blocks*P, D) bf16."""
    blks = jnp.maximum(cache.block_table, 0)  # (S, maxB)
    S, maxB = blks.shape
    P = cache.page

    def join(pages):  # (S, maxB, H, P, D) -> (S, H, maxB*P, D)
        s, b, h, p, d = pages.shape
        return pages.transpose(0, 2, 1, 3, 4).reshape(s, h, b * p, d)

    k = cache.k[layer][blks]
    v = cache.v[layer][blks]
    if cache.bits == 8:
        ks = cache.k_scale[layer][blks][..., None]
        vs = cache.v_scale[layer][blks][..., None]
        return (join(k.astype(jnp.float32) * ks).astype(jnp.bfloat16),
                join(v.astype(jnp.float32) * vs).astype(jnp.bfloat16))
    return join(k), join(v)


class PageAllocator:
    """Host-side free-list of physical pages (engine-managed).

    Page 0 is reserved as a scratch target: inactive slots' unmapped table
    entries clamp to it inside jit (paged_append_decode), so it must never
    hold live data."""

    def __init__(self, n_blocks: int, start: int = 1):
        self.free = list(range(n_blocks - 1, start - 1, -1))

    def alloc(self, n: int):
        if len(self.free) < n:
            raise RuntimeError("KV page pool exhausted")
        return [self.free.pop() for _ in range(n)]

    def release(self, pages):
        self.free.extend(int(p) for p in pages if int(p) >= 0)


def append_kv4_bd(cache: KVCache, layer: int, k4: Array, ks: Array,
                  v4: Array, vs: Array, lengths: Array) -> KVCache:
    """Append one nibble-packed token per slot to the bd4 slabs.

    k4/v4: (S, H, 1, D/2) int8 (quantize_kv4 codes); ks/vs: (S, H, 1)."""
    S, H, _, D2 = k4.shape
    if _append_loop():
        k = _dus_slots(cache.k, k4.reshape(S, H * D2, 1), layer, lengths,
                       pos_axis=1)
        v = _dus_slots(cache.v, v4.reshape(S, 1, H * D2), layer, lengths,
                       pos_axis=0)
        k_scale = _dus_slots(cache.k_scale, ks, layer, lengths, pos_axis=1)
        v_scale = _dus_slots(cache.v_scale, vs, layer, lengths, pos_axis=1)
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)

    def upd_k(buf_s, new_s, pos):  # (H*D2, T) <- (H, 1, D2)
        return jax.lax.dynamic_update_slice(
            buf_s, new_s.reshape(H * D2, 1), (0, pos))

    def upd_v(buf_s, new_s, pos):  # (T, H*D2) <- (H, 1, D2)
        return jax.lax.dynamic_update_slice(
            buf_s, new_s.reshape(1, H * D2), (pos, 0))

    def upd_s(buf_s, new_s, pos):  # (H, T) <- (H, 1)
        return jax.lax.dynamic_update_slice(
            buf_s, new_s.astype(buf_s.dtype), (0, pos))

    k = cache.k.at[layer].set(jax.vmap(upd_k)(cache.k[layer], k4, lengths))
    v = cache.v.at[layer].set(jax.vmap(upd_v)(cache.v[layer], v4, lengths))
    k_scale = cache.k_scale.at[layer].set(
        jax.vmap(upd_s)(cache.k_scale[layer], ks, lengths))
    v_scale = cache.v_scale.at[layer].set(
        jax.vmap(upd_s)(cache.v_scale[layer], vs, lengths))
    return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                               v_scale=v_scale)


def append_kv_quantized(
    cache: KVCache, layer: int, kq: Array, ks: Array, vq: Array, vs: Array,
    lengths: Array,
) -> KVCache:
    """append_kv for already-quantized new tokens (the Pallas decode
    attention path quantizes the fresh token once and reuses the codes for
    both the in-register attention column and the cache write).

    kq/vq: (S, H, T_new, D) int8; ks/vs: (S, H, T_new) scale dtype.

    Every layout appends via the per-slot loop of dus on the FULL
    stacked buffer (_dus_slots) instead of ``.at[layer].set(vmap(dus))``:
    the vmapped form measured 9.8 ms/step of copy traffic at 32 slots x
    1024 ctx (engine_ablate_append probe) while the loop aliases in
    place — engine step 27.3 -> 17.0 ms (+61% decode throughput,
    engine_append_loop probe).  LCTPU_APPEND_LOOP=0 restores the old
    form for comparison."""
    assert cache.bits == 8
    if _append_loop() and cache.layout == "hhd":
        k = _dus_slots(cache.k, kq, layer, lengths, pos_axis=1)
        v = _dus_slots(cache.v, vq, layer, lengths, pos_axis=1)
        ksc = _dus_slots(cache.k_scale, ks, layer, lengths, pos_axis=1)
        vsc = _dus_slots(cache.v_scale, vs, layer, lengths, pos_axis=1)
        return dataclasses.replace(cache, k=k, v=v, k_scale=ksc,
                                   v_scale=vsc)
    if cache.layout == "bd":
        assert kq.shape[2] == 1, "bd decode appends one token per slot"
        S, H, _, D = kq.shape
        if _append_loop():
            k = _dus_slots(cache.k, kq.reshape(S, H * D, 1), layer,
                           lengths, pos_axis=1)
            v = _dus_slots(cache.v, vq.reshape(S, 1, H * D), layer,
                           lengths, pos_axis=0)
            k_scale = _dus_slots(cache.k_scale, ks.reshape(S, H, 1),
                                 layer, lengths, pos_axis=1)
            v_scale = _dus_slots(cache.v_scale, vs.reshape(S, H, 1),
                                 layer, lengths, pos_axis=1)
            return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                       v_scale=v_scale)

        def upd_k(buf_s, new_s, pos):  # (H*D, T) <- (H, 1, D)
            return jax.lax.dynamic_update_slice(
                buf_s, new_s.reshape(H * D, 1), (0, pos))

        def upd_v(buf_s, new_s, pos):  # (T, H*D) <- (H, 1, D)
            return jax.lax.dynamic_update_slice(
                buf_s, new_s.reshape(1, H * D), (pos, 0))

        def upd_s(buf_s, new_s, pos):  # (H, T) <- (H, 1)
            return jax.lax.dynamic_update_slice(
                buf_s, new_s.astype(buf_s.dtype), (0, pos))

        k = cache.k.at[layer].set(
            jax.vmap(upd_k)(cache.k[layer], kq, lengths))
        v = cache.v.at[layer].set(
            jax.vmap(upd_v)(cache.v[layer], vq, lengths))
        k_scale = cache.k_scale.at[layer].set(
            jax.vmap(upd_s)(cache.k_scale[layer], ks, lengths))
        v_scale = cache.v_scale.at[layer].set(
            jax.vmap(upd_s)(cache.v_scale[layer], vs, lengths))
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)

    def upd_slot(buf_s, new_s, pos):
        return jax.lax.dynamic_update_slice(
            buf_s, new_s.astype(buf_s.dtype), (0, pos, 0)
        )

    def upd_scale_slot(buf_s, new_s, pos):
        return jax.lax.dynamic_update_slice(
            buf_s, new_s.astype(buf_s.dtype), (0, pos)
        )

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
    return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                               v_scale=v_scale)


def flush_ring_to_cache(cache: KVCache, ring: Dict[str, Array],
                        lengths0: Array) -> KVCache:
    """Write a decode chunk's ring-buffer tokens into the main hhd cache
    at each slot's chunk-entry position (engine attn_impl='xla8r').

    ring: rk/rv (L, S, H, W, D) int8, rks/rvs (L, S, H, W) scales — or the
    FUSED layout rkv (L, S, 2H, W, D) / rs (L, S, 2H, W) where k occupies
    head rows [0, H) and v rows [H, 2H) (engine LCTPU_RING_FUSED, 2 dus
    per layer on the append side).  Column w holds the token generated at
    chunk step w (slot s's absolute position lengths0[s] + w).  Inactive
    slots' columns land beyond their length — masked until real tokens
    overwrite them.  The ring's LAYER axis is fully written, so one dus
    per (slot, buffer) covers all L layers at once — 4 dus/slot instead
    of 4 dus/(slot, layer) (r5: the per-layer flush was 4096 dus/chunk
    at 32 slots x 32 layers, ~256 op-equivalents per decode step at
    chunk 16 — a leading term of the engine-vs-bare-loop gap); in-place
    aliasing under donation is per-dus, unchanged.  Runs ONCE per
    chunk."""
    k, v, ks, vs = cache.k, cache.v, cache.k_scale, cache.v_scale
    S = k.shape[1]
    if "rkv" in ring:
        H = k.shape[2]
        for s in range(S):
            st = (0, s, 0, lengths0[s], 0)
            sst = (0, s, 0, lengths0[s])
            k = jax.lax.dynamic_update_slice(
                k, ring["rkv"][:, s:s + 1, :H].astype(k.dtype), st)
            v = jax.lax.dynamic_update_slice(
                v, ring["rkv"][:, s:s + 1, H:].astype(v.dtype), st)
            ks = jax.lax.dynamic_update_slice(
                ks, ring["rs"][:, s:s + 1, :H].astype(ks.dtype), sst)
            vs = jax.lax.dynamic_update_slice(
                vs, ring["rs"][:, s:s + 1, H:].astype(vs.dtype), sst)
        return dataclasses.replace(cache, k=k, v=v, k_scale=ks,
                                   v_scale=vs)
    for s in range(S):
        st = (0, s, 0, lengths0[s], 0)
        sst = (0, s, 0, lengths0[s])
        k = jax.lax.dynamic_update_slice(
            k, ring["rk"][:, s:s + 1].astype(k.dtype), st)
        v = jax.lax.dynamic_update_slice(
            v, ring["rv"][:, s:s + 1].astype(v.dtype), st)
        ks = jax.lax.dynamic_update_slice(
            ks, ring["rks"][:, s:s + 1].astype(ks.dtype), sst)
        vs = jax.lax.dynamic_update_slice(
            vs, ring["rvs"][:, s:s + 1].astype(vs.dtype), sst)
    return dataclasses.replace(cache, k=k, v=v, k_scale=ks, v_scale=vs)

