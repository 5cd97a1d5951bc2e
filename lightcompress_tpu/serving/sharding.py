"""Multi-chip serving: Megatron-style tensor-parallel shardings for
ServingWeights + KV cache (SURVEY §2.11 / §7 — the reference delegates TP
to vLLM; here it is a NamedSharding layout + GSPMD).

TPU-first design: we do NOT rewrite the decode step per layout — weights
and KV get `NamedSharding`s and `jax.jit` (GSPMD) inserts the collectives:
column-parallel q/k/v/gate/up splits the output dim over ``tp`` (heads
sharded -> attention is embarrassingly parallel over heads), row-parallel
o/down splits the input dim and XLA reduce-scatters/all-reduces the
partial sums.  The W4 Pallas kernel is not GSPMD-partitionable; multi-chip
serving uses the int8/bf16 XLA paths (measured FASTER than the Pallas W4
path at 8B scale: ~635 GB/s streamed vs the ~130 GB/s Pallas DMA ceiling
in this stack).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.qlinear import QLinearParams
from .kv_cache import KVCache, PagedKVCache
from .quantized_model import ServingWeights

# block-linear roles: which dim of the (out, in) weight is sharded
_COL_PARALLEL = ("attn.q", "attn.k", "attn.v", "mlp.gate", "mlp.up",
                 "mlp.fc1", "attn.qkv", "mlp.gateup",
                 # MLA: q_b / kv_b outputs are per-head — head-parallel
                 "attn.q_b", "attn.kv_b",
                 "mlp.shared_gate", "mlp.shared_up")
_ROW_PARALLEL = ("attn.o", "mlp.down", "mlp.fc2", "mlp.shared_down")
# replicated by design: the MLA low-rank input projections produce the
# shared latent (MQA-style, every head consumes all of it) and the router
# gate is tiny — replicating them avoids an all-gather on the hot path
_REPLICATED = ("attn.q_a", "attn.kv_a")


def _stacked_sharding(qp: QLinearParams, mesh: Mesh):
    """Stacked MoE experts: shard the leading expert dim over ``ep`` (or
    ``tp`` when the mesh has no ep axis) — expert-parallel is a pure data
    layout over axis 0; GSPMD inserts the psum for the weighted combine."""
    axis = "ep" if "ep" in mesh.shape else "tp"
    if qp.codes.shape[0] % mesh.shape[axis]:
        axis = None  # E not divisible: replicate
    spec = P(axis, *([None] * (qp.codes.ndim - 1)))
    sspec = P(axis, *([None] * (qp.scales.ndim - 1)))
    return QLinearParams(
        jax.device_put(qp.codes, NamedSharding(mesh, spec)),
        jax.device_put(qp.scales, NamedSharding(mesh, sspec)),
        jax.device_put(qp.zeros, NamedSharding(mesh, sspec))
        if qp.zeros is not None else None,
        None, qp.bits, qp.group_size, qp.is_float, qp.layout,
    )


def _qp_sharding(name: str, qp: QLinearParams, mesh: Mesh):
    def ns(spec):
        return NamedSharding(mesh, spec)

    rep = ns(P())
    if qp.layout in ("stacked", "stacked_planes"):
        return _stacked_sharding(qp, mesh)
    if name in _REPLICATED:
        return jax.device_put(qp, rep)
    if name in _COL_PARALLEL:
        codes = ns(P("tp", None)) if qp.codes.ndim == 2 else \
            ns(P("tp", None, None, None))
        if qp.scales is not None and qp.scales.ndim == 4:
            # pre-tiled (gpp, N/NT, 8, NT): output channels live on dim 1
            scale_spec = ns(P(None, "tp", None, None))
        elif qp.scales is not None and qp.scales.ndim == 1:
            scale_spec = ns(P("tp"))
        else:
            scale_spec = ns(P("tp", None))
        return QLinearParams(
            jax.device_put(qp.codes, codes),
            jax.device_put(qp.scales, scale_spec)
            if qp.scales is not None else None,
            jax.device_put(qp.zeros, scale_spec)
            if qp.zeros is not None else None,
            jax.device_put(qp.bias, ns(P("tp")))
            if qp.bias is not None else None,
            qp.bits, qp.group_size, qp.is_float, qp.layout,
        )
    if name in _ROW_PARALLEL:
        codes = ns(P(None, "tp")) if qp.codes.ndim == 2 else \
            ns(P(None, "tp", None, None))
        return QLinearParams(
            jax.device_put(qp.codes, codes),
            jax.device_put(qp.scales, rep) if qp.scales is not None else None,
            jax.device_put(qp.zeros, rep) if qp.zeros is not None else None,
            jax.device_put(qp.bias, rep) if qp.bias is not None else None,
            qp.bits, qp.group_size, qp.is_float, qp.layout,
        )
    return jax.device_put(qp, rep)


def shard_serving_weights(sw: ServingWeights, mesh: Mesh) -> ServingWeights:
    """Place every weight with its Megatron layout on the mesh."""
    rep = NamedSharding(mesh, P())
    blocks = []
    for entry in sw.blocks:
        out: Dict[str, Any] = {}
        for name, v in entry.items():
            if isinstance(v, QLinearParams):
                out[name] = _qp_sharding(name, v, mesh)
            elif name in ("attn.w_kc", "attn.w_vc") and \
                    v.shape[0] % mesh.shape["tp"] == 0:
                # absorbed MLA decode weights are per-head (nh, ., .):
                # head-parallel like q_b, so the absorbed attention stays
                # embarrassingly parallel over tp
                out[name] = jax.device_put(
                    v, NamedSharding(mesh, P("tp", None, None)))
            else:
                out[name] = jax.device_put(v, rep)
        blocks.append(out)
    # vocab-parallel lm_head: the (vocab, hidden) matmul output is sharded
    # over tp; GSPMD all-gathers the (T, vocab) logits for the sampler —
    # tiny at decode (T=1) vs replicating a 128k-row head per chip.
    vocab_ok = sw.lm_head.ndim == 2 and \
        sw.lm_head.shape[0] % mesh.shape["tp"] == 0
    head_spec = NamedSharding(mesh, P("tp", None)) if vocab_ok else rep
    hs_spec = NamedSharding(mesh, P("tp")) if vocab_ok else rep
    return dataclasses.replace(
        sw,
        sharded=True,
        embed=jax.device_put(sw.embed, rep),
        embed_pos=jax.device_put(sw.embed_pos, rep)
        if sw.embed_pos is not None else None,
        norm=jax.device_put(sw.norm, rep),
        lm_head=jax.device_put(sw.lm_head, head_spec),
        lm_head_scale=jax.device_put(sw.lm_head_scale, hs_spec)
        if sw.lm_head_scale is not None else None,
        blocks=blocks,
    )


def shard_kv_cache(cache, mesh: Mesh):
    """KV heads over ``tp`` (layout (L, S|N_blk, H, T|P, D)); the bd
    layout's K slab (L, S, H*D, T) shards its feature axis, the V slab
    (L, S, T, H*D) its last axis — both are head-major so a tp split of
    H*D is a split over heads."""
    if getattr(cache, "layout", "hhd") == "mla":
        # the compressed latent is shared by every head (MQA-style):
        # replicate — per-token traffic is r + rope_d, already tiny
        rep = NamedSharding(mesh, P())
        return dataclasses.replace(
            cache,
            k=jax.device_put(cache.k, rep),
            v=jax.device_put(cache.v, rep),
            k_scale=jax.device_put(cache.k_scale, rep)
            if cache.k_scale is not None else None,
            v_scale=jax.device_put(cache.v_scale, rep)
            if cache.v_scale is not None else None,
        )
    if getattr(cache, "layout", "hhd") == "bd":
        k_spec = NamedSharding(mesh, P(None, None, "tp", None))
        v_spec = NamedSharding(mesh, P(None, None, None, "tp"))
        s_spec = NamedSharding(mesh, P(None, None, "tp", None))
        return dataclasses.replace(
            cache,
            k=jax.device_put(cache.k, k_spec),
            v=jax.device_put(cache.v, v_spec),
            k_scale=jax.device_put(cache.k_scale, s_spec),
            v_scale=jax.device_put(cache.v_scale, s_spec),
        )
    h_spec = NamedSharding(mesh, P(None, None, "tp", None, None))
    s_spec = NamedSharding(mesh, P(None, None, "tp", None))
    rep = NamedSharding(mesh, P())
    kw = dict(
        k=jax.device_put(cache.k, h_spec),
        v=jax.device_put(cache.v, h_spec),
        k_scale=jax.device_put(cache.k_scale, s_spec)
        if cache.k_scale is not None else None,
        v_scale=jax.device_put(cache.v_scale, s_spec)
        if cache.v_scale is not None else None,
    )
    if isinstance(cache, PagedKVCache):
        return dataclasses.replace(
            cache, block_table=jax.device_put(cache.block_table, rep), **kw)
    return dataclasses.replace(cache, **kw)
