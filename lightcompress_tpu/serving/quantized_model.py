"""Serving-side quantized model: adapter params -> packed serving weights.

The consumer of the export path (the role vLLM/SGLang play for the
reference): block linears become QLinearParams (plane-packed int4 for the
Pallas kernel, int8, or fp8), embeddings/norms stay bf16.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models import arch as A
from ..models.base import BaseModel, resolve
from ..ops.qlinear import QLinearParams, qlinear_apply, quantize_linear
from ..ops.scaled_matmul import int8_matmul_dynamic
from ..quant import QParams, QuantSpec

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ServingWeights:
    """Registered as a pytree so engines pass it as a TRACED jit argument
    — closing over it embeds GBs of weight constants in the executable
    (and re-ships them per call through tunneled runtimes, the r1
    closure-capture bug class)."""

    arch: A.ArchSpec = dataclasses.field(metadata=dict(static=True))
    embed: Array = None  # bf16 (vocab, hidden)
    embed_pos: Optional[Array] = None
    norm: Dict[str, Array] = None
    lm_head: Array = None
    # int8 head (build_serving_weights head_bits=8): lm_head holds int8
    # per-channel codes and this the (vocab,) scale — the head read is
    # ~1.05 GB bf16 at 128k vocab, ~1.3 ms of every decode step at HBM
    # rate, and the engine-vs-bare-loop gap's single largest term (r5);
    # int8 halves it.  None = bf16 head.
    lm_head_scale: Optional[Array] = None
    blocks: List[Dict[str, Any]] = None  # name -> QLinearParams | {...}
    wbits: int = dataclasses.field(metadata=dict(static=True), default=4)
    # 16 = W4A16; 8 = W4A8 (per-token dynamic int8 acts on the MXU int8 path)
    act_bits: int = dataclasses.field(metadata=dict(static=True),
                                      default=16)
    # True once shard_serving_weights placed the arrays on a mesh: the
    # MoE small-batch gathered path disables itself (an expert gather
    # would break the ep PartitionSpec)
    sharded: bool = dataclasses.field(metadata=dict(static=True),
                                      default=False)
    # True = RMSNorm gammas were folded into the pre-norm linears' weights
    # at quantization time (W' = W * gamma[None, :], exact since the fold
    # happens before quantization) and the stored ln weights are ones.
    # The plain path stays correct (norm with ones + folded linear); the
    # fused decode kernel additionally runs the norm+act-quant in-kernel.
    fused_rms: bool = dataclasses.field(metadata=dict(static=True),
                                        default=False)

    def tree_blocks(self):
        return self.blocks


_LN1_LINEARS = ("attn.q", "attn.k", "attn.v", "attn.qkv")
_LN2_LINEARS = ("mlp.gate", "mlp.up", "mlp.fc1", "mlp.gate_up")


def quantize_linear_stacked(w3: Array, wspec: QuantSpec,
                            layout: str = "auto") -> QLinearParams:
    """Per-expert quantization of a stacked (E, oc, ic) MoE weight.

    Serving analogue of the calibration side's per-expert loops: every
    expert gets its own scales/zeros (per-group quant is per output row, so
    stacking cannot share statistics).  Codes keep the leading expert dim —
    the EP NamedSharding over axis 0 (serving/sharding.py) is then a pure
    data layout, no re-pack (reference topology:
    /root/reference/llmc/models/deepseekv3.py:69-192).

    ``layout="auto"`` picks the tiled PLANES layout (codes
    (E, N/NT, gpp, NT, g) int32 + combined scale slabs) whenever the
    shapes fit the W4A8 kernel — the dense-MoE serving matmuls then run
    as ONE stacked pallas_call (w4a8_stacked_matmul) instead of the XLA
    dequant+einsum, whose stacked int4 unpack never fuses (measured
    33 ms/layer on-chip, moe_gather_probe r4).  "rows" forces the plain
    int4-pair layout (export interop / non-TPU)."""
    E, oc, ic = w3.shape
    gs = wspec.group_size if wspec.granularity == "per_group" else 0
    use_planes = (layout in ("auto", "planes") and wspec.bit == 4
                  and not wspec.is_float and gs
                  and ic % (8 * gs) == 0 and oc % 128 == 0)
    if use_planes:
        parts = [quantize_linear(w3[e].astype(jnp.float32), wspec,
                                 layout="planes", scale_layout="contig")
                 for e in range(E)]
        assert parts[0].layout == "planes" and parts[0].zeros is None
        return QLinearParams(
            jnp.stack([p.codes for p in parts]),
            jnp.stack([p.scales for p in parts]), None, None,
            4, gs, False, "stacked_planes")
    import os as _os

    if (layout == "auto" and wspec.bit == 4 and not wspec.is_float
            and _os.environ.get("LCTPU_STACKED_INT8_FALLBACK", "1")
            != "0"):
        # planes-INELIGIBLE shape (e.g. DeepSeek-V2/V2-Lite down-proj:
        # ic 1536/1408 not a multiple of 8*group) — store int8
        # per-channel instead of int4 rows: the int8->bf16 dequant is a
        # plain convert+scale that XLA fuses into the einsum's weight
        # read, where the int4 rows unpack (gather + bit ops) never
        # fuses and materializes (E, oc, ic) bf16 per call (r4
        # moe_gather_probe).  Per-channel int8 is also no less accurate
        # than per-group int4.  LCTPU_STACKED_INT8_FALLBACK=0 restores
        # the int4 rows storage.
        spec8 = QuantSpec(bit=8, symmetric=True,
                          granularity="per_channel")
        parts = [quantize_linear(w3[e].astype(jnp.float32), spec8,
                                 layout="rows")
                 for e in range(w3.shape[0])]
        return QLinearParams(
            jnp.stack([p.codes for p in parts]),
            jnp.stack([p.scales for p in parts]), None, None,
            8, 0, False, "stacked")
    parts = [quantize_linear(w3[e].astype(jnp.float32), wspec,
                             layout="rows")
             for e in range(w3.shape[0])]
    codes = jnp.stack([p.codes for p in parts])
    scales = jnp.stack([p.scales for p in parts])
    zeros = (jnp.stack([p.zeros for p in parts])
             if parts[0].zeros is not None else None)
    p0 = parts[0]
    return QLinearParams(codes, scales, zeros, None, p0.bits,
                         p0.group_size, p0.is_float, "stacked")


def _dequant_expert_planes(codes5: Array, szs: Array, gs: int) -> Array:
    """One expert's tiled-planes codes (nb, gpp, NT, g) + combined scale
    slab (nb, 2*gpp*8, NT) -> (oc, ic) f32 weights (inverse of
    tile_packed / tile_scales_combined + plane unpack)."""
    from ..ops.pallas_matmul import unpack_int4_planes

    nb, gpp, nt, g = codes5.shape
    kp = gpp * g
    wp = codes5.transpose(0, 2, 1, 3).reshape(nb * nt, kp)
    u = unpack_int4_planes(wp, kp * 8).astype(jnp.float32)  # (N, K)
    G = 8 * gpp
    r = szs.reshape(nb, 2, gpp, 8, nt)

    def back(t):  # (nb, gpp, 8, nt) -> (N, G)
        return t.transpose(0, 3, 2, 1).reshape(nb * nt, G)

    s = back(r[:, 0]).astype(jnp.float32)
    zs = back(r[:, 1]).astype(jnp.float32)  # premultiplied z*s
    ug = u.reshape(nb * nt, G, gs)
    return (ug * s[:, :, None] - zs[:, :, None]).reshape(nb * nt, kp * 8)


def dequant_weight_stacked(qp: QLinearParams,
                           dtype=jnp.bfloat16) -> Array:
    """(E, oc, ic) bf16 view of a stacked quantized expert weight.  At
    decode XLA fuses the dequant into the einsum's weight read, so HBM
    traffic stays at the packed size (same property as qlinear_xla)."""
    from ..ops.qlinear import _unpack_int4_u

    E = qp.codes.shape[0]
    if getattr(qp, "layout", "") == "stacked_planes":
        w = jax.vmap(
            lambda c, s: _dequant_expert_planes(c, s, qp.group_size)
        )(qp.codes, qp.scales)
        return w.astype(dtype)
    if qp.bits == 4:
        u = jax.vmap(_unpack_int4_u)(qp.codes).astype(jnp.float32)
    else:
        u = qp.codes.astype(jnp.float32)
    oc, ic = u.shape[1], u.shape[2]
    g = qp.group_size or ic
    u = u.reshape(E, oc, ic // g, g)
    s = qp.scales.reshape(E, oc, -1, 1)
    z = (qp.zeros.reshape(E, oc, -1, 1)
         if qp.zeros is not None else 0.0)
    return ((u - z) * s).reshape(E, oc, ic).astype(dtype)


def apply_qlinear_stacked(qp, x: Array, pair: bool = False,
                          interpret: bool = False) -> Array:
    """Stacked-expert linear: x (n, ic) -> (E, n, oc); ``pair`` means x
    already carries the expert dim ((E, n, ic), the down-proj input).

    stacked_planes weights on TPU run the ONE-call stacked Pallas kernel
    (w4a8_stacked_matmul) — the XLA dequant+einsum's stacked int4 unpack
    never fuses and measured 33 ms/layer on-chip (moe_gather_probe r4).
    Falls back to the dequant einsum on CPU or at B > 256 (MoE prefill:
    the kernel holds the whole B slab in VMEM)."""
    if isinstance(qp, QLinearParams) \
            and getattr(qp, "layout", "") == "stacked_planes" \
            and x.shape[-2] <= 256 \
            and (interpret or jax.default_backend() != "cpu"):
        import os as _os

        from ..ops.pallas_matmul import (quantize_act_per_token,
                                         w4a8_stacked_matmul,
                                         w4a8_stacked_matmul_smallm)

        if pair:
            E, n, ic = x.shape
            xq, xs = quantize_act_per_token(x.reshape(E * n, ic))
            xq = xq.reshape(E, n, ic)
            xs = xs.reshape(E, n, 1)
        else:
            xq, xs = quantize_act_per_token(x)
        # r5 NEGATIVE RESULT (probe-only, default off): the bf16
        # block-dot variant (gpp+1 dot issues vs 8*gpp+1) measured
        # 29.2 ms vs 10.2 base at n=4-8 and 100 ms at n=32 — the
        # stacked kernel is MXU array-FILL bound (every weight element
        # streams into the systolic array once; fewer/bigger dots do
        # not reduce passes) and the in-kernel unpack-to-bf16 + scale
        # fold adds VPU cost on top (tools/r5logs/moe_ab.log)
        smallm_max = int(_os.environ.get("LCTPU_MOE_SMALLM", "0"))
        kern = (w4a8_stacked_matmul_smallm
                if x.shape[-2] <= smallm_max else w4a8_stacked_matmul)
        return kern(
            xq, xs, qp.codes, qp.scales, group=qp.group_size, pair=pair,
            interpret=interpret)
    if isinstance(qp, QLinearParams):
        w = dequant_weight_stacked(qp)
    else:
        w = qp["weight"].astype(jnp.bfloat16)
    eq = "eni,eoi->eno" if pair else "ni,eoi->eno"
    return jnp.einsum(eq, x.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)


def apply_qlinear_gathered(qp, x: Array, e_idx: Array) -> Array:
    """Per-token expert-GATHERED linear: x (n, ic), e_idx (n,) expert id
    per token -> (n, oc).

    Small-batch MoE serving path (VERDICT r4 #7): below ~E/top_k active
    tokens the dense all-expert read (apply_qlinear_stacked) streams
    every expert's weights while only n*top_k are used; gathering reads
    just the selected experts' packed codes (each a contiguous
    (oc, ic/8) slab — one big DMA per token, TPU-friendly).  Dequant of
    the gathered codes fuses into the batched-matvec read like the dense
    path's."""
    from ..ops.qlinear import _unpack_int4_u

    if not isinstance(qp, QLinearParams):
        w = qp["weight"].astype(jnp.bfloat16)[e_idx]  # (n, oc, ic)
        return jnp.einsum("ni,noi->no", x.astype(jnp.bfloat16), w,
                          preferred_element_type=jnp.float32)
    if getattr(qp, "layout", "") == "stacked_planes":
        w = jax.vmap(
            lambda c, s: _dequant_expert_planes(c, s, qp.group_size)
        )(qp.codes[e_idx], qp.scales[e_idx]).astype(jnp.bfloat16)
        return jnp.einsum("ni,noi->no", x.astype(jnp.bfloat16), w,
                          preferred_element_type=jnp.float32)
    codes = qp.codes[e_idx]  # (n, oc, icp)
    if qp.bits == 4:
        u = jax.vmap(_unpack_int4_u)(codes).astype(jnp.float32)
    else:
        u = codes.astype(jnp.float32)
    n, oc, ic = u.shape
    g = qp.group_size or ic
    u = u.reshape(n, oc, ic // g, g)
    s = qp.scales[e_idx].reshape(n, oc, -1, 1)
    z = (qp.zeros[e_idx].reshape(n, oc, -1, 1)
         if qp.zeros is not None else 0.0)
    w = ((u - z) * s).reshape(n, oc, ic).astype(jnp.bfloat16)
    return jnp.einsum("ni,noi->no", x.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)


def moe_group_selections(topi: Array, num_experts: int,
                         m_tile: int = 128):
    """Static-shape dropless grouping of MoE selections by expert.

    Sorts the (n, top_k) routing selections by expert id and pads each
    expert's run to an ``m_tile`` boundary, so every M block of the
    grouped activation matrix belongs to exactly one expert — the layout
    w4a8_grouped_matmul's scalar-prefetched index maps need.  All shapes
    are static (Mp = (ceil(S/m_tile) + E) * m_tile bounds the worst-case
    per-expert padding), so the whole grouping jits; no token is ever
    dropped (capacity is a LAYOUT bound here, not a routing bound — the
    reference's sequential expert loop, deepseekv3.py:128-167, is also
    dropless).

    Returns ``(gather_row, sel_pos, block_eid)``: ``gather_row`` (Mp,)
    source token row per grouped row (== n for padding rows — point it
    at a zeroed dummy row); ``sel_pos`` (S,) destination row of
    selection s in token-major order; ``block_eid`` (Mp/m_tile,) expert
    id per M block."""
    n, top_k = topi.shape
    S = n * top_k
    E = num_experts
    Mp = (-(-S // m_tile) + E) * m_tile
    e_flat = topi.reshape(-1).astype(jnp.int32)
    order = jnp.argsort(e_flat, stable=True)
    e_sorted = e_flat[order]
    counts = jnp.zeros((E,), jnp.int32).at[e_flat].add(1)
    padded = -(-counts // m_tile) * m_tile
    start = jnp.cumsum(counts) - counts
    pstart = jnp.cumsum(padded) - padded
    pos_sorted = (jnp.arange(S, dtype=jnp.int32) - start[e_sorted]
                  + pstart[e_sorted])
    gather_row = jnp.full((Mp,), n, jnp.int32).at[pos_sorted].set(
        (order // top_k).astype(jnp.int32))
    sel_pos = jnp.zeros((S,), jnp.int32).at[order].set(pos_sorted)
    pend = jnp.cumsum(padded)
    block_eid = jnp.searchsorted(
        pend, jnp.arange(Mp // m_tile, dtype=jnp.int32) * m_tile,
        side="right")
    return gather_row, sel_pos, jnp.minimum(block_eid, E - 1).astype(
        jnp.int32)


def moe_mlp_grouped(entry: Dict[str, Any], x2: Array, topi: Array,
                    topw: Array, act_fn: str, m_tile: int = 128,
                    interpret: bool = False) -> Array:
    """MoE MLP via the capacity-grouped batch kernel: (n, H) tokens +
    (n, top_k) routing -> (n, H) combined expert outputs.

    The BATCH-regime MoE path (r5): gathers each selection's token row
    into expert-sorted m_tile segments, runs gate/up/down as THREE
    grouped kernel calls over only the selected experts' weights
    (top_k/E of the dense stacked kernel's MXU passes, ~one full weight
    read per live expert), and unsorts + router-weights the result.
    The intermediate is (top_k*n, I) instead of the dense path's
    (E, n, I).  Requires stacked_planes entries (gate/up/down)."""
    from ..ops.pallas_matmul import (quantize_act_per_token,
                                     w4a8_grouped_matmul)

    gp, up, dp = entry["mlp.gate"], entry["mlp.up"], entry["mlp.down"]
    E = gp.codes.shape[0]
    n, H = x2.shape
    top_k = topi.shape[1]
    gather_row, sel_pos, block_eid = moe_group_selections(
        topi, E, m_tile)
    # quantize each token ONCE (n rows), then gather int8 rows into the
    # grouped layout — identical numerics to quantizing the gathered
    # copies (same row -> same amax/scale) at 1/top_k the quantize work
    # and half the gather bytes; the dummy pad row is zeros/scale-1
    xq_t, xs_t = quantize_act_per_token(x2)
    xq = jnp.concatenate([xq_t, jnp.zeros((1, H), jnp.int8)],
                         axis=0)[gather_row]
    xs = jnp.concatenate([xs_t, jnp.ones((1, 1), jnp.float32)],
                         axis=0)[gather_row]
    g = w4a8_grouped_matmul(xq, xs, gp.codes, gp.scales, block_eid,
                            group=gp.group_size, m_tile=m_tile,
                            interpret=interpret)
    u = w4a8_grouped_matmul(xq, xs, up.codes, up.scales, block_eid,
                            group=up.group_size, m_tile=m_tile,
                            interpret=interpret)
    mid = A._act(g, act_fn) * u
    if getattr(dp, "layout", "") == "stacked_planes":
        mq, ms = quantize_act_per_token(mid.astype(jnp.bfloat16))
        d = w4a8_grouped_matmul(mq, ms, dp.codes, dp.scales, block_eid,
                                group=dp.group_size, m_tile=m_tile,
                                interpret=interpret)
    else:
        # int8 per-channel stacked down (the planes-ineligible V2/
        # V2-Lite shape class): the input is already in grouped layout,
        # so the int8 grouped kernel serves it (weights stream once per
        # live expert — no packing constraint on ic).  CPU fallback: a
        # block-gathered dequant einsum (bf16 dots; XLA int8 dots at
        # small M are pathological).
        assert dp.bits == 8 and dp.layout == "stacked"
        if interpret or jax.default_backend() != "cpu":
            from ..ops.pallas_matmul import w8a8_grouped_matmul

            mq, ms = quantize_act_per_token(mid.astype(jnp.bfloat16))
            d = w8a8_grouped_matmul(mq, ms, dp.codes, dp.scales,
                                    block_eid, m_tile=m_tile,
                                    interpret=interpret)
        else:
            n_mb = block_eid.shape[0]
            midb = mid.astype(jnp.bfloat16).reshape(n_mb, m_tile, -1)
            w8 = dp.codes[block_eid]                  # (n_mb, H, I)
            d = jnp.einsum("bmi,boi->bmo", midb,
                           w8.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            d = (d * dp.scales[block_eid].reshape(n_mb, 1, H)
                 ).reshape(n_mb * m_tile, H)
    y_sel = d[sel_pos].reshape(n, top_k, H)
    return jnp.einsum("nkh,nk->nh", y_sel, topw)


def build_serving_weights(
    model: BaseModel,
    wspec: QuantSpec,
    algo=None,
    act_bits: int = 16,
    layout: Optional[str] = None,
    fused_rms: bool = False,
    fuse_qkv: bool = False,
    scale_layout: str = "split",
    head_bits: int = 8,
) -> ServingWeights:
    """Quantize every block linear for serving.  If ``algo`` is given, its
    searched static qparams (GPTQ/TesseraQ/clip) are honored by quantizing
    the algorithm's w_qdq output losslessly re-coded; otherwise direct RTN
    real-quant of the (transformed) weights.

    ``fused_rms`` folds each pre-norm RMSNorm gamma into its consumer
    linears BEFORE quantization (exact) and stores ones as the ln weights,
    enabling the fully-fused decode kernel (norm+quant in-kernel).

    ``fuse_qkv`` concatenates q/k/v (and gate/up) along output channels
    into single ``attn.qkv`` / ``mlp.gateup`` entries — 4 kernel launches
    per block instead of 7, and the small k/v reads ride the big
    launch's DMA stream (bench BENCH_FUSED=1: 3333 vs 3224 tok/s).
    Numerically exact vs separate (per-group quant is per output row).
    Best for single-chip / dp-replica serving; with tp>1 prefer separate
    weights (a merged oc-split puts the q|k|v boundary mid-shard)."""
    arch = model.arch
    params = model.params
    # rmsnorm-family check mirrors arch.apply_norm's dispatch (arch.py:338)
    # MLA/MoE blocks hang extra consumers off ln1/ln2 (q_a/kv_a; router +
    # every expert) that the fold tables don't cover — folding there would
    # zero the gamma for consumers that never absorbed it
    fold = fused_rms and (arch.family == "llama"
                          or getattr(arch, "norm_type", "") == "rmsnorm") \
        and arch.mla is None and arch.moe is None
    blocks_out = []
    for idx in range(model.num_blocks):
        bp = params["blocks"][idx]
        entry: Dict[str, Any] = {}
        g1 = resolve(bp, "ln1").get("weight") if fold else None
        g2 = resolve(bp, "ln2").get("weight") if fold else None
        pend: Dict[str, Any] = {}
        for name in model.get_block_linear_names(idx):
            if name == "mlp.router":
                # the router gate stays bf16 (the reference never
                # quantizes gate/e_score bias either)
                continue
            node = resolve(bp, name)
            w = node["weight"]
            if algo is not None:
                w = algo.w_qdq(w, idx, name)
            if fold and name in _LN1_LINEARS and g1 is not None:
                w = w * g1[None, :].astype(w.dtype)
            elif fold and name in _LN2_LINEARS and g2 is not None:
                w = w * g2[None, :].astype(w.dtype)
            pend[name] = (w, node.get("bias"))

        def _emit(name, w, bias):
            if w.ndim == 3:  # stacked MoE experts
                entry[name] = quantize_linear_stacked(w, wspec)
                return
            entry[name] = quantize_linear(
                w.astype(jnp.float32), wspec, bias=bias,
                layout=layout or ("planes" if wspec.bit == 4 else "rows"),
                scale_layout=scale_layout,
            )

        def _fuse(new_name, names):
            ws, bs = zip(*(pend.pop(n) for n in names))
            bias = None
            if any(b is not None for b in bs):
                bias = jnp.concatenate([
                    b if b is not None else jnp.zeros((w.shape[0],),
                                                      ws[0].dtype)
                    for w, b in zip(ws, bs)
                ])
            _emit(new_name, jnp.concatenate(ws, axis=0), bias)

        if fuse_qkv and all(f"attn.{n}" in pend for n in ("q", "k", "v")):
            _fuse("attn.qkv", ("attn.q", "attn.k", "attn.v"))
        if fuse_qkv and "mlp.gate" in pend and "mlp.up" in pend \
                and pend["mlp.gate"][0].ndim == 2:
            _fuse("mlp.gateup", ("mlp.gate", "mlp.up"))
        for name, (w, bias) in pend.items():
            _emit(name, w, bias)
        for ln in ("ln1", "ln2"):
            lnp = {k: v for k, v in resolve(bp, ln).items()}
            if fold and "weight" in lnp:
                lnp["weight"] = jnp.ones_like(lnp["weight"])
            entry[ln] = lnp
        if arch.qk_norm:
            entry["q_norm"] = dict(bp["attn"]["q_norm"])
            entry["k_norm"] = dict(bp["attn"]["k_norm"])
        if arch.mla is not None:
            mla = arch.mla
            ap = bp["attn"]
            if "q_a_norm" in ap:
                entry["q_a_norm"] = dict(ap["q_a_norm"])
            entry["kv_a_norm"] = dict(ap["kv_a_norm"])
            # absorbed decode weights, materialized from the QUANTIZED
            # kv_b so decode numerics == prefill numerics:
            #   scores: q_pass·(W_kc c) == (q_pass W_kc)·c
            #   values: ctx = W_vc (sum_t p_t c_t)
            # cache then holds only the (r + rope_d)-dim latent per token
            from ..ops.qlinear import dequant_weight

            nh = arch.num_heads
            kvb = dequant_weight(entry["attn.kv_b"]).reshape(
                nh, mla.qk_nope_head_dim + mla.v_head_dim,
                mla.kv_lora_rank)
            entry["attn.w_kc"] = kvb[:, :mla.qk_nope_head_dim, :]
            entry["attn.w_vc"] = kvb[:, mla.qk_nope_head_dim:, :] \
                .transpose(0, 2, 1)  # (nh, r, v_dim)
        if arch.moe is not None and "router" in bp.get("mlp", {}):
            mp = bp["mlp"]
            entry["mlp.router"] = {
                "weight": mp["router"]["weight"].astype(jnp.bfloat16)}
            if "router_bias" in mp:
                entry["mlp.router_bias"] = mp["router_bias"]
        blocks_out.append(entry)
    head_w = (params["embed"]["weight"] if arch.tie_word_embeddings
              else params["lm_head"]["weight"])
    head_scale = None
    if head_bits == 8:
        # int8 per-channel head: the (vocab, hidden) read is the single
        # largest engine-vs-bare-loop gap term (~1.05 GB bf16 at 128k
        # vocab = ~1.3 ms/decode step); int8 halves it and the codes
        # stream as bf16 einsum operands (head_logits) — XLA int8 dots
        # at small M are pathological (int4_xla_experiments r3)
        hw = head_w.astype(jnp.float32)
        amax = jnp.clip(jnp.max(jnp.abs(hw), axis=1), 1e-6, None)
        head_scale = (amax / 127.0).astype(jnp.float32)
        head_w = jnp.clip(jnp.round(hw / head_scale[:, None]),
                          -127, 127).astype(jnp.int8)
    else:
        head_w = head_w.astype(jnp.bfloat16)
    return ServingWeights(
        arch=arch,
        embed=params["embed"]["weight"].astype(jnp.bfloat16),
        embed_pos=(
            params["embed_pos"]["weight"].astype(jnp.bfloat16)
            if "embed_pos" in params else None
        ),
        norm={k: v for k, v in params["norm"].items()},
        lm_head=head_w,
        lm_head_scale=head_scale,
        blocks=blocks_out,
        wbits=wspec.bit if isinstance(wspec.bit, int) else 8,
        act_bits=act_bits,
        fused_rms=fold,
    )


def head_logits(sw: "ServingWeights", xl: Array) -> Array:
    """lm_head matmul with the optional int8 per-channel head dequant
    FUSED into the einsum read (codes stream as bf16 MXU operands, the
    KV-cache pattern): logits (..., vocab) f32."""
    logits = jnp.einsum(
        "...h,vh->...v", xl.astype(jnp.bfloat16),
        sw.lm_head.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    if sw.lm_head_scale is not None:
        logits = logits * sw.lm_head_scale.astype(jnp.float32)
    return logits


def apply_qlinear(entry: Any, x: Array, act_bits: int = 16) -> Array:
    """Dispatch by stored weight format."""
    if isinstance(entry, QLinearParams):
        if entry.bits == 4:
            return qlinear_apply(x, entry, act_bits=act_bits)
        if entry.bits == 8 and not entry.is_float:
            return int8_matmul_dynamic(
                x, entry.codes, entry.scales, bias=entry.bias
            )
        from ..ops.qlinear import qlinear_xla

        return qlinear_xla(x, entry)
    w = entry["weight"]
    return A.default_linear("", w, entry.get("bias"), x)
