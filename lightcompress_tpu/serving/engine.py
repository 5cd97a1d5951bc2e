"""TPU serving engine: continuous batching over quantized weights + KV.

The in-repo replacement for the external serving engines the reference
exports to (vLLM/SGLang/LightLLM, SURVEY §7).  Slot-based continuous
batching: a fixed number of sequence slots share one jitted batched decode
step (compiled once); prefill compiles per length bucket.  New requests are
admitted into free slots between steps; finished sequences retire
immediately — no static batch barrier.

Weights: W4 plane-packed (Pallas fused kernel) / W8 int8 (MXU) / bf16.
KV: int8-quantized slot cache (serving/kv_cache.py).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import arch as A
from .kv_cache import (KVCache, PagedKVCache, PageAllocator,
                       flush_ring_to_cache, append_kv,
                       append_kv_quantized, append_mla, paged_append_decode,
                       paged_append_prefill, paged_read, quantize_kv,
                       read_kv, read_kv_slot, read_mla)
from .quantized_model import (ServingWeights, apply_qlinear,
                              apply_qlinear_gathered,
                              apply_qlinear_stacked, head_logits)
from .sampler import SamplingParams, sample

Array = jax.Array


def _qkv_proj(entry, h1, nh, nkv, hd, ab):
    """q/k/v projections, via the merged attn.qkv weight when present
    (build_serving_weights fuse_qkv: 1 launch instead of 3)."""
    if "attn.qkv" in entry:
        qkv = apply_qlinear(entry["attn.qkv"], h1, act_bits=ab)
        nq, nk = nh * hd, nkv * hd
        return qkv[..., :nq], qkv[..., nq:nq + nk], qkv[..., nq + nk:]
    return (apply_qlinear(entry["attn.q"], h1, act_bits=ab),
            apply_qlinear(entry["attn.k"], h1, act_bits=ab),
            apply_qlinear(entry["attn.v"], h1, act_bits=ab))


def _gateup_proj(entry, h2, ab):
    if "mlp.gateup" in entry:
        gu = apply_qlinear(entry["mlp.gateup"], h2, act_bits=ab)
        inter = gu.shape[-1] // 2
        return gu[..., :inter], gu[..., inter:]
    return (apply_qlinear(entry["mlp.gate"], h2, act_bits=ab),
            apply_qlinear(entry["mlp.up"], h2, act_bits=ab))


def _moe_mlp(sw: "ServingWeights", entry, h2: Array, ab: int) -> Array:
    """Serving MoE MLP on (S, T, H): dense-compute over stacked quantized
    experts + router-weighted combine.  At serving batch sizes nearly every
    expert is touched per step (S*top_k selections over E experts), so the
    dense all-expert weight read is the roofline-honest layout; EP shards
    the stacked dim 0 (serving/sharding.py) and GSPMD turns the combine
    into a psum over ``ep``.  Routing math is the shared ``A.moe_route``
    (identical to calibration — deepseekv3.py:380-420 router parity)."""
    arch = sw.arch
    m = arch.moe
    Bs, T, H = h2.shape
    x2 = h2.reshape(-1, H)
    logits = jnp.einsum(
        "nh,eh->ne", x2.astype(jnp.bfloat16),
        entry["mlp.router"]["weight"].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)
    topi, topw = A.moe_route(m, logits.astype(jnp.float32),
                             entry.get("mlp.router_bias"))
    n = x2.shape[0]
    import os as _os

    gather_thresh = int(_os.environ.get(
        "LCTPU_MOE_GATHER_MAX",
        str(max(1, m.num_experts // max(1, m.top_k)))))
    from ..ops.qlinear import QLinearParams as _QLP
    gp = entry["mlp.gate"]
    # r5 session-2 (salted protocol, tools/r5logs/moe_layer2_thresh.log):
    # the scalar-prefetch gathered kernel is ~17 us/selection linear, the
    # dense stacked kernel ~1.1-1.4 ms flat at decode n — honest
    # crossover at n_sel ~= E (pgather 0.90 vs dense 1.13 ms at n_sel=48;
    # 1.65 vs 1.14 at 96).  The earlier "~1.1 ms/selection fixed cost /
    # under-half-traffic-only" figure was a dedup/load measurement
    # artifact (REPORT session-2 addendum).
    planes_gather = (isinstance(gp, _QLP)
                     and gp.layout == "stacked_planes"
                     and jax.default_backend() != "cpu"
                     and n * m.top_k <= m.num_experts)
    if n <= gather_thresh and not getattr(sw, "sharded", False) \
            and planes_gather:
        # scalar-prefetch gathered KERNEL (VERDICT r4 #5): only the
        # selected experts' packed tiles DMA from HBM — n*top_k/E of
        # the dense kernel's weight traffic AND MXU array-fill passes
        # (the dense stacked kernel is fill-bound at small M; the XLA
        # gathered unpack materializes per-selection copies, r4 probe)
        from ..ops.pallas_matmul import (quantize_act_per_token,
                                         w4a8_gathered_matmul)

        n_sel = n * m.top_k
        e_flat = topi.reshape(-1).astype(jnp.int32)
        t_flat = jnp.repeat(jnp.arange(n, dtype=jnp.int32), m.top_k)
        xq, xs = quantize_act_per_token(x2)
        g = w4a8_gathered_matmul(xq, xs, gp.codes, gp.scales, e_flat,
                                 t_flat, group=gp.group_size)
        upp = entry["mlp.up"]
        u = w4a8_gathered_matmul(xq, xs, upp.codes, upp.scales, e_flat,
                                 t_flat, group=upp.group_size)
        midk = A._act(g, arch.act_fn) * u                  # (n_sel, I)
        mq, ms = quantize_act_per_token(midk.astype(jnp.bfloat16))
        dp = entry["mlp.down"]
        d = w4a8_gathered_matmul(
            mq, ms, dp.codes, dp.scales, e_flat,
            jnp.arange(n_sel, dtype=jnp.int32), group=dp.group_size)
        y = jnp.einsum("nkh,nk->nh", d.reshape(n, m.top_k, H), topw)
    elif n <= gather_thresh and not getattr(sw, "sharded", False):
        # small-batch gathered path: read only the selected experts'
        # weights (n*top_k slabs) instead of all E — wins below
        # ~E/top_k active tokens (latency-sensitive serving); the dense
        # path stays the roofline-honest layout at batch and under EP
        # sharding (the gather would break the ep PartitionSpec)
        y = jnp.zeros((n, H), jnp.float32)
        for k in range(m.top_k):
            e = topi[:, k]
            gk = apply_qlinear_gathered(entry["mlp.gate"], x2, e)
            uk = apply_qlinear_gathered(entry["mlp.up"], x2, e)
            midk = A._act(gk, arch.act_fn) * uk
            dk = apply_qlinear_gathered(entry["mlp.down"],
                                        midk.astype(jnp.bfloat16), e)
            y = y + topw[:, k:k + 1] * dk
    elif (all(isinstance(entry.get(nm), _QLP)
              and entry[nm].layout == "stacked_planes"
              for nm in ("mlp.gate", "mlp.up"))
          and isinstance(entry.get("mlp.down"), _QLP)
          and (entry["mlp.down"].layout == "stacked_planes"
               or (entry["mlp.down"].bits == 8
                   and entry["mlp.down"].layout == "stacked"))
          and not getattr(sw, "sharded", False)
          and (ge := _os.environ.get("LCTPU_MOE_GROUPED", "auto")) != "0"
          and (ge in ("1", "interpret")
               or (ge == "auto" and jax.default_backend() != "cpu"
                   and n >= int(_os.environ.get(
                       "LCTPU_MOE_GROUPED_MIN", "257"))))):
        # BATCH-regime capacity-grouped kernel (r5): selections sorted
        # by expert into m_tile segments -> top_k/E of the dense stacked
        # kernel's MXU passes and ~one weight read per live expert.
        # Engages exactly where the stacked kernel's n<=256 VMEM bound
        # hands dense off to the pathological XLA dequant path — salted
        # on-chip numbers (tools/r5logs/moe_layer2.log, E=64 I=2048
        # H=4096 top_k=6): grouped 5.9/11.3/32.7 ms/layer at
        # n=512/2048/8192 vs dense-XLA 122.9/142.2/473.5 (13-21x);
        # engine prefill 129.9 -> 8.9 ms/layer (moe_prefill_probe).
        # Dropless-exact; parity-tested vs dense (test_serving_moe_mla).
        from .quantized_model import moe_mlp_grouped
        y = moe_mlp_grouped(entry, x2, topi, topw, arch.act_fn,
                            interpret=(ge == "interpret"))
    else:
        def _dense_block(xb, wb):
            """Dense all-expert compute on one token block: bounds the
            (E, n_blk, I) f32 transients — at batched prefill n can be
            S*T tokens and the unchunked form is (E, n, I) f32
            (~17 GB at 32k tokens, E=64, I=2048)."""
            g = apply_qlinear_stacked(entry["mlp.gate"], xb)
            u = apply_qlinear_stacked(entry["mlp.up"], xb)
            mid = A._act(g, arch.act_fn) * u
            d = apply_qlinear_stacked(entry["mlp.down"],
                                      mid.astype(jnp.bfloat16),
                                      pair=True)           # (E, nb, H)
            return jnp.einsum("enh,ne->nh", d, wb)

        w_full = jnp.zeros((n, m.num_experts), jnp.float32)
        w_full = w_full.at[jnp.arange(n)[:, None], topi].set(topw)
        NB = int(_os.environ.get("LCTPU_MOE_DENSE_BLOCK", "2048"))
        if n > NB and n % NB == 0:
            xb = x2.reshape(n // NB, NB, H)
            wb = w_full.reshape(n // NB, NB, m.num_experts)
            y = jax.lax.map(
                lambda args: _dense_block(*args), (xb, wb)
            ).reshape(n, H)
        else:
            y = _dense_block(x2, w_full)
    if "mlp.shared_gate" in entry:
        sg = apply_qlinear(entry["mlp.shared_gate"], x2, act_bits=ab)
        su = apply_qlinear(entry["mlp.shared_up"], x2, act_bits=ab)
        smid = A._act(sg, arch.act_fn) * su
        y = y + apply_qlinear(entry["mlp.shared_down"],
                              smid.astype(h2.dtype), act_bits=ab)
    return y.reshape(Bs, T, H).astype(h2.dtype)


def _mlp_tail_serving(sw: "ServingWeights", entry, h: Array,
                      ab: int) -> Array:
    """Post-attention MLP tail with MoE dispatch (norm + residual)."""
    arch = sw.arch
    h2 = A.apply_norm(h, entry["ln2"], arch)
    if "mlp.router" in entry:
        return h + _moe_mlp(sw, entry, h2, ab)
    if arch.family == "llama":
        g, u = _gateup_proj(entry, h2, ab)
        mid = A._act(g, arch.act_fn) * u
        return h + apply_qlinear(entry["mlp.down"], mid, act_bits=ab)
    f1 = apply_qlinear(entry["mlp.fc1"], h2, act_bits=ab)
    return h + apply_qlinear(entry["mlp.fc2"], A._act(f1, arch.act_fn),
                             act_bits=ab)


def _mla_qc(sw: "ServingWeights", entry, h1: Array, ab: int):
    """MLA q + compressed-latent projections shared by prefill/decode:
    returns (q_states (.., nh*qk_d), c_n normalized latent (.., r),
    k_rot raw rope sub-vector (.., rope_d))."""
    arch = sw.arch
    mla = arch.mla
    if "attn.q_a" in entry:
        qa = apply_qlinear(entry["attn.q_a"], h1, act_bits=ab)
        qa = A.rmsnorm(qa, entry["q_a_norm"]["weight"], arch.rms_eps)
        q = apply_qlinear(entry["attn.q_b"], qa, act_bits=ab)
    else:
        q = apply_qlinear(entry["attn.q"], h1, act_bits=ab)
    ckv = apply_qlinear(entry["attn.kv_a"], h1, act_bits=ab)
    c = ckv[..., :mla.kv_lora_rank]
    k_rot = ckv[..., mla.kv_lora_rank:]
    c_n = A.rmsnorm(c, entry["kv_a_norm"]["weight"], arch.rms_eps)
    return q, c_n, k_rot


def _block_apply_mla_prefill(sw: "ServingWeights", entry, x: Array,
                             cos, sin, mask):
    """MLA prefill block on (1, T, H): exact full attention (materialized
    per-head k/v via kv_b — prefill is compute-bound, absorption buys
    nothing there), returns (y, c_n (1,T,r), k_rot_roped (1,T,rope_d)) so
    the caller writes the compressed latents into the cache."""
    arch = sw.arch
    mla = arch.mla
    ab = getattr(sw, "act_bits", 16)
    B, T, _ = x.shape
    nh = arch.num_heads
    nope, rope_d = mla.qk_nope_head_dim, mla.qk_rope_head_dim
    h1 = A.apply_norm(x, entry["ln1"], arch)
    q, c_n, k_rot = _mla_qc(sw, entry, h1, ab)
    q = q.reshape(B, T, nh, mla.qk_head_dim).transpose(0, 2, 1, 3)
    q_pass, q_rot = q[..., :nope], q[..., nope:]
    k_rot = k_rot.reshape(B, 1, T, rope_d)
    ropefn = (A.apply_rope_interleave if mla.rope_interleave
              else A.apply_rope)
    q_rot, k_rot = ropefn(q_rot, k_rot, cos, sin)
    kv = apply_qlinear(entry["attn.kv_b"], c_n, act_bits=ab)
    kv = kv.reshape(B, T, nh, nope + mla.v_head_dim).transpose(0, 2, 1, 3)
    k_pass, v = kv[..., :nope], kv[..., nope:]
    qq = jnp.concatenate([q_pass, q_rot], axis=-1)
    kk = jnp.concatenate(
        [k_pass, jnp.broadcast_to(k_rot, (B, nh, T, rope_d))], axis=-1)
    ctx = A.sdpa(qq.astype(x.dtype), kk.astype(x.dtype), v.astype(x.dtype),
                 mask, kv_groups=1, query_scale=mla.qk_head_dim ** -0.5)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, nh * mla.v_head_dim)
    h = x + apply_qlinear(entry["attn.o"], ctx.astype(x.dtype), act_bits=ab)
    y = _mlp_tail_serving(sw, entry, h, ab)
    return y, c_n, k_rot[:, 0]


def _block_apply_mla_decode(sw: "ServingWeights", entry, x: Array,
                            cos, sin, cache: KVCache, li: int,
                            lengths: Array):
    """MLA decode block over the compressed latent cache, absorbed form:

        scores[h,t] = (q_pass[h] W_kc[h]) . c_t  +  q_rot[h] . k_rot_t
        ctx[h]      = W_vc[h] (sum_t p[h,t] c_t)

    Per-token cache traffic is r + rope_d values (int8) instead of
    nh*(nope+v_dim) — the MLA serving win.  The fresh token participates
    through its QUANTIZED latent so live numerics match the cache."""
    arch = sw.arch
    mla = arch.mla
    ab = getattr(sw, "act_bits", 16)
    S = x.shape[0]
    nh = arch.num_heads
    nope, rope_d = mla.qk_nope_head_dim, mla.qk_rope_head_dim
    vd = mla.v_head_dim
    h1 = A.apply_norm(x, entry["ln1"], arch)
    q, c_n, k_rot = _mla_qc(sw, entry, h1, ab)
    q = q.reshape(S, 1, nh, mla.qk_head_dim).transpose(0, 2, 1, 3)
    q_pass, q_rot = q[..., :nope], q[..., nope:]          # (S, nh, 1, .)
    k_rot4 = k_rot.reshape(S, 1, 1, rope_d)
    ropefn = (A.apply_rope_interleave if mla.rope_interleave
              else A.apply_rope)
    q_rot, k_rot4 = ropefn(q_rot, k_rot4, cos, sin)
    r_new = k_rot4[:, 0]                                  # (S, 1, rope_d)
    # fresh-token latents at cache numerics
    if cache.bits == 8:
        cq_n, cs_n = quantize_kv(c_n)
        c_f = cq_n.astype(jnp.float32) * \
            cs_n[..., None].astype(jnp.float32)           # (S, 1, r)
        rq_n, rs_n = quantize_kv(r_new)
        r_f = rq_n.astype(jnp.float32) * \
            rs_n[..., None].astype(jnp.float32)
    else:
        c_f, r_f = c_n.astype(jnp.float32), r_new.astype(jnp.float32)
    w_kc = entry["attn.w_kc"].astype(jnp.float32)         # (nh, nope, r)
    w_vc = entry["attn.w_vc"].astype(jnp.float32)         # (nh, r, vd)
    q_eff = jnp.einsum("shd,hdr->shr",
                       q_pass[:, :, 0, :].astype(jnp.float32), w_kc)
    cC, rR = read_mla(cache, li)                          # (S,T,r),(S,T,d)
    Tmax = cC.shape[1]
    scale = mla.qk_head_dim ** -0.5
    sc = jnp.einsum("shr,str->sht", q_eff, cC.astype(jnp.float32))
    sc = sc + jnp.einsum("shd,std->sht",
                         q_rot[:, :, 0, :].astype(jnp.float32),
                         rR.astype(jnp.float32))
    sc = sc * scale
    valid = jnp.arange(Tmax)[None, None, :] < lengths[:, None, None]
    sc = jnp.where(valid, sc, -jnp.inf)
    sc_new = (jnp.einsum("shr,sr->sh", q_eff, c_f[:, 0])
              + jnp.einsum("shd,sd->sh",
                           q_rot[:, :, 0, :].astype(jnp.float32),
                           r_f[:, 0])) * scale
    allsc = jnp.concatenate([sc, sc_new[..., None]], axis=-1)
    probs = jax.nn.softmax(allsc, axis=-1)                # (S, nh, T+1)
    ctx_lat = jnp.einsum("sht,str->shr", probs[..., :Tmax],
                         cC.astype(jnp.float32))
    ctx_lat = ctx_lat + probs[..., Tmax][..., None] * c_f[:, None, 0, :]
    ctx = jnp.einsum("shr,hrv->shv", ctx_lat, w_vc)
    ctx = ctx.reshape(S, 1, nh * vd)
    h = x + apply_qlinear(entry["attn.o"], ctx.astype(x.dtype), act_bits=ab)
    y = _mlp_tail_serving(sw, entry, h, ab)
    return y, c_n, r_new


def _block_apply_mla_decode_a(sw: "ServingWeights", entry, x: Array,
                              cos, sin, cache: KVCache, li: int,
                              lengths: Array):
    """APPEND-FIRST MLA decode (VERDICT r4 #3 — the dense xla8a lesson
    applied to the compressed-latent cache): quantize the fresh latent
    once, write it into the cache via the per-slot dus loop, then run ONE
    masked absorbed-matmul softmax over the full T_max latent buffer with
    the int8 dequant FUSED into the einsum reads.  The read_mla path
    materialized a bf16 copy of the whole (S, T, r) latent every layer —
    the same per-layer cache copy the dense engine deleted for +124%.
    Topology parity: /root/reference/llmc/models/deepseekv3.py:84-126."""
    from .kv_cache import append_mla_quantized

    arch = sw.arch
    mla = arch.mla
    ab = getattr(sw, "act_bits", 16)
    S = x.shape[0]
    nh = arch.num_heads
    nope, rope_d = mla.qk_nope_head_dim, mla.qk_rope_head_dim
    vd = mla.v_head_dim
    h1 = A.apply_norm(x, entry["ln1"], arch)
    q, c_n, k_rot = _mla_qc(sw, entry, h1, ab)
    q = q.reshape(S, 1, nh, mla.qk_head_dim).transpose(0, 2, 1, 3)
    q_pass, q_rot = q[..., :nope], q[..., nope:]          # (S, nh, 1, .)
    k_rot4 = k_rot.reshape(S, 1, 1, rope_d)
    ropefn = (A.apply_rope_interleave if mla.rope_interleave
              else A.apply_rope)
    q_rot, k_rot4 = ropefn(q_rot, k_rot4, cos, sin)
    cq, cs_n = quantize_kv(c_n)                           # (S,1,r),(S,1)
    rq, rs_n = quantize_kv(k_rot4[:, 0])
    cache = append_mla_quantized(cache, li, cq, cs_n, rq, rs_n, lengths)
    w_kc = entry["attn.w_kc"].astype(jnp.float32)         # (nh, nope, r)
    w_vc = entry["attn.w_vc"].astype(jnp.float32)         # (nh, r, vd)
    q_eff = jnp.einsum("shd,hdr->shr",
                       q_pass[:, :, 0, :].astype(jnp.float32), w_kc)
    cC, csc = cache.k[li], cache.k_scale[li]   # (S,T,r) int8, (S,T)
    rR, rsc = cache.v[li], cache.v_scale[li]
    Tmax = cC.shape[1]
    scale = mla.qk_head_dim ** -0.5
    # per-token scales multiply OUTSIDE each dot (scale depends on t
    # only), so the int8 codes stream straight into bf16 MXU dots
    sc = jnp.einsum("shr,str->sht", q_eff.astype(jnp.bfloat16),
                    cC.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) \
        * csc[:, None, :].astype(jnp.float32)
    sc = sc + jnp.einsum("shd,std->sht",
                         q_rot[:, :, 0, :].astype(jnp.bfloat16),
                         rR.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) \
        * rsc[:, None, :].astype(jnp.float32)
    sc = sc * scale
    col = jnp.arange(Tmax)[None, None, :]
    sc = jnp.where(col <= lengths[:, None, None], sc, -jnp.inf)
    probs = jax.nn.softmax(sc, axis=-1)                   # (S, nh, T)
    pv = (probs * csc[:, None, :].astype(jnp.float32)
          ).astype(jnp.bfloat16)
    ctx_lat = jnp.einsum("sht,str->shr", pv, cC.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    ctx = jnp.einsum("shr,hrv->shv", ctx_lat, w_vc)
    ctx = ctx.reshape(S, 1, nh * vd)
    h = x + apply_qlinear(entry["attn.o"], ctx.astype(x.dtype), act_bits=ab)
    y = _mlp_tail_serving(sw, entry, h, ab)
    return y, cache


def _block_apply_decode_i8(
    sw: ServingWeights, entry: Dict[str, Any], x: Array, cos, sin,
    cache: KVCache, li: int, lengths: Array, interpret: bool = False,
    impl: str = "i8", ring: Optional[Dict[str, Array]] = None,
    lengths0: Optional[Array] = None, ring_pos=None,
):
    """Decode-only block over the int8 slot cache via the Pallas int8-MXU
    attention kernel (ops/pallas_attention.decode_attention_i8): the cache
    slab streams as contiguous multi-MB int8 DMA blocks, the fresh token is
    an in-register extra softmax column (no cache concat/copy), and slot
    lengths gate the columns in-kernel.  Returns
    (y, kq, ks, vq, vs) so the caller writes the already-quantized token
    into the cache without re-quantizing."""
    from ..ops.pallas_attention import decode_attention_i8
    from ..ops.qlinear import QLinearParams

    arch = sw.arch
    ab = getattr(sw, "act_bits", 16)
    S = x.shape[0]
    nh, nkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim

    def fused_ok(e):
        """Fully-fused decode linear available?  (pre-tiled serving layout
        + gamma folded into the weights at build time.)"""
        if not (getattr(sw, "fused_rms", False)
                and isinstance(e, QLinearParams) and e.bits == 4
                and e.zeros is not None and ab == 8):
            return False
        lay = getattr(e, "layout", "")
        return ((lay == "s4" and e.codes.ndim == 3)
                or (lay == "planes" and e.codes.ndim == 4))

    def flin(e, h2d, with_rms):
        from ..ops.pallas_matmul import (w4a8_linear_bytes_fused,
                                         w4a8_linear_planes_fused)

        fused = (w4a8_linear_bytes_fused if e.layout == "s4"
                 else w4a8_linear_planes_fused)
        y = fused(
            h2d, e.codes, e.scales, e.zeros, group=e.group_size,
            rms=with_rms, eps=arch.rms_eps, interpret=interpret)
        if e.bias is not None:
            y = y + e.bias
        return y

    x2 = x[:, 0, :]  # (S, H) — decode is single-token
    if "attn.qkv" in entry and fused_ok(entry["attn.qkv"]):
        qkv = flin(entry["attn.qkv"], x2, True)[:, None, :]
        nq, nk = nh * hd, nkv * hd
        q, k, v = (qkv[..., :nq], qkv[..., nq:nq + nk],
                   qkv[..., nq + nk:])
    elif "attn.qkv" not in entry and all(
            fused_ok(entry[n]) for n in ("attn.q", "attn.k", "attn.v")):
        q = flin(entry["attn.q"], x2, True)[:, None, :]
        k = flin(entry["attn.k"], x2, True)[:, None, :]
        v = flin(entry["attn.v"], x2, True)[:, None, :]
    else:
        h1 = A.apply_norm(x, entry["ln1"], arch)
        q, k, v = _qkv_proj(entry, h1, nh, nkv, hd, ab)
    q = q.reshape(S, 1, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(S, 1, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(S, 1, nkv, hd).transpose(0, 2, 1, 3)
    if arch.qk_norm:
        q = A.rmsnorm(q, entry["q_norm"]["weight"], arch.rms_eps)
        k = A.rmsnorm(k, entry["k_norm"]["weight"], arch.rms_eps)
    if cos is not None:
        q, k = A.apply_rope(q, k, cos, sin)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    if impl == "bd4":
        # cache payload is the nibble-packed codes; the int8 fresh token
        # still drives the flash merge (finer, like the bench bd4 path)
        from .kv_cache import quantize_kv4

        k4, k4s = quantize_kv4(k)
        v4, v4s = quantize_kv4(v)
        payload = (k4, k4s, v4, v4s)
    else:
        payload = (kq, ks, vq, vs)
    # q head h attends kv head h // groups -> (S, nkv, G, hd) grouping
    qg = q[:, :, 0, :].reshape(S, nkv, nh // nkv, hd)
    if impl in ("bd", "bds", "bd4"):
        # block-diagonal kernels over the feature-major/time-major slabs;
        # "bds" = S-split flash grid (long-context winner: keeps the
        # score/softmax intermediates in VMEM while the XLA einsum path
        # materializes them — REPORT r3 c4096 1655 vs 1334 tok/s);
        # "bd4" = nibble-packed cache (half the KV bytes; the only config
        # that fits 8k ctx at B=32 and the fastest at >=4k)
        from ..ops.pallas_attention import (bd_merge_new_token,
                                            decode_attention_bd,
                                            decode_attention_bd4,
                                            decode_attention_bd_flash)

        if impl == "bd4":
            from ..ops.pallas_attention import decode_attention_bd4_flash

            if cache.k.shape[-1] >= 8192:
                # full-S bd4 slabs exceed the 16MB VMEM budget at 8k+;
                # the flash grid's footprint is context-independent
                qctx = decode_attention_bd4_flash(
                    qg, cache.k[li], cache.k_scale[li], cache.v[li],
                    cache.v_scale[li], lengths=lengths, s_block=512,
                    interpret=interpret)
            else:
                qctx = decode_attention_bd4(
                    qg, cache.k[li], cache.k_scale[li], cache.v[li],
                    cache.v_scale[li], lengths=lengths,
                    interpret=interpret)
        elif impl == "bds":
            qctx = decode_attention_bd_flash(
                qg, cache.k[li], cache.k_scale[li], cache.v[li],
                cache.v_scale[li], lengths=lengths, s_block=512,
                interpret=interpret)
        else:
            qctx = decode_attention_bd(
                qg, cache.k[li], cache.k_scale[li], cache.v[li],
                cache.v_scale[li], lengths=lengths, interpret=interpret)
        ctx = bd_merge_new_token(
            qg, qctx, kq[:, :, 0, :], vq[:, :, 0, :],
            ks[:, :, 0], vs[:, :, 0], hd ** -0.5)
    elif impl == "xla8r":
        # RING-CHUNK attention (VERDICT r4 engine-gap item): within a
        # decode chunk every slot writes its fresh token at the SAME ring
        # column (the fori step index), so the append is 4 full-S dus per
        # LAYER instead of 4 per (slot, layer) — 128 vs 4096 ops/step at
        # 32 slots.  The MAIN cache stays read-only across the whole
        # chunk (XLA prefetches an invariant buffer freely) and is
        # flushed once per chunk (flush_ring_to_cache).  Attention =
        # flash-style merge of the masked main term (cols < chunk-entry
        # length) and the masked ring term (cols <= ring_pos) — same
        # quantized values as xla8a, reassociated softmax.
        # FUSED ring layout (VERDICT r5 engine-gap item): k and v share
        # one (L, S, 2H, W, D) buffer (k = head rows [0, H), v = [H, 2H))
        # and the scales one (L, S, 2H, W) buffer — 2 dus per layer
        # instead of 4; the k/v views are free slices on the read side.
        # DEFERRED mode (impl from _decode_step_ring with defer=True):
        # the ring stays READ-ONLY inside the layer loop — the fresh
        # token is a third in-register flash term and ALL layers' tokens
        # are written in ONE stacked dus per step (2 ops vs 2*L).
        defer = ring_pos is not None and isinstance(ring_pos, tuple)
        if defer:
            ring_pos = ring_pos[0]
            rkl = ring["rkv"][li, :, :kq.shape[1]]
            rvl = ring["rkv"][li, :, kq.shape[1]:]
            rksl = ring["rs"][li, :, :kq.shape[1]]
            rvsl = ring["rs"][li, :, kq.shape[1]:]
        elif "rkv" in ring:
            kv = jnp.concatenate([kq, vq], axis=1)        # (S, 2H, 1, D)
            svals = jnp.concatenate(
                [ks, vs], axis=1).astype(ring["rs"].dtype)  # (S, 2H, 1)
            rkv = jax.lax.dynamic_update_slice(
                ring["rkv"], kv[None], (li, 0, 0, ring_pos, 0))
            rs = jax.lax.dynamic_update_slice(
                ring["rs"], svals[None], (li, 0, 0, ring_pos))
            ring = dict(ring, rkv=rkv, rs=rs)
            H = kq.shape[1]
            rkl, rvl = rkv[li, :, :H], rkv[li, :, H:]
            rksl, rvsl = rs[li, :, :H], rs[li, :, H:]
        else:
            rk = jax.lax.dynamic_update_slice(
                ring["rk"], kq[None], (li, 0, 0, ring_pos, 0))
            rv = jax.lax.dynamic_update_slice(
                ring["rv"], vq[None], (li, 0, 0, ring_pos, 0))
            rks = jax.lax.dynamic_update_slice(
                ring["rks"], ks.astype(ring["rks"].dtype)[None],
                (li, 0, 0, ring_pos))
            rvs = jax.lax.dynamic_update_slice(
                ring["rvs"], vs.astype(ring["rvs"].dtype)[None],
                (li, 0, 0, ring_pos))
            ring = dict(ring, rk=rk, rv=rv, rks=rks, rvs=rvs)
            rkl, rvl = rk[li], rv[li]  # (S, H, W, D) int8
            rksl, rvsl = rks[li], rvs[li]
        qb = qg.astype(jnp.bfloat16)
        kc, vc = cache.k[li], cache.v[li]
        ksc, vsc = cache.k_scale[li], cache.v_scale[li]
        import os as _os

        TB = int(_os.environ.get("LCTPU_MAIN_BLOCK", "0"))
        Tm = kc.shape[2]
        if _os.environ.get("LCTPU_ABLATE_ATTN") == "1":
            # probe-only: skip the main-cache term entirely (ring + fresh
            # token still attend) — isolates the read-only cache stream's
            # cost in the ring step (tools/engine_step_probe.py)
            S_, K_, G_ = qb.shape[0], qb.shape[1], qb.shape[2]
            m1 = jnp.full((S_, K_, G_), -1e30, jnp.float32)
            l1 = jnp.zeros((S_, K_, G_), jnp.float32)
            ctx1 = jnp.zeros((S_, K_, G_, hd), jnp.float32)
        elif TB and Tm > TB and Tm % TB == 0:
            # BLOCKWISE (flash-style) main term: per-block masked
            # score/exp/accumulate keeps the f32 intermediates at
            # (S, H, G, TB) instead of materializing the full
            # (S, H, G, T_max) score+prob buffers (engine-gap item:
            # softmax f32 intermediates at >=2k)
            S_, K_, G_ = qb.shape[0], qb.shape[1], qb.shape[2]
            m1 = jnp.full((S_, K_, G_), -1e30, jnp.float32)
            l1 = jnp.zeros((S_, K_, G_), jnp.float32)
            ctx1 = jnp.zeros((S_, K_, G_, hd), jnp.float32)
            for b in range(Tm // TB):
                sl = slice(b * TB, (b + 1) * TB)
                scb = jnp.einsum("skgd,sktd->skgt", qb,
                                 kc[:, :, sl].astype(jnp.bfloat16))
                scb = scb * ksc[:, :, None, sl].astype(jnp.float32) \
                    * (hd ** -0.5)
                colb = (b * TB + jnp.arange(TB))[None, None, None, :]
                scb = jnp.where(colb < lengths0[:, None, None, None],
                                scb.astype(jnp.float32), -jnp.inf)
                mb = jnp.maximum(jnp.max(scb, axis=-1), -1e30)
                mn = jnp.maximum(m1, mb)
                al = jnp.exp(m1 - mn)
                pb = jnp.exp(scb - mn[..., None])
                l1 = l1 * al + jnp.sum(pb, axis=-1)
                ctx1 = ctx1 * al[..., None] + jnp.einsum(
                    "skgt,sktd->skgd",
                    (pb * vsc[:, :, None, sl].astype(jnp.float32)
                     ).astype(jnp.bfloat16),
                    vc[:, :, sl].astype(jnp.bfloat16)
                ).astype(jnp.float32)
                m1 = mn
        else:
            sc1 = jnp.einsum("skgd,sktd->skgt", qb,
                             kc.astype(jnp.bfloat16))
            sc1 = sc1 * ksc[:, :, None, :].astype(jnp.float32) \
                * (hd ** -0.5)
            col = jnp.arange(kc.shape[2])[None, None, None, :]
            sc1 = jnp.where(col < lengths0[:, None, None, None],
                            sc1.astype(jnp.float32), -jnp.inf)
            m1 = jnp.maximum(jnp.max(sc1, axis=-1), -1e30)
            p1 = jnp.exp(sc1 - m1[..., None])
            l1 = jnp.sum(p1, axis=-1)
            ctx1 = jnp.einsum(
                "skgt,sktd->skgd",
                (p1 * vsc[:, :, None, :].astype(jnp.float32)
                 ).astype(jnp.bfloat16),
                vc.astype(jnp.bfloat16)).astype(jnp.float32)
        sc2 = jnp.einsum("skgd,skwd->skgw", qb.astype(jnp.float32),
                         rkl.astype(jnp.float32))
        sc2 = sc2 * rksl[:, :, None, :].astype(jnp.float32) \
            * (hd ** -0.5)
        wcol = jnp.arange(rkl.shape[2])[None, None, None, :]
        # defer mode: the fresh token is NOT in the ring yet — strictly
        # earlier columns only; it joins as a third in-register term
        vis2 = wcol < ring_pos if defer else wcol <= ring_pos
        sc2 = jnp.where(vis2, sc2, -jnp.inf)
        m2 = jnp.maximum(jnp.max(sc2, axis=-1), -1e30)
        p2 = jnp.exp(sc2 - m2[..., None])
        l2 = jnp.sum(p2, axis=-1)
        ctx2 = jnp.einsum(
            "skgw,skwd->skgd",
            p2 * rvsl[:, :, None, :].astype(jnp.float32),
            rvl.astype(jnp.float32))
        if defer:
            sc3 = jnp.einsum("skgd,skd->skg", qb,
                             kq[:, :, 0].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            sc3 = sc3 * ks[:, :, 0][:, :, None].astype(jnp.float32) \
                * (hd ** -0.5)
            v3 = vq[:, :, 0].astype(jnp.float32) \
                * vs[:, :, 0][..., None].astype(jnp.float32)  # (S, K, D)
            m = jnp.maximum(jnp.maximum(m1, m2), sc3)
            a1 = jnp.exp(m1 - m)
            a2 = jnp.exp(m2 - m)
            a3 = jnp.exp(sc3 - m)
            denom = l1 * a1 + l2 * a2 + a3
            ctx = (ctx1 * a1[..., None] + ctx2 * a2[..., None]
                   + v3[:, :, None, :] * a3[..., None]) / denom[..., None]
            payload = ((kq, ks, vq, vs),)
        else:
            m = jnp.maximum(m1, m2)
            a1 = jnp.exp(m1 - m)
            a2 = jnp.exp(m2 - m)
            denom = l1 * a1 + l2 * a2
            ctx = (ctx1 * a1[..., None] + ctx2 * a2[..., None]) \
                / denom[..., None]
            payload = (ring,)
    elif impl == "xla4r":
        # kv4 RING-CHUNK: the nibble-packed hhd cache rides the same
        # ring design as xla8r — half the main-term KV bytes via the
        # two-plane einsums (the nibble math fuses into the dot reads,
        # bench kv4 path structure).  The ONLY engine path that serves
        # 32 slots at 4k+ (kv8 ring's cache no longer fits and bd4
        # degrades pathologically there, r4 probes).
        from .kv_cache import kv4_planes, quantize_kv4

        k4, k4s = quantize_kv4(k)   # (S, H, 1, D/2), (S, H, 1)
        v4, v4s = quantize_kv4(v)
        # deferred ring write (mirrors xla8r): ring read-only in the
        # layer loop, fresh nibble token joins as a third flash term
        defer4 = ring_pos is not None and isinstance(ring_pos, tuple)
        if defer4:
            ring_pos = ring_pos[0]
            H4 = k4.shape[1]
            rkl = ring["rkv"][li, :, :H4]
            rvl = ring["rkv"][li, :, H4:]
            rksl = ring["rs"][li, :, :H4]
            rvsl = ring["rs"][li, :, H4:]
        elif "rkv" in ring:         # fused ring layout (2 dus/layer)
            kv = jnp.concatenate([k4, v4], axis=1)
            svals = jnp.concatenate(
                [k4s, v4s], axis=1).astype(ring["rs"].dtype)
            rkv = jax.lax.dynamic_update_slice(
                ring["rkv"], kv[None], (li, 0, 0, ring_pos, 0))
            rs = jax.lax.dynamic_update_slice(
                ring["rs"], svals[None], (li, 0, 0, ring_pos))
            ring = dict(ring, rkv=rkv, rs=rs)
            H4 = k4.shape[1]
            rkl, rvl = rkv[li, :, :H4], rkv[li, :, H4:]
            rksl, rvsl = rs[li, :, :H4], rs[li, :, H4:]
        else:
            rk = jax.lax.dynamic_update_slice(
                ring["rk"], k4[None], (li, 0, 0, ring_pos, 0))
            rv = jax.lax.dynamic_update_slice(
                ring["rv"], v4[None], (li, 0, 0, ring_pos, 0))
            rks = jax.lax.dynamic_update_slice(
                ring["rks"], k4s.astype(ring["rks"].dtype)[None],
                (li, 0, 0, ring_pos))
            rvs = jax.lax.dynamic_update_slice(
                ring["rvs"], v4s.astype(ring["rvs"].dtype)[None],
                (li, 0, 0, ring_pos))
            ring = dict(ring, rk=rk, rv=rv, rks=rks, rvs=rvs)
            rkl, rvl = rk[li], rv[li]
            rksl, rvsl = rks[li], rvs[li]
        qb = qg.astype(jnp.bfloat16)
        hd2 = hd // 2
        kc, vc = cache.k[li], cache.v[li]   # (S, H, T, D/2) packed
        ksc, vsc = cache.k_scale[li], cache.v_scale[li]
        klo, khi = kv4_planes(kc)
        sc1 = (jnp.einsum("skgd,sktd->skgt", qb[..., :hd2],
                          klo.astype(jnp.bfloat16))
               + jnp.einsum("skgd,sktd->skgt", qb[..., hd2:],
                            khi.astype(jnp.bfloat16)))
        sc1 = sc1 * ksc[:, :, None, :].astype(jnp.float32) * (hd ** -0.5)
        col = jnp.arange(kc.shape[2])[None, None, None, :]
        sc1 = jnp.where(col < lengths0[:, None, None, None],
                        sc1.astype(jnp.float32), -jnp.inf)
        m1 = jnp.maximum(jnp.max(sc1, axis=-1), -1e30)
        p1 = jnp.exp(sc1 - m1[..., None])
        l1 = jnp.sum(p1, axis=-1)
        pv1 = (p1 * vsc[:, :, None, :].astype(jnp.float32)
               ).astype(jnp.bfloat16)
        vlo, vhi = kv4_planes(vc)
        ctx1 = jnp.concatenate(
            [jnp.einsum("skgt,sktd->skgd", pv1,
                        vlo.astype(jnp.bfloat16)),
             jnp.einsum("skgt,sktd->skgd", pv1,
                        vhi.astype(jnp.bfloat16))],
            axis=-1).astype(jnp.float32)
        rlo, rhi = kv4_planes(rkl)      # (S, H, W, D/2) tiny
        qf = qb.astype(jnp.float32)
        sc2 = (jnp.einsum("skgd,skwd->skgw", qf[..., :hd2], rlo)
               + jnp.einsum("skgd,skwd->skgw", qf[..., hd2:], rhi))
        sc2 = sc2 * rksl[:, :, None, :].astype(jnp.float32) \
            * (hd ** -0.5)
        wcol = jnp.arange(rlo.shape[2])[None, None, None, :]
        # defer mode: the fresh token is NOT in the ring yet — strictly
        # earlier columns only; it joins as a third in-register term
        vis2 = wcol < ring_pos if defer4 else wcol <= ring_pos
        sc2 = jnp.where(vis2, sc2, -jnp.inf)
        m2 = jnp.maximum(jnp.max(sc2, axis=-1), -1e30)
        p2 = jnp.exp(sc2 - m2[..., None])
        l2 = jnp.sum(p2, axis=-1)
        pv2 = p2 * rvsl[:, :, None, :].astype(jnp.float32)
        rvlo, rvhi = kv4_planes(rvl)
        ctx2 = jnp.concatenate(
            [jnp.einsum("skgw,skwd->skgd", pv2, rvlo),
             jnp.einsum("skgw,skwd->skgd", pv2, rvhi)], axis=-1)
        if defer4:
            from .kv_cache import unpack_kv4 as _unp4

            kf = _unp4(k4[:, :, 0]) * \
                k4s[:, :, 0].astype(jnp.float32)[..., None]
            vf = _unp4(v4[:, :, 0]) * \
                v4s[:, :, 0].astype(jnp.float32)[..., None]
            sc3 = jnp.einsum("skgd,skd->skg", qb.astype(jnp.float32),
                             kf) * (hd ** -0.5)
            m = jnp.maximum(jnp.maximum(m1, m2), sc3)
            a1 = jnp.exp(m1 - m)
            a2 = jnp.exp(m2 - m)
            a3 = jnp.exp(sc3 - m)
            denom = l1 * a1 + l2 * a2 + a3
            ctx = (ctx1 * a1[..., None] + ctx2 * a2[..., None]
                   + vf[:, :, None, :] * a3[..., None]) / denom[..., None]
            payload = ((k4, k4s, v4, v4s),)
        else:
            m = jnp.maximum(m1, m2)
            a1 = jnp.exp(m1 - m)
            a2 = jnp.exp(m2 - m)
            denom = l1 * a1 + l2 * a2
            ctx = (ctx1 * a1[..., None] + ctx2 * a2[..., None]) \
                / denom[..., None]
            payload = (ring,)
    elif impl == "xla8a":
        # APPEND-FIRST masked attention: write the quantized fresh token
        # into the cache (per-slot-loop dus — aliases in place), then run
        # ONE masked einsum over the full T_max buffer.  No concat at all:
        # on the dus-carried engine cache the xla8 concat MATERIALIZES a
        # copy of the whole cache every layer (loop-variant operands defeat
        # XLA's concat fusion — the bench's win doesn't transfer), and the
        # two-term read-only form (xla8nc) measured catastrophic (92 ms).
        # Reading T_max instead of len+1 costs only the buffer headroom
        # (~8% more bytes at 1024-in-1104) vs a full cache copy.
        # Numerics are identical to xla8: same int8 codes, same scales.
        from .kv_cache import append_kv_quantized

        import os as _os
        if _os.environ.get("LCTPU_ABLATE_ATTN") != "2":
            cache = append_kv_quantized(cache, li, kq, ks, vq, vs,
                                        lengths)
        if _os.environ.get("LCTPU_ABLATE_ATTN") in ("1", "2"):
            # probe-only: fresh-token-only context (appends + weights +
            # head still run) — isolates the cache-read cost of the
            # engine step (tools/engine_step_probe.py); falls through to
            # the shared o-proj/MLP tail
            ctx = jnp.broadcast_to(
                (vq[:, :, 0].astype(jnp.float32)
                 * vs[:, :, 0][..., None].astype(jnp.float32)
                 )[:, :, None, :].astype(jnp.bfloat16),
                qg.shape).astype(jnp.float32)
            payload = (cache,)
        else:
            kc, vc = cache.k[li], cache.v[li]
            ksc, vsc = cache.k_scale[li], cache.v_scale[li]
            sc = jnp.einsum("skgd,sktd->skgt", qg.astype(jnp.bfloat16),
                            kc.astype(jnp.bfloat16))
            sc = sc * ksc[:, :, None, :].astype(jnp.float32) * (hd ** -0.5)
            col = jnp.arange(kc.shape[2])[None, None, None, :]
            vis = col <= lengths[:, None, None, None]  # fresh token at len
            sc = jnp.where(vis, sc.astype(jnp.float32), -jnp.inf)
            probs = jax.nn.softmax(sc, axis=-1)
            pv = (probs * vsc[:, :, None, :].astype(jnp.float32)
                  ).astype(jnp.bfloat16)
            ctx = jnp.einsum("skgt,sktd->skgd", pv,
                             vc.astype(jnp.bfloat16))
            payload = (cache,)
    elif impl == "xla8":
        # bench-style int8-concat attention: concat the QUANTIZED cache
        # with the quantized fresh token and let XLA fuse the dequant
        # into the einsum reads.  The old xla path dequantized the whole
        # cache first (read_kv) and concatenated in bf16 — XLA
        # materialized that copy every layer (engine probe r3: 32.7 vs
        # ~12 ms/step at 32 slots x 1024 ctx)
        kc = jnp.concatenate([cache.k[li], kq], axis=2)
        vc = jnp.concatenate([cache.v[li], vq], axis=2)
        ksc = jnp.concatenate([cache.k_scale[li], ks], axis=2)
        vsc = jnp.concatenate([cache.v_scale[li], vs], axis=2)
        sc = jnp.einsum("skgd,sktd->skgt", qg.astype(jnp.bfloat16),
                        kc.astype(jnp.bfloat16))
        sc = sc * ksc[:, :, None, :].astype(jnp.float32) * (hd ** -0.5)
        Tc = kc.shape[2]
        col = jnp.arange(Tc)[None, None, None, :]
        vis = (col < lengths[:, None, None, None]) | (col == Tc - 1)
        sc = jnp.where(vis, sc.astype(jnp.float32), -jnp.inf)
        probs = jax.nn.softmax(sc, axis=-1)
        pv = (probs * vsc[:, :, None, :].astype(jnp.float32)
              ).astype(jnp.bfloat16)
        ctx = jnp.einsum("skgt,sktd->skgd", pv, vc.astype(jnp.bfloat16))
    else:
        ctx = decode_attention_i8(
            qg, cache.k[li], cache.k_scale[li], cache.v[li],
            cache.v_scale[li],
            kq[:, :, 0, :], ks[:, :, 0], vq[:, :, 0, :], vs[:, :, 0],
            lengths=lengths, interpret=interpret,
        )  # (S, nkv, G, hd) f32
    ctx = ctx.reshape(S, 1, nh * hd).astype(x.dtype)
    if fused_ok(entry["attn.o"]):
        h = x + flin(entry["attn.o"], ctx[:, 0, :], False)[:, None, :]
    else:
        h = x + apply_qlinear(entry["attn.o"], ctx, act_bits=ab)
    if "mlp.router" in entry:
        # MoE blocks ride the SAME fast attention as dense llama
        # (VERDICT r4 #3); the stacked-expert MLP tail is shared with
        # the prefill/generic path
        return (_mlp_tail_serving(sw, entry, h, ab),) + payload
    if arch.family == "llama" and "mlp.gateup" in entry and \
            fused_ok(entry["mlp.gateup"]) and fused_ok(entry["mlp.down"]):
        gu = flin(entry["mlp.gateup"], h[:, 0, :], True)
        inter = gu.shape[-1] // 2
        mid = jax.nn.silu(gu[:, :inter]) * gu[:, inter:]
        y = h + flin(entry["mlp.down"], mid, False)[:, None, :]
        return (y,) + payload
    if arch.family == "llama" and "mlp.gateup" not in entry and all(
            fused_ok(entry[n]) for n in ("mlp.gate", "mlp.up", "mlp.down")):
        g = flin(entry["mlp.gate"], h[:, 0, :], True)
        u = flin(entry["mlp.up"], h[:, 0, :], True)
        mid = jax.nn.silu(g) * u
        y = h + flin(entry["mlp.down"], mid, False)[:, None, :]
        return (y,) + payload
    h2 = A.apply_norm(h, entry["ln2"], arch)
    if arch.family == "llama":
        g, u = _gateup_proj(entry, h2, ab)
        mid = jax.nn.silu(g) * u
        y = h + apply_qlinear(entry["mlp.down"], mid, act_bits=ab)
    else:
        f1 = apply_qlinear(entry["mlp.fc1"], h2, act_bits=ab)
        y = h + apply_qlinear(entry["mlp.fc2"], jax.nn.relu(f1), act_bits=ab)
    return (y,) + payload


def _shadow_prefill_layer(skv, arch, k_roped, k_pre, cos, sin, true_lens,
                          c_max: int):
    """ShadowKV prefill for one layer over a batch of admitted prompts.

    k_roped/k_pre: (N, H, T, D); true_lens (N,) traced.  Returns
    (k_eff, landmarks (N, H, c_max, D), selectable (N, H, c_max)):
    k_eff is the "shadow K" — rank-r pre-rope SVD reconstruction re-roped
    in place of K on retrievable non-outlier chunks, exact elsewhere
    (reference get_svd + prefill_kv_cache, kvsparse.py:177-375).  Chunk
    grid is static over the padded bucket; the traced prompt length gates
    which chunks are retrievable (reference: chunks = len//cs - local)."""
    from ..compression.sparsification.kvsparse import shadowkv_svd_recon

    N, H, T, D = k_roped.shape
    cs, local = skv.chunk_size, skv.local_chunk
    C = T // cs
    valid_tok = jnp.arange(T)[None, :] < true_lens[:, None]      # (N, T)
    # zero rows beyond the prompt: zero rows are exactly absent from the
    # SVD basis, so bucket padding cannot pollute the reconstruction
    k_pre_m = jnp.where(valid_tok[:, None, :, None], k_pre, 0)
    recon = shadowkv_svd_recon(k_pre_m, skv.rank).astype(k_roped.dtype)
    recon = A.rope_apply_arch(arch, recon, recon, cos, sin)[0]
    kc = k_roped[:, :, :C * cs].astype(jnp.float32).reshape(
        N, H, C, cs, D)
    landmarks = kc.mean(axis=3)                                  # (N,H,C,D)
    # retrievable chunks: fully inside [0, true_len - local*cs)
    n_ret = jnp.maximum(true_lens // cs - local, 0)              # (N,)
    retr = jnp.arange(C)[None, :] < n_ret[:, None]               # (N, C)
    retr = jnp.broadcast_to(retr[:, None, :], (N, H, C))
    # outliers: worst min in-chunk cosine vs landmark, retrievable only
    ln = landmarks / jnp.clip(
        jnp.linalg.norm(landmarks, axis=-1, keepdims=True), 1e-6, None)
    kn = kc / jnp.clip(jnp.linalg.norm(kc, axis=-1, keepdims=True),
                       1e-6, None)
    worst = jnp.min(jnp.einsum("nhcd,nhcsd->nhcs", ln, kn), axis=-1)
    worst = jnp.where(retr, worst, 2.0)  # never pick non-retrievable
    n_out = max(min(skv.outlier_chunk, C - 1), 0)
    outlier = jnp.zeros((N, H, C), bool)
    if n_out:
        oidx = jax.lax.top_k(-worst, n_out)[1]
        outlier = outlier.at[
            jnp.arange(N)[:, None, None], jnp.arange(H)[None, :, None],
            oidx].set(True)
        outlier = outlier & retr
    selectable = retr & ~outlier
    tok_recon = jnp.repeat(selectable, cs, axis=2)               # (N,H,Ccs)
    if C * cs < T:
        tok_recon = jnp.concatenate(
            [tok_recon, jnp.zeros((N, H, T - C * cs), bool)], axis=2)
    k_eff = jnp.where(tok_recon[..., None], recon, k_roped)
    pad = c_max - C
    if pad > 0:
        landmarks = jnp.concatenate(
            [landmarks, jnp.zeros((N, H, pad, D), landmarks.dtype)], 2)
        selectable = jnp.concatenate(
            [selectable, jnp.zeros((N, H, pad), bool)], 2)
    return k_eff, landmarks, selectable


def _shadow_extra_mask(skv, extra, li: int, q: Array) -> Array:
    """Per-query ShadowKV visibility at decode: the LIVE query scores the
    layer's landmarks, top sparse_budget/cs chunks are retrieved
    (get_retrieval_position_ids semantics); non-selectable chunks (outlier
    / local / generated region) are always visible.  q (S, nh, Tq, D) ->
    additive mask (S, nh, Tq, T_max + 1) incl. the fresh-token column."""
    from ..compression.sparsification.kvsparse import (
        NEG, shadowkv_chunk_scores, shadowkv_keep_mask)

    S, nh, Tq, D = q.shape
    lm = extra["landmarks"][li].astype(jnp.float32)   # (S, H, C, D)
    sel = extra["selectable"][li]
    H = lm.shape[1]
    G = nh // H
    qg = q.reshape(S, H, G, Tq, D)
    scores = shadowkv_chunk_scores(qg, lm, sel, D ** -0.5)
    keep = shadowkv_keep_mask(
        scores, sel, max(skv.sparse_budget // skv.chunk_size, 1))
    vis = keep | ~sel[:, :, None, :]
    tok = jnp.repeat(vis, skv.chunk_size, axis=3)     # (S, H, Tq, C*cs)
    tok = jnp.concatenate(
        [tok, jnp.ones((S, H, Tq, 1), bool)], axis=3)  # fresh token
    return jnp.repeat(jnp.where(tok, 0.0, NEG), G, axis=1)


def pick_attn_impl(kv_bits: int, max_len: int, paged: bool, arch,
                   backend: str = "tpu", chunked: bool = False) -> str:
    """Measured ENGINE-side attention recipe (r4 revision): kv8 -> "xla"
    at EVERY context — the default route is the ring-chunk path (xla8r)
    whose read-only main cache beats the S-split flash kernel 2x at 4k
    engine-side (15.27 vs 31.3 ms/step at 16 slots; the bds kernel's r3
    win was a bench-loop result that does not transfer to the dus-carried
    engine cache).  kv4 -> the bd4 nibble kernel (its XLA two-term
    alternative loses at every ctx; bd4 degrades at 32 slots x 4k — use
    <=16 slots at long context or kv8+ring).  Pallas kernels need the
    TPU backend; paged/MLA/MoE engines use the XLA block path."""
    if paged or arch.mla is not None or arch.moe is not None \
            or backend == "cpu":
        return "xla"
    if kv_bits == 4:
        # chunked engines ride the kv4 ring (r4: 13.89 ms vs bd4's 17.55
        # at 32x1024; 24.5 at 32x4096 where bd4 degrades to 514); the
        # per-step engine keeps the bd4 kernel
        return "xla4r" if chunked else "bd4"
    return "xla"


def _ngram_draft(history: List[int], n: int, k: int) -> List[int]:
    """Prompt-lookup drafting: find the most recent PRIOR occurrence of
    the trailing n-gram in the token history and propose the (up to) k
    tokens that followed it.  Cheap host-side work; pays off whenever
    generation revisits prompt phrasing (summaries, code, extraction)."""
    if len(history) < n + 1:
        return []
    tail = history[-n:]
    for i in range(len(history) - n - 1, -1, -1):
        if history[i:i + n] == tail:
            return history[i + n:i + n + k]
    return []


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: np.ndarray  # (T,) int32
    max_new_tokens: int
    out_tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


def _block_apply(
    sw: ServingWeights, entry: Dict[str, Any], x: Array, cos, sin,
    k_full: Array, v_full: Array, mask: Array,
    return_pre_rope: bool = False, q_mask_hook=None,
):
    """One block on (S, T, H) with externally-managed KV.

    Returns (y, k_new, v_new); attention runs over (cache ++ new).
    ``return_pre_rope`` appends the pre-rope K (ShadowKV prefill needs it
    for the SVD); ``q_mask_hook(q)`` adds a query-dependent attention mask
    (ShadowKV per-query retrieval at decode)."""
    arch = sw.arch
    ab = getattr(sw, "act_bits", 16)
    S, T, _ = x.shape
    nh, nkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
    h1 = A.apply_norm(x, entry["ln1"], arch)
    q, k, v = _qkv_proj(entry, h1, nh, nkv, hd, ab)
    q = q.reshape(S, T, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(S, T, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(S, T, nkv, hd).transpose(0, 2, 1, 3)
    if arch.qk_norm:
        q = A.rmsnorm(q, entry["q_norm"]["weight"], arch.rms_eps)
        k = A.rmsnorm(k, entry["k_norm"]["weight"], arch.rms_eps)
    k_pre = k
    if cos is not None:
        q, k = A.apply_rope(q, k, cos, sin)
    if q_mask_hook is not None:
        mask = mask + q_mask_hook(q)
    k_all = jnp.concatenate([k_full, k.astype(k_full.dtype)], axis=2)
    v_all = jnp.concatenate([v_full, v.astype(v_full.dtype)], axis=2)
    ctx = A.sdpa(q, k_all, v_all, mask, kv_groups=nh // nkv)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(S, T, nh * hd)
    attn_out = apply_qlinear(entry["attn.o"], ctx, act_bits=ab)
    h = x + attn_out
    y = _mlp_tail_serving(sw, entry, h, ab)
    if return_pre_rope:
        return y, k, v, k_pre
    return y, k, v


class LLMEngine:
    def __init__(
        self,
        weights: ServingWeights,
        max_slots: int = 8,
        max_len: int = 1024,
        kv_bits: int = 8,
        prefill_buckets: Sequence[int] = (64, 128, 256, 512),
        seed: int = 0,
        paged: bool = False,
        page_size: int = 16,
        n_pages: Optional[int] = None,
        mesh=None,
        attn_impl: str = "auto",
        decode_chunk: int = 1,
        sparse_kv: Optional[Dict] = None,
        spec_decode: Optional[Dict] = None,
        prefill_chunk: Optional[int] = None,
    ):
        # decode attention: "pallas" = int8-MXU kernel over the slot cache
        # (contiguous multi-MB DMA slabs, fresh token in-register);
        # "xla" = dequant+concat einsum; "pallas_interpret" exercises the
        # kernel path on CPU (tests).  auto -> xla: measured on v5e the
        # slab kernel reads KV at only ~280 GB/s (Mosaic lowers the
        # batched 4-row dots poorly) vs ~510 GB/s for XLA's einsum with
        # fused dequant+concat (tools/attn_i8_kernel_experiments.py) —
        # the kernel stays as an opt-in for future Mosaic generations.
        if kv_bits == "auto":
            # context-based pick (measured crossover, REPORT r3 kv4
            # curve): at short contexts the nibble unpack epilogue costs
            # more than the halved KV stream saves; at >=4k the KV read
            # dominates and kv4 wins
            kv_bits = 4 if max_len >= 4096 else 8
        if attn_impl == "auto":
            attn_impl = pick_attn_impl(
                kv_bits, max_len, paged, weights.arch,
                backend=jax.default_backend(),
                chunked=int(decode_chunk) > 1)
        elif attn_impl.replace("_interpret", "") in (
                "bd", "bds", "pallas", "i8"):
            # PROBE-ONLY paths (VERDICT r4 #7 demotion): bd loses at 16
            # slots (13.16 vs 9.79 ms), bds loses 2x engine-side at 4k
            # (31.3 vs 15.27), pallas-i8 loses at 16 slots (13.85 vs
            # 13.3) — their r2/r3 wins were bench-loop results on
            # loop-invariant caches that do not transfer to the
            # dus-carried engine cache.  bd4 keeps its per-step kv4
            # niche.  Kept for kernel regression tests + probes.
            import warnings

            warnings.warn(
                f"attn_impl='{attn_impl}' is probe-only (loses to the "
                "auto-picked path engine-side at every measured shape; "
                "REPORT r4); use attn_impl='auto'", stacklevel=2)
        # ShadowKV serving mode (VERDICT r2 #4 engine-side hook): per-query
        # landmark retrieval over a shadow (low-rank) K cache
        self.shadow = None
        if sparse_kv and sparse_kv.get("method") == "ShadowKV":
            from ..compression.sparsification.kvsparse import (
                ShadowKVCache as _SKV)

            assert not paged and weights.arch.mla is None, \
                "ShadowKV serving needs the dense slot cache"
            assert max_len % sparse_kv.get("chunk_size", 8) == 0
            self.shadow = _SKV("", sparse_kv, weights.arch.num_layers)
            attn_impl = "xla"
        if weights.arch.mla is not None or weights.arch.moe is not None:
            # MLA decode has its own absorbed-latent path; MoE blocks
            # carry stacked experts the fused i8/bd block functions don't
            # understand — both route through the XLA block path
            attn_impl = "xla"
        if attn_impl == "xla8r" and (
                paged or kv_bits != 8 or spec_decode or sparse_kv
                or decode_chunk <= 1):
            # the ring-chunk path needs the dense int8 hhd cache and a
            # multi-step decode chunk (the ring IS the chunk window)
            attn_impl = "xla"
        if attn_impl == "xla4r" and (
                paged or kv_bits != 4 or spec_decode or sparse_kv
                or decode_chunk <= 1):
            attn_impl = "xla"
        self.attn_impl = attn_impl
        # dense int8-KV engines route 'xla' decode through the
        # append-first masked attention (impl='xla8a'): XLA fuses the int8
        # dequant into the einsum reads; the read_kv-then-bf16-concat
        # path materialized the whole cache per layer (engine probe r3).
        # The gate holds under a mesh too (VERDICT r4 #1): the xla8a/xla8r
        # ops are plain jit einsums + per-slot dus — NamedShardings on the
        # weights/cache let GSPMD place them (heads on ``tp``), so the
        # fast path IS the multi-chip path.  MoE dense engines ride the
        # same attention (VERDICT r4 #3); their stacked-expert MLP tail
        # dispatches inside _block_apply_decode_i8.
        # spec-decode engines stay on the read_kv path: the verify step
        # and the decode step must be numerics-IDENTICAL for lossless
        # greedy acceptance, and _spec_verify processes bf16 chunk KV
        self._use_xla8 = (
            attn_impl == "xla" and not paged
            and weights.arch.mla is None
            and sparse_kv is None and spec_decode is None)
        # MLA engines get the analogous append-first absorbed path over
        # the quantized latent cache (no read_mla materialization);
        # LCTPU_MLA_APPEND=0 restores the read-then-concat form
        import os as _os
        self._use_mla8a = (
            weights.arch.mla is not None and not paged
            and kv_bits == 8 and sparse_kv is None and spec_decode is None
            and _os.environ.get("LCTPU_MLA_APPEND", "1") != "0")
        self.mesh = mesh
        if mesh is not None:
            from .sharding import shard_serving_weights

            weights = shard_serving_weights(weights, mesh)
        self.sw = weights
        self.arch = weights.arch
        self.max_slots = max_slots
        self.max_len = max_len
        self.kv_bits = kv_bits
        self.paged = paged
        self.page_size = page_size
        self.max_pages_per_slot = -(-max_len // page_size)
        self.n_pages = (n_pages if n_pages is not None
                        else max_slots * self.max_pages_per_slot)
        self.prefill_buckets = [b for b in prefill_buckets if b <= max_len]
        if paged:
            self.prefill_buckets = [
                b for b in self.prefill_buckets if b % page_size == 0
            ]
        self.key = jax.random.PRNGKey(seed)
        # set before reset(): the ring-path cache sizes its flush
        # headroom from the chunk length
        self.decode_chunk = max(1, int(decode_chunk))
        self.reset()
        # donate the cache: without donation XLA cannot alias the input
        # buffers, so every per-layer dynamic_update_slice append forces a
        # fresh copy of the full (L,S,H,T,D) cache each step; generate()
        # reassigns self.cache from the output immediately, so the donated
        # buffer is never reused
        # sw rides as a TRACED argument (ServingWeights is a pytree):
        # closing over it embeds GBs of constants in the executable and
        # re-ships them per call through tunneled runtimes
        self._decode_jit = jax.jit(self._decode_step, donate_argnums=(1,))
        self._prefill_jit = jax.jit(self._prefill, static_argnames=("T",),
                                    donate_argnums=(1,))
        self._prefill_batch_jit = jax.jit(
            self._prefill_batch, static_argnames=("T",), donate_argnums=(1,))
        self.prefix = None
        # chunked prefill: prompts longer than this admit incrementally,
        # one chunk per scheduler iteration, interleaved with decode
        # steps of the running slots (None = whole-prompt prefill)
        self.prefill_chunk = prefill_chunk
        if prefill_chunk is not None:
            assert not paged and self.arch.mla is None \
                and self.shadow is None, \
                "chunked prefill: dense slot-cache engines"
        self.prefilling: Dict[int, Tuple[Request, int]] = {}
        self._prefill_chunk_jit = jax.jit(
            self._prefill_chunk, static_argnames=("T",),
            donate_argnums=(1,))
        self._prefix_kv_jit = jax.jit(self._prefix_kv)
        self._prefill_suffix_jit = jax.jit(
            self._prefill_suffix, static_argnames=("T",),
            donate_argnums=(1,))
        # multi-step on-device decode (JetStream-style chunked scheduling):
        # n_steps decode iterations + on-device sampling in ONE dispatch —
        # the host only sees tokens every chunk, which matters whenever
        # host<->device latency is non-trivial (decode_chunk > 1 opts in;
        # EOS/retirement are handled at chunk boundaries, late junk tokens
        # are discarded host-side)
        self._decode_chunk_jit = jax.jit(
            self._decode_chunk, static_argnames=("n_steps", "sp"),
            donate_argnums=(1,))
        # speculative decoding (beyond-parity serving): n-gram
        # prompt-lookup drafts + one batched greedy verify dispatch per
        # round — lossless under greedy sampling (the accepted prefix is
        # exactly what per-step decode would emit)
        self.spec = None
        if spec_decode and spec_decode.get("method", "ngram") == "ngram":
            assert not self.paged and self.arch.mla is None, \
                "spec decode: dense slot-cache engines only"
            self.spec = {
                "draft_len": int(spec_decode.get("draft_len", 4)),
                "ngram": int(spec_decode.get("ngram", 2)),
            }
            self.spec_stats = {"rounds": 0, "emitted": 0}
        self._spec_jit = jax.jit(self._spec_verify, donate_argnums=(1,))

    def _fresh_or_reuse(self, create_fn):
        """Cache-reuse reset (VERDICT r4 #4): when the live cache pytree
        matches the new spec, zero it IN PLACE via a donated jit instead
        of allocating a fresh multi-GB buffer.  The fresh-alloc form kept
        two caches transiently alive across reset (lazy remote frees) —
        what pushed the 32x8192 kv4 ring ~0.4GB over HBM and failed the
        24-slot near-capacity probe (r4)."""
        old = getattr(self, "cache", None)
        if old is None:
            return create_fn()
        abs_new = jax.eval_shape(create_fn)
        ol, ot = jax.tree_util.tree_flatten(old)
        nl, nt = jax.tree_util.tree_flatten(abs_new)
        if ot != nt or len(ol) != len(nl) or any(
                o.shape != n.shape or o.dtype != n.dtype
                for o, n in zip(ol, nl)):
            self.cache = None  # drop the old reference before allocating
            return create_fn()
        if not hasattr(self, "_zero_cache_jit"):
            self._zero_cache_jit = jax.jit(
                lambda c: jax.tree_util.tree_map(jnp.zeros_like, c),
                donate_argnums=0)
        return self._zero_cache_jit(old)

    def reset(self):
        a = self.arch
        if a.mla is not None:
            assert not self.paged, "MLA serving uses the slot latent cache"
            self.cache = self._fresh_or_reuse(lambda: KVCache.create_mla(
                a.num_layers, self.max_slots, self.max_len,
                a.mla.kv_lora_rank, a.mla.qk_rope_head_dim,
                bits=8 if self.kv_bits == 8 else 16,
            ))
            if self.mesh is not None:
                from .sharding import shard_kv_cache

                self.cache = shard_kv_cache(self.cache, self.mesh)
            self.buf_len = self.max_len
            self.lengths = jnp.zeros((self.max_slots,), jnp.int32)
            self.cur_tokens = jnp.zeros((self.max_slots,), jnp.int32)
            self.slot_req = [None] * self.max_slots
            return
        if self.paged:
            self.cache = self._fresh_or_reuse(
                lambda: PagedKVCache.create(
                    a.num_layers, self.n_pages + 1, self.max_slots,
                    self.max_pages_per_slot, a.num_kv_heads,
                    self.page_size, a.head_dim, bits=self.kv_bits,
                ))  # +1: page 0 is the reserved scratch page
            self.allocator = PageAllocator(self.n_pages + 1)
            self.buf_len = self.max_len
            self.slot_pages: List[List[int]] = [[] for _ in
                                                range(self.max_slots)]
        else:
            base = self.attn_impl.replace("_interpret", "")
            if base == "bd4" and self.kv_bits == 4:
                layout = "bd4"
            elif base in ("bd", "bds") and self.kv_bits == 8:
                layout = "bd"
            else:
                layout = "hhd"
            buf_len = self.max_len
            if layout == "hhd" and self.decode_chunk > 1 and (
                    self._use_xla8
                    or self.attn_impl in ("xla8r", "xla4r")):
                # ring-chunk flush headroom: a chunk entered at
                # lengths0 = max_len - k (k < chunk) flushes a FULL
                # chunk-wide slab; without headroom the dus start clamps
                # and overwrites valid earlier tokens (r4 max_len-cap
                # test).  Positions >= max_len stay masked forever.
                buf_len += self.decode_chunk
            if layout in ("bd", "bd4"):
                # the S-split flash kernels (bds / bd4 at 8k+) tile the
                # cache time axis in s_block=512 chunks — Mosaic requires
                # the axis divisible by the block (r4: max_len+80=4176
                # crashed lowering); round the BUFFER up, lengths masks
                # keep the logical max_len
                buf_len = -(-buf_len // 512) * 512
            def _mk_dense():
                cache = KVCache.create(
                    a.num_layers, self.max_slots, a.num_kv_heads, buf_len,
                    a.head_dim, bits=self.kv_bits, layout=layout,
                )
                if getattr(self, "shadow", None) is not None:
                    C = self.max_len // self.shadow.chunk_size
                    L, S, H = (a.num_layers, self.max_slots,
                               a.num_kv_heads)
                    cache = dataclasses.replace(cache, extra={
                        "landmarks": jnp.zeros((L, S, H, C, a.head_dim),
                                               jnp.bfloat16),
                        "selectable": jnp.zeros((L, S, H, C), bool),
                    })
                return cache

            self.cache = self._fresh_or_reuse(_mk_dense)
            # the PHYSICAL time-axis length: masks in every cache-reading
            # jit must size from this, not max_len (ring headroom / bd
            # s_block rounding make the buffer longer)
            self.buf_len = buf_len
        if self.mesh is not None:
            from .sharding import shard_kv_cache

            self.cache = shard_kv_cache(self.cache, self.mesh)
        self.lengths = jnp.zeros((self.max_slots,), jnp.int32)
        self.cur_tokens = jnp.zeros((self.max_slots,), jnp.int32)
        self.slot_req: List[Optional[Request]] = [None] * self.max_slots

    # -- host-side page management (paged mode) -------------------------
    def _map_pages(self, slot: int, n_tokens_needed: int):
        """Ensure slot has pages mapped to cover n_tokens_needed tokens."""
        need = -(-n_tokens_needed // self.page_size)
        have = len(self.slot_pages[slot])
        if need <= have:
            return
        new = self.allocator.alloc(need - have)
        table = self.cache.block_table
        for idx, pg in enumerate(new, start=have):
            table = table.at[slot, idx].set(pg)
        self.cache = dataclasses.replace(self.cache, block_table=table)
        self.slot_pages[slot].extend(new)

    def _release_pages(self, slot: int):
        self.allocator.release(self.slot_pages[slot])
        self.slot_pages[slot] = []
        table = self.cache.block_table.at[slot].set(-1)
        self.cache = dataclasses.replace(self.cache, block_table=table)

    # ------------------------------------------------------------------
    def _prefill(self, sw, cache, lengths, ids, slot, true_len, T: int):
        """Run one padded prompt (1, T) through the model, writing KV into
        ``slot``; returns (cache, lengths, last-token logits)."""
        arch = sw.arch
        x = sw.embed[ids]  # (1, T, H)
        if sw.embed_pos is not None:
            x = x + sw.embed_pos[jnp.arange(T) + 2]
        cos, sin = (
            A.rope_cos_sin(arch, jnp.arange(T))
            if arch.family == "llama" else (None, None)
        )
        mask = A.causal_mask(T, T)
        # also mask out padding (cols >= true_len)
        mask = mask + jnp.where(
            jnp.arange(T) < true_len, 0.0, jnp.finfo(jnp.float32).min
        )[None, :]
        zero_kv = jnp.zeros(
            (1, arch.num_kv_heads, 0, arch.head_dim), jnp.bfloat16
        )
        for li, entry in enumerate(sw.blocks):
            if arch.mla is not None:
                x, c_n, r_n = _block_apply_mla_prefill(
                    sw, entry, x, cos, sin, mask)
                cache = _append_one_slot_mla(cache, li, slot, c_n, r_n)
                continue
            x, k_new, v_new = _block_apply(
                sw, entry, x, cos, sin, zero_kv, zero_kv, mask
            )
            if self.paged:
                cache = paged_append_prefill(cache, li, slot, k_new, v_new)
            else:
                cache = _append_one_slot(cache, li, slot, k_new, v_new)
        xl = A.rmsnorm(
            x, sw.norm.get("weight"), arch.rms_eps
        ) if (arch.family == "llama" or arch.norm_type == "rmsnorm") else (
            A.layernorm(x, sw.norm.get("weight"),
                        sw.norm.get("bias"), 1e-5)
        )
        # head only on the last true row: the full (T, V) logits is a
        # pure transient (T * 128k * 4B = 4.2 GB at T=8192 — an HBM OOM
        # term at long-context admission; only ``last`` leaves the jit)
        xl_last = jax.lax.dynamic_index_in_dim(xl[0], true_len - 1, 0,
                                               keepdims=True)[None]
        last = head_logits(sw, xl_last)[0, 0]
        lengths = lengths.at[slot].set(true_len)
        return cache, lengths, last

    # ------------------------------------------------------------------
    def _prefill_batch(self, sw, cache, lengths, ids, slots, true_lens,
                       T: int):
        """Batched prefill: N padded prompts (N, T) in ONE dispatch,
        KV scatter-written into ``slots``.  Returns (cache, lengths,
        last-token logits (N, V)).

        Serial admission dispatched one full prefill per request while
        decode stalled (VERDICT r2 #3); batching N prompts of one length
        bucket costs one dispatch + one weight read for all N.  Rows may
        repeat (slot padding to the N bucket): the scatter then writes
        identical values twice — harmless."""
        arch = sw.arch
        N = ids.shape[0]
        x = sw.embed[ids]  # (N, T, H)
        if sw.embed_pos is not None:
            x = x + sw.embed_pos[jnp.arange(T) + 2][None]
        cos, sin = (
            A.rope_cos_sin(arch, jnp.arange(T))
            if arch.family == "llama" else (None, None)
        )
        mask = A.causal_mask(T, T)[None, None]  # (1, 1, T, T)
        pad = jnp.where(jnp.arange(T)[None, :] < true_lens[:, None], 0.0,
                        jnp.finfo(jnp.float32).min)  # (N, T)
        mask = mask + pad[:, None, None, :]
        zero_kv = jnp.zeros(
            (N, arch.num_kv_heads, 0, arch.head_dim), jnp.bfloat16
        )
        for li, entry in enumerate(sw.blocks):
            if arch.mla is not None:
                x, c_n, r_n = _block_apply_mla_prefill(
                    sw, entry, x, cos, sin, mask)
                cache = _append_slots_mla(cache, li, slots, c_n, r_n)
                continue
            if self.shadow is not None:
                x, k_new, v_new, k_pre = _block_apply(
                    sw, entry, x, cos, sin, zero_kv, zero_kv, mask,
                    return_pre_rope=True)
                c_max = self.max_len // self.shadow.chunk_size
                k_eff, lm, sel = _shadow_prefill_layer(
                    self.shadow, arch, k_new, k_pre, cos, sin, true_lens,
                    c_max)
                cache = _append_slots(cache, li, slots, k_eff, v_new)
                ex = dict(cache.extra)
                ex["landmarks"] = ex["landmarks"].at[li, slots].set(
                    lm.astype(ex["landmarks"].dtype))
                ex["selectable"] = ex["selectable"].at[li, slots].set(sel)
                cache = dataclasses.replace(cache, extra=ex)
                continue
            x, k_new, v_new = _block_apply(
                sw, entry, x, cos, sin, zero_kv, zero_kv, mask
            )
            cache = _append_slots(cache, li, slots, k_new, v_new)
        xl = A.rmsnorm(
            x, sw.norm.get("weight"), arch.rms_eps
        ) if (arch.family == "llama" or arch.norm_type == "rmsnorm") else (
            A.layernorm(x, sw.norm.get("weight"),
                        sw.norm.get("bias"), 1e-5)
        )
        # gather each row's last true hidden state BEFORE the head: the
        # full (N, T, V) logits is a pure transient (see _prefill)
        xl_last = xl[jnp.arange(N), true_lens - 1][:, None]  # (N, 1, H)
        last = head_logits(sw, xl_last)[:, 0]
        lengths = lengths.at[slots].set(true_lens)
        return cache, lengths, last

    # ------------------------------------------------------------------
    def register_prefix(self, tokens: Sequence[int]):
        """Prefix caching: prefill a shared prompt PREFIX once; later
        requests whose prompt starts with it skip recomputing those
        positions (their slot cache is seeded by a device copy and only
        the suffix runs through the stack).  Causality makes the prefix
        KV suffix-independent, so outputs are exactly the full-prefill
        engine's.  Dense hhd-cache engines only."""
        assert not self.paged and self.arch.mla is None \
            and self.cache.layout == "hhd", \
            "prefix caching: dense slot-cache engines"
        toks = [int(t) for t in tokens]
        Tp = len(toks)
        assert 0 < Tp < self.max_len
        ids = jnp.asarray([toks], jnp.int32)
        kv = self._prefix_kv_jit(self.sw, ids)
        self.prefix = {"tokens": toks, "kv": kv, "len": Tp}

    def _prefix_kv(self, sw, ids):
        """Per-layer KV of a (1, Tp) prefix, in the cache's stored form:
        (k (L, H, Tp, D), k_scale, v, v_scale) — int8-quantized when the
        cache is, bf16 otherwise."""
        arch = sw.arch
        T = ids.shape[1]
        x = sw.embed[ids]
        if sw.embed_pos is not None:
            x = x + sw.embed_pos[jnp.arange(T) + 2]
        cos, sin = (A.rope_cos_sin(arch, jnp.arange(T))
                    if arch.family == "llama" else (None, None))
        mask = A.causal_mask(T, T)
        zero_kv = jnp.zeros(
            (1, arch.num_kv_heads, 0, arch.head_dim), jnp.bfloat16)
        ks_l, kss_l, vs_l, vss_l = [], [], [], []
        for entry in sw.blocks:
            x, k_new, v_new = _block_apply(
                sw, entry, x, cos, sin, zero_kv, zero_kv, mask)
            if self.kv_bits == 8:
                kq, ks = quantize_kv(k_new)
                vq, vs = quantize_kv(v_new)
            else:
                kq, vq = (k_new.astype(jnp.bfloat16),
                          v_new.astype(jnp.bfloat16))
                ks = vs = jnp.zeros((1, arch.num_kv_heads, T),
                                    jnp.bfloat16)
            ks_l.append(kq[0])
            kss_l.append(ks[0])
            vs_l.append(vq[0])
            vss_l.append(vs[0])
        return (jnp.stack(ks_l), jnp.stack(kss_l), jnp.stack(vs_l),
                jnp.stack(vss_l))

    def _prefill_suffix(self, sw, cache, lengths, ids, slot, true_len,
                        pk, pks, pv, pvs, T: int):
        """Prefill only the suffix (1, T) of a prompt whose first
        ``Tp = pk.shape[2]`` positions come from the registered prefix:
        attention runs over [prefix KV ++ suffix], the slot cache is
        seeded with the prefix KV + the new suffix KV."""
        arch = sw.arch
        Tp = pk.shape[2]
        x = sw.embed[ids]
        if sw.embed_pos is not None:
            x = x + sw.embed_pos[jnp.arange(T) + Tp + 2]
        cos, sin = (A.rope_cos_sin(arch, jnp.arange(T) + Tp)
                    if arch.family == "llama" else (None, None))
        mask = A.causal_mask(T, T)  # over the suffix block
        mask = mask + jnp.where(
            jnp.arange(T) < true_len, 0.0, jnp.finfo(jnp.float32).min
        )[None, :]
        full_mask = jnp.concatenate(
            [jnp.zeros((T, Tp), jnp.float32), mask], axis=1)[None, None]
        for li, entry in enumerate(sw.blocks):
            if self.kv_bits == 8:
                k_full = (pk[li].astype(jnp.float32)
                          * pks[li][..., None].astype(jnp.float32)
                          ).astype(jnp.bfloat16)[None]
                v_full = (pv[li].astype(jnp.float32)
                          * pvs[li][..., None].astype(jnp.float32)
                          ).astype(jnp.bfloat16)[None]
            else:
                k_full, v_full = pk[li][None], pv[li][None]
            x, k_new, v_new = _block_apply(
                sw, entry, x, cos, sin, k_full, v_full, full_mask)
            # seed slot cache: prefix rows [0, Tp), suffix [Tp, Tp+T)
            cache = _append_one_slot_at(cache, li, slot, pk[li][None],
                                        pks[li][None], pv[li][None],
                                        pvs[li][None], 0)
            if self.kv_bits == 8:
                kq, ks = quantize_kv(k_new)
                vq, vs = quantize_kv(v_new)
            else:
                kq, vq = (k_new.astype(jnp.bfloat16),
                          v_new.astype(jnp.bfloat16))
                ks = vs = jnp.zeros((1, arch.num_kv_heads, T),
                                    jnp.bfloat16)
            cache = _append_one_slot_at(cache, li, slot, kq, ks, vq, vs,
                                        Tp)
        xl = A.rmsnorm(
            x, sw.norm.get("weight"), arch.rms_eps
        ) if (arch.family == "llama" or arch.norm_type == "rmsnorm") else (
            A.layernorm(x, sw.norm.get("weight"),
                        sw.norm.get("bias"), 1e-5)
        )
        xl_last = jax.lax.dynamic_index_in_dim(xl[0], true_len - 1, 0,
                                               keepdims=True)[None]
        last = head_logits(sw, xl_last)[0, 0]
        lengths = lengths.at[slot].set(Tp + true_len)
        return cache, lengths, last

    # ------------------------------------------------------------------
    def _prefill_chunk(self, sw, cache, lengths, ids, slot, true_len,
                       T: int):
        """One CHUNK of an incremental prefill: run (1, T) tokens whose
        positions start at the slot's current length, attending over the
        slot's existing cache + the chunk (chunked prefill — long prompts
        admit without stalling running decodes; VERDICT r2 #3's
        interleaving half).  Returns (cache, lengths, last-token logits
        of the chunk)."""
        arch = sw.arch
        start = lengths[slot]
        x = sw.embed[ids]
        if sw.embed_pos is not None:
            x = x + sw.embed_pos[jnp.arange(T) + start + 2]
        cos, sin = (A.rope_cos_sin(arch, jnp.arange(T) + start)
                    if arch.family == "llama" else (None, None))
        Tmax = self.buf_len
        # mask over [cache rows | chunk rows]: cache col j visible iff
        # j < start; chunk causal + padding (cols >= true_len hidden)
        cache_vis = jnp.where(
            jnp.arange(Tmax)[None, :] < start, 0.0,
            jnp.finfo(jnp.float32).min)                    # (1, Tmax)
        cmask = A.causal_mask(T, T) + jnp.where(
            jnp.arange(T) < true_len, 0.0, jnp.finfo(jnp.float32).min
        )[None, :]
        mask = jnp.concatenate(
            [jnp.broadcast_to(cache_vis, (T, Tmax)), cmask],
            axis=1)[None, None]
        for li, entry in enumerate(sw.blocks):
            k_slot, v_slot = read_kv_slot(cache, li, slot)
            x, k_new, v_new = _block_apply(
                sw, entry, x, cos, sin, k_slot, v_slot, mask)
            if self.kv_bits == 8:
                kq, ks = quantize_kv(k_new)
                vq, vs = quantize_kv(v_new)
            elif self.kv_bits == 4:
                from .kv_cache import quantize_kv4

                kq, ks = quantize_kv4(k_new)   # packed (1, H, T, D/2)
                vq, vs = quantize_kv4(v_new)
            else:
                kq, vq = (k_new.astype(jnp.bfloat16),
                          v_new.astype(jnp.bfloat16))
                ks = vs = jnp.zeros((1, arch.num_kv_heads, T),
                                    jnp.bfloat16)
            cache = _append_one_slot_at(cache, li, slot, kq, ks, vq, vs,
                                        start)
        xl = A.rmsnorm(
            x, sw.norm.get("weight"), arch.rms_eps
        ) if (arch.family == "llama" or arch.norm_type == "rmsnorm") else (
            A.layernorm(x, sw.norm.get("weight"),
                        sw.norm.get("bias"), 1e-5)
        )
        xl_last = jax.lax.dynamic_index_in_dim(xl[0], true_len - 1, 0,
                                               keepdims=True)[None]
        last = head_logits(sw, xl_last)[0, 0]
        lengths = lengths.at[slot].set(start + true_len)
        return cache, lengths, last

    # ------------------------------------------------------------------
    def _spec_verify(self, sw, cache, lengths, toks):
        """Speculative-decoding verify step: run ``toks`` (S, 1+k) — each
        slot's current token followed by k drafted tokens — through the
        stack in ONE dispatch, appending all 1+k tokens' KV at the slot
        offsets.  Returns (cache, greedy (S, 1+k) argmax next-token ids).

        Acceptance happens host-side; rejected positions simply stay
        beyond the slot's final length — the cache is length-masked, so a
        'rewind' is just not advancing lengths (no copies, TPU-friendly).
        Greedy spec decoding is lossless: outputs equal the per-step
        engine exactly."""
        arch = sw.arch
        S, K1 = toks.shape
        x = sw.embed[toks]  # (S, K1, H)
        pos = lengths[:, None] + jnp.arange(K1)[None, :]
        if sw.embed_pos is not None:
            x = x + sw.embed_pos[pos + 2]
        if arch.family == "llama":
            cos, sin = A.rope_cos_sin(arch, pos)  # (S, K1, d)
        else:
            cos = sin = None
        Tmax = self.buf_len
        j = jnp.arange(Tmax)[None, None, None, :]
        cache_vis = jnp.where(j < lengths[:, None, None, None], 0.0,
                              jnp.finfo(jnp.float32).min)  # (S,1,1,T)
        cache_vis = jnp.broadcast_to(cache_vis, (S, 1, K1, Tmax))
        new_mask = A.causal_mask(K1, K1)[None, None]
        new_mask = jnp.broadcast_to(new_mask, (S, 1, K1, K1))
        mask = jnp.concatenate([cache_vis, new_mask], axis=-1)
        for li, entry in enumerate(sw.blocks):
            k_full, v_full = read_kv(cache, li)
            x, k_new, v_new = _block_apply(
                sw, entry, x, cos, sin, k_full, v_full, mask)
            cache = append_kv(cache, li, k_new, v_new, lengths)
        xl = A.rmsnorm(
            x, sw.norm.get("weight"), arch.rms_eps
        ) if (arch.family == "llama" or arch.norm_type == "rmsnorm") else (
            A.layernorm(x, sw.norm.get("weight"),
                        sw.norm.get("bias"), 1e-5)
        )
        logits = head_logits(sw, xl)
        return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # ------------------------------------------------------------------
    def _decode_step(self, sw, cache, lengths, cur_tokens, active_mask):
        """One token for every active slot (S batched)."""
        arch = sw.arch
        S = self.max_slots
        x = sw.embed[cur_tokens][:, None, :]  # (S, 1, H)
        if sw.embed_pos is not None:
            x = x + sw.embed_pos[lengths + 2][:, None, :]
        if arch.family == "llama":
            cos, sin = A.rope_cos_sin(arch, lengths[:, None])  # (S,1,D)
        else:
            cos = sin = None
        # attention mask over fixed cache length + the new token (the new
        # token sits at concat index T and is always visible)
        T = (self.max_pages_per_slot * self.page_size if self.paged
             else self.buf_len)
        j = jnp.arange(T + 1)[None, None, None, :]
        visible = (j < lengths[:, None, None, None]) | (j == T)
        mask = jnp.where(visible, 0.0, jnp.finfo(jnp.float32).min)
        for li, entry in enumerate(sw.blocks):
            if arch.mla is not None:
                if self._use_mla8a and cache.bits == 8:
                    x, cache = _block_apply_mla_decode_a(
                        sw, entry, x, cos, sin, cache, li, lengths)
                else:
                    x, c_n, r_n = _block_apply_mla_decode(
                        sw, entry, x, cos, sin, cache, li, lengths)
                    cache = append_mla(cache, li, c_n, r_n, lengths)
                continue
            # default dense-int8 route: append-first masked attention
            # (xla8a) — measured 14.84 ms/step vs 17.01 for the concat
            # form (xla8) at 32 slots x 1024 (engine_step_probe r4);
            # attn_impl="xla8" keeps the concat variant reachable
            use_xla8 = (self.attn_impl == "xla8"
                        and cache.bits == 8 and cache.layout == "hhd")
            use_xla8a = ((self._use_xla8
                          or self.attn_impl in ("xla8a", "xla8r"))
                         and cache.bits == 8 and cache.layout == "hhd")
            if (self.attn_impl.startswith("pallas")
                    or self.attn_impl.startswith("bd")
                    or use_xla8 or use_xla8a) \
                    and not self.paged \
                    and (cache.bits == 8 or cache.layout == "bd4"):
                base = self.attn_impl.replace("_interpret", "")
                impl = ("xla8a" if use_xla8a
                        else "xla8" if use_xla8
                        else base if base.startswith("bd") else "i8")
                if impl == "xla8a":
                    x, cache = _block_apply_decode_i8(
                        sw, entry, x, cos, sin, cache, li, lengths,
                        impl=impl)
                    continue
                x, kq, ksn, vq, vsn = _block_apply_decode_i8(
                    sw, entry, x, cos, sin, cache, li, lengths,
                    interpret=self.attn_impl.endswith("interpret"),
                    impl=impl,
                )
                import os as _os
                if _os.environ.get("LCTPU_ABLATE_APPEND") == "1":
                    pass  # probe-only: isolate the dus-append cost
                elif impl == "bd4":
                    from .kv_cache import append_kv4_bd

                    cache = append_kv4_bd(cache, li, kq, ksn, vq, vsn,
                                          lengths)
                else:
                    cache = append_kv_quantized(cache, li, kq, ksn, vq,
                                                vsn, lengths)
                continue
            if self.paged:
                k_full, v_full = paged_read(cache, li)
            else:
                k_full, v_full = read_kv(cache, li)
            hook = None
            if self.shadow is not None and cache.extra is not None:
                hook = partial(_shadow_extra_mask, self.shadow,
                               cache.extra, li)
            x, k_new, v_new = _block_apply(
                sw, entry, x, cos, sin, k_full, v_full, mask,
                q_mask_hook=hook,
            )
            if self.paged:
                cache = paged_append_decode(cache, li, k_new, v_new, lengths)
            else:
                cache = append_kv(cache, li, k_new, v_new, lengths)
        xl = A.rmsnorm(
            x, sw.norm.get("weight"), arch.rms_eps
        ) if (arch.family == "llama" or arch.norm_type == "rmsnorm") else (
            A.layernorm(x, sw.norm.get("weight"),
                        sw.norm.get("bias"), 1e-5)
        )
        import os as _os
        if _os.environ.get("LCTPU_ABLATE_HEAD") == "1":
            # probe-only ablation: 256-row head isolates the lm_head
            # read's contribution to the engine step (tools/
            # engine_step_probe.py; never set in production)
            sw = dataclasses.replace(
                sw, lm_head=sw.lm_head[:256],
                lm_head_scale=(sw.lm_head_scale[:256]
                               if sw.lm_head_scale is not None else None))
        logits = head_logits(sw, xl)[:, 0]
        lengths = jnp.where(active_mask, lengths + 1, lengths)
        return cache, lengths, logits

    # ------------------------------------------------------------------
    def _decode_step_ring(self, sw, cache, ring, lengths0, lengths,
                          cur_tokens, active_mask, ring_pos):
        """One ring-chunk decode step: main cache read-only, fresh token
        into the ring at the SHARED column ``ring_pos``."""
        arch = sw.arch
        x = sw.embed[cur_tokens][:, None, :]
        if sw.embed_pos is not None:
            x = x + sw.embed_pos[lengths + 2][:, None, :]
        if arch.family == "llama":
            cos, sin = A.rope_cos_sin(arch, lengths[:, None])
        else:
            cos = sin = None
        rimpl = "xla8r" if cache.bits == 8 else "xla4r"
        import os as _os
        # deferred ring write (r5 default): ring read-only in the layer
        # loop, one stacked whole-L dus per step (2 ops vs 2*L); the
        # fresh token joins attention as a third in-register flash term.
        # Measured 15.23 vs 15.37 ms/step at 32x2048 (tools/r5logs);
        # LCTPU_RING_DEFER=0 restores the per-layer ring write.
        defer = (rimpl in ("xla8r", "xla4r") and "rkv" in ring
                 and _os.environ.get("LCTPU_RING_DEFER", "1") == "1")
        pend = []
        for li, entry in enumerate(sw.blocks):
            x, out = _block_apply_decode_i8(
                sw, entry, x, cos, sin, cache, li, lengths,
                impl=rimpl, ring=ring, lengths0=lengths0,
                ring_pos=(ring_pos,) if defer else ring_pos,
                interpret=self.attn_impl.endswith("interpret"))
            if defer:
                pend.append(out)
            else:
                ring = out
        if defer:
            kv = jnp.stack([jnp.concatenate([kq, vq], axis=1)
                            for kq, ks, vq, vs in pend])   # (L,S,2H,1,D)
            sv = jnp.stack([jnp.concatenate([ks, vs], axis=1)
                            for kq, ks, vq, vs in pend]
                           ).astype(ring["rs"].dtype)      # (L,S,2H,1)
            ring = dict(
                ring,
                rkv=jax.lax.dynamic_update_slice(
                    ring["rkv"], kv, (0, 0, 0, ring_pos, 0)),
                rs=jax.lax.dynamic_update_slice(
                    ring["rs"], sv, (0, 0, 0, ring_pos)))
        xl = A.rmsnorm(
            x, sw.norm.get("weight"), arch.rms_eps
        ) if (arch.family == "llama" or arch.norm_type == "rmsnorm") else (
            A.layernorm(x, sw.norm.get("weight"),
                        sw.norm.get("bias"), 1e-5)
        )
        if _os.environ.get("LCTPU_ABLATE_HEAD") == "1":
            # probe-only: isolate the head read (engine_step_probe)
            sw = dataclasses.replace(
                sw, lm_head=sw.lm_head[:256],
                lm_head_scale=(sw.lm_head_scale[:256]
                               if sw.lm_head_scale is not None else None))
        logits = head_logits(sw, xl)[:, 0]
        lengths = jnp.where(active_mask, lengths + 1, lengths)
        return ring, lengths, logits

    # ------------------------------------------------------------------
    def _decode_chunk(self, sw, cache, lengths, cur_tokens, active_mask,
                      key, n_steps: int, sp: SamplingParams):
        """n_steps decode iterations with ON-DEVICE sampling; returns the
        (n_steps, S) token buffer.  The carried PRNG key keeps sampling
        semantics identical to the per-step host loop."""
        S = self.max_slots
        buf0 = jnp.zeros((n_steps, S), jnp.int32)

        # the ring chunk is the DEFAULT dense-int8 chunked-decode path
        # (12.21 ms/step vs xla8a's 14.84 at 32x1024, r4 probes); the
        # per-step engine stays on xla8a — outputs agree up to softmax
        # reassociation ties (the exactness invariant chunk==per-step
        # holds on attn_impl='xla8a', see tests)
        base_ai = self.attn_impl.replace("_interpret", "")
        if (((base_ai in ("xla8r", "xla4r") or self._use_xla8)
             and cache.bits == 8 and cache.layout == "hhd")
                or (base_ai == "xla4r" and cache.bits == 4
                    and cache.layout == "hhd")):
            arch = sw.arch
            L, H, D = arch.num_layers, arch.num_kv_heads, arch.head_dim
            if cache.bits == 4:
                D = D // 2  # nibble-packed ring entries
            sdt = (cache.k_scale.dtype if cache.k_scale is not None
                   else jnp.bfloat16)
            import os as _os
            if _os.environ.get("LCTPU_RING_FUSED", "1") != "0":
                # fused ring: k/v share one buffer (2 dus/layer, r5);
                # kv4 rings carry nibble-packed D/2 entries, same layout
                ring = {
                    "rkv": jnp.zeros((L, S, 2 * H, n_steps, D), jnp.int8),
                    "rs": jnp.zeros((L, S, 2 * H, n_steps), sdt),
                }
            else:
                ring = {
                    "rk": jnp.zeros((L, S, H, n_steps, D), jnp.int8),
                    "rv": jnp.zeros((L, S, H, n_steps, D), jnp.int8),
                    "rks": jnp.zeros((L, S, H, n_steps), sdt),
                    "rvs": jnp.zeros((L, S, H, n_steps), sdt),
                }
            lengths0 = lengths

            rcache = cache
            sc_env = _os.environ.get("LCTPU_RING_SPLITCACHE", "auto")
            cache_gb = (cache.k.size + cache.v.size) / 2**30
            # auto: on for kv8 AND kv4 rings whose extra copy fits next
            # to the live cache (measured wins: kv8 15.23->14.11 at
            # 32x2048; kv4 24.23->22.44 at 32x4096, both with defer).
            # The once-per-chunk copy (~cache_gb/0.7 ms) only amortizes
            # at decode_chunk >= 8 (at chunk 4 it exceeds the ~1.1 ms
            # marginal win) — small-chunk engines stay unsplit.
            split = (sc_env == "1"
                     or (sc_env == "auto" and cache.bits in (4, 8)
                         and cache_gb <= 6.0
                         and self.decode_chunk >= 8))
            if (split and cache.k_scale is not None
                    and cache.extra is None):
                # r5 engine-gap WIN (measured 15.23 -> 14.11 ms/step at
                # 32x2048 WITH defer): materialize each layer's cache
                # slab as its OWN buffer (one barrier'd copy per layer,
                # amortized over the chunk — ~0.13 ms/step at chunk 48)
                # so the chunk loop reads L separate loop-invariant
                # operands that XLA overlaps with the weight kernels.
                # Split alone (without the deferred ring) is a WASH —
                # the overlap only appears once the layer loop carries
                # no per-layer ring writes.  auto: on for kv8 rings
                # whose extra copy fits next to the live cache (<=6 GB
                # codes); kv4 rides the same branch via =1 (unmeasured).
                # Flush still targets the original stacked cache.
                import dataclasses as _dc

                rcache = _dc.replace(
                    cache,
                    k=tuple(jax.lax.optimization_barrier(cache.k[li])
                            for li in range(L)),
                    v=tuple(jax.lax.optimization_barrier(cache.v[li])
                            for li in range(L)),
                    k_scale=tuple(
                        jax.lax.optimization_barrier(cache.k_scale[li])
                        for li in range(L)),
                    v_scale=tuple(
                        jax.lax.optimization_barrier(cache.v_scale[li])
                        for li in range(L)),
                )

            def rbody(i, carry):
                ring, lengths, cur, key, buf = carry
                ring, lengths, logits = self._decode_step_ring(
                    sw, rcache, ring, lengths0, lengths, cur,
                    active_mask, i)
                key, sk = jax.random.split(key)
                nxt = sample(logits, sp, sk)
                return (ring, lengths, nxt, key, buf.at[i].set(nxt))

            ring, lengths, cur, key, buf = jax.lax.fori_loop(
                0, n_steps, rbody,
                (ring, lengths, cur_tokens, key, buf0))
            cache = flush_ring_to_cache(cache, ring, lengths0)
            return (cache, lengths, cur, key, buf)

        def body(i, carry):
            cache, lengths, cur, key, buf = carry
            cache, lengths, logits = self._decode_step(
                sw, cache, lengths, cur, active_mask)
            key, sk = jax.random.split(key)
            nxt = sample(logits, sp, sk)
            return (cache, lengths, nxt, key, buf.at[i].set(nxt))

        return jax.lax.fori_loop(
            0, n_steps, body, (cache, lengths, cur_tokens, key, buf0))

    # ------------------------------------------------------------------
    def _spec_round(self, k: int, eos_token_id, results, active_mask):
        """One speculative round: draft k tokens per active slot
        (n-gram), verify all in one dispatch, accept the longest matching
        prefix + one model token per slot (1..k+1 tokens emitted)."""
        n = self.spec["ngram"]
        S = self.max_slots
        cur_np = np.asarray(self.cur_tokens)
        toks = np.zeros((S, 1 + k), np.int32)
        for s, r in enumerate(self.slot_req):
            toks[s, 0] = cur_np[s]
            if r is not None:
                hist = list(map(int, r.prompt)) + r.out_tokens
                d = _ngram_draft(hist, n, k)
                toks[s, 1:1 + len(d)] = d
        self.cache, greedy = self._spec_jit(
            self.sw, self.cache, self.lengths, jnp.asarray(toks))
        g_np = np.asarray(greedy)  # (S, 1+k)
        accs = np.zeros(S, np.int32)
        new_cur = np.array(cur_np)
        done_slots = set()
        for s, r in enumerate(self.slot_req):
            if r is None:
                continue
            a = 0
            while a < k and toks[s, a + 1] == g_np[s, a]:
                a += 1
            accs[s] = a
            new_cur[s] = int(g_np[s, a])
            emitted = [int(t) for t in toks[s, 1:1 + a]] + [int(g_np[s, a])]
            self.spec_stats["rounds"] += 1
            self.spec_stats["emitted"] += len(emitted)
            for tok in emitted:
                r.out_tokens.append(tok)
                hit_eos = eos_token_id is not None and tok == eos_token_id
                if len(r.out_tokens) >= r.max_new_tokens or hit_eos:
                    results[r.req_id] = r.out_tokens
                    done_slots.add(s)
                    break
        # ONE batched device update: advance by the accepted count + 1;
        # rejected draft KV simply stays beyond the new length (masked)
        self.lengths = jnp.where(
            active_mask, self.lengths + 1 + jnp.asarray(accs), self.lengths)
        self.cur_tokens = jnp.where(active_mask, jnp.asarray(new_cur),
                                    self.cur_tokens)
        if done_slots:
            idx = jnp.asarray(sorted(done_slots))
            self.lengths = self.lengths.at[idx].set(0)
            for slot in done_slots:
                self.slot_req[slot] = None

    # ------------------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self.prefill_buckets:
            if n <= b:
                return b
        return self.max_len

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        sampling: SamplingParams = SamplingParams(),
        eos_token_id: Optional[int] = None,
    ) -> List[List[int]]:
        """Continuous-batching generation over all prompts."""
        queue = deque(
            Request(i, np.asarray(p, np.int32), sampling.max_new_tokens)
            for i, p in enumerate(prompts)
        )
        results: Dict[int, List[int]] = {}
        n_total = len(queue)

        while len(results) < n_total:
            # admit into free slots: one BATCHED prefill dispatch per
            # length bucket (all simultaneously-admitted prompts of a
            # bucket share one weight read; serial per-slot prefill
            # dispatched N full passes while decode stalled — VERDICT r2
            # #3).  Paged mode keeps the per-request path (page mapping
            # is per-slot host work).
            admits: List[Tuple[int, Request]] = []
            for slot in range(self.max_slots):
                if self.slot_req[slot] is None \
                        and slot not in self.prefilling and queue:
                    req = queue.popleft()
                    if self.prefill_chunk is not None \
                            and len(req.prompt) > self.prefill_chunk:
                        # long prompt: admit incrementally, one chunk per
                        # scheduler iteration (decode keeps running)
                        self.lengths = self.lengths.at[slot].set(0)
                        self.prefilling[slot] = (req, 0)
                        continue
                    admits.append((slot, req))
            if admits and self.paged:
                for slot, req in admits:
                    T = self._bucket(len(req.prompt))
                    self._map_pages(slot, T)
                    ids = np.zeros((1, T), np.int32)
                    ids[0, : len(req.prompt)] = req.prompt
                    self.cache, self.lengths, logits = self._prefill_jit(
                        self.sw, self.cache, self.lengths, jnp.asarray(ids),
                        jnp.asarray(slot), jnp.asarray(len(req.prompt)), T=T,
                    )
                    self.key, sk = jax.random.split(self.key)
                    tok = int(sample(logits[None, :], sampling, sk)[0])
                    req.out_tokens.append(tok)
                    self.cur_tokens = self.cur_tokens.at[slot].set(tok)
                    self.slot_req[slot] = req
            elif admits:
                # prefix-cache hits: seed the slot with the registered
                # prefix KV and prefill only the suffix
                if self.prefix is not None:
                    rest: List[Tuple[int, Request]] = []
                    ptoks = self.prefix["tokens"]
                    Tp = self.prefix["len"]
                    for slot, req in admits:
                        suffix = req.prompt[Tp:]
                        hit = (len(req.prompt) > Tp
                               and [int(t) for t in req.prompt[:Tp]]
                               == ptoks
                               and Tp + self._bucket(len(suffix))
                               <= self.max_len)
                        if not hit:
                            rest.append((slot, req))
                            continue
                        T = self._bucket(len(suffix))
                        ids = np.zeros((1, T), np.int32)
                        ids[0, :len(suffix)] = suffix
                        pk, pks, pv, pvs = self.prefix["kv"]
                        (self.cache, self.lengths,
                         logits) = self._prefill_suffix_jit(
                            self.sw, self.cache, self.lengths,
                            jnp.asarray(ids), jnp.asarray(slot),
                            jnp.asarray(len(suffix)), pk, pks, pv, pvs,
                            T=T)
                        self.key, sk = jax.random.split(self.key)
                        tok = int(sample(logits[None, :], sampling, sk)[0])
                        req.out_tokens.append(tok)
                        self.cur_tokens = self.cur_tokens.at[slot].set(tok)
                        self.slot_req[slot] = req
                    admits = rest
                by_bucket: Dict[int, List[Tuple[int, Request]]] = {}
                for slot, req in admits:
                    by_bucket.setdefault(
                        self._bucket(len(req.prompt)), []).append(
                            (slot, req))
                # cap rows-per-dispatch: a batched prefill of n*T rows
                # materializes (rows, inter) bf16 activations per layer —
                # 32 slots x 1024 ctx in ONE dispatch OOMed the 16G chip
                # (r4 probe: 18.8G).  Chunk each bucket so rows <=
                # LCTPU_PREFILL_ROWS (default 8192: gateup transient
                # <= 448MB); chunk sizes stay powers of two so the
                # compile-shape count stays bounded.
                import os as _os

                # 4096 rows: at 8192 the per-layer bf16/int8 transients
                # around the prefill matmul custom calls stack to ~8GB
                # and OOM next to the weights+cache args (r4 T=2048 probe)
                rows_cap = int(_os.environ.get("LCTPU_PREFILL_ROWS",
                                               "4096"))
                groups: List[Tuple[int, List[Tuple[int, Request]]]] = []
                for T, full_group in sorted(by_bucket.items()):
                    cap = max(1, rows_cap // T)
                    cap = 1 << (cap.bit_length() - 1)  # pow2 floor
                    for i in range(0, len(full_group), cap):
                        groups.append((T, full_group[i:i + cap]))
                for T, group in groups:
                    # pad N to a power of two by repeating row 0: bounded
                    # compile count, identical scatter writes
                    n = len(group)
                    nb = 1 << (n - 1).bit_length()
                    ids = np.zeros((nb, T), np.int32)
                    slots_arr = np.zeros((nb,), np.int32)
                    tlens = np.zeros((nb,), np.int32)
                    for i in range(nb):
                        slot, req = group[min(i, n - 1)]
                        ids[i, : len(req.prompt)] = req.prompt
                        slots_arr[i] = slot
                        tlens[i] = len(req.prompt)
                    (self.cache, self.lengths,
                     logits) = self._prefill_batch_jit(
                        self.sw, self.cache, self.lengths, jnp.asarray(ids),
                        jnp.asarray(slots_arr), jnp.asarray(tlens), T=T)
                    toks = None
                    new_slots, new_toks = [], []
                    for i, (slot, req) in enumerate(group):
                        self.key, sk = jax.random.split(self.key)
                        if sampling.temperature == 0.0:
                            if toks is None:  # one batched argmax
                                toks = np.asarray(
                                    sample(logits, sampling, sk))
                            tok = int(toks[i])
                        else:
                            tok = int(sample(logits[i][None, :],
                                             sampling, sk)[0])
                        req.out_tokens.append(tok)
                        new_slots.append(slot)
                        new_toks.append(tok)
                        self.slot_req[slot] = req
                    # ONE batched device update (host-loop dispatch audit:
                    # never per-slot .at[].set in generate())
                    self.cur_tokens = self.cur_tokens.at[
                        jnp.asarray(new_slots)].set(jnp.asarray(new_toks))

            # one prefill CHUNK for one admitting long prompt, then fall
            # through to the decode step for the running slots
            if self.prefilling:
                slot = next(iter(self.prefilling))
                req, pos = self.prefilling[slot]
                C = self.prefill_chunk
                chunk = req.prompt[pos:pos + C]
                ids = np.zeros((1, C), np.int32)
                ids[0, :len(chunk)] = chunk
                self.cache, self.lengths, logits = self._prefill_chunk_jit(
                    self.sw, self.cache, self.lengths, jnp.asarray(ids),
                    jnp.asarray(slot), jnp.asarray(len(chunk)), T=C)
                pos += len(chunk)
                if pos >= len(req.prompt):
                    del self.prefilling[slot]
                    self.key, sk = jax.random.split(self.key)
                    tok = int(sample(logits[None, :], sampling, sk)[0])
                    req.out_tokens.append(tok)
                    self.cur_tokens = self.cur_tokens.at[slot].set(tok)
                    self.slot_req[slot] = req
                else:
                    self.prefilling[slot] = (req, pos)
            active = [r is not None for r in self.slot_req]
            if not any(active):
                continue
            if self.paged:
                # map a fresh page for any slot whose next token crosses a
                # page boundary (host-side allocator, table is a jit arg)
                lengths_np = np.asarray(self.lengths)
                for slot, req in enumerate(self.slot_req):
                    if req is not None:
                        self._map_pages(slot, int(lengths_np[slot]) + 1)
            active_mask = jnp.asarray(active)
            if self.spec is not None and sampling.temperature == 0.0:
                k = self.spec["draft_len"]
                lens_np = np.asarray(self.lengths)
                if all(int(lens_np[s]) + 1 + k <= self.max_len
                       for s, r in enumerate(self.slot_req)
                       if r is not None):
                    self._spec_round(k, eos_token_id, results, active_mask)
                    continue
                # near the cap: fall through to the exact per-step path
            if self.decode_chunk > 1 and not self.paged:
                live = [r for r in self.slot_req if r is not None]
                remaining = min(r.max_new_tokens - len(r.out_tokens)
                                for r in live)
                lens_np = np.asarray(self.lengths)
                room = self.max_len - 1 - max(
                    int(lens_np[sl])
                    for sl, r in enumerate(self.slot_req) if r is not None)
                n = max(1, min(self.decode_chunk, remaining, room))
                # bucket the (static) chunk length to powers of two so
                # tail chunks / heterogeneous max_new_tokens don't each
                # trigger a 10-25 min remote recompile of the n-step loop
                # (ADVICE r2): largest power-of-two <= n, capped by
                # decode_chunk — never overshoots, so semantics and the
                # room guarantee are unchanged
                if n not in (1, self.decode_chunk):
                    n = 1 << (n.bit_length() - 1)
                (self.cache, self.lengths, self.cur_tokens, self.key,
                 buf) = self._decode_chunk_jit(
                    self.sw, self.cache, self.lengths, self.cur_tokens,
                    active_mask, self.key, n_steps=n, sp=sampling)
                tok_rows = np.asarray(buf)  # (n, S)
            else:
                self.cache, self.lengths, logits = self._decode_jit(
                    self.sw, self.cache, self.lengths, self.cur_tokens,
                    active_mask
                )
                self.key, sk = jax.random.split(self.key)
                tok_rows = np.asarray(sample(logits, sampling, sk))[None]
            # host-side bookkeeping: ONE device->host read for lengths
            # and ONE batched device update each for cur_tokens/lengths —
            # a per-(step, slot) .at[].set here costs a full dispatch
            # round-trip per token (measured 0.47 s/step through the
            # tunnel; the decode itself is milliseconds)
            lengths_np = np.asarray(self.lengths)
            done_slots = set()
            n_rows = tok_rows.shape[0]
            for ri, row in enumerate(tok_rows):
                for slot, req in enumerate(self.slot_req):
                    if req is None or slot in done_slots:
                        continue
                    tok = int(row[slot])
                    req.out_tokens.append(tok)
                    hit_eos = (eos_token_id is not None
                               and tok == eos_token_id)
                    # lengths_np is the POST-chunk value; only the final
                    # row can actually be at the cap (the chunk length is
                    # clamped by ``room`` so no slot overflows mid-chunk)
                    # — checking every row against the post-chunk value
                    # retired slots at row 0 and dropped up to n-1 valid
                    # tokens (ADVICE r2)
                    full = (ri == n_rows - 1
                            and int(lengths_np[slot]) >= self.max_len - 1)
                    if (len(req.out_tokens) >= req.max_new_tokens or hit_eos
                            or full):
                        results[req.req_id] = req.out_tokens
                        done_slots.add(slot)
            # device cur_tokens already carries each slot's last sampled
            # token (the chunk loop feeds it forward); per-step mode needs
            # one batched correction for active slots
            if tok_rows.shape[0] == 1:
                self.cur_tokens = jnp.where(
                    active_mask, jnp.asarray(tok_rows[-1]), self.cur_tokens)
            if done_slots:
                idx = jnp.asarray(sorted(done_slots))
                self.lengths = self.lengths.at[idx].set(0)
                for slot in done_slots:
                    self.slot_req[slot] = None
                    if self.paged:
                        self._release_pages(slot)
        return [results[i] for i in range(n_total)]


def _dus_rows(buf, layer: int, slots, rows):
    """Write rows (N, ...) into buf (L, S, ...) at (layer, slots[i], 0...)
    via N sequential dynamic_update_slice ops.  N is static and small;
    XLA aliases each dus in place under donation — an advanced-index
    scatter here compiled to a pathological TPU scatter (the r3 TTFT
    probe measured the batched prefill LOSING to serial because of it).
    Duplicate slot indices (N-bucket padding) write identical values."""
    N = rows.shape[0]
    zeros = (0,) * (buf.ndim - 2)
    for i in range(N):
        buf = jax.lax.dynamic_update_slice(
            buf, rows[i:i + 1][None].astype(buf.dtype),
            (layer, slots[i]) + zeros)
    return buf


def _append_slots(cache: KVCache, layer: int, slots, k_new, v_new):
    """Write a batch of prompts' KV (N, H, T, D) into ``slots`` at
    position 0 (batched prefill)."""
    from .kv_cache import quantize_kv, quantize_kv4

    if cache.bits == 4:
        kq, ks = quantize_kv4(k_new)
        vq, vs = quantize_kv4(v_new)
    elif cache.bits == 8:
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
    else:
        kq, vq, ks, vs = (k_new.astype(cache.k.dtype),
                          v_new.astype(cache.v.dtype), None, None)
    T = k_new.shape[2]
    if cache.layout in ("bd", "bd4"):
        N, H, _, D = kq.shape  # D = head_dim (bd) or head_dim/2 (bd4)
        kq = kq.transpose(0, 1, 3, 2).reshape(N, H * D, T)
        vq = vq.transpose(0, 2, 1, 3).reshape(N, T, H * D)
    k = _dus_rows(cache.k, layer, slots, kq)
    v = _dus_rows(cache.v, layer, slots, vq)
    if ks is None:
        return dataclasses.replace(cache, k=k, v=v)
    k_scale = _dus_rows(cache.k_scale, layer, slots, ks)
    v_scale = _dus_rows(cache.v_scale, layer, slots, vs)
    return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                               v_scale=v_scale)


def _append_slots_mla(cache: KVCache, layer: int, slots, c_n, r_n):
    """Batched-prefill MLA writes: (N, T, r)/(N, T, rope_d) into slots."""
    if cache.bits == 8:
        cq, cs = quantize_kv(c_n)
        rq, rs = quantize_kv(r_n)
        return dataclasses.replace(
            cache,
            k=_dus_rows(cache.k, layer, slots, cq),
            v=_dus_rows(cache.v, layer, slots, rq),
            k_scale=_dus_rows(cache.k_scale, layer, slots, cs),
            v_scale=_dus_rows(cache.v_scale, layer, slots, rs))
    return dataclasses.replace(
        cache,
        k=_dus_rows(cache.k, layer, slots, c_n),
        v=_dus_rows(cache.v, layer, slots, r_n))


def _append_one_slot_at(cache: KVCache, layer: int, slot, kq, ks, vq, vs,
                        off: int):
    """Write already-quantized (1, H, T, D) KV at position ``off`` of one
    slot (prefix-cache seeding + suffix prefill; hhd layout)."""
    k = jax.lax.dynamic_update_slice(
        cache.k, kq.astype(cache.k.dtype)[None], (layer, slot, 0, off, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, vq.astype(cache.v.dtype)[None], (layer, slot, 0, off, 0))
    if cache.bits == 16:
        return dataclasses.replace(cache, k=k, v=v)
    k_scale = jax.lax.dynamic_update_slice(
        cache.k_scale, ks.astype(cache.k_scale.dtype)[None],
        (layer, slot, 0, off))
    v_scale = jax.lax.dynamic_update_slice(
        cache.v_scale, vs.astype(cache.v_scale.dtype)[None],
        (layer, slot, 0, off))
    return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                               v_scale=v_scale)


def _append_one_slot_mla(cache: KVCache, layer: int, slot, c_n, r_n):
    """Write one prompt's MLA latents (1, T, r)/(1, T, rope_d) at position
    0 of ``slot``."""
    if cache.bits == 8:
        cq, cs = quantize_kv(c_n)
        rq, rs = quantize_kv(r_n)
        k = jax.lax.dynamic_update_slice(
            cache.k, cq[None].astype(cache.k.dtype), (layer, slot, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache.v, rq[None].astype(cache.v.dtype), (layer, slot, 0, 0))
        k_scale = jax.lax.dynamic_update_slice(
            cache.k_scale, cs[None], (layer, slot, 0))
        v_scale = jax.lax.dynamic_update_slice(
            cache.v_scale, rs[None], (layer, slot, 0))
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)
    k = jax.lax.dynamic_update_slice(
        cache.k, c_n[None].astype(cache.k.dtype), (layer, slot, 0, 0))
    v = jax.lax.dynamic_update_slice(
        cache.v, r_n[None].astype(cache.v.dtype), (layer, slot, 0, 0))
    return dataclasses.replace(cache, k=k, v=v)


def _append_one_slot(cache: KVCache, layer: int, slot, k_new, v_new):
    """Write (1, H, T, D) new KV at position 0 of one slot (prefill)."""
    from .kv_cache import quantize_kv, quantize_kv4

    if cache.layout == "bd4":
        _, H, T, D = k_new.shape
        kq, ks = quantize_kv4(k_new)   # (1, H, T, D/2)
        vq, vs = quantize_kv4(v_new)
        kslab = kq[0].transpose(0, 2, 1).reshape(H * D // 2, T)
        vslab = vq[0].transpose(1, 0, 2).reshape(T, H * D // 2)
        k = jax.lax.dynamic_update_slice(
            cache.k, kslab[None, None], (layer, slot, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache.v, vslab[None, None], (layer, slot, 0, 0))
        k_scale = jax.lax.dynamic_update_slice(
            cache.k_scale, ks[None], (layer, slot, 0, 0))
        v_scale = jax.lax.dynamic_update_slice(
            cache.v_scale, vs[None], (layer, slot, 0, 0))
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)
    if cache.bits == 4:
        kq, ks = quantize_kv4(k_new)
        vq, vs = quantize_kv4(v_new)
        k = jax.lax.dynamic_update_slice(
            cache.k, kq.astype(cache.k.dtype)[None],
            (layer, slot, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache.v, vq.astype(cache.v.dtype)[None],
            (layer, slot, 0, 0, 0))
        k_scale = jax.lax.dynamic_update_slice(
            cache.k_scale, ks[None], (layer, slot, 0, 0))
        v_scale = jax.lax.dynamic_update_slice(
            cache.v_scale, vs[None], (layer, slot, 0, 0))
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)

    if cache.layout == "bd":
        import dataclasses as _dc

        _, H, T, D = k_new.shape
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        # (1,H,T,D) -> K slab (H*D, T), V slab (T, H*D)
        kslab = kq[0].transpose(0, 2, 1).reshape(H * D, T)
        vslab = vq[0].transpose(1, 0, 2).reshape(T, H * D)
        k = jax.lax.dynamic_update_slice(
            cache.k, kslab[None, None], (layer, slot, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache.v, vslab[None, None], (layer, slot, 0, 0))
        k_scale = jax.lax.dynamic_update_slice(
            cache.k_scale, ks[None], (layer, slot, 0, 0))
        v_scale = jax.lax.dynamic_update_slice(
            cache.v_scale, vs[None], (layer, slot, 0, 0))
        return _dc.replace(cache, k=k, v=v, k_scale=k_scale,
                           v_scale=v_scale)
    if cache.bits == 8:
        kq, ks = quantize_kv(k_new)
        vq, vs = quantize_kv(v_new)
        k = jax.lax.dynamic_update_slice(
            cache.k, kq.astype(cache.k.dtype)[None],
            (layer, slot, 0, 0, 0),
        )
        v = jax.lax.dynamic_update_slice(
            cache.v, vq.astype(cache.v.dtype)[None],
            (layer, slot, 0, 0, 0),
        )
        k_scale = jax.lax.dynamic_update_slice(
            cache.k_scale, ks[None], (layer, slot, 0, 0)
        )
        v_scale = jax.lax.dynamic_update_slice(
            cache.v_scale, vs[None], (layer, slot, 0, 0)
        )
        return dataclasses.replace(cache, k=k, v=v, k_scale=k_scale,
                                   v_scale=v_scale)
    k = jax.lax.dynamic_update_slice(
        cache.k, k_new.astype(cache.k.dtype)[None], (layer, slot, 0, 0, 0)
    )
    v = jax.lax.dynamic_update_slice(
        cache.v, v_new.astype(cache.v.dtype)[None], (layer, slot, 0, 0, 0)
    )
    return dataclasses.replace(cache, k=k, v=v)
