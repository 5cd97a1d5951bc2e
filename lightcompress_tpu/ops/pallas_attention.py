"""Pallas TPU decode-attention kernel over the int8-quantized KV cache.

SURVEY §2.6 / §7 row: "paged/quantized KV-cache attention".  XLA's decode
attention at (B=32, H_kv=8, S=1024, D=128) reads KV at only ~60 GB/s
effective (256 tiny per-head dots, latency-bound); this kernel batches a
slab of batch rows per grid step so each DMA is multi-MB (the measured
~640 GB/s regime, tools/dma_experiments6.py) and dequantizes int8 KV
in-register.

Numerics: scores = (q @ k_int8^T) * k_scale[t]; probs in f32;
ctx = (probs * v_scale[t]) @ v_int8 — identical to the XLA int8-KV path
(bench.py decode_step), no extra quantization of q or probs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_matmul import _vmem_limit_bytes

Array = jax.Array


def _attn_kernel_i8(q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *,
                    scale: float):
    """Fully-int8 decode attention over a (hb, S, D) slab of (batch, head)
    pairs.  Both dots run in MXU int8 mode (no VPU upcast of the KV slab —
    the bf16 kernel's astype of the whole block costs more than its dots):
    scores = (q8 @ k8^T) * qs * ks; probs are per-row requantized to int8
    for the PV dot (numerics of ops.scaled_matmul.int8_decode_attention).
    """
    q8 = q_ref[:]                                  # (hb, G, D) int8
    sc32 = jax.lax.dot_general(
        q8, k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)          # (hb, G, S)
    qsf = qs_ref[:].astype(jnp.float32)
    scf = sc32.astype(jnp.float32) * (qsf[:, :, None] * scale) * \
        ks_ref[:].astype(jnp.float32)[:, None, :]
    m = jnp.max(scf, axis=-1, keepdims=True)
    e = jnp.exp(scf - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    pv = e * vs_ref[:].astype(jnp.float32)[:, None, :]
    ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-20) / 127.0
    p8 = jnp.round(pv / ps).astype(jnp.int8)
    ctx32 = jax.lax.dot_general(
        p8, v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)          # (hb, G, D)
    o_ref[:] = ctx32.astype(jnp.float32) * (ps / denom)


def _attn_kernel_i8_append(q_ref, qs_ref, kn_ref, kns_ref, vn_ref, vns_ref,
                           k_ref, ks_ref, v_ref, vs_ref, *refs,
                           scale: float, masked: bool = False):
    """int8 decode attention over a READ-ONLY cache slab plus one fresh
    token per (batch, head) passed separately — the serving shape.  Keeping
    the cache out of the softmax concat means XLA never materializes an
    appended copy of the 30+MB per-layer cache to feed the kernel (the
    round-1 kernel lost end-to-end exactly because pallas_call forced the
    jnp.concatenate(cache, new) to materialize ~67MB/layer).
    With ``masked``, an extra (hb, 1) int32 per-row length ref gates cache
    columns (continuous-batching slots of differing fill; the fresh token
    stays visible even at length 0)."""
    if masked:
        len_ref, o_ref = refs
    else:
        (o_ref,) = refs
    q8 = q_ref[:]                                  # (hb, G, D) int8
    sc32 = jax.lax.dot_general(
        q8, k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)          # (hb, G, S)
    qsf = qs_ref[:].astype(jnp.float32)            # (hb, G)
    scf = sc32.astype(jnp.float32) * (qsf[:, :, None] * scale) * \
        ks_ref[:].astype(jnp.float32)[:, None, :]
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, scf.shape, 2)
        scf = jnp.where(col < len_ref[:, 0][:, None, None], scf, -jnp.inf)
    # fresh token: one extra score column, computed in-register as an
    # elementwise multiply-reduce — the batched (hb,G,D)x(hb,D) matrix-
    # vector dot_general crashed Mosaic's lowering at hb=16 slab shapes
    # (r2 REPORT), and the VPU reduce over a (hb,G,D) block is free
    scn32 = jnp.sum(
        q8.astype(jnp.int32) * kn_ref[:][:, None, :].astype(jnp.int32),
        axis=-1)                                   # (hb, G)
    scnf = scn32.astype(jnp.float32) * (qsf * scale) * \
        kns_ref[:, 0].astype(jnp.float32)[:, None]
    m = jnp.maximum(jnp.max(scf, axis=-1), scnf)[..., None]  # (hb, G, 1)
    e = jnp.exp(scf - m)
    en = jnp.exp(scnf - m[..., 0])                 # (hb, G)
    denom = jnp.sum(e, axis=-1) + en               # (hb, G)
    pv = e * vs_ref[:].astype(jnp.float32)[:, None, :]
    pvn = en * vns_ref[:, 0].astype(jnp.float32)[:, None]   # (hb, G)
    ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-20) / 127.0
    p8 = jnp.round(pv / ps).astype(jnp.int8)
    ctx32 = jax.lax.dot_general(
        p8, v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)          # (hb, G, D)
    ctx = ctx32.astype(jnp.float32) * ps
    ctx = ctx + pvn[:, :, None] * vn_ref[:].astype(jnp.float32)[:, None, :]
    o_ref[:] = ctx / denom[..., None]


def _quantize_q(q: Array):
    """Per-(b, h, g) symmetric int8 quantization of the decode query."""
    qf = q.astype(jnp.float32)
    amax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
    qs = jnp.maximum(amax, 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
    return q8, qs[..., 0]


@functools.partial(jax.jit, static_argnames=("h_block", "interpret"))
def decode_attention_i8(
    q: Array,            # (B, H, G, D) bf16/f32
    kq: Array,           # (B, H, S, D) int8
    ks: Array,           # (B, H, S) f32/bf16
    vq: Array,           # (B, H, S, D) int8
    vs: Array,           # (B, H, S) f32/bf16
    k_new: Optional[Array] = None,   # (B, H, D) int8 — fresh token K
    kns: Optional[Array] = None,     # (B, H) its scale
    v_new: Optional[Array] = None,
    vns: Optional[Array] = None,
    lengths: Optional[Array] = None,  # (B,) int32 valid cache length/row
    h_block: int = 32,
    interpret: bool = False,
) -> Array:
    """Single-token GQA decode attention, fully on the int8 MXU.

    Flattens (B, H) into one slab axis so each grid step DMAs a contiguous
    multi-MB KV block (h_block=32 -> 4.2MB at S=1024, D=128 — the measured
    ~640 GB/s regime), with batched int8 dots instead of per-(b,h) loops.
    When ``k_new`` is given the cache stays read-only and the fresh token
    contributes one extra softmax column in-register (no cache concat/copy
    anywhere).  Returns (B, H, G, D) f32.
    """
    B, H, G, D = q.shape
    S = kq.shape[2]
    BH = B * H
    h_block = min(h_block, BH)
    while BH % h_block:  # largest divisor of B*H under the requested slab
        h_block -= 1
    q8, qs = _quantize_q(q)
    q8 = q8.reshape(BH, G, D)
    qs = qs.reshape(BH, G)
    kq2 = kq.reshape(BH, S, D)
    vq2 = vq.reshape(BH, S, D)
    ks2 = ks.reshape(BH, S)
    vs2 = vs.reshape(BH, S)
    grid = (BH // h_block,)
    append = k_new is not None
    sdt = ks2.dtype

    def spec3(sz, d):
        return pl.BlockSpec((h_block, sz, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec2(sz):
        return pl.BlockSpec((h_block, sz), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    if append:
        masked = lengths is not None
        kernel = functools.partial(_attn_kernel_i8_append, scale=D ** -0.5,
                                   masked=masked)
        args = [q8, qs, k_new.reshape(BH, D),
                kns.reshape(BH, 1).astype(sdt),
                v_new.reshape(BH, D), vns.reshape(BH, 1).astype(sdt),
                kq2, ks2, vq2, vs2]
        in_specs = [spec3(G, D), spec2(G), spec2(D), spec2(1),
                    spec2(D), spec2(1),
                    spec3(S, D), spec2(S), spec3(S, D), spec2(S)]
        if masked:
            args.append(jnp.broadcast_to(
                lengths.astype(jnp.int32)[:, None], (B, H)
            ).reshape(BH, 1))
            in_specs.append(spec2(1))
        args = tuple(args)
    else:
        kernel = functools.partial(_attn_kernel_i8, scale=D ** -0.5)
        args = (q8, qs, kq2, ks2, vq2, vs2)
        in_specs = [spec3(G, D), spec2(G),
                    spec3(S, D), spec2(S), spec3(S, D), spec2(S)]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH, G, D), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec3(G, D),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * BH * G * S * D,
            bytes_accessed=2 * BH * S * (D + sdt.itemsize),
            transcendentals=BH * G * S,
        ),
    )(*args)
    return out.reshape(B, H, G, D)


def _attn_kernel_bd(q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                    *refs, n_heads: int, group: int, scale: float,
                    masked: bool = False):
    """Block-diagonal GQA decode attention over one (bb, ...) batch slab.

    The twice-measured failure of Pallas decode attention on this toolchain
    is Mosaic's lowering of the G=4-row (GQA group) dots — batched or not,
    they run ~2x slower than the XLA einsum.  This kernel removes small dots
    entirely: the query arrives as a *block-diagonal* int8 matrix
    ``q_bd (HG=H*G, H*D)`` whose rows h*G+g carry q[h, g] in columns
    h*D..(h+1)*D and zeros elsewhere, and the K cache is stored
    feature-major ``(H*D, S)`` so scores for ALL heads of one batch element
    are ONE full-size int8 MXU dot:

        scores = q_bd @ k_slab            # (HG, S) int32

    Row h*G+g of the product touches only k columns of head h — exact GQA
    scores with zero wasted correctness (the MXU idles at decode anyway, so
    the 8x zero-block FLOPs are free).  PV is the mirror image: probs
    (HG, S) @ v_slab (S, H*D) computes all heads at once; each output row
    keeps only its own head's D-column block.

    Outputs are *unnormalized* (plus per-row softmax max ``m`` and denom
    ``d``) so the caller can merge the fresh decode token's contribution in
    XLA (flash-decoding style) — the cache stays read-only and nothing ever
    materializes an appended copy to feed the kernel.
    """
    if masked:
        len_ref, o_ref, m_ref, d_ref = refs
    else:
        o_ref, m_ref, d_ref = refs
    H, G = n_heads, group
    bb = q_ref.shape[0]
    for b in range(bb):
        sc32 = jax.lax.dot_general(
            q_ref[b], k_ref[b], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # (HG, S)
        scf = sc32.astype(jnp.float32) * \
            (qs_ref[b, :, 0].astype(jnp.float32)[:, None] * scale)
        # per-head K scale over this head's 4-row block (static slices)
        ksf = ks_ref[b].astype(jnp.float32)                # (H, S)
        scf = jnp.concatenate(
            [scf[h * G:(h + 1) * G] * ksf[h][None, :] for h in range(H)], 0)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scf.shape, 1)
            scf = jnp.where(col < len_ref[b, 0, 0], scf, -jnp.inf)
        # finite floor so an empty slot (length 0) yields denom=0/ctx=0
        # instead of NaN; the fresh-token merge then carries everything
        m = jnp.maximum(jnp.max(scf, axis=-1, keepdims=True),
                        -1e30)                             # (HG, 1)
        e = jnp.exp(scf - m)
        denom = jnp.sum(e, axis=-1)                        # (HG,)
        vsf = vs_ref[b].astype(jnp.float32)                # (H, S)
        pv = jnp.concatenate(
            [e[h * G:(h + 1) * G] * vsf[h][None, :] for h in range(H)], 0)
        ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-20) / 127.0
        p8 = jnp.round(pv / ps).astype(jnp.int8)
        ctx32 = jax.lax.dot_general(
            p8, v_ref[b], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # (HG, H*D)
        ctx = ctx32.astype(jnp.float32) * ps               # unnormalized
        D = v_ref.shape[2] // H
        o_ref[b] = jnp.concatenate(
            [ctx[h * G:(h + 1) * G, h * D:(h + 1) * D] for h in range(H)], 0)
        m_ref[b, :, 0] = m[:, 0]
        d_ref[b, :, 0] = denom


def make_q_blockdiag(q8: Array, n_heads: int) -> Array:
    """(B, H, G, D) int8 -> (B, H*G, H*D) block-diagonal decode query."""
    B, H, G, D = q8.shape
    eye = jnp.eye(n_heads, dtype=q8.dtype)                 # (H, H)
    # (B, H, G, Hcol, D): row-head h, col-head hc
    bd = q8[:, :, :, None, :] * eye[None, :, None, :, None]
    return bd.reshape(B, H * G, H * D)


@functools.partial(jax.jit, static_argnames=("b_block", "interpret"))
def decode_attention_bd(
    q: Array,            # (B, H, G, D) bf16/f32
    kt: Array,           # (B, H*D, S) int8 — K cache, feature-major
    ks: Array,           # (B, H, S) f32/bf16
    vt: Array,           # (B, S, H*D) int8 — V cache, time-major
    vs: Array,           # (B, H, S) f32/bf16
    lengths: Optional[Array] = None,  # (B,) int32 valid cache length
    b_block: int = 1,
    interpret: bool = False,
):
    """Block-diagonal GQA decode attention over a read-only int8 KV cache.

    b_block=1 measured fastest at bench shapes (tools/attn_bd_probe.py:
    103.7/110.4/113.9/123.2 us/layer at bb=1/2/4/16) — the kernel is
    DMA-bound and more grid steps shrink the pipeline-startup bubble;
    2MB per-step blocks already stream at the ~730 GB/s copy ceiling.

    Returns ``(ctx, m, denom)`` with ctx (B, H, G, D) f32 *unnormalized*
    (sum_t exp(s_t - m) * vs_t * v_t), m/denom (B, H, G) — merge the fresh
    token outside (see bench.py BENCH_ATTN=bd).  Numerics match
    ``decode_attention_i8`` (int8 q + int8 requantized probs).

    The per-(b) aux arrays (q scales, softmax stats) ride as (B, HG, 1)
    3D refs: a 2D (b_block, HG) block fails Mosaic's dims rule when
    b_block < 8.
    """
    B, H, G, D = q.shape
    S = kt.shape[2]
    b_block = min(b_block, B)
    while B % b_block:
        b_block -= 1
    q8, qs = _quantize_q(q)                                # int8, (B,H,G)
    q_bd = make_q_blockdiag(q8, H)                         # (B, HG, HD)
    qs2 = qs.reshape(B, H * G, 1)
    masked = lengths is not None
    kernel = functools.partial(_attn_kernel_bd, n_heads=H, group=G,
                               scale=D ** -0.5, masked=masked)
    grid = (B // b_block,)

    def spec3(a, b_):
        return pl.BlockSpec((b_block, a, b_), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    args = [q_bd, qs2, kt, ks, vt, vs]
    in_specs = [spec3(H * G, H * D), spec3(H * G, 1),
                spec3(H * D, S), spec3(H, S),
                spec3(S, H * D), spec3(H, S)]
    if masked:
        args.append(lengths.astype(jnp.int32).reshape(B, 1, 1))
        in_specs.append(spec3(1, 1))
    ctx, m, d = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, H * G, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, H * G, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, H * G, 1), jnp.float32)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec3(H * G, D), spec3(H * G, 1), spec3(H * G, 1)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * G * S * H * D,
            bytes_accessed=2 * B * S * H * D + 4 * B * H * S,
            transcendentals=B * H * G * S,
        ),
    )(*args)
    return ctx.reshape(B, H, G, D), m.reshape(B, H, G), d.reshape(B, H, G)


def _attn_kernel_bd_flash(q_ref, qs_ref, k_ref, ks_ref, v_ref, vs_ref,
                          *refs, n_heads: int, group: int, scale: float,
                          masked: bool, s_block: int):
    """S-split flash-decoding variant of ``_attn_kernel_bd``.

    Grid = (B/bb, S/s_block) with the S axis innermost ("arbitrary"): each
    step reads only an ``s_block`` column slab of the feature-major K cache
    and row slab of V, so per-step DMA blocks shrink from the full-S
    multi-ten-MB reads to ~1-2MB chunks that interleave with the
    neighbouring weight-kernel prefetches (the full-S kernel wins
    standalone but serializes behind the stack — CLAUDE.md r2
    opaque-megakernel rule).  The (o, m, d) output blocks have an index
    map independent of the S grid index, so they stay VMEM-resident across
    S steps and carry the running flash state:

        m' = max(m, rowmax(s_blk));  a = exp(m - m')
        d' = d * a + sum(exp(s_blk - m'))
        o' = o * a + requant8(exp(s_blk - m') * vs) @ v_blk

    Output contract matches ``decode_attention_bd`` (unnormalized ctx +
    m/denom) so ``bd_merge_new_token`` folds the fresh token identically.
    """
    if masked:
        len_ref, o_ref, m_ref, d_ref = refs
    else:
        o_ref, m_ref, d_ref = refs
    H, G = n_heads, group
    bb = q_ref.shape[0]
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        d_ref[:] = jnp.zeros_like(d_ref)

    for b in range(bb):
        sc32 = jax.lax.dot_general(
            q_ref[b], k_ref[b], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # (HG, sb)
        scf = sc32.astype(jnp.float32) * \
            (qs_ref[b, :, 0].astype(jnp.float32)[:, None] * scale)
        ksf = ks_ref[b].astype(jnp.float32)                # (H, sb)
        scf = jnp.concatenate(
            [scf[h * G:(h + 1) * G] * ksf[h][None, :] for h in range(H)], 0)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scf.shape, 1) \
                + si * s_block
            scf = jnp.where(col < len_ref[b, 0, 0], scf, -jnp.inf)
        m_old = m_ref[b]                                   # (HG, 1)
        blk_max = jnp.maximum(jnp.max(scf, axis=-1, keepdims=True), -1e30)
        m_new = jnp.maximum(m_old, blk_max)
        alpha = jnp.exp(m_old - m_new)                     # (HG, 1)
        e = jnp.exp(scf - m_new)
        vsf = vs_ref[b].astype(jnp.float32)                # (H, sb)
        pv = jnp.concatenate(
            [e[h * G:(h + 1) * G] * vsf[h][None, :] for h in range(H)], 0)
        ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-20) / 127.0
        p8 = jnp.round(pv / ps).astype(jnp.int8)
        ctx32 = jax.lax.dot_general(
            p8, v_ref[b], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # (HG, H*D)
        ctx = ctx32.astype(jnp.float32) * ps
        D = v_ref.shape[2] // H
        ctx_own = jnp.concatenate(
            [ctx[h * G:(h + 1) * G, h * D:(h + 1) * D] for h in range(H)], 0)
        o_ref[b] = o_ref[b] * alpha + ctx_own
        d_ref[b] = d_ref[b] * alpha[:, 0:1] + \
            jnp.sum(e, axis=-1, keepdims=True)
        m_ref[b] = m_new


@functools.partial(jax.jit,
                   static_argnames=("b_block", "s_block", "interpret"))
def decode_attention_bd_flash(
    q: Array,            # (B, H, G, D) bf16/f32
    kt: Array,           # (B, H*D, S) int8 — K cache, feature-major
    ks: Array,           # (B, H, S) f32/bf16
    vt: Array,           # (B, S, H*D) int8 — V cache, time-major
    vs: Array,           # (B, H, S) f32/bf16
    lengths: Optional[Array] = None,
    b_block: int = 1,
    s_block: int = 256,
    interpret: bool = False,
):
    """S-split flash decode over the block-diagonal layout; same returns
    as ``decode_attention_bd`` — (ctx unnormalized, m, denom)."""
    B, H, G, D = q.shape
    S = kt.shape[2]
    b_block = min(b_block, B)
    while B % b_block:
        b_block -= 1
    s_block = min(s_block, S)
    while S % s_block:
        s_block //= 2
    q8, qs = _quantize_q(q)
    q_bd = make_q_blockdiag(q8, H)
    qs2 = qs.reshape(B, H * G, 1)
    masked = lengths is not None
    kernel = functools.partial(_attn_kernel_bd_flash, n_heads=H, group=G,
                               scale=D ** -0.5, masked=masked,
                               s_block=s_block)
    grid = (B // b_block, S // s_block)

    def fixed(a, b_):
        return pl.BlockSpec((b_block, a, b_), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    args = [q_bd, qs2, kt, ks, vt, vs]
    in_specs = [
        fixed(H * G, H * D), fixed(H * G, 1),
        pl.BlockSpec((b_block, H * D, s_block), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_block, H, s_block), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_block, s_block, H * D), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_block, H, s_block), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    if masked:
        args.append(lengths.astype(jnp.int32).reshape(B, 1, 1))
        in_specs.append(fixed(1, 1))
    ctx, m, d = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, H * G, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, H * G, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, H * G, 1), jnp.float32)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(fixed(H * G, D), fixed(H * G, 1), fixed(H * G, 1)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(),
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * G * S * H * D,
            bytes_accessed=2 * B * S * H * D + 4 * B * H * S,
            transcendentals=B * H * G * S,
        ),
    )(*args)
    return ctx.reshape(B, H, G, D), m.reshape(B, H, G), d.reshape(B, H, G)


def _attn_kernel_bd4(q_lo_ref, q_hi_ref, qs_ref, k_ref, ks_ref, v_ref,
                     vs_ref, *refs, n_heads: int, group: int, scale: float,
                     masked: bool = False):
    """Block-diagonal decode attention over the NIBBLE-PACKED (kv4) cache.

    K rides feature-major packed (H*D/2, S): packed row h*D/2+d holds
    feature h*D+d in the low nibble and h*D+d+D/2 in the high nibble
    (serving/kv_cache.quantize_kv4 half-plane layout).  The query arrives
    as TWO block-diagonal int8 matrices (lo/hi feature halves), so scores
    are two full-size int8 MXU dots over the sign-extended nibble planes —
    half the HBM bytes of the int8 kernel at the cost of ~4 VPU ops per
    packed byte (same op count per UNPACKED element as the int8 path's
    in-kernel dequant).  PV mirrors it over the (S, H*D/2) packed V."""
    if masked:
        len_ref, o_ref, m_ref, d_ref = refs
    else:
        o_ref, m_ref, d_ref = refs
    H, G = n_heads, group
    bb = q_lo_ref.shape[0]
    for b in range(bb):
        ki = k_ref[b].astype(jnp.int32)               # (HD2, S)
        klo = (((ki & 0xF) ^ 8) - 8).astype(jnp.int8)
        khi = ((((ki >> 4) & 0xF) ^ 8) - 8).astype(jnp.int8)
        sc32 = jax.lax.dot_general(
            q_lo_ref[b], klo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        sc32 = sc32 + jax.lax.dot_general(
            q_hi_ref[b], khi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)         # (HG, S)
        scf = sc32.astype(jnp.float32) * \
            (qs_ref[b, :, 0].astype(jnp.float32)[:, None] * scale)
        ksf = ks_ref[b].astype(jnp.float32)           # (H, S)
        scf = jnp.concatenate(
            [scf[h * G:(h + 1) * G] * ksf[h][None, :] for h in range(H)], 0)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scf.shape, 1)
            scf = jnp.where(col < len_ref[b, 0, 0], scf, -jnp.inf)
        m = jnp.maximum(jnp.max(scf, axis=-1, keepdims=True), -1e30)
        e = jnp.exp(scf - m)
        denom = jnp.sum(e, axis=-1)
        vsf = vs_ref[b].astype(jnp.float32)
        pv = jnp.concatenate(
            [e[h * G:(h + 1) * G] * vsf[h][None, :] for h in range(H)], 0)
        ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-20) / 127.0
        p8 = jnp.round(pv / ps).astype(jnp.int8)
        vi = v_ref[b].astype(jnp.int32)               # (S, HD2)
        vlo = (((vi & 0xF) ^ 8) - 8).astype(jnp.int8)
        vhi = ((((vi >> 4) & 0xF) ^ 8) - 8).astype(jnp.int8)
        clo = jax.lax.dot_general(
            p8, vlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * ps
        chi = jax.lax.dot_general(
            p8, vhi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * ps
        D2 = vi.shape[1] // H
        o_ref[b] = jnp.concatenate(
            [jnp.concatenate(
                [clo[h * G:(h + 1) * G, h * D2:(h + 1) * D2],
                 chi[h * G:(h + 1) * G, h * D2:(h + 1) * D2]], axis=1)
             for h in range(H)], 0)
        m_ref[b, :, 0] = m[:, 0]
        d_ref[b, :, 0] = denom


@functools.partial(jax.jit, static_argnames=("b_block", "interpret"))
def decode_attention_bd4(
    q: Array,            # (B, H, G, D) bf16/f32
    kt4: Array,          # (B, H*D/2, S) int8 nibble-packed K, feature-major
    ks: Array,           # (B, H, S) bf16
    vt4: Array,          # (B, S, H*D/2) int8 nibble-packed V, time-major
    vs: Array,           # (B, H, S) bf16
    lengths: Optional[Array] = None,
    b_block: int = 1,
    interpret: bool = False,
):
    """kv4 block-diagonal decode attention — same contract as
    ``decode_attention_bd`` (unnormalized ctx + m/denom for the
    flash-decoding merge of the fresh token)."""
    B, H, G, D = q.shape
    S = kt4.shape[2]
    D2 = D // 2
    b_block = min(b_block, B)
    while B % b_block:
        b_block -= 1
    q8, qs = _quantize_q(q)
    q_lo = make_q_blockdiag(q8[..., :D2], H)          # (B, HG, H*D2)
    q_hi = make_q_blockdiag(q8[..., D2:], H)
    qs2 = qs.reshape(B, H * G, 1)
    masked = lengths is not None
    kernel = functools.partial(_attn_kernel_bd4, n_heads=H, group=G,
                               scale=D ** -0.5, masked=masked)
    grid = (B // b_block,)

    def spec3(a, b_):
        return pl.BlockSpec((b_block, a, b_), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    args = [q_lo, q_hi, qs2, kt4, ks, vt4, vs]
    in_specs = [spec3(H * G, H * D2), spec3(H * G, H * D2),
                spec3(H * G, 1),
                spec3(H * D2, S), spec3(H, S),
                spec3(S, H * D2), spec3(H, S)]
    if masked:
        args.append(lengths.astype(jnp.int32).reshape(B, 1, 1))
        in_specs.append(spec3(1, 1))
    ctx, m, d = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, H * G, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, H * G, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, H * G, 1), jnp.float32)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(spec3(H * G, D), spec3(H * G, 1), spec3(H * G, 1)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * G * S * H * D,
            bytes_accessed=B * S * H * D + 4 * B * H * S,
            transcendentals=B * H * G * S,
        ),
    )(*args)
    return ctx.reshape(B, H, G, D), m.reshape(B, H, G), d.reshape(B, H, G)


def _attn_kernel_bd4_flash(q_lo_ref, q_hi_ref, qs_ref, k_ref, ks_ref,
                           v_ref, vs_ref, *refs, n_heads: int, group: int,
                           scale: float, masked: bool, s_block: int):
    """S-split flash variant of ``_attn_kernel_bd4``: nibble-packed slabs
    read in ``s_block`` chunks with running (m, d, acc) flash state in the
    revisited output blocks — the only kv4 kernel shape whose VMEM
    footprint is context-independent (full-S bd4 slabs exceed the 16MB
    VMEM budget at 8k+)."""
    if masked:
        len_ref, o_ref, m_ref, d_ref = refs
    else:
        o_ref, m_ref, d_ref = refs
    H, G = n_heads, group
    bb = q_lo_ref.shape[0]
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        d_ref[:] = jnp.zeros_like(d_ref)

    for b in range(bb):
        ki = k_ref[b].astype(jnp.int32)               # (HD2, sb)
        klo = (((ki & 0xF) ^ 8) - 8).astype(jnp.int8)
        khi = ((((ki >> 4) & 0xF) ^ 8) - 8).astype(jnp.int8)
        sc32 = jax.lax.dot_general(
            q_lo_ref[b], klo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        sc32 = sc32 + jax.lax.dot_general(
            q_hi_ref[b], khi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        scf = sc32.astype(jnp.float32) * \
            (qs_ref[b, :, 0].astype(jnp.float32)[:, None] * scale)
        ksf = ks_ref[b].astype(jnp.float32)
        scf = jnp.concatenate(
            [scf[h * G:(h + 1) * G] * ksf[h][None, :] for h in range(H)], 0)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scf.shape, 1) \
                + si * s_block
            scf = jnp.where(col < len_ref[b, 0, 0], scf, -jnp.inf)
        m_old = m_ref[b]
        m_new = jnp.maximum(
            m_old, jnp.maximum(jnp.max(scf, axis=-1, keepdims=True),
                               -1e30))
        alpha = jnp.exp(m_old - m_new)
        e = jnp.exp(scf - m_new)
        vsf = vs_ref[b].astype(jnp.float32)
        pv = jnp.concatenate(
            [e[h * G:(h + 1) * G] * vsf[h][None, :] for h in range(H)], 0)
        ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-20) / 127.0
        p8 = jnp.round(pv / ps).astype(jnp.int8)
        vi = v_ref[b].astype(jnp.int32)               # (sb, HD2)
        vlo = (((vi & 0xF) ^ 8) - 8).astype(jnp.int8)
        vhi = ((((vi >> 4) & 0xF) ^ 8) - 8).astype(jnp.int8)
        clo = jax.lax.dot_general(
            p8, vlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * ps
        chi = jax.lax.dot_general(
            p8, vhi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * ps
        D2 = vi.shape[1] // H
        ctx_own = jnp.concatenate(
            [jnp.concatenate(
                [clo[h * G:(h + 1) * G, h * D2:(h + 1) * D2],
                 chi[h * G:(h + 1) * G, h * D2:(h + 1) * D2]], axis=1)
             for h in range(H)], 0)
        o_ref[b] = o_ref[b] * alpha + ctx_own
        d_ref[b] = d_ref[b] * alpha[:, 0:1] + \
            jnp.sum(e, axis=-1, keepdims=True)
        m_ref[b] = m_new


@functools.partial(jax.jit,
                   static_argnames=("b_block", "s_block", "interpret"))
def decode_attention_bd4_flash(
    q: Array,            # (B, H, G, D)
    kt4: Array,          # (B, H*D/2, S) int8 nibble-packed
    ks: Array,           # (B, H, S)
    vt4: Array,          # (B, S, H*D/2) int8 nibble-packed
    vs: Array,           # (B, H, S)
    lengths: Optional[Array] = None,
    b_block: int = 1,
    s_block: int = 512,
    interpret: bool = False,
):
    """kv4 S-split flash decode; same contract as ``decode_attention_bd``."""
    B, H, G, D = q.shape
    S = kt4.shape[2]
    D2 = D // 2
    b_block = min(b_block, B)
    while B % b_block:
        b_block -= 1
    s_block = min(s_block, S)
    while S % s_block:
        s_block //= 2
    q8, qs = _quantize_q(q)
    q_lo = make_q_blockdiag(q8[..., :D2], H)
    q_hi = make_q_blockdiag(q8[..., D2:], H)
    qs2 = qs.reshape(B, H * G, 1)
    masked = lengths is not None
    kernel = functools.partial(_attn_kernel_bd4_flash, n_heads=H, group=G,
                               scale=D ** -0.5, masked=masked,
                               s_block=s_block)
    grid = (B // b_block, S // s_block)

    def fixed(a, b_):
        return pl.BlockSpec((b_block, a, b_), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    args = [q_lo, q_hi, qs2, kt4, ks, vt4, vs]
    in_specs = [
        fixed(H * G, H * D2), fixed(H * G, H * D2), fixed(H * G, 1),
        pl.BlockSpec((b_block, H * D2, s_block), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_block, H, s_block), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_block, s_block, H * D2), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_block, H, s_block), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    if masked:
        args.append(lengths.astype(jnp.int32).reshape(B, 1, 1))
        in_specs.append(fixed(1, 1))
    ctx, m, d = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, H * G, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, H * G, 1), jnp.float32),
                   jax.ShapeDtypeStruct((B, H * G, 1), jnp.float32)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(fixed(H * G, D), fixed(H * G, 1), fixed(H * G, 1)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(),
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * G * S * H * D,
            bytes_accessed=B * S * H * D + 4 * B * H * S,
            transcendentals=B * H * G * S,
        ),
    )(*args)
    return ctx.reshape(B, H, G, D), m.reshape(B, H, G), d.reshape(B, H, G)


def bd_merge_new_token(q: Array, qctx, k_new: Array, v_new: Array,
                       kns: Array, vns: Array, scale: float):
    """Merge the fresh decode token into ``decode_attention_bd`` output.

    q (B, H, G, D) bf16; qctx = (ctx, m, denom) from the kernel;
    k_new/v_new (B, H, D) int8 with scales kns/vns (B, H).  Flash-decoding
    style two-term softmax merge, all ops tiny (no S dimension).  Returns
    (B, H, G, D) f32 normalized attention output.
    """
    ctx, m, denom = qctx
    qf = q.astype(jnp.float32)
    s_new = jnp.einsum("bhgd,bhd->bhg", qf, k_new.astype(jnp.float32))
    s_new = s_new * kns.astype(jnp.float32)[:, :, None] * scale
    m_all = jnp.maximum(m, s_new)
    w_old = jnp.exp(m - m_all)
    w_new = jnp.exp(s_new - m_all)
    d_all = denom * w_old + w_new
    vn = v_new.astype(jnp.float32) * vns.astype(jnp.float32)[..., None]
    out = ctx * w_old[..., None] + w_new[..., None] * vn[:, :, None, :]
    return out / d_all[..., None]


def _attn_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *,
                 n_heads: int, scale: float):
    bb = q_ref.shape[0]
    for b in range(bb):
        for h in range(n_heads):
            qh = q_ref[b, h].astype(jnp.bfloat16)        # (G, D)
            kh = k_ref[b, h].astype(jnp.bfloat16)        # (S, D)
            sc = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (G, S)
            sc = sc * ks_ref[b, h][None, :] * scale
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pv = (p * vs_ref[b, h][None, :]).astype(jnp.bfloat16)
            vh = v_ref[b, h].astype(jnp.bfloat16)        # (S, D)
            ctx = jax.lax.dot_general(
                pv, vh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (G, D)
            o_ref[b, h] = ctx


@functools.partial(jax.jit, static_argnames=("b_block", "interpret"))
def decode_attention_kv8(
    q: Array,            # (B, H, G, D) bf16/f32
    kq: Array,           # (B, H, S, D) int8
    ks: Array,           # (B, H, S) f32
    vq: Array,           # (B, H, S, D) int8
    vs: Array,           # (B, H, S) f32
    b_block: int = 4,
    interpret: bool = False,
) -> Array:
    """Single-token GQA decode attention over an int8 KV cache.
    Returns (B, H, G, D) f32."""
    B, H, G, D = q.shape
    S = kq.shape[2]
    b_block = min(b_block, B)
    assert B % b_block == 0
    kernel = functools.partial(_attn_kernel, n_heads=H, scale=D ** -0.5)
    grid = (B // b_block,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, G, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_block, H, G, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, H, S, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, H, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, H, S, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, H, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_block, H, G, D), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * G * S * D,
            bytes_accessed=2 * B * H * S * D + 2 * B * H * S * 4
            + B * H * G * D * 2,
            transcendentals=B * H * G * S,
        ),
    )(q, kq, ks, vq, vs)
