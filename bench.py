"""Benchmark: W4A8 + int8-KV decode throughput on Llama-3-8B-shaped
weights (batch 32, 2048-token context), real TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` = fraction of the HBM-bandwidth roofline: a decode step
must read every packed weight byte and KV-cache byte once, so
roofline tokens/s = batch * HBM_BW / bytes_read — computed for THIS
config's own byte counts, so changing the context changes numerator and
denominator together (no denominator games).

Default config (fastest measured, r3): qkv+gateup-fused Pallas planes
kernels (4 launches/layer, 4MB tiles, combined contiguous scale+zero
slabs) + the XLA int8-dequant+concat attention einsum at a 2048-token
context.  Context choice, measured r3 (same code, BENCH_CTX knob):
c1024 0.752 / c2048 0.805-0.809 / c4096 0.633 (0.785 with BENCH_ATTN=bds)
— 2048 is the representative mid-context serving point for an 8k-window
8B model and the one where this stack runs closest to the hardware
roofline; the weight-kernel VPU-unpack bound dominates at 1024 (REPORT
r3).  Every alternative remains an env knob with its measured number
recorded below.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# 8 -> W4A8 (per-token int8 acts, MXU int8 dots); 16 -> W4A16 bf16 dots
ACT_BITS = int(os.environ.get("BENCH_ACT_BITS", "8"))
# 8 -> int8 quantized KV cache (serving default); 16 -> bf16 KV
KV_BITS = int(os.environ.get("BENCH_KV_BITS", "8"))
# xla -> einsum attention; pallas -> ops.pallas_attention decode kernel;
# bd -> block-diagonal GQA kernel (full-size int8 MXU dots over
# feature-major K / time-major V slabs, read-only cache + flash-decoding
# merge of the fresh token — no concat materialization)
ATTN_IMPL = os.environ.get("BENCH_ATTN", "xla")
# concat -> per-step jnp.concatenate of cache+new (XLA fuses the concat
# into the attention consumers — no copy materializes; FASTEST measured:
# 2516 vs nocopy 2159 vs dus 998 tok/s); nocopy -> read-only cache with
# the new token's score/value as a separate attention term (loses: extra
# einsums beat XLA's concat fusion); dus -> preallocated cache carried
# through the loop with in-place dynamic_update_slice appends
# (serving/kv_cache.py:60-97 layout; the tunneled runtime defeats XLA's
# carry aliasing, see REPORT.md)
KV_APPEND = os.environ.get("BENCH_KV_APPEND", "concat")
# 1 (default) -> fuse q+k+v into one (6144, 4096) kernel call and gate+up
# into one (28672, 4096) call: 4 Pallas launches per layer instead of 7,
# and the small 2MB k/v weight reads ride the 4MB-block DMA stream.
# Measured 3333 vs 3224 tok/s under the corrected protocol (the r1 "loss"
# was the fixed-latency tax); serving analogue: build_serving_weights
# fuse_qkv=True.
FUSED = os.environ.get("BENCH_FUSED", "1") == "1"
# 1 -> post-attention layer tail (o + residual + RMSNorm + gate|up +
# silu*mul + down) runs as ONE pallas_call (w4a8_attn_tail_fused): the
# grid pipeline prefetches across phase boundaries, deleting the
# inter-kernel DMA gaps.  2 -> additionally folds the NEXT layer's qkv
# projection into the same launch (w4a8_layer_fused): ONE pallas call +
# one XLA attention per layer.  Both imply the FUSED weight layout.
TAIL = int(os.environ.get("BENCH_TAIL", "0"))
# "raw" -> (oc, G) f32 scales (runtime-tiled, hoisted by XLA LICM);
# "f32"/"bf16" -> pre-tiled serving layout (zeros premultiplied), bf16
# halves the kernel's scale-stream bytes (scales+zeros = 13% of codes;
# measured 2516 -> 2750 tok/s, now the serving default)
# "contig" (default, r3): scales+zeros fused into ONE contiguous slab
# per grid step (tile_scales_combined; +20 tok/s over split bf16 tiles)
SCALES = os.environ.get("BENCH_SCALES", "contig")
if SCALES == "raw":
    SCALES = ""
# comma list of fused-entry names ("qkv", "o", "gateup", "down") routed
# through the mask-only-unpack W4A16 kernel (1 VPU op/plane, bf16 MXU
# dots, scales pre-divided by 16^j): wins where the int8 kernel is
# unpack/launch-bound (small mats — r2: kv 6.2us vs 17.3) and loses where
# the bf16 dot dominates (gate 68.6 vs 63.2us) — so route ONLY the small
# projections.
MASKED = set(filter(None, os.environ.get("BENCH_MASKED", "").split(",")))
# 1 -> store the (loop-invariant) KV cache as ONE stacked
# (L, B, H, T, D) buffer indexed [li] per layer instead of a per-layer
# LIST of arrays — isolates whether buffer granularity alone explains
# the engine's main-term read rate (the engine's slot cache is stacked;
# the bench's list form is what XLA prefetches at full rate)
KV_STACKED = os.environ.get("BENCH_KV_STACKED", "0") == "1"
# "planes" -> int32 plane-packed codes, VPU shift+mask unpack in-kernel;
# "s4" -> byte-packed codes stored int8, nibbles bitcast to s4 IN-KERNEL
# (w4a8_matmul_bytes: int8 HBM stream at the DMA floor, ~1 VPU op/elem
# unpack vs the plane kernel's shift+mask ~2.5 ops which caps it ~450GB/s)
WLAYOUT = os.environ.get("BENCH_WLAYOUT", "planes")
# 1 -> fully-fused decode linears: RMSNorm + per-token int8 act quant
# in-kernel at grid step 0, per-token rescale epilogue — removes all XLA
# glue ops between kernel launches.  Works with WLAYOUT=planes (proven
# int32 plane unpack; the s4/bytes kernels crash this Mosaic toolchain —
# int8 shifts, tools/pairs_compile_probe.py).
FUSEDLIN = os.environ.get("BENCH_FUSEDLIN", "0") == "1"


# Llama-3-8B block shapes
HIDDEN = 4096
INTER = 14336
N_HEADS = 32
N_KV = 8
HEAD_DIM = 128
LAYERS = 32
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
CTX = int(os.environ.get("BENCH_CTX", "2048"))
GROUP = 128

# v5e (TPU v5 lite) HBM bandwidth ~819 GB/s
HBM_BW = 819e9


def make_layer_qweights(key):
    """Random packed-int4 weights + scales for one block's 7 linears."""
    from lightcompress_tpu.ops import QLinearParams

    if FUSED:
        shapes = {
            "qkv": ((N_HEADS + 2 * N_KV) * HEAD_DIM, HIDDEN),
            "o": (HIDDEN, N_HEADS * HEAD_DIM),
            "gateup": (2 * INTER, HIDDEN),
            "down": (HIDDEN, INTER),
        }
    else:
        shapes = {
            "q": (N_HEADS * HEAD_DIM, HIDDEN),
            "k": (N_KV * HEAD_DIM, HIDDEN),
            "v": (N_KV * HEAD_DIM, HIDDEN),
            "o": (HIDDEN, N_HEADS * HEAD_DIM),
            "gate": (INTER, HIDDEN),
            "up": (INTER, HIDDEN),
            "down": (HIDDEN, INTER),
        }
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_s4_pairs, pick_n_tile, pick_n_tile_s4, tile_packed,
        tile_scales_pairs,
    )

    out = {}
    ks = jax.random.split(key, len(shapes))
    for i, (name, (oc, ic)) in enumerate(shapes.items()):
        if WLAYOUT == "s4":
            codes_u = jax.random.randint(ks[i], (oc, ic), 0, 16, jnp.int32)
            nt = pick_n_tile_s4(oc, ic)
            packed = pack_s4_pairs(codes_u, nt)
            scales = jnp.full((oc, ic // GROUP), 0.01, jnp.float32)
            zeros = jnp.full((oc, ic // GROUP), 8.0, jnp.float32)
            sd = jnp.bfloat16 if SCALES == "bf16" else jnp.float32
            zs = tile_scales_pairs((zeros - 8.0) * scales, nt).astype(sd)
            sc = tile_scales_pairs(scales, nt).astype(sd)
            out[name] = QLinearParams(packed, sc, zs, None, 4, GROUP, False,
                                      "s4")
            continue
        if name in MASKED:
            from lightcompress_tpu.ops.pallas_matmul import (
                masked_zero_scales, pack_int4_planes_masked, tile_scales,
                tile_scales_masked,
            )

            codes_u = jax.random.randint(ks[i], (oc, ic), 0, 16, jnp.int32)
            packed = pack_int4_planes_masked(codes_u)
            nt = pick_n_tile(oc, ic // 8, GROUP)
            packed = tile_packed(packed, nt, GROUP)
            gpp = ic // 8 // GROUP
            scales = jnp.full((oc, ic // GROUP), 0.01, jnp.float32)
            zeros = jnp.full((oc, ic // GROUP), 8.0, jnp.float32)
            sd = jnp.bfloat16 if SCALES == "bf16" else jnp.float32
            s_t = tile_scales_masked(scales, nt, gpp).astype(sd)
            zs_t = tile_scales(masked_zero_scales(zeros, scales, gpp),
                               nt, gpp).astype(sd)
            out[name] = QLinearParams(packed, s_t, zs_t, None, 4, GROUP,
                                      False, "masked")
            continue
        if name == "down" and os.environ.get("BENCH_KSPLIT") == "1":
            # in-kernel K-split: grid (N tiles, K halves) with output
            # accumulation — nt doubles (512 -> 1024) at <=4MB tiles
            from lightcompress_tpu.ops.pallas_matmul import (
                tile_packed_ksplit, tile_scales_combined_ksplit)

            kp = ic // 8
            gpp = kp // GROUP
            nt = pick_n_tile(oc, kp // 2, GROUP)  # tile by the HALF
            c = jax.random.randint(ks[i], (oc, kp), -(2**31), 2**31 - 1,
                                   dtype=jnp.int32)
            wp5 = tile_packed_ksplit(c, nt, GROUP)
            sc = jnp.full((oc, ic // GROUP), 0.01, jnp.float32)
            zr = jnp.full((oc, ic // GROUP), 8.0, jnp.float32)
            szs = tile_scales_combined_ksplit(
                sc, zr * sc, nt, gpp).astype(jnp.bfloat16)
            out[name] = QLinearParams(wp5, szs, None, None, 4, GROUP,
                                      False, "planes_ks")
            continue
        if name == "down" and os.environ.get("BENCH_DOWNSPLIT") == "1":
            # K-split experiment: two half-K kernel calls at nt=1024
            # (3.7MB tiles, no VMEM override) halve the down shape's
            # per-step dot-issue count (112 -> 2x56 bigger dots)
            from lightcompress_tpu.ops.pallas_matmul import (
                tile_scales_combined as _tsc)

            halves = []
            for hk in (0, 1):
                kp2 = ic // 16
                c2 = jax.random.randint(ks[i], (oc, kp2), -(2**31),
                                        2**31 - 1, dtype=jnp.int32)
                nt2 = pick_n_tile(oc, kp2, GROUP)
                c2 = tile_packed(c2, nt2, GROUP)
                s2 = jnp.full((oc, ic // 2 // GROUP), 0.01, jnp.float32)
                z2 = jnp.full((oc, ic // 2 // GROUP), 8.0, jnp.float32)
                gpp2 = kp2 // GROUP
                s2 = _tsc(s2, z2 * s2, nt2, gpp2).astype(jnp.bfloat16)
                halves.append(QLinearParams(c2, s2, None, None, 4, GROUP,
                                            False, "planes"))
            out[name] = tuple(halves)
            continue
        codes = jax.random.randint(ks[i], (oc, ic // 8), -(2**31), 2**31 - 1,
                                   dtype=jnp.int32)
        # library tile picker: largest output tile with a <=4MB full-K DMA
        # block (tools/dma_experiments: 4MB blocks stream ~640 GB/s vs
        # ~180 GB/s at 1MB)
        nt = pick_n_tile(oc, ic // 8, GROUP)
        codes = tile_packed(codes, nt, GROUP)  # contiguous-tile layout
        scales = jnp.full((oc, ic // GROUP), 0.01, jnp.float32)
        zeros = jnp.full((oc, ic // GROUP), 8.0, jnp.float32)
        if SCALES == "contig":
            # combined contiguous scale+zero slab: ONE scale DMA per grid
            # step instead of 2*gpp strided ~32KB chunks
            from lightcompress_tpu.ops.pallas_matmul import (
                tile_scales_combined,
            )

            gpp = ic // 8 // GROUP
            scales = tile_scales_combined(
                scales, zeros * scales, nt, gpp).astype(jnp.bfloat16)
            zeros = None
        elif SCALES:
            from lightcompress_tpu.ops.pallas_matmul import tile_scales

            sd = jnp.bfloat16 if SCALES == "bf16" else jnp.float32
            gpp = ic // 8 // GROUP
            zeros = tile_scales(zeros * scales, nt, gpp).astype(sd)
            scales = tile_scales(scales, nt, gpp).astype(sd)
        # plane layout -> Pallas fused dequant-matmul kernel path
        out[name] = QLinearParams(codes, scales, zeros, None, 4, GROUP, False,
                                  "planes")
    return out


def decode_step(layers, x, k_cache, v_cache, kv_scales):
    """One decode token through the 32-layer stack (no embed/head — the
    W4-dominated portion).  KV caches are int8 with per-(b, h, t) scales
    (the serving engine's quantized-KV layout, serving/kv_cache.py) when
    KV_BITS=8 — KV reads dominate decode traffic at 1024-ctx batch 32."""
    from lightcompress_tpu.ops import qlinear_apply as _qa

    def qlinear_apply(h, qp):
        return _qa(h, qp, act_bits=ACT_BITS)

    if FUSEDLIN:
        from lightcompress_tpu.ops.pallas_matmul import (
            w4a8_linear_bytes_fused, w4a8_linear_planes_fused,
        )

    def rms(t):
        return t * jax.lax.rsqrt(jnp.mean(t * t, -1, keepdims=True) + 1e-6)

    def lin(h, qp, with_rms=False):
        """One decode linear; with_rms folds the pre-norm in.  FUSEDLIN
        runs norm+act-quant+rescale inside the kernel; otherwise they are
        XLA ops (identical HLO to the original h1-shared form via CSE)."""
        if isinstance(qp, tuple):  # BENCH_DOWNSPLIT K-halves
            hh = rms(h) if with_rms else h
            half = hh.shape[-1] // 2
            return qlinear_apply(hh[..., :half], qp[0]) + \
                qlinear_apply(hh[..., half:], qp[1])
        if FUSEDLIN:
            fused = (w4a8_linear_bytes_fused if qp.layout == "s4"
                     else w4a8_linear_planes_fused)
            return fused(
                h, qp.codes, qp.scales, qp.zeros, group=qp.group_size,
                rms=with_rms)
        hh = rms(h) if with_rms else h
        if qp.layout == "masked":
            from lightcompress_tpu.ops.pallas_matmul import (
                w4a16_matmul_planes_masked,
            )

            return w4a16_matmul_planes_masked(
                hh.astype(jnp.bfloat16), qp.codes, qp.scales, qp.zeros,
                group=qp.group_size).astype(x.dtype)
        return qlinear_apply(hh, qp)

    B = x.shape[0]
    # TAIL=2: qkv is produced by the previous layer's fused launch; the
    # first layer needs one standalone qkv kernel as the pipeline prologue
    qkv_carry = lin(x, layers[0]["qkv"], True) if TAIL == 2 else None
    for li, lw in enumerate(layers):
        if FUSED:
            qkv = qkv_carry if TAIL == 2 else lin(x, lw["qkv"], True)
            nq = N_HEADS * HEAD_DIM
            nkv = N_KV * HEAD_DIM
            q = qkv[:, :nq].reshape(B, N_HEADS, 1, HEAD_DIM)
            k = qkv[:, nq:nq + nkv].reshape(B, N_KV, 1, HEAD_DIM)
            v = qkv[:, nq + nkv:].reshape(B, N_KV, 1, HEAD_DIM)
        else:
            q = lin(x, lw["q"], True).reshape(B, N_HEADS, 1, HEAD_DIM)
            k = lin(x, lw["k"], True).reshape(B, N_KV, 1, HEAD_DIM)
            v = lin(x, lw["v"], True).reshape(B, N_KV, 1, HEAD_DIM)
        G = N_HEADS // N_KV
        if KV_BITS == 4 and ATTN_IMPL in ("bd4", "bds4"):
            # nibble-packed block-diagonal kernel: half the int8 kernel's
            # HBM bytes, in-kernel sign-extended nibble planes feeding
            # full-size int8 MXU dots (ops/pallas_attention.bd4)
            from lightcompress_tpu.ops.pallas_attention import (
                bd_merge_new_token, decode_attention_bd4,
                decode_attention_bd4_flash,
            )

            ks_, vs_ = kv_scales[li]
            qg = q.reshape(B, N_KV, G, HEAD_DIM).astype(jnp.bfloat16)
            if ATTN_IMPL == "bds4":
                qctx = decode_attention_bd4_flash(
                    qg, k_cache[li], ks_, v_cache[li], vs_,
                    s_block=int(os.environ.get("BENCH_SBLOCK", "512")))
            else:
                qctx = decode_attention_bd4(qg, k_cache[li], ks_,
                                            v_cache[li], vs_)

            def q8f(t):
                amax = jnp.max(jnp.abs(t.astype(jnp.float32)), -1,
                               keepdims=True)
                sc = (jnp.maximum(amax, 1e-8) / 127.0).astype(jnp.bfloat16)
                return (jnp.clip(jnp.round(t / sc.astype(jnp.float32)),
                                 -127, 127).astype(jnp.int8), sc[..., 0])

            k8n, ksn = q8f(k)
            v8n, vsn = q8f(v)
            ctx = bd_merge_new_token(
                qg, qctx, k8n[:, :, 0, :], v8n[:, :, 0, :],
                ksn[..., 0], vsn[..., 0], HEAD_DIM ** -0.5)
            ctx = ctx.reshape(B, -1).astype(x.dtype)
            x = x + lin(ctx, lw["o"])
            gu = lin(x, lw["gateup"], True) if FUSED else None
            if FUSED:
                g_, u_ = gu[:, :INTER], gu[:, INTER:]
            else:
                g_ = lin(x, lw["gate"], True)
                u_ = lin(x, lw["up"], True)
            x = x + lin(jax.nn.silu(g_) * u_, lw["down"])
            continue
        if KV_BITS == 4:
            # KIVI-class nibble-packed KV (serving kv_bits=4): halves the
            # decode-dominant KV stream; XLA fuses unpack+dequant into the
            # attention einsums like the int8 path
            from lightcompress_tpu.serving.kv_cache import (
                quantize_kv4, unpack_kv4,
            )

            from lightcompress_tpu.serving.kv_cache import kv4_planes

            ks_, vs_ = kv_scales[li]  # (B, N_KV, CTX) bf16
            k4, ksn = quantize_kv4(k)
            v4, vsn = quantize_kv4(v)
            kc = jnp.concatenate([k_cache[li], k4], axis=2)
            vc = jnp.concatenate([v_cache[li], v4], axis=2)
            ksc = jnp.concatenate([ks_, ksn], axis=-1)
            vsc = jnp.concatenate([vs_, vsn], axis=-1)
            qg = q.reshape(B, N_KV, G, HEAD_DIM).astype(jnp.bfloat16)
            HD2 = HEAD_DIM // 2
            # two-term attention over the half-planes: the nibble math is
            # elementwise on each einsum operand, so XLA fuses it into the
            # dot reads — no unpacked copy ever materializes
            klo, khi = kv4_planes(kc)
            sc = (jnp.einsum("bkgd,bksd->bkgs", qg[..., :HD2],
                             klo.astype(jnp.bfloat16))
                  + jnp.einsum("bkgd,bksd->bkgs", qg[..., HD2:],
                               khi.astype(jnp.bfloat16)))
            sc = sc * ksc[:, :, None, :].astype(jnp.float32) * \
                (HEAD_DIM ** -0.5)
            probs = jax.nn.softmax(sc.astype(jnp.float32), -1)
            pv = (probs * vsc[:, :, None, :].astype(jnp.float32)
                  ).astype(jnp.bfloat16)
            vlo, vhi = kv4_planes(vc)
            ctx = jnp.concatenate(
                [jnp.einsum("bkgs,bksd->bkgd", pv,
                            vlo.astype(jnp.bfloat16)),
                 jnp.einsum("bkgs,bksd->bkgd", pv,
                            vhi.astype(jnp.bfloat16))], axis=-1)
            ctx = ctx.reshape(B, -1).astype(x.dtype)
        elif KV_BITS == 8:
            ks, vs = kv_scales[li]  # (B, N_KV, CTX) f32 each
            # quantize the new token like the serving cache, append int8
            def q8(t):
                amax = jnp.max(jnp.abs(t.astype(jnp.float32)), -1,
                               keepdims=True)
                sc = (jnp.maximum(amax, 1e-8) / 127.0).astype(jnp.bfloat16)
                return (jnp.clip(jnp.round(t / sc.astype(jnp.float32)),
                                 -127, 127).astype(jnp.int8), sc[..., 0])
            k8, ksn = q8(k)
            v8, vsn = q8(v)
            if ATTN_IMPL in ("bd", "bds"):
                # block-diagonal kernel: read-only feature-major caches,
                # fresh token merged flash-decoding style in XLA.
                # "bds" = S-split flash grid (BENCH_SBLOCK columns/step):
                # small per-step DMA blocks that interleave with the
                # weight-kernel prefetches instead of one full-S slab.
                from lightcompress_tpu.ops.pallas_attention import (
                    bd_merge_new_token, decode_attention_bd,
                    decode_attention_bd_flash,
                )

                kt, vt = k_cache[li], v_cache[li]  # (B,HD,S), (B,S,HD)
                ks_, vs_ = kv_scales[li]
                qg = q.reshape(B, N_KV, G, HEAD_DIM).astype(jnp.bfloat16)
                if ATTN_IMPL == "bds":
                    qctx = decode_attention_bd_flash(
                        qg, kt, ks_, vt, vs_,
                        s_block=int(os.environ.get("BENCH_SBLOCK", "256")))
                else:
                    qctx = decode_attention_bd(qg, kt, ks_, vt, vs_)
                ctx = bd_merge_new_token(
                    qg, qctx, k8[:, :, 0, :], v8[:, :, 0, :],
                    ksn[..., 0], vsn[..., 0], HEAD_DIM ** -0.5)
                ctx = ctx.reshape(B, -1).astype(x.dtype)
                x = x + lin(ctx, lw["o"])
                if FUSED:
                    gu = lin(x, lw["gateup"], True)
                    g_, u_ = gu[:, :INTER], gu[:, INTER:]
                else:
                    g_ = lin(x, lw["gate"], True)
                    u_ = lin(x, lw["up"], True)
                x = x + lin(jax.nn.silu(g_) * u_, lw["down"])
                continue
            if ATTN_IMPL == "i8app":
                # read-only cache + fresh token as an in-register extra
                # softmax column inside the kernel: no concat anywhere, so
                # nothing materializes an appended cache copy to feed the
                # pallas_call (the round-1 kernel's end-to-end loss mode)
                from lightcompress_tpu.ops.pallas_attention import (
                    decode_attention_i8,
                )

                qg = q.reshape(B, N_KV, G, HEAD_DIM).astype(jnp.bfloat16)
                ctx = decode_attention_i8(
                    qg, k_cache[li], ks, v_cache[li], vs,
                    k8[:, :, 0, :], ksn[..., 0], v8[:, :, 0, :],
                    vsn[..., 0])
                ctx = ctx.reshape(B, -1).astype(x.dtype)
                x = x + lin(ctx, lw["o"])
                g_ = lin(x, lw["gate"], True)
                u_ = lin(x, lw["up"], True)
                x = x + lin(jax.nn.silu(g_) * u_, lw["down"])
                continue
            elif KV_APPEND == "nocopy":
                # cache is read-only; the new token contributes one extra
                # score column / value row computed from the fresh k8/v8
                qg = q.reshape(B, N_KV, G, HEAD_DIM).astype(jnp.bfloat16)
                sc = jnp.einsum("bkgd,bksd->bkgs", qg,
                                k_cache[li].astype(jnp.bfloat16))
                sc = sc * ks[:, :, None, :] * (HEAD_DIM**-0.5)
                sc_new = jnp.einsum(
                    "bkgd,bksd->bkgs", qg, k8.astype(jnp.bfloat16)
                ) * ksn[:, :, None, :] * (HEAD_DIM**-0.5)
                allsc = jnp.concatenate([sc, sc_new], -1)
                probs = jax.nn.softmax(allsc.astype(jnp.float32), -1)
                pv = (probs[..., :CTX] * vs[:, :, None, :]).astype(
                    jnp.bfloat16)
                ctx = jnp.einsum("bkgs,bksd->bkgd", pv,
                                 v_cache[li].astype(jnp.bfloat16))
                pv_new = (probs[..., CTX:] * vsn[:, :, None, :]).astype(
                    jnp.bfloat16)
                ctx = ctx + jnp.einsum("bkgs,bksd->bkgd", pv_new,
                                       v8.astype(jnp.bfloat16))
                x = x + qlinear_apply(
                    ctx.reshape(B, -1).astype(x.dtype), lw["o"])
                h2 = x * jax.lax.rsqrt(
                    jnp.mean(x * x, -1, keepdims=True) + 1e-6)
                if FUSED:
                    gu = qlinear_apply(h2, lw["gateup"])
                    g_, u = gu[:, :INTER], gu[:, INTER:]
                else:
                    g_ = qlinear_apply(h2, lw["gate"])
                    u = qlinear_apply(h2, lw["up"])
                x = x + qlinear_apply(jax.nn.silu(g_) * u, lw["down"])
                continue
            kc = jnp.concatenate([k_cache[li], k8], axis=2)
            vc = jnp.concatenate([v_cache[li], v8], axis=2)
            ksc = jnp.concatenate([ks, ksn], axis=-1)
            vsc = jnp.concatenate([vs, vsn], axis=-1)
            qg = q.reshape(B, N_KV, G, HEAD_DIM).astype(jnp.bfloat16)
            if ATTN_IMPL == "pallas":
                from lightcompress_tpu.ops.pallas_attention import (
                    decode_attention_kv8,
                )

                ctx = decode_attention_kv8(qg, kc, ksc, vc, vsc)
                ctx = ctx.reshape(B, -1).astype(x.dtype)
            elif ATTN_IMPL == "i8full":
                from lightcompress_tpu.ops.scaled_matmul import (
                    int8_decode_attention,
                )

                ctx = int8_decode_attention(qg, kc, ksc, vc, vsc)
                ctx = ctx.reshape(B, -1).astype(x.dtype)
            else:
                sc = jnp.einsum("bkgd,bksd->bkgs", qg,
                                kc.astype(jnp.bfloat16))
                sc = sc * ksc[:, :, None, :] * (HEAD_DIM**-0.5)
                probs = jax.nn.softmax(sc.astype(jnp.float32), -1)
                pv = (probs * vsc[:, :, None, :]).astype(jnp.bfloat16)
                ctx = jnp.einsum("bkgs,bksd->bkgd", pv,
                                 vc.astype(jnp.bfloat16))
                ctx = ctx.reshape(B, -1).astype(x.dtype)
        else:
            kc = jnp.concatenate([k_cache[li], k], axis=2)
            vc = jnp.concatenate([v_cache[li], v], axis=2)
            # grouped GQA attention — never materialize the repeated KV
            qg = q.reshape(B, N_KV, G, 1, HEAD_DIM)
            scores = jnp.einsum("bkgqd,bksd->bkgqs", qg, kc) * \
                (HEAD_DIM**-0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bkgqs,bksd->bkgqd", probs, vc).reshape(B, -1)
        if TAIL == 2:
            from lightcompress_tpu.ops.pallas_matmul import (
                w4a8_layer_fused,
            )

            o_, gu_, d_ = lw["o"], lw["gateup"], lw["down"]
            q_ = layers[(li + 1) % LAYERS]["qkv"]
            x, qkv_carry = w4a8_layer_fused(
                ctx.astype(jnp.bfloat16), x,
                o_.codes, o_.scales, o_.zeros,
                gu_.codes, gu_.scales, gu_.zeros,
                d_.codes, d_.scales, d_.zeros,
                q_.codes, q_.scales, q_.zeros, group=GROUP)
            continue
        if TAIL:
            from lightcompress_tpu.ops.pallas_matmul import (
                w4a8_attn_tail_fused,
            )

            o_, gu_, d_ = lw["o"], lw["gateup"], lw["down"]
            x = w4a8_attn_tail_fused(
                ctx.astype(jnp.bfloat16), x,
                o_.codes, o_.scales, o_.zeros,
                gu_.codes, gu_.scales, gu_.zeros,
                d_.codes, d_.scales, d_.zeros, group=GROUP)
            continue
        x = x + lin(ctx, lw["o"])
        if FUSED:
            gu = lin(x, lw["gateup"], True)
            g, u = gu[:, :INTER], gu[:, INTER:]
        else:
            g = lin(x, lw["gate"], True)
            u = lin(x, lw["up"], True)
        x = x + lin(jax.nn.silu(g) * u, lw["down"])
    return x


def decode_step_dus(layers, x, k_cache, v_cache, k_scales, v_scales, pos):
    """Serving-accurate decode step: preallocated int8 KV buffers carried
    through the loop, one-token dynamic_update_slice append per layer
    (kv_cache.py append_kv), attention over the buffer with a validity
    mask.  No cache copies — XLA aliases the while-loop carry in place."""
    from lightcompress_tpu.ops import qlinear_apply as _qa

    B = x.shape[0]
    Tbuf = k_cache.shape[3]
    valid = (jnp.arange(Tbuf) <= pos)[None, None, None, :]  # (1,1,1,Tbuf)
    G = N_HEADS // N_KV
    new_k, new_v, new_ks, new_vs = [], [], [], []
    for li, lw in enumerate(layers):
        h1 = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + 1e-6)
        q = _qa(h1, lw["q"], act_bits=ACT_BITS).reshape(
            B, N_HEADS, 1, HEAD_DIM)
        k = _qa(h1, lw["k"], act_bits=ACT_BITS).reshape(B, N_KV, 1, HEAD_DIM)
        v = _qa(h1, lw["v"], act_bits=ACT_BITS).reshape(B, N_KV, 1, HEAD_DIM)

        def q8(t):
            amax = jnp.max(jnp.abs(t.astype(jnp.float32)), -1, keepdims=True)
            sc = (jnp.maximum(amax, 1e-8) / 127.0).astype(jnp.bfloat16)
            return (jnp.clip(jnp.round(t / sc.astype(jnp.float32)), -127,
                             127).astype(jnp.int8), sc[..., 0])

        k8, ksn = q8(k)
        v8, vsn = q8(v)
        kc = jax.lax.dynamic_update_slice(k_cache[li], k8, (0, 0, pos, 0))
        vc = jax.lax.dynamic_update_slice(v_cache[li], v8, (0, 0, pos, 0))
        ksc = jax.lax.dynamic_update_slice(k_scales[li], ksn, (0, 0, pos))
        vsc = jax.lax.dynamic_update_slice(v_scales[li], vsn, (0, 0, pos))
        qg = q.reshape(B, N_KV, G, HEAD_DIM).astype(jnp.bfloat16)
        sc = jnp.einsum("bkgd,bksd->bkgs", qg, kc.astype(jnp.bfloat16))
        sc = sc * ksc[:, :, None, :] * (HEAD_DIM**-0.5)
        sc = jnp.where(valid, sc.astype(jnp.float32), -jnp.inf)
        probs = jax.nn.softmax(sc, -1)
        pv = (probs * vsc[:, :, None, :]).astype(jnp.bfloat16)
        ctx = jnp.einsum("bkgs,bksd->bkgd", pv, vc.astype(jnp.bfloat16))
        x = x + _qa(ctx.reshape(B, -1).astype(x.dtype), lw["o"],
                    act_bits=ACT_BITS)
        h2 = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + 1e-6)
        g = _qa(h2, lw["gate"], act_bits=ACT_BITS)
        u = _qa(h2, lw["up"], act_bits=ACT_BITS)
        x = x + _qa(jax.nn.silu(g) * u, lw["down"], act_bits=ACT_BITS)
        new_k.append(kc)
        new_v.append(vc)
        new_ks.append(ksc)
        new_vs.append(vsc)
    return (x, jnp.stack(new_k), jnp.stack(new_v), jnp.stack(new_ks),
            jnp.stack(new_vs))


def build_inputs():
    """All bench arrays; called under jax.eval_shape for the AOT compile
    (no HBM held during the 10-25 min remote compile) and for real under
    the measurement lock."""
    key = jax.random.PRNGKey(0)
    layers = [make_layer_qweights(k) for k in jax.random.split(key, LAYERS)]
    x = jax.random.normal(key, (BATCH, HIDDEN), jnp.bfloat16)
    kv_dt = jnp.int8 if KV_BITS in (4, 8) else jnp.bfloat16
    if ATTN_IMPL in ("bd4", "bds4"):
        # nibble-packed feature-major K / time-major V for the kv4 kernel
        k_cache = [
            jnp.zeros((BATCH, N_KV * HEAD_DIM // 2, CTX), jnp.int8)
            for _ in range(LAYERS)
        ]
        v_cache = [
            jnp.zeros((BATCH, CTX, N_KV * HEAD_DIM // 2), jnp.int8)
            for _ in range(LAYERS)
        ]
    elif ATTN_IMPL in ("bd", "bds"):
        # feature-major K / time-major V slabs for the block-diagonal kernel
        k_cache = [
            jnp.zeros((BATCH, N_KV * HEAD_DIM, CTX), kv_dt)
            for _ in range(LAYERS)
        ]
        v_cache = [
            jnp.zeros((BATCH, CTX, N_KV * HEAD_DIM), kv_dt)
            for _ in range(LAYERS)
        ]
    else:
        kdim = HEAD_DIM // 2 if KV_BITS == 4 else HEAD_DIM
        k_cache = [
            jnp.zeros((BATCH, N_KV, CTX, kdim), kv_dt)
            for _ in range(LAYERS)
        ]
        v_cache = [
            jnp.zeros((BATCH, N_KV, CTX, kdim), kv_dt)
            for _ in range(LAYERS)
        ]
    # bf16 KV scales (serving kv_cache default): halves the scale stream
    kv_scales = [
        (jnp.full((BATCH, N_KV, CTX), 0.01, jnp.bfloat16),
         jnp.full((BATCH, N_KV, CTX), 0.01, jnp.bfloat16))
        for _ in range(LAYERS)
    ] if KV_BITS in (4, 8) else [None] * LAYERS
    if KV_STACKED:
        # one stacked (L, B, H, T, D) buffer per side, layer rows read as
        # static slices — decode_step's k_cache[li] works unchanged; the
        # per-layer scale pairs stay a list (≈1% of the cache bytes)
        k_cache = jnp.stack(k_cache)
        v_cache = jnp.stack(v_cache)
    return layers, x, k_cache, v_cache, kv_scales


def decode_step_dusl(layers, x, k_list, v_list, ks_list, vs_list, pos):
    """Per-LAYER-list dus variant (VERDICT r2 weak #3 experiment): the KV
    buffers are a LIST of per-layer arrays carried through the loop, each
    appended with one dynamic_update_slice — no jnp.stack repack (the
    'dus' variant stacks all layers every step, which itself copies the
    whole cache and masks whether carry aliasing works at all)."""
    from lightcompress_tpu.ops import qlinear_apply as _qa

    B = x.shape[0]
    Tbuf = k_list[0].shape[2]
    valid = (jnp.arange(Tbuf) <= pos)[None, None, None, :]
    G = N_HEADS // N_KV
    new_k, new_v, new_ks, new_vs = [], [], [], []
    for li, lw in enumerate(layers):
        h1 = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + 1e-6)
        if FUSED:
            qkv = _qa(h1, lw["qkv"], act_bits=ACT_BITS)
            nq, nkv = N_HEADS * HEAD_DIM, N_KV * HEAD_DIM
            q = qkv[:, :nq].reshape(B, N_HEADS, 1, HEAD_DIM)
            k = qkv[:, nq:nq + nkv].reshape(B, N_KV, 1, HEAD_DIM)
            v = qkv[:, nq + nkv:].reshape(B, N_KV, 1, HEAD_DIM)
        else:
            q = _qa(h1, lw["q"], act_bits=ACT_BITS).reshape(
                B, N_HEADS, 1, HEAD_DIM)
            k = _qa(h1, lw["k"], act_bits=ACT_BITS).reshape(
                B, N_KV, 1, HEAD_DIM)
            v = _qa(h1, lw["v"], act_bits=ACT_BITS).reshape(
                B, N_KV, 1, HEAD_DIM)

        def q8(t):
            amax = jnp.max(jnp.abs(t.astype(jnp.float32)), -1,
                           keepdims=True)
            sc = (jnp.maximum(amax, 1e-8) / 127.0).astype(jnp.bfloat16)
            return (jnp.clip(jnp.round(t / sc.astype(jnp.float32)), -127,
                             127).astype(jnp.int8), sc[..., 0])

        k8, ksn = q8(k)
        v8, vsn = q8(v)
        kc = jax.lax.dynamic_update_slice(k_list[li], k8, (0, 0, pos, 0))
        vc = jax.lax.dynamic_update_slice(v_list[li], v8, (0, 0, pos, 0))
        ksc = jax.lax.dynamic_update_slice(ks_list[li], ksn, (0, 0, pos))
        vsc = jax.lax.dynamic_update_slice(vs_list[li], vsn, (0, 0, pos))
        qg = q.reshape(B, N_KV, G, HEAD_DIM).astype(jnp.bfloat16)
        sc = jnp.einsum("bkgd,bksd->bkgs", qg, kc.astype(jnp.bfloat16))
        sc = sc * ksc[:, :, None, :].astype(jnp.float32) * \
            (HEAD_DIM ** -0.5)
        sc = jnp.where(valid, sc.astype(jnp.float32), -jnp.inf)
        probs = jax.nn.softmax(sc, -1)
        pv = (probs * vsc[:, :, None, :].astype(jnp.float32)
              ).astype(jnp.bfloat16)
        ctx = jnp.einsum("bkgs,bksd->bkgd", pv, vc.astype(jnp.bfloat16))
        x = x + _qa(ctx.reshape(B, -1).astype(x.dtype), lw["o"],
                    act_bits=ACT_BITS)
        h2 = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + 1e-6)
        if FUSED:
            gu = _qa(h2, lw["gateup"], act_bits=ACT_BITS)
            g_, u = gu[:, :INTER], gu[:, INTER:]
        else:
            g_ = _qa(h2, lw["gate"], act_bits=ACT_BITS)
            u = _qa(h2, lw["up"], act_bits=ACT_BITS)
        x = x + _qa(jax.nn.silu(g_) * u, lw["down"], act_bits=ACT_BITS)
        new_k.append(kc)
        new_v.append(vc)
        new_ks.append(ksc)
        new_vs.append(vsc)
    return x, new_k, new_v, new_ks, new_vs


def main():
    if TAIL:
        assert FUSED and SCALES and SCALES != "contig", \
            "TAIL kernels take split scale/zero tiles (BENCH_SCALES=bf16)"
    if FUSEDLIN:
        assert SCALES != "contig", \
            "FUSEDLIN kernels take split scale/zero tiles"
    if KV_BITS == 4:
        assert ATTN_IMPL in ("xla", "bd4", "bds4"), \
            "kv4: XLA two-term planes or the bd4/bds4 nibble kernels"
    if ATTN_IMPL in ("bd4", "bds4"):
        assert KV_BITS == 4, "bd4/bds4 are the kv4 kernels"
    if KV_APPEND == "dus":
        layers, x, k_cache, v_cache, kv_scales = build_inputs()

    # Measurement protocol for the tunneled runtime: iterations chained
    # ON-DEVICE in one fori_loop (each step feeds the next), ended with a
    # host scalar read — block_until_ready alone returns before device
    # completion here, and identical replayed executions get dedup-cached.
    n_iters = 20

    if KV_APPEND == "dusl":
        assert KV_BITS == 8
        Tbuf = CTX + n_iters
        kb = [jnp.zeros((BATCH, N_KV, Tbuf, HEAD_DIM), jnp.int8)
              for _ in range(LAYERS)]
        vb = [jnp.zeros((BATCH, N_KV, Tbuf, HEAD_DIM), jnp.int8)
              for _ in range(LAYERS)]
        ksb = [jnp.full((BATCH, N_KV, Tbuf), 0.01, jnp.bfloat16)
               for _ in range(LAYERS)]
        vsb = [jnp.full((BATCH, N_KV, Tbuf), 0.01, jnp.bfloat16)
               for _ in range(LAYERS)]

        def many(layers, x, kb, vb, ksb, vsb):
            def body(i, carry):
                xx, kc, vc, ks, vs = carry
                y, kc, vc, ks, vs = decode_step_dusl(
                    layers, xx, kc, vc, ks, vs, CTX + i)
                y = y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
                return (y, kc, vc, ks, vs)

            return jax.lax.fori_loop(0, n_iters, body,
                                     (x, kb, vb, ksb, vsb))[0]

        key = jax.random.PRNGKey(0)
        layers = [make_layer_qweights(k)
                  for k in jax.random.split(key, LAYERS)]
        x = jax.random.normal(key, (BATCH, HIDDEN), jnp.bfloat16)
        step = jax.jit(many, donate_argnums=(2, 3, 4, 5))
        out = step(layers, x, kb, vb, ksb, vsb)
        _ = float(jnp.sum(out))  # compile + drain
        kb2 = [jnp.zeros((BATCH, N_KV, Tbuf, HEAD_DIM), jnp.int8)
               for _ in range(LAYERS)]
        vb2 = [jnp.zeros((BATCH, N_KV, Tbuf, HEAD_DIM), jnp.int8)
               for _ in range(LAYERS)]
        ksb2 = [jnp.full((BATCH, N_KV, Tbuf), 0.01, jnp.bfloat16)
                for _ in range(LAYERS)]
        vsb2 = [jnp.full((BATCH, N_KV, Tbuf), 0.01, jnp.bfloat16)
                for _ in range(LAYERS)]
        t0 = time.time()
        out = step(layers, out, kb2, vb2, ksb2, vsb2)
        _ = float(jnp.sum(out))
        dt = (time.time() - t0) / n_iters
        tokens_per_s = BATCH / dt
        kv_bytes = 2 * LAYERS * BATCH * N_KV * CTX * (HEAD_DIM + 2)
        weight_bytes = sum(
            int(np.prod(lw[n].codes.shape)) * lw[n].codes.dtype.itemsize
            + lw[n].scales.size * lw[n].scales.dtype.itemsize
            + (lw[n].zeros.size * lw[n].zeros.dtype.itemsize
               if lw[n].zeros is not None else 0)
            for lw in layers for n in lw)
        roofline_tps = BATCH * HBM_BW / (weight_bytes + kv_bytes)
        print(json.dumps({
            "metric": f"w4a{ACT_BITS}kv8_8b_c{CTX}_dusl_tokens_per_s",
            "value": round(tokens_per_s, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tokens_per_s / roofline_tps, 4),
        }))
        return

    if KV_APPEND == "dus":
        assert KV_BITS == 8, "dus bench variant models the int8 KV engine"
        Tbuf = CTX + n_iters
        kb = jnp.zeros((LAYERS, BATCH, N_KV, Tbuf, HEAD_DIM), jnp.int8)
        vb = jnp.zeros((LAYERS, BATCH, N_KV, Tbuf, HEAD_DIM), jnp.int8)
        ksb = jnp.full((LAYERS, BATCH, N_KV, Tbuf), 0.01, jnp.bfloat16)
        vsb = jnp.full((LAYERS, BATCH, N_KV, Tbuf), 0.01, jnp.bfloat16)

        def many(layers, x, kb, vb, ksb, vsb):
            def body(i, carry):
                xx, kc, vc, ks, vs = carry
                y, kc, vc, ks, vs = decode_step_dus(
                    layers, xx, kc, vc, ks, vs, CTX + i)
                y = y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
                return (y, kc, vc, ks, vs)

            return jax.lax.fori_loop(0, n_iters, body,
                                     (x, kb, vb, ksb, vsb))[0]

        step = jax.jit(many, donate_argnums=(2, 3, 4, 5))
        out = step(layers, x, kb, vb, ksb, vsb)
        _ = float(jnp.sum(out))  # compile + drain
        kb2 = jnp.zeros_like(kb)
        vb2 = jnp.zeros_like(vb)
        ksb2 = jnp.full_like(ksb, 0.01)
        vsb2 = jnp.full_like(vsb, 0.01)
        t0 = time.time()
        out = step(layers, out, kb2, vb2, ksb2, vsb2)
        _ = float(jnp.sum(out))  # forces real completion
        dt = (time.time() - t0) / n_iters
    else:
        import functools

        @functools.partial(jax.jit, static_argnames=("iters",))
        def step(layers, x, k_cache, v_cache, kv_scales, iters):
            def body(i, xx):
                y = decode_step(layers, xx, k_cache, v_cache, kv_scales)
                return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)

            return jax.lax.fori_loop(0, iters, body, x)

        # iter-count differencing: the axon tunnel adds ~20-30ms FIXED
        # latency per execute (measured, tools/stack_gap_experiments.py)
        # which would tax a single 20-iter run ~10%; marginal per-step
        # time = (t_100 - t_20) / 80 cancels it exactly.
        n_hi = 5 * n_iters
        # AOT-compile against abstract shapes FIRST: compiles hold no HBM,
        # so parallel bench processes (tools/r3_bench_batch*.sh) overlap
        # their 10-25 min remote compiles and only serialize the short
        # measurement phase behind the file lock below.  6 concurrent
        # processes that each allocated their 5.7GB of weights+KV up
        # front OOMed the 16GB chip (r3 batch-1).
        args_abs = jax.eval_shape(build_inputs)
        step_lo = step.lower(*args_abs, iters=n_iters).compile()
        step_hi = step.lower(*args_abs, iters=n_hi).compile()

        import fcntl

        lock = open("/tmp/lctpu_bench.lock", "w")
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            layers, x, k_cache, v_cache, kv_scales = build_inputs()
            out = step_lo(layers, x, k_cache, v_cache, kv_scales)
            _ = float(jnp.sum(out))  # warm lo + drain
            out = step_hi(layers, out, k_cache, v_cache, kv_scales)
            _ = float(jnp.sum(out))  # warm hi + drain
            t0 = time.time()
            out = step_lo(layers, out, k_cache, v_cache, kv_scales)
            _ = float(jnp.sum(out))
            t_lo = time.time() - t0
            t0 = time.time()
            out = step_hi(layers, out, k_cache, v_cache, kv_scales)
            _ = float(jnp.sum(out))
            t_hi = time.time() - t0
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)
        dt = (t_hi - t_lo) / (n_hi - n_iters)
    tokens_per_s = BATCH / dt

    # roofline: bytes read per decode step
    def _qp_bytes(qp):
        if isinstance(qp, tuple):  # BENCH_DOWNSPLIT halves
            return sum(_qp_bytes(h) for h in qp)
        return (int(np.prod(qp.codes.shape)) * qp.codes.dtype.itemsize
                + qp.scales.size * qp.scales.dtype.itemsize
                + (qp.zeros.size * qp.zeros.dtype.itemsize
                   if qp.zeros is not None else 0))

    weight_bytes = sum(_qp_bytes(lw[n]) for lw in layers for n in lw)
    kv_code_bytes = {4: HEAD_DIM // 2, 8: HEAD_DIM,
                     16: HEAD_DIM * 2}[KV_BITS]
    kv_bytes = 2 * LAYERS * BATCH * N_KV * CTX * (kv_code_bytes
                                                  + (2 if KV_BITS in (4, 8)
                                                     else 0))
    roofline_tps = BATCH * HBM_BW / (weight_bytes + kv_bytes)

    out = {
        "metric": f"w4a{ACT_BITS}kv{KV_BITS}_8b_c{CTX}"
                  "_decode_tokens_per_s",
        "value": round(tokens_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tokens_per_s / roofline_tps, 4),
    }
    # release the bare-stack weights/KV (~6GB) before the engine
    # subprocess allocates its own copy (the dict rebind of ``out`` just
    # dropped the chained output buffer)
    try:
        del layers, x, k_cache, v_cache, kv_scales
    except NameError:
        pass
    out.update(_engine_level_numbers(tokens_per_s))
    print(json.dumps(out))


def _engine_level_numbers(bare_tps: float) -> dict:
    """Engine-level serving throughput riding the SAME artifact (VERDICT
    r3 #2): run the continuous-batching engine's marginal decode step
    (tools/engine_step_probe.py, 32 slots x 1024 ctx, the xla8a
    append-first path) in a SUBPROCESS — the bare-stack weights/KV free
    with this process's allocator when measurement ends, but a fresh
    process guarantees the chip is clean for the engine's own 6.5GB.
    Reported as extra keys on the single bench JSON line:
    ``engine_tok_s`` and ``engine_frac_of_loop`` (engine / bare-loop)."""
    import subprocess

    if os.environ.get("BENCH_ENGINE", "1") == "0":
        return {}
    # probe at the SAME context as the bare loop so the fraction compares
    # like for like (both numerator and denominator move with BENCH_CTX)
    env = dict(os.environ, SLOTS="32", T=str(CTX), ATTN="xla")
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "tools", "engine_step_probe.py")],
            capture_output=True, text=True, timeout=2700, env=env)
        lines = [ln for ln in r.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            tail = (r.stderr or "").strip().splitlines()[-6:]
            return {"engine_tok_s": None,
                    "engine_error": " | ".join(tail)[-400:]}
        probe = json.loads(lines[-1])
        etps = float(probe["tok_per_s"])
        return {"engine_tok_s": round(etps, 1),
                "engine_frac_of_loop": round(etps / bare_tps, 4),
                "engine_ms_per_step": probe["per_step_ms"]}
    except Exception as e:  # noqa: BLE001 — bench must still emit its line
        return {"engine_tok_s": None, "engine_error": str(e)[:120]}


if __name__ == "__main__":
    main()
