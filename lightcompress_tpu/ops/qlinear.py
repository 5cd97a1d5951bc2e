"""Quantized linear ops — XLA reference path.

The serving-core computation (SURVEY §2.6: the vLLM cutlass_scaled_mm /
Triton fp8_gemm analogue): grouped-INT4/INT8 weights stored packed in HBM,
dequantized on the fly and fed to the MXU.  This module is the pure-XLA
implementation; ``ops.pallas_matmul`` provides the hand-tiled Pallas kernels
that replace it on the hot path (selected by ``qlinear_apply``).

Storage layout (QLinearParams):
- int4: codes packed 8-per-int32 along the input-channel dim, per-group
  scales/zeros float32 (group along ic).
- int8: codes int8, per-channel scales.
- fp8 (e4m3): codes float8_e4m3fn, per-channel or per-128x128-block scales.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..quant import QuantSpec, real_quant_weight

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QLinearParams:
    codes: Array  # int32-packed (oc, ic//8) for int4 | int8 (oc, ic) | fp8
    scales: Array  # (oc, n_group) f32
    zeros: Optional[Array]  # (oc, n_group) f32 or None (symmetric)
    bias: Optional[Array]
    bits: int = dataclasses.field(metadata=dict(static=True), default=4)
    group_size: int = dataclasses.field(metadata=dict(static=True), default=0)
    is_float: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # int4 code layout: 'rows' = contiguous vLLM-style nibbles (export interop)
    # | 'planes' = plane-packed for the Pallas fused kernel (serving)
    layout: str = dataclasses.field(metadata=dict(static=True), default="rows")


def quantize_linear(
    w: Array, spec: QuantSpec, bias: Optional[Array] = None,
    layout: str = "planes", scale_dtype=jnp.bfloat16,
    scale_layout: str = "split",
) -> QLinearParams:
    """``scale_dtype`` applies to the pre-tiled planes serving layout only:
    bf16 scales cut the kernel's scale+zero stream in half (+9% decode
    tokens/s measured; rel error 0.003 vs the 0.107 W4 quant noise — the
    analogue of the reference's fp16 scales in real-quant exports)."""
    codes, scales, zeros = real_quant_weight(w.astype(jnp.float32), spec)
    if spec.is_float:
        return QLinearParams(codes, scales.astype(jnp.float32), None, bias,
                             8, 0, True)
    if spec.bit == 4:
        s4 = scales.astype(jnp.float32)
        z4 = None if zeros is None else zeros.astype(jnp.float32)
        if z4 is None:
            # symmetric codes are SIGNED; every packed layout stores
            # unsigned nibbles, so offset to u = c + 8 with zero-point 8
            # (dequant (u - 8) * s) — keeps the kernels sign-free
            codes = codes.astype(jnp.int32) + 8
            z4 = jnp.full_like(s4, 8.0)
        if layout == "s4":
            from .pallas_matmul import (pack_s4_pairs, pick_n_tile_s4,
                                        tile_scales_pairs)

            N, K = codes.shape
            gs = spec.granularity == "per_group" and spec.group_size or 0
            if gs == 128 and K % (4 * gs) == 0 and N % 128 == 0:
                nt = pick_n_tile_s4(N, K)
                packed = pack_s4_pairs(codes, nt)
                # zero correction folds the sign offset: the kernel's
                # stored code is c' = u - 8, so w = c'*s - (z - 8)*s
                # (z4 is never None here — symmetric was offset above, and
                # its correction is exactly zero)
                z4 = tile_scales_pairs((z4 - 8.0) * s4, nt
                                       ).astype(scale_dtype)
                s4 = tile_scales_pairs(s4, nt).astype(scale_dtype)
                return QLinearParams(packed, s4, z4, bias, 4,
                                     spec.group_size, False, "s4")
            layout = "planes"  # fall back when shapes don't fit
        if layout == "planes":
            from .pallas_matmul import (pack_int4_planes, pick_n_tile,
                                        tile_packed, tile_scales)

            packed = pack_int4_planes(codes)
            N = packed.shape[0]
            gs = spec.granularity == "per_group" and spec.group_size or 0
            if gs and packed.shape[1] % gs == 0 and N % 128 == 0:
                # contiguous full-K tile serving layout (multi-MB DMA
                # blocks; see pallas_matmul.pick_n_tile); scales pre-tiled
                # with zeros premultiplied so the kernel skips the per-call
                # tile+premultiply re-materialization
                nt = pick_n_tile(N, packed.shape[1], gs)
                gpp = packed.shape[1] // gs
                packed = tile_packed(packed, nt, gs)
                if scale_layout == "contig":
                    # combined contiguous scale+zero slab per grid step
                    # (+20 tok/s measured, BENCH_SCALES=contig default)
                    from .pallas_matmul import tile_scales_combined

                    s4 = tile_scales_combined(
                        s4, z4 * s4, nt, gpp).astype(scale_dtype)
                    z4 = None
                elif z4 is not None:
                    z4 = tile_scales(z4 * s4, nt, gpp).astype(scale_dtype)
                    s4 = tile_scales(s4, nt, gpp).astype(scale_dtype)
                else:
                    s4 = tile_scales(s4, nt, gpp).astype(scale_dtype)
        else:
            from ..export import pack_int4

            packed = pack_int4(codes)
        return QLinearParams(
            packed,
            s4,
            z4,
            bias,
            4,
            spec.group_size if spec.granularity == "per_group" else 0,
            False,
            layout,
        )
    return QLinearParams(
        codes,
        scales.astype(jnp.float32),
        None if zeros is None else zeros.astype(jnp.float32),
        bias,
        8,
        spec.group_size if spec.granularity == "per_group" else 0,
        False,
    )


def _untile_scales(sr: Array) -> Array:
    """Inverse of pallas_matmul.tile_scales: (gpp, N/NT, 8, NT) -> (N, G)."""
    gpp, nb, eight, nt = sr.shape
    return sr.transpose(1, 3, 2, 0).reshape(nb * nt, eight * gpp)


def _unpack_int4_u(packed: Array) -> Array:
    """(oc, ic//8) int32 -> (oc, ic) int32 unsigned nibbles."""
    oc, words = packed.shape
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    u = (packed[:, :, None] >> shifts[None, None, :]) & 0xF
    return u.reshape(oc, words * 8)


def dequant_weight(qp: QLinearParams, dtype=jnp.bfloat16) -> Array:
    """Materialize the bf16 weight (oc, ic)."""
    if qp.is_float:
        w = qp.codes.astype(jnp.float32)
        oc = w.shape[0]
        s = qp.scales.reshape(oc, -1, 1)
        w = w.reshape(oc, s.shape[1], -1) * s
        return w.reshape(oc, -1).astype(dtype)
    if qp.bits == 4:
        if qp.layout == "s4":
            # group-pair byte layout (pack_s4_pairs): byte column
            # p*g + t packs c' of group 2p (low nibble) and 2p+1 (high);
            # w = c' * s - zs with transposed (N/NT, G, NT) scales
            nb, nt, kh = qp.codes.shape
            g = qp.group_size
            K = kh * 2
            b = qp.codes.astype(jnp.int32).reshape(nb, nt, kh // g, g)
            lo = ((b & 0xF) ^ 8) - 8          # group 2p codes
            hi = (((b >> 4) & 0xF) ^ 8) - 8   # group 2p+1 codes
            c = jnp.stack([lo, hi], axis=3)   # (nb, nt, K/2g, 2, g)
            cg = c.reshape(nb, nt, K // g, g).astype(jnp.float32)
            s = qp.scales.astype(jnp.float32).transpose(0, 2, 1)[..., None]
            zs = (qp.zeros.astype(jnp.float32).transpose(0, 2, 1)[..., None]
                  if qp.zeros is not None else 0.0)
            w = cg * s - zs
            return w.reshape(nb * nt, K).astype(dtype)
        if qp.layout == "planes":
            from .pallas_matmul import unpack_int4_planes

            codes = qp.codes
            if codes.ndim == 4:  # untile (N/NT, gpp, NT, g) -> (N, kp)
                nb, gpp, nt, g = codes.shape
                codes = codes.transpose(0, 2, 1, 3).reshape(nb * nt, gpp * g)
            u = unpack_int4_planes(codes, codes.shape[1] * 8).astype(
                jnp.float32
            )
        else:
            u = _unpack_int4_u(qp.codes).astype(jnp.float32)
    else:
        u = qp.codes.astype(jnp.float32)
    oc, ic = u.shape
    g = qp.group_size or ic
    u = u.reshape(oc, ic // g, g)
    if qp.scales.ndim == 3:
        # combined contiguous slab (tile_scales_combined): rows
        # [0, gpp*8) scales, [gpp*8, 2*gpp*8) premultiplied zeros
        nb, rows, nt = qp.scales.shape
        gpp = rows // 16
        comb = qp.scales.reshape(nb, 2, gpp, 8, nt)
        s = _untile_scales(comb[:, 0].transpose(1, 0, 2, 3)).reshape(
            oc, ic // g, 1)
        zs = _untile_scales(comb[:, 1].transpose(1, 0, 2, 3)).reshape(
            oc, ic // g, 1)
        return (u * s - zs).reshape(oc, ic).astype(dtype)
    if qp.scales.ndim == 4:
        # pre-tiled serving layout (gpp, N/NT, 8, NT) with premultiplied
        # zeros: y = u*s - zs
        s = _untile_scales(qp.scales).reshape(oc, ic // g, 1)
        zs = (_untile_scales(qp.zeros).reshape(oc, ic // g, 1)
              if qp.zeros is not None else 0.0)
        return (u * s - zs).reshape(oc, ic).astype(dtype)
    z = qp.zeros.reshape(oc, ic // g, 1) if qp.zeros is not None else 0.0
    s = qp.scales.reshape(oc, ic // g, 1)
    return ((u - z) * s).reshape(oc, ic).astype(dtype)


def qlinear_xla(x: Array, qp: QLinearParams) -> Array:
    """Dequant-then-matmul in XLA.

    For decode (small M) XLA fuses the dequant into the matmul read — HBM
    traffic is the packed codes, not the bf16 weights.  For prefill-sized
    M the SAME fusion caps the MXU (~39 TFLOP/s, unpack in the inner
    loop).  An optimization_barrier dequant-materialize was tried (r3)
    and REVERTED: at 8B scale XLA kept every layer's materialized bf16
    weight alive and compile OOMed HBM (15.95/15.75G).  The remaining
    lever for large-M prefill is raising the Pallas kernel's M cap
    (LCTPU_PALLAS_M_MAX, pallas_matmul.w4a16_matmul_available)."""
    w = dequant_weight(qp, dtype=jnp.bfloat16)
    y = jnp.einsum(
        "...i,oi->...o", x.astype(jnp.bfloat16), w,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if qp.bias is not None:
        y = y + qp.bias
    return y


def qlinear_apply(
    x: Array, qp: QLinearParams, use_pallas: bool = True, act_bits: int = 16
) -> Array:
    """Dispatch: Pallas fused kernel on TPU when shapes allow, XLA otherwise.

    ``act_bits=8`` selects the W4A8 path (per-token dynamic int8 act quant,
    int8-MXU dots) — numerics change (act quant error), throughput gains
    ~35% on the compute-bound bf16 kernel (see pallas_matmul).
    """
    if use_pallas and qp.bits == 4 and not qp.is_float \
            and jax.default_backend() != "cpu":
        try:
            from .pallas_matmul import (
                s4_matmul_available,
                w4a16_matmul,
                w4a16_matmul_available,
                w4a8_matmul,
                w4a8_prefill_available,
                w4a8_s4_matmul,
            )

            if act_bits == 8 and s4_matmul_available(x, qp):
                return w4a8_s4_matmul(x, qp)
            if act_bits == 8 and getattr(qp, "layout", "") == "planes_ks":
                from .pallas_matmul import w4a8_matmul_ks

                return w4a8_matmul_ks(x, qp)
            if act_bits == 8 and w4a8_prefill_available(x, qp):
                # batched/long prefill: the M-tiled kernel keeps large-M
                # matmuls on the int8 MXU (weights unpacked once per tile)
                return w4a8_matmul(x, qp)
            if w4a16_matmul_available(x, qp):
                if act_bits == 8:
                    return w4a8_matmul(x, qp)
                if qp.scales.ndim == 3:
                    # combined contiguous slab (W4A8 layout): split it
                    # into the A16 kernel's (gpp, N/NT, 8, NT) tiles on
                    # the fly — tiny (scales only) and loop-invariant
                    # under jit, vs the XLA dequant fallback that
                    # materialized the full bf16 weight per call
                    # (measured 0.03 of roofline, r5 W4A16 gate run)
                    nb, rows, nt = qp.scales.shape
                    gpp = rows // 16
                    comb = qp.scales.reshape(nb, 2, gpp, 8, nt)
                    qp16 = QLinearParams(
                        qp.codes, comb[:, 0].transpose(1, 0, 2, 3),
                        comb[:, 1].transpose(1, 0, 2, 3), qp.bias, 4,
                        qp.group_size, False, "planes")
                    return w4a16_matmul(x, qp16)
                return w4a16_matmul(x, qp)
        except ImportError:
            pass
    return qlinear_xla(x, qp)
