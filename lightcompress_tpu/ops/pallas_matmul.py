"""Pallas TPU kernels: fused grouped-INT4 dequant-matmul (W4A16 decode).

The serving-core kernel (SURVEY §2.6 / §7: "grouped-INT4 unpack-in-register
matmul ... the single most perf-critical kernel").  Replaces the XLA path in
ops.qlinear, which materializes dequantized bf16 weights in HBM (~4.5 bytes
of traffic per weight); this kernel reads only the packed nibbles + scales
(~0.56 bytes per weight) and unpacks in registers.

Design notes (TPU-first):
- **Plane packing**: nibble j of word ``wp[n, kw]`` holds weight
  ``w[n, j*(K/8) + kw]`` — each of the 8 nibble planes covers a *contiguous*
  K-range, so unpacking is shift+mask only (no lane interleave, which Mosaic
  lowers poorly).  ``pack_int4_planes`` produces this layout.
- **Grouped scales without expansion**: for group g,
  ``y += s[n,g] * (x_g @ codes_g^T) - s[n,g]*z[n,g] * sum(x_g)`` — the scale
  applies to the (B, N_t) partial product, never expanded to (N, K).
- Grid over output-channel tiles only; the whole K extent of one tile's
  packed words sits in VMEM (decode x is tiny), so there is no K-loop
  accumulation state.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Array = jax.Array


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def pack_int4_planes(codes: Array) -> Array:
    """(N, K) uint4-valued -> (N, K/8) int32, plane layout."""
    n, k = codes.shape
    assert k % 8 == 0
    kp = k // 8
    u = jnp.asarray(codes, jnp.int32) & 0xF
    planes = u.reshape(n, 8, kp)  # plane j = codes[:, j*kp:(j+1)*kp]
    shifts = (jnp.arange(8, dtype=jnp.int32) * 4)[None, :, None]
    return jnp.sum(planes << shifts, axis=1).astype(jnp.int32)


def unpack_int4_planes(packed: Array, k: int) -> Array:
    n, kp = packed.shape
    assert kp * 8 == k
    shifts = (jnp.arange(8, dtype=jnp.int32) * 4)[None, :, None]
    planes = (packed[:, None, :] >> shifts) & 0xF
    return planes.reshape(n, k)


def tile_packed(wp: Array, n_tile: int, group: int) -> Array:
    """(N, K/8) -> (N/NT, gpp, NT, g): every kernel grid step then DMAs ONE
    fully-contiguous tile.  Without this, (NT, g) blocks of the row-major
    array are read as 512-byte strided bursts — measured ~130 GB/s vs
    ~500 GB/s contiguous on v5e (the single biggest kernel bottleneck)."""
    n, kp = wp.shape
    gpp = kp // group
    assert n % n_tile == 0 and kp % group == 0
    return wp.reshape(n // n_tile, n_tile, gpp, group).transpose(0, 2, 1, 3)


def tile_scales(s: Array, n_tile: int, gpp: int) -> Array:
    """(N, G=8*gpp) -> (gpp, N/NT, 8, NT) contiguous per-step scale tiles.
    Row (j, gi) order matches the kernel's g_idx = j*gpp + gi."""
    n, G = s.shape
    assert G == 8 * gpp and n % n_tile == 0
    # -> (N/NT, NT, 8, gpp) -> (gpp, N/NT, 8, NT)
    r = s.reshape(n // n_tile, n_tile, 8, gpp)
    return r.transpose(3, 0, 2, 1)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _w4a16_kernel(x_ref, wp_ref, s_ref, zs_ref, o_ref, *, group: int):
    """Grid = (N/N_t, gpp): grid dim 1 walks the groups-within-plane; the
    8 nibble planes are unrolled inside (static shifts).  Every operand
    arrives via a BlockSpec over PRE-TILED storage, so each grid step's DMA
    is one fully-contiguous chunk (tile_packed/tile_scales) — strided block
    reads of the flat layout measured ~4x slower.

    Block shapes per step:
      x:  (B, 8*group)     — x pre-reordered so step gi's 8 plane-slices are
                             contiguous
      wp: (1, 1, N_t, group) tile of (N/NT, gpp, NT, g)
      s/zs: (1, 1, 8, N_t) tile of (gpp, N/NT, 8, NT)
      o:  (B, N_t) f32     — accumulated across grid dim 1
    """
    gi = pl.program_id(1)

    @pl.when(gi == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xb = x_ref[:]
    wpb = wp_ref[0, 0]
    s_ref = s_ref.at[0, 0]
    zs_ref = zs_ref.at[0, 0]
    b, nt = o_ref.shape
    # 4 independent accumulators break the add dependency chain across the
    # 8 plane dots; bf16 operands halve MXU latency (f32 accumulate)
    accs = [jnp.zeros((b, nt), jnp.float32) for _ in range(4)]
    for j in range(8):
        cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.bfloat16)  # (N_t, g)
        xg = xb[:, j * group:(j + 1) * group].astype(jnp.bfloat16)  # (B, g)
        partial = jax.lax.dot_general(
            xg, cg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, N_t)
        accs[j % 4] = accs[j % 4] + partial * s_ref[j, :][None, :]
    # zero-point correction in one tiny dot: (B, 8) @ (8, N_t)
    xsum = jnp.sum(xb.reshape(b, 8, group), axis=2)
    corr = jax.lax.dot_general(
        xsum, zs_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o_ref[:] + (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr


@functools.partial(
    jax.jit,
    static_argnames=("group", "n_tile", "interpret"),
)
def w4a16_matmul_planes(
    x: Array,
    wp: Array,
    scales: Array,
    zeros: Optional[Array],
    group: int = 128,
    n_tile: int = 256,
    interpret: bool = False,
) -> Array:
    """y = x @ dequant(wp).T with plane-packed int4 weights.

    x: (B, K) float; wp: (N, K/8) int32; scales/zeros: (N, K/group).
    Returns (B, N) in x.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K = x.shape
    if wp.ndim == 4:  # pre-tiled (N/NT, gpp, NT, g) — the serving layout
        n_blocks, gpp_w, n_tile, gw = wp.shape
        N = n_blocks * n_tile
        assert gw == group and gpp_w * group * 8 == K
        wp_t = wp
    else:
        N, KP = wp.shape
        assert KP * 8 == K, f"K mismatch: {K} vs packed {KP}"
        assert K % (8 * group) == 0, "group must divide K/8"
        n_tile = min(n_tile, N)
        assert N % n_tile == 0
        wp_t = tile_packed(wp, n_tile, group)

    in_dtype = x.dtype
    kp = K // 8
    gpp = kp // group
    G = K // group

    # x reorder: k = j*kp + gi*group + t  ->  (gi, j, t) contiguous
    xf = x.astype(jnp.float32)
    xr = (
        xf.reshape(B, 8, gpp, group).transpose(0, 2, 1, 3).reshape(B, K)
    )
    s = scales.astype(jnp.float32)
    if zeros is None:
        zs = jnp.zeros_like(s)
    else:
        zs = zeros.astype(jnp.float32) * s
    sr = tile_scales(s, n_tile, gpp)
    zsr = tile_scales(zs, n_tile, gpp)

    kernel = functools.partial(_w4a16_kernel, group=group)
    grid = (N // n_tile, gpp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 8 * group), lambda i, gi: (0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_tile, group), lambda i, gi: (i, gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, n_tile), lambda i, gi: (gi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, n_tile), lambda i, gi: (gi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n_tile), lambda i, gi: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * kp * 4 + 2 * N * G * 4 + B * K * 4,
            transcendentals=0,
        ),
    )(xr, wp_t, sr, zsr)
    return out.astype(in_dtype)


# ---------------------------------------------------------------------------
# W4A8: int8 activations on the MXU int8 path
# ---------------------------------------------------------------------------
#
# Same data movement as W4A16 (identical packed-weight bytes — the DMA floor
# is unchanged) but the 8 plane dots run in the MXU's int8 mode, which
# measured ~229µs vs ~313µs for bf16 dots on the same shapes (see
# CLAUDE.md kernel-perf notes): the bf16 kernel is compute-bound above the
# DMA floor, the int8 one sits on it.  Activations are quantized per-token
# (dynamic, amax/127) outside the kernel; everything inside is integer-exact
# until the per-group f32 scale multiply.


def _w4a8_kernel(x_ref, wp_ref, s_ref, zs_ref, o_ref, *, group: int):
    """Int8-activation variant of _w4a16_kernel.

    Block shapes per step (grid = (N/N_t, gpp)):
      x:  (B, 8*group) int8  — per-token-quantized, plane-reordered
      wp: (1, 1, N_t, group) int32 packed tile
      s/zs: (1, 1, 8, N_t) f32 (zs pre-multiplied by scales)
      o:  (B, N_t) f32 — still needs the per-token act scale applied outside
    """
    gi = pl.program_id(1)

    @pl.when(gi == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xb = x_ref[:]
    wpb = wp_ref[0, 0]
    s_ref = s_ref.at[0, 0]
    zs_ref = zs_ref.at[0, 0]
    b, nt = o_ref.shape
    accs = [jnp.zeros((b, nt), jnp.float32) for _ in range(4)]
    for j in range(8):
        cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)  # (N_t, g) in [0,15]
        xg = xb[:, j * group:(j + 1) * group]  # (B, g) int8
        partial = jax.lax.dot_general(
            xg, cg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B, N_t) int32 — exact
        accs[j % 4] = accs[j % 4] + partial.astype(jnp.float32) * s_ref[j, :][None, :]
    xsum = jnp.sum(
        xb.astype(jnp.int32).reshape(b, 8, group), axis=2
    ).astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zs_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = o_ref[:] + (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr


def quantize_act_per_token(x: Array):
    """(B, K) float -> ((B, K) int8, (B, 1) f32 scale).  amax/127 dynamic."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


@functools.partial(
    jax.jit,
    static_argnames=("group", "n_tile", "interpret"),
)
def w4a8_matmul_planes(
    xq: Array,
    x_scale: Array,
    wp: Array,
    scales: Array,
    zeros: Optional[Array],
    group: int = 128,
    n_tile: int = 256,
    interpret: bool = False,
) -> Array:
    """y = (x_scale * xq) @ dequant(wp).T, xq int8 already plane-REORDERED?

    No — ``xq`` is in natural K order (B, K) int8; this function reorders it
    to plane layout (cheap int8 shuffle) and runs the int8 kernel.
    x_scale: (B, 1) f32.  Returns (B, N) f32.
    """
    from jax.experimental.pallas import tpu as pltpu

    B, K = xq.shape
    if wp.ndim == 4:
        n_blocks, gpp_w, n_tile, gw = wp.shape
        N = n_blocks * n_tile
        assert gw == group and gpp_w * group * 8 == K
        wp_t = wp
    else:
        N, KP = wp.shape
        assert KP * 8 == K
        assert K % (8 * group) == 0
        n_tile = min(n_tile, N)
        assert N % n_tile == 0
        wp_t = tile_packed(wp, n_tile, group)

    kp = K // 8
    gpp = kp // group
    G = K // group

    xr = xq.reshape(B, 8, gpp, group).transpose(0, 2, 1, 3).reshape(B, K)
    s = scales.astype(jnp.float32)
    if zeros is None:
        zs = jnp.zeros_like(s)
    else:
        zs = zeros.astype(jnp.float32) * s
    sr = tile_scales(s, n_tile, gpp)
    zsr = tile_scales(zs, n_tile, gpp)

    kernel = functools.partial(_w4a8_kernel, group=group)
    grid = (N // n_tile, gpp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, 8 * group), lambda i, gi: (0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_tile, group), lambda i, gi: (i, gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, n_tile), lambda i, gi: (gi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, n_tile), lambda i, gi: (gi, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n_tile), lambda i, gi: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * kp * 4 + 2 * N * G * 4 + B * K,
            transcendentals=0,
        ),
    )(xr, wp_t, sr, zsr)
    return out * x_scale


def w4a8_matmul(x: Array, qp, interpret: bool = False) -> Array:
    """W4A8 apply: dynamic per-token int8 act quant + int8-MXU fused kernel."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    xq, x_scale = quantize_act_per_token(x2)
    if qp.codes.ndim == 4:
        n_tile = qp.codes.shape[2]
    else:
        N = qp.codes.shape[0]
        n_tile = next((t for t in (512, 256, 128) if N % t == 0), 128)
    y = w4a8_matmul_planes(
        xq, x_scale, qp.codes, qp.scales, qp.zeros, group=qp.group_size,
        n_tile=n_tile, interpret=interpret,
    ).astype(x.dtype)
    if qp.bias is not None:
        y = y + qp.bias
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# QLinearParams integration
# ---------------------------------------------------------------------------

def w4a16_matmul_available(x: Array, qp) -> bool:
    if qp.bits != 4 or qp.is_float or qp.group_size <= 0:
        return False
    if getattr(qp, "layout", "rows") != "planes":
        return False
    *_, K = x.shape
    if K % (8 * qp.group_size) != 0:
        return False
    N = (qp.codes.shape[0] * qp.codes.shape[2] if qp.codes.ndim == 4
         else qp.codes.shape[0])
    return N % 128 == 0


def w4a16_matmul(x: Array, qp, interpret: bool = False) -> Array:
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    if qp.codes.ndim == 4:
        n_tile = qp.codes.shape[2]
    else:
        N = qp.codes.shape[0]
        n_tile = next((t for t in (512, 256, 128) if N % t == 0), 128)
    y = w4a16_matmul_planes(
        x2, qp.codes, qp.scales, qp.zeros, group=qp.group_size,
        n_tile=n_tile, interpret=interpret,
    )
    if qp.bias is not None:
        y = y + qp.bias
    return y.reshape(*lead, -1)
