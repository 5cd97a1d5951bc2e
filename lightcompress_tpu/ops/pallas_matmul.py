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
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Array = jax.Array


def _vmem_limit_bytes() -> int:
    """Scoped-VMEM cap for the s4 kernel.  Default sized for v5e/v4-class
    parts (128MB VMEM); override via LCTPU_VMEM_LIMIT_MB on generations
    with less so Mosaic reports a clear scoped-VMEM error instead of a
    runtime failure (ADVICE r1)."""
    import os

    return int(os.environ.get("LCTPU_VMEM_LIMIT_MB", "100")) * 1024 * 1024


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------

def _maybe_vmem_params(est_bytes: int):
    """CompilerParams with a raised scoped-VMEM cap ONLY when the
    estimated working set exceeds Mosaic's 16MB default.  Measured: passing a 100MB
    vmem_limit_bytes unconditionally SLOWS the planes kernel ~19% (3333 ->
    2706 tok/s end-to-end) — the limit feeds Mosaic's buffering
    heuristics.  LCTPU_VMEM_LIMIT_MB forces the override for experiments."""
    import os

    from jax.experimental.pallas import tpu as pltpu

    forced = os.environ.get("LCTPU_VMEM_LIMIT_MB")
    if forced is None and est_bytes <= 15 << 20:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit_bytes())


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


def pack_int4_planes_masked(codes: Array) -> Array:
    """Plane packing for the MASK-ONLY unpack kernel: identical to
    ``pack_int4_planes`` except plane 7's nibbles are stored XOR 0x8.

    The masked kernel extracts plane j as ``w & (0xF << 4j)`` — ONE VPU op
    instead of shift+mask — whose int32 value is exactly ``c * 16^j``; the
    16^j factor folds into pre-divided scales (``tile_scales_masked``).
    Plane 7 owns the sign bit: storing ``u = c ^ 0x8`` makes the masked
    value ``(c - 8) * 16^7`` (signed two's complement), linear again with a
    constant -8 offset folded into the zero correction."""
    n, k = codes.shape
    assert k % 8 == 0
    kp = k // 8
    u = jnp.asarray(codes, jnp.int32) & 0xF
    planes = u.reshape(n, 8, kp)
    planes = planes.at[:, 7, :].set(planes[:, 7, :] ^ 0x8)
    shifts = (jnp.arange(8, dtype=jnp.int32) * 4)[None, :, None]
    return jnp.sum(planes << shifts, axis=1).astype(jnp.int32)


def tile_scales_masked(s: Array, n_tile: int, gpp: int) -> Array:
    """Scale tiles for the masked kernel: plane-j scales pre-divided by
    16^j so the un-shifted masked partial products come out right.
    Input (N, G); group g belongs to plane j = g // gpp."""
    n, G = s.shape
    assert G == 8 * gpp
    j = (jnp.arange(G) // gpp).astype(jnp.float32)
    fac = jnp.exp2(-4.0 * j)
    return tile_scales(s.astype(jnp.float32) * fac[None, :], n_tile, gpp)


def masked_zero_scales(zeros: Array, scales: Array, gpp: int) -> Array:
    """Premultiplied zero correction for the masked kernel:
    zs[g] = (z[g] - 8*[plane 7]) * s[g]  (the XOR-0x8 sign trick shifts
    plane 7's stored codes by -8)."""
    n, G = zeros.shape
    assert G == 8 * gpp
    off = jnp.where(jnp.arange(G) // gpp == 7, 8.0, 0.0)
    return (zeros.astype(jnp.float32) - off[None, :]) * \
        scales.astype(jnp.float32)


def tile_scales_combined(s: Array, zs: Array, n_tile: int,
                         gpp: int) -> Array:
    """Scales + premultiplied zeros fused into ONE contiguous per-step
    block: (N, G) x2 -> (N/NT, 2*gpp*8, NT).

    The split (gpp, N/NT, 8, NT) layout makes each grid step fetch 2*gpp
    strided ~32KB chunks — the measured ~130-180 GB/s small-block DMA
    regime — while the codes ride one 4MB block.  Here the step's entire
    scale+zero payload is one contiguous (2*gpp*8, NT) slab: rows
    gi*8 + j hold scales (kernel group order), rows gpp*8 + gi*8 + j hold
    zero-corrections."""
    def rows(t):
        r = tile_scales(t, n_tile, gpp)           # (gpp, N/NT, 8, NT)
        g, nb, _, nt = r.shape
        return r.transpose(1, 0, 2, 3).reshape(nb, g * 8, nt)

    return jnp.concatenate([rows(s), rows(zs)], axis=1)


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

def pick_n_tile(N: int, kp: int, group: int,
                max_bytes: int = 0) -> int:
    """Largest output-channel tile whose full-K packed block fits in
    ``max_bytes``.  Measured on v5e (tools/dma_experiments*.py): the grid
    pipeline streams ~640 GB/s with 4MB blocks but only ~180 GB/s with 1MB
    and ~130 GB/s with the old 128KB per-(tile,group) blocks — per-step DMA
    size, not layout, is what sets the kernel's bandwidth.  Default cap is
    4MB (double-buffered in VMEM); LCTPU_TILE_MAX_MB overrides for
    experiments."""
    import os

    if not max_bytes:
        max_bytes = int(os.environ.get("LCTPU_TILE_MAX_MB", "4")) << 20
    gpp = max(kp // group, 1)
    for nt in (4096, 2048, 1024, 512, 256, 128):
        if N % nt == 0 and gpp * nt * group * 4 <= max_bytes:
            # NOTE (r4): nt=1024 for the high-gpp down shape wins
            # STANDALONE (+13%, tools/down_tile_probe.py) but the 7.3MB
            # tile's scoped-VMEM override taxes the whole stack —
            # bench c2048 2624 -> 2063 (-21%).  The opaque-megakernel
            # rule again: bigger standalone kernels lose in-stack.
            return nt
    return 128


def _w4a16_kernel_fullk(x_ref, wp_ref, s_ref, zs_ref, o_ref, *,
                        group: int, gpp: int):
    """Full-K variant: grid = (N/NT,) only; each step DMAs the ENTIRE K
    extent of one output tile (gpp * NT * group nibbles, multi-MB) and
    loops the groups-within-plane on-chip.  Block shapes:
      x:  (B, K) bf16 plane-reordered (whole activation resident in VMEM)
      wp: (1, gpp, NT, group) int32
      s/zs: (gpp, 1, 8, NT) f32 (zs pre-multiplied by scales)
      o:  (B, NT) f32, written once per step
    """
    xb = x_ref[:]
    b, nt = o_ref.shape
    xsum = jnp.sum(
        xb.astype(jnp.float32).reshape(b, gpp * 8, group), axis=2)

    def gi_body(gi, accs):
        wpb = wp_ref[0, gi]  # (NT, group) int32
        news = list(accs)
        for j in range(8):
            cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.bfloat16)
            xg = x_ref[:, pl.ds((gi * 8 + j) * group, group)]
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            news[j % 4] = news[j % 4] + partial * s_ref[gi, 0, j, :][None, :]
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    zsb = zs_ref[:, 0].reshape(gpp * 8, nt).astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr


def _w4a16_kernel_fullk_masked(x_ref, wp_ref, s_ref, zs_ref, o_ref, *,
                               group: int, gpp: int):
    """Mask-only unpack + bf16 MXU dots.

    Plane j extracts as ``wpb & (0xF << 4j)`` — one VPU op per plane vs the
    shift+mask+int8-cast of the int8 kernel (~2 ops/nibble instead of ~3;
    the per-size chains are VPU-unpack-bound, tools/stack_gap_experiments
    q=379 GB/s vs the 732 copy ceiling).  The masked int32 value c*16^j is
    EXACT in bf16 (4-bit mantissa shifted), and the 16^j folds into
    pre-divided scale tiles (tile_scales_masked).  Activations stay bf16
    (no act-quant glue, no epilogue rescale): this is the W4A16 path.
    Requires weights packed with ``pack_int4_planes_masked`` (plane 7
    XOR 0x8; zero tiles from ``masked_zero_scales``).
    """
    xb = x_ref[:]
    b, nt = o_ref.shape
    xsum = jnp.sum(
        xb.astype(jnp.float32).reshape(b, gpp * 8, group), axis=2)

    def gi_body(gi, accs):
        wpb = wp_ref[0, gi]
        news = list(accs)
        for j in range(8):
            m = 0xF << (4 * j)
            if m >= 1 << 31:  # plane 7's mask wraps to a negative int32
                m -= 1 << 32
            d = (wpb & jnp.int32(m)).astype(jnp.bfloat16)
            xg = x_ref[:, pl.ds((gi * 8 + j) * group, group)]
            partial = jax.lax.dot_general(
                xg.astype(jnp.bfloat16), d,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            news[j % 4] = news[j % 4] + partial * \
                s_ref[gi, 0, j, :][None, :].astype(jnp.float32)
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    zsb = zs_ref[:, 0].reshape(gpp * 8, nt).astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr


@functools.partial(
    jax.jit,
    static_argnames=("group", "n_tile", "interpret"),
)
def w4a16_matmul_planes_masked(
    x: Array,
    wp: Array,
    scales: Array,
    zeros_scales: Array,
    group: int = 128,
    n_tile: int = 256,
    interpret: bool = False,
) -> Array:
    """y = x @ dequant(wp).T via the mask-only bf16 kernel.

    x: (B, K) float, natural order; wp: (N, K/8) int32 packed with
    ``pack_int4_planes_masked`` OR pre-tiled 4D; scales from
    ``tile_scales_masked`` (pre-tiled) or raw (N, G) — raw inputs are
    tiled+premultiplied here; zeros_scales = ``masked_zero_scales`` raw or
    its tile_scales tiling.  Returns (B, N) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K = x.shape
    if wp.ndim == 4:
        n_blocks, gpp_w, n_tile, gw = wp.shape
        N = n_blocks * n_tile
        assert gw == group and gpp_w * group * 8 == K
        wp_t = wp
        gpp = gpp_w
        s_t, zs_t = scales, zeros_scales
    else:
        N, KP = wp.shape
        assert KP * 8 == K and K % (8 * group) == 0
        n_tile = min(n_tile, N)
        assert N % n_tile == 0
        wp_t = tile_packed(wp, n_tile, group)
        gpp = KP // group
        s_t = tile_scales_masked(scales, n_tile, gpp)
        zs_t = tile_scales(zeros_scales, n_tile, gpp)
    # x reorder: k = j*kp + gi*group + t  ->  (gi, j, t) contiguous
    xr = x.astype(jnp.bfloat16) \
        .reshape(B, 8, gpp, group).transpose(0, 2, 1, 3).reshape(B, K)
    kernel = functools.partial(_w4a16_kernel_fullk_masked, group=group,
                               gpp=gpp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=(N // n_tile,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpp, n_tile, group), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp, 1, 8, n_tile), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp, 1, 8, n_tile), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * gpp * n_tile * group * 4 + B * N * 4
            + 2 * B * K + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K // 2 + B * K * 2 + B * N * 4,
            transcendentals=0,
        ),
    )(xr, wp_t, s_t, zs_t)
    return out


def _w4a8_kernel_fullk(x_ref, wp_ref, s_ref, zs_ref, o_ref, *,
                       group: int, gpp: int):
    """Int8-activation full-K variant (see _w4a16_kernel_fullk); the 8
    plane dots per group run in MXU int8 mode, integer-exact until the
    per-group f32 scale multiply."""
    xb = x_ref[:]
    b, nt = o_ref.shape
    xsum = jnp.sum(
        xb.astype(jnp.int32).reshape(b, gpp * 8, group), axis=2
    ).astype(jnp.float32)

    def gi_body(gi, accs):
        wpb = wp_ref[0, gi]
        news = list(accs)
        for j in range(8):
            cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)
            xg = x_ref[:, pl.ds((gi * 8 + j) * group, group)]
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            news[j % 4] = news[j % 4] + partial.astype(jnp.float32) * \
                s_ref[gi, 0, j, :][None, :]
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    zsb = zs_ref[:, 0].reshape(gpp * 8, nt).astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr


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

    x: (B, K) float; wp: (N, K/8) int32; scales/zeros: (N, K/group), OR
    pre-tiled 4D (gpp, N/NT, 8, NT) with zeros already premultiplied by
    scales (the serving layout — skips the per-call tile+premultiply,
    which otherwise re-materializes ~2x N*G*4 bytes every decode step).
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
    xr = (
        x.astype(jnp.bfloat16)
        .reshape(B, 8, gpp, group).transpose(0, 2, 1, 3).reshape(B, K)
    )
    if scales.ndim == 4:  # pre-tiled, zeros premultiplied
        sr = scales
        zsr = (jnp.zeros_like(sr) if zeros is None else zeros)
    else:
        s = scales.astype(jnp.float32)
        if zeros is None:
            zs = jnp.zeros_like(s)
        else:
            zs = zeros.astype(jnp.float32) * s
        sr = tile_scales(s, n_tile, gpp)
        zsr = tile_scales(zs, n_tile, gpp)

    kernel = functools.partial(_w4a16_kernel_fullk, group=group, gpp=gpp)
    grid = (N // n_tile,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpp, n_tile, group), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp, 1, 8, n_tile), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp, 1, 8, n_tile), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * gpp * n_tile * group * 4 + B * N * 4
            + 2 * B * K + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * kp * 4 + 2 * N * G * 4 + B * K * 2,
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


def quantize_act_per_token(x: Array):
    """(B, K) float -> ((B, K) int8, (B, 1) f32 scale).  amax/127 dynamic."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _w4a8_kernel_fullk_combined(x_ref, wp_ref, szs_ref, o_ref, *,
                                group: int, gpp: int):
    """_w4a8_kernel_fullk with the COMBINED contiguous scale slab:
    szs_ref (1, 2*gpp*8, NT) — rows [0, gpp*8) scales, [gpp*8, 2*gpp*8)
    premultiplied zero corrections.  One scale DMA per grid step instead
    of 2*gpp strided chunks."""
    xb = x_ref[:]
    b, nt = o_ref.shape
    xsum = jnp.sum(
        xb.astype(jnp.int32).reshape(b, gpp * 8, group), axis=2
    ).astype(jnp.float32)

    def gi_body(gi, accs):
        wpb = wp_ref[0, gi]
        # one aligned (8, NT) scale block per group; rows indexed
        # statically below (Mosaic requires provably 8-aligned dynamic
        # sublane starts — gi*8 is, gi*8+j is not)
        sblk = szs_ref[0, pl.ds(gi * 8, 8), :].astype(jnp.float32)
        news = list(accs)
        for j in range(8):
            cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)
            xg = x_ref[:, pl.ds((gi * 8 + j) * group, group)]
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            news[j % 4] = news[j % 4] + partial.astype(jnp.float32) * \
                sblk[j][None, :]
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    zsb = szs_ref[0, gpp * 8:, :].astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr


def _xsum_slab_order(xb, gpp: int, group: int):
    """Per-group activation sums of a NATURAL-order int8 block, permuted
    to the combined scale slab's (gi, j) row order: natural column group
    g holds plane j = g // gpp, group gi = g % gpp, while slab row
    r = gi*8 + j.  The permutation runs as a constant one-hot matmul
    ((b, G) @ (G, G), G = 8*gpp — trivial work) because Mosaic cannot
    lower a minor-dim transpose of the summed (b, 8, gpp) tensor."""
    b = xb.shape[0]
    G = gpp * 8
    xsum_nat = jnp.sum(
        xb.astype(jnp.int32).reshape(b, G, group), axis=2
    ).astype(jnp.float32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)   # source s
    cc = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)   # slab row r
    perm = (rr == (cc % 8) * gpp + cc // 8).astype(jnp.float32)
    return jax.lax.dot_general(
        xsum_nat, perm, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _w4a8_kernel_mtiled(x_ref, xs_ref, wp_ref, szs_ref, o_ref, wun_scr, *,
                        group: int, gpp: int):
    """PREFILL-regime variant of _w4a8_kernel_fullk_combined: grid is
    (N tiles, M tiles) with M innermost, so the packed weight tile and
    scale slab stay VMEM-resident across all M steps of one output tile
    (Pallas skips re-fetch when the block index is unchanged) — and the
    VPU nibble unpack runs ONCE per weight tile (into ``wun_scr``) instead
    of once per (m, n) step.  This removes the whole-M-in-VMEM assumption
    that capped the decode kernel at M<=256 (VERDICT r4 #3): batched
    prefill at M = n_prompts * T now stays on the int8-MXU kernel instead
    of falling into XLA's in-loop-unpack dense path (~39 TFLOP/s r2
    ladder)."""
    m_idx = pl.program_id(1)
    b, nt = o_ref.shape

    @pl.when(m_idx == 0)
    def _unpack():
        for gi in range(gpp):
            wpb = wp_ref[0, gi]
            for j in range(8):
                wun_scr[gi * 8 + j] = \
                    ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)

    xb = x_ref[:]
    # NATURAL-order x (see _w4a8_kernel_grouped): no host-side int8
    # lane-regroup transpose; the zero-correction sums are permuted to
    # the szs slab's (gi, j) row order via a constant one-hot dot
    xsum = _xsum_slab_order(xb, gpp, group)

    def gi_body(gi, accs):
        sblk = szs_ref[0, pl.ds(gi * 8, 8), :].astype(jnp.float32)
        news = list(accs)
        for j in range(8):
            cg = wun_scr[gi * 8 + j]
            xg = x_ref[:, pl.ds((j * gpp + gi) * group, group)]
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            news[j % 4] = news[j % 4] + partial.astype(jnp.float32) * \
                sblk[j][None, :]
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    zsb = szs_ref[0, gpp * 8:, :].astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = ((accs[0] + accs[1]) + (accs[2] + accs[3]) - corr) * xs_ref[:]
    # the act-scale multiply + down-cast happen IN-KERNEL so the custom
    # call's HBM output is bf16: an f32 (M, N) output at prefill M
    # (e.g. 32768 x 28672 = 3.5GB for gateup) OOMed the 16G chip where
    # XLA's dense path kept bf16 intermediates (engine probe r4)
    o_ref[:] = y.astype(o_ref.dtype)


def _w4a8_kernel_ksplit(x_ref, szs_ref, wp_ref, o_ref, *,
                        group: int, gpp2: int):
    """K-SPLIT variant of _w4a8_kernel_fullk_combined for high-gpp shapes
    (down: K=14336, gpp=14): grid (N tiles, K halves) with OUTPUT
    ACCUMULATION across the inner (half) dim.  Each step's tile is
    (gpp/2, 2*nt, g) — n_tile doubles at the same <=4MB DMA block, so a
    step issues half as many, twice-as-large MXU dots (the down shape
    ran at 0.59 of its copy floor on dot-issue overhead).  Unlike the
    nt=1024 single-tile variant (-21% in-stack: scoped-VMEM override
    tax) the tiles here stay under Mosaic's 16MB default."""
    h = pl.program_id(1)
    xb = x_ref[0]  # (B, K2) — this half's plane-reordered activations
    b, nt = o_ref.shape
    xsum = jnp.sum(
        xb.astype(jnp.int32).reshape(b, gpp2 * 8, group), axis=2
    ).astype(jnp.float32)

    def gi_body(gi, accs):
        wpb = wp_ref[0, 0, gi]
        sblk = szs_ref[0, 0, pl.ds(gi * 8, 8), :].astype(jnp.float32)
        news = list(accs)
        for j in range(8):
            cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)
            xg = x_ref[0, :, pl.ds((gi * 8 + j) * group, group)]
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            news[j % 4] = news[j % 4] + partial.astype(jnp.float32) * \
                sblk[j][None, :]
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp2, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    zsb = szs_ref[0, 0, gpp2 * 8:, :].astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    part = (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr

    @pl.when(h == 0)
    def _init():
        o_ref[:] = part

    @pl.when(h > 0)
    def _acc():
        o_ref[:] = o_ref[:] + part


def tile_packed_ksplit(wp: Array, n_tile: int, group: int,
                       splits: int = 2) -> Array:
    """(N, kp) plane-packed -> (N/NT, splits, gpp/splits, NT, g): each
    grid step DMAs one contiguous half-K tile."""
    n, kp = wp.shape
    kp2 = kp // splits
    halves = [tile_packed(wp[:, h * kp2:(h + 1) * kp2], n_tile, group)
              for h in range(splits)]
    return jnp.stack(halves, axis=1)


def _ksplit_group_idx(gpp: int, splits: int):
    """Natural group indices covered by each K half, in the kernel's
    (j-major, gi-minor) order: half h's word p holds K position
    j*kp + h*kp2 + p_local, i.e. group j*gpp + h*gpp2 + gi."""
    gpp2 = gpp // splits
    return [[j * gpp + h * gpp2 + gi for j in range(8)
             for gi in range(gpp2)] for h in range(splits)]


def tile_scales_combined_ksplit(s: Array, zs: Array, n_tile: int,
                                gpp: int, splits: int = 2) -> Array:
    """-> (N/NT, splits, 2*(gpp/splits)*8, NT) combined slabs per half."""
    out = []
    for idx in _ksplit_group_idx(gpp, splits):
        out.append(tile_scales_combined(s[:, idx], zs[:, idx], n_tile,
                                        gpp // splits))
    return jnp.stack(out, axis=1)


@functools.partial(
    jax.jit, static_argnames=("group", "interpret"),
)
def w4a8_matmul_planes_ksplit(
    xq: Array,       # (B, K) int8 natural order
    x_scale: Array,  # (B, 1) f32
    wp_t: Array,     # (N/NT, splits, gpp2, NT, g) int32
    szs: Array,      # (N/NT, splits, 2*gpp2*8, NT)
    group: int = 128,
    interpret: bool = False,
) -> Array:
    from jax.experimental.pallas import tpu as pltpu

    n_blocks, splits, gpp2, n_tile, gw = wp_t.shape
    assert gw == group
    K2 = gpp2 * group * 8
    K = K2 * splits
    B = xq.shape[0]
    N = n_blocks * n_tile
    gpp = gpp2 * splits
    kp2 = K2 // 8
    # per-half natural-K view: x_h[j*kp2 + p] = x[j*kp + h*kp2 + p],
    # then the standard plane reorder within the half
    xh = xq.reshape(B, 8, splits, kp2)
    xr = jnp.stack(
        [xh[:, :, h].reshape(B, 8, gpp2, group)
         .transpose(0, 2, 1, 3).reshape(B, K2)
         for h in range(splits)])  # (splits, B, K2)
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_ksplit, group=group, gpp2=gpp2),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=(n_blocks, splits),
        in_specs=[
            pl.BlockSpec((1, B, K2), lambda i, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * gpp2 * 8, n_tile),
                         lambda i, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gpp2, n_tile, group),
                         lambda i, h: (i, h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n_tile), lambda i, h: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * gpp2 * n_tile * group * 4 + 2 * B * K2
            + B * n_tile * 4 * 6 + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K // 2 + 2 * N * gpp * 8 * 2 + B * K,
            transcendentals=0,
        ),
    )(xr, szs, wp_t)
    return out * x_scale


def _w4a8_kernel_stacked(x_ref, xs_ref, wp_ref, szs_ref, o_ref, *,
                         group: int, gpp: int, pair: bool):
    """STACKED-EXPERT variant of _w4a8_kernel_fullk_combined: grid
    (E, N tiles).  ``pair`` means x carries the expert dim (the MoE
    down-proj, whose input differs per expert); otherwise all experts
    share one activation block (gate/up).  Built because the XLA
    dequant+einsum dense-MoE path measured 33 ms/layer on-chip — the
    stacked int4 unpack never fuses (moe_gather_probe r4)."""
    xb = x_ref[0] if pair else x_ref[:]
    b, nt = o_ref.shape[-2:]
    xsum = jnp.sum(
        xb.astype(jnp.int32).reshape(b, gpp * 8, group), axis=2
    ).astype(jnp.float32)

    def gi_body(gi, accs):
        wpb = wp_ref[0, 0, gi]
        sblk = szs_ref[0, 0, pl.ds(gi * 8, 8), :].astype(jnp.float32)
        news = list(accs)
        for j in range(8):
            cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)
            xg = (x_ref[0, :, pl.ds((gi * 8 + j) * group, group)] if pair
                  else x_ref[:, pl.ds((gi * 8 + j) * group, group)])
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            news[j % 4] = news[j % 4] + partial.astype(jnp.float32) * \
                sblk[j][None, :]
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    zsb = szs_ref[0, 0, gpp * 8:, :].astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xs = xs_ref[0] if pair else xs_ref[:]
    o_ref[0] = (((accs[0] + accs[1]) + (accs[2] + accs[3]) - corr)
                * xs).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "pair", "interpret"),
)
def w4a8_stacked_matmul(
    xq: Array,      # (B, K) int8 natural order, or (E, B, K) when pair
    x_scale: Array,  # (B, 1) f32, or (E, B, 1)
    wp_t: Array,    # (E, N/NT, gpp, NT, group) int32
    szs: Array,     # (E, N/NT, 2*gpp*8, NT) combined scale+zero slabs
    group: int = 128,
    pair: bool = False,
    interpret: bool = False,
) -> Array:
    """Stacked-expert W4A8 planes matmul -> (E, B, N) f32.

    Dense-MoE serving compute at kernel speed: ONE pallas_call with grid
    (E, N tiles); the shared activation block stays VMEM-resident across
    every expert's tiles (non-pair), weights stream as contiguous
    tiles."""
    from jax.experimental.pallas import tpu as pltpu

    E, n_blocks, gpp, n_tile, gw = wp_t.shape
    assert gw == group
    K = gpp * group * 8
    B = xq.shape[-2]
    N = n_blocks * n_tile
    # pad token rows to the 8-sublane minimum: B < 8 blocks lower
    # pathologically on Mosaic (the r1 4-row GQA-dot class)
    B0 = B
    if B < 8:
        padw = [(0, 0)] * (xq.ndim - 2) + [(0, 8 - B), (0, 0)]
        xq = jnp.pad(xq, padw)
        x_scale = jnp.pad(x_scale, padw)
        B = 8

    if pair:
        xr = xq.reshape(E, B, 8, gpp, group).transpose(0, 1, 3, 2, 4) \
            .reshape(E, B, K)
        x_in = [
            pl.BlockSpec((1, B, K), lambda e, i: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda e, i: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        xr = xq.reshape(B, 8, gpp, group).transpose(0, 2, 1, 3) \
            .reshape(B, K)
        x_in = [
            pl.BlockSpec((B, K), lambda e, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda e, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_stacked, group=group, gpp=gpp,
                          pair=pair),
        out_shape=jax.ShapeDtypeStruct((E, B, N), jnp.float32),
        grid=(E, n_blocks),
        in_specs=x_in + [
            pl.BlockSpec((1, 1, gpp, n_tile, group),
                         lambda e, i: (e, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * gpp * 8, n_tile),
                         lambda e, i: (e, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, n_tile), lambda e, i: (e, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * gpp * n_tile * group * 4 + 2 * B * K
            + B * n_tile * 4 * 6 + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * B * N * K,
            bytes_accessed=E * (N * K // 2 + 2 * N * (K // group) * 2)
            + B * K + E * B * N * 4,
            transcendentals=0,
        ),
    )(xr, x_scale.astype(jnp.float32), wp_t, szs)
    if B0 != B:
        out = out[:, :B0]
    return out


def _w4a8_kernel_stacked_bf16(x_ref, xs_ref, wp_ref, szs_ref, st_ref,
                              o_ref, *, group: int, gpp: int, pair: bool):
    """Small-M stacked-expert kernel (VERDICT r4 #5): ONE bf16 dot per
    group-BLOCK (8 planes concatenated, scales folded into the unpacked
    weights) instead of 8 int8 dots — gpp+1 dot issues per grid step vs
    8*gpp+1.  The stacked kernel at serving M (4-32 tokens, padded to 8
    sublanes) is dot-ISSUE bound, not MXU-throughput bound, so the bf16
    dots' 2x MXU time is irrelevant (the r2 'masked kernel wins on small
    mats' regime).  Zero correction stays the xsum trick."""
    xb = x_ref[0] if pair else x_ref[:]
    b, nt = o_ref.shape[-2:]
    xsum = jnp.sum(
        xb.astype(jnp.int32).reshape(b, gpp * 8, group), axis=2
    ).astype(jnp.float32)

    def gi_body(gi, acc):
        wpb = wp_ref[0, 0, gi]          # (nt, group) int32
        sb = st_ref[0, 0, gi]           # (nt, 8) per-plane scales
        w_all = jnp.concatenate(
            [((wpb >> (4 * j)) & 0xF).astype(jnp.bfloat16)
             * sb[:, j:j + 1].astype(jnp.bfloat16)
             for j in range(8)], axis=-1)         # (nt, 8*group)
        xg = (x_ref[0, :, pl.ds(gi * 8 * group, 8 * group)] if pair
              else x_ref[:, pl.ds(gi * 8 * group, 8 * group)]
              ).astype(jnp.bfloat16)
        partial = jax.lax.dot_general(
            xg, w_all, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + partial

    acc = jax.lax.fori_loop(
        0, gpp, gi_body, jnp.zeros((b, nt), jnp.float32))
    zsb = szs_ref[0, 0, gpp * 8:, :].astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xs = xs_ref[0] if pair else xs_ref[:]
    o_ref[0] = ((acc - corr) * xs).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "pair", "interpret"),
)
def w4a8_stacked_matmul_smallm(
    xq: Array,      # (B, K) int8 natural order, or (E, B, K) when pair
    x_scale: Array,  # (B, 1) f32, or (E, B, 1)
    wp_t: Array,    # (E, N/NT, gpp, NT, group) int32
    szs: Array,     # (E, N/NT, 2*gpp*8, NT) combined scale+zero slabs
    group: int = 128,
    pair: bool = False,
    interpret: bool = False,
) -> Array:
    """Small-M variant of w4a8_stacked_matmul: bf16 block dots with
    folded scales (see _w4a8_kernel_stacked_bf16).  Same inputs; the
    transposed per-block scale slab st (E, N/NT, gpp, NT, 8) is derived
    from szs here (tiny: K/group scales per output channel)."""
    from jax.experimental.pallas import tpu as pltpu

    E, n_blocks, gpp, n_tile, gw = wp_t.shape
    assert gw == group
    K = gpp * group * 8
    B = xq.shape[-2]
    N = n_blocks * n_tile
    B0 = B
    if B < 8:
        padw = [(0, 0)] * (xq.ndim - 2) + [(0, 8 - B), (0, 0)]
        xq = jnp.pad(xq, padw)
        x_scale = jnp.pad(x_scale, padw)
        B = 8
    # (E, nb, 2*gpp*8, nt) rows [0, gpp*8) are scales in (gi, j) order ->
    # (E, nb, gpp, nt, 8) so the kernel reads per-block (nt, 8) slabs
    st = szs[:, :, :gpp * 8].reshape(E, n_blocks, gpp, 8, n_tile) \
        .transpose(0, 1, 2, 4, 3)

    if pair:
        xr = xq.reshape(E, B, 8, gpp, group).transpose(0, 1, 3, 2, 4) \
            .reshape(E, B, K)
        x_in = [
            pl.BlockSpec((1, B, K), lambda e, i: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda e, i: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        xr = xq.reshape(B, 8, gpp, group).transpose(0, 2, 1, 3) \
            .reshape(B, K)
        x_in = [
            pl.BlockSpec((B, K), lambda e, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda e, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_stacked_bf16, group=group, gpp=gpp,
                          pair=pair),
        out_shape=jax.ShapeDtypeStruct((E, B, N), jnp.float32),
        grid=(E, n_blocks),
        in_specs=x_in + [
            pl.BlockSpec((1, 1, gpp, n_tile, group),
                         lambda e, i: (e, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * gpp * 8, n_tile),
                         lambda e, i: (e, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gpp, n_tile, 8),
                         lambda e, i: (e, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, n_tile), lambda e, i: (e, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * gpp * n_tile * group * 4 + 2 * B * K
            + n_tile * 8 * group * 2 * 2
            + B * n_tile * 4 * 6 + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * E * B * N * K,
            bytes_accessed=E * (N * K // 2 + 3 * N * (K // group) * 2)
            + B * K + E * B * N * 4,
            transcendentals=0,
        ),
    )(xr, x_scale.astype(jnp.float32), wp_t, szs, st)
    if B0 != B:
        out = out[:, :B0]
    return out


def _w4a8_kernel_gathered(e_ref, t_ref, x_ref, xs_ref, wp_ref, szs_ref,
                          o_ref, *, group: int, gpp: int):
    """Body for w4a8_gathered_matmul: one (selection, N-tile) grid step,
    same per-group int8 dot + xsum zero-correction math as
    _w4a8_kernel_stacked at b = 8 (the token row is replicated to the
    sublane minimum by the caller — pass cost is array-fill bound, so
    the replicated rows are free)."""
    b = x_ref.shape[1]                  # 8 — one token, replicated
    nt = o_ref.shape[-1]
    xsum = jnp.sum(
        x_ref[0].astype(jnp.int32).reshape(b, gpp * 8, group), axis=2
    ).astype(jnp.float32)

    def gi_body(gi, accs):
        wpb = wp_ref[0, 0, gi]
        sblk = szs_ref[0, 0, pl.ds(gi * 8, 8), :].astype(jnp.float32)
        news = list(accs)
        for j in range(8):
            cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)
            xg = x_ref[0, :, pl.ds((gi * 8 + j) * group, group)]
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            news[j % 4] = news[j % 4] + partial.astype(jnp.float32) * \
                sblk[j][None, :]
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    zsb = szs_ref[0, 0, gpp * 8:, :].astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (((accs[0] + accs[1]) + (accs[2] + accs[3]) - corr)
                * xs_ref[0]).astype(o_ref.dtype)[:1]


@functools.partial(
    jax.jit,
    static_argnames=("group", "interpret"),
)
def w4a8_gathered_matmul(
    xq: Array,       # (n, K) int8 natural order
    x_scale: Array,  # (n, 1) f32
    wp_t: Array,     # (E, N/NT, gpp, NT, group) int32 (stacked_planes)
    szs: Array,      # (E, N/NT, 2*gpp*8, NT) combined scale+zero slabs
    e_idx: Array,    # (n_sel,) int32 expert id per selection
    t_idx: Array,    # (n_sel,) int32 token row per selection
    group: int = 128,
    interpret: bool = False,
) -> Array:
    """Expert-GATHERED W4A8 planes matmul: out[s] = x[t_idx[s]] @
    W[e_idx[s]].T -> (n_sel, N) f32.

    The small-n MoE serving fix (VERDICT r4 #5): scalar-prefetched
    (e_idx, t_idx) drive the BlockSpec index maps, so only the SELECTED
    experts' weight tiles DMA from HBM — n_sel/E of the dense stacked
    kernel's weight traffic AND MXU array-fill passes.  The XLA gathered
    path materializes a dequantized copy per selection (catastrophic,
    moe_gather_probe r4); this reads packed codes only.  Reference
    topology: deepseekv3.py:128-167 sequential per-expert loop."""
    from jax.experimental.pallas import tpu as pltpu

    E, n_blocks, gpp, n_tile, gw = wp_t.shape
    assert gw == group
    K = gpp * group * 8
    n_sel = e_idx.shape[0]
    N = n_blocks * n_tile
    # pre-gather token rows to selection order + rearrange to the
    # kernel's (gi, j, t) column layout, replicated to 8 sublanes
    xr = xq[t_idx].reshape(n_sel, 8, gpp, group).transpose(0, 2, 1, 3) \
        .reshape(n_sel, 1, K)
    xr = jnp.broadcast_to(xr, (n_sel, 8, K))
    xs = jnp.broadcast_to(x_scale[t_idx].reshape(n_sel, 1, 1),
                          (n_sel, 8, 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_sel, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 8, K), lambda s, i, e, t: (s, 0, 0)),
            pl.BlockSpec((1, 8, 1), lambda s, i, e, t: (s, 0, 0)),
            pl.BlockSpec((1, 1, gpp, n_tile, group),
                         lambda s, i, e, t: (e[s], i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2 * gpp * 8, n_tile),
                         lambda s, i, e, t: (e[s], i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, n_tile), lambda s, i, e, t: (s, 0, i)),
    )

    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_gathered, group=group, gpp=gpp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_sel, 1, N), jnp.float32),
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * gpp * n_tile * group * 4 + 2 * 8 * K
            + 8 * n_tile * 4 * 6 + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_sel * 8 * N * K,
            bytes_accessed=n_sel * (N * K // 2 + 2 * N * (K // group) * 2
                                    + K),
            transcendentals=0,
        ),
    )(e_idx.astype(jnp.int32), t_idx.astype(jnp.int32), xr, xs, wp_t, szs)
    return out[:, 0]


def _w4a8_kernel_grouped(eid_ref, x_ref, xs_ref, wp_ref, szs_ref, o_ref,
                         wun_scr, *, group: int, gpp: int):
    """Body for w4a8_grouped_matmul: the _w4a8_kernel_mtiled math with an
    expert-indexed weight tile.  Grid (N tiles, M blocks), M innermost;
    the scalar-prefetched ``eid_ref`` names each M block's expert, so the
    nibble unpack into ``wun_scr`` re-runs only when the weight tile
    actually changed (m == 0 after an N step, or an expert transition —
    Pallas skips the tile re-fetch itself when the block index map output
    is unchanged between consecutive steps)."""
    m_idx = pl.program_id(1)
    b, nt = o_ref.shape
    prev_e = eid_ref[jnp.maximum(m_idx - 1, 0)]

    @pl.when((m_idx == 0) | (eid_ref[m_idx] != prev_e))
    def _unpack():
        for gi in range(gpp):
            wpb = wp_ref[0, 0, gi]
            for j in range(8):
                wun_scr[gi * 8 + j] = \
                    ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)

    xb = x_ref[:]
    # NATURAL-order x: column group g covers plane j = g // gpp, group
    # gi = g % gpp; the szs slab rows are (gi, j)-ordered, so the
    # zero-correction row sums are permuted to slab order via a constant
    # one-hot dot (an in-kernel minor-dim transpose fails Mosaic
    # lowering; the host-side (MP, K) int8 lane-regroup transpose this
    # replaces measured 18 ms = 26 GB/s at MP=57344, grouped_decomp r5)
    xsum = _xsum_slab_order(xb, gpp, group)

    def gi_body(gi, accs):
        sblk = szs_ref[0, 0, pl.ds(gi * 8, 8), :].astype(jnp.float32)
        news = list(accs)
        for j in range(8):
            cg = wun_scr[gi * 8 + j]
            xg = x_ref[:, pl.ds((j * gpp + gi) * group, group)]
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            news[j % 4] = news[j % 4] + partial.astype(jnp.float32) * \
                sblk[j][None, :]
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    zsb = szs_ref[0, 0, gpp * 8:, :].astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = ((accs[0] + accs[1]) + (accs[2] + accs[3]) - corr) * xs_ref[:]
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "m_tile", "out_dtype", "interpret"),
)
def w4a8_grouped_matmul(
    xq: Array,        # (Mp, K) int8 natural order, expert-sorted rows
    x_scale: Array,   # (Mp, 1) f32
    wp_t: Array,      # (E, N/NT, gpp, NT, group) int32 (stacked_planes)
    szs: Array,       # (E, N/NT, 2*gpp*8, NT) combined scale+zero slabs
    block_eid: Array,  # (Mp/m_tile,) int32 expert id per M block
    group: int = 128,
    m_tile: int = 128,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> Array:
    """Capacity-grouped (megablocks-style) stacked-expert W4A8 matmul:
    out[r] = x[r] @ W[block_eid[r // m_tile]].T -> (Mp, N).

    The MoE BATCH-regime kernel (the r5 design sketch, built): selection
    rows arrive pre-sorted by expert into m_tile-aligned segments
    (moe_group_selections), so each M block belongs to exactly ONE
    expert and the grid runs (N tiles, M blocks) with M innermost —
    consecutive blocks of the same expert leave the weight tile's block
    index unchanged, so Pallas skips the re-fetch and the unpack scratch
    survives.  Per full pass: ~E full-weight reads (vs the dense stacked
    kernel's E reads per token BLOCK) and top_k/E of its MXU passes —
    the dense kernel computes every expert for every token.  With
    M >= m_tile tokens per live expert the weight stream amortizes over
    real work, which the array-fill floor analysis said needs the batch
    regime (REPORT r5 "MoE small-M").  Dropless-exact: per-expert
    padding rows read a zeroed dummy token and are dropped on unsort.
    Reference topology: deepseekv3.py:128-167 sequential expert loop."""
    from jax.experimental.pallas import tpu as pltpu

    E, n_blocks, gpp, n_tile, gw = wp_t.shape
    assert gw == group
    K = gpp * group * 8
    Mp = xq.shape[0]
    n_mblocks = Mp // m_tile
    assert n_mblocks * m_tile == Mp and block_eid.shape[0] == n_mblocks
    N = n_blocks * n_tile
    xr = xq  # natural order — the kernel slices (j*gpp + gi)*group
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_mblocks),
        in_specs=[
            pl.BlockSpec((m_tile, K), lambda i, j, e: (j, 0)),
            pl.BlockSpec((m_tile, 1), lambda i, j, e: (j, 0)),
            pl.BlockSpec((1, 1, gpp, n_tile, group),
                         lambda i, j, e: (e[j], i, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2 * gpp * 8, n_tile),
                         lambda i, j, e: (e[j], i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j, e: (j, i)),
        scratch_shapes=[pltpu.VMEM((gpp * 8, n_tile, group), jnp.int8)],
    )
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_grouped, group=group, gpp=gpp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * gpp * n_tile * group * 4 + 2 * m_tile * K
            + m_tile * n_tile * 4 * 6 + gpp * 8 * n_tile * group
            + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=min(E, n_mblocks) * n_blocks
            * (n_tile * K // 2 + 2 * gpp * 8 * n_tile * 2)
            + n_blocks * Mp * K + Mp * N
            * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(block_eid.astype(jnp.int32), xr, x_scale.astype(jnp.float32),
      wp_t, szs)
    return out


def _w8a8_kernel_grouped(eid_ref, x_ref, xs_ref, w_ref, s_ref, o_ref):
    """Body for w8a8_grouped_matmul: one int8xint8 MXU dot per
    (N tile, M block) step; per-channel weight scale + per-token act
    scale applied on the f32 accumulator (symmetric int8 weights — no
    zero correction)."""
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * s_ref[0, 0]
                * xs_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("m_tile", "out_dtype", "interpret"),
)
def w8a8_grouped_matmul(
    xq: Array,        # (Mp, K) int8, expert-sorted rows
    x_scale: Array,   # (Mp, 1) f32
    codes: Array,     # (E, N, K) int8 per-channel stacked weights
    scales: Array,    # (E, N, 1) f32 per-channel
    block_eid: Array,  # (Mp/m_tile,) int32 expert id per M block
    m_tile: int = 128,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> Array:
    """Capacity-grouped INT8-per-channel stacked-expert matmul — the
    grouped-path analogue of w4a8_grouped_matmul for planes-INELIGIBLE
    expert shapes (DeepSeek-V2/V2-Lite down-proj: ic % (8*group) != 0;
    int8 rows have no packing constraint beyond lane alignment).  Same
    M-innermost grid + scalar-prefetched block->expert index maps;
    weight tiling is a pure reshape (row blocks of a row-major (N, K)
    weight are already contiguous).  Replaces the block-gathered dequant
    einsum that materialized (n_mb, N, K) int8 in HBM per call."""
    from jax.experimental.pallas import tpu as pltpu

    E, N, K = codes.shape
    Mp = xq.shape[0]
    n_mblocks = Mp // m_tile
    assert n_mblocks * m_tile == Mp and block_eid.shape[0] == n_mblocks
    # N tile: largest 128-multiple divisor of N with a <=4MB int8 tile
    n_tile = N
    while n_tile > 128 and (N % n_tile or n_tile * K > (4 << 20)):
        n_tile -= 128
    assert N % n_tile == 0
    n_blocks = N // n_tile
    wt = codes.reshape(E, n_blocks, n_tile, K)
    # scales carry a unit sublane dim: Mosaic requires the -2 block dim
    # be 8-divisible or equal to the array dim
    st = scales.reshape(E, n_blocks, 1, n_tile).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks, n_mblocks),
        in_specs=[
            pl.BlockSpec((m_tile, K), lambda i, j, e: (j, 0)),
            pl.BlockSpec((m_tile, 1), lambda i, j, e: (j, 0)),
            pl.BlockSpec((1, 1, n_tile, K),
                         lambda i, j, e: (e[j], i, 0, 0)),
            pl.BlockSpec((1, 1, 1, n_tile),
                         lambda i, j, e: (e[j], i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j, e: (j, i)),
    )
    out = pl.pallas_call(
        _w8a8_kernel_grouped,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * n_tile * K + 2 * m_tile * K
            + m_tile * n_tile * 4 * 3 + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=min(E, n_mblocks) * N * K
            + n_blocks * Mp * K + Mp * N
            * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(block_eid.astype(jnp.int32), xq, x_scale.astype(jnp.float32),
      wt, st)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("group", "m_tile", "out_dtype", "interpret"),
)
def w4a8_matmul_planes_mtiled(
    xq: Array,
    x_scale: Array,
    wp_t: Array,      # (N/NT, gpp, NT, group) int32 (tile_packed)
    szs: Array,       # (N/NT, 2*gpp*8, NT) combined scale+zero slab
    group: int = 128,
    m_tile: int = 128,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Array:
    """Prefill-regime W4A8 planes matmul: M-tiled grid, any M.

    xq (M, K) int8 natural order; x_scale (M, 1) f32.  Returns (M, N)
    ``out_dtype`` (act scale applied in-kernel).  M is padded up to a
    multiple of ``m_tile`` internally."""
    from jax.experimental.pallas import tpu as pltpu

    M, K = xq.shape
    n_blocks, gpp, n_tile, gw = wp_t.shape
    assert gw == group and gpp * group * 8 == K
    N = n_blocks * n_tile
    Mp = -(-M // m_tile) * m_tile
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, Mp - M), (0, 0)))
    xr = xq  # natural order — the kernel slices (j*gpp + gi)*group
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_mtiled, group=group, gpp=gpp),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        grid=(n_blocks, Mp // m_tile),
        in_specs=[
            pl.BlockSpec((m_tile, K), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpp, n_tile, group), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * gpp * 8, n_tile), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((gpp * 8, n_tile, group), jnp.int8)],
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * gpp * n_tile * group * 4 + 2 * m_tile * K
            + m_tile * n_tile * 4 * 6 + gpp * 8 * n_tile * group
            + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=N * K // 2 + Mp * K * n_blocks + Mp * N * 2,
            transcendentals=0,
        ),
    )(xr, x_scale.astype(jnp.float32), wp_t, szs)
    if Mp != M:
        out = out[:M]
    return out


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
    if scales.ndim == 3:
        # combined contiguous layout (tile_scales_combined): one scale DMA
        # per grid step
        kernel = functools.partial(_w4a8_kernel_fullk_combined,
                                   group=group, gpp=gpp)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            grid=(N // n_tile,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gpp, n_tile, group),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * gpp * 8, n_tile),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, n_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            compiler_params=_maybe_vmem_params(
                2 * gpp * n_tile * group * 4 + B * N * 4
                + 2 * B * K + (2 << 20)),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * N * K,
                bytes_accessed=N * kp * 4 + 2 * N * G * 4 + B * K,
                transcendentals=0,
            ),
        )(xr, wp_t, scales)
        return out * x_scale
    if scales.ndim == 4:  # pre-tiled (gpp, N/NT, 8, NT), zeros premultiplied
        sr = scales
        zsr = (jnp.zeros_like(sr) if zeros is None else zeros)
    else:
        s = scales.astype(jnp.float32)
        if zeros is None:
            zs = jnp.zeros_like(s)
        else:
            zs = zeros.astype(jnp.float32) * s
        sr = tile_scales(s, n_tile, gpp)
        zsr = tile_scales(zs, n_tile, gpp)

    kernel = functools.partial(_w4a8_kernel_fullk, group=group, gpp=gpp)
    grid = (N // n_tile,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpp, n_tile, group), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp, 1, 8, n_tile), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp, 1, 8, n_tile), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=_maybe_vmem_params(
            2 * gpp * n_tile * group * 4 + B * N * 4
            + 2 * B * K + (2 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * kp * 4 + 2 * N * G * 4 + B * K,
            transcendentals=0,
        ),
    )(xr, wp_t, sr, zsr)
    return out * x_scale


def w4a8_matmul_ks(x: Array, qp, interpret: bool = False) -> Array:
    """W4A8 apply for the K-split planes layout (layout='planes_ks',
    codes (N/NT, splits, gpp2, NT, g))."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    xq, x_scale = quantize_act_per_token(x2)
    y = w4a8_matmul_planes_ksplit(
        xq, x_scale, qp.codes, qp.scales, group=qp.group_size,
        interpret=interpret).astype(x.dtype)
    if qp.bias is not None:
        y = y + qp.bias
    return y.reshape(*lead, -1)


def w4a8_matmul(x: Array, qp, interpret: bool = False) -> Array:
    """W4A8 apply: dynamic per-token int8 act quant + int8-MXU fused
    kernel.  M <= 256 runs the whole-M-in-VMEM decode kernel; larger M
    (batched prefill) runs the M-tiled prefill kernel
    (w4a8_matmul_planes_mtiled) — the weight tile and its scale slab stay
    VMEM-resident across M steps and the nibble unpack runs once per
    tile."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    xq, x_scale = quantize_act_per_token(x2)
    if qp.codes.ndim == 4:
        n_tile = qp.codes.shape[2]
    else:
        N = qp.codes.shape[0]
        n_tile = pick_n_tile(N, qp.codes.shape[1], qp.group_size)
    if M > 256:
        gpp = K // (8 * qp.group_size)
        wp_t = (qp.codes if qp.codes.ndim == 4
                else tile_packed(qp.codes, n_tile, qp.group_size))
        if qp.scales.ndim == 3:
            szs = qp.scales  # serving contig layout, already combined
        else:
            if qp.scales.ndim == 4:  # pre-tiled split, zeros premultiplied
                def flat(t):  # (gpp, N/NT, 8, NT) -> (N, G)
                    g, nb, _, nt = t.shape
                    return t.transpose(1, 3, 2, 0).reshape(nb * nt, 8 * g)
                s_flat = flat(qp.scales.astype(jnp.float32))
                zs_flat = (flat(qp.zeros.astype(jnp.float32))
                           if qp.zeros is not None
                           else jnp.zeros_like(s_flat))
            else:
                s_flat = qp.scales.astype(jnp.float32)
                zs_flat = (qp.zeros.astype(jnp.float32) * s_flat
                           if qp.zeros is not None
                           else jnp.zeros_like(s_flat))
            szs = tile_scales_combined(s_flat, zs_flat, n_tile, gpp)
        y = w4a8_matmul_planes_mtiled(
            xq, x_scale, wp_t, szs, group=qp.group_size,
            m_tile=int(os.environ.get("LCTPU_MTILE", "128")),
            out_dtype=x.dtype, interpret=interpret)
    else:
        y = w4a8_matmul_planes(
            xq, x_scale, qp.codes, qp.scales, qp.zeros,
            group=qp.group_size, n_tile=n_tile, interpret=interpret,
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
    *lead, K = x.shape
    # Decode-regime kernel: the whole M slab sits in VMEM. Measured on
    # v5e (tools/prefill_matmul_sweep.py): wins up to M=256 (659 vs 863
    # us at 4096x4096 g128), fails to compile at M=1024; XLA's
    # dequant+dense matmul is compute-efficient there (39 TFLOP/s) —
    # prefill goes XLA, decode goes Pallas.
    m = 1
    for d in lead:
        m *= d
    if m > 256:
        return False
    if K % (8 * qp.group_size) != 0:
        return False
    N = (qp.codes.shape[0] * qp.codes.shape[2] if qp.codes.ndim == 4
         else qp.codes.shape[0])
    return N % 128 == 0


def w4a8_prefill_available(x: Array, qp) -> bool:
    """Prefill-regime (M > 256) W4A8 route: the M-tiled kernel
    (w4a8_matmul_planes_mtiled) has no M cap — this replaces the r3
    LCTPU_PALLAS_M_MAX hack (batched prefill used to fall into XLA's
    in-loop-unpack dense path)."""
    if qp.bits != 4 or qp.is_float or qp.group_size <= 0:
        return False
    if getattr(qp, "layout", "rows") != "planes":
        return False
    *lead, K = x.shape
    m = 1
    for d in lead:
        m *= d
    if m <= 256:
        return False
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
        n_tile = pick_n_tile(N, qp.codes.shape[1], qp.group_size)
    y = w4a16_matmul_planes(
        x2, qp.codes, qp.scales, qp.zeros, group=qp.group_size,
        n_tile=n_tile, interpret=interpret,
    )
    if qp.bias is not None:
        y = y + qp.bias
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# W4A8 with native s4 storage (jnp.int4): the hardware does the nibble
# unpack on load.  The plane kernel's VPU shift+mask unpack (~2.5 ops per
# nibble, ~21M ops per 4MB block) slightly exceeds the 4MB-block DMA time
# and caps the pipeline at ~450 GB/s; a native s4->s8 convert drops that to
# ~1 op/elem so the kernel sits back on the DMA floor.  Weight layout:
# (N/NT, NT, K) s4 (natural K order, tile-contiguous: NT*K/2 bytes/block);
# scales/zs: (N/NT, NT, G) with zs premultiplied.  No x reorder needed.
# ---------------------------------------------------------------------------


def _w4a8_kernel_s4(x_ref, w_ref, s_ref, zs_ref, o_ref, *, group: int):
    b, nt = o_ref.shape
    K = x_ref.shape[1]
    G = K // group
    xb = x_ref[:]
    xsum = jnp.sum(xb.astype(jnp.int32).reshape(b, G, group), axis=2
                   ).astype(jnp.float32)  # (B, G)

    # STATIC unroll over groups: Mosaic cannot lower dynamic slices on an
    # int4 ref (lax.dynamic_slice is "Unimplemented" and pl.ds indexing
    # crashes the compiler above trivial loop trip counts —
    # tools/s4_compile_probe{,2}.py); Python-int slices lower fine.
    accs = [jnp.zeros((b, nt), jnp.float32) for _ in range(4)]
    for g in range(G):
        wg = w_ref[0, :, g * group:(g + 1) * group].astype(jnp.int8)
        xg = xb[:, g * group:(g + 1) * group]
        partial = jax.lax.dot_general(
            xg, wg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        sg = s_ref[0, :, g].astype(jnp.float32)  # (NT,)
        accs[g % 4] = accs[g % 4] + partial.astype(jnp.float32) * \
            sg[None, :]

    zsb = zs_ref[0].astype(jnp.float32)  # (NT, G)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr


def pick_n_tile_s4(N: int, K: int, max_bytes: int = 0) -> int:
    """Largest output-channel tile whose (NT, K) s4 block stays within the
    4MB per-step DMA sweet spot (same rule as pick_n_tile; s4 stores K/2
    bytes per row)."""
    import os

    if not max_bytes:
        max_bytes = int(os.environ.get("LCTPU_TILE_MAX_MB", "4")) << 20
    for nt in (4096, 2048, 1024, 512, 256, 128):
        if N % nt == 0 and nt * K // 2 <= max_bytes:
            return nt
    return 128


def tile_s4(codes_u: Array, n_tile: int):
    """(N, K) unsigned-nibble codes u in [0, 16) -> (N/NT, NT, K) s4
    storing c' = u - 8 in [-8, 7].  Dequant identity:
    (u - z) * s = c' * s - (z - 8) * s, so the caller passes
    zs' = (z - 8) * s as the premultiplied zero correction."""
    n, k = codes_u.shape
    assert n % n_tile == 0
    u = jnp.asarray(codes_u, jnp.int32) & 0xF
    return (u - 8).astype(jnp.int4).reshape(n // n_tile, n_tile, k)


def tile_scales_s4(s: Array, n_tile: int):
    """(N, G) -> (N/NT, NT, G)."""
    n, G = s.shape
    return s.reshape(n // n_tile, n_tile, G)


def pack_s4_bytes(codes_u: Array, n_tile: int) -> Array:
    """(N, K) unsigned-nibble codes -> (N/NT, NT, K/2) int8 byte-packed
    signed nibbles (c' = u - 8), LOW nibble = even element.

    s4 jax.Arrays cannot cross a jit boundary on the axon runtime
    (recursive-jit error in _array_shard_arg), so the serving layout stores
    the same bytes as int8 and ``s4_view`` bitcasts to int4 INSIDE the jit
    (a free view: jax.lax.bitcast_convert_type int8 -> int4 appends a
    trailing dim of 2 with the low nibble first — verified semantics)."""
    n, k = codes_u.shape
    assert n % n_tile == 0 and k % 2 == 0
    c = (jnp.asarray(codes_u, jnp.int32) & 0xF) - 8
    pairs = (c & 0xF).reshape(n, k // 2, 2)
    b = pairs[..., 0] | (pairs[..., 1] << 4)
    # values 0..255 -> int8 two's complement
    b = jnp.where(b > 127, b - 256, b).astype(jnp.int8)
    return b.reshape(n // n_tile, n_tile, k // 2)


def s4_view(codes_bytes: Array) -> Array:
    """(..., K/2) int8 byte-packed -> (..., K) s4 view (in-jit only)."""
    v = jax.lax.bitcast_convert_type(codes_bytes, jnp.int4)
    return v.reshape(*codes_bytes.shape[:-1], codes_bytes.shape[-1] * 2)


@functools.partial(
    jax.jit, static_argnames=("group", "n_tile", "interpret"),
)
def w4a8_matmul_s4(
    xq: Array,           # (B, K) int8
    x_scale: Array,      # (B, 1) f32
    w4: Array,           # (N/NT, NT, K) s4  (tile_s4)
    scales: Array,       # (N/NT, NT, G)
    zs: Array,           # (N/NT, NT, G)  zeros premultiplied by scales,
                         # with the sign-offset fold: zs' = (z - 8) * s
                         # when codes were packed via tile_s4 from unsigned
    group: int = 128,
    n_tile: int = 256,
    interpret: bool = False,
) -> Array:
    from jax.experimental.pallas import tpu as pltpu

    B, K = xq.shape
    n_blocks, n_tile_, kw = w4.shape
    assert kw == K and n_tile_ == n_tile * 1
    N = n_blocks * n_tile_
    G = K // group

    kernel = functools.partial(_w4a8_kernel_s4, group=group)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile_, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile_, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile_, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n_tile_), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        # 4MB double-buffered s4 blocks + the static-unroll's live int8
        # group slices exceed Mosaic's default 16MB scoped-VMEM limit at
        # NT=2048; v5e has 128MB VMEM.  On parts with smaller VMEM set
        # LCTPU_VMEM_LIMIT_MB lower (ADVICE r1).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K // 2 + 2 * N * G * scales.dtype.itemsize
            + B * K,
            transcendentals=0,
        ),
    )(xq, w4, scales, zs)
    return out * x_scale


@functools.partial(
    jax.jit, static_argnames=("group", "n_tile", "interpret"),
)
def w4a8_matmul_s4_bytes(
    xq: Array,           # (B, K) int8
    x_scale: Array,      # (B, 1) f32
    w4_bytes: Array,     # (N/NT, NT, K/2) int8 byte-packed (pack_s4_bytes)
    scales: Array,       # (N/NT, NT, G)
    zs: Array,           # (N/NT, NT, G) premultiplied: (z - 8) * s
    group: int = 128,
    n_tile: int = 256,
    interpret: bool = False,
) -> Array:
    """Jit boundary takes int8 bytes; the free int8->s4 bitcast happens
    in-jit (axon cannot pass s4 arrays across jit boundaries)."""
    return w4a8_matmul_s4(
        xq, x_scale, s4_view(w4_bytes), scales, zs, group=group,
        n_tile=n_tile, interpret=interpret)


def s4_matmul_available(x: Array, qp) -> bool:
    """Serving s4 layout (group-pair bytes): codes (N/NT, NT, K/2) int8 +
    transposed (N/NT, G, NT) scales/premultiplied zeros."""
    if qp.bits != 4 or qp.is_float or qp.group_size != 128:
        return False
    if getattr(qp, "layout", "rows") != "s4":
        return False
    *lead, K = x.shape
    m = 1
    for d in lead:
        m *= d
    if m > 256:  # decode-regime kernel, same M rule as the planes path
        return False
    if qp.codes.ndim != 3 or qp.codes.shape[2] * 2 != K:
        return False
    return K % (4 * qp.group_size) == 0


def w4a8_s4_matmul(x: Array, qp, interpret: bool = False) -> Array:
    """W4A8 apply for the s4/bytes serving layout: per-token int8 act
    quant, then the bytes kernel (codes stream as int8, nibbles bitcast to
    s4 in-register inside the kernel — no XLA-level s4 array, which would
    materialize an upcast copy per use)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    xq, x_scale = quantize_act_per_token(x2)
    zs = qp.zeros if qp.zeros is not None else jnp.zeros_like(qp.scales)
    y = w4a8_matmul_bytes(
        xq, x_scale, qp.codes, qp.scales, zs, group=qp.group_size,
        interpret=interpret,
    ).astype(x.dtype)
    if qp.bias is not None:
        y = y + qp.bias
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# W4A8 "bytes" kernel, group-PAIR nibble layout.  Codes stream from HBM as
# plain int8 (no XLA-level s4 array anywhere — an s4 operand materializes
# an upcast copy per call, which collapsed the end-to-end s4 path to
# 411 tok/s), and the in-kernel unpack is 3 int8 arithmetic-shift ops per
# BYTE (two codes), vs the plane kernel's ~2 int32 ops per NIBBLE that cap
# that pipeline at ~450 GB/s.  Mosaic constraints honored (probed on-chip,
# tools/s4_inkernel_probe.py): no bitcast_convert_type (bitwidth changes
# unsupported), no lax.dynamic_slice on VALUES (refs slice fine via pl.ds).
#
# Layout: byte column p*group + t  (pair p, t in [0, group)) packs
#   low  nibble: c'[n, (2p  )*group + t]
#   high nibble: c'[n, (2p+1)*group + t]        with c' = u - 8 in [-8, 7]
# so both nibble planes of one byte-block are FULL-WIDTH (group = 128 lane)
# K-slices of adjacent groups: lo = (wb << 4) >> 4, hi = wb >> 4 (sign
# extension is automatic on the arithmetic shift), x stays in natural K
# order, and each unpacked plane feeds one 128-deep int8 MXU dot.
# Scales are stored TRANSPOSED, (N/NT, G, NT), so the per-group scale row
# is lane-resident — no in-kernel sublane->lane transpose.  zs rows are
# premultiplied (z - 8) * s; the zero correction is one (B,G)x(G,NT) dot.
# RMSNorm gamma is folded into the weights at quantization time
# (W' = W * gamma[None, :]), so kernels never see it.
# ---------------------------------------------------------------------------


def pack_s4_pairs(codes_u: Array, n_tile: int) -> Array:
    """(N, K) unsigned-nibble codes u in [0,16) -> (N/NT, NT, K/2) int8,
    group-pair layout (group=128 columns per nibble plane)."""
    n, k = codes_u.shape
    group = 128
    assert n % n_tile == 0 and k % (2 * group) == 0
    c = ((jnp.asarray(codes_u, jnp.int32) & 0xF) - 8)
    c = c.reshape(n, k // (2 * group), 2, group)
    lo = c[:, :, 0, :] & 0xF
    hi = c[:, :, 1, :] & 0xF
    b = lo | (hi << 4)
    b = jnp.where(b > 127, b - 256, b).astype(jnp.int8)
    return b.reshape(n // n_tile, n_tile, k // 2)


def tile_scales_pairs(s: Array, n_tile: int) -> Array:
    """(N, G) -> (N/NT, G, NT): per-group scale rows lane-resident."""
    n, G = s.shape
    assert n % n_tile == 0
    return s.reshape(n // n_tile, n_tile, G).transpose(0, 2, 1)


def _pairs_group_loop(xq_ref, wb_ref, s_ref, o_shape, group):
    """fori over group-pairs, 2 pairs (4 groups) per iteration; int8 MXU
    dots on shift-unpacked nibble planes; scale rows are (1, NT) slices."""
    b, nt = o_shape
    K = xq_ref.shape[1]
    G = K // group
    hb = group  # byte columns per pair

    four = jnp.int8(4)

    def body(qi, accs):
        news = list(accs)
        for j in range(2):
            p = qi * 2 + j
            wb = wb_ref[0, :, pl.ds(p * hb, hb)]          # (NT, g) int8
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(wb, four), four)
            hi = jax.lax.shift_right_arithmetic(wb, four)
            xe = xq_ref[:, pl.ds((2 * p) * group, group)]
            xo = xq_ref[:, pl.ds((2 * p + 1) * group, group)]
            pe = jax.lax.dot_general(
                xe, lo, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            po = jax.lax.dot_general(
                xo, hi, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            se = s_ref[0, pl.ds(2 * p, 1), :].astype(jnp.float32)
            so = s_ref[0, pl.ds(2 * p + 1, 1), :].astype(jnp.float32)
            news[2 * j] = news[2 * j] + pe.astype(jnp.float32) * se
            news[2 * j + 1] = news[2 * j + 1] + \
                po.astype(jnp.float32) * so
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, G // 4, body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    return (accs[0] + accs[1]) + (accs[2] + accs[3])


def _w4a8_kernel_pairs(x_ref, wb_ref, s_ref, zs_ref, o_ref, *, group: int):
    """Pre-quantized int8 activations (natural K order)."""
    b, nt = o_ref.shape
    K = x_ref.shape[1]
    G = K // group
    xsum = jnp.sum(x_ref[:].astype(jnp.int32).reshape(b, G, group), axis=2
                   ).astype(jnp.float32)
    acc = _pairs_group_loop(x_ref, wb_ref, s_ref, (b, nt), group)
    corr = jax.lax.dot_general(
        xsum, zs_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc - corr


def _w4a8_kernel_pairs_fused(x_ref, wb_ref, s_ref, zs_ref, o_ref,
                             xq_scr, xs_scr, xsum_scr, *,
                             group: int, rms: bool, eps: float):
    """bf16/f32 activations in; RMSNorm (optional) + per-token int8 quant
    run once at grid step 0 into persistent scratch (the TPU grid is
    sequential); the epilogue applies the per-token scale and writes o_ref
    in its own (bf16) dtype — zero XLA glue between kernel launches."""
    b, nt = o_ref.shape
    K = x_ref.shape[1]
    G = K // group

    @pl.when(pl.program_id(0) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if rms:
            xf = xf * jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8)
        xq_scr[:] = q
        xs_scr[:] = sc
        xsum_scr[:] = jnp.sum(
            q.astype(jnp.int32).reshape(b, G, group), axis=2
        ).astype(jnp.float32)

    acc = _pairs_group_loop(xq_scr, wb_ref, s_ref, (b, nt), group)
    corr = jax.lax.dot_general(
        xsum_scr[:], zs_ref[0].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = ((acc - corr) * xs_scr[:]).astype(o_ref.dtype)


def _pairs_specs(B, K, n_tile, G, pltpu):
    return [
        pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_tile, K // 2), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, n_tile), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, n_tile), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def w4a8_matmul_bytes(
    xq: Array,           # (B, K) int8, natural order
    x_scale: Array,      # (B, 1) f32
    wb: Array,           # (N/NT, NT, K/2) int8 (pack_s4_pairs)
    scales: Array,       # (N/NT, G, NT)  (tile_scales_pairs)
    zs: Array,           # (N/NT, G, NT), premultiplied (z - 8) * s
    group: int = 128,
    interpret: bool = False,
) -> Array:
    from jax.experimental.pallas import tpu as pltpu

    B, K = xq.shape
    n_blocks, n_tile, kw = wb.shape
    assert kw * 2 == K and K % (4 * group) == 0
    N = n_blocks * n_tile
    G = K // group
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_pairs, group=group),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=(n_blocks,),
        in_specs=_pairs_specs(B, K, n_tile, G, pltpu),
        out_specs=pl.BlockSpec((B, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K // 2
            + 2 * N * G * scales.dtype.itemsize + B * K,
            transcendentals=0,
        ),
    )(xq, wb, scales, zs)
    return out * x_scale


@functools.partial(jax.jit,
                   static_argnames=("group", "rms", "eps", "interpret"))
def w4a8_linear_bytes_fused(
    x: Array,            # (B, K) bf16/f32, natural order, UN-normalized
    wb: Array,           # (N/NT, NT, K/2) int8
    scales: Array,       # (N/NT, G, NT)
    zs: Array,           # (N/NT, G, NT)
    group: int = 128,
    rms: bool = False,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Array:
    """Fully-fused decode linear: [RMSNorm ->] per-token int8 quant ->
    grouped-W4 int8 matmul -> per-token rescale, one pallas_call, bf16 out.
    RMSNorm gamma must be pre-folded into the quantized weights."""
    from jax.experimental.pallas import tpu as pltpu

    B, K = x.shape
    n_blocks, n_tile, kw = wb.shape
    assert kw * 2 == K and K % (4 * group) == 0
    N = n_blocks * n_tile
    G = K // group
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_pairs_fused, group=group, rms=rms,
                          eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        grid=(n_blocks,),
        in_specs=_pairs_specs(B, K, n_tile, G, pltpu),
        out_specs=pl.BlockSpec((B, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, K), jnp.int8),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, G), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K // 2
            + 2 * N * G * scales.dtype.itemsize + B * K * 2,
            transcendentals=0,
        ),
    )(x, wb, scales, zs)
    return out


# ---------------------------------------------------------------------------
# Fused-prologue PLANES kernel: the proven int32 plane-unpack body (int8
# shifts crash this Mosaic toolchain — tools/pairs_compile_probe.py — so
# the byte-pair layout is dead on it) with the RMSNorm + per-token int8
# act-quant prologue computed in-kernel at grid step 0 and the per-token
# rescale epilogue.  Removes every XLA glue op between kernel launches.
# x arrives in NATURAL K order: plane j / group-in-plane gi covers the
# contiguous x slice at (j * gpp + gi) * group (no reorder — the offset
# arithmetic replaces it); the zero-correction dot transposes the TINY
# (B, G) xsum instead of the scale tiles.
# ---------------------------------------------------------------------------


def _w4a8_kernel_fullk_fused(x_ref, wp_ref, s_ref, zs_ref, o_ref,
                             xq_scr, xs_scr, xsum_scr, *,
                             group: int, gpp: int, rms: bool, eps: float):
    b, nt = o_ref.shape
    K = x_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if rms:
            xf = xf * jax.lax.rsqrt(
                jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8)
        xq_scr[:] = q
        xs_scr[:] = sc
        # group sums in NATURAL K order (g = j * gpp + gi): a plain
        # reshape+sum.  (An in-kernel (b, 8, gpp) transpose crashes this
        # Mosaic toolchain at gpp > 1 — tools/fused_compile_probe.py — so
        # the correction below runs as 8 per-plane dots against the
        # (gi, j)-ordered zs tiles instead of one reordered dot.)
        xsum_scr[:] = jnp.sum(
            q.astype(jnp.int32).reshape(b, gpp * 8, group), axis=2
        ).astype(jnp.float32)

    def gi_body(gi, accs):
        wpb = wp_ref[0, gi]
        news = list(accs)
        for j in range(8):
            cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)
            xg = xq_scr[:, pl.ds((j * gpp + gi) * group, group)]
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            news[j % 4] = news[j % 4] + partial.astype(jnp.float32) * \
                s_ref[gi, 0, j, :][None, :]
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    acc = (accs[0] + accs[1]) + (accs[2] + accs[3])
    for j in range(8):
        xs_j = xsum_scr[:, j * gpp:(j + 1) * gpp]          # (b, gpp)
        zs_j = zs_ref[:, 0, j, :].astype(jnp.float32)      # (gpp, nt)
        acc = acc - jax.lax.dot_general(
            xs_j, zs_j, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = (acc * xs_scr[:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("group", "rms", "eps", "interpret"))
def w4a8_linear_planes_fused(
    x: Array,            # (B, K) bf16/f32, natural order, UN-normalized
    wp: Array,           # (N/NT, gpp, NT, group) int32 (tile_packed)
    scales: Array,       # (gpp, N/NT, 8, NT) pre-tiled (tile_scales)
    zs: Array,           # (gpp, N/NT, 8, NT), zeros premultiplied
    group: int = 128,
    rms: bool = False,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Array:
    """Fully-fused decode linear on the plane-packed serving layout:
    [RMSNorm ->] per-token int8 quant -> W4 int8 matmul -> rescale, one
    pallas_call, output in x.dtype.  RMSNorm gamma must be pre-folded into
    the quantized weights (exact — fold happens before quantization)."""
    from jax.experimental.pallas import tpu as pltpu

    B, K = x.shape
    n_blocks, gpp, n_tile, gw = wp.shape
    assert gw == group and gpp * group * 8 == K
    N = n_blocks * n_tile
    G = K // group
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel_fullk_fused, group=group, gpp=gpp,
                          rms=rms, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpp, n_tile, group), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp, 1, 8, n_tile), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpp, 1, 8, n_tile), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, K), jnp.int8),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, G), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K,
            bytes_accessed=N * K // 2
            + 2 * N * G * scales.dtype.itemsize + B * K * 2,
            transcendentals=0,
        ),
    )(x, wp, scales, zs)
    return out


# ---------------------------------------------------------------------------
# layer-tail megakernel: o-proj + residual + RMSNorm + gate/up + silu*mul +
# down-proj in ONE pallas_call
# ---------------------------------------------------------------------------

def _qdq_prologue(xf, xq_scr, xs_scr, xsum_scr, b, gpp, group, rms, eps):
    """Shared in-kernel [RMS ->] per-token int8 quant + natural-order group
    sums (the proven _w4a8_kernel_fullk_fused prologue)."""
    if rms:
        xf = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sc = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8)
    xq_scr[:] = q
    xs_scr[:] = sc
    xsum_scr[:] = jnp.sum(
        q.astype(jnp.int32).reshape(b, gpp * 8, group), axis=2
    ).astype(jnp.float32)


def _phase_dot(xq_scr, xsum_scr, wp_ref, s_ref, zs_ref, b, nt, gpp, group):
    """One output tile of the int8 planes matmul (natural-K-order x),
    returning the UNSCALED f32 accumulator (caller multiplies act scale)."""

    def gi_body(gi, accs):
        wpb = wp_ref[0, gi]
        news = list(accs)
        for j in range(8):
            cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)
            xg = xq_scr[:, pl.ds((j * gpp + gi) * group, group)]
            partial = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            news[j % 4] = news[j % 4] + partial.astype(jnp.float32) * \
                s_ref[gi, 0, j, :][None, :].astype(jnp.float32)
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, gpp, gi_body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    acc = (accs[0] + accs[1]) + (accs[2] + accs[3])
    for j in range(8):
        xs_j = xsum_scr[:, j * gpp:(j + 1) * gpp]
        zs_j = zs_ref[:, 0, j, :].astype(jnp.float32)
        acc = acc - jax.lax.dot_general(
            xs_j, zs_j, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc


def _attn_tail_kernel(
    ctx_ref, x_ref,
    wo_ref, so_ref, zso_ref,
    wg_ref, sg_ref, zsg_ref,
    wd_ref, sd_ref, zsd_ref,
    y_ref,
    h_scr, gu_scr,
    xq1, xs1, xsum1, xq2, xs2, xsum2, xq3, xs3, xsum3,
    *, group: int, eps: float,
    n_o: int, nt_o: int, gpp_o: int,
    n_g: int, nt_g: int, gpp_g: int,
    n_d: int, nt_d: int, gpp_d: int,
):
    """Post-attention layer tail, one launch (see w4a8_attn_tail_fused).

    Grid phases: [0, n_o) o-proj tiles; [n_o, n_o+n_g) gate|up tiles;
    [n_o+n_g, +n_d) down tiles.  Clamped index maps keep out-of-phase
    weight blocks un-refetched; the Pallas pipeline prefetches the next
    phase's first block during the current phase's last compute —
    inter-kernel DMA gaps disappear (the point of the megakernel)."""
    b = ctx_ref.shape[0]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _qdq_prologue(ctx_ref[:].astype(jnp.float32), xq1, xs1, xsum1,
                      b, gpp_o, group, False, eps)

    @pl.when(i < n_o)
    def _():
        acc = _phase_dot(xq1, xsum1, wo_ref, so_ref, zso_ref,
                         b, nt_o, gpp_o, group)
        col = i * nt_o
        h_scr[:, pl.ds(col, nt_o)] = (
            x_ref[:, pl.ds(col, nt_o)].astype(jnp.float32)
            + acc * xs1[:]
        )

    @pl.when(i == n_o)
    def _():
        _qdq_prologue(h_scr[:], xq2, xs2, xsum2, b, gpp_g, group, True,
                      eps)

    @pl.when((i >= n_o) & (i < n_o + n_g))
    def _():
        acc = _phase_dot(xq2, xsum2, wg_ref, sg_ref, zsg_ref,
                         b, nt_g, gpp_g, group)
        col = (i - n_o) * nt_g
        gu_scr[:, pl.ds(col, nt_g)] = acc * xs2[:]

    @pl.when(i == n_o + n_g)
    def _():
        inter = (n_g * nt_g) // 2
        g = gu_scr[:, :inter]
        u = gu_scr[:, inter:]
        mid = (g * jax.lax.logistic(g)) * u
        _qdq_prologue(mid, xq3, xs3, xsum3, b, gpp_d, group, False, eps)

    @pl.when(i >= n_o + n_g)
    def _():
        acc = _phase_dot(xq3, xsum3, wd_ref, sd_ref, zsd_ref,
                         b, nt_d, gpp_d, group)
        col = (i - n_o - n_g) * nt_d
        y_ref[:, pl.ds(col, nt_d)] = (
            h_scr[:, pl.ds(col, nt_d)] + acc * xs3[:]
        ).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "eps", "interpret"))
def w4a8_attn_tail_fused(
    ctx: Array,          # (B, H) attention output, natural order
    x: Array,            # (B, H) residual stream entering the block-half
    wo: Array, so: Array, zso: Array,     # o-proj: tile_packed/tile_scales
    wg: Array, sg: Array, zsg: Array,     # gate|up concat (2*I rows)
    wd: Array, sd: Array, zsd: Array,     # down-proj
    group: int = 128,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Array:
    """y = h + down(silu_gate(gateup(rms(h)))), h = x + o(ctx): the whole
    post-attention half of a llama block in ONE pallas_call.

    All three weights are pre-tiled serving layout ((N/NT, gpp, NT, g)
    int32 + (gpp, N/NT, 8, NT) scales with zeros premultiplied).  Phases
    share the grid; per-token int8 act quant + RMSNorm run in-kernel at
    the phase boundaries (gamma must be pre-folded into wg).  Returns
    (B, H) in x.dtype."""
    from jax.experimental.pallas import tpu as pltpu

    B, H = ctx.shape
    n_o, gpp_o, nt_o, gw = wo.shape
    n_g, gpp_g, nt_g, _ = wg.shape
    n_d, gpp_d, nt_d, _ = wd.shape
    assert gw == group and n_o * nt_o == H
    inter2 = n_g * nt_g
    K_d = gpp_d * group * 8
    assert K_d == inter2 // 2, "down K must equal inter (gate|up halves)"

    no_, ng_, nd_ = wo.shape[0], wg.shape[0], wd.shape[0]

    def w_in(shape, off, n_p):
        return pl.BlockSpec(
            (1,) + shape[1:],
            lambda i, off=off, n_p=n_p: (jnp.clip(i - off, 0, n_p - 1),
                                         0, 0, 0),
            memory_space=pltpu.VMEM)

    def s_in(shape, off, n_p):
        return pl.BlockSpec(
            (shape[0], 1) + shape[2:],
            lambda i, off=off, n_p=n_p: (0, jnp.clip(i - off, 0, n_p - 1),
                                         0, 0),
            memory_space=pltpu.VMEM)

    grid = (no_ + ng_ + nd_,)
    kernel = functools.partial(
        _attn_tail_kernel, group=group, eps=eps,
        n_o=no_, nt_o=nt_o, gpp_o=gpp_o,
        n_g=ng_, nt_g=nt_g, gpp_g=gpp_g,
        n_d=nd_, nt_d=nt_d, gpp_d=gpp_d,
    )
    full = pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        grid=grid,
        in_specs=[
            full, full,
            w_in(wo.shape, 0, no_), s_in(so.shape, 0, no_),
            s_in(zso.shape, 0, no_),
            w_in(wg.shape, no_, ng_), s_in(sg.shape, no_, ng_),
            s_in(zsg.shape, no_, ng_),
            w_in(wd.shape, no_ + ng_, nd_), s_in(sd.shape, no_ + ng_, nd_),
            s_in(zsd.shape, no_ + ng_, nd_),
        ],
        out_specs=full,
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),          # h residual
            pltpu.VMEM((B, inter2), jnp.float32),     # gate|up
            pltpu.VMEM((B, H), jnp.int8),             # xq1 (ctx)
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, (H // group)), jnp.float32),
            pltpu.VMEM((B, H), jnp.int8),             # xq2 (h2)
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, (H // group)), jnp.float32),
            pltpu.VMEM((B, inter2 // 2), jnp.int8),   # xq3 (mid)
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, (inter2 // 2) // group), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (H * H + H * inter2 + (inter2 // 2) * H),
            bytes_accessed=(wo.size + wg.size + wd.size) * 4,
            transcendentals=B * inter2 // 2,
        ),
    )(ctx, x, wo, so, zso, wg, sg, zsg, wd, sd, zsd)
    return out


def _layer_fused_kernel(
    ctx_ref, x_ref,
    wo_ref, so_ref, zso_ref,
    wg_ref, sg_ref, zsg_ref,
    wd_ref, sd_ref, zsd_ref,
    wq_ref, sq_ref, zsq_ref,
    y_ref, qkv_ref,
    h_scr, gu_scr, y_scr,
    xq1, xs1, xsum1, xq2, xs2, xsum2, xq3, xs3, xsum3, xq4, xs4, xsum4,
    *, group: int, eps: float,
    n_o: int, nt_o: int, gpp_o: int,
    n_g: int, nt_g: int, gpp_g: int,
    n_d: int, nt_d: int, gpp_d: int,
    n_q: int, nt_q: int, gpp_q: int,
):
    """Whole-layer-minus-attention kernel: the tail phases of layer i plus
    the qkv projection of layer i+1 (rms(y) in-kernel), ONE launch per
    layer (see w4a8_layer_fused)."""
    b = ctx_ref.shape[0]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        _qdq_prologue(ctx_ref[:].astype(jnp.float32), xq1, xs1, xsum1,
                      b, gpp_o, group, False, eps)

    @pl.when(i < n_o)
    def _():
        acc = _phase_dot(xq1, xsum1, wo_ref, so_ref, zso_ref,
                         b, nt_o, gpp_o, group)
        col = i * nt_o
        h_scr[:, pl.ds(col, nt_o)] = (
            x_ref[:, pl.ds(col, nt_o)].astype(jnp.float32) + acc * xs1[:])

    @pl.when(i == n_o)
    def _():
        _qdq_prologue(h_scr[:], xq2, xs2, xsum2, b, gpp_g, group, True, eps)

    @pl.when((i >= n_o) & (i < n_o + n_g))
    def _():
        acc = _phase_dot(xq2, xsum2, wg_ref, sg_ref, zsg_ref,
                         b, nt_g, gpp_g, group)
        col = (i - n_o) * nt_g
        gu_scr[:, pl.ds(col, nt_g)] = acc * xs2[:]

    @pl.when(i == n_o + n_g)
    def _():
        inter = (n_g * nt_g) // 2
        g = gu_scr[:, :inter]
        u = gu_scr[:, inter:]
        mid = (g * jax.lax.logistic(g)) * u
        _qdq_prologue(mid, xq3, xs3, xsum3, b, gpp_d, group, False, eps)

    @pl.when((i >= n_o + n_g) & (i < n_o + n_g + n_d))
    def _():
        acc = _phase_dot(xq3, xsum3, wd_ref, sd_ref, zsd_ref,
                         b, nt_d, gpp_d, group)
        col = (i - n_o - n_g) * nt_d
        yv = h_scr[:, pl.ds(col, nt_d)] + acc * xs3[:]
        y_scr[:, pl.ds(col, nt_d)] = yv
        y_ref[:, pl.ds(col, nt_d)] = yv.astype(y_ref.dtype)

    @pl.when(i == n_o + n_g + n_d)
    def _():
        _qdq_prologue(y_scr[:], xq4, xs4, xsum4, b, gpp_q, group, True, eps)

    @pl.when(i >= n_o + n_g + n_d)
    def _():
        acc = _phase_dot(xq4, xsum4, wq_ref, sq_ref, zsq_ref,
                         b, nt_q, gpp_q, group)
        col = (i - n_o - n_g - n_d) * nt_q
        qkv_ref[:, pl.ds(col, nt_q)] = (acc * xs4[:]).astype(qkv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "eps", "interpret"))
def w4a8_layer_fused(
    ctx: Array, x: Array,
    wo: Array, so: Array, zso: Array,
    wg: Array, sg: Array, zsg: Array,
    wd: Array, sd: Array, zsd: Array,
    wq: Array, sq: Array, zsq: Array,
    group: int = 128,
    eps: float = 1e-6,
    interpret: bool = False,
):
    """(y, qkv_next) = layer tail of block i + qkv projection of block
    i+1, ONE pallas_call per layer (the attention between qkv and o stays
    XLA, whose async operand prefetch hides the KV reads under this
    kernel's runtime).  wq is the NEXT block's fused qkv weight; its
    pre-norm RMS runs in-kernel on y (gamma pre-folded).  Shapes as
    w4a8_attn_tail_fused."""
    from jax.experimental.pallas import tpu as pltpu

    B, H = ctx.shape
    n_o, gpp_o, nt_o, gw = wo.shape
    n_g, gpp_g, nt_g, _ = wg.shape
    n_d, gpp_d, nt_d, _ = wd.shape
    n_q, gpp_q, nt_q, _ = wq.shape
    assert gw == group and n_o * nt_o == H
    inter2 = n_g * nt_g
    Nq = n_q * nt_q

    def w_in(shape, off, n_p):
        return pl.BlockSpec(
            (1,) + shape[1:],
            lambda i, off=off, n_p=n_p: (jnp.clip(i - off, 0, n_p - 1),
                                         0, 0, 0),
            memory_space=pltpu.VMEM)

    def s_in(shape, off, n_p):
        return pl.BlockSpec(
            (shape[0], 1) + shape[2:],
            lambda i, off=off, n_p=n_p: (0, jnp.clip(i - off, 0, n_p - 1),
                                         0, 0),
            memory_space=pltpu.VMEM)

    no_, ng_, nd_, nq_ = n_o, n_g, n_d, n_q
    grid = (no_ + ng_ + nd_ + nq_,)
    kernel = functools.partial(
        _layer_fused_kernel, group=group, eps=eps,
        n_o=no_, nt_o=nt_o, gpp_o=gpp_o,
        n_g=ng_, nt_g=nt_g, gpp_g=gpp_g,
        n_d=nd_, nt_d=nt_d, gpp_d=gpp_d,
        n_q=nq_, nt_q=nt_q, gpp_q=gpp_q,
    )
    full = pl.BlockSpec((B, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    qfull = pl.BlockSpec((B, Nq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    y, qkv = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, H), x.dtype),
                   jax.ShapeDtypeStruct((B, Nq), x.dtype)),
        grid=grid,
        in_specs=[
            full, full,
            w_in(wo.shape, 0, no_), s_in(so.shape, 0, no_),
            s_in(zso.shape, 0, no_),
            w_in(wg.shape, no_, ng_), s_in(sg.shape, no_, ng_),
            s_in(zsg.shape, no_, ng_),
            w_in(wd.shape, no_ + ng_, nd_), s_in(sd.shape, no_ + ng_, nd_),
            s_in(zsd.shape, no_ + ng_, nd_),
            w_in(wq.shape, no_ + ng_ + nd_, nq_),
            s_in(sq.shape, no_ + ng_ + nd_, nq_),
            s_in(zsq.shape, no_ + ng_ + nd_, nq_),
        ],
        out_specs=(full, qfull),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, inter2), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.int8),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, H // group), jnp.float32),
            pltpu.VMEM((B, H), jnp.int8),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, H // group), jnp.float32),
            pltpu.VMEM((B, inter2 // 2), jnp.int8),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, (inter2 // 2) // group), jnp.float32),
            pltpu.VMEM((B, H), jnp.int8),
            pltpu.VMEM((B, 1), jnp.float32),
            pltpu.VMEM((B, H // group), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (H * H + H * inter2 + (inter2 // 2) * H
                           + H * Nq),
            bytes_accessed=(wo.size + wg.size + wd.size + wq.size) * 4,
            transcendentals=B * inter2 // 2,
        ),
    )(ctx, x, wo, so, zso, wg, sg, zsg, wd, sd, zsd, wq, sq, zsq)
    return y, qkv
