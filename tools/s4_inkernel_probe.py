"""In-kernel nibble-unpack probe: can a byte-packed (int8 DMA) W4 kernel
match/beat the plane-packed kernel WITHOUT any XLA-level s4 array?

Context (tools/s4_experiments2.py + bench BENCH_WLAYOUT=s4): the s4-native
kernel streams 1.7x faster per-kernel, but the int8->int4 bitcast feeding it
materializes at XLA level at ~50 GB/s PER DECODE CALL (end-to-end bench
collapsed 2839 -> 411 tok/s).  These variants keep the HBM stream int8 and
unpack nibbles in-register inside the kernel:

  bytes_bitcast : per-group byte slice -> lax.bitcast_convert_type(int4)
                  -> reshape natural order -> astype(int8) -> MXU dot
  bytes_shift   : lo = (b<<4)>>4, hi = b>>4 (int8 VPU), activations
                  deinterleaved per group OUTSIDE the kernel (free XLA
                  shuffle of a 128KB act), two K/2 dots per group

Workload mirrors s4_experiments2: up(14336,4096) -> down(4096,14336) pair,
chained ITERS times on device, host scalar drain.  Also prints a one-shot
correctness rel-err vs f32 dequant reference for each variant.

Run: ITERS=30 python tools/s4_inkernel_probe.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightcompress_tpu.ops.pallas_matmul import (
    pack_int4_planes,
    pack_s4_bytes,
    pick_n_tile,
    pick_n_tile_s4,
    quantize_act_per_token,
    tile_packed,
    tile_scales,
    tile_scales_s4,
    w4a8_matmul_planes,
)

HIDDEN, INTER, GROUP = 4096, 14336, 128
B = 32
ITERS = int(os.environ.get("ITERS", "30"))
PAIR_BYTES = 2 * (INTER * HIDDEN // 2)  # codes only, per iteration


# ---------------------------------------------------------------- kernels
def _kernel_bytes_bitcast(x_ref, wb_ref, s_ref, zs_ref, o_ref, *,
                          group: int):
    b, nt = o_ref.shape
    K = x_ref.shape[1]
    G = K // group
    assert G % 4 == 0, 'kernel unrolls 4 groups/iter; pad K or change group'
    hb = group // 2
    xb = x_ref[:]
    xsum = jnp.sum(xb.astype(jnp.int32).reshape(b, G, group), axis=2
                   ).astype(jnp.float32)
    sb = s_ref[0].astype(jnp.float32)     # (NT, G)
    zsb = zs_ref[0].astype(jnp.float32)   # (NT, G)

    def body(q, accs):
        news = list(accs)
        for j in range(4):                                # 4 groups/iter
            g = q * 4 + j
            wb = wb_ref[0, :, pl.ds(g * hb, hb)]          # (NT, hb) int8
            w4 = jax.lax.bitcast_convert_type(wb, jnp.int4)  # (NT, hb, 2)
            wg = w4.reshape(nt, group).astype(jnp.int8)   # natural order
            xg = jax.lax.dynamic_slice_in_dim(xb, g * group, group, 1)
            partial = jax.lax.dot_general(
                xg, wg, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            sg = jax.lax.dynamic_slice_in_dim(sb, g, 1, 1)  # (NT, 1)
            news[j] = news[j] + partial.astype(jnp.float32) * sg.T
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, G // 4, body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr


def _kernel_bytes_shift(x_ref, wb_ref, s_ref, zs_ref, o_ref, *, group: int):
    """x_ref holds DEINTERLEAVED acts: within each group, the 64 even
    positions first, then the 64 odd positions."""
    b, nt = o_ref.shape
    K = x_ref.shape[1]
    G = K // group
    assert G % 4 == 0, 'kernel unrolls 4 groups/iter; pad K or change group'
    hb = group // 2
    xb = x_ref[:]
    xsum = jnp.sum(xb.astype(jnp.int32).reshape(b, G, group), axis=2
                   ).astype(jnp.float32)
    sb = s_ref[0].astype(jnp.float32)
    zsb = zs_ref[0].astype(jnp.float32)

    def body(q, accs):
        news = list(accs)
        for j in range(4):                         # 4 groups/iter
            g = q * 4 + j
            wb = wb_ref[0, :, pl.ds(g * hb, hb)]   # (NT, hb) int8
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(wb, jnp.int8(4)), jnp.int8(4))
            hi = jax.lax.shift_right_arithmetic(wb, jnp.int8(4))
            xg = jax.lax.dynamic_slice_in_dim(xb, g * group, group, 1)
            pe = jax.lax.dot_general(
                xg[:, :hb], lo, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            po = jax.lax.dot_general(
                xg[:, hb:], hi, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            sg = jax.lax.dynamic_slice_in_dim(sb, g, 1, 1)
            news[j] = news[j] + (pe + po).astype(jnp.float32) * sg.T
        return tuple(news)

    accs = jax.lax.fori_loop(
        0, G // 4, body,
        tuple(jnp.zeros((b, nt), jnp.float32) for _ in range(4)))
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = (accs[0] + accs[1]) + (accs[2] + accs[3]) - corr


def _bytes_call(kernel, xq, wb, scales, zs, group, n_tile):
    Bq, K = xq.shape
    n_blocks = wb.shape[0]
    N = n_blocks * n_tile
    G = K // group
    assert G % 4 == 0, 'kernel unrolls 4 groups/iter; pad K or change group'
    return pl.pallas_call(
        functools.partial(kernel, group=group),
        out_shape=jax.ShapeDtypeStruct((Bq, N), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((Bq, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, K // 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bq, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bq * N * K,
            bytes_accessed=N * K // 2 + 2 * N * G * scales.dtype.itemsize
            + Bq * K,
            transcendentals=0,
        ),
    )(xq, wb, scales, zs)


@functools.partial(jax.jit, static_argnames=("group", "n_tile", "variant"))
def w4a8_matmul_bytes(xq, x_scale, wb, scales, zs, *, group=GROUP,
                      n_tile=256, variant="bitcast"):
    kern = (_kernel_bytes_bitcast if variant == "bitcast"
            else _kernel_bytes_shift)
    if variant == "shift":
        Bq, K = xq.shape
        G = K // group
        xq = xq.reshape(Bq, G, group // 2, 2).transpose(0, 1, 3, 2
                                                        ).reshape(Bq, K)
    out = _bytes_call(kern, xq, wb, scales, zs, group, n_tile)
    return out * x_scale


# ---------------------------------------------------------------- harness
def mk_weights(key, n, k):
    codes = jax.random.randint(key, (n, k), 0, 16, jnp.int32)
    ks, kz = jax.random.split(key)
    scales = jax.random.uniform(ks, (n, k // GROUP), jnp.float32,
                                0.004, 0.012)
    zeros = jnp.round(jax.random.uniform(kz, (n, k // GROUP), jnp.float32,
                                         4.0, 12.0))
    return codes, scales, zeros


def timed(fn, x0, label):
    out = fn(x0)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    out = fn(out)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    print(json.dumps({
        "impl": label, "us": round(dt * 1e6, 1),
        "weight_GBps": round(PAIR_BYTES / dt / 1e9, 1)}), flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    ku, kd, kx = jax.random.split(key, 3)
    cu, su, zu = mk_weights(ku, INTER, HIDDEN)
    cd, sd, zd = mk_weights(kd, HIDDEN, INTER)
    x = jax.random.normal(kx, (B, HIDDEN), jnp.float32)

    # correctness reference for the up proj (f32 dequant matmul)
    xq0, xs0 = quantize_act_per_token(x)
    wdq = ((cu.astype(jnp.float32) - zu.repeat(GROUP, 1))
           * su.repeat(GROUP, 1))
    ref = (xq0.astype(jnp.float32) @ wdq.T) * xs0

    def relerr(y):
        return float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))

    # --- planes baseline
    def plane_pack(codes, s, z, k):
        nt = pick_n_tile(codes.shape[0], k // 8, GROUP)
        gpp = k // 8 // GROUP
        wp = tile_packed(pack_int4_planes(codes), nt, GROUP)
        sr = tile_scales(s, nt, gpp).astype(jnp.bfloat16)
        zsr = tile_scales(z * s, nt, gpp).astype(jnp.bfloat16)
        return wp, sr, zsr, nt

    wpu, sru, zsru, ntu = plane_pack(cu, su, zu, HIDDEN)
    wpd, srd, zsrd, ntd = plane_pack(cd, sd, zd, INTER)

    y = w4a8_matmul_planes(xq0, xs0, wpu, sru, zsru, group=GROUP,
                           n_tile=ntu)
    print(json.dumps({"impl": "planes", "relerr": relerr(y)}), flush=True)

    @jax.jit
    def run_planes(x0, wpu, sru, zsru, wpd, srd, zsrd):
        def body(i, h):
            hq, hs = quantize_act_per_token(h)
            y = w4a8_matmul_planes(hq, hs, wpu, sru, zsru,
                                   group=GROUP, n_tile=ntu)
            yq, ys = quantize_act_per_token(y)
            return w4a8_matmul_planes(yq, ys, wpd, srd, zsrd,
                                      group=GROUP, n_tile=ntd)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    timed(lambda a: run_planes(a, wpu, sru, zsru, wpd, srd, zsrd), x,
          "planes")

    # --- byte-packed variants (int8 across the jit boundary, no XLA s4)
    ntu_s = pick_n_tile_s4(INTER, HIDDEN)
    ntd_s = pick_n_tile_s4(HIDDEN, INTER)
    wbu = pack_s4_bytes(cu, ntu_s)
    wbd = pack_s4_bytes(cd, ntd_s)
    sru_s = tile_scales_s4(su, ntu_s).astype(jnp.bfloat16)
    zsru_s = tile_scales_s4((zu - 8.0) * su, ntu_s).astype(jnp.bfloat16)
    srd_s = tile_scales_s4(sd, ntd_s).astype(jnp.bfloat16)
    zsrd_s = tile_scales_s4((zd - 8.0) * sd, ntd_s).astype(jnp.bfloat16)

    for variant in ("bitcast", "shift"):
        try:
            y = w4a8_matmul_bytes(xq0, xs0, wbu, sru_s, zsru_s,
                                  group=GROUP, n_tile=ntu_s,
                                  variant=variant)
            print(json.dumps({"impl": f"bytes_{variant}",
                              "relerr": relerr(y)}), flush=True)

            @jax.jit
            def run_bytes(x0, wbu, sru, zsru, wbd, srd, zsrd):
                def body(i, h):
                    hq, hs = quantize_act_per_token(h)
                    y = w4a8_matmul_bytes(hq, hs, wbu, sru, zsru,
                                          group=GROUP, n_tile=ntu_s,
                                          variant=variant)
                    yq, ys = quantize_act_per_token(y)
                    return w4a8_matmul_bytes(yq, ys, wbd, srd, zsrd,
                                             group=GROUP, n_tile=ntd_s,
                                             variant=variant)
                return jax.lax.fori_loop(0, ITERS, body, x0)

            timed(lambda a: run_bytes(a, wbu, sru_s, zsru_s, wbd, srd_s,
                                      zsrd_s), x, f"bytes_{variant}")
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"impl": f"bytes_{variant}",
                              "error": str(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()
