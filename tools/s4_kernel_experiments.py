"""s4-native W4A8 kernel vs the plane-packed kernel, on-chip.

Hypothesis (CLAUDE.md kernel-perf): the plane kernel's VPU shift+mask
unpack (~2.5 ops/nibble ~= 21M ops per 4MB block) exceeds the 4MB-block
DMA time and caps the weight stream at ~450 GB/s; a native s4->s8 convert
should put the kernel back on the ~640 GB/s DMA floor.

Also probes whether an s4 jax.Array can cross a jit boundary on the axon
plugin (eager ops on s4 RecursionError; jit args may too).

Run: python tools/s4_kernel_experiments.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lightcompress_tpu.ops.pallas_matmul import (
    _w4a8_kernel_s4,
    pack_int4_planes,
    pick_n_tile,
    quantize_act_per_token,
    tile_packed,
    tile_scales,
    w4a8_matmul_planes,
)

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K, GROUP = 4096, 14336, 128   # down_proj decode shape
B = 32
ITERS = int(os.environ.get("ITERS", "50"))
G = K // GROUP
W4_BYTES = N * K // 2


def s4_call(xq, w4, sr, zsr, n_tile):
    kernel = functools.partial(_w4a8_kernel_s4, group=GROUP)
    n_blocks = w4.shape[0]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile, G), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, n_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(xq, w4, sr, zsr)


def main():
    key = jax.random.PRNGKey(0)
    kw, kx = jax.random.split(key)
    codes32 = jax.random.randint(kw, (N, K // 8), -(2**31), 2**31 - 1,
                                 jnp.int32)
    x = jax.random.normal(kx, (B, K), jnp.float32)
    xq, sx = quantize_act_per_token(x)

    # --- baseline: plane kernel (current production path)
    nt_p = pick_n_tile(N, K // 8, GROUP)
    wp = tile_packed(codes32, nt_p, GROUP)
    gpp = K // 8 // GROUP
    sr_p = tile_scales(jnp.full((N, G), 0.01, jnp.float32), nt_p, gpp
                       ).astype(jnp.bfloat16)
    zs_p = tile_scales(jnp.full((N, G), 0.08, jnp.float32), nt_p, gpp
                       ).astype(jnp.bfloat16)

    @jax.jit
    def run_planes(xq, wp, sr, zs):
        def body(i, acc):
            y = w4a8_matmul_planes(acc.astype(jnp.int8), sx, wp, sr, zs,
                                   group=GROUP, n_tile=nt_p)
            m = jnp.clip(jnp.abs(jnp.tile(y, (1, (K + N - 1) // N))[:, :K]),
                         0, 127)
            return m.astype(jnp.int8)
        return jax.lax.fori_loop(0, ITERS, body, xq)

    t = timeit(lambda a: run_planes(a, wp, sr_p, zs_p), xq)
    print(json.dumps({"impl": "planes", "us": round(t * 1e6, 1),
                      "eff_GBps": round(W4_BYTES / t / 1e9, 1)}), flush=True)

    # --- s4 kernel: n_tile bounded by NT*K/2 <= 4MB
    nt_s = 512 if K >= 8192 else 2048
    G_ = G
    sr_s = jnp.full((N // nt_s, nt_s, G_), 0.01, jnp.bfloat16)
    zs_s = jnp.full((N // nt_s, nt_s, G_), 0.0008, jnp.bfloat16)

    # probe: can an s4 array cross a jit boundary on axon?
    crossing_ok = True
    try:
        @jax.jit
        def mk_w4(c32):
            from lightcompress_tpu.ops.pallas_matmul import unpack_int4_planes
            u = unpack_int4_planes(c32, K)
            return (u - 8).astype(jnp.int4).reshape(N // nt_s, nt_s, K)

        w4 = mk_w4(codes32)

        @jax.jit
        def run_s4_arg(xq, w4, sr, zs):
            def body(i, acc):
                y = s4_call(acc.astype(jnp.int8), w4, sr, zs, nt_s)
                m = jnp.clip(jnp.abs(jnp.tile(y, (1, (K + N - 1) // N))
                                     [:, :K]), 0, 127)
                return m.astype(jnp.int8)
            return jax.lax.fori_loop(0, ITERS, body, xq)

        t = timeit(lambda a: run_s4_arg(a, w4, sr_s, zs_s), xq)
        print(json.dumps({"impl": "s4_arg", "us": round(t * 1e6, 1),
                          "eff_GBps": round(W4_BYTES / t / 1e9, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        crossing_ok = False
        print(json.dumps({"impl": "s4_arg", "error": str(e)[:200]}),
              flush=True)

    if not crossing_ok:
        # fall back: build the s4 weight INSIDE the timing jit (barrier'd)
        @jax.jit
        def run_s4_inline(xq, c32, sr, zs):
            from lightcompress_tpu.ops.pallas_matmul import unpack_int4_planes
            u = unpack_int4_planes(c32, K)
            w4 = jax.lax.optimization_barrier(
                (u - 8).astype(jnp.int4).reshape(N // nt_s, nt_s, K))

            def body(i, acc):
                y = s4_call(acc.astype(jnp.int8), w4, sr, zs, nt_s)
                m = jnp.clip(jnp.abs(jnp.tile(y, (1, (K + N - 1) // N))
                                     [:, :K]), 0, 127)
                return m.astype(jnp.int8)
            return jax.lax.fori_loop(0, ITERS, body, xq)

        try:
            t = timeit(lambda a: run_s4_inline(a, codes32, sr_s, zs_s), xq)
            print(json.dumps({"impl": "s4_inline", "us": round(t * 1e6, 1),
                              "eff_GBps": round(W4_BYTES / t / 1e9, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"impl": "s4_inline", "error": str(e)[:300]}),
                  flush=True)


def timeit(fn, xq):
    out = fn(xq)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + drain
    t0 = time.perf_counter()
    out = fn(jnp.roll(xq, 1, axis=0))  # different input -> no replay dedup
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


if __name__ == "__main__":
    main()
