"""Hunt the ~95ms PER-CALL fixed cost of the mtiled/grouped kernels
(grouped_decomp2c: constant across MP=4096..57344 and shapes, absent
from the decode kernel).  Matrix: call-count scaling (MP 128/1024/4096),
the decode kernel as reference, NT=512 re-tiling (2MB scratch), and a
scratchless M-tiled variant reusing the decode kernel body (unpack per
step, no @pl.when, no scratch)."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

K = 4096
N = 2048
ITERS = int(os.environ.get("ITERS", "40"))
M_TILE = 128


def timeit(tag, chain, work, *args):
    try:
        float(chain(*args, iters=ITERS))
        t0 = time.perf_counter()
        float(chain(*args, iters=ITERS))
        lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(*args, iters=3 * ITERS))
        hi = time.perf_counter() - t0
        dt = (hi - lo) / (2 * ITERS)
        print(json.dumps({"impl": tag, "ms": round(dt * 1e3, 3),
                          "tf_s": round(work / dt / 1e12, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"impl": tag, "error": str(e)[:200]}), flush=True)


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lightcompress_tpu.ops.pallas_matmul import (
        _maybe_vmem_params, _w4a8_kernel_fullk_combined, pack_int4_planes,
        quantize_act_per_token, tile_packed, tile_scales_combined,
        w4a8_matmul_planes, w4a8_matmul_planes_mtiled)
    from lightcompress_tpu.quant import QuantSpec, real_quant_weight

    key = jax.random.PRNGKey(0)
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)
    w = jax.random.normal(key, (N, K), jnp.float32) * 0.02
    codes, scales, zeros = real_quant_weight(w, spec)
    gpp = K // 8 // 128
    wp = pack_int4_planes(codes)

    def tiles(nt):
        return (tile_packed(wp, nt, 128),
                tile_scales_combined(scales.astype(jnp.bfloat16),
                                     (zeros * scales).astype(jnp.bfloat16),
                                     nt, gpp))

    wt2048, szs2048 = tiles(2048)
    wt512, szs512 = tiles(512)

    def mk_chain(fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def chain(xr, xs, c, s, iters):
            def body(i, carry):
                xr_t, acc = jax.lax.optimization_barrier((xr, carry))
                y = fn(xr_t, xs, c, s)
                return acc + jnp.sum(y[:1]).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return chain

    def prep(MP):
        x = jax.random.normal(key, (MP, K), jnp.bfloat16)
        xq, _ = quantize_act_per_token(x)
        return xq, jnp.ones((MP, 1), jnp.float32)

    # mtiled at tiny/small M: isolates per-call cost
    for MP in (128, 1024, 4096):
        xr, xs = prep(MP)
        timeit(f"mtiled_MP{MP}",
               mk_chain(lambda a, b, c, s: w4a8_matmul_planes_mtiled(
                   a, b, c, s, group=128)),
               2 * MP * N * K, xr, xs, wt2048, szs2048)

    # decode kernel reference at M=128 (known-fast class)
    xr, xs = prep(128)
    timeit("decode_M128",
           mk_chain(lambda a, b, c, s: w4a8_matmul_planes(
               a, b, c, s, None, group=128)),
           2 * 128 * N * K, xr, xs, wt2048, szs2048)

    # NT=512 re-tiling (2MB scratch, n_blocks=4)
    xr, xs = prep(4096)
    timeit("mtiled_MP4096_NT512",
           mk_chain(lambda a, b, c, s: w4a8_matmul_planes_mtiled(
               a, b, c, s, group=128)),
           2 * 4096 * N * K, xr, xs, wt512, szs512)

    # scratchless M-tiled: decode kernel body gridded over (N, M) —
    # unpack per step, no @pl.when, no scratch (xr layout: this body
    # expects the OLD (gi, j) column order, so feed it pre-permuted)
    def scratchless(xq, xs, wt, szs):
        n_blocks, gpp_, nt, gw = wt.shape
        MP = xq.shape[0]
        xp = xq.reshape(MP, 8, gpp_, 128).transpose(0, 2, 1, 3) \
            .reshape(MP, K)
        out = pl.pallas_call(
            functools.partial(_w4a8_kernel_fullk_combined, group=128,
                              gpp=gpp_),
            out_shape=jax.ShapeDtypeStruct((MP, n_blocks * nt),
                                           jnp.float32),
            grid=(n_blocks, MP // M_TILE),
            in_specs=[
                pl.BlockSpec((M_TILE, K), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gpp_, nt, 128), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2 * gpp_ * 8, nt), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M_TILE, nt), lambda i, j: (j, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=_maybe_vmem_params(
                2 * gpp_ * nt * 128 * 4 + 2 * M_TILE * K
                + M_TILE * nt * 4 * 6 + (2 << 20)),
        )(xp, wt, szs)
        return out * xs

    for MP in (4096,):
        xr, xs = prep(MP)
        timeit(f"scratchless_MP{MP}",
               mk_chain(lambda a, b, c, s: scratchless(a, b, c, s)),
               2 * MP * N * K, xr, xs, wt2048, szs2048)


if __name__ == "__main__":
    main()
