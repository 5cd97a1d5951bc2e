"""DOWN-shape (4096 x 14336, gpp=14) kernel tile sweep: the full W4A8
kernel runs at only 0.59 of the copy floor there (112 small dots per
grid step at nt=512).  Does a bigger n_tile (fewer, larger dots per
step; 7.3/14.6MB tiles need the scoped-VMEM override) pay on THIS shape
even though 8MB tiles lost globally (r3)?  Anti-hoist chained timing."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("ITERS", "100"))
B = int(os.environ.get("B", "32"))


def main():
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_int4_planes, tile_packed, tile_scales_combined,
        w4a8_matmul_planes)

    N, K, g = 4096, 14336, 128
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (N, K), 0, 16, jnp.int32)
    packed = pack_int4_planes(codes)
    gpp = K // 8 // g
    scales = jnp.full((N, K // g), 0.01, jnp.float32)
    zeros = jnp.full((N, K // g), 8.0, jnp.float32)
    xq = jnp.ones((B, K), jnp.int8)
    xs = jnp.ones((B, 1), jnp.float32)

    for nt in [int(v) for v in os.environ.get("NTS", "512,1024,2048"
                                              ).split(",")]:
        wp_t = tile_packed(packed, nt, g)
        szs = tile_scales_combined(scales, zeros * scales, nt, gpp
                                   ).astype(jnp.bfloat16)

        @jax.jit
        def chain(iters, wp, szs):
            def body(i, acc):
                wpb, acc2 = jax.lax.optimization_barrier((wp, acc))
                y = w4a8_matmul_planes(xq, xs, wpb, szs, None, group=g)
                return y[0, 0] + acc2 * 0.0
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        try:
            float(chain(ITERS, wp_t, szs))
            t0 = time.perf_counter()
            float(chain(ITERS, wp_t, szs))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(chain(5 * ITERS, wp_t, szs))
            t_hi = time.perf_counter() - t0
            dt = (t_hi - t_lo) / (4 * ITERS)
            bytes_ = wp_t.size * 4 + szs.size * 2
            print(json.dumps({"nt": nt, "us": round(dt * 1e6, 1),
                              "gbs": round(bytes_ / dt / 1e9, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"nt": nt, "error": str(e)[:150]}),
                  flush=True)


if __name__ == "__main__":
    main()
