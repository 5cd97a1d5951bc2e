"""Round 5: amortize the ~25ms per-execution tunnel latency with 500
chained iterations; measure true marginal cost of (a) empty iteration,
(b) 28MB grid DMA read, (c) 28MB manual 2-slot DMA read, (d) 28MB XLA sum,
(e) one dense bf16 (32,4096)@(4096,4096) matmul."""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from dma_experiments2 import grid_read, manual_read

ITERS = 500


def timeit(name, f, *args):
    float(jnp.sum(f(*args)))
    t0 = time.perf_counter()
    float(jnp.sum(f(*args)))
    dt = (time.perf_counter() - t0)
    print(json.dumps({"variant": name, "total_ms": round(dt * 1e3, 1),
                      "per_iter_us": round(dt / ITERS * 1e6, 2)}),
          flush=True)
    return dt / ITERS


def main():
    rng = np.random.RandomState(0)
    x28 = jnp.asarray(rng.randint(-2**31, 2**31 - 1, (28, 256, 1024))
                      .astype(np.int32))

    @jax.jit
    def empty(x):
        def body(i, c):
            return c * 1.0000001 + 1.0
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    t_empty = timeit("empty", empty, x28)

    @jax.jit
    def xsum(x):
        def body(i, c):
            return jnp.sum(x[:, :, :1], dtype=jnp.float32) * 1e-9 + c * 0.5
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    timeit("xla_sum_110KB", xsum, x28)

    @jax.jit
    def xsum_full(x):
        def body(i, c):
            return jnp.sum(x, dtype=jnp.float32) * 1e-9 + c * 0.5
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    t = timeit("xla_sum_28MB", xsum_full, x28)
    print(json.dumps({"xla_sum_GBps": round(28 * 2**20 * 4 / 28 /
                                            max(t - t_empty, 1e-9) / 1e9
                                            * 28, 1)}), flush=True)

    @jax.jit
    def g(x):
        def body(i, c):
            return grid_read(x, c, 28)[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    t = timeit("grid_28MB", g, x28)
    print(json.dumps({"grid_GBps":
                      round(x28.size * 4 / max(t - t_empty, 1e-9) / 1e9, 1)}),
          flush=True)

    @jax.jit
    def m2(x):
        def body(i, c):
            return manual_read(x, c, 28, 2)[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    t = timeit("manual2_28MB", m2, x28)
    print(json.dumps({"manual2_GBps":
                      round(x28.size * 4 / max(t - t_empty, 1e-9) / 1e9, 1)}),
          flush=True)

    w = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    a = jnp.asarray(rng.randn(32, 4096), jnp.bfloat16)

    @jax.jit
    def mm(w, a):
        def body(i, y):
            y = (y @ w) * jax.lax.rsqrt(
                jnp.mean(y * y, -1, keepdims=True) + 1e-6)
            return y.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, ITERS, body, a)
    t = timeit("dense_mm_32x4096x4096", mm, w, a)
    print(json.dumps({"mm_GBps": round(4096 * 4096 * 2 /
                                       max(t - t_empty, 1e-9) / 1e9, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
