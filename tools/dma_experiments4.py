"""Round 4: what costs ~1.2ms per fori_loop iteration on the axon stack?

(a) trivial-body loop, (b) 112MB sum at ITERS 20 vs 40, (c) dense bf16
matmul loop (compute reference), (d) 112MB sum with a VECTOR carry (does a
scalar carry force a sync?).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, f, x, iters):
    float(jnp.sum(f(x)))
    t0 = time.perf_counter()
    float(jnp.sum(f(x)))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"variant": name, "us": round(dt * 1e6, 1)}),
          flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.randint(-2**31, 2**31 - 1, (112 * 256, 1024))
                      .astype(np.int32))

    for iters in (20, 40):
        @jax.jit
        def empty(x, n=iters):
            def body(i, c):
                return c * 1.0000001 + 1.0
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        timeit(f"empty_loop_{iters}", empty, big, iters)

        @jax.jit
        def xsum(x, n=iters):
            def body(i, c):
                return jnp.sum(x, dtype=jnp.float32) * 1e-9 + c * 0.5
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        timeit(f"xla_sum112MB_{iters}", xsum, big, iters)

    # vector carry: 112MB sum reduced to a (8,128) tile carried forward
    @jax.jit
    def vecsum(x):
        def body(i, c):
            t = x.reshape(112, 256, 256, 4, 1024)  # no-op reshape
            return c + jnp.sum(x, dtype=jnp.float32) * 1e-12
        z = jnp.zeros((8, 128), jnp.float32)
        def body2(i, c):
            return c * 0.5 + jnp.sum(x[:2048], dtype=jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, 20, body, jnp.float32(0.0))
    timeit("vec_carry_sum", vecsum, big, 20)

    # dense matmul reference: 28 matmuls of (32,4096)@(4096,4096)bf16
    w = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    a = jnp.asarray(rng.randn(32, 4096), jnp.bfloat16)

    @jax.jit
    def mm(w):
        def body(i, c):
            y = c
            for _ in range(7):
                y = (y @ w) * jax.lax.rsqrt(
                    jnp.mean(y * y, -1, keepdims=True) + 1e-6)
            return y.astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, 20, body, a)
    dt = timeit("mm7_loop", mm, w, 20)
    by = 7 * 4096 * 4096 * 2
    print(json.dumps({"variant": "mm7 per-matmul us",
                      "us": round(dt / 7 * 1e6, 1),
                      "GBps": round(by / dt / 1e9, 1)}))


if __name__ == "__main__":
    main()
