"""DMA ablation round 3: per-pallas_call fixed overhead.

Fixed total bytes (112MB), split across N calls per loop iteration.
Slope of time vs N = per-call overhead; intercept = stream time + loop
overhead.  Also an XLA-only reduction baseline for the loop-iteration cost.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20
TOTAL_MB = 112


def read_kernel(x, c):
    R, C = x.shape
    tile_r = min(R, 512)  # 2MB tiles
    steps = R // tile_r

    def kern(c_ref, x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.full_like(o_ref, c_ref[0])
        o_ref[...] += x_ref[:8, :128].astype(jnp.float32)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((tile_r, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(c.reshape(1), x)


def main():
    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.randint(-2**31, 2**31 - 1,
                                  (TOTAL_MB * 256, 1024)).astype(np.int32))
    nbytes = big.size * 4

    for n_calls in (1, 4, 16, 64):
        rows = big.shape[0] // n_calls
        parts = [jax.lax.slice_in_dim(big, j * rows, (j + 1) * rows)
                 for j in range(n_calls)]

        @jax.jit
        def run(parts):
            def body(i, c):
                acc = c
                for p in parts:
                    acc = read_kernel(p, acc)[0, 0]
                return acc
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        float(run(parts))
        t0 = time.perf_counter()
        float(run(parts))
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"n_calls": n_calls, "us": round(dt * 1e6, 1),
                          "GBps": round(nbytes / dt / 1e9, 1)}), flush=True)

    # XLA-only baseline: same traffic, no pallas
    @jax.jit
    def run_xla(x):
        def body(i, c):
            return jnp.sum(x, dtype=jnp.float32) * 1e-9 + c * 0.5
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(run_xla(big))
    t0 = time.perf_counter()
    float(run_xla(big))
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"n_calls": "xla_sum", "us": round(dt * 1e6, 1),
                      "GBps": round(nbytes / dt / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
