"""Round 6: subtract fixed latency via iter-count differencing
(t500 - t100)/400; sweep tile size; try 2 interleaved DMA queues."""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dma_experiments2 import grid_read


def run_iters(kernel_call, x, iters):
    @jax.jit
    def run(x):
        def body(i, c):
            return kernel_call(x, c)[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return time.perf_counter() - t0


def marginal(kernel_call, x, nbytes):
    t100 = run_iters(kernel_call, x, 100)
    t500 = run_iters(kernel_call, x, 500)
    per = (t500 - t100) / 400
    return round(nbytes / per / 1e9, 1), round(per * 1e6, 1)


def dual_queue(x, c, steps, nslots=2):
    """Two independent DMA queues (separate semaphores), interleaved."""
    S, R, C = x.shape
    half = steps // 2

    def kern(c_ref, x_hbm, o_ref, s0, s1, sem0, sem1):
        def cp(buf, sem, slot, step):
            return pltpu.make_async_copy(
                x_hbm.at[step], buf.at[slot], sem.at[slot])

        for s in range(min(nslots, half)):
            cp(s0, sem0, s, s).start()
            cp(s1, sem1, s, half + s).start()

        def body(step, acc):
            slot = step % nslots
            cp(s0, sem0, slot, step).wait()
            cp(s1, sem1, slot, half + step).wait()
            acc = acc + s0[slot, :8, :128].astype(jnp.float32) \
                + s1[slot, :8, :128].astype(jnp.float32)

            @pl.when(step + nslots < half)
            def _():
                cp(s0, sem0, slot, step + nslots).start()
                cp(s1, sem1, slot, half + step + nslots).start()
            return acc

        acc = jax.lax.fori_loop(0, half, body,
                                jnp.full((8, 128), c_ref[0], jnp.float32))
        o_ref[...] = acc

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslots, R, C), jnp.int32),
            pltpu.VMEM((nslots, R, C), jnp.int32),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )(c.reshape(1), x)


def main():
    rng = np.random.RandomState(0)
    for tile_rows, label in ((256, "1MB"), (1024, "4MB")):
        steps = 28 * 256 // tile_rows
        x = jnp.asarray(rng.randint(-2**31, 2**31 - 1,
                                    (steps, tile_rows, 1024))
                        .astype(np.int32))
        nbytes = x.size * 4
        g, us = marginal(functools.partial(grid_read, steps=steps), x,
                         nbytes)
        print(json.dumps({"variant": f"grid_{label}", "GBps": g,
                          "per_iter_us": us}), flush=True)
        if steps % 2 == 0:
            g, us = marginal(functools.partial(dual_queue, steps=steps), x,
                             nbytes)
            print(json.dumps({"variant": f"dual_{label}", "GBps": g,
                              "per_iter_us": us}), flush=True)

    # dense matmul marginal for reference
    w = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    a = jnp.asarray(rng.randn(32, 4096), jnp.bfloat16)

    def mmrun(iters):
        @jax.jit
        def run(w, a):
            def body(i, y):
                y = (y @ w) * jax.lax.rsqrt(
                    jnp.mean(y * y, -1, keepdims=True) + 1e-6)
                return y.astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, a)
        float(jnp.sum(run(w, a)))
        t0 = time.perf_counter()
        float(jnp.sum(run(w, a)))
        return time.perf_counter() - t0

    per = (mmrun(500) - mmrun(100)) / 400
    print(json.dumps({"variant": "dense_mm", "per_iter_us":
                      round(per * 1e6, 1),
                      "GBps": round(4096 * 4096 * 2 / per / 1e9, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
