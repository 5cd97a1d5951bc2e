"""DMA ablation round 2: make the kernel depend on the loop carry (the v1
harness let XLA hoist the loop-invariant pallas_call out of the fori_loop),
and sweep total size to separate fixed per-call overhead from bandwidth."""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20


def chain(kernel_call):
    @jax.jit
    def run(x):
        def body(i, c):
            return kernel_call(x, c)[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    return run


def time_fn(f, x):
    float(f(x))  # warmup
    t0 = time.perf_counter()
    s = float(f(x))
    return (time.perf_counter() - t0) / ITERS, s


def grid_read(x, c, steps):
    S, R, C = x.shape

    def kern(c_ref, x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.full_like(o_ref, c_ref[0])
        o_ref[...] += x_ref[0, :8, :128].astype(jnp.float32)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(c.reshape(1), x)


def manual_read(x, c, steps, nslots=2):
    S, R, C = x.shape

    def kern(c_ref, x_hbm, o_ref, scratch, sems):
        def cp(slot, step):
            return pltpu.make_async_copy(
                x_hbm.at[step], scratch.at[slot], sems.at[slot])

        for s in range(min(nslots, steps)):
            cp(s, s).start()

        def body(step, acc):
            slot = step % nslots
            cp(slot, step).wait()
            acc = acc + scratch[slot, :8, :128].astype(jnp.float32)

            @pl.when(step + nslots < steps)
            def _():
                cp(slot, step + nslots).start()
            return acc

        acc = jax.lax.fori_loop(
            0, steps, body,
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
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )(c.reshape(1), x)


def main():
    rng = np.random.RandomState(0)
    for total_mb in (28, 112):
        steps = total_mb  # 1MB tiles
        x = jnp.asarray(rng.randint(-2**31, 2**31 - 1, (steps, 256, 1024))
                        .astype(np.int32))
        nbytes = x.size * 4
        for name, fn in (
            ("grid", functools.partial(grid_read, steps=steps)),
            ("manual2", functools.partial(manual_read, steps=steps,
                                          nslots=2)),
            ("manual4", functools.partial(manual_read, steps=steps,
                                          nslots=4)),
        ):
            dt, _ = time_fn(chain(fn), x)
            print(json.dumps({"variant": f"{name} total={total_mb}MB",
                              "us": round(dt * 1e6, 1),
                              "GBps": round(nbytes / dt / 1e9, 1)}),
                  flush=True)


if __name__ == "__main__":
    main()
