"""Pallas DMA throughput ablations on the real chip.

Question: the grid-pipelined W4 kernel reads packed weights at ~130 GB/s
(identical for contiguous vs strided tiles), while XLA's own dense matmul
reads at ~409 GB/s.  Hypothesis: the auto-pipeliner in this stack is
effectively single-buffered.  Test: a manually double-buffered kernel using
``pltpu.make_async_copy`` from an HBM-resident ref into VMEM scratch slots.

Timing follows the axon protocol (CLAUDE.md): chain iterations inside one
jitted fori_loop, end with a host scalar read.
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MB = 1024 * 1024
ITERS = 20


def time_fn(f, x):
    out = f(x)
    float(jnp.sum(out))  # warmup + compile
    t0 = time.perf_counter()
    out = f(x)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / ITERS
    return dt, s


def chain(kernel_call):
    @jax.jit
    def run(x):
        def body(i, c):
            return c + kernel_call(x)[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    return run


# --- baseline: grid-pipelined read --------------------------------------

def grid_read(x, steps):
    S, R, C = x.shape  # (steps, rows, cols) int32

    def kern(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
        o_ref[...] += x_ref[0, :8, :128].astype(jnp.float32)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid=(steps,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


# --- manual N-slot pipeline ----------------------------------------------

def manual_read(x, steps, nslots=2):
    S, R, C = x.shape

    def kern(x_hbm, o_ref, scratch, sems):
        def start(slot, step):
            pltpu.make_async_copy(
                x_hbm.at[step], scratch.at[slot], sems.at[slot]).start()

        def wait(slot, step):
            pltpu.make_async_copy(
                x_hbm.at[step], scratch.at[slot], sems.at[slot]).wait()

        for s in range(min(nslots, steps)):
            start(s, s)

        def body(step, acc):
            slot = step % nslots
            wait(slot, step)
            acc = acc + scratch[slot, :8, :128].astype(jnp.float32)

            @pl.when(step + nslots < steps)
            def _():
                start(slot, step + nslots)
            return acc

        acc = jax.lax.fori_loop(0, steps, body,
                                jnp.zeros((8, 128), jnp.float32))
        o_ref[...] = acc

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nslots, R, C), jnp.int32),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )(x)


def main():
    total_mb = 28
    results = {}
    for tile_mb, nslots_list in ((1, (2, 4)), (2, (2, 4)), (4, (2,))):
        steps = total_mb // tile_mb
        R = 256 * tile_mb
        C = 1024  # int32 -> tile = R*C*4 bytes = tile_mb MB
        x = jnp.asarray(
            np.random.randint(-2**31, 2**31 - 1, (steps, R, C), np.int64)
            .astype(np.int32))
        nbytes = x.size * 4

        dt, _ = time_fn(chain(functools.partial(grid_read, steps=steps)), x)
        results[f"grid_{tile_mb}MB"] = round(nbytes / dt / 1e9, 1)
        print(json.dumps({"variant": f"grid tile={tile_mb}MB",
                          "GBps": results[f"grid_{tile_mb}MB"]}), flush=True)

        for ns in nslots_list:
            dt, _ = time_fn(chain(functools.partial(
                manual_read, steps=steps, nslots=ns)), x)
            key = f"manual_{tile_mb}MB_{ns}slot"
            results[key] = round(nbytes / dt / 1e9, 1)
            print(json.dumps({"variant": f"manual tile={tile_mb}MB "
                              f"slots={ns}",
                              "GBps": results[key]}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
