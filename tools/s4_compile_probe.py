"""Minimal probe: does Mosaic (remote compile) accept an s4 (jnp.int4)
VMEM block at all?  tools/s4_kernel_experiments.py got HTTP 500 from the
compile helper on the full kernel; this isolates the failing construct.

Run: python tools/s4_compile_probe.py
"""

import functools
import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, NT, K = 8, 256, 512


def probe(name, fn):
    try:
        out = fn()
        out.block_until_ready()
        print(f"{name}: OK {out.shape} {out.dtype}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:500]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        if "--trace" in sys.argv:
            traceback.print_exc()


# 1. s4 VMEM block, convert to int8, dot with int8 x
def k_s4_dot(x_ref, w_ref, o_ref):
    w = w_ref[0].astype(jnp.int8)  # (NT, K)
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def run_s4_dot():
    @jax.jit
    def f(xq, c8):
        w4 = c8.astype(jnp.int4).reshape(1, NT, K)
        return pl.pallas_call(
            k_s4_dot,
            out_shape=jax.ShapeDtypeStruct((B, NT), jnp.int32),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NT, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, NT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(xq, w4)

    xq = jnp.ones((B, K), jnp.int8)
    c8 = jnp.zeros((NT, K), jnp.int8)
    return f(xq, c8)


# 2. s4 VMEM block, just convert+sum (no dot)
def k_s4_sum(w_ref, o_ref):
    o_ref[:] = jnp.sum(w_ref[0].astype(jnp.int32), axis=1, keepdims=True
                       ).astype(jnp.int32)


def run_s4_sum():
    @jax.jit
    def f(c8):
        w4 = c8.astype(jnp.int4).reshape(1, NT, K)
        return pl.pallas_call(
            k_s4_sum,
            out_shape=jax.ShapeDtypeStruct((NT, 1), jnp.int32),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, NT, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((NT, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(w4)

    c8 = jnp.zeros((NT, K), jnp.int8)
    return f(c8)


# 3. 2D s4 block (no leading 1)
def k_s4_2d(w_ref, o_ref):
    o_ref[:] = jnp.sum(w_ref[:].astype(jnp.int32), axis=1, keepdims=True)


def run_s4_2d():
    @jax.jit
    def f(c8):
        w4 = c8.astype(jnp.int4)
        return pl.pallas_call(
            k_s4_2d,
            out_shape=jax.ShapeDtypeStruct((NT, 1), jnp.int32),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((NT, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((NT, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(w4)

    c8 = jnp.zeros((NT, K), jnp.int8)
    return f(c8)


if __name__ == "__main__":
    print("devices:", jax.devices())
    probe("s4_2d_sum", run_s4_2d)
    probe("s4_3d_sum", run_s4_sum)
    probe("s4_3d_dot", run_s4_dot)
