"""Bisect the s4 kernel Mosaic failure (probe 1 passed at NT=256, K=512).

Suspects: (a) pl.ds dynamic slice on an int4 ref, (b) production shapes
(K=14336, NT=512 -> 3.7MB s4 block), (c) fori_loop + multi-acc structure.

Run: python tools/s4_compile_probe2.py
"""

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightcompress_tpu.ops.pallas_matmul import _w4a8_kernel_s4


def probe(name, fn):
    try:
        out = fn()
        out.block_until_ready()
        print(f"{name}: OK {out.shape} {out.dtype}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:400]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


# a) pl.ds dynamic slice on s4 ref, small shape
def k_ds(x_ref, w_ref, o_ref):
    def body(g, acc):
        wg = jax.lax.dynamic_slice(
            w_ref[0], (0, g * 128), (w_ref.shape[1], 128)).astype(jnp.int8)
        xg = jax.lax.dynamic_slice(x_ref[:], (0, g * 128),
                                   (x_ref.shape[0], 128))
        return acc + jax.lax.dot_general(
            xg, wg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    o_ref[:] = jax.lax.fori_loop(
        0, x_ref.shape[1] // 128, body,
        jnp.zeros(o_ref.shape, jnp.int32))


def run_ds(B, NT, K):
    @jax.jit
    def f(xq, c8):
        w4 = c8.astype(jnp.int4).reshape(1, NT, K)
        return pl.pallas_call(
            k_ds,
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

    return f(jnp.ones((B, K), jnp.int8), jnp.zeros((NT, K), jnp.int8))


# b) the real production kernel at a given shape
def run_prod(B, NT, K, group=128, nblocks=1):
    G = K // group
    kernel = functools.partial(_w4a8_kernel_s4, group=group)

    @jax.jit
    def f(xq, c8, s, zs):
        w4 = c8.astype(jnp.int4).reshape(nblocks, NT, K)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, nblocks * NT), jnp.float32),
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NT, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NT, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NT, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, NT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(xq, w4, s, zs)

    xq = jnp.ones((B, K), jnp.int8)
    c8 = jnp.zeros((nblocks * NT, K), jnp.int8)
    s = jnp.full((nblocks, NT, G), 0.01, jnp.bfloat16)
    zs = jnp.full((nblocks, NT, G), 0.001, jnp.bfloat16)
    return f(xq, c8, s, zs)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    probe("ds_small(8,256,512)", lambda: run_ds(8, 256, 512))
    probe("prod_small(8,256,512)", lambda: run_prod(8, 256, 512))
    probe("prod_mid(32,256,4096)", lambda: run_prod(32, 256, 4096))
    probe("prod_full(32,512,14336)", lambda: run_prod(32, 512, 14336))
    probe("prod_full2(32,512,14336,x7)",
          lambda: run_prod(32, 512, 14336, nblocks=7))
