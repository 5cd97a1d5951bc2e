"""Per-op decomposition of the W4A8 decode weight kernel (VERDICT r4 #5):
is the c1024 ceiling really the VPU nibble unpack?

Three kernels over the SAME tiled code slabs (bench tile shapes):
  copy    — DMA only: read the int32 tile, fold 8 lanes into the output
  unpack  — DMA + VPU: full 8-plane shift/mask/convert, fold the planes
  full    — DMA + VPU + MXU: the production dot kernel
            (w4a8_matmul_planes on the same weights)

us(copy) = the DMA floor, us(unpack) - us(copy) = the VPU unpack bill,
us(full) - us(unpack) = the MXU + scale-apply bill.  Chained iterations
+ host read (tunnel protocol).  Prints one JSON line per (shape, kernel).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = int(os.environ.get("ITERS", "100"))


def _copy_kernel(wp_ref, o_ref):
    wpb = wp_ref[0]  # (gpp, NT, g) int32
    o_ref[:] = jnp.sum(wpb.astype(jnp.float32), axis=(0, 2))[None, :]


def _unpack_kernel(wp_ref, o_ref, *, gpp):
    acc = jnp.zeros((o_ref.shape[1],), jnp.float32)

    def gi_body(gi, acc):
        wpb = wp_ref[0, gi]
        for j in range(8):
            cg = ((wpb >> (4 * j)) & 0xF).astype(jnp.int8)
            acc = acc + jnp.sum(cg.astype(jnp.float32), axis=1)
        return acc

    acc = jax.lax.fori_loop(0, gpp, gi_body, acc)
    o_ref[:] = acc[None, :]


def run_chain(fn, *args):
    # the probe output must DEPEND on the loop carry or XLA hoists the
    # loop-invariant pallas_call out of the fori entirely (v1 reported
    # 7.7 TB/s "copies"); an optimization_barrier ties the weight operand
    # to the carry without copying it.  Timing: salted protocol
    # (kernel_chain_timeit) — the original warm-then-repeat timeit was
    # exposed to the relay's result-dedup + executable-load artifacts
    # (REPORT r5 session-2 addendum).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from kernel_chain_timeit import timeit_salted

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(salt, iters, a=args):
        def body(i, acc):
            wp, acc2 = jax.lax.optimization_barrier((a[0], acc))
            return fn(wp, *a[1:])[0, 0] + acc2 * 0.0
        return jax.lax.fori_loop(0, iters, body, salt)

    return timeit_salted(chain, ITERS)


def main():
    os.environ.setdefault("BENCH_FUSED", "0")  # BEFORE bench import

    from bench import make_layer_qweights
    from lightcompress_tpu.ops.pallas_matmul import w4a8_matmul_planes

    key = jax.random.PRNGKey(0)
    lw = make_layer_qweights(key)
    # q (8MB) sits VMEM-resident across chained iters and reads fake
    # >4TB/s — only >16MB slabs give honest DMA numbers
    which = os.environ.get("WHICH", "gate,down").split(",")
    B = 32
    for name in which:
        qp = lw[name]
        wp_t = qp.codes  # (n_blocks, gpp, NT, g) int32 pre-tiled
        if wp_t.ndim != 4:
            continue
        n_blocks, gpp, nt, g = wp_t.shape
        K = gpp * g * 8
        N = n_blocks * nt
        code_bytes = wp_t.size * 4
        for kname in ("copy", "unpack", "full"):
            if kname == "full":
                xq = jnp.ones((B, K), jnp.int8)
                xs = jnp.ones((B, 1), jnp.float32)

                def fn(wp, xq=xq, xs=xs, qp=qp):
                    return w4a8_matmul_planes(
                        xq, xs, wp, qp.scales, qp.zeros,
                        group=qp.group_size)

                dt = run_chain(fn, wp_t)
            else:
                kern = (_copy_kernel if kname == "copy" else
                        functools.partial(_unpack_kernel, gpp=gpp))

                def fn(wp, kern=kern, n_blocks=n_blocks, nt=nt, gpp=gpp,
                       g=g):
                    return pl.pallas_call(
                        kern,
                        out_shape=jax.ShapeDtypeStruct((1, nt),
                                                       jnp.float32),
                        grid=(n_blocks,),
                        in_specs=[pl.BlockSpec(
                            (1, gpp, nt, g), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)],
                        out_specs=pl.BlockSpec(
                            (1, nt), lambda i: (0, 0),
                            memory_space=pltpu.VMEM),
                        compiler_params=pltpu.CompilerParams(
                            vmem_limit_bytes=64 * 1024 * 1024),
                    )(wp)

                dt = run_chain(fn, wp_t)
            print(json.dumps({
                "shape": f"{name} {N}x{K}", "kernel": kname,
                "us": round(dt * 1e6, 1),
                "gbs": round(code_bytes / dt / 1e9, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
