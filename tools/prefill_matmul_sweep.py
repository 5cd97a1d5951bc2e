"""W4 matmul at prefill M (tokens) sizes: Pallas fused kernel vs XLA
dequant+dense. Decides the M-threshold for qlinear_apply dispatch."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import make_layer_qweights
from lightcompress_tpu.ops.pallas_matmul import w4a16_matmul, w4a8_matmul
from lightcompress_tpu.ops.qlinear import qlinear_xla

ITERS = 50


def timeit(f, x, qp):
    # salted protocol (kernel_chain_timeit): the original warm-then-
    # repeat form was exposed to the relay's result dedup (REPORT r5
    # session-2 addendum)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import functools

    from kernel_chain_timeit import timeit_salted

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(salt, iters):
        def body(i, xx):
            y = f(xx, qp)
            y = y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
            return y[:, :x.shape[1]].astype(x.dtype)
        return jnp.sum(jax.lax.fori_loop(
            0, iters, body, (x + salt).astype(x.dtype))[:1])

    return timeit_salted(run, ITERS)


def main():
    key = jax.random.PRNGKey(0)
    lw = make_layer_qweights(key)
    qp = lw[os.environ.get("WHICH", "q")]  # default (4096, 4096) W4 g128 planes
    ms = [int(m) for m in os.environ.get("MS", "32,256,1024,4096").split(",")]
    variants = os.environ.get("VARIANTS", "pallas16,pallas8,xla").split(",")
    for m in ms:
        K = (qp.codes.shape[1] * 8 if qp.codes.ndim == 2
             else qp.codes.shape[1] * qp.codes.shape[3] * 8)
        x = jax.random.normal(key, (m, K), jnp.bfloat16)
        for name in variants:
            f = {"pallas16": w4a16_matmul, "pallas8": w4a8_matmul,
                 "xla": qlinear_xla}[name]
            try:
                dt = timeit(f, x, qp)
                N = (qp.codes.shape[0] if qp.codes.ndim == 2
                     else qp.codes.shape[0] * qp.codes.shape[2])
                flops = 2 * m * N * K
                print(json.dumps({"M": m, "impl": name,
                                  "us": round(dt * 1e6, 1),
                                  "tflops": round(flops / dt / 1e12, 2)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"M": m, "impl": name,
                                  "error": str(e)[:100]}), flush=True)


if __name__ == "__main__":
    main()
