"""Can XLA's own matmul pipeline stream 4-bit weights faster than Pallas?

Context (see CLAUDE.md / REPORT.md): the Pallas fused W4 kernel floor is
~230us for the 28.7MB packed down_proj read (~130 GB/s DMA ceiling in this
stack), while XLA's dense matmul streams 409 GB/s.  JAX 0.9 has a native
``jnp.int4`` dtype (s4, packed 2/byte on TPU).  If XLA can feed a dot from
s4 storage at dense-matmul rates, the XLA path beats the Pallas kernel with
zero kernel code.

axon-plugin gotcha: ANY eager op on an S4 jax.Array (even reshape, even
device_put) hits a RecursionError in ``_array_shard_arg`` — s4 must live
entirely INSIDE one jit.  So every variant takes int8 weights as input,
converts once, pins the converted buffer with ``optimization_barrier`` (so
XLA materializes s4 storage instead of re-reading int8 per iteration), then
runs the iteration fori_loop.

Variants (decode-shaped: x(32,14336) @ W(4096,14336)^T):
  w8a8     int8 weights, per-oc scale, int8 MXU dot     (2x bytes, ~409GB/s ref)
  i4cast   s4 storage -> astype(int8) -> int8 dot
  i4direct dot_general(int8, s4) directly               (mixed-dtype dot)
  i4group  g128 scales: batched-group dot (g batch dim) + weighted sum
  i4dq     s4 -> bf16 dequant (g128 scales) -> bf16 dot

Run: python tools/int4_xla_experiments.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

OC, IC = 4096, 14336
M = int(os.environ.get("M", "32"))
G = 128
NG = IC // G
ITERS = int(os.environ.get("ITERS", "50"))
W4_BYTES = OC * IC // 2


def timeit(run_jit, *args):
    float(jnp.sum(run_jit(*args)))  # compile + drain
    t0 = time.perf_counter()
    float(jnp.sum(run_jit(*(a + 1 if a.dtype != jnp.int8 else a
                            for a in args))))
    return (time.perf_counter() - t0) / ITERS


def loop(step, x0):
    def body(i, xx):
        y = step(xx)
        y = y * jax.lax.rsqrt(jnp.mean(jnp.abs(y.astype(jnp.float32)))
                              + 1e-6)
        if y.shape == x0.shape and y.dtype == x0.dtype:
            return y
        return jnp.broadcast_to(y[:, :1], x0.shape).astype(x0.dtype)

    return jax.lax.fori_loop(0, ITERS, body, x0)


def main():
    key = jax.random.PRNGKey(0)
    kw, kx = jax.random.split(key)
    w8 = jax.random.randint(kw, (OC, IC), -8, 8, jnp.int8)
    sc_oc = jnp.full((OC,), 0.01, jnp.float32)
    sc_g = jnp.full((OC, NG), 0.01, jnp.float32)
    x8 = jax.random.randint(kx, (M, IC), -127, 128, jnp.int8)
    xf = jax.random.normal(kx, (M, IC), jnp.bfloat16)

    dn = (((1,), (1,)), ((), ()))  # contract ic, no batch
    bar = jax.lax.optimization_barrier

    def post(acc, x):
        y = acc.astype(jnp.float32) * sc_oc[None, :]
        return y.astype(jnp.float32)

    @jax.jit
    def v_w8a8(w8_, x):
        w = bar(w8_)
        return loop(lambda xx: post(jax.lax.dot_general(
            xx.astype(jnp.int8), w, dn,
            preferred_element_type=jnp.int32), xx).astype(jnp.float32), x)

    @jax.jit
    def v_i4cast(w8_, x):
        w4 = bar(w8_.astype(jnp.int4))
        return loop(lambda xx: post(jax.lax.dot_general(
            xx.astype(jnp.int8), w4.astype(jnp.int8), dn,
            preferred_element_type=jnp.int32), xx).astype(jnp.float32), x)

    @jax.jit
    def v_i4direct(w8_, x):
        w4 = bar(w8_.astype(jnp.int4))
        return loop(lambda xx: post(jax.lax.dot_general(
            xx.astype(jnp.int8), w4, dn,
            preferred_element_type=jnp.int32), xx).astype(jnp.float32), x)

    @jax.jit
    def v_i4group(w8_, x):
        w4 = bar(w8_.reshape(OC, NG, G).transpose(1, 0, 2).astype(jnp.int4))
        dng = (((2,), (2,)), ((0,), (0,)))

        def step(xx):
            xg = xx.astype(jnp.int8).reshape(M, NG, G).transpose(1, 0, 2)
            acc = jax.lax.dot_general(xg, w4.astype(jnp.int8), dng,
                                      preferred_element_type=jnp.int32)
            return jnp.einsum("gmo,og->mo", acc.astype(jnp.float32), sc_g)

        return loop(step, x)

    @jax.jit
    def v_i4dq(w8_, x):
        w4 = bar(w8_.astype(jnp.int4))

        def step(xx):
            wf = (w4.astype(jnp.float32).reshape(OC, NG, G)
                  * sc_g[:, :, None]).reshape(OC, IC).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                xx.astype(jnp.bfloat16), wf, dn,
                preferred_element_type=jnp.float32)

        return loop(step, x)

    variants = {
        "w8a8": (v_w8a8, jnp.float32(1) * x8, OC * IC),
        "i4cast": (v_i4cast, jnp.float32(1) * x8, W4_BYTES),
        "i4direct": (v_i4direct, jnp.float32(1) * x8, W4_BYTES),
        "i4group": (v_i4group, jnp.float32(1) * x8, W4_BYTES),
        "i4dq": (v_i4dq, jnp.float32(1) * xf, W4_BYTES),
    }
    want = os.environ.get(
        "VARIANTS", "w8a8,i4cast,i4direct,i4group,i4dq").split(",")
    for name in want:
        f, x, nbytes = variants[name]
        try:
            dt = timeit(f, w8, x.astype(jnp.float32))
            print(json.dumps({
                "impl": name, "us": round(dt * 1e6, 1),
                "eff_GBps": round(nbytes / dt / 1e9, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"impl": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
# Appended control variants (see run log in CLAUDE.md): bf16 dense baseline
# reproduces the 409 GB/s dense-stream fact; i8asbf16 isolates whether the
# slow w8a8 path is the int8 MXU dot or the int8 operand stream.
