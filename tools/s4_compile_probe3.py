"""s4 kernel VMEM-stack fixes, batched probes (bench hit: "Scoped
allocation with size 18.05M and limit 16.00M" at NT=2048, K=4096 —
the static unroll keeps too many live temporaries).

Probes:
  a) group-major layout (1, G, NT, group) s4 block + fori_loop with a
     DYNAMIC index on the LEADING dim (earlier failure was pl.ds on the
     minor dim; leading-dim rows are byte-aligned)
  b) NT=1024 static unroll (2MB DMA blocks, half the stack)
  c) NT=2048 static unroll, single accumulator chain
Each probe compiles AND times a 30-iter feedback loop at N=4096, K=4096
(the failing q/o shape), reporting effective weight GB/s.

Run: python tools/s4_compile_probe3.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightcompress_tpu.ops.pallas_matmul import (
    pack_s4_bytes,
    quantize_act_per_token,
    tile_scales_s4,
)

N, K, GROUP, B = 4096, 4096, 128, 32
G = K // GROUP
ITERS = int(os.environ.get("ITERS", "30"))
W_BYTES = N * K // 2


def timed(fn, x0, label):
    try:
        out = fn(x0)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.time()
        out = fn(out)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.time() - t0) / ITERS
        print(json.dumps({"impl": label, "us": round(dt * 1e6, 1),
                          "weight_GBps": round(W_BYTES / dt / 1e9, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"impl": label, "error": str(e)[:250]}), flush=True)


# --- a) group-major block, dynamic leading-dim index -----------------------
def kernel_gmajor(x_ref, w_ref, s_ref, zs_ref, o_ref, *, group):
    b, nt = o_ref.shape
    K_ = x_ref.shape[1]
    G_ = K_ // group
    xb = x_ref[:]
    xsum = jnp.sum(xb.astype(jnp.int32).reshape(b, G_, group), axis=2
                   ).astype(jnp.float32)

    def body(g, acc):
        wg = w_ref[0, g].astype(jnp.int8)          # (NT, group), dyn lead idx
        xg = xb[:, pl.ds(g * group, group)]
        partial = jax.lax.dot_general(
            xg, wg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        sg = s_ref[0, :, pl.ds(g, 1)].astype(jnp.float32)
        return acc + partial.astype(jnp.float32) * sg[:, 0][None, :]

    acc = jax.lax.fori_loop(0, G_, body, jnp.zeros((b, nt), jnp.float32))
    zsb = zs_ref[0].astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc - corr


def run_gmajor(nt):
    codes_u = np.random.RandomState(0).randint(0, 16, (N, K))
    # (N/NT, G, NT, group) byte layout: bytes of group g, tile t contiguous
    cb = np.asarray(pack_s4_bytes(jnp.asarray(codes_u), nt))  # (N/NT,NT,K/2)
    cb = cb.reshape(N // nt, nt, G, GROUP // 2).transpose(0, 2, 1, 3)
    cb = jnp.asarray(cb.copy())  # (N/NT, G, NT, group/2) int8
    s = jnp.full((N // nt, nt, G), 0.01, jnp.bfloat16)
    zs = jnp.zeros((N // nt, nt, G), jnp.bfloat16)
    kern = functools.partial(kernel_gmajor, group=GROUP)

    def call(xq):
        w4 = jax.lax.bitcast_convert_type(cb, jnp.int4).reshape(
            N // nt, G, nt, GROUP)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            grid=(N // nt,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, nt, GROUP), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, nt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(xq, w4, s, zs)

    @jax.jit
    def loop(x0):
        def body(i, h):
            hq, hs = quantize_act_per_token(h)
            y = call(hq) * hs
            return jnp.tanh(y[:, :K])
        return jax.lax.fori_loop(0, ITERS, body, x0)

    return loop


# --- b/c) row-major static unroll variants ---------------------------------
def kernel_unroll(x_ref, w_ref, s_ref, zs_ref, o_ref, *, group, naccs):
    b, nt = o_ref.shape
    K_ = x_ref.shape[1]
    G_ = K_ // group
    xb = x_ref[:]
    xsum = jnp.sum(xb.astype(jnp.int32).reshape(b, G_, group), axis=2
                   ).astype(jnp.float32)
    accs = [jnp.zeros((b, nt), jnp.float32) for _ in range(naccs)]
    for g in range(G_):
        wg = w_ref[0, :, g * group:(g + 1) * group].astype(jnp.int8)
        xg = xb[:, g * group:(g + 1) * group]
        partial = jax.lax.dot_general(
            xg, wg, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        sg = s_ref[0, :, g].astype(jnp.float32)
        accs[g % naccs] = accs[g % naccs] + \
            partial.astype(jnp.float32) * sg[None, :]
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    zsb = zs_ref[0].astype(jnp.float32)
    corr = jax.lax.dot_general(
        xsum, zsb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[:] = acc - corr


def run_unroll(nt, naccs):
    codes_u = np.random.RandomState(0).randint(0, 16, (N, K))
    cb = jnp.asarray(np.asarray(
        pack_s4_bytes(jnp.asarray(codes_u), nt)))  # (N/NT, NT, K/2)
    s = jnp.full((N // nt, nt, G), 0.01, jnp.bfloat16)
    zs = jnp.zeros((N // nt, nt, G), jnp.bfloat16)
    kern = functools.partial(kernel_unroll, group=GROUP, naccs=naccs)

    def call(xq):
        w4 = jax.lax.bitcast_convert_type(cb, jnp.int4).reshape(
            N // nt, nt, K)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
            grid=(N // nt,),
            in_specs=[
                pl.BlockSpec((B, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt, K), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nt, G), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, nt), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(xq, w4, s, zs)

    @jax.jit
    def loop(x0):
        def body(i, h):
            hq, hs = quantize_act_per_token(h)
            y = call(hq) * hs
            return jnp.tanh(y[:, :K])
        return jax.lax.fori_loop(0, ITERS, body, x0)

    return loop


if __name__ == "__main__":
    x = jax.random.normal(jax.random.PRNGKey(0), (B, K), jnp.float32)
    import sys as _sys
    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    if which in ("all", "unroll"):
        timed(run_unroll(1024, 4), x, "unroll_nt1024_4acc")
        timed(run_unroll(2048, 1), x, "unroll_nt2048_1acc")
        timed(run_unroll(2048, 2), x, "unroll_nt2048_2acc")
    if which in ("all", "gmajor"):
        timed(run_gmajor(2048), x, "gmajor_nt2048_fori")
