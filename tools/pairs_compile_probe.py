"""Bisect which construct in the group-pair W4A8 kernel crashes the remote
Mosaic compiler (HTTP 500 subprocess crash, tools/stack_gap_experiments r2).
Small shapes; each variant is one pallas_call.  VARIANTS env filters:

  shifts   : int8 arithmetic shifts on a ref slice -> out
  sdyn     : mid-dim pl.ds on the scales ref
  pairs    : full pairs kernel, fori_loop + pl.ds (the production form)
  pairs_st : full pairs kernel, STATIC python unroll + int slices
  dot8     : int8 dot of two static ref slices (control)
"""

import functools
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K, G, NT = 512, 1024, 8, 256
B = 8


def call(kernel, out_shape, *args, scratch=None):
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch or [],
    )(*args)


def run(name, fn):
    try:
        out = fn()
        print(json.dumps({"variant": name,
                          "ok": float(np.asarray(out).sum())}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:200]}),
              flush=True)


def main():
    variants = os.environ.get(
        "VARIANTS", "shifts,sdyn,pairs,pairs_st,dot8").split(",")
    rng = np.random.RandomState(0)
    wb = jnp.asarray(rng.randint(-128, 128, (NT, K // 2)), jnp.int8)
    xq = jnp.asarray(rng.randint(-127, 128, (B, K)), jnp.int8)
    s = jnp.asarray(rng.rand(G, NT), jnp.float32)

    if "shifts" in variants:
        def k_shifts(wb_ref, o_ref):
            four = jnp.int8(4)
            w = wb_ref[:, pl.ds(0, 128)]
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(w, four), four)
            hi = jax.lax.shift_right_arithmetic(w, four)
            o_ref[:] = (lo + hi).astype(jnp.int32)

        run("shifts", lambda: jax.jit(lambda w: call(
            k_shifts, jax.ShapeDtypeStruct((NT, 128), jnp.int32), w))(wb))

    if "sdyn" in variants:
        def k_sdyn(s_ref, o_ref):
            def body(i, acc):
                row = s_ref[pl.ds(i, 1), :]          # (1, NT) mid... 2D ref
                return acc + row
            o_ref[:] = jax.lax.fori_loop(
                0, G, body, jnp.zeros((1, NT), jnp.float32))

        run("sdyn", lambda: jax.jit(lambda ss: call(
            k_sdyn, jax.ShapeDtypeStruct((1, NT), jnp.float32), ss))(s))

    if "dot8" in variants:
        def k_dot8(x_ref, wb_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:, 0:128], wb_ref[:, 0:128],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        run("dot8", lambda: jax.jit(lambda x, w: call(
            k_dot8, jax.ShapeDtypeStruct((B, NT), jnp.int32), x, w))(xq, wb))

    group = 128
    hb = group

    if "pairs" in variants:
        def k_pairs(x_ref, wb_ref, s_ref, o_ref):
            four = jnp.int8(4)
            b, nt = o_ref.shape
            def body(p, acc):
                w = wb_ref[:, pl.ds(p * hb, hb)]
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(w, four), four)
                hi = jax.lax.shift_right_arithmetic(w, four)
                xe = x_ref[:, pl.ds((2 * p) * group, group)]
                xo = x_ref[:, pl.ds((2 * p + 1) * group, group)]
                pe = jax.lax.dot_general(
                    xe, lo, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                po = jax.lax.dot_general(
                    xo, hi, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                se = s_ref[pl.ds(2 * p, 1), :]
                so = s_ref[pl.ds(2 * p + 1, 1), :]
                return acc + pe.astype(jnp.float32) * se \
                    + po.astype(jnp.float32) * so
            o_ref[:] = jax.lax.fori_loop(
                0, K // (2 * group), body, jnp.zeros((b, nt), jnp.float32))

        run("pairs", lambda: jax.jit(lambda x, w, ss: call(
            k_pairs, jax.ShapeDtypeStruct((B, NT), jnp.float32),
            x, w, ss))(xq, wb, s))

    if "pairs_st" in variants:
        def k_pairs_st(x_ref, wb_ref, s_ref, o_ref):
            four = jnp.int8(4)
            b, nt = o_ref.shape
            acc = jnp.zeros((b, nt), jnp.float32)
            for p in range(K // (2 * group)):
                w = wb_ref[:, p * hb:(p + 1) * hb]
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(w, four), four)
                hi = jax.lax.shift_right_arithmetic(w, four)
                xe = x_ref[:, (2 * p) * group:(2 * p + 1) * group]
                xo = x_ref[:, (2 * p + 1) * group:(2 * p + 2) * group]
                pe = jax.lax.dot_general(
                    xe, lo, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                po = jax.lax.dot_general(
                    xo, hi, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = acc + pe.astype(jnp.float32) * s_ref[2 * p:2 * p + 1, :]
                acc = acc + po.astype(jnp.float32) * \
                    s_ref[2 * p + 1:2 * p + 2, :]
            o_ref[:] = acc

        run("pairs_st", lambda: jax.jit(lambda x, w, ss: call(
            k_pairs_st, jax.ShapeDtypeStruct((B, NT), jnp.float32),
            x, w, ss))(xq, wb, s))


if __name__ == "__main__":
    main()
