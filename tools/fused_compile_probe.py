"""Bisect the fused-prologue planes kernel compiler crash (HTTP 500).
The plain planes body compiles; candidates are the prologue constructs:

  scr1  : @pl.when(step0) writing (B,1) f32 + (B,K) int8 scratch, read back
  tr    : in-kernel (b, 8, gpp) -> (b, gpp, 8) transpose + reshape
  qnt   : rsqrt/abs-max/round/clip quant prologue into scratch (no transp.)
  whole : the full fused kernel at small shape (grid 2)

VARIANTS env filters."""

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

B = int(os.environ.get("PB", "8"))
K = int(os.environ.get("PK", "1024"))
NT = 128
GROUP = 128


def run(name, fn):
    try:
        out = fn()
        print(json.dumps({"variant": name,
                          "ok": float(np.asarray(out).sum())}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:160]}),
              flush=True)


def main():
    variants = os.environ.get("VARIANTS", "scr1,tr,qnt,whole").split(",")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, K), jnp.float32)

    if "scr1" in variants:
        def k_scr1(x_ref, o_ref, xq_scr, xs_scr):
            @pl.when(pl.program_id(0) == 0)
            def _():
                xq_scr[:] = (x_ref[:] * 2).astype(jnp.int8)
                xs_scr[:] = jnp.max(x_ref[:], axis=-1, keepdims=True)

            o_ref[:] = xq_scr[:].astype(jnp.float32) * xs_scr[:]

        def f_scr1():
            return jax.jit(lambda xx: pl.pallas_call(
                k_scr1,
                out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
                grid=(2,),
                in_specs=[pl.BlockSpec((B, K), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((B, K), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((B, K), jnp.int8),
                                pltpu.VMEM((B, 1), jnp.float32)],
            )(xx))(x)
        run("scr1", f_scr1)

    if "tr" in variants:
        gpp = K // 8 // GROUP  # 1 at K=1024... use explicit dims
        def k_tr(x_ref, o_ref):
            q = x_ref[:].astype(jnp.int32)
            xs2 = jnp.sum(q.reshape(B, 8, K // 8 // 128 or 1, 128), axis=3)
            o_ref[:] = xs2.transpose(0, 2, 1).reshape(
                B, -1).astype(jnp.float32)

        def f_tr():
            G = 8 * (K // 8 // 128 or 1)
            return jax.jit(lambda xx: pl.pallas_call(
                k_tr,
                out_shape=jax.ShapeDtypeStruct((B, G), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(xx))(x)
        run("tr", f_tr)

    if "qnt" in variants:
        def k_qnt(x_ref, o_ref, xq_scr, xs_scr, xsum_scr):
            G = K // GROUP

            @pl.when(pl.program_id(0) == 0)
            def _():
                xf = x_ref[:].astype(jnp.float32)
                xf = xf * jax.lax.rsqrt(
                    jnp.mean(xf * xf, axis=-1, keepdims=True) + 1e-6)
                amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
                sc = jnp.maximum(amax, 1e-8) / 127.0
                q = jnp.clip(jnp.round(xf / sc), -127, 127).astype(jnp.int8)
                xq_scr[:] = q
                xs_scr[:] = sc
                xsum_scr[:] = jnp.sum(
                    q.astype(jnp.int32).reshape(B, G, GROUP), axis=2
                ).astype(jnp.float32)

            o_ref[:] = xq_scr[:].astype(jnp.float32) * xs_scr[:] + \
                jnp.sum(xsum_scr[:]) * 0.0

        def f_qnt():
            return jax.jit(lambda xx: pl.pallas_call(
                k_qnt,
                out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
                grid=(2,),
                in_specs=[pl.BlockSpec((B, K), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((B, K), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((B, K), jnp.int8),
                                pltpu.VMEM((B, 1), jnp.float32),
                                pltpu.VMEM((B, K // GROUP), jnp.float32)],
            )(xx))(x)
        run("qnt", f_qnt)

    if "whole" in variants:
        from lightcompress_tpu.ops.pallas_matmul import (
            pack_int4_planes, tile_packed, tile_scales,
            w4a8_linear_planes_fused,
        )

        codes = jnp.asarray(rng.randint(0, 16, (256, K)), jnp.int32)
        s = jnp.full((256, K // GROUP), 0.01, jnp.float32)
        wp = tile_packed(pack_int4_planes(codes), 128, GROUP)
        sr = tile_scales(s, 128, K // 8 // GROUP)
        zsr = tile_scales(s * 8.0, 128, K // 8 // GROUP)

        def f_whole():
            return jax.jit(
                lambda xx, wp, sr, zsr: w4a8_linear_planes_fused(
                    xx, wp, sr, zsr, group=GROUP, rms=True)
            )(x, wp, sr, zsr)
        run("whole", f_whole)


if __name__ == "__main__":
    main()
