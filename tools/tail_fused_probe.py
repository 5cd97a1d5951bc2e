"""On-chip probe: layer-tail megakernel (o + residual/RMS + gateup +
silu*mul + down, ONE pallas_call) vs the 3-launch FUSED pipeline at bench
shapes.  Chained fori_loop + iter differencing.

Bytes/iter = o 8MB + gateup 58MB + down 29MB codes (+scales)."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from lightcompress_tpu.ops.pallas_matmul import (
    pack_int4_planes, pick_n_tile, quantize_act_per_token, tile_packed,
    tile_scales, w4a8_attn_tail_fused, w4a8_matmul_planes,
)

B, H, I, g = 32, 4096, 14336, 128
ITERS, ITERS_HI = 50, 250


def mk(key, oc, ic):
    codes = jax.random.randint(key, (oc, ic), 0, 16, jnp.int32)
    nt = pick_n_tile(oc, ic // 8, g)
    gpp = ic // 8 // g
    wp = tile_packed(pack_int4_planes(codes), nt, g)
    s = jnp.full((oc, ic // g), 0.01, jnp.float32)
    z = jnp.full((oc, ic // g), 8.0, jnp.float32)
    sr = tile_scales(s, nt, gpp).astype(jnp.bfloat16)
    zsr = tile_scales(z * s, nt, gpp).astype(jnp.bfloat16)
    nb = wp.size * 4 + sr.size * 2 + zsr.size * 2
    return (wp, sr, zsr, nt), nb


def timeit(label, run, x0, nbytes):
    try:
        out = run(x0, ITERS)
        float(jnp.sum(out.astype(jnp.float32)))
        out = run(x0, ITERS_HI)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        out = run(out, ITERS)
        float(jnp.sum(out.astype(jnp.float32)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(out, ITERS_HI)
        float(jnp.sum(out.astype(jnp.float32)))
        t_hi = time.perf_counter() - t0
        per = (t_hi - t_lo) / (ITERS_HI - ITERS)
        print(json.dumps({"variant": label, "us": round(per * 1e6, 1),
                          "GBps": round(nbytes / per / 1e9, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": label, "error": str(e)[:400]}),
              flush=True)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    (wo, so, zso, nto), nb_o = mk(ks[0], H, H)
    (wg, sg, zsg, ntg), nb_g = mk(ks[1], 2 * I, H)
    (wd, sd, zsd, ntd), nb_d = mk(ks[2], H, I)
    nb = nb_o + nb_g + nb_d
    ctx0 = jax.random.normal(key, (B, H), jnp.bfloat16)
    x0 = jax.random.normal(ks[0], (B, H), jnp.bfloat16)

    variants = os.environ.get("VARIANTS", "tail,split").split(",")

    if "tail" in variants:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_tail(wo, so, zso, wg, sg, zsg, wd, sd, zsd, x, c0, iters):
            def body(i, carry):
                x, ctx = carry
                y = w4a8_attn_tail_fused(ctx, x, wo, so, zso, wg, sg, zsg,
                                         wd, sd, zsd, group=g)
                yn = y * jax.lax.rsqrt(
                    jnp.mean(y.astype(jnp.float32) ** 2) + 1e-6
                ).astype(y.dtype)
                return (yn, yn)
            return jax.lax.fori_loop(0, iters, body, (x, c0))[0]

        timeit("tail", lambda a, it: run_tail(
            wo, so, zso, wg, sg, zsg, wd, sd, zsd, a, ctx0, iters=it),
            x0, nb)

    if "split" in variants:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_split(wo, so, zso, wg, sg, zsg, wd, sd, zsd, x, c0, iters):
            def ql(h, wp, sr, zsr, nt):
                xq, xs = quantize_act_per_token(h)
                return w4a8_matmul_planes(xq, xs, wp, sr, zsr, group=g,
                                          n_tile=nt)

            def body(i, carry):
                x, ctx = carry
                h = x.astype(jnp.float32) + ql(ctx, wo, so, zso, nto)
                h2 = h * jax.lax.rsqrt(
                    jnp.mean(h * h, -1, keepdims=True) + 1e-6)
                gu = ql(h2.astype(jnp.bfloat16), wg, sg, zsg, ntg)
                mid = jax.nn.silu(gu[:, :I]) * gu[:, I:]
                y = (h + ql(mid.astype(jnp.bfloat16), wd, sd, zsd, ntd)
                     ).astype(jnp.bfloat16)
                yn = y * jax.lax.rsqrt(
                    jnp.mean(y.astype(jnp.float32) ** 2) + 1e-6
                ).astype(y.dtype)
                return (yn, yn)
            return jax.lax.fori_loop(0, iters, body, (x, c0))[0]

        timeit("split", lambda a, it: run_split(
            wo, so, zso, wg, sg, zsg, wd, sd, zsd, a, ctx0, iters=it),
            x0, nb)


if __name__ == "__main__":
    main()
