"""Plane-packed vs s4-native W4A8 kernel, clean A/B on chip.

Workload: gate-free up->down pair (N=14336,K=4096 then N=4096,K=14336)
chained through per-token act quant, fori_loop'd on device (bench_split
protocol: feedback input, host scalar drain, no replay dedup).

The earlier tools/s4_kernel_experiments.py harness produced a bogus 2.8GB/s
baseline (tile-feedback artifact); this one mirrors bench_split's lin_step,
which measured the plane kernel's production ~450 GB/s weight stream.

Run: ITERS=30 python tools/s4_experiments2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lightcompress_tpu.ops.pallas_matmul import (
    pack_int4_planes,
    pick_n_tile,
    pick_n_tile_s4,
    quantize_act_per_token,
    tile_packed,
    tile_s4,
    tile_scales,
    tile_scales_s4,
    unpack_int4_planes,
    w4a8_matmul_planes,
    w4a8_matmul_s4,
)

HIDDEN, INTER, GROUP = 4096, 14336, 128
B = 32
ITERS = int(os.environ.get("ITERS", "30"))
PAIR_BYTES = 2 * (INTER * HIDDEN // 2)  # codes only, per iteration


def mk_weights(key, n, k):
    codes = jax.random.randint(key, (n, k), 0, 16, jnp.int32)
    G = k // GROUP
    scales = jnp.full((n, G), 0.008, jnp.float32)
    zeros = jnp.full((n, G), 8.0, jnp.float32)
    return codes, scales, zeros


def timed(fn, x0, label, per_iter_bytes):
    out = fn(x0)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    out = fn(out)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    print(json.dumps({
        "impl": label, "us": round(dt * 1e6, 1),
        "weight_GBps": round(per_iter_bytes / dt / 1e9, 1)}), flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    ku, kd, kx = jax.random.split(key, 3)
    cu, su, zu = mk_weights(ku, INTER, HIDDEN)
    cd, sd, zd = mk_weights(kd, HIDDEN, INTER)
    x = jax.random.normal(kx, (B, HIDDEN), jnp.float32)

    # --- plane layout (production): pre-tiled bf16 scales, zeros premult
    def plane_pack(codes, s, z, k):
        nt = pick_n_tile(codes.shape[0], k // 8, GROUP)
        gpp = k // 8 // GROUP
        wp = tile_packed(pack_int4_planes(codes), nt, GROUP)
        sr = tile_scales(s, nt, gpp).astype(jnp.bfloat16)
        zsr = tile_scales(z * s, nt, gpp).astype(jnp.bfloat16)
        return wp, sr, zsr, nt

    wpu, sru, zsru, ntu = plane_pack(cu, su, zu, HIDDEN)
    wpd, srd, zsrd, ntd = plane_pack(cd, sd, zd, INTER)

    @jax.jit
    def run_planes(x0, wpu, sru, zsru, wpd, srd, zsrd):
        def body(i, h):
            hq, hs = quantize_act_per_token(h)
            y = w4a8_matmul_planes(hq, hs, wpu, sru, zsru,
                                   group=GROUP, n_tile=ntu)
            yq, ys = quantize_act_per_token(y)
            return w4a8_matmul_planes(yq, ys, wpd, srd, zsrd,
                                      group=GROUP, n_tile=ntd)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    timed(lambda a: run_planes(a, wpu, sru, zsru, wpd, srd, zsrd), x,
          "planes", PAIR_BYTES)

    # --- s4-native layout (static-unrolled kernel)
    def s4_pack(codes, s, z, k):
        nt = pick_n_tile_s4(codes.shape[0], k)
        w4 = tile_s4(codes, nt)
        sr = tile_scales_s4(s, nt).astype(jnp.bfloat16)
        zsr = tile_scales_s4((z - 8.0) * s, nt).astype(jnp.bfloat16)
        return w4, sr, zsr, nt

    # s4 arrays may not cross jit boundaries on axon (CLAUDE.md): build
    # INSIDE the jit from int8, behind an optimization_barrier, and verify
    # the barrier'd build isn't re-run per iteration via the timing itself.
    c8u = (cu - 8).astype(jnp.int8)
    c8d = (cd - 8).astype(jnp.int8)
    ntu_s = pick_n_tile_s4(INTER, HIDDEN)
    ntd_s = pick_n_tile_s4(HIDDEN, INTER)
    sru_s = tile_scales_s4(su, ntu_s).astype(jnp.bfloat16)
    zsru_s = tile_scales_s4((zu - 8.0) * su, ntu_s).astype(jnp.bfloat16)
    srd_s = tile_scales_s4(sd, ntd_s).astype(jnp.bfloat16)
    zsrd_s = tile_scales_s4((zd - 8.0) * sd, ntd_s).astype(jnp.bfloat16)

    @jax.jit
    def run_s4(x0, c8u, sru, zsru, c8d, srd, zsrd):
        w4u = jax.lax.optimization_barrier(
            c8u.astype(jnp.int4).reshape(INTER // ntu_s, ntu_s, HIDDEN))
        w4d = jax.lax.optimization_barrier(
            c8d.astype(jnp.int4).reshape(HIDDEN // ntd_s, ntd_s, INTER))

        def body(i, h):
            hq, hs = quantize_act_per_token(h)
            y = w4a8_matmul_s4(hq, hs, w4u, sru, zsru,
                               group=GROUP, n_tile=ntu_s)
            yq, ys = quantize_act_per_token(y)
            return w4a8_matmul_s4(yq, ys, w4d, srd, zsrd,
                                  group=GROUP, n_tile=ntd_s)
        return jax.lax.fori_loop(0, ITERS, body, x0)

    try:
        timed(lambda a: run_s4(a, c8u, sru_s, zsru_s, c8d, srd_s, zsrd_s),
              x, "s4_unrolled", PAIR_BYTES)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"impl": "s4_unrolled",
                          "error": str(e)[:300]}), flush=True)

    # --- s4 crossing jit boundary as a real arg (probe; may RecursionError)
    try:
        w4u_dev = jax.jit(
            lambda c: c.astype(jnp.int4).reshape(INTER // ntu_s, ntu_s,
                                                 HIDDEN))(c8u)
        w4d_dev = jax.jit(
            lambda c: c.astype(jnp.int4).reshape(HIDDEN // ntd_s, ntd_s,
                                                 INTER))(c8d)

        @jax.jit
        def run_s4_arg(x0, w4u, sru, zsru, w4d, srd, zsrd):
            def body(i, h):
                hq, hs = quantize_act_per_token(h)
                y = w4a8_matmul_s4(hq, hs, w4u, sru, zsru,
                                   group=GROUP, n_tile=ntu_s)
                yq, ys = quantize_act_per_token(y)
                return w4a8_matmul_s4(yq, ys, w4d, srd, zsrd,
                                      group=GROUP, n_tile=ntd_s)
            return jax.lax.fori_loop(0, ITERS, body, x0)

        timed(lambda a: run_s4_arg(a, w4u_dev, sru_s, zsru_s, w4d_dev,
                                   srd_s, zsrd_s), x, "s4_arg", PAIR_BYTES)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"impl": "s4_arg", "error": str(e)[:300]}),
              flush=True)


if __name__ == "__main__":
    main()
