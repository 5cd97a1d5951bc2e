"""Re-measure the mtiled/grouped kernel matrix with the CORRECT salted
protocol (kernel_chain_timeit) — the earlier mtiled_overhead /
grouped_stall / grouped_decomp numbers were dedup/load artifacts."""

import functools
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from kernel_chain_timeit import timeit_salted

K = 4096
N = 2048
E = 64
ITERS = int(os.environ.get("ITERS", "50"))
M_TILE = 128


def report(tag, fn, MP, iters=ITERS):
    work = 2 * MP * N * K
    try:
        dt = timeit_salted(fn, iters)
        print(json.dumps({"impl": tag, "ms": round(dt * 1e3, 3),
                          "tf_s": round(work / dt / 1e12, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"impl": tag, "error": str(e)[:200]}), flush=True)


def main():
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_int4_planes, quantize_act_per_token, tile_packed,
        tile_scales_combined, w4a8_grouped_matmul, w4a8_matmul_planes,
        w4a8_matmul_planes_mtiled)
    from lightcompress_tpu.quant import QuantSpec, real_quant_weight
    from lightcompress_tpu.serving.quantized_model import (
        quantize_linear_stacked)

    key = jax.random.PRNGKey(0)
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)
    w = jax.random.normal(key, (N, K), jnp.float32) * 0.02
    codes, scales, zeros = real_quant_weight(w, spec)
    gpp = K // 8 // 128
    wp = pack_int4_planes(codes)

    def tiles(nt):
        return (tile_packed(wp, nt, 128),
                tile_scales_combined(scales.astype(jnp.bfloat16),
                                     (zeros * scales).astype(jnp.bfloat16),
                                     nt, gpp))

    wt2048, szs2048 = tiles(2048)
    wt512, szs512 = tiles(512)
    qp_moe = quantize_linear_stacked(
        jax.random.normal(key, (E, N, K), jnp.float32) * 0.02, spec)

    def mk(fn, MP):
        x = jax.random.normal(key, (MP, K), jnp.bfloat16)
        xq, _ = quantize_act_per_token(x)
        xs = jnp.ones((MP, 1), jnp.float32)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def chain(salt, xr, xsc, c, s, iters):
            def body(i, carry):
                xr_t, acc = jax.lax.optimization_barrier((xr, carry))
                y = fn(xr_t, xsc, c, s)
                return acc + jnp.sum(y[:1]).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, salt)
        return chain, xq, xs

    for MP in (1024, 4096, 57344):
        ch, xq, xs = mk(lambda a, b, c, s: w4a8_matmul_planes_mtiled(
            a, b, c, s, group=128), MP)
        report(f"mtiled_NT2048_MP{MP}",
               lambda salt, n, ch=ch, xq=xq, xs=xs: ch(
                   salt, xq, xs, wt2048, szs2048, iters=n), MP)

    ch, xq, xs = mk(lambda a, b, c, s: w4a8_matmul_planes_mtiled(
        a, b, c, s, group=128), 4096)
    report("mtiled_NT512_MP4096",
           lambda salt, n, ch=ch, xq=xq, xs=xs: ch(
               salt, xq, xs, wt512, szs512, iters=n), 4096)

    # decode-kernel reference at M=128
    ch, xq, xs = mk(lambda a, b, c, s: w4a8_matmul_planes(
        a, b, c, s, None, group=128), 128)
    report("decode_M128",
           lambda salt, n, ch=ch, xq=xq, xs=xs: ch(
               salt, xq, xs, wt2048, szs2048, iters=n), 128)

    # grouped kernel, sorted block->expert (the real MoE layout)
    MP = 57344
    n_mb = MP // M_TILE
    eid = jnp.asarray((np.arange(n_mb) * E // n_mb).astype(np.int32))
    ch, xq, xs = mk(lambda a, b, c, s, eid=eid: w4a8_grouped_matmul(
        a, b, c, s, eid, group=128, out_dtype=jnp.bfloat16), MP)
    report("grouped_sorted_MP57344",
           lambda salt, n, ch=ch, xq=xq, xs=xs: ch(
               salt, xq, xs, qp_moe.codes, qp_moe.scales, iters=n), MP)


if __name__ == "__main__":
    main()
