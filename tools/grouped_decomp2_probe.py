"""Second decomposition round: why does the (m_tile=128) kernel run at
9-15 TF/s at MP=57344 / N=2048 when the same per-step work measured
99-123 TF/s in the r4 prefill sweep (N=28672, M<=4096)?  Matrix:
{mtiled (static) | grouped (scalar-prefetch)} x {MP 4096 | 57344} x
{N 2048 (n_blocks=1) | 28672 gateup (n_blocks=14)}, all kernel-only with
pre-transposed inputs + anti-hoist barrier."""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

E = int(os.environ.get("E", "64"))
K = 4096
ITERS = int(os.environ.get("ITERS", "20"))
M_TILE = 128


def timeit(tag, chain, work, *args):
    try:
        float(chain(*args, iters=ITERS))
        t0 = time.perf_counter()
        float(chain(*args, iters=ITERS))
        lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(*args, iters=3 * ITERS))
        hi = time.perf_counter() - t0
        dt = (hi - lo) / (2 * ITERS)
        print(json.dumps({"impl": tag, "ms": round(dt * 1e3, 3),
                          "tf_s": round(work / dt / 1e12, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"impl": tag, "error": str(e)[:160]}), flush=True)


def main():
    from lightcompress_tpu.ops.pallas_matmul import (
        pack_int4_planes, pick_n_tile, quantize_act_per_token,
        tile_packed, tile_scales_combined, w4a8_grouped_matmul,
        w4a8_matmul_planes_mtiled)
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving.quantized_model import (
        quantize_linear_stacked)

    key = jax.random.PRNGKey(0)
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)

    def gateup_qp(N):
        from lightcompress_tpu.ops.pallas_matmul import masked_zero_scales
        from lightcompress_tpu.quant import real_quant_weight
        w = jax.random.normal(key, (N, K), jnp.float32) * 0.02
        codes, scales, zeros = real_quant_weight(w, spec)
        kp = K // 8
        gpp = kp // 128
        nt = pick_n_tile(N, kp, 128)
        wp = pack_int4_planes(codes)
        wt = tile_packed(wp, nt, 128)
        szs = tile_scales_combined(scales.astype(jnp.bfloat16),
                                   (zeros * scales).astype(jnp.bfloat16),
                                   nt, gpp)
        return wt, szs

    qp_moe = quantize_linear_stacked(
        jax.random.normal(key, (E, 2048, K), jnp.float32) * 0.02, spec)

    def mk_chain(fn):
        # weights ride as traced jit ARGS — closure capture ships them
        # as constants to the remote compiler (HTTP 413 / per-call
        # re-ship, the r1 bug class)
        @functools.partial(jax.jit, static_argnames=("iters",))
        def chain(xr, xs, codes, szs, iters):
            def body(i, carry):
                xr_t, acc = jax.lax.optimization_barrier((xr, carry))
                y = fn(xr_t, xs, codes, szs)
                return acc + jnp.sum(y[:1]).astype(jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return chain

    def prep(MP):
        # kernels now take NATURAL-order int8 (r5 transpose elimination)
        x = jax.random.normal(key, (MP, K), jnp.bfloat16)
        xq, _ = quantize_act_per_token(x)
        return xq, jnp.ones((MP, 1), jnp.float32)

    # pre-transposed input -> call the inner pallas path via the public
    # wrappers but with identity transpose (xr is already natural+laid
    # out; wrappers re-transpose, so pass through the UNtransposed int8
    # and accept the wrapper's transpose being measured at M=4096 as a
    # known-small term; at 57344 use the barrier kernels from decomp #1)
    for MP in (4096, 57344):
        xr, xs = prep(MP)
        n_mb = MP // M_TILE
        eid = jnp.asarray((np.arange(n_mb) * E // n_mb).astype(np.int32))
        work = 2 * MP * 2048 * K
        timeit(f"mtiled_moe_N2048_MP{MP}",
               mk_chain(lambda a, b, c, s: w4a8_matmul_planes_mtiled(
                   a, b, c, s, group=128)),
               work, xr, xs, qp_moe.codes[0], qp_moe.scales[0])
        timeit(f"grouped_moe_N2048_MP{MP}",
               mk_chain(lambda a, b, c, s, eid=eid: w4a8_grouped_matmul(
                   a, b, c, s, eid, group=128,
                   out_dtype=jnp.bfloat16)),
               work, xr, xs, qp_moe.codes, qp_moe.scales)

    wt, szs = gateup_qp(28672)
    for MP in (4096, 57344):
        xr, xs = prep(MP)
        work = 2 * MP * 28672 * K
        timeit(f"mtiled_gateup_N28672_MP{MP}",
               mk_chain(lambda a, b, c, s: w4a8_matmul_planes_mtiled(
                   a, b, c, s, group=128)),
               work, xr, xs, wt, szs)


if __name__ == "__main__":
    main()
