"""Decompose the grouped/mtiled prefill path at large M into: act
quantize, the int8 plane-layout transpose (xr), and the bare kernel
(anti-hoist barrier ties the pre-transposed operand to the carry).  The
stall probe showed ALL variants (incl. static mtiled) at ~250us/block =
8.4 TF/s vs the r4 sweep's 99-123 TF/s — the overhead is XLA-side prep,
not the dynamic index.  This names the term."""

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
N = int(os.environ.get("N", "2048"))
K = int(os.environ.get("K", "4096"))
MP = int(os.environ.get("MP", "57344"))
ITERS = int(os.environ.get("ITERS", "20"))
M_TILE = 128


def timeit(tag, chain, *args, work=None):
    try:
        float(jnp.sum(chain(*args, iters=ITERS)))
        t0 = time.perf_counter()
        float(jnp.sum(chain(*args, iters=ITERS)))
        lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(chain(*args, iters=3 * ITERS)))
        hi = time.perf_counter() - t0
        dt = (hi - lo) / (2 * ITERS)
        out = {"impl": tag, "ms": round(dt * 1e3, 3)}
        if work:
            out["tf_s"] = round(work / dt / 1e12, 1)
        print(json.dumps(out), flush=True)
    except Exception as e:
        print(json.dumps({"impl": tag, "error": str(e)[:160]}), flush=True)


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lightcompress_tpu.ops.pallas_matmul import (
        _maybe_vmem_params, _w4a8_kernel_grouped, quantize_act_per_token)
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving.quantized_model import (
        quantize_linear_stacked)

    key = jax.random.PRNGKey(0)
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)
    qp = quantize_linear_stacked(
        jax.random.normal(key, (E, N, K), jnp.float32) * 0.02, spec)
    n_mb = MP // M_TILE
    eid = jnp.asarray((np.arange(n_mb) * E // n_mb).astype(np.int32))
    x0 = jax.random.normal(key, (MP, K), jnp.bfloat16)
    group = 128
    _, n_blocks, gpp, n_tile, _ = qp.codes.shape

    # (a) quantize alone
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain_quant(x, iters):
        def body(i, xx):
            xq, xs = quantize_act_per_token(xx)
            return (xq.astype(jnp.bfloat16) * xs).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, x)

    timeit("quantize", chain_quant, x0)

    # (b) the plane-layout transpose alone (int8 (MP, K) chained)
    xq0, _ = quantize_act_per_token(x0)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain_xr(xq, iters):
        def body(i, xx):
            xr = xx.reshape(MP, 8, gpp, group).transpose(0, 2, 1, 3) \
                .reshape(MP, K)
            return xr
        return jax.lax.fori_loop(0, iters, body, xq)

    timeit("xr_transpose", chain_xr, xq0)

    # (c) bare grouped kernel on pre-transposed input (barrier anti-hoist)
    xr0 = xq0.reshape(MP, 8, gpp, group).transpose(0, 2, 1, 3) \
        .reshape(MP, K)
    xs0 = jnp.ones((MP, 1), jnp.float32)

    def kern(xr, xs, codes, szs, eid):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks, n_mb),
            in_specs=[
                pl.BlockSpec((M_TILE, K), lambda i, j, e: (j, 0)),
                pl.BlockSpec((M_TILE, 1), lambda i, j, e: (j, 0)),
                pl.BlockSpec((1, 1, gpp, n_tile, group),
                             lambda i, j, e: (e[j], i, 0, 0, 0)),
                pl.BlockSpec((1, 1, 2 * gpp * 8, n_tile),
                             lambda i, j, e: (e[j], i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((M_TILE, n_tile),
                                   lambda i, j, e: (j, i)),
            scratch_shapes=[pltpu.VMEM((gpp * 8, n_tile, group),
                                       jnp.int8)],
        )
        return pl.pallas_call(
            functools.partial(_w4a8_kernel_grouped, group=group, gpp=gpp),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((MP, N), jnp.bfloat16),
            compiler_params=_maybe_vmem_params(
                2 * gpp * n_tile * group * 4 + 2 * M_TILE * K
                + M_TILE * n_tile * 4 * 6 + gpp * 8 * n_tile * group
                + (2 << 20)),
        )(eid, xr, xs, codes, szs)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain_kern(xr, xs, codes, szs, eid, iters):
        def body(i, carry):
            xr_t, acc = jax.lax.optimization_barrier((xr, carry))
            y = kern(xr_t, xs, codes, szs, eid)
            return acc + jnp.sum(y[:1]).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    timeit("kernel_only", chain_kern, xr0, xs0, qp.codes, qp.scales, eid,
           work=2 * MP * N * K)


if __name__ == "__main__":
    main()
