"""Isolate the grouped-kernel dynamic-fetch stall: same compiled kernel,
block_eid patterns with 1 / ~E / n_mblocks expert transitions, plus the
static mtiled kernel as the no-dynamic-index floor.  If time scales with
TRANSITION count (not block count), the Mosaic data-dependent tile fetch
is the overhead (the r5 gathered-kernel ~1.1 ms/selection class), and the
fix is manual async-copy double buffering, not layout tweaks."""

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
N = int(os.environ.get("N", "2048"))     # gate oc (I)
K = int(os.environ.get("K", "4096"))     # hidden
MP = int(os.environ.get("MP", "57344"))  # grouped rows (448 blocks)
ITERS = int(os.environ.get("ITERS", "20"))
M_TILE = 128


def main():
    from lightcompress_tpu.ops.pallas_matmul import (
        quantize_act_per_token, w4a8_grouped_matmul,
        w4a8_matmul_planes_mtiled)
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving.quantized_model import (
        quantize_linear_stacked)

    key = jax.random.PRNGKey(0)
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)
    w3 = jax.random.normal(key, (E, N, K), jnp.float32) * 0.02
    qp = quantize_linear_stacked(w3, spec)
    n_mb = MP // M_TILE
    x0 = jax.random.normal(key, (MP, K), jnp.bfloat16)

    pats = {
        "const0": np.zeros(n_mb, np.int32),                    # 1 tile
        "sorted": (np.arange(n_mb) * E // n_mb).astype(np.int32),  # ~E
        "alt": (np.arange(n_mb) % E).astype(np.int32),         # n_mb
    }

    def run(name, fn):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def chain(codes, scales, x, iters):
            assert K % N == 0

            def body(i, xx):
                xq, xs = quantize_act_per_token(xx)
                y = fn(xq, xs, codes, scales)
                y = jnp.tile(y.astype(jnp.float32), (1, K // N))
                return (y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
                        ).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, x)

        try:
            float(jnp.sum(chain(qp.codes, qp.scales, x0, iters=ITERS)))
            t0 = time.perf_counter()
            float(jnp.sum(chain(qp.codes, qp.scales, x0, iters=ITERS)))
            lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(jnp.sum(chain(qp.codes, qp.scales, x0, iters=3 * ITERS)))
            hi = time.perf_counter() - t0
            dt = (hi - lo) / (2 * ITERS)
            print(json.dumps({
                "impl": name, "ms": round(dt * 1e3, 3),
                "us_per_block": round(dt * 1e6 / n_mb, 2),
                "tf_s": round(2 * MP * N * K / dt / 1e12, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"impl": name, "error": str(e)[:160]}),
                  flush=True)

    for pname, pat in pats.items():
        eid = jnp.asarray(pat)
        run(f"grouped_{pname}", lambda xq, xs, c, s, eid=eid:
            w4a8_grouped_matmul(xq, xs, c, s, eid, group=128,
                                out_dtype=jnp.bfloat16))
    # floor: static single-expert mtiled kernel on the same rows
    run("mtiled_floor", lambda xq, xs, c, s:
        w4a8_matmul_planes_mtiled(xq, xs, c[0], s[0], group=128))


if __name__ == "__main__":
    main()
