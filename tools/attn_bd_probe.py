"""On-chip probe: block-diagonal GQA decode-attention kernel vs the XLA
einsum path at bench shapes (B=32, H_kv=8, G=4, S=1024, D=128).

Chained fori_loop + iter-count differencing (axon tunnel protocol).
Bytes/iter = 64MB KV slab + 1MB scales; XLA reference measured
~135 us/layer (~513 GB/s) in round 2.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from lightcompress_tpu.ops.pallas_attention import (
    bd_merge_new_token, decode_attention_bd,
)

B, H, G, S, D = 32, 8, 4, 1024, 128
ITERS, ITERS_HI = 50, 250
NBYTES = 2 * B * S * H * D + 2 * B * H * S * 2


def timeit(label, run, x0):
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
                          "GBps": round(NBYTES / per / 1e9, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": label, "error": str(e)[:400]}),
              flush=True)


def main():
    rng = np.random.RandomState(0)
    kt = jnp.asarray(rng.randint(-127, 128, (B, H * D, S)), jnp.int8)
    vt = jnp.asarray(rng.randint(-127, 128, (B, S, H * D)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.bfloat16)
    vs = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.bfloat16)
    kn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    vn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    kns = jnp.asarray(rng.rand(B, H) * 0.01 + 0.005, jnp.bfloat16)
    vns = jnp.asarray(rng.rand(B, H) * 0.01 + 0.005, jnp.bfloat16)
    q0 = jnp.asarray(rng.randn(B, H, G, D), jnp.bfloat16)

    variants = os.environ.get("VARIANTS", "bd,bd8,xla").split(",")

    for bb, name in ((1, "bd1"), (2, "bd2"), (4, "bd"), (8, "bd8"),
                     (16, "bd16")):
        if name not in variants:
            continue

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_bd(kt, ks, vt, vs, kn, kns, vn, vns, q0, iters, bb=bb):
            def body(i, q):
                qctx = decode_attention_bd(q, kt, ks, vt, vs, b_block=bb)
                o = bd_merge_new_token(q, qctx, kn, vn, kns, vns, D ** -0.5)
                o = o * jax.lax.rsqrt(jnp.mean(o * o) + 1e-6)
                return o.astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, q0)

        timeit(name, lambda a, it, bb=bb: run_bd(
            kt, ks, vt, vs, kn, kns, vn, vns, a, iters=it), q0)

    if "xla" in variants:
        # the bench's XLA concat path on (B, H, S, D) caches
        kc0 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)
        vc0 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run_xla(kc0, ks, vc0, vs, kn, kns, vn, vns, q0, iters):
            def body(i, q):
                kc = jnp.concatenate([kc0, kn[:, :, None, :]], 2)
                vc = jnp.concatenate([vc0, vn[:, :, None, :]], 2)
                ksc = jnp.concatenate([ks, kns[..., None]], -1)
                vsc = jnp.concatenate([vs, vns[..., None]], -1)
                qg = q.reshape(B, H, G, D).astype(jnp.bfloat16)
                sc = jnp.einsum("bkgd,bksd->bkgs", qg,
                                kc.astype(jnp.bfloat16))
                sc = sc * ksc[:, :, None, :].astype(jnp.float32) * \
                    (D ** -0.5)
                probs = jax.nn.softmax(sc.astype(jnp.float32), -1)
                pv = (probs * vsc[:, :, None, :].astype(jnp.float32)
                      ).astype(jnp.bfloat16)
                o = jnp.einsum("bkgs,bksd->bkgd", pv,
                               vc.astype(jnp.bfloat16))
                o = o * jax.lax.rsqrt(jnp.mean(o * o) + 1e-6)
                return o.astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, q0)

        timeit("xla", lambda a, it: run_xla(
            kc0, ks, vc0, vs, kn, kns, vn, vns, a, iters=it), q0)


if __name__ == "__main__":
    main()
