"""On-chip A/B of decode-attention implementations at bench shapes
(B=32, H_kv=8, G=4, S=1024, D=128), all with int8 KV + bf16 scales:

  xla       : einsum with astype-into-bf16-dot (bench.py default)
  i8full    : ops.scaled_matmul.int8_decode_attention (XLA int8 dots)
  pl_bf16   : round-1 pallas kernel (b_block=4, in-kernel bf16 upcasts)
  pl_i8_32  : new decode_attention_i8, h_block=32 (4.2MB KV DMA blocks)
  pl_i8_64  : h_block=64 (8.4MB blocks)
  pl_i8_app : append variant — read-only cache + fresh token in-register

Protocol: chained fori_loop iterations feeding q, host scalar drain
(CLAUDE.md axon rules).  One compile per variant; VARIANTS env filters.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

B, H, G, S, D = 32, 8, 4, 1024, 128
ITERS = 200
KV_GB = 2 * B * H * S * (D + 2) / 1e9  # int8 codes + bf16 scales


def chain(attn):
    @jax.jit
    def run(q0, *caches):
        def body(i, q):
            ctx = attn(q.astype(jnp.bfloat16), *caches)
            ctx = ctx * jax.lax.rsqrt(jnp.mean(ctx * ctx) + 1e-6)
            return ctx.astype(q0.dtype)
        return jax.lax.fori_loop(0, ITERS, body, q0)
    return run


def timeit(name, run, q, *caches):
    try:
        float(jnp.sum(run(q, *caches)))
        t0 = time.perf_counter()
        float(jnp.sum(run(q, *caches)))
        per = (time.perf_counter() - t0) / ITERS
        print(json.dumps({
            "variant": name, "us_per_layer": round(per * 1e6, 1),
            "GBps": round(KV_GB / per, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name,
                          "error": str(e)[:300]}), flush=True)


def main():
    variants = os.environ.get(
        "VARIANTS", "xla,i8full,pl_i8_32,pl_i8_64,pl_i8_app").split(",")
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.bfloat16)
    k8 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 128, (B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.bfloat16)
    vs = jnp.asarray(rng.rand(B, H, S) * 0.01 + 0.005, jnp.bfloat16)
    kn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    vn = jnp.asarray(rng.randint(-127, 128, (B, H, D)), jnp.int8)
    kns = jnp.full((B, H), 0.01, jnp.bfloat16)
    vns = jnp.full((B, H), 0.01, jnp.bfloat16)

    if "xla" in variants:
        def xla_attn(qq, k8, ks, v8, vs):
            sc = jnp.einsum("bkgd,bksd->bkgs", qq, k8.astype(jnp.bfloat16))
            sc = sc * ks.astype(jnp.float32)[:, :, None, :] * (D ** -0.5)
            p = jax.nn.softmax(sc.astype(jnp.float32), -1)
            pv = (p * vs.astype(jnp.float32)[:, :, None, :]
                  ).astype(jnp.bfloat16)
            return jnp.einsum("bkgs,bksd->bkgd", pv, v8.astype(jnp.bfloat16))
        timeit("xla", chain(xla_attn), q, k8, ks, v8, vs)

    if "i8full" in variants:
        from lightcompress_tpu.ops.scaled_matmul import int8_decode_attention
        timeit("i8full", chain(int8_decode_attention), q, k8, ks, v8, vs)

    if "pl_bf16" in variants:
        from lightcompress_tpu.ops.pallas_attention import (
            decode_attention_kv8,
        )
        timeit("pl_bf16", chain(decode_attention_kv8), q,
               k8, ks.astype(jnp.float32), v8, vs.astype(jnp.float32))

    from lightcompress_tpu.ops.pallas_attention import decode_attention_i8

    if "pl_i8_32" in variants:
        def a32(qq, *c):
            return decode_attention_i8(qq, *c, h_block=32)
        timeit("pl_i8_32", chain(a32), q, k8, ks, v8, vs)

    if "pl_i8_64" in variants:
        def a64(qq, *c):
            return decode_attention_i8(qq, *c, h_block=64)
        timeit("pl_i8_64", chain(a64), q, k8, ks, v8, vs)

    if "pl_i8_app" in variants:
        def aapp(qq, k8, ks, v8, vs, kn, kns, vn, vns):
            return decode_attention_i8(qq, k8, ks, v8, vs,
                                       kn, kns, vn, vns, h_block=32)
        timeit("pl_i8_app", chain(aapp), q, k8, ks, v8, vs, kn, kns, vn, vns)


if __name__ == "__main__":
    main()
