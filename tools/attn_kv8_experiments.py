"""Decode-attention variants at bench shapes (B=32, 8 KV heads, S=1024,
D=128, 32 layers' worth of traffic simulated by 1 layer x iters):
(a) bf16 KV baseline, (b) int8 KV with astype-into-dot,
(c) int8 KV with int8 q (int32 MXU scores) + int8 probs (int32 ctx).
500 chained iters; carry feeds q so nothing hoists."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, G, S, D = 32, 8, 4, 1024, 128
ITERS = 300


def timeit(name, f, *args):
    float(jnp.sum(f(*args)))
    t0 = time.perf_counter()
    float(jnp.sum(f(*args)))
    per = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"variant": name, "us": round(per * 1e6, 1)}),
          flush=True)


def chain(attn):
    @jax.jit
    def run(q0, *caches):
        def body(i, q):
            ctx = attn(q, *caches)  # (B, H, G, D)
            ctx = ctx * jax.lax.rsqrt(jnp.mean(ctx * ctx) + 1e-6)
            return ctx.astype(q0.dtype)
        return jax.lax.fori_loop(0, ITERS, body, q0)
    return run


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.bfloat16)
    kbf = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    vbf = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k8 = jnp.asarray(rng.randint(-127, 127, (B, H, S, D)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 127, (B, H, S, D)), jnp.int8)
    ks = jnp.full((B, H, S), 0.01, jnp.float32)
    vs = jnp.full((B, H, S), 0.01, jnp.float32)

    def attn_bf16(qq, k, v):
        sc = jnp.einsum("bhgd,bhsd->bhgs", qq, k) * (D ** -0.5)
        p = jax.nn.softmax(sc.astype(jnp.float32), -1).astype(jnp.bfloat16)
        return jnp.einsum("bhgs,bhsd->bhgd", p, v)

    def attn_i8_convert(qq, k, v, kss, vss):
        sc = jnp.einsum("bhgd,bhsd->bhgs", qq, k.astype(jnp.bfloat16))
        sc = sc * kss[:, :, None, :] * (D ** -0.5)
        p = jax.nn.softmax(sc.astype(jnp.float32), -1)
        pv = (p * vss[:, :, None, :]).astype(jnp.bfloat16)
        return jnp.einsum("bhgs,bhsd->bhgd", pv, v.astype(jnp.bfloat16))

    def attn_i8_full(qq, k, v, kss, vss):
        # q -> int8 per (b,h,g)
        amax = jnp.max(jnp.abs(qq.astype(jnp.float32)), -1, keepdims=True)
        qs = jnp.maximum(amax, 1e-8) / 127.0
        q8 = jnp.clip(jnp.round(qq.astype(jnp.float32) / qs),
                      -127, 127).astype(jnp.int8)
        sc = jax.lax.dot_general(
            q8, k, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)  # (B,H,G,S)
        sc = sc.astype(jnp.float32) * qs * kss[:, :, None, :] * (D ** -0.5)
        p = jax.nn.softmax(sc, -1)
        # probs -> int8 (127 levels; max prob <= 1)
        p8 = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
        ctx = jax.lax.dot_general(
            p8, v, (((3,), (2,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.int32)
        return ctx.astype(jnp.float32) * (1.0 / 127.0) * \
            vss.mean(-1)[:, :, None, None]  # scale approx for timing only

    timeit("bf16", chain(attn_bf16), q, kbf, vbf)
    timeit("i8_convert", chain(attn_i8_convert), q, k8, v8, ks, vs)
    timeit("i8_full", chain(attn_i8_full), q, k8, v8, ks, vs)


if __name__ == "__main__":
    main()
