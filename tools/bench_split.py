"""Decode-step traffic split: time the qlinear stack and the attention part
separately at bench.py shapes, plus the Pallas int8-KV attention kernel.
Batched into one script (remote Mosaic compiles are 1-6 min each).

Protocol: on-device fori_loop chains + host scalar read (CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

HIDDEN, INTER = 4096, 14336
N_HEADS, N_KV, HEAD_DIM = 32, 8, 128
LAYERS, BATCH, CTX, GROUP = 32, 32, 1024, 128
N_ITERS = 20


def timed(step, x0, label, per_call_bytes):
    out = step(x0)
    _ = float(jnp.sum(out))  # compile+drain
    t0 = time.time()
    out = step(out)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / N_ITERS
    bw = per_call_bytes / dt / 1e9
    print(f"{label:34s} {dt*1e3:8.3f} ms/step  {bw:7.1f} GB/s")
    return dt


def main():
    import os

    import numpy as np

    from bench import make_layer_qweights

    stages = os.environ.get("STAGES", "123")

    key = jax.random.PRNGKey(0)
    layers = [make_layer_qweights(k) for k in jax.random.split(key, LAYERS)]
    weight_bytes = sum(
        int(np.prod(lw[n].codes.shape)) * 4 + lw[n].scales.size * 4
        + (lw[n].zeros.size * 4 if lw[n].zeros is not None else 0)
        for lw in layers for n in lw)
    x = jax.random.normal(key, (BATCH, HIDDEN), jnp.bfloat16)

    # --- 1. qlinear-only stack (all 7 linears x 32 layers, W4A8)
    from lightcompress_tpu.ops import qlinear_apply

    def lin_step(layers, x0):
        def body(i, xx):
            h = xx
            for lw in layers:
                if "qkv" in lw:  # BENCH_FUSED=1 layout
                    qkv = qlinear_apply(h, lw["qkv"], act_bits=8)
                    q = qkv[:, :N_HEADS * HEAD_DIM]
                    kv_mean = jnp.mean(qkv[:, N_HEADS * HEAD_DIM:])
                    o = qlinear_apply(q, lw["o"], act_bits=8)
                    gu = qlinear_apply(h, lw["gateup"], act_bits=8)
                    g, u = gu[:, :INTER], gu[:, INTER:]
                else:
                    q = qlinear_apply(h, lw["q"], act_bits=8)
                    k = qlinear_apply(h, lw["k"], act_bits=8)
                    v = qlinear_apply(h, lw["v"], act_bits=8)
                    kv_mean = jnp.mean(k) + jnp.mean(v)
                    o = qlinear_apply(q, lw["o"], act_bits=8)
                    g = qlinear_apply(h, lw["gate"], act_bits=8)
                    u = qlinear_apply(h, lw["up"], act_bits=8)
                d = qlinear_apply(jax.nn.silu(g) * u, lw["down"], act_bits=8)
                h = h + o + d + kv_mean
                h = h * jax.lax.rsqrt(jnp.mean(h * h, -1, keepdims=True)
                                      + 1e-6)
            return h

        return jax.lax.fori_loop(0, N_ITERS, body, x0)

    if "1" in stages:
        # layers passed as jit ARGS (a closure captures 3.9GB of constants
        # at lowering and kills the remote compile server)
        jl = jax.jit(lin_step)
        timed(lambda x0: jl(layers, x0), x, "qlinear stack (W4A8)",
              weight_bytes)

    # --- 2. XLA einsum int8-KV attention only (32 layers)
    kq = [jnp.zeros((BATCH, N_KV, CTX, HEAD_DIM), jnp.int8)
          for _ in range(LAYERS)]
    vq = [jnp.zeros((BATCH, N_KV, CTX, HEAD_DIM), jnp.int8)
          for _ in range(LAYERS)]
    ks = [jnp.full((BATCH, N_KV, CTX), 0.01, jnp.float32)
          for _ in range(LAYERS)]
    vs = [jnp.full((BATCH, N_KV, CTX), 0.01, jnp.float32)
          for _ in range(LAYERS)]
    kv_bytes = 2 * LAYERS * BATCH * N_KV * CTX * (HEAD_DIM + 4)
    G = N_HEADS // N_KV
    q0 = jax.random.normal(key, (BATCH, N_KV, G, HEAD_DIM), jnp.bfloat16)

    def xla_attn_step(kq, vq, ks, vs, q0):
        def body(i, qq):
            acc = qq
            for li in range(LAYERS):
                sc = jnp.einsum("bkgd,bksd->bkgs", acc,
                                kq[li].astype(jnp.bfloat16))
                sc = sc * ks[li][:, :, None, :] * (HEAD_DIM ** -0.5)
                p = jax.nn.softmax(sc.astype(jnp.float32), -1)
                pv = (p * vs[li][:, :, None, :]).astype(jnp.bfloat16)
                ctx = jnp.einsum("bkgs,bksd->bkgd", pv,
                                 vq[li].astype(jnp.bfloat16))
                acc = (acc + ctx.astype(acc.dtype)) * 0.5
            return acc

        return jax.lax.fori_loop(0, N_ITERS, body, q0)

    if "2" in stages:
        ja = jax.jit(xla_attn_step)
        timed(lambda q: ja(kq, vq, ks, vs, q), q0,
              "XLA einsum int8-KV attn", kv_bytes)

    # --- 3. Pallas decode_attention_kv8 only (32 layers)
    from lightcompress_tpu.ops.pallas_attention import decode_attention_kv8

    def pl_attn_step(kq, vq, ks, vs, q0):
        def body(i, qq):
            acc = qq
            for li in range(LAYERS):
                ctx = decode_attention_kv8(acc, kq[li], ks[li], vq[li],
                                           vs[li])
                acc = (acc + ctx.astype(acc.dtype)) * 0.5
            return acc

        return jax.lax.fori_loop(0, N_ITERS, body, q0)

    if "3" in stages:
        jp = jax.jit(pl_attn_step)
        timed(lambda q: jp(kq, vq, ks, vs, q), q0,
              "Pallas int8-KV attn", kv_bytes)


if __name__ == "__main__":
    main()
