"""MoE MLP layer cost, re-measured with the CORRECT salted protocol
(kernel_chain_timeit) — moe_gather_probe's warm-then-repeat timeit was
exposed to the dedup/load artifact, so the r5 REPORT magnitudes (dense
10.2 ms/layer at decode n, pgather 1.29x, batch dense 156-526 ms) need
re-pinning.  E=64, I=2048, H=4096, top_k=6 stacked int4 experts.

impls: dense  = apply_qlinear_stacked (Pallas stacked kernel at n<=256,
                XLA dequant fallback above — the engine's pre-grouped
                batch path)
       grouped = capacity-grouped batch kernel path (moe_mlp_grouped)
       pgather = scalar-prefetch gathered kernel (decode regime)"""

import functools
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from kernel_chain_timeit import timeit_salted

E = int(os.environ.get("E", "64"))
I = int(os.environ.get("MOE_I", "2048"))
H = int(os.environ.get("H", "4096"))
TOPK = int(os.environ.get("TOPK", "6"))


def main():
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving.quantized_model import (
        apply_qlinear_gathered, apply_qlinear_stacked, moe_mlp_grouped,
        quantize_linear_stacked)

    key = jax.random.PRNGKey(0)
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=128)
    k1, k2, k3 = jax.random.split(key, 3)
    gate = quantize_linear_stacked(
        jax.random.normal(k1, (E, I, H), jnp.float32) * 0.02, spec)
    up = quantize_linear_stacked(
        jax.random.normal(k2, (E, I, H), jnp.float32) * 0.02, spec)
    down = quantize_linear_stacked(
        jax.random.normal(k3, (E, H, I), jnp.float32) * 0.02, spec)

    def dense_step(W, x, topi, topw):
        gate, up, down = W
        n = x.shape[0]

        def blk(xb, wb):
            g = apply_qlinear_stacked(gate, xb)
            u = apply_qlinear_stacked(up, xb)
            mid = jax.nn.silu(g) * u
            d = apply_qlinear_stacked(down, mid.astype(jnp.bfloat16),
                                      pair=True)
            return jnp.einsum("enh,ne->nh", d, wb)

        w_full = jnp.zeros((n, E), jnp.float32)
        w_full = w_full.at[jnp.arange(n)[:, None], topi].set(topw)
        NB = 2048
        if n > NB and n % NB == 0:
            return jax.lax.map(
                lambda a: blk(*a),
                (x.reshape(n // NB, NB, H),
                 w_full.reshape(n // NB, NB, E))).reshape(n, H)
        return blk(x, w_full)

    def grouped_step(W, x, topi, topw):
        gate, up, down = W
        entry = {"mlp.gate": gate, "mlp.up": up, "mlp.down": down}
        return moe_mlp_grouped(entry, x, topi, topw, "silu")

    def pgather_step(W, x, topi, topw):
        from lightcompress_tpu.ops.pallas_matmul import (
            quantize_act_per_token, w4a8_gathered_matmul)

        gate, up, down = W
        n = x.shape[0]
        n_sel = n * TOPK
        e_flat = topi.reshape(-1).astype(jnp.int32)
        t_flat = jnp.repeat(jnp.arange(n, dtype=jnp.int32), TOPK)
        xq, xs = quantize_act_per_token(x)
        g = w4a8_gathered_matmul(xq, xs, gate.codes, gate.scales, e_flat,
                                 t_flat, group=128)
        u = w4a8_gathered_matmul(xq, xs, up.codes, up.scales, e_flat,
                                 t_flat, group=128)
        mid = jax.nn.silu(g) * u
        mq, ms = quantize_act_per_token(mid.astype(jnp.bfloat16))
        d = w4a8_gathered_matmul(
            mq, ms, down.codes, down.scales, e_flat,
            jnp.arange(n_sel, dtype=jnp.int32), group=128)
        return jnp.einsum("nkh,nk->nh", d.reshape(n, TOPK, H), topw)

    table = {"dense": dense_step, "grouped": grouped_step,
             "pgather": pgather_step}
    rng = np.random.RandomState(0)
    W = (gate, up, down)
    cases = os.environ.get(
        "CASES",
        "4:dense,4:pgather,32:dense,512:dense,512:grouped,"
        "2048:dense,2048:grouped,8192:dense,8192:grouped").split(",")
    for case in cases:
        ns, impl = case.split(":")
        n = int(ns)
        topi = jnp.asarray(
            np.stack([rng.choice(E, TOPK, replace=False)
                      for _ in range(n)]), jnp.int32)
        topw = jnp.asarray(rng.rand(n, TOPK) / TOPK, jnp.float32)
        x0 = jax.random.normal(key, (n, H), jnp.bfloat16)
        f = table[impl]

        @functools.partial(jax.jit, static_argnames=("iters",))
        def chain(salt, W, iters, f=f, x0=x0, topi=topi, topw=topw):
            def body(i, xx):
                y = f(W, xx, topi, topw)
                return (y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
                        ).astype(jnp.bfloat16)
            return jnp.sum(
                jax.lax.fori_loop(0, iters, body,
                                  (x0 + salt).astype(jnp.bfloat16))[:1])

        iters = 20 if n <= 2048 else 8
        try:
            dt = timeit_salted(
                lambda s, it: chain(s, W, iters=it), iters)
            print(json.dumps({"n": n, "impl": impl,
                              "ms": round(dt * 1e3, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"n": n, "impl": impl,
                              "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
