"""MoE serving MLP: dense all-expert combine vs small-batch gathered
path, on-chip (VERDICT r4 #7).  DeepSeek-ish stacked experts (E=64,
moe_inter=2048 (planes-kernel eligible), H=4096 — routed-expert shapes of a V2-Lite-class block),
measured at n in {4, 8, 32} active tokens with the chained-iteration
protocol.  Prints one JSON line per (n, impl)."""

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
I = int(os.environ.get("MOE_I", "2048"))
H = int(os.environ.get("H", "4096"))
TOPK = int(os.environ.get("TOPK", "6"))
ITERS = int(os.environ.get("ITERS", "30"))


def main():
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving.quantized_model import (
        apply_qlinear_gathered, apply_qlinear_stacked,
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
    bytes_all = sum(int(np.prod(q.codes.shape)) * q.codes.dtype.itemsize
                    for q in (gate, up, down))

    # weights ride as traced jit ARGS (closure capture ships them as
    # constants to the remote compiler -> HTTP 413)
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
        NB = 2048  # the engine's LCTPU_MOE_DENSE_BLOCK transient bound
        if n > NB and n % NB == 0:
            return jax.lax.map(
                lambda a: blk(*a),
                (x.reshape(n // NB, NB, H),
                 w_full.reshape(n // NB, NB, E))).reshape(n, H)
        return blk(x, w_full)

    def grouped_step(W, x, topi, topw):
        # capacity-grouped batch kernel (r5): sorted selections,
        # top_k/E of the dense MXU passes.  NOTE the grouping indices
        # depend only on topi (loop-invariant in the chain) so XLA
        # hoists them — their cost (an argsort of n*top_k int32) is
        # measured separately below as group_us.
        from lightcompress_tpu.serving.quantized_model import (
            moe_mlp_grouped)

        gate, up, down = W
        entry = {"mlp.gate": gate, "mlp.up": up, "mlp.down": down}
        return moe_mlp_grouped(entry, x, topi, topw, "silu")

    def pgather_step(W, x, topi, topw):
        # scalar-prefetch gathered kernel (r5): selected tiles only
        from lightcompress_tpu.ops.pallas_matmul import (
            quantize_act_per_token, w4a8_gathered_matmul)

        gate, up, down = W
        n = x.shape[0]
        n_sel = n * TOPK
        e_flat = topi.reshape(-1).astype(jnp.int32)
        t_flat = jnp.repeat(jnp.arange(n, dtype=jnp.int32), TOPK)
        xq, xs = quantize_act_per_token(x)
        g = w4a8_gathered_matmul(xq, xs, gate.codes, gate.scales, e_flat,
                                 t_flat, group=gate.group_size)
        u = w4a8_gathered_matmul(xq, xs, up.codes, up.scales, e_flat,
                                 t_flat, group=up.group_size)
        mid = jax.nn.silu(g) * u
        mq, ms = quantize_act_per_token(mid.astype(jnp.bfloat16))
        d = w4a8_gathered_matmul(
            mq, ms, down.codes, down.scales, e_flat,
            jnp.arange(n_sel, dtype=jnp.int32), group=down.group_size)
        return jnp.einsum("nkh,nk->nh", d.reshape(n, TOPK, H), topw)

    def gather_step(W, x, topi, topw):
        gate, up, down = W
        n = x.shape[0]
        y = jnp.zeros((n, H), jnp.float32)
        for k in range(TOPK):
            e = topi[:, k]
            g = apply_qlinear_gathered(gate, x, e)
            u = apply_qlinear_gathered(up, x, e)
            mid = jax.nn.silu(g) * u
            y = y + topw[:, k:k + 1] * apply_qlinear_gathered(
                down, mid.astype(jnp.bfloat16), e)
        return y

    rng = np.random.RandomState(0)
    for n in [int(v) for v in os.environ.get("NS", "4,8,32").split(",")]:
        topi = jnp.asarray(
            np.stack([rng.choice(E, TOPK, replace=False)
                      for _ in range(n)]), jnp.int32)
        topw = jnp.asarray(rng.rand(n, TOPK) / TOPK, jnp.float32)
        x0 = jax.random.normal(key, (n, H), jnp.bfloat16)
        W = (gate, up, down)
        impls = os.environ.get("IMPLS", "dense,gather").split(",")
        table = {"dense": dense_step, "gather": gather_step,
                 "pgather": pgather_step, "grouped": grouped_step}
        for name, f in [(k, table[k]) for k in impls]:

            # salted protocol (kernel_chain_timeit): the original
            # warm-then-repeat form was exposed to the relay's result
            # dedup + executable-load artifacts (REPORT r5 session-2)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from kernel_chain_timeit import timeit_salted

            @functools.partial(jax.jit, static_argnames=("iters",))
            def chain(salt, W, iters, f=f, x0=x0, topi=topi, topw=topw):
                def body(i, xx):
                    y = f(W, xx, topi, topw)
                    return (y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-6)
                            ).astype(jnp.bfloat16)
                return jnp.sum(jax.lax.fori_loop(
                    0, iters, body,
                    (x0 + salt).astype(jnp.bfloat16))[:1])

            try:
                dt = timeit_salted(
                    lambda s, it: chain(s, W, iters=it), ITERS)
                used = (bytes_all if name == "dense"
                        else bytes_all * n * TOPK / E)
                print(json.dumps({
                    "n": n, "impl": name, "us": round(dt * 1e6, 1),
                    "eff_gbs": round(min(used, bytes_all) / dt / 1e9, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"n": n, "impl": name,
                                  "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
