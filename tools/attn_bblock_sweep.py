"""Sweep decode_attention_kv8 b_block (batch rows per grid step) at bench
shapes; chained-iteration protocol. One compile per variant (1-6 min each)."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from lightcompress_tpu.ops.pallas_attention import decode_attention_kv8

B, H, G, S, D = 32, 8, 4, 1024, 128
ITERS = 200


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.bfloat16)
    k8 = jnp.asarray(rng.randint(-127, 127, (B, H, S, D)), jnp.int8)
    v8 = jnp.asarray(rng.randint(-127, 127, (B, H, S, D)), jnp.int8)
    ks = jnp.full((B, H, S), 0.01, jnp.float32)
    vs = jnp.full((B, H, S), 0.01, jnp.float32)
    kv_bytes = 2 * B * H * S * (D + 4)

    blocks = [int(x) for x in os.environ.get("BBLOCKS", "2,8,16").split(",")]
    for bb in blocks:
        @jax.jit
        def run(q0):
            def body(i, qq):
                ctx = decode_attention_kv8(qq, k8, ks, v8, vs, b_block=bb)
                ctx = ctx * jax.lax.rsqrt(jnp.mean(ctx * ctx) + 1e-6)
                return ctx.astype(q0.dtype)
            return jax.lax.fori_loop(0, ITERS, body, q0)

        try:
            float(jnp.sum(run(q)))
            t0 = time.perf_counter()
            float(jnp.sum(run(q)))
            per = (time.perf_counter() - t0) / ITERS
            print(json.dumps({"b_block": bb, "us": round(per * 1e6, 1),
                              "gbps": round(kv_bytes / per / 1e9, 1)}),
                  flush=True)
        except Exception as e:  # VMEM overflow etc.
            print(json.dumps({"b_block": bb, "error": str(e)[:120]}),
                  flush=True)


if __name__ == "__main__":
    main()
