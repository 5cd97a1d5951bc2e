"""kv4-vs-kv8 decode-PPL accuracy curve (VERDICT r4 #4).

Runs DecodePerplexityEval with KV-cache hooks that reproduce the serving
engine's EXACT cache numerics (serving/kv_cache.py): kv8 = per-(head,
token) symmetric int8 amax/127 with bf16 scales; kv4 = half-plane nibble
amax/7.  Accuracy is hardware-independent — runs on CPU by default
(KV4PPL_TPU=1 keeps the default backend).  Prints one JSON line per
(ctx, kv_bits) with the PPL and the delta vs the bf16 cache.

The engine's ``kv_bits="auto"`` recipe (kv4 at >=4k ctx) was picked on
throughput; this curve is the accuracy side of that gate."""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np

import jax

if os.environ.get("KV4PPL_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def make_hooks(nb, mode):
    from lightcompress_tpu.serving.kv_cache import (quantize_kv,
                                                    quantize_kv4,
                                                    unpack_kv4)

    def rt8(x):
        q, s = quantize_kv(x)
        return (q.astype(jnp.float32)
                * s[..., None].astype(jnp.float32)).astype(x.dtype)

    def rt4(x):
        p, s = quantize_kv4(x)
        return (unpack_kv4(p)
                * s[..., None].astype(jnp.float32)).astype(x.dtype)

    if mode == 16:
        return None
    rt = rt8 if mode == 8 else rt4
    return [lambda k, v, rt=rt: (rt(k), rt(v)) for _ in range(nb)]


def main():
    from helpers import make_tiny_adapter

    from lightcompress_tpu.eval import DecodePerplexityEval

    ctxs = [int(c) for c in os.environ.get(
        "CTXS", "1024,2048,4096,8192").split(",")]
    model = make_tiny_adapter(seed=7, vocab=256, hidden=64, inter=128,
                              layers=2, heads=4, kv_heads=2)
    rng = np.random.RandomState(0)
    stream = rng.randint(1, 250, size=(1, max(ctxs) + 1)).astype(np.int32)
    for ctx in ctxs:
        base = None
        for bits in (16, 8, 4):
            model.kv_hooks = make_hooks(model.num_blocks, bits)
            ev = DecodePerplexityEval(stream[:, :ctx + 1],
                                      num_eval_tokens=ctx, max_len=ctx + 1)
            ppl = float(ev.eval(model))
            if bits == 16:
                base = ppl
            print(json.dumps({
                "ctx": ctx, "kv_bits": bits, "ppl": round(ppl, 4),
                "delta_pct": round((ppl / base - 1) * 100, 4),
            }), flush=True)
        model.kv_hooks = None


if __name__ == "__main__":
    main()
