"""Isolate the engine's per-decode-step cost: time _decode_chunk_jit at
two chunk lengths and difference ((t_hi - t_lo) / (n_hi - n_lo)) to cancel
dispatch latency.  Compares against the bare decode-stack floor
(bench.py: ~9.6ms/step at B=32; here S slots)."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp



def main():
    sys.path.insert(0, "/root/repo/tools")
    from bench_engine import make_weights
    from lightcompress_tpu.serving import LLMEngine, SamplingParams

    SLOTS = int(os.environ.get("SLOTS", "16"))
    ATTN = os.environ.get("ATTN", "auto")
    T = int(os.environ.get("T", "256"))
    KV = int(os.environ.get("KV", "8"))
    PC = int(os.environ.get("PREFILL_CHUNK", "0"))  # 0 = whole-prompt
    sw = make_weights()
    eng = LLMEngine(sw, max_slots=SLOTS, max_len=T + 80, kv_bits=KV,
                    prefill_buckets=((PC, T) if PC else (T,)),
                    decode_chunk=16, attn_impl=ATTN,
                    prefill_chunk=(PC or None))
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 32000, size=(T,)).tolist()
               for _ in range(SLOTS)]
    sp = SamplingParams(max_new_tokens=4, temperature=0.0)
    warm = ([p[:PC] for p in prompts[:2]] if PC else prompts)
    eng.generate(warm, sp)  # prefill + tiny decode (compiles)

    # slots are retired now; re-prefill to refill.  (At near-capacity
    # shapes skip the second warmup cycle: reset() allocates a fresh
    # multi-GB cache and the tunneled runtime frees the old one lazily —
    # two caches alive transiently OOM at 8k ctx.)
    eng.reset()
    if not PC:
        eng.generate(warm,
                     SamplingParams(max_new_tokens=1, temperature=0.0))
        eng.reset()

    # manual: prefill via engine internals, then time raw chunk calls
    for slot, p in enumerate(prompts):
        if PC:
            # long prompts: chunked prefill (whole-prompt SDPA scores are
            # O(T^2) f32 — 8GB at T=8192)
            for off in range(0, len(p), PC):
                chunk = p[off:off + PC]
                ids = np.zeros((1, PC), np.int32)
                ids[0, :len(chunk)] = chunk
                eng.cache, eng.lengths, logits = eng._prefill_chunk_jit(
                    eng.sw, eng.cache, eng.lengths, jnp.asarray(ids),
                    jnp.asarray(slot), jnp.asarray(len(chunk)), T=PC)
            continue
        ids = np.zeros((1, T), np.int32)
        ids[0, :len(p)] = p
        eng.cache, eng.lengths, logits = eng._prefill_jit(
            eng.sw, eng.cache, eng.lengths, jnp.asarray(ids),
            jnp.asarray(slot), jnp.asarray(len(p)), T=T)
    active = jnp.ones((SLOTS,), bool)
    cur = jnp.ones((SLOTS,), jnp.int32)

    def run(n):
        out = eng._decode_chunk_jit(eng.sw, eng.cache, eng.lengths, cur,
                                    active, eng.key, n_steps=n, sp=sp)
        eng.cache = out[0]  # keep donation chain valid
        float(jnp.sum(out[4]))
        return out

    for n in (8, 48):
        run(n)  # compile
    t0 = time.perf_counter()
    run(8)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(48)
    t_hi = time.perf_counter() - t0
    per = (t_hi - t_lo) / 40
    print(json.dumps({"per_step_ms": round(per * 1e3, 2),
                      "slots": SLOTS, "attn": ATTN, "T": T,
                      "tok_per_s": round(SLOTS / per, 1)}), flush=True)


if __name__ == "__main__":
    main()
