"""Time-to-first-token probe (VERDICT r2 #3): admit 8 simultaneous
256-token prompts and compare ONE batched prefill dispatch
(_prefill_batch_jit, the engine's non-paged admission path since r3)
against 8 serial per-slot dispatches (_prefill_jit, the r2 behavior).

Each timed call uses distinct prompt content (the axon relay dedup-caches
identical executions).  Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from bench_engine import make_weights
    from lightcompress_tpu.serving import LLMEngine

    N = int(os.environ.get("N", "8"))
    T = int(os.environ.get("T", "256"))
    sw = make_weights()
    eng = LLMEngine(sw, max_slots=N, max_len=T + 64, kv_bits=8,
                    prefill_buckets=(T,))

    rng = np.random.RandomState(0)

    def prompts():
        return rng.randint(1, 32000, size=(N, T)).astype(np.int32)

    slots = jnp.arange(N, dtype=jnp.int32)
    tlens = jnp.full((N,), T, jnp.int32)

    # compile both paths
    ids = prompts()
    eng.cache, eng.lengths, _ = eng._prefill_batch_jit(
        eng.sw, eng.cache, eng.lengths, jnp.asarray(ids), slots, tlens, T=T)
    eng.cache, eng.lengths, lg = eng._prefill_jit(
        eng.sw, eng.cache, eng.lengths, jnp.asarray(ids[:1]),
        jnp.asarray(0), jnp.asarray(T), T=T)
    float(jnp.sum(lg))

    # batched: one dispatch admits all N
    ids = prompts()
    t0 = time.perf_counter()
    eng.cache, eng.lengths, last = eng._prefill_batch_jit(
        eng.sw, eng.cache, eng.lengths, jnp.asarray(ids), slots, tlens, T=T)
    float(jnp.sum(last))  # host read = all first-token logits ready
    t_batched = time.perf_counter() - t0

    # serial: N dispatches (the r2 admission loop)
    ids = prompts()
    t0 = time.perf_counter()
    for s in range(N):
        eng.cache, eng.lengths, last = eng._prefill_jit(
            eng.sw, eng.cache, eng.lengths, jnp.asarray(ids[s:s + 1]),
            jnp.asarray(s), jnp.asarray(T), T=T)
        float(jnp.sum(last))
    t_serial = time.perf_counter() - t0

    print(json.dumps({
        "n_prompts": N, "prompt_len": T,
        "ttft_batched_ms": round(t_batched * 1e3, 1),
        "ttft_serial_ms": round(t_serial * 1e3, 1),
        "speedup": round(t_serial / t_batched, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
