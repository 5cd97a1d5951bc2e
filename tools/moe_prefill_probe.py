"""Engine-level MoE PREFILL cost: serial slot prefills through the real
engine with the batch MoE path selected by LCTPU_MOE_GROUPED (0 = dense
XLA fallback, the pre-r5 state; auto/1 = capacity-grouped kernel).

Kernel-chain probes overstate the grouped cost (a ~95 ms per-call term
appears only when the pallas_call sits inside a device fori_loop —
mtiled_overhead probe); the engine's prefill is straight-line, so this
is the honest context.  Differencing over call counts cancels the
tunnel's fixed per-dispatch latency.  Run twice with different env."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

SLOTS = int(os.environ.get("SLOTS", "16"))
T = int(os.environ.get("T", "1024"))
LAYERS = int(os.environ.get("LAYERS", "8"))
MOE_I = int(os.environ.get("MOE_I", "2048"))
TOPK = int(os.environ.get("TOPK", "6"))


def make_model():
    from lightcompress_tpu.models import Llama, init_params
    from lightcompress_tpu.models.arch import ArchSpec, MoESpec

    arch = ArchSpec(
        family="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=14336, num_layers=LAYERS, num_heads=32,
        num_kv_heads=8, head_dim=128, act_fn="silu",
        tie_word_embeddings=False,
        moe=MoESpec(num_experts=64, top_k=TOPK,
                    moe_intermediate_size=MOE_I, gating="softmax",
                    norm_topk_prob=True),
        dtype=jnp.bfloat16,
    )
    return Llama(arch, init_params(jax.random.PRNGKey(0), arch))


def main():
    from lightcompress_tpu.quant import QuantSpec
    from lightcompress_tpu.serving import (LLMEngine, SamplingParams,
                                           build_serving_weights)

    model = make_model()
    sw = build_serving_weights(
        model, QuantSpec(bit=4, symmetric=False, granularity="per_group",
                         group_size=128), act_bits=8)
    del model
    assert sw.blocks[0]["mlp.gate"].layout == "stacked_planes"
    eng = LLMEngine(sw, max_slots=SLOTS, max_len=T + 16, kv_bits=8,
                    prefill_buckets=(T,))
    rng = np.random.RandomState(0)
    ids = np.zeros((1, T), np.int32)
    ids[0] = rng.randint(1, 32000, size=(T,))

    def prefill_n(n):
        for slot in range(n):
            eng.cache, eng.lengths, _ = eng._prefill_jit(
                eng.sw, eng.cache, eng.lengths, jnp.asarray(ids),
                jnp.asarray(slot % SLOTS), jnp.asarray(T), T=T)
        jax.block_until_ready(eng.lengths)
        float(jnp.sum(eng.lengths))

    prefill_n(2)   # compile + warm
    t0 = time.perf_counter()
    prefill_n(4)
    lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    prefill_n(12)
    hi = time.perf_counter() - t0
    per = (hi - lo) / 8
    print(json.dumps({
        "grouped_env": os.environ.get("LCTPU_MOE_GROUPED", "auto"),
        "prefill_ms_per_call": round(per * 1e3, 1),
        "ms_per_layer": round(per * 1e3 / LAYERS, 2),
        "tokens": T, "layers": LAYERS, "moe_i": MOE_I, "topk": TOPK,
        "prefill_tok_s": round(T / per, 1)}), flush=True)


if __name__ == "__main__":
    main()
