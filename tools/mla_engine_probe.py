"""DeepSeek-class MoE+MLA engine decode, on-chip (VERDICT r4 #3 done
criterion): per-step ms of the append-first absorbed-latent path
(default) vs the r4 read_mla-then-concat form (LCTPU_MLA_APPEND=0),
V2-Lite-ish shapes.  Timing = hi-lo chunk differencing like
engine_step_probe."""

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
MOE_I = int(os.environ.get("MOE_I", "1408"))
DENSE_I = int(os.environ.get("DENSE_I", "10944"))
MOE = os.environ.get("MOE", "1") == "1"


def make_model():
    from lightcompress_tpu.models import Llama, init_params
    from lightcompress_tpu.models.arch import ArchSpec, MLASpec, MoESpec

    arch = ArchSpec(
        family="llama", vocab_size=32000, hidden_size=2048,
        intermediate_size=DENSE_I, num_layers=LAYERS, num_heads=16,
        num_kv_heads=16, head_dim=64,  # == qk_rope_head_dim (rope tables)
        act_fn="silu", tie_word_embeddings=False,
        mla=MLASpec(kv_lora_rank=512, qk_rope_head_dim=64,
                    qk_nope_head_dim=128, v_head_dim=128, q_lora_rank=None),
        moe=MoESpec(num_experts=64, top_k=6, moe_intermediate_size=MOE_I,
                    num_shared_experts=2, gating="softmax",
                    norm_topk_prob=True) if MOE else None,
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
    eng = LLMEngine(sw, max_slots=SLOTS, max_len=T + 80, kv_bits=8,
                    prefill_buckets=(T,), decode_chunk=16)
    mode = "append_first" if eng._use_mla8a else "read_concat"
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, 32000, size=(T,)).tolist()
               for _ in range(SLOTS)]
    sp = SamplingParams(max_new_tokens=4, temperature=0.0)
    eng.generate([prompts[0]], sp)   # compile prefill+decode
    eng.reset()
    for slot, p in enumerate(prompts):
        ids = np.zeros((1, T), np.int32)
        ids[0, :len(p)] = p
        eng.cache, eng.lengths, _ = eng._prefill_jit(
            eng.sw, eng.cache, eng.lengths, jnp.asarray(ids),
            jnp.asarray(slot), jnp.asarray(len(p)), T=T)
    active = jnp.ones((SLOTS,), bool)
    cur = jnp.ones((SLOTS,), jnp.int32)

    def run(n):
        out = eng._decode_chunk_jit(eng.sw, eng.cache, eng.lengths, cur,
                                    active, eng.key, n_steps=n, sp=sp)
        eng.cache = out[0]
        float(jnp.sum(out[4]))
        return out

    for n in (8, 48):
        run(n)
    t0 = time.perf_counter()
    run(8)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(48)
    t_hi = time.perf_counter() - t0
    per = (t_hi - t_lo) / 40
    print(json.dumps({
        "mode": mode, "per_step_ms": round(per * 1e3, 2),
        "slots": SLOTS, "T": T, "layers": LAYERS, "moe": MOE, "moe_i": MOE_I,
        "tok_per_s": round(SLOTS / per, 1)}), flush=True)


if __name__ == "__main__":
    main()
