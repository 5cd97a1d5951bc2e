"""Serving-engine throughput: continuous-batching decode on synthetic
Llama-3-8B-shaped W4 weights (the end-to-end engine analogue of bench.py's
bare decode-stack number; includes sampler, KV append, slot management).

Timing: the engine host-reads sampled tokens every step, which forces
device completion through the tunnel (each step depends on the previous
cache state, so nothing dedup-caches).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

HIDDEN, INTER, LAYERS = 4096, 14336, 32
N_HEADS, N_KV, HEAD_DIM = 32, 8, 128
VOCAB = 32000
SLOTS = int(os.environ.get("SLOTS", "16"))
PROMPT = int(os.environ.get("PROMPT", "512"))
NEW = int(os.environ.get("NEW", "64"))
ACT_BITS = int(os.environ.get("ACT_BITS", "8"))


def make_weights():
    from bench import make_layer_qweights
    from lightcompress_tpu.models import arch as A
    from lightcompress_tpu.serving.quantized_model import ServingWeights

    arch = A.ArchSpec(
        family="llama", vocab_size=VOCAB, hidden_size=HIDDEN,
        intermediate_size=INTER, num_layers=LAYERS, num_heads=N_HEADS,
        num_kv_heads=N_KV, head_dim=HEAD_DIM, act_fn="silu",
        dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    blocks = []
    for k in jax.random.split(key, LAYERS):
        lw = make_layer_qweights(k)
        entry = {
            "ln1": {"weight": jnp.ones((HIDDEN,), jnp.bfloat16)},
            "ln2": {"weight": jnp.ones((HIDDEN,), jnp.bfloat16)},
            "attn.o": lw["o"], "mlp.down": lw["down"],
        }
        if "qkv" in lw:  # bench BENCH_FUSED default: merged serving layout
            entry["attn.qkv"] = lw["qkv"]
            entry["mlp.gateup"] = lw["gateup"]
        else:
            entry.update({"attn.q": lw["q"], "attn.k": lw["k"],
                          "attn.v": lw["v"], "mlp.gate": lw["gate"],
                          "mlp.up": lw["up"]})
        blocks.append(entry)
    emb = jax.random.normal(key, (VOCAB, HIDDEN), jnp.bfloat16) * 0.02
    head, hs = emb, None
    if os.environ.get("HEAD_BITS", "8") == "8":
        # int8 per-channel head — the build_serving_weights default
        hf = emb.astype(jnp.float32)
        amax = jnp.clip(jnp.max(jnp.abs(hf), axis=1), 1e-6, None)
        hs = (amax / 127.0).astype(jnp.float32)
        head = jnp.clip(jnp.round(hf / hs[:, None]), -127, 127
                        ).astype(jnp.int8)
    return ServingWeights(
        arch=arch, embed=emb, embed_pos=None,
        norm={"weight": jnp.ones((HIDDEN,), jnp.bfloat16)},
        lm_head=head, lm_head_scale=hs, blocks=blocks, wbits=4,
        act_bits=ACT_BITS,
    )


def main():
    from lightcompress_tpu.serving import LLMEngine, SamplingParams

    sw = make_weights()
    chunk = int(os.environ.get("CHUNK", "16"))
    eng = LLMEngine(sw, max_slots=SLOTS, max_len=PROMPT + NEW + 8,
                    kv_bits=8, prefill_buckets=(PROMPT,),
                    decode_chunk=chunk)
    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, VOCAB, size=(PROMPT,)).tolist()
               for _ in range(SLOTS)]
    sp = SamplingParams(max_new_tokens=NEW, temperature=0.0)

    # warmup: compile prefill + decode
    eng.generate([prompts[0][:PROMPT]], sp)
    eng.reset()

    t0 = time.time()
    outs = eng.generate(prompts, sp)
    dt = time.time() - t0
    n_tokens = sum(len(o) for o in outs)
    print(json.dumps({
        "metric": "engine_decode_tokens_per_s",
        "slots": SLOTS, "prompt": PROMPT, "new": NEW,
        "value": round(n_tokens / dt, 2),
        "total_s": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
