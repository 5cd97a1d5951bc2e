"""Attention-map visualization for LLM checkpoints
(reference tools/attention_vis.py: forwards with output_attentions and
heatmaps one layer's heads; here attention is recomputed functionally from
the chosen block's q/k params — our forwards don't materialize probs)."""

import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np


def attention_maps(model, input_ids, layer_idx: int) -> np.ndarray:
    """(n_heads, T, T) softmax attention of one block for one sequence."""
    import jax

    from lightcompress_tpu.models import arch as A

    arch = model.arch
    params = model.params
    ids = jnp.asarray(input_ids)[None, :]
    x = A.embed_forward(arch, params, ids)
    T = ids.shape[1]
    cos, sin = A.rope_cos_sin(arch, jnp.arange(T))
    mask = A.causal_mask(T, T)
    for i in range(layer_idx):
        x, _, _ = A.block_forward(arch, params["blocks"][i], x, cos, sin,
                                  mask)
    bp = params["blocks"][layer_idx]
    h1 = A.apply_norm(x, bp["ln1"], arch)
    ap = bp["attn"]
    nh, nkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
    q = A.default_linear("q", ap["q"]["weight"], ap["q"].get("bias"), h1)
    k = A.default_linear("k", ap["k"]["weight"], ap["k"].get("bias"), h1)
    q = q.reshape(1, T, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(1, T, nkv, hd).transpose(0, 2, 1, 3)
    if cos is not None:
        q, k = A.apply_rope(q, k, cos, sin)
    k = jnp.repeat(k, nh // nkv, axis=1)
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * hd ** -0.5
    sc = sc + mask
    return np.asarray(jax.nn.softmax(sc, axis=-1)[0])


def main():
    p = argparse.ArgumentParser("attention_vis")
    p.add_argument("--model_path", required=True)
    p.add_argument("--input_text", default="The quick brown fox")
    p.add_argument("--layer_idx", type=int, default=0)
    p.add_argument("--head_idx", type=int, default=0)
    p.add_argument("--all_heads", action="store_true")
    p.add_argument("--save_img_path", default="./attn_vis")
    args = p.parse_args()

    from lightcompress_tpu.models.hf_loader import load_model
    from lightcompress_tpu.utils.visualizer import visualize_heads

    model = load_model(args.model_path)
    ids = model.tokenizer(args.input_text, return_tensors="np").input_ids[0]
    maps = attention_maps(model, ids, args.layer_idx)
    os.makedirs(args.save_img_path, exist_ok=True)
    sel = maps if args.all_heads else maps[args.head_idx:args.head_idx + 1]
    out = visualize_heads(
        sel, save_path=os.path.join(
            args.save_img_path, f"layer{args.layer_idx}_heads.png"))
    print("wrote", out)


if __name__ == "__main__":
    main()
