"""Wan diffusers-format checkpoint reader (reference wan_t2v.py; sandbox
has no diffusers, so the checkpoint is hand-built with diffusers key
names)."""

import json

import numpy as np

import jax.numpy as jnp


def _build_wan_ckpt(tmp_path, dim=64, heads=4, layers=2, ffn=128,
                    text_dim=48):
    import torch
    from safetensors.torch import save_file

    rng = np.random.RandomState(0)
    t = {}
    for i in range(layers):
        p = f"blocks.{i}."
        for attn, kvdim in (("attn1", dim), ("attn2", text_dim)):
            t[p + f"{attn}.to_q.weight"] = rng.randn(dim, dim).astype(np.float32) * 0.05
            t[p + f"{attn}.to_q.bias"] = np.zeros(dim, np.float32)
            for c in ("k", "v"):
                t[p + f"{attn}.to_{c}.weight"] = rng.randn(dim, kvdim).astype(np.float32) * 0.05
                t[p + f"{attn}.to_{c}.bias"] = np.zeros(dim, np.float32)
            t[p + f"{attn}.to_out.0.weight"] = rng.randn(dim, dim).astype(np.float32) * 0.05
            t[p + f"{attn}.to_out.0.bias"] = np.zeros(dim, np.float32)
            t[p + f"{attn}.norm_q.weight"] = np.ones(dim, np.float32)
            t[p + f"{attn}.norm_k.weight"] = np.ones(dim, np.float32)
        t[p + "norm2.weight"] = np.ones(dim, np.float32)
        t[p + "norm2.bias"] = np.zeros(dim, np.float32)
        t[p + "ffn.net.0.proj.weight"] = rng.randn(ffn, dim).astype(np.float32) * 0.05
        t[p + "ffn.net.0.proj.bias"] = np.zeros(ffn, np.float32)
        t[p + "ffn.net.2.weight"] = rng.randn(dim, ffn).astype(np.float32) * 0.05
        t[p + "ffn.net.2.bias"] = np.zeros(dim, np.float32)
        t[p + "scale_shift_table"] = rng.randn(1, 6, dim).astype(np.float32) * 0.02
    t["scale_shift_table"] = rng.randn(1, 2, dim).astype(np.float32) * 0.02
    t["proj_out.weight"] = rng.randn(16, dim).astype(np.float32) * 0.05
    t["proj_out.bias"] = np.zeros(16, np.float32)
    t["condition_embedder.text_embedder.linear_1.weight"] = \
        rng.randn(dim, text_dim).astype(np.float32) * 0.05
    t["condition_embedder.text_embedder.linear_1.bias"] = np.zeros(dim, np.float32)
    cfg = {
        "_class_name": "WanTransformer3DModel",
        "num_attention_heads": heads, "attention_head_dim": dim // heads,
        "num_layers": layers, "ffn_dim": ffn, "text_dim": text_dim,
        "in_channels": 16, "patch_size": [1, 2, 2],
        "qk_norm": "rms_norm_across_heads", "cross_attn_norm": True,
    }
    d = tmp_path / "wan"
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    save_file({k: torch.from_numpy(v) for k, v in t.items()},
              str(d / "diffusion_pytorch_model.safetensors"))
    # reader expects model.safetensors naming; provide an index
    import os
    os.rename(str(d / "diffusion_pytorch_model.safetensors"),
              str(d / "model.safetensors"))
    return str(d)


def test_wan_loader_and_block_forward(tmp_path):
    from lightcompress_tpu.models.dit import load_wan_transformer

    d = _build_wan_ckpt(tmp_path)
    m = load_wan_transformer(d)
    assert m.num_blocks == 2
    assert m.cross_dim == 48
    bp = m.blocks[0]
    assert bp["scale_shift_table"].shape == (6, 64)
    assert "norm_q" in bp["attn2"]  # cross-attn qk-norm loaded
    assert "cond" in m.params

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 20, 64).astype(np.float32))
    t_emb = jnp.asarray(rng.randn(1, 6, 64).astype(np.float32) * 0.1)
    ctx = jnp.asarray(rng.randn(1, 7, 48).astype(np.float32))
    y = m.forward_denoise(x, t_emb, ctx)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_wan_loaded_model_quantizes(tmp_path):
    from lightcompress_tpu.config import DotDict
    from lightcompress_tpu.models.dit import load_wan_transformer
    from lightcompress_tpu.registry import ALGO_REGISTRY
    import lightcompress_tpu.compression  # noqa: F401

    d = _build_wan_ckpt(tmp_path)
    m = load_wan_transformer(d)
    rng = np.random.RandomState(2)
    calib = [{
        "latents": rng.randn(1, 20, 64).astype(np.float32),
        "t_emb": rng.randn(1, 6, 64).astype(np.float32) * 0.1,
        "ctx": rng.randn(1, 7, 48).astype(np.float32),
    } for _ in range(2)]
    inputs = m.collect_first_block_input(calib)
    cfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
    })
    algo = ALGO_REGISTRY["RTN"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    x = jnp.asarray(calib[0]["latents"])
    y = m.forward_denoise(x, jnp.asarray(calib[0]["t_emb"]),
                          jnp.asarray(calib[0]["ctx"]))
    assert bool(jnp.all(jnp.isfinite(y)))
