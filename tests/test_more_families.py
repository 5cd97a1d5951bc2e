"""Bloom / Falcon / Phi / GLM / GLM-4 HF forward parity + internal checks
for the trust-remote-code families (chatglm/internlm2/qwen1/minicpm)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _hf_logits(model, ids_np):
    import torch

    with torch.no_grad():
        return model(torch.from_numpy(ids_np)).logits.float().numpy()


IDS = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int32)


def _parity(tmp_path, name, hf, atol=5e-3):
    hf.eval()
    d = str(tmp_path / name)
    hf.save_pretrained(d, safe_serialization=True)
    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    ours = np.asarray(m.forward(jnp.asarray(IDS)))
    theirs = _hf_logits(hf, IDS)
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=5e-2)
    return m


def test_bloom_matches_hf(tmp_path):
    import torch
    from transformers import BloomConfig, BloomForCausalLM

    torch.manual_seed(0)
    cfg = BloomConfig(vocab_size=128, hidden_size=64, n_layer=2, n_head=4,
                      attn_implementation="eager")
    m = _parity(tmp_path, "bloom", BloomForCausalLM(cfg))
    assert m.arch.alibi and not m.arch.rope_enabled
    assert m.blocks[0]["attn"]["q"]["weight"].shape == (64, 64)


def test_falcon_parallel_matches_hf(tmp_path):
    import torch
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(0)
    cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
        attn_implementation="eager",
    )
    m = _parity(tmp_path, "falcon", FalconForCausalLM(cfg))
    assert m.arch.parallel_residual and m.arch.num_kv_heads == 1
    # fused qkv split: k/v have 1 head
    assert m.blocks[0]["attn"]["k"]["weight"].shape == (16, 64)


def test_falcon_new_arch_matches_hf(tmp_path):
    import torch
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(1)
    cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2,
        new_decoder_architecture=True, bias=False, alibi=False,
        attn_implementation="eager",
    )
    m = _parity(tmp_path, "falcon40b", FalconForCausalLM(cfg))
    assert m.arch.parallel_two_norms


def test_phi_matches_hf(tmp_path):
    import torch
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(0)
    cfg = PhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        partial_rotary_factor=0.5, attn_implementation="eager",
    )
    m = _parity(tmp_path, "phi", PhiForCausalLM(cfg))
    assert m.arch.parallel_residual and m.arch.rotary_dim == 8
    assert m.arch.head_bias


def test_glm_matches_hf(tmp_path):
    import torch
    from transformers import GlmConfig, GlmForCausalLM

    torch.manual_seed(0)
    cfg = GlmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attn_implementation="eager",
        pad_token_id=0, eos_token_id=2,
    )
    m = _parity(tmp_path, "glm", GlmForCausalLM(cfg))
    assert m.arch.glm_rope and m.arch.rotary_dim == 8


def test_glm4_matches_hf(tmp_path):
    import torch
    from transformers import Glm4Config, Glm4ForCausalLM

    torch.manual_seed(0)
    cfg = Glm4Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attn_implementation="eager",
        pad_token_id=0, eos_token_id=2,
    )
    m = _parity(tmp_path, "glm4", Glm4ForCausalLM(cfg))
    assert m.arch.sandwich_norms


# -- trust-remote-code families: loader-shape + numerics sanity -------------


def _write_ckpt(tmp_path, name, cfg, tensors):
    import torch
    from safetensors.torch import save_file

    d = tmp_path / name
    d.mkdir()
    (d / "config.json").write_text(json.dumps(cfg))
    save_file({k: torch.from_numpy(v) for k, v in tensors.items()},
              str(d / "model.safetensors"))
    return str(d)


def test_chatglm_loader_and_forward(tmp_path):
    rng = np.random.RandomState(0)
    h, ffn, nh, nkv, hd, L, V = 32, 64, 4, 2, 8, 2, 64
    t = {
        "transformer.embedding.word_embeddings.weight":
            rng.randn(V, h).astype(np.float32) * 0.05,
        "transformer.encoder.final_layernorm.weight":
            np.ones(h, np.float32),
        "transformer.output_layer.weight":
            rng.randn(V, h).astype(np.float32) * 0.05,
    }
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        t[p + "self_attention.query_key_value.weight"] = \
            rng.randn(nh * hd + 2 * nkv * hd, h).astype(np.float32) * 0.05
        t[p + "self_attention.query_key_value.bias"] = \
            np.zeros(nh * hd + 2 * nkv * hd, np.float32)
        t[p + "self_attention.dense.weight"] = \
            rng.randn(h, nh * hd).astype(np.float32) * 0.05
        t[p + "mlp.dense_h_to_4h.weight"] = \
            rng.randn(2 * ffn, h).astype(np.float32) * 0.05
        t[p + "mlp.dense_4h_to_h.weight"] = \
            rng.randn(h, ffn).astype(np.float32) * 0.05
    cfg = {
        "model_type": "chatglm", "hidden_size": h, "ffn_hidden_size": ffn,
        "num_layers": L, "num_attention_heads": nh,
        "multi_query_attention": True, "multi_query_group_num": nkv,
        "kv_channels": hd, "padded_vocab_size": V,
        "layernorm_epsilon": 1e-5, "add_qkv_bias": True,
    }
    d = _write_ckpt(tmp_path, "chatglm", cfg, t)
    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert m.arch.rope_interleave and m.arch.partial_rotary_factor == 0.5
    assert m.blocks[0]["mlp"]["gate"]["weight"].shape == (ffn, h)
    logits = m.forward(jnp.asarray(IDS % 64))
    assert logits.shape == (1, 6, V)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_internlm2_loader_and_forward(tmp_path):
    rng = np.random.RandomState(1)
    h, ffn, nh, nkv, hd, L, V = 32, 64, 4, 2, 8, 2, 64
    g = nh // nkv
    t = {
        "model.tok_embeddings.weight": rng.randn(V, h).astype(np.float32) * 0.05,
        "model.norm.weight": np.ones(h, np.float32),
        "output.weight": rng.randn(V, h).astype(np.float32) * 0.05,
    }
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "attention_norm.weight"] = np.ones(h, np.float32)
        t[p + "ffn_norm.weight"] = np.ones(h, np.float32)
        t[p + "attention.wqkv.weight"] = \
            rng.randn(nkv * (g + 2) * hd, h).astype(np.float32) * 0.05
        t[p + "attention.wo.weight"] = \
            rng.randn(h, nh * hd).astype(np.float32) * 0.05
        t[p + "feed_forward.w1.weight"] = rng.randn(ffn, h).astype(np.float32) * 0.05
        t[p + "feed_forward.w3.weight"] = rng.randn(ffn, h).astype(np.float32) * 0.05
        t[p + "feed_forward.w2.weight"] = rng.randn(h, ffn).astype(np.float32) * 0.05
    cfg = {
        "model_type": "internlm2", "hidden_size": h, "intermediate_size": ffn,
        "num_hidden_layers": L, "num_attention_heads": nh,
        "num_key_value_heads": nkv, "vocab_size": V, "bias": False,
    }
    d = _write_ckpt(tmp_path, "internlm2", cfg, t)
    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert m.blocks[0]["attn"]["q"]["weight"].shape == (nh * hd, h)
    assert m.blocks[0]["attn"]["k"]["weight"].shape == (nkv * hd, h)
    logits = m.forward(jnp.asarray(IDS % 64))
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_qwen1_loader_and_forward(tmp_path):
    rng = np.random.RandomState(2)
    h, inter, nh, L, V = 32, 128, 4, 2, 64  # inter = 2*ffn (qwen convention)
    ffn = inter // 2
    t = {
        "transformer.wte.weight": rng.randn(V, h).astype(np.float32) * 0.05,
        "transformer.ln_f.weight": np.ones(h, np.float32),
        "lm_head.weight": rng.randn(V, h).astype(np.float32) * 0.05,
    }
    for i in range(L):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = np.ones(h, np.float32)
        t[p + "ln_2.weight"] = np.ones(h, np.float32)
        t[p + "attn.c_attn.weight"] = rng.randn(3 * h, h).astype(np.float32) * 0.05
        t[p + "attn.c_attn.bias"] = np.zeros(3 * h, np.float32)
        t[p + "attn.c_proj.weight"] = rng.randn(h, h).astype(np.float32) * 0.05
        t[p + "mlp.w1.weight"] = rng.randn(ffn, h).astype(np.float32) * 0.05
        t[p + "mlp.w2.weight"] = rng.randn(ffn, h).astype(np.float32) * 0.05
        t[p + "mlp.c_proj.weight"] = rng.randn(h, ffn).astype(np.float32) * 0.05
    cfg = {
        "model_type": "qwen", "hidden_size": h, "intermediate_size": inter,
        "num_hidden_layers": L, "num_attention_heads": nh, "vocab_size": V,
    }
    d = _write_ckpt(tmp_path, "qwen", cfg, t)
    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert m.arch.intermediate_size == ffn
    assert m.blocks[0]["attn"]["q"].get("bias") is not None
    logits = m.forward(jnp.asarray(IDS % 64))
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_minicpm_scaling_semantics(tmp_path):
    """MiniCPM depth/emb/logit scaling: logits differ from a plain-llama
    forward of the same weights exactly by the configured multipliers."""
    from lightcompress_tpu.models import arch as A
    from lightcompress_tpu.models.base import MiniCPM, Llama

    spec = dict(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=8, dtype=jnp.float32,
    )
    plain = A.ArchSpec(family="llama", **spec)
    params = A.init_params(jax.random.PRNGKey(0), plain)
    scaled = A.ArchSpec(
        family="llama", residual_multiplier=1.4 / 2**0.5,
        embed_multiplier=12.0, logit_divisor=32 / 16, **spec,
    )
    lp = Llama(plain, params).forward(jnp.asarray(IDS % 64))
    mp = MiniCPM(scaled, params).forward(jnp.asarray(IDS % 64))
    assert not np.allclose(np.asarray(lp), np.asarray(mp))
    assert bool(jnp.all(jnp.isfinite(mp)))


def test_parallel_subsets_grouping():
    """Parallel-residual models expose q/k/v + fc1 as ONE subset under the
    shared ln1, so equivalent transforms stay exact."""
    from lightcompress_tpu.models.base import PARALLEL_SUBSETS

    s0 = PARALLEL_SUBSETS[0]
    assert set(s0.layers) == {"attn.q", "attn.k", "attn.v", "mlp.fc1"}
    assert s0.prev_op == "ln1"
