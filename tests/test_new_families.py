"""Gemma2 / Phi-3 / StarCoder family tests: forward parity vs HF."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _hf_logits(model, ids_np):
    import torch

    with torch.no_grad():
        return model(torch.from_numpy(ids_np)).logits.float().numpy()


def test_gemma2_matches_hf(tmp_path):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(0)
    cfg = Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=16,
        attn_implementation="eager",
    )
    hf = Gemma2ForCausalLM(cfg)
    hf.eval()
    d = str(tmp_path / "gemma2")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert m.arch.gemma_norm and m.arch.sandwich_norms
    ids = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int32)
    ours = np.asarray(m.forward(jnp.asarray(ids)))
    theirs = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=5e-2)


def test_phi3_matches_hf(tmp_path):
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    cfg = Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0,
    )
    hf = Phi3ForCausalLM(cfg)
    hf.eval()
    d = str(tmp_path / "phi3")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    # fused qkv/gate_up were split
    assert m.blocks[0]["attn"]["q"]["weight"].shape == (64, 64)
    assert m.blocks[0]["mlp"]["gate"]["weight"].shape == (128, 64)
    ids = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int32)
    ours = np.asarray(m.forward(jnp.asarray(ids)))
    theirs = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=5e-2)


def test_starcoder_matches_hf(tmp_path):
    import torch
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    torch.manual_seed(0)
    cfg = GPTBigCodeConfig(
        vocab_size=128, n_embd=64, n_inner=128, n_layer=2, n_head=4,
        n_positions=128, multi_query=True,
        activation_function="gelu_pytorch_tanh",
    )
    hf = GPTBigCodeForCausalLM(cfg)
    hf.eval()
    d = str(tmp_path / "bigcode")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert m.arch.num_kv_heads == 1  # MQA
    ids = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int32)
    ours = np.asarray(m.forward(jnp.asarray(ids)))
    theirs = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=5e-2)
