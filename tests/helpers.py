"""Tiny-model builders shared across tests (zero-egress: random init only)."""

import json
import os

import numpy as np


def make_tiny_hf_llama(tmpdir, vocab=256, hidden=64, inter=128, layers=2,
                       heads=4, kv_heads=2, seed=0, tie=False, model_type="llama"):
    """Create a tiny random HF-format Llama checkpoint on disk via
    transformers (torch CPU), return its dir."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        max_position_embeddings=512,
        rms_norm_eps=1e-6,
        tie_word_embeddings=tie,
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    d = os.path.join(tmpdir, "tiny_llama")
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def make_tiny_hf_opt(tmpdir, vocab=256, hidden=64, ffn=128, layers=2, heads=4,
                     seed=0):
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(seed)
    cfg = OPTConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        ffn_dim=ffn,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        max_position_embeddings=128,
        word_embed_proj_dim=hidden,
        do_layer_norm_before=True,
    )
    model = OPTForCausalLM(cfg)
    model.eval()
    d = os.path.join(tmpdir, "tiny_opt")
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def make_tiny_adapter(vocab=256, hidden=64, inter=128, layers=2, heads=4,
                      kv_heads=2, seed=0, family="llama", dtype=None):
    """Random-init adapter without any HF round-trip (fast path)."""
    import jax
    import jax.numpy as jnp

    from lightcompress_tpu.models import ArchSpec, Llama, Opt, init_params

    arch = ArchSpec(
        family=family,
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=inter,
        num_layers=layers,
        num_heads=heads,
        num_kv_heads=kv_heads if family == "llama" else heads,
        head_dim=hidden // heads,
        act_fn="silu" if family == "llama" else "relu",
        tie_word_embeddings=False,
        dtype=dtype or jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(seed), arch)
    cls = Llama if family == "llama" else Opt
    return cls(arch, params)
