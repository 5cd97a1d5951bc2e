"""HuggingFace checkpoint I/O.

Reads an HF model directory (config.json + *.safetensors [+ index] or
pytorch_model.bin) into the canonical params pytree, and writes it back.
Covers the reference's build path (base_model.py:197-242) including the
sharded-safetensors streaming load used for big pre-quantized checkpoints
(base_model.py:244-264) — shards are memory-mapped and consumed one tensor
at a time, never materializing the whole checkpoint in host RAM twice.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import arch as A
from .base import BaseModel

try:
    from safetensors import safe_open
except ImportError:  # pragma: no cover
    safe_open = None


# ---------------------------------------------------------------------------
# config.json -> ArchSpec
# ---------------------------------------------------------------------------

_LLAMA_LIKE = {"llama", "mistral", "qwen2", "qwen3", "smollm", "stablelm",
               "phi3"}


def _llama3_rope(cfg: Dict[str, Any]):
    rs = cfg.get("rope_scaling") or {}
    if rs.get("rope_type", rs.get("type")) != "llama3":
        return None
    return (rs["factor"], rs["low_freq_factor"], rs["high_freq_factor"],
            rs["original_max_position_embeddings"])


def arch_from_hf_config(cfg: Dict[str, Any], dtype=jnp.bfloat16) -> A.ArchSpec:
    mt = cfg.get("model_type", "llama")
    if mt in _LLAMA_LIKE:
        n_heads = cfg["num_attention_heads"]
        head_dim = cfg.get("head_dim") or cfg["hidden_size"] // n_heads
        return A.ArchSpec(
            family="llama",
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=head_dim,
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-6),
            attn_bias=(mt == "qwen2") or cfg.get("attention_bias", False),
            mlp_bias=cfg.get("mlp_bias", False),
            qk_norm=(mt == "qwen3"),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            act_fn={"silu": "silu", "gelu": "gelu"}.get(
                cfg.get("hidden_act", "silu"), "silu"
            ),
            rope_llama3=_llama3_rope(cfg),
            dtype=dtype,
        )
    if mt == "gemma2":
        n_heads = cfg["num_attention_heads"]
        head_dim = cfg.get("head_dim") or cfg["hidden_size"] // n_heads
        qs = cfg.get("query_pre_attn_scalar", head_dim)
        return A.ArchSpec(
            family="llama",
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=head_dim,
            max_position_embeddings=cfg.get("max_position_embeddings", 8192),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            act_fn="gelu",
            gemma_norm=True,
            sandwich_norms=True,
            attn_softcap=cfg.get("attn_logit_softcapping") or 0.0,
            final_softcap=cfg.get("final_logit_softcapping") or 0.0,
            query_scale=qs**-0.5,
            embed_scale=True,
            dtype=dtype,
        )
    if mt == "gpt_bigcode":  # starcoder: MQA + learned positions + LayerNorm
        h = cfg["n_embd"]
        n_heads = cfg["n_head"]
        return A.ArchSpec(
            family="opt",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("n_inner") or 4 * h,
            num_layers=cfg["n_layer"],
            num_heads=n_heads,
            num_kv_heads=1 if cfg.get("multi_query", True) else n_heads,
            head_dim=h // n_heads,
            max_position_embeddings=cfg.get("n_positions", 8192),
            tie_word_embeddings=True,
            act_fn="gelu",
            do_layer_norm_before=True,
            pos_offset=0,
            dtype=dtype,
        )
    if mt in ("mixtral", "qwen2_moe", "qwen3_moe", "deepseek_v2", "deepseek_v3"):
        n_heads = cfg["num_attention_heads"]
        head_dim = cfg.get("head_dim") or cfg.get("v_head_dim") or \
            cfg["hidden_size"] // n_heads
        if mt == "mixtral":
            moe = A.MoESpec(
                num_experts=cfg["num_local_experts"],
                top_k=cfg["num_experts_per_tok"],
                moe_intermediate_size=cfg["intermediate_size"],
                gating="softmax",
                norm_topk_prob=True,
            )
        elif mt in ("qwen2_moe", "qwen3_moe"):
            moe = A.MoESpec(
                num_experts=cfg["num_experts"],
                top_k=cfg["num_experts_per_tok"],
                moe_intermediate_size=cfg["moe_intermediate_size"],
                num_shared_experts=(
                    cfg.get("shared_expert_intermediate_size", 0)
                    // max(1, cfg["moe_intermediate_size"])
                    if mt == "qwen2_moe" else 0
                ),
                gating="softmax",
                norm_topk_prob=cfg.get("norm_topk_prob", False),
            )
        else:  # deepseek v2/v3
            moe = A.MoESpec(
                num_experts=cfg["n_routed_experts"],
                top_k=cfg["num_experts_per_tok"],
                moe_intermediate_size=cfg["moe_intermediate_size"],
                num_shared_experts=cfg.get("n_shared_experts", 0) or 0,
                gating="sigmoid" if cfg.get("scoring_func") == "sigmoid"
                else "softmax",
                norm_topk_prob=cfg.get("norm_topk_prob", True),
                routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
                n_group=cfg.get("n_group", 1) or 1,
                topk_group=cfg.get("topk_group", 1) or 1,
            )
        mla = None
        if cfg.get("kv_lora_rank"):
            mla = A.MLASpec(
                kv_lora_rank=cfg["kv_lora_rank"],
                qk_rope_head_dim=cfg["qk_rope_head_dim"],
                qk_nope_head_dim=cfg["qk_nope_head_dim"],
                v_head_dim=cfg["v_head_dim"],
                q_lora_rank=cfg.get("q_lora_rank"),
                rope_interleave=cfg.get("rope_interleave", True),
            )
        return A.ArchSpec(
            family="llama",
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=head_dim,
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-6),
            attn_bias=cfg.get("attention_bias", mt == "qwen2_moe"),
            qk_norm=(mt == "qwen3_moe"),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            moe=moe,
            mla=mla,
            dtype=dtype,
        )
    if mt == "bloom":
        h = cfg.get("hidden_size") or cfg["n_embed"]
        n_heads = cfg.get("n_head") or cfg["num_attention_heads"]
        return A.ArchSpec(
            family="opt",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=4 * h,
            num_layers=cfg.get("n_layer") or cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=n_heads,
            head_dim=h // n_heads,
            tie_word_embeddings=True,
            act_fn="gelu",
            alibi=True,
            learned_pos=False,
            embed_norm=True,
            dtype=dtype,
        )
    if mt == "falcon":
        h = cfg["hidden_size"]
        n_heads = cfg["num_attention_heads"]
        new_arch = cfg.get("new_decoder_architecture", False)
        if new_arch:
            nkv = cfg.get("num_kv_heads", n_heads)
        else:
            nkv = 1 if cfg.get("multi_query", True) else n_heads
        parallel = cfg.get("parallel_attn", True) or new_arch
        use_alibi = cfg.get("alibi", False)
        return A.ArchSpec(
            family="opt",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg.get("ffn_hidden_size") or 4 * h,
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=nkv,
            head_dim=h // n_heads,
            rope_theta=cfg.get("rope_theta", 10000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            act_fn="gelu",
            alibi=use_alibi,
            use_rope=not use_alibi,
            learned_pos=False,
            parallel_residual=parallel,
            parallel_two_norms=new_arch,
            opt_bias=cfg.get("bias", False),
            dtype=dtype,
        )
    if mt == "phi":
        h = cfg["hidden_size"]
        n_heads = cfg["num_attention_heads"]
        return A.ArchSpec(
            family="opt",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=cfg.get("num_key_value_heads") or n_heads,
            head_dim=h // n_heads,
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            rope_theta=cfg.get("rope_theta", 10000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            act_fn="gelu",
            use_rope=True,
            learned_pos=False,
            parallel_residual=True,
            partial_rotary_factor=cfg.get("partial_rotary_factor", 0.5),
            head_bias=True,
            dtype=dtype,
        )
    if mt in ("glm", "glm4"):
        h = cfg["hidden_size"]
        n_heads = cfg["num_attention_heads"]
        return A.ArchSpec(
            family="llama",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=cfg.get("head_dim") or h // n_heads,
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-5),
            attn_bias=cfg.get("attention_bias", True),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            partial_rotary_factor=cfg.get("partial_rotary_factor", 0.5),
            glm_rope=True,
            sandwich_norms=(mt == "glm4"),
            dtype=dtype,
        )
    if mt == "chatglm":
        h = cfg["hidden_size"]
        n_heads = cfg["num_attention_heads"]
        nkv = cfg.get("multi_query_group_num", n_heads) \
            if cfg.get("multi_query_attention", False) else n_heads
        return A.ArchSpec(
            family="llama",
            vocab_size=cfg.get("padded_vocab_size") or cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg["ffn_hidden_size"],
            num_layers=cfg["num_layers"],
            num_heads=n_heads,
            num_kv_heads=nkv,
            head_dim=cfg.get("kv_channels") or h // n_heads,
            rope_theta=10000.0 * cfg.get("rope_ratio", 1.0),
            rms_eps=cfg.get("layernorm_epsilon", 1e-5),
            attn_bias=cfg.get("add_qkv_bias", True),
            tie_word_embeddings=False,
            partial_rotary_factor=0.5,
            rope_interleave=True,
            dtype=dtype,
        )
    if mt == "internlm2":
        h = cfg["hidden_size"]
        n_heads = cfg["num_attention_heads"]
        return A.ArchSpec(
            family="llama",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=h // n_heads,
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-6),
            attn_bias=cfg.get("bias", False),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            dtype=dtype,
        )
    if mt == "qwen":  # qwen-1
        h = cfg["hidden_size"]
        n_heads = cfg["num_attention_heads"]
        return A.ArchSpec(
            family="llama",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg["intermediate_size"] // 2,
            num_layers=cfg["num_hidden_layers"],
            num_heads=n_heads,
            num_kv_heads=n_heads,
            head_dim=h // n_heads,
            rope_theta=cfg.get("rotary_emb_base", 10000.0),
            rms_eps=cfg.get("layer_norm_epsilon", 1e-6),
            attn_bias=True,
            tie_word_embeddings=False,
            dtype=dtype,
        )
    if mt == "minicpm":
        h = cfg["hidden_size"]
        n_heads = cfg["num_attention_heads"]
        L = cfg["num_hidden_layers"]
        return A.ArchSpec(
            family="llama",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg["intermediate_size"],
            num_layers=L,
            num_heads=n_heads,
            num_kv_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=h // n_heads,
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-5),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            residual_multiplier=cfg.get("scale_depth", 1.0) / L**0.5,
            embed_multiplier=cfg.get("scale_emb", 1.0),
            logit_divisor=h / cfg.get("dim_model_base", h),
            dtype=dtype,
        )
    if mt == "opt":
        h = cfg["hidden_size"]
        return A.ArchSpec(
            family="opt",
            vocab_size=cfg["vocab_size"],
            hidden_size=h,
            intermediate_size=cfg["ffn_dim"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            num_kv_heads=cfg["num_attention_heads"],
            head_dim=h // cfg["num_attention_heads"],
            max_position_embeddings=cfg.get("max_position_embeddings", 2048),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
            act_fn="relu",
            do_layer_norm_before=cfg.get("do_layer_norm_before", True),
            dtype=dtype,
        )
    raise NotImplementedError(f"model_type {mt!r}")


# ---------------------------------------------------------------------------
# canonical-path <-> HF-key maps
# ---------------------------------------------------------------------------

def _llama_key_map(i: int) -> Dict[str, str]:
    p = f"model.layers.{i}."
    return {
        "ln1.weight": p + "input_layernorm.weight",
        "ln2.weight": p + "post_attention_layernorm.weight",
        "attn.q.weight": p + "self_attn.q_proj.weight",
        "attn.q.bias": p + "self_attn.q_proj.bias",
        "attn.k.weight": p + "self_attn.k_proj.weight",
        "attn.k.bias": p + "self_attn.k_proj.bias",
        "attn.v.weight": p + "self_attn.v_proj.weight",
        "attn.v.bias": p + "self_attn.v_proj.bias",
        "attn.o.weight": p + "self_attn.o_proj.weight",
        "attn.q_norm.weight": p + "self_attn.q_norm.weight",
        "attn.k_norm.weight": p + "self_attn.k_norm.weight",
        "mlp.gate.weight": p + "mlp.gate_proj.weight",
        "mlp.up.weight": p + "mlp.up_proj.weight",
        "mlp.down.weight": p + "mlp.down_proj.weight",
    }


def _opt_key_map(i: int) -> Dict[str, str]:
    p = f"model.decoder.layers.{i}."
    m = {
        "ln1.weight": p + "self_attn_layer_norm.weight",
        "ln1.bias": p + "self_attn_layer_norm.bias",
        "ln2.weight": p + "final_layer_norm.weight",
        "ln2.bias": p + "final_layer_norm.bias",
        "mlp.fc1.weight": p + "fc1.weight",
        "mlp.fc1.bias": p + "fc1.bias",
        "mlp.fc2.weight": p + "fc2.weight",
        "mlp.fc2.bias": p + "fc2.bias",
    }
    for c, h in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("o", "out_proj")):
        m[f"attn.{c}.weight"] = p + f"self_attn.{h}.weight"
        m[f"attn.{c}.bias"] = p + f"self_attn.{h}.bias"
    return m


def _top_key_map(arch: A.ArchSpec, model_type: str = "") -> Dict[str, str]:
    if model_type in ("bloom", "falcon"):
        m = {
            "embed.weight": "transformer.word_embeddings.weight",
            "norm.weight": "transformer.ln_f.weight",
            "norm.bias": "transformer.ln_f.bias",
            "embed_norm.weight": "transformer.word_embeddings_layernorm.weight",
            "embed_norm.bias": "transformer.word_embeddings_layernorm.bias",
        }
        if not arch.tie_word_embeddings:
            m["lm_head.weight"] = "lm_head.weight"
        return m
    if model_type == "phi":
        return {
            "embed.weight": "model.embed_tokens.weight",
            "norm.weight": "model.final_layernorm.weight",
            "norm.bias": "model.final_layernorm.bias",
            "lm_head.weight": "lm_head.weight",
            "lm_head.bias": "lm_head.bias",
        }
    if model_type == "chatglm":
        return {
            "embed.weight": "transformer.embedding.word_embeddings.weight",
            "norm.weight": "transformer.encoder.final_layernorm.weight",
            "lm_head.weight": "transformer.output_layer.weight",
        }
    if model_type == "internlm2":
        return {
            "embed.weight": "model.tok_embeddings.weight",
            "norm.weight": "model.norm.weight",
            "lm_head.weight": "output.weight",
        }
    if model_type == "qwen":
        return {
            "embed.weight": "transformer.wte.weight",
            "norm.weight": "transformer.ln_f.weight",
            "lm_head.weight": "lm_head.weight",
        }
    if arch.family == "llama":
        m = {
            "embed.weight": "model.embed_tokens.weight",
            "norm.weight": "model.norm.weight",
        }
        if not arch.tie_word_embeddings:
            m["lm_head.weight"] = "lm_head.weight"
        return m
    m = {
        "embed.weight": "model.decoder.embed_tokens.weight",
        "embed_pos.weight": "model.decoder.embed_positions.weight",
        "norm.weight": "model.decoder.final_layer_norm.weight",
        "norm.bias": "model.decoder.final_layer_norm.bias",
    }
    if not arch.tie_word_embeddings:
        m["lm_head.weight"] = "lm_head.weight"
    return m


def _gemma2_key_map(i: int) -> Dict[str, str]:
    m = _llama_key_map(i)
    p = f"model.layers.{i}."
    m["ln1_post.weight"] = p + "post_attention_layernorm.weight"
    m["ln2.weight"] = p + "pre_feedforward_layernorm.weight"
    m["ln2_post.weight"] = p + "post_feedforward_layernorm.weight"
    return m


def _bigcode_key_map(i: int) -> Dict[str, str]:
    p = f"transformer.h.{i}."
    return {
        "ln1.weight": p + "ln_1.weight", "ln1.bias": p + "ln_1.bias",
        "ln2.weight": p + "ln_2.weight", "ln2.bias": p + "ln_2.bias",
        "attn.o.weight": p + "attn.c_proj.weight",
        "attn.o.bias": p + "attn.c_proj.bias",
        "mlp.fc1.weight": p + "mlp.c_fc.weight",
        "mlp.fc1.bias": p + "mlp.c_fc.bias",
        "mlp.fc2.weight": p + "mlp.c_proj.weight",
        "mlp.fc2.bias": p + "mlp.c_proj.bias",
    }


def _bloom_key_map(i: int) -> Dict[str, str]:
    p = f"transformer.h.{i}."
    return {
        "ln1.weight": p + "input_layernorm.weight",
        "ln1.bias": p + "input_layernorm.bias",
        "ln2.weight": p + "post_attention_layernorm.weight",
        "ln2.bias": p + "post_attention_layernorm.bias",
        "attn.o.weight": p + "self_attention.dense.weight",
        "attn.o.bias": p + "self_attention.dense.bias",
        "mlp.fc1.weight": p + "mlp.dense_h_to_4h.weight",
        "mlp.fc1.bias": p + "mlp.dense_h_to_4h.bias",
        "mlp.fc2.weight": p + "mlp.dense_4h_to_h.weight",
        "mlp.fc2.bias": p + "mlp.dense_4h_to_h.bias",
    }


def _falcon_key_map(i: int, arch: A.ArchSpec) -> Dict[str, str]:
    p = f"transformer.h.{i}."
    m = {
        "attn.o.weight": p + "self_attention.dense.weight",
        "mlp.fc1.weight": p + "mlp.dense_h_to_4h.weight",
        "mlp.fc2.weight": p + "mlp.dense_4h_to_h.weight",
    }
    if arch.parallel_two_norms:
        m["ln1.weight"] = p + "ln_attn.weight"
        m["ln1.bias"] = p + "ln_attn.bias"
        m["ln2.weight"] = p + "ln_mlp.weight"
        m["ln2.bias"] = p + "ln_mlp.bias"
    else:
        m["ln1.weight"] = p + "input_layernorm.weight"
        m["ln1.bias"] = p + "input_layernorm.bias"
        m["ln2.weight"] = p + "post_attention_layernorm.weight"
        m["ln2.bias"] = p + "post_attention_layernorm.bias"
    return m


def _phi_key_map(i: int) -> Dict[str, str]:
    p = f"model.layers.{i}."
    m = {
        "ln1.weight": p + "input_layernorm.weight",
        "ln1.bias": p + "input_layernorm.bias",
        "attn.o.weight": p + "self_attn.dense.weight",
        "attn.o.bias": p + "self_attn.dense.bias",
        "mlp.fc1.weight": p + "mlp.fc1.weight",
        "mlp.fc1.bias": p + "mlp.fc1.bias",
        "mlp.fc2.weight": p + "mlp.fc2.weight",
        "mlp.fc2.bias": p + "mlp.fc2.bias",
    }
    for c in ("q", "k", "v"):
        m[f"attn.{c}.weight"] = p + f"self_attn.{c}_proj.weight"
        m[f"attn.{c}.bias"] = p + f"self_attn.{c}_proj.bias"
    return m


def _glm_key_map(i: int, model_type: str) -> Dict[str, str]:
    m = _llama_key_map(i)
    p = f"model.layers.{i}."
    del m["mlp.gate.weight"], m["mlp.up.weight"]  # fused gate_up_proj
    if model_type == "glm4":
        m["ln1_post.weight"] = p + "post_self_attn_layernorm.weight"
        m["ln2_post.weight"] = p + "post_mlp_layernorm.weight"
    return m


def _chatglm_key_map(i: int) -> Dict[str, str]:
    p = f"transformer.encoder.layers.{i}."
    return {
        "ln1.weight": p + "input_layernorm.weight",
        "ln2.weight": p + "post_attention_layernorm.weight",
        "attn.o.weight": p + "self_attention.dense.weight",
        "mlp.down.weight": p + "mlp.dense_4h_to_h.weight",
    }


def _internlm2_key_map(i: int) -> Dict[str, str]:
    p = f"model.layers.{i}."
    return {
        "ln1.weight": p + "attention_norm.weight",
        "ln2.weight": p + "ffn_norm.weight",
        "attn.o.weight": p + "attention.wo.weight",
        "mlp.gate.weight": p + "feed_forward.w1.weight",
        "mlp.up.weight": p + "feed_forward.w3.weight",
        "mlp.down.weight": p + "feed_forward.w2.weight",
    }


def _qwen1_key_map(i: int) -> Dict[str, str]:
    p = f"transformer.h.{i}."
    # Qwen-1 MLP: c_proj(w1(x) * silu(w2(x))) -> w2 is the gate, w1 the up
    return {
        "ln1.weight": p + "ln_1.weight",
        "ln2.weight": p + "ln_2.weight",
        "attn.o.weight": p + "attn.c_proj.weight",
        "mlp.gate.weight": p + "mlp.w2.weight",
        "mlp.up.weight": p + "mlp.w1.weight",
        "mlp.down.weight": p + "mlp.c_proj.weight",
    }


_BLOCK_MAPS = {
    "gemma2": lambda i, arch: _gemma2_key_map(i),
    "gpt_bigcode": lambda i, arch: _bigcode_key_map(i),
    "bloom": lambda i, arch: _bloom_key_map(i),
    "falcon": lambda i, arch: _falcon_key_map(i, arch),
    "phi": lambda i, arch: _phi_key_map(i),
    "glm": lambda i, arch: _glm_key_map(i, "glm"),
    "glm4": lambda i, arch: _glm_key_map(i, "glm4"),
    "chatglm": lambda i, arch: _chatglm_key_map(i),
    "internlm2": lambda i, arch: _internlm2_key_map(i),
    "qwen": lambda i, arch: _qwen1_key_map(i),
}


def _block_key_map(arch: A.ArchSpec, i: int,
                   model_type: str = "") -> Dict[str, str]:
    if model_type in _BLOCK_MAPS:
        return _BLOCK_MAPS[model_type](i, arch)
    return _llama_key_map(i) if arch.family == "llama" else _opt_key_map(i)


def _split_fused(bp: Dict, reader, arch: A.ArchSpec, i: int,
                 model_type: str, dt) -> None:
    """Split fused projections into canonical q/k/v (+ gate/up)."""
    qd = arch.num_heads * arch.head_dim
    kvd = arch.num_kv_heads * arch.head_dim
    if model_type == "phi3":
        p = f"model.layers.{i}.self_attn."
        qkv = reader.get(p + "qkv_proj.weight")
        if qkv is not None:
            attn = bp.setdefault("attn", {})
            attn["q"] = {"weight": _np_to_jnp(qkv[:qd], dt)}
            attn["k"] = {"weight": _np_to_jnp(qkv[qd:qd + kvd], dt)}
            attn["v"] = {"weight": _np_to_jnp(qkv[qd + kvd:], dt)}
        gu = reader.get(f"model.layers.{i}.mlp.gate_up_proj.weight")
        if gu is not None:
            inter = arch.intermediate_size
            mlp = bp.setdefault("mlp", {})
            mlp["gate"] = {"weight": _np_to_jnp(gu[:inter], dt)}
            mlp["up"] = {"weight": _np_to_jnp(gu[inter:], dt)}
    elif model_type == "gpt_bigcode":
        fused = reader.get(f"transformer.h.{i}.attn.c_attn.weight")
        fbias = reader.get(f"transformer.h.{i}.attn.c_attn.bias")
        if fused is not None:
            attn = bp.setdefault("attn", {})
            for name, sl in (("q", slice(0, qd)),
                             ("k", slice(qd, qd + kvd)),
                             ("v", slice(qd + kvd, qd + 2 * kvd))):
                attn[name] = {"weight": _np_to_jnp(fused[sl], dt)}
                if fbias is not None:
                    attn[name]["bias"] = _np_to_jnp(fbias[sl], dt)
    elif model_type == "bloom":
        # bloom fuses per-head [q, k, v] interleaved: (n_heads, 3, hd, h)
        p = f"transformer.h.{i}.self_attention.query_key_value."
        fused = reader.get(p + "weight")
        fbias = reader.get(p + "bias")
        if fused is not None:
            nh, hd = arch.num_heads, arch.head_dim
            w = fused.reshape(nh, 3, hd, -1)
            attn = bp.setdefault("attn", {})
            for j, name in enumerate(("q", "k", "v")):
                attn[name] = {"weight": _np_to_jnp(
                    w[:, j].reshape(nh * hd, -1), dt)}
                if fbias is not None:
                    b = fbias.reshape(nh, 3, hd)
                    attn[name]["bias"] = _np_to_jnp(
                        b[:, j].reshape(nh * hd), dt)
    elif model_type in ("falcon", "internlm2"):
        # grouped-GQA fused layout: (nkv, groups+2, hd, h) where each kv
        # group carries its query heads then k then v (FalconAttention
        # _split_heads / internlm2 wqkv)
        key = (f"transformer.h.{i}.self_attention.query_key_value."
               if model_type == "falcon"
               else f"model.layers.{i}.attention.wqkv.")
        fused = reader.get(key + "weight")
        fbias = reader.get(key + "bias")
        if fused is not None:
            nh, nkv, hd = arch.num_heads, arch.num_kv_heads, arch.head_dim
            g = nh // nkv
            w = fused.reshape(nkv, g + 2, hd, -1)
            attn = bp.setdefault("attn", {})
            attn["q"] = {"weight": _np_to_jnp(
                w[:, :g].reshape(nh * hd, -1), dt)}
            attn["k"] = {"weight": _np_to_jnp(
                w[:, g].reshape(nkv * hd, -1), dt)}
            attn["v"] = {"weight": _np_to_jnp(
                w[:, g + 1].reshape(nkv * hd, -1), dt)}
            if fbias is not None:
                b = fbias.reshape(nkv, g + 2, hd)
                attn["q"]["bias"] = _np_to_jnp(b[:, :g].reshape(-1), dt)
                attn["k"]["bias"] = _np_to_jnp(b[:, g].reshape(-1), dt)
                attn["v"]["bias"] = _np_to_jnp(b[:, g + 1].reshape(-1), dt)
    elif model_type == "chatglm":
        p = f"transformer.encoder.layers.{i}."
        fused = reader.get(p + "self_attention.query_key_value.weight")
        fbias = reader.get(p + "self_attention.query_key_value.bias")
        if fused is not None:  # straight [q | k | v] concat
            attn = bp.setdefault("attn", {})
            for name, sl in (("q", slice(0, qd)),
                             ("k", slice(qd, qd + kvd)),
                             ("v", slice(qd + kvd, qd + 2 * kvd))):
                attn[name] = {"weight": _np_to_jnp(fused[sl], dt)}
                if fbias is not None:
                    attn[name]["bias"] = _np_to_jnp(fbias[sl], dt)
        gu = reader.get(p + "mlp.dense_h_to_4h.weight")
        if gu is not None:  # swiglu chunk(2): first half gate, second up
            inter = arch.intermediate_size
            mlp = bp.setdefault("mlp", {})
            mlp["gate"] = {"weight": _np_to_jnp(gu[:inter], dt)}
            mlp["up"] = {"weight": _np_to_jnp(gu[inter:], dt)}
    elif model_type == "qwen":
        p = f"transformer.h.{i}.attn.c_attn."
        fused = reader.get(p + "weight")
        fbias = reader.get(p + "bias")
        if fused is not None:
            attn = bp.setdefault("attn", {})
            for name, sl in (("q", slice(0, qd)),
                             ("k", slice(qd, 2 * qd)),
                             ("v", slice(2 * qd, 3 * qd))):
                attn[name] = {"weight": _np_to_jnp(fused[sl], dt)}
                if fbias is not None:
                    attn[name]["bias"] = _np_to_jnp(fbias[sl], dt)
    elif model_type in ("glm", "glm4"):
        gu = reader.get(f"model.layers.{i}.mlp.gate_up_proj.weight")
        if gu is not None:
            inter = arch.intermediate_size
            mlp = bp.setdefault("mlp", {})
            mlp["gate"] = {"weight": _np_to_jnp(gu[:inter], dt)}
            mlp["up"] = {"weight": _np_to_jnp(gu[inter:], dt)}


# ---------------------------------------------------------------------------
# tensor reading
# ---------------------------------------------------------------------------

class _SafeOpenShard:
    """Python shard handle (safetensors.safe_open numpy framework)."""

    def __init__(self, path: str):
        self.path = path
        self._f = safe_open(path, framework="numpy")

    def get_tensor(self, key: str):
        return self._f.get_tensor(key)


class _ShardReader:
    """Streams tensors from .safetensors shards (or a single torch .bin).

    Shards open through the native mmap streamer when available
    (native/st_stream.cpp): each ``get`` is a zero-copy view into the
    mapped file, so loading a 100B+ checkpoint block-by-block keeps RSS
    at the working set instead of the shard size."""

    def __init__(self, model_dir: str):
        self.dir = model_dir
        self.weight_map: Dict[str, str] = {}
        self._handles: Dict[str, Any] = {}
        self._torch_state = None
        idx = os.path.join(model_dir, "model.safetensors.index.json")
        single = os.path.join(model_dir, "model.safetensors")
        if os.path.exists(idx):
            with open(idx) as f:
                self.weight_map = json.load(f)["weight_map"]
        elif os.path.exists(single):
            with safe_open(single, framework="numpy") as f:
                keys = list(f.keys())
            self.weight_map = {k: "model.safetensors" for k in keys}
        else:
            bins = [
                f for f in os.listdir(model_dir)
                if f.startswith("pytorch_model") and f.endswith(".bin")
            ]
            if not bins:
                raise FileNotFoundError(f"no checkpoint found in {model_dir}")
            import torch

            self._torch_state = {}
            for b in bins:
                self._torch_state.update(
                    torch.load(
                        os.path.join(model_dir, b),
                        map_location="cpu",
                        weights_only=True,
                    )
                )
            self.weight_map = {k: "" for k in self._torch_state}

    def keys(self):
        return self.weight_map.keys()

    def get(self, key: str) -> Optional[np.ndarray]:
        if key not in self.weight_map:
            return None
        if self._torch_state is not None:
            t = self._torch_state[key]
            if t.dtype.is_floating_point:
                t = t.float()
            return t.numpy()
        shard = self.weight_map[key]
        if shard not in self._handles:
            self._handles[shard] = self._open_shard(shard)
        f = self._handles[shard]
        if not isinstance(f, _SafeOpenShard):
            t = f.get(key)  # native mmap path: zero-copy view
            if t is not None:
                if t.dtype == np.uint16 and f.dtype_of(key) == "BF16":
                    return t  # raw bf16 bits; _np_to_jnp decodes
                return t
            # dtype the native map doesn't cover: python fallback
            f = _SafeOpenShard(os.path.join(self.dir, shard))
        try:
            return f.get_tensor(key)
        except (TypeError, ValueError, AttributeError):
            # bf16/fp8 not representable in numpy (fp8 raises
            # AttributeError: no np.float8_e4m3fn): go through torch
            import torch  # noqa: F401
            from safetensors.torch import load_file

            t = load_file(os.path.join(self.dir, shard))[key]
            return t.float().numpy()

    def _open_shard(self, shard: str):
        """Prefer the native mmap streamer (zero-copy views; the C++
        checkpoint-IO runtime component, native/st_stream.cpp); fall back
        to safetensors.safe_open when no compiler is available or
        LCTPU_NATIVE_IO=0."""
        path = os.path.join(self.dir, shard)
        if os.environ.get("LCTPU_NATIVE_IO", "1") != "0":
            try:
                from ..native import NativeShardStreamer, native_available

                if native_available():
                    return NativeShardStreamer(path)
            except Exception:
                pass
        return _SafeOpenShard(path)


class _Fp8DequantReader:
    """FP8 block-quantized checkpoint reader (DeepSeek-V3/R1 format).

    The reference streams such checkpoints into ``LlmcFp8Linear`` modules
    and round-trips FP8<->bf16 at every algorithm touch point
    (base_model.py:205-264, quant.py:18-43).  TPU-native choice: dequantize
    at load — every ``<name>.weight`` with a companion
    ``<name>.weight_scale_inv`` (per ``weight_block_size`` 2D blocks, HF
    ``quantization_config``) is expanded to float on read, so the rest of
    the pipeline sees ordinary weights; re-export to FP8 goes through
    ``quant.weight_cast_to_fp8``.  Combined with the host-offload streaming
    loader this is the single-host analogue of the reference's
    671B-on-80GB trick.
    """

    def __init__(self, reader, block_size=(128, 128)):
        self._r = reader
        self.bs = tuple(block_size)

    @property
    def weight_map(self):
        return self._r.weight_map

    def keys(self):
        return self._r.keys()

    def get(self, key: str) -> Optional[np.ndarray]:
        t = self._r.get(key)
        if t is None or not key.endswith(".weight"):
            return t
        sk = key[: -len(".weight")] + ".weight_scale_inv"
        if sk not in self._r.weight_map or t.ndim != 2:
            return t
        s = self._r.get(sk).astype(np.float32)  # (ceil(oc/b0), ceil(ic/b1))
        b0, b1 = self.bs
        oc, ic = t.shape
        se = np.repeat(np.repeat(s, b0, axis=0)[:oc],
                       b1, axis=1)[:, :ic]
        return t.astype(np.float32) * se


def _np_to_jnp(a: np.ndarray, dtype) -> jnp.ndarray:
    if a.dtype == np.uint16:  # raw bf16 bits from safetensors-numpy
        a = a.view(np.uint16)
        out = jnp.asarray(a).view(jnp.bfloat16)
        return out.astype(dtype)
    if np.issubdtype(a.dtype, np.floating):
        return jnp.asarray(a, dtype=dtype)
    return jnp.asarray(a)


# ---------------------------------------------------------------------------
# load / save
# ---------------------------------------------------------------------------

def _moe_key_prefixes(model_type: str, i: int):
    if model_type == "mixtral":
        p = f"model.layers.{i}.block_sparse_moe."
        return {
            "router": p + "gate.weight",
            "expert": lambda e, proj: p + f"experts.{e}." + {
                "gate": "w1", "up": "w3", "down": "w2"
            }[proj] + ".weight",
            "shared": None,
        }
    p = f"model.layers.{i}.mlp."
    return {
        "router": p + "gate.weight",
        "expert": lambda e, proj: p + f"experts.{e}.{proj}_proj.weight",
        "shared": (
            lambda proj: p + (
                f"shared_expert.{proj}_proj.weight"
                if model_type == "qwen2_moe"
                else f"shared_experts.{proj}_proj.weight"
            )
        ),
    }


class _PrefixReader:
    """View of a _ShardReader with a key prefix (nested submodels like
    language_model.* inside multimodal checkpoints)."""

    def __init__(self, reader, prefix: str):
        self._r = reader
        self._p = prefix

    def keys(self):
        return [k[len(self._p):] for k in self._r.keys()
                if k.startswith(self._p)]

    def get(self, key: str):
        return self._r.get(self._p + key)


def load_params(model_dir: str, arch: A.ArchSpec,
                model_type: str = "llama", reader=None) -> Dict:
    if reader is None:
        reader = _ShardReader(model_dir)
    dt = arch.dtype

    def fill(key_map: Dict[str, str]) -> Dict:
        out: Dict[str, Any] = {}
        for canon, hf_key in key_map.items():
            t = reader.get(hf_key)
            if t is None:
                continue
            parts = canon.split(".")
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = _np_to_jnp(t, dt)
        return out

    if model_type == "gpt_bigcode":
        top_map = {
            "embed.weight": "transformer.wte.weight",
            "embed_pos.weight": "transformer.wpe.weight",
            "norm.weight": "transformer.ln_f.weight",
            "norm.bias": "transformer.ln_f.bias",
        }
    else:
        top_map = _top_key_map(arch, model_type)
    params = fill(top_map)
    params["blocks"] = []
    for i in range(arch.num_layers):
        bp = fill(_block_key_map(arch, i, model_type))
        _split_fused(bp, reader, arch, i, model_type, dt)
        if arch.mla is not None:
            p = f"model.layers.{i}.self_attn."
            mla_map = {
                "attn.q.weight": p + "q_proj.weight",
                "attn.q_a.weight": p + "q_a_proj.weight",
                "attn.q_a_norm.weight": p + "q_a_layernorm.weight",
                "attn.q_b.weight": p + "q_b_proj.weight",
                "attn.kv_a.weight": p + "kv_a_proj_with_mqa.weight",
                "attn.kv_a_norm.weight": p + "kv_a_layernorm.weight",
                "attn.kv_b.weight": p + "kv_b_proj.weight",
            }
            extra = fill(mla_map)
            bp.setdefault("attn", {}).update(extra.get("attn", {}))
        km = _moe_key_prefixes(model_type, i) if arch.moe is not None else None
        is_moe_block = (
            arch.moe is not None and reader.get(km["router"]) is not None
        )
        if arch.moe is not None and not is_moe_block:
            pass  # dense block (first_k_dense_replace): llama map already
        elif arch.moe is not None:
            mlp: Dict[str, Any] = {
                "router": {"weight": _np_to_jnp(reader.get(km["router"]), dt)}
            }
            for proj in ("gate", "up", "down"):
                stacked = np.stack([
                    np.asarray(reader.get(km["expert"](e, proj)))
                    for e in range(arch.moe.num_experts)
                ])
                mlp[proj] = {"weight": _np_to_jnp(stacked, dt)}
            if arch.moe.num_shared_experts > 0 and km["shared"] is not None:
                for proj in ("gate", "up", "down"):
                    mlp[f"shared_{proj}"] = {
                        "weight": _np_to_jnp(reader.get(km["shared"](proj)), dt)
                    }
            bias = reader.get(
                f"model.layers.{i}.mlp.gate.e_score_correction_bias")
            if bias is not None:
                mlp["router_bias"] = jnp.asarray(np.asarray(bias),
                                                 jnp.float32)
            bp["mlp"] = mlp
        params["blocks"].append(bp)
    return params


def _load_audio_tower(reader, acfg: Dict, dtype):
    """audio_tower.* keys (Qwen2AudioEncoder == Whisper encoder layout)."""
    from .audio import AudioTower, make_audio_arch

    arch = make_audio_arch(
        d_model=acfg["d_model"], layers=acfg["encoder_layers"],
        heads=acfg["encoder_attention_heads"], ffn=acfg["encoder_ffn_dim"],
        num_mel_bins=acfg.get("num_mel_bins", 128),
        max_source_positions=acfg.get("max_source_positions", 1500),
        dtype=dtype,
    )

    def g(k):
        t = reader.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    params: Dict[str, Any] = {
        "conv1": {"weight": g("conv1.weight"), "bias": g("conv1.bias")},
        "conv2": {"weight": g("conv2.weight"), "bias": g("conv2.bias")},
        "pos_embed": g("embed_positions.weight"),
        "norm": {"weight": g("layer_norm.weight"),
                 "bias": g("layer_norm.bias")},
        "blocks": [],
    }
    for i in range(arch.num_layers):
        p = f"layers.{i}."
        bp: Dict[str, Any] = {
            "ln1": {"weight": g(p + "self_attn_layer_norm.weight"),
                    "bias": g(p + "self_attn_layer_norm.bias")},
            "ln2": {"weight": g(p + "final_layer_norm.weight"),
                    "bias": g(p + "final_layer_norm.bias")},
            "attn": {}, "mlp": {},
        }
        for c, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                      ("o", "out_proj")):
            node = {"weight": g(p + f"self_attn.{hf}.weight")}
            b = g(p + f"self_attn.{hf}.bias")
            if b is not None:
                node["bias"] = b
            bp["attn"][c] = node
        for c in ("fc1", "fc2"):
            bp["mlp"][c] = {"weight": g(p + f"{c}.weight"),
                            "bias": g(p + f"{c}.bias")}
        params["blocks"].append(bp)
    return AudioTower(arch, params,
                      num_mel_bins=acfg.get("num_mel_bins", 128))


def _load_qwen2audio(model_dir: str, cfg: Dict, dtype, tok):
    from ..registry import MODEL_REGISTRY
    from .audio import Qwen2Audio

    reader = _ShardReader(model_dir)
    tcfg = cfg["text_config"]
    arch = arch_from_hf_config(tcfg, dtype=dtype)
    lang_params = load_params(
        model_dir, arch, tcfg.get("model_type", "qwen2"),
        reader=_PrefixReader(reader, "language_model."),
    )
    lang = MODEL_REGISTRY["Qwen2"](arch, lang_params)
    tower = _load_audio_tower(_PrefixReader(reader, "audio_tower."),
                              cfg["audio_config"], dtype)
    proj = {
        "weight": _np_to_jnp(
            reader.get("multi_modal_projector.linear.weight"), dtype),
    }
    pb = reader.get("multi_modal_projector.linear.bias")
    if pb is not None:
        proj["bias"] = _np_to_jnp(pb, dtype)
    return Qwen2Audio(lang, tower, proj, tokenizer=tok, config=cfg,
                      audio_token_id=cfg.get("audio_token_index", 151646))


def _load_clip_vision_tower(reader, vcfg: Dict, dtype):
    """CLIPVisionModel keys -> our Vit (pre-LN, quick_gelu, CLS+pos)."""
    import dataclasses as _dc

    from .vit import Vit, make_vit_arch

    arch = make_vit_arch(
        image_size=vcfg["image_size"], patch_size=vcfg["patch_size"],
        hidden=vcfg["hidden_size"], inter=vcfg["intermediate_size"],
        layers=vcfg["num_hidden_layers"],
        heads=vcfg["num_attention_heads"], num_classes=1, dtype=dtype,
    )
    arch = _dc.replace(arch, act_fn={"quick_gelu": "quick_gelu"}.get(
        vcfg.get("hidden_act", "quick_gelu"), "gelu"))

    def g(k):
        t = reader.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    e = "vision_model.embeddings."
    conv = reader.get(e + "patch_embedding.weight")  # (h, C, P, P)
    P = vcfg["patch_size"]
    params: Dict[str, Any] = {
        "patch_embed": {"weight": _np_to_jnp(
            conv.transpose(0, 2, 3, 1).reshape(conv.shape[0], -1), dtype)},
        "cls_token": g(e + "class_embedding").reshape(1, 1, -1),
        "pos_embed": g(e + "position_embedding.weight")[None],
        "pre_ln": {"weight": g("vision_model.pre_layrnorm.weight"),
                   "bias": g("vision_model.pre_layrnorm.bias")},
        "norm": {"weight": g("vision_model.post_layernorm.weight"),
                 "bias": g("vision_model.post_layernorm.bias")},
        "blocks": [],
    }
    for i in range(arch.num_layers):
        p = f"vision_model.encoder.layers.{i}."
        bp: Dict[str, Any] = {
            "ln1": {"weight": g(p + "layer_norm1.weight"),
                    "bias": g(p + "layer_norm1.bias")},
            "ln2": {"weight": g(p + "layer_norm2.weight"),
                    "bias": g(p + "layer_norm2.bias")},
            "attn": {}, "mlp": {},
        }
        for c, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                      ("o", "out_proj")):
            bp["attn"][c] = {"weight": g(p + f"self_attn.{hf}.weight"),
                             "bias": g(p + f"self_attn.{hf}.bias")}
        for c in ("fc1", "fc2"):
            bp["mlp"][c] = {"weight": g(p + f"mlp.{c}.weight"),
                            "bias": g(p + f"mlp.{c}.bias")}
        params["blocks"].append(bp)
    return Vit(arch, params, patch_size=P)


def _load_siglip_vision_tower(reader, vcfg: Dict, dtype):
    """SiglipVisionModel keys -> our Vit: no CLS token, no pre-layernorm,
    gelu_pytorch_tanh, biased patch embedding.  Used by the LLaVA-OneVision
    (reference llmc/models/llava_onevision.py) and VILA (vila.py) towers."""
    from .vit import Vit, make_vit_arch

    arch = make_vit_arch(
        image_size=vcfg["image_size"], patch_size=vcfg["patch_size"],
        hidden=vcfg["hidden_size"], inter=vcfg["intermediate_size"],
        layers=vcfg["num_hidden_layers"],
        heads=vcfg["num_attention_heads"], num_classes=1, dtype=dtype,
        cls_token=False, act_fn="gelu_tanh",
    )

    def g(k):
        t = reader.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    e = "vision_model.embeddings."
    conv = reader.get(e + "patch_embedding.weight")  # (h, C, P, P)
    P = vcfg["patch_size"]
    params: Dict[str, Any] = {
        "patch_embed": {
            "weight": _np_to_jnp(
                conv.transpose(0, 2, 3, 1).reshape(conv.shape[0], -1), dtype),
            "bias": g(e + "patch_embedding.bias"),
        },
        "pos_embed": g(e + "position_embedding.weight")[None],
        "norm": {"weight": g("vision_model.post_layernorm.weight"),
                 "bias": g("vision_model.post_layernorm.bias")},
        "blocks": [],
    }
    for i in range(arch.num_layers):
        p = f"vision_model.encoder.layers.{i}."
        bp: Dict[str, Any] = {
            "ln1": {"weight": g(p + "layer_norm1.weight"),
                    "bias": g(p + "layer_norm1.bias")},
            "ln2": {"weight": g(p + "layer_norm2.weight"),
                    "bias": g(p + "layer_norm2.bias")},
            "attn": {}, "mlp": {},
        }
        for c, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                      ("o", "out_proj")):
            bp["attn"][c] = {"weight": g(p + f"self_attn.{hf}.weight"),
                             "bias": g(p + f"self_attn.{hf}.bias")}
        for c in ("fc1", "fc2"):
            bp["mlp"][c] = {"weight": g(p + f"mlp.{c}.weight"),
                            "bias": g(p + f"mlp.{c}.bias")}
        params["blocks"].append(bp)
    return Vit(arch, params, patch_size=P)


def _vlm_prefix(keys, name: str) -> str:
    """transformers >=4.52 nests VLM submodels under 'model.'."""
    return (f"model.{name}." if any(
        k.startswith(f"model.{name}.") for k in keys) else f"{name}.")


def _load_vlm_language(reader, model_dir: str, cfg: Dict, dtype):
    """Load the language side of a composite VLM checkpoint.

    Handles both flat ('language_model.…') and nested
    ('model.language_model.…' + top-level 'lm_head.weight') layouts."""
    from ..registry import MODEL_REGISTRY

    keys = list(reader.keys())
    tcfg = cfg["text_config"]
    arch = arch_from_hf_config(tcfg, dtype=dtype)
    if not any(k.startswith(("language_model.", "model.language_model."))
               for k in keys):
        # flat layout (qwen2-vl style): LM lives at model.layers.* directly
        lang_params = load_params(model_dir, arch,
                                  tcfg.get("model_type", "llama"),
                                  reader=reader)
        cls_name = {"llama": "Llama", "mistral": "Mistral",
                    "qwen2": "Qwen2"}.get(tcfg.get("model_type", "llama"),
                                          "Llama")
        return MODEL_REGISTRY[cls_name](arch, lang_params)
    lang_p = _vlm_prefix(keys, "language_model")
    lr = _PrefixReader(reader, lang_p)
    if lang_p == "model.language_model.":
        # keys inside are "model.language_model.layers..." -> llama map
        # expects "model.layers..."; re-prefix accordingly
        class _R:
            def keys(self):
                return ["model." + k for k in lr.keys()] + (
                    ["lm_head.weight"] if reader.get("lm_head.weight")
                    is not None else [])

            def get(self, k):
                if k == "lm_head.weight":
                    return reader.get("lm_head.weight")
                return lr.get(k[len("model."):]) if k.startswith("model.") \
                    else None
        lang_reader = _R()
    else:
        lang_reader = lr
    lang_params = load_params(model_dir, arch,
                              tcfg.get("model_type", "llama"),
                              reader=lang_reader)
    cls_name = {"llama": "Llama", "mistral": "Mistral",
                "qwen2": "Qwen2"}.get(tcfg.get("model_type", "llama"),
                                      "Llama")
    return MODEL_REGISTRY[cls_name](arch, lang_params)


def _load_llava(model_dir: str, cfg: Dict, dtype, tok):
    from .llava import Llava

    reader = _ShardReader(model_dir)
    keys = list(reader.keys())
    vis_p = _vlm_prefix(keys, "vision_tower")
    proj_p = _vlm_prefix(keys, "multi_modal_projector")
    lang = _load_vlm_language(reader, model_dir, cfg, dtype)
    vit = _load_clip_vision_tower(_PrefixReader(reader, vis_p),
                                  cfg["vision_config"], dtype)

    def g(k):
        t = reader.get(proj_p + k)
        return None if t is None else _np_to_jnp(t, dtype)

    projector = {
        "fc1": {"weight": g("linear_1.weight"), "bias": g("linear_1.bias")},
        "fc2": {"weight": g("linear_2.weight"), "bias": g("linear_2.bias")},
    }
    m = Llava(lang, vit, projector, tokenizer=tok, config=cfg,
              image_token_id=cfg.get("image_token_index", 32000))
    m.vision_feature_layer = cfg.get("vision_feature_layer", -2)
    return m


def _load_llava_onevision(model_dir: str, cfg: Dict, dtype, tok):
    """HF LlavaOnevisionForConditionalGeneration checkpoint (reference
    llava_onevision.py): SigLIP tower + linear_1/linear_2 projector +
    image_newline + Qwen2 LM."""
    from .vlm import LlavaOnevision

    reader = _ShardReader(model_dir)
    keys = list(reader.keys())
    vis_p = _vlm_prefix(keys, "vision_tower")
    proj_p = _vlm_prefix(keys, "multi_modal_projector")
    lang = _load_vlm_language(reader, model_dir, cfg, dtype)
    vit = _load_siglip_vision_tower(_PrefixReader(reader, vis_p),
                                    cfg["vision_config"], dtype)

    def g(k):
        t = reader.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    projector = {
        "fc1": {"weight": g(proj_p + "linear_1.weight"),
                "bias": g(proj_p + "linear_1.bias")},
        "fc2": {"weight": g(proj_p + "linear_2.weight"),
                "bias": g(proj_p + "linear_2.bias")},
    }
    nl = g("model.image_newline")
    if nl is None:
        nl = g("image_newline")
    m = LlavaOnevision(lang, vit, projector, tokenizer=tok, config=cfg,
                       image_token_id=cfg.get("image_token_index", 151646),
                       image_newline=nl)
    m.vision_feature_layer = cfg.get("vision_feature_layer", -1)
    return m


def _load_video_llava(model_dir: str, cfg: Dict, dtype, tok):
    """HF VideoLlavaForConditionalGeneration (reference videollava.py):
    twin CLIP-layout towers (image_tower/video_tower), shared projector."""
    from .vlm import VideoLlava

    reader = _ShardReader(model_dir)
    keys = list(reader.keys())
    img_p = _vlm_prefix(keys, "image_tower")
    vid_p = _vlm_prefix(keys, "video_tower")
    proj_p = _vlm_prefix(keys, "multi_modal_projector")
    lang = _load_vlm_language(reader, model_dir, cfg, dtype)
    img_tower = _load_clip_vision_tower(_PrefixReader(reader, img_p),
                                        cfg["vision_config"], dtype)
    vid_tower = _load_clip_vision_tower(_PrefixReader(reader, vid_p),
                                        cfg["vision_config"], dtype)

    def g(k):
        t = reader.get(proj_p + k)
        return None if t is None else _np_to_jnp(t, dtype)

    projector = {
        "fc1": {"weight": g("linear_1.weight"), "bias": g("linear_1.bias")},
        "fc2": {"weight": g("linear_2.weight"), "bias": g("linear_2.bias")},
    }
    m = VideoLlava(lang, img_tower, projector, video_tower=vid_tower,
                   tokenizer=tok, config=cfg,
                   image_token_id=cfg.get("image_token_index", 32000),
                   video_token_id=cfg.get("video_token_index", 32001))
    m.vision_feature_layer = cfg.get("vision_feature_layer", -2)
    return m


def _load_internvl_vision_tower(reader, vcfg: Dict, dtype):
    """HF InternVLVisionModel (InternViT) -> our Vit: CLS + abs positions,
    layer-scale lambda_1/lambda_2, biasless q/k/v, optional full-dim QK
    RMSNorm, exact-erf GELU."""
    from .vit import Vit, make_vit_arch

    img = vcfg["image_size"]
    img = img[0] if isinstance(img, (list, tuple)) else img
    P = vcfg["patch_size"]
    P = P[0] if isinstance(P, (list, tuple)) else P
    arch = make_vit_arch(
        image_size=img, patch_size=P, hidden=vcfg["hidden_size"],
        inter=vcfg["intermediate_size"], layers=vcfg["num_hidden_layers"],
        heads=vcfg["num_attention_heads"], num_classes=1, dtype=dtype,
        act_fn="gelu_exact",
    )

    def g(k):
        t = reader.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    e = "embeddings."
    conv = reader.get(e + "patch_embeddings.projection.weight")
    params: Dict[str, Any] = {
        "patch_embed": {
            "weight": _np_to_jnp(
                conv.transpose(0, 2, 3, 1).reshape(conv.shape[0], -1), dtype),
            "bias": g(e + "patch_embeddings.projection.bias"),
        },
        "cls_token": g(e + "cls_token").reshape(1, 1, -1),
        "pos_embed": g(e + "position_embeddings").reshape(
            1, -1, vcfg["hidden_size"]),
        "blocks": [],
    }
    fln = g("layernorm.weight")  # absent when use_mean_pooling (Identity)
    if fln is not None:
        params["norm"] = {"weight": fln, "bias": g("layernorm.bias")}
    for i in range(arch.num_layers):
        p = f"encoder.layer.{i}."
        bp: Dict[str, Any] = {
            "ln1": {"weight": g(p + "layernorm_before.weight"),
                    "bias": g(p + "layernorm_before.bias")},
            "ln2": {"weight": g(p + "layernorm_after.weight"),
                    "bias": g(p + "layernorm_after.bias")},
            "ls1": g(p + "lambda_1"),
            "ls2": g(p + "lambda_2"),
            "attn": {}, "mlp": {},
        }
        for c, hf in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                      ("o", "projection_layer")):
            w = {"weight": g(p + f"attention.{hf}.weight")}
            b = g(p + f"attention.{hf}.bias")
            if b is not None:
                w["bias"] = b
            bp["attn"][c] = w
        qn = g(p + "attention.q_norm.weight")
        if qn is not None:
            bp["attn"]["q_norm_full"] = {"weight": qn}
            bp["attn"]["k_norm_full"] = {
                "weight": g(p + "attention.k_norm.weight")}
        if bp["ls1"] is None:
            bp.pop("ls1"), bp.pop("ls2")
        for c in ("fc1", "fc2"):
            bp["mlp"][c] = {"weight": g(p + f"mlp.{c}.weight"),
                            "bias": g(p + f"mlp.{c}.bias")}
        params["blocks"].append(bp)
    return Vit(arch, params, patch_size=P)


def _load_internvl(model_dir: str, cfg: Dict, dtype, tok):
    """HF InternVLForConditionalGeneration (reference internvl2.py /
    internvl3_5.py): InternViT + pixel-shuffle projector + Qwen2/Llama LM."""
    from .vlm import InternVL

    reader = _ShardReader(model_dir)
    keys = list(reader.keys())
    vis_p = _vlm_prefix(keys, "vision_tower")
    proj_p = _vlm_prefix(keys, "multi_modal_projector")
    lang = _load_vlm_language(reader, model_dir, cfg, dtype)
    vit = _load_internvl_vision_tower(_PrefixReader(reader, vis_p),
                                      cfg["vision_config"], dtype)

    def g(k):
        t = reader.get(proj_p + k)
        return None if t is None else _np_to_jnp(t, dtype)

    projector = {
        "ln": {"weight": g("layer_norm.weight"), "bias": g("layer_norm.bias")},
        "fc1": {"weight": g("linear_1.weight"), "bias": g("linear_1.bias")},
        "fc2": {"weight": g("linear_2.weight"), "bias": g("linear_2.bias")},
    }
    m = InternVL(lang, vit, projector, tokenizer=tok, config=cfg,
                 image_token_id=cfg.get("image_token_id", 151667))
    m.vision_feature_layer = cfg.get("vision_feature_layer", -1)
    m.downsample_ratio = cfg.get("downsample_ratio", 0.5)
    return m


def _load_qwen_vl(model_dir: str, cfg: Dict, dtype, tok):
    """Qwen2-VL / Qwen2.5-VL checkpoints (reference qwen2vl.py,
    qwen2_5vl.py): packed-sequence tower (fused qkv split into q/k/v rows —
    identical numerics, per-row quantization unaffected) + Qwen2 LM with
    M-RoPE."""
    from .qwen_vl import Qwen2VL, QwenVLVisionSpec, QwenVLVisionTower

    v25 = cfg.get("model_type") == "qwen2_5_vl"
    vcfg = cfg["vision_config"]
    reader = _ShardReader(model_dir)
    keys = list(reader.keys())
    vis_p = _vlm_prefix(keys, "visual")

    if v25:
        spec = QwenVLVisionSpec(
            depth=vcfg["depth"], embed_dim=vcfg["hidden_size"],
            out_hidden=vcfg["out_hidden_size"],
            num_heads=vcfg["num_heads"],
            intermediate=vcfg["intermediate_size"],
            patch_size=vcfg["patch_size"],
            spatial_merge_size=vcfg.get("spatial_merge_size", 2),
            temporal_patch_size=vcfg.get("temporal_patch_size", 2),
            v25=True, window_size=vcfg.get("window_size", 112),
            fullatt_block_indexes=tuple(
                vcfg.get("fullatt_block_indexes", ())),
            dtype=dtype)
    else:
        spec = QwenVLVisionSpec(
            depth=vcfg["depth"], embed_dim=vcfg["embed_dim"],
            out_hidden=vcfg["hidden_size"], num_heads=vcfg["num_heads"],
            intermediate=int(vcfg["embed_dim"] * vcfg.get("mlp_ratio", 4)),
            patch_size=vcfg["patch_size"],
            spatial_merge_size=vcfg.get("spatial_merge_size", 2),
            temporal_patch_size=vcfg.get("temporal_patch_size", 2),
            dtype=dtype)

    vr = _PrefixReader(reader, vis_p)

    def g(k):
        t = vr.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    def norm_p(prefix):
        p = {"weight": g(prefix + ".weight")}
        b = g(prefix + ".bias")
        if b is not None:
            p["bias"] = b
        return p

    def lin_p(prefix):
        p = {"weight": g(prefix + ".weight")}
        b = g(prefix + ".bias")
        if b is not None:
            p["bias"] = b
        return p

    conv = vr.get("patch_embed.proj.weight")  # (D, C, tps, P, P)
    vparams: Dict[str, Any] = {
        "patch_embed": {"weight": _np_to_jnp(
            conv.reshape(conv.shape[0], -1), dtype)},
        "blocks": [],
        "merger": {"ln_q": norm_p("merger.ln_q"),
                   "fc1": lin_p("merger.mlp.0"),
                   "fc2": lin_p("merger.mlp.2")},
    }
    D = spec.embed_dim
    for i in range(spec.depth):
        p = f"blocks.{i}."
        qkv_w = vr.get(p + "attn.qkv.weight")
        qkv_b = vr.get(p + "attn.qkv.bias")
        attn = {}
        for j, c in enumerate(("q", "k", "v")):
            attn[c] = {"weight": _np_to_jnp(qkv_w[j * D:(j + 1) * D], dtype)}
            if qkv_b is not None:
                attn[c]["bias"] = _np_to_jnp(qkv_b[j * D:(j + 1) * D], dtype)
        attn["o"] = lin_p(p + "attn.proj")
        mlp = ({"gate": lin_p(p + "mlp.gate_proj"),
                "up": lin_p(p + "mlp.up_proj"),
                "down": lin_p(p + "mlp.down_proj")} if v25 else
               {"fc1": lin_p(p + "mlp.fc1"), "fc2": lin_p(p + "mlp.fc2")})
        vparams["blocks"].append({
            "ln1": norm_p(p + "norm1"), "ln2": norm_p(p + "norm2"),
            "attn": attn, "mlp": mlp,
        })
    tower = QwenVLVisionTower(spec, vparams)

    tcfg = dict(cfg["text_config"])
    tcfg["model_type"] = "qwen2"
    lang_cfg = dict(cfg)
    lang_cfg["text_config"] = tcfg
    lang = _load_vlm_language(reader, model_dir, lang_cfg, dtype)
    mrope = tuple((tcfg.get("rope_scaling") or {}).get(
        "mrope_section", (16, 24, 24)))
    return Qwen2VL(
        lang, tower, tokenizer=tok, config=cfg,
        image_token_id=cfg.get("image_token_id", 151655),
        video_token_id=cfg.get("video_token_id", 151656),
        vision_start_token_id=cfg.get("vision_start_token_id", 151652),
        mrope_section=mrope)


def _load_mllama(model_dir: str, cfg: Dict, dtype, tok):
    """HF MllamaForConditionalGeneration (reference mllama.py): tiled gated
    vision tower + Llama LM with tanh-gated cross-attention layers."""
    from .mllama import Mllama, MllamaVisionModel, MllamaVisionSpec

    vcfg = cfg["vision_config"]
    tcfg = dict(cfg["text_config"])
    reader = _ShardReader(model_dir)
    keys = list(reader.keys())
    vis_p = _vlm_prefix(keys, "vision_model")
    proj_p = _vlm_prefix(keys, "multi_modal_projector")
    # mllama nests an LM-with-head: language_model.model.* + its lm_head
    lang_p = next(p for p in ("language_model.model.",
                              "model.language_model.", "language_model.")
                  if any(k.startswith(p) for k in keys))
    head_key = next(k for k in ("language_model.lm_head.weight",
                                "lm_head.weight") if reader.get(k)
                    is not None)
    vr = _PrefixReader(reader, vis_p)

    def gv(k):
        t = vr.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    spec = MllamaVisionSpec(
        hidden=vcfg["hidden_size"], intermediate=vcfg["intermediate_size"],
        num_layers=vcfg["num_hidden_layers"],
        num_global_layers=vcfg["num_global_layers"],
        num_heads=vcfg["attention_heads"], patch_size=vcfg["patch_size"],
        image_size=vcfg["image_size"] if not isinstance(
            vcfg["image_size"], (list, tuple)) else vcfg["image_size"][0],
        max_num_tiles=vcfg["max_num_tiles"],
        intermediate_layers_indices=tuple(
            vcfg["intermediate_layers_indices"]),
        dtype=dtype)

    conv = vr.get("patch_embedding.weight")
    vparams: Dict[str, Any] = {
        "patch_embed": {"weight": _np_to_jnp(
            conv.transpose(0, 2, 3, 1).reshape(conv.shape[0], -1), dtype)},
        "class_embedding": gv("class_embedding"),
        "pos_embed": {
            "gate": gv("gated_positional_embedding.gate"),
            "embedding": gv("gated_positional_embedding.embedding"),
            "tile_embedding": gv(
                "gated_positional_embedding.tile_embedding.weight"),
        },
        "pre_tile_pos": {
            "gate": gv("pre_tile_positional_embedding.gate"),
            "embedding": gv("pre_tile_positional_embedding.embedding.weight"),
        },
        "post_tile_pos": {
            "gate": gv("post_tile_positional_embedding.gate"),
            "embedding": gv(
                "post_tile_positional_embedding.embedding.weight"),
        },
        "ln_pre": {"weight": gv("layernorm_pre.weight"),
                   "bias": gv("layernorm_pre.bias")},
        "ln_post": {"weight": gv("layernorm_post.weight"),
                    "bias": gv("layernorm_post.bias")},
        "blocks": [],
    }

    def vis_block(prefix, gated):
        bp: Dict[str, Any] = {
            "ln1": {"weight": gv(prefix + "input_layernorm.weight"),
                    "bias": gv(prefix + "input_layernorm.bias")},
            "ln2": {"weight": gv(prefix + "post_attention_layernorm.weight"),
                    "bias": gv(prefix + "post_attention_layernorm.bias")},
            "attn": {c: {"weight": gv(prefix + f"self_attn.{h}_proj.weight")}
                     for c, h in (("q", "q"), ("k", "k"), ("v", "v"),
                                  ("o", "o"))},
            "mlp": {c: {"weight": gv(prefix + f"mlp.{c}.weight"),
                        "bias": gv(prefix + f"mlp.{c}.bias")}
                    for c in ("fc1", "fc2")},
        }
        if gated:
            bp["gate_attn"] = gv(prefix + "gate_attn")
            bp["gate_ffn"] = gv(prefix + "gate_ffn")
        return bp

    for i in range(spec.num_layers):
        vparams["blocks"].append(vis_block(f"transformer.layers.{i}.", False))
    for i in range(spec.num_global_layers):
        vparams["blocks"].append(
            vis_block(f"global_transformer.layers.{i}.", True))
    vision = MllamaVisionModel(spec, vparams)

    # language side: mixed self / cross blocks
    tcfg["model_type"] = "llama"
    arch = arch_from_hf_config(tcfg, dtype=dtype)
    lr = _PrefixReader(reader, lang_p)

    def gl(k):
        t = lr.get(k)
        if t is None and lang_p == "model.language_model.":
            t = lr.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    cross_layers = set(tcfg.get("cross_attention_layers", []))
    blocks = []
    for i in range(arch.num_layers):
        p = f"layers.{i}."
        if i in cross_layers:
            blocks.append({
                "ln1": {"weight": gl(p + "input_layernorm.weight")},
                "ln2": {"weight": gl(
                    p + "post_attention_layernorm.weight")},
                "attn": {
                    "q": {"weight": gl(p + "cross_attn.q_proj.weight")},
                    "k": {"weight": gl(p + "cross_attn.k_proj.weight")},
                    "v": {"weight": gl(p + "cross_attn.v_proj.weight")},
                    "o": {"weight": gl(p + "cross_attn.o_proj.weight")},
                    "q_norm": {"weight": gl(p + "cross_attn.q_norm.weight")},
                    "k_norm": {"weight": gl(p + "cross_attn.k_norm.weight")},
                },
                "gate_attn": gl(p + "cross_attn_attn_gate"),
                "gate_mlp": gl(p + "cross_attn_mlp_gate"),
                "mlp": {c: {"weight": gl(p + f"mlp.{h}_proj.weight")}
                        for c, h in (("gate", "gate"), ("up", "up"),
                                     ("down", "down"))},
            })
        else:
            blocks.append({
                "ln1": {"weight": gl(p + "input_layernorm.weight")},
                "ln2": {"weight": gl(
                    p + "post_attention_layernorm.weight")},
                "attn": {c: {"weight": gl(p + f"self_attn.{c}_proj.weight")}
                         for c in ("q", "k", "v", "o")},
                "mlp": {c: {"weight": gl(p + f"mlp.{h}_proj.weight")}
                        for c, h in (("gate", "gate"), ("up", "up"),
                                     ("down", "down"))},
            })
    head = reader.get(head_key)
    params = {
        "embed": {"weight": _np_to_jnp(lr.get("embed_tokens.weight"), dtype)},
        "norm": {"weight": gl("norm.weight")},
        "lm_head": {"weight": _np_to_jnp(head, dtype)},
        "blocks": blocks,
    }
    projector = {"weight": _np_to_jnp(reader.get(proj_p + "weight"), dtype),
                 "bias": _np_to_jnp(reader.get(proj_p + "bias"), dtype)}
    return Mllama(arch, params, vision, projector, cross_layers,
                  tokenizer=tok, config=cfg,
                  image_token_id=cfg.get("image_token_index", 128256))


def _load_glm4v(model_dir: str, cfg: Dict, dtype, tok):
    """HF Glm4vForConditionalGeneration (reference glm4v.py): Qwen2.5-style
    tower + abs pos + conv downsample + gated merger; GLM-4 LM with M-RoPE
    over the GLM interleaved partial rope."""
    from .qwen_vl import Glm4vVisionTower, Glm4VL, QwenVLVisionSpec

    vcfg = cfg["vision_config"]
    reader = _ShardReader(model_dir)
    keys = list(reader.keys())
    vis_p = _vlm_prefix(keys, "visual")
    vr = _PrefixReader(reader, vis_p)

    def g(k):
        t = vr.get(k)
        return None if t is None else _np_to_jnp(t, dtype)

    def lin_p(prefix):
        p = {"weight": g(prefix + ".weight")}
        b = g(prefix + ".bias")
        if b is not None:
            p["bias"] = b
        return p

    spec = QwenVLVisionSpec(
        depth=vcfg["depth"], embed_dim=vcfg["hidden_size"],
        out_hidden=vcfg["out_hidden_size"], num_heads=vcfg["num_heads"],
        intermediate=vcfg["intermediate_size"],
        patch_size=vcfg["patch_size"],
        spatial_merge_size=vcfg.get("spatial_merge_size", 2),
        temporal_patch_size=vcfg.get("temporal_patch_size", 2),
        v25=True, fullatt_block_indexes=tuple(range(vcfg["depth"])),
        dtype=dtype)
    conv = vr.get("patch_embed.proj.weight")
    ds_conv = vr.get("downsample.weight")  # (out, D, m, m)
    vparams: Dict[str, Any] = {
        "patch_embed": {
            "weight": _np_to_jnp(conv.reshape(conv.shape[0], -1), dtype),
            "bias": g("patch_embed.proj.bias"),
        },
        "post_conv_ln": {"weight": g("post_conv_layernorm.weight")},
        "post_ln": {"weight": g("post_layernorm.weight")},
        "pos_embed": g("embeddings.position_embedding.weight"),
        # conv2d (out, D, m, m) == linear on merge-group (m, m, D) tokens:
        # token-major layout is (m*m, D) so flatten kernel to (out, m*m*D)
        # with spatial-major order
        "downsample": {
            "weight": _np_to_jnp(
                ds_conv.transpose(0, 2, 3, 1).reshape(ds_conv.shape[0], -1),
                dtype),
            "bias": g("downsample.bias"),
        },
        "merger": {
            "proj": lin_p("merger.proj"),
            "post_norm": lin_p("merger.post_projection_norm"),
            "gate": lin_p("merger.gate_proj"),
            "up": lin_p("merger.up_proj"),
            "down": lin_p("merger.down_proj"),
        },
        "blocks": [],
    }
    D = spec.embed_dim
    for i in range(spec.depth):
        p = f"blocks.{i}."
        qkv_w = vr.get(p + "attn.qkv.weight")
        qkv_b = vr.get(p + "attn.qkv.bias")
        attn = {}
        for j, c in enumerate(("q", "k", "v")):
            attn[c] = {"weight": _np_to_jnp(qkv_w[j * D:(j + 1) * D], dtype)}
            if qkv_b is not None:
                attn[c]["bias"] = _np_to_jnp(qkv_b[j * D:(j + 1) * D], dtype)
        attn["o"] = lin_p(p + "attn.proj")
        vparams["blocks"].append({
            "ln1": {"weight": g(p + "norm1.weight")},
            "ln2": {"weight": g(p + "norm2.weight")},
            "attn": attn,
            "mlp": {"gate": lin_p(p + "mlp.gate_proj"),
                    "up": lin_p(p + "mlp.up_proj"),
                    "down": lin_p(p + "mlp.down_proj")},
        })
    tower = Glm4vVisionTower(spec, vparams)

    tcfg = dict(cfg["text_config"])
    tcfg["model_type"] = "glm4"
    lang_cfg = dict(cfg)
    lang_cfg["text_config"] = tcfg
    lang = _load_vlm_language(reader, model_dir, lang_cfg, dtype)
    mrope = tuple((tcfg.get("rope_scaling") or {}).get(
        "mrope_section", (8, 12, 12)))
    return Glm4VL(
        lang, tower, tokenizer=tok, config=cfg,
        image_token_id=cfg.get("image_token_id", 151343),
        video_token_id=cfg.get("video_token_id", 151344),
        vision_start_token_id=cfg.get("image_start_token_id", 151339),
        mrope_section=mrope)


_VLM_LOADERS = {
    "llava": "_load_llava",
    "llava_onevision": "_load_llava_onevision",
    "video_llava": "_load_video_llava",
    "qwen2_audio": "_load_qwen2audio",
    "qwen2_vl": "_load_qwen_vl",
    "qwen2_5_vl": "_load_qwen_vl",
    "internvl": "_load_internvl",
    "mllama": "_load_mllama",
    "glm4v": "_load_glm4v",
}


def load_model(model_dir: str, dtype=jnp.bfloat16, with_tokenizer: bool = True):
    """Build a registered adapter from an HF model directory."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    if cfg.get("model_type") in _VLM_LOADERS:
        tok = None
        if with_tokenizer:
            try:
                from transformers import AutoTokenizer

                tok = AutoTokenizer.from_pretrained(model_dir)
            except Exception:
                tok = None
        loader = globals()[_VLM_LOADERS[cfg["model_type"]]]
        return loader(model_dir, cfg, dtype, tok)
    arch = arch_from_hf_config(cfg, dtype=dtype)
    reader = _ShardReader(model_dir)
    qc = cfg.get("quantization_config") or {}
    if qc.get("quant_method") == "fp8" and qc.get("weight_block_size"):
        reader = _Fp8DequantReader(reader, qc["weight_block_size"])
    params = load_params(model_dir, arch,
                         model_type=cfg.get("model_type", "llama"),
                         reader=reader)
    tok = None
    if with_tokenizer:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(model_dir)
        except Exception:
            tok = None
    from ..registry import MODEL_REGISTRY

    cls_name = {
        "llama": "Llama",
        "mistral": "Mistral",
        "qwen2": "Qwen2",
        "qwen3": "Qwen3",
        "opt": "Opt",
        "mixtral": "Mixtral",
        "qwen2_moe": "Qwen2Moe",
        "qwen3_moe": "Qwen3Moe",
        "deepseek_v2": "DeepseekV2",
        "deepseek_v3": "DeepseekV3",
        "gemma2": "Gemma2",
        "phi3": "Phi3",
        "gpt_bigcode": "Starcoder",
        "smollm": "SmolLM",
        "stablelm": "StableLm",
        "bloom": "Bloom",
        "falcon": "Falcon",
        "phi": "Phi",
        "glm": "Glm",
        "glm4": "Glm",
        "chatglm": "ChatGLM",
        "internlm2": "InternLM2",
        "qwen": "Qwen",
        "minicpm": "MiniCPM",
    }[cfg.get("model_type", "llama")]
    return MODEL_REGISTRY[cls_name](arch, params, tokenizer=tok, config=cfg)


def save_params(model, save_dir: str, hf_config: Optional[Dict] = None) -> None:
    """Write params back as a single model.safetensors + config.json
    (save_trans / save_fake semantics, bbq.py:1006-1029)."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    arch, params = model.arch, model.params
    tensors: Dict[str, np.ndarray] = {}

    def put(key_map: Dict[str, str], tree: Dict):
        for canon, hf_key in key_map.items():
            parts = canon.split(".")
            node = tree
            ok = True
            for p in parts:
                if not isinstance(node, dict) or p not in node:
                    ok = False
                    break
                node = node[p]
            if ok:
                a = np.asarray(jnp.asarray(node, dtype=jnp.float32))
                tensors[hf_key] = a

    put(_top_key_map(arch), params)
    for i, bp in enumerate(params["blocks"]):
        put(_block_key_map(arch, i), bp)
    save_file(tensors, os.path.join(save_dir, "model.safetensors"))
    if hf_config is not None:
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            json.dump(hf_config, f, indent=2)
    if model.tokenizer is not None:
        try:
            model.tokenizer.save_pretrained(save_dir)
        except Exception:
            pass
