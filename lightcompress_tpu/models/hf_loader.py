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


def _top_key_map(arch: A.ArchSpec) -> Dict[str, str]:
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


def _block_key_map(arch: A.ArchSpec, i: int,
                   model_type: str = "") -> Dict[str, str]:
    if model_type == "gemma2":
        return _gemma2_key_map(i)
    if model_type == "gpt_bigcode":
        return _bigcode_key_map(i)
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


# ---------------------------------------------------------------------------
# tensor reading
# ---------------------------------------------------------------------------

class _ShardReader:
    """Streams tensors from .safetensors shards (or a single torch .bin)."""

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
            self._handles[shard] = safe_open(
                os.path.join(self.dir, shard), framework="numpy"
            )
        f = self._handles[shard]
        try:
            return f.get_tensor(key)
        except (TypeError, ValueError):
            # bf16/fp8 not representable in numpy: go through torch
            import torch
            from safetensors.torch import load_file

            t = load_file(os.path.join(self.dir, shard))[key]
            return t.float().numpy()


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


def load_params(model_dir: str, arch: A.ArchSpec,
                model_type: str = "llama") -> Dict:
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
        top_map = _top_key_map(arch)
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


def load_model(model_dir: str, dtype=jnp.bfloat16, with_tokenizer: bool = True):
    """Build a registered adapter from an HF model directory."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    arch = arch_from_hf_config(cfg, dtype=dtype)
    params = load_params(model_dir, arch,
                         model_type=cfg.get("model_type", "llama"))
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
