"""Serving checkpoint I/O: save a quantized model in the engine's native
format and load it back without the original float checkpoint.

The end-to-end story the reference delegates across tools
(save_vllm -> vLLM): here ``export_serving`` writes codes in the Pallas
kernel's plane-tiled layout plus bf16 embeddings/norms/head and an arch
JSON; ``load_serving`` reconstructs ServingWeights for LLMEngine directly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..models import arch as A
from ..ops.qlinear import QLinearParams
from .quantized_model import ServingWeights


def _arch_to_json(arch: A.ArchSpec) -> Dict[str, Any]:
    d = dataclasses.asdict(arch)
    d["dtype"] = "bfloat16"
    if d.get("moe"):
        d["moe"] = dataclasses.asdict(arch.moe)
    return d


def _arch_from_json(d: Dict[str, Any]) -> A.ArchSpec:
    d = dict(d)
    d["dtype"] = jnp.bfloat16
    if d.get("moe"):
        d["moe"] = A.MoESpec(**d["moe"])
    return A.ArchSpec(**d)


def export_serving(sw: ServingWeights, save_dir: str) -> None:
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    tensors: Dict[str, np.ndarray] = {
        "embed": np.asarray(sw.embed.astype(jnp.float32)),
        # int8 head codes save as-is (+ scale); bf16 heads as f32
        "lm_head": (np.asarray(sw.lm_head)
                    if sw.lm_head_scale is not None
                    else np.asarray(sw.lm_head.astype(jnp.float32))),
    }
    if sw.lm_head_scale is not None:
        tensors["lm_head_scale"] = np.asarray(
            sw.lm_head_scale.astype(jnp.float32))
    if sw.embed_pos is not None:
        tensors["embed_pos"] = np.asarray(sw.embed_pos.astype(jnp.float32))
    for k, v in sw.norm.items():
        tensors[f"norm.{k}"] = np.asarray(jnp.asarray(v, jnp.float32))
    meta: Dict[str, Any] = {"arch": _arch_to_json(sw.arch), "wbits": sw.wbits,
                            "blocks": []}
    for i, entry in enumerate(sw.blocks):
        block_meta = {}
        for name, val in entry.items():
            base = f"blocks.{i}.{name}"
            if isinstance(val, QLinearParams):
                tensors[base + ".codes"] = np.asarray(val.codes)
                tensors[base + ".scales"] = np.asarray(val.scales)
                if val.zeros is not None:
                    tensors[base + ".zeros"] = np.asarray(val.zeros)
                if val.bias is not None:
                    tensors[base + ".bias"] = np.asarray(
                        jnp.asarray(val.bias, jnp.float32))
                block_meta[name] = {
                    "kind": "qlinear", "bits": val.bits,
                    "group_size": val.group_size,
                    "is_float": val.is_float, "layout": val.layout,
                }
            else:
                for k, v in val.items():
                    tensors[base + "." + k] = np.asarray(
                        jnp.asarray(v, jnp.float32))
                block_meta[name] = {"kind": "params",
                                    "keys": list(val.keys())}
        meta["blocks"].append(block_meta)
    save_file(tensors, os.path.join(save_dir, "serving_model.safetensors"))
    with open(os.path.join(save_dir, "serving_config.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_serving(save_dir: str) -> ServingWeights:
    from safetensors.numpy import load_file

    tensors = load_file(os.path.join(save_dir, "serving_model.safetensors"))
    with open(os.path.join(save_dir, "serving_config.json")) as f:
        meta = json.load(f)
    arch = _arch_from_json(meta["arch"])
    blocks = []
    for i, block_meta in enumerate(meta["blocks"]):
        entry: Dict[str, Any] = {}
        for name, m in block_meta.items():
            base = f"blocks.{i}.{name}"
            if m["kind"] == "qlinear":
                entry[name] = QLinearParams(
                    jnp.asarray(tensors[base + ".codes"]),
                    jnp.asarray(tensors[base + ".scales"]),
                    (jnp.asarray(tensors[base + ".zeros"])
                     if base + ".zeros" in tensors else None),
                    (jnp.asarray(tensors[base + ".bias"], jnp.bfloat16)
                     if base + ".bias" in tensors else None),
                    m["bits"], m["group_size"], m["is_float"], m["layout"],
                )
            else:
                entry[name] = {
                    k: jnp.asarray(tensors[base + "." + k])
                    for k in m["keys"]
                }
        blocks.append(entry)
    return ServingWeights(
        arch=arch,
        embed=jnp.asarray(tensors["embed"], jnp.bfloat16),
        embed_pos=(jnp.asarray(tensors["embed_pos"], jnp.bfloat16)
                   if "embed_pos" in tensors else None),
        norm={k.split(".", 1)[1]: jnp.asarray(v)
              for k, v in tensors.items() if k.startswith("norm.")},
        lm_head=(jnp.asarray(tensors["lm_head"])
                 if "lm_head_scale" in tensors
                 else jnp.asarray(tensors["lm_head"], jnp.bfloat16)),
        lm_head_scale=(jnp.asarray(tensors["lm_head_scale"])
                       if "lm_head_scale" in tensors else None),
        blocks=blocks,
        wbits=meta["wbits"],
    )
