"""Real-quant checkpoint exporters.

The reference exports packed real-quant checkpoints for external engines
(save_vllm/save_sgl/save_lightllm/save_autoawq/..., __main__.py:75-162 +
module_utils.py:855-1231 + llmc/utils/export_vllm.py).  Here the primary
target is our own TPU serving engine's format, plus a compressed-tensors
compatible JSON for interop.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.base import resolve
from .quant import real_quant_weight


def pack_int4(codes: jax.Array) -> jax.Array:
    """Pack int4 codes (values 0..15 or -8..7) into int32 words, 8 per word
    (VllmRealQuantLinear.pack semantics, module_utils.py:929-955)."""
    oc, ic = codes.shape
    assert ic % 8 == 0
    u = jnp.asarray(codes, jnp.int32) & 0xF
    u = u.reshape(oc, ic // 8, 8)
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    return jnp.sum(u << shifts[None, None, :], axis=-1).astype(jnp.int32)


def unpack_int4(packed: jax.Array, signed: bool = False) -> jax.Array:
    oc, words = packed.shape
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    u = (packed[:, :, None] >> shifts[None, None, :]) & 0xF
    u = u.reshape(oc, words * 8)
    if signed:
        u = jnp.where(u >= 8, u - 16, u)
    return u


def export_real_quant(algo, save_dir: str, fmt: str = "native") -> None:
    """Quantize every block linear with the algorithm's searched qparams and
    write codes+scales(+zeros) as safetensors + a quant-config JSON."""
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    model = algo.model
    spec = algo.wspec
    tensors: Dict[str, np.ndarray] = {}
    for idx in range(model.num_blocks):
        bp = (model._fp_blocks if hasattr(model, "_fp_blocks")
              else model.params["blocks"])[idx]
        for name in model.get_block_linear_names(idx):
            node = resolve(bp, name)
            w = node["weight"].astype(jnp.float32)
            st = algo.layer_state[idx].get(name, {})
            qp = st.get("qparams", None)
            codes, scales, zeros = real_quant_weight(w, spec, qp=qp)
            base = f"blocks.{idx}.{name}"
            if spec.bit == 4 and not spec.is_float:
                codes = pack_int4(codes)
                tensors[base + ".qweight_packed"] = np.asarray(codes)
            else:
                tensors[base + ".qweight"] = np.asarray(codes)
            tensors[base + ".scales"] = np.asarray(scales, dtype=np.float32)
            if zeros is not None:
                tensors[base + ".zeros"] = np.asarray(zeros, dtype=np.float32)
            if "bias" in node and node["bias"] is not None:
                tensors[base + ".bias"] = np.asarray(node["bias"], dtype=np.float32)
    save_file(tensors, os.path.join(save_dir, "quant_model.safetensors"))

    qcfg = make_quant_config(algo, fmt)
    with open(os.path.join(save_dir, "quantization_config.json"), "w") as f:
        json.dump(qcfg, f, indent=2)


def make_quant_config(algo, fmt: str) -> Dict[str, Any]:
    """compressed-tensors-style quant config (export_vllm.py:4-125)."""
    spec = algo.wspec
    cfg: Dict[str, Any] = {
        "format": fmt,
        "quant_method": algo.quant_config.get("method", "RTN"),
        "weight": {
            "bits": spec.bit,
            "symmetric": spec.symmetric,
            "granularity": spec.granularity,
            "group_size": spec.group_size or None,
        },
    }
    if not algo.w_only and algo.aspec is not None:
        cfg["act"] = {
            "bits": algo.aspec.bit,
            "symmetric": algo.aspec.symmetric,
            "granularity": algo.aspec.granularity,
            "static": algo.act_static,
        }
    return cfg


def run_exports(algo, config) -> None:
    save_cfg = config.get("save", {})
    for key, fmt in (
        ("save_vllm", "vllm"),
        ("save_sgl", "sgl"),
        ("save_lightllm", "lightllm"),
        ("save_autoawq", "autoawq"),
        ("save_mlcllm", "mlcllm"),
        ("save_lightx2v", "lightx2v"),
        ("save_native", "native"),
    ):
        if save_cfg.get(key, False):
            out = os.path.join(save_cfg["save_path"], f"{fmt}_quant_model")
            export_real_quant(algo, out, fmt=fmt)
