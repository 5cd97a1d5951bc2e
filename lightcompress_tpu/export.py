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


_AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)  # module_utils.py:1134 order_map


def awq_gemm_pack(codes: jax.Array, scales: jax.Array, zeros: jax.Array,
                  bits: int = 4):
    """AutoAWQ GEMM layout (AutoawqRealQuantLinear.gemm_pack,
    module_utils.py:1097-1158): transpose to (ic, oc)/(n_groups, oc), pack 8
    nibbles per int32 along **oc** in the interleaved order [0,2,4,6,1,3,5,7]
    (the AWQ CUDA kernel's register layout).  Returns
    (qweight (ic, oc/8) i32, scales_t (n_groups, oc) f16,
     qzeros (n_groups, oc/8) i32)."""
    assert bits == 4, "AutoAWQ gemm pack is 4-bit only (module_utils.py:1136)"

    def pack_oc(u: jax.Array) -> jax.Array:
        rows, oc = u.shape
        assert oc % 8 == 0
        u = (jnp.asarray(u, jnp.int32) & 0xF).reshape(rows, oc // 8, 8)
        u = u[:, :, list(_AWQ_ORDER)]
        shifts = jnp.arange(8, dtype=jnp.int32) * 4
        return jnp.sum(u << shifts[None, None, :], axis=-1).astype(jnp.int32)

    qweight = pack_oc(codes.T)  # (ic, oc/8)
    qzeros = pack_oc(jnp.round(zeros).astype(jnp.int32).T)
    scales_t = scales.T.astype(jnp.float16)
    return qweight, scales_t, qzeros


def _emit_linear(tensors, base, codes, scales, zeros, spec,
                 awq_layout: bool, ct_layout: bool) -> None:
    """Write one 2D linear's tensors in the backend layout."""
    if awq_layout and zeros is not None and codes.ndim == 2:
        qw, sc, qz = awq_gemm_pack(codes, scales, zeros, spec.bit)
        tensors[base + ".qweight"] = np.asarray(qw)
        tensors[base + ".scales"] = np.asarray(sc)
        tensors[base + ".qzeros"] = np.asarray(qz)
    elif ct_layout and spec.bit == 4 and codes.ndim == 2:
        tensors[base + ".weight_packed"] = np.asarray(pack_int4(codes))
        tensors[base + ".weight_scale"] = np.asarray(scales, dtype=np.float32)
        if zeros is not None:
            tensors[base + ".weight_zero_point"] = np.asarray(
                zeros, dtype=np.float32)
    else:
        if spec.bit == 4 and not spec.is_float:
            tensors[base + ".qweight_packed"] = np.asarray(pack_int4(codes))
        else:
            tensors[base + ".qweight"] = np.asarray(codes)
        tensors[base + ".scales"] = np.asarray(scales, dtype=np.float32)
        if zeros is not None:
            tensors[base + ".zeros"] = np.asarray(zeros, dtype=np.float32)


def _qp_expert_slice(qp, E: int, e: int):
    """Per-expert view of qparams searched on a stacked (E, oc, ic) weight.

    Grouped-view qparams have leading dim E*rows (reshape_tensor flattens
    leading dims), so expert e owns the contiguous [e*rows:(e+1)*rows)
    slice."""
    if qp is None:
        return None
    s = qp.scales
    if s.ndim == 0 or s.shape[0] % E != 0:
        return qp  # per_tensor or already per-expert
    rows = s.shape[0] // E
    z = qp.zeros
    return type(qp)(
        s[e * rows:(e + 1) * rows],
        z[e * rows:(e + 1) * rows] if getattr(z, "ndim", 0) else z,
    )


def export_real_quant(algo, save_dir: str, fmt: str = "native") -> None:
    """Quantize every block linear with the algorithm's searched qparams and
    write codes+scales(+zeros) as safetensors + a quant-config JSON.

    Per-backend tensor layouts (module_utils.py:855-1231):
      - ``autoawq``: AWQ GEMM interleaved pack (qweight/qzeros/scales names)
      - ``vllm``/``sgl``: compressed-tensors naming (weight_packed /
        weight_scale / weight_zero_point), plain-order int32 pack
      - others: our native layout (qweight_packed/scales/zeros)
    """
    from safetensors.numpy import save_file

    os.makedirs(save_dir, exist_ok=True)
    model = algo.model
    spec = algo.wspec
    awq_layout = fmt == "autoawq" and spec.bit == 4 and not spec.is_float
    ct_layout = fmt in ("vllm", "sgl") and not spec.is_float
    tensors: Dict[str, np.ndarray] = {}
    for idx in range(model.num_blocks):
        bp = (model._fp_blocks if hasattr(model, "_fp_blocks")
              else model.params["blocks"])[idx]
        for name in model.get_block_linear_names(idx):
            node = resolve(bp, name)
            w = node["weight"].astype(jnp.float32)
            st = algo.layer_state[idx].get(name, {})
            qp = st.get("qparams", None)
            if w.ndim == 3:
                # stacked MoE experts: emit per-expert 2D tensors (the
                # reference's per-expert module names, deepseekv3.py
                # experts.N.*) so every backend layout applies unchanged
                E = w.shape[0]
                for e in range(E):
                    ce, se, ze = real_quant_weight(
                        w[e], spec, qp=_qp_expert_slice(qp, E, e))
                    _emit_linear(
                        tensors, f"blocks.{idx}.{name}.experts.{e}",
                        ce, se, ze, spec, awq_layout, ct_layout)
                if "bias" in node and node["bias"] is not None:
                    tensors[f"blocks.{idx}.{name}.bias"] = np.asarray(
                        node["bias"], dtype=np.float32)
                continue
            codes, scales, zeros = real_quant_weight(w, spec, qp=qp)
            base = f"blocks.{idx}.{name}"
            _emit_linear(tensors, base, codes, scales, zeros, spec,
                         awq_layout, ct_layout)
            if "bias" in node and node["bias"] is not None:
                tensors[base + ".bias"] = np.asarray(node["bias"], dtype=np.float32)
    save_file(tensors, os.path.join(save_dir, "quant_model.safetensors"))

    qcfg = make_quant_config(algo, fmt)
    with open(os.path.join(save_dir, "quantization_config.json"), "w") as f:
        json.dump(qcfg, f, indent=2)


def make_quant_config(algo, fmt: str) -> Dict[str, Any]:
    """Per-backend quant-config JSON.

    - vllm/sgl: compressed-tensors ``config_groups`` schema
      (update_vllm_quant_config, export_vllm.py:4-125)
    - autoawq: AutoAWQ ``quantization_config``
      (update_autoawq_quant_config, export_autoawq.py)
    - others: our native schema.
    """
    spec = algo.wspec
    has_act = not algo.w_only and algo.aspec is not None
    if fmt in ("vllm", "sgl"):
        is_float = bool(spec.is_float)
        qt = "float" if is_float else "int"
        if is_float and has_act and algo.act_static:
            return {"activation_scheme": "static", "quant_method": "fp8",
                    "ignored_layers": []}
        if is_float and spec.granularity == "per_block":
            return {"activation_scheme": "dynamic", "fmt": "e4m3",
                    "quant_method": "fp8",
                    "weight_block_size": [spec.block_size, spec.block_size]}
        acts = None
        if has_act:
            acts = {
                "dynamic": not algo.act_static,
                "group_size": None,
                "num_bits": algo.aspec.bit if not algo.aspec.is_float else 8,
                "observer": "minmax",
                "observer_kwargs": {},
                "strategy": ("token"
                             if algo.aspec.granularity == "per_token"
                             else "tensor"),
                "symmetric": algo.aspec.symmetric,
                "type": qt,
            }
        packed = spec.bit == 4 and not is_float
        return {
            "config_groups": {
                "group_0": {
                    "targets": ["Linear"],
                    "input_activations": acts,
                    "weights": {
                        "dynamic": False,
                        "group_size": (spec.group_size
                                       if spec.granularity == "per_group"
                                       else None),
                        "num_bits": 8 if is_float else spec.bit,
                        "observer": "minmax",
                        "observer_kwargs": {},
                        "strategy": ("group"
                                     if spec.granularity == "per_group"
                                     else "channel"),
                        "symmetric": spec.symmetric,
                        "type": qt,
                    },
                }
            },
            "format": ("pack-quantized" if packed
                       else f"{qt}-quantized"),
            "ignore": [],
            "quant_method": "compressed-tensors",
        }
    if fmt == "autoawq":
        return {
            "bits": spec.bit,
            "group_size": (spec.group_size
                           if spec.granularity == "per_group" else -1),
            "modules_to_not_convert": None,
            "quant_method": "awq",
            "version": "gemm",
            "zero_point": not spec.symmetric,
        }
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
    if has_act:
        cfg["act"] = {
            "bits": algo.aspec.bit,
            "symmetric": algo.aspec.symmetric,
            "granularity": algo.aspec.granularity,
            "static": algo.act_static,
        }
    return cfg


def cvt_trtllm_engine(quant_dir: str, engine_dir: str,
                      cfg: Optional[Dict[str, Any]] = None) -> str:
    """TensorRT-LLM engine build step (export_trtllm.py:92-115): shell out
    ``trtllm-build`` when present; otherwise record the exact command so the
    checkpoint can be built on a machine that has TRT-LLM."""
    import shutil
    import subprocess

    cfg = cfg or {"tp_size": 1, "pp_size": 1}
    os.makedirs(engine_dir, exist_ok=True)
    cmd = [
        "trtllm-build",
        "--checkpoint_dir", quant_dir,
        "--output_dir", engine_dir,
        "--gemm_plugin", "float16",
    ]
    if shutil.which("trtllm-build") is not None:
        subprocess.run(cmd, check=True)
        return engine_dir
    with open(os.path.join(engine_dir, "build_cmd.txt"), "w") as f:
        f.write(" ".join(cmd) + "\n")
        f.write(json.dumps(cfg) + "\n")
    return engine_dir


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
    if save_cfg.get("save_trtllm", False):
        out = os.path.join(save_cfg["save_path"], "trtllm_quant_model")
        export_real_quant(algo, out, fmt="trtllm")
        cvt_trtllm_engine(
            out, os.path.join(save_cfg["save_path"], "trtllm_engine"),
            save_cfg.get("trtllm_cfg"))
