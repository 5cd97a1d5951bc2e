"""Serving-side quantized model: adapter params -> packed serving weights.

The consumer of the export path (the role vLLM/SGLang play for the
reference): block linears become QLinearParams (plane-packed int4 for the
Pallas kernel, int8, or fp8), embeddings/norms stay bf16.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models import arch as A
from ..models.base import BaseModel, resolve
from ..ops.qlinear import QLinearParams, qlinear_apply, quantize_linear
from ..ops.scaled_matmul import int8_matmul_dynamic
from ..quant import QParams, QuantSpec

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ServingWeights:
    """Registered as a pytree so engines pass it as a TRACED jit argument
    — closing over it embeds GBs of weight constants in the executable
    (and re-ships them per call through tunneled runtimes, the r1
    closure-capture bug class)."""

    arch: A.ArchSpec = dataclasses.field(metadata=dict(static=True))
    embed: Array = None  # bf16 (vocab, hidden)
    embed_pos: Optional[Array] = None
    norm: Dict[str, Array] = None
    lm_head: Array = None
    blocks: List[Dict[str, Any]] = None  # name -> QLinearParams | {...}
    wbits: int = dataclasses.field(metadata=dict(static=True), default=4)
    # 16 = W4A16; 8 = W4A8 (per-token dynamic int8 acts on the MXU int8 path)
    act_bits: int = dataclasses.field(metadata=dict(static=True),
                                      default=16)
    # True = RMSNorm gammas were folded into the pre-norm linears' weights
    # at quantization time (W' = W * gamma[None, :], exact since the fold
    # happens before quantization) and the stored ln weights are ones.
    # The plain path stays correct (norm with ones + folded linear); the
    # fused decode kernel additionally runs the norm+act-quant in-kernel.
    fused_rms: bool = dataclasses.field(metadata=dict(static=True),
                                        default=False)

    def tree_blocks(self):
        return self.blocks


_LN1_LINEARS = ("attn.q", "attn.k", "attn.v", "attn.qkv")
_LN2_LINEARS = ("mlp.gate", "mlp.up", "mlp.fc1", "mlp.gate_up")


def build_serving_weights(
    model: BaseModel,
    wspec: QuantSpec,
    algo=None,
    act_bits: int = 16,
    layout: Optional[str] = None,
    fused_rms: bool = False,
    fuse_qkv: bool = False,
) -> ServingWeights:
    """Quantize every block linear for serving.  If ``algo`` is given, its
    searched static qparams (GPTQ/TesseraQ/clip) are honored by quantizing
    the algorithm's w_qdq output losslessly re-coded; otherwise direct RTN
    real-quant of the (transformed) weights.

    ``fused_rms`` folds each pre-norm RMSNorm gamma into its consumer
    linears BEFORE quantization (exact) and stores ones as the ln weights,
    enabling the fully-fused decode kernel (norm+quant in-kernel).

    ``fuse_qkv`` concatenates q/k/v (and gate/up) along output channels
    into single ``attn.qkv`` / ``mlp.gateup`` entries — 4 kernel launches
    per block instead of 7, and the small k/v reads ride the big
    launch's DMA stream (bench BENCH_FUSED=1: 3333 vs 3224 tok/s).
    Numerically exact vs separate (per-group quant is per output row).
    Best for single-chip / dp-replica serving; with tp>1 prefer separate
    weights (a merged oc-split puts the q|k|v boundary mid-shard)."""
    arch = model.arch
    params = model.params
    # rmsnorm-family check mirrors arch.apply_norm's dispatch (arch.py:338)
    fold = fused_rms and (arch.family == "llama"
                          or getattr(arch, "norm_type", "") == "rmsnorm")
    blocks_out = []
    for idx in range(model.num_blocks):
        bp = params["blocks"][idx]
        entry: Dict[str, Any] = {}
        g1 = resolve(bp, "ln1").get("weight") if fold else None
        g2 = resolve(bp, "ln2").get("weight") if fold else None
        pend: Dict[str, Any] = {}
        for name in model.get_block_linear_names(idx):
            node = resolve(bp, name)
            w = node["weight"]
            if algo is not None:
                w = algo.w_qdq(w, idx, name)
            if fold and name in _LN1_LINEARS and g1 is not None:
                w = w * g1[None, :].astype(w.dtype)
            elif fold and name in _LN2_LINEARS and g2 is not None:
                w = w * g2[None, :].astype(w.dtype)
            pend[name] = (w, node.get("bias"))

        def _emit(name, w, bias):
            entry[name] = quantize_linear(
                w.astype(jnp.float32), wspec, bias=bias,
                layout=layout or ("planes" if wspec.bit == 4 else "rows"),
            )

        def _fuse(new_name, names):
            ws, bs = zip(*(pend.pop(n) for n in names))
            bias = None
            if any(b is not None for b in bs):
                bias = jnp.concatenate([
                    b if b is not None else jnp.zeros((w.shape[0],),
                                                      ws[0].dtype)
                    for w, b in zip(ws, bs)
                ])
            _emit(new_name, jnp.concatenate(ws, axis=0), bias)

        if fuse_qkv and all(f"attn.{n}" in pend for n in ("q", "k", "v")):
            _fuse("attn.qkv", ("attn.q", "attn.k", "attn.v"))
        if fuse_qkv and "mlp.gate" in pend and "mlp.up" in pend:
            _fuse("mlp.gateup", ("mlp.gate", "mlp.up"))
        for name, (w, bias) in pend.items():
            _emit(name, w, bias)
        for ln in ("ln1", "ln2"):
            lnp = {k: v for k, v in resolve(bp, ln).items()}
            if fold and "weight" in lnp:
                lnp["weight"] = jnp.ones_like(lnp["weight"])
            entry[ln] = lnp
        if arch.qk_norm:
            entry["q_norm"] = dict(bp["attn"]["q_norm"])
            entry["k_norm"] = dict(bp["attn"]["k_norm"])
        blocks_out.append(entry)
    return ServingWeights(
        arch=arch,
        embed=params["embed"]["weight"].astype(jnp.bfloat16),
        embed_pos=(
            params["embed_pos"]["weight"].astype(jnp.bfloat16)
            if "embed_pos" in params else None
        ),
        norm={k: v for k, v in params["norm"].items()},
        lm_head=(
            params["embed"]["weight"] if arch.tie_word_embeddings
            else params["lm_head"]["weight"]
        ).astype(jnp.bfloat16),
        blocks=blocks_out,
        wbits=wspec.bit if isinstance(wspec.bit, int) else 8,
        act_bits=act_bits,
        fused_rms=fold,
    )


def apply_qlinear(entry: Any, x: Array, act_bits: int = 16) -> Array:
    """Dispatch by stored weight format."""
    if isinstance(entry, QLinearParams):
        if entry.bits == 4:
            return qlinear_apply(x, entry, act_bits=act_bits)
        if entry.bits == 8 and not entry.is_float:
            return int8_matmul_dynamic(
                x, entry.codes, entry.scales, bias=entry.bias
            )
        from ..ops.qlinear import qlinear_xla

        return qlinear_xla(x, entry)
    w = entry["weight"]
    return A.default_linear("", w, entry.get("bias"), x)
