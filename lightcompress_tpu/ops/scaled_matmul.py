"""Scaled quantized matmuls — the W8A8/FP8 serving GEMMs.

The vLLM ``cutlass_scaled_mm`` / Triton ``fp8_gemm`` analogue (SURVEY §2.6):
on TPU the MXU multiplies int8 natively, so W8A8 is a plain
``lax.dot_general`` on int8 operands with int32 accumulation — XLA fuses the
per-token/per-channel rescale into the epilogue; no hand-written kernel
needed for this path (the Pallas W4 kernel exists because *unpacking* is the
hard part there).

- ``int8_matmul_dynamic``: per-token dynamic act quant + int8 MXU + rescale
  (scaled_int8_quant + cutlass path, module_utils.py:145-190).
- ``int8_matmul_static``: static act scale variant.
- ``fp8_matmul``: e4m3 weights x bf16 acts via upcast (v5e has no fp8 MXU;
  on fp8-capable generations XLA lowers the cast-free path).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_act_int8(x: Array):
    """Per-token symmetric int8: returns (q, scales) with scales (..., 1)."""
    amax = jnp.clip(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True),
        1e-5, None,
    )
    scales = amax / 127.0
    q = jnp.clip(jnp.round(x / scales), -128, 127).astype(jnp.int8)
    return q, scales


def quantize_act_fp8_block(x: Array, block: int = 128):
    """Per-128-block dynamic FP8 activation quant — the Triton
    ``act_quant_kernel`` analogue (reference kernel.py:7-53): each
    contiguous ``block`` of the feature dim gets scale = amax/448 (e4m3
    finfo max) and casts to float8_e4m3fn.  Returns
    (q (..., K) fp8, scales (..., K/block) f32).  On TPU this is one
    fused XLA reshape+amax+cast — no custom kernel needed; fp8-MXU
    generations feed ``q`` straight into the dot."""
    *lead, K = x.shape
    assert K % block == 0
    xb = x.astype(jnp.float32).reshape(*lead, K // block, block)
    amax = jnp.clip(jnp.max(jnp.abs(xb), axis=-1), 1e-6, None)
    s = amax / 448.0
    q = (xb / s[..., None]).astype(jnp.float8_e4m3fn)
    return q.reshape(*lead, K), s


def fp8_matmul_block_dynamic(
    x: Array,
    w_fp8: Array,       # (oc, ic) float8_e4m3fn
    w_scales: Array,    # (oc/bs, ic/bs) per-block weight scales
    block: int = 128,
    bias: Optional[Array] = None,
) -> Array:
    """W8A8-FP8 GEMM with per-block scales on BOTH operands — the
    ``fp8_gemm_kernel`` analogue (reference kernel.py:141-242).  The
    activation is per-block fp8-quantized dynamically; on non-fp8 MXUs
    both operands dequantize into the bf16 dot (numerics identical to
    the fp8 path, XLA fuses the rescales into the matmul reads)."""
    xq, xs = quantize_act_fp8_block(x, block)
    *lead, K = x.shape
    xd = xq.astype(jnp.float32).reshape(*lead, K // block, block) * \
        xs[..., None]
    xd = xd.reshape(*lead, K).astype(jnp.bfloat16)
    from ..quant import weight_cast_to_bf16

    w = weight_cast_to_bf16(w_fp8, w_scales, block)
    y = jnp.einsum("...i,oi->...o", xd, w,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def int8_matmul_dynamic(
    x: Array,
    w_q: Array,  # (oc, ic) int8
    w_scales: Array,  # (oc,) or (oc, 1) f32
    bias: Optional[Array] = None,
) -> Array:
    """y = (int8(x) @ w_q^T) * x_scale * w_scale — int8 on the MXU."""
    xq, xs = quantize_act_int8(x)
    acc = jax.lax.dot_general(
        xq, w_q,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    ws = w_scales.reshape(-1).astype(jnp.float32)
    y = acc.astype(jnp.float32) * xs * ws
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def int8_matmul_static(
    x: Array,
    w_q: Array,
    w_scales: Array,
    x_scale: Array,  # scalar static act scale
    bias: Optional[Array] = None,
) -> Array:
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / x_scale), -128, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    ws = w_scales.reshape(-1).astype(jnp.float32)
    y = acc.astype(jnp.float32) * x_scale * ws
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def fp8_matmul(
    x: Array,
    w_fp8: Array,  # (oc, ic) float8_e4m3fn
    w_scales: Array,  # per-channel (oc,) or per-block (nb_r, nb_c)
    bias: Optional[Array] = None,
    block_size: int = 0,
) -> Array:
    from ..utils.capability import tpu_capability

    if not block_size and tpu_capability().has_fp8_mxu:
        # fp8-capable generations (v6e+): native e4m3 dot, per-channel
        # rescale in the f32 epilogue (no dequantized weight materialized)
        acc = jnp.einsum(
            "...i,oi->...o", x.astype(w_fp8.dtype), w_fp8,
            preferred_element_type=jnp.float32,
        )
        y = acc * w_scales.reshape(-1).astype(jnp.float32)
    else:
        if block_size:
            from ..quant import weight_cast_to_bf16

            w = weight_cast_to_bf16(w_fp8, w_scales, block_size)
        else:
            w = (
                w_fp8.astype(jnp.float32) * w_scales.reshape(-1, 1)
            ).astype(jnp.bfloat16)
        y = jnp.einsum(
            "...i,oi->...o", x.astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def int8_decode_attention(
    q: Array,       # (B, K, G, D) bf16/f32 — grouped GQA query, 1 token
    k8: Array,      # (B, K, S, D) int8 quantized K cache
    k_scales: Array,  # (B, K, S) f32 per-position K scales
    v8: Array,      # (B, K, S, D) int8 quantized V cache
    v_scales: Array,  # (B, K, S) f32 per-position V scales
) -> Array:
    """Fully-int8 decode attention: both the QK^T and PV dots run on the
    int8 MXU (vLLM cutlass W8A8 analogue applied to attention; measured 8%
    faster than astype-into-bf16-dot at Llama-8B decode shapes,
    tools/attn_kv8_experiments.py: 183 vs 199 us/layer).

    Exactness: q is per-(b,k,g) symmetric-int8 quantized (one more quant
    step than the bf16-dot path); probs are scaled by the per-position V
    scales BEFORE their own per-(b,k,g) int8 quantization, so the PV dot
    needs only a scalar rescale.  Returns (B, K, G, D) f32.
    """
    D = q.shape[-1]
    qf = q.astype(jnp.float32)
    q_amax = jnp.max(jnp.abs(qf), -1, keepdims=True)
    qs = jnp.maximum(q_amax, 1e-8) / 127.0
    q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
    scores = jax.lax.dot_general(
        q8, k8, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )  # (B, K, G, S)
    scores = scores.astype(jnp.float32) * qs * \
        k_scales[:, :, None, :] * (D ** -0.5)
    probs = jax.nn.softmax(scores, -1)
    pv = probs * v_scales[:, :, None, :]
    p_amax = jnp.max(pv, -1, keepdims=True)
    ps = jnp.maximum(p_amax, 1e-8) / 127.0
    p8 = jnp.clip(jnp.round(pv / ps), 0, 127).astype(jnp.int8)
    ctx = jax.lax.dot_general(
        p8, v8, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )  # (B, K, G, D)
    return ctx.astype(jnp.float32) * ps
