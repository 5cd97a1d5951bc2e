"""Pallas TPU decode-attention kernel over the int8-quantized KV cache.

SURVEY §2.6 / §7 row: "paged/quantized KV-cache attention".  XLA's decode
attention at (B=32, H_kv=8, S=1024, D=128) reads KV at only ~60 GB/s
effective (256 tiny per-head dots, latency-bound); this kernel batches a
slab of batch rows per grid step so each DMA is multi-MB (the measured
~640 GB/s regime, tools/dma_experiments6.py) and dequantizes int8 KV
in-register.

Numerics: scores = (q @ k_int8^T) * k_scale[t]; probs in f32;
ctx = (probs * v_scale[t]) @ v_int8 — identical to the XLA int8-KV path
(bench.py decode_step), no extra quantization of q or probs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _attn_kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *,
                 n_heads: int, scale: float):
    bb = q_ref.shape[0]
    for b in range(bb):
        for h in range(n_heads):
            qh = q_ref[b, h].astype(jnp.bfloat16)        # (G, D)
            kh = k_ref[b, h].astype(jnp.bfloat16)        # (S, D)
            sc = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (G, S)
            sc = sc * ks_ref[b, h][None, :] * scale
            m = jnp.max(sc, axis=-1, keepdims=True)
            e = jnp.exp(sc - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            pv = (p * vs_ref[b, h][None, :]).astype(jnp.bfloat16)
            vh = v_ref[b, h].astype(jnp.bfloat16)        # (S, D)
            ctx = jax.lax.dot_general(
                pv, vh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (G, D)
            o_ref[b, h] = ctx


@functools.partial(jax.jit, static_argnames=("b_block", "interpret"))
def decode_attention_kv8(
    q: Array,            # (B, H, G, D) bf16/f32
    kq: Array,           # (B, H, S, D) int8
    ks: Array,           # (B, H, S) f32
    vq: Array,           # (B, H, S, D) int8
    vs: Array,           # (B, H, S) f32
    b_block: int = 4,
    interpret: bool = False,
) -> Array:
    """Single-token GQA decode attention over an int8 KV cache.
    Returns (B, H, G, D) f32."""
    B, H, G, D = q.shape
    S = kq.shape[2]
    b_block = min(b_block, B)
    assert B % b_block == 0
    kernel = functools.partial(_attn_kernel, n_heads=H, scale=D ** -0.5)
    grid = (B // b_block,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, G, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b_block, H, G, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, H, S, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, H, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, H, S, D), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_block, H, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_block, H, G, D), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * G * S * D,
            bytes_accessed=2 * B * H * S * D + 2 * B * H * S * 4
            + B * H * G * D * 2,
            transcendentals=B * H * G * S,
        ),
    )(q, kq, ks, vq, vs)
