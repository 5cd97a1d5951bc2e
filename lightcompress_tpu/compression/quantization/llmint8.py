"""LLM.int8 — mixed-precision outlier decomposition (llmc llmint8.py:11-77).

Activation columns whose |x| exceeds ``threshold`` stay fp; the rest are
int-quantized.  The reference gathers dynamic outlier *indices* per forward;
dynamic index sets don't jit, so here the decomposition is **mask-based**
(mathematically identical for per-token/per-channel granularities): scales
are computed over non-outlier entries only and outlier columns pass through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...quant import QuantSpec
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization

Array = jax.Array


def _masked_qdq_rows(t: Array, keep_fp_col: Array, spec: QuantSpec) -> Array:
    """Quant-dequant along the last dim with per-row qparams computed over
    non-outlier columns only; outlier columns returned unchanged."""
    tf = t.astype(jnp.float32)
    masked = jnp.where(keep_fp_col, 0.0, tf)
    if spec.symmetric:
        amax = jnp.clip(jnp.max(jnp.abs(masked), axis=-1, keepdims=True),
                        1e-5, None)
        scales = amax / spec.qmax
        zeros = 0.0
    else:
        mx = jnp.max(jnp.where(keep_fp_col, -jnp.inf, tf), axis=-1,
                     keepdims=True)
        mn = jnp.min(jnp.where(keep_fp_col, jnp.inf, tf), axis=-1,
                     keepdims=True)
        scales = jnp.clip(mx - mn, 1e-5, None) / (spec.qmax - spec.qmin)
        zeros = jnp.clip(spec.qmin - jnp.round(mn / scales), spec.qmin,
                         spec.qmax)
    q = jnp.clip(jnp.round(tf / scales) + zeros, spec.qmin, spec.qmax)
    dq = (q - zeros) * scales
    return jnp.where(keep_fp_col, tf, dq).astype(t.dtype)


@ALGO_REGISTRY
class LlmInt8(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        self.threshold = self.special_config.get("threshold", 6.0)

    def block_transform(self, block_idx, input_feat):
        pass  # no transform (llmint8.py:21-23); decomposition is at runtime

    def subset_transform(self, *a, **k):
        pass

    def a_qdq(self, x: Array, block_idx: int, name: str) -> Array:
        if self.w_only or self.is_ignored(block_idx, name):
            return x
        # outlier columns: any token with |x| >= threshold (llmint8.py:25-33)
        amax = jnp.max(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0)
        keep_fp = (amax >= self.threshold)[None, :]
        shape = x.shape
        x2 = x.reshape(-1, shape[-1])
        out = _masked_qdq_rows(x2, keep_fp, self.aspec)
        # remember the mask for the paired weight quant
        self._col_mask = keep_fp
        return out.reshape(shape)

    def w_qdq(self, w: Array, block_idx: int, name: str) -> Array:
        if self.is_ignored(block_idx, name):
            return w
        keep_fp = getattr(self, "_col_mask", None)
        if keep_fp is None or keep_fp.shape[-1] != w.shape[-1]:
            return super().w_qdq(w, block_idx, name)
        return _masked_qdq_rows(w, keep_fp, self.wspec)
