"""KV-cache quantization (llmc kvquant.py re-design).

The reference subclasses HF ``DynamicCache`` and quant-requants the cache on
every update (kvquant.py:44-87).  Functionally, fake-quant KV equals applying
``qdq`` to the K/V tensors entering attention — so here a KV module produces
per-layer **hooks** ``(k, v) -> (k, v)`` installed on the model
(models.arch.block_forward ``kv_hook``):

- ``Naive``: qdq of the whole K/V (dynamic per_token/per_group/per_tensor, or
  static with calibration buffers filled during the block loop).
- ``Kivi``: the most recent ``residual_length`` tokens stay full-precision;
  older tokens are quantized (kvquant.py:226-289).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ...quant import (
    QParams,
    fake_quant_act_dynamic,
    fake_quant_act_static,
    qparams_from_range,
    spec_from_config,
    static_act_qparams,
)
from ...registry import KV_REGISTRY

Array = jax.Array


@KV_REGISTRY.register("Naive")
class NaiveQuantKVCache:
    def __init__(self, quant_type: str, kvquant_cfg: Dict, num_layers: int):
        gran = kvquant_cfg.get("granularity", "per_token")
        if gran not in ("per_token", "per_tensor", "per_group"):
            raise ValueError(f"unsupported KV granularity {gran}")
        self.spec = spec_from_config(dict(kvquant_cfg))
        self.static = kvquant_cfg.get("static", False)
        self.num_layers = num_layers
        # static calib buffers (k/v qparams per layer)
        self.k_qparams: List[Optional[QParams]] = [None] * num_layers
        self.v_qparams: List[Optional[QParams]] = [None] * num_layers

    # -- calibration (static path; filled by the block loop) ---------------
    def calibrate(self, layer_idx: int, k_batches: List[Array],
                  v_batches: List[Array]) -> None:
        spec = self.spec.with_(calib_algo="static_minmax")
        self.k_qparams[layer_idx] = static_act_qparams(k_batches, spec)
        self.v_qparams[layer_idx] = static_act_qparams(v_batches, spec)

    # -- runtime hook ------------------------------------------------------
    def _qdq(self, t: Array, qp: Optional[QParams]) -> Array:
        if self.static and qp is not None:
            return fake_quant_act_static(t, self.spec, qp)
        return fake_quant_act_dynamic(t, self.spec)

    def make_hook(self, layer_idx: int):
        def hook(k: Array, v: Array):
            return (
                self._qdq(k, self.k_qparams[layer_idx]),
                self._qdq(v, self.v_qparams[layer_idx]),
            )

        return hook


@KV_REGISTRY.register("Kivi")
class KiviQuantKVCache(NaiveQuantKVCache):
    def __init__(self, quant_type: str, kvquant_cfg: Dict, num_layers: int):
        super().__init__(quant_type, kvquant_cfg, num_layers)
        if self.static:
            raise ValueError("KIVI supports dynamic quantization only")
        self.residual_length = kvquant_cfg.get("residual_length", 128)

    def make_hook(self, layer_idx: int):
        r = self.residual_length

        def hook(k: Array, v: Array):
            T = k.shape[2]
            if T <= r:
                return k, v
            kq = fake_quant_act_dynamic(k[:, :, : T - r], self.spec)
            vq = fake_quant_act_dynamic(v[:, :, : T - r], self.spec)
            return (
                jnp.concatenate([kq, k[:, :, T - r :]], axis=2),
                jnp.concatenate([vq, v[:, :, T - r :]], axis=2),
            )

        return hook
