"""TPU-generation capability dispatch.

The reference gates its Triton FP8 kernels on Hopper detection
(``is_fp8_supported_gpu()``, compression/quantization/utils.py:8-15, used at
base_blockwise_quantization.py:22-30 and module_utils.py:13-23).  TPU
analogue: inspect ``jax.devices()[0].device_kind`` once and expose a
capability record — which matmul input dtypes the MXU takes natively, and
the HBM bandwidth used for rooflines.  Unknown/CPU backends get a
conservative default (everything emulated, still correct).
"""

from __future__ import annotations

import dataclasses
import functools

import jax


@dataclasses.dataclass(frozen=True)
class TpuCapability:
    device_kind: str
    generation: str          # "v4" | "v5e" | "v5p" | "v6e" | "v7" | "cpu"
    has_int8_mxu: bool       # int8 x int8 -> int32 native dots
    has_fp8_mxu: bool        # e4m3/e5m2 native dots (v6e+)
    hbm_gbps: float          # per-chip HBM bandwidth (GB/s)


_KIND_TABLE = {
    "v4": ("v4", True, False, 1228.0),
    "v5 lite": ("v5e", True, False, 819.0),
    "v5e": ("v5e", True, False, 819.0),
    "v5": ("v5p", True, False, 2765.0),
    "v5p": ("v5p", True, False, 2765.0),
    "v6 lite": ("v6e", True, True, 1640.0),
    "v6e": ("v6e", True, True, 1640.0),
    "v7": ("v7", True, True, 7400.0),
}


@functools.lru_cache(maxsize=None)
def tpu_capability() -> TpuCapability:
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = "cpu"
    lk = kind.lower()
    for pat, (gen, i8, f8, bw) in sorted(_KIND_TABLE.items(),
                                         key=lambda kv: -len(kv[0])):
        if pat in lk:
            return TpuCapability(kind, gen, i8, f8, bw)
    if "tpu" in lk or "axon" in lk:
        # unknown TPU: int8 MXU is universal since v4; no fp8 assumption
        return TpuCapability(kind, "v5e", True, False, 819.0)
    return TpuCapability(kind, "cpu", False, False, 100.0)


def is_fp8_supported_tpu() -> bool:
    """Direct analogue of the reference's is_fp8_supported_gpu()."""
    return tpu_capability().has_fp8_mxu
