"""lightcompress_tpu — TPU-native post-training compression + quantized serving.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
zhangbilang/LightCompress (llmc): blockwise PTQ (AWQ, GPTQ, SmoothQuant, OS+,
QuaRot, OmniQuant, TesseraQ, RTN, HQQ, SpQR, DGQ, QUIK, LLM.int8, AdaDim,
NormTweaking), sparsification (Wanda, magnitude, ShortGPT), KV-cache
quantization, token reduction, evaluation (perplexity, token-consistency), and
a TPU serving path with Pallas fused dequant-matmul kernels and mesh sharding.

Reference layer map: /root/reference SURVEY.md §1; driver semantics follow
llmc/__main__.py:28-177 but the engine is functional (params pytrees + pure
transforms) rather than nn.Module surgery.
"""

__version__ = "0.1.0"

from .registry import (  # noqa: F401
    ALGO_REGISTRY,
    KV_REGISTRY,
    MODEL_REGISTRY,
    PREPROC_REGISTRY,
    SPARSIFY_REGISTRY,
    TOKEN_REDUCTION_REGISTRY,
)
