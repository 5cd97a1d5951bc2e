from .engine import LLMEngine, Request  # noqa: F401
from .kv_cache import KVCache  # noqa: F401
from .quantized_model import ServingWeights, build_serving_weights  # noqa: F401
from .sampler import SamplingParams, sample  # noqa: F401
from .checkpoint import export_serving, load_serving  # noqa: F401
from .multihost import ReplicatedEngine, tp_submeshes  # noqa: F401
