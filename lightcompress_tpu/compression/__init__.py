from . import quantization  # noqa: F401
from .blockwise import BlockwiseOpt  # noqa: F401
