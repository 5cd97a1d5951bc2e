from . import quantization  # noqa: F401
from . import sparsification  # noqa: F401
from .blockwise import BlockwiseOpt  # noqa: F401
