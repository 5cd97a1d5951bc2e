from . import quantization  # noqa: F401
from . import token_reduction  # noqa: F401
from . import sparsification  # noqa: F401
from .blockwise import BlockwiseOpt  # noqa: F401
