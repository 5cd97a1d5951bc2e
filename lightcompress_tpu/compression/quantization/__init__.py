from .base import BaseBlockwiseQuantization  # noqa: F401
from .rtn import RTN  # noqa: F401
from .awq import Awq  # noqa: F401
from .auto_clip import AutoClipper  # noqa: F401
