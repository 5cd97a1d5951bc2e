from .base import TokenReductionModule  # noqa: F401
from .fastv import FastV, RandomPrune  # noqa: F401
from .tome import ToMe  # noqa: F401
from .pyramiddrop import DART, PyramidDrop, VisPruner  # noqa: F401
