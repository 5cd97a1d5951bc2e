from .base import TokenReductionModule  # noqa: F401
from .fastv import FastV, RandomPrune  # noqa: F401
from .tome import ToMe  # noqa: F401
from .pyramiddrop import DART, PyramidDrop, VisPruner  # noqa: F401
from .visionzip import DivPrune, FasterVLM, MustDrop, VisionZip  # noqa: F401
from .sparsevlm import SparseVLM  # noqa: F401
from .video import DyCoke, FastVID, HoliTom, PruneVid  # noqa: F401
from .visualizer import Visualizer  # noqa: F401
