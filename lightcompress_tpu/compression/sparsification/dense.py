"""Dense — no-op sparsification baseline (llmc dense.py)."""

from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseSparsification


@ALGO_REGISTRY
class Dense(BaseBlockwiseSparsification):
    def subset_transform(self, *a, **k):
        pass
