"""RTN — round-to-nearest baseline (llmc rtn.py:10-28).

No equivalent transform; weight qparams are computed at deploy time by the
base class's w_qdq.  The block loop still runs to collect activations for
static act / KV-cache calibration.
"""

from __future__ import annotations

from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization


@ALGO_REGISTRY
class RTN(BaseBlockwiseQuantization):
    def block_transform(self, block_idx, input_feat):
        # no transform; static-act registration happens in block_opt
        pass

    def subset_transform(self, *args, **kwargs):
        pass
