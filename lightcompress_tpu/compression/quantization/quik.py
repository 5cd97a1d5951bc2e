"""QUIK — static mixed int/fp outlier columns (llmc quik.py:14-151).

Per layer, the fp-outlier column set comes from calibration act scales
(max |x| per channel): the top ``outlier_num`` columns stay fp in both
weights and activations.  The indices are computed on the host once, so the
quantizer's static ``int_indices``/``fp_indices`` path applies.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ...quant import fake_quant_act_dynamic, fake_quant_weight_dynamic
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization


@ALGO_REGISTRY
class QUIK(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        sp = self.special_config
        self.fp_relative = sp.get("fp_relative", False)
        self.fp_features = sp.get("fp_features", 0)
        self.fp_threshold = sp.get("fp_threshold", 0.0)
        self.last_fc_bit = sp.get("last_fc_bit", None)

    def block_transform(self, block_idx, input_feat):
        bp = self.model.blocks[block_idx]
        hidden = self.model.arch.hidden_size
        for name in self.model.get_block_linear_names(block_idx):
            if name not in input_feat:
                continue
            # act scales: max |x| per channel over calib (quik.py:36-41)
            scales = None
            for x in input_feat[name]:
                cur = np.max(np.abs(np.asarray(
                    x.reshape(-1, x.shape[-1]), dtype=np.float32)), axis=0)
                scales = cur if scales is None else np.maximum(scales, cur)
            in_features = scales.shape[0]
            if self.fp_relative:
                outlier_num = int(in_features / hidden) * self.fp_features
            else:
                outlier_num = self.fp_features
            fp_threshold = self.fp_threshold
            st = self.state(block_idx, name)
            if self.last_fc_bit is not None and name in ("mlp.down", "mlp.fc2"):
                fp_threshold = self.fp_threshold * 2
                st["current_bit"] = self.last_fc_bit
            if outlier_num > 0 and scales.max() <= fp_threshold:
                outlier_num = 0
            order = np.argsort(scales)
            if outlier_num > 0:
                st["int_ids"] = order[:-outlier_num].copy()
                st["fp_ids"] = order[-outlier_num:].copy()
            else:
                st["int_ids"] = order.copy()
                st["fp_ids"] = np.array([], dtype=np.int64)

    def subset_transform(self, *a, **k):
        pass

    def _spec_with_bit(self, spec, st):
        if "current_bit" in st:
            return spec.with_(bit=st["current_bit"])
        return spec

    def w_qdq(self, w, block_idx, name):
        st = self.layer_state[block_idx].get(name, {})
        if "int_ids" not in st or len(st["fp_ids"]) == 0:
            return super().w_qdq(w, block_idx, name)
        spec = self._spec_with_bit(self.wspec_for(block_idx, name), st)
        return fake_quant_weight_dynamic(
            w, spec, int_indices=st["int_ids"], fp_indices=st["fp_ids"]
        )

    def a_qdq(self, x, block_idx, name):
        if self.w_only:
            return x
        st = self.layer_state[block_idx].get(name, {})
        if "int_ids" not in st or len(st["fp_ids"]) == 0:
            return super().a_qdq(x, block_idx, name)
        spec = self._spec_with_bit(self.aspec, st)
        return fake_quant_act_dynamic(
            x, spec, int_indices=st["int_ids"], fp_indices=st["fp_ids"]
        )
