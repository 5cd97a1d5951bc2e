"""DGQ — dual-grain quantization (llmc dgq.py:15-296).

SmoothQuant-style activation-scale migration into ln->fcs subsets plus the
up->down outlier smoothing (dgq.py ``smooth_llama_mlp``), then INT4-in-INT8
double quantization: symmetric per-channel INT8 outer scales with asymmetric
per-group INT4 inner codes (Weight48 layout, quant.py:1232-1369).

The inner-grain search here uses the analytic minmax W48 path
(quant.fake_quant_weight_w48) rather than the reference's per-layer grid
search — grid refinement is a planned follow-up.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...models.base import Subset, resolve
from ...quant import fake_quant_weight_w48, spec_from_config
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization


@ALGO_REGISTRY
class DGQ(BaseBlockwiseQuantization):
    def set_quant_config(self):
        qc = self.quant_config
        w = qc["weight"]
        self.wspec = spec_from_config(w["w_1"])  # int4 per-group asym
        self.wspec8 = spec_from_config(w["w_2"])  # int8 per-channel sym
        self.w48 = True
        self.mix_bits_specs = {}
        if "act" in qc and qc.get("act") is not None:
            self.w_only = False
            self.aspec = spec_from_config(qc["act"])
        else:
            self.w_only = True
            self.aspec = None
        self.act_static = False
        self.quant_attn = self.quant_softmax = self.quant_act_fn = False
        self.kv_module = None
        self.quant_kvcache = False
        self.special_config = qc.get("special", {})
        self.true_sequential = False
        self.weight_clip = False
        self.save_scale = False
        self.online_rotate = False
        self.do_gqa_trans = False
        self.quant_out = qc.get("quant_out", False)
        self.tp = 1
        self.ignored_block_ids = []
        self.ignored_layer_names = []
        self.ignored_special_names = []
        self.has_gqa = self.model.arch.num_kv_heads < self.model.arch.num_heads

    # ------------------------------------------------------------------
    def subset_transform(self, block_idx, bp, subset: Subset, input_feat):
        if subset.prev_type == "norm":
            # SmoothQuant migration, alpha=0.5 (dgq.py:96-104)
            from .smoothquant import SmoothQuant

            w_max = SmoothQuant.get_weight_scale(self, bp, subset.layers)
            x_max = SmoothQuant.get_act_scale(input_feat[subset.input])
            scale = jnp.clip(x_max**0.5 / w_max**0.5, 1e-5, None)
            self.apply_scale(bp, subset, scale)
            self.update_input_feat(input_feat, subset, scale)
        elif subset.layers == ("mlp.down",):
            # outlier smoothing up->down (dgq.py smooth_llama_mlp)
            x_max = SmoothScaleHelper.act_scale(input_feat[subset.input])
            self._smooth_mlp(bp, x_max)

    def _smooth_mlp(self, bp, act_scales):
        sc = np.asarray(act_scales, dtype=np.float64)
        order = np.argsort(sc)
        basl = int(len(sc) * 0.005 + 1.5)
        baseline = sc[order[-basl]]
        if baseline < 1e-4:
            return
        scales = sc / baseline
        scales[sc <= baseline] = 1.0
        s = jnp.asarray(scales, jnp.float32)
        up = resolve(bp, "mlp.up")
        down = resolve(bp, "mlp.down")
        up["weight"] = (up["weight"].astype(jnp.float32) / s[:, None]).astype(
            up["weight"].dtype
        )
        if "bias" in up and up["bias"] is not None:
            up["bias"] = (up["bias"].astype(jnp.float32) / s).astype(
                up["bias"].dtype
            )
        down["weight"] = (
            down["weight"].astype(jnp.float32) * s[None, :]
        ).astype(down["weight"].dtype)

    # ------------------------------------------------------------------
    def w_qdq(self, w, block_idx, name):
        if self.is_ignored(block_idx, name):
            return w
        return fake_quant_weight_w48(w, self.wspec8, self.wspec)


class SmoothScaleHelper:
    @staticmethod
    def act_scale(batches):
        m = None
        for x in batches:
            cur = jnp.max(jnp.abs(x.reshape(-1, x.shape[-1])), axis=0).astype(
                jnp.float32
            )
            m = cur if m is None else jnp.maximum(m, cur)
        return m
