"""DGQ — dual-grain quantization (llmc dgq.py:15-296), EXACT search.

SmoothQuant-style activation-scale migration into ln->fcs subsets plus the
up->down outlier smoothing (dgq.py ``smooth_llama_mlp``), then INT4-in-INT8
double quantization: symmetric per-channel INT8 outer scales with asymmetric
per-group INT4 inner codes (Weight48 layout, quant.py:1232-1369).

Per-layer grid refinement (reference dgq.py:133-262):

- Stage 1 (grid=20 clamp ratios, CUMULATIVE clamping): per group, search
  asym per-row int4 qparams minimizing the calibration output MSE
  ``|X_g W_g^T - X_g(fq) fq(W_g)^T|^2`` per out-channel.
- Stage 2 (grid=80): search the symmetric per-channel int8 outer scale;
  the int4 scales snap to INTEGER multiples of it
  (``round(s4 / s8).clamp(min=1)``) so dequant is exact int4-in-int8.
- Deploy: fake-quant with the searched (integer multiplier, zero, s8)
  triple; int4 codes are range-clipped to ``zeros ± round(127/mult)`` so
  the int8 product can't overflow (reference w_qdq, dgq.py:20-38).

TPU design: both grid loops are ``lax.fori_loop``s over static-shaped
batched quantizations (the reference loops per group in Python); groups
ride a ``lax.scan``.  Layers without captured calibration input fall back
to the analytic minmax W48 path (quant.fake_quant_weight_w48).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...models.base import Subset, resolve
from ...quant import fake_quant_weight_w48, spec_from_config
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization

Array = jax.Array


def _aq_sym(x: Array, qmin: float, qmax: float) -> Array:
    """Per-token symmetric int fake-quant (reference a_qdq semantics)."""
    s = jnp.clip(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-5,
                 None) / qmax
    return jnp.clip(jnp.round(x / s), qmin, qmax) * s


@functools.partial(jax.jit, static_argnames=("gs", "w_only"))
def dgq_search_scale_zero(W: Array, X: Array, gs: int, w_only: bool = True):
    """Reference search_scale_zero_layer (dgq.py:133-262) on one layer.

    W: (O, IN) float; X: (L, IN) calibration rows (first batch, like the
    reference's ``input_feat[input_name][0]``).  Returns (scales (O, n_g)
    INTEGER multipliers, zeros (O, n_g), scale8 (O,))."""
    O, IN = W.shape
    n_g = IN // gs
    W = W.astype(jnp.float32)
    X = X.astype(jnp.float32)

    # ---- stage 1: per-group int4 qparams over 20 cumulative clamp ratios
    Wg_all = W.reshape(O, n_g, gs).transpose(1, 0, 2)   # (n_g, O, gs)
    Xg_all = X.reshape(-1, n_g, gs).transpose(1, 0, 2)  # (n_g, L, gs)

    def group_search(_, gx):
        Wg, Xg = gx  # (O, gs), (L, gs)
        org = Xg @ Wg.T  # (L, O)
        w_max = jnp.max(Wg, axis=-1, keepdims=True)
        w_min = jnp.min(Wg, axis=-1, keepdims=True)
        Xq = _aq_sym(Xg, -128.0, 127.0) if not w_only else Xg

        def body(i, st):
            Wc, best_loss, bs, bz = st
            ratio = 1.02 - (i + 1.0) / 20.0 * 0.22
            Wc = jnp.clip(Wc, w_min * ratio, w_max * ratio)
            mx = jnp.max(Wc, axis=-1, keepdims=True)
            mn = jnp.min(Wc, axis=-1, keepdims=True)
            s = jnp.clip(mx - mn, 1e-5, None) / 15.0
            z = jnp.clip(-jnp.round(mn / s), 0.0, 15.0)
            q = jnp.clip(jnp.round(Wc / s) + z, 0.0, 15.0)
            dq = (q - z) * s
            out = Xq @ dq.T
            loss = jnp.mean((org - out) ** 2, axis=0)  # (O,)
            better = loss < best_loss
            return (Wc, jnp.where(better, loss, best_loss),
                    jnp.where(better[:, None], s, bs),
                    jnp.where(better[:, None], z, bz))

        _, _, bs, bz = jax.lax.fori_loop(
            0, 20, body,
            (Wg, jnp.full((O,), jnp.inf),
             jnp.ones((O, 1)), jnp.ones((O, 1))))
        return None, (bs[:, 0], bz[:, 0])

    _, (best_s, best_z) = jax.lax.scan(group_search, None,
                                       (Wg_all, Xg_all))
    best_scales = best_s.T  # (O, n_g)
    best_zeros = best_z.T

    # ---- stage 2: int8 outer scale over 80 clamp ratios
    org_full = X @ W.T  # (L, O)
    Xq_full = _aq_sym(X, -128.0, 127.0) if not w_only else X
    w_amax = jnp.max(jnp.abs(W), axis=-1, keepdims=True)  # (O, 1)
    Wg = W.reshape(O, n_g, gs)

    def body8(i, st):
        best_loss, best_s8 = st
        ratio = 1.02 - (i + 1.0) / 80.0 * 0.82
        # sym per-channel int8 scale of the CLAMPED weights: at ratio > 1
        # (the first grid point) the clamp is a no-op, so the scale is
        # amax/127, NOT amax*ratio/127
        clamped = jnp.clip(W, -w_amax * ratio, w_amax * ratio)
        s8 = jnp.clip(jnp.max(jnp.abs(clamped), axis=-1, keepdims=True),
                      1e-5, None) / 127.0  # (O, 1)
        mult = jnp.clip(jnp.round(best_scales / s8), 1.0, None)  # (O, n_g)
        # (reference dgq.py:237-239 computes the range clip from
        # 127/s8 — hugely loose, so upper/lower are inactive during the
        # search; replicated as written)
        int_max = jnp.round(127.0 / s8)
        upper = jnp.minimum(best_zeros + int_max, 15.0)[:, :, None]
        lower = jnp.maximum(best_zeros - int_max, 0.0)[:, :, None]
        s4 = (mult * s8)[:, :, None]
        z = best_zeros[:, :, None]
        q = jnp.clip(jnp.round(Wg / s4) + z, lower, upper)
        dq = ((q - z) * s4).reshape(O, IN)
        out = Xq_full @ dq.T
        loss = jnp.mean((org_full - out) ** 2, axis=0)  # (O,)
        better = loss < best_loss
        return (jnp.where(better, loss, best_loss),
                jnp.where(better[:, None], s8, best_s8))

    _, best_s8 = jax.lax.fori_loop(
        0, 80, body8, (jnp.full((O,), jnp.inf), jnp.zeros((O, 1))))
    scales = jnp.clip(jnp.round(best_scales / best_s8), 1.0, None)
    return scales, best_zeros, best_s8[:, 0]


def dgq_fake_quant(w: Array, scales: Array, zeros: Array,
                   scale8: Array) -> Array:
    """Static W48 fake-quant from searched buffers (reference w_qdq,
    dgq.py:20-38): int4 codes range-clipped so (q - z) * mult fits int8."""
    O, IN = w.shape
    n_g = scales.shape[1]
    gs = IN // n_g
    s4 = (scales * scale8[:, None])[:, :, None]
    int_max = jnp.round(127.0 / scales)
    upper = jnp.minimum(zeros + int_max, 15.0)[:, :, None]
    lower = jnp.maximum(zeros - int_max, 0.0)[:, :, None]
    z = zeros[:, :, None]
    wg = w.astype(jnp.float32).reshape(O, n_g, gs)
    q = jnp.clip(jnp.round(wg / s4) + z, lower, upper)
    return ((q - z) * s4).reshape(O, IN).astype(w.dtype)


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
        # per-layer scale/zero grid search on the (smoothed) weights
        # (reference runs search_scale_zero_subset at the end of EVERY
        # subset_transform, dgq.py:281-296, on the first calib batch)
        gs = self.wspec.group_size
        for name in subset.layers:
            if self.is_ignored(block_idx, name):
                continue
            feats = input_feat.get(name) or input_feat.get(subset.input)
            if not feats:
                continue
            node = resolve(bp, name)
            W = node["weight"].astype(jnp.float32)
            X = feats[0].reshape(-1, W.shape[1])
            scales, zeros, scale8 = dgq_search_scale_zero(
                W, X, gs=min(gs, W.shape[1]), w_only=self.w_only)
            self.state(block_idx, name)["dgq"] = {
                "scales": scales, "zeros": zeros, "scale8": scale8,
            }

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
        st = self.layer_state[block_idx].get(name, {}) \
            if block_idx < len(self.layer_state) else {}
        d = st.get("dgq")
        if d is not None:
            return dgq_fake_quant(w, d["scales"], d["zeros"], d["scale8"])
        # no captured calib input for this layer: analytic minmax W48
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
