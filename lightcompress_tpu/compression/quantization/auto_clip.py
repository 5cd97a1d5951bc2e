"""AutoClipper — per-output-channel weight-clip grid search.

Re-implementation of llmc/compression/quantization/auto_clip.py:22-281.
v1 clamps weights to the best range; v2 stores learnable sigmoid clip
factors consumed by the quantizer's 'learnable' calib path.

TPU-first: the shrink grid is a ``lax.fori_loop`` inside one jitted function
per layer shape (the reference loops in Python per grid point and per batch);
output channels are processed in one shot (batched matmul-free broadcast) with
optional chunking to bound memory.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ...quant import (
    QParams,
    QuantSpec,
    fake_quant_act_dynamic,
    fake_quant_weight_dynamic,
    qparams_from_range,
    quant_dequant,
    reshape_tensor,
)
from ...quant.quantizer import learnable_range

Array = jax.Array


def _logit(x):
    # clamp away from {0,1}: the grid search includes shrink=1.0, where the
    # ratio hits exactly 1 and an unclamped logit is +inf — which NaNs any
    # later gradient-based use of the stored factors (omniq load_clip)
    x = jnp.clip(x, 1e-6, 1.0 - 1e-6)
    return jnp.log(x / (1.0 - x))


class AutoClipper:
    def __init__(self, w_only, wspec: QuantSpec, aspec: Optional[QuantSpec],
                 clip_version: str, clip_sym: bool, save_clip: bool,
                 padding_mask=None, n_grid: int = 20, max_shrink: float = 0.5):
        self.w_only = w_only
        self.wspec = wspec
        self.aspec = aspec
        self.clip_version = clip_version
        self.clip_sym = clip_sym
        self.save_clip = save_clip
        self.padding_mask = padding_mask
        self.n_grid = n_grid
        self.max_shrink = max_shrink
        self.weight_clips: Dict[int, Dict[str, Any]] = {}

    # ------------------------------------------------------------------
    def run(self, algo, block_idx: int, bp: Dict,
            input_feat: Dict[str, List[Array]], n_sample_token: Optional[int]):
        """Clip every linear in the block except q/k (auto_clip.py:56-60)."""
        from ...models.base import resolve

        for name in algo.model.get_block_linear_names(block_idx):
            if name in ("attn.q", "attn.k"):
                continue
            if name not in input_feat:
                continue
            node = resolve(bp, name)
            w = node["weight"]
            from ...parallel.dist import all_reduce_mean

            if w.ndim == 3:
                # stacked MoE experts (E, oc, ic): per-expert grid search
                # (the reference iterates experts sequentially,
                # deepseekv3.py:128-167).  v1 clips each expert's weights in
                # place; v2 stacks per-expert sigmoid factors shaped to match
                # ``reshape_tensor`` on the 3D weight (which flattens leading
                # dims for per_group, and keeps them for per_channel) so the
                # quantizer's 'learnable' path consumes them directly.
                E = w.shape[0]
                feats = input_feat[name]
                clipped, ups, lows = [], [], []
                for e in range(E):
                    if feats[0].ndim == 4 and feats[0].shape[0] == E:
                        xs = jnp.concatenate(
                            [x[e].reshape(-1, x.shape[-1]) for x in feats],
                            axis=0)
                    else:  # shared input (gate/up experts)
                        xs = jnp.concatenate(
                            [x.reshape(-1, x.shape[-1]) for x in feats],
                            axis=0)
                    mx, mn = self.auto_clip_layer(w[e], xs, n_sample_token)
                    mx, mn = all_reduce_mean(mx), all_reduce_mean(mn)
                    if self.clip_version == "v2":
                        up, low = self._v2_factors(w[e], mn, mx)
                        ups.append(up)
                        lows.append(low)
                        continue
                    gs = self._group_size(w[e])
                    w4 = w[e].astype(jnp.float32).reshape(
                        w.shape[1], 1, -1, gs)
                    lo = -mx if self.clip_sym else mn
                    cw = jnp.clip(w4, lo[:, None], mx[:, None])
                    clipped.append(
                        cw.reshape(w.shape[1:]).astype(w.dtype))
                if self.clip_version == "v2":
                    up = jnp.stack(ups)
                    low = None if lows[0] is None else jnp.stack(lows)
                    if self.wspec.granularity == "per_group":
                        # reshape_tensor flattens (E, oc, ic) -> rows
                        up = up.reshape(-1, 1)
                        low = None if low is None else low.reshape(-1, 1)
                    self._store_v2(algo, block_idx, name, up, low)
                else:
                    node["weight"] = jnp.stack(clipped)
                continue
            xs = jnp.concatenate(
                [x.reshape(-1, x.shape[-1]) for x in input_feat[name]], axis=0
            )
            max_val, min_val = self.auto_clip_layer(w, xs, n_sample_token)
            # DP merge (auto_clip.py:72-76)
            max_val = all_reduce_mean(max_val)
            min_val = all_reduce_mean(min_val)
            self.apply_clip(algo, block_idx, name, node, min_val, max_val)

    # ------------------------------------------------------------------
    def _group_size(self, w: Array) -> int:
        if self.wspec.granularity == "per_group":
            return self.wspec.group_size
        return w.shape[1]

    def auto_clip_layer(self, w: Array, x: Array,
                        n_sample_token: Optional[int]):
        """Returns (best_max, best_min) shaped (oc, n_group, 1)."""
        gs = self._group_size(w)
        oc = w.shape[0]
        w4 = w.astype(jnp.float32).reshape(oc, 1, -1, gs)
        # token subsample (auto_clip.py:147-151)
        if n_sample_token is None:
            n_sample_token = min(x.shape[0], 512)
        step = max(1, x.shape[0] // n_sample_token)
        x = x[::step]
        x4 = x.astype(jnp.float32).reshape(1, x.shape[0], -1, gs)
        return _clip_search(
            w4, x4, self.wspec, self.aspec, self.clip_sym,
            self.clip_version, self.w_only, self.n_grid, self.max_shrink,
        )

    # ------------------------------------------------------------------
    def apply_clip(self, algo, block_idx: int, name: str, node: Dict,
                   min_val: Array, max_val: Array):
        w = node["weight"]
        if self.clip_version == "v1":
            gs = self._group_size(w)
            w4 = w.astype(jnp.float32).reshape(w.shape[0], 1, -1, gs)
            mn = -max_val if self.clip_sym else min_val
            clipped = jnp.clip(w4, mn[:, None, :, :], max_val[:, None, :, :])
            node["weight"] = clipped.reshape(w.shape).astype(w.dtype)
        elif self.clip_version == "v2":
            up, low = self._v2_factors(w, min_val, max_val)
            self._store_v2(algo, block_idx, name, up, low)
        else:
            raise ValueError(self.clip_version)

    def _v2_factors(self, w: Array, min_val: Array, max_val: Array):
        """Sigmoid clip factors for one 2D weight (auto_clip.py v2)."""
        w2 = reshape_tensor(w.astype(jnp.float32), self.wspec)
        from ...quant.quantizer import minmax_range

        org_mn, org_mx = minmax_range(w2, self.wspec)
        shape = org_mx.shape
        if self.clip_sym:
            amax = jnp.clip(
                jnp.maximum(jnp.abs(org_mx), jnp.abs(org_mn)), 1e-5, None
            )
            up = _logit(max_val.reshape(shape) / amax)
            low = None
        else:
            up = _logit(max_val.reshape(shape) / org_mx.reshape(shape))
            low = _logit(min_val.reshape(shape) / org_mn.reshape(shape))
        return up, low

    def _store_v2(self, algo, block_idx: int, name: str, up, low) -> None:
        st = algo.state(block_idx, name)
        st["upbound_factor"] = up
        st["lowbound_factor"] = low
        if self.save_clip:
            self.weight_clips.setdefault(block_idx, {})[
                f"{name}.upbound_factor"
            ] = up
            self.weight_clips[block_idx][f"{name}.lowbound_factor"] = low


@partial(
    jax.jit,
    static_argnames=(
        "wspec", "aspec", "clip_sym", "version", "w_only", "n_grid", "max_shrink",
    ),
)
def _clip_search(w4, x4, wspec: QuantSpec, aspec, clip_sym: bool, version: str,
                 w_only: bool, n_grid: int, max_shrink: float):
    """Vectorized clip grid search.  w4: (oc,1,G,gs), x4: (1,N,G,gs)."""
    if clip_sym:
        org_max = jnp.max(jnp.abs(w4), axis=-1, keepdims=True)
    else:
        org_max = jnp.max(w4, axis=-1, keepdims=True)
    org_min = jnp.min(w4, axis=-1, keepdims=True)
    org_out = jnp.einsum("onjg,injg->oij", w4, x4)  # (oc,N,G)

    def q_weight(w_c, min_val, max_val):
        if version == "v1":
            cw = jnp.clip(w_c, min_val, max_val)
            return fake_quant_weight_dynamic(cw, wspec)
        # v2: learnable factors derived from the candidate range
        low = _logit(min_val / org_min)
        up = _logit(max_val / org_max)
        rng = learnable_range(w_c, wspec, low, up)
        qp = qparams_from_range(rng, wspec)
        return quant_dequant(w_c, qp, wspec)

    x_use = x4 if w_only or aspec is None else fake_quant_act_dynamic(x4, aspec)

    def body(i_s, carry):
        best_err, best_max, best_min = carry
        shrink = 1.0 - i_s.astype(jnp.float32) / n_grid
        max_val = org_max * shrink
        min_val = -max_val if clip_sym else org_min * shrink
        q_w = q_weight(w4, min_val, max_val)
        cur = jnp.einsum("onjg,injg->oij", q_w, x_use)
        err = jnp.mean((cur - org_out) ** 2, axis=1)[:, :, None]  # (oc,G,1)
        better = err < best_err
        return (
            jnp.where(better, err, best_err),
            jnp.where(better, max_val[:, 0], best_max),
            jnp.where(better, min_val[:, 0], best_min),
        )

    init = (
        jnp.full((w4.shape[0], w4.shape[2], 1), jnp.inf, jnp.float32),
        org_max[:, 0],
        org_min[:, 0],
    )
    _, best_max, best_min = jax.lax.fori_loop(
        0, int(max_shrink * n_grid), body, init
    )
    return best_max, best_min
