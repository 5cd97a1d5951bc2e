"""SpQR — GPTQ-style quantization with sparse fp outliers
(llmc spqr.py:20-398), EXACT criterion.

Per-group leave-one-out outlier detection (reference spqr.py:184-255):
for every element j of a group, quantize the group with j EXCLUDED and
measure how much the Hessian-weighted group error drops — elements whose
exclusion improves the error by more than ``threshold`` are treated as
outliers when FITTING the group qparams (replaced by the group mean of
the inliers).  Then the per-column GPTQ loop marks err^2 > threshold
positions as sparse fp outliers: they keep their original weight and
contribute ZERO propagation error.  threshold =
relative_threshold * mean(var(W, rows) / diag(U)^2) with U the upper
Cholesky factor of H^-1 (reference spqr.py:205-207).

The reference double-quantizes the per-group scales and zeros with 3-bit
quantizers (spqr.py:323-346).  As invoked, each group's scale tensor is
(rows, 1) and the 3-bit quantizer's reshape leaves singleton last dims
untouched (quant.py:612-643), so the asym minmax calibration is computed
per singleton — quant-dequant reproduces the value to ~1e-6 relative
(the zero-point absorbs it); we therefore keep scales/zeros exact and
document the identity rather than emulate the no-op.

TPU design: the column loop runs as a ``lax.fori_loop`` inside a
per-group Python loop with static group slices (group_size is static);
the leave-one-out errors for a whole group are one batched (oc, gs,
gs-1) vectorized quantization instead of the reference's per-group
Python loop.  Everything is jittable with static shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ...models.base import Subset, resolve
from ...registry import ALGO_REGISTRY
from .gptq import GPTQ

Array = jax.Array


def _asym_qp(x: Array, qmin: float, qmax: float, round_zp: bool):
    """Per-last-axis asym minmax qparams (reference quant.py:545-559)."""
    mx = jnp.max(x, axis=-1, keepdims=True)
    mn = jnp.min(x, axis=-1, keepdims=True)
    scales = jnp.clip(mx - mn, 1e-5, None) / (qmax - qmin)
    if round_zp:
        zeros = jnp.clip(qmin - jnp.round(mn / scales), qmin, qmax)
    else:
        zeros = qmin - mn / scales
    return scales, zeros


def _asym_qdq(x: Array, scales: Array, zeros: Array, qmin: float,
              qmax: float, round_zp: bool) -> Array:
    if round_zp:
        q = jnp.clip(jnp.round(x / scales) + zeros, qmin, qmax)
    else:
        q = jnp.clip(jnp.round(x / jnp.clip(scales, 1e-9, None) + zeros),
                     qmin, qmax)
    return (q - zeros) * scales


@functools.partial(
    jax.jit,
    static_argnames=("qmin", "qmax", "round_zp", "group_size", "actorder",
                     "percdamp", "rel_threshold", "simplified"),
)
def spqr_quantize_layer(
    W: Array,
    H: Array,
    qmin: float,
    qmax: float,
    round_zp: bool,
    group_size: int = 16,
    actorder: bool = True,
    percdamp: float = 0.01,
    rel_threshold: float = 0.2,
    simplified: bool = False,
):
    """Returns (W_new, mask, scales (oc, n_groups), zeros (oc, n_groups),
    perm).

    W_new = the error-compensated weights in ORIGINAL column order
    (reference ``tmp``); ``mask`` marks the sparse fp outliers (original
    order); scales/zeros are per group in PERMUTED order (the reference
    stores them that way and re-applies perm at w_qdq,
    spqr.py:368-390)."""
    oc, cols = W.shape
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)

    if actorder:
        perm = jnp.argsort(-jnp.diagonal(H))
        W = W[:, perm]
        H = H[perm][:, perm]
    else:
        perm = jnp.arange(cols)

    # reference order (spqr.py:142-159): perm, THEN damp, THEN dead
    # columns' diagonal hard-set to 1 (overwriting the damp) and weights
    # zeroed
    diag = jnp.diagonal(H)
    dead = diag == 0
    if percdamp > 0:
        damp = percdamp * jnp.mean(jnp.abs(diag))
        H = H + damp * jnp.eye(cols)
    H = jnp.where(jnp.diag(dead), 1.0, H)
    W = W * (~dead)[None, :]

    # U: upper Cholesky factor of H^-1 (reference spqr.py:174-177)
    L = jnp.linalg.cholesky(H)
    Hinv_full = jax.scipy.linalg.cho_solve((L, True), jnp.eye(cols))
    U = jnp.linalg.cholesky(Hinv_full).T
    dU = jnp.diagonal(U)

    # threshold (spqr.py:205-207): torch.var is unbiased (ddof=1)
    outlier_scale = jnp.mean(jnp.var(W, axis=0, ddof=1) / dU**2)
    have_thresh = math.isfinite(rel_threshold)
    threshold = rel_threshold * outlier_scale if have_thresh else jnp.inf

    gs = group_size
    n_groups = cols // gs
    # leave-one-out index table: row j = the group without element j
    ar = jnp.arange(gs)
    loo_idx = ar[None, 1:] - (ar[:, None] >= ar[None, 1:]).astype(ar.dtype)

    all_scales = jnp.zeros((oc, n_groups), jnp.float32)
    all_zeros = jnp.zeros((oc, n_groups), jnp.float32)
    mask = jnp.zeros((oc, cols), bool)
    col_ids = jnp.arange(gs)
    tail_ids = jnp.arange(cols)

    def group_step(carry, g):
        W, mask, all_scales, all_zeros = carry
        i1 = g * gs
        G = jax.lax.dynamic_slice(W, (0, i1), (oc, gs))
        du = jax.lax.dynamic_slice(dU, (i1,), (gs,))
        Ug = jax.lax.dynamic_slice(U, (i1, i1), (gs, gs))

        if have_thresh and not simplified:
            # leave-one-out improvement per element (spqr.py:184-200);
            # the reference's self.Q is round_zp=False per_channel
            LooG = G[:, loo_idx]  # (oc, gs, gs-1)
            s_l, z_l = _asym_qp(LooG, qmin, qmax, False)
            dq_l = _asym_qdq(LooG, s_l, z_l, qmin, qmax, False)
            loo_err = jnp.sum(((dq_l - LooG) / du[loo_idx][None]) ** 2, -1)
            s_b, z_b = _asym_qp(G, qmin, qmax, False)
            dq_b = _asym_qdq(G, s_b, z_b, qmin, qmax, False)
            base_err = jnp.sum(((dq_b - G) / du[None, :]) ** 2, -1,
                               keepdims=True)
            E = base_err - loo_err  # (oc, gs)
            M = (E > threshold).astype(jnp.float32)
            mean = jnp.sum(G * (1 - M), axis=1, keepdims=True) / jnp.clip(
                jnp.sum(1 - M, axis=1, keepdims=True), 1, None)
            fitG = G * (1 - M) + mean * M
        else:
            fitG = G
        s, z = _asym_qp(fitG, qmin, qmax, round_zp)  # (oc, 1)
        # (scale/zero 3-bit double quantization: identity as invoked —
        # see module docstring)

        def col_step(i, st):
            G, Err, mcols = st
            w = jax.lax.dynamic_slice(G, (0, i), (oc, 1))[:, 0]
            d = jax.lax.dynamic_index_in_dim(
                jax.lax.dynamic_index_in_dim(Ug, i, 0, keepdims=False),
                i, 0, keepdims=False)
            dq = _asym_qdq(w[:, None], s, z, qmin, qmax, round_zp)[:, 0]
            err = (w - dq) / d
            if have_thresh:
                m = err * err > threshold
                dq = jnp.where(m, w, dq)
                err = (w - dq) / d
                mcols = jax.lax.dynamic_update_slice(
                    mcols, m[:, None], (0, i))
            u_row = jax.lax.dynamic_index_in_dim(Ug, i, 0, keepdims=False)
            active = (col_ids > i).astype(jnp.float32)
            G = G - err[:, None] * (u_row * active)[None, :]
            Err = jax.lax.dynamic_update_slice(Err, err[:, None], (0, i))
            return G, Err, mcols

        G, Err, mcols = jax.lax.fori_loop(
            0, gs, col_step,
            (G, jnp.zeros((oc, gs), jnp.float32), jnp.zeros((oc, gs), bool)),
        )
        W = jax.lax.dynamic_update_slice(W, G, (0, i1))
        mask = jax.lax.dynamic_update_slice(mask, mcols, (0, i1))
        # propagate the block's error beyond the group (spqr.py:249-250)
        U_rows = jax.lax.dynamic_slice(U, (i1, 0), (gs, cols))
        beyond = (tail_ids >= i1 + gs).astype(jnp.float32)
        W = W - (Err @ U_rows) * beyond[None, :]
        all_scales = jax.lax.dynamic_update_slice(
            all_scales, s, (0, g))
        all_zeros = jax.lax.dynamic_update_slice(
            all_zeros, jnp.broadcast_to(z, (oc, 1)), (0, g))
        return (W, mask, all_scales, all_zeros), None

    carry = (W, mask, all_scales, all_zeros)
    carry, _ = jax.lax.scan(group_step, carry, jnp.arange(n_groups))
    W, mask, all_scales, all_zeros = carry

    invperm = jnp.argsort(perm)
    W = W[:, invperm]
    mask = mask[:, invperm]
    return W, mask, all_scales, all_zeros, perm


@ALGO_REGISTRY
class SpQR(GPTQ):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        sp = self.special_config
        rt = sp.get("relative_threshold", 0.2)
        self.rel_threshold = math.inf if rt in ("inf", math.inf) else \
            float(rt)
        self.simplified_outliers = sp.get("simplified_outliers", False)
        assert self.wspec.granularity == "per_group", \
            "SpQR only supports per_group quantization"

    def subset_transform(self, block_idx, bp, subset: Subset, input_feat):
        gs = self.wspec.group_size
        for name in subset.layers:
            if self.is_ignored(block_idx, name):
                continue
            node = resolve(bp, name)
            W = node["weight"]
            H = self.compute_hessian(input_feat[name], name)
            W_new, mask, scales, zeros, perm = spqr_quantize_layer(
                W.astype(jnp.float32), H,
                qmin=float(self.wspec.qmin), qmax=float(self.wspec.qmax),
                round_zp=self.wspec.round_zp,
                group_size=gs,
                actorder=self.actorder,
                percdamp=self.percdamp,
                rel_threshold=self.rel_threshold,
                simplified=self.simplified_outliers,
            )
            node["weight"] = W_new.astype(W.dtype)
            st = self.state(block_idx, name)
            st["gptq"] = {
                "scales": scales, "zeros": zeros,
                "perm": perm if self.actorder else None,
                "group_size": gs,
            }
            st["outlier_mask"] = mask

    def w_qdq(self, w, block_idx, name):
        st = self.layer_state[block_idx].get(name, {})
        g = st.get("gptq")
        if g is None:
            return super().w_qdq(w, block_idx, name)
        gs = g["group_size"]
        oc, cols = w.shape
        wf = w.astype(jnp.float32)
        if g["perm"] is not None:
            wf = wf[:, g["perm"]]
        wg = wf.reshape(oc, cols // gs, gs)
        s = g["scales"][:, :, None]
        z = g["zeros"][:, :, None]
        dq = _asym_qdq(wg, s, z, float(self.wspec.qmin),
                       float(self.wspec.qmax),
                       self.wspec.round_zp).reshape(oc, cols)
        if g["perm"] is not None:
            dq = dq[:, jnp.argsort(g["perm"])]
        mask = st.get("outlier_mask")
        if mask is not None:
            dq = jnp.where(mask, w.astype(jnp.float32), dq)
        return dq.astype(w.dtype)
