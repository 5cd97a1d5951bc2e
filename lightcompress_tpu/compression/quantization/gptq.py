"""GPTQ — Hessian-based error-compensating column quantization.

Re-design of llmc/compression/quantization/gptq.py:21-478 for TPU:

- Hessian: H = (2/n_seq) * sum_b X_b X_b^T computed from the collected input
  feats (the reference accumulates per-batch in forward hooks with an
  all-reduce per batch, gptq.py:254-295; we batch the whole reduction and
  psum once across DP workers).
- The inherently-serial column loop (gptq.py:199-244) becomes a
  ``lax.fori_loop`` over columns inside a ``lax.scan``-style Python loop over
  column blocks, with the trailing update expressed as a masked rank-1
  update — static shapes, rows batched on the MXU.
- actorder / static_groups / per-group dynamic qparams supported for the
  aligned case (group_size % blocksize == 0 or vice versa) which covers the
  reference configs; per-channel and per-tensor always.
- Deploy: searched group qparams (+ permutation) are stored in layer_state;
  ``w_qdq`` re-quantizes statically (gptq.py:425-452 semantics).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...models.base import Subset, resolve
from ...quant import QParams, QuantSpec, qparams_from_range, quant_dequant
from ...quant.quantizer import minmax_range, mse_range
from ...registry import ALGO_REGISTRY
from .base import BaseBlockwiseQuantization

Array = jax.Array


def _group_qparams(Wg: Array, spec: QuantSpec) -> QParams:
    """qparams for one group slice (oc, gs): per-row range."""
    if spec.calib_algo == "mse":
        rng = mse_range(Wg, spec.with_(granularity="per_channel"))
    else:
        rng = minmax_range(Wg, spec.with_(granularity="per_channel"))
    return qparams_from_range(rng, spec)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "blocksize", "group_size", "actorder",
                     "static_groups", "percdamp", "n_out"),
)
def gptq_quantize_layer(
    W: Array,
    H: Array,
    spec: QuantSpec,
    blocksize: int = 128,
    group_size: int = -1,
    actorder: bool = False,
    static_groups: bool = False,
    percdamp: float = 0.01,
    n_out: int = 0,
):
    """Returns (W_new, scales (oc, n_groups), zeros (oc, n_groups), perm).

    W_new holds the error-compensated float weights (reference ``tmp``);
    quantizing W_new with the returned group qparams reproduces the in-loop
    quantized values exactly.
    """
    oc, cols = W.shape
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)

    diag = jnp.diagonal(H)
    dead = diag == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = W * (~dead)[None, :]

    if n_out > 0:
        # OWQ (gptq.py:58-83): top-n_out sensitivity columns moved LAST and
        # kept full-precision
        desc = jnp.argsort(-jnp.diagonal(H))
        if actorder:
            perm = jnp.concatenate([desc[n_out:], desc[:n_out]])
        else:
            mask = jnp.ones((cols,), bool).at[desc[:n_out]].set(False)
            # kept columns in ORIGINAL order, then the outliers
            kept = jnp.argsort(
                jnp.where(mask, jnp.arange(cols), cols + jnp.arange(cols))
            )[: cols - n_out]
            perm = jnp.concatenate([kept, desc[:n_out]])
        W = W[:, perm]
        H = H[perm][:, perm]
    elif actorder:
        perm = jnp.argsort(-jnp.diagonal(H))
        W = W[:, perm]
        H = H[perm][:, perm]
    else:
        perm = jnp.arange(cols)
    n_nonout = cols - n_out

    damp = percdamp * jnp.mean(jnp.diagonal(H))
    H = H + damp * jnp.eye(cols)
    # Hinv = H^-1 via Cholesky, then its upper-Cholesky factor U with
    # Hinv = U^T U (gptq.py:169-174; torch cholesky(upper=True) convention)
    L = jnp.linalg.cholesky(H)
    Hinv_full = jax.scipy.linalg.cho_solve((L, True), jnp.eye(cols))
    U = jnp.linalg.cholesky(Hinv_full).T

    gs = group_size if group_size > 0 else cols
    n_groups = cols // gs

    if static_groups:
        qps = [
            _group_qparams(W[:, g * gs:(g + 1) * gs], spec)
            for g in range(n_groups)
        ]
        all_scales = jnp.concatenate([q.scales for q in qps], axis=1)
        all_zeros = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(q.zeros, jnp.float32),
                              q.scales.shape) for q in qps], axis=1
        )
    else:
        all_scales = jnp.zeros((oc, n_groups), jnp.float32)
        all_zeros = jnp.zeros((oc, n_groups), jnp.float32)

    n_blocks = cols // blocksize

    def process_block(carry, b):
        W, all_scales, all_zeros = carry
        i1 = b * blocksize
        W1 = jax.lax.dynamic_slice(W, (0, i1), (oc, blocksize))
        U1 = jax.lax.dynamic_slice(U, (i1, i1), (blocksize, blocksize))

        # group qparams for this block (dynamic groups): recompute at group
        # boundaries from the CURRENT W (gptq.py:214-224).  aligned case:
        # every block start that hits a group boundary refreshes that group.
        if not static_groups:
            if gs >= blocksize:
                g_idx = i1 // gs
                # refresh only when i1 is a group boundary
                Wg = jax.lax.dynamic_slice(W, (0, (i1 // gs) * gs), (oc, gs))
                qp = _group_qparams(Wg, spec)
                refresh = (i1 % gs) == 0
                new_s = jnp.where(refresh, qp.scales[:, 0],
                                  jax.lax.dynamic_slice(
                                      all_scales, (0, g_idx), (oc, 1))[:, 0])
                new_z = jnp.where(
                    refresh,
                    jnp.broadcast_to(jnp.asarray(qp.zeros, jnp.float32),
                                     (oc, 1))[:, 0]
                    if jnp.ndim(qp.zeros) == 0
                    else jnp.broadcast_to(qp.zeros, (oc, 1))[:, 0],
                    jax.lax.dynamic_slice(all_zeros, (0, g_idx), (oc, 1))[:, 0],
                )
                all_scales = jax.lax.dynamic_update_slice(
                    all_scales, new_s[:, None], (0, g_idx))
                all_zeros = jax.lax.dynamic_update_slice(
                    all_zeros, new_z[:, None], (0, g_idx))
            else:
                # gs < blocksize: refresh all groups inside this block
                n_sub = blocksize // gs
                for si in range(n_sub):
                    Wg = jax.lax.dynamic_slice(W, (0, i1 + si * gs), (oc, gs))
                    qp = _group_qparams(Wg, spec)
                    zz = (jnp.broadcast_to(jnp.asarray(qp.zeros, jnp.float32),
                                           qp.scales.shape)
                          if jnp.ndim(qp.zeros) == 0 else qp.zeros)
                    g_idx = i1 // gs + si
                    all_scales = jax.lax.dynamic_update_slice(
                        all_scales, qp.scales, (0, g_idx))
                    all_zeros = jax.lax.dynamic_update_slice(
                        all_zeros, zz, (0, g_idx))

        col_ids = jnp.arange(blocksize)

        def col_step(i, st):
            W1, Err1 = st
            w = jax.lax.dynamic_slice(W1, (0, i), (oc, 1))[:, 0]
            d = jax.lax.dynamic_index_in_dim(
                jax.lax.dynamic_index_in_dim(U1, i, 0, keepdims=False),
                i, 0, keepdims=False)
            g_idx = (i1 + i) // gs
            s = jax.lax.dynamic_slice(all_scales, (0, g_idx), (oc, 1))[:, 0]
            z = jax.lax.dynamic_slice(all_zeros, (0, g_idx), (oc, 1))[:, 0]
            q = jnp.clip(jnp.round(w / s) + z, spec.qmin, spec.qmax)
            dq = (q - z) * s
            # OWQ outlier columns (global idx >= n_nonout) stay fp: no error
            is_q = (i1 + i) < n_nonout
            dq = jnp.where(is_q, dq, w)
            err = (w - dq) / d
            u_row = jax.lax.dynamic_index_in_dim(U1, i, 0, keepdims=False)
            mask = (col_ids > i).astype(jnp.float32)
            W1 = W1 - err[:, None] * (u_row * mask)[None, :]
            Err1 = jax.lax.dynamic_update_slice(Err1, err[:, None], (0, i))
            return W1, Err1

        W1, Err1 = jax.lax.fori_loop(
            0, blocksize, col_step,
            (W1, jnp.zeros((oc, blocksize), jnp.float32)),
        )
        W = jax.lax.dynamic_update_slice(W, W1, (0, i1))
        # trailing update: W[:, i2:] -= Err1 @ U[i1:i2, i2:]; masked full-width
        U_rows = jax.lax.dynamic_slice(U, (i1, 0), (blocksize, cols))
        tail_mask = (jnp.arange(cols) >= i1 + blocksize).astype(jnp.float32)
        W = W - (Err1 @ U_rows) * tail_mask[None, :]
        return (W, all_scales, all_zeros), None

    carry = (W, all_scales, all_zeros)
    for b in range(n_blocks):
        carry, _ = process_block(carry, b)
    W, all_scales, all_zeros = carry

    invperm = jnp.argsort(perm)
    W = W[:, invperm]
    return W, all_scales, all_zeros, perm


@ALGO_REGISTRY
class GPTQ(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, input, padding_mask=None,
                 config=None):
        super().__init__(model, quant_config, input, padding_mask, config)
        special = self.special_config
        self.actorder = special.get("actorder", False)
        self.static_groups = special.get("static_groups", False)
        self.percdamp = special.get("percdamp", 0.01)
        self.blocksize = special.get("blocksize", 128)
        self.owq = special.get("owq", False)  # outlier cols kept fp
        self.n_out_ratio = special.get("n_out_ratio", 0.0)
        # reference OWQ config: absolute outlier counts per linear, indexed
        # by block-linear position (gptq.py:48,93 n_out_dict)
        self.n_outs = special.get("n_outs", None)

    # ------------------------------------------------------------------
    def compute_hessian(self, x_batches: List[Array], name: str = "") -> Array:
        """H = 2/n_seq * sum X^T X over calib tokens (gptq.py:254-295).
        Online-rotated layers see the rotated input (gptq add_batch:262)."""
        n_seq = 0
        H = None
        for x in x_batches:
            if name:
                x = self.model.apply_online_rotate(name, x)
            n_seq += x.shape[0]
            x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
            h = x2.T @ x2
            H = h if H is None else H + h
        H = H * (2.0 / n_seq)
        from ...parallel.dist import all_reduce_mean

        return all_reduce_mean(H)

    # ------------------------------------------------------------------
    def subset_transform(self, block_idx, bp, subset: Subset, input_feat):
        gs = self.wspec.group_size if self.wspec.granularity == "per_group" \
            else -1
        for name in subset.layers:
            if self.is_ignored(block_idx, name):
                continue
            node = resolve(bp, name)
            W = node["weight"]
            if W.ndim == 3:
                # stacked MoE experts: per-expert loop (deepseekv3.py:150-162
                # iterates experts sequentially; same here on the stacked dim)
                self._transform_experts(block_idx, name, node, input_feat, gs)
                continue
            H = self.compute_hessian(input_feat[name], name)
            n_out = 0
            if self.owq:
                if self.n_outs is not None:
                    order = self.model.get_block_linear_names(block_idx)
                    pos = order.index(name) if name in order else 0
                    n_out = int(self.n_outs[pos % len(self.n_outs)])
                else:
                    n_out = int(W.shape[1] * self.n_out_ratio)
                if gs > 0:
                    n_out = (n_out // gs) * gs  # keep group alignment
            W_new, scales, zeros, perm = gptq_quantize_layer(
                W.astype(jnp.float32), H, self.wspec,
                blocksize=min(self.blocksize, W.shape[1]),
                group_size=gs,
                actorder=self.actorder,
                static_groups=self.static_groups,
                percdamp=self.percdamp,
                n_out=n_out,
            )
            node["weight"] = W_new.astype(W.dtype)
            st = self.state(block_idx, name)
            st["gptq"] = {
                "scales": scales,
                "zeros": zeros,
                "perm": perm if (self.actorder or n_out > 0) else None,
                "group_size": gs if gs > 0 else W.shape[1],
                "n_out": n_out,
            }

    def _transform_experts(self, block_idx, name, node, input_feat, gs):
        """Per-expert GPTQ over stacked (E, oc, ic) weights.  The collected
        feature for expert-paired inputs is (E, B, T, ic); plain (B, T, ic)
        inputs (gate/up, router) share the Hessian across experts."""
        W = node["weight"]
        E = W.shape[0]
        new_w = []
        states = []
        for e in range(E):
            feats_e = []
            for x in input_feat[name]:
                feats_e.append(x[e] if x.ndim == 4 else x)
            H = self.compute_hessian(feats_e, name)
            W_new, scales, zeros, perm = gptq_quantize_layer(
                W[e].astype(jnp.float32), H, self.wspec,
                blocksize=min(self.blocksize, W.shape[2]),
                group_size=gs,
                actorder=self.actorder,
                static_groups=self.static_groups,
                percdamp=self.percdamp,
            )
            new_w.append(W_new)
            states.append({
                "scales": scales, "zeros": zeros,
                "perm": perm if self.actorder else None,
            })
        node["weight"] = jnp.stack(new_w).astype(W.dtype)
        st = self.state(block_idx, name)
        st["gptq_experts"] = {
            "scales": jnp.stack([s["scales"] for s in states]),
            "zeros": jnp.stack([s["zeros"] for s in states]),
            "perm": (jnp.stack([s["perm"] for s in states])
                     if self.actorder else None),
            "group_size": gs if gs > 0 else W.shape[2],
        }

    # ------------------------------------------------------------------
    def w_qdq(self, w: Array, block_idx: int, name: str) -> Array:
        st = self.layer_state[block_idx].get(name, {})
        if "gptq_experts" in st:
            g = st["gptq_experts"]
            gs = g["group_size"]
            E, oc, cols = w.shape
            wf = w.astype(jnp.float32)
            if g["perm"] is not None:
                wf = jnp.take_along_axis(wf, g["perm"][:, None, :], axis=2)
            wg = wf.reshape(E, oc, cols // gs, gs)
            s = g["scales"][:, :, :, None]
            z = g["zeros"][:, :, :, None]
            q = jnp.clip(jnp.round(wg / s) + z, self.wspec.qmin,
                         self.wspec.qmax)
            dq = ((q - z) * s).reshape(E, oc, cols)
            if g["perm"] is not None:
                invperm = jnp.argsort(g["perm"], axis=1)
                dq = jnp.take_along_axis(dq, invperm[:, None, :], axis=2)
            return dq.astype(w.dtype)
        if "gptq" not in st:
            return super().w_qdq(w, block_idx, name)
        g = st["gptq"]
        gs = g["group_size"]
        oc, cols = w.shape
        wf = w.astype(jnp.float32)
        if g["perm"] is not None:
            wf = wf[:, g["perm"]]
        n_groups = cols // gs
        wg = wf.reshape(oc, n_groups, gs)
        s = g["scales"][:, :, None]
        z = g["zeros"][:, :, None]
        q = jnp.clip(jnp.round(wg / s) + z, self.wspec.qmin, self.wspec.qmax)
        dq = ((q - z) * s).reshape(oc, cols)
        n_out = g.get("n_out", 0)
        if n_out:
            # OWQ: the trailing permuted columns stay full precision
            keep_fp = jnp.arange(cols) >= cols - n_out
            dq = jnp.where(keep_fp[None, :], wf, dq)
        if g["perm"] is not None:
            invperm = jnp.argsort(g["perm"])
            dq = dq[:, invperm]
        return dq.astype(w.dtype)

    # ------------------------------------------------------------------
    def block_transform(self, block_idx, input_feat):
        """true_sequential: re-collect feats through already-quantized
        earlier subsets (gptq true_sequential semantics)."""
        bp = self.model.blocks[block_idx]
        finalized: List[str] = []
        for subset in self.model.get_subsets_in_block(block_idx):
            if self.true_sequential and finalized:
                lf = self._partial_fq_linear(block_idx, finalized)
                input_feat_new, _ = self.collect_block_io(block_idx, linear_fn=lf)
                input_feat.update(input_feat_new)
            self.subset_transform(block_idx, bp, subset, input_feat)
            finalized.extend(subset.layers)

    def _partial_fq_linear(self, block_idx: int, finalized: List[str]):
        from ...models import arch as A

        names = set(finalized)

        def lf(name, w, b, x):
            if name in names:
                w = self.w_qdq(w, block_idx, name)
            return A.default_linear(name, w, b, x)

        return lf
