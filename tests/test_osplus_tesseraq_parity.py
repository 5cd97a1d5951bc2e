"""Reference-oracle parity for OsPlus and TesseraQ (VERDICT r4 #6) — the
last two algorithms whose math wasn't bit-pinned.  The reference classes
run IN-PROCESS (torch CPU) on the same weights/activations, the
test_spqr_dgq_parity fixture pattern.

OsPlus: the full search_scale_shift_subset grid search is deterministic
(no training), so parity covers the COMPLETE algorithm — both the
no-bias (llama gate/up, whole-MLP inspect) and bias/shift (opt fc1)
paths.  Ref: /root/reference/llmc/compression/quantization/osplus.py:50-198.

TesseraQ: the Adam training trajectory itself is optimizer numerics
(torch Adam+AMP vs optax), not algorithm math — what is bit-pinned here
is every deterministic piece: the RectifiedSigmoid pair, the rounding
initialization, the quantile hardening mask, and the merge+deploy
equivalence (reference merges the binary mask into W then statically
quantizes; we apply the mask as a rounding override — same codes).
Ref: tesseraq.py:51,386-401,413-421,444-471."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.quant import QuantSpec
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def _stub_ref_deps():
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None

        lg.logger = _L()
        sys.modules["loguru"] = lg
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")
        ed.EasyDict = dict
        sys.modules["easydict"] = ed


def _ref_modules():
    _stub_ref_deps()
    sys.path.insert(0, "/root/reference")
    try:
        from llmc.compression.quantization import osplus as ref_osplus
        from llmc.compression.quantization import quant as ref_quant
        from llmc.compression.quantization.module_utils import \
            RectifiedSigmoid as RefSigmoid
    finally:
        sys.path.remove("/root/reference")
    return ref_quant, ref_osplus, RefSigmoid


W8A8 = {
    "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
    "act": {"bit": 8, "symmetric": True, "granularity": "per_token"},
}


def _ref_search(ref, ref_osplus, layers, x, module):
    """Drive the reference search with CUDA-faithful state snapshots.

    On CUDA the reference's ``org_sd = {k: v.cpu() ...}`` COPIES the
    params; on CPU ``.cpu()`` is a no-op alias, so its in-place
    ``mul_``/``+=`` corrupt the snapshot that load_state_dict restores
    and the search degenerates to the first grid point.  Patch
    ``Tensor.cpu`` to clone for the duration of the call so the
    in-process CPU drive has the reference's intended semantics."""
    import torch

    orig_cpu = torch.Tensor.cpu
    torch.Tensor.cpu = lambda self, *a, **k: self.clone()
    try:
        return ref_osplus.OsPlus.search_scale_shift_subset(
            ref, layers, [x], module, {})
    finally:
        torch.Tensor.cpu = orig_cpu


def _make_ref_osplus(ref_quant, ref_osplus, has_bias):
    self = object.__new__(ref_osplus.OsPlus)
    IQ = ref_quant.IntegerQuantizer
    self.wquantizer = IQ(8, True, "per_channel")
    self.aquantizer = IQ(8, True, "per_token")

    class _M:
        def has_bias(self_inner):
            return has_bias

    self.model = _M()
    return self


def _our_osplus(model):
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)
           for _ in range(2)]
    inputs = model.collect_first_block_input(ids)
    cfg = DotDict({"method": "OsPlus", **W8A8})
    return ALGO_REGISTRY["OsPlus"](model, cfg, inputs, None, DotDict({}))


def test_osplus_parity_llama_mlp():
    """No-bias path: gate/up subset with the whole-MLP inspect module —
    the reference's multi-layer + non-trivial-inspect case."""
    import torch
    import torch.nn as nn

    ref_quant, ref_osplus, _ = _ref_modules()
    model = make_tiny_adapter(seed=60, family="llama", dtype=jnp.float32)
    algo = _our_osplus(model)
    from lightcompress_tpu.models.base import LLAMA_SUBSETS, resolve

    subset = LLAMA_SUBSETS[2]  # mlp.gate / mlp.up, inspect='mlp'
    bp = model.blocks[0]
    H = model.arch.hidden_size
    rng = np.random.RandomState(7)
    x_np = (rng.randn(1, 12, H) * 0.7).astype(np.float32)
    x_np[..., :4] *= 6.0  # outlier channels so clipping actually pays

    scale, shift = algo.search_scale_shift_subset(
        0, bp, subset, jnp.asarray(x_np))
    assert shift is None

    gate_w = np.asarray(resolve(bp, "mlp.gate")["weight"], np.float32)
    up_w = np.asarray(resolve(bp, "mlp.up")["weight"], np.float32)
    down_w = np.asarray(resolve(bp, "mlp.down")["weight"], np.float32)

    class MLP(nn.Module):
        def __init__(self):
            super().__init__()
            inter = gate_w.shape[0]
            self.gate = nn.Linear(H, inter, bias=False)
            self.up = nn.Linear(H, inter, bias=False)
            self.down = nn.Linear(inter, H, bias=False)
            self.gate.weight.data = torch.from_numpy(gate_w.copy())
            self.up.weight.data = torch.from_numpy(up_w.copy())
            self.down.weight.data = torch.from_numpy(down_w.copy())

        def forward(self, x):
            return self.down(
                torch.nn.functional.silu(self.gate(x)) * self.up(x))

    m = MLP()
    ref = _make_ref_osplus(ref_quant, ref_osplus, has_bias=False)
    rscale, rshift = _ref_search(ref, ref_osplus, [m.gate, m.up],
                                 torch.from_numpy(x_np.copy()), m)
    assert rshift is None
    assert (rscale.numpy() > 1.0).any(), "search must pick a real range"
    np.testing.assert_allclose(np.asarray(scale), rscale.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_osplus_parity_opt_bias_shift():
    """Bias path: the channel shift (cmax+cmin)/2 folds into the bias and
    the search runs on the shifted activations (opt fc1, single-linear
    inspect)."""
    import torch
    import torch.nn as nn

    ref_quant, ref_osplus, _ = _ref_modules()
    model = make_tiny_adapter(seed=61, family="opt", dtype=jnp.float32)
    algo = _our_osplus(model)
    from lightcompress_tpu.models.base import OPT_SUBSETS, resolve

    subset = OPT_SUBSETS[2]  # mlp.fc1, inspect single linear
    bp = model.blocks[0]
    H = model.arch.hidden_size
    rng = np.random.RandomState(8)
    x_np = (rng.randn(1, 12, H) * 0.7).astype(np.float32)
    x_np[..., :4] *= 6.0  # outlier channels so clipping actually pays

    scale, shift = algo.search_scale_shift_subset(
        0, bp, subset, jnp.asarray(x_np))
    assert shift is not None

    node = resolve(bp, "mlp.fc1")
    w = np.asarray(node["weight"], np.float32)
    b = np.asarray(node["bias"], np.float32)
    fc1 = nn.Linear(H, w.shape[0], bias=True)
    fc1.weight.data = torch.from_numpy(w.copy())
    fc1.bias.data = torch.from_numpy(b.copy())
    ref = _make_ref_osplus(ref_quant, ref_osplus, has_bias=True)
    rscale, rshift = _ref_search(ref, ref_osplus, [fc1],
                                 torch.from_numpy(x_np.copy()), fc1)
    assert (rscale.numpy() > 1.0).any(), "search must pick a real range"
    np.testing.assert_allclose(np.asarray(shift), rshift.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(scale), rscale.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# TesseraQ deterministic-piece parity
# ---------------------------------------------------------------------------

GS = 32
WSPEC = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                  group_size=GS)


def _ref_iq(ref_quant):
    return ref_quant.IntegerQuantizer(4, False, "per_group", group_size=GS)


def test_tesseraq_sigmoid_and_rounding_init_parity():
    """RectifiedSigmoid pair + rounding-logit initialization
    (tesseraq.py:51, register_rounding_parameters:386-401)."""
    import torch

    ref_quant, _, RefSigmoid = _ref_modules()
    from lightcompress_tpu.compression.quantization.train_utils import \
        RectifiedSigmoid
    from lightcompress_tpu.quant import qparams_from_range, reshape_tensor
    from lightcompress_tpu.quant.quantizer import minmax_range

    sig = RectifiedSigmoid(-0.1, 1.1)
    rsig = RefSigmoid(-0.1, 1.1)
    x = np.linspace(-6, 6, 97).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sig(jnp.asarray(x))),
        rsig(torch.from_numpy(x)).numpy(), rtol=1e-6, atol=1e-6)
    y = np.linspace(0.02, 0.98, 49).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(sig.inverse(jnp.asarray(y))),
        rsig.inverse(torch.from_numpy(y)).numpy(), rtol=1e-4, atol=1e-5)

    rng = np.random.RandomState(3)
    w = (rng.randn(16, 64) * 0.1).astype(np.float32)
    # ours
    t2 = reshape_tensor(jnp.asarray(w), WSPEC)
    qp = qparams_from_range(minmax_range(t2, WSPEC), WSPEC)
    frac = t2 / qp.scales - jnp.floor(t2 / qp.scales)
    r0 = sig.inverse(frac)
    # reference
    iq = _ref_iq(ref_quant)
    wt = torch.from_numpy(w.copy())
    _, scales, zeros, qmax, qmin = iq.get_tensor_qparams(wt)
    rr = iq.reshape_tensor(wt.clone()).div(scales)
    rr = rr - torch.floor(rr)
    rr = rsig.inverse(rr)
    np.testing.assert_allclose(np.asarray(qp.scales), scales.numpy(),
                               rtol=1e-6, atol=1e-7)
    # inverse saturates at the clip epsilons; compare where both finite
    a, bb = np.asarray(r0), rr.numpy()
    fin = np.isfinite(bb) & (np.abs(bb) < 8.5)
    np.testing.assert_allclose(a[fin], bb[fin], rtol=2e-3, atol=2e-3)


def test_tesseraq_update_mask_parity():
    """Quantile hardening (update_mask, tesseraq.py:413-421): identical
    +-saturation pattern for the same rounding logits."""
    import torch

    _, _, RefSigmoid = _ref_modules()
    from lightcompress_tpu.compression.quantization.train_utils import \
        RectifiedSigmoid

    sig = RectifiedSigmoid(-0.1, 1.1)
    rsig = RefSigmoid(-0.1, 1.1)
    rng = np.random.RandomState(4)
    r = (rng.randn(32, 32) * 2).astype(np.float32)
    for thr in (0.75, 0.5, 0.25, 0.1):
        # ours (tesseraq.py analog in block_transform)
        rj = jnp.asarray(r)
        score = jnp.abs(sig(rj) - 0.5)
        val = jnp.quantile(score.reshape(-1), thr)
        hard_hi = np.asarray(sig(rj) > val + 0.5)
        hard_lo = np.asarray(sig(rj) < 0.5 - val)
        # reference
        rt = torch.from_numpy(r.copy())
        rscore = (rsig(rt) - 0.5).abs()
        rval = np.quantile(rscore.numpy(), q=thr)
        ref_hi = (rsig(rt) > (rval + 0.5)).numpy()
        ref_lo = (rsig(rt) < (0.5 - rval)).numpy()
        assert (hard_hi == ref_hi).all(), thr
        assert (hard_lo == ref_lo).all(), thr


def test_tesseraq_merge_deploy_parity():
    """Deploy equivalence (merge_tesseraq_parameters_and_clear_tmp,
    tesseraq.py:444-471): the reference merges the binary rounding mask
    into W (+-0.5*scale nudges) and statically quantizes; we apply the
    mask as a floor-rounding override — identical fake-quant weights."""
    import torch

    ref_quant, _, _ = _ref_modules()
    from lightcompress_tpu.quant import (qparams_from_range, reshape_tensor,
                                         restore_tensor)
    from lightcompress_tpu.quant.quantizer import minmax_range

    rng = np.random.RandomState(5)
    w = (rng.randn(16, 64) * 0.1).astype(np.float32)
    r = (rng.randn(16 * 64 // GS, GS) * 3).astype(np.float32)

    # reference: merge then static quant
    iq = _ref_iq(ref_quant)
    wt = torch.from_numpy(w.copy())
    _, scales, zeros, qmax, qmin = iq.get_tensor_qparams(wt)
    br = (torch.from_numpy(r) > 0).float()
    wr = iq.reshape_tensor(wt) / scales
    br = br - ((wr - torch.floor(wr)) > 0.5).float()
    br = br * (0.5 * scales)
    br = iq.restore_tensor(br, wt.shape)
    w_merged = wt + br
    ref_q = iq.fake_quant_weight_static(
        w_merged, {"scales": scales, "zeros": zeros, "qmax": qmax,
                   "qmin": qmin}).numpy()

    # ours: rounding-override deploy (TesseraQ.w_qdq path)
    t2 = reshape_tensor(jnp.asarray(w), WSPEC)
    qp = qparams_from_range(minmax_range(t2, WSPEC), WSPEC)
    mask = (jnp.asarray(r) > 0).astype(jnp.float32)
    q = jnp.clip(jnp.floor(t2 / qp.scales) + mask + qp.zeros,
                 WSPEC.qmin, WSPEC.qmax)
    dq = (q - qp.zeros) * qp.scales
    ours_q = np.asarray(restore_tensor(dq, w.shape, WSPEC))
    np.testing.assert_allclose(ours_q, ref_q, rtol=1e-5, atol=1e-6)


def test_tesseraq_w_qdq_uses_mask_end_to_end():
    """The engine-level w_qdq honors a stored mask: flipping the mask on
    one group changes exactly that group's deployed codes by +1."""
    from lightcompress_tpu.quant import (qparams_from_range, reshape_tensor,
                                         restore_tensor)
    from lightcompress_tpu.quant.quantizer import minmax_range

    rng = np.random.RandomState(6)
    w = (rng.randn(8, 64) * 0.1).astype(np.float32)
    t2 = reshape_tensor(jnp.asarray(w), WSPEC)
    qp = qparams_from_range(minmax_range(t2, WSPEC), WSPEC)

    def deploy(mask):
        q = jnp.clip(jnp.floor(t2 / qp.scales) + mask + qp.zeros,
                     WSPEC.qmin, WSPEC.qmax)
        return np.asarray(restore_tensor((q - qp.zeros) * qp.scales,
                                         w.shape, WSPEC))

    m0 = jnp.zeros_like(t2)
    m1 = m0.at[0].set(1.0)
    d0, d1 = deploy(m0), deploy(m1)
    diff = d1 - d0
    assert (np.abs(diff[0, :GS]) > 0).any()
    assert np.allclose(diff[0, GS:], 0) and np.allclose(diff[1:], 0)
