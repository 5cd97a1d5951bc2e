"""Reference-oracle parity for HQQ (llmc hqq.py:37-105): minmax qparams,
the proximal zero-point optimization loop (shrink op, beta*kappa
schedule, data-dependent early stop), and the static re-quant — driven
end-to-end on the same weight, torch reference in-process."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from lightcompress_tpu.quant import (QuantSpec, fake_quant_weight_static,
                                     get_tensor_qparams)


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


def _ref_modules(*names):
    _stub_ref_deps()
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        mods = [importlib.import_module(
            f"llmc.compression.quantization.{n}") for n in names]
    finally:
        sys.path.remove("/root/reference")
    return mods


@pytest.mark.parametrize("lp_norm,gran,gs,axis", [
    (0.7, "per_group", 64, 1),
    (1.0, "per_channel", 0, 1),
    (0.7, "per_channel", 0, 0),
])
def test_hqq_proximal_parity(lp_norm, gran, gs, axis):
    import torch

    ref_hqq_mod, ref_quant = _ref_modules("hqq", "quant")
    rng = np.random.RandomState(21)
    OC, C = 48, 128
    w = (rng.randn(OC, C) * 0.25).astype(np.float32)

    ref = object.__new__(ref_hqq_mod.HQQ)
    ref.lp_norm = lp_norm
    ref.beta = 10.0
    ref.kappa = 1.01
    ref.iters = 20
    ref.axis = axis
    if lp_norm == 1:
        ref.shrink_op = lambda x, beta: torch.sign(x) * \
            torch.nn.functional.relu(torch.abs(x) - 1.0 / ref.beta)
    else:
        ref.shrink_op = lambda x, beta, p=lp_norm: torch.sign(x) * \
            torch.nn.functional.relu(
                torch.abs(x) - (1.0 / beta) * torch.pow(torch.abs(x),
                                                        p - 1))
    kw = {"group_size": gs} if gs else {}
    wq = ref_quant.IntegerQuantizer(4, False, gran, round_zp=False, **kw)

    tensor = torch.from_numpy(w).float()
    if axis == 0:
        tensor = tensor.T
    t2, s0, z0, qmax, qmin = wq.get_tensor_qparams(tensor)
    best_s, best_z = ref.optimize_weights_proximal(t2, s0, z0, qmax, qmin)
    args = {"scales": best_s, "zeros": best_z, "qmax": qmax, "qmin": qmin}
    if axis == 0:
        args["dim"] = "ic"
    ref_w = wq.fake_quant_weight_static(torch.from_numpy(w), args).numpy()

    spec = QuantSpec(bit=4, symmetric=False, granularity=gran,
                     group_size=gs, round_zp=False, calib_algo="hqq",
                     lp_norm=lp_norm, beta=10.0, kappa=1.01, iters=20)
    wj = jnp.asarray(w)
    t_in = wj.T if axis == 0 else wj
    _, qp = get_tensor_qparams(t_in.astype(jnp.float32), spec)
    ours_w = np.asarray(fake_quant_weight_static(
        wj, spec, qp, dim_ic=(axis == 0)))
    np.testing.assert_allclose(ours_w, ref_w, atol=2e-6, rtol=1e-5)
