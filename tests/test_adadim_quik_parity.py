"""Reference-oracle parity for AdaDim and QUIK (in-process torch drive,
test_spqr_dgq_parity.py pattern) — the last deterministic algorithm math
without an oracle test.

AdaDim: per-layer quant-dimension search (llmc adadim.py:22-57) — the
per-dim fake-quant weights and the ic/oc decision.  QUIK: act-scale
outlier column selection + the static int/fp index split quant
(llmc quik.py:91-151, quant.py:833-870)."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from lightcompress_tpu.quant import (QuantSpec, fake_quant_act_dynamic,
                                     fake_quant_weight_dynamic)


def _stub_ref_deps():
    for name, attr in (("loguru", "logger"), ("easydict", "EasyDict"),
                       ("tqdm", "tqdm")):
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        if name == "loguru":
            class _L:
                def __getattr__(self, k):
                    return lambda *a, **kw: None

            mod.logger = _L()
        elif name == "easydict":
            mod.EasyDict = dict
        else:
            mod.tqdm = lambda it, *a, **k: it
        sys.modules[name] = mod


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


def test_adadim_dim_search_parity():
    """Per-dim fake-quant weights bit-match the reference for BOTH dims,
    and the ic/oc loss decision agrees on the same calib inputs."""
    import torch

    ref_ad_mod, ref_quant = _ref_modules("adadim", "quant")
    rng = np.random.RandomState(5)
    C, OC, T = 64, 48, 8
    # outlier ROW makes per-oc lossier for that row but per-ic spreads it:
    # gives a non-trivial decision for the search to make
    w = (rng.randn(OC, C) * 0.2).astype(np.float32)
    w[7] *= 8.0
    batches = [rng.randn(2, T, C).astype(np.float32) for _ in range(3)]

    ref = object.__new__(ref_ad_mod.AdaDim)
    ref.wquantizer = ref_quant.IntegerQuantizer(4, False, "per_channel",
                                                round_zp=False)
    ref.n_samples = sum(b.shape[0] for b in batches)
    lin = torch.nn.Linear(C, OC, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
    ref.search_dim_subset({"fc": lin},
                          [torch.from_numpy(b) for b in batches])
    ref_dim_ic = int(lin.buf_qdim) == 0

    spec = QuantSpec(bit=4, symmetric=False, granularity="per_channel",
                     round_zp=False)
    wj = jnp.asarray(w)
    for dim_ic in (False, True):
        ref_qw = ref.wquantizer.fake_quant_weight_dynamic(
            torch.from_numpy(w), {"dim": "ic"} if dim_ic else {}).numpy()
        ours_qw = np.asarray(fake_quant_weight_dynamic(
            wj, spec, dim_ic=dim_ic))
        np.testing.assert_allclose(ours_qw, ref_qw, atol=1e-6)
    x = jnp.concatenate(
        [jnp.asarray(b).reshape(-1, C) for b in batches]).astype(
            jnp.float32)
    org = x @ wj.T
    losses = {}
    for dim_ic in (False, True):
        qw = fake_quant_weight_dynamic(wj, spec, dim_ic=dim_ic)
        losses[dim_ic] = float(jnp.mean((x @ qw.T - org) ** 2))
    assert (losses[True] < losses[False]) == ref_dim_ic


@pytest.mark.parametrize("gran,gs", [("per_channel", 0), ("per_group", 16)])
def test_quik_outlier_split_parity(gran, gs):
    """QUIK selection + split-quant parity: same act scales -> same fp
    column SET (values distinct, so sort ties can't differ), and the
    index-split fake-quant of weights AND activations bit-matches the
    reference driven with the same indices."""
    import torch

    (ref_quant, ) = _ref_modules("quant")
    rng = np.random.RandomState(9)
    C, OC, T, FP = 64, 32, 12, 16
    scales = rng.permutation(C).astype(np.float32) + 1.0  # distinct
    order = np.argsort(scales)
    int_ids, fp_ids = order[:-FP], order[-FP:]
    w = (rng.randn(OC, C) * 0.3).astype(np.float32)
    act = rng.randn(1, T, C).astype(np.float32)

    kw = {"group_size": gs} if gs else {}
    ref_wq = ref_quant.IntegerQuantizer(4, False, gran, round_zp=False,
                                        **kw)
    ref_aq = ref_quant.IntegerQuantizer(8, True, "per_token")
    targs = {"int_indices": torch.from_numpy(int_ids),
             "fp_indices": torch.from_numpy(fp_ids)}
    ref_w = ref_wq.fake_quant_weight_dynamic(torch.from_numpy(w),
                                             targs).numpy()
    ref_a = ref_aq.fake_quant_act_dynamic(torch.from_numpy(act),
                                          targs).numpy()

    wspec = QuantSpec(bit=4, symmetric=False, granularity=gran,
                      group_size=gs, round_zp=False)
    aspec = QuantSpec(bit=8, symmetric=True, granularity="per_channel")
    ours_w = np.asarray(fake_quant_weight_dynamic(
        jnp.asarray(w), wspec, int_indices=int_ids, fp_indices=fp_ids))
    ours_a = np.asarray(fake_quant_act_dynamic(
        jnp.asarray(act), aspec, int_indices=int_ids, fp_indices=fp_ids))
    np.testing.assert_allclose(ours_w, ref_w, atol=1e-6)
    np.testing.assert_allclose(ours_a, ref_a, atol=1e-6)
