"""Reference-oracle parity for SmoothQuant and LLM.int8 — extending the
in-process bit-parity suite (test_spqr_dgq_parity.py pattern) to the two
remaining deterministic-math algorithms without an oracle test.

SmoothQuant: the migration scale x_max^a / w_max^(1-a) over an ln->fcs
subset (llmc smoothquant.py:28-59).  LLM.int8: threshold outlier-column
decomposition — the reference gathers dynamic indices and quantizes the
int columns (llmc llmint8.py:25-62, quant.py:714-780); our mask-based
form must produce the identical mixed tensor."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from lightcompress_tpu.quant import QuantSpec


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


def test_smoothquant_scale_parity(monkeypatch):
    """search_scale_subset bit-parity: reference torch drive vs our
    get_weight_scale/get_act_scale + the alpha formula, on the same
    random qkv subset + activation batches."""
    import torch

    (ref_sq_mod, ) = _ref_modules("smoothquant")
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self_, *a, **k: self_,
                        raising=False)
    rng = np.random.RandomState(11)
    C = 64
    w_q = rng.randn(96, C).astype(np.float32) * 0.3
    w_k = rng.randn(32, C).astype(np.float32) * 0.1
    w_v = rng.randn(32, C).astype(np.float32) * 0.5
    acts = [rng.randn(2, 9, C).astype(np.float32) * s for s in (1.0, 3.0)]

    ref = object.__new__(ref_sq_mod.SmoothQuant)
    ref.alpha = 0.6
    layers = []
    for w in (w_q, w_k, w_v):
        lin = torch.nn.Linear(C, w.shape[0], bias=False)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w))
        layers.append(lin)
    ref_scale = ref.search_scale_subset(
        layers, [torch.from_numpy(a) for a in acts]).numpy()

    from lightcompress_tpu.compression.quantization.smoothquant import (
        SmoothQuant)

    ours = object.__new__(SmoothQuant)
    bp = {"attn": {n: {"weight": jnp.asarray(w)}
                   for n, w in (("q", w_q), ("k", w_k), ("v", w_v))}}
    w_max = SmoothQuant.get_weight_scale(
        ours, bp, ["attn.q", "attn.k", "attn.v"])
    x_max = SmoothQuant.get_act_scale([jnp.asarray(a) for a in acts])
    scale = jnp.clip(x_max**0.6 / w_max**0.4, 1e-5, None)
    np.testing.assert_allclose(np.asarray(scale), ref_scale,
                               rtol=2e-6, atol=0)


@pytest.mark.parametrize("threshold", [1.5, 6.0])
def test_llmint8_decomposition_parity(threshold):
    """Outlier decomposition parity: the reference's index-gather a_qdq +
    w_qdq vs our mask-based forms on the same (act, weight) pair.  At
    threshold=6.0 randn has no outliers (pure int8 path); at 1.5 several
    columns stay fp."""
    import torch

    ref_li_mod, ref_quant = _ref_modules("llmint8", "quant")
    rng = np.random.RandomState(3)
    T, C, OC = 12, 64, 48
    act = rng.randn(1, T, C).astype(np.float32)
    act[0, 3, 7] = 2.5  # guarantee an outlier column at threshold 1.5
    w = (rng.randn(OC, C) * 0.2).astype(np.float32)

    ref = object.__new__(ref_li_mod.LlmInt8)
    ref.threshold = threshold
    ref.aquantizer = ref_quant.IntegerQuantizer(8, True, "per_token")
    ref.wquantizer = ref_quant.IntegerQuantizer(8, True, "per_channel")

    class _M:
        def register_buffer(self, name, t):
            setattr(self, name, t)

    mod = _M()
    a_ref = ref.a_qdq(torch.from_numpy(act), mod, ref.aquantizer).numpy()
    mod.weight = torch.from_numpy(w)
    w_ref = ref.w_qdq(mod, ref.wquantizer).numpy()

    from lightcompress_tpu.compression.quantization.llmint8 import LlmInt8

    ours = object.__new__(LlmInt8)
    ours.threshold = threshold
    ours.w_only = False
    ours.is_ignored = lambda *a: False
    # _masked_qdq_rows computes per-row params itself; the spec only
    # supplies the integer range ("per_token" is the reference's name
    # for the same per-row reshape)
    ours.aspec = QuantSpec(bit=8, symmetric=True,
                           granularity="per_channel")
    ours.wspec = QuantSpec(bit=8, symmetric=True,
                           granularity="per_channel")
    a_ours = LlmInt8.a_qdq(ours, jnp.asarray(act), 0, "q")
    w_ours = LlmInt8.w_qdq(ours, jnp.asarray(w), 0, "q")
    np.testing.assert_allclose(np.asarray(a_ours), a_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_ours), w_ref, atol=1e-6)
