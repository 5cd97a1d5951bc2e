"""Reference-oracle parity for KV-cache quantization (llmc
kvquant.py:11-225): the Naive qdq round-trip class-to-class, and the
KIVI quantized-prefix numerics.  The window *scheduling* is redesigned
here (fixed fp window of ``residual_length`` vs the reference's
oscillating 0..r window that requantizes at boundaries) — per_token
qdq is idempotent per token, so the quantized values agree wherever
both schedules have quantized a token; this test pins that math."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp


class _Cfg(dict):
    """dict with attribute access (the reference reads .granularity and
    also **-expands the config into the quantizer)."""

    __getattr__ = dict.__getitem__


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


def _ref_kv():
    _stub_ref_deps()
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        mod = importlib.import_module(
            "llmc.compression.quantization.kvquant")
    finally:
        sys.path.remove("/root/reference")
    return mod


@pytest.mark.parametrize("gran,gs", [("per_token", 0), ("per_group", 16)])
def test_naive_kv_qdq_parity(gran, gs):
    import torch

    ref_mod = _ref_kv()
    rng = np.random.RandomState(31)
    B, H, T, D = 2, 4, 10, 32
    k = rng.randn(B, H, T, D).astype(np.float32)
    v = rng.randn(B, H, T, D).astype(np.float32)

    cfg = {"bit": 4, "symmetric": False, "granularity": gran,
           "round_zp": False}
    if gs:
        cfg["group_size"] = gs
    ref = ref_mod.NaiveQuantKVCache("int-quant", _Cfg(cfg), 1)
    kq = ref._quantize(torch.from_numpy(k), 0, is_key=True)
    vq = ref._quantize(torch.from_numpy(v), 0, is_key=False)
    ref_k = ref._dequantize(kq).numpy()
    ref_v = ref._dequantize(vq).numpy()

    from lightcompress_tpu.compression.quantization.kvquant import (
        NaiveQuantKVCache)

    ours = NaiveQuantKVCache("int-quant", dict(cfg), 1)
    ok, ov = ours.make_hook(0)(jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(ok), ref_k, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ov), ref_v, atol=1e-6)


def test_kivi_prefix_numerics_parity():
    import torch

    ref_mod = _ref_kv()
    rng = np.random.RandomState(37)
    B, H, T, D, R = 1, 2, 24, 16, 8
    k = rng.randn(B, H, T, D).astype(np.float32)
    v = rng.randn(B, H, T, D).astype(np.float32)

    cfg = {"bit": 4, "symmetric": False, "granularity": "per_token",
           "round_zp": False}
    ref = ref_mod.NaiveQuantKVCache("int-quant", _Cfg(cfg), 1)
    ref_k_prefix = ref._dequantize(ref._quantize(
        torch.from_numpy(k[:, :, : T - R]), 0, is_key=True)).numpy()

    from lightcompress_tpu.compression.quantization.kvquant import (
        KiviQuantKVCache)

    cfg2 = dict(cfg)
    cfg2["residual_length"] = R
    ours = KiviQuantKVCache("int-quant", cfg2, 1)
    ok, _ = ours.make_hook(0)(jnp.asarray(k), jnp.asarray(v))
    # quantized prefix matches the reference qdq; fp window untouched
    np.testing.assert_allclose(np.asarray(ok[:, :, : T - R]),
                               ref_k_prefix, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ok[:, :, T - R:]),
                                  k[:, :, T - R:])
