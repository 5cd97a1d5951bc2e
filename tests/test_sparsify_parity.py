"""Reference-oracle parity for Wanda and Magnitude pruning (llmc
wanda.py:16-57, magnitude.py:15-31): same calib activations and weights
-> identical pruned tensors (metrics are distinct random floats, so the
tie-handling difference between scatter-k and threshold masks cannot
fire)."""

import sys
import types

import numpy as np

import jax.numpy as jnp


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


def _ref_sparse(*names):
    _stub_ref_deps()
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        mods = [importlib.import_module(
            f"llmc.compression.sparsification.{n}") for n in names]
    finally:
        sys.path.remove("/root/reference")
    return mods


def test_wanda_prune_parity(monkeypatch):
    import torch

    (ref_w_mod, ) = _ref_sparse("wanda")
    rng = np.random.RandomState(23)
    OC, C, B, T = 48, 64, 2, 7
    w = rng.randn(OC, C).astype(np.float32)
    act = rng.randn(B, T, C).astype(np.float32)
    sparsity = 0.5

    ref = object.__new__(ref_w_mod.Wanda)
    lin = torch.nn.Linear(C, OC, bias=False)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
    scaler = ref.get_row_scale(lin, torch.from_numpy(act))
    W_metric = torch.abs(lin.weight.data) * torch.sqrt(
        scaler.reshape((1, -1)))
    W_mask = torch.zeros_like(W_metric) == 1
    sort_res = torch.sort(W_metric, dim=-1, stable=True)
    idx = sort_res[1][:, : int(W_metric.shape[1] * sparsity)]
    W_mask.scatter_(1, idx, True)
    ref_w = lin.weight.data.clone()
    ref_w[W_mask] = 0
    ref_w = ref_w.numpy()

    from lightcompress_tpu.compression.sparsification.base import (
        prune_mask_unstructured)
    from lightcompress_tpu.compression.sparsification.wanda import Wanda

    ours = object.__new__(Wanda)
    scaler_row = Wanda.get_row_scale(ours, [jnp.asarray(act)])
    np.testing.assert_allclose(np.asarray(scaler_row), scaler.numpy(),
                               rtol=1e-6)
    metric = jnp.abs(jnp.asarray(w)) * jnp.sqrt(scaler_row)[None, :]
    mask = prune_mask_unstructured(metric, sparsity)
    ours_w = np.asarray(jnp.where(mask, jnp.asarray(w), 0))
    np.testing.assert_array_equal(ours_w, ref_w)


def test_shortgpt_bi_parity():
    """ShortGPT block-influence parity (llmc shortgpt.py:39-67): the
    per-token 1 - cos(input, output) sum matches the reference's
    compute_bi on the same (input, output) pair."""
    import torch

    (ref_s_mod, ) = _ref_sparse("shortgpt")
    rng = np.random.RandomState(41)
    B, T, D = 2, 9, 32
    x = rng.randn(B, T, D).astype(np.float32)
    y = (x + 0.3 * rng.randn(B, T, D)).astype(np.float32)

    ref = object.__new__(ref_s_mod.ShortGPT)
    ref_bi = float(ref.compute_bi(torch.from_numpy(x),
                                  torch.from_numpy(y)).sum())

    xf = jnp.asarray(x).reshape(-1, D)
    yf = jnp.asarray(y).reshape(-1, D)
    sim = jnp.sum(xf * yf, axis=-1) / (
        jnp.linalg.norm(xf, axis=-1) * jnp.linalg.norm(yf, axis=-1))
    ours_bi = float(jnp.sum(1 - jnp.nan_to_num(sim, nan=0.5)))
    np.testing.assert_allclose(ours_bi, ref_bi, rtol=1e-5)


def test_magnitude_prune_parity():
    import torch

    (ref_m_mod, ) = _ref_sparse("magnitude")
    rng = np.random.RandomState(29)
    OC, C = 32, 48
    w = rng.randn(OC, C).astype(np.float32)
    sparsity = 0.4

    W = torch.from_numpy(w.copy())
    W_metric = torch.abs(W)
    thresh = torch.sort(W_metric.flatten())[0][int(W.numel() * sparsity)]
    W_mask = W_metric <= thresh
    W[W_mask] = 0
    ref_w = W.numpy()
    assert ref_m_mod.Magnitude is not None  # module imports cleanly

    metric = jnp.abs(jnp.asarray(w))
    flat = jnp.sort(metric.reshape(-1))
    k = int(flat.shape[0] * sparsity)
    mask = metric > flat[k]
    ours_w = np.asarray(jnp.where(mask, jnp.asarray(w), 0))
    np.testing.assert_array_equal(ours_w, ref_w)
