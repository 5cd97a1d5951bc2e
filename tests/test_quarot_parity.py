"""Reference-oracle parity for QuaRot's offline weight transforms
(llmc base_blockwise_quantization.py:780-875, quarot.py:114-144,
hadamard_utils.py:129-160) with a SHARED fixed orthogonal Q: LN fusion,
input-dim rotation (W @ Q), output-dim rotation (Q^T @ W, bias), the
OPT mean-bake, and the exact per-head/full Hadamard weight bake.

The reference's fast_hadamard_transform CUDA extension is stubbed with
an exact float64 torch FWHT (the transform it wraps)."""

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
    if "fast_hadamard_transform" not in sys.modules:
        import torch

        def _fwht(x, scale=1.0):
            orig = x.shape
            n = orig[-1]
            y = x.reshape(-1, n).clone()
            h = 1
            while h < n:
                y = y.reshape(-1, n // (2 * h), 2, h)
                a = y[:, :, 0, :].clone()
                b = y[:, :, 1, :].clone()
                y[:, :, 0, :] = a + b
                y[:, :, 1, :] = a - b
                y = y.reshape(-1, n)
                h *= 2
            return (y * scale).reshape(orig)

        import importlib.machinery

        fht = types.ModuleType("fast_hadamard_transform")
        fht.hadamard_transform = _fwht
        fht.__spec__ = importlib.machinery.ModuleSpec(
            "fast_hadamard_transform", None)
        sys.modules["fast_hadamard_transform"] = fht


def _ref_bbq():
    _stub_ref_deps()
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        bbq = importlib.import_module(
            "llmc.compression.quantization.base_blockwise_quantization")
        had = importlib.import_module(
            "llmc.compression.quantization.hadamard_utils")
    finally:
        sys.path.remove("/root/reference")
    # hadamard_utils may be cached from an earlier parity test that ran
    # before the stub existed (its guarded import leaves the name
    # unbound) — bind the stub on the module unconditionally
    had.fast_hadamard_transform = sys.modules["fast_hadamard_transform"]
    return bbq, had


def _lin(w, b=None):
    import torch

    lin = torch.nn.Linear(w.shape[1], w.shape[0], bias=b is not None)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
        if b is not None:
            lin.bias.copy_(torch.from_numpy(b))
    return lin


def test_quarot_offline_rotations_parity(monkeypatch):
    import torch

    bbq_mod, _ = _ref_bbq()
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self_, *a, **k: self_, raising=False)
    rng = np.random.RandomState(13)
    H, OC = 64, 48
    Q64, _ = np.linalg.qr(rng.randn(H, H))
    w1 = (rng.randn(OC, H) * 0.2).astype(np.float32)
    w2 = (rng.randn(H, OC) * 0.2).astype(np.float32)
    b2 = rng.randn(H).astype(np.float32)
    gamma = (1.0 + 0.1 * rng.randn(H)).astype(np.float32)
    beta = (0.1 * rng.randn(H)).astype(np.float32)

    ref = object.__new__(bbq_mod.BaseBlockwiseQuantization)
    ln = torch.nn.LayerNorm(H)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(gamma))
        ln.bias.copy_(torch.from_numpy(beta))
    fc1 = _lin(w1)
    ref.fuse_ln_fcs(ln, [fc1])
    ref.rotate_pre_layers([fc1], torch.from_numpy(Q64))
    fc2 = _lin(w2, b2)
    ref.rotate_post_layers([fc2], torch.from_numpy(Q64), exact_had=False)
    fc3 = _lin(w1.copy(), rng.randn(OC).astype(np.float32))
    b3 = fc3.bias.detach().numpy().copy()
    ref.bake_mean_into_fc(fc3)

    from lightcompress_tpu.compression.quantization.quarot import Quarot

    ours = object.__new__(Quarot)
    Qj = jnp.asarray(Q64, jnp.float32)
    ln_d = {"weight": jnp.asarray(gamma), "bias": jnp.asarray(beta)}
    fc1_d = {"weight": jnp.asarray(w1)}
    Quarot._fuse_norm_into(ours, ln_d, [fc1_d])
    fc1_w = (fc1_d["weight"].astype(jnp.float32) @ Qj)
    np.testing.assert_allclose(np.asarray(fc1_w),
                               fc1.weight.detach().numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fc1_d["bias"]),
                               fc1.bias.detach().numpy(),
                               rtol=2e-5, atol=2e-5)
    assert float(jnp.max(jnp.abs(ln_d["weight"] - 1))) == 0

    w2_r = Qj.T @ jnp.asarray(w2)
    b2_r = Qj.T @ jnp.asarray(b2)
    np.testing.assert_allclose(np.asarray(w2_r),
                               fc2.weight.detach().numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(b2_r),
                               fc2.bias.detach().numpy(),
                               rtol=2e-5, atol=2e-5)

    fc3_d = {"weight": jnp.asarray(w1), "bias": jnp.asarray(b3)}
    Quarot._bake_mean_into_fc(ours, fc3_d)
    np.testing.assert_allclose(np.asarray(fc3_d["weight"]),
                               fc3.weight.detach().numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fc3_d["bias"]),
                               fc3.bias.detach().numpy(),
                               rtol=2e-5, atol=2e-5)


def test_quarot_exact_had_bake_parity(monkeypatch):
    """apply_exact_had_to_linear parity (power-of-two dims -> the K=1
    FWHT path): full-had on the input dim (down_proj bake) and per-head
    had on the output dim (v_proj bake)."""
    import torch

    _, had_mod = _ref_bbq()
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self_, *a, **k: self_, raising=False)
    rng = np.random.RandomState(17)
    IC, OC, HD = 128, 64, 16
    w = (rng.randn(OC, IC) * 0.3).astype(np.float32)

    lin = _lin(w)
    had_mod.apply_exact_had_to_linear(lin, had_dim=-1, output=False)
    ref_in = lin.weight.detach().numpy()

    lin2 = _lin(w)
    had_mod.apply_exact_had_to_linear(lin2, had_dim=HD, output=True)
    ref_out = lin2.weight.detach().numpy()

    from lightcompress_tpu.ops.hadamard import apply_exact_had_to_linear

    ours_in = np.asarray(apply_exact_had_to_linear(
        jnp.asarray(w), had_dim=-1, output=False))
    ours_out = np.asarray(apply_exact_had_to_linear(
        jnp.asarray(w), had_dim=HD, output=True))
    np.testing.assert_allclose(ours_in, ref_in, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ours_out, ref_out, rtol=2e-5, atol=2e-5)
