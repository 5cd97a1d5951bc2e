"""GPTQ tests: layer-transform math vs a NumPy reference implementation of
the OBQ column loop, plus end-to-end PPL improvement over RTN."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval
from lightcompress_tpu.quant import QuantSpec
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401
from lightcompress_tpu.compression.quantization.gptq import gptq_quantize_layer


def np_gptq_reference(W, H, qmin, qmax, gs, blocksize, percdamp=0.01,
                      actorder=False):
    """Straightforward NumPy OBQ loop (independent re-derivation of the
    GPTQ algorithm; per-group asym minmax qparams refreshed at group
    boundaries)."""
    W = W.astype(np.float64).copy()
    H = H.astype(np.float64).copy()
    oc, cols = W.shape
    dead = np.diag(H) == 0
    H[dead, dead] = 1
    W[:, dead] = 0
    perm = np.arange(cols)
    if actorder:
        perm = np.argsort(-np.diag(H))
        W = W[:, perm]
        H = H[perm][:, perm]
    H += np.eye(cols) * (percdamp * np.mean(np.diag(H)))
    Hinv = np.linalg.inv(H)
    U = np.linalg.cholesky(Hinv).T  # upper, Hinv = U^T U

    scales = np.zeros((oc, cols // gs))
    zeros_a = np.zeros((oc, cols // gs))
    Q = np.zeros_like(W)
    for i1 in range(0, cols, blocksize):
        i2 = min(i1 + blocksize, cols)
        Err = np.zeros((oc, i2 - i1))
        for i in range(i1, i2):
            if i % gs == 0:
                g = i // gs
                blockW = W[:, i:i + gs]
                mx, mn = blockW.max(1), blockW.min(1)
                s = np.clip(mx - mn, 1e-5, None) / (qmax - qmin)
                z = np.clip(qmin - np.round(mn / s), qmin, qmax)
                scales[:, g] = s
                zeros_a[:, g] = z
            g = i // gs
            s, z = scales[:, g], zeros_a[:, g]
            w = W[:, i]
            q = np.clip(np.round(w / s) + z, qmin, qmax)
            dq = (q - z) * s
            Q[:, i] = w
            err = (w - dq) / U[i, i]
            W[:, i + 1:i2] -= err[:, None] * U[i, i + 1:i2][None, :]
            Err[:, i - i1] = err
        W[:, i2:] -= Err @ U[i1:i2, i2:]
        Q[:, i1:i2] = W[:, i1:i2]
    invperm = np.argsort(perm)
    return W[:, invperm], scales, zeros_a, perm


@pytest.mark.parametrize("actorder", [False, True])
def test_gptq_layer_matches_numpy_reference(actorder):
    rng = np.random.RandomState(0)
    oc, ic, gs, bs = 8, 64, 16, 16
    W = rng.randn(oc, ic).astype(np.float32)
    X = rng.randn(256, ic).astype(np.float32)
    H = 2 * X.T @ X / 4  # arbitrary n_seq scaling
    spec = QuantSpec(bit=4, symmetric=False, granularity="per_group",
                     group_size=gs)
    W_new, scales, zeros, perm = gptq_quantize_layer(
        jnp.asarray(W), jnp.asarray(H), spec, blocksize=bs, group_size=gs,
        actorder=actorder,
    )
    W_ref, s_ref, z_ref, perm_ref = np_gptq_reference(
        W, H, spec.qmin, spec.qmax, gs, bs, actorder=actorder
    )
    np.testing.assert_allclose(np.asarray(W_new), W_ref, rtol=1e-3, atol=1e-3)
    if actorder:
        np.testing.assert_array_equal(np.asarray(perm), perm_ref)


def test_gptq_beats_rtn_ppl():
    qw = {"bit": 3, "symmetric": False, "granularity": "per_group",
          "group_size": 16}
    enc = np.random.RandomState(1).randint(0, 256, (1, 128)).astype(np.int32)

    def run(method, extra=None):
        model = make_tiny_adapter(seed=30)
        cfg = DotDict({"method": method, "weight": dict(qw),
                       **(extra or {})})
        rng = np.random.RandomState(0)
        ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)
               for _ in range(4)]
        inputs = model.collect_first_block_input(ids)
        algo = ALGO_REGISTRY[method](model, cfg, inputs, None, DotDict({}))
        algo.run_block_loop()
        algo.deploy("fake_quant")
        return PerplexityEval(enc, seq_len=16, bs=1).eval(model)

    ppl_rtn = run("RTN")
    ppl_gptq = run("GPTQ", {"special": {"actorder": False, "percdamp": 0.01,
                                        "blocksize": 16},
                            "quant_out": True})
    assert np.isfinite(ppl_gptq)
    assert ppl_gptq < ppl_rtn * 1.02  # GPTQ should not be worse


def test_gptq_true_sequential_and_actorder():
    model = make_tiny_adapter(seed=31)
    cfg = DotDict({
        "method": "GPTQ",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"actorder": True, "true_sequential": True,
                    "static_groups": True, "blocksize": 16},
        "quant_out": True,
    })
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)
           for _ in range(4)]
    inputs = model.collect_first_block_input(ids)
    algo = ALGO_REGISTRY["GPTQ"](model, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    enc = np.random.RandomState(1).randint(0, 256, (1, 64)).astype(np.int32)
    ppl = PerplexityEval(enc, seq_len=16, bs=1).eval(model)
    assert np.isfinite(ppl)


def test_gptq_owq_outlier_columns():
    """OWQ: top-sensitivity columns stay full precision."""
    model = make_tiny_adapter(seed=33)
    cfg = DotDict({
        "method": "GPTQ",
        "weight": {"bit": 3, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"blocksize": 16, "owq": True, "n_out_ratio": 0.25},
        "quant_out": True,
    })
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)]
    inputs = model.collect_first_block_input(ids)
    algo = ALGO_REGISTRY["GPTQ"](model, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    st = algo.layer_state[0]["attn.q"]["gptq"]
    assert st["n_out"] == 16  # 64 cols * 0.25 aligned to g16
    # w_qdq keeps those columns exactly equal to the input weight
    w = model.blocks[0]["attn"]["q"]["weight"]
    q = algo.w_qdq(w, 0, "attn.q")
    outlier_ids = np.asarray(st["perm"])[-16:]
    np.testing.assert_allclose(
        np.asarray(q)[:, outlier_ids], np.asarray(w)[:, outlier_ids],
        atol=1e-6,
    )
    # non-outlier columns are quantized (changed)
    kept = np.asarray(st["perm"])[:-16]
    assert not np.allclose(np.asarray(q)[:, kept], np.asarray(w)[:, kept])
    algo.deploy("fake_quant")
    enc = rng.randint(0, 256, (1, 64)).astype(np.int32)
    assert np.isfinite(PerplexityEval(enc, seq_len=16, bs=1).eval(model))
