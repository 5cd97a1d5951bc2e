"""Algorithm-breadth tests: SmoothQuant, OS+, LLM.int8, HQQ, QUIK, AdaDim,
DGQ — each runs end-to-end on a tiny model and must (a) not crash, (b) keep
the transformed model equivalent where applicable, (c) produce finite PPL."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def _run(model, cfg, n=4, seq=16):
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, seq)), jnp.int32)
           for _ in range(n)]
    inputs = model.collect_first_block_input(ids)
    algo = ALGO_REGISTRY[cfg.method](model, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    return algo


def _ppl(model, seed=1):
    enc = np.random.RandomState(seed).randint(0, 256, (1, 64)).astype(np.int32)
    return PerplexityEval(enc, seq_len=16, bs=1).eval(model)


W8A8 = {
    "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
    "act": {"bit": 8, "symmetric": True, "granularity": "per_token"},
}


def test_smoothquant_equivalence_and_quant():
    model = make_tiny_adapter(seed=40)
    ppl_fp = _ppl(model)
    cfg = DotDict({"method": "SmoothQuant", **W8A8,
                   "special": {"alpha": 0.5}})
    algo = _run(model, cfg)
    algo.deploy("transformed")
    ppl_t = _ppl(model)
    assert abs(ppl_t - ppl_fp) / ppl_fp < 0.02  # transform is equivalence
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))
    # ln weights actually changed
    assert not np.allclose(
        np.asarray(model.blocks[0]["ln1"]["weight"]), 1.0, atol=1e-6
    )


def test_osplus_runs():
    model = make_tiny_adapter(seed=41)
    ppl_fp = _ppl(model)
    cfg = DotDict({"method": "OsPlus", **W8A8, "special": {"n_grid": 20}})
    algo = _run(model, cfg)
    algo.deploy("transformed")
    ppl_t = _ppl(model)
    assert abs(ppl_t - ppl_fp) / ppl_fp < 0.05
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))


def test_llmint8_outlier_decomposition():
    model = make_tiny_adapter(seed=42)
    cfg = DotDict({"method": "LlmInt8", **W8A8,
                   "special": {"threshold": 6.0}})
    algo = _run(model, cfg)
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))
    # low threshold -> everything fp -> near-exact
    from lightcompress_tpu.compression.quantization.llmint8 import _masked_qdq_rows
    from lightcompress_tpu.quant import QuantSpec

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    spec = QuantSpec(bit=8, symmetric=True, granularity="per_channel")
    all_fp = _masked_qdq_rows(x, jnp.ones((1, 16), bool), spec)
    np.testing.assert_allclose(np.asarray(all_fp), np.asarray(x), atol=1e-6)
    none_fp = _masked_qdq_rows(x, jnp.zeros((1, 16), bool), spec)
    assert not np.allclose(np.asarray(none_fp), np.asarray(x), atol=1e-7)


def test_hqq_static_qparams():
    model = make_tiny_adapter(seed=43)
    cfg = DotDict({
        "method": "HQQ",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"lp_norm": 0.7, "beta": 10, "kappa": 1.01, "iters": 5,
                    "axis": 1},
    })
    algo = _run(model, cfg)
    assert "qparams" in algo.layer_state[0]["attn.q"]
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))


def test_quik_outlier_indices():
    model = make_tiny_adapter(seed=44)
    cfg = DotDict({
        "method": "QUIK", **W8A8,
        "special": {"fp_relative": False, "fp_features": 8,
                    "fp_threshold": 0.0},
    })
    algo = _run(model, cfg)
    st = algo.layer_state[0]["attn.q"]
    assert len(st["fp_ids"]) == 8
    assert len(st["int_ids"]) == 64 - 8
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))


def test_adadim_picks_dim():
    model = make_tiny_adapter(seed=45)
    cfg = DotDict({
        "method": "AdaDim",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_channel"},
    })
    algo = _run(model, cfg)
    assert all(
        "dim_ic" in algo.layer_state[0][n]
        for n in model.get_block_linear_names(0)
    )
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))


def test_dgq_double_quant():
    model = make_tiny_adapter(seed=46)
    cfg = DotDict({
        "method": "DGQ",
        "weight": {
            "w_1": {"bit": 4, "symmetric": False, "granularity": "per_group",
                    "group_size": 16},
            "w_2": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
        },
        "act": {"bit": 8, "symmetric": True, "granularity": "per_token"},
    })
    algo = _run(model, cfg)
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))
