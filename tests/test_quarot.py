"""QuaRot tests: rotation equivalence (float output preserved), online
Hadamard path, and quantization benefit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def _run_quarot(model, online=False, mode="hadamard"):
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)
           for _ in range(2)]
    inputs = model.collect_first_block_input(ids)
    cfg = DotDict({
        "method": "Quarot",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"rotate_mode": mode, "online_rotate": online,
                    "fp32_had": True},
    })
    algo = ALGO_REGISTRY["Quarot"](model, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    return algo


def _ppl(model, seed=1):
    enc = np.random.RandomState(seed).randint(0, 256, (1, 64)).astype(np.int32)
    return PerplexityEval(enc, seq_len=16, bs=1).eval(model)


@pytest.mark.parametrize("mode", ["hadamard", "random"])
def test_quarot_preserves_float_output(mode):
    model = make_tiny_adapter(seed=50)
    ppl_fp = _ppl(model)
    algo = _run_quarot(model, online=False, mode=mode)
    algo.deploy("transformed")
    ppl_rot = _ppl(model)
    assert abs(ppl_rot - ppl_fp) / ppl_fp < 0.01
    # norm weights are now ones (fused)
    np.testing.assert_allclose(
        np.asarray(model.blocks[0]["ln1"]["weight"]), 1.0, atol=1e-6
    )


def test_quarot_online_rotation_equivalence():
    model = make_tiny_adapter(seed=51)
    ppl_fp = _ppl(model)
    algo = _run_quarot(model, online=True)
    assert "mlp.down" in model.rotate_cfg
    assert model.rotate_cfg["mlp.down"] == ("full", 0)
    assert model.rotate_cfg["attn.o"] == ("head", 16)
    algo.deploy("transformed")
    ppl_rot = _ppl(model)
    assert abs(ppl_rot - ppl_fp) / ppl_fp < 0.01


def test_quarot_then_quant():
    model = make_tiny_adapter(seed=52)
    algo = _run_quarot(model, online=True)
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))


def test_quarot_unties_embeddings():
    model = make_tiny_adapter(seed=53)
    # make a tied model
    import dataclasses

    model.arch = dataclasses.replace(model.arch, tie_word_embeddings=True)
    model.params.pop("lm_head")
    ppl_fp = _ppl(model)
    algo = _run_quarot(model)
    assert "lm_head" in model.params
    assert not model.arch.tie_word_embeddings
    algo.deploy("transformed")
    assert abs(_ppl(model) - ppl_fp) / ppl_fp < 0.01


def test_williamson_hadamard_orders():
    """Orders 156/172 (the reference's largest tabulated Hadamards,
    get_had156/172) construct from our searched Williamson quadruples;
    Llama-2's 11008 = 2^6 * 172 factors online."""
    import numpy as np
    from lightcompress_tpu.ops.hadamard import (get_hadK, hadamard_matrix_K,
                                                matmul_hadU)

    for K in (156, 172):
        H = hadamard_matrix_K(K)
        assert np.array_equal(H @ H.T, K * np.eye(K, dtype=np.int64))
    for n, expect_K in ((11008, 172), (4992, 156)):
        _, K = get_hadK(n)
        assert K == expect_K
        x = jax.random.normal(jax.random.PRNGKey(0), (2, n))
        y = matmul_hadU(x)
        np.testing.assert_allclose(float(jnp.linalg.norm(y)),
                                   float(jnp.linalg.norm(x)), rtol=1e-5)
