"""Eval-surface tests: CustomGenerate, quant analysis, scaled matmul ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter, make_tiny_hf_llama

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def test_int8_matmul_dynamic_accuracy():
    from lightcompress_tpu.ops.scaled_matmul import int8_matmul_dynamic

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    w = rng.randn(32, 64).astype(np.float32)
    ws = np.abs(w).max(1) / 127.0
    wq = jnp.asarray(np.clip(np.round(w / ws[:, None]), -128, 127), jnp.int8)
    y = int8_matmul_dynamic(x, wq, jnp.asarray(ws))
    ref = x @ w.T
    rel = float(jnp.mean(jnp.abs(y - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.02


def test_fp8_matmul():
    from lightcompress_tpu.ops.scaled_matmul import fp8_matmul
    from lightcompress_tpu.quant import QuantSpec, real_quant_weight

    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(32, 64).astype(np.float32))
    spec = QuantSpec(bit="e4m3", granularity="per_channel")
    codes, scales, _ = real_quant_weight(w, spec)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    y = fp8_matmul(x, codes, scales)
    ref = x @ w.T
    rel = float(jnp.mean(jnp.abs(y - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.06


def test_quant_analysis():
    from lightcompress_tpu.utils import analyze_blocks

    model = make_tiny_adapter(seed=90)
    cfg = DotDict({"method": "RTN",
                   "weight": {"bit": 4, "symmetric": False,
                              "granularity": "per_group", "group_size": 16}})
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)]
    inputs = model.collect_first_block_input(ids)
    algo = ALGO_REGISTRY["RTN"](model, cfg, inputs, None, DotDict({}))
    report = analyze_blocks(model, algo, inputs)
    assert len(report) == model.num_blocks
    for r in report:
        assert 0.5 < r["fp_quant_cosine"] <= 1.0
        assert np.isfinite(r["input_kurtosis"])


def test_quant_analysis_per_linear():
    """Per-linear sweep parity (reference tools/quant_analysis.py:88-185):
    min/avg output cosine per sample + weight/act kurtosis per
    granularity."""
    from lightcompress_tpu.utils.quant_analysis import analyze_linears

    model = make_tiny_adapter(seed=90)
    cfg = DotDict({"method": "RTN",
                   "weight": {"bit": 4, "symmetric": False,
                              "granularity": "per_group", "group_size": 16}})
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (2, 16)), jnp.int32)]
    inputs = model.collect_first_block_input(ids)
    algo = ALGO_REGISTRY["RTN"](model, cfg, inputs, None, DotDict({}))
    rows = analyze_linears(model, algo, inputs, granularity="per_group",
                           group_size=16)
    names = {r["linear"] for r in rows}
    assert {"attn.q", "mlp.down"} <= names
    for r in rows:
        assert 0.5 < r["min_cos"] <= r["avg_cos"] <= 1.0 + 1e-6
        assert np.isfinite(r["w_kurtosis"]) and np.isfinite(
            r["act_kurtosis"])


def test_custom_generate_with_tokenizer(tmp_path):
    from lightcompress_tpu.eval.harness import CustomGenerate
    from lightcompress_tpu.models import load_model

    d, _ = make_tiny_hf_llama(str(tmp_path))
    model = load_model(d, dtype=jnp.float32)
    gen = CustomGenerate(model, max_new_tokens=4)
    # tiny checkpoints have no tokenizer — token-id prompts path
    outs = gen.generate([[1, 5, 9], [2, 7]])
    assert len(outs) == 2
    assert all(len(o) == 4 for o in outs)
