"""KV-cache quantization tests: Naive (dynamic + static) and KIVI."""

import numpy as np

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import DecodePerplexityEval, PerplexityEval
from lightcompress_tpu.registry import ALGO_REGISTRY, KV_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def _calib(model, n=4, seq=16, seed=0):
    rng = np.random.RandomState(seed)
    ids = [jnp.asarray(rng.randint(0, 256, (1, seq)), jnp.int32) for _ in range(n)]
    return model.collect_first_block_input(ids)


def test_naive_kv_dynamic_hook():
    kv = KV_REGISTRY["Naive"](
        "int-quant",
        {"method": "Naive", "bit": 8, "symmetric": True,
         "granularity": "per_token"},
        2,
    )
    k = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 16))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 16))
    hook = kv.make_hook(0)
    kq, vq = hook(k, v)
    assert kq.shape == k.shape
    assert float(jnp.max(jnp.abs(kq - k))) < 0.05  # 8-bit per-token ~ tight


def test_kivi_residual_window():
    kv = KV_REGISTRY["Kivi"](
        "int-quant",
        {"method": "Kivi", "bit": 4, "symmetric": False,
         "granularity": "per_token", "residual_length": 4},
        2,
    )
    k = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 16))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 16))
    kq, vq = kv.make_hook(0)(k, v)
    # last 4 tokens untouched
    np.testing.assert_array_equal(np.asarray(kq[:, :, 4:]), np.asarray(k[:, :, 4:]))
    # earlier tokens quantized (changed)
    assert not np.array_equal(np.asarray(kq[:, :, :4]), np.asarray(k[:, :, :4]))


def test_rtn_with_kv_quant_e2e():
    model = make_tiny_adapter(seed=20)
    qcfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
        "kvcache": {"method": "Naive", "bit": 8, "symmetric": True,
                    "granularity": "per_token"},
    })
    inputs = _calib(model)
    algo = ALGO_REGISTRY["RTN"](model, qcfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    assert model.kv_hooks is not None
    enc = np.random.RandomState(0).randint(0, 256, (1, 64)).astype(np.int32)
    ppl = PerplexityEval(enc, seq_len=16, bs=1).eval(model)
    assert np.isfinite(ppl)
    # fake_quant_wo_kv must NOT install hooks
    algo.restore_float()
    algo.deploy("fake_quant_wo_kv")
    assert model.kv_hooks is None


def test_static_kv_calibration():
    model = make_tiny_adapter(seed=21)
    qcfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
        "act": {"bit": 8, "symmetric": True, "granularity": "per_tensor",
                "static": True, "calib_algo": "static_minmax"},
        "kvcache": {"method": "Naive", "bit": 8, "symmetric": True,
                    "granularity": "per_tensor"},
    })
    inputs = _calib(model)
    algo = ALGO_REGISTRY["RTN"](model, qcfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    assert algo.kv_module.static
    assert all(qp is not None for qp in algo.kv_module.k_qparams)
    algo.deploy("fake_quant")
    enc = np.random.RandomState(0).randint(0, 256, (1, 64)).astype(np.int32)
    ppl = PerplexityEval(enc, seq_len=16, bs=1).eval(model)
    assert np.isfinite(ppl)


def test_decode_ppl_with_kv_quant():
    model = make_tiny_adapter(seed=22, layers=1)
    qcfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
        "kvcache": {"method": "Naive", "bit": 8, "symmetric": True,
                    "granularity": "per_token"},
    })
    inputs = _calib(model)
    algo = ALGO_REGISTRY["RTN"](model, qcfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    enc = np.random.RandomState(1).randint(0, 256, (1, 24)).astype(np.int32)
    ppl = DecodePerplexityEval(enc, num_eval_tokens=16).eval(model)
    assert np.isfinite(ppl)
