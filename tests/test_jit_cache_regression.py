"""Regression: evals must see updated params after deploy.

jax.jit(model.forward) on a bound method can silently reuse an executable
traced with the OLD closed-over params (bound methods of one object hash
equal); model.jit_forward() passes params as a traced argument instead.
This bit the pipeline: 'transformed' PPL bit-identical to 'pretrain'.
"""

import numpy as np

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter


def test_jit_forward_sees_param_updates():
    m = make_tiny_adapter(seed=0, vocab=64, hidden=32, inter=64, layers=1,
                          heads=2, kv_heads=2)
    ids = jnp.asarray([[1, 2, 3, 4]])
    f1 = m.jit_forward()
    y1 = np.asarray(f1(ids))
    m.params["blocks"][0]["ln1"]["weight"] = (
        m.params["blocks"][0]["ln1"]["weight"] * 2.0
    )
    y2 = np.asarray(m.jit_forward()(ids))
    y_direct = np.asarray(m.forward(ids))
    assert not np.array_equal(y1, y2)
    np.testing.assert_allclose(y2, y_direct, rtol=1e-5, atol=1e-5)


def test_ppl_eval_sees_transform():
    from lightcompress_tpu.config import DotDict
    from lightcompress_tpu.eval import PerplexityEval
    from lightcompress_tpu.registry import ALGO_REGISTRY
    import lightcompress_tpu.compression  # noqa: F401

    m = make_tiny_adapter(seed=1)
    enc = np.random.RandomState(0).randint(0, 256, (1, 64)).astype(np.int32)
    pe = PerplexityEval(enc, seq_len=16, bs=1)
    p0 = pe.eval(m)
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)]
    inputs = m.collect_first_block_input(ids)
    cfg = DotDict({"method": "Awq",
                   "weight": {"bit": 4, "symmetric": False,
                              "granularity": "per_group", "group_size": 16},
                   "special": {"trans": True, "trans_version": "v2",
                               "weight_clip": False}})
    algo = ALGO_REGISTRY["Awq"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    p1 = pe.eval(m)
    # fake-quant at 4-bit MUST change the PPL (stale cache would keep it
    # bit-identical)
    assert p0 != p1
