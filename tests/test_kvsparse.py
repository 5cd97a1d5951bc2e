"""Sparse KV tests: Sink (sink+window mask) and ShadowKV (low-rank K +
landmark retrieval)."""

import numpy as np

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval
from lightcompress_tpu.registry import ALGO_REGISTRY, KV_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def test_sink_mask_shape_and_semantics():
    kv = KV_REGISTRY["Sink"]("", {"num_sink": 2, "window_size": 3}, 2)
    hook = kv.make_hook(0)
    k = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 10, 8))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 10, 8))
    k2, v2, extra = hook(k, v)
    assert extra.shape == (1, 1, 10, 10)
    m = np.asarray(extra[0, 0])
    # query 8 sees sinks {0,1} and window {6,7,8}; not 3
    assert m[8, 0] == 0 and m[8, 7] == 0
    assert m[8, 3] < -1e30
    # short sequences untouched
    k3, v3, e3 = hook(k[:, :, :4], v[:, :, :4])
    assert e3 is None


def test_shadowkv_lowrank_and_retrieval():
    kv = KV_REGISTRY["ShadowKV"](
        "", {"rank": 4, "chunk_size": 4, "sparse_budget": 2}, 2
    )
    hook = kv.make_hook(0)
    k = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 8))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 32, 8))
    k2, v2, extra = hook(k, v)
    assert k2.shape == k.shape
    # K is rank-reduced
    s = np.linalg.svd(np.asarray(k2[0, 0], dtype=np.float64), compute_uv=False)
    assert s[4] < 1e-3 * s[0]
    # some tokens masked out, sinks+local kept
    m = np.asarray(extra[0, 0, 0])
    assert (m < -1e30).any()
    assert (m[:4] == 0).all() and (m[-4:] == 0).all()


def test_sink_kv_e2e_ppl():
    model = make_tiny_adapter(seed=95)
    cfg = DotDict({
        "method": "Dense",
        "weight": {"sparsity": 0.0},
        "kvcache": {"method": "Sink", "num_sink": 2, "window_size": 8},
    })
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)]
    inputs = model.collect_first_block_input(ids)
    algo = ALGO_REGISTRY["Dense"](model, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy()
    assert model.kv_hooks is not None
    enc = rng.randint(0, 256, (1, 64)).astype(np.int32)
    ppl_sink = PerplexityEval(enc, seq_len=32, bs=1).eval(model)
    assert np.isfinite(ppl_sink)
    # full attention differs from windowed
    model.kv_hooks = None
    ppl_full = PerplexityEval(enc, seq_len=32, bs=1).eval(model)
    assert ppl_sink != ppl_full
