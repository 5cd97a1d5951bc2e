"""Host-offloaded block streaming: calibration + eval must give identical
results to all-in-HBM execution."""

import numpy as np

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval
from lightcompress_tpu.models.streaming import (
    offload_blocks_to_host,
    stream_forward,
)
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def test_stream_forward_matches_resident():
    m = make_tiny_adapter(seed=100)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (2, 8)),
                      jnp.int32)
    ref = np.asarray(m.forward(ids))
    offload_blocks_to_host(m)
    assert isinstance(m.params["blocks"][0]["attn"]["q"]["weight"],
                      np.ndarray)
    out = np.asarray(stream_forward(m, ids))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_streaming_calibration_matches_resident():
    """AWQ with host-offloaded blocks == AWQ fully resident."""
    def run(offload):
        m = make_tiny_adapter(seed=101)
        rng = np.random.RandomState(0)
        ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)
               for _ in range(2)]
        inputs = m.collect_first_block_input(ids)
        if offload:
            offload_blocks_to_host(m)
        cfg = DotDict({
            "method": "Awq",
            "weight": {"bit": 4, "symmetric": False,
                       "granularity": "per_group", "group_size": 16},
            "special": {"trans": True, "trans_version": "v2",
                        "weight_clip": False},
        })
        algo = ALGO_REGISTRY["Awq"](m, cfg, inputs, None, DotDict({}))
        algo.run_block_loop()
        return m

    m_res = run(False)
    m_str = run(True)
    w_res = np.asarray(m_res.blocks[0]["attn"]["q"]["weight"])
    w_str = np.asarray(m_str.blocks[0]["attn"]["q"]["weight"])
    np.testing.assert_allclose(w_str, w_res, atol=1e-5, rtol=1e-4)
    # blocks returned to host after the loop
    assert isinstance(m_str.params["blocks"][0]["attn"]["q"]["weight"],
                      np.ndarray)


def test_streaming_fake_quant_eval():
    m = make_tiny_adapter(seed=102)
    enc = np.random.RandomState(1).randint(0, 256, (1, 64)).astype(np.int32)
    pe_res = PerplexityEval(enc, seq_len=16, bs=1)
    pe_str = PerplexityEval(enc, seq_len=16, bs=1, inference_per_block=True)

    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, 16)), jnp.int32)]
    inputs = m.collect_first_block_input(ids)
    offload_blocks_to_host(m)
    cfg = DotDict({"method": "RTN",
                   "weight": {"bit": 4, "symmetric": False,
                              "granularity": "per_group", "group_size": 16}})
    algo = ALGO_REGISTRY["RTN"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    # baked blocks stay on host
    assert isinstance(m.params["blocks"][0]["attn"]["q"]["weight"],
                      np.ndarray)
    ppl = pe_str.eval(m)
    assert np.isfinite(ppl)
