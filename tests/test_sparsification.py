"""Sparsification tests: Wanda, Magnitude (unstructured + N:M), ShortGPT."""

import numpy as np

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def _calib(model, n=4, seq=16):
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, seq)), jnp.int32)
           for _ in range(n)]
    return model.collect_first_block_input(ids)


def _sparsity_of(w):
    w = np.asarray(w)
    return float((w == 0).mean())


def test_wanda_unstructured():
    model = make_tiny_adapter(seed=60)
    cfg = DotDict({"method": "Wanda", "weight": {"sparsity": 0.5}})
    algo = ALGO_REGISTRY["Wanda"](model, cfg, _calib(model), None, DotDict({}))
    algo.run_block_loop()
    s = _sparsity_of(model.blocks[0]["mlp"]["up"]["weight"])
    assert 0.45 < s < 0.55
    enc = np.random.RandomState(1).randint(0, 256, (1, 64)).astype(np.int32)
    assert np.isfinite(PerplexityEval(enc, seq_len=16, bs=1).eval(model))


def test_wanda_nm_pattern():
    model = make_tiny_adapter(seed=61)
    cfg = DotDict({"method": "Wanda", "weight": {"pattern": "2:4"}})
    algo = ALGO_REGISTRY["Wanda"](model, cfg, _calib(model), None, DotDict({}))
    algo.run_block_loop()
    w = np.asarray(model.blocks[0]["attn"]["q"]["weight"])
    # every group of 4 has exactly 2 zeros
    g = w.reshape(w.shape[0], -1, 4)
    zeros_per_group = (g == 0).sum(-1)
    assert (zeros_per_group == 2).all()


def test_magnitude():
    model = make_tiny_adapter(seed=62)
    cfg = DotDict({"method": "Magnitude", "weight": {"sparsity": 0.3}})
    algo = ALGO_REGISTRY["Magnitude"](model, cfg, _calib(model), None,
                                      DotDict({}))
    algo.run_block_loop()
    s = _sparsity_of(model.blocks[0]["mlp"]["down"]["weight"])
    assert 0.25 < s < 0.35


def test_wanda_beats_magnitude():
    """Wanda's activation-aware metric should prune less-important weights
    (measured by PPL) than plain magnitude at the same sparsity."""
    enc = np.random.RandomState(1).randint(0, 256, (1, 128)).astype(np.int32)

    def run(method):
        model = make_tiny_adapter(seed=63)
        cfg = DotDict({"method": method, "weight": {"sparsity": 0.6}})
        algo = ALGO_REGISTRY[method](model, cfg, _calib(model), None,
                                     DotDict({}))
        algo.run_block_loop()
        return PerplexityEval(enc, seq_len=16, bs=1).eval(model)

    ppl_w = run("Wanda")
    ppl_m = run("Magnitude")
    assert ppl_w < ppl_m * 1.05


def test_shortgpt_removes_layers():
    model = make_tiny_adapter(seed=64, layers=4)
    cfg = DotDict({"method": "ShortGPT", "weight": {"n_prune_layers": 2}})
    algo = ALGO_REGISTRY["ShortGPT"](model, cfg, _calib(model), None,
                                     DotDict({}))
    algo.run_block_loop()
    assert (algo.importances > 0).all()
    algo.deploy()
    assert model.num_blocks == 2
    enc = np.random.RandomState(1).randint(0, 256, (1, 64)).astype(np.int32)
    assert np.isfinite(PerplexityEval(enc, seq_len=16, bs=1).eval(model))
