"""Training-based algorithms: NormTweaking, OmniQuant (LWC/LET), TesseraQ,
SpQR.  Each must improve (or at least not hurt) block reconstruction vs
plain RTN and produce finite PPL."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


W3G16 = {"bit": 3, "symmetric": False, "granularity": "per_group",
         "group_size": 16}


def _calib(model, n=2, seq=16):
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 256, (1, seq)), jnp.int32)
           for _ in range(n)]
    return model.collect_first_block_input(ids)


def _ppl(model, seed=1):
    enc = np.random.RandomState(seed).randint(0, 256, (1, 64)).astype(np.int32)
    return PerplexityEval(enc, seq_len=16, bs=1).eval(model)


def _rtn_baseline(seed):
    model = make_tiny_adapter(seed=seed)
    cfg = DotDict({"method": "RTN", "weight": dict(W3G16)})
    algo = ALGO_REGISTRY["RTN"](model, cfg, _calib(model), None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    return _ppl(model)


def test_ntweak_trains_norms():
    model = make_tiny_adapter(seed=70)
    before = np.asarray(model.blocks[0]["ln1"]["weight"]).copy()
    cfg = DotDict({"method": "NormTweaking", "weight": dict(W3G16),
                   "special": {"epochs": 2, "ntweak_lr": 1e-2, "gamma": 0.1}})
    algo = ALGO_REGISTRY["NormTweaking"](model, cfg, _calib(model), None,
                                         DotDict({}))
    algo.run_block_loop()
    after = np.asarray(model.blocks[0]["ln1"]["weight"])
    assert not np.allclose(before, after)  # gammas actually moved
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))


def test_omniquant_lwc():
    ppl_rtn = _rtn_baseline(71)
    model = make_tiny_adapter(seed=71)
    cfg = DotDict({"method": "OmniQuant", "weight": dict(W3G16),
                   "special": {"epochs": 4, "lwc": True, "let": False,
                               "lwc_lr": 5e-3}})
    algo = ALGO_REGISTRY["OmniQuant"](model, cfg, _calib(model), None,
                                      DotDict({}))
    algo.run_block_loop()
    assert "upbound_factor" in algo.layer_state[0]["attn.q"]
    algo.deploy("fake_quant")
    ppl = _ppl(model)
    assert np.isfinite(ppl)
    assert ppl < ppl_rtn * 1.05  # LWC should not hurt


def test_omniquant_let():
    model = make_tiny_adapter(seed=72)
    cfg = DotDict({
        "method": "OmniQuant",
        "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
        "act": {"bit": 8, "symmetric": True, "granularity": "per_token"},
        "special": {"epochs": 2, "lwc": True, "let": True,
                    "lwc_lr": 5e-3, "let_lr": 1e-3},
    })
    algo = ALGO_REGISTRY["OmniQuant"](model, cfg, _calib(model), None,
                                      DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))


def test_tesseraq_rounding():
    ppl_rtn = _rtn_baseline(73)
    model = make_tiny_adapter(seed=73)
    cfg = DotDict({"method": "TesseraQ", "weight": dict(W3G16),
                   "special": {"thresholds": [0.5, 0.25, 0.0],
                               "epochs_per_round": 2, "lr": 1e-2}})
    algo = ALGO_REGISTRY["TesseraQ"](model, cfg, _calib(model), None,
                                     DotDict({}))
    algo.run_block_loop()
    st = algo.layer_state[0]["attn.q"]
    assert "rounding" in st
    r = np.asarray(st["rounding"])
    assert set(np.unique(r)).issubset({0.0, 1.0})  # fully hardened
    algo.deploy("fake_quant")
    ppl = _ppl(model)
    assert np.isfinite(ppl)
    assert ppl < ppl_rtn * 1.05


def test_spqr_outliers():
    """Exact reference criterion (relative_threshold config surface,
    spqr_w_only.yml): outliers exist but stay sparse, PPL finite."""
    model = make_tiny_adapter(seed=74)
    cfg = DotDict({
        "method": "SpQR", "weight": dict(W3G16),
        "special": {"blocksize": 16, "relative_threshold": 0.2,
                    "percdamp": 1.0, "actorder": True,
                    "simplified_outliers": False},
        "quant_out": True,
    })
    algo = ALGO_REGISTRY["SpQR"](model, cfg, _calib(model), None, DotDict({}))
    algo.run_block_loop()
    st = algo.layer_state[0]["attn.q"]
    mask = np.asarray(st["outlier_mask"])
    frac = mask.mean()
    assert 0.0 < frac < 0.2, frac
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))


def test_omniquant_let_aug_loss_and_alpha_init():
    """New reference knobs: aug_loss (FP-chained + current-stream teachers,
    omniq.py:148-153,214-215) and alpha-based LET scale init
    (omniq.py:104-116).  Must train and keep PPL finite."""
    model = make_tiny_adapter(seed=31)
    cfg = DotDict({
        "method": "OmniQuant", "weight": dict(W3G16),
        "special": {"epochs": 1, "lwc": True, "let": True,
                    "aug_loss": True, "alpha": 0.6, "use_shift": False,
                    "lwc_lr": 1e-2, "let_lr": 1e-3},
    })
    algo = ALGO_REGISTRY["OmniQuant"](model, cfg, _calib(model), None,
                                      DotDict({}))
    algo.run_block_loop()
    # LWC factors stored for every linear
    assert all("upbound_factor" in algo.layer_state[i][n]
               for i in range(model.num_blocks)
               for n in model.get_block_linear_names(i))
    algo.deploy("fake_quant")
    assert np.isfinite(_ppl(model))


def test_awq_clip_to_omniquant_load_clip(tmp_path):
    """Two-stage pipeline (configs/combination/awq_comb_omni analogue):
    AWQ clip_version v2 + save_clip writes clips.pkl; OmniQuant load_clip
    initializes its LWC factors from it (omniq.py:84-85,371)."""
    clip_dir = str(tmp_path / "clips")
    model = make_tiny_adapter(seed=41)
    cfg1 = DotDict({
        "method": "Awq", "weight": dict(W3G16),
        "special": {"trans": True, "trans_version": "v2",
                    "weight_clip": True, "clip_version": "v2",
                    "save_clip": True, "clip_path": clip_dir},
    })
    a1 = ALGO_REGISTRY["Awq"](model, cfg1, _calib(model), None, DotDict({}))
    a1.run_block_loop()
    import os
    assert os.path.exists(os.path.join(clip_dir, "clips.pkl"))

    model2 = make_tiny_adapter(seed=41)
    cfg2 = DotDict({
        "method": "OmniQuant", "weight": dict(W3G16),
        "special": {"epochs": 1, "lwc": True, "let": False,
                    "load_clip": True, "clip_path": clip_dir},
    })
    a2 = ALGO_REGISTRY["OmniQuant"](model2, cfg2, _calib(model2), None,
                                    DotDict({}))
    assert a2.loaded_clips is not None
    a2.run_block_loop()
    assert all("upbound_factor" in a2.layer_state[i][n]
               for i in range(model2.num_blocks)
               for n in model2.get_block_linear_names(i))
    a2.deploy("fake_quant")
    assert np.isfinite(_ppl(model2))
