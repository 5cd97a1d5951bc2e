"""PhaseTimer / device_trace / tools (print_model, attention_vis)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from helpers import make_tiny_hf_llama


def test_phase_timer(tmp_path):
    import time

    from lightcompress_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("outer"):
        with t.phase("inner"):
            time.sleep(0.01)
        with t.phase("inner"):
            pass
    rep = t.report()
    assert rep["outer"]["count"] == 1
    assert rep["outer/inner"]["count"] == 2
    assert rep["outer"]["total_s"] >= rep["outer/inner"]["total_s"]
    p = t.dump(str(tmp_path / "prof.json"))
    assert json.load(open(p))["outer/inner"]["count"] == 2


def test_device_trace_noop():
    from lightcompress_tpu.utils.profiling import device_trace

    with device_trace(None):
        pass  # must be a silent no-op


def test_pipeline_records_phases(tmp_path):
    from lightcompress_tpu.config import load_config
    from lightcompress_tpu.pipeline import run_pipeline
    from lightcompress_tpu.utils import profiling

    d, _ = make_tiny_hf_llama(str(tmp_path / "m"))
    cfg = load_config("configs/ci/awq_w4a16_tiny_synthetic.yml")
    cfg.model.path = d
    cfg.eval.eval_pos = []
    cfg.save.save_path = str(tmp_path / "save")
    cfg.base["profile_out"] = str(tmp_path / "profile.json")
    run_pipeline(cfg)
    rep = json.load(open(tmp_path / "profile.json"))
    assert any(k.startswith("block_loop/Awq") for k in rep)
    assert rep["load_model"]["count"] >= 1


def test_attention_vis_maps(tmp_path):
    sys.path.insert(0, "tools")
    from attention_vis import attention_maps

    from lightcompress_tpu.models.hf_loader import load_model

    d, _ = make_tiny_hf_llama(str(tmp_path / "m"))
    model = load_model(d)
    ids = np.array([1, 5, 9, 3], np.int32)
    maps = attention_maps(model, ids, layer_idx=1)
    assert maps.shape == (model.arch.num_heads, 4, 4)
    # rows are softmax distributions over the causal prefix
    np.testing.assert_allclose(maps.sum(-1), 1.0, atol=1e-5)
    assert maps[0, 0, 1] == 0.0  # causal: token 0 can't see token 1
