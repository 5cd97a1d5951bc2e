"""Full-pipeline test: YAML config -> load HF checkpoint -> calibrate ->
AWQ transform -> PPL evals -> token consistency (the reference CI shape,
.github/workflows/main.yml + ci_check/awq_w4a16_fakequant_eval.yml)."""

import os

import numpy as np
import pytest

from helpers import make_tiny_hf_llama


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    d, _ = make_tiny_hf_llama(str(tmp_path_factory.mktemp("pipe")))
    return d


def test_pipeline_awq(tiny_model_dir, tmp_path):
    from lightcompress_tpu.config import load_config
    from lightcompress_tpu.pipeline import run_pipeline

    cfg_path = os.path.join(os.path.dirname(__file__), "..",
                            "configs/ci/awq_w4a16_tiny_synthetic.yml")
    with open(cfg_path) as f:
        text = f.read().replace("__TINY_MODEL_DIR__", tiny_model_dir)
    p = tmp_path / "cfg.yml"
    p.write_text(text)
    cfg = load_config(str(p))
    cfg.save.save_path = str(tmp_path / "save")

    results = run_pipeline(cfg)
    assert "ppl_pretrain" in results
    assert "ppl_transformed" in results
    assert "ppl_fake_quant" in results
    assert "token_consistency" in results
    # equivalence-preserving transform: transformed ppl == pretrain ppl
    assert abs(results["ppl_transformed"] - results["ppl_pretrain"]) \
        / results["ppl_pretrain"] < 0.02
    # quantized ppl finite, token consistency sane
    assert np.isfinite(results["ppl_fake_quant"])
    assert 0.3 < results["token_consistency"] <= 1.0


def test_pipeline_rtn_with_exports(tiny_model_dir, tmp_path):
    from lightcompress_tpu.config import DotDict, load_config
    from lightcompress_tpu.pipeline import run_pipeline

    cfg = DotDict({
        "base": {"seed": 0},
        "model": {"type": "Llama", "path": tiny_model_dir,
                  "torch_dtype": "float32"},
        "calib": {"name": "synthetic", "n_samples": 2, "bs": 1, "seq_len": 16,
                  "preproc": "synthetic_random", "seed": 0},
        "eval": {"eval_pos": ["fake_quant"], "name": "synthetic",
                 "seq_len": 16, "bs": 1, "n_tokens": 64},
        "quant": {"method": "RTN",
                  "weight": {"bit": 8, "symmetric": True,
                             "granularity": "per_channel"}},
        "save": {"save_native": True, "save_path": str(tmp_path / "out")},
    })
    results = run_pipeline(cfg)
    assert np.isfinite(results["ppl_fake_quant"])
    assert os.path.exists(
        tmp_path / "out" / "native_quant_model" / "quant_model.safetensors"
    )
    assert os.path.exists(
        tmp_path / "out" / "native_quant_model" / "quantization_config.json"
    )


def test_eval_list_multi(tiny_model_dir, tmp_path):
    """config.eval as a LIST with multiple types/datasets
    (reference get_eval_list, eval/utils.py:12-75)."""
    from lightcompress_tpu.config import load_config
    from lightcompress_tpu.pipeline import run_pipeline

    cfg = load_config("configs/ci/awq_w4a16_tiny_synthetic.yml")
    cfg.model.path = tiny_model_dir
    cfg.save.save_path = str(tmp_path / "save")
    cfg["eval"] = [
        {"type": "ppl", "name": "synthetic", "seq_len": 16, "bs": 1,
         "n_tokens": 128, "eval_pos": ["pretrain", "fake_quant"]},
        {"type": "decode_ppl", "name": "synthetic", "seq_len": 16,
         "num_eval_tokens": 8, "eval_pos": ["fake_quant"]},
    ]
    res = run_pipeline(cfg)
    assert "ppl_synthetic_pretrain" in res
    assert "ppl_synthetic_fake_quant" in res
    assert "decode_ppl_synthetic_fake_quant" in res
    assert all(np.isfinite(v) for v in res.values())


def test_pipeline_gptq_ci_config(tiny_model_dir, tmp_path):
    """The reference's second CI gate (ci_check/gptq_w_only.yml): GPTQ W4
    actorder+true_sequential+quant_out through the full pipeline."""
    import shutil

    from lightcompress_tpu.config import load_config
    from lightcompress_tpu.pipeline import run_pipeline

    text = open("configs/ci/gptq_w_only_tiny_synthetic.yml").read()
    text = text.replace("__TINY_MODEL_DIR__", tiny_model_dir)
    cfgp = tmp_path / "gptq.yml"
    cfgp.write_text(text)
    cfg = load_config(str(cfgp))
    cfg.save.save_path = str(tmp_path / "save")
    results = run_pipeline(cfg)
    assert "ppl_fake_quant" in results
    assert results["ppl_fake_quant"] < 5000


def test_quant_analysis_cli(tiny_model_dir, tmp_path, monkeypatch):
    """tools/quant_analysis.py end-to-end (reference tools/quant_analysis.py)."""
    import json
    import runpy
    import sys

    text = open("configs/ci/awq_w4a16_tiny_synthetic.yml").read()
    text = text.replace("__TINY_MODEL_DIR__", tiny_model_dir)
    cfgp = tmp_path / "cfg.yml"
    cfgp.write_text(text)
    out = tmp_path / "analysis.json"
    monkeypatch.setattr(sys, "argv",
                        ["quant_analysis", "--config", str(cfgp),
                         "--out", str(out)])
    runpy.run_path("tools/quant_analysis.py", run_name="__main__")
    rows = json.load(open(out))
    assert len(rows) == 2  # tiny model: 2 blocks
    assert all(0.9 < r["fp_quant_cosine"] <= 1.0 for r in rows)


def test_pipeline_sparse_wanda(tiny_model_dir, tmp_path):
    """sparse: section drives the same pipeline (get_compress_config reads
    quant OR sparse; __main__.py modality loop parity)."""
    import yaml

    from lightcompress_tpu.config import DotDict
    from lightcompress_tpu.pipeline import run_pipeline

    cfg = DotDict({
        "base": {"seed": 0},
        "model": {"type": "Llama", "path": tiny_model_dir},
        "calib": {"name": "synthetic", "n_samples": 2, "bs": 1,
                  "seq_len": 16, "preproc": "synthetic_random", "seed": 0},
        "eval": {"eval_pos": ["pretrain", "transformed"],
                 "name": "synthetic", "seq_len": 16, "bs": 1},
        "sparse": {"method": "Wanda", "weight": {"pattern": "2:4"}},
        "save": {"save_path": str(tmp_path / "save")},
    })
    results = run_pipeline(cfg)
    assert "ppl_pretrain" in results and "ppl_transformed" in results
    import numpy as np
    assert np.isfinite(results["ppl_transformed"])
