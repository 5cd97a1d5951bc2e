"""North-star accuracy metric (BASELINE.md): W4 fake-quant perplexity DELTA
vs fp must match a torch-side oracle on the same checkpoint + data.

Oracle: the tiny HF Llama itself, with every linear weight fake-quantized by
the REFERENCE's IntegerQuantizer (run in-process, tests/test_reference_parity
fixture pattern) — i.e., exactly what the reference's RTN W4 pipeline does to
the model before eval (rtn.py:10-28 computes qparams at deploy via the same
quantizer)."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp


def _stub_ref_deps():
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None

        lg.logger = _L()
        sys.modules["loguru"] = lg
    if "easydict" not in sys.modules:
        ed = types.ModuleType("easydict")
        ed.EasyDict = dict
        sys.modules["easydict"] = ed


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    sys.path.insert(0, "/root/repo/tests")
    from helpers import make_tiny_hf_llama

    d, hf = make_tiny_hf_llama(str(tmp_path_factory.mktemp("ppl")), seed=7)
    return d, hf


def _torch_ppl(hf, ids):
    import torch

    with torch.no_grad():
        logits = hf(torch.tensor(ids, dtype=torch.long)).logits.float()
        lp = torch.nn.functional.log_softmax(logits[:, :-1], -1)
        tgt = torch.tensor(ids[:, 1:], dtype=torch.long)
        nll = -lp.gather(-1, tgt[..., None])[..., 0]
        return float(torch.exp(nll.mean()))


SPEC = dict(bit=4, symmetric=False, granularity="per_group", group_size=16)


def test_w4_ppl_delta_matches_reference_quantizer(tiny, tmp_path):
    import copy

    import torch

    d, hf = tiny
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 250, size=(1, 256)).astype(np.int32)

    # --- oracle: reference IntegerQuantizer applied to every linear
    _stub_ref_deps()
    sys.path.insert(0, "/root/reference")
    try:
        from llmc.compression.quantization.quant import IntegerQuantizer
    finally:
        sys.path.remove("/root/reference")
    q = IntegerQuantizer(**SPEC)
    hf_q = copy.deepcopy(hf)
    with torch.no_grad():
        for name, mod in hf_q.named_modules():
            if isinstance(mod, torch.nn.Linear) and "lm_head" not in name:
                mod.weight.copy_(q.fake_quant_weight_dynamic(mod.weight))
    ppl_fp_ref = _torch_ppl(hf, ids)
    ppl_q_ref = _torch_ppl(hf_q, ids)
    delta_ref = ppl_q_ref - ppl_fp_ref

    # --- ours: RTN W4 through the real pipeline
    from lightcompress_tpu.config import DotDict
    from lightcompress_tpu.eval import PerplexityEval
    from lightcompress_tpu.models.hf_loader import load_model
    from lightcompress_tpu.registry import ALGO_REGISTRY
    import lightcompress_tpu.compression  # noqa: F401

    model = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    ev = PerplexityEval(ids, seq_len=256, bs=1)
    ppl_fp = ev.eval(model)
    calib = [jnp.asarray(rng.randint(1, 250, size=(2, 32)).astype(np.int32))]
    first = model.collect_first_block_input(calib)
    algo = ALGO_REGISTRY["RTN"](
        model, DotDict({"method": "RTN", "weight": dict(SPEC)}),
        first, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    ppl_q = ev.eval(model)
    delta_ours = ppl_q - ppl_fp

    # fp PPLs agree (HF-parity) and quant-induced deltas match
    assert abs(ppl_fp - ppl_fp_ref) / ppl_fp_ref < 0.01
    assert abs(delta_ours - delta_ref) < 0.1 + 0.05 * abs(delta_ref), (
        delta_ours, delta_ref)
