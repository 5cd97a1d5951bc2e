"""End-to-end blockwise quantization tests: the CI-shape slice
(awq_w4a16_fakequant_eval.yml analogue) on tiny models with synthetic data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval, TokenConsistencyEval
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def _calib_batches(model, n=4, seq=16, seed=0):
    rng = np.random.RandomState(seed)
    ids = [
        jnp.asarray(rng.randint(0, model.arch.vocab_size, (1, seq)), jnp.int32)
        for _ in range(n)
    ]
    return model.collect_first_block_input(ids)


def _testenc(model, n_tokens=128, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randint(0, model.arch.vocab_size, (1, n_tokens)).astype(np.int32)


W4G16 = DotDict({
    "method": "RTN",
    "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
               "group_size": 16},
})


def _run(model, qcfg, seq=16):
    inputs = _calib_batches(model, seq=seq)
    algo = ALGO_REGISTRY[qcfg.method](model, qcfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    return algo


def test_rtn_fake_quant_ppl():
    model = make_tiny_adapter(seed=0)
    enc = _testenc(model)
    ppl_eval = PerplexityEval(enc, seq_len=16, bs=1)
    ppl_fp = ppl_eval.eval(model)
    algo = _run(model, W4G16)
    algo.deploy("fake_quant")
    ppl_q = ppl_eval.eval(model)
    algo.restore_float()
    ppl_restored = ppl_eval.eval(model)
    # random tiny model: quantized ppl should be finite and near fp
    assert np.isfinite(ppl_q)
    assert abs(ppl_restored - ppl_fp) < 1e-3
    assert ppl_q != ppl_fp  # quantization must actually change the model


def test_awq_beats_or_matches_rtn():
    """AWQ's scale search should not hurt vs plain RTN at the same spec
    (the reference's核心 claim) — measured on block-output MSE proxy: PPL."""
    qcfg = DotDict({
        "method": "Awq",
        "weight": {"bit": 3, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"trans": True, "trans_version": "v2", "weight_clip": False},
    })
    model_rtn = make_tiny_adapter(seed=3)
    model_awq = make_tiny_adapter(seed=3)
    enc = _testenc(model_rtn)
    ppl_eval = PerplexityEval(enc, seq_len=16, bs=1)

    rtn_cfg = DotDict({"method": "RTN", "weight": qcfg.weight})
    algo_r = _run(model_rtn, rtn_cfg)
    algo_r.deploy("fake_quant")
    ppl_rtn = ppl_eval.eval(model_rtn)

    algo_a = _run(model_awq, qcfg)
    algo_a.deploy("fake_quant")
    ppl_awq = ppl_eval.eval(model_awq)

    assert np.isfinite(ppl_awq)
    # AWQ should be at least roughly as good (tiny random model -> loose)
    assert ppl_awq < ppl_rtn * 1.10


def test_awq_transform_preserves_float_output():
    """Equivalence invariant: the scale transform must not change the float
    model's output (eval position 'transformed' == 'pretrain')."""
    model = make_tiny_adapter(seed=5)
    enc = _testenc(model, n_tokens=64)
    ppl_eval = PerplexityEval(enc, seq_len=16, bs=1)
    ppl_fp = ppl_eval.eval(model)
    qcfg = DotDict({
        "method": "Awq",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"trans": True, "trans_version": "v2", "weight_clip": False},
    })
    algo = _run(model, qcfg)
    algo.deploy("transformed")
    ppl_t = ppl_eval.eval(model)
    assert abs(ppl_t - ppl_fp) / ppl_fp < 0.02


def test_awq_with_weight_clip():
    model = make_tiny_adapter(seed=6)
    qcfg = DotDict({
        "method": "Awq",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"trans": True, "trans_version": "v2", "weight_clip": True,
                    "clip_sym": False},
    })
    algo = _run(model, qcfg)
    algo.deploy("fake_quant")
    enc = _testenc(model)
    ppl = PerplexityEval(enc, seq_len=16, bs=1).eval(model)
    assert np.isfinite(ppl)


def test_token_consistency_eval():
    model = make_tiny_adapter(seed=7)
    origin = make_tiny_adapter(seed=7)
    enc = _testenc(model)
    algo = _run(model, W4G16)
    algo.deploy("fake_quant")
    tc = TokenConsistencyEval(enc, seq_len=16, bs=1).eval(model, origin)
    assert 0.0 <= tc <= 1.0
    # 4-bit g16 on a tiny model should agree on most tokens
    assert tc > 0.5


def test_act_quant_w8a8_dynamic():
    model = make_tiny_adapter(seed=8)
    qcfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
        "act": {"bit": 8, "symmetric": True, "granularity": "per_token"},
    })
    algo = _run(model, qcfg)
    algo.deploy("fake_quant")
    enc = _testenc(model)
    ppl = PerplexityEval(enc, seq_len=16, bs=1).eval(model)
    assert np.isfinite(ppl)


def test_act_quant_static():
    model = make_tiny_adapter(seed=9)
    qcfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
        "act": {"bit": 8, "symmetric": True, "granularity": "per_tensor",
                "static": True, "calib_algo": "static_minmax"},
    })
    algo = _run(model, qcfg)
    # static qparams must have been registered for every linear
    assert all(
        "act_qparams" in algo.layer_state[i][n]
        for i in range(model.num_blocks)
        for n in model.get_block_linear_names(i)
    )
    algo.deploy("fake_quant")
    enc = _testenc(model)
    ppl = PerplexityEval(enc, seq_len=16, bs=1).eval(model)
    assert np.isfinite(ppl)


def test_mixed_precision_ignored_layers():
    model = make_tiny_adapter(seed=10)
    cfg = DotDict({"ignored_layers": {"layer_names": ["down_proj"]}})
    inputs = _calib_batches(model)
    algo = ALGO_REGISTRY["RTN"](model, W4G16, inputs, None, cfg)
    algo.run_block_loop()
    w_before = model.blocks[0]["mlp"]["down"]["weight"]
    algo.deploy("fake_quant")
    w_after = model.blocks[0]["mlp"]["down"]["weight"]
    np.testing.assert_array_equal(np.asarray(w_before), np.asarray(w_after))
    # but up_proj should be quantized
    w_up = model.blocks[0]["mlp"]["up"]["weight"]
    assert not np.array_equal(
        np.asarray(w_up), np.asarray(model._fp_blocks[0]["mlp"]["up"]["weight"])
    )


def test_quant_out_propagation():
    model = make_tiny_adapter(seed=11)
    qcfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "quant_out": True,
    })
    inputs = _calib_batches(model)
    algo = ALGO_REGISTRY["RTN"](model, qcfg, inputs, None, DotDict({}))
    algo.run_block_loop()  # must not crash; outputs propagate quantized


def test_export_real_quant(tmp_path):
    from lightcompress_tpu.export import export_real_quant, pack_int4, unpack_int4

    model = make_tiny_adapter(seed=12)
    algo = _run(model, W4G16)
    out = str(tmp_path / "export")
    export_real_quant(algo, out)
    import os
    from safetensors.numpy import load_file

    t = load_file(os.path.join(out, "quant_model.safetensors"))
    assert "blocks.0.attn.q.qweight_packed" in t
    assert "blocks.0.attn.q.scales" in t
    # pack/unpack roundtrip
    codes = jnp.asarray(np.random.RandomState(0).randint(0, 16, (8, 32)))
    packed = pack_int4(codes)
    assert packed.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(codes))


def test_export_autoawq_gemm_pack(tmp_path):
    """AWQ GEMM interleaved pack roundtrips and matches reference layout
    (module_utils.py:1097-1158: (ic, oc/8) int32, order [0,2,4,6,1,3,5,7])."""
    from lightcompress_tpu.export import awq_gemm_pack, export_real_quant

    model = make_tiny_adapter(seed=12)
    algo = _run(model, W4G16)
    out = str(tmp_path / "awq_export")
    export_real_quant(algo, out, fmt="autoawq")
    import json
    import os

    from safetensors.numpy import load_file

    t = load_file(os.path.join(out, "quant_model.safetensors"))
    assert "blocks.0.attn.q.qweight" in t
    assert "blocks.0.attn.q.qzeros" in t
    qw = t["blocks.0.attn.q.qweight"]
    sc = t["blocks.0.attn.q.scales"]
    w = model.params["blocks"][0]["attn"]["q"]["weight"]
    oc, ic = w.shape
    assert qw.shape == (ic, oc // 8) and qw.dtype == np.int32
    assert sc.shape[1] == oc and sc.dtype == np.float16
    with open(os.path.join(out, "quantization_config.json")) as f:
        cfg = json.load(f)
    assert cfg["quant_method"] == "awq" and cfg["version"] == "gemm"
    assert cfg["zero_point"] is True and cfg["group_size"] == 16

    # roundtrip: unpack with the interleave order and compare to raw codes
    from lightcompress_tpu.quant import real_quant_weight

    st = algo.layer_state[0].get("attn.q", {})
    codes, scales, zeros = real_quant_weight(
        jnp.asarray(w, jnp.float32), algo.wspec, qp=st.get("qparams"))
    qw2, _, qz2 = awq_gemm_pack(codes, scales, zeros, 4)
    order = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    shifts = np.arange(8) * 4
    un = ((np.asarray(qw2)[:, :, None] >> shifts) & 0xF)  # (ic, oc/8, 8)
    inv = np.argsort(order)
    un = un[:, :, inv].reshape(ic, oc).T
    np.testing.assert_array_equal(un, np.asarray(codes))


def test_export_compressed_tensors_config(tmp_path):
    from lightcompress_tpu.export import export_real_quant

    model = make_tiny_adapter(seed=12)
    algo = _run(model, W4G16)
    out = str(tmp_path / "vllm_export")
    export_real_quant(algo, out, fmt="vllm")
    import json
    import os

    from safetensors.numpy import load_file

    t = load_file(os.path.join(out, "quant_model.safetensors"))
    assert "blocks.0.attn.q.weight_packed" in t
    assert "blocks.0.attn.q.weight_scale" in t
    with open(os.path.join(out, "quantization_config.json")) as f:
        cfg = json.load(f)
    assert cfg["quant_method"] == "compressed-tensors"
    assert cfg["format"] == "pack-quantized"
    g0 = cfg["config_groups"]["group_0"]
    assert g0["weights"]["num_bits"] == 4
    assert g0["weights"]["strategy"] == "group"
    assert g0["weights"]["group_size"] == 16


def test_trtllm_cvt_records_command(tmp_path):
    from lightcompress_tpu.export import cvt_trtllm_engine

    qdir = str(tmp_path / "q")
    edir = str(tmp_path / "engine")
    import os

    os.makedirs(qdir, exist_ok=True)
    cvt_trtllm_engine(qdir, edir)
    assert os.path.exists(os.path.join(edir, "build_cmd.txt"))


def test_mixed_precision_speical_names():
    """Per-instance ignored layers via the reference's 'speical_names' key
    (bbq.py:141,911-929): only the named block's layer stays float."""
    model = make_tiny_adapter(seed=12)
    cfg = DotDict({"ignored_layers": {
        "speical_names": ["model.layers.0.mlp.down_proj"]}})
    inputs = _calib_batches(model)
    algo = ALGO_REGISTRY["RTN"](model, W4G16, inputs, None, cfg)
    algo.run_block_loop()
    w0 = np.asarray(model.blocks[0]["mlp"]["down"]["weight"]).copy()
    w1 = np.asarray(model.blocks[1]["mlp"]["down"]["weight"]).copy()
    algo.deploy("fake_quant")
    # block 0 down stays float, block 1 down is quantized
    np.testing.assert_array_equal(
        w0, np.asarray(model.blocks[0]["mlp"]["down"]["weight"]))
    assert not np.array_equal(
        w1, np.asarray(model.blocks[1]["mlp"]["down"]["weight"]))
