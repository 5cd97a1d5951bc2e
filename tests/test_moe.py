"""MoE family tests: forward parity vs HF Mixtral, routing, quantization on
stacked experts, EP-style sharding compatibility."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval
from lightcompress_tpu.models import ArchSpec, init_params
from lightcompress_tpu.models.arch import MoESpec
from lightcompress_tpu.models.base import Mixtral
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def make_tiny_moe(seed=0, shared=0, gating="softmax", vocab=128):
    arch = ArchSpec(
        family="llama", vocab_size=vocab, hidden_size=64,
        intermediate_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=16, dtype=jnp.float32,
        moe=MoESpec(num_experts=4, top_k=2, moe_intermediate_size=32,
                    num_shared_experts=shared, gating=gating),
    )
    params = init_params(jax.random.PRNGKey(seed), arch)
    return Mixtral(arch, params)


def test_moe_forward_matches_hf_mixtral(tmp_path):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256,
    )
    hf = MixtralForCausalLM(cfg)
    hf.eval()
    d = str(tmp_path / "mixtral")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert m.arch.moe is not None and m.arch.moe.num_experts == 4
    ids = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int32)
    ours = np.asarray(m.forward(jnp.asarray(ids)))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(ids)).logits.float().numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=5e-2)


def test_moe_routing_topk():
    m = make_tiny_moe()
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    logits = m.forward(ids)
    assert logits.shape == (1, 8, 128)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_moe_shared_experts_and_sigmoid_gating():
    m = make_tiny_moe(shared=2, gating="sigmoid")
    ids = jnp.asarray([[1, 2, 3, 4]])
    logits = m.forward(ids)
    assert bool(jnp.all(jnp.isfinite(logits)))
    assert "shared_gate" in m.blocks[0]["mlp"]


def test_moe_subsets_and_awq():
    m = make_tiny_moe(shared=1)
    subsets = m.get_subsets_in_block(0)
    names = [s.layers for s in subsets]
    assert ("mlp.router", "mlp.gate", "mlp.up", "mlp.shared_gate",
            "mlp.shared_up") in names
    # AWQ end-to-end on MoE (router+experts scaled under ln2)
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 128, (1, 16)), jnp.int32)
           for _ in range(2)]
    inputs = m.collect_first_block_input(ids)
    cfg = DotDict({
        "method": "Awq",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"trans": True, "trans_version": "v2",
                    "weight_clip": False},
    })
    enc = rng.randint(0, 128, (1, 64)).astype(np.int32)
    ppl_eval = PerplexityEval(enc, seq_len=16, bs=1)
    ppl_fp = ppl_eval.eval(m)
    algo = ALGO_REGISTRY["Awq"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("transformed")
    ppl_t = ppl_eval.eval(m)
    assert abs(ppl_t - ppl_fp) / ppl_fp < 0.02  # router in subset: equivalence
    algo.deploy("fake_quant")
    assert np.isfinite(ppl_eval.eval(m))


def test_moe_rtn_quantizes_stacked_experts():
    m = make_tiny_moe()
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 128, (1, 16)), jnp.int32)]
    inputs = m.collect_first_block_input(ids)
    cfg = DotDict({"method": "RTN",
                   "weight": {"bit": 8, "symmetric": True,
                              "granularity": "per_channel"}})
    algo = ALGO_REGISTRY["RTN"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    w_q = np.asarray(m.blocks[0]["mlp"]["gate"]["weight"])
    w_fp = np.asarray(m._fp_blocks[0]["mlp"]["gate"]["weight"])
    assert w_q.shape == w_fp.shape == (4, 32, 64)
    assert not np.array_equal(w_q, w_fp)
    enc = rng.randint(0, 128, (1, 64)).astype(np.int32)
    assert np.isfinite(PerplexityEval(enc, seq_len=16, bs=1).eval(m))


def test_moe_expert_parallel_sharding():
    """Experts shard over a mesh axis; sharded forward == replicated."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    m = make_tiny_moe()
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    ref = np.asarray(m.forward(ids))
    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, axis_names=("ep",))
    for bp in m.params["blocks"]:
        for proj in ("gate", "up", "down"):
            w = bp["mlp"][proj]["weight"]
            bp["mlp"][proj]["weight"] = jax.device_put(
                w, NamedSharding(mesh, P("ep", None, None))
            )
    with jax.set_mesh(mesh):
        out = np.asarray(jax.jit(m.forward)(ids))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-2)


def test_moe_gptq_per_expert():
    m = make_tiny_moe(seed=5)
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 128, (1, 16)), jnp.int32)
           for _ in range(2)]
    inputs = m.collect_first_block_input(ids)
    cfg = DotDict({
        "method": "GPTQ",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"blocksize": 16, "actorder": False},
        "quant_out": True,
    })
    algo = ALGO_REGISTRY["GPTQ"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    st = algo.layer_state[0]["mlp.down"]
    assert "gptq_experts" in st
    assert st["gptq_experts"]["scales"].shape[0] == 4  # per-expert qparams
    algo.deploy("fake_quant")
    enc = rng.randint(0, 128, (1, 64)).astype(np.int32)
    ppl = PerplexityEval(enc, seq_len=16, bs=1).eval(m)
    assert np.isfinite(ppl)


def test_moe_per_expert_weight_clip():
    """AutoClipper handles stacked (E, oc, ic) expert weights: per-expert
    clip ranges shrink weights without breaking the forward."""
    m = make_tiny_moe(seed=9)
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 128, (1, 16)), jnp.int32)
           for _ in range(2)]
    inputs = m.collect_first_block_input(ids)
    cfg = DotDict({
        "method": "Awq",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"trans": True, "trans_version": "v2",
                    "weight_clip": True, "clip_version": "v1"},
    })
    w_before = np.asarray(m.blocks[0]["mlp"]["down"]["weight"],
                          dtype=np.float32).copy()
    algo = ALGO_REGISTRY["Awq"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    w_after = np.asarray(m.blocks[0]["mlp"]["down"]["weight"],
                         dtype=np.float32)
    assert w_after.shape == w_before.shape  # stacked 3D preserved
    algo.deploy("fake_quant")
    enc = rng.randint(0, 128, (1, 64)).astype(np.int32)
    ppl = PerplexityEval(enc, seq_len=16, bs=1).eval(m)
    assert np.isfinite(ppl)


def test_moe_per_expert_weight_clip_v2():
    """clip_version v2 on stacked experts: per-expert sigmoid factors are
    stacked to match reshape_tensor's flattened 3D view and consumed by the
    quantizer's learnable path at deploy (weights stay un-mutated)."""
    m = make_tiny_moe(seed=11)
    rng = np.random.RandomState(0)
    ids = [jnp.asarray(rng.randint(0, 128, (1, 16)), jnp.int32)
           for _ in range(2)]
    inputs = m.collect_first_block_input(ids)
    cfg = DotDict({
        "method": "Awq",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"trans": True, "trans_version": "v2",
                    "weight_clip": True, "clip_version": "v2"},
    })
    algo = ALGO_REGISTRY["Awq"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    w = m.blocks[0]["mlp"]["down"]["weight"]
    st = algo.layer_state[0]["mlp.down"]
    assert st["upbound_factor"] is not None
    E, oc, ic = w.shape
    assert st["upbound_factor"].shape[0] == E * oc * (ic // 16)
    # the learnable w_qdq must broadcast against the stacked weight
    wq = algo.w_qdq(w, 0, "mlp.down")
    assert wq.shape == w.shape
    assert np.all(np.isfinite(np.asarray(wq, np.float32)))
    algo.deploy("fake_quant")
    enc = rng.randint(0, 128, (1, 64)).astype(np.int32)
    ppl = PerplexityEval(enc, seq_len=16, bs=1).eval(m)
    assert np.isfinite(ppl)


def test_moe_export_per_expert(tmp_path):
    """Stacked (E, oc, ic) expert weights export as per-expert 2D tensors
    (the reference's experts.N module names) with correctly-shaped scales."""
    import os

    from safetensors.numpy import load_file

    from lightcompress_tpu.export import export_real_quant, unpack_int4

    m = make_tiny_moe(seed=13)
    cfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
    })
    ids = [jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 16)),
                       jnp.int32)]
    algo = ALGO_REGISTRY["RTN"](m, cfg, m.collect_first_block_input(ids),
                                None, DotDict({}))
    algo.run_block_loop()
    out = str(tmp_path / "moe_export")
    export_real_quant(algo, out)
    t = load_file(os.path.join(out, "quant_model.safetensors"))
    w = m.blocks[0]["mlp"]["down"]["weight"]
    E, oc, ic = w.shape
    for e in range(E):
        key = f"blocks.0.mlp.down.experts.{e}"
        assert key + ".qweight_packed" in t
        assert t[key + ".scales"].shape == (oc, ic // 16)
        # dequant roundtrip ~= the float expert weight
        codes = np.asarray(unpack_int4(jnp.asarray(t[key + ".qweight_packed"])))
        s = t[key + ".scales"][:, :, None]
        z = t[key + ".zeros"][:, :, None]
        deq = ((codes.reshape(oc, ic // 16, 16) - z) * s).reshape(oc, ic)
        ref = np.asarray(w[e], np.float32)
        assert np.abs(deq - ref).mean() / (np.abs(ref).mean() + 1e-9) < 0.2
