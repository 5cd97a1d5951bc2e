"""DeepSeek MLA attention tests: forward parity vs HF DeepseekV3 (tiny,
incl. q-LoRA, sigmoid group routing, correction bias, first-k dense) and
quantization end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.eval import PerplexityEval
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


@pytest.fixture(scope="module")
def tiny_dsv3(tmp_path_factory):
    import torch
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(0)
    cfg = DeepseekV3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, first_k_dense_replace=1,
        q_lora_rank=32, kv_lora_rank=16,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        max_position_embeddings=128, routed_scaling_factor=2.5,
        norm_topk_prob=True, attn_implementation="eager",
    )
    hf = DeepseekV3ForCausalLM(cfg)
    hf.eval()
    # give the correction bias nonzero values to actually test it
    with torch.no_grad():
        for layer in hf.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)
    d = str(tmp_path_factory.mktemp("dsv3") / "m")
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def test_mla_forward_matches_hf(tiny_dsv3):
    import torch
    from lightcompress_tpu.models import load_model

    d, hf = tiny_dsv3
    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert m.arch.mla is not None and m.arch.mla.q_lora_rank == 32
    # block 0 dense, blocks 1-2 moe
    assert "router" not in m.blocks[0]["mlp"]
    assert "router" in m.blocks[1]["mlp"]
    assert "router_bias" in m.blocks[1]["mlp"]
    ids = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int32)
    ours = np.asarray(m.forward(jnp.asarray(ids)))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(ids)).logits.float().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1.5e-2, rtol=5e-2)


def test_mla_subsets(tiny_dsv3):
    from lightcompress_tpu.models import load_model

    d, _ = tiny_dsv3
    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    s0 = m.get_subsets_in_block(0)  # dense
    assert s0[0].layers == ("attn.q_a", "attn.kv_a")
    assert any(s.layers == ("attn.q_b",) and s.skip_rotate for s in s0)
    assert any(s.layers == ("mlp.gate", "mlp.up") for s in s0)
    s1 = m.get_subsets_in_block(1)  # moe
    assert any("mlp.router" in s.layers for s in s1)


def test_mla_awq_e2e(tiny_dsv3):
    from lightcompress_tpu.models import load_model

    d, _ = tiny_dsv3
    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
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
    pe = PerplexityEval(enc, seq_len=16, bs=1)
    ppl_fp = pe.eval(m)
    algo = ALGO_REGISTRY["Awq"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("transformed")
    ppl_t = pe.eval(m)
    assert abs(ppl_t - ppl_fp) / ppl_fp < 0.02
    algo.deploy("fake_quant")
    assert np.isfinite(pe.eval(m))


def test_mla_gptq_e2e(tiny_dsv3):
    from lightcompress_tpu.models import load_model

    d, _ = tiny_dsv3
    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    rng = np.random.RandomState(1)
    ids = [jnp.asarray(rng.randint(0, 128, (1, 16)), jnp.int32)]
    inputs = m.collect_first_block_input(ids)
    cfg = DotDict({
        "method": "GPTQ",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 8},
        "special": {"blocksize": 8},
        "quant_out": True,
    })
    algo = ALGO_REGISTRY["GPTQ"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    enc = rng.randint(0, 128, (1, 32)).astype(np.int32)
    assert np.isfinite(PerplexityEval(enc, seq_len=16, bs=1).eval(m))
