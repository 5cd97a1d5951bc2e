"""Mllama (Llama-3.2-Vision) HF-parity (reference llmc/models/mllama.py):
tiled gated vision tower, cross-attention language layers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _build(tmp_path):
    import torch
    from transformers import MllamaConfig, MllamaForConditionalGeneration
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig, MllamaVisionConfig)

    torch.manual_seed(0)
    vcfg = MllamaVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_global_layers=1, attention_heads=4, image_size=32, patch_size=8,
        max_num_tiles=1, supported_aspect_ratios=[[1, 1]],
        vision_output_dim=96, intermediate_layers_indices=[0],
        attn_implementation="eager")
    tcfg = MllamaTextConfig(
        vocab_size=136, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        cross_attention_layers=[1], pad_token_id=0,
        rope_scaling={"rope_type": "default"})
    cfg = MllamaConfig(vision_config=vcfg.to_dict(),
                       text_config=tcfg.to_dict(), image_token_index=128)
    hf = MllamaForConditionalGeneration(cfg)
    hf.eval()
    d = str(tmp_path / "mllama")
    hf.save_pretrained(d, safe_serialization=True)
    return hf, cfg, d


def test_mllama_vision_and_logits_parity(tmp_path):
    import torch

    hf, cfg, d = _build(tmp_path)

    from lightcompress_tpu.models import Mllama, load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert isinstance(m, Mllama)
    assert m.cross_layers == {1}

    rng = np.random.RandomState(0)
    px_nchw = rng.randn(1, 1, 1, 3, 32, 32).astype(np.float32)  # B,media,tiles
    px_tiles = px_nchw[0, 0].transpose(0, 2, 3, 1)  # (tiles, H, W, C)
    aspect_ids = torch.tensor([[1]])
    aspect_mask = torch.ones(1, 1, 1, dtype=torch.long)

    # vision tower parity: (B, media, tiles, patches, D*(1+n_int))
    ours_v = np.asarray(m.vision.forward_features(jnp.asarray(px_tiles),
                                                  aspect_id=1))
    with torch.no_grad():
        theirs_v = hf.model.vision_model(
            torch.from_numpy(px_nchw), aspect_ids,
            aspect_mask).last_hidden_state.float().numpy()
    np.testing.assert_allclose(ours_v, theirs_v.reshape(ours_v.shape),
                               atol=5e-3, rtol=5e-2)

    # full multimodal logits (cross-attn layers active, no cross mask)
    ids = np.array([[1, 5, 128, 44, 100, 7]], dtype=np.int64)
    ours = np.asarray(m.forward_multimodal(ids, px_tiles, aspect_id=1))
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px_nchw),
                 aspect_ratio_ids=aspect_ids,
                 aspect_ratio_mask=aspect_mask)
    np.testing.assert_allclose(ours, out.logits.float().numpy(),
                               atol=8e-3, rtol=5e-2)

    # text-only path: cross layers still run (HF skips them only without
    # cached vision states during generation; with no image HF masks rows —
    # here we check the self-attn layers via the plain forward)
    ids_t = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int64)
    logits_t = m.forward_multimodal(ids_t, px_tiles, aspect_id=1)
    assert bool(jnp.all(jnp.isfinite(logits_t)))


def test_mllama_blockwise_quant_runs(tmp_path):
    """RTN W4 over the mixed self/cross language blocks with cross extras."""
    import lightcompress_tpu.compression.quantization  # noqa: F401
    from lightcompress_tpu.config import DotDict
    from lightcompress_tpu.models import load_model
    from lightcompress_tpu.registry import ALGO_REGISTRY

    _, cfg, d = _build(tmp_path)
    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)

    rng = np.random.RandomState(1)
    px = rng.randn(1, 32, 32, 3).astype(np.float32)
    batches = [
        (np.array([[1, 5, 128, 44, 100, 7]], dtype=np.int64), px, 1),
        np.array([[2, 6, 10, 45, 101, 8]], dtype=np.int64),
    ]
    inputs = m.collect_first_block_input(batches)
    qcfg = DotDict({"method": "RTN",
                    "weight": {"bit": 4, "symmetric": False,
                               "granularity": "per_group",
                               "group_size": 16}})
    algo = ALGO_REGISTRY["RTN"](m, qcfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    out = m.forward_multimodal(batches[0][0], jnp.asarray(px), 1)
    assert bool(jnp.all(jnp.isfinite(out)))

    # vision modality pass
    m.set_modality("vision")
    vis_inputs = m.collect_first_block_input([(px, 1)])
    algo_v = ALGO_REGISTRY["RTN"](m, qcfg, vis_inputs, None, DotDict({}))
    algo_v.run_block_loop()
