"""Qwen2-VL / Qwen2.5-VL HF parity (reference llmc/models/qwen2vl.py,
qwen2_5vl.py): packed-sequence vision tower (2D rope, patch merger,
2.5 window attention) and M-RoPE language model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _make_hf_qwen2vl():
    import torch
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    vcfg = dict(depth=2, embed_dim=48, hidden_size=64, num_heads=4,
                in_chans=3, mlp_ratio=2, patch_size=8, spatial_merge_size=2,
                temporal_patch_size=2)
    cfg = Qwen2VLConfig(
        vision_config=vcfg, vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, image_token_id=96, video_token_id=97,
        vision_start_token_id=98,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]})
    hf = Qwen2VLForConditionalGeneration(cfg)
    hf.eval()
    return hf, cfg


def _make_hf_qwen25vl():
    import torch
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration)

    torch.manual_seed(1)
    # window_size 16px / merge 2 / patch 8 -> 1-wide merge windows (4 windows
    # on a 4x4 patch grid); block 2 is full-attention.
    vcfg = dict(depth=3, hidden_size=48, out_hidden_size=64, num_heads=4,
                intermediate_size=96, patch_size=8, spatial_merge_size=2,
                temporal_patch_size=2, window_size=16,
                fullatt_block_indexes=[2])
    cfg = Qwen2_5_VLConfig(
        vision_config=vcfg, vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, image_token_id=96, video_token_id=97,
        vision_start_token_id=98,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]})
    hf = Qwen2_5_VLForConditionalGeneration(cfg)
    hf.eval()
    return hf, cfg


@pytest.mark.parametrize("gen", ["v2", "v2_5"])
def test_qwen_vl_vision_tower_parity(tmp_path, gen):
    import torch

    hf, cfg = _make_hf_qwen2vl() if gen == "v2" else _make_hf_qwen25vl()
    d = str(tmp_path / f"qwenvl_{gen}")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import Qwen2VL, load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert isinstance(m, Qwen2VL)
    assert m.vision.spec.v25 == (gen == "v2_5")

    # one 32x32 image -> grid (1, 4, 4): 16 patches, 4 merged tokens
    rng = np.random.RandomState(0)
    S = 16
    pdim = 3 * 2 * 8 * 8
    patches = rng.randn(S, pdim).astype(np.float32)
    grid = (1, 4, 4)

    ours = np.asarray(m.encode_images(jnp.asarray(patches), grid))
    with torch.no_grad():
        theirs = hf.model.visual(
            torch.from_numpy(patches),
            grid_thw=torch.tensor([list(grid)])).float().numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=5e-2)


@pytest.mark.parametrize("gen", ["v2", "v2_5"])
def test_qwen_vl_multimodal_logits_parity(tmp_path, gen):
    import torch

    hf, cfg = _make_hf_qwen2vl() if gen == "v2" else _make_hf_qwen25vl()
    d = str(tmp_path / f"qwenvl_mm_{gen}")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)

    rng = np.random.RandomState(1)
    patches = rng.randn(16, 3 * 2 * 8 * 8).astype(np.float32)
    grid = (1, 4, 4)
    # vision_start + 4 expanded image tokens + text
    ids = np.array([[1, 98, 96, 96, 96, 96, 5, 9, 44]], dtype=np.int64)

    ours = np.asarray(m.forward_multimodal(ids, patches, grid))
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(patches),
                 image_grid_thw=torch.tensor([list(grid)]))
        theirs = out.logits.float().numpy()
    np.testing.assert_allclose(ours, theirs, atol=8e-3, rtol=5e-2)

    # text-only path (M-RoPE == RoPE)
    ids_t = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int64)
    ours_t = np.asarray(m.forward(ids_t))
    with torch.no_grad():
        theirs_t = hf(input_ids=torch.from_numpy(ids_t)).logits.float()
    np.testing.assert_allclose(ours_t, theirs_t.numpy(), atol=8e-3,
                               rtol=5e-2)


def test_qwen_vl_tower_engine_quantizes():
    """Vision tower blocks run under the blockwise engine (RTN W4)."""
    import lightcompress_tpu.compression.quantization  # noqa: F401
    from lightcompress_tpu.config import DotDict
    from lightcompress_tpu.models.qwen_vl import (QwenVLVisionSpec,
                                                  QwenVLVisionTower,
                                                  init_qwen_vl_tower)
    from lightcompress_tpu.registry import ALGO_REGISTRY

    spec = QwenVLVisionSpec(depth=2, embed_dim=32, out_hidden=48,
                            num_heads=4, intermediate=64, patch_size=8,
                            v25=True, window_size=16,
                            fullatt_block_indexes=(1,))
    tower = QwenVLVisionTower(
        spec, init_qwen_vl_tower(jax.random.PRNGKey(0), spec))
    tower.set_grid((1, 4, 4))
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(16, 3 * 2 * 8 * 8), jnp.float32)
               for _ in range(2)]
    cfg = DotDict({"method": "RTN",
                   "weight": {"bit": 4, "symmetric": False,
                              "granularity": "per_group",
                              "group_size": 16}})
    algo = ALGO_REGISTRY["RTN"](
        tower, cfg, tower.collect_first_block_input(batches), None,
        DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    out = tower.forward_features(batches[0])
    assert out.shape == (4, 48)
    assert bool(jnp.all(jnp.isfinite(out)))
