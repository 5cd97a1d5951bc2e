"""GLM-4V HF-parity (reference llmc/models/glm4v.py): Qwen2.5-style tower
with abs pos + conv downsample + gated merger; GLM-4 LM with M-RoPE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _build(tmp_path):
    import torch
    from transformers import Glm4vConfig, Glm4vForConditionalGeneration

    torch.manual_seed(0)
    vcfg = dict(depth=3, hidden_size=48, out_hidden_size=64, num_heads=4,
                intermediate_size=96, patch_size=8, spatial_merge_size=2,
                temporal_patch_size=2, image_size=32)
    cfg = Glm4vConfig(
        vision_config=vcfg, vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, image_token_id=96, video_token_id=97,
        image_start_token_id=98, image_end_token_id=99,
        rope_scaling={"rope_type": "default", "mrope_section": [2, 1, 1]},
        partial_rotary_factor=0.5, attention_bias=True)
    hf = Glm4vForConditionalGeneration(cfg)
    hf.eval()
    d = str(tmp_path / "glm4v")
    hf.save_pretrained(d, safe_serialization=True)
    return hf, cfg, d


def test_glm4v_vision_parity(tmp_path):
    import torch

    hf, cfg, d = _build(tmp_path)

    from lightcompress_tpu.models import Glm4VL, load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert isinstance(m, Glm4VL)

    rng = np.random.RandomState(0)
    patches = rng.randn(16, 3 * 2 * 8 * 8).astype(np.float32)
    grid = (1, 4, 4)
    ours = np.asarray(m.encode_images(jnp.asarray(patches), grid))
    with torch.no_grad():
        theirs = hf.model.visual(
            torch.from_numpy(patches),
            grid_thw=torch.tensor([list(grid)])).float().numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=5e-2)


def test_glm4v_text_parity(tmp_path):
    import torch

    hf, cfg, d = _build(tmp_path)

    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    ids = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int64)
    ours = np.asarray(m.forward(ids))
    with torch.no_grad():
        theirs = hf(input_ids=torch.from_numpy(ids)).logits.float().numpy()
    np.testing.assert_allclose(ours, theirs, atol=8e-3, rtol=5e-2)

    # multimodal end-to-end runs and is finite
    rng = np.random.RandomState(1)
    patches = rng.randn(16, 3 * 2 * 8 * 8).astype(np.float32)
    ids_mm = np.array([[1, 98, 96, 96, 96, 96, 5, 9]], dtype=np.int64)
    logits = m.forward_multimodal(ids_mm, patches, (1, 4, 4))
    assert bool(jnp.all(jnp.isfinite(logits)))
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids_mm),
                 pixel_values=torch.from_numpy(patches),
                 image_grid_thw=torch.tensor([[1, 4, 4]]))
    np.testing.assert_allclose(np.asarray(logits),
                               out.logits.float().numpy(),
                               atol=8e-3, rtol=5e-2)
