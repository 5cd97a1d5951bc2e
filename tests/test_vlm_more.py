"""LLaVA-OneVision / Video-LLaVA HF-parity + VILA adapter tests
(reference llmc/models/llava_onevision.py, videollava.py, vila.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_text_cfg(kind="qwen2"):
    if kind == "qwen2":
        from transformers import Qwen2Config
        return Qwen2Config(vocab_size=128, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2)
    from transformers import LlamaConfig
    return LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2)


def test_llava_onevision_parity(tmp_path):
    import torch
    from transformers import (LlavaOnevisionConfig,
                              LlavaOnevisionForConditionalGeneration,
                              SiglipVisionConfig)

    torch.manual_seed(0)
    vcfg = SiglipVisionConfig(hidden_size=48, intermediate_size=96,
                              num_hidden_layers=3, num_attention_heads=4,
                              image_size=32, patch_size=8,
                              attn_implementation="eager")
    cfg = LlavaOnevisionConfig(
        vision_config=vcfg.to_dict(),
        text_config=_tiny_text_cfg("qwen2").to_dict(),
        image_token_index=96, image_grid_pinpoints=[[32, 32]])
    hf = LlavaOnevisionForConditionalGeneration(cfg)
    hf.eval()
    d = str(tmp_path / "onevision")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import LlavaOnevision, load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert isinstance(m, LlavaOnevision)
    assert m.select_strategy == "full"
    assert m.image_newline is not None

    rng = np.random.RandomState(0)
    # anyres: 2 tiles (base + one 32x32 grid tile)
    px_nchw = rng.randn(2, 3, 32, 32).astype(np.float32)
    px_nhwc = px_nchw.transpose(0, 2, 3, 1)

    with torch.no_grad():
        theirs = hf.get_image_features(
            torch.from_numpy(px_nchw)[None],
            image_sizes=torch.tensor([[32, 32]]),
            vision_feature_layer=cfg.vision_feature_layer,
            vision_feature_select_strategy="full",
        )
        if isinstance(theirs, (list, tuple)):
            theirs = theirs[0]
        theirs = theirs.float().numpy()  # packed (base + grid + newlines)

    # packed anyres features match HF (tower + projector + pack, exact fit)
    ours_packed = np.asarray(m.encode_images(jnp.asarray(px_nhwc)))[0]
    np.testing.assert_allclose(ours_packed, theirs.reshape(ours_packed.shape),
                               atol=5e-3, rtol=5e-2)

    # multimodal end-to-end runs
    ids = np.array([[1, 5, 96, 44, 100, 7]], dtype=np.int32)
    logits = m.forward_multimodal(jnp.asarray(ids), jnp.asarray(px_nhwc))
    assert bool(jnp.all(jnp.isfinite(logits)))


def Llava_encode_tiles(m, px_nhwc):
    """Project per-tile features without anyres packing."""
    import lightcompress_tpu.models.llava as L
    return L.Llava.encode_images(m, jnp.asarray(px_nhwc))


def test_video_llava_parity(tmp_path):
    import torch
    from transformers import (CLIPVisionConfig, VideoLlavaConfig,
                              VideoLlavaForConditionalGeneration)

    torch.manual_seed(1)
    vcfg = CLIPVisionConfig(hidden_size=48, intermediate_size=96,
                            num_hidden_layers=3, num_attention_heads=4,
                            image_size=32, patch_size=8,
                            attn_implementation="eager")
    cfg = VideoLlavaConfig(vision_config=vcfg.to_dict(),
                           text_config=_tiny_text_cfg("llama").to_dict(),
                           image_token_index=96, video_token_index=97)
    hf = VideoLlavaForConditionalGeneration(cfg)
    hf.eval()
    d = str(tmp_path / "videollava")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import VideoLlava, load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert isinstance(m, VideoLlava)

    rng = np.random.RandomState(1)
    # image path (image tower, CLS dropped)
    px = rng.randn(1, 3, 32, 32).astype(np.float32)
    ours = np.asarray(m.encode_images(jnp.asarray(px.transpose(0, 2, 3, 1))))
    with torch.no_grad():
        theirs = hf.get_image_features(
            torch.from_numpy(px),
            vision_feature_layer=cfg.vision_feature_layer,
            vision_feature_select_strategy="default")
        if isinstance(theirs, (list, tuple)):
            theirs = theirs[0]
    np.testing.assert_allclose(ours.reshape(theirs.shape),
                               theirs.float().numpy(), atol=5e-3, rtol=5e-2)

    # video path (video tower, all 8 frames, CLS kept by HF)
    vid = rng.randn(1, 4, 3, 32, 32).astype(np.float32)
    ours_v = np.asarray(
        m.encode_videos(jnp.asarray(vid.transpose(0, 1, 3, 4, 2))))
    with torch.no_grad():
        theirs_v, nf = hf.model.get_video_features(
            torch.from_numpy(vid),
            vision_feature_layer=cfg.vision_feature_layer)
        if isinstance(theirs_v, (list, tuple)) and not torch.is_tensor(
                theirs_v):
            theirs_v = theirs_v[0]
    assert nf == 4
    np.testing.assert_allclose(
        ours_v.reshape(-1, ours_v.shape[-1]),
        theirs_v.float().numpy().reshape(-1, ours_v.shape[-1]),
        atol=5e-3, rtol=5e-2)

    # spliced video forward runs
    ids = np.array([[1, 5, 97, 44, 100, 7]], dtype=np.int32)
    logits = m.forward_video(jnp.asarray(ids),
                             jnp.asarray(vid.transpose(0, 1, 3, 4, 2)))
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_vila_adapter_engine_compat():
    """VILA: mlp_downsample projector 4x-reduces tokens; engine surfaces."""
    from lightcompress_tpu.models.vlm import make_tiny_vila

    m = make_tiny_vila()
    px = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                     jnp.float32)
    feats = m.encode_images(px)
    assert feats.shape == (1, 4, 64)  # 16 patches -> 2x2 downsample -> 4
    ids = np.array([[1, 5, 255, 44, 100, 7]], dtype=np.int32)
    logits = m.forward_multimodal(jnp.asarray(ids), px)
    assert logits.shape[1] == 6 - 1 + 4
    assert bool(jnp.all(jnp.isfinite(logits)))

    # blockwise-engine modality surfaces
    m.set_modality("vision")
    assert m.num_blocks == 2
    m.set_modality("language")
    assert m.num_blocks == 2
    assert m.get_subsets_in_block(0)
