"""InternVL HF-parity (reference llmc/models/internvl2.py, internvl3_5.py):
InternViT tower (layer scale, optional full-dim QK RMSNorm), pixel-shuffle
projector, Qwen2 LM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _build(tmp_path, use_qk_norm):
    import torch
    from transformers import (InternVLConfig,
                              InternVLForConditionalGeneration,
                              InternVLVisionConfig, Qwen2Config)

    torch.manual_seed(0)
    vcfg = InternVLVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=[32, 32], patch_size=[8, 8],
        use_qk_norm=use_qk_norm, attn_implementation="eager")
    tcfg = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2)
    cfg = InternVLConfig(vision_config=vcfg.to_dict(),
                         text_config=tcfg.to_dict(), image_token_id=96)
    hf = InternVLForConditionalGeneration(cfg)
    hf.eval()
    d = str(tmp_path / f"internvl_{use_qk_norm}")
    hf.save_pretrained(d, safe_serialization=True)
    return hf, cfg, d


@pytest.mark.parametrize("use_qk_norm", [False, True])
def test_internvl_image_features_parity(tmp_path, use_qk_norm):
    import torch

    hf, cfg, d = _build(tmp_path, use_qk_norm)

    from lightcompress_tpu.models import InternVL, load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert isinstance(m, InternVL)

    rng = np.random.RandomState(0)
    px_nchw = rng.randn(1, 3, 32, 32).astype(np.float32)
    px_nhwc = px_nchw.transpose(0, 2, 3, 1)

    ours = np.asarray(m.encode_images(jnp.asarray(px_nhwc)))
    with torch.no_grad():
        theirs = hf.get_image_features(
            torch.from_numpy(px_nchw),
            vision_feature_layer=cfg.vision_feature_layer,
            vision_feature_select_strategy=cfg.vision_feature_select_strategy,
        )
        if isinstance(theirs, (list, tuple)):
            theirs = theirs[0]
        theirs = theirs.float().numpy()
    # pixel shuffle: 16 patches -> 4 tokens of 4*48 dims -> projected
    assert ours.shape == (1, 4, 64)
    np.testing.assert_allclose(ours, theirs.reshape(ours.shape),
                               atol=5e-3, rtol=5e-2)

    # full multimodal logits
    ids = np.array([[1, 5, 96, 96, 96, 96, 44, 7]], dtype=np.int64)
    logits = _forward_scatter(m, ids, jnp.asarray(px_nhwc))
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(px_nchw))
    np.testing.assert_allclose(np.asarray(logits),
                               out.logits.float().numpy(),
                               atol=8e-3, rtol=5e-2)


def _forward_scatter(m, ids, px):
    """HF expands the image token to T_v positions; emulate masked_scatter
    then run the language blocks."""
    import lightcompress_tpu.models.arch as A

    img = m.encode_images(px)[0]  # (Tv, H)
    ids_j = jnp.asarray(ids)
    txt = A.embed_forward(m.language.arch, m.language.params, ids_j)
    mask = ids_j == m.image_token_id
    idx = jnp.clip(jnp.cumsum(mask, axis=1) - 1, 0, img.shape[0] - 1)
    x = jnp.where(mask[..., None], img[idx], txt)
    arch = m.language.arch
    T = x.shape[1]
    cos, sin = m.language.rope_tables(T)
    amask = A.causal_mask(T, T)
    for bp in m.language.params["blocks"]:
        x, _, _ = A.block_forward(arch, bp, x, cos, sin, amask)
    return A.head_forward(arch, m.language.params, x)
