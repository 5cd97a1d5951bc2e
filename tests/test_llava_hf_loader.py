"""llava-hf checkpoint loader: CLIP vision tower + projector + LLM parity
vs transformers LlavaForConditionalGeneration (reference llava_hf.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_llava_hf_image_features_parity(tmp_path):
    import torch
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)

    torch.manual_seed(0)
    vcfg = CLIPVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=8,
        attn_implementation="eager",
    )
    tcfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    cfg = LlavaConfig(vision_config=vcfg.to_dict(), text_config=tcfg.to_dict(),
                      image_token_index=96, vision_feature_layer=-2,
                      image_seq_length=16)
    hf = LlavaForConditionalGeneration(cfg)
    hf.eval()
    d = str(tmp_path / "llava")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    assert m.vision_feature_layer == -2

    rng = np.random.RandomState(0)
    px_nchw = rng.randn(1, 3, 32, 32).astype(np.float32)
    px_nhwc = px_nchw.transpose(0, 2, 3, 1)

    ours = np.asarray(m.encode_images(jnp.asarray(px_nhwc)))
    with torch.no_grad():
        theirs = hf.get_image_features(
            torch.from_numpy(px_nchw), vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
        if isinstance(theirs, (list, tuple)):
            theirs = theirs[0]
        theirs = theirs.float().numpy()
    np.testing.assert_allclose(ours, theirs.reshape(ours.shape),
                               atol=5e-3, rtol=5e-2)

    # language side
    ids = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int32)
    ours_l = np.asarray(m.language.forward(jnp.asarray(ids)))
    with torch.no_grad():
        out = hf.language_model(torch.from_numpy(ids))
        h = out.last_hidden_state if hasattr(out, "last_hidden_state") \
            else out[0]
        theirs_l = hf.get_output_embeddings()(h).float().numpy()
    np.testing.assert_allclose(ours_l, theirs_l, atol=5e-3, rtol=5e-2)

    # multimodal path runs end to end
    ids2 = ids.copy()
    ids2[0, 3] = 96
    logits = m.forward_multimodal(jnp.asarray(ids2), jnp.asarray(px_nhwc))
    assert logits.shape[1] == 6 - 1 + 16
    assert bool(jnp.all(jnp.isfinite(logits)))
