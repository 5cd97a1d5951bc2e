"""VLM (LLaVA-style) tests: multimodal splice, per-modality compression,
token reduction composed with quantization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.models.llava import make_tiny_llava
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


@pytest.fixture()
def vlm():
    return make_tiny_llava(seed=0)


def _sample(vlm, seed=0, T=8):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, 200, (1, T)).astype(np.int32)
    ids[0, 3] = vlm.image_token_id
    px = rng.randn(1, 32, 32, 3).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(px)


def test_multimodal_splice_shapes(vlm):
    ids, px = _sample(vlm)
    emb = vlm.multimodal_embed(ids, px)
    # 16 patches spliced at the image-token position: 8 - 1 + 16 = 23
    assert emb.shape == (1, 23, 64)
    logits = vlm.forward_multimodal(ids, px)
    assert logits.shape == (1, 23, 256)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_splice_positions(vlm):
    ids, px = _sample(vlm)
    emb = vlm.multimodal_embed(ids, px)
    txt = vlm.language.params["embed"]["weight"]
    # position 0..2 are text embeds of ids[0..2]
    np.testing.assert_allclose(
        np.asarray(emb[0, 0]), np.asarray(txt[int(ids[0, 0])]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(emb[0, 2]), np.asarray(txt[int(ids[0, 2])]), atol=1e-6
    )
    # position 3..18 are image embeds; 19.. are text after the image token
    img = vlm.encode_images(px)
    np.testing.assert_allclose(
        np.asarray(emb[0, 3]), np.asarray(img[0, 0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(emb[0, 19]), np.asarray(txt[int(ids[0, 4])]), atol=1e-6
    )


def test_vision_modality_quant(vlm):
    vlm.set_modality("vision")
    rng = np.random.RandomState(1)
    px = [jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
          for _ in range(2)]
    inputs = vlm.collect_first_block_input(px)
    assert inputs[0].shape[-1] == 48  # vit hidden
    cfg = DotDict({"method": "RTN",
                   "weight": {"bit": 8, "symmetric": True,
                              "granularity": "per_channel"}})
    algo = ALGO_REGISTRY["RTN"](vlm, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    w_q = np.asarray(vlm.vision.blocks[0]["attn"]["q"]["weight"])
    assert not np.array_equal(
        w_q, np.asarray(algo.model._fp_blocks[0]["attn"]["q"]["weight"])
    )
    algo.restore_float()


def test_language_modality_multimodal_calib(vlm):
    vlm.set_modality("language")
    samples = [_sample(vlm, seed=i) for i in range(2)]
    inputs = vlm.collect_first_block_input(samples)
    assert inputs[0].shape == (1, 23, 64)
    cfg = DotDict({
        "method": "Awq",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"trans": True, "trans_version": "v2",
                    "weight_clip": False},
    })
    algo = ALGO_REGISTRY["Awq"](vlm, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    ids, px = _sample(vlm, seed=9)
    logits = vlm.forward_multimodal(ids, px)
    assert bool(jnp.all(jnp.isfinite(logits)))
    algo.restore_float()


def test_token_reduction_composed_with_quant(vlm):
    """token_reduction config key hooks the vision tower during
    set_quant_config (bbq.py:261-265 composability)."""
    vlm.set_modality("vision")
    rng = np.random.RandomState(2)
    px = [jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))]
    inputs = vlm.collect_first_block_input(px)
    cfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
        "token_reduction": {"method": "FastV",
                            "special": {"filter_layer": 1, "rate": 0.5}},
    })
    algo = ALGO_REGISTRY["RTN"](vlm, cfg, inputs, None, DotDict({}))
    assert 1 in vlm.vision.token_hooks
    feats = vlm.vision.forward_features(px[0])
    assert feats.shape[1] == 1 + 8  # cls + half of 16 patches
    # and the multimodal path reflects fewer vision tokens
    ids, pxs = _sample(vlm)
    emb = vlm.multimodal_embed(ids, pxs)
    assert emb.shape[1] == 8 - 1 + 8
    vlm.vision.token_hooks.clear()
