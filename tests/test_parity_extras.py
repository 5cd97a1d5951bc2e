"""Registry-key parity, WanI2V, token-reduction Visualizer, img_general."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lightcompress_tpu.compression  # noqa: F401  (registers)
import lightcompress_tpu.data  # noqa: F401
import lightcompress_tpu.models as M
from lightcompress_tpu.registry import (KV_REGISTRY, MODEL_REGISTRY,
                                        PREPROC_REGISTRY,
                                        TOKEN_REDUCTION_REGISTRY)


def test_reference_registry_key_parity():
    # reference llmc config `model.type` strings must resolve
    for k in ("InternVL2", "InternVL3_5", "LlavaHf", "Llava_OneVision",
              "Qwen2_5VL", "VideoLLaVA", "GLM4V", "WanT2V", "WanI2V",
              "Llama", "DeepseekV3", "Qwen2Moe", "Vit", "Qwen2Audio"):
        assert k in MODEL_REGISTRY, k
    assert "SinkKV" in KV_REGISTRY and "Sink" in KV_REGISTRY
    assert "Visualizer" in TOKEN_REDUCTION_REGISTRY
    assert "img_general" in PREPROC_REGISTRY


def test_wan_i2v_image_branch():
    m = M.WanT2V.tiny()
    i2v = M.WanI2V(m.arch, m.params, cross_dim=64)
    for blk in i2v.blocks:
        blk["attn2"]["add_k_proj"] = {"weight": jnp.zeros((128, 64))}
        blk["attn2"]["add_v_proj"] = {"weight": jnp.zeros((128, 64))}
    rng = np.random.RandomState(0)
    b = {"latents": rng.randn(1, 8, 128).astype("f"),
         "t_emb": rng.randn(1, 6, 128).astype("f"),
         "ctx": rng.randn(1, 4, 64).astype("f"),
         "ctx_img": rng.randn(1, 3, 64).astype("f")}
    (x, extra), = i2v.collect_first_block_input([b])
    y, feats, _ = i2v.block_forward(0, x, extra=extra)
    # zero add_k/v projections: image branch contributes exactly nothing
    y_t2v, _, _ = m.block_forward(
        0, x, extra={"t_emb": extra["t_emb"], "ctx": extra["ctx"]})
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_t2v), atol=2e-5)
    # non-zero image branch changes the output
    for blk in i2v.blocks:
        blk["attn2"]["add_k_proj"]["weight"] = jnp.full((128, 64), 0.02)
        blk["attn2"]["add_v_proj"]["weight"] = jnp.full((128, 64), 0.02)
    y2, _, _ = i2v.block_forward(0, x, extra=extra)
    assert not np.allclose(np.asarray(y2), np.asarray(y_t2v), atol=1e-6)


def test_token_reduction_visualizer(tmp_path):
    from lightcompress_tpu.models.vit import (Vit, init_vit_params,
                                              make_vit_arch)

    arch = make_vit_arch(image_size=32, patch_size=8, hidden=64, inter=128,
                         layers=2, heads=4, num_classes=10)
    params = init_vit_params(jax.random.PRNGKey(0), arch, patch_size=8)
    model = Vit(arch, params, patch_size=8)
    vis = TOKEN_REDUCTION_REGISTRY["Visualizer"](
        {"special": {"vis_layer": 1, "save_dir": str(tmp_path),
                     "grid_size": 4, "token_idx": 3}}, model)
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    model.collect_first_block_input([px])
    # run the tower so the hook fires
    logits = model.classify(px)
    assert logits.shape == (2, 10)
    assert "attn" in vis.collected
    img = rng.rand(32, 32, 3).astype(np.float32)
    paths = vis.save(image=img, keep_idx=[0, 1, 5, 7])
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)


def test_img_general_preproc():
    fn = PREPROC_REGISTRY["img_general"]
    seen = {}

    def batch_process(items):
        seen["n"] = len(items)
        return [np.zeros((1, 4)) for _ in items]

    out = fn(list(range(10)), None, batch_process, 4)
    assert seen["n"] == 4 and len(out) == 4
