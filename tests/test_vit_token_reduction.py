"""ViT family + token reduction + accuracy eval tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.models.vit import (
    AccuracyEval, Vit, init_vit_params, make_vit_arch,
)
from lightcompress_tpu.registry import ALGO_REGISTRY, TOKEN_REDUCTION_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


@pytest.fixture(scope="module")
def tiny_vit():
    arch = make_vit_arch(image_size=32, patch_size=8, hidden=64, inter=128,
                         layers=2, heads=4, num_classes=10)
    params = init_vit_params(jax.random.PRNGKey(0), arch, patch_size=8)
    return Vit(arch, params, patch_size=8)


def _images(n=4, size=32, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(n, size, size, 3).astype(np.float32))


def test_vit_classify(tiny_vit):
    logits = tiny_vit.classify(_images())
    assert logits.shape == (4, 10)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_vit_accuracy_eval(tiny_vit):
    rng = np.random.RandomState(1)
    batches = [(np.asarray(_images(4, seed=i)), rng.randint(0, 10, 4))
               for i in range(2)]
    acc = AccuracyEval(batches).eval(tiny_vit)
    assert 0.0 <= acc <= 1.0


def test_vit_rtn_quant(tiny_vit):
    px = [_images(2, seed=i) for i in range(2)]
    inputs = tiny_vit.collect_first_block_input(px)
    assert inputs[0].shape == (2, 17, 64)  # 16 patches + cls
    cfg = DotDict({"method": "RTN",
                   "weight": {"bit": 8, "symmetric": True,
                              "granularity": "per_channel"}})
    algo = ALGO_REGISTRY["RTN"](tiny_vit, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    logits = tiny_vit.classify(_images())
    assert bool(jnp.all(jnp.isfinite(logits)))
    algo.restore_float()


def test_tome_merges_tokens(tiny_vit):
    tiny_vit.token_hooks.clear()
    TOKEN_REDUCTION_REGISTRY["ToMe"](
        {"special": {"r": 4, "block_ids": [1]}}, tiny_vit
    )
    assert 1 in tiny_vit.token_hooks
    feats = tiny_vit.forward_features(_images())
    assert feats.shape[1] == 17 - 4
    tiny_vit.token_hooks.clear()


def test_fastv_drops_tokens(tiny_vit):
    tiny_vit.token_hooks.clear()
    TOKEN_REDUCTION_REGISTRY["FastV"](
        {"special": {"filter_layer": 1, "rate": 0.5}}, tiny_vit
    )
    feats = tiny_vit.forward_features(_images())
    assert feats.shape[1] == 1 + 8  # cls + 50% of 16
    tiny_vit.token_hooks.clear()


def test_random_prune(tiny_vit):
    tiny_vit.token_hooks.clear()
    TOKEN_REDUCTION_REGISTRY["RandomPrune"](
        {"special": {"filter_layer": 0, "rate": 0.25}}, tiny_vit
    )
    feats = tiny_vit.forward_features(_images())
    assert feats.shape[1] == 1 + 12
    tiny_vit.token_hooks.clear()


def test_tome_cls_never_merged(tiny_vit):
    from lightcompress_tpu.compression.token_reduction.tome import (
        bipartite_soft_matching_merge,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
    marker = jnp.full((2, 1, 8), 99.0)
    x = jnp.concatenate([marker, x[:, 1:]], axis=1)
    out = bipartite_soft_matching_merge(x, r=4)
    assert out.shape == (2, 12, 8)
    # cls marker survives unmerged (first kept-A slot ordering may move it)
    assert bool(jnp.any(jnp.all(jnp.abs(out - 99.0) < 1e-5, axis=-1)))


def test_quant_attn_and_softmax(tiny_vit):
    """quant_attn/quant_softmax install attention-internal qdq hooks
    (LlmcViTSelfAttention analogue)."""
    px = [_images(2, seed=5)]
    inputs = tiny_vit.collect_first_block_input(px)
    cfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 8, "symmetric": True, "granularity": "per_channel"},
        "act": {"bit": 8, "symmetric": True, "granularity": "per_token",
                "quant_attn": True, "quant_softmax": True},
    })
    algo = ALGO_REGISTRY["RTN"](tiny_vit, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    ref = tiny_vit.classify(_images(2, seed=6))
    algo.deploy("fake_quant")
    assert tiny_vit.attn_matmul_hook is not None
    assert tiny_vit.attn_softmax_hook is not None
    out = tiny_vit.classify(_images(2, seed=6))
    assert bool(jnp.all(jnp.isfinite(out)))
    # quantized attention changes the logits (hooks actually fire)
    assert not np.allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    algo.restore_float()
    assert tiny_vit.attn_matmul_hook is None


def test_pyramiddrop_stages(tiny_vit):
    tiny_vit.token_hooks.clear()
    TOKEN_REDUCTION_REGISTRY["PyramidDrop"](
        {"special": {"layers": [0, 1], "ratio": 0.5}}, tiny_vit
    )
    feats = tiny_vit.forward_features(_images())
    # 16 -> 8 at layer 0, 8 -> 4 at layer 1 (+cls)
    assert feats.shape[1] == 1 + 4
    tiny_vit.token_hooks.clear()


def test_vispruner_diversity(tiny_vit):
    tiny_vit.token_hooks.clear()
    TOKEN_REDUCTION_REGISTRY["VisPruner"](
        {"special": {"filter_layer": 1, "rate": 0.5,
                     "important_frac": 0.5}}, tiny_vit
    )
    feats = tiny_vit.forward_features(_images())
    assert feats.shape[1] == 1 + 8
    tiny_vit.token_hooks.clear()


def test_dart_duplication(tiny_vit):
    tiny_vit.token_hooks.clear()
    TOKEN_REDUCTION_REGISTRY["DART"](
        {"special": {"filter_layer": 0, "rate": 0.25, "n_pivots": 4}},
        tiny_vit,
    )
    feats = tiny_vit.forward_features(_images())
    assert feats.shape[1] == 1 + 12
    tiny_vit.token_hooks.clear()
