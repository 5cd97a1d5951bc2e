"""VLM/video token-reduction algorithms: VisionZip, FasterVLM, DivPrune,
MustDrop (feature stage), SparseVLM/HoliTom (LLM stage), DyCoke/PruneVid/
FastVID/HoliTom (video)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lightcompress_tpu.models.llava import make_tiny_llava
from lightcompress_tpu.registry import TOKEN_REDUCTION_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


@pytest.fixture()
def vlm():
    return make_tiny_llava(seed=0)


def _sample(vlm, seed=0, T=10):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, 200, (1, T)).astype(np.int32)
    ids[0, 3] = vlm.image_token_id
    px = rng.randn(1, 32, 32, 3).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(px)


def _install(vlm, method, special):
    TOKEN_REDUCTION_REGISTRY[method]({"special": special}, vlm)


# tiny vlm: 16 patches -> Tv=16, lang hidden 64, T_text=10


def test_fastervlm_feature_drop(vlm):
    _install(vlm, "FasterVLM", {"rate": 0.5})
    feats = vlm.encode_images(_sample(vlm)[1])
    assert feats.shape == (1, 8, 64)
    logits = vlm.forward_multimodal(*_sample(vlm))
    assert logits.shape[1] == 10 - 1 + 8
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_visionzip_dominant_contextual(vlm):
    _install(vlm, "VisionZip", {"dominant": 6, "contextual": 2})
    feats = vlm.encode_images(_sample(vlm)[1])
    assert feats.shape == (1, 8, 64)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_visionzip_prune_only(vlm):
    _install(vlm, "VisionZip",
             {"dominant": 4, "contextual": 2, "prune_only": True})
    feats = vlm.encode_images(_sample(vlm)[1])
    assert feats.shape == (1, 4, 64)


def test_divprune_diversity(vlm):
    _install(vlm, "DivPrune", {"rate": 0.5})
    feats = vlm.encode_images(_sample(vlm)[1])
    assert feats.shape == (1, 8, 64)
    # the selected subset should be more diverse (lower max pairwise cosine)
    vlm2 = make_tiny_llava(seed=0)
    full = vlm2.encode_images(_sample(vlm2)[1])[0].astype(jnp.float32)
    sel = feats[0].astype(jnp.float32)

    def max_offdiag_cos(x):
        n = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        s = n @ n.T
        return float(jnp.max(s - jnp.eye(x.shape[0]) * 2.0))

    assert max_offdiag_cos(sel) <= max_offdiag_cos(full) + 1e-5


def test_mustdrop_spatial_then_drop(vlm):
    _install(vlm, "MustDrop", {"merge_layer": 1, "rate": 0.25})
    # 16 patches -> 2x2 merge at layer 1 -> 4 patches; drop 25% -> 3
    feats = vlm.encode_images(_sample(vlm)[1])
    assert feats.shape == (1, 3, 64)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_sparsevlm_llm_stage(vlm):
    _install(vlm, "SparseVLM",
             {"pruning_loc": [1], "keep_schedule": [0.5], "merge": True})
    ids, px = _sample(vlm)
    logits = vlm.forward_multimodal(ids, px)
    # 16 vision tokens -> keep 8 + 1 merged: T = 10-1+16 - 16 + 9 = 18
    assert logits.shape[1] == 18
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_sparsevlm_no_merge_two_stages(vlm):
    _install(vlm, "SparseVLM",
             {"pruning_loc": [0, 1], "keep_schedule": [0.5, 0.25],
              "merge": False})
    ids, px = _sample(vlm)
    logits = vlm.forward_multimodal(ids, px)
    # stage0: 16->8, stage1: ->4 ; T = 9 + 4 = 13
    assert logits.shape[1] == 13
    assert bool(jnp.all(jnp.isfinite(logits)))


def _video_feats(vlm, F=4, seed=0):
    rng = np.random.RandomState(seed)
    vlm.num_frames = F
    # (F, Tp, H) projected frame features
    return jnp.asarray(rng.randn(F, 16, 64).astype(np.float32))


def test_dycoke_even_odd(vlm):
    _install(vlm, "DyCoke", {"merging_ratio": 0.75})
    hook = vlm.feature_hooks[-1]
    feats = _video_feats(vlm, F=4)
    out = hook(vlm, feats)
    # even frames whole (16), odd frames keep 4: 16+4+16+4 = 40
    assert out.shape == (1, 40, 64)


def test_prunevid_segments(vlm):
    _install(vlm, "PruneVid", {"n_segments": 2, "cluster_ratio": 0.5})
    hook = vlm.feature_hooks[-1]
    out = hook(vlm, _video_feats(vlm, F=4))
    # 2 segments x 8 clusters
    assert out.shape == (1, 16, 64)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_fastvid_dyseg_stprune(vlm):
    _install(vlm, "FastVID",
             {"DySeg_c": 2, "salient_frac": 0.25, "context_frac": 0.25,
              "residual_frac": 0.125})
    hook = vlm.feature_hooks[-1]
    out = hook(vlm, _video_feats(vlm, F=4))
    # every frame contributes n_sal+n_ctx = 8 slots (anchor or padded
    # residual role): 4 frames x 8
    assert out.shape == (1, 32, 64)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_holitom_outer_and_inner(vlm):
    _install(vlm, "HoliTom",
             {"n_segments": 2, "static_ratio": 0.25, "dynamic_frac": 0.125,
              "holitom_k": 1, "holitom_r": 0.5})
    hook = vlm.feature_hooks[-1]
    out = hook(vlm, _video_feats(vlm, F=4))
    # static: 2 seg x 4 clusters = 8 ; dynamic: 4 frames x 2 = 8
    assert out.shape == (1, 16, 64)
    assert 1 in vlm.lang_token_hooks
    # inner-LLM stage on an image input still works end-to-end
    vlm.num_frames = 1
    vlm.feature_hooks.clear()
    ids, px = _sample(vlm)
    logits = vlm.forward_multimodal(ids, px)
    # 16 vis -> keep 8 (reference semantics: pruned tokens fold INTO the
    # kept ones as sequential pairwise averages, no extra recycle token —
    # holitom.py:1374-1421): 9 text + 8 vis = 17
    assert logits.shape[1] == 17
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_video_passthrough_single_frame(vlm):
    _install(vlm, "DyCoke", {"merging_ratio": 0.75})
    vlm.num_frames = 1
    ids, px = _sample(vlm)
    logits = vlm.forward_multimodal(ids, px)
    assert logits.shape[1] == 25  # unchanged: 9 + 16


def test_standalone_token_reduction_algo(vlm):
    """method: TokenReduction as an ALGO_REGISTRY entry (reference
    base_blockwise_token_reduction.py:13-31) — hook install at construction,
    no-op block loop/deploy."""
    from lightcompress_tpu.config import DotDict
    from lightcompress_tpu.registry import ALGO_REGISTRY

    algo = ALGO_REGISTRY["TokenReduction"](
        vlm, DotDict({"method": "TokenReduction",
                      "special": {"method": "FasterVLM", "rate": 0.5}}),
        [], None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    feats = vlm.encode_images(_sample(vlm)[1])
    assert feats.shape == (1, 8, 64)
