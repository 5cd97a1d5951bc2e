"""MiniCPM-V (perceiver resampler) and InternOmni (audio+vision) adapters
(reference minicpmv.py, internomni.py) — hand-built tiny checkpoints
(neither has a transformers class; reference loads custom repos)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightcompress_tpu.models.arch import ArchSpec, init_params
from lightcompress_tpu.models.base import Llama
from lightcompress_tpu.models.vit import Vit, init_vit_params, make_vit_arch


def _tiny_lang(seed=0, vocab=256, hidden=64):
    la = ArchSpec(family="llama", vocab_size=vocab, hidden_size=hidden,
                  intermediate_size=hidden * 2, num_layers=2, num_heads=4,
                  num_kv_heads=2, head_dim=hidden // 4, dtype=jnp.float32)
    return Llama(la, init_params(jax.random.PRNGKey(seed), la))


def _tiny_siglip(seed=1, hidden=48, image_size=32, patch=8):
    va = make_vit_arch(image_size=image_size, patch_size=patch,
                       hidden=hidden, inter=hidden * 2, layers=2, heads=4,
                       num_classes=1, dtype=jnp.float32, cls_token=False,
                       act_fn="gelu_tanh")
    return Vit(va, init_vit_params(jax.random.PRNGKey(seed), va,
                                   patch_size=patch, cls_token=False),
               patch_size=patch)


def _lin(key, o, i, dt=jnp.float32):
    return {"weight": (jax.random.normal(key, (o, i)) * 0.05).astype(dt),
            "bias": jnp.zeros((o,), dt)}


def _ln(d, dt=jnp.float32):
    return {"weight": jnp.ones((d,), dt), "bias": jnp.zeros((d,), dt)}


def make_tiny_minicpmv(seed=0):
    from lightcompress_tpu.models.vlm import MiniCPMV

    lang = _tiny_lang(seed)
    vit = _tiny_siglip(seed + 1)
    H, VD, Q = 64, 48, 8
    ks = jax.random.split(jax.random.PRNGKey(seed + 2), 8)
    projector = {
        "query": (jax.random.normal(ks[0], (Q, H)) * 0.05).astype(
            jnp.float32),
        "kv_proj": {"weight": (jax.random.normal(ks[1], (H, VD)) * 0.05
                               ).astype(jnp.float32)},
        "ln_q": _ln(H), "ln_kv": _ln(H), "ln_post": _ln(H),
        "attn": {"q": _lin(ks[2], H, H), "k": _lin(ks[3], H, H),
                 "v": _lin(ks[4], H, H), "o": _lin(ks[5], H, H)},
        "proj": (jax.random.normal(ks[6], (H, H)) * 0.05).astype(
            jnp.float32),
    }
    return MiniCPMV(lang, vit, projector, image_token_id=255,
                    num_resampler_heads=4)


def test_minicpmv_resampler_and_engine():
    import lightcompress_tpu.compression.quantization  # noqa: F401
    from lightcompress_tpu.config import DotDict
    from lightcompress_tpu.registry import ALGO_REGISTRY

    m = make_tiny_minicpmv()
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    feats = m.encode_images(px)
    assert feats.shape == (1, 8, 64)  # 16 patches -> 8 learned queries
    ids = np.array([[1, 5, 255, 44, 100, 7]], dtype=np.int32)
    logits = m.forward_multimodal(jnp.asarray(ids), px)
    assert logits.shape[1] == 6 - 1 + 8
    assert bool(jnp.all(jnp.isfinite(logits)))

    # blockwise RTN over the language blocks with multimodal calib
    inputs = m.collect_first_block_input([(ids, np.asarray(px))])
    cfg = DotDict({"method": "RTN",
                   "weight": {"bit": 4, "symmetric": False,
                              "granularity": "per_group", "group_size": 16}})
    algo = ALGO_REGISTRY["RTN"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    out = m.forward_multimodal(jnp.asarray(ids), px)
    assert bool(jnp.all(jnp.isfinite(out)))


def make_tiny_internomni(seed=0):
    from lightcompress_tpu.models.audio import (AudioTower, init_audio_params,
                                                make_audio_arch)
    from lightcompress_tpu.models.vlm import InternOmni

    lang = _tiny_lang(seed)
    # InternViT-style tower params live in the generic Vit
    va = make_vit_arch(image_size=32, patch_size=8, hidden=48, inter=96,
                       layers=2, heads=4, num_classes=1, dtype=jnp.float32)
    vit = Vit(va, init_vit_params(jax.random.PRNGKey(seed + 1), va,
                                  patch_size=8), patch_size=8)
    aa = make_audio_arch(d_model=48, layers=2, heads=4, ffn=96,
                         dtype=jnp.float32)
    audio = AudioTower(aa, init_audio_params(jax.random.PRNGKey(seed + 2),
                                             aa, num_mel_bins=16))
    ks = jax.random.split(jax.random.PRNGKey(seed + 3), 6)
    projector = {  # pixel-shuffle projector (4*48 -> 64)
        "ln": _ln(4 * 48), "fc1": _lin(ks[0], 64, 4 * 48),
        "fc2": _lin(ks[1], 64, 64),
    }
    audio_projector = {
        "ln": _ln(48), "fc1": _lin(ks[2], 64, 48), "fc3": None,
        "fc2": _lin(ks[3], 64, 64),
    }
    m = InternOmni(lang, vit, projector, audio=audio,
                   audio_projector=audio_projector,
                   image_token_id=254, audio_token_id=255)
    m.vision_feature_layer = -1
    return m


def test_internomni_modalities():
    m = make_tiny_internomni()
    rng = np.random.RandomState(0)
    px = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    mel = jnp.asarray(rng.randn(1, 16, 64), jnp.float32)
    ids = np.array([[1, 254, 5, 255, 100, 7]], dtype=np.int32)
    logits = m.forward_audio_visual(ids, px, mel)
    # image token expands to 4 (pixel shuffle of 16 patches); audio slot
    # is overwritten in place
    assert logits.shape[1] == 6 - 1 + 4
    assert bool(jnp.all(jnp.isfinite(logits)))

    # all three modalities expose engine blocks
    for mod, n in (("language", 2), ("vision", 2), ("audio", 2)):
        m.set_modality(mod)
        assert m.num_blocks == n
        assert m.get_subsets_in_block(0)
    m.set_modality("audio")
    batches = m.collect_first_block_input([np.asarray(mel)])
    assert batches[0].ndim == 3
