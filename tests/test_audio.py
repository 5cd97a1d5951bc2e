"""Qwen2-Audio family: audio-tower HF parity, multimodal splice, and
per-modality compression (reference qwen2audio.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.models.audio import make_tiny_qwen2audio
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


@pytest.fixture()
def alm():
    return make_tiny_qwen2audio(seed=0)


def _sample(alm, seed=0, T=8, mel_T=32):
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, 200, (1, T)).astype(np.int32)
    ids[0, 2] = alm.audio_token_id
    mel = rng.randn(1, alm.audio.num_mel_bins, mel_T).astype(np.float32)
    return jnp.asarray(ids), jnp.asarray(mel)


def test_audio_tower_matches_hf(tmp_path):
    import torch
    from transformers import (Qwen2AudioConfig, Qwen2AudioEncoderConfig,
                              Qwen2AudioForConditionalGeneration)
    from transformers.models.qwen2.configuration_qwen2 import Qwen2Config

    torch.manual_seed(0)
    acfg = Qwen2AudioEncoderConfig(
        d_model=48, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=96, num_mel_bins=16, max_source_positions=64,
        attn_implementation="eager",
    )
    tcfg = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2)
    cfg = Qwen2AudioConfig(audio_config=acfg.to_dict(),
                           text_config=tcfg.to_dict(), audio_token_index=96)
    hf = Qwen2AudioForConditionalGeneration(cfg)
    hf.eval()
    d = str(tmp_path / "q2a")
    hf.save_pretrained(d, safe_serialization=True)

    from lightcompress_tpu.models import load_model

    m = load_model(d, dtype=jnp.float32, with_tokenizer=False)
    mel = np.random.RandomState(0).randn(1, 16, 128).astype(np.float32)
    ours = np.asarray(m.audio.forward_features(jnp.asarray(mel)))
    with torch.no_grad():
        theirs = hf.audio_tower(
            torch.from_numpy(mel)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-3, rtol=5e-2)
    # language side parity too
    ids = np.array([[1, 5, 9, 44, 100, 7]], dtype=np.int32)
    ours_l = np.asarray(m.language.forward(jnp.asarray(ids)))
    with torch.no_grad():
        out = hf.language_model(torch.from_numpy(ids))
        if hasattr(out, "logits"):
            theirs_l = out.logits.float().numpy()
        else:
            h = out.last_hidden_state
            theirs_l = hf.get_output_embeddings()(h).float().numpy()
    np.testing.assert_allclose(ours_l, theirs_l, atol=5e-3, rtol=5e-2)


def test_multimodal_splice(alm):
    ids, mel = _sample(alm)
    emb = alm.multimodal_embed(ids, mel)
    # 32 mel frames -> conv stride 2 -> 16 -> avgpool -> 8 audio tokens
    assert emb.shape == (1, 8 - 1 + 8, 64)
    logits = alm.forward_multimodal(ids, mel)
    assert logits.shape == (1, 15, 256)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_audio_modality_quant(alm):
    alm.set_modality("audio")
    rng = np.random.RandomState(3)
    mel = [jnp.asarray(rng.randn(1, 16, 32).astype(np.float32))]
    inputs = alm.collect_first_block_input(mel)
    cfg = DotDict({
        "method": "RTN",
        "weight": {"bit": 8, "symmetric": True,
                   "granularity": "per_channel"},
    })
    algo = ALGO_REGISTRY["RTN"](alm, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    alm.set_modality("language")
    ids, melx = _sample(alm, seed=5)
    logits = alm.forward_multimodal(ids, melx)
    assert bool(jnp.all(jnp.isfinite(logits)))
