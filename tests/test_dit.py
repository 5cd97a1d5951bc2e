"""DiT / video_gen modality tests (Wan-class blocks with adaLN modulation,
fake-affine norms, per-denoising-step calibration extras)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightcompress_tpu.config import DotDict
from lightcompress_tpu.models.dit import WanT2V
from lightcompress_tpu.registry import ALGO_REGISTRY
import lightcompress_tpu.compression  # noqa: F401


def _calib(model, n_steps=3, tokens=24, seed=0):
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(n_steps):
        batches.append({
            "latents": rng.randn(1, tokens, 128).astype(np.float32),
            "t_emb": rng.randn(1, 6, 128).astype(np.float32) * 0.1,
            "ctx": rng.randn(1, 8, 64).astype(np.float32),
        })
    return model.collect_first_block_input(batches)


def test_dit_forward():
    m = WanT2V.tiny(seed=0)
    rng = np.random.RandomState(0)
    lat = jnp.asarray(rng.randn(1, 24, 128).astype(np.float32))
    t = jnp.asarray(rng.randn(1, 6, 128).astype(np.float32) * 0.1)
    ctx = jnp.asarray(rng.randn(1, 8, 64).astype(np.float32))
    y = m.forward_denoise(lat, t, ctx)
    assert y.shape == lat.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_dit_rtn_quant():
    m = WanT2V.tiny(seed=1)
    inputs = _calib(m)
    cfg = DotDict({"method": "RTN",
                   "weight": {"bit": 8, "symmetric": True,
                              "granularity": "per_channel"}})
    algo = ALGO_REGISTRY["RTN"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    algo.deploy("fake_quant")
    w_q = np.asarray(m.blocks[0]["attn1"]["q"]["weight"])
    w_fp = np.asarray(m._fp_blocks[0]["attn1"]["q"]["weight"])
    assert not np.array_equal(w_q, w_fp)
    rng = np.random.RandomState(2)
    y = m.forward_denoise(
        jnp.asarray(rng.randn(1, 24, 128).astype(np.float32)),
        jnp.asarray(rng.randn(1, 6, 128).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(1, 8, 64).astype(np.float32)),
    )
    assert bool(jnp.all(jnp.isfinite(y)))


def test_dit_awq_fake_affine_fold():
    """AWQ folds scales into the fake-affine norms; the float forward must
    be preserved (the LlmcWanTransformerBlock equivalence)."""
    m = WanT2V.tiny(seed=2)
    rng = np.random.RandomState(0)
    lat = jnp.asarray(rng.randn(1, 24, 128).astype(np.float32))
    t = jnp.asarray(rng.randn(1, 6, 128).astype(np.float32) * 0.1)
    ctx = jnp.asarray(rng.randn(1, 8, 64).astype(np.float32))
    ref = np.asarray(m.forward_denoise(lat, t, ctx))

    inputs = _calib(m)
    cfg = DotDict({
        "method": "Awq",
        "weight": {"bit": 4, "symmetric": False, "granularity": "per_group",
                   "group_size": 16},
        "special": {"trans": True, "trans_version": "v2",
                    "weight_clip": False},
    })
    algo = ALGO_REGISTRY["Awq"](m, cfg, inputs, None, DotDict({}))
    algo.run_block_loop()
    # fake-affine norm weights actually carry the folded scales
    assert not np.allclose(
        np.asarray(m.blocks[0]["affine_norm1"]["weight"]), 1.0
    )
    algo.deploy("transformed")
    out = np.asarray(m.forward_denoise(lat, t, ctx))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-2)
    algo.deploy("fake_quant")
    out_q = m.forward_denoise(lat, t, ctx)
    assert bool(jnp.all(jnp.isfinite(out_q)))
