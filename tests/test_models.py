"""Model layer tests: forward parity vs HuggingFace transformers on tiny
random checkpoints, loader round-trips, subset topology."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import make_tiny_adapter, make_tiny_hf_llama, make_tiny_hf_opt


def _hf_logits(model, ids_np):
    import torch

    with torch.no_grad():
        out = model(torch.from_numpy(ids_np)).logits
    return out.float().numpy()


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    d, hf = make_tiny_hf_llama(str(tmp_path_factory.mktemp("m")))
    return d, hf


def test_llama_forward_matches_hf(tiny_llama):
    from lightcompress_tpu.models import load_model

    d, hf = tiny_llama
    m = load_model(d, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 44, 100, 7, 3, 250]], dtype=np.int32)
    ours = np.asarray(m.forward(jnp.asarray(ids)))
    theirs = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=2e-2)


def test_opt_forward_matches_hf(tmp_path):
    from lightcompress_tpu.models import load_model

    d, hf = make_tiny_hf_opt(str(tmp_path))
    m = load_model(d, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 44, 100, 7, 3, 250]], dtype=np.int32)
    ours = np.asarray(m.forward(jnp.asarray(ids)))
    theirs = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=2e-2)


def test_block_forward_feats_keys():
    m = make_tiny_adapter()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 64))
    y, feats, kv = m.block_forward(0, x)
    assert y.shape == x.shape
    assert set(feats) == {
        "attn.q", "attn.k", "attn.v", "attn.o", "mlp.gate", "mlp.up", "mlp.down",
    }
    k, v = kv
    assert k.shape == (2, 2, 8, 16)  # (B, kv_heads, T, head_dim)


def test_first_block_input_matches_embedding():
    m = make_tiny_adapter()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 256, (3, 8)))
    batches = m.collect_first_block_input([ids[i : i + 1] for i in range(3)])
    assert len(batches) == 3
    assert batches[0].shape == (1, 8, 64)


def test_inspect_forward_consistency():
    """Re-running a subset via inspect_forward must reproduce the slice of the
    block forward (the AWQ grid-search invariant)."""
    m = make_tiny_adapter()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 64))
    y, feats, _ = m.block_forward(0, x)
    subsets = m.get_subsets_in_block(0)
    # subset 0: attn with input feats['attn.q'] -> output == feats['attn.o'] @ o
    attn_out = m.inspect_forward(0, subsets[0], feats["attn.q"])
    # reconstruct: block's attn output = y_attn; verify via mlp path instead
    mlp_out = m.inspect_forward(0, subsets[2], feats["mlp.gate"])
    down_out = m.inspect_forward(0, subsets[3], feats["mlp.down"])
    np.testing.assert_allclose(
        np.asarray(mlp_out), np.asarray(down_out), atol=1e-5, rtol=1e-4
    )
    assert attn_out.shape == x.shape


def test_save_load_roundtrip(tmp_path, tiny_llama):
    from lightcompress_tpu.models import load_model, save_params

    d, _ = tiny_llama
    m = load_model(d, dtype=jnp.float32)
    import json, os

    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    out = str(tmp_path / "saved")
    save_params(m, out, hf_config=cfg)
    m2 = load_model(out, dtype=jnp.float32, with_tokenizer=False)
    ids = jnp.asarray([[1, 2, 3, 4]])
    np.testing.assert_allclose(
        np.asarray(m.forward(ids)), np.asarray(m2.forward(ids)), atol=1e-5
    )


def test_gqa_kv_heads():
    m = make_tiny_adapter(heads=4, kv_heads=1)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]])
    logits = m.forward(ids)
    assert logits.shape == (1, 8, 256)
    assert not bool(jnp.any(jnp.isnan(logits)))


def test_decode_with_kv_cache_matches_full():
    from lightcompress_tpu.models import arch as A

    m = make_tiny_adapter(layers=1)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 64))
    # full forward
    y_full, _, _ = m.block_forward(0, x)
    # prefill 7 then decode 1 with cache
    y_pre, _, kv = m.block_forward(0, x[:, :7])
    T = 8
    cos, sin = m.rope_tables(T)
    mask = A.causal_mask(1, 8)
    y_dec, _, _ = A.block_forward(
        m.arch, m.blocks[0], x[:, 7:8], cos[7:8], sin[7:8], mask,
        kv_cache=kv,
    )
    np.testing.assert_allclose(
        np.asarray(y_dec), np.asarray(y_full[:, 7:8]), atol=1e-4, rtol=1e-3
    )
