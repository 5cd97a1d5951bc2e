"""Pallas int8-KV decode attention kernel vs float reference
(SURVEY §2.6 'paged/quantized KV-cache attention' row)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_decode_attention_kv8_matches_reference():
    from lightcompress_tpu.ops.pallas_attention import decode_attention_kv8

    rng = np.random.RandomState(0)
    B, H, G, S, D = 4, 2, 4, 64, 16
    q = jnp.asarray(rng.randn(B, H, G, D), jnp.float32)
    kq = jnp.asarray(rng.randint(-127, 127, (B, H, S, D)), jnp.int8)
    vq = jnp.asarray(rng.randint(-127, 127, (B, H, S, D)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, S) * 0.02, jnp.float32)
    vs = jnp.asarray(rng.rand(B, H, S) * 0.02, jnp.float32)
    out = decode_attention_kv8(q, kq, ks, vq, vs, b_block=2, interpret=True)

    sc = np.einsum("bhgd,bhsd->bhgs", np.asarray(q),
                   np.asarray(kq, np.float32))
    sc = sc * np.asarray(ks)[:, :, None, :] * (D ** -0.5)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhgs,bhsd->bhgd",
                    p * np.asarray(vs)[:, :, None, :],
                    np.asarray(vq, np.float32))
    err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-2  # bf16 in-kernel dequant noise
